package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Line-item classification operators (SURVEY.md §2.2, E11-E13).
  *
  * The reference classifies balance-sheet line items with a
  * HashingVectorizer + LogisticRegression (DatabaseStructured.py:92-128).
  * Spark-first re-expression: E11 is the SQL-expressible keyword-rule
  * twin; E12 is a real hashed-term-frequency linear model evaluated
  * entirely with codegen'd builtins (xxhash64 + conditional aggregation)
  * — weights are a deterministic function of (class, bucket), so there is
  * no model artifact to ship and the scoring is reproducible anywhere.
  */
object Classify {

  /** First-match keyword rules — the rule-based classifier (E11). */
  def ruleLabel(text: Column): Column =
    when(text.contains("customer"), "customer_related")
      .when(text.contains("order"), "order_related")
      .when(text.contains("stream"), "stream_related")
      .when(text.contains("data"), "data_related")
      .otherwise("other")

  val ruleLabelSql: String =
    """CASE WHEN text LIKE '%customer%' THEN 'customer_related'
      | WHEN text LIKE '%order%' THEN 'order_related'
      | WHEN text LIKE '%stream%' THEN 'stream_related'
      | WHEN text LIKE '%data%' THEN 'data_related'
      | ELSE 'other' END""".stripMargin

  // E11: rule-based classification over documents.
  def q27ClassifyRule(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.select(col("doc_id"), ruleLabel(col("text")).as("label"))
      .orderBy("doc_id")
  }

  val q27Sql: String =
    s"""SELECT doc_id, $ruleLabelSql AS label FROM documents ORDER BY doc_id""".stripMargin

  // E12: hashed-TF logistic scoring over the TRAINED matrix (round 10 —
  // previously a seeded weight hash; the reference consumes its fitted
  // joblib models at run_build_database.py:301-327, so inference must
  // run over LrTrain's fitted weights to mirror it). Weights are integer
  // MICROS, so per-class margins are exact LONG sums (partial-aggregation
  // order can't perturb a bit) divided by 1e6 once at the end; the argmax
  // ties deterministically on the lowest class. The weight matrix is
  // classes × buckets (KBs) — broadcast; scoring itself stays one
  // groupBy(doc_id), linear at any scale.
  val NumBuckets = 1024
  val NumClasses = 5

  import graft.functions.TextFunctions.{md5Long, md5LongSql}

  /** Pointwise argmax over the wide margin columns: greatest() compares
    * (m, -cls) structs field-by-field — the same max-margin,
    * ties-to-lowest-class rule as the previous max(struct(...))
    * aggregate, but with no class-axis row expansion and no sort
    * aggregate (max over a struct is not hash-aggregable, so the long
    * form paid a SortAggregate over the full token frame).
    */
  private[graft] def bestOfWide(prefix: String): Column =
    greatest((0 until NumClasses).map(c =>
      struct(col(s"$prefix$c").as("m"), lit(-c).as("negc"))): _*)

  def q28ClassifyLr(s: SparkSession, dir: String): DataFrame = {
    // registry artifact: fit once per corpus, scored as a broadcast
    // LocalRelation (LrTrain.modelCache rationale) — q129 is the
    // benchmark of the training cost itself. Scoring is ONE hash
    // aggregate: tok ⋈ broadcast(wide weights), groupBy(doc), per-class
    // margin sums in packed columns, then a pointwise argmax.
    val w = LrTrain.docWeightsWide(s, dir)
    val mAggs = (0 until NumClasses).map(c => sum(col(s"w$c")).as(s"m$c"))
    LrTrain.docTok(s, dir)
      .join(broadcast(w), Seq("bucket"))
      .groupBy("doc_id").agg(mAggs.head, mAggs.tail: _*)
      .select(col("doc_id"), bestOfWide("m").as("b"))
      // NO round(…,4) here: micro-quantized margins make exact x.xxxx50
      // ties common, and Spark rounds the shortest-decimal repr while
      // DuckDB rounds the binary double — the tie direction diverges.
      // The raw division of identical longs is bit-identical instead.
      .select(col("doc_id"),
        (-col("b.negc")).cast(IntegerType).as("pred_class"),
        (col("b.m").cast(DoubleType) / 1000000.0).as("best_score"))
      .orderBy("doc_id")
  }

  def q28Sql: String =
    s"""WITH ${LrTrain.docTrainCtes}
       |${LrTrain.docScoreSql}""".stripMargin

  /** Synthesized balance-sheet line-item label (shared with q103/q104):
    * five deterministic accounting phrases keyed by a column.
    */
  def lineLabel(k: Column): Column =
    when(k % 5 === 0, "customer deposits held")
      .when(k % 5 === 1, "order receivables net")
      .when(k % 5 === 2, "stream service obligations")
      .when(k % 5 === 3, "data center equipment")
      .otherwise(lit("sundry payables"))

  // E12b (run_build_database.py:43, 301-327): DUAL-MODEL routed
  // classification. The reference trains SEPARATE asset and liability
  // LR models (`asset_log_reg_mdl_v2.joblib` /
  // `liable_log_reg_mdl_v2.joblib`) and scores each line item with the
  // model of its balance-sheet side (the q26 bisection). Round 10: the
  // two matrices are genuinely FITTED (LrTrain.trainedSideWeights — one
  // quantized-GD model per side over that side's lines only), replacing
  // the seeded hash weights, and the whole train+route pipeline stays
  // ORACLE-CHECKED (integer-micro margins, deterministic argmax).
  // Training always uses the TRUE bisection sides; forceSide only
  // reroutes SCORING to one matrix — the spec's routing proof.
  def q104DualLr(s: SparkSession, dir: String): DataFrame = routedLr(s, dir, None)

  private[graft] def routedLr(s: SparkSession, dir: String,
      forceSide: Option[String]): DataFrame = {
    val sided = LrTrain.sidedLines(s, dir)
    val w = LrTrain.sideWeightsWide(s, dir)
      .withColumnRenamed("side", "w_side")
    val tok = sided.select(col("lid"), col("side"), col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        explode(split(lineLabel(col("l_partkey")), " ")).as("token"))
      .withColumn("bucket", pmod(md5Long(col("token")), lit(NumBuckets)))
      .withColumn("w_side", forceSide.map(lit(_)).getOrElse(col("side")))
    val mAggs = (0 until NumClasses).map(c => sum(col(s"w$c")).as(s"m$c"))
    tok.join(broadcast(w), Seq("w_side", "bucket"))
      .groupBy("lid", "side", "l_orderkey", "l_linenumber", "l_partkey",
        "l_suppkey")
      .agg(mAggs.head, mAggs.tail: _*)
      .withColumn("b", bestOfWide("m"))
      // unrounded for the same tie-direction reason as q28
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("side"),
        (-col("b.negc")).cast(IntegerType).as("pred_class"),
        (col("b.m").cast(DoubleType) / 1000000.0).as("best_score"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
  }

  /** Shared sided-scoring CTE prefix: sided lines + the sided training
    * block + per-(lid, cls) margin sums — q104's argmax and q136's
    * proba tails both consume it.
    */
  /** Just the `sided` lines CTE — q138's k-fold twin slices it per
    * fold, so it is factored out of the whole-corpus score block.
    */
  private[graft] def sidedCte: String = {
    val label = // the q103/q104 shared synthesized line label, by partkey
      s"""CASE (l_partkey) % 5 WHEN 0 THEN 'customer deposits held'
         | WHEN 1 THEN 'order receivables net'
         | WHEN 2 THEN 'stream service obligations'
         | WHEN 3 THEN 'data center equipment'
         | ELSE 'sundry payables' END""".stripMargin
    s"""sided AS (
       | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |  ${LrTrain.lidSql} AS lid,
       |  CASE WHEN l_linenumber <= split_line THEN 'assets'
       |       ELSE 'liabilities' END AS side,
       |  $label AS label
       | FROM (
       |  SELECT *, MAX(CASE WHEN l_returnflag = 'A' THEN l_linenumber END)
       |    OVER (PARTITION BY l_orderkey) AS split_line
       |  FROM lineitem)
       | WHERE split_line IS NOT NULL
       |)""".stripMargin
  }

  private[graft] def sidedScoreCtes: String = {
    s"""$sidedCte,
       |${LrTrain.sideTrainCtes},
       |sscore AS (
       | SELECT t.lid, w.cls, SUM(w.w) AS m
       | FROM stok t JOIN sw${LrTrain.Iters} w USING (side, bucket)
       | GROUP BY 1, 2)""".stripMargin
  }

  def q104Sql: String =
    s"""WITH $sidedScoreCtes
       |SELECT s.l_orderkey, s.l_linenumber, s.l_partkey, s.l_suppkey, s.side,
       | CAST(b.cls AS INTEGER) AS pred_class,
       | CAST(b.m AS DOUBLE)/1000000.0 AS best_score
       |FROM (
       | SELECT lid, cls, m,
       |  ROW_NUMBER() OVER (PARTITION BY lid ORDER BY m DESC, cls ASC) AS rk
       | FROM sscore) b
       |JOIN (SELECT DISTINCT lid, l_orderkey, l_linenumber, l_partkey,
       |       l_suppkey, side FROM sided) s USING (lid)
       |WHERE b.rk = 1
       |ORDER BY s.l_orderkey, s.l_linenumber, s.l_partkey, s.l_suppkey""".stripMargin

  // E13 (DatabaseStructured.py:21-48): manual-label override — left join
  // the (small, broadcast) manual table; manual wins over predicted.
  def q29LabelOverride(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val n = Tables.nation(s, dir)
    val manual = n.select(col("n_nationkey").cast(LongType).as("doc_id"),
      concat(lit("manual_"), lower(col("n_name"))).as("manual_label"))
    d.select(col("doc_id"), ruleLabel(col("text")).as("rule_label"))
      .join(broadcast(manual), Seq("doc_id"), "left_outer")
      .withColumn("final_label", coalesce(col("manual_label"), col("rule_label")))
      .orderBy("doc_id")
  }

  val q29Sql: String =
    s"""SELECT d.doc_id, $ruleLabelSql AS rule_label, m.manual_label,
       | COALESCE(m.manual_label, $ruleLabelSql) AS final_label
       |FROM documents d LEFT JOIN (
       | SELECT CAST(n_nationkey AS BIGINT) AS doc_id, 'manual_' || LOWER(n_name) AS manual_label
       | FROM nation) m
       |ON d.doc_id = m.doc_id
       |ORDER BY d.doc_id""".stripMargin
}
