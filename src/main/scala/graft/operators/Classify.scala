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

  // E12: hashed-TF logistic scoring. tokens → md5-hash mod D buckets;
  // weight(class, bucket) = centered hash in [-500, 500) MILLIS —
  // integer weights, so per-class scores are exact LONG sums
  // (partial-aggregation order can't perturb a bit) divided by 1000
  // once at the end. With the cross-engine md5Long hash (round 7;
  // previously xxhash64, Spark-only) the classifier is fully
  // ORACLE-CHECKED instead of rows-only. All map-side except one
  // groupBy(doc_id) — scales linearly.
  val NumBuckets = 1024
  val NumClasses = 5

  import graft.functions.TextFunctions.{md5Long, md5LongSql}

  def q28ClassifyLr(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val tok = d.select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .withColumn("bucket", pmod(md5Long(col("token")), lit(NumBuckets)))
    // weight in millis: centered integer hash of "c:bucket"
    def wMillis(c: Int): Column =
      pmod(md5Long(concat(lit(s"$c:"), col("bucket").cast("string"))), lit(1000L)) - 500L
    val scoreCols = (0 until NumClasses).map(c => sum(wMillis(c)).as(s"s_$c"))
    val scored = tok.groupBy("doc_id")
      .agg(scoreCols.head, scoreCols.tail: _*)
    val best = (0 until NumClasses).map(c => col(s"s_$c"))
      .reduceLeft((a, b) => greatest(a, b))
    val pred = (0 until NumClasses).foldRight(lit(-1)) { (c, acc) =>
      when(col(s"s_$c") === best, lit(c)).otherwise(acc)
    }
    scored
      .withColumn("pred_class", pred)
      .withColumn("best_score", round(best.cast(DoubleType) / 1000.0, 4))
      .select(col("doc_id"), col("pred_class"), col("best_score"))
      .orderBy("doc_id")
  }

  val q28Sql: String = {
    val bucket = s"(${md5LongSql("token")} % $NumBuckets)"
    def wMillis(c: Int) =
      s"(${md5LongSql(s"'$c' || ':' || CAST(bucket AS VARCHAR)")} % 1000 - 500)"
    val sums = (0 until NumClasses).map(c => s"SUM(${wMillis(c)}) AS s_$c").mkString(", ")
    val best = s"GREATEST(${(0 until NumClasses).map(c => s"s_$c").mkString(", ")})"
    val pred = (0 until NumClasses).map(c => s"WHEN s_$c = best THEN $c")
      .mkString("CASE ", " ", " ELSE -1 END")
    s"""SELECT doc_id, $pred AS pred_class,
       | ROUND(CAST(best AS DOUBLE) / 1000.0, 4) AS best_score
       |FROM (
       | SELECT doc_id, $sums, $best AS best FROM (
       |  SELECT doc_id, token, $bucket AS bucket
       |  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents)
       |  WHERE LENGTH(token) > 0)
       | GROUP BY doc_id)
       |ORDER BY doc_id""".stripMargin
  }

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
  // model of its balance-sheet side (the q26 bisection). Here the two
  // weight matrices are side-seeded hashed-TF linear models —
  // w_side(class, bucket) = centered md5Long("side:c:bucket") in
  // integer MILLIS — so routing a line to the other matrix demonstrably
  // changes its scores, the per-class sums are exact long arithmetic,
  // and (round 7, with the cross-engine hash) the whole routed scoring
  // is ORACLE-CHECKED instead of rows-only. All map-side except one
  // per-line groupBy; the side column rides the same okey window the
  // bisection uses. The force-sided spec still proves the routing.
  def q104DualLr(s: SparkSession, dir: String): DataFrame = routedLr(s, dir, None)

  private[graft] def routedLr(s: SparkSession, dir: String,
      forceSide: Option[String]): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val wSheet = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
    val bisected = l
      .withColumn("split_line",
        max(when(col("l_returnflag") === "A", col("l_linenumber"))).over(wSheet))
      .filter(col("split_line").isNotNull)
    val sided = bisected.withColumn("side",
      forceSide.map(lit(_)).getOrElse(
        when(col("l_linenumber") <= col("split_line"), "assets")
          .otherwise(lit("liabilities"))))
    val tok = sided.select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("side"),
        explode(split(lineLabel(col("l_partkey")), " ")).as("token"))
      .withColumn("bucket", pmod(md5Long(col("token")), lit(NumBuckets)))
    // the side column SELECTS the weight matrix: disjoint hash inputs
    def wgtMillis(c: Int): Column =
      pmod(md5Long(concat(col("side"), lit(s":$c:"), col("bucket").cast("string"))),
        lit(1000L)) - 500L
    val scoreCols = (0 until NumClasses).map(c => sum(wgtMillis(c)).as(s"s_$c"))
    val scored = tok
      .groupBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "side")
      .agg(scoreCols.head, scoreCols.tail: _*)
    val best = (0 until NumClasses).map(c => col(s"s_$c"))
      .reduceLeft((a, b) => greatest(a, b))
    val pred = (0 until NumClasses).foldRight(lit(-1)) { (c, acc) =>
      when(col(s"s_$c") === best, lit(c)).otherwise(acc)
    }
    scored
      .withColumn("pred_class", pred)
      .withColumn("best_score", round(best.cast(DoubleType) / 1000.0, 4))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("side"), col("pred_class"), col("best_score"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
  }

  val q104Sql: String = {
    val label = // the q103/q104 shared synthesized line label, by partkey
      s"""CASE (l_partkey) % 5 WHEN 0 THEN 'customer deposits held'
         | WHEN 1 THEN 'order receivables net'
         | WHEN 2 THEN 'stream service obligations'
         | WHEN 3 THEN 'data center equipment'
         | ELSE 'sundry payables' END""".stripMargin
    val bucket = s"(${md5LongSql("token")} % $NumBuckets)"
    def wgtMillis(c: Int) =
      s"(${md5LongSql(s"side || ':$c:' || CAST(bucket AS VARCHAR)")} % 1000 - 500)"
    val sums = (0 until NumClasses).map(c => s"SUM(${wgtMillis(c)}) AS s_$c").mkString(", ")
    val best = s"GREATEST(${(0 until NumClasses).map(c => s"s_$c").mkString(", ")})"
    val pred = (0 until NumClasses).map(c => s"WHEN s_$c = best THEN $c")
      .mkString("CASE ", " ", " ELSE -1 END")
    s"""WITH sided AS (
       | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |  CASE WHEN l_linenumber <= split_line THEN 'assets'
       |       ELSE 'liabilities' END AS side,
       |  $label AS label
       | FROM (
       |  SELECT *, MAX(CASE WHEN l_returnflag = 'A' THEN l_linenumber END)
       |    OVER (PARTITION BY l_orderkey) AS split_line
       |  FROM lineitem)
       | WHERE split_line IS NOT NULL
       |), tok AS (
       | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, side,
       |  $bucket AS bucket
       | FROM (SELECT *, UNNEST(string_split(label, ' ')) AS token FROM sided)
       |)
       |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, side,
       | $pred AS pred_class,
       | ROUND(CAST(best AS DOUBLE) / 1000.0, 4) AS best_score
       |FROM (
       | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, side,
       |  $sums, $best AS best
       | FROM tok
       | GROUP BY l_orderkey, l_linenumber, l_partkey, l_suppkey, side)
       |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin
  }

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
