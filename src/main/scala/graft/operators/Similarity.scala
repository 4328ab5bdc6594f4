package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor similarity search over the embedding
  * column (SURVEY.md §2.3 T6).
  *
  * q45 is the exact brute-force baseline: probe×corpus cosine + per-probe
  * top-k window. q46 is the scale path — IVF-style: coarse-quantize the
  * corpus into cells (here the `label` partitions with computed
  * centroids), route each probe to its nearest centroid, search only that
  * cell. At 100 TB the cell assignment is a broadcast join against the
  * (tiny) centroid table and the search join is hash-partitioned on
  * cell id — candidate count drops by ~n_cells× vs brute force.
  */
object Similarity {

  val TopK = 10
  val NumProbes = 10 // probe set: vec_id < NumProbes

  // T6 exact baseline: brute-force cosine top-k per probe.
  // The probe side is tiny → broadcast; ranking is windowed per probe
  // (high-cardinality partition key at real probe volumes).
  def q45AnnTopk(s: SparkSession, dir: String): DataFrame = {
    // zero-norm filter mirrored in the oracle — cosine undefined, and
    // ANSI mode would turn the 0-division into a job-killing error
    val e = Tables.embeddings(s, dir)
      .withColumn("nrm", sqrt(VectorFunctions.norm2(col("embedding"))))
      .filter(col("nrm") > 0)
    val probes = e.filter(col("vec_id") < NumProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"),
        col("nrm").as("probe_nrm"))
    val w = Window.partitionBy("probe_id").orderBy(desc("cos"), asc("vec_id"))
    e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("cos",
        round(VectorFunctions.dot(col("probe_vec"), col("embedding")) /
          (col("probe_nrm") * col("nrm")), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= TopK)
      .select(col("probe_id"), col("rk"), col("vec_id"), col("cos"))
      .orderBy("probe_id", "rk")
  }

  /** q45's SERVE twin (r16 verdict #7): brute-force cosine top-k for a
    * batch of (probe_id, pvec) requests over raw corpus floats, ranked
    * with the bounded mergeable [[graft.functions.TopKAgg.ScoredTopK]]
    * instead of the per-probe row_number window — each partition
    * reduces to ≤ k candidates map-side, so the per-probe shuffle
    * carries ≤ k·partitions rows where the window form repartitioned
    * EVERY (probe, candidate) pair to one task per probe (the exact
    * defect the r16 5M-doc rung exposed in the BM25 serve path). The
    * batch q45 keeps its declarative window so the oracle replays it;
    * Round17OpsSpec pins serve == batch bit-for-bit.
    *
    * cos is quantized cos_u = round(cos6 · 1e6) for the long-ordered
    * aggregator and divided back: both forms are the nearest double to
    * the same 6-decimal value, so the output doubles are bit-identical
    * to q45's round(cos, 6).
    *
    * `excludeSelf` defaults FALSE (the serve-id-collision discipline);
    * the parity spec passes true because its probes ARE corpus vectors.
    */
  def serveBruteTopK(probes: DataFrame, corpus: DataFrame,
      excludeSelf: Boolean = false): DataFrame = {
    val e = corpus
      .withColumn("nrm", sqrt(VectorFunctions.norm2(col("embedding"))))
      .filter(col("nrm") > 0)
    val p = probes
      .withColumn("probe_nrm", sqrt(VectorFunctions.norm2(col("pvec"))))
      .filter(col("probe_nrm") > 0)
      .select(col("probe_id"), col("pvec"), col("probe_nrm"))
    val joined = e.join(broadcast(p),
      if (excludeSelf) col("vec_id") =!= col("probe_id") else lit(true))
      .withColumn("cos",
        round(VectorFunctions.dot(col("pvec"), col("embedding")) /
          (col("probe_nrm") * col("nrm")), 6))
      .withColumn("cos_u", round(col("cos") * lit(1e6), 0).cast("long"))
    joined.groupBy("probe_id")
      .agg(bruteServeTopK(col("cos_u"), col("vec_id"), col("cos_u")).as("top"))
      .select(col("probe_id"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("probe_id"), (col("i") + 1).cast("long").as("rk"),
        col("t._2").as("vec_id"), (col("t._1") / lit(1e6)).as("cos"))
  }

  private lazy val bruteServeTopK = udaf(
    new graft.functions.TopKAgg.ScoredTopK(TopK),
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long, Long)]())

  val q45Sql: String = {
    val dot = VectorFunctions.dotSql("p.embedding", "e.embedding")
    val nrm = s"SQRT(${VectorFunctions.dotSql("embedding", "embedding")})"
    s"""SELECT probe_id, rk, vec_id, cos FROM (
       | SELECT p.vec_id AS probe_id, e.vec_id AS vec_id,
       |  ROUND($dot / (p.nrm * e.nrm), 6) AS cos,
       |  ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY ROUND($dot / (p.nrm * e.nrm), 6) DESC, e.vec_id) AS rk
       | FROM (SELECT * FROM (SELECT *, $nrm AS nrm FROM embeddings) WHERE nrm > 0) p
       | JOIN (SELECT * FROM (SELECT *, $nrm AS nrm FROM embeddings) WHERE nrm > 0) e ON e.vec_id <> p.vec_id
       | WHERE p.vec_id < $NumProbes)
       |WHERE rk <= $TopK ORDER BY probe_id, rk""".stripMargin
  }

  // T6 scale path: IVF — centroids per label cell via positional explode
  // + DECIMAL-EXACT mean (the sum is decimal, so partial aggregation
  // order can't perturb the centroid bits — that determinism is what
  // lets this be oracle-checked), probes routed to nearest centroid,
  // search restricted to that cell. Returns per-probe top-k within the
  // routed cell plus the cell id, so recall vs q45 is inspectable.
  def q46AnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    // centroid per cell: avg of each of the 64 dims (posexplode → agg)
    val cent = e.select(col("label"), posexplode(col("embedding")))
      .groupBy("label", "pos")
      .agg((sum(col("col").cast(DoubleType).cast(DecimalType(20, 10)))
        .cast(DoubleType) / count(lit(1))).as("dim_avg"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("dim_avg")))).as("dims"))
      .select(col("label").as("cell"),
        transform(col("dims"), d => d.getField("dim_avg").cast(FloatType)).as("centroid"))
    // zero-norm probes/candidates are filtered (mirrored in the oracle):
    // their cosine is undefined and ANSI 0-division is a fatal error
    val probes = e.filter(col("vec_id") < NumProbes &&
        VectorFunctions.norm2(col("embedding")) > 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val wCell = Window.partitionBy("probe_id").orderBy(desc("ccos"), asc("cell"))
    val routed = probes.join(broadcast(cent), lit(true))
      .withColumn("ccos", VectorFunctions.cosine(col("probe_vec"), col("centroid")))
      .withColumn("crk", row_number().over(wCell))
      .filter(col("crk") === 1)
      .withColumn("probe_nrm", sqrt(VectorFunctions.norm2(col("probe_vec"))))
      .select(col("probe_id"), col("probe_vec"), col("probe_nrm"), col("cell"))
    val w = Window.partitionBy("probe_id").orderBy(desc("cos"), asc("vec_id"))
    e.withColumn("nrm", sqrt(VectorFunctions.norm2(col("embedding"))))
      .filter(col("nrm") > 0)
      .join(broadcast(routed), col("label") === col("cell") && col("vec_id") =!= col("probe_id"))
      .withColumn("cos",
        round(VectorFunctions.dot(col("probe_vec"), col("embedding")) /
          (col("probe_nrm") * col("nrm")), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= TopK)
      .select(col("probe_id"), col("cell"), col("rk"), col("vec_id"), col("cos"))
      .orderBy("probe_id", "rk")
  }

  // T20: embedding-space diagnostics per IVF cell — vector count,
  // centroid norm, and inertia E||x||² − ||c||² (= mean squared distance
  // to the centroid, since c is the mean). The sums that feed both terms
  // are DECIMAL-exact (per-vector norms quantized once, centroid dims
  // from exact sums), so the report is engine-identical — the health
  // check that decides when IVF cells need re-clustering.
  def q66CellStats(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val n2dec = VectorFunctions.norm2(col("embedding")).cast(DecimalType(25, 8))
    // ONE scan of the embedding payload (r17 opt; previously a norms
    // pass and a posexplode pass joined — SweepDiag flagged the twin
    // 434 B aggregate exchanges, each fed by its own corpus read): the
    // per-row decimal norm rides the explode, contributing to the
    // per-cell stats only at pos 0 so each vector counts once. The n2
    // value is computed by the same expression per row and the decimal
    // sum is order-exact, so s2/n_vectors are bit-identical to the
    // two-pass form (every generator vector is fixed-width, non-empty).
    val ex = e.select(col("label"), n2dec.as("n2"), posexplode(col("embedding")))
    val cent = ex
      .groupBy("label", "pos")
      .agg((sum(col("col").cast(DoubleType).cast(DecimalType(20, 10)))
        .cast(DoubleType) / count(lit(1))).as("dim_avg"),
        count(when(col("pos") === 0, lit(1))).as("nv_part"),
        sum(when(col("pos") === 0, col("n2"))).as("s2_part"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("dim_avg")))).as("dims"),
        sum(col("nv_part")).as("n_vectors"),
        sum(col("s2_part")).as("s2"))
      .select(col("label"), col("n_vectors"), col("s2"),
        transform(col("dims"), d => d.getField("dim_avg")).as("centroid"))
      .withColumn("cnorm2", VectorFunctions.dot(col("centroid"), col("centroid")))
    cent
      .select(col("label"), col("n_vectors"),
        round(sqrt(col("cnorm2")), 6).as("centroid_norm"),
        round(col("s2").cast(DoubleType) / col("n_vectors") - col("cnorm2"), 6).as("inertia"))
      .orderBy("label")
  }

  val q66Sql: String = {
    val dimDec = "CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(20,10))"
    val n2 = VectorFunctions.dotSql("embedding", "embedding")
    val cn2 = VectorFunctions.dotSql("centroid", "centroid")
    s"""WITH dims AS (
       | SELECT label, i AS pos,
       |  CAST(SUM($dimDec) AS DOUBLE) / COUNT(*) AS dim_avg
       | FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
       | GROUP BY label, i
       |), cent AS (
       | SELECT label, list(dim_avg ORDER BY pos) AS centroid FROM dims GROUP BY label
       |), per_cell AS (
       | SELECT label, COUNT(*) AS n_vectors,
       |  SUM(CAST($n2 AS DECIMAL(25,8))) AS s2
       | FROM embeddings GROUP BY label
       |)
       |SELECT p.label, p.n_vectors,
       | ROUND(SQRT($cn2), 6) AS centroid_norm,
       | ROUND(CAST(p.s2 AS DOUBLE) / p.n_vectors - $cn2, 6) AS inertia
       |FROM per_cell p JOIN cent USING (label)
       |ORDER BY label""".stripMargin
  }

  val q46Sql: String = {
    // float dims go through DOUBLE before DECIMAL in BOTH engines so the
    // quantization path is identical bit-for-bit
    val dimDec = "CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(20,10))"
    val ccos = VectorFunctions.cosineSql("p.embedding", "c.centroid")
    val dotPE = VectorFunctions.dotSql("r.probe_vec", "e.embedding")
    val nrmP = s"SQRT(${VectorFunctions.dotSql("r.probe_vec", "r.probe_vec")})"
    val nrmE = s"SQRT(${VectorFunctions.dotSql("e.embedding", "e.embedding")})"
    s"""WITH dims AS (
       | SELECT label, i AS pos,
       |  CAST(SUM($dimDec) AS DOUBLE) / COUNT(*) AS dim_avg
       | FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
       | GROUP BY label, i
       |), cent AS (
       | SELECT label AS cell,
       |  list_transform(list(dim_avg ORDER BY pos), x -> CAST(x AS REAL)) AS centroid
       | FROM dims GROUP BY label
       |), routed AS (
       | SELECT probe_id, probe_vec, cell FROM (
       |  SELECT p.vec_id AS probe_id, p.embedding AS probe_vec, c.cell,
       |   ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY $ccos DESC, c.cell) AS crk
       |  FROM (SELECT * FROM embeddings WHERE vec_id < $NumProbes
       |        AND ${VectorFunctions.dotSql("embedding", "embedding")} > 0) p CROSS JOIN cent c)
       | WHERE crk = 1
       |)
       |SELECT probe_id, cell, rk, vec_id, cos FROM (
       | SELECT r.probe_id, r.cell, e.vec_id,
       |  ROUND($dotPE / ($nrmP * $nrmE), 6) AS cos,
       |  ROW_NUMBER() OVER (PARTITION BY r.probe_id
       |    ORDER BY ROUND($dotPE / ($nrmP * $nrmE), 6) DESC, e.vec_id) AS rk
       | FROM routed r JOIN embeddings e ON e.label = r.cell AND e.vec_id <> r.probe_id
       | WHERE ${VectorFunctions.dotSql("e.embedding", "e.embedding")} > 0)
       |WHERE rk <= $TopK ORDER BY probe_id, rk""".stripMargin
  }

  /** SemDeDup cosine threshold (same corpus-calibrated value as q44). */
  val SemDedupTau = 0.35

  // T25: semantic dedup (SemDeDup, Abbas et al. 2023): within each
  // embedding cell, a vector is a semantic duplicate if some LOWER-id
  // vector in the same cell has cosine >= tau; the keeper chain points to
  // the smallest such id. Pair work is cell-bounded (the SemDeDup point:
  // clustering first makes near-quadratic dedup tractable); norms are
  // precomputed per vector (q44 lesson); the verdict re-attaches to the
  // full table with one keyed left join.
  def q81SemDedup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .withColumn("nrm", sqrt(VectorFunctions.norm2(col("embedding"))))
      .filter(col("nrm") > 0) // cosine undefined at zero norm (oracle mirrors)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_vec"),
      col("nrm").as("a_nrm"), col("label"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_vec"),
      col("nrm").as("b_nrm"), col("label"))
    val dupOf = a.join(b, Seq("label"))
      .filter(col("a_id") < col("b_id"))
      .filter(round(
        VectorFunctions.dot(col("a_vec"), col("b_vec")) / (col("a_nrm") * col("b_nrm")),
        6) >= SemDedupTau)
      .groupBy(col("b_id")).agg(min(col("a_id")).as("dup_of"))
    Tables.embeddings(s, dir)
      .join(dupOf, col("vec_id") === col("b_id"), "left_outer")
      .select(col("vec_id"), col("label"), col("dup_of"),
        col("dup_of").isNull.as("kept"))
      .orderBy("vec_id")
  }

  /** k for Lloyd clustering (q90): seeds are the k lowest vec_ids. */
  val KmeansK = 8

  // T26: distributed k-means (2 Lloyd iterations) — the re-clustering step
  // that produces the IVF cells q46/q66 consume, and the engine form of
  // the reference's label-clustering notebook
  // (notebook/ml-model/mlClustering.ipynb: seeded KMeans(35) over
  // TF-IDF'd line-item labels). Assignment is a broadcast
  // join against the (tiny) centroid table + an argmin window per vector;
  // the update is the q46 posexplode → DECIMAL-exact per-dim mean. All
  // distances are strictly-sequential double folds (VectorFunctions), so
  // assignments — and therefore the converged cells — are bit-identical
  // in DuckDB and oracle-checkable, which is rare for iterative ML.
  // Iteration count is FIXED (unrolled), so the plan is two bounded
  // passes, not a driver-side convergence loop; at scale each pass is one
  // broadcast-join scan + one keyed aggregate.
  def q90Kmeans(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val seeds = e.filter(col("vec_id") < KmeansK)
      .select(col("vec_id").cast(IntegerType).as("cid"),
        col("embedding").as("centroid"))
    // d2 = ||x||² − 2x·c + ||c||²: same fold order both engines; argmin
    // with explicit cid tiebreak so equidistant points are deterministic.
    // Assignment is a ROW-LOCAL fold over the broadcast centroid array —
    // zero shuffle (an argmin window over an exploded centroid join would
    // shuffle k× the corpus with the embedding payload attached; at 100 TB
    // the assignment pass must stay map-side). The array is sorted by cid
    // and the fold keeps the first strict improvement, which is exactly
    // the (d2 ASC, cid ASC) tiebreak of the oracle's ROW_NUMBER.
    def assign(cents: DataFrame): DataFrame = {
      val centArr = cents.agg(array_sort(collect_list(struct(
        col("cid"),
        col("centroid"),
        VectorFunctions.norm2(col("centroid")).as("n2c")))).as("cents"))
      e.join(broadcast(centArr), lit(true))
        .withColumn("n2x", VectorFunctions.norm2(col("embedding")))
        .withColumn("best", aggregate(
          col("cents"),
          struct(lit(Double.MaxValue).as("d2"), lit(-1).as("cid")),
          (acc, c) => {
            val d2 = col("n2x") -
              lit(2.0) * VectorFunctions.dot(col("embedding"), c.getField("centroid")) +
              c.getField("n2c")
            when(d2 < acc.getField("d2"),
              struct(d2.as("d2"), c.getField("cid").as("cid"))).otherwise(acc)
          }))
        .select(col("vec_id"), col("embedding"),
          col("best").getField("cid").as("cid"), col("best").getField("d2").as("d2"))
    }
    // centroid update via posexplode → (cid, pos) decimal sums → per-cell
    // ordered array (the q46 pattern). MEASURED against the "one wide
    // aggregate of 64 decimal sums" alternative: the wide form is 3×
    // SLOWER at sf0.1 — 64 decimal buffers blow past the codegen field
    // budget and the aggregate falls back to interpreted evaluation. The
    // explode costs 64× rows but stays fully codegen'd.
    def recompute(assigned: DataFrame): DataFrame =
      assigned.select(col("cid"), posexplode(col("embedding")))
        .groupBy("cid", "pos")
        .agg((sum(col("col").cast(DoubleType).cast(DecimalType(20, 10)))
          .cast(DoubleType) / count(lit(1))).as("dim_avg"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("dim_avg")))).as("dims"))
        .select(col("cid"),
          transform(col("dims"), d => d.getField("dim_avg")).as("centroid"))
    val a2 = assign(recompute(assign(seeds)))
    // FUSED TAIL (r17 verdict item 8, the q66 pos-0 discipline): the
    // report needs per-cell counts + d2 sums AND the final centroids
    // (per-dim means) — previously two consumers of a2, each replaying
    // the whole two-round Lloyd chain (assign→recompute→assign) from
    // the scan. One posexplode pass now carries everything: the d2 sum
    // and member count ride the per-(cid, pos) aggregate and are read
    // back at pos 0 (embeddings are fixed-dim non-empty, every member
    // has a pos-0 row; the decimal d2 sum has exactly the per-cid terms
    // the old direct aggregate had — order-free, bit-identical). The
    // chain executes ONCE; no corpus-sized checkpoint needed.
    val perPos = a2.select(col("cid"), col("d2"), posexplode(col("embedding")))
      .groupBy("cid", "pos")
      .agg((sum(col("col").cast(DoubleType).cast(DecimalType(20, 10)))
          .cast(DoubleType) / count(lit(1))).as("dim_avg"),
        count(lit(1)).as("n_at_pos"),
        sum(col("d2").cast(DecimalType(25, 8))).as("sum_d2"))
    perPos.groupBy("cid")
      .agg(
        max(when(col("pos") === 0, col("n_at_pos"))).as("n_points"),
        max(when(col("pos") === 0, col("sum_d2"))).as("d2_total"),
        array_sort(collect_list(struct(col("pos"), col("dim_avg")))).as("dims"))
      .select(col("cid"), col("n_points"),
        round(col("d2_total").cast(DoubleType) / col("n_points"), 6).as("mean_d2"),
        round(sqrt(VectorFunctions.norm2(
          transform(col("dims"), d => d.getField("dim_avg")))), 6).as("centroid_norm"))
      .orderBy("cid")
  }

  val q90Sql: String = {
    val dimDec = "CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(20,10))"
    def d2(c: String): String =
      s"${VectorFunctions.dotSql("e.embedding", "e.embedding")} - 2.0 * " +
        s"${VectorFunctions.dotSql("e.embedding", c)} + ${VectorFunctions.dotSql(c, c)}"
    s"""WITH seeds AS (
       | SELECT CAST(vec_id AS INTEGER) AS cid, embedding AS centroid
       | FROM embeddings WHERE vec_id < $KmeansK
       |), a1 AS (
       | SELECT vec_id, embedding, cid FROM (
       |  SELECT e.vec_id, e.embedding, s.cid,
       |   ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |     ORDER BY ${d2("s.centroid")} ASC, s.cid) AS rk
       |  FROM embeddings e CROSS JOIN seeds s) WHERE rk = 1
       |), c1d AS (
       | SELECT cid, i AS pos,
       |  CAST(SUM($dimDec) AS DOUBLE) / COUNT(*) AS dim_avg
       | FROM a1, UNNEST(range(1, len(embedding) + 1)) AS t(i)
       | GROUP BY cid, i
       |), c1 AS (
       | SELECT cid, list(dim_avg ORDER BY pos) AS centroid FROM c1d GROUP BY cid
       |), a2 AS (
       | SELECT vec_id, embedding, cid, d2 FROM (
       |  SELECT e.vec_id, e.embedding, c.cid, ${d2("c.centroid")} AS d2,
       |   ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |     ORDER BY ${d2("c.centroid")} ASC, c.cid) AS rk
       |  FROM embeddings e CROSS JOIN c1 c) WHERE rk = 1
       |), c2d AS (
       | SELECT cid, i AS pos,
       |  CAST(SUM($dimDec) AS DOUBLE) / COUNT(*) AS dim_avg
       | FROM a2, UNNEST(range(1, len(embedding) + 1)) AS t(i)
       | GROUP BY cid, i
       |), c2 AS (
       | SELECT cid, list(dim_avg ORDER BY pos) AS centroid FROM c2d GROUP BY cid
       |)
       |SELECT a.cid, a.n_points, a.mean_d2,
       | ROUND(SQRT(${VectorFunctions.dotSql("c2.centroid", "c2.centroid")}), 6) AS centroid_norm
       |FROM (SELECT cid, COUNT(*) AS n_points,
       |       ROUND(CAST(SUM(CAST(d2 AS DECIMAL(25,8))) AS DOUBLE) / COUNT(*), 6) AS mean_d2
       |      FROM a2 GROUP BY cid) a
       |JOIN c2 ON a.cid = c2.cid
       |ORDER BY a.cid""".stripMargin
  }

  // T26-chain (notebook/ml-model/mlClustering.ipynb): TF-IDF → k-means —
  // the notebook's ACTUAL computation (KMeans over TfidfVectorizer
  // features of line-item labels), here chained from q53's TF-IDF
  // lineage into q90's unrolled Lloyd loop instead of running k-means on
  // the synthetic dense embeddings. Documents become SPARSE vectors over
  // a bounded vocabulary (top-TkVocab tokens by document frequency, via
  // TakeOrdered — never a global row_number over the full token set);
  // distances use the same strictly-sequential double folds as q90
  // (Spark aggregate == DuckDB list_sum(list_transform)), with the
  // sparse dot indexing the dense centroid by dimension, so assignments
  // stay bit-identical cross-engine and the ITERATIVE CHAIN is
  // oracle-checked end to end.
  //
  // Scale shape: the corpus never shuffles with payload attached —
  // assignment is a row-local fold over the broadcast centroid array
  // (q90's zero-shuffle pattern); the update explodes sparse entries
  // (≤ TkVocab per doc) into (cid, dim) decimal sums and densifies on a
  // k×V grid that is always tiny.
  val TkVocab = 32
  val TkK = 6

  /** (doc_id, token, dim, w) TF-IDF weights over the bounded top-TkVocab
    * vocabulary — the shared front of the mlClustering chain, consumed
    * by q105 (sparse vectorization) and q108 (cluster labels).
    */
  /** The bounded top-TkVocab vocabulary: (token, df, dim). Tiny (V
    * rows) — always broadcast by its consumers.
    */
  private[graft] def tfidfVocab(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val tok = d.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // tf >= 1 is a tautology (tf is a count) whose only job is plan
    // shape: consuming the tf VALUE between the two aggregates blocks
    // the optimizer's rewrite of the inner agg into a bare DISTINCT,
    // which keeps this subtree canonically equal to tfidfWeights' tf —
    // exchange reuse then serves the whole q105/q108 chain from ONE
    // corpus scan+explode instead of two (the q53 r17 fix, same defect)
    val dfT = tf.where(col("tf") >= 1).groupBy("token").agg(count(lit(1)).as("df"))
    // top-V vocabulary: orderBy+limit = TakeOrderedAndProject (k-bounded
    // per partition, no global sort). dim = rank within the V rows,
    // computed as a broadcast inequality self-join on the tiny set —
    // (df, token) is unique so rank == row_number — which keeps the
    // q53/q105/q108 chain free of single-partition WindowExec stages.
    val topTok = dfT.orderBy(desc("df"), asc("token")).limit(TkVocab)
    val a = topTok.alias("a")
    val b = topTok.alias("b")
    a.join(broadcast(b),
        col("b.df") > col("a.df") ||
          (col("b.df") === col("a.df") && col("b.token") <= col("a.token")))
      .groupBy(col("a.token").as("token"), col("a.df").as("df"))
      .agg(count(lit(1)).cast(IntegerType).as("dim"))
  }

  private[graft] def tfidfWeights(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    // corpus size for the IDF stays IN-LINEAGE: a one-row aggregate
    // broadcast-crossJoined below, instead of a driver-side d.count()
    // action in the query path (round-6 advice). Same IEEE division.
    val nDocsDf = d.agg(count(lit(1)).cast(DoubleType).as("n_docs"))
    val tok = d.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    tf.join(broadcast(tfidfVocab(s, dir)), Seq("token"))
      .crossJoin(broadcast(nDocsDf))
      .withColumn("w", round(col("tf") * log(col("n_docs") / col("df")), 6))
      .select(col("doc_id"), col("token"), col("dim"), col("w"))
  }

  private def tkDims(s: SparkSession): DataFrame =
    s.range(1, TkVocab + 1).select(col("id").cast(IntegerType).as("dim"))

  // densify (cid, dim, value) sparse triples onto the k×V grid
  private def tkDensify(s: SparkSession, cids: DataFrame, triples: DataFrame,
      value: Column): DataFrame =
    cids.crossJoin(tkDims(s))
      .join(triples, Seq("cid", "dim"), "left_outer")
      .withColumn("dim_val", value)
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("dim"), col("dim_val")))).as("ds"))
      .select(col("cid"),
        transform(col("ds"), x => x.getField("dim_val")).as("centroid"))

  // q90's zero-shuffle assignment: broadcast sorted centroid array,
  // row-local argmin fold with first-strict-improvement = (d2, cid)
  // tiebreak; the sparse dot indexes the dense centroid by dim
  private def tkAssign(docs: DataFrame, cents: DataFrame): DataFrame = {
    val withNorm = cents.withColumn("n2c", VectorFunctions.norm2(col("centroid")))
    val centArr = withNorm.agg(array_sort(collect_list(struct(
      col("cid"), col("centroid"), col("n2c")))).as("cents"))
    docs.join(broadcast(centArr), lit(true))
      .withColumn("best", aggregate(
        col("cents"),
        struct(lit(Double.MaxValue).as("d2"), lit(-1).as("cid")),
        (acc, c) => {
          // native sparse_dot (round 8): same left fold the HOF chain
          // computed — a + w * element_at(centroid, dim) in entry order
          // — as one codegen'd call per centroid (VectorExprsSpec
          // proves bit parity)
          val dt = call_function("sparse_dot",
            col("entries"), c.getField("centroid"))
          val d2 = col("n2x") - lit(2.0) * dt + c.getField("n2c")
          when(d2 < acc.getField("d2"),
            struct(d2.as("d2"), c.getField("cid").as("cid"))).otherwise(acc)
        }))
      .select(col("doc_id"), col("entries"),
        col("best").getField("cid").as("cid"), col("best").getField("d2").as("d2"))
  }

  // centroid update: sparse-entry explode → (cid, dim) DECIMAL sums;
  // mean divides by CLUSTER size (absent dims contribute zero)
  private def tkRecompute(s: SparkSession, assigned: DataFrame): DataFrame = {
    val sums = assigned
      .select(col("cid"), explode(col("entries")).as("e"))
      .groupBy(col("cid"), col("e.dim").as("dim"))
      .agg(sum(col("e.w").cast(DecimalType(20, 6))).as("dim_sum"))
    val sizes = assigned.groupBy("cid").agg(count(lit(1)).as("n"))
    tkDensify(s, sizes, sums,
      coalesce(col("dim_sum").cast(DoubleType), lit(0.0)) / col("n"))
  }

  /** The 2-round Lloyd chain over the sparse TF-IDF vectors; returns the
    * final checkpointed assignment (doc_id, entries, cid, d2).
    */
  private[graft] def tfidfAssignments(s: SparkSession, dir: String): DataFrame =
    tfidfAssignmentsFrom(s, tfidfWeights(s, dir))

  /** The Lloyd chain over a caller-supplied weights frame — q105 passes
    * the lazy [[tfidfWeights]] lineage (unchanged plan), while the
    * label/LDA consumers pass an already-checkpointed weights frame so
    * the whole q108/q132 chain costs ONE corpus scan (r17 opt: the
    * second `tfidfVocab` call re-derived the vocabulary from a fresh
    * corpus tokenize+tf aggregate — exchange reuse cannot cross query
    * executions, so the checkpoint barrier is the only sharing shape).
    */
  private[graft] def tfidfAssignmentsFrom(s: SparkSession, weights: DataFrame): DataFrame = {
    // localCheckpoint BARRIER: the TF-IDF frame feeds both assignment
    // passes, and each pass's output is itself consumed twice — without
    // a barrier the tokenize→tf→df→join→collect_list lineage re-runs ~5
    // times (round-6 verdict: 12-15 s at sf0.1; at 100 TB, 5 corpus
    // scans where one + checkpoint does). The frame is the SPARSE
    // vectorization — ≤ TkVocab (dim, w) pairs per doc — so it is far
    // smaller than the token stream it derives from. A/B in SURVEY §8.
    val docs = weights
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("dim"), col("w")))).as("entries"))
      .withColumn("n2x", aggregate(col("entries"), lit(0.0),
        (a, e) => a + e.getField("w") * e.getField("w")))
      .localCheckpoint()
    val seedTriples = docs.filter(col("doc_id") < TkK)
      .select(col("doc_id").cast(IntegerType).as("cid"), explode(col("entries")).as("e"))
      .select(col("cid"), col("e.dim").as("dim"), col("e.w").as("wv"))
    val seedCids = docs.filter(col("doc_id") < TkK)
      .select(col("doc_id").cast(IntegerType).as("cid"))
    val seeds = tkDensify(s, seedCids, seedTriples, coalesce(col("wv"), lit(0.0)))
    // second barrier: the final assignment feeds both the centroid
    // recompute and the output aggregate — checkpoint once so the second
    // Lloyd pass (and everything above it) is not replayed per consumer.
    // One materialization per Lloyd round, each round's lineage
    // truncated — the standard iterative-refinement shape.
    tkAssign(docs, tkRecompute(s, tkAssign(docs, seeds))).localCheckpoint()
  }

  def q105TfidfKmeans(s: SparkSession, dir: String): DataFrame = {
    val a2 = tfidfAssignments(s, dir)
    val c2 = tkRecompute(s, a2)
    a2.groupBy("cid")
      .agg(count(lit(1)).as("n_points"),
        round(sum(col("d2").cast(DecimalType(25, 8))).cast(DoubleType) /
          count(lit(1)), 6).as("mean_d2"))
      .join(c2, Seq("cid"))
      .select(col("cid"), col("n_points"), col("mean_d2"),
        round(sqrt(VectorFunctions.norm2(col("centroid"))), 6).as("centroid_norm"))
      .orderBy("cid")
  }

  // T26c (notebook/ml-model/mlClustering.ipynb cells 19-25 + the
  // committed LDA_asset.csv / LDA_liability.csv): CLUSTER-LABEL NAMING.
  // The reference follows its k-means with a per-cluster 1-topic
  // LatentDirichletAllocation to surface a root word naming each
  // cluster. A 1-topic LDA's top word over a cluster's documents is
  // (up to smoothing) the cluster's dominant aggregate term weight, so
  // the declarative twin is EXACT: per (cid, token) sum the TF-IDF
  // weights of q105's assigned documents (decimal-exact, order-free)
  // and keep the top term per cluster with an alphabetical tiebreak —
  // the notebook's label table, oracle-checked.
  //
  // Scale shape: one keyed aggregate over (cid, token) — bounded by the
  // TkVocab vocabulary join upstream — then a window over ≤ k×V rows.
  def q108ClusterLabels(s: SparkSession, dir: String): DataFrame = {
    val wC = Window.partitionBy("cid").orderBy(desc("score_dec"), asc("token"))
    clusterTermSums(s, dir)
      .withColumn("rk", row_number().over(wC))
      .filter(col("rk") === 1)
      .select(col("cid"), col("token").as("label_term"),
        round(col("score_dec"), 6).cast(DoubleType).as("score"), col("n_docs"))
      .orderBy("cid")
  }

  /** Per-(cluster, token) decimal-exact TF-IDF weight sums — the shared
    * sufficient statistic of q108 (argmax label) and q132 (the actual
    * 1-topic LDA fit). The checkpointed assignment already CARRIES every
    * (dim, w) weight of every assigned document — exploding it is
    * strictly cheaper than re-deriving the (doc_id, token, w) frame from
    * the corpus (a second tokenize→tf→join lineage = one extra corpus
    * scan at 100 TB). Tokens are recovered from the broadcast V-row
    * vocab.
    */
  private def clusterTermSums(s: SparkSession, dir: String): DataFrame = {
    // ONE corpus scan for the whole labeling chain (r17 opt): checkpoint
    // the (doc_id, token, dim, w) weights frame and derive BOTH the
    // assignment chain and the token recovery from it. The previous form
    // exploded the assignment's (dim, w) entries and joined a SECOND
    // tfidfVocab lineage for dim→token — a fresh corpus tokenize + tf
    // aggregate per q108/q132 run (SweepDiag: the 1.6 MB tf exchange
    // written twice at sf0.1), because exchange reuse cannot cross the
    // checkpoint's query-execution boundary. Grouping by (cid, dim,
    // token) over the checkpointed weights joined to the assignment is
    // the same row multiset (dim↔token is 1:1 within the vocabulary,
    // and the entries' w values ARE the weights' w values), and the
    // decimal sum is order-exact — oracle rows unchanged.
    val wts = tfidfWeights(s, dir).localCheckpoint()
    tfidfAssignmentsFrom(s, wts)
      .select(col("doc_id"), col("cid"))
      .join(wts, Seq("doc_id"))
      .groupBy(col("cid"), col("dim"), col("token"))
      .agg(sum(col("w").cast(DecimalType(20, 6))).as("score_dec"),
        count(lit(1)).as("n_docs"))
  }

  // T26d (notebook/ml-model/mlClustering.ipynb cells 19-25): the ACTUAL
  // per-cluster 1-topic LatentDirichletAllocation FIT — not just its
  // argmax. The notebook's label_LDA (cell 20) vectorizes each cluster's
  // strings with TfidfVectorizer and calls
  // LatentDirichletAllocation(n_components=1).fit on those TF-IDF
  // features (cells 22/24), then reads the top feature names off
  // mdl.components_. For K=1 the variational EM is degenerate and
  // converges EXACTLY after one M-step: every word's topic
  // responsibility is forced to 1 (there is only one topic), so the
  // fitted variational parameter is
  //     components_[0][w] = lambda_w = eta + sum_d x_{d,w}
  // with eta = topic_word_prior defaulting to 1/n_components = 1.0 and
  // x the TF-IDF feature matrix — i.e. the fit's sufficient statistic
  // IS q108's per-(cid, token) weight sum. Further iterations are
  // fixpoints, so a "fixed iteration count" is exactly 1 and the full
  // fit is oracle-replayable in closed form. The expected topic-word
  // distribution E[beta_w] = lambda_w / sum_v lambda_v is emitted in
  // exact integer MICRO-units (weights are 6-dp decimals, so
  // lambda*1e6 is an exact BIGINT; floor division is bit-identical
  // cross-engine), with absent vocabulary words contributing their
  // prior eta to the normalizer.
  //
  // Scale shape: identical to q108 — one keyed aggregate over the
  // vocab-bounded (cid, dim) grid, then a window + top-k over ≤ k×V
  // rows. lam_u stays < ~1e12 at any plausible corpus (sum of 6-dp
  // weights), so 1e6*lam_u is overflow-safe in BIGINT.
  val LdaTopWords = 5 // the notebook prints the 5 most important words

  def q132LdaFit(s: SparkSession, dir: String): DataFrame = {
    val lam = clusterTermSums(s, dir)
      .withColumn("lam_u",
        (col("score_dec") * 1000000).cast(LongType) + 1000000L)
    // normalizer over the FULL V-word vocabulary: absent (cid, token)
    // cells hold lambda = eta exactly (1e6 in micro-units)
    val dens = lam.groupBy("cid")
      .agg((sum(col("lam_u")) + lit(1000000L) * (lit(TkVocab) - count(lit(1))))
        .as("den_u"))
    val wC = Window.partitionBy("cid").orderBy(desc("lam_u"), asc("token"))
    lam
      .withColumn("rk", row_number().over(wC))
      .filter(col("rk") <= LdaTopWords)
      .join(dens, Seq("cid"))
      .withColumn("beta_micro", expr("(1000000 * lam_u) DIV den_u"))
      .select(col("cid"), col("rk"), col("token"), col("lam_u"), col("beta_micro"))
      .orderBy("cid", "rk")
  }

  /** SQL twin of [[q132LdaFit]] — same shared a2 chain, same integer
    * micro-unit lambda/beta arithmetic (DuckDB `//` == Spark `DIV` on
    * positive BIGINTs).
    */
  val q132Sql: String =
    s"""WITH ${tkChainCtes}, scored AS (
       | SELECT a.cid, wt.token,
       |  SUM(CAST(wt.w AS DECIMAL(20,6))) AS score_dec
       | FROM weights wt JOIN a2 a USING (doc_id)
       | GROUP BY a.cid, wt.token
       |), lam AS (
       | SELECT cid, token,
       |  CAST(score_dec * 1000000 AS BIGINT) + 1000000 AS lam_u
       | FROM scored
       |), dens AS (
       | SELECT cid,
       |  CAST(SUM(lam_u) + 1000000 * ($TkVocab - COUNT(*)) AS BIGINT) AS den_u
       | FROM lam GROUP BY cid
       |)
       |SELECT l.cid, CAST(l.rk AS INTEGER) AS rk, l.token, l.lam_u,
       | (1000000 * l.lam_u) // d.den_u AS beta_micro
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY cid
       |        ORDER BY lam_u DESC, token) AS rk FROM lam) l
       |JOIN dens d USING (cid)
       |WHERE l.rk <= $LdaTopWords
       |ORDER BY l.cid, l.rk""".stripMargin

  // (identical tail shape to q90 above, but HERE the final assignment is
  // checkpointed: q105's upstream is the whole TF-IDF lineage, so per-
  // consumer replay is a corpus re-scan, not a cheap fold re-run.)
  //
  // The CTE chain through the final assignment `a2` is shared between
  // q105Sql and q108Sql, mirroring the shared tfidfWeights/
  // tfidfAssignments core on the Spark side.
  private def tkChainCtes: String = {
    val sparseDot =
      "list_sum(list_transform(d.entries, e -> struct_extract(e, 'w') * " +
        "list_extract(c.centroid, struct_extract(e, 'dim'))))"
    def d2Expr: String = s"(d.n2x - 2.0 * $sparseDot + c.n2c)"
    val nrm = VectorFunctions.dotSql("centroid", "centroid")
    s"""tf_t AS (
       | SELECT doc_id, token, COUNT(*) AS tf
       | FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents)
       | WHERE LENGTH(token) > 0 GROUP BY doc_id, token
       |), df_t AS (
       | SELECT token, COUNT(*) AS df FROM tf_t GROUP BY token
       |), vocab AS (
       | SELECT token, df, ROW_NUMBER() OVER (ORDER BY df DESC, token) AS dim
       | FROM df_t QUALIFY dim <= $TkVocab
       |), weights AS (
       | SELECT t.doc_id, v.token, v.dim,
       |  ROUND(t.tf * LN(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / v.df), 6) AS w
       | FROM tf_t t JOIN vocab v USING (token)
       |), docs AS (
       | SELECT doc_id,
       |  list(struct_pack(dim := dim, w := w) ORDER BY dim) AS entries,
       |  list_sum(list(w * w ORDER BY dim)) AS n2x
       | FROM weights
       | GROUP BY doc_id
       |), dims AS (SELECT UNNEST(range(1, $TkVocab + 1)) AS dim
       |), seed_sparse AS (
       | SELECT CAST(doc_id AS INTEGER) AS cid, struct_extract(e, 'dim') AS dim,
       |  struct_extract(e, 'w') AS wv
       | FROM docs, UNNEST(entries) AS u(e) WHERE doc_id < $TkK
       |), seeds AS (
       | SELECT g.cid, list(COALESCE(s.wv, 0.0) ORDER BY g.dim) AS centroid
       | FROM (SELECT cid, dim FROM (SELECT DISTINCT CAST(doc_id AS INTEGER) AS cid
       |        FROM docs WHERE doc_id < $TkK), dims) g
       | LEFT JOIN seed_sparse s ON g.cid = s.cid AND g.dim = s.dim
       | GROUP BY g.cid
       |), cents0 AS (SELECT cid, centroid, $nrm AS n2c FROM seeds
       |), a1 AS (
       | SELECT doc_id, entries, n2x, cid FROM (
       |  SELECT d.doc_id, d.entries, d.n2x, c.cid,
       |   ROW_NUMBER() OVER (PARTITION BY d.doc_id ORDER BY $d2Expr ASC, c.cid) AS rk
       |  FROM docs d CROSS JOIN cents0 c) WHERE rk = 1
       |), c1d AS (
       | SELECT cid, struct_extract(e, 'dim') AS dim,
       |  SUM(CAST(struct_extract(e, 'w') AS DECIMAL(20,6))) AS dim_sum
       | FROM a1, UNNEST(entries) AS u(e) GROUP BY 1, 2
       |), c1 AS (
       | SELECT g.cid, list(COALESCE(CAST(s.dim_sum AS DOUBLE), 0.0) / g.n ORDER BY g.dim) AS centroid
       | FROM (SELECT cid, n, dim FROM (SELECT cid, COUNT(*) AS n FROM a1 GROUP BY cid), dims) g
       | LEFT JOIN c1d s ON g.cid = s.cid AND g.dim = s.dim
       | GROUP BY g.cid
       |), cents1 AS (SELECT cid, centroid, $nrm AS n2c FROM c1
       |), a2 AS (
       | SELECT doc_id, entries, cid, d2 FROM (
       |  SELECT d.doc_id, d.entries, c.cid, $d2Expr AS d2,
       |   ROW_NUMBER() OVER (PARTITION BY d.doc_id ORDER BY $d2Expr ASC, c.cid) AS rk
       |  FROM docs d CROSS JOIN cents1 c) WHERE rk = 1
       |)""".stripMargin
  }

  val q105Sql: String =
    s"""WITH ${tkChainCtes}, c2d AS (
       | SELECT cid, struct_extract(e, 'dim') AS dim,
       |  SUM(CAST(struct_extract(e, 'w') AS DECIMAL(20,6))) AS dim_sum
       | FROM a2, UNNEST(entries) AS u(e) GROUP BY 1, 2
       |), c2 AS (
       | SELECT g.cid, list(COALESCE(CAST(s.dim_sum AS DOUBLE), 0.0) / g.n ORDER BY g.dim) AS centroid
       | FROM (SELECT cid, n, dim FROM (SELECT cid, COUNT(*) AS n FROM a2 GROUP BY cid), dims) g
       | LEFT JOIN c2d s ON g.cid = s.cid AND g.dim = s.dim
       | GROUP BY g.cid
       |)
       |SELECT a.cid, a.n_points, a.mean_d2,
       | ROUND(SQRT(${VectorFunctions.dotSql("c2.centroid", "c2.centroid")}), 6) AS centroid_norm
       |FROM (SELECT cid, COUNT(*) AS n_points,
       |       ROUND(CAST(SUM(CAST(d2 AS DECIMAL(25,8))) AS DOUBLE) / COUNT(*), 6) AS mean_d2
       |      FROM a2 GROUP BY cid) a
       |JOIN c2 ON a.cid = c2.cid
       |ORDER BY a.cid""".stripMargin

  /** SQL twin of [[q108ClusterLabels]] — same decimal-exact per-(cid,
    * token) weight sums over the shared a2 assignment chain, same
    * (score DESC, token) tiebreak.
    */
  val q108Sql: String =
    s"""WITH ${tkChainCtes}, scored AS (
       | SELECT a.cid, wt.token,
       |  SUM(CAST(wt.w AS DECIMAL(20,6))) AS score_dec,
       |  COUNT(*) AS n_docs
       | FROM weights wt JOIN a2 a USING (doc_id)
       | GROUP BY a.cid, wt.token
       |)
       |SELECT cid, token AS label_term,
       | CAST(ROUND(score_dec, 6) AS DOUBLE) AS score, n_docs
       |FROM (
       | SELECT *, ROW_NUMBER() OVER (PARTITION BY cid
       |   ORDER BY score_dec DESC, token) AS rk
       | FROM scored)
       |WHERE rk = 1
       |ORDER BY cid""".stripMargin

  val q81Sql: String = {
    val dotAB = VectorFunctions.dotSql("a.embedding", "b.embedding")
    val nrm = VectorFunctions.dotSql("embedding", "embedding")
    s"""WITH n AS (SELECT vec_id, label, embedding, SQRT($nrm) AS nrm
       |           FROM embeddings WHERE $nrm > 0),
       |d AS (
       |  SELECT b.vec_id AS b_id, MIN(a.vec_id) AS dup_of
       |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
       |  WHERE ROUND($dotAB / (a.nrm * b.nrm), 6) >= $SemDedupTau
       |  GROUP BY b.vec_id)
       |SELECT e.vec_id, e.label, d.dup_of, d.dup_of IS NULL AS kept
       |FROM embeddings e LEFT JOIN d ON e.vec_id = d.b_id
       |ORDER BY e.vec_id""".stripMargin
  }

  // T37: contrastive-pair mining — for each probe, the nearest SAME-label
  // vector (the retrieval positive) and the nearest DIFFERENT-label
  // vector (the HARD negative, the most confusable impostor), plus the
  // margin between them — the pair-selection step of contrastive /
  // metric-learning data prep (hard negatives train the boundary;
  // near-zero or negative margins flag label noise).
  // Scale shape: probes broadcast (q45's exact-baseline form — the
  // scale path at full corpus is routing through q46's IVF cells);
  // scoring is map-side native vec_dot; the (probe, is_pos) keyed
  // window picks both winners in ONE shuffle of (ids, cos) rows — the
  // embedding payload never enters the exchange. Determinism: cos is
  // round(dot/(n1·n2), 6) on strictly-sequential folds (bit-identical
  // in DuckDB), ties break on vec_id.
  val MarginProbes = 50

  def q121HardNegatives(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .withColumn("nrm", sqrt(VectorFunctions.norm2(col("embedding"))))
      .filter(col("nrm") > 0)
    val probes = e.filter(col("vec_id") < MarginProbes)
      .select(col("vec_id").as("probe_id"), col("label").as("probe_label"),
        col("embedding").as("probe_vec"), col("nrm").as("probe_nrm"))
    val w = Window.partitionBy("probe_id", "is_pos")
      .orderBy(desc("cos"), asc("vec_id"))
    e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("cos",
        round(VectorFunctions.dot(col("probe_vec"), col("embedding")) /
          (col("probe_nrm") * col("nrm")), 6))
      .withColumn("is_pos", col("label") === col("probe_label"))
      .select("probe_id", "probe_label", "vec_id", "cos", "is_pos")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .groupBy("probe_id", "probe_label")
      .agg(
        max(when(col("is_pos"), col("vec_id"))).as("pos_id"),
        max(when(col("is_pos"), col("cos"))).as("pos_cos"),
        max(when(!col("is_pos"), col("vec_id"))).as("neg_id"),
        max(when(!col("is_pos"), col("cos"))).as("neg_cos"))
      .withColumn("margin", round(col("pos_cos") - col("neg_cos"), 6))
      .orderBy("probe_id")
  }

  val q121Sql: String = {
    val dot = VectorFunctions.dotSql("p.embedding", "x.embedding")
    val nrm = s"SQRT(${VectorFunctions.dotSql("embedding", "embedding")})"
    s"""WITH e AS (
       |  SELECT * FROM (SELECT *, $nrm AS nrm FROM embeddings) WHERE nrm > 0),
       |scored AS (
       |  SELECT p.vec_id AS probe_id, p.label AS probe_label,
       |   x.vec_id AS vec_id, x.label = p.label AS is_pos,
       |   ROUND($dot / (p.nrm * x.nrm), 6) AS cos
       |  FROM e p JOIN e x ON x.vec_id <> p.vec_id
       |  WHERE p.vec_id < $MarginProbes),
       |best AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id, is_pos
       |    ORDER BY cos DESC, vec_id) AS rk
       |  FROM scored)
       |SELECT probe_id, probe_label,
       | MAX(CASE WHEN is_pos THEN vec_id END) AS pos_id,
       | MAX(CASE WHEN is_pos THEN cos END) AS pos_cos,
       | MAX(CASE WHEN NOT is_pos THEN vec_id END) AS neg_id,
       | MAX(CASE WHEN NOT is_pos THEN cos END) AS neg_cos,
       | ROUND(MAX(CASE WHEN is_pos THEN cos END)
       |   - MAX(CASE WHEN NOT is_pos THEN cos END), 6) AS margin
       |FROM best WHERE rk = 1
       |GROUP BY probe_id, probe_label ORDER BY probe_id""".stripMargin
  }
}
