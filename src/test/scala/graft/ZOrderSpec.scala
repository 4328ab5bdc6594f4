package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Extended

/** R56's layout EFFECT, on real parquet: clustering files by the Morton
  * z-value must let a min/max file-pruning scan skip files for filters on
  * EITHER key dimension, where a single-column sort layout can only ever
  * prune on its leading key. This is the property the q122 bounding-box
  * report quantifies in-engine; here it is exercised the way a
  * table-maintenance job would actually lay files out.
  *
  * Determinism: files are cut at EXACT ntile quantiles of the layout key
  * (not repartitionByRange, whose reservoir-sampled boundaries made the
  * round-8 assertion flaky) and written via partitionBy, so the per-file
  * bounds are a pure function of the data and the assertions are stable.
  */
class ZOrderSpec extends GraftSpec {

  test("z-order files prune on the non-leading dim; pk-sorted files cannot") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val keyed = Extended.zKeyed(spark, sfDir).select("pk", "sk", "z")
    val nFiles = 16

    // exact quantile buckets of the layout key -> one dir per bucket.
    // The global ntile window is test-only scaffolding over sf0.001; the
    // production layout path is q122 / repartitionByRange.
    def layout(keyCol: String, path: String): Unit =
      keyed.withColumn("bucket", ntile(nFiles).over(Window.orderBy(col(keyCol))))
        .write.partitionBy("bucket").mode("overwrite").parquet(path)
    layout("z", s"$dir/z")
    layout("pk", s"$dir/pk")

    // per-bucket key bounds — what a footer-stats pruning scan consults
    def bounds(path: String): Seq[(Long, Long, Long, Long)] =
      new java.io.File(path).listFiles()
        .filter(_.getName.startsWith("bucket=")).toSeq.map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min("pk"), max("pk"), min("sk"), max("sk")).head
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }
    val zB = bounds(s"$dir/z")
    val pB = bounds(s"$dir/pk")
    assert(zB.length == nFiles && pB.length == nFiles)

    val skLo = zB.map(_._3).min
    val skHi = zB.map(_._4).max
    val pkLo = zB.map(_._1).min
    val pkHi = zB.map(_._1).max
    // a narrow range filter on sk ALONE (1/8 of its domain, mid-range)
    val qLo = skLo + (skHi - skLo) / 2
    val qHi = qLo + (skHi - skLo) / 8
    def skHits(b: Seq[(Long, Long, Long, Long)]): Int =
      b.count(t => t._3 <= qHi && t._4 >= qLo)
    // pk-sorted layout: every file spans the full sk range — zero skipping
    assert(skHits(pB) == nFiles, s"pk layout unexpectedly pruned: ${skHits(pB)}")
    // z layout: comparative bound — it must skip a meaningful fraction of
    // files on sk's min/max where the pk layout skips none (margin leaves
    // room for testdata regeneration; the value itself is deterministic)
    assert(skHits(zB) <= nFiles * 3 / 4,
      s"z layout pruned too little on sk: ${skHits(zB)} of $nFiles files match")

    // and the z layout still prunes on pk as well (both dims clustered)
    val pLo = pkLo + (pkHi - pkLo) / 2
    val pHi = pLo + (pkHi - pkLo) / 8
    val pkMatchZ = zB.count(t => t._1 <= pHi && t._2 >= pLo)
    assert(pkMatchZ <= nFiles * 3 / 4,
      s"z layout pruned too little on pk: $pkMatchZ of $nFiles files match")

    // sanity: both layouts carry identical data
    val a = spark.read.parquet(s"$dir/z").agg(count(lit(1)), sum("pk"), sum("sk")).head
    val b = spark.read.parquet(s"$dir/pk").agg(count(lit(1)), sum("pk"), sum("sk")).head
    assert(a == b)
  }
}

/** Companion check: run the pruning measurement twice and assert the
  * z-layout hit count is identical — the determinism that makes the
  * bound above a real invariant rather than a sampled one.
  */
class ZOrderDeterminismSpec extends GraftSpec {
  test("quantile layout yields identical file bounds across runs") {
    val keyed = graft.operators.Extended.zKeyed(spark, sfDir).select("pk", "sk", "z")
    def cut(): Seq[(Long, Long)] =
      keyed.withColumn("bucket", ntile(8).over(Window.orderBy(col("z"))))
        .groupBy("bucket").agg(min("sk").as("lo"), max("sk").as("hi"))
        .orderBy("bucket").collect().toSeq.map(r => (r.getLong(1), r.getLong(2)))
    assert(cut() == cut())
  }
}
