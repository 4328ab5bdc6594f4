package graft

/** The input-size-aware shuffle-partition rule (r15 verdict item 4):
  * the measured 96-partition floor at the 5M-doc posting rung as an
  * executable derivation instead of JSON-artifact prose.
  */
class ShuffleRuleSpec extends GraftSpec {

  test("derived partition counts at the measured anchor points") {
    // driver-scale input: cores floor (AQE coalesces below it anyway)
    assert(GraftSession.deriveShufflePartitions(100L << 20, 32) === 32)
    // the 5M-doc rung: 874 MB of documents parquet -> 110, at the
    // measured 96-partition stall floor (PostingProbe r15)
    assert(GraftSession.deriveShufflePartitions(874L << 20, 32) === 110)
    assert(GraftSession.deriveShufflePartitions(874L << 20, 32) >= 96)
    // runaway inputs cap at 32x cores
    assert(GraftSession.deriveShufflePartitions(1L << 40, 32) === 1024)
    // tiny cores still floor at cores
    assert(GraftSession.deriveShufflePartitions(0L, 4) === 4)
  }

  test("autoShuffled is opt-in, derives from real file bytes, and never changes results") {
    val docsPath = s"$sfDir/documents.parquet"
    val before = spark.conf.get("spark.sql.shuffle.partitions")

    // off by default: the caller's own session comes back, untouched
    assert(GraftSession.autoShuffled(spark, docsPath) eq spark)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before)

    val baseline = operators.Dedup.q41NgramJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("spark.graft.autoShufflePartitions", "true")
    try {
      val child = GraftSession.autoShuffled(spark, docsPath)
      val bytes = GraftSession.scanBytes(spark, docsPath)
      assert(bytes > 0L)
      val derived = GraftSession.deriveShufflePartitions(
        bytes, spark.sparkContext.defaultParallelism)
      assert(child.conf.get("spark.sql.shuffle.partitions")
        === derived.toString)
      // r16 hygiene: the derived value is scoped to the child — the
      // caller's conf is untouched DURING and AFTER the opted-in build
      assert(spark.conf.get("spark.sql.shuffle.partitions") === before,
        "the rule must never mutate the caller session's conf")
      // the child carries the parent's dials (the r12 full-conf copy)
      assert(child.conf.get("spark.graft.autoShufflePartitions") === "true")
      // partitioning-invariance: the dialed plan computes the same rows
      val dialed = operators.Dedup.q41NgramJaccard(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(dialed === baseline, "the dial must never change results")
      // a query following an auto-shuffled one sees the entry conf
      assert(spark.conf.get("spark.sql.shuffle.partitions") === before)
    } finally {
      spark.conf.unset("spark.graft.autoShufflePartitions")
      spark.conf.set("spark.sql.shuffle.partitions", before)
    }
  }
}
