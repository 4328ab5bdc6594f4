package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFunctions

/** T2/T3/T4 near-dup detection: LSH candidate recall vs the exact
  * Jaccard ground truth, shingle semantics, simhash locality.
  */
class DedupSpec extends GraftSpec {

  test("shingles produces word 3-grams") {
    import spark.implicits._
    val out = Seq("a b c d e").toDF("text")
      .select(TextFunctions.shingles(col("text"), 3).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("a b c", "b c d", "c d e"))
  }

  test("shingles on short text is empty, not inverted") {
    import spark.implicits._
    val out = Seq("a b").toDF("text")
      .select(TextFunctions.shingles(col("text"), 3).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(out.isEmpty)
  }

  test("minhash LSH recalls every high-jaccard pair found exactly") {
    val exact = Dedup.q41NgramJaccard(spark, sfDir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.q42MinhashLsh(spark, sfDir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // j >= 0.8 pairs survive 8x4 banding with probability ~1 - (1-0.8^4)^8 > 0.97;
    // on the planted corpus recall should be total.
    assert(exact.subsetOf(lsh), s"missing: ${exact.diff(lsh)}")
  }

  test("cluster resolution is transitive with one keeper per component") {
    import spark.implicits._
    // components: {1,2,3} via chain 1-2, 2-3; {5,9}; singleton pairs absent
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 9L)).toDF("d1", "d2")
    val out = Dedup.resolveClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (5L, 5L, true), (9L, 5L, false)))
  }

  test("exact dedup groups by content hash with min-id keeper") {
    val out = Dedup.q40DedupExact(spark, sfDir)
    val total = out.agg(sum("n_copies")).collect()(0).getLong(0)
    val docs = Tables.documents(spark, sfDir).count()
    assert(total == docs)
  }

  test("simhash of identical docs is identical, near-dup hamming small") {
    import spark.implicits._
    // identical texts -> hamming 0 via the full pipeline on a tiny corpus
    val twoSame = Seq((1L, "x y z w v u t s r q p"), (2L, "x y z w v u t s r q p"))
      .toDF("doc_id", "text")
    twoSame.createOrReplaceTempView("documents_tiny")
    // run the core of q43 on the tiny set by temp-swapping the loader path
    // (cheap: recompute simhash directly)
    val tok = twoSame.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .withColumn("h", xxhash64(col("token")))
    val bitSums = (0 until Dedup.SimBits).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(1L) * 2 - 1).as(s"b_$j"))
    val agged = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until Dedup.SimBits).map(j =>
      when(col(s"b_$j") > 0, lit(1L << j)).otherwise(0L))
      .reduce((a, b) => a.bitwiseOR(b))
    val hs = agged.withColumn("sh", simhash).select("sh").collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
  }
}
