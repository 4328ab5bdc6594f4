package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Cross-cutting operator assertions that the DuckDB oracle can't cover
  * (rows-only queries) plus semantic invariants of the oracle-checked
  * ones.
  */
class OperatorSpec extends GraftSpec {

  test("q28 hashed-TF classifier is deterministic and total") {
    val a = Classify.q28ClassifyLr(spark, sfDir).collect()
    val b = Classify.q28ClassifyLr(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.forall(r => r.getInt(1) >= 0 && r.getInt(1) < Classify.NumClasses))
    assert(a.length == Tables.documents(spark, sfDir).count())
  }

  test("q46 IVF results are a subset of the routed cell and well-ranked") {
    val out = Similarity.q46AnnIvf(spark, sfDir).collect()
    val byProbe = out.groupBy(_.getLong(0))
    byProbe.foreach { case (_, rows) =>
      val ranks = rows.map(_.getLong(2)).toSeq.sorted
      assert(ranks == (1L to ranks.size))
      // ordered by rank => cosine non-increasing
      val cosines = rows.sortBy(_.getLong(2)).map(_.getDouble(4))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y })
    }
  }

  test("q51 multimodal features are reproducible and payload-derived") {
    val a = Multimodal.q51MultimodalMeta(spark, sfDir).collect()
    assert(a.length == Tables.documents(spark, sfDir).count())
    val d0 = a.find(_.getLong(0) == 0L).get
    // payload is utf8(text): n_bytes must equal byte length of the text
    val text0 = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 0).collect()(0).getAs[String]("text")
    assert(d0.getInt(4) == text0.getBytes("UTF-8").length)
    val (n, mean, sum) = Multimodal.decodeStub(text0.getBytes("UTF-8"))
    assert(d0.getDouble(5) == mean && d0.getLong(6) == sum && d0.getInt(4) == n)
  }

  test("q13 approx distinct stays within the configured error bound on this corpus") {
    val rows = Relational.q13ApproxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(2)
      val approx = r.getLong(3)
      assert(math.abs(approx - exact).toDouble / exact <= 0.15,
        s"approx $approx too far from exact $exact")
    }
  }

  test("q42 LSH pair estimates correlate with exact jaccard") {
    val est = Dedup.q42MinhashLsh(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val exact = Dedup.q41NgramJaccard(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    val common = est.keySet.intersect(exact.keySet)
    assert(common.nonEmpty)
    common.foreach { k =>
      assert(math.abs(est(k) - exact(k)) <= 0.3,
        s"pair $k: est ${est(k)} vs exact ${exact(k)}")
    }
  }
}
