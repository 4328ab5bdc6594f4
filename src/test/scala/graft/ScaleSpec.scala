package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Scale-technique demonstrations (SURVEY.md §5): salted joins produce
  * identical results to plain joins while spreading hot keys, and
  * bucketed tables co-locate a join with NO shuffle exchange.
  */
class ScaleSpec extends GraftSpec {

  test("salted join equals plain join, with the big side spread across salts") {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("o_custkey"), col("c_name"), col("c_nationkey"))

    val plain = o.join(c, Seq("o_custkey"))
      .select("o_orderkey", "c_name")
    val salted = SkewJoin.saltedJoin(o, c, "o_custkey",
      saltSource = col("o_orderkey"), buckets = 8)
      .select("o_orderkey", "c_name")

    assert(plain.except(salted).count() == 0)
    assert(salted.except(plain).count() == 0)
    assert(plain.count() == salted.count()) // same multiset size
  }

  test("bucketed tables join without a shuffle exchange") {
    val sp = spark
    try {
      Tables.orders(sp, sfDir).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
      Tables.lineitem(sp, sfDir).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")

      val joined = sp.table("lineitem_b").join(
        sp.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed join: no hash-partition exchange on either side
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() == Tables.lineitem(sp, sfDir).count())
    } finally {
      sp.sql("DROP TABLE IF EXISTS orders_b")
      sp.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
