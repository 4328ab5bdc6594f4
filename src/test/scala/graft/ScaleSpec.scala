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

  test("AQE splits a skewed join partition at runtime") {
    val sp = spark
    import sp.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffled join
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8KB")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one white-hot key among 100 cold ones; md5 payload defeats shuffle
      // compression so the hot partition's bytes actually register
      val big = sp.range(0, 50000)
        .select(lit(7L).as("k"), md5(col("id").cast("string")).as("payload"))
        .union(sp.range(0, 1000).select((col("id") % 100).as("k"),
          md5(col("id").cast("string")).as("payload")))
      val dim = sp.range(0, 200).select(col("id").as("k"), (col("id") * 2).as("v"))
      // downstream must not REQUIRE the join's hash partitioning (a keyed
      // agg on k would make AQE decline the split to avoid a re-shuffle);
      // a global aggregate only needs partial per-partition work
      val joined = big.join(dim, Seq("k"))
        .agg(sum(length(col("payload"))).as("bytes"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"expected AQE skew handling in:\n$plan")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
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
