package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

import graft.operators.Relational
import graft.plans.{AsOf, AsOfJoinExec}

/** The custom-plan extension points: native as-of join (logical node +
  * strategy + sort-merge physical operator) and the broadcast-guard
  * optimizer rule.
  */
class CustomPlanSpec extends GraftSpec with AdaptiveSparkPlanHelper {

  test("native as-of join equals the window-over-union composition") {
    val native = Relational.q78AsofNative(spark, sfDir).collect()
    val composed = Relational.q10AsofJoin(spark, sfDir).collect()
    assert(native.length == composed.length)
    native.zip(composed).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("as-of physical plan is the custom operator with one shuffle per side") {
    val df = Relational.q78AsofNative(spark, sfDir)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) { case e: AsOfJoinExec => e }.nonEmpty,
      plan.toString)
    // exactly two exchanges below the as-of join (one per side); the final
    // orderBy adds its own range exchange above it
    val asOf = collectWithSubqueries(plan) { case e: AsOfJoinExec => e }.head
    val below = collect(asOf) { case s: ShuffleExchangeLike => s }
    assert(below.length == 2, plan.toString)
  }

  test("as-of join handles keys with no right rows and empty partitions") {
    val sp = spark
    import sp.implicits._
    val left = Seq((1L, 10L, 1L), (1L, 20L, 2L), (2L, 15L, 3L), (3L, 5L, 4L))
      .toDF("k", "t", "id")
    val right = Seq((1L, 10L, 100L, 7.0), (1L, 15L, 101L, 8.0), (2L, 99L, 102L, 9.0))
      .toDF("k", "t", "id", "v")
    val out = AsOf.join(left, right,
        on = Seq("k" -> "k"), time = "t" -> "t", seq = "id" -> "id",
        values = Seq("v" -> "last_v", "t" -> "last_t"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq(
      (1L, 1L, None, None),             // tie at t=10 but right seq 100 > left seq 1: after
      (1L, 2L, Some(8.0), Some(15L)),   // latest of the two earlier rights wins
      (2L, 3L, None, None),             // right at t=99 is in the future
      (3L, 4L, None, None)))            // no right rows for key 3
  }

  test("as-of join refuses ambiguous column names instead of binding the first") {
    val sp = spark
    import sp.implicits._
    val right = Seq((1L, 10L, 100L, 7.0)).toDF("k", "t", "id", "v")
    // a post-join frame commonly carries duplicate names — binding the
    // first silently could pick the wrong key column
    val dupLeft = Seq((1L, 10L, 1L)).toDF("k", "t", "id")
      .select(col("k"), col("t"), col("id"), col("t").as("k"))
    val e = intercept[IllegalArgumentException] {
      AsOf.join(dupLeft, right,
        on = Seq("k" -> "k"), time = "t" -> "t", seq = "id" -> "id",
        values = Seq("v" -> "last_v"))
    }
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
  }

  test("broadcast guard passes through unknown-size sides (stat-less plans)") {
    val guardKey = "spark.graft.broadcastGuard.maxBytes"
    val autoKey = "spark.sql.autoBroadcastJoinThreshold"
    val oldAuto = spark.conf.get(autoKey)
    try {
      spark.conf.set(autoKey, "-1")
      spark.conf.set(guardKey, "1") // everything with a KNOWN size is "too big"
      val l = Tables.lineitem(spark, sfDir)
      // LogicalRDD has no stats: sizeInBytes is the defaultSizeInBytes
      // sentinel (Long.MaxValue), which means "unknown", not "large" —
      // the user's explicit broadcast() assertion must be honored
      val sp = spark
      import sp.implicits._
      val rows = sp.sparkContext.parallelize(Seq((1L, "O"), (2L, "F")))
      val dim = rows.toDF("o_orderkey", "o_orderstatus")
      val viaRdd = sp.createDataFrame(dim.rdd, dim.schema)
      val df = l.join(broadcast(viaRdd), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      df.collect()
      val bhj = collectWithSubqueries(df.queryExecution.executedPlan) {
        case b: BroadcastHashJoinExec => b
      }
      assert(bhj.nonEmpty, "unknown-size broadcast must not be demoted:\n" +
        df.queryExecution.executedPlan)
    } finally {
      spark.conf.set(autoKey, oldAuto)
      spark.conf.unset("spark.graft.broadcastGuard.maxBytes")
    }
  }

  test("broadcast guard passes through operators ABOVE a stat-less leaf") {
    val guardKey = "spark.graft.broadcastGuard.maxBytes"
    val autoKey = "spark.sql.autoBroadcastJoinThreshold"
    val oldAuto = spark.conf.get(autoKey)
    try {
      spark.conf.set(autoKey, "-1")
      spark.conf.set(guardKey, "1")
      val l = Tables.lineitem(spark, sfDir)
      val sp = spark
      import sp.implicits._
      val rows = sp.sparkContext.parallelize(Seq((1L, "O"), (2L, "F")))
      val dim = rows.toDF("o_orderkey", "o_orderstatus")
      // Project + Filter over the LogicalRDD: the size estimate derived
      // from the sentinel is huge but no longer EQUAL to it — the guard
      // must still treat it as unknown (round-6 fix)
      val viaRdd = sp.createDataFrame(dim.rdd, dim.schema)
        .filter(col("o_orderkey") > 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val df = l.join(broadcast(viaRdd), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      df.collect()
      val bhj = collectWithSubqueries(df.queryExecution.executedPlan) {
        case b: BroadcastHashJoinExec => b
      }
      assert(bhj.nonEmpty, "derived-from-sentinel size must not be demoted:\n" +
        df.queryExecution.executedPlan)
    } finally {
      spark.conf.set(autoKey, oldAuto)
      spark.conf.unset("spark.graft.broadcastGuard.maxBytes")
    }
  }

  test("broadcast guard strips oversized hints but keeps dim broadcasts") {
    val guardKey = "spark.graft.broadcastGuard.maxBytes"
    val autoKey = "spark.sql.autoBroadcastJoinThreshold"
    val oldAuto = spark.conf.get(autoKey)
    try {
      spark.conf.set(autoKey, "-1") // isolate hint behavior
      val l = Tables.lineitem(spark, sfDir)
      val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderstatus")

      def bhjCount(limit: String): Int = {
        spark.conf.set(guardKey, limit)
        val df = l.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderstatus").count()
        df.collect()
        collectWithSubqueries(df.queryExecution.executedPlan) {
          case b: BroadcastHashJoinExec => b
        }.length
      }

      assert(bhjCount("1") == 0, "guard should demote the broadcast")
      assert(bhjCount((1L << 30).toString) == 1,
        "within the limit the hint must be honored")
    } finally {
      spark.conf.set(autoKey, oldAuto)
      spark.conf.unset("spark.graft.broadcastGuard.maxBytes")
    }
  }
}
