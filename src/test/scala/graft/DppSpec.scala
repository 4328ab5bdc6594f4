package graft

import org.apache.spark.sql.functions._

/** §5 scale evidence, executable: DYNAMIC PARTITION PRUNING and
  * catalog statistics. DPP: when a fact table is partitioned by the
  * join key, a selective dim-side filter must prune fact PARTITIONS at
  * runtime (the scan carries a dynamicpruning expression), so a 100 TB
  * fact scan reads only partitions the dim rows can match — without
  * any static filter on the fact side. The sf0.001 tables are far
  * below the optimizer's benefit thresholds, so the spec raises the
  * fallback filter ratio to let the rule fire on test-sized data — the
  * PLAN SHAPE is what is being locked in, not the cost model's
  * threshold.
  */
class DppSpec extends GraftSpec {

  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    val before = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a dim filter dynamically prunes the partitioned fact scan") {
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    val o = Tables.orders(spark, sfDir)
    spark.sql("DROP TABLE IF EXISTS dpp_fact")
    // fact partitioned by status (3 partitions: F/O/P)
    o.select("o_orderkey", "o_totalprice", "o_orderstatus")
      .write.format("parquet").partitionBy("o_orderstatus")
      .option("path", s"$dir/fact").saveAsTable("dpp_fact")
    val sp = spark
    import sp.implicits._
    // dim: maps status -> label; the FILTER lives on the dim only. The
    // dim must come off storage (not a LocalRelation, whose filter
    // constant-folds away at optimization and leaves the pruning rule
    // no selective predicate to latch onto).
    Seq(("F", "finished"), ("O", "open"), ("P", "pending"))
      .toDF("status", "label")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    withConf(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10000") {
      val joined = spark.table("dpp_fact")
        .join(dim, col("o_orderstatus") === col("status"))
        .filter(col("label") === "finished")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no dynamic partition pruning in:\n$plan")
      // and the result equals the statically-filtered join
      val want = o.filter(col("o_orderstatus") === "F").count()
      assert(joined.count() == want)
    }
    spark.sql("DROP TABLE IF EXISTS dpp_fact")
  }

  test("a selective join side injects a runtime bloom filter on the big scan") {
    // the row-level sibling of DPP: joining on a NON-partition column,
    // the optimizer builds a bloom filter from the selective side and
    // applies it to the big side's scan as a might-contain pre-filter —
    // at 100 TB this discards non-matching rows before the shuffle.
    // Thresholds sized for production are lowered to let the rule
    // consider sf0.001 tables; the PLAN SHAPE is what's locked in.
    val dir = java.nio.file.Files.createTempDirectory("rbf").toString
    Tables.lineitem(spark, sfDir).select("l_orderkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/fact")
    Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/sel")
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      // force the shuffled-join path: broadcast joins skip runtime filters
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val fact = spark.read.parquet(s"$dir/fact")
      val sel = spark.read.parquet(s"$dir/sel")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(sel, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilterMightContain")
        || plan.toLowerCase.contains("bloomfilter"),
        s"no runtime bloom filter in:\n${plan.take(3000)}")
      // correctness unchanged by the injected filter
      val want = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == want)
    }
  }

  test("catalog statistics flow into the optimizer after ANALYZE") {
    val dir = java.nio.file.Files.createTempDirectory("stats").toString
    spark.sql("DROP TABLE IF EXISTS stats_nation")
    Tables.nation(spark, sfDir).write.format("parquet")
      .option("path", s"$dir/nation").saveAsTable("stats_nation")
    spark.sql("ANALYZE TABLE stats_nation COMPUTE STATISTICS")
    withConf("spark.sql.cbo.enabled" -> "true") {
      val stats = spark.table("stats_nation")
        .queryExecution.optimizedPlan.stats
      // row count is the CBO currency: join reorder and build-side
      // choice at 100 TB run off these, not file sizes
      assert(stats.rowCount.contains(BigInt(25)), s"stats: $stats")
    }
    spark.sql("DROP TABLE IF EXISTS stats_nation")
  }
}
