package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Relational core of the engine (SURVEY.md §2.1).
  *
  * Cross-engine determinism rules (SURVEY.md §4): every money/quantity
  * aggregate runs on DECIMAL so Spark's parallel partial aggregation and
  * DuckDB's sequential sum produce bit-identical results regardless of
  * partitioning; final outputs are rounded then cast to DOUBLE; every
  * query ends in a total ORDER BY.
  */
object Relational {

  /** Cast to an exact money decimal: values < 1e8 with 4 fractional digits. */
  def dmoney(c: Column): Column = c.cast(DecimalType(12, 4))

  /** Cast to an exact rate decimal (discount/tax style, < 10). */
  def drate(c: Column): Column = c.cast(DecimalType(7, 4))

  /** Exact decimal aggregate -> presentation double, rounded at 2. */
  def out2(c: Column): Column = round(c, 2).cast(DoubleType)

  /** Exact-sum / count -> double average rounded at 6 (sum is exact decimal
    * on both engines, so the IEEE division and round agree).
    */
  def avg6(sumDec: Column, cnt: Column): Column =
    round(sumDec.cast(DoubleType) / cnt, 6)

  // R1: scan + filter pushdown + group aggregate (TPC-H Q1 shape).
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val sumQty   = sum(dmoney(col("l_quantity")))
    val sumBase  = sum(dmoney(col("l_extendedprice")))
    val sumDisc  = sum(dmoney(col("l_extendedprice")) * (lit(1).cast(DecimalType(7, 4)) - drate(col("l_discount"))))
    val sumChrg  = sum(dmoney(col("l_extendedprice")) * (lit(1).cast(DecimalType(7, 4)) - drate(col("l_discount")))
      * (lit(1).cast(DecimalType(7, 4)) + drate(col("l_tax"))))
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        out2(sumQty).as("sum_qty"),
        out2(sumBase).as("sum_base_price"),
        out2(sumDisc).as("sum_disc_price"),
        out2(sumChrg).as("sum_charge"),
        avg6(sum(dmoney(col("l_quantity"))), count(lit(1))).as("avg_qty"),
        avg6(sum(dmoney(col("l_extendedprice"))), count(lit(1))).as("avg_price"),
        avg6(sum(drate(col("l_discount"))), count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order")
      )
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty,
      | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_base_price,
      | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(7,4)) - CAST(l_discount AS DECIMAL(7,4)))), 2) AS DOUBLE) AS sum_disc_price,
      | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(7,4)) - CAST(l_discount AS DECIMAL(7,4))) * (CAST(1 AS DECIMAL(7,4)) + CAST(l_tax AS DECIMAL(7,4)))), 2) AS DOUBLE) AS sum_charge,
      | ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
      | ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
      | ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(7,4))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
      | COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // R2 + R6: inner join with broadcast dims + total-order top-N.
  // Scale: orders is the fact side (shuffle-free scan), customer joins on
  // its key (sort-merge/shuffled-hash at 100 TB, AQE decides), nation is
  // tiny and explicitly broadcast. Top-N is a TakeOrdered physical op —
  // no global sort materialization.
  def q02JoinTopN(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("o_orderkey"), col("c_name"), col("n_name"), col("o_totalprice"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(100)
  }

  val q02Sql: String =
    """SELECT o_orderkey, c_name, n_name, o_totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // R3: 5-way star join (TPC-H Q5 shape). Only the FIXED-size dims
  // (nation, region) carry broadcast hints; supplier grows with the
  // corpus, so its join strategy is left to the size threshold + AQE —
  // broadcast at test SF, shuffled hash join at 100 TB. lineitem⋈orders
  // co-partitions on orderkey.
  def q03StarJoin(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val su = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    val revenue = sum(dmoney(col("l_extendedprice")) * (lit(1).cast(DecimalType(7, 4)) - drate(col("l_discount"))))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(su, l("l_suppkey") === su("s_suppkey") && c("c_nationkey") === su("s_nationkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(r("r_name") === "ASIA" &&
        o("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
        o("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      .groupBy(n("n_name"))
      .agg(out2(revenue).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  val q03Sql: String =
    """SELECT n_name,
      | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(7,4)) - CAST(l_discount AS DECIMAL(7,4)))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // R4: full aggregate-function surface: sum/min/max/avg/count distinct.
  // count(distinct) expands to a two-stage partial agg in Spark — no
  // single-point bottleneck at scale.
  def q04AggFunctions(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        out2(sum(dmoney(col("o_totalprice")))).as("sum_price"),
        avg6(sum(dmoney(col("o_totalprice"))), count(lit(1))).as("avg_price"),
        min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("last_order")
      )
      .orderBy("o_orderpriority")
  }

  val q04Sql: String =
    """SELECT o_orderpriority,
      | COUNT(*) AS n_orders,
      | COUNT(DISTINCT o_custkey) AS n_customers,
      | MIN(o_totalprice) AS min_price,
      | MAX(o_totalprice) AS max_price,
      | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_price,
      | ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
      | MIN(o_orderdate) AS first_order,
      | MAX(o_orderdate) AS last_order
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // R5: window functions — rank / row_number / lag / lead / running sum,
  // partitioned by a high-cardinality key (custkey) so no partition is a
  // scale bottleneck. Keep the top-2 rows per customer (reference
  // keep-first dedup is the rn=1 slice: DatabaseStructured.py:225).
  def q05WindowRank(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val byPrice = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val byDate = Window.partitionBy("o_custkey").orderBy(asc("o_orderdate"), asc("o_orderkey"))
    val cum = byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(byPrice).cast(LongType).as("price_rank"),
        row_number().over(byDate).cast(LongType).as("seq"),
        lag("o_totalprice", 1).over(byDate).as("prev_price"),
        lead("o_totalprice", 1).over(byDate).as("next_price"),
        out2(sum(dmoney(col("o_totalprice"))).over(cum)).as("run_spend")
      )
      .filter(col("price_rank") <= 2)
      .orderBy("o_custkey", "price_rank", "o_orderkey")
  }

  val q05Sql: String =
    """SELECT * FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |  RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
      |  ROW_NUMBER() OVER w AS seq,
      |  LAG(o_totalprice, 1) OVER w AS prev_price,
      |  LEAD(o_totalprice, 1) OVER w AS next_price,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS run_spend
      | FROM orders
      | WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |) WHERE price_rank <= 2
      |ORDER BY o_custkey, price_rank, o_orderkey""".stripMargin

  // R7: semi / anti join — customers with vs without orders, per segment.
  // Both sides aggregate AFTER the existence join, so the shuffle carries
  // only custkeys; at 100 TB the semi/anti join is a broadcast of nothing
  // — it stays a shuffled existence join with early agg pushdown.
  def q06SemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with"))
    val withoutO = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without"))
    withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("n_with"), lit(0L)).as("n_with"),
        coalesce(col("n_without"), lit(0L)).as("n_without"))
      .orderBy("c_mktsegment")
  }

  val q06Sql: String =
    """SELECT c_mktsegment,
      | CAST(SUM(CASE WHEN c_custkey IN (SELECT o_custkey FROM orders) THEN 1 ELSE 0 END) AS BIGINT) AS n_with,
      | CAST(SUM(CASE WHEN c_custkey IN (SELECT o_custkey FROM orders) THEN 0 ELSE 1 END) AS BIGINT) AS n_without
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // R8 + E10: transpose-to-wide (pivot) via conditional aggregation —
  // exactly what groupBy().pivot(values) lowers to, but with stable
  // column names shared with the oracle. Reference analog:
  // DatabaseUnstructured.py:291 (wide row per (CIK, year)).
  def q07PivotWide(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    def cnt(t: String) = count(when(col("event_type") === t, 1)).as(s"n_$t")
    e.groupBy("user_id")
      .agg(
        cnt("click"), cnt("error"), cnt("purchase"), cnt("signup"), cnt("view"),
        out2(sum(when(col("event_type") === "purchase", dmoney(col("value"))))).as("amt_purchase")
      )
      .orderBy("user_id")
  }

  val q07Sql: String =
    """SELECT user_id,
      | COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
      | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
      | COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
      | COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
      | COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
      | CAST(ROUND(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,4)) END), 2) AS DOUBLE) AS amt_purchase
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // R9: rollup — region/nation hierarchy totals in one pass (partial aggs
  // per grouping set, no repeated scans).
  def q08Rollup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), out2(sum(dmoney(col("c_acctbal")))).as("sum_acctbal"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_customers"), col("sum_acctbal"))
      .orderBy("region", "nation")
  }

  val q08Sql: String =
    """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
      | COUNT(*) AS n_customers,
      | CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY region, nation""".stripMargin

  // R10 + E9: totals detection — rows whose value equals the backward
  // running sum of prior lines in the same order exactly, as a ×10^k
  // multiple (OCR scale slippage, DatabaseUnstructured.py:50-61
  // multiple_check), or within 1% (epsilon_error, :62-107).
  // Spark-first form of DatabaseUnstructured.py:108-184 totals_check:
  // the reference loops per sheet in Python; here one window pass,
  // partitioned by the high-cardinality orderkey.
  def q09ExistsTotals(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    // (l_orderkey, l_linenumber) is NOT unique in the corpus — the window
    // order must be total or the prefix sums are engine-dependent.
    val w = Window.partitionBy("l_orderkey")
      .orderBy("l_linenumber", "l_extendedprice", "l_partkey", "l_suppkey")
      .rowsBetween(Window.unboundedPreceding, -1)
    // Exact money as UNSCALED LONGS (1/10000 units == DECIMAL(12,4)'s
    // unscaled value, derived from the same HALF_UP decimal cast, so the
    // semantics are bit-identical to the decimal form the oracle runs).
    // The running sum then updates a long in the window aggregate buffer
    // instead of allocating a Decimal per row — the r8 driver bench
    // showed q09's window stage as pure CPU (Diag: zero spill, low GC),
    // i.e. interpreted Decimal updates were the whole cost, and that
    // cold path is what external box load amplified 26x.
    val edLong = (dmoney(col("l_extendedprice")) * lit(10000)).cast(LongType)
    val prevSum = sum(col("ed_long")).over(w)
    // doubles for the EPS test: long/10000.0 is the correctly-rounded
    // nearest double of the exact rational — identical to Decimal.toDouble
    val ed = col("ed_long").cast(DoubleType) / lit(10000.0)
    val pd = col("prev_sum_long").cast(DoubleType) / lit(10000.0)
    val mult10 = Seq(10, 100, 1000).map { k =>
      (col("ed_long") * lit(k) === col("prev_sum_long")) ||
        (col("prev_sum_long") * lit(k) === col("ed_long"))
    }.reduce(_ || _)
    // presentation: HALF_UP at 2 decimals from the 4-decimal long — safe
    // integer form because prices are positive; cents fit a double exactly
    val prevOut = (expr("(prev_sum_long + 50L) div 100L")
      .cast(DoubleType) / lit(100.0)).as("prev_sum")
    l.withColumn("ed_long", edLong)
      .withColumn("prev_sum_long", prevSum)
      .withColumn("kind",
        when(col("prev_sum_long").isNotNull && col("ed_long") === col("prev_sum_long"), "EXACT")
          .when(col("prev_sum_long").isNotNull && mult10, "MULT10")
          .when(col("prev_sum_long").isNotNull && pd > 0 && abs(ed - pd) / pd <= 0.01, "EPS"))
      .filter(col("kind").isNotNull)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        prevOut, col("kind"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val q09Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice,
      | CAST(ROUND(prev_sum_dec, 2) AS DOUBLE) AS prev_sum,
      | CASE WHEN CAST(l_extendedprice AS DECIMAL(12,4)) = prev_sum_dec THEN 'EXACT'
      |      WHEN CAST(l_extendedprice AS DECIMAL(12,4)) * 10 = prev_sum_dec OR prev_sum_dec * 10 = CAST(l_extendedprice AS DECIMAL(12,4))
      |        OR CAST(l_extendedprice AS DECIMAL(12,4)) * 100 = prev_sum_dec OR prev_sum_dec * 100 = CAST(l_extendedprice AS DECIMAL(12,4))
      |        OR CAST(l_extendedprice AS DECIMAL(12,4)) * 1000 = prev_sum_dec OR prev_sum_dec * 1000 = CAST(l_extendedprice AS DECIMAL(12,4)) THEN 'MULT10'
      |      WHEN CAST(prev_sum_dec AS DOUBLE) > 0
      |       AND ABS(CAST(CAST(l_extendedprice AS DECIMAL(12,4)) AS DOUBLE) - CAST(prev_sum_dec AS DOUBLE)) / CAST(prev_sum_dec AS DOUBLE) <= 0.01 THEN 'EPS'
      | END AS kind
      |FROM (
      | SELECT l_orderkey, l_linenumber, l_extendedprice,
      |  SUM(CAST(l_extendedprice AS DECIMAL(12,4))) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice, l_partkey, l_suppkey ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_sum_dec
      | FROM lineitem
      |)
      |WHERE prev_sum_dec IS NOT NULL
      |  AND (CAST(l_extendedprice AS DECIMAL(12,4)) = prev_sum_dec
      |   OR CAST(l_extendedprice AS DECIMAL(12,4)) * 10 = prev_sum_dec OR prev_sum_dec * 10 = CAST(l_extendedprice AS DECIMAL(12,4))
      |   OR CAST(l_extendedprice AS DECIMAL(12,4)) * 100 = prev_sum_dec OR prev_sum_dec * 100 = CAST(l_extendedprice AS DECIMAL(12,4))
      |   OR CAST(l_extendedprice AS DECIMAL(12,4)) * 1000 = prev_sum_dec OR prev_sum_dec * 1000 = CAST(l_extendedprice AS DECIMAL(12,4))
      |   OR (CAST(prev_sum_dec AS DOUBLE) > 0
      |    AND ABS(CAST(CAST(l_extendedprice AS DECIMAL(12,4)) AS DOUBLE) - CAST(prev_sum_dec AS DOUBLE)) / CAST(prev_sum_dec AS DOUBLE) <= 0.01))
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // R11: as-of join — each purchase event matched to the latest signup of
  // the same user at-or-before it. Spark-first: a single ordered window
  // with a running MAX over the tagged timestamp (monotone, so MAX ==
  // latest). No range-join explosion; shuffle is one hash partition by
  // user_id. At 100 TB this beats a correlated subquery by construction.
  def q10AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).filter(col("event_type").isin("signup", "purchase"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("sig_ts", when(col("event_type") === "signup", col("ts")))
      .withColumn("last_signup_ts", max(col("sig_ts")).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("last_signup_ts"))
      .orderBy("event_id")
  }

  val q10Sql: String =
    """SELECT event_id, user_id, ts, last_signup_ts FROM (
      | SELECT event_id, user_id, ts, event_type,
      |  MAX(CASE WHEN event_type = 'signup' THEN ts END) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
      | FROM events WHERE event_type IN ('signup', 'purchase')
      |) WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  // R12: sessionization — 30-min-gap sessions via lag + cumulative sum.
  // The batch twin of the streaming path (streaming/EventStream.scala).
  def q11Sessionize(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
      .withColumn("session_id", sum("is_new").over(cum))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"), max("ts").as("session_end"),
        out2(sum(dmoney(col("value")))).as("session_value"))
      .orderBy("user_id", "session_id")
  }

  val q11Sql: String =
    """SELECT user_id, session_id, COUNT(*) AS n_events,
      | MIN(ts) AS session_start, MAX(ts) AS session_end,
      | CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS session_value
      |FROM (
      | SELECT user_id, ts, value,
      |  CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      | FROM (
      |  SELECT user_id, event_id, ts, value,
      |   CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      |  FROM (
      |   SELECT user_id, event_id, ts, value,
      |    LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |   FROM events)))
      |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  // R13 + E5: explode / unnest — reference row_split (OCRClean.py:219)
  // re-expressed as split + explode + re-aggregate. Explode happens
  // map-side; only the (token) agg shuffles.
  def q12ExplodeTokens(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token")
      .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_total"))
      .filter(col("n_total") >= 10)
      .orderBy(desc("n_total"), asc("token"))
  }

  val q12Sql: String =
    """SELECT token, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_total
      |FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents)
      |WHERE LENGTH(token) > 0
      |GROUP BY token HAVING COUNT(*) >= 10
      |ORDER BY n_total DESC, token""".stripMargin

  // R9-extra: CUBE — all 2^2 grouping sets over (orderstatus, priority)
  // in one pass, with grouping_id distinguishing the levels. Spark plans
  // this as a single expand + aggregate (no repeated scans).
  def q15Cube(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        out2(sum(dmoney(col("o_totalprice")))).as("sum_price"),
        grouping_id().as("gid"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_price"), col("gid"))
      .orderBy("gid", "status", "priority")
  }

  val q15Sql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      | COALESCE(o_orderpriority, 'ALL') AS priority,
      | COUNT(*) AS n_orders,
      | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_price,
      | GROUPING(o_orderstatus, o_orderpriority) AS gid
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY gid, status, priority""".stripMargin

  // R4-extra: exact percentiles (median / p90) per order priority — the
  // sort-based exact percentile, interpolated. Both engines use the
  // lo + (hi-lo)*frac continuous-quantile form on doubles; round(4)
  // absorbs any last-ulp divergence.
  def q14Percentiles(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.groupBy("o_orderpriority")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
      .orderBy("o_orderpriority")
  }

  val q14Sql: String =
    """SELECT o_orderpriority,
      | ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS p50,
      | ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4) AS p90,
      | ROUND(QUANTILE_CONT(o_totalprice, 0.99), 4) AS p99
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // R17: outlier detection — per-event-type z-scores from DECIMAL-exact
  // moments (sum, sum-of-squares), so mean/variance are engine-identical
  // before the single double division; flags |z| > 3. The two-pass shape
  // (small agg broadcast back onto the fact scan) is the standard
  // large-scale anomaly sweep.
  def q59Outliers(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val vd = col("value").cast(DecimalType(18, 6))
    val stats = e.groupBy("event_type")
      .agg(sum(vd).as("s1"), sum(vd * vd).as("s2"), count(lit(1)).as("n"))
      .withColumn("mean", col("s1").cast(DoubleType) / col("n"))
      .withColumn("variance",
        col("s2").cast(DoubleType) / col("n") - col("mean") * col("mean"))
      .select("event_type", "mean", "variance")
    e.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", round((col("value") - col("mean")) / sqrt(col("variance")), 4))
      .filter(abs(col("z")) > 3.0)
      .select(col("event_id"), col("event_type"), col("value"), col("z"))
      .orderBy("event_id")
  }

  val q59Sql: String =
    """SELECT event_id, event_type, value, z FROM (
      | SELECT e.event_id, e.event_type, e.value,
      |  ROUND((e.value - st.mean) / SQRT(st.variance), 4) AS z
      | FROM events e JOIN (
      |  SELECT event_type,
      |   CAST(s1 AS DOUBLE) / n AS mean,
      |   CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS variance
      |  FROM (
      |   SELECT event_type,
      |    SUM(CAST(value AS DECIMAL(18,6))) AS s1,
      |    SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS s2,
      |    COUNT(*) AS n
      |   FROM events GROUP BY event_type)) st
      | ON e.event_type = st.event_type)
      |WHERE ABS(z) > 3.0 ORDER BY event_id""".stripMargin

  // R18: histogram — fixed-width binning over order totals per status.
  // Manual floor((x-lo)/w) binning (engine-agnostic), bin edges exact
  // integers; one scan + one tiny agg.
  def q60Histogram(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val w = 50000.0
    o.withColumn("bin", floor(col("o_totalprice") / w).cast(IntegerType))
      .groupBy("o_orderstatus", "bin")
      .agg(count(lit(1)).as("n"),
        out2(sum(dmoney(col("o_totalprice")))).as("bin_total"))
      .withColumn("bin_lo", (col("bin") * w).cast(DoubleType))
      .select("o_orderstatus", "bin", "bin_lo", "n", "bin_total")
      .orderBy("o_orderstatus", "bin")
  }

  val q60Sql: String =
    """SELECT o_orderstatus, bin, CAST(bin * 50000.0 AS DOUBLE) AS bin_lo,
      | COUNT(*) AS n,
      | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS bin_total
      |FROM (SELECT o_orderstatus, o_totalprice,
      |      CAST(FLOOR(o_totalprice / 50000.0) AS INTEGER) AS bin FROM orders)
      |GROUP BY o_orderstatus, bin ORDER BY o_orderstatus, bin""".stripMargin

  // R19: merge / upsert (SCD-style snapshot apply) — a changes batch
  // (inserts, updates, deletes) folded onto a base snapshot via one
  // full-outer join. Base = keys with o_orderkey%10 in 0..7; changes =
  // keys with o_orderkey%10 in 5..9 (5..7 overlap the base so update and
  // delete genuinely fire; 8..9 are pure inserts), with priority-1 rows
  // acting as deletes. The canonical no-lakehouse upsert: at scale both
  // sides co-partition on the key, one shuffle each.
  def q61MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val m = col("o_orderkey") % 10
    val base = o.filter(m < 8)
      .select(col("o_orderkey"), col("o_totalprice").as("base_price"))
    val changes = o.filter(m >= 5)
      .select(col("o_orderkey"), col("o_totalprice").as("new_price"),
        (col("o_orderpriority") === "1-URGENT").as("is_delete"))
    base.join(changes, Seq("o_orderkey"), "full_outer")
      .withColumn("action",
        when(col("is_delete") === true && col("base_price").isNotNull, "delete")
          .when(col("is_delete") === true, "skip_delete")
          .when(col("base_price").isNotNull && col("new_price").isNotNull, "update")
          .when(col("new_price").isNotNull, "insert")
          .otherwise("keep"))
      .filter(col("action").isin("keep", "update", "insert"))
      .select(col("o_orderkey"),
        coalesce(col("new_price"), col("base_price")).as("price"),
        col("action"))
      .orderBy("o_orderkey")
  }

  val q61Sql: String =
    """SELECT o_orderkey, COALESCE(new_price, base_price) AS price, action FROM (
      | SELECT COALESCE(b.o_orderkey, c.o_orderkey) AS o_orderkey,
      |  b.base_price, c.new_price,
      |  CASE WHEN c.is_delete AND b.base_price IS NOT NULL THEN 'delete'
      |       WHEN c.is_delete THEN 'skip_delete'
      |       WHEN b.base_price IS NOT NULL AND c.new_price IS NOT NULL THEN 'update'
      |       WHEN c.new_price IS NOT NULL THEN 'insert'
      |       ELSE 'keep' END AS action
      | FROM (SELECT o_orderkey, o_totalprice AS base_price FROM orders
      |       WHERE o_orderkey % 10 < 8) b
      | FULL OUTER JOIN (SELECT o_orderkey, o_totalprice AS new_price,
      |       o_orderpriority = '1-URGENT' AS is_delete FROM orders
      |       WHERE o_orderkey % 10 >= 5) c
      | ON b.o_orderkey = c.o_orderkey)
      |WHERE action IN ('keep', 'update', 'insert')
      |ORDER BY o_orderkey""".stripMargin

  // R20: correlated scalar subquery — orders priced above 1.5× their
  // customer's average order value. Catalyst decorrelates exactly this
  // shape into the aggregate + equi-join declared below (one keyed
  // shuffle, no per-row re-aggregation), so the Spark side states the
  // decorrelated plan directly; the oracle keeps the correlated syntax
  // to pin the semantics. The average follows the avg6 discipline (exact
  // decimal sum, one IEEE division) so the 1.5× threshold compare is
  // bit-identical in both engines.
  def q16CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val avgs = o.groupBy(col("o_custkey").as("ck"))
      .agg(avg6(sum(dmoney(col("o_totalprice"))), count(lit(1))).as("cust_avg"))
    o.join(avgs, col("o_custkey") === col("ck"))
      .filter(col("o_totalprice") > col("cust_avg") * 1.5)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("cust_avg"))
      .orderBy("o_orderkey")
  }

  val q16Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      | (SELECT ROUND(CAST(SUM(CAST(i.o_totalprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 6)
      |    FROM orders i WHERE i.o_custkey = o.o_custkey) AS cust_avg
      |FROM orders o
      |WHERE o_totalprice >
      | (SELECT ROUND(CAST(SUM(CAST(i.o_totalprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 6)
      |    FROM orders i WHERE i.o_custkey = o.o_custkey) * 1.5
      |ORDER BY o_orderkey""".stripMargin

  // R21: set operations — INTERSECT / EXCEPT over the customer sets of
  // two adjacent half-years, emitted as one tagged union. Spark plans
  // INTERSECT/EXCEPT as hash aggregates + existence joins — both shuffle
  // once on the key and scale linearly; no sort-based set difference.
  def q17SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    def half(lo: String, hi: String) =
      o.filter(col("o_orderdate") >= lit(lo).cast(TimestampType) &&
          col("o_orderdate") < lit(hi).cast(TimestampType))
        .select(col("o_custkey")).distinct()
    val h1 = half("1997-01-01", "1997-07-01")
    val h2 = half("1997-07-01", "1998-01-01")
    h1.intersect(h2).withColumn("setop", lit("both"))
      .union(h1.except(h2).withColumn("setop", lit("h1_only")))
      .union(h2.except(h1).withColumn("setop", lit("h2_only")))
      .orderBy("o_custkey", "setop")
  }

  val q17Sql: String =
    """WITH h1 AS (SELECT DISTINCT o_custkey FROM orders
      |            WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |              AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'),
      |     h2 AS (SELECT DISTINCT o_custkey FROM orders
      |            WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      |              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
      |SELECT o_custkey, 'both' AS setop FROM (SELECT * FROM h1 INTERSECT SELECT * FROM h2)
      |UNION ALL
      |SELECT o_custkey, 'h1_only' FROM (SELECT * FROM h1 EXCEPT SELECT * FROM h2)
      |UNION ALL
      |SELECT o_custkey, 'h2_only' FROM (SELECT * FROM h2 EXCEPT SELECT * FROM h1)
      |ORDER BY o_custkey, setop""".stripMargin

  // R22: deterministic hash sampling — the TABLESAMPLE that survives
  // scale: keep a row iff the first two hex chars of md5(key) sort below
  // '0d' (13/256 ≈ 5.08%). No RNG, no seed coordination, reproducible
  // under any partitioning, retry, or engine — a pure map-side filter
  // that composes with pushdown. (Spark's native .sample() is seeded
  // per-partition and NOT stable across partitionings; hash sampling
  // is.)
  def q18HashSample(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(substring(md5(col("o_orderkey").cast(StringType)), 1, 2) < "0d")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy("o_orderkey")
  }

  val q18Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      |FROM orders
      |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '0d'
      |ORDER BY o_orderkey""".stripMargin

  // R23: bounded range join — clicks within the hour before each
  // purchase by the same user. The naive inequality join is quadratic in
  // events-per-user; Spark-first we bucket time into 1-hour cells and
  // equi-join on (user_id, bucket) with the probe exploded over the two
  // covering buckets, then apply the exact range predicate. The shuffle
  // is a plain hash partition on (user, bucket) and candidates per probe
  // are bounded by two buckets of one user's clicks — the standard
  // interval-join decomposition (Flink/KDB do the same under the hood).
  def q19RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"))
      .withColumn("bucket", floor(unix_timestamp(col("cts")) / 3600))
    val probes = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("b0", floor(unix_timestamp(col("ts")) / 3600))
      .withColumn("bucket", explode(array(col("b0") - 1, col("b0"))))
    probes.join(clicks, Seq("user_id", "bucket"), "left_outer")
      .withColumn("hit", col("cts").isNotNull &&
        col("cts") >= col("ts") - expr("INTERVAL 1 HOUR") && col("cts") < col("ts"))
      .groupBy("event_id", "user_id", "ts")
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("n_clicks_1h"))
      .orderBy("event_id")
  }

  val q19Sql: String =
    """SELECT p.event_id, p.user_id, p.ts, COUNT(c.cts) AS n_clicks_1h
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT user_id, ts AS cts FROM events WHERE event_type = 'click') c
      | ON c.user_id = p.user_id AND c.cts >= p.ts - INTERVAL 1 HOUR AND c.cts < p.ts
      |GROUP BY p.event_id, p.user_id, p.ts
      |ORDER BY p.event_id""".stripMargin

  // R24: quantile bucketing — NTILE deciles of order value per priority
  // with per-decile aggregates: the standard equal-frequency binning for
  // feature engineering / monotone calibration. One window shuffle keyed
  // by the (bounded-cardinality) stratum + one tiny agg; the window order
  // is total so decile boundaries are engine-identical.
  def q37NtileBuckets(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    o.withColumn("decile", ntile(10).over(w).cast(LongType))
      .groupBy("o_orderpriority", "decile")
      .agg(count(lit(1)).as("n"),
        out2(sum(dmoney(col("o_totalprice")))).as("sum_price"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      .orderBy("o_orderpriority", "decile")
  }

  val q37Sql: String =
    """SELECT o_orderpriority, decile, COUNT(*) AS n,
      | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_price,
      | MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
      |FROM (
      | SELECT o_orderpriority, o_totalprice,
      |  NTILE(10) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS decile
      | FROM orders)
      |GROUP BY o_orderpriority, decile
      |ORDER BY o_orderpriority, decile""".stripMargin

  // R25: deterministic stratified sample — exactly k rows per stratum,
  // chosen by md5 rank (reservoir-equivalent but reproducible across
  // engines, partitionings and reruns; no RNG state). The md5 order is
  // uniform, so the k kept rows are an unbiased stratum sample; the
  // shuffle is one window keyed by the stratum.
  val StratumK = 20

  def q38StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(md5(col("o_orderkey").cast(StringType)), col("o_orderkey"))
    o.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= StratumK)
      .select(col("o_orderpriority"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_orderpriority", "rk")
  }

  val q38Sql: String =
    s"""SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
       | SELECT o_orderpriority, o_orderkey, o_totalprice,
       |  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
       |    ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rk
       | FROM orders)
       |WHERE rk <= $StratumK
       |ORDER BY o_orderpriority, rk""".stripMargin

  // R26: unpivot / melt — the inverse of the q07 transpose-to-wide
  // (the reference round-trips both directions when assembling, then
  // re-normalizing, the per-entity wide tables). Spark's Dataset.unpivot
  // lowers to a single Expand — map-side only, no shuffle beyond the
  // final sort.
  def q39Unpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = q07PivotWide(s, dir)
    wide.unpivot(
        Array(col("user_id")),
        Array(col("n_click"), col("n_error"), col("n_purchase"),
          col("n_signup"), col("n_view")),
        "metric", "n")
      .orderBy("user_id", "metric")
  }

  val q39Sql: String =
    s"""WITH w AS ($q07Sql)
       |SELECT user_id, metric, n FROM (
       | SELECT user_id, 'n_click' AS metric, n_click AS n FROM w
       | UNION ALL SELECT user_id, 'n_error', n_error FROM w
       | UNION ALL SELECT user_id, 'n_purchase', n_purchase FROM w
       | UNION ALL SELECT user_id, 'n_signup', n_signup FROM w
       | UNION ALL SELECT user_id, 'n_view', n_view FROM w)
       |ORDER BY user_id, metric""".stripMargin

  // R27 / S9: semi-structured JSON column — parse the events `props`
  // payload with an explicit schema (from_json stays codegen'd and
  // null-safe on malformed rows) and aggregate the extracted field.
  // At 100 TB the parse is map-side; only the tiny per-type agg shuffles.
  def q63JsonExtract(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val k = from_json(col("props"), StructType(Seq(StructField("k", LongType))))
      .getField("k")
    e.withColumn("k", k)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        avg6(sum(col("k").cast(DecimalType(18, 4))), count(col("k"))).as("avg_k"))
      .orderBy("event_type")
  }

  val q63Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      | CAST(SUM(k) AS BIGINT) AS sum_k,
      | MIN(k) AS min_k, MAX(k) AS max_k,
      | ROUND(CAST(SUM(CAST(k AS DECIMAL(18,4))) AS DOUBLE) / COUNT(k), 6) AS avg_k
      |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // R44: VARIANT semi-structured extraction — the Spark-4-native
  // schema-on-read path. Where q63 parses `props` against a DECLARED
  // struct schema (from_json), this parses it into the binary VariantType
  // (parse_json) and extracts typed paths at query time (variant_get) —
  // the open-schema ingestion pattern: land everything, type on read.
  // try_parse_json/try_variant_get yield NULL on malformed documents,
  // absent paths, and uncastable values (never an ANSI error) — the
  // totality rule of SURVEY.md §4 applied to ingestion: one bad JSON row
  // in 100 TB drops to NULL instead of killing the job (strict
  // parse_json/variant_get are the fail-fast variants for validated
  // feeds).
  def q89VariantExtract(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val v = try_parse_json(col("props"))
    e.select(col("event_type"),
        try_variant_get(v, "$.k", "bigint").as("k"),
        try_variant_get(v, "$.absent", "string").as("absent"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        count(col("absent")).as("n_absent"))
      .orderBy("event_type")
  }

  // The oracle mirrors the engine's drop-to-NULL totality: json_valid
  // guards malformed documents and TRY_CAST yields NULL on uncastable
  // values, matching try_parse_json/try_variant_get exactly (a strict
  // CAST would ERROR on the first bad row instead of dropping to NULL).
  val q89Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      | CAST(SUM(k) AS BIGINT) AS sum_k,
      | MIN(k) AS min_k, MAX(k) AS max_k,
      | COUNT(absent) AS n_absent
      |FROM (SELECT event_type,
      |       TRY_CAST(CASE WHEN json_valid(props)
      |                     THEN json_extract_string(props, '$.k') END AS BIGINT) AS k,
      |       CASE WHEN json_valid(props)
      |            THEN json_extract_string(props, '$.absent') END AS absent
      |      FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // R28: custom typed Aggregator — mergeable bounded top-k
  // (functions/TopKAgg): per-partition state never exceeds k pairs, so
  // the shuffle carries ≤ k items per group instead of range-sorting the
  // column. The udaf() registration path is the public typed-Aggregator
  // API (no internal Catalyst surface needed).
  def q64TopkAgg(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val top3 = udaf(graft.functions.TopKAgg.Top3)
    // the typed (Double, Long) input encoder is non-nullable — drop null
    // rows explicitly (the oracle does the same) instead of throwing
    e.filter(col("value").isNotNull && col("event_id").isNotNull)
      .groupBy("event_type")
      .agg(top3(col("value"), col("event_id")).as("tops"))
      .select(col("event_type"),
        // try_element_at: a group with <3 rows yields NULLs (= DuckDB's
        // lst[k] on a short list); ANSI element_at would ERROR instead
        try_element_at(col("tops"), lit(1)).as("v1"),
        try_element_at(col("tops"), lit(2)).as("v2"),
        try_element_at(col("tops"), lit(3)).as("v3"))
      .orderBy("event_type")
  }

  val q64Sql: String =
    """SELECT event_type, lst[1] AS v1, lst[2] AS v2, lst[3] AS v3
      |FROM (SELECT event_type,
      |       (list(value ORDER BY value DESC, event_id))[1:3] AS lst
      |      FROM events
      |      WHERE value IS NOT NULL AND event_id IS NOT NULL
      |      GROUP BY event_type)
      |ORDER BY event_type""".stripMargin

  // R29: distributed describe() — per-column count/mean/std/min/max in
  // ONE scan: unpivot the numeric columns (map-side Expand), then a
  // keyed aggregate over (column) with DECIMAL-exact moments, so the
  // parallel partial sums are engine-identical before the two IEEE
  // divisions (same two-pass-free shape as q59's z-scores).
  def q65Describe(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val long = o.select(col("o_totalprice"), col("o_custkey").cast(DoubleType).as("o_custkey"))
      .unpivot(Array.empty[Column],
        Array(col("o_totalprice"), col("o_custkey")), "column", "val")
    val vd = col("val").cast(DecimalType(25, 6))
    long.groupBy("column")
      .agg(count(lit(1)).as("n"),
        sum(vd).as("s1"), sum(vd * vd).as("s2"),
        min(col("val")).as("min_val"), max(col("val")).as("max_val"))
      .withColumn("mean", round(col("s1").cast(DoubleType) / col("n"), 6))
      .withColumn("std",
        round(sqrt(col("s2").cast(DoubleType) / col("n") -
          (col("s1").cast(DoubleType) / col("n")) * (col("s1").cast(DoubleType) / col("n"))), 6))
      .select(col("column"), col("n"), col("mean"), col("std"),
        col("min_val"), col("max_val"))
      .orderBy("column")
  }

  val q65Sql: String =
    """SELECT "column", n, ROUND(CAST(s1 AS DOUBLE) / n, 6) AS mean,
      | ROUND(SQRT(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)), 6) AS std,
      | min_val, max_val
      |FROM (
      | SELECT "column", COUNT(*) AS n,
      |  SUM(CAST(val AS DECIMAL(25,6))) AS s1,
      |  SUM(CAST(val AS DECIMAL(25,6)) * CAST(val AS DECIMAL(25,6))) AS s2,
      |  MIN(val) AS min_val, MAX(val) AS max_val
      | FROM (
      |  SELECT 'o_totalprice' AS "column", o_totalprice AS val FROM orders
      |  UNION ALL
      |  SELECT 'o_custkey', CAST(o_custkey AS DOUBLE) FROM orders)
      | GROUP BY "column")
      |ORDER BY "column"""".stripMargin

  // R30: funnel analysis — how far each user progresses through the
  // ordered view → click → purchase sequence, each stage within one day
  // of the previous (clicks only count AFTER the first view, purchases
  // only after that click). Three unordered windows over ONE user_id
  // partition — each stage's timestamp is a per-user constant the next
  // stage's predicate reads, so the whole funnel costs a single
  // shuffle; the tiny stage histogram follows.
  def q67Funnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val wu = Window.partitionBy("user_id")
    val day = expr("INTERVAL 1 DAY")
    e.select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("fv", min(when(col("event_type") === "view", col("ts"))).over(wu))
      .withColumn("fc", min(when(col("event_type") === "click" &&
        col("ts") > col("fv") && col("ts") <= col("fv") + day, col("ts"))).over(wu))
      .withColumn("fp", min(when(col("event_type") === "purchase" &&
        col("ts") > col("fc") && col("ts") <= col("fc") + day, col("ts"))).over(wu))
      .select(col("user_id"),
        when(col("fp").isNotNull, 3).when(col("fc").isNotNull, 2)
          .when(col("fv").isNotNull, 1).otherwise(0).as("stage"))
      .distinct()
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
      .orderBy("stage")
  }

  val q67Sql: String =
    """WITH v AS (
      | SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS fv
      | FROM events GROUP BY user_id),
      |c AS (
      | SELECT e.user_id, MIN(e.ts) AS fc
      | FROM events e JOIN v USING (user_id)
      | WHERE e.event_type = 'click' AND e.ts > v.fv
      |   AND e.ts <= v.fv + INTERVAL 1 DAY GROUP BY e.user_id),
      |p AS (
      | SELECT e.user_id, MIN(e.ts) AS fp
      | FROM events e JOIN c USING (user_id)
      | WHERE e.event_type = 'purchase' AND e.ts > c.fc
      |   AND e.ts <= c.fc + INTERVAL 1 DAY GROUP BY e.user_id)
      |SELECT stage, COUNT(*) AS n_users FROM (
      | SELECT v.user_id,
      |  CASE WHEN p.fp IS NOT NULL THEN 3
      |       WHEN c.fc IS NOT NULL THEN 2
      |       WHEN v.fv IS NOT NULL THEN 1 ELSE 0 END AS stage
      | FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id))
      |GROUP BY stage ORDER BY stage""".stripMargin

  // R31: order-invariant table checksum — the cross-system
  // reconciliation primitive (validate a replicated/migrated table
  // without sorting it): canonical per-row string → 48-bit md5 prefix →
  // XOR-fold per group. XOR is commutative/associative, so ANY
  // partitioning or row order produces the same checksum, and partial
  // aggregation is map-side. This is the same family of check the
  // project's own DuckDB gate performs.
  def q68TableChecksum(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val repr = concat_ws("|",
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_orderpriority"),
      col("o_totalprice").cast(DecimalType(12, 2)).cast(StringType),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
    val h = conv(substring(md5(repr), 1, 12), 16, 10).cast(LongType)
    o.select(col("o_orderpriority"), h.as("h"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("checksum"))
      .orderBy("o_orderpriority")
  }

  val q68Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_rows, bit_xor(h) AS checksum
      |FROM (
      | SELECT o_orderpriority,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |   list_transform(range(1, 13),
      |    i -> strpos('0123456789abcdef', substr(h12, i, 1)) - 1)),
      |   (a, x) -> a * 16 + x) AS h
      | FROM (
      |  SELECT o_orderpriority, substr(md5(concat_ws('|',
      |   CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
      |   o_orderstatus, o_orderpriority,
      |   CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR),
      |   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'))), 1, 12) AS h12
      |  FROM orders))
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // R16 (promoted to an oracle-checked query): salted join — the
  // explicit hot-key spread. The salted plan's RESULT is exactly the
  // plain join's, which is what the oracle verifies; the spread across
  // (key, salt) sub-partitions is asserted in ScaleSpec.
  def q69SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
    SkewJoin.saltedJoin(o, c, "o_custkey",
        saltSource = col("o_orderkey"), buckets = 8)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_orders"),
        out2(sum(dmoney(col("o_totalprice")))).as("revenue"))
      .orderBy("c_nationkey")
  }

  val q69Sql: String =
    """SELECT c_nationkey, COUNT(*) AS n_orders,
      | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // R32: SCD2 interval construction — turn a change history into
  // effective-dated versions: each customer's orders become rows with
  // [valid_from, valid_to) via lead() over the per-key history, the
  // open current version marked with a NULL end. One window shuffle
  // keyed by the entity — the standard slowly-changing-dimension build.
  /** Unordered q70 core — the versioned dimension; q102 chains on it. */
  def scd2Versions(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("valid_from", col("o_orderdate"))
      .withColumn("valid_to", lead("o_orderdate", 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumn("version", row_number().over(w).cast(LongType))
      .select(col("o_custkey"), col("version"), col("o_orderkey"),
        col("valid_from"), col("valid_to"), col("is_current"), col("o_totalprice"))
  }

  def q70Scd2(s: SparkSession, dir: String): DataFrame =
    scd2Versions(s, dir).orderBy("o_custkey", "version")

  // R51: point-in-time (temporal) join — each fact row joined to the
  // dimension VERSION that was valid at the fact's event time, against
  // the q70-built SCD2 intervals. The classic "which address/rate/name
  // did the entity have WHEN THIS HAPPENED" warehouse join. Shape: plain
  // equi-join on the entity key + the half-open interval containment as
  // a post-join filter — per-entity version counts are bounded, so the
  // join stays a hash join (no range-join blow-up); intervals are
  // non-overlapping by construction so each fact matches at most one
  // version (zero-length intervals from same-day changes match nothing,
  // the NULL-ended current version catches the open tail).
  def q102TemporalJoin(s: SparkSession, dir: String): DataFrame = {
    val versions = scd2Versions(s, dir)
    val purchases = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    purchases.join(versions,
        col("user_id") === col("o_custkey") &&
          col("valid_from") <= col("ts") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("version"), col("o_orderkey").as("dim_orderkey"),
        col("is_current"), col("o_totalprice").as("dim_price"))
      .orderBy("event_id")
  }

  val q102Sql: String =
    """WITH versions AS (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |  o_orderdate AS valid_from,
      |  LEAD(o_orderdate, 1) OVER w AS valid_to,
      |  ROW_NUMBER() OVER w AS version
      | FROM orders
      | WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |)
      |SELECT e.event_id, e.user_id, e.ts, v.version,
      | v.o_orderkey AS dim_orderkey,
      | v.valid_to IS NULL AS is_current,
      | v.o_totalprice AS dim_price
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') e
      |JOIN versions v ON e.user_id = v.o_custkey
      | AND v.valid_from <= e.ts
      | AND (v.valid_to IS NULL OR e.ts < v.valid_to)
      |ORDER BY e.event_id""".stripMargin

  val q70Sql: String =
    """SELECT o_custkey, version, o_orderkey, valid_from, valid_to,
      | valid_to IS NULL AS is_current, o_totalprice
      |FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |  o_orderdate AS valid_from,
      |  LEAD(o_orderdate, 1) OVER w AS valid_to,
      |  ROW_NUMBER() OVER w AS version
      | FROM orders
      | WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
      |ORDER BY o_custkey, version""".stripMargin

  // R33: gaps-and-islands — consecutive-activity-day runs per user. The
  // classic (day - row_number) grouping trick: one distinct + one window +
  // one aggregate, all partitioned by user_id (high-cardinality key, no
  // global window). Dates are presented as strings (engine-neutral).
  def q71GapsIslands(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val days = e.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    days
      .withColumn("grp",
        datediff(col("day"), lit("1970-01-01").cast(DateType)) - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(
        date_format(min("day"), "yyyy-MM-dd").as("island_start"),
        date_format(max("day"), "yyyy-MM-dd").as("island_end"),
        count(lit(1)).as("n_days"))
      .select("user_id", "island_start", "island_end", "n_days")
      .orderBy("user_id", "island_start")
  }

  val q71Sql: String =
    """SELECT user_id, strftime(MIN(day), '%Y-%m-%d') AS island_start,
      | strftime(MAX(day), '%Y-%m-%d') AS island_end, COUNT(*) AS n_days
      |FROM (
      | SELECT user_id, day,
      |  date_diff('day', DATE '1970-01-01', day)
      |   - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
      | FROM (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events))
      |GROUP BY user_id, grp ORDER BY user_id, island_start""".stripMargin

  // R34: event-time RANGE frame — 30-day trailing spend per order. The
  // frame is a true range frame over epoch seconds (peers by time, not by
  // row), so equal timestamps contribute identically in any engine and
  // under any partitioning. Window is keyed by customer — scales out.
  def q72RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val w = Window.partitionBy("o_custkey").orderBy("ts_sec")
      .rangeBetween(-2592000L, 0L) // 30 days in seconds
    o.withColumn("ts_sec", unix_timestamp(col("o_orderdate")))
      .withColumn("trail30_spend", out2(sum(dmoney(col("o_totalprice"))).over(w)))
      .withColumn("trail30_orders", count(lit(1)).over(w))
      .select("o_custkey", "o_orderkey", "o_orderdate", "trail30_spend", "trail30_orders")
      .orderBy("o_custkey", "o_orderkey")
  }

  val q72Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))) OVER w, 2) AS DOUBLE) AS trail30_spend,
      | COUNT(*) OVER w AS trail30_orders
      |FROM (SELECT *, date_diff('second', TIMESTAMP '1970-01-01', o_orderdate) AS ts_sec FROM orders)
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY ts_sec
      | RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // R35: deterministic mode / frequency profile — most frequent p_type per
  // brand. Built from count + row_number with an explicit value tiebreak
  // (engine mode() functions break ties arbitrarily; this one is total).
  def q73ModeFreq(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val counts = p.groupBy("p_brand", "p_type").agg(count(lit(1)).as("cnt"))
    val wRank = Window.partitionBy("p_brand").orderBy(col("cnt").desc, col("p_type"))
    val wAll = Window.partitionBy("p_brand")
    counts
      .withColumn("brand_total", sum("cnt").over(wAll))
      .withColumn("n_types", count(lit(1)).over(wAll))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") === 1)
      .select(
        col("p_brand"), col("p_type").as("mode_type"), col("cnt").as("mode_cnt"),
        col("n_types"),
        round(col("cnt").cast(DoubleType) / col("brand_total"), 6).as("mode_share"))
      .orderBy("p_brand")
  }

  val q73Sql: String =
    """SELECT p_brand, p_type AS mode_type, cnt AS mode_cnt, n_types,
      | ROUND(CAST(cnt AS DOUBLE) / brand_total, 6) AS mode_share
      |FROM (
      | SELECT p_brand, p_type, cnt,
      |  SUM(cnt) OVER (PARTITION BY p_brand) AS brand_total,
      |  COUNT(*) OVER (PARTITION BY p_brand) AS n_types,
      |  ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY cnt DESC, p_type) AS rn
      | FROM (SELECT p_brand, p_type, COUNT(*) AS cnt FROM part GROUP BY 1, 2))
      |WHERE rn = 1 ORDER BY p_brand""".stripMargin

  // R11 (native form): the same as-of semantics as q10, but through the
  // custom AsOfJoin plan (graft.plans: LogicalPlan + Strategy + sort-merge
  // SparkPlan injected via SparkSessionExtensions) instead of the
  // window-over-union composition. Shares q10's oracle SQL — two
  // implementations, one ground truth.
  def q78AsofNative(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = e.filter(col("event_type") === "signup")
      .select("event_id", "user_id", "ts")
    graft.plans.AsOf.join(
        purchases, signups,
        on = Seq("user_id" -> "user_id"),
        time = "ts" -> "ts",
        seq = "event_id" -> "event_id",
        values = Seq("ts" -> "last_signup_ts"))
      .select("event_id", "user_id", "ts", "last_signup_ts")
      .orderBy("event_id")
  }

  // R37: the SQL front door — the same engine surface through raw SQL
  // text over registered temp views (what a reference user's ad-hoc
  // queries look like). The plan Catalyst produces from this text is the
  // same one the DataFrame API yields: one scan per table, dims
  // broadcast, decimal-exact aggregation. Shipping-priority (TPC-H Q3)
  // shape.
  def q79SqlFrontend(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT o_orderkey,
        | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
        |   (CAST(1 AS DECIMAL(7,4)) - CAST(l_discount AS DECIMAL(7,4)))), 2) AS DOUBLE) AS revenue,
        | o_orderdate, o_orderpriority
        |FROM v_customer JOIN v_orders ON c_custkey = o_custkey
        | JOIN v_lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 100""".stripMargin)
  }

  val q79Sql: String =
    """SELECT o_orderkey,
      | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
      |   (CAST(1 AS DECIMAL(7,4)) - CAST(l_discount AS DECIMAL(7,4)))), 2) AS DOUBLE) AS revenue,
      | o_orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      | JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 100""".stripMargin

  // R39: distribution window functions — percent_rank and cume_dist over
  // a TOTAL order (totalprice, orderkey). Both are exact rationals
  // ((rank-1)/(n-1), peers/n) evaluated identically by any engine; the
  // window is keyed by priority, never global.
  def q83WindowDist(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    o.select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  val q83Sql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice,
      | ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
      | ROUND(CUME_DIST() OVER w, 6) AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  // R40: collection higher-order functions — per-order quantity vector
  // built as an ORDERED array, then filtered/indexed/folded in-row
  // (array_sort + filter + element_at + aggregate). The array never
  // leaves the row: output is scalar, so the shuffle carries no payload
  // beyond the aggregate itself.
  def q84ArrayOps(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    l.groupBy("l_orderkey")
      .agg(sort_array(collect_list(dmoney(col("l_quantity")))).as("qtys"))
      .select(
        col("l_orderkey"),
        size(col("qtys")).cast(LongType).as("n_items"),
        element_at(col("qtys"), 1).cast(DoubleType).as("min_qty"),
        element_at(col("qtys"), -1).cast(DoubleType).as("max_qty"),
        size(filter(col("qtys"), q => q > lit(25))).cast(LongType).as("n_big"),
        aggregate(col("qtys"), lit(BigDecimal(0)).cast(DecimalType(25, 4)),
          // pin the accumulator type: decimal + widens per step otherwise
          (acc, q) => (acc + q).cast(DecimalType(25, 4))).cast(DoubleType).as("qty_sum"))
      .orderBy("l_orderkey")
  }

  val q84Sql: String =
    """SELECT l_orderkey,
      | len(qtys) AS n_items,
      | CAST(qtys[1] AS DOUBLE) AS min_qty,
      | CAST(qtys[-1] AS DOUBLE) AS max_qty,
      | CAST(len(list_filter(qtys, q -> q > 25)) AS BIGINT) AS n_big,
      | CAST(list_reduce(list_prepend(CAST(0 AS DECIMAL(25,4)), qtys),
      |   (acc, q) -> acc + q) AS DOUBLE) AS qty_sum
      |FROM (
      | SELECT l_orderkey,
      |  list(CAST(l_quantity AS DECIMAL(12,4)) ORDER BY CAST(l_quantity AS DECIMAL(12,4))) AS qtys
      | FROM lineitem GROUP BY l_orderkey)
      |ORDER BY l_orderkey""".stripMargin

  // R41: GROUPING SETS — arbitrary grouping-set lattices beyond
  // rollup/cube (here: by-status, by-priority, and grand total in ONE
  // pass over the fact table; Spark plans a single Expand + aggregate).
  // SQL front-door form (the DataFrame API exposes only rollup/cube).
  def q85GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("v_orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        | CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
        | COUNT(*) AS n,
        | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS total
        |FROM v_orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin)
  }

  val q85Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      | CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      | CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
      | COUNT(*) AS n,
      | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin

  // R42: null-safe equality join (<=> / IS NOT DISTINCT FROM) — NULL keys
  // match each other instead of vanishing, the semantics reconciliation
  // and SCD merges need when the business key is nullable. NULL keys are
  // synthesized from the corpus ('F' status → NULL) so both engines see
  // the same nullable domain.
  def q86NullsafeJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val keyed = o.select(nullif(col("o_orderstatus"), lit("F")).as("k"), col("o_totalprice"))
    val left = keyed.groupBy("k").agg(count(lit(1)).as("n_left"))
    val right = keyed.groupBy(col("k").as("rk"))
      .agg(out2(sum(dmoney(col("o_totalprice")))).as("total_right"))
    left.join(right, col("k") <=> col("rk"))
      .select(col("k"), col("n_left"), col("total_right"))
      .orderBy(asc_nulls_first("k"))
  }

  val q86Sql: String =
    """SELECT l.k, l.n_left, r.total_right
      |FROM (
      | SELECT NULLIF(o_orderstatus, 'F') AS k, COUNT(*) AS n_left
      | FROM orders GROUP BY 1) l
      |JOIN (
      | SELECT NULLIF(o_orderstatus, 'F') AS k,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_right
      | FROM orders GROUP BY 1) r
      |ON l.k IS NOT DISTINCT FROM r.k
      |ORDER BY l.k NULLS FIRST""".stripMargin

  // R14: approximate aggregates — HLL++ sketch vs exact, per source.
  // Rows-only (DuckDB's approx sketch differs); the exact twin columns
  // are oracle-covered inside q04 (count distinct). At 100 TB the sketch
  // is mergeable → single pass, no giant distinct shuffle.
  def q13ApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.groupBy("source")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("text")).as("n_exact"),
        approx_count_distinct(col("text"), 0.02).as("n_approx")
      )
      .withColumn("rel_err",
        round(abs(col("n_approx") - col("n_exact")).cast(DoubleType) / col("n_exact"), 4))
      .orderBy("source")
  }

  // R53: DECLARATIVE sessionization — Spark's built-in session_window
  // as the third twin of the gap-session family (q11 = batch
  // lag+cumsum islands, SessionStream/V2 = streaming state machines).
  // One groupBy over a dynamic-gap window; in batch mode this is one
  // keyed exchange + sort (the same cost shape as q11's window), and
  // the IDENTICAL expression works under readStream with a watermark —
  // the batch/stream-unified form the hand-built variants approximate.
  // Boundary semantics (spec-verified on a MemoryStream): an event
  // exactly gap after its predecessor MERGES into the session — the
  // same `>`-starts-new rule as q11's lag form — so the oracle twin is
  // q11's islands SQL without the ordinal.
  def q107SessionWindow(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"), max("ts").as("session_end"),
        out2(sum(dmoney(col("value")))).as("session_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "session_start")
  }

  val q107Sql: String =
    """SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
      | COUNT(*) AS n_events,
      | CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS session_value
      |FROM (
      | SELECT user_id, ts, value,
      |  CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      | FROM (
      |  SELECT user_id, event_id, ts, value,
      |   CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      |  FROM (
      |   SELECT user_id, event_id, ts, value,
      |    LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |   FROM events)))
      |GROUP BY user_id, session_id ORDER BY user_id, session_start""".stripMargin

  // R52 (rows-only, q13's exact-vs-sketch pattern): SKETCH percentiles —
  // the declared 100 TB scale twin of q14/q92's exact percentile step.
  // `percentile()` is a per-group sort that materializes every value; at
  // 100 TB a per-group exact quantile of a fact column is a heavy global
  // sort. `approx_percentile` (Greenwald-Khanna) is a MERGEABLE bounded-
  // memory sketch: map-side partial sketches combine associatively, so
  // the shuffle carries one sketch per group instead of the column.
  // Accuracy 100 ⇒ rank error ≤ n/100 (asserted by the spec against the
  // exact ranks; like q13's HLL there is no DuckDB twin because sketch
  // internals differ across engines — the exact columns beside it ARE
  // the oracle-checked q14 values).
  val SketchAccuracy = 100

  def q106ApproxPercentile(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50_exact"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_exact"),
        round(expr(s"approx_percentile(o_totalprice, 0.5, $SketchAccuracy)"), 4).as("p50_sketch"),
        round(expr(s"approx_percentile(o_totalprice, 0.9, $SketchAccuracy)"), 4).as("p90_sketch"))
      .withColumn("p50_rel_err",
        round(abs(col("p50_sketch") - col("p50_exact")) / col("p50_exact"), 4))
      .withColumn("p90_rel_err",
        round(abs(col("p90_sketch") - col("p90_exact")) / col("p90_exact"), 4))
      .orderBy("o_orderpriority")
  }

  // R54: PORTABLE HyperLogLog — the cross-engine answer to q13's
  // rows-only status. q13 demonstrates Spark's built-in HLL++ (its
  // sketch bytes are engine-internal, so no DuckDB twin can exist);
  // this operator builds the Flajolet et al. 2007 sketch from scratch
  // on md5Long, making every intermediate — bucket, rank, register,
  // harmonic sum — exact integer arithmetic both engines share, so the
  // ESTIMATE ITSELF is oracle-checked to the last bit. m=64 registers:
  // bucket = top 6 hash bits, rank = leading zeros + 1 of the low 54
  // bits via length(bin(w)) (exact in both engines, no float log2);
  // the harmonic denominator Σ 2^-Mj is scaled by 2^55 into an exact
  // BIGINT sum; the one double division happens once per column.
  // Scale shape: registers are a groupBy(col, bucket).max — mergeable,
  // shuffle payload = 64 rows per column regardless of corpus size;
  // that mergeability is WHY HLL is the 100 TB distinct-counter. The
  // small-range correction branch (E <= 2.5m with empty registers) is
  // implemented for totality though these cardinalities never hit it.
  def q115PortableHll(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val m = 64
    val vals = l.select(explode(array(
        struct(lit("l_orderkey").as("c"), col("l_orderkey").cast(StringType).as("v")),
        struct(lit("l_partkey").as("c"), col("l_partkey").cast(StringType).as("v")),
        struct(lit("l_suppkey").as("c"), col("l_suppkey").cast(StringType).as("v"))
      )).as("x"))
      .select(col("x.c").as("c"), col("x.v").as("v"))
    val est = hllEstimate(vals)
    val exact = vals.groupBy("c").agg(countDistinct(col("v")).as("n_exact"))
    est.join(exact, Seq("c"))
      .select(col("c"), col("occupied"), col("n_exact"), col("estimate"),
        round(abs(col("estimate") - col("n_exact")) / col("n_exact"), 6).as("rel_err"))
      .orderBy("c")
  }

  // R55: PORTABLE count-min sketch — frequency estimation for heavy
  // hitters (Cormode & Muthukrishnan 2005), the fourth member of the
  // sketch family (HLL distinct / GK quantile / Bloom membership /
  // CMS frequency). d=4 salted md5Long hash rows × w=256 columns of
  // INTEGER counters: cell counts are plain groupBy sums (mergeable by
  // addition — the 100 TB combine is a 1024-row reduce no matter the
  // corpus), and each query key's estimate is the MIN over its d
  // cells, which can only OVERcount (one-sided error ≤ e/w · N with
  // prob 1-e^-d). Every number is exact integer arithmetic, so the
  // whole sketch — cells, estimates, overcounts — is oracle-checked.
  val CmsDepth = 4
  val CmsWidth = 256

  def q116CountMin(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val tok = d.select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    // ONE corpus pass: reduce to per-token counts first (the reduction
    // the top-10 probe needs anyway), then hash only DISTINCT tokens —
    // d hashes per vocabulary entry instead of d per occurrence. Cell
    // counts are weighted sums of the same integers, so the result is
    // bit-identical to the per-occurrence form the oracle SQL computes.
    val tokCounts = tok.groupBy("token").agg(count(lit(1)).as("n"))
    cmsEstimate(tokCounts, CmsWidth, CmsDepth)
  }

  /** The CMS core over a (token, n) count table, parameterized so specs
    * can exercise collision regimes the production width never hits:
    * build d×w cells as weighted sums, estimate the exact top-10 keys
    * by the min over their d cells.
    */
  def cmsEstimate(tokCounts: DataFrame, width: Int, depth: Int): DataFrame = {
    def cellOf(i: Int, t: Column): Column =
      graft.functions.TextFunctions.md5Long(concat_ws(":", lit(i.toString), t)) % width
    val cells = tokCounts
      .select(col("n"), explode(array((0 until depth).map(i =>
        struct(lit(i).as("i"), cellOf(i, col("token")).as("cell"))): _*)).as("x"))
      .select(col("x.i").as("i"), col("x.cell").as("cell"), col("n"))
      .groupBy("i", "cell").agg(sum("n").as("cnt"))
    // query keys: the exact top-10 tokens (desc count, asc token)
    val top = tokCounts.withColumnRenamed("n", "n_exact")
      .orderBy(desc("n_exact"), asc("token")).limit(10)
    val probes = top
      .select(col("token"), col("n_exact"),
        explode(array((0 until depth).map(i =>
          struct(lit(i).as("i"), cellOf(i, col("token")).as("cell"))): _*)).as("x"))
      .select(col("token"), col("n_exact"), col("x.i").as("i"), col("x.cell").as("cell"))
    probes.join(cells, Seq("i", "cell"))
      .groupBy("token", "n_exact")
      .agg(min(col("cnt")).as("n_est"))
      .select(col("token"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overcount"))
      .orderBy(desc("n_exact"), asc("token"))
  }

  val q116Sql: String = {
    def cellOf(salt: String) = graft.functions.TextFunctions
      .md5LongSql(s"$salt || ':' || token") + s" % $CmsWidth"
    s"""WITH tok AS (
       |  SELECT token FROM (
       |   SELECT unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE len(token) > 0),
       |occ AS (
       |  SELECT i, CASE i
       |    WHEN 0 THEN ${cellOf("'0'")}
       |    WHEN 1 THEN ${cellOf("'1'")}
       |    WHEN 2 THEN ${cellOf("'2'")}
       |    ELSE ${cellOf("'3'")} END AS cell
       |  FROM tok CROSS JOIN (SELECT unnest(range(0, $CmsDepth)) AS i)),
       |cells AS (SELECT i, cell, COUNT(*) AS cnt FROM occ GROUP BY 1, 2),
       |top AS (
       |  SELECT token, COUNT(*) AS n_exact FROM tok GROUP BY token
       |  ORDER BY n_exact DESC, token LIMIT 10),
       |probes AS (
       |  SELECT token, n_exact, i, CASE i
       |    WHEN 0 THEN ${cellOf("'0'")}
       |    WHEN 1 THEN ${cellOf("'1'")}
       |    WHEN 2 THEN ${cellOf("'2'")}
       |    ELSE ${cellOf("'3'")} END AS cell
       |  FROM top CROSS JOIN (SELECT unnest(range(0, $CmsDepth)) AS i))
       |SELECT token, n_exact, CAST(MIN(cnt) AS BIGINT) AS n_est,
       | CAST(MIN(cnt) - n_exact AS BIGINT) AS overcount
       |FROM probes JOIN cells USING (i, cell)
       |GROUP BY token, n_exact
       |ORDER BY n_exact DESC, token""".stripMargin
  }

  // R57: PORTABLE quantile estimation — the oracle-checked scale twin
  // of q106's engine-native GK sketch, completing the sketch family's
  // portable row (distinct → q115, frequency → q116, membership → q62,
  // quantile → here). GK/KLL merge state is sequential and
  // engine-internal, so the ESTIMATE can never be cross-checked; a
  // DETERMINISTIC HASH SAMPLE can: keep rows whose md5(key) prefix
  // sorts below the q18 rate threshold (partitioning-, retry-, and
  // engine-invariant — no RNG), take the exact interpolated percentile
  // OF THE SAMPLE, and report it against the exact full-data
  // percentile. Scale shape: the sample is a pure map-side filter that
  // composes with pushdown, so the per-group exact-percentile sort
  // runs on ~5% of the column; rank error is O(1/sqrt(sample)) with
  // high probability — and unlike any native sketch, every output
  // value here is oracle-checked to the bit.
  def q123SampledPercentile(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    // ONE scan + ONE aggregate for both the exact and the sampled
    // estimates (r17 opt; previously two full-table scans joined —
    // SweepDiag flagged the twin 348 B aggregate exchanges): percentile
    // ignores NULL inputs, so percentile(CASE WHEN sampled THEN price
    // END) aggregates exactly the sampled multiset the filtered branch
    // saw — same Percentile expression, same double arithmetic, bit-
    // identical values. n_sample counts the same predicate. The inner
    // join's drop-empty-sample-group semantics is preserved by the
    // where(isNotNull(p50_est)) guard (a priority with zero sampled
    // rows aggregates est percentiles to NULL; none exists at any
    // tested SF, so oracle rows are unchanged).
    val sampled = substring(md5(col("o_orderkey").cast(StringType)), 1, 2) < "0d"
    val sprice = when(sampled, col("o_totalprice"))
    val both = o.groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50_exact"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_exact"),
        count(when(sampled, lit(1))).as("n_sample"),
        round(percentile(sprice, lit(0.5)), 4).as("p50_est"),
        round(percentile(sprice, lit(0.9)), 4).as("p90_est"))
    both.where(col("p50_est").isNotNull)
      .select(col("o_orderpriority"), col("n"), col("n_sample"),
        col("p50_exact"), col("p50_est"),
        round(abs(col("p50_est") - col("p50_exact")) / col("p50_exact"), 6)
          .as("p50_rel_err"),
        col("p90_exact"), col("p90_est"),
        round(abs(col("p90_est") - col("p90_exact")) / col("p90_exact"), 6)
          .as("p90_rel_err"))
      .orderBy("o_orderpriority")
  }

  val q123Sql: String =
    """WITH s AS (
      |  SELECT o_orderpriority, o_totalprice FROM orders
      |  WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '0d'),
      |est AS (
      |  SELECT o_orderpriority, COUNT(*) AS n_sample,
      |   ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS p50_est,
      |   ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4) AS p90_est
      |  FROM s GROUP BY 1),
      |ex AS (
      |  SELECT o_orderpriority, COUNT(*) AS n,
      |   ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS p50_exact,
      |   ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4) AS p90_exact
      |  FROM orders GROUP BY 1)
      |SELECT o_orderpriority, n, n_sample,
      | p50_exact, p50_est,
      | ROUND(ABS(p50_est - p50_exact) / p50_exact, 6) AS p50_rel_err,
      | p90_exact, p90_est,
      | ROUND(ABS(p90_est - p90_exact) / p90_exact, 6) AS p90_rel_err
      |FROM ex JOIN est USING (o_orderpriority)
      |ORDER BY o_orderpriority""".stripMargin

  // R58: cohort retention — the product-analytics matrix over the
  // events stream: users cohorted by their FIRST signup week, and for
  // each week-offset k, the fraction of the cohort active (any event)
  // in that week. Spark-first: one aggregate finds each user's signup
  // instant (min over the filtered scan — no window needed), activity
  // reduces to DISTINCT (user, k) before the cohort rollup, and the
  // cohort-size join is a broadcast of #cohorts rows. Determinism:
  // event timestamps carry sub-second fractions, so both engines must
  // FLOOR to whole seconds before the week division — Spark's
  // unix_seconds floors; the DuckDB twin uses integer-micro floor
  // division (epoch_us // 1_000_000), bit-identical for any instant.
  // The rate is one integer-ratio division rounded at 6.
  // Scale shape: two keyed shuffles over (user) + one over (cohort, k)
  // distinct pairs; nothing carries event payloads past the first
  // projection.
  def q128RetentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    // explicit isnotnull (r17 opt, the q148 defect class): the active
    // join infers IsNotNull(user_id) under ITS copy of the signups
    // subtree while cohortSize's copy stays filter-free, so the two
    // groupBy exchanges canonicalize differently and AQE aggregates the
    // signup slice twice. One explicit filter on the shared base makes
    // the subtrees identical; user_id is never null, results unchanged.
    val signups = e.filter(col("event_type") === "signup" &&
        col("user_id").isNotNull)
      .groupBy("user_id").agg(min("ts").as("signup_ts"))
      .withColumn("cohort_week",
        expr("unix_seconds(signup_ts) div 604800"))
    val active = e.select(col("user_id"), col("ts"))
      .join(signups, Seq("user_id"))
      .filter(col("ts") >= col("signup_ts"))
      .withColumn("k",
        expr("(unix_seconds(ts) - unix_seconds(signup_ts)) div 604800"))
      .select("user_id", "cohort_week", "k")
      .distinct()
    val cohortSize = signups.groupBy("cohort_week")
      .agg(countDistinct(col("user_id")).as("n_users"))
    active.groupBy("cohort_week", "k")
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(broadcast(cohortSize), Seq("cohort_week"))
      .withColumn("retention",
        round(col("n_active").cast(DoubleType) / col("n_users"), 6))
      .select(col("cohort_week"), col("k"), col("n_users"),
        col("n_active"), col("retention"))
      .orderBy("cohort_week", "k")
  }

  val q128Sql: String =
    """WITH signups AS (
      | SELECT user_id, MIN(ts) AS signup_ts
      | FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |cohorted AS (
      | SELECT user_id, signup_ts,
      |  (epoch_us(signup_ts) // 1000000) // 604800 AS cohort_week
      | FROM signups),
      |active AS (
      | SELECT DISTINCT e.user_id, c.cohort_week,
      |  ((epoch_us(e.ts) // 1000000) - (epoch_us(c.signup_ts) // 1000000)) // 604800 AS k
      | FROM events e JOIN cohorted c USING (user_id)
      | WHERE e.ts >= c.signup_ts),
      |sz AS (
      | SELECT cohort_week, COUNT(DISTINCT user_id) AS n_users
      | FROM cohorted GROUP BY cohort_week)
      |SELECT a.cohort_week, a.k, sz.n_users,
      | COUNT(DISTINCT a.user_id) AS n_active,
      | ROUND(CAST(COUNT(DISTINCT a.user_id) AS DOUBLE) / sz.n_users, 6) AS retention
      |FROM active a JOIN sz USING (cohort_week)
      |GROUP BY a.cohort_week, a.k, sz.n_users
      |ORDER BY cohort_week, k""".stripMargin

  /** The portable sketch core: (c, v) rows → one (c, occupied,
    * estimate) row per c. Split out so specs can drive it with
    * arbitrary value sets (duplication-insensitivity, merge law).
    */
  def hllEstimate(vals: DataFrame): DataFrame = {
    val m = 64
    val h = graft.functions.TextFunctions.md5Long(col("v"))
    val regs = vals
      .select(col("c"), shiftright(h, 54).as("bucket"),
        h.bitwiseAND(lit((1L << 54) - 1)).as("w"))
      .withColumn("rho",
        when(col("w") === 0L, lit(55)).otherwise(lit(55) - length(bin(col("w")))))
      .groupBy("c", "bucket").agg(max("rho").as("M"))
    // alpha_m as the HLL paper's expression, constant-folded with the
    // same IEEE ops in both engines
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(64.0))
    regs.groupBy("c")
      .agg(
        count(lit(1)).as("occupied"),
        sum(expr("shiftleft(cast(1 as bigint), cast(55 - M as int))")).as("s_occ"))
      .withColumn("s_total",
        col("s_occ") + (lit(m.toLong) - col("occupied")) * lit(1L << 55))
      .withColumn("zeros", lit(m.toLong) - col("occupied"))
      .withColumn("e_raw",
        alpha * lit(4096.0) * lit(math.pow(2, 55)) / col("s_total").cast(DoubleType))
      .withColumn("estimate",
        round(when(col("e_raw") <= lit(160.0) && col("zeros") > 0,
          lit(64.0) * log(lit(64.0) / col("zeros").cast(DoubleType)))
          .otherwise(col("e_raw")), 4))
      .select("c", "occupied", "estimate")
  }

  val q115Sql: String = {
    val h = graft.functions.TextFunctions.md5LongSql("v")
    """WITH vals AS (
      |  SELECT 'l_orderkey' AS c, CAST(l_orderkey AS VARCHAR) AS v FROM lineitem
      |  UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
      |  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem),
      |hashed AS (
      |  SELECT c, HH >> 54 AS bucket, HH & ((CAST(1 AS BIGINT) << 54) - 1) AS w
      |  FROM (SELECT c, HHEXPR AS HH FROM vals)),
      |regs AS (
      |  SELECT c, bucket,
      |   MAX(CASE WHEN w = 0 THEN 55 ELSE 55 - LENGTH(bin(w)) END) AS M
      |  FROM hashed GROUP BY c, bucket),
      |agg AS (
      |  SELECT c, COUNT(*) AS occupied,
      |   CAST(SUM(CAST(1 AS BIGINT) << CAST(55 - M AS INT)) AS BIGINT) AS s_occ
      |  FROM regs GROUP BY c),
      |est AS (
      |  SELECT c, occupied,
      |   CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(64.0 AS DOUBLE))
      |     * CAST(4096.0 AS DOUBLE) * POW(2, 55)
      |     / CAST(s_occ + (64 - occupied) * (CAST(1 AS BIGINT) << 55) AS DOUBLE)
      |    AS e_raw,
      |   64 - occupied AS zeros
      |  FROM agg),
      |fin AS (
      |  SELECT c, occupied,
      |   ROUND(CASE WHEN e_raw <= CAST(160.0 AS DOUBLE) AND zeros > 0
      |     THEN CAST(64.0 AS DOUBLE) * LN(CAST(64.0 AS DOUBLE) / CAST(zeros AS DOUBLE))
      |     ELSE e_raw END, 4)
      |    AS estimate
      |  FROM est),
      |exact AS (SELECT c, COUNT(DISTINCT v) AS n_exact FROM vals GROUP BY c)
      |SELECT c, occupied, n_exact, estimate,
      | ROUND(ABS(estimate - n_exact) / n_exact, 6) AS rel_err
      |FROM fin JOIN exact USING (c)
      |ORDER BY c""".stripMargin.replace("HHEXPR", h)
  }
}
