package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.Relational.{dmoney, out2}

/** Balance-sheet construction operators (SURVEY.md §2.2, E8/E14/E15).
  * Each balance sheet in the reference is one (CIK, filing); here each
  * order's lineitems stand in for one sheet's lines — same shape, fully
  * parallel over the high-cardinality orderkey.
  */
object BalanceSheet {

  // E8 (DatabaseSplits.py:25-89): ordered bisection — the last
  // asset-marker line splits the sheet into asset and liability blocks.
  // One window MAX per sheet; no driver-side iteration (the reference
  // loops per sheet in Python).
  def q26BsSplit(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val w = Window.partitionBy("l_orderkey")
    l.withColumn("split_line",
        max(when(col("l_returnflag") === "A", col("l_linenumber"))).over(w))
      .withColumn("block",
        when(col("split_line").isNull, "unsplit")
          .when(col("l_linenumber") <= col("split_line"), "assets")
          .otherwise("liabilities"))
      .groupBy("l_orderkey", "block")
      .agg(count(lit(1)).as("n_lines"),
        out2(sum(dmoney(col("l_extendedprice")))).as("block_total"))
      .orderBy("l_orderkey", "block")
  }

  val q26Sql: String =
    """SELECT l_orderkey, block, COUNT(*) AS n_lines,
      | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS block_total
      |FROM (
      | SELECT l_orderkey, l_extendedprice,
      |  CASE WHEN split_line IS NULL THEN 'unsplit'
      |       WHEN l_linenumber <= split_line THEN 'assets'
      |       ELSE 'liabilities' END AS block
      | FROM (
      |  SELECT l_orderkey, l_linenumber, l_extendedprice,
      |   MAX(CASE WHEN l_returnflag = 'A' THEN l_linenumber END) OVER (PARTITION BY l_orderkey) AS split_line
      |  FROM lineitem))
      |GROUP BY l_orderkey, block
      |ORDER BY l_orderkey, block""".stripMargin

  // E14 (DatabaseStructured.py:50-90, 222-241): per-class conditional sum
  // then keep-first dedup — per supplier keep the dominant class row.
  def q30StructuredAgg(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val agg = l.groupBy("l_suppkey", "l_returnflag")
      .agg(sum(dmoney(col("l_extendedprice"))).as("amount_dec"),
        count(lit(1)).as("n_lines"))
    val w = Window.partitionBy("l_suppkey").orderBy(desc("amount_dec"), asc("l_returnflag"))
    agg.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_suppkey"), col("l_returnflag").as("top_class"),
        out2(col("amount_dec")).as("amount"), col("n_lines"))
      .orderBy("l_suppkey")
  }

  val q30Sql: String =
    """SELECT l_suppkey, l_returnflag AS top_class,
      | CAST(ROUND(amount_dec, 2) AS DOUBLE) AS amount, n_lines
      |FROM (
      | SELECT l_suppkey, l_returnflag, amount_dec, n_lines,
      |  ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY amount_dec DESC, l_returnflag) AS rn
      | FROM (
      |  SELECT l_suppkey, l_returnflag,
      |   SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS amount_dec, COUNT(*) AS n_lines
      |  FROM lineitem GROUP BY l_suppkey, l_returnflag))
      |WHERE rn = 1 ORDER BY l_suppkey""".stripMargin

  // E15 (DatabaseStructured.py:130-148): reconstruction check — the sum
  // of classified lines vs the reported total, graded
  // PERFECT / BOUNDED / GROSS / NOT FOUND.
  def q31Reconstruction(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    val recon = l.groupBy("l_orderkey")
      .agg(sum(dmoney(col("l_extendedprice"))).as("recon_dec"))
    val reconD = col("recon_dec").cast(DoubleType)
    o.join(recon, o("o_orderkey") === recon("l_orderkey"), "left_outer")
      .withColumn("rel_err",
        when(col("recon_dec").isNotNull && col("o_totalprice") > 0,
          round(abs(reconD - col("o_totalprice")) / col("o_totalprice"), 6)))
      .withColumn("grade",
        when(col("recon_dec").isNull, "NOT FOUND")
          .when(col("rel_err") === 0.0, "PERFECT")
          .when(col("rel_err") <= 0.1, "BOUNDED")
          .otherwise("GROSS"))
      .select(col("o_orderkey"), col("o_totalprice"),
        out2(col("recon_dec")).as("reconstructed"), col("rel_err"), col("grade"))
      .orderBy("o_orderkey")
  }

  val q31Sql: String =
    """SELECT o_orderkey, o_totalprice,
      | CAST(ROUND(recon_dec, 2) AS DOUBLE) AS reconstructed,
      | CASE WHEN recon_dec IS NOT NULL AND o_totalprice > 0
      |  THEN ROUND(ABS(CAST(recon_dec AS DOUBLE) - o_totalprice) / o_totalprice, 6) END AS rel_err,
      | CASE WHEN recon_dec IS NULL THEN 'NOT FOUND'
      |      WHEN ROUND(ABS(CAST(recon_dec AS DOUBLE) - o_totalprice) / o_totalprice, 6) = 0.0 THEN 'PERFECT'
      |      WHEN ROUND(ABS(CAST(recon_dec AS DOUBLE) - o_totalprice) / o_totalprice, 6) <= 0.1 THEN 'BOUNDED'
      |      ELSE 'GROSS' END AS grade
      |FROM orders LEFT JOIN (
      | SELECT l_orderkey, SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS recon_dec
      | FROM lineitem GROUP BY l_orderkey) r
      |ON o_orderkey = r.l_orderkey
      |ORDER BY o_orderkey""".stripMargin

  // E22: balance-sheet ANALYTICS over the constructed database — the
  // downstream consumer the reference ships as
  // Structured_assets_liabilities.ipynb: per (entity, year) asset and
  // liability totals, the leverage ratio, and the year-over-year asset
  // growth time series. Conditional decimal aggregates + one entity-keyed
  // lag window; ratios are single IEEE divisions on decimal-exact sums.
  def q87BsAnalytics(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val yearly = o
      .groupBy(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .agg(
        sum(when(col("o_orderstatus") === "O", dmoney(col("o_totalprice")))).as("assets_dec"),
        sum(when(col("o_orderstatus") === "F", dmoney(col("o_totalprice")))).as("liab_dec"))
    val w = Window.partitionBy("o_custkey").orderBy("yr")
    yearly
      .withColumn("prev_assets_dec", lag("assets_dec", 1).over(w))
      .select(
        col("o_custkey"), col("yr").cast(LongType).as("yr"),
        out2(col("assets_dec")).as("assets"),
        out2(col("liab_dec")).as("liabilities"),
        when(col("assets_dec").isNotNull && col("liab_dec").isNotNull,
          round(col("liab_dec").cast(DoubleType) / col("assets_dec").cast(DoubleType), 6))
          .as("leverage"),
        when(col("prev_assets_dec").isNotNull && col("assets_dec").isNotNull,
          round((col("assets_dec") - col("prev_assets_dec")).cast(DoubleType) /
            col("prev_assets_dec").cast(DoubleType), 6))
          .as("yoy_asset_growth"))
      .orderBy("o_custkey", "yr")
  }

  val q87Sql: String =
    """SELECT o_custkey, yr,
      | CAST(ROUND(assets_dec, 2) AS DOUBLE) AS assets,
      | CAST(ROUND(liab_dec, 2) AS DOUBLE) AS liabilities,
      | CASE WHEN assets_dec IS NOT NULL AND liab_dec IS NOT NULL THEN
      |  ROUND(CAST(liab_dec AS DOUBLE) / CAST(assets_dec AS DOUBLE), 6) END AS leverage,
      | CASE WHEN prev_assets_dec IS NOT NULL AND assets_dec IS NOT NULL THEN
      |  ROUND(CAST(assets_dec - prev_assets_dec AS DOUBLE) / CAST(prev_assets_dec AS DOUBLE), 6)
      | END AS yoy_asset_growth
      |FROM (
      | SELECT o_custkey, yr, assets_dec, liab_dec,
      |  LAG(assets_dec, 1) OVER (PARTITION BY o_custkey ORDER BY yr) AS prev_assets_dec
      | FROM (
      |  SELECT o_custkey, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
      |   SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,4)) END) AS assets_dec,
      |   SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,4)) END) AS liab_dec
      |  FROM orders GROUP BY 1, 2))
      |ORDER BY o_custkey, yr""".stripMargin
}
