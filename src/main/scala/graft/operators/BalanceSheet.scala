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
}
