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
}
