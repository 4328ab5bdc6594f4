package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixed-width EDGAR `form.idx` reader (SURVEY.md §2.4 S5; reference:
  * ExtractBrokerDealers.py:74-183).
  *
  * A form.idx page is a fixed-width text table:
  * {{{
  *   Form Type   Company Name                     CIK         Date Filed  File Name
  *   ----------------------------------------------------------------------------
  *   X-17A-5     ALPHA BROKER LLC                 1234        2003-02-18  edgar/data/1234/0000.txt
  * }}}
  *
  * Spark-first: `spark.read.text` + substring slicing is a narrow,
  * codegen'd projection — 100 TB of index text parses at scan speed, and
  * the `x-17a` form filter prunes rows before anything shuffles. The CIK
  * is also recoverable from the URL path (the reference does exactly
  * that: `line.split('/')[2]` on the File Name column) — [[cikFromPath]].
  */
object EdgarIndexSource {

  /** Column layout of the classic form.idx page. */
  case class Layout(form: (Int, Int), company: (Int, Int), cik: (Int, Int),
      date: (Int, Int), path: (Int, Int))

  val DefaultLayout: Layout =
    Layout(form = (1, 12), company = (13, 62), cik = (75, 12),
      date = (87, 12), path = (99, 300))

  val schema: StructType = StructType(Seq(
    StructField("form", StringType),
    StructField("company", StringType),
    StructField("cik", LongType),
    StructField("date_filed", StringType),
    StructField("path", StringType)
  ))

  /** Parse raw index lines (one string column named `value`, as produced
    * by spark.read.text) into the typed filing table. Non-data lines
    * (headers, separators) drop out via the numeric-CIK gate.
    */
  def parse(lines: DataFrame, layout: Layout = DefaultLayout): DataFrame = {
    def slice(r: (Int, Int)) = trim(substring(col("value"), r._1, r._2))
    lines
      .select(
        slice(layout.form).as("form"),
        slice(layout.company).as("company"),
        slice(layout.cik).as("cik_s"),
        slice(layout.date).as("date_filed"),
        slice(layout.path).as("path"))
      .filter(col("cik_s").rlike("^[0-9]+$"))
      .withColumn("cik", col("cik_s").cast(LongType))
      .select("form", "company", "cik", "date_filed", "path")
  }

  /** Filings of broker-dealer X-17A-5 reports only. */
  def x17a5Filings(lines: DataFrame, layout: Layout = DefaultLayout): DataFrame =
    parse(lines, layout).filter(lower(col("form")).rlike("^x-17a"))

  /** CIK recovered from the EDGAR URL path (`edgar/data/<cik>/...`). */
  def cikFromPath(path: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(path, "edgar/data/([0-9]+)/", 1).cast(LongType)

  /** Read + parse from text files on any Hadoop-compatible filesystem. */
  def read(spark: SparkSession, globPath: String): DataFrame =
    x17a5Filings(spark.read.text(globPath))
}
