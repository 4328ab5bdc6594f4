package graft

import java.nio.file.{Files, Paths}
import graft.sources.EdgarIndexSource

/** S5: fixed-width form.idx source — header skipping, layout slicing,
  * form filtering, URL-path CIK recovery.
  */
class EdgarIndexSpec extends GraftSpec {

  private val page =
    """Form Type   Company Name                                                  CIK         Date Filed  File Name
      |--------------------------------------------------------------------------------------------------------------
      |10-K        SOME INDUSTRIAL CORP                                          55          2003-02-14  edgar/data/55/0000055-03-000001.txt
      |X-17A-5     ALPHA BROKER LLC                                              1234        2003-02-18  edgar/data/1234/0001234-03-000007.txt
      |x-17a-5/a   BETA SECURITIES INC                                           98765       2003-03-01  edgar/data/98765/0098765-03-000002.txt
      |""".stripMargin

  test("parses data rows, drops headers, keeps only x-17a forms") {
    val sp = spark
    import sp.implicits._
    val df = EdgarIndexSource.x17a5Filings(page.linesIterator.toSeq.toDF("value"))
    val rows = df.orderBy("cik").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "X-17A-5")
    assert(rows(0).getString(1) == "ALPHA BROKER LLC")
    assert(rows(0).getLong(2) == 1234L)
    assert(rows(0).getString(3) == "2003-02-18")
    assert(rows(1).getString(0) == "x-17a-5/a") // amended filings count too
    assert(rows(1).getLong(2) == 98765L)
  }

  test("CIK from URL path agrees with the CIK column") {
    val sp = spark
    import sp.implicits._
    val df = EdgarIndexSource.parse(page.linesIterator.toSeq.toDF("value"))
    val bad = df.filter(
      EdgarIndexSource.cikFromPath(org.apache.spark.sql.functions.col("path")) =!=
        org.apache.spark.sql.functions.col("cik"))
    assert(bad.count() == 0)
  }

  test("reads from text files on disk") {
    val dir = Files.createTempDirectory("graft_idx")
    Files.writeString(Paths.get(dir.toString, "form.idx"), page)
    val df = EdgarIndexSource.read(spark, dir.toString + "/*.idx")
    assert(df.count() == 2)
  }
}
