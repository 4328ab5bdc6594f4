package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared test harness: one tuned local session per JVM (suites reuse it
  * via getOrCreate), sf0.001 corpus as fixture data.
  */
trait GraftSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSpec.session
  val sfDir: String = "/root/testdata/sf0.001"
}

object GraftSpec {
  lazy val session: SparkSession = GraftSession("local[4]", 4)
}
