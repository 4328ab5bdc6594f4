package graft

/** Every registered query must execute end-to-end on the smallest corpus
  * without throwing, produce a non-empty schema, and (since every query
  * ends in a total ORDER BY) be deterministic. This is the safety net
  * that catches a query breaking on a corpus slice it wasn't tuned on
  * (empty groups, missing strata) before the driver does.
  */
class RegistrySmokeSpec extends GraftSpec {

  test("every registered query runs on sf0.001 with a stable schema") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        assert(df.schema.fields.nonEmpty, s"$name: empty schema")
        df.count() // force full execution
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracleSql keys are a subset of queries and flagship entry returns rows") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
