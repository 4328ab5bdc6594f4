package graft

/** The q139 scale rung (round-13 verdict next-round #1, final clause):
  * prove the COMPOSED routed operator holds the capped-q109 wall at the
  * ladder's top rung, and that the routing invariants the sf0.01 specs
  * pin survive a dense tail the small corpus cannot produce. Records,
  * at one gen dir and cap:
  *   - q139 first-pass wall + steady reps (count-to-materialize);
  *   - the pair part vs q109-under-maxOcc=cap: symmetric `except`
  *     counts (both must be 0 — bit-identical pair sets at scale);
  *   - verdict coverage: one verdict per distinct over-cap member
  *     (verdict rows == distinct v1 == distinct members of reported
  *     cells), every rep kept, per-cell verdict mass vs the report;
  *   - capped q109's wall in the same JVM for the "stays near" claim.
  * Usage: runMain graft.RouteProbe <sfDir> <cap> [reps]
  */
object RouteProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    // parse up front (r14 advice): the raw string was interpolated
    // unquoted into the emitted JSON line, so a malformed arg produced
    // invalid JSON for the harness instead of a usage error here
    val cap: Long =
      try args(1).toLong
      catch { case _: NumberFormatException =>
        sys.error(s"usage: RouteProbe <sfDir> <cap:long> [reps] — got cap='${args(1)}'")
      }
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession(s"local[$cpus]", cpus)
    import org.apache.spark.sql.functions._

    spark.conf.set("spark.graft.rplsh.routeCap", cap)
    spark.conf.unset("spark.graft.rplsh.maxOcc")

    // q139 first pass + steady reps (fresh plan each pass, no caching —
    // wall includes the scan, the single payload exchange, both passes)
    val walls = (1 to reps).map { _ =>
      val t = System.nanoTime()
      graft.operators.Dedup.q139RoutedDedup(spark, dir).count()
      (System.nanoTime() - t) / 1e9
    }

    val routed = graft.operators.Dedup.q139RoutedDedup(spark, dir).cache()
    val nPairs = routed.filter(col("kind") === "pair").count()
    val verdicts = routed.filter(col("kind") === "overcap").cache()
    val nVerdicts = verdicts.count()
    val nMembers = verdicts.select("v1").distinct().count()
    val nRepsKept = verdicts.filter(col("v1") === col("v2")).count()
    val nKept = verdicts.filter(col("kept")).count()
    val repNotKept = verdicts
      .filter(col("v1") === col("v2") && !col("kept")).count()
    val nCellsUsed = verdicts.select("band", "key").distinct().count()

    // capped q109 in the same JVM: wall + pair-set bit-identity
    spark.conf.set("spark.graft.rplsh.maxOcc", cap)
    val tQ = System.nanoTime()
    val q109 = graft.operators.Dedup.q109EmbedLsh(spark, dir)
      .select("v1", "v2").cache()
    val nQ109 = q109.count()
    val tQ109 = (System.nanoTime() - tQ) / 1e9
    val pairSet = routed.filter(col("kind") === "pair").select("v1", "v2")
    val extra = pairSet.except(q109).count()
    val missing = q109.except(pairSet).count()
    val report = graft.operators.Dedup
      .q109OverflowCellsAt(spark, dir, cap)
    val nCellsReported = report.count()

    println("=====ROUTEPROBE=====")
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    println(s"""{"dir":"$dir","cap":$cap,"q139_walls_s":[${walls.map(f).mkString(",")}],""" +
      s""""pair_rows":$nPairs,"verdict_rows":$nVerdicts,"distinct_members":$nMembers,""" +
      s""""verdicts_eq_members":${nVerdicts == nMembers},"kept_rows":$nKept,""" +
      s""""rep_rows_kept":$nRepsKept,"rep_rows_not_kept":$repNotKept,""" +
      s""""cells_with_verdicts":$nCellsUsed,"cells_reported":$nCellsReported,""" +
      s""""q109_capped_pairs":$nQ109,"q109_capped_wall_s":${f(tQ109)},""" +
      s""""pair_except_q109":$extra,"q109_except_pair":$missing}""")
    spark.stop()
  }
}
