package graft

import org.apache.spark.sql.functions._

/** Host-speed fingerprint: two fixed, deterministic workloads whose
  * wall time depends only on the machine — a single-thread JVM hash
  * loop and a fixed 32-way Spark aggregation. Rounds run on whatever
  * host the scheduler provides, and r9 measured a uniform ~1.6× shift
  * against r8's calm artifact on identical code; committing this
  * fingerprint per round (HOSTCHECK_r{N}.json) lets any cross-round
  * bench comparison be normalized by a measured host factor instead of
  * argued from a control query.
  *
  * Usage: runMain graft.HostCheck [outPath]
  */
object HostCheck {
  def main(args: Array[String]): Unit = {
    def stPass(): Long = {
      // 10M-step xxhash-style mix, single thread; pure ALU
      var h = 0x9E3779B97F4A7C15L
      var i = 0L
      while (i < 10_000_000L) {
        h ^= i; h *= 0xC2B2AE3D27D4EB4FL; h ^= (h >>> 31)
        i += 1
      }
      h
    }
    def timeMs(f: () => Any): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e6
    }
    stPass(); stPass() // JIT warm
    val st = (1 to 5).map(_ => timeMs(() => stPass())).min

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession(s"local[$cpus]", cpus)
    def sparkPass(): Any =
      // shiftright keeps the per-row value in ±2^31 so the ANSI sum of
      // 50M terms cannot overflow a long
      spark.range(0, 50_000_000L, 1, cpus)
        .select(sum(shiftright(xxhash64(col("id")), 32))).head
    sparkPass() // warm
    val sp = (1 to 3).map(_ => timeMs(() => sparkPass())).min
    spark.stop()

    val json = String.format(java.util.Locale.ROOT,
      """{"single_thread_hash10M_ms":%.1f,"spark_range50M_ms":%.1f,"cpus":%d}""",
      Double.box(st), Double.box(sp), Integer.valueOf(cpus))
    val out = if (args.nonEmpty) args(0) else "HOSTCHECK.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    println(json)
  }
}
