package graft.sources

import org.apache.spark.sql.SparkSession

/** Stage-then-swap for surgical rewrites of a partitioned published
  * artifact (the discipline Quantize.deleteFromIndex introduced for the
  * PQ index, shared here for the BM25 index): survivors of the touched
  * partitions are written to a STAGING dir first — the live artifact is
  * never read-while-overwritten and a mid-write failure leaves it fully
  * intact — then each touched partition directory is deleted and its
  * staged replacement renamed in. A touched partition with no staged
  * replacement (every row was a victim) simply stays deleted, which is
  * the correctness half dynamic partition overwrite gets wrong: it
  * leaves such partitions' files in place and keeps serving deleted
  * rows. Per-partition delete+rename is atomic on HDFS/local; a crash
  * between partitions leaves the remaining staged dirs recoverable in
  * the staging dir rather than a half-written live partition.
  */
object PartitionSwap {

  private type HPath = org.apache.hadoop.fs.Path

  /** `liveDir` is the partitioned artifact root; `stagingDir` holds the
    * freshly-written survivor partitions (same partitionBy layout);
    * `partDirNames` are the touched partition dir names ("tb=3"). The
    * staging dir is removed after the swap.
    */
  def swap(s: SparkSession, liveDir: String, stagingDir: String,
      partDirNames: Seq[String]): Unit = {
    val live = new HPath(liveDir)
    val fs = live.getFileSystem(s.sparkContext.hadoopConfiguration)
    val staging = new HPath(stagingDir)
    partDirNames.foreach { name =>
      val dst = new HPath(live, name)
      fs.delete(dst, true)
      val src = new HPath(staging, name)
      // a failed rename must ABORT with the staging dir intact — the
      // tail cleanup would otherwise delete the only surviving copy of
      // this partition's data (the live dir is already gone)
      if (fs.exists(src)) require(fs.rename(src, dst),
        s"partition swap failed renaming $src -> $dst; staged data left at $staging")
    }
    fs.delete(staging, true)
  }

  /** A fresh staging path beside the live dir (same filesystem, so the
    * swap's renames are metadata ops, never copies).
    */
  def stagingPathFor(liveDir: String): String = {
    val live = new HPath(liveDir)
    new HPath(live.getParent,
      s".${live.getName}-staging-${java.util.UUID.randomUUID}").toString
  }

  /** Partition dir names ("tb=3") holding MORE than one parquet file —
    * the compaction work-list: every append lands a fresh file in each
    * touched partition, so after N ingests a serve scan opens N× the
    * files (and each appended file carries its own row groups, diluting
    * the sorted-file pruning). Single-file partitions are already in
    * publish form and are never rewritten.
    */
  def multiFilePartitions(s: SparkSession, liveDir: String): Seq[String] = {
    val live = new HPath(liveDir)
    val fs = live.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(live)) Seq.empty
    else fs.listStatus(live).filter(_.isDirectory)
      .filter { d =>
        fs.listStatus(d.getPath)
          .count(f => f.getPath.getName.endsWith(".parquet")) > 1
      }
      .map(_.getPath.getName).toSeq.sorted
  }
}
