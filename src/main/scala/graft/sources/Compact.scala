package graft.sources

import org.apache.spark.sql.DataFrame

/** Size-targeted compaction writer (SURVEY.md §2.4).
  *
  * The perennial 100 TB pipeline problem: a job with thousands of tasks
  * writes thousands of small files, and every downstream scan pays
  * per-file open/footer costs. Compaction estimates the dataset's
  * serialized size from a sampled average row width and repartitions to
  * hit a target file size before writing.
  *
  * The sample is bounded (`sampleRows`), so the sizing pass costs one
  * cheap limited scan, not a full materialization.
  */
object Compact {

  /** Number of partitions that lands `df` near `targetBytes` per file. */
  def partitionsForTarget(df: DataFrame, targetBytes: Long,
      sampleRows: Int = 10000): Int = {
    val total = df.count()
    if (total == 0) 1
    else {
      val sample = df.limit(math.min(sampleRows, Int.MaxValue))
      // on-heap row width is a proxy for encoded width; parquet encoding
      // typically shrinks it, so this over-estimates partition count a
      // little — the safe direction (files smaller than target, never 2x)
      val avgWidth = sample.toJSON.rdd
        .map(_.length.toLong).reduce(_ + _).toDouble / math.min(total, sampleRows)
      val estBytes = (avgWidth * total).toLong
      math.max(1, math.ceil(estBytes.toDouble / targetBytes).toInt)
    }
  }

  /** Repartition to the target size and write parquet. */
  def writeCompacted(df: DataFrame, path: String, targetBytes: Long = 128L * 1024 * 1024): Int = {
    val n = partitionsForTarget(df, targetBytes)
    df.repartition(n).write.mode("overwrite").parquet(path)
    n
  }
}
