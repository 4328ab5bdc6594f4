package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Retrieval}

/** Retrieval-family probe (PqProbe discipline): separates the BM25
  * INDEX BUILD cost (one-time: postings/df/dl/stats published to
  * parquet) from the per-request SERVE cost (scoreQueries against the
  * loaded index), and measures q150 under the partition dial. The
  * registry q148 pays the build every run by construction (it is the
  * self-contained oracle-checked form); production pays it once —
  * this probe records both sides of that claim.
  *
  * Usage: runMain graft.RetrProbe <sfDir> <partitions> [reps]
  */
object RetrProbe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2 && args.length <= 3,
      "usage: RetrProbe <sfDir> <partitions:int> [reps]")
    val dir = args(0)
    val parts =
      try args(1).toInt
      catch {
        case _: NumberFormatException =>
          sys.error(s"usage: RetrProbe <sfDir> <partitions:int> [reps] — got '${args(1)}'")
      }
    val reps = if (args.length == 3) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = GraftSession(s"local[$cpus]", cpus)
    spark.conf.set("spark.sql.shuffle.partitions", parts)

    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      math.rint((System.nanoTime() - t0) / 1e6) / 1000
    }

    val idxDir = Files.createTempDirectory("bm25idx").toFile.getAbsolutePath
    val buildS = secs {
      Retrieval.publishBm25(Retrieval.buildBm25Index(spark, dir), idxDir)
    }
    val idx = Retrieval.loadBm25(spark, idxDir)
    val queries = Tables.documents(spark, dir)
      .filter(col("doc_id") < Retrieval.NumQueries)
      .select(col("doc_id").as("query_id"), col("text"))
    val serve = (1 to reps).map { _ =>
      secs(require(Retrieval.scoreQueries(queries, idx, excludeSelf = true).count() > 0))
    }
    val q148 = (1 to reps).map { _ =>
      secs(require(Retrieval.q148Bm25(spark, dir).count() > 0))
    }
    val q150 = (1 to reps).map { _ =>
      secs(require(Bpe.q150RagChunks(spark, dir).count() > 0))
    }
    println(s"""{"dir":"$dir","partitions":$parts,"reps":$reps,""" +
      s""""bm25_index_build_publish":$buildS,""" +
      s""""bm25_serve_10q":[${serve.mkString(",")}],""" +
      s""""q148_selfcontained":[${q148.mkString(",")}],""" +
      s""""q150_rag_chunks":[${q150.mkString(",")}]}""")
    spark.stop()
  }
}
