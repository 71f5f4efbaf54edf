package graft.io

import graft.core.Cols
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FASTA reader (reference get_sequence reads FASTA via pyfaidx,
  * core/pyranges_main.py:5898-6073 — random access on a single machine).
  *
  * Two shapes:
  * - `read`: one row per sequence (Chromosome, seq). Loaded via
  *   wholeTextFiles — fine for references whose individual files fit in
  *   memory, and the input to Seqs.getSequence's broadcast join.
  * - `readChunked`: one row per fixed-size chunk (Chromosome, cstart,
  *   chunk) — the 100 TB shape: sequence extraction becomes a range join
  *   between intervals and chunks (Seqs.getSequenceChunked), no single
  *   executor ever holds a whole chromosome.
  */
object Fasta {
  import Cols._

  def read(spark: SparkSession, path: String): DataFrame = {
    val entries = spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, content) =>
        content.split(">").iterator.filter(_.nonEmpty).map { entry =>
          val lines = entry.split("\n")
          val name = lines.head.trim.split("\\s+").head
          val seq = lines.iterator.drop(1).map(_.trim).mkString("")
          (name, seq)
        }
      }
    spark.createDataFrame(entries).toDF(Chrom, "seq")
  }

  def readChunked(spark: SparkSession, path: String, chunkSize: Int = 1 << 20): DataFrame = {
    val entries = spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, content) =>
        content.split(">").iterator.filter(_.nonEmpty).flatMap { entry =>
          val lines = entry.split("\n")
          val name = lines.head.trim.split("\\s+").head
          val seq = lines.iterator.drop(1).map(_.trim).mkString("")
          (0 until seq.length by chunkSize).iterator.map(off =>
            (name, off.toLong, seq.substring(off, math.min(off + chunkSize, seq.length))))
        }
      }
    spark.createDataFrame(entries).toDF(Chrom, "cstart", "chunk")
      .repartition(col(Chrom), col("cstart"))
  }
}
