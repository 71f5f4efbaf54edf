package graft.ext

import graft.core.Cols
import graft.ops.UnaryOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ORF helpers (reference ext/orfs.py). */
object Orfs {
  import Cols._

  /** calculate_frame (reference ext/orfs.py:42-129): per-CDS-exon reading
    * frame 0/1/2 = (5'->3' cumulative length before the exon) mod 3. */
  def calculateFrame(df: DataFrame, txCol: String,
                     frameCol: String = "Frame",
                     tieBreak: Seq[Column] = Nil): DataFrame =
    UnaryOps.groupCumsum(df, Seq(txCol), useStrand = true, "_cs", "_ce", tieBreak)
      .withColumn(frameCol, pmod(col("_cs"), lit(3L)))
      .drop("_cs", "_ce")

  /** Scan a sequence column for the first in-frame stop codon offset
    * (codon-aligned), -1 if none — building block of extend_orfs
    * (reference ext/orfs.py:132-617, chunked scanning). */
  val firstStopOffset = udf { (s: String) =>
    if (s == null) -1L
    else {
      val up = s.toUpperCase.replace('U', 'T')
      var i = 0
      var found = -1L
      while (found < 0 && i + 3 <= up.length) {
        val c = up.substring(i, i + 3)
        if (c == "TAA" || c == "TAG" || c == "TGA") found = i.toLong
        i += 3
      }
      found
    }
  }

  /** extend_orfs, simplified (reference ext/orfs.py:132-617): extend each
    * CDS 3'-ward to the nearest in-frame stop codon found in the
    * chromosome sequence, scanning up to maxExtension bp. The reference
    * iterates driver-side in chunks of 900 bp; here one substring fetch of
    * maxExtension suffices (columnar, no loop). */
  def extendOrfs3(df: DataFrame, chromSeqs: DataFrame,
                  maxExtension: Long = 900): DataFrame = {
    val isNeg = col(Strand) === RevStrand
    val joined = df.join(broadcast(chromSeqs), Seq(Chrom))
    val fwdTail = expr(s"substring(seq, $End + 1, $maxExtension)")
    val revTail = Seqs.reverseComplement(
      expr(s"substring(seq, greatest($Start - $maxExtension, 0) + 1, least($Start, $maxExtension))"))
    val tail = when(isNeg, revTail).otherwise(fwdTail)
    val off = firstStopOffset(tail)
    joined
      .withColumn(End, when(!isNeg && off >= 0, col(End) + off + 3).otherwise(col(End)))
      .withColumn(Start, when(isNeg && off >= 0, col(Start) - off - 3).otherwise(col(Start)))
      .drop("seq")
  }
}
