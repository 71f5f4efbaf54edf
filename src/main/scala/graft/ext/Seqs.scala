package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence string functions (reference ext/seqs.py).
  * reverse_complement is pure built-ins (codegen'd); codon translation is
  * a Scala UDF over the standard NCBI genetic code (per-row, no state).
  */
object Seqs {

  /** DNA/RNA reverse complement, case-preserving (reference
    * ext/seqs.py:53-144). */
  def reverseComplement(seq: Column): Column =
    reverse(translate(seq, "ACGTUacgtu", "TGCAAtgcaa"))

  def complement(seq: Column): Column =
    translate(seq, "ACGTUacgtu", "TGCAAtgcaa")

  /** Standard genetic code (NCBI table 1; reference ext/seqs.py:40-50). */
  val standardCode: Map[String, String] = {
    val bases = "TCAG"
    val aas = "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"
    (for {
      (b1, i) <- bases.zipWithIndex
      (b2, j) <- bases.zipWithIndex
      (b3, k) <- bases.zipWithIndex
    } yield s"$b1$b2$b3" -> aas(i * 16 + j * 4 + k).toString).toMap
  }

  /** Codon -> amino-acid translation (reference ext/seqs.py:150-340):
    * unknown/ambiguous codons -> 'X', trailing partial codon dropped.
    * Backed by the codegen'd TranslateCds Catalyst expression (promoted
    * from a UDF per SURVEY.md §4.3.5; `standardCode` above documents the
    * table the kernel indexes directly). */
  def translateCds(c: Column): Column = graft.expr.Exprs.translate_cds(c)

  /** get_sequence (reference core/pyranges_main.py:5898-6073): extract
    * interval sequences from a per-chromosome sequence table
    * (Chromosome, seq) — broadcast equi-join + substring, strand-aware
    * reverse complement. 0-based half-open in, 1-based substring. */
  def getSequence(df: DataFrame, chromSeqs: DataFrame,
                  outCol: String = "sequence"): DataFrame = {
    import graft.core.Cols._
    val joined = df.join(broadcast(chromSeqs), Seq(Chrom))
    val sub = expr(s"substring(seq, $Start + 1, $End - $Start)")
    val stranded =
      if (df.columns.contains(Strand))
        when(col(Strand) === RevStrand, reverseComplement(sub)).otherwise(sub)
      else sub
    joined.withColumn(outCol, stranded).drop("seq")
  }

  /** Distributed get_sequence over a CHUNKED sequence table
    * (Chromosome, cstart, chunk — from io.Fasta.readChunked): intervals
    * range-join their overlapping chunks, each contributes a substring
    * piece, pieces reassemble per row by chunk order. No executor holds a
    * whole chromosome — the scale path for huge genomes. `df` must carry
    * the row_id contract. */
  def getSequenceChunked(df: DataFrame, chunks: DataFrame,
                         outCol: String = "sequence"): DataFrame = {
    import graft.core.Cols._
    val ch = chunks.select(col(Chrom), col("cstart").as(Start),
      (col("cstart") + length(col("chunk")).cast("long")).as(End), col("chunk"))
    val p = graft.join.RangeJoin.pairs(df, ch, Seq(Chrom))
    val cs = col(Start + "_b")
    val piece = expr(
      s"substring(chunk, CAST(greatest($Start - ${Start}_b, 0) AS INT) + 1, " +
      s"CAST(least($End, ${End}_b) - greatest($Start, ${Start}_b) AS INT))")
    val assembled = p.withColumn("_piece", piece)
      .groupBy(col(RowId))
      .agg(array_join(transform(
        array_sort(collect_list(struct(cs.as("_o"), col("_piece").as("_p")))),
        s => s.getField("_p")), "").as("_raw"))
    val joined = df.join(assembled, Seq(RowId), "left")
    val stranded =
      if (df.columns.contains(Strand))
        when(col(Strand) === RevStrand, reverseComplement(col("_raw")))
          .otherwise(col("_raw"))
      else col("_raw")
    joined.withColumn(outCol, stranded).drop("_raw")
  }

  /** Per-transcript spliced sequence: concat exon sequences 5'->3'
    * (reference core/pyranges_main.py:6036-6073: sorts then concats). */
  def getSplicedSequence(df: DataFrame, chromSeqs: DataFrame, txCol: String,
                         outCol: String = "sequence"): DataFrame = {
    import graft.core.Cols._
    val withSeq = getSequence(df, chromSeqs, "_exonSeq")
    val ordered = graft.ops.UnaryOps.groupCumsum(withSeq, Seq(txCol),
      useStrand = true, "_cs", "_ce")
    // collect_list has no order guarantee: sort the (cumStart, seq) structs
    // then join — cumStart is the 5'->3' position within the transcript.
    ordered.groupBy(col(txCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("_cs"), col("_exonSeq")))),
        s => s.getField("_exonSeq")), "").as(outCol))
  }
}
