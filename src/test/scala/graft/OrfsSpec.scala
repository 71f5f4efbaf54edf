package graft

import graft.core.Cols
import graft.ext.Orfs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** extend_orfs goldens ported verbatim from the reference doctests
  * (reference ext/orfs.py:195-360). */
class OrfsSpec extends AnyFunSuite {
  import Cols._

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  //             *       ^       ^      ... ... ...          *
  val seq1 = "AA TAA TGT ATG GTA ATG GGC GCC GGG ATT CCA CAG TAA GTG C".replace(" ", "")
  val seq1b = "AA TAA TGT ATG GTA ATG GGC GCC GGG ATT CCA CAG AAA GTG C".replace(" ", "")
  val seq1c = "AA TAC TGT ATG GTA ATG GGC GCC GGG ATT CCA CAG TAA GTG C".replace(" ", "")
  val seq2 = "CC GGG CTA CTG AAA CAC CTG GCC CAA CAT CAA ACG CTA G".replace(" ", "")

  def seqs(s: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq(("seq1", s)).toDF(Chrom, "seq")
  }
  def p: org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq(("seq1", 20L, 29L, "+")).toDF(Chrom, Start, End, Strand)
  }
  def ses(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(Start, End).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("extend_orfs doctest: both directions to start/stop") {
    assert(ses(Orfs.extendOrfs(p, seqs(seq1))) == Set((8L, 38L)))
  }

  test("extend_orfs doctest: record_extensions") {
    val r = Orfs.extendOrfs(p, seqs(seq1), recordExtensions = true)
      .select(Start, End, "extension_up", "extension_down").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (8L, 38L, 12L, 9L))
  }

  test("extend_orfs doctest: direction up only") {
    assert(ses(Orfs.extendOrfs(p, seqs(seq1), directionDown = false)) ==
      Set((8L, 29L)))
  }

  test("extend_orfs doctest: starts=[] means stop-delimited ORFs") {
    assert(ses(Orfs.extendOrfs(p, seqs(seq1), starts = Nil)) == Set((5L, 38L)))
  }

  test("extend_orfs doctest: no downstream stop -> no extension unless keep_off_bounds") {
    val r = Orfs.extendOrfs(p, seqs(seq1b), recordExtensions = true)
      .select(Start, End, "extension_up", "extension_down").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (8L, 29L, 12L, 0L))
    val r2 = Orfs.extendOrfs(p, seqs(seq1b), recordExtensions = true,
        keepOffBounds = true)
      .select(Start, End, "extension_up", "extension_down").head
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(3)) ==
      (8L, 41L, 12L, 12L))
  }

  test("extend_orfs doctest: no upstream stop; keep_off_bounds takes full region") {
    val r = Orfs.extendOrfs(p, seqs(seq1c), recordExtensions = true)
      .select(Start, End, "extension_up", "extension_down").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (8L, 38L, 12L, 9L))
    val r2 = Orfs.extendOrfs(p, seqs(seq1c), recordExtensions = true,
        keepOffBounds = true)
      .select(Start, End, "extension_up", "extension_down").head
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(3)) ==
      (2L, 38L, 18L, 9L))
  }

  test("extend_orfs doctest: multi-exon minus-strand group") {
    import spark.implicits._
    val np = Seq(("seq2", 19L, 23L, "-", "a"), ("seq2", 11L, 13L, "-", "a"))
      .toDF(Chrom, Start, End, Strand, "ID")
    val sq = Seq(("seq2", seq2)).toDF(Chrom, "seq")
    val got = ses(Orfs.extendOrfs(np, sq, groupKeys = Seq("ID")))
    assert(got == Set((19L, 29L), (5L, 13L)))
  }
}
