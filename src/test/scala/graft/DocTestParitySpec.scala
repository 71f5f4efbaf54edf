package graft

import graft.core.Cols
import graft.ops.{BinaryOps, Composites, Metrics}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Literal ports of the reference's doctest golden examples — the
  * reference's primary correctness corpus (SURVEY.md §5: doctests are
  * the test strategy's backbone). Each test cites the docstring it
  * reproduces; expected values are copied verbatim. */
class DocTestParitySpec extends AnyFunSuite {
  import Cols._

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // reference tests/unit/spliced_subsequence/test_spliced_subsequence.py:
  // slice_ranges with use_strand=False — splicing order is genomic
  // regardless of strand, grouped and ungrouped
  test("spliced_subsequence regression: use_strand=False grouped and per-row") {
    import spark.implicits._
    val p = Seq(("1", "+", 1L, 11L, "t1"), ("1", "+", 40L, 60L, "t1"),
                ("2", "-", 10L, 25L, "t2"), ("2", "-", 70L, 80L, "t2"),
                ("3", "+", 140L, 152L, "t3"))
      .toDF(Chrom, Strand, Start, End, "transcript_id")
      .withColumn(RowId, monotonically_increasing_id())
    def se(df: org.apache.spark.sql.DataFrame) =
      df.select(Chrom, Start, End).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // grouped: first 5 spliced bases of each transcript, genomic order
    assert(se(Composites.sliceRanges(p, Seq("transcript_id"), 0, Some(5),
        useStrand = false)) ==
      Set(("1", 1L, 6L), ("2", 10L, 15L), ("3", 140L, 145L)))
    // ungrouped: every row keeps its own first 5 genomic bases
    assert(se(Composites.sliceRanges(p, Nil, 0, Some(5), useStrand = false)) ==
      Set(("1", 1L, 6L), ("1", 40L, 45L), ("2", 10L, 15L),
          ("2", 70L, 75L), ("3", 140L, 145L)))
  }

  // reference tests/unit/cumsum/test_cumsum.py: group_cumsum over a
  // metadata label must not depend on input row order
  test("group_cumsum regression: label-keyed cumsum is input-order invariant") {
    import spark.implicits._
    val chroms = Seq("chr2","chr3","chr2","chr3","chr3","chr1","chr2","chr3",
      "chr3","chr2","chr2","chr1","chr1","chr2","chr3","chr1","chr2","chr1",
      "chr3","chr2")
    val starts = Seq(785520L,89970L,626749L,168799L,372056L,520458L,800809L,
      34720L,167104L,804868L,59764L,972819L,235131L,4508L,866290L,835796L,
      694284L,65536L,844945L,705072L)
    val ends = Seq(795577L,97475L,635187L,175999L,374410L,521540L,807322L,
      41109L,167881L,805508L,64323L,978796L,240207L,9362L,870401L,845344L,
      701742L,73390L,851624L,712783L)
    val strands = Seq("+","-","+","+","+","+","-","+","-","-","+","+","-",
      "+","+","-","-","-","-","+")
    val labels = Seq("grp0","grp9","grp2","grp5","grp5","grp1","grp7","grp5",
      "grp9","grp8","grp2","grp1","grp3","grp2","grp5","grp3","grp7","grp6",
      "grp9","grp0")
    val rows = chroms.indices.map(i =>
      (chroms(i), strands(i), starts(i), ends(i), labels(i)))
    def cs(input: Seq[(String, String, Long, Long, String)]): Seq[(String, Long)] = {
      val df = input.toDF(Chrom, Strand, Start, End, "Label")
      graft.ops.UnaryOps.groupCumsum(df, Seq("Label"), useStrand = true, "_cs", "_ce")
        .select(col("Label"), col("_ce")).collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    }
    val base = cs(rows)
    assert(base == cs(rows.sortBy(r => (r._1, r._3))), "sorted by position")
    assert(base == cs(rows.sortBy(_._5)), "sorted by label")
    assert(base == cs(rows.reverse), "reversed")
  }

  // reference tests/unit/test_join.py:17-48 (historical issue-8
  // regression): strand-matched inner join keeps only the one minus-
  // strand left row, paired with both overlapping minus rights
  test("join issue-8 regression: strand-matched inner and right join") {
    import spark.implicits._
    val g = Seq(("chr1", 157L, 257L, "-"), ("chr1", 584L, 684L, "-"),
                ("chr1", 731L, 831L, "-"), ("chr1", 821L, 921L, "-"))
      .toDF(Chrom, Start, End, Strand)
    val m = Seq(("chr1", 316L, 416L, "+"), ("chr1", 793L, 893L, "+"),
                ("chr1", 889L, 989L, "+"), ("chr1", 795L, 895L, "-"))
      .toDF(Chrom, Start, End, Strand)
      .withColumn(RowId, monotonically_increasing_id())
    val j = BinaryOps.joinOverlaps(m, g, Seq(Chrom, Strand))
    val got = j.select(Start, End, Strand, Start + "_b", End + "_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set((795L, 895L, "-", 731L, 831L),
                      (795L, 895L, "-", 821L, 921L)))
    // right join adds the two unmatched g rows with null left
    // (reference tests/unit/test_join.py:51-80; NaN -> SQL NULL)
    val jr = BinaryOps.joinOverlaps(m, g, Seq(Chrom, Strand), joinType = "right")
    assert(jr.count() == 4)
    val nulls = jr.filter(col(Start).isNull)
      .select(Start + "_b", End + "_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nulls == Set((157L, 257L), (584L, 684L)))
  }

  // reference tests/unit/test_count_overlaps.py:26-36
  // (test_strand_vs_strand_same): multi-set count over strand-matched
  // features replays the expected table exactly
  test("count_overlaps strand_vs_strand_same regression table") {
    import spark.implicits._
    val a = Seq(("chr1", 6L, 12L, "+"), ("chr1", 10L, 20L, "+"),
                ("chr1", 22L, 27L, "-"), ("chr1", 24L, 30L, "-"))
      .toDF(Chrom, Start, End, Strand)
    val b = Seq(("chr1", 12L, 32L, "+"), ("chr1", 14L, 30L, "+"))
      .toDF(Chrom, Start, End, Strand)
    val c = Seq(("chr1", 8L, 15L, "+"), ("chr1", 713800L, 714800L, "-"),
                ("chr1", 32L, 34L, "-"))
      .toDF(Chrom, Start, End, Strand)
    val features = Seq(("chr1", 0L, 10L, "+"), ("chr1", 10L, 20L, "+"),
                       ("chr1", 20L, 30L, "+"), ("chr1", 30L, 40L, "-"))
      .toDF(Chrom, Start, End, Strand)
      .withColumn(RowId, monotonically_increasing_id())
    val res = BinaryOps.multiCountOverlaps(features,
        Seq("a" -> a, "b" -> b, "c" -> c), Seq(Chrom, Strand))
      .select(Start, End, Strand, "a", "b", "c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(res == Set(
      (0L, 10L, "+", 1L, 0L, 1L),
      (10L, 20L, "+", 2L, 2L, 1L),
      (20L, 30L, "+", 0L, 2L, 0L),
      (30L, 40L, "-", 0L, 0L, 1L)))
  }

  // reference core/pyranges_main.py:1228-1290 (join_overlaps doctest)
  test("join_overlaps doctest: f1 x f2 inner/left/outer") {
    import spark.implicits._
    val f1 = Seq(("chr1", 3L, 6L, "interval1"), ("chr1", 8L, 9L, "interval3"),
                 ("chr1", 5L, 7L, "interval2"))
      .toDF(Chrom, Start, End, "Name").withColumn(RowId, monotonically_increasing_id())
    val f2 = Seq(("chr1", 1L, 2L, "a"), ("chr1", 6L, 7L, "b"))
      .toDF(Chrom, Start, End, "Name")
    val inner = BinaryOps.joinOverlaps(f1, f2, Seq(Chrom))
    val got = inner.select("Name", "Start", "End", "Start_b", "End_b", "Name_b")
      .collect().map(_.toSeq.toList)
    assert(got.toList == List(List("interval2", 5L, 7L, 6L, 7L, "b")))

    val left = BinaryOps.joinOverlaps(f1, f2, Seq(Chrom), joinType = "left")
    assert(left.count() == 3)
    assert(left.filter(col("Start_b").isNull).select("Name").collect()
      .map(_.getString(0)).toSet == Set("interval1", "interval3"))

    val outer = BinaryOps.joinOverlaps(f1, f2, Seq(Chrom), joinType = "outer")
    assert(outer.count() == 4)
    assert(outer.filter(col(Start).isNull).select("Name_b").collect()
      .map(_.getString(0)).toSeq == Seq("a"))
  }

  // reference core/pyranges_main.py:3061-3140 (slice_ranges doctest)
  val pRows = Seq(
    ("1", "+", 1L, 11L, "t1"), ("1", "+", 40L, 60L, "t1"),
    ("2", "-", 10L, 25L, "t2"), ("2", "-", 70L, 80L, "t2"),
    ("3", "+", 140L, 152L, "t3"))
  def p: DataFrame = {
    import spark.implicits._
    pRows.toDF(Chrom, Strand, Start, End, "transcript_id")
      .withColumn(RowId, monotonically_increasing_id())
  }
  def se(df: DataFrame): Set[(Long, Long, String)] =
    df.select(Start, End, "transcript_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("slice_ranges doctest: first 5 nt of each interval (no group)") {
    assert(se(Composites.sliceRanges(p, Seq(RowId), 0, Some(5))) == Set(
      (1L, 6L, "t1"), (40L, 45L, "t1"), (20L, 25L, "t2"), (75L, 80L, "t2"),
      (140L, 145L, "t3")))
  }

  test("slice_ranges doctest: last 10 nt of each interval") {
    assert(se(Composites.sliceRanges(p, Seq(RowId), -10, None)) == Set(
      (1L, 11L, "t1"), (50L, 60L, "t1"), (10L, 20L, "t2"), (70L, 80L, "t2"),
      (142L, 152L, "t3")))
  }

  test("slice_ranges doctest: first 15 nt of each spliced transcript") {
    assert(se(Composites.sliceRanges(p, Seq("transcript_id"), 0, Some(15))) == Set(
      (1L, 11L, "t1"), (40L, 45L, "t1"), (20L, 25L, "t2"), (70L, 80L, "t2"),
      (140L, 152L, "t3")))
  }

  test("slice_ranges doctest: last 20 nt of each spliced transcript") {
    assert(se(Composites.sliceRanges(p, Seq("transcript_id"), -20, None)) == Set(
      (40L, 60L, "t1"), (10L, 25L, "t2"), (70L, 75L, "t2"), (140L, 152L, "t3")))
  }

  test("slice_ranges doctest: region 25..60 of each spliced transcript") {
    assert(se(Composites.sliceRanges(p, Seq("transcript_id"), 25, Some(60))) == Set(
      (55L, 60L, "t1")))
  }

  test("slice_ranges doctest: exclude first and last 3 nt (3, -3)") {
    assert(se(Composites.sliceRanges(p, Seq("transcript_id"), 3, Some(-3))) == Set(
      (4L, 11L, "t1"), (40L, 57L, "t1"), (13L, 25L, "t2"), (70L, 77L, "t2"),
      (143L, 149L, "t3")))
  }

  test("slice_ranges doctest: use_strand=False treats all rows as plus") {
    assert(se(Composites.sliceRanges(p, Seq("transcript_id"), 0, Some(15),
        useStrand = false)) == Set(
      (1L, 11L, "t1"), (40L, 45L, "t1"), (10L, 25L, "t2"), (140L, 152L, "t3")))
  }

  // reference methods/slice_ranges.py:19-54: start/end may be per-row
  // vectors. Expressed as Columns; empty keys = per-row slicing with no
  // shuffle (the reference's ungrouped form, each row its own group).
  test("slice_ranges vector offsets: per-row windows, strand-aware") {
    // row windows: t1a/t2a/t3 first 5, t1b/t2b last 10
    val firstFive = col(Start).isin(1L, 10L, 140L)
    val withOffs = p
      .withColumn("_s", when(firstFive, 0L).otherwise(-10L))
      .withColumn("_e", when(firstFive, 5L).otherwise(lit(null).cast("long")))
    val sliced = Composites.sliceRangesCols(withOffs, Nil, col("_s"),
      Some(coalesce(col("_e"), col(End) - col(Start))))
    assert(se(sliced) == Set(
      (1L, 6L, "t1"),     // + first 5
      (50L, 60L, "t1"),   // + last 10
      (20L, 25L, "t2"),   // - first 5 counts from right
      (70L, 80L, "t2"),   // - last 10 (len 10 -> whole)
      (140L, 145L, "t3")))
    // per-row vector against a grouped (spliced) transcript
    val grouped = Composites.sliceRangesCols(
      p.withColumn("_s", lit(3L)), Seq("transcript_id"), col("_s"), Some(lit(-3L)))
    assert(se(grouped) == Set(
      (4L, 11L, "t1"), (40L, 57L, "t1"), (13L, 25L, "t2"), (70L, 77L, "t2"),
      (143L, 149L, "t3")))
  }

  // reference core/pyranges_main.py:4838-5096 window_ranges group_by:
  // spliced windows cross exon boundaries and split per exon fragment.
  test("windowRangesGrouped chops the spliced transcript, splitting at introns") {
    // t1 "+": exons [1,11)+[40,60) = 30 nt -> windows of 12 in cum space:
    // [0,12) -> [1,11) + [40,42); [12,24) -> [42,54); [24,30) -> [54,60)
    val t1 = Composites.windowRangesGrouped(
      p.filter(col("transcript_id") === "t1"), "transcript_id", 12,
      windowIdCol = Some("wid"))
    val got = t1.select(Start, End, "wid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 11L, 0L), (40L, 42L, 0L), (42L, 54L, 1L), (54L, 60L, 2L)))
    // t2 "-": exons [70,80)+[10,25) 5'->3' = 25 nt; windows of 12:
    // [0,12) -> [70,80) + [23,25); [12,24) -> [11,23); [24,25) -> [10,11)
    val t2 = Composites.windowRangesGrouped(
      p.filter(col("transcript_id") === "t2"), "transcript_id", 12)
    assert(se(t2) == Set((70L, 80L, "t2"), (23L, 25L, "t2"), (11L, 23L, "t2"),
      (10L, 11L, "t2")))
  }

  // reference core/pyranges_main.py:3176-3207 (count_introns doctest):
  // slicing in unspliced coords — introns count toward offsets.
  test("slice_ranges count_introns doctest: 3 variants") {
    assert(se(Composites.sliceRangesUnspliced(p, Seq("transcript_id"), 0, Some(50))) ==
      Set((1L, 11L, "t1"), (40L, 51L, "t1"), (70L, 80L, "t2"), (140L, 152L, "t3")))
    assert(se(Composites.sliceRangesUnspliced(p, Seq("transcript_id"), 0, Some(50),
        useStrand = false)) ==
      Set((1L, 11L, "t1"), (40L, 51L, "t1"), (10L, 25L, "t2"), (140L, 152L, "t3")))
    assert(se(Composites.sliceRangesUnspliced(p, Seq("transcript_id"), -50, Some(-5))) ==
      Set((10L, 11L, "t1"), (40L, 55L, "t1"), (15L, 25L, "t2"), (140L, 147L, "t3")))
  }

  // reference core/pyranges_main.py:2092-2131 (merge_overlaps doctest):
  // the 11-row ensembl GTF sample merged per (chrom, strand) — exercised
  // against the REAL reference data file through our GTF reader.
  test("merge_overlaps doctest semantics on the real reference ensembl.gtf file") {
    // The docstring uses an embedded 11-row variant; the on-disk file has
    // 12 rows (extra 12010-13670 transcript+exon inside the first island,
    // no 112700 exon). Expected islands recomputed for the file.
    val gtf = graft.io.Gtf.readGtf(spark, "/root/reference/pyranges1/data/ensembl.gtf",
      attrKeys = Seq("gene_name"))
    assert(gtf.count() == 12)
    assert(gtf.select("gene_name").distinct().collect().map(_.getString(0)).toSet ==
      Set("DDX11L1", "AL627309.1"))
    // 1-based 11869 in the file -> 0-based 11868 through our reader
    val merged = graft.ops.UnaryOps.merge(gtf, Seq(Chrom, Strand), 0, Some("Count"))
    val got = merged.select(Start, End, Strand, "Count").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(got == Set((11868L, 14409L, "+", 7L), (110952L, 111357L, "-", 1L),
      (120724L, 133723L, "-", 4L)))
  }

  // reference core/pyranges_main.py:2222-2290 (nearest_ranges doctest):
  // distances use the touching=1 convention (README.md:51-53).
  test("nearest_ranges doctest: strand-aware, ignore, k=2, exclude_overlaps") {
    import spark.implicits._
    val f1 = Seq(("chr1", 3L, 6L, "+"), ("chr1", 8L, 9L, "+"), ("chr1", 5L, 7L, "-"))
      .toDF(Chrom, Start, End, Strand).withColumn(RowId, monotonically_increasing_id())
    val f2 = Seq(("chr1", 1L, 2L, "+"), ("chr1", 6L, 7L, "-"), ("chr1", 20L, 22L, "+"))
      .toDF(Chrom, Start, End, Strand).withColumn(RowId, monotonically_increasing_id())
    def dists(d: DataFrame) = d.select(Start, "Distance").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // strand-aware (same): (3,6)+ -> (1,2) d=2; (5,7)- -> (6,7) d=0; (8,9)+ -> (1,2) d=7
    val same = BinaryOps.nearest(f1, f2, Seq(Chrom, Strand))
    assert(dists(same) == Map(3L -> 2L, 5L -> 0L, 8L -> 7L))
    // ignore: (3,6) -> (6,7) d=1; (5,7) -> (6,7) d=0; (8,9) -> (6,7) d=2
    val ign = BinaryOps.nearest(f1, f2, Seq(Chrom))
    assert(dists(ign) == Map(3L -> 1L, 5L -> 0L, 8L -> 2L))
    // k=2 ignore: 6 rows with the doctest's distances
    val k2 = graft.ops.NearestK.nearestK(f1, f2, Seq(Chrom), 2)
    val gotK2 = k2.select(Start, "Distance").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(k2.count() == 6)
    assert(gotK2 == Set((3L, 1L), (3L, 2L), (5L, 0L), (5L, 4L), (8L, 2L), (8L, 7L)))
    // exclude_overlaps ignore: (5,7) -> (1,2) d=4 instead of the overlap
    val excl = graft.ops.NearestK.nearestK(f1, f2, Seq(Chrom), 1, excludeOverlaps = true)
    val gotEx = excl.select(Start, "Distance").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotEx(5L) == 4L && gotEx(3L) == 1L && gotEx(8L) == 2L)
  }

  // reference core/pyranges_main.py:682-745 (cluster_overlaps doctest):
  // bookended intervals cluster only from slack=1; reference ids are
  // 0-based, ours 1-based — compare shifted.
  test("cluster_overlaps doctest: slack 0/1/3 grouping") {
    import spark.implicits._
    val gr = Seq((5L, 9L), (6L, 8L), (12L, 16L), (16L, 18L), (20L, 23L),
                 (22L, 25L), (24L, 27L))
      .map { case (s, e) => ("1", s, e) }.toDF(Chrom, Start, End)
    def cids(slack: Long) = graft.ops.UnaryOps.cluster(gr, Seq(Chrom), slack, "cid")
      .select(Start, "cid").collect()
      .map(r => r.getLong(0) -> (r.getLong(1) - 1)).toMap
    assert(cids(0) == Map(5L -> 0L, 6L -> 0L, 12L -> 1L, 16L -> 2L,
      20L -> 3L, 22L -> 3L, 24L -> 3L))
    assert(cids(1) == Map(5L -> 0L, 6L -> 0L, 12L -> 1L, 16L -> 1L,
      20L -> 2L, 22L -> 2L, 24L -> 2L))
    assert(cids(3) == Map(5L -> 0L, 6L -> 0L, 12L -> 1L, 16L -> 1L,
      20L -> 1L, 22L -> 1L, 24L -> 1L))
  }

  // reference core/pyranges_main.py:5760-5830 (complement_ranges doctest).
  test("complement_ranges doctest: whole-set, grouped, chromsizes flanks") {
    import spark.implicits._
    val a = Seq(("chr1", 2L, 5L, "a"), ("chr1", 10L, 18L, "a"),
                ("chr1", 20L, 30L, "b"), ("chr1", 40L, 46L, "b"))
      .toDF(Chrom, Start, End, "ID")
    def rows(d: DataFrame) = d.select(Start, End).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(graft.ops.UnaryOps.complement(a, Seq(Chrom))) ==
      Set((5L, 10L), (18L, 20L), (30L, 40L)))
    val byId = graft.ops.UnaryOps.complement(a, Seq(Chrom, "ID"))
      .select("ID", Start, End).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(byId == Set(("a", 5L, 10L), ("b", 30L, 40L)))
    val cs = Seq(("chr1", 10000L)).toDF(Chrom, "size")
    assert(rows(graft.ops.UnaryOps.complement(a, Seq(Chrom), Some(cs))) ==
      Set((0L, 2L), (5L, 10L), (18L, 20L), (30L, 40L), (46L, 10000L)))
    val byIdCs = graft.ops.UnaryOps.complement(a, Seq(Chrom, "ID"), Some(cs))
      .select("ID", Start, End).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(byIdCs == Set(("a", 0L, 2L), ("a", 5L, 10L), ("a", 18L, 10000L),
      ("b", 0L, 20L), ("b", 30L, 40L), ("b", 46L, 10000L)))
  }

  // reference core/pyranges_main.py:1540-1655 (map_to_global doctest).
  test("map_to_global doctest: strand product, junction split, truncation") {
    import spark.implicits._
    val gr = Seq(("chr1", 100L, 200L, "+", "tx1"), ("chr1", 300L, 400L, "+", "tx1"),
                 ("chr1", 1000L, 1050L, "-", "tx2"), ("chr1", 1100L, 1200L, "-", "tx2"))
      .toDF(Chrom, Start, End, Strand, "transcript_id")
    val tr = Seq(("tx1", 0L, 80L, "-", "a"), ("tx1", 120L, 140L, "-", "b"),
                 ("tx1", 160L, 170L, "+", "c"), ("tx2", 0L, 20L, "+", "d"),
                 ("tx2", 100L, 130L, "+", "e"))
      .toDF("transcript_id", Start, End, Strand, "label")
    val got = Composites.mapToGlobal(tr, gr, "transcript_id")
      .select("label", Chrom, Start, End, Strand).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet
    assert(got == Set(
      ("a", "chr1", 100L, 180L, "-"), ("b", "chr1", 320L, 340L, "-"),
      ("c", "chr1", 360L, 370L, "+"), ("d", "chr1", 1180L, 1200L, "-"),
      ("e", "chr1", 1020L, 1050L, "-")))
    // junction-spanning locals split; output per overlapped exon
    val tr2 = Seq(("tx1", 90L, 110L, "+", "q"), ("tx2", 80L, 120L, "+", "w"),
                  ("tx2", 50L, 120L, "-", "e"))
      .toDF("transcript_id", Start, End, Strand, "label")
    val got2 = Composites.mapToGlobal(tr2, gr, "transcript_id")
      .select("label", Start, End, Strand).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got2 == Set(
      ("q", 190L, 200L, "+"), ("q", 300L, 310L, "+"),
      ("w", 1030L, 1050L, "-"), ("w", 1100L, 1120L, "-"),
      ("e", 1030L, 1050L, "+"), ("e", 1100L, 1150L, "+")))
    // locals longer than the transcript truncate
    val tr3 = Seq(("tx1", 20L, 1000L, "+", "t")).toDF("transcript_id", Start, End, Strand, "label")
    val got3 = Composites.mapToGlobal(tr3, gr, "transcript_id")
      .select(Start, End).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got3 == Set((120L, 200L), (300L, 400L)))

    // keep_id=False drops the identifier; keep_loc retains the local
    // coordinates as *_local (reference doctests :1593-1633)
    val noId = Composites.mapToGlobal(tr, gr, "transcript_id", keepId = false)
    assert(!noId.columns.contains("transcript_id"))
    val withLoc = Composites.mapToGlobal(tr, gr, "transcript_id", keepLoc = true)
      .filter(col("label") === "a")
      .select(Start + "_local", End + "_local", Strand + "_local").head
    assert(withLoc.getLong(0) == 0L && withLoc.getLong(1) == 80L &&
      withLoc.getString(2) == "-")
  }

  // reference core/pyranges_main.py:1684-1707 (pep_to_cds doctest shape):
  // peptide coordinates scale x3 into CDS space before lifting. A peptide
  // residue [7, 8) on a "-"-strand 2-exon CDS maps to the 3-nt codon,
  // split across exons when it straddles the junction.
  test("map_to_global pep_to_cds: residue -> codon, junction-split codon") {
    import spark.implicits._
    val cds = Seq(("chrA", 100L, 122L, "-", "rna1"),   // 22 nt (5' part, "-")
                  ("chrA", 50L, 70L, "-", "rna1"))     // 20 nt
      .toDF(Chrom, Start, End, Strand, "transcript_id")
    // residue 7 -> CDS [21, 24): last nt of exon1 + first 2 of exon2
    val pep = Seq(("rna1", 7L, 8L, "R"), ("rna1", 0L, 1L, "M"))
      .toDF("transcript_id", Start, End, "aa")
    val got = Composites.mapToGlobal(pep, cds, "transcript_id",
        pepToCds = true, keepId = true)
      .select("aa", Start, End, Strand).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    // "-" strand: cum position c maps to End1 - c within exon1 (cum 0..22)
    // M: cds [0,3) -> genomic [119,122); R: cds [21,24) -> [100,101) + [68,70)
    assert(got == Set(
      ("M", 119L, 122L, "-"),
      ("R", 100L, 101L, "-"), ("R", 68L, 70L, "-")))
  }

  // reference core/pyranges_main.py:2862-2950 (sort_ranges doctest).
  test("sort_ranges doctest: natsort, strand-descending minus, by column") {
    import spark.implicits._
    val pp = Seq(("chr1", "+", 40L, 60L, "t3"), ("chr1", "+", 1L, 11L, "t3"),
                 ("chr1", "-", 10L, 25L, "t2"), ("chr1", "-", 70L, 80L, "t2"),
                 ("chr2", "+", 300L, 400L, "t4"), ("chr11", "+", 140L, 152L, "t5"),
                 ("chr11", "+", 160L, 190L, "t5"), ("chr1", "+", 90L, 100L, "t1"))
      .toDF(Chrom, Strand, Start, End, "transcript_id")
    def order(d: DataFrame) = d.select(Chrom, Start).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(order(graft.ops.UnaryOps.sortRanges(pp, natsort = false)) == Seq(
      ("chr1", 1L), ("chr1", 40L), ("chr1", 90L), ("chr1", 70L), ("chr1", 10L),
      ("chr11", 140L), ("chr11", 160L), ("chr2", 300L)))
    assert(order(graft.ops.UnaryOps.sortRanges(pp, useStrand = false, natsort = false)) == Seq(
      ("chr1", 1L), ("chr1", 40L), ("chr1", 90L), ("chr1", 10L), ("chr1", 70L),
      ("chr11", 140L), ("chr11", 160L), ("chr2", 300L)))
    assert(order(graft.ops.UnaryOps.sortRanges(pp)) == Seq(
      ("chr1", 1L), ("chr1", 40L), ("chr1", 90L), ("chr1", 70L), ("chr1", 10L),
      ("chr2", 300L), ("chr11", 140L), ("chr11", 160L)))
    assert(order(graft.ops.UnaryOps.sortRanges(pp, by = Seq("transcript_id"),
        natsort = false)) == Seq(
      ("chr1", 90L), ("chr1", 1L), ("chr1", 40L), ("chr1", 70L), ("chr1", 10L),
      ("chr11", 140L), ("chr11", 160L), ("chr2", 300L)))
  }

  // reference core/pyranges_main.py:1082-1122 (five_end doctest).
  test("five_end doctest: per-row, grouped, with ext") {
    import spark.implicits._
    val gr = Seq(("chr1", 3L, 9L, "+", "a"), ("chr1", 10L, 14L, "+", "a"),
                 ("chr1", 5L, 7L, "-", "b")).toDF(Chrom, Start, End, Strand, "Name")
    def rows(d: DataFrame) = d.select(Start, End).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(Composites.fiveEnd(gr)) == Set((3L, 4L), (10L, 11L), (6L, 7L)))
    assert(rows(Composites.fiveEnd(gr, groupKeys = Some(Seq("Name")))) ==
      Set((3L, 4L), (6L, 7L)))
    assert(rows(Composites.fiveEnd(gr, groupKeys = Some(Seq("Name")), ext = 1)) ==
      Set((2L, 5L), (5L, 8L)))
  }

  // reference core/pyranges_main.py:4510-4580 (upstream doctest).
  test("upstream doctest: gap variants and transcript-aware flanks") {
    import spark.implicits._
    val a = Seq(("chr1", 100L, 150L, "+"), ("chr1", 180L, 220L, "-"))
      .toDF(Chrom, Start, End, Strand)
    def rows(d: DataFrame) = d.select(Start, End).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(Composites.upstream(a, 10)) == Set((90L, 100L), (220L, 230L)))
    assert(rows(Composites.upstream(a, 10, gap = 5)) == Set((85L, 95L), (225L, 235L)))
    assert(rows(Composites.upstream(a, 10, gap = -5)) == Set((95L, 105L), (215L, 225L)))
    val ex = Seq(("chr1", 0L, 5L, "+", "tx1"), ("chr1", 10L, 15L, "+", "tx1"),
                 ("chr1", 30L, 40L, "-", "tx2"), ("chr1", 50L, 60L, "-", "tx2"))
      .toDF(Chrom, Start, End, Strand, "Tx")
    assert(rows(Composites.upstream(ex, 5, groupKeys = Some(Seq("Tx")))) ==
      Set((-5L, 0L), (60L, 65L)))
  }

  // reference core/pyranges_main.py:1965-2018 (max_disjoint doctest).
  test("max_disjoint doctest: start-order first-fit, strand-aware") {
    import spark.implicits._
    val gr = Seq(("chr1", 3L, 6L, "+"), ("chr1", 5L, 7L, "-"), ("chr1", 8L, 9L, "+"))
      .toDF(Chrom, Start, End, Strand)
    def rows(d: DataFrame) = d.select(Start, End).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(graft.ops.UnaryOps.maxDisjoint(gr, Seq(Chrom))) ==
      Set((3L, 6L), (8L, 9L)))
    val c = Seq((1L, 5L, "+"), (4L, 7L, "+"), (10L, 14L, "+"), (12L, 16L, "-"),
                (19L, 27L, "+"), (20L, 22L, "+"), (24L, 25L, "+"), (28L, 30L, "+"))
      .map { case (s, e, st) => ("chr1", s, e, st) }.toDF(Chrom, Start, End, Strand)
    assert(rows(graft.ops.UnaryOps.maxDisjoint(c, Seq(Chrom, Strand))) ==
      Set((1L, 5L), (10L, 14L), (12L, 16L), (19L, 27L), (28L, 30L)))
  }

  // reference core/pyranges_main.py:5249-5279 (group_cumsum doctest).
  test("group_cumsum doctest: minus-strand groups accumulate 5'->3'") {
    import spark.implicits._
    val gr = Seq(
      ("1", 11868L, 12227L, "+", "DDX11L1"), ("1", 12612L, 12721L, "+", "DDX11L1"),
      ("1", 13220L, 14409L, "+", "DDX11L1"), ("1", 112699L, 112804L, "-", "AL"),
      ("1", 110952L, 111357L, "-", "AL"), ("1", 133373L, 133723L, "-", "AL"),
      ("1", 129054L, 129223L, "-", "AL"), ("1", 120873L, 120932L, "-", "AL"))
      .toDF(Chrom, Start, End, Strand, "gene_name")
    val got = graft.ops.UnaryOps.groupCumsum(gr, Seq("gene_name"), useStrand = true)
      .select(Start, "cumStart", "cumEnd").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(11868L) == ((0L, 359L)) && got(12612L) == ((359L, 468L)) &&
      got(13220L) == ((468L, 1657L)))
    assert(got(133373L) == ((0L, 350L)) && got(129054L) == ((350L, 519L)) &&
      got(120873L) == ((519L, 578L)) && got(112699L) == ((578L, 683L)) &&
      got(110952L) == ((683L, 1088L)))
  }

  // reference core/pyranges_main.py:1775-1900 (map_to_local doctest).
  test("map_to_local doctest: tx as chromosome, strand product, splits, keep flags") {
    import spark.implicits._
    val tr = Seq(("chr1", 100L, 200L, "+", "tx1"), ("chr1", 300L, 400L, "+", "tx1"),
                 ("chr1", 1000L, 1050L, "-", "tx2"), ("chr1", 1100L, 1200L, "-", "tx2"))
      .toDF(Chrom, Start, End, Strand, "transcript_id")
    val g1 = Seq(("chr1", 110L, 180L, "+", "a"), ("chr1", 220L, 240L, "+", "ni"),
                 ("chr1", 320L, 340L, "+", "b"), ("chr1", 340L, 360L, "-", "c"),
                 ("chr1", 500L, 550L, "+", "ng"), ("chr1", 1030L, 1050L, "-", "d"),
                 ("chr1", 1180L, 1200L, "+", "e"))
      .toDF(Chrom, Start, End, Strand, "label")
      .withColumn(RowId, monotonically_increasing_id())
    val got = Composites.mapToLocal(g1, tr, "transcript_id")
      .select("label", Chrom, Start, End, Strand).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet
    assert(got == Set(
      ("a", "tx1", 10L, 80L, "+"), ("b", "tx1", 120L, 140L, "+"),
      ("c", "tx1", 140L, 160L, "-"), ("d", "tx2", 100L, 120L, "+"),
      ("e", "tx2", 0L, 20L, "-")))
    // exon-junction genomic interval splits into two local fragments
    val g2 = Seq(("chr1", 180L, 330L, "+", "q")).toDF(Chrom, Start, End, Strand, "label")
      .withColumn(RowId, monotonically_increasing_id())
    val got2 = Composites.mapToLocal(g2, tr, "transcript_id")
      .select(Start, End).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == Set((80L, 100L), (100L, 130L)))
    // keepChrom / keepLoc expose the genomic columns as *_global
    val kept = Composites.mapToLocal(g2, tr, "transcript_id",
      keepChrom = true, keepLoc = true)
    assert(kept.columns.contains("Chromosome_global") &&
      kept.columns.contains("Start_global") && kept.columns.contains("Strand_global"))
    assert(kept.select("Chromosome_global").head.getString(0) == "chr1")
  }

  // reference core/pyranges_main.py:6130-6190 (clip_ranges doctest).
  test("clip_ranges doctest: no-chromsizes clamps at 0; only_right clips ends") {
    import spark.implicits._
    val w = Seq(("1", -10L, 2L), ("1", 249250600L, 249250640L), ("1", 100L, 150L))
      .toDF(Chrom, Start, End)
    def rows(d: DataFrame) = d.select(Start, End).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(graft.ops.UnaryOps.clipZero(w)) ==
      Set((0L, 2L), (249250600L, 249250640L), (100L, 150L)))
    val cs = Seq(("1", 249250620L)).toDF(Chrom, "size")
    assert(rows(graft.ops.UnaryOps.clip(w, cs, onlyRight = true)) ==
      Set((-10L, 2L), (249250600L, 249250620L), (100L, 150L)))
  }

  // reference core/pyranges_main.py:4887-4950 (window_ranges doctest).
  test("window_ranges doctest: plus tail, minus 5'->3', use_strand=False") {
    import spark.implicits._
    val gr = Seq(("1", 800L, 1012L)).toDF(Chrom, Start, End)
    def rows(d: DataFrame) = d.select(Start, End).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(graft.ops.UnaryOps.windowRanges(gr, 100)) ==
      Set((800L, 900L), (900L, 1000L), (1000L, 1012L)))
    val gs = Seq(("1", 200L, 332L, "+"), ("1", 600L, 787L, "-"))
      .toDF(Chrom, Start, End, Strand)
    assert(rows(graft.ops.UnaryOps.windowRanges(gs, 100)) ==
      Set((200L, 300L), (300L, 332L), (687L, 787L), (600L, 687L)))
    assert(rows(graft.ops.UnaryOps.windowRanges(gs, 100, useStrand = false)) ==
      Set((200L, 300L), (300L, 332L), (600L, 700L), (700L, 787L)))
  }

  // reference core/pyranges_main.py:2455-2560 (overlap doctest).
  test("overlap doctest: plain/multiple/invert/slack/contained") {
    import spark.implicits._
    val gr = Seq(("chr1", 1L, 3L, "A"), ("chr1", 1L, 3L, "a"), ("chr2", 4L, 9L, "b"),
                 ("chr1", 10L, 11L, "c"), ("chr3", 0L, 1L, "d"))
      .toDF(Chrom, Start, End, "ID").withColumn(RowId, monotonically_increasing_id())
    val gr2 = Seq(("chr1", 2L, 3L), ("chr1", 2L, 9L), ("chr2", 1L, 10L))
      .toDF(Chrom, Start, End)
    def ids(d: DataFrame) = d.select("ID").collect().map(_.getString(0)).sorted.toSeq
    assert(ids(BinaryOps.overlap(gr, gr2, Seq(Chrom))) == Seq("A", "a", "b"))
    assert(ids(BinaryOps.overlap(gr, gr2, Seq(Chrom), keepDuplicates = true)) ==
      Seq("A", "A", "a", "a", "b"))
    assert(ids(BinaryOps.overlap(gr, gr2, Seq(Chrom), invert = true)) == Seq("c", "d"))
    assert(ids(BinaryOps.overlap(gr, gr2, Seq(Chrom), slack = 2)) ==
      Seq("A", "a", "b", "c"))
    assert(ids(BinaryOps.overlap(gr, gr2, Seq(Chrom), slack = 2, invert = true)) == Seq("d"))
    assert(ids(BinaryOps.overlap(gr, gr2, Seq(Chrom), contained = true)) == Seq("b"))
    assert(ids(BinaryOps.overlap(gr, gr2, Seq(Chrom), contained = true, invert = true)) ==
      Seq("A", "a", "c", "d"))
  }

  // reference core/pyranges_main.py:1350-1380 (join slack doctest):
  // slack joins bookended features; Overlap may be 0 or negative.
  test("join_overlaps slack doctest: bookended joined at slack=1, negative overlaps") {
    import spark.implicits._
    val f1 = Seq(("chr1", 3L, 6L, "interval1"), ("chr1", 8L, 9L, "interval3"),
                 ("chr1", 5L, 7L, "interval2"))
      .toDF(Chrom, Start, End, "Name").withColumn(RowId, monotonically_increasing_id())
    val f2 = Seq(("chr1", 1L, 2L, "a"), ("chr1", 6L, 7L, "b"))
      .toDF(Chrom, Start, End, "Name")
    val s1 = BinaryOps.joinOverlaps(f1, f2, Seq(Chrom), slack = 1)
    assert(s1.select("Name", "Name_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("interval1", "b"), ("interval2", "b")))
    val s2 = BinaryOps.joinOverlaps(f1, f2, Seq(Chrom), slack = 2,
      reportOverlapCol = Some("Overlap"))
    assert(s2.select("Name", "Name_b", "Overlap").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet ==
      Set(("interval1", "a", -1L), ("interval1", "b", 0L),
          ("interval3", "b", -1L), ("interval2", "b", 1L)))
    // match_by restricts to equal metadata and drops the duplicated column
    val gr = Seq(("chr1", 1L, 3L, "a")).toDF(Chrom, Start, End, "ID")
      .withColumn(RowId, monotonically_increasing_id())
    val gr2 = Seq(("chr1", 2L, 3L, "a"), ("chr1", 2L, 9L, "b")).toDF(Chrom, Start, End, "ID")
    val m = BinaryOps.joinOverlaps(gr, gr2, Seq(Chrom, "ID"))
    assert(m.count() == 1 && !m.columns.contains("ID_b"))
  }

  // reference core/pyranges_main.py:562-595 (outer_ranges doctest).
  test("outer_ranges doctest: grouped and whole-chromosome bounds") {
    import spark.implicits._
    val gr = Seq(("1", 1L, 40L, "tr1"), ("1", 60L, 68L, "tr1"), ("1", 110L, 130L, "tr2"))
      .toDF(Chrom, Start, End, "transcript_id")
    val byTx = graft.ops.UnaryOps.boundaries(gr, Seq(Chrom, "transcript_id"))
      .select("transcript_id", Start, End).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(byTx == Set(("tr1", 1L, 68L), ("tr2", 110L, 130L)))
    val whole = graft.ops.UnaryOps.boundaries(gr, Seq(Chrom))
      .select(Start, End).head
    assert((whole.getLong(0), whole.getLong(1)) == ((1L, 130L)))
  }

  // three_end / downstream mirror five_end / upstream (reference
  // core/pyranges_main.py:3848-3929, 4603-4745).
  test("three_end and downstream mirror their 5' counterparts") {
    import spark.implicits._
    val gr = Seq(("chr1", 3L, 9L, "+"), ("chr1", 5L, 7L, "-"))
      .toDF(Chrom, Start, End, Strand)
    def rows(d: DataFrame) = d.select(Start, End).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(Composites.threeEnd(gr)) == Set((8L, 9L), (5L, 6L)))
    assert(rows(Composites.downstream(gr, 4)) == Set((9L, 13L), (1L, 5L)))
    assert(rows(Composites.downstream(gr, 4, gap = 2)) == Set((11L, 15L), (-1L, 3L)))
  }

  // reference core/pyranges_main.py:5606-5700 (combine_interval_columns).
  test("combine_interval_columns doctest: intersect and union presets") {
    import spark.implicits._
    val gr1 = Seq(("chr1", 9916L, 10115L, "-"), ("chr1", 9939L, 10138L, "+"),
                  ("chr1", 9951L, 10150L, "-")).toDF(Chrom, Start, End, Strand)
      .withColumn(RowId, monotonically_increasing_id())
    val gr2 = Seq(("chr1", 9988L, 10187L, "-"), ("chr1", 10073L, 10272L, "+"),
                  ("chr1", 10079L, 10278L, "-")).toDF(Chrom, Start, End, Strand)
    val j = BinaryOps.joinOverlaps(gr1, gr2, Seq(Chrom, Strand))
    assert(j.count() == 5)
    def rows(d: DataFrame) = d.select(Start, End).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(graft.ops.Metrics.combineIntersect(j)) == Set(
      (9988L, 10115L), (10079L, 10115L), (10073L, 10138L),
      (9988L, 10150L), (10079L, 10150L)))
    val j2 = BinaryOps.joinOverlaps(gr1, gr2, Seq(Chrom, Strand))
    assert(rows(graft.ops.Metrics.combineUnion(j2)) == Set(
      (9916L, 10187L), (9916L, 10278L), (9939L, 10272L),
      (9951L, 10187L), (9951L, 10278L)))
  }

  // reference core/pyranges_main.py:5360-5415 (intersect doctest).
  test("intersect_overlaps doctest: all/first/last segment selection") {
    import spark.implicits._
    val r1 = Seq(("chr1", 5L, 10L, "a"), ("chr1", 20L, 30L, "b"), ("chr1", 40L, 50L, "c"))
      .toDF(Chrom, Start, End, "ID").withColumn(RowId, monotonically_increasing_id())
    val r2 = Seq(("chr1", 7L, 9L), ("chr1", 18L, 22L), ("chr1", 25L, 33L),
                 ("chr1", 28L, 32L)).toDF(Chrom, Start, End)
    def rows(d: DataFrame) = d.select("ID", Start, End).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(BinaryOps.intersect(r1, r2, Seq(Chrom))) == Set(
      ("a", 7L, 9L), ("b", 20L, 22L), ("b", 25L, 30L), ("b", 28L, 30L)))
    assert(rows(BinaryOps.intersect(r1, r2, Seq(Chrom), multiple = "first")) ==
      Set(("a", 7L, 9L), ("b", 20L, 22L)))
    assert(rows(BinaryOps.intersect(r1, r2, Seq(Chrom), multiple = "last")) ==
      Set(("a", 7L, 9L), ("b", 28L, 30L)))
  }

  // reference core/pyranges_main.py:2760-2795 (set_union doctest — also
  // confirms strict merge: bookended islands stay separate until slack=1).
  test("set_union doctest: bookended islands separate, then merged with slack=1") {
    import spark.implicits._
    val gr = Seq(("chr1", 1L, 3L), ("chr1", 4L, 9L), ("chr1", 10L, 11L))
      .toDF(Chrom, Start, End)
    val gr2 = Seq(("chr1", 2L, 3L), ("chr1", 2L, 9L), ("chr1", 9L, 10L))
      .toDF(Chrom, Start, End)
    val u = BinaryOps.setUnion(gr, gr2, Seq(Chrom))
    def rows(d: DataFrame) = d.select(Start, End).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(u) == Set((1L, 9L), (9L, 10L), (10L, 11L)))
    assert(rows(graft.ops.UnaryOps.merge(u, Seq(Chrom), slack = 1)) ==
      Set((1L, 11L)))
  }

  // reference core/pyranges_main.py:2663-2709 (set_intersect doctest).
  test("set_intersect_overlaps doctest: all and multiple=first") {
    import spark.implicits._
    val r1 = Seq(("chr1", 5L, 10L), ("chr1", 20L, 30L), ("chr1", 40L, 50L))
      .toDF(Chrom, Start, End)
    val r2 = Seq(("chr1", 7L, 9L), ("chr1", 18L, 22L), ("chr1", 25L, 33L),
                 ("chr1", 28L, 32L)).toDF(Chrom, Start, End)
    def rows(d: DataFrame) = d.select(Start, End).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(BinaryOps.setIntersect(r1, r2, Seq(Chrom))) ==
      Set((7L, 9L), (20L, 22L), (25L, 30L)))
    assert(rows(BinaryOps.setIntersect(r1, r2, Seq(Chrom), multiple = "first")) ==
      Set((7L, 9L), (20L, 22L)))
  }

  // reference core/pyranges_main.py:3805 (tile_ranges overlap fraction).
  test("tile_ranges doctest: TileOverlap fraction 0.32") {
    import spark.implicits._
    val gr = Seq(("1", 11868L, 14409L)).toDF(Chrom, Start, End)
    val first = graft.ops.UnaryOps.tile(gr, 100, Some("TileOverlap"), fraction = true)
      .orderBy(Start).head
    assert(first.getLong(1) == 11800L && math.abs(first.getDouble(3) - 0.32) < 1e-9)
  }

  // reference core/pyranges_main.py:3300-3365 (split_overlaps doctest).
  test("split_overlaps doctest: stranded/unstranded x between") {
    import spark.implicits._
    val gr = Seq(("chr1", 3L, 6L, "+"), ("chr1", 5L, 9L, "+"),
                 ("chr1", 5L, 7L, "-"), ("chr1", 11L, 12L, "-"))
      .toDF(Chrom, Start, End, Strand)
    def rows(keys: Seq[String], between: Boolean) =
      graft.ops.UnaryOps.split(gr, keys, between)
        .select(Start, End).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(Seq(Chrom, Strand), between = false) ==
      Set((3L, 5L), (5L, 6L), (6L, 9L), (5L, 7L), (11L, 12L)))
    assert(rows(Seq(Chrom, Strand), between = true) ==
      Set((3L, 5L), (5L, 6L), (6L, 9L), (5L, 7L), (7L, 11L), (11L, 12L)))
    assert(rows(Seq(Chrom), between = false) ==
      Set((3L, 5L), (5L, 6L), (6L, 7L), (7L, 9L), (11L, 12L)))
    assert(rows(Seq(Chrom), between = true) ==
      Set((3L, 5L), (5L, 6L), (6L, 7L), (7L, 9L), (9L, 11L), (11L, 12L)))
  }

  // reference core/pyranges_main.py:3568-3635 (subtract_overlaps doctest).
  test("subtract_overlaps doctest: plain and match_by") {
    import spark.implicits._
    val gr = Seq(("chr1", 1L, 3L, "a", "x"), ("chr1", 4L, 9L, "b", "y"),
                 ("chr1", 10L, 11L, "c", "z"))
      .toDF(Chrom, Start, End, "ID", "tag").withColumn(RowId, monotonically_increasing_id())
    val gr2 = Seq(("chr1", 2L, 3L, "x"), ("chr1", 2L, 9L, "w"), ("chr1", 9L, 10L, "z"))
      .toDF(Chrom, Start, End, "tag")
    val plain = BinaryOps.subtract(gr, gr2.drop("tag"), Seq(Chrom))
      .select("ID", Start, End).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(plain == Set(("a", 1L, 2L), ("c", 10L, 11L)))
    val byTag = BinaryOps.subtract(gr, gr2, Seq(Chrom, "tag"))
      .select("ID", Start, End).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(byTag == Set(("a", 1L, 2L), ("b", 4L, 9L), ("c", 10L, 11L)))
  }

  // reference core/pyranges_main.py:930-1005 (extend_ranges doctest).
  test("extend_ranges doctest: symmetric, 5'/3', use_strand=False, negative, grouped") {
    import spark.implicits._
    def g = Seq(("chr1", 3L, 6L, "+"), ("chr1", 8L, 9L, "+"), ("chr1", 5L, 7L, "-"))
      .toDF(Chrom, Start, End, Strand)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select(Start, End, Strand).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rows(graft.ops.UnaryOps.extend(g, 3, 3)) ==
      Set((0L, 9L, "+"), (5L, 12L, "+"), (2L, 10L, "-")))
    assert(rows(graft.ops.UnaryOps.extend(g, ext5 = 2, ext3 = 1)) ==
      Set((1L, 7L, "+"), (6L, 10L, "+"), (4L, 9L, "-")))
    assert(rows(graft.ops.UnaryOps.extend(g, ext5 = 2, ext3 = 1, useStrand = false)) ==
      Set((1L, 7L, "+"), (6L, 10L, "+"), (3L, 8L, "-")))
    assert(rows(graft.ops.UnaryOps.extend(g, -1, -1)) ==
      Set((4L, 5L, "+"), (9L, 8L, "+"), (6L, 6L, "-")))  // invalids preserved
    val tx = g.withColumn("transcript_id",
      when(col(Strand) === "+", "a").otherwise("b"))
    assert(rows(graft.ops.UnaryOps.extendGrouped(tx, Seq("transcript_id"), ext3 = 3)) ==
      Set((3L, 6L, "+"), (8L, 12L, "+"), (2L, 7L, "-")))
  }

  // reference core/pyranges_main.py:810-852 (count_overlaps doctest).
  test("count_overlaps doctest: strand auto and slack+ignore") {
    import spark.implicits._
    val f1 = Seq(("chr1", 3L, 6L, "+"), ("chr1", 5L, 7L, "-"), ("chr1", 8L, 9L, "+"))
      .toDF(Chrom, Start, End, Strand).withColumn(RowId, monotonically_increasing_id())
    val f2 = Seq(("chr1", 1L, 2L, "+"), ("chr1", 6L, 7L, "-"))
      .toDF(Chrom, Start, End, Strand)
    def counts(d: org.apache.spark.sql.DataFrame) =
      d.select(Start, "Count").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val same = BinaryOps.countOverlaps(f1, f2, Seq(Chrom, Strand), countCol = "Count")
    assert(counts(same) == Map(3L -> 0L, 5L -> 1L, 8L -> 0L))
    val slack = BinaryOps.countOverlaps(f1, f2, Seq(Chrom), slack = 1, countCol = "Count")
    assert(counts(slack) == Map(3L -> 1L, 5L -> 1L, 8L -> 0L))
  }

  // reference core/pyranges_main.py:5507-5557 (compute_interval_metrics)
  test("compute_interval_metrics doctest values") {
    import spark.implicits._
    val gr = Seq(
      ("chr1", 2L, 8L, "+", 5L, 7L, "+"), ("chr1", 10L, 12L, "-", 9L, 20L, "+"),
      ("chr1", 20L, 25L, "+", 23L, 30L, "-"), ("chr1", 40L, 45L, "+", 60L, 70L, "-"),
      ("chr1", 80L, 85L, "-", 70L, 75L, "+"))
      .toDF(Chrom, Start, End, Strand, "Start_b", "End_b", "Strand_b")
    def longs(c: org.apache.spark.sql.Column) =
      gr.select(c).collect().map(_.getLong(0)).toList
    assert(longs(Metrics.overlapLength()) == List(2L, 2L, 2L, 0L, 0L))
    assert(longs(Metrics.distance()) == List(0L, 0L, 0L, 15L, 5L))
    assert(longs(Metrics.signedDistance()) == List(0L, 0L, 0L, 15L, -5L))
    assert(longs(Metrics.midpointDistance2()) == List(2L, 7L, 8L, 45L, 20L))
    assert(gr.select(Metrics.relativeDirection()).collect().map(_.getString(0)).toList ==
      List("same", "opposite", "opposite", "opposite", "opposite"))
    val jac = gr.select(round(Metrics.jaccard(), 2)).collect().map(_.getDouble(0)).toList
    assert(jac == List(0.33, 0.18, 0.2, 0.0, 0.0))
    val frac = gr.select(round(Metrics.fractionOverlap("first"), 2))
      .collect().map(_.getDouble(0)).toList
    assert(frac == List(0.33, 1.0, 0.4, 0.0, 0.0))
    val sym = gr.select(round(Metrics.symmetricCoverage(), 2))
      .collect().map(_.getDouble(0)).toList
    assert(sym == List(0.5, 0.31, 0.33, 0.0, 0.0))
    assert(gr.select(Metrics.overlapFlag()).collect().map(_.getBoolean(0)).toList ==
      List(true, true, true, false, false))
  }

  // reference tests/unit/mapping/test_map.py (test_map_to_global):
  // map_to_global is invariant to the sort order of both inputs
  test("map_to_global regression: invariant to input sort order") {
    import spark.implicits._
    val exons = Seq(
      ("chr1", 100L, 200L, "+", "tx1"), ("chr1", 300L, 400L, "+", "tx1"),
      ("chr1", 1000L, 1050L, "-", "tx2"), ("chr1", 1100L, 1200L, "-", "tx2"),
      ("chr2", 10L, 60L, "+", "tx3"))
      .toDF(Chrom, Start, End, Strand, "transcript_id")
    val local = Seq(
      ("tx1", 0L, 80L, "-", "a"), ("tx1", 120L, 140L, "-", "b"),
      ("tx2", 0L, 20L, "+", "d"), ("tx2", 100L, 130L, "+", "e"),
      ("tx3", 5L, 45L, "+", "f"))
      .toDF("transcript_id", Start, End, Strand, "label")
    def canon(df: DataFrame) =
      df.select("label", Chrom, Start, End, Strand).collect()
        .map(_.toSeq.toList).toSet
    val base = canon(Composites.mapToGlobal(local, exons, "transcript_id"))
    // shuffle both inputs (deterministic seeds) — results must not move
    assert(canon(Composites.mapToGlobal(
      local.orderBy(rand(7)), exons, "transcript_id")) == base)
    assert(canon(Composites.mapToGlobal(
      local, exons.orderBy(rand(11)), "transcript_id")) == base)
    assert(canon(Composites.mapToGlobal(
      local.orderBy(rand(13)), exons.orderBy(rand(17)), "transcript_id")) == base)
    assert(base.nonEmpty)
  }

  // ------------------------------------------------------------------
  // Tutorial corpus (reference docs/tutorial.rst, doctested by
  // tests/run_doctest_tutorial_howto.py:6-13): the worked example over
  // pyranges1/data/ncbi.gff.gz + ncbi.fasta. Expected values copied
  // verbatim from the rendered doctest output.
  // ------------------------------------------------------------------
  private val ncbiGff = "/root/reference/pyranges1/data/ncbi.gff.gz"
  private val ncbiFa = "/root/reference/pyranges1/data/ncbi.fasta"
  private lazy val tutAnn: DataFrame =
    graft.io.Gtf.readGff3(spark, ncbiGff).cache()
  private lazy val tutCds: DataFrame = tutAnn
    .filter(col("Feature") === "CDS")
    .select(col(Chrom), col(Start), col(End), col(Strand), col("ID"))
    .withColumn(RowId, monotonically_increasing_id()).cache()
  // ncbi.fasta.fai, the chromsizes source the doctest reads via pyfaidx
  private lazy val tutChromSizes: DataFrame = {
    import spark.implicits._
    Seq(("CAJFCJ010000053.1", 109277L), ("CAJFCJ010000097.1", 78757L),
        ("CAJFCJ010000121.1", 38272L), ("CAJFCJ010000155.1", 38181L),
        ("CAJFCJ010000181.1", 112475L), ("CAJFCJ010000025.1", 3418L))
      .toDF(Chrom, "size")
  }

  test("tutorial doctest: CDS first/last codons via slice_ranges + get_sequence") {
    // tutorial.rst:53-67 — 150 rows, 6 chromosomes; :188 — 56 CDS rows
    assert(tutAnn.count() == 150)
    assert(tutAnn.select(Chrom).distinct().count() == 6)
    assert(tutCds.count() == 56)
    assert(tutCds.select(Chrom).distinct().count() == 3)

    // tutorial.rst:258-273: first codon of each CDS group — 18 rows
    // (one start codon split across two exons)
    val first = Composites.sliceRanges(tutCds, Seq("ID"), 0, Some(3))
    val firstSet = first.select(Chrom, Start, End, Strand, "ID").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4))).toSet
    assert(firstSet.size == 18)
    assert(Set(
      ("CAJFCJ010000053.1", 5260L, 5263L, "-", "cds-CAD5126491.1"),
      ("CAJFCJ010000053.1", 10732L, 10735L, "+", "cds-CAD5126492.1"),
      ("CAJFCJ010000053.1", 19649L, 19652L, "+", "cds-CAD5126493.1"),
      ("CAJFCJ010000053.1", 27136L, 27139L, "-", "cds-CAD5126494.1"),
      ("CAJFCJ010000097.1", 51865L, 51868L, "+", "cds-CAD5126877.1"),
      ("CAJFCJ010000025.1", 2753L, 2755L, "-", "cds-CAD5125115.1"),
      ("CAJFCJ010000025.1", 2692L, 2693L, "-", "cds-CAD5125115.1"),
      ("CAJFCJ010000025.1", 3150L, 3153L, "-", "cds-CAD5125114.1"))
      .subsetOf(firstSet))

    // tutorial.rst:279-312: per-interval sequences; the split start
    // codon yields the case-preserved pieces "at" and "g"
    val fa = graft.io.Fasta.read(spark, ncbiFa)
    val firstSeq = graft.ext.Seqs.getSequence(first, fa, "Sequence")
    val short = firstSeq.filter(length(col("Sequence")) =!= 3)
      .select(Start, End, "Sequence").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(short == Set((2753L, 2755L, "at"), (2692L, 2693L, "g")))

    // tutorial.rst:322-342: grouped (spliced) sequence per ID — every
    // start codon reads ATG/atg
    val grouped = graft.ext.Seqs
      .getSplicedSequence(first, fa, "ID", "Sequence")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val expectedFirst = Map(
      "cds-CAD5125114.1" -> "ATG", "cds-CAD5125115.1" -> "atg",
      "cds-CAD5126491.1" -> "ATG", "cds-CAD5126492.1" -> "ATG",
      "cds-CAD5126493.1" -> "ATG", "cds-CAD5126494.1" -> "ATG",
      "cds-CAD5126495.1" -> "ATG", "cds-CAD5126496.1" -> "atg",
      "cds-CAD5126497.1" -> "ATG", "cds-CAD5126498.1" -> "atg",
      "cds-CAD5126499.1" -> "atg", "cds-CAD5126873.1" -> "ATG",
      "cds-CAD5126874.1" -> "ATG", "cds-CAD5126875.1" -> "ATG",
      "cds-CAD5126876.1" -> "ATG", "cds-CAD5126877.1" -> "ATG",
      "cds-CAD5126878.1" -> "ATG")
    assert(grouped == expectedFirst)

    // tutorial.rst:358-393: last codon via negative slice; stop codon
    // table verbatim, usage TAA 8 / TGA 6 / TAG 3
    val last = Composites.sliceRanges(tutCds, Seq("ID"), -3, None)
    val stops = graft.ext.Seqs
      .getSplicedSequence(last, fa, "ID", "Sequence")
      .select(col("ID"), upper(col("Sequence")).as("Sequence"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val expectedStops = Map(
      "cds-CAD5125114.1" -> "TGA", "cds-CAD5125115.1" -> "TGA",
      "cds-CAD5126491.1" -> "TAA", "cds-CAD5126492.1" -> "TGA",
      "cds-CAD5126493.1" -> "TAA", "cds-CAD5126494.1" -> "TAG",
      "cds-CAD5126495.1" -> "TAA", "cds-CAD5126496.1" -> "TGA",
      "cds-CAD5126497.1" -> "TAA", "cds-CAD5126498.1" -> "TAA",
      "cds-CAD5126499.1" -> "TAG", "cds-CAD5126873.1" -> "TGA",
      "cds-CAD5126874.1" -> "TAG", "cds-CAD5126875.1" -> "TAA",
      "cds-CAD5126876.1" -> "TGA", "cds-CAD5126877.1" -> "TAA",
      "cds-CAD5126878.1" -> "TAA")
    assert(stops == expectedStops)
    assert(stops.values.groupBy(identity).map { case (k, v) => k -> v.size } ==
      Map("TAA" -> 8, "TGA" -> 6, "TAG" -> 3))
  }

  test("tutorial doctest: promoters via extend/slice/upstream, clip, overlap family") {
    // tutorial.rst:451-462: grouped 5' extension touches only the
    // outermost 5' interval of each CDS group
    val g = graft.ops.UnaryOps.extendGrouped(tutCds, Seq("ID"), ext5 = 300)
    val gRows = g.select("ID", Start, End).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(gRows.contains(("cds-CAD5126491.1", 4882L, 5563L)))
    assert(gRows.contains(("cds-CAD5126492.1", 10432L, 10958L)))
    assert(gRows.contains(("cds-CAD5126492.1", 11028L, 11169L))) // untouched inner

    // tutorial.rst:467-496: promoter = first 300 bp of the extended
    // group; upstream(length=300, group_by) is the direct equivalent
    val prom = Composites.sliceRanges(g, Seq("ID"), 0, Some(300))
    def coordSet(d: DataFrame) = d.select(Chrom, Start, End, Strand, "ID")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toSet
    val promSet = coordSet(prom)
    assert(Set(
      ("CAJFCJ010000053.1", 5263L, 5563L, "-", "cds-CAD5126491.1"),
      ("CAJFCJ010000053.1", 10432L, 10732L, "+", "cds-CAD5126492.1"),
      ("CAJFCJ010000053.1", 19349L, 19649L, "+", "cds-CAD5126493.1"),
      ("CAJFCJ010000053.1", 27139L, 27439L, "-", "cds-CAD5126494.1"),
      ("CAJFCJ010000053.1", 38860L, 39160L, "+", "cds-CAD5126495.1"))
      .subsetOf(promSet))
    assert(coordSet(Composites.upstream(tutCds, 300,
      groupKeys = Some(Seq("ID")))) == promSet)

    // tutorial.rst:504-541: clip_ranges against pyfaidx chromsizes —
    // exactly one promoter ran off the right end of its contig
    val cor = graft.ops.UnaryOps.clip(prom, tutChromSizes)
    val corSet = coordSet(cor)
    assert(promSet -- corSet ==
      Set(("CAJFCJ010000025.1", 3153L, 3453L, "-", "cds-CAD5125114.1")))
    assert(corSet -- promSet ==
      Set(("CAJFCJ010000025.1", 3153L, 3418L, "-", "cds-CAD5125114.1")))

    // tutorial.rst:553-559: strand-aware overlap — one promoter
    // overlaps another CDS
    val corId = cor.withColumn(RowId, monotonically_increasing_id())
    val ov = BinaryOps.overlap(corId, tutCds, Seq(Chrom, Strand))
    assert(coordSet(ov) ==
      Set(("CAJFCJ010000025.1", 2755L, 3055L, "-", "cds-CAD5125115.1")))

    // tutorial.rst:570-585: join_overlaps carries the other side's
    // columns with the _b suffix
    val j = BinaryOps.joinOverlaps(corId, tutCds.drop(RowId), Seq(Chrom, Strand))
    val jRows = j.select("ID", Start, End, "ID_b", "Start_b", "End_b").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    assert(jRows.toSeq ==
      Seq(("cds-CAD5125115.1", 2755L, 3055L, "cds-CAD5125114.1", 2753L, 2851L)))

    // tutorial.rst:593-600: intersect_overlaps clips to the overlap
    val inter = BinaryOps.intersect(corId, tutCds.drop(RowId), Seq(Chrom, Strand))
    assert(inter.select(Start, End).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2755L, 2851L)))
  }

  test("tutorial doctest: intergenic regions, counting, clusters, 5'->3' sort") {
    // tutorial.rst:738-771: chr97 exons -> per-mRNA boundaries
    val exons = tutAnn.filter(col("Feature") === "exon" &&
        col(Chrom) === "CAJFCJ010000097.1")
      .select(col(Chrom), col(Start), col(End), col(Strand), col("Parent"))
    assert(exons.count() == 15)
    val mRna = graft.ops.UnaryOps.boundaries(exons, Seq(Chrom, Strand, "Parent"))
    val mRnaSet = mRna.select("Parent", Start, End, Strand).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(mRnaSet == Set(
      ("rna-DGYR_LOCUS14091", 2248L, 3308L, "+"),
      ("rna-DGYR_LOCUS14093", 16697L, 17634L, "+"),
      ("rna-DGYR_LOCUS14095", 51864L, 53404L, "+"),
      ("rna-DGYR_LOCUS14095-2", 51864L, 53404L, "+"),
      ("rna-DGYR_LOCUS14092", 5579L, 6600L, "-"),
      ("rna-DGYR_LOCUS14094", 31876L, 32195L, "-")))

    // tutorial.rst:777-784: strand-less outer bounds of all mRNAs
    val allBounds = graft.ops.UnaryOps.boundaries(
        mRna.drop(Strand, "Parent"), Seq(Chrom))
      .withColumn(RowId, monotonically_increasing_id())
    assert(allBounds.select(Start, End).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2248L, 53404L)))

    // tutorial.rst:788-798: intergenic = bounds minus mRNA extents
    val intergenic = BinaryOps.subtract(allBounds,
        mRna.drop(Strand), Seq(Chrom))
      .withColumn(RowId, monotonically_increasing_id())
    val interSet = intergenic.select(Start, End).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(interSet == Set((3308L, 5579L), (6600L, 16697L),
      (17634L, 31876L), (32195L, 51864L)))

    // tutorial.rst:824-841: count_overlaps — no CDS in intergenic
    // regions, 15 CDS intervals in the overall bounds
    val interCounts = BinaryOps.countOverlaps(intergenic, tutCds,
      Seq(Chrom), countCol = "Count")
    assert(interCounts.select("Count").collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 0L, 0L, 0L))
    def boundCount(right: DataFrame): Long =
      BinaryOps.countOverlaps(allBounds, right, Seq(Chrom), countCol = "Count")
        .select("Count").collect().map(_.getLong(0)).head
    assert(boundCount(tutCds) == 15L)

    // tutorial.rst:846-876: the chr97 '+' isoform slice merges into 4
    // non-redundant intervals
    val example = tutCds.filter(col(Chrom) === "CAJFCJ010000097.1" &&
      col(Strand) === "+" && col(Start) < 54000L && col(End) > 51000L)
    assert(example.count() == 9)
    val merged = graft.ops.UnaryOps.merge(example, Seq(Chrom, Strand))
    assert(merged.select(Start, End).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((51865L, 52382L), (52446L, 52826L), (52903L, 53027L),
          (53339L, 53404L)))

    // tutorial.rst:883-888: counting against merged CDS gives 10
    assert(boundCount(graft.ops.UnaryOps.merge(tutCds, Seq(Chrom, Strand))
      .withColumn(RowId, monotonically_increasing_id())) == 10L)

    // tutorial.rst:607-683: cluster_overlaps — 17 CDS rows sit in
    // multi-interval clusters
    val clu = graft.ops.UnaryOps.cluster(tutCds, Seq(Chrom, Strand),
      clusterCol = "Cluster")
    val w = Window.partitionBy(col(Chrom), col(Strand), col("Cluster"))
    val multiClu = clu.withColumn("_n", count(lit(1)).over(w))
      .filter(col("_n") > 1).drop("_n")
    assert(multiClu.count() == 17)

    // tutorial.rst:693-707: sort_ranges is 5'->3' — the minus-strand
    // chr25 block runs right-to-left, the plus chr97 block left-to-right
    val sorted = graft.ops.UnaryOps.sortRanges(multiClu)
      .select(Chrom, Start, End).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(sorted == Seq(
      ("CAJFCJ010000025.1", 2753L, 2851L), ("CAJFCJ010000025.1", 2753L, 2755L),
      ("CAJFCJ010000025.1", 2593L, 2693L), ("CAJFCJ010000025.1", 2593L, 2693L),
      ("CAJFCJ010000025.1", 2354L, 2537L), ("CAJFCJ010000025.1", 2354L, 2537L),
      ("CAJFCJ010000025.1", 2174L, 2294L), ("CAJFCJ010000025.1", 2174L, 2294L),
      ("CAJFCJ010000097.1", 51865L, 52201L), ("CAJFCJ010000097.1", 51865L, 52382L),
      ("CAJFCJ010000097.1", 52261L, 52382L), ("CAJFCJ010000097.1", 52446L, 52826L),
      ("CAJFCJ010000097.1", 52446L, 52826L), ("CAJFCJ010000097.1", 52903L, 53027L),
      ("CAJFCJ010000097.1", 52903L, 53027L), ("CAJFCJ010000097.1", 53339L, 53404L),
      ("CAJFCJ010000097.1", 53339L, 53404L)))
  }

  // reference docs/how_to_overlap.rst:294-425: match_by restricts
  // overlaps to rows agreeing on an extra column; slack widens the
  // overlap test but reports original coordinates; combine 'union'
  // aggregates the matched pair into one interval.
  test("how_to_overlap doctest: match_by column, slack, combine union chain") {
    import spark.implicits._
    val a2 = Seq((3L, 6L, "+"), (13L, 15L, "+"), (18L, 21L, "-"),
        (23L, 27L, "-"), (28L, 29L, "-"), (32L, 37L, "+"), (33L, 36L, "+"))
      .map { case (s, e, st) => ("chr1", s, e, st, s % 2) }
      .toDF(Chrom, Start, End, Strand, "odd")
      .withColumn(RowId, monotonically_increasing_id())
    val b2 = Seq((6L, 8L, "+"), (12L, 14L, "+"), (19L, 20L, "+"),
        (25L, 29L, "-"), (34L, 36L, "+"))
      .map { case (s, e, st) => ("chr1", s, e, st, s % 2) }
      .toDF(Chrom, Start, End, Strand, "odd")
    val keys = Seq(Chrom, Strand, "odd")

    // :323-331 overlap(match_by='odd') — only two rows survive
    assert(BinaryOps.overlap(a2, b2, keys).select(Start, End).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((23L, 27L), (32L, 37L)))

    // :393-400 join(match_by) and :402-410 join(match_by, slack=5)
    def jrows(slack: Long) =
      BinaryOps.joinOverlaps(a2, b2, keys, slack = slack)
        .select(Start, End, "odd", "Start_b", "End_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
    assert(jrows(0) == Set((23L, 27L, 1L, 25L, 29L), (32L, 37L, 0L, 34L, 36L)))
    val slacked = jrows(5)
    assert(slacked == Set((13L, 15L, 1L, 19L, 20L),
      (23L, 27L, 1L, 25L, 29L), (32L, 37L, 0L, 34L, 36L)))

    // :417-425 combine_interval_columns('union')
    val u = Metrics.combineUnion(
        BinaryOps.joinOverlaps(a2, b2, keys, slack = 5))
      .select(Start, End, "odd").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(u == Set((13L, 20L, 1L), (23L, 29L, 1L), (32L, 37L, 0L)))
  }

  // reference docs/how_to_create.rst (constructor validation, concat
  // stacking :195-227) and docs/how_to_columns.rst (get_with_loc_columns
  // single/list :114-140, drop demotes when loc columns go :145-168,
  // remove_strand :171-180).
  test("how_to_create/columns doctest: constructor, concat stacking, loc-column sugar") {
    import spark.implicits._
    import graft.core.GenomicFrame
    val df = Seq(("chr1", 5L, 10L, "+", "a"), ("chr1", 20L, 28L, "+", "b"),
        ("chr1", 80L, 95L, "-", "c"), ("chr3", 10L, 38L, "+", "d"))
      .toDF(Chrom, Start, End, Strand, "title")
    // :45-57 the constructor accepts a conforming frame…
    val p = GenomicFrame.of(df)
    assert(p.isRight)
    val g = p.toOption.get
    assert(g.chromosomes.sorted == Seq("chr1", "chr3") && g.strandValid)
    // …and DEMOTES to a plain frame when loc columns are missing
    // (how_to_columns :161-168: drop(Chromosome) returns a DataFrame)
    assert(GenomicFrame.of(df.drop(Chrom)).isLeft)
    // how_to_create :195-227 concat stacks rows (8 = 4 + 4)
    val stacked = GenomicFrame.concat(Seq(g, g))
    assert(stacked.df.count() == 8L)
    assert(stacked.df.select("title").distinct().count() == 4L)
    // how_to_columns :114-140 get_with_loc_columns: loc + named columns,
    // single or list, Strand retained
    assert(g.getWithLocColumns(Seq("title")).df.columns.toSeq ==
      Seq(Chrom, Start, End, Strand, "title"))
    val two = g.df.withColumn("Score", lit(0L))
    assert(GenomicFrame(two).getWithLocColumns(Seq("title", "Score")).df.columns.toSeq ==
      Seq(Chrom, Start, End, Strand, "title", "Score"))
    // :171-180 remove_strand drops exactly the Strand column
    assert(g.removeStrand.df.columns.toSeq == Seq(Chrom, Start, End, "title"))
  }

  // reference docs/how_to_rows.rst:160-241 (loci accessor + setter on
  // the aorta2 example data, overlap semantics) and
  // docs/how_to_inspect.rst:135-188 (invalid strands demote use_strand,
  // strand_valid, make_strand_valid turns non-genomic strands to '+').
  test("how_to_rows/inspect doctest: loci overlap slicing, loci setter, strand validity") {
    import spark.implicits._
    import graft.core.GenomicFrame
    val aorta2 = GenomicFrame(Seq(
        (1L, "chr1", 10073L, 10272L, "Input", 1L, "+"),
        (5L, "chr1", 10280L, 10479L, "Input", 1L, "+"),
        (6L, "chr1", 16056L, 16255L, "Input", 1L, "+"),
        (7L, "chr1", 16064L, 16263L, "Input", 1L, "+"),
        (8L, "chr1", 16109L, 16308L, "Input", 1L, "+"),
        (9L, "chr1", 19958L, 20157L, "Input", 1L, "-"),
        (4L, "chr1", 10149L, 10348L, "Input", 1L, "-"),
        (3L, "chr1", 10082L, 10281L, "Input", 1L, "-"),
        (2L, "chr1", 10079L, 10278L, "Input", 1L, "-"),
        (0L, "chr1", 9988L, 10187L, "Input", 1L, "-"))
      .toDF(RowId, Chrom, Start, End, "Name", "Score", Strand))
    def ids(g: GenomicFrame) =
      g.df.select(RowId).collect().map(_.getLong(0)).toSet
    // :179-189 loci['chr1','-'] and :191-201 loci['chr1','+']
    assert(ids(aorta2.loci("chr1", Some("-"))) == Set(9L, 4L, 3L, 2L, 0L))
    assert(ids(aorta2.loci("chr1", Some("+"))) == Set(1L, 5L, 6L, 7L, 8L))
    // :203-214 range slicing is OVERLAP, not containment: row 0 (ends
    // 10187 > 10000) and row 5 (starts 10280 < 11000) both qualify
    assert(ids(aorta2.loci("chr1", None, Some(10000L), Some(11000L))) ==
      Set(1L, 5L, 4L, 3L, 2L, 0L))
    // :216-226 chrom + strand + range
    assert(ids(aorta2.loci("chr1", Some("+"), Some(10000L), Some(11000L))) ==
      Set(1L, 5L))
    // :227-238 loci setter analog: Score=100 on exactly that selection
    val updated = aorta2.updateWhere(
      col(Chrom) === "chr1" && col(Strand) === "+" &&
        col(End) > 10000L && col(Start) < 11000L,
      "Score" -> lit(100L))
    assert(updated.df.filter(col("Score") === 100L).select(RowId).collect()
      .map(_.getLong(0)).toSet == Set(1L, 5L))
    assert(updated.df.filter(col("Score") === 1L).count() == 8L)
    // how_to_inspect :135-188 — '#' strand invalidates strand_valid;
    // make_strand_valid rewrites non-genomic strands to '+'
    val g = GenomicFrame(Seq(("chr1", 1L, 11L, "-"), ("chr1", 1L, 20L, "#"))
      .toDF(Chrom, Start, End, Strand))
    assert(!g.strandValid)
    val g2 = g.makeStrandValid
    assert(g2.strandValid)
    assert(g2.df.select(Strand).collect().map(_.getString(0)).sorted.toSeq ==
      Seq("+", "-"))
    // :151-163 with invalid strands, auto use_strand demotes to false:
    // the '-' row also slices from the genomic LEFT
    val sliced = Composites.sliceRanges(g.df, Nil, 0, Some(3),
      useStrand = g.strandValid)
    assert(sliced.select(Start, End).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 4L)))
  }

  // reference docs/how_to_write.rst:33-39: to_gtf's default mapping —
  // '.' for absent Source/Feature/Frame, 1-based inclusive coordinates,
  // Score and Strand from their columns, every metadata column as a
  // `key "value";` attribute — emitted as RAW text (no csv quoting).
  test("how_to_write doctest: to_gtf default field mapping, byte-exact line") {
    import spark.implicits._
    val gr = Seq(("chr8", 28510032L, 28510057L, "U0", 0L, "-"))
      .toDF(Chrom, Start, End, "Name", "Score", Strand)
      .withColumn("Source", lit(null).cast("string"))
      .withColumn("Feature", lit(null).cast("string"))
      .withColumn("Frame", lit(null).cast("string"))
      .withColumn("Label", lit("something"))
    val dir = s"/tmp/graft_howto_gtf_${java.util.UUID.randomUUID}"
    graft.io.Gtf.writeGtf(gr, dir, Seq("Name", "Label"))
    val line = spark.read.text(dir).as[String].collect().head
    assert(line ==
      "chr8\t.\t.\t28510033\t28510057\t0\t-\t.\tName \"U0\"; Label \"something\";")
    // :85-90 to_csv keeps pythonic (0-based) coordinates untouched
    val csvDir = s"/tmp/graft_howto_csv_${java.util.UUID.randomUUID}"
    gr.select(Chrom, Start, End, "Name", "Score", Strand)
      .write.option("delimiter", "\t").mode("overwrite").csv(csvDir)
    assert(spark.read.text(csvDir).as[String].collect().head ==
      "chr8\t28510032\t28510057\tU0\t0\t-")
  }

  // reference docs/how_to_sequences.rst: get_sequence preserves the
  // soft-mask case (':60-75' shows 'at' / 'ggGCTA…' outputs), reverse
  // complements '-' rows case-preservingly, group_by concatenates exon
  // sequences 5'->3', and seqs.translate/reverse_complement chain on
  // the resulting column.
  test("how_to_sequences doctest: case-preserving fetch, spliced concat, translate chain") {
    import spark.implicits._
    import graft.ext.Seqs
    val fa = Seq(("c1", "aaCCgTATGAAATAGggg")).toDF(Chrom, "seq")
    val iv = Seq((0L, "c1", 0L, 6L, "+", "x"), (1L, "c1", 0L, 6L, "-", "y"),
        (2L, "c1", 6L, 15L, "+", "z"))
      .toDF(RowId, Chrom, Start, End, Strand, "ID")
    val seqs = Seqs.getSequence(iv, fa, "Sequence")
      .select("ID", "Sequence").collect().map(r => (r.getString(0), r.getString(1))).toMap
    // '+' keeps the slice verbatim (case preserved); '-' is the
    // case-preserving reverse complement of the same slice
    assert(seqs("x") == "aaCCgT")
    assert(seqs("y") == "AcGGtt")
    assert(seqs("z") == "ATGAAATAG")
    // :86-99 group_by concatenation in 5'->3' order: a two-exon '-'
    // transcript concatenates its 5'-most (highest-coordinate) exon first
    val tx = Seq((0L, "c1", 0L, 3L, "-", "t"), (1L, "c1", 6L, 9L, "-", "t"))
      .toDF(RowId, Chrom, Start, End, Strand, "tx")
    val spliced = Seqs.getSplicedSequence(tx, fa, "tx", "Sequence")
      .select("Sequence").head.getString(0)
    // exon [6,9)="ATG" revcomp "CAT" comes first, then [0,3)="aaC"->"Gtt"
    assert(spliced == "CATGtt")
    // :155-165 translate + reverse_complement over the fetched column
    val chained = Seqs.getSequence(iv.filter(col("ID") === "z"), fa, "Sequence")
      .select(Seqs.translate(upper(col("Sequence"))).as("p"),
        Seqs.reverseComplement(col("Sequence")).as("rc")).head
    assert(chained.getString(0) == "MK*")
    assert(chained.getString(1) == "CTATTTCAT")
  }

  // reference docs/how_to_map.rst:214-283 (pep_to_cds protein->genome
  // mapping, split codons) and :420-460 (map_to_local with match_by)
  test("how_to_map doctest: pep_to_cds x3 shortcut, split codons, match_by local mapping") {
    import spark.implicits._
    // a '-' transcript with two exons; spliced cds space is 20 nt
    val exons = Seq(("g", 100L, 110L, "-", "t"), ("g", 120L, 130L, "-", "t"))
      .toDF(Chrom, Start, End, Strand, "ID")
    // amino acids at pep positions 2 (inside exon) and 3 (split codon)
    val aa = Seq(("t", 2L, 3L, "K"), ("t", 3L, 4L, "K"))
      .toDF("ID", Start, End, "AminoAcid")
    // :242-258 the pep_to_cds shortcut "is equivalent to" multiplying
    // the local coordinates by 3 first
    val viaShortcut = Composites.mapToGlobal(aa, exons, "ID", pepToCds = true)
    val manual = Composites.mapToGlobal(
      aa.withColumn(Start, col(Start) * 3).withColumn(End, col(End) * 3),
      exons, "ID")
    def rows(d: DataFrame) = d.select(Chrom, Start, End, Strand).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(rows(viaShortcut) == rows(manual))
    // :262-283 split codons: an amino acid whose codon crosses the exon
    // junction maps to TWO genomic rows with lengths summing to 3
    // (pep 3 -> cds [9,12) spans the '-' transcript's exon boundary)
    assert(rows(viaShortcut) == Set(
      ("g", 121L, 124L, "-"),            // pep 2 = cds [6,9), inside exon1
      ("g", 120L, 121L, "-"), ("g", 108L, 110L, "-"))) // pep 3 split 1+2
    // :438-460 map_to_local(match_by): CDS pieces pair only with exons
    // of the SAME transcript, and land contiguous in local space
    val cds = Seq(("g", 105L, 110L, "-", "t"), ("g", 120L, 125L, "-", "t"))
      .toDF(Chrom, Start, End, Strand, "Parent")
    val exons2 = exons.withColumnRenamed("ID", "Parent")
    val local = Composites.mapToLocal(cds, exons2, "Parent",
        keys = Seq(Chrom, "Parent"))
      .select(Chrom, Start, End, Strand).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(local == Set(("t", 5L, 10L, "+"), ("t", 10L, 15L, "+")))
  }

  // reference docs/how_to_genomic_ops.rst (doctested by
  // tests/run_doctest_tutorial_howto.py): the coordinate-modification
  // corpus over the 8-exon / 3-transcript `e` object (:22-100). Expected
  // values copied verbatim from the rst.
  test("how_to_genomic_ops doctest: extend family (ext, ext5/ext3, unstranded, grouped)") {
    import graft.ops.UnaryOps
    val e = howToE
    // :108-119 extend_ranges(ext=5)
    assert(se2(UnaryOps.extend(e, 5, 5)) == Set(
      (11873L, 12232L), (12617L, 12726L), (13220L, 14414L), (110947L, 111362L),
      (112694L, 112809L), (120868L, 120937L), (129054L, 129228L), (133373L, 133728L)))
    // :128-141 ext_5=10: "+" Start-10, "-" End+10
    assert(se2(UnaryOps.extend(e, ext5 = 10)) == Set(
      (11868L, 12227L), (12612L, 12721L), (13215L, 14409L), (110952L, 111367L),
      (112699L, 112814L), (120873L, 120942L), (129059L, 129233L), (133378L, 133733L)))
    // :145-158 ext_5=12, ext_3=6
    assert(se2(UnaryOps.extend(e, ext5 = 12, ext3 = 6)) == Set(
      (11866L, 12233L), (12610L, 12727L), (13213L, 14415L), (110946L, 111369L),
      (112693L, 112816L), (120867L, 120944L), (129053L, 129235L), (133372L, 133735L)))
    // :162-175 use_strand=False: every row Start-12, End+6
    assert(se2(UnaryOps.extend(e, ext5 = 12, ext3 = 6, useStrand = false)) == Set(
      (11866L, 12233L), (12610L, 12727L), (13213L, 14415L), (110940L, 111363L),
      (112687L, 112810L), (120861L, 120938L), (129047L, 129229L), (133366L, 133729L)))
    // :182-198 group_by: only each transcript's outermost 5' edge moves
    assert(se2(UnaryOps.extendGrouped(e, Seq("transcript_id"), ext5 = 10)) == Set(
      (11868L, 12227L), (12622L, 12721L), (13225L, 14409L), (110952L, 111357L),
      (112699L, 112814L), (120873L, 120932L), (129059L, 129223L), (133378L, 133733L)))
  }

  test("how_to_genomic_ops doctest: slice_ranges (per-row, grouped spliced, count_introns)") {
    val e = howToE
    // :207-220 slice_ranges(0, 10): first 10 bases from each 5' end
    assert(se2(Composites.sliceRanges(e, Nil, 0, Some(10))) == Set(
      (11878L, 11888L), (12622L, 12632L), (13225L, 13235L), (111347L, 111357L),
      (112794L, 112804L), (120922L, 120932L), (129213L, 129223L), (133713L, 133723L)))
    // :226-239 use_strand=False: always from the genomic left
    assert(se2(Composites.sliceRanges(e, Nil, 0, Some(10), useStrand = false)) == Set(
      (11878L, 11888L), (12622L, 12632L), (13225L, 13235L), (110952L, 110962L),
      (112699L, 112709L), (120873L, 120883L), (129059L, 129069L), (133378L, 133388L)))
    // :247-257 slice_ranges(200): rows shorter than 200 vanish
    assert(se2(Composites.sliceRanges(e, Nil, 200, None)) == Set(
      (12078L, 12227L), (13425L, 14409L), (110952L, 111157L), (133378L, 133523L)))
    // :262-275 slice_ranges(-10): last 10 bases
    assert(se2(Composites.sliceRanges(e, Nil, -10, None)) == Set(
      (12217L, 12227L), (12711L, 12721L), (14399L, 14409L), (110952L, 110962L),
      (112699L, 112709L), (120873L, 120883L), (129059L, 129069L), (133378L, 133388L)))
    // :279-292 slice_ranges(3, -3): trim both ends
    assert(se2(Composites.sliceRanges(e, Nil, 3, Some(-3))) == Set(
      (11881L, 12224L), (12625L, 12718L), (13228L, 14406L), (110955L, 111354L),
      (112702L, 112801L), (120876L, 120929L), (129062L, 129220L), (133381L, 133720L)))
    // :305-318 grouped spliced: only the 1500+ bp transcript's last exon shrinks
    assert(se2(Composites.sliceRanges(e, Seq("transcript_id"), 0, Some(1500))) == Set(
      (11878L, 12227L), (12622L, 12721L), (13225L, 14277L), (110952L, 111357L),
      (112699L, 112804L), (120873L, 120932L), (129059L, 129223L), (133378L, 133723L)))
    // :340-356 first/last 10 spliced bases per transcript, concatenated
    val first10 = Composites.sliceRanges(e, Seq("transcript_id"), 0, Some(10))
    val last10 = Composites.sliceRanges(e, Seq("transcript_id"), -10, None)
    assert(se2(first10.unionByName(last10)) == Set(
      (11878L, 11888L), (112794L, 112804L), (133713L, 133723L),
      (14399L, 14409L), (110952L, 110962L), (120873L, 120883L)))
    // :414-425 count_introns=True: slice in unspliced transcript space
    assert(se2(Composites.sliceRangesUnspliced(e, Seq("transcript_id"), 0, Some(1500))) == Set(
      (11878L, 12227L), (12622L, 12721L), (13225L, 13378L),
      (111304L, 111357L), (112699L, 112804L), (133378L, 133723L)))
  }

  test("how_to_genomic_ops doctest: transcript flanks via extend+slice, downstream gap") {
    import graft.ops.UnaryOps
    val e = howToE
    // :360-370 the 100 bases upstream of each transcript
    assert(se2(Composites.sliceRanges(
        UnaryOps.extendGrouped(e, Seq("transcript_id"), ext5 = 100),
        Seq("transcript_id"), 0, Some(100))) ==
      Set((11778L, 11878L), (112804L, 112904L), (133723L, 133823L)))
    // :374-383 the 100 bases downstream of each transcript
    assert(se2(Composites.sliceRanges(
        UnaryOps.extendGrouped(e, Seq("transcript_id"), ext3 = 100),
        Seq("transcript_id"), -100, None)) ==
      Set((14409L, 14509L), (110852L, 110952L), (120773L, 120873L)))
    // :391-407 downstream(100[, gap=10], group_by)
    assert(se2(Composites.downstream(e, 100,
        groupKeys = Some(Seq("transcript_id")))) ==
      Set((14409L, 14509L), (110852L, 110952L), (120773L, 120873L)))
    assert(se2(Composites.downstream(e, 100, gap = 10,
        groupKeys = Some(Seq("transcript_id")))) ==
      Set((14419L, 14519L), (110842L, 110942L), (120763L, 120863L)))
  }

  test("how_to_genomic_ops doctest: complement_ranges (stranded, unstranded, chromsizes, per-transcript)") {
    import spark.implicits._
    import graft.ops.UnaryOps
    val e = howToE
    // :478-489 default: gaps between merged intervals, split by strand
    assert(se2(UnaryOps.complement(e, Seq(Chrom, Strand))) == Set(
      (12227L, 12622L), (12721L, 13225L), (111357L, 112699L),
      (112804L, 120873L), (120932L, 129059L), (129223L, 133378L)))
    // :493-506 use_strand=False
    assert(se2(UnaryOps.complement(e, Seq(Chrom))) == Set(
      (12227L, 12622L), (12721L, 13225L), (14409L, 110952L), (111357L, 112699L),
      (112804L, 120873L), (120932L, 129059L), (129223L, 133378L)))
    // :430-439 b = outer_ranges('transcript_id')
    val b = UnaryOps.boundaries(e, Seq(Chrom, Strand, "transcript_id"))
    assert(se2(b) == Set((11878L, 14409L), (110952L, 112804L), (120873L, 133723L)))
    // :511-518 intergenic = complement of the boundaries, unstranded
    assert(se2(UnaryOps.complement(b, Seq(Chrom))) ==
      Set((14409L, 110952L), (112804L, 120873L)))
    // :523-532 chromsizes + include_first_interval: flanks appear
    val cs = Seq(("1", 249250621L)).toDF(Chrom, "size")
    assert(se2(UnaryOps.complement(b, Seq(Chrom), Some(cs))) == Set(
      (0L, 11878L), (14409L, 110952L), (112804L, 120873L), (133723L, 249250621L)))
    // :540-552 group_by='transcript_id': introns per transcript
    assert(se2(UnaryOps.complement(e, Seq(Chrom, Strand, "transcript_id"))) == Set(
      (12227L, 12622L), (12721L, 13225L), (111357L, 112699L),
      (120932L, 129059L), (129223L, 133378L)))
  }

  test("how_to_genomic_ops doctest: window_ranges, tile_genome, tile_ranges fraction") {
    import spark.implicits._
    import graft.ops.UnaryOps
    // :566-575 the 3-interval g object
    val g = Seq(("1", 4L, 11L, "+", "a"), ("1", 60L, 66L, "+", "a"),
        ("1", 100L, 107L, "-", "b"))
      .toDF(Chrom, Start, End, Strand, "Name")
    // :579-592 window_ranges(3): 5'->3' per strand
    assert(se2(UnaryOps.windowRanges(g, 3)) == Set(
      (4L, 7L), (7L, 10L), (10L, 11L), (60L, 63L), (63L, 66L),
      (104L, 107L), (101L, 104L), (100L, 101L)))
    // :597-610 use_strand=False: always left->right
    assert(se2(UnaryOps.windowRanges(g, 3, useStrand = false)) == Set(
      (4L, 7L), (7L, 10L), (10L, 11L), (60L, 63L), (63L, 66L),
      (100L, 103L), (103L, 106L), (106L, 107L)))
    // :651-663 tile_genome + :668-680 full_last_tile
    val cs = Seq(("chr1", 323L), ("chr2", 125L)).toDF(Chrom, "size")
    def cse2(d: DataFrame) = d.select(Chrom, Start, End).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(cse2(UnaryOps.tileGenome(cs, 100)) == Set(
      ("chr1", 0L, 100L), ("chr1", 100L, 200L), ("chr1", 200L, 300L),
      ("chr1", 300L, 323L), ("chr2", 0L, 100L), ("chr2", 100L, 125L)))
    assert(cse2(UnaryOps.tileGenome(cs, 100, fullLastTile = true)) == Set(
      ("chr1", 0L, 100L), ("chr1", 100L, 200L), ("chr1", 200L, 300L),
      ("chr1", 300L, 400L), ("chr2", 0L, 100L), ("chr2", 100L, 200L)))
    // :687-719 tile_ranges(200) + overlap_column fraction on rows 0 and 7
    val eTile = howToE.filter(col(RowId).isin(0L, 7L))
    assert(se2(UnaryOps.tile(eTile, 200)) == Set(
      (11800L, 12000L), (12000L, 12200L), (12200L, 12400L),
      (133200L, 133400L), (133400L, 133600L), (133600L, 133800L)))
    val nts = UnaryOps.tile(eTile, 200, Some("nts"), fraction = true)
      .select(Start, "nts").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(nts == Map(11800L -> 0.61, 12000L -> 1.0, 12200L -> 0.135,
      133200L -> 0.11, 133400L -> 1.0, 133600L -> 0.615))
  }

  /** The `e` object how_to_genomic_ops.rst builds at :22-100 (ensembl
    * exon subset after its .loc mutations — final state shown at :455). */
  private def howToE: DataFrame = {
    import spark.implicits._
    Seq((0L, "1", 11878L, 12227L, "+", "ENST00000456328"),
        (1L, "1", 12622L, 12721L, "+", "ENST00000456328"),
        (2L, "1", 13225L, 14409L, "+", "ENST00000456328"),
        (3L, "1", 110952L, 111357L, "-", "ENST00000471248"),
        (4L, "1", 112699L, 112804L, "-", "ENST00000471248"),
        (5L, "1", 120873L, 120932L, "-", "ENST00000610542"),
        (6L, "1", 129059L, 129223L, "-", "ENST00000610542"),
        (7L, "1", 133378L, 133723L, "-", "ENST00000610542"))
      .toDF(RowId, Chrom, Start, End, Strand, "transcript_id")
  }

  private def se2(d: DataFrame): Set[(Long, Long)] =
    d.select(Start, End).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  // reference tests/unit/test_join.py:6-14 (test_join_issue_4_right):
  // tile_genome output joins against a scored signal table without error
  test("join issue-4 regression: tile_genome x scored signal join runs") {
    import spark.implicits._
    val chromSizes = Seq(("chr1", 5000L), ("chr2", 3000L)).toDF(Chrom, "size")
    val tiles = graft.ops.UnaryOps.tileGenome(chromSizes, 1000L)
    val signal = Seq(("chr1", 120L, 400L, 17L), ("chr1", 4200L, 4300L, 3L),
      ("chr2", 0L, 2999L, 99L), ("chr3", 5L, 6L, 1L))
      .toDF(Chrom, Start, End, "Score")
    val j = BinaryOps.joinOverlaps(tiles, signal, Seq(Chrom))
    val n = j.count()
    // chr1: one signal in tile 0, one in tile 4; chr2: one signal
    // covering all 3 tiles; chr3 signal matches nothing -> 5 pairs
    assert(n == 5, s"expected 5 joined rows, got $n")
    assert(j.columns.contains("Score"))
  }
}
