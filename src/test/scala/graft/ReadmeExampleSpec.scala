package graft

import graft.core.{Cols, GenomicFrame, StrandBehavior}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executes the README usage example end-to-end against the reference's
  * real data file, so the documented entry path is guaranteed to work. */
class ReadmeExampleSpec extends AnyFunSuite {
  import Cols._

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("README example: GTF genes x synthetic reads pipeline") {
    import spark.implicits._
    val genes = GenomicFrame(graft.io.Gtf.readGtf(spark,
      "/root/reference/pyranges1/data/ensembl.gtf", Seq("gene_name"))).withRowId
    // synthetic "reads" around the annotated loci
    val reads = GenomicFrame((0 until 200).map { i =>
      val base = if (i % 2 == 0) 11900L else 120800L
      ("1", base + i * 37 % 2000, base + i * 37 % 2000 + 80,
        if (i % 3 == 0) "-" else "+")
    }.toDF(Chrom, Start, End, Strand)).withRowId

    val joined = reads.joinOverlaps(genes, StrandBehavior.Ignore,
      reportOverlapCol = Some("bp"))
    assert(joined.df.count() > 0)
    assert(joined.df.columns.contains("gene_name_b") ||
      joined.df.columns.contains("gene_name"))

    val counted = reads.countOverlaps(genes, StrandBehavior.Ignore, countCol = "n")
    assert(counted.df.count() == 200)
    assert(counted.df.agg(max("n")).head.getLong(0) > 0)

    val gaps = reads.mergeOverlaps(slack = 10).complementRanges()
    assert(gaps.df.count() >= 1)

    val near = reads.nearestRanges(genes, StrandBehavior.Ignore)
    assert(near.df.filter(col("Distance") >= 0).count() == near.df.count())
  }
}
