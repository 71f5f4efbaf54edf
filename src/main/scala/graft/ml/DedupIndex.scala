package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A PERSISTED near-duplicate (MinHash/LSH) index — the dedup analog of
  * [[AnnIndex]]: the banded signature rows behind
  * [[Dedup.lshCandidatePairs]], written into the catalog bucketed by the
  * band bucket key. The steady-state curation workflow — every incoming
  * batch asks "which of my docs near-duplicate the corpus I already
  * kept?" — then skips both the corpus-side signature recompute (the
  * dominant minhash cost) and the corpus-side shuffle on every probe.
  *
  * Scale design: the index table is bucketed on (band, bh); the probe
  * equi-join on those keys consumes the bucketed scan's partitioning in
  * place, so only the (much smaller) incoming batch exchanges, and
  * band-bucket skew stays bounded because `bh` is a min-md5 hash.
  * Appends route through the table's OWN bucket spec (`insertInto`), so
  * the bucketing invariant survives arbitrarily many batches — same
  * contract as [[AnnIndex.appendIvf]].
  */
object DedupIndex {

  /** Banded signature rows for `docs`: one row per (doc, band) with the
    * band hash `bh` and the doc's DISTINCT-shingle count `ns`, carried
    * so exact-Jaccard verification can size unions without touching the
    * corpus text again. One groupBy over the distinct shingle table
    * yields signature AND set size (the nearDuplicatePairs shape); docs
    * with fewer than `shingleK` words have no shingles and are
    * excluded, matching [[Dedup.minhashSignature]]. */
  def bandRows(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id", numHashes: Int = 4,
               bandSize: Int = 1, shingleK: Int = 3): DataFrame = {
    val dsh = graft.core.Sizing.fanOutSmallScan(docs)
      .select(col(idCol),
        explode(TextOps.wordShingles(col(textCol), shingleK)).as("sh"))
      .distinct()
    val sigAggs = Dedup.signatureAggs(numHashes)
    val sig = dsh.groupBy(col(idCol)).agg(sigAggs.head, sigAggs.tail: _*)
    val bands = Dedup.bandStructs(numHashes, bandSize)
    sig.select(col(idCol), col("ns"), explode(array(bands: _*)).as("_b"))
      .select(col(idCol), col("_b.band").as("band"), col("_b.bh").as("bh"),
        col("ns"))
  }

  /** Build the index: banded signature rows saved as a parquet table
    * bucketed + sorted by (band, bh). `buckets` should scale with the
    * corpus (a bucket per few hundred MB of signature rows). */
  def writeLsh(docs: DataFrame, table: String, textCol: String = "text",
               idCol: String = "doc_id", numHashes: Int = 4,
               bandSize: Int = 1, shingleK: Int = 3,
               buckets: Int = 8): Unit = {
    bandRows(docs, textCol, idCol, numHashes, bandSize, shingleK)
      .repartition(buckets, col("band"), col("bh"))
      .write.format("parquet")
      .bucketBy(buckets, "band", "bh")
      .sortBy("band", "bh", idCol)
      .mode("overwrite")
      .saveAsTable(table)
    // Record the band spec on the table itself: a probe or append under
    // a DIFFERENT spec joins disjoint (band, bh) universes and silently
    // returns an empty/partial candidate set — persisting the params
    // turns that into an impossible state (validated below).
    docs.sparkSession.sql(
      s"ALTER TABLE $table SET TBLPROPERTIES(" +
        s"'graft.lsh.numHashes'='$numHashes'," +
        s"'graft.lsh.bandSize'='$bandSize'," +
        s"'graft.lsh.shingleK'='$shingleK')")
  }

  /** Fail fast when a probe/append's band spec differs from the one the
    * index was built with (stored as table properties by [[writeLsh]]) —
    * and ALSO when the properties are missing entirely: [[writeLsh]]
    * stamps them right after the data write, so a bare table is a build
    * that crashed between the two steps (or a table nothing in this
    * library wrote), and a vacuous pass would silently join disjoint
    * (band, bh) universes. Rebuild with [[writeLsh]]. */
  private def validateSpec(spark: SparkSession, table: String,
                           numHashes: Int, bandSize: Int,
                           shingleK: Int): Unit = {
    val props = AnnIndex.readProps(spark, table)
    Seq("numHashes" -> numHashes, "bandSize" -> bandSize,
        "shingleK" -> shingleK).foreach { case (k, v) =>
      props.get(s"graft.lsh.$k") match {
        case Some(stored) =>
          require(stored == v.toString,
            s"DedupIndex: table $table was built with $k=$stored but this " +
              s"call passed $k=$v — probe/append params must match the " +
              "build params or the (band, bh) join is meaningless")
        case None =>
          throw new IllegalStateException(
            s"DedupIndex: table $table has no graft.lsh.$k property — " +
              "either the build crashed between the data write and the " +
              "property stamp, or the table was not written by writeLsh. " +
              "Rebuild with writeLsh; probing it could silently return " +
              "an empty or partial candidate set")
      }
    }
  }

  /** Rewrite a multi-append index back to one file per bucket,
    * preserving the bucket spec, sort order, and the band-spec
    * properties — see [[Indexes.compactBucketedTable]] for the
    * crash-safe swap. Probe plans and results are unchanged; only the
    * per-bucket file count collapses. */
  def compact(spark: SparkSession, table: String): Unit =
    Indexes.compactBucketedTable(spark, table)

  /** Retire documents from the index (keeper drops after dedup,
    * takedowns): removes every band row whose doc id appears in `ids`,
    * through the same spec-preserving crash-safe rewrite as
    * [[compact]] — band-spec properties travel, probe plans are
    * unchanged, and the table comes out compacted as a side effect. */
  def deleteByIds(spark: SparkSession, table: String, ids: DataFrame,
                  idCol: String = "doc_id"): Unit =
    Indexes.deleteFromBucketedTable(spark, table, ids, idCol)

  /** Incremental maintenance: append a new batch's banded rows through
    * the table's own bucket spec (hash and count come from the catalog,
    * not this writer) — every (band, bh) group keeps landing in its one
    * bucket across appends, which is the invariant [[probeLsh]]'s
    * exchange-free index scan relies on. */
  def appendLsh(docs: DataFrame, table: String, textCol: String = "text",
                idCol: String = "doc_id", numHashes: Int = 4,
                bandSize: Int = 1, shingleK: Int = 3): Unit = {
    validateSpec(docs.sparkSession, table, numHashes, bandSize, shingleK)
    bandRows(docs, textCol, idCol, numHashes, bandSize, shingleK)
      .write.mode("append")
      .insertInto(table)
  }

  /** STREAMING serve path: an unbounded stream of incoming docs probes
    * the persisted index for near-duplicate band hits. Everything here
    * is STATELESS — the per-row MinHash signature (array_min over the
    * shingle array, no groupBy), the band explode, and the
    * stream-static equi-join against the bucketed index — so rows emit
    * in append mode with zero state store; each output row is one
    * (incoming doc `a`, corpus doc `b`, band) agreement with both
    * sides' distinct-shingle counts. Aggregate/threshold the band hits
    * downstream (a `foreachBatch` with [[probeLsh]]'s groupBy, or a
    * batch pass over the sink): a global per-pair count here would grow
    * state with every pair ever seen. */
  def probeStream(spark: SparkSession, table: String, batch: DataFrame,
                  textCol: String = "text", idCol: String = "doc_id",
                  numHashes: Int = 4, bandSize: Int = 1,
                  shingleK: Int = 3): DataFrame = {
    validateSpec(spark, table, numHashes, bandSize, shingleK)
    val sh = TextOps.wordShingles(col(textCol), shingleK)
    val sig = batch
      .filter(size(TextOps.tokens(col(textCol))) >= shingleK)
      .select(col(idCol).as("a") +: Dedup.perRowSignature(sh, numHashes)
        :+ size(array_distinct(sh)).cast("long").as("ns_a"): _*)
    val bands = Dedup.bandStructs(numHashes, bandSize)
    val probes = sig
      .select(col("a"), col("ns_a"), explode(array(bands: _*)).as("_b"))
      .select(col("a"), col("_b.band").as("band"), col("_b.bh").as("bh"),
        col("ns_a"))
    val idx = spark.table(table)
      .select(col("band"), col("bh"), col(idCol).as("b"), col("ns").as("ns_b"))
    probes.join(idx, Seq("band", "bh"))
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b"), col("band"), col("ns_a"), col("ns_b"))
  }

  /** Near-duplicate CANDIDATES of `batch` against the indexed corpus:
    * (a = batch id, b = corpus id, n_bands = signature bands shared,
    * ns_a / ns_b = distinct-shingle counts). Integer-exact; feed pairs
    * clearing a band threshold to [[Dedup.pairJaccard]] for exact
    * verification. Self-matches (same id on both sides) are excluded so
    * a batch already ingested into the index can be re-probed. */
  def probeLsh(spark: SparkSession, table: String, batch: DataFrame,
               textCol: String = "text", idCol: String = "doc_id",
               numHashes: Int = 4, bandSize: Int = 1,
               shingleK: Int = 3): DataFrame = {
    validateSpec(spark, table, numHashes, bandSize, shingleK)
    val idx = spark.table(table)
      .select(col("band"), col("bh"), col(idCol).as("b"), col("ns").as("ns_b"))
    val probes = bandRows(batch, textCol, idCol, numHashes, bandSize, shingleK)
      .select(col(idCol).as("a"), col("band"), col("bh"), col("ns").as("ns_a"))
    probes.join(idx, Seq("band", "bh"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_bands"),
        max(col("ns_a")).as("ns_a"), max(col("ns_b")).as("ns_b"))
  }
}
