package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A PERSISTED hot-gram substring index — the fourth index in the
  * [[DedupIndex]]/[[AnnIndex]]/[[SemIndex]] family, at token-span
  * granularity: the corpus-wide k-token-window md5 COUNTS behind
  * [[Dedup.hotSubstrings]], written into the catalog bucketed by the
  * gram key `_g`. The steady-state serve workload — every incoming
  * batch drops the token spans already duplicated in the reference
  * corpus — then reads pre-counted grams off a bucketed scan: the
  * hot-set derivation costs ZERO exchange per probe (the groupBy on
  * `_g` consumes the bucketed layout in place), where the raw q138
  * shape re-reads an unbucketed parquet hot set whose join re-shuffles
  * against the stream on every trigger once the set outgrows broadcast
  * (VERDICT r14 item #3: 719,565 grams at 2M docs, billions at corpus
  * scale).
  *
  * The table stores EVERY gram with its occurrence count, not just the
  * hot ones: hotness is a READ-time threshold (`minOcc`, stamped as
  * the default), which is what makes increments exact — a gram below
  * `minOcc` in each batch but above it across batches becomes hot the
  * moment the union crosses the line, with no rebuild. Appends route
  * through the table's own bucket spec (`insertInto`) as partial
  * per-batch counts; the read-side SUM over the bucket-local rows
  * reconciles them, and [[compact]] folds them back to one row per
  * gram (and one file per bucket). Document retirement
  * ([[removeDocs]]) appends NEGATIVE counts — a takedown re-opens any
  * gram whose net count falls below the threshold, and zeroed grams
  * vanish at the next compaction.
  *
  * The table describes itself (the family's property scheme):
  * `graft.substr.k` pins the tokenization the counts were built under
  * (a probe under a different k would join a disjoint gram universe —
  * fail-fast, the [[DedupIndex]] lesson), `graft.substr.minOcc` the
  * default serve threshold.
  */
object SubstrIndex {

  /** Per-gram occurrence counts of `docs` (within-doc repeats count,
    * the [[Dedup.hotSubstrings]] convention): (_g, _n). One shuffle on
    * the fixed-width 32-char gram key. */
  private def gramCounts(docs: DataFrame, textCol: String, idCol: String,
                         k: Int): DataFrame = {
    val base = docs.select(col(idCol),
      TextOps.tokens(col(textCol)).as("_toks"))
    Dedup.gramOccurrences(base, idCol, k)
      .groupBy(col("_g")).agg(count(lit(1)).as("_n"))
  }

  private def props(spark: SparkSession, table: String): Map[String, String] = {
    val p = AnnIndex.readProps(spark, table)
    require(p.contains("graft.substr.k"),
      s"SubstrIndex: table $table carries no graft.substr.k — either " +
        "the build crashed between the data write and the property " +
        "stamp, or the table was not written by SubstrIndex.write. " +
        "Rebuild with write; probing it could silently join a " +
        "mismatched gram universe")
    p
  }

  /** The build tokenization width the index stores about itself. */
  def storedK(spark: SparkSession, table: String): Int =
    props(spark, table)("graft.substr.k").toInt

  /** The default serve threshold the index stores about itself. */
  def storedMinOcc(spark: SparkSession, table: String): Int =
    props(spark, table)("graft.substr.minOcc").toInt

  /** Build the index: full gram counts of the reference corpus,
    * bucketed + sorted by `_g`. `buckets` should scale with the
    * distinct-gram universe (a bucket per few hundred MB of gram
    * rows). */
  def write(docs: DataFrame, table: String, textCol: String = "text",
            idCol: String = "doc_id", minMatchTokens: Int = 8,
            minOcc: Int = 2, buckets: Int = 8): Unit = {
    require(minMatchTokens >= 2,
      s"minMatchTokens must be >= 2, got $minMatchTokens")
    require(minOcc >= 1, s"minOcc must be >= 1, got $minOcc")
    gramCounts(docs, textCol, idCol, minMatchTokens)
      .repartition(buckets, col("_g"))
      .write.format("parquet")
      .bucketBy(buckets, "_g")
      .sortBy("_g")
      .mode("overwrite")
      .saveAsTable(table)
    docs.sparkSession.sql(
      s"ALTER TABLE $table SET TBLPROPERTIES(" +
        s"'graft.substr.k'='$minMatchTokens'," +
        s"'graft.substr.minOcc'='$minOcc')")
  }

  /** Incremental ingest: add a new batch's gram counts through the
    * table's own bucket spec. The stored k drives the tokenization —
    * the caller cannot diverge from the build spec by construction. */
  def append(docs: DataFrame, table: String, textCol: String = "text",
             idCol: String = "doc_id"): Unit = {
    val k = storedK(docs.sparkSession, table)
    gramCounts(docs, textCol, idCol, k)
      .write.mode("append")
      .insertInto(table)
  }

  /** Retire documents from the reference corpus (takedowns, dedup
    * keeper drops): append the NEGATIVE of their gram counts, so net
    * read-side sums fall exactly as if the documents had never been
    * ingested. Pass exactly the retired documents' original text; a
    * doc never ingested must not be passed (its grams would go
    * negative — [[compact]] clears zeroed grams, and the read-side
    * `_n >= minOcc` threshold ignores any residual negative net). */
  def removeDocs(docs: DataFrame, table: String, textCol: String = "text",
                 idCol: String = "doc_id"): Unit = {
    val k = storedK(docs.sparkSession, table)
    gramCounts(docs, textCol, idCol, k)
      .select(col("_g"), (-col("_n")).as("_n"))
      .write.mode("append")
      .insertInto(table)
  }

  /** Fold the multi-append partial counts back to ONE row per gram
    * (dropping grams whose net count reached zero) and one file per
    * bucket — the family's spec-preserving crash-safe rewrite with a
    * merge on the way through. Read results are unchanged (the read
    * side already sums); only row/file counts collapse. */
  def compact(spark: SparkSession, table: String): Unit =
    Indexes.rewriteBucketedTable(spark, table,
      df => df.groupBy(col("_g")).agg(sum(col("_n")).as("_n"))
        .where(col("_n") =!= 0))

  /** The hot gram set at threshold `minOcc` (default: the stamped
    * build threshold): net count >= minOcc. ZERO exchange — the
    * groupBy on `_g` consumes the bucketed scan's partitioning in
    * place (pinned in PlanContractSpec). */
  def hotGrams(spark: SparkSession, table: String,
               minOcc: Option[Int] = None): DataFrame = {
    val occ = minOcc.getOrElse(storedMinOcc(spark, table))
    spark.table(table)
      .groupBy(col("_g")).agg(sum(col("_n")).as("_n"))
      .where(col("_n") >= occ).select(col("_g"))
  }

  /** Batch serve: [[Dedup.removeSubstrings]] of `docs` against the
    * index's hot set under the stored k — (idCol, cleaned text,
    * n_tokens, n_removed). Membership-only (a probed document cannot
    * change the stored counts), so any split of the incoming corpus
    * probes to identical rows — use this as the `foreachBatch` body
    * for streaming ingest, exactly like the q138 serve but with the
    * hot side derived exchange-free from the bucketed table.
    *
    * NOTE: each call RE-DERIVES the hot set (a full index aggregation
    * — zero-exchange, but still a scan). For a multi-trigger serve
    * session, hold a [[serve]] handle instead: the hot set is derived
    * ONCE, pinned in memory, and re-derived only on index mutation
    * (VERDICT r15 item #2). */
  def probe(spark: SparkSession, table: String, docs: DataFrame,
            textCol: String = "text", idCol: String = "doc_id",
            minOcc: Option[Int] = None): DataFrame =
    Dedup.removeSubstrings(docs, hotGrams(spark, table, minOcc),
      textCol, idCol, storedK(spark, table))

  /** A serve-SESSION handle over the index (the steady-state shape a
    * streaming ingest actually runs): the hot set is derived once at
    * construction and MATERIALIZED via localCheckpoint, so every
    * subsequent [[SubstrServe.probe]] — e.g. a `foreachBatch` body
    * firing per trigger — joins against pre-computed in-memory rows
    * with ZERO index scans and zero re-aggregation in its plan
    * (StreamingSpec pins the probe plan file-scan-free on the index
    * side). The set only changes when the index mutates, so mutations
    * route THROUGH the handle ([[SubstrServe.append]] /
    * [[SubstrServe.removeDocs]] / [[SubstrServe.compact]]) and
    * invalidate it; out-of-band writers call [[SubstrServe.refresh]].
    * Swapped-out checkpoint blocks are released by Spark's
    * ContextCleaner once unreferenced. */
  def serve(spark: SparkSession, table: String,
            minOcc: Option[Int] = None): SubstrServe =
    new SubstrServe(spark, table, minOcc)
}

/** See [[SubstrIndex.serve]]. Thread-safe for the serve pattern it
  * exists for (one mutator, many probe triggers). */
final class SubstrServe private[ml](spark: SparkSession, table: String,
                                    minOcc: Option[Int]) {
  import org.apache.spark.sql.DataFrame
  /** The build tokenization width — pinned once; a mutation cannot
    * change it (the table property is write-once at build). */
  val k: Int = SubstrIndex.storedK(spark, table)
  @volatile private var hot: DataFrame = derive()
  private def derive(): DataFrame =
    SubstrIndex.hotGrams(spark, table, minOcc).localCheckpoint()
  /** Re-derive the hot set (after an out-of-band index mutation). */
  def refresh(): Unit = { hot = derive() }
  /** The pinned hot-gram set (one `_g` column, materialized). */
  def hotSet: DataFrame = hot
  /** [[SubstrIndex.probe]] against the PINNED hot set — no index
    * scan, no re-aggregation; safe as a per-trigger foreachBatch body. */
  def probe(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame =
    Dedup.removeSubstrings(docs, hot, textCol, idCol, k)
  def append(docs: DataFrame, textCol: String = "text",
             idCol: String = "doc_id"): Unit = {
    SubstrIndex.append(docs, table, textCol, idCol); refresh()
  }
  def removeDocs(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): Unit = {
    SubstrIndex.removeDocs(docs, table, textCol, idCol); refresh()
  }
  def compact(): Unit = {
    SubstrIndex.compact(spark, table)
    // read results are unchanged by a fold (the hot threshold already
    // sums partials), but refresh anyway so the pinned set's lineage
    // doesn't reference pre-compaction files
    refresh()
  }
}
