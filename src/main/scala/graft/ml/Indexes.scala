package graft.ml

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Shared maintenance for the persisted index tables ([[AnnIndex]],
  * [[DedupIndex]]): compaction of multi-append tables back to one file
  * per bucket.
  *
  * Every `insertInto` append adds one file per touched bucket per
  * batch, so a long-lived index accumulates files linearly with batch
  * count — correctness is unaffected (the bucket INVARIANT is what the
  * probe join needs, not the file count), but scan open/seek overhead
  * grows. [[compactBucketedTable]] closes the lifecycle: rewrite the
  * table through its OWN catalog bucket spec (numBuckets, bucket and
  * sort columns all read from the catalog, never re-specified) into a
  * staging table, carry the `graft.*` validation properties over, and
  * swap via catalog renames.
  *
  * Crash safety: the live table is never dropped before its
  * replacement holds the full data. The swap is
  * rename(live -> _precompact); rename(staging -> live);
  * drop(_precompact) — an interruption leaves either a stale staging
  * table (dropped on the next rewrite) or, in the window between the
  * two renames, no live table but an intact `_precompact`, which the
  * next rewrite RESTORES automatically before proceeding. The
  * `graft.*` properties travel WITH whichever table is current, so the
  * fail-fast spec validation on probe/append never sees a
  * half-compacted state.
  */
object Indexes {

  /** Rewrite a bucketed catalog table through its OWN bucket spec,
    * applying `transform` to the rows on the way — the shared core of
    * [[compactBucketedTable]] (transform = identity) and
    * [[deleteFromBucketedTable]] (transform = anti-join). Preserves
    * bucket spec, sort spec, and `graft.*` table properties; swaps via
    * the crash-safe rename dance described on the object. */
  private[ml] def rewriteBucketedTable(spark: SparkSession, table: String,
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val catalog = spark.sessionState.catalog
    val staging = table + "_compacting"
    val retired = table + "_precompact"
    // crash recovery: an interruption BETWEEN the two swap renames
    // leaves no live table but an intact, complete `_precompact` —
    // restore it instead of failing the retry (the properties traveled
    // with it, so the restored table validates as before the crash)
    if (!catalog.tableExists(ident) && catalog.tableExists(
        spark.sessionState.sqlParser.parseTableIdentifier(retired)))
      spark.sql(s"ALTER TABLE $retired RENAME TO $table")
    val meta = catalog.getTableMetadata(ident)
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"rewrite: table $table carries no bucket spec — not a graft index table"))
    val props = meta.properties.filter { case (k, _) => k.startsWith("graft.") }
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    spark.sql(s"DROP TABLE IF EXISTS $retired")
    val bcols = spec.bucketColumnNames
    // Read the table's FILES, not the catalog table: a bucketed scan
    // advertises (or AQE local-reads back to) a layout the planner may
    // treat as already-distributed and elide the repartition below —
    // but the bucketed-write path only REQUIRES a per-partition sort,
    // so the elision leaves each bucket's rows scattered across tasks
    // and the rewrite emits as many files per bucket as before. A
    // plain path read has no partitioning claim, the exchange is real,
    // and each task owns exactly one bucket.
    val writer = transform(
      spark.read.schema(spark.table(table).schema)
        .parquet(meta.location.toString))
      .repartition(spec.numBuckets, bcols.map(col): _*)
      .write.format("parquet")
      .bucketBy(spec.numBuckets, bcols.head, bcols.tail: _*)
    val sorted =
      if (spec.sortColumnNames.nonEmpty)
        writer.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
      else writer
    sorted.mode("overwrite").saveAsTable(staging)
    if (props.nonEmpty)
      spark.sql(s"ALTER TABLE $staging SET TBLPROPERTIES(" +
        props.map { case (k, v) => s"'$k'='$v'" }.mkString(",") + ")")
    spark.sql(s"ALTER TABLE $table RENAME TO $retired")
    spark.sql(s"ALTER TABLE $staging RENAME TO $table")
    spark.sql(s"DROP TABLE $retired")
  }

  /** Rewrite a bucketed catalog table to one file per bucket,
    * preserving its bucket spec, sort spec, and `graft.*` table
    * properties. The rewrite is one `repartition` on the bucket
    * columns (partitioner == bucket hash, so each task owns exactly
    * one bucket and writes exactly one file) plus the catalog swap. */
  def compactBucketedTable(spark: SparkSession, table: String): Unit =
    rewriteBucketedTable(spark, table, identity)

  /** Retire documents/vectors from a persisted index (dedup keeper
    * drops, takedowns): rewrite the table WITHOUT the rows whose
    * `idCol` appears in `ids`, through the same spec-preserving
    * crash-safe machinery as compaction — so a delete is also a
    * compaction (one file per bucket afterwards) and probe plans are
    * untouched. `ids` is a one-column frame (or any frame carrying
    * `idCol`). An operational-scale delete list is broadcast (one
    * executor-local hash probe, no extra shuffle on the rewrite); a
    * list too large to sit on the driver falls back to a shuffled
    * left_anti join — the count that sizes the gate is one cheap job
    * against a rewrite that rescans the whole table anyway. */
  def deleteFromBucketedTable(spark: SparkSession, table: String,
                              ids: org.apache.spark.sql.DataFrame,
                              idCol: String): Unit = {
    val del = ids.select(col(idCol)).distinct()
    // ~2M distinct ids ≈ tens of MB broadcast — comfortably under the
    // driver/executor budget; beyond that the takedown list behaves
    // like a second corpus and must shuffle
    val gate = maxBroadcastDeleteIds(spark)
    // saturate: a conf >= Int.MaxValue means "always broadcast", and
    // (gate + 1).toInt would otherwise go negative and crash limit()
    val probe = if (gate >= Int.MaxValue - 1) Int.MaxValue else (gate + 1).toInt
    val broadcastable = del.limit(probe).count() <= gate
    rewriteBucketedTable(spark, table,
      df =>
        if (broadcastable)
          df.join(org.apache.spark.sql.functions.broadcast(del),
            Seq(idCol), "left_anti")
        else df.join(del, Seq(idCol), "left_anti"))
  }

  /** Gate for [[deleteFromBucketedTable]]'s broadcast-vs-shuffle plan;
    * the limit+count probe never scans past this many ids. Conf-
    * tunable so deployments with tighter driver memory can lower it
    * (and tests can force the shuffle path). */
  def maxBroadcastDeleteIds(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.index.maxBroadcastDeleteIds")
      .map(_.toLong).getOrElse(2000000L)

  /** Data-file count under a catalog table's location — the
    * compaction metric (and its test hook). Walks through the Hadoop
    * FileSystem API so the metric holds on any catalog location scheme
    * (file://, hdfs://, s3a://), not just local paths. */
  def dataFileCount(spark: SparkSession, table: String): Int = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = spark.sessionState.catalog.getTableMetadata(ident).location
    val path = new org.apache.hadoop.fs.Path(loc)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(path, true)
    var n = 0
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }
}
