package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A PERSISTED approximate-nearest-neighbor index: the IVF cell
  * assignment of [[Similarity.ivfTopK]], but written into the catalog
  * bucketed by cell id, so repeated probe workloads (the serve-time
  * shape of a training-data pipeline: every new batch queries the same
  * corpus) skip both the assignment pass and the index-side shuffle.
  *
  * Scale design: the index table is bucketed on `_cell` — Spark's
  * bucketed-scan output partitioning satisfies the probe join's
  * distribution requirement, so only the (much smaller) query side
  * exchanges; the corpus is scanned in place, file-pruned to the probed
  * buckets' files. Writing pays one repartition on the cell id;
  * `buckets` should scale with the corpus (one bucket per few hundred
  * MB of vectors).
  */
object AnnIndex {

  /** Content fingerprint of the (centroids, scale) pair an index was
    * built under. Probing or appending with DIFFERENT centroids or a
    * different quantization scale makes the `_cell` equi-join compare
    * two unrelated cell universes — silently wrong neighbors — so the
    * fingerprint is stored on the table and every consumer validates
    * against it. */
  private[ml] def centroidFp(centroids: Array[Array[Long]], scale: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bb = java.nio.ByteBuffer.allocate(8)
    def putLong(l: Long): Unit = {
      bb.clear(); bb.putLong(l); md.update(bb.array())
    }
    putLong(scale.toLong)
    centroids.foreach { c => putLong(c.length.toLong); c.foreach(putLong) }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Fail fast when a probe/append's centroid matrix or scale differs
    * from the ones the index was built with — and ALSO when the
    * fingerprint property is missing entirely: [[writeIvf]] stamps it
    * right after the data write, so a table without it is a build that
    * crashed between the two steps (or a table nothing in this library
    * wrote), and validating it vacuously would be exactly the silent
    * wrong-cell join the fingerprint exists to prevent. Rebuild with
    * [[writeIvf]].
    *
    * CONTRACT (round-17 ADVICE): `table` must be a 1- or 2-part v1
    * session-catalog identifier (`tbl` or `db.tbl`) — the shape every
    * index in this library writes (`saveAsTable` into the session
    * catalog). A 3-part `catalog.db.tbl` or v2-catalog name fails here
    * with a parse/NoSuchTable error; route such tables through their
    * own catalog's metadata API instead. */
  private[ml] def readProps(spark: SparkSession, table: String): Map[String, String] =
    // straight catalog-metadata read, not `SHOW TBLPROPERTIES`: the SQL
    // command spelling pays a parse + command execution + collect per
    // call, and the spec-validation paths read properties once per
    // probe/append/serve-build — pure driver overhead (guide §5)
    spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table)).properties

  /** The centroid matrix the index stores about itself (stamped by
    * [[writeIvf]], preserved through compact/delete rewrites) — so
    * serve paths can probe WITHOUT the caller reconstructing the
    * matrix. Chunked across <= 2000-char properties because real
    * metastores cap property-value length. */
  def storedCentroids(spark: SparkSession, table: String): Array[Array[Long]] =
    centroidsFrom(readProps(spark, table), table)

  private def centroidsFrom(props: Map[String, String],
                            table: String): Array[Array[Long]] = {
    val n = props.getOrElse("graft.ivf.centroids.n",
      throw new IllegalStateException(
        s"AnnIndex: table $table stores no centroid matrix (built by an " +
          "older writeIvf?) — pass centroids explicitly")).toInt
    (0 until n).map(i => props(s"graft.ivf.centroids.$i")).mkString
      .split(";").map(_.split(",").map(_.toLong))
  }

  /** The quantization scale the index was built under. */
  def storedScale(spark: SparkSession, table: String): Int =
    scaleFrom(readProps(spark, table), table)

  private def scaleFrom(props: Map[String, String], table: String): Int =
    props.getOrElse("graft.ivf.scale",
      throw new IllegalStateException(
        s"AnnIndex: table $table stores no graft.ivf.scale")).toInt

  /** The PQ codebooks a [[writeIvf]]`(codebooks = ...)` index stores
    * about itself (chunked like the centroid matrix; subspaces joined
    * with '|'), or null when the index was built without PQ. */
  def storedCodebooks(spark: SparkSession,
                      table: String): Array[Array[Array[Long]]] =
    codebooksFrom(readProps(spark, table))

  private def codebooksFrom(props: Map[String, String]): Array[Array[Array[Long]]] = {
    props.get("graft.pq.codebooks.n") match {
      case None => null
      case Some(n) =>
        (0 until n.toInt).map(i => props(s"graft.pq.codebooks.$i")).mkString
          .split("\\|").map(_.split(";").map(_.split(",").map(_.toLong)))
    }
  }

  private def codebookProps(codebooks: Array[Array[Array[Long]]]): String = {
    val enc = codebooks.map(_.map(_.mkString(",")).mkString(";")).mkString("|")
    val chunks = enc.grouped(2000).toSeq
    s"'graft.pq.codebooks.n'='${chunks.size}'," +
      chunks.zipWithIndex.map { case (c, i) =>
        s"'graft.pq.codebooks.$i'='$c'"
      }.mkString(",")
  }

  /** Resolve (centroids, scale) against pre-read `props`: the caller's
    * values, or the table's own stored spec when centroids is null.
    * Threading the property map keeps each probe/append at ONE catalog
    * metadata read instead of one per stored-field accessor. */
  private def resolveSpec(props: Map[String, String], table: String,
                          centroids: Array[Array[Long]],
                          scale: Int): (Array[Array[Long]], Int) =
    if (centroids == null) (centroidsFrom(props, table), scaleFrom(props, table))
    else (centroids, scale)

  private[ml] def validateSpec(spark: SparkSession, table: String,
                           centroids: Array[Array[Long]],
                           scale: Int): Unit =
    validateSpecProps(readProps(spark, table), table, centroids, scale)

  private def validateSpecProps(props: Map[String, String], table: String,
                                centroids: Array[Array[Long]],
                                scale: Int): Unit = {
    props.get("graft.ivf.fp") match {
      case Some(stored) =>
        require(stored == centroidFp(centroids, scale),
          s"AnnIndex: table $table was built with a different centroid " +
            s"matrix or scale (stored ${props.getOrElse("graft.ivf.nCentroids", "?")} " +
            s"centroids, scale ${props.getOrElse("graft.ivf.scale", "?")}; " +
            s"this call passed ${centroids.length} centroids, scale $scale) " +
            "— probe/append params must match the build params or the " +
            "_cell join is meaningless")
      case None =>
        throw new IllegalStateException(
          s"AnnIndex: table $table has no graft.ivf.fp fingerprint — " +
            "either the build crashed between the data write and the " +
            "property stamp, or the table was not written by writeIvf. " +
            "Rebuild with writeIvf; probing it could silently join an " +
            "unrelated cell universe")
    }
  }

  /** Rewrite a multi-append index back to one file per bucket,
    * preserving the bucket spec, sort order, and the centroid
    * fingerprint properties — see [[Indexes.compactBucketedTable]] for
    * the crash-safe swap. Probe plans and results are unchanged; only
    * the per-bucket file count collapses. */
  def compact(spark: SparkSession, table: String): Unit =
    Indexes.compactBucketedTable(spark, table)

  /** Retire vectors from the index (deleted documents, takedowns):
    * removes every row whose vector id appears in `ids`, through the
    * same spec-preserving crash-safe rewrite as [[compact]] — the
    * centroid fingerprint travels, probe plans are unchanged, and the
    * table comes out compacted as a side effect. */
  def deleteByIds(spark: SparkSession, table: String, ids: DataFrame,
                  idCol: String = "vec_id"): Unit =
    Indexes.deleteFromBucketedTable(spark, table, ids, idCol)

  /** Assign every vector its MEMBERSHIP cell (nearest centroid, the
    * head of [[Similarity.nearestCells]]) and save as a parquet table
    * bucketed + sorted by `_cell`. Stores the quantized vector (`_q`)
    * so probes never re-read or re-quantize the raw embeddings. */
  def writeIvf(df: DataFrame, table: String,
               centroids: Array[Array[Long]], idCol: String = "vec_id",
               vecCol: String = "embedding", scale: Int = 1000,
               buckets: Int = 8,
               codebooks: Array[Array[Array[Long]]] = null): Unit = {
    val base = df.select(col(idCol).cast("long").as(idCol),
        Similarity.quantize(col(vecCol), scale).as("_q"))
      .withColumn("_cell",
        Similarity.nearestCells(col("_q"), centroids, 1).getItem(0))
    // optional PQ sidecar: m small codes per vector next to the exact
    // vector — ADC probes scan ONLY (_cell, id, _codes) (column pruning
    // skips the wide _q array at the parquet scan, pinned in
    // PlanContractSpec), exact probes and the re-rank still have _q
    val withCodes =
      if (codebooks == null) base
      else base.withColumn("_codes", Pq.pqEncode(col("_q"), codebooks))
    withCodes
      .repartition(buckets, col("_cell"))
      .write.format("parquet")
      .bucketBy(buckets, "_cell")
      .sortBy("_cell", idCol)
      .mode("overwrite")
      .saveAsTable(table)
    // the index describes itself: fingerprint for fail-fast validation
    // PLUS the full matrix (chunked under metastore value-length caps)
    // so serve paths can probe without reconstructing the centroids
    df.sparkSession.sql(
      s"ALTER TABLE $table SET TBLPROPERTIES(" +
        ivfPropsSql(centroids, scale) +
        (if (codebooks == null) ""
         else "," + codebookProps(codebooks)) + ")")
  }

  /** The self-describing (fingerprint + chunked matrix + scale)
    * property list every cell-keyed index stamps on itself — shared
    * with [[SemIndex]] so its survivor tables validate and serve
    * through the identical spec machinery. */
  private[ml] def ivfPropsSql(centroids: Array[Array[Long]],
                              scale: Int): String = {
    val enc = centroids.map(_.mkString(",")).mkString(";")
    val chunks = enc.grouped(2000).toSeq
    s"'graft.ivf.fp'='${centroidFp(centroids, scale)}'," +
      s"'graft.ivf.nCentroids'='${centroids.length}'," +
      s"'graft.ivf.scale'='$scale'," +
      s"'graft.ivf.centroids.n'='${chunks.size}'," +
      chunks.zipWithIndex.map { case (c, i) =>
        s"'graft.ivf.centroids.$i'='$c'"
      }.mkString(",")
  }

  /** Incremental index maintenance: append a new batch of vectors into
    * an existing [[writeIvf]] table. `insertInto` routes rows through
    * the table's OWN bucket spec (hash and count come from the catalog,
    * not from this writer), so the invariant the probe join relies on —
    * every row of cell c lives in bucket hash(c) — survives arbitrarily
    * many appends. Appends add one file per touched bucket per batch;
    * run [[compact]] periodically to fold them back to one file per
    * bucket (the probe stays correct either way — only the
    * single-file-per-bucket ordering opt-in of the interval tables is
    * inapplicable here, and the ANN probe never uses it). */
  def appendIvf(df: DataFrame, table: String,
                centroids: Array[Array[Long]] = null, idCol: String = "vec_id",
                vecCol: String = "embedding", scale: Int = 1000): Unit = {
    val props = readProps(df.sparkSession, table)
    val (cm, sc) = resolveSpec(props, table, centroids, scale)
    validateSpecProps(props, table, cm, sc)
    val base = df.select(col(idCol).cast("long").as(idCol),
        Similarity.quantize(col(vecCol), sc).as("_q"))
      .withColumn("_cell",
        Similarity.nearestCells(col("_q"), cm, 1).getItem(0))
    // a PQ-carrying index appends PQ-carrying rows (insertInto is
    // positional — the schema must match the table's)
    val cbs = codebooksFrom(props)
    (if (cbs == null) base
     else base.withColumn("_codes", Pq.pqEncode(col("_q"), cbs)))
      .write.mode("append")
      .insertInto(table)
  }

  /** The STREAMING serve path: probe the persisted index with an
    * unbounded stream of query vectors and emit each query's single
    * best neighbor. The probe join is stream-static (stateless — the
    * bucketed index is the static side, scanned in place per batch),
    * and the top-1 fold is `max_by` over (dot, -nb), which is
    * streaming-legal where `row_number` windows are not; per-query
    * state is one struct. For top-k on a stream, run k=1 per batch in
    * `foreachBatch` with the batch-mode [[probeIvf]] instead. */
  def probeStreamBest(spark: SparkSession, table: String,
                      queryStream: DataFrame, nProbe: Int,
                      centroids: Array[Array[Long]] = null,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      scale: Int = 1000): DataFrame = {
    val props = readProps(spark, table)
    val (cm, sc) = resolveSpec(props, table, centroids, scale)
    validateSpecProps(props, table, cm, sc)
    val idx = spark.table(table)
      .select(col(idCol).as("nb"), col("_q").as("_qb"), col("_cell"))
    val probes = queryStream
      .select(col(idCol).cast("long").as(idCol),
        Similarity.quantize(col(vecCol), sc).as("_q"))
      .withColumn("_cell",
        explode(Similarity.nearestCells(col("_q"), cm, nProbe)))
    probes.join(idx, Seq("_cell"))
      .filter(col(idCol) =!= col("nb"))
      .withColumn("dot", Similarity.dotLong(col("_q"), col("_qb")))
      .groupBy(col(idCol))
      .agg(max_by(struct(col("nb"), col("dot")),
        struct(col("dot"), -col("nb"))).as("_best"))
      .select(col(idCol), col("_best.nb").as("nb"), col("_best.dot").as("dot"))
  }

  /** STREAMING ADC serve: [[probeStreamBest]]'s PQ twin for a
    * codes-carrying index — each streamed query's single best neighbor
    * by ADC score, with the static index side scanned as (`_cell`,
    * id, `_codes`) only (the vector column stays on disk, exactly the
    * [[probeIvfAdc]] I/O shape). Stateless stream-static join +
    * streaming-legal `max_by` fold; scores are ADC estimates — run an
    * exact re-rank in `foreachBatch` with [[probeIvfAdc]] when the
    * serve needs exact ordering. */
  def probeStreamBestAdc(spark: SparkSession, table: String,
                         queryStream: DataFrame, nProbe: Int,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val props = readProps(spark, table)
    val cm = centroidsFrom(props, table)
    val sc = scaleFrom(props, table)
    validateSpecProps(props, table, cm, sc)
    val cbs = codebooksFrom(props)
    require(cbs != null,
      s"AnnIndex: table $table stores no PQ codebooks — build with " +
        "writeIvf(codebooks = ...) or serve with probeStreamBest")
    val m = cbs.length
    val idx = spark.table(table)
      .select(col(idCol).as("nb"), col("_codes"), col("_cell"))
    val probes = queryStream
      .select(col(idCol).cast("long").as(idCol),
        Similarity.quantize(col(vecCol), sc).as("_q"))
      .withColumn("_cell",
        explode(Similarity.nearestCells(col("_q"), cm, nProbe)))
      .select(col(idCol), col("_cell"), Pq.adcLut(col("_q"), cbs).as("_lut"))
    probes.join(idx, Seq("_cell"))
      .filter(col(idCol) =!= col("nb"))
      .withColumn("score", Pq.adcScore(col("_lut"), col("_codes"), m))
      .groupBy(col(idCol))
      .agg(max_by(struct(col("nb"), col("score")),
        struct(col("score"), -col("nb"))).as("_best"))
      .select(col(idCol), col("_best.nb").as("nb"),
        col("_best.score").as("score"))
  }

  /** Top-`k` neighbors for each query against a [[writeIvf]] table:
    * queries compute their `nProbe` nearest cells (same centroid
    * literals), explode, and equi-join the bucketed index on `_cell` —
    * zero exchange on the index side (pinned in PlanContractSpec). Same
    * semantics as `ivfTopK` with these centroids when the queries are
    * the indexed corpus itself (self-matches are excluded).
    *
    * Recall knob, measured (BASELINE.md round11-ann-recall-knob, 2M x
    * 64-dim): at a cell count matched to the data's cluster scale,
    * top-1 recall was 78/94/99.4/100% for nProbe 1/2/4/8 with the
    * probe wall FLAT to nProbe=4 (fixed costs dominate) — buy recall
    * with nProbe first; raising the cell count instead cuts per-cell
    * scan cost but loses recall at fixed nProbe and pays O(cells)
    * per-row build cost. */
  def probeIvf(spark: SparkSession, table: String, queries: DataFrame,
               k: Int, nProbe: Int, centroids: Array[Array[Long]] = null,
               idCol: String = "vec_id", vecCol: String = "embedding",
               scale: Int = 1000): DataFrame = {
    val props = readProps(spark, table)
    val (cm, sc) = resolveSpec(props, table, centroids, scale)
    validateSpecProps(props, table, cm, sc)
    val idx = spark.table(table)
      .select(col(idCol).as("nb"), col("_q").as("_qb"), col("_cell"))
    val probes = graft.core.Sizing.fanOutSmallScan(queries)
      .select(col(idCol).cast("long").as(idCol),
        Similarity.quantize(col(vecCol), sc).as("_q"))
      .withColumn("_cell",
        explode(Similarity.nearestCells(col("_q"), cm, nProbe)))
    val pairs = probes.join(idx, Seq("_cell"))
      .filter(col(idCol) =!= col("nb"))
      .withColumn("dot", Similarity.dotLong(col("_q"), col("_qb")))
      .select(col(idCol), col("nb"), col("dot")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("dot").desc, col("nb"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** ADC probe of a PQ-carrying [[writeIvf]] index: candidates are
    * scored from their stored `_codes` against a per-query lookup
    * table, so the index side of the join reads ONLY (`_cell`, id,
    * `_codes`) — column pruning drops the wide `_q` array at the
    * parquet scan (pinned in PlanContractSpec), which is the I/O
    * shape a 100 TB serve wants: the vectors stay on disk, the codes
    * travel. `rerank > 0` re-orders the top `rerank` ADC candidates
    * per query by exact dot, reading `_q` back for the shortlist only
    * (one narrow join). Output: (idCol, nb, score, rank) — ADC
    * estimates when rerank == 0, exact dots after a re-rank.
    * Semantics match [[graft.ml.Pq.ivfPqTopK]] with the stored
    * codebooks/centroids (pinned in PlanContractSpec). */
  def probeIvfAdc(spark: SparkSession, table: String, queries: DataFrame,
                  k: Int, nProbe: Int, rerank: Int = 0,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val props = readProps(spark, table)
    val cm = centroidsFrom(props, table)
    val sc = scaleFrom(props, table)
    validateSpecProps(props, table, cm, sc)
    val cbs = codebooksFrom(props)
    require(cbs != null,
      s"AnnIndex: table $table stores no PQ codebooks — build with " +
        "writeIvf(codebooks = ...) or probe with probeIvf")
    val m = cbs.length
    val idx = spark.table(table)
      .select(col(idCol).as("nb"), col("_codes"), col("_cell"))
    val probes = graft.core.Sizing.fanOutSmallScan(queries)
      .select(col(idCol).cast("long").as(idCol),
        Similarity.quantize(col(vecCol), sc).as("_q"))
      .withColumn("_cell",
        explode(Similarity.nearestCells(col("_q"), cm, nProbe)))
      .select(col(idCol), col("_cell"), col("_q"),
        Pq.adcLut(col("_q"), cbs).as("_lut"))
    val scored = probes.join(idx, Seq("_cell"))
      .filter(col(idCol) =!= col("nb"))
      .select(col(idCol), col("nb"),
        Pq.adcScore(col("_lut"), col("_codes"), m).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("nb"))
    if (rerank <= 0)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    else {
      require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
      val shortlist = scored.withColumn("_r", row_number().over(w))
        .filter(col("_r") <= rerank).drop("_r", "score")
      val qv = graft.core.Sizing.fanOutSmallScan(queries)
        .select(col(idCol).cast("long").as("_qid"),
          Similarity.quantize(col(vecCol), sc).as("_q"))
      val exact = shortlist
        .join(qv, col(idCol) === col("_qid"))
        .join(spark.table(table).select(col(idCol).as("nb"),
          col("_q").as("_qb")), Seq("nb"))
        .select(col(idCol), col("nb"),
          Similarity.dotLong(col("_q"), col("_qb")).as("score"))
      val w2 = org.apache.spark.sql.expressions.Window
        .partitionBy(col(idCol)).orderBy(col("score").desc, col("nb"))
      exact.withColumn("rank", row_number().over(w2)).filter(col("rank") <= k)
    }
  }
}
