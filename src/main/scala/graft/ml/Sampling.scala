package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus shaping for training-data pipelines: deterministic stratified
  * downsampling and token-budget sequence packing.
  *
  * Both are built for the 100 TB regime: the sampler's only non-map
  * stage is a per-stratum count whose result (one row per stratum) is
  * broadcast back, and the packer touches each stratum exactly once in
  * a single sorted partition pass — no driver-side state, no quadratic
  * step anywhere.
  */
object Sampling {

  /** The shared 24-bit acceptance draw: the first 6 hex digits of
    * `md5(id || salt)` as a long in [0, 2^24). Both samplers and BOTH
    * DuckDB oracle builders (SparkEntry `hash24OracleSql`) must stay in
    * lockstep with this definition — it IS the cross-engine exactness
    * contract. */
  def hash24(id: org.apache.spark.sql.Column, salt: String): org.apache.spark.sql.Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 6), 16, 10)
      .cast("long")

  /** Keep ~`targetPerStratum` rows per stratum, chosen by a
    * deterministic hash draw: a row survives iff the first 24 bits of
    * `md5(id || salt)` fall under the stratum's acceptance rate
    * `target / n`. Strata at-or-under target keep every row. The
    * integer cross-multiplied comparison (`hv * n < target * 2^24`)
    * makes the draw exactly reproducible — same inputs, same survivors,
    * on any engine and any partitioning.
    *
    * One aggregation (stratum counts), one broadcast join, one
    * codegen'd filter; safe for BIGINT as long as
    * `stratum_count * 2^24` fits in a long (n up to ~5.5e11 rows). */
  def stratifiedSampleByHash(df: DataFrame, stratumCol: String,
                             idCol: String, targetPerStratum: Long,
                             salt: String = "graft"): DataFrame = {
    val cnt = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("_n"))
    val hv = hash24(col(idCol), salt)
    df.join(broadcast(cnt), stratumCol)
      .where(hv * col("_n") < lit(targetPerStratum) * lit(1L << 24))
      .drop("_n")
  }

  /** Temperature-flattened stratified sampling at temperature
    * alpha = 1/2 — the multilingual mixing rule (sample stratum s in
    * proportion to n_s^alpha, so low-resource strata are up-weighted
    * relative to their raw share): stratum s receives a target of
    * `totalTarget * w_s / Z` rows where `w_s = floor(sqrt(n_s))` and
    * `Z = sum(w)`, capped at keeping every row.
    *
    * Exactness: IEEE-754 `sqrt` is correctly rounded (unlike pow/ln),
    * so `floor(sqrt(n))` is the same integer on every engine; the
    * per-stratum acceptance threshold is then derived in exact BigInt
    * arithmetic on the driver (`min(2^24, totalTarget * w * 2^24 /
    * (Z * n))`) and a row survives iff its 24-bit md5 draw falls under
    * its stratum's threshold — fully deterministic, no float anywhere
    * in the row-level decision.
    *
    * The stratum census is collected to the driver (strata are
    * languages/domains/sources — thousands at most, by construction);
    * the thresholds go back as a broadcast join. One aggregation, one
    * broadcast join, one codegen'd filter.
    *
    * Rows with a NULL stratum are excluded CONSISTENTLY: they appear
    * neither in the census (where they would inflate Z and deflate
    * every real stratum's threshold) nor in the output (the equi-join
    * rejects null keys anyway) — tag unknowns with a sentinel stratum
    * upstream if they should compete for budget. */
  def temperatureSampleSqrt(df: DataFrame, stratumCol: String,
                            idCol: String, totalTarget: Long,
                            salt: String = "graft"): DataFrame = {
    val sess = df.sparkSession
    import sess.implicits._
    val counts = df.where(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).cast("string").as("_s"))
      .agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val weights = counts.map { case (s, n) =>
      (s, n, math.sqrt(n.toDouble).toLong)
    }
    val z = weights.map(_._3).sum
    val thr = weights.map { case (s, n, w) =>
      val t = BigInt(totalTarget) * w * (1L << 24) / (BigInt(z) * n)
      (s, t.min(BigInt(1L << 24)).toLong)
    }.toSeq
    val thrDf = thr.toDF("_s", "_thr")
    val hv = hash24(col(idCol), salt)
    df.join(broadcast(thrDf), col(stratumCol).cast("string") === col("_s"))
      .where(hv < col("_thr"))
      .drop("_s", "_thr")
  }

  /** Greedy first-fit sequence packing: within each stratum, walk the
    * rows in `idCol` order and append each to the current bin unless
    * that would push the bin over `budget` tokens, in which case a new
    * bin opens (a single row larger than the budget gets a bin of its
    * own — rows are never split). Returns one row per input row with
    * its (stratum-relative) `bin` and position `pos` inside the bin.
    *
    * The walk is inherently sequential PER STRATUM, so the scalable
    * shape is: hash-repartition on the stratum, sort within partitions,
    * and run the greedy fold as one `mapPartitions` pass — each
    * stratum's rows are contiguous in exactly one partition, state is
    * three longs, and strata pack in parallel across the cluster. A
    * giant single stratum serializes by construction (the task is
    * order-defined); split such corpora into sub-strata upstream
    * (e.g. `stratum || id mod k`) if packing breadth matters more than
    * a globally minimal bin count. */
  def packSequences(df: DataFrame, stratumCol: String, idCol: String,
                    tokensCol: String, budget: Long): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(stratumCol).cast("string").as("stratum"),
        col(idCol).cast("long").as("id"),
        col(tokensCol).cast("long").as("n_tokens"))
      .repartition(col("stratum"))
      .sortWithinPartitions(col("stratum"), col("id"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var cur: String = null
        var acc = 0L
        var bin = -1L
        var pos = 0L
        it.map { case (st, id, nt) =>
          if (st != cur) { cur = st; bin = -1L }
          if (bin < 0L || acc + nt > budget) { bin += 1; acc = 0L; pos = 0L }
          else pos += 1
          acc += nt
          (st, id, nt, bin, pos)
        }
      }
      .toDF("stratum", "id", "n_tokens", "bin", "pos")
  }

  /** Weighted multi-source mixture — the "data recipe" primitive: each
    * stratum (source, language, domain) is replayed `epochsPct/100`
    * times, e.g. 250 = 2.5 epochs. Every row emits `floor(epochs)`
    * copies (`rep` = 1..floor) plus one extra copy when its 24-bit
    * [[hash24]] draw falls under the fractional part, so a 2.5-epoch
    * stratum emits each doc 2 or 3 times — deterministic per id,
    * partitioning-independent, expected total exactly `n * 2.5`.
    * Strata absent from the recipe are dropped (0 epochs).
    *
    * Exactness: the row-level accept is the integer cross-multiply
    * `draw * 100 < (pct mod 100) * 2^24`; the only division is
    * `floor(pct / 100)`, whose double rounding error (~1e-13) cannot
    * bridge the 0.01 gap to the next integer — so both parts replay
    * bit-identically in any engine.
    *
    * Scale shape: the recipe is a map literal folded into the scan, the
    * copies come from one codegen'd sequence-explode — zero shuffles;
    * the fan-out IS the recipe's epoch factor, i.e. the intended output
    * size, so there is nothing to gate. */
  def mixByEpochs(df: DataFrame, epochsPct: Map[String, Int],
                  stratumCol: String = "source", idCol: String = "doc_id",
                  salt: String = "graftmix"): DataFrame = {
    require(epochsPct.nonEmpty && epochsPct.values.forall(_ >= 0),
      "mixByEpochs: recipe must be non-empty with non-negative epochs")
    val pct = element_at(typedLit(epochsPct), col(stratumCol).cast("string"))
    val whole = floor(pct / lit(100)).cast("long")
    val extra = when(
      hash24(col(idCol), salt) * 100 < (pct % 100).cast("long") * lit(1L << 24),
      1L).otherwise(0L)
    df.withColumn("_nc", whole + extra)
      .where(col("_nc") > 0)
      .withColumn("rep", explode(sequence(lit(1L), col("_nc"))))
      .drop("_nc")
  }

  /** Deterministic shard assignment for training-data export: adds a
    * `shard` column in [0, nShards) from the same 24-bit md5 draw the
    * samplers use (`hash24(id, salt) % nShards`) — so the shard of a
    * document is a pure function of its id, reproducible on any
    * engine, any partitioning, any rerun. That is the property a
    * resumable 100 TB export needs: a re-run after a partial failure
    * re-derives the same shard for every row, so completed shards can
    * be skipped instead of rewritten (the path
    * `exportShards(resume = true)` implements), and a downstream trainer can
    * address any document's shard without an index. Hash sharding also
    * balances by construction (each shard gets ~n/nShards rows
    * regardless of input order or skewed metadata). A NULL id hashes
    * to a NULL shard (md5 null-propagates, same contract as the
    * samplers' draw) — filter or sentinel-tag null ids upstream, or an
    * export writes them to the null partition directory. */
  def assignShards(df: DataFrame, idCol: String = "doc_id",
                   nShards: Int = 1024,
                   salt: String = "graftshard"): DataFrame = {
    require(nShards >= 1 && nShards <= (1 << 24),
      s"nShards must be in [1, 2^24], got $nShards")
    df.withColumn("shard",
      pmod(hash24(col(idCol), salt), lit(nShards.toLong)).cast("int"))
  }

  /** Shard a corpus to `path` as parquet, one directory per shard
    * (`shard=K/`), with a per-shard `_manifest` parquet (row count,
    * char volume, id range) written next to the data — underscore-
    * prefixed, so corpus readers skip it but a resuming exporter or a
    * trainer's data loader can read it without listing data files.
    * Returns the manifest, computed from the data as written.
    *
    * Scale shape: one `repartition(nShards, shard)` hash exchange puts
    * each shard wholly inside one task (a hash partitioner never
    * splits equal keys, so every `shard=K/` directory holds exactly
    * ONE file — the layout trainers want: a shard is a file, not a
    * directory scan). Hashing the shard VALUES can collide — a task
    * may own several shards while others sit empty, so write
    * parallelism is the number of distinct murmur3(shard) % nShards
    * residues (close to nShards by the balls-in-bins bound, never
    * exactly it) — the honest trade: `repartitionByRange` would map
    * shards 1:1 to tasks, but its RangePartitioner boundary sampling
    * is an EXTRA JOB that re-reads the full input lineage before the
    * real shuffle, doubling input I/O at the 100 TB export scale
    * (the same pre-pass class the count()-free samplers exist to
    * avoid). Size shards so a shard fits an executor (the assignment
    * hash balances them); the manifest is one groupBy over the written
    * data, a recount that certifies the files on disk rather than
    * trusting the plan that produced them.
    *
    * `resume = true` lists the existing `shard=K/` directories and
    * writes ONLY the missing shards (dynamic partition overwrite, so
    * completed directories are never touched) — the restart path for a
    * 100 TB export that died mid-job-commit. A committed shard
    * directory is complete (the committer moves task output in whole
    * directories), and the assignment is a pure hash of the id, so a
    * re-run reproduces exactly the rows the dead run would have put
    * there. Two safety rails on that reasoning (round-13 ADVICE):
    * a shard only counts as done if its directory holds at least one
    * DATA file — an empty directory left by a non-rename-atomic
    * filesystem (object stores) is an artifact of the crash, not a
    * commit — and the export stamps a `_export_spec` marker
    * (nShards + salt, written BEFORE the data so it survives any
    * crash) that a resume must match exactly: resuming with a
    * different shard count or salt would silently re-route every row
    * and drop whatever the skipped directories don't cover. The
    * manifest is always recomputed over ALL shards on disk. */
  def exportShards(df: DataFrame, path: String, idCol: String = "doc_id",
                   nShards: Int = 1024, textCol: String = "text",
                   salt: String = "graftshard",
                   resume: Boolean = false): DataFrame = {
    val assigned = assignShards(df, idCol, nShards, salt)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val specPath = new org.apache.hadoop.fs.Path(p, "_export_spec")
    val spec = s"nShards=$nShards\nsalt=$salt\n"
    def writeSpec(): Unit = {
      val out = fs.create(specPath, true)
      try out.write(spec.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    def isDataFile(st: org.apache.hadoop.fs.FileStatus): Boolean =
      st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".")
    val done: Seq[Int] =
      if (!resume) {
        // fresh export: truncate any prior layout, then stamp the spec
        // BEFORE the data lands — a crash mid-write leaves the marker,
        // so the rerun can resume with verified params
        fs.delete(p, true)
        writeSpec()
        Seq.empty
      }
      else if (!fs.exists(p)) { writeSpec(); Seq.empty }
      else {
        if (fs.exists(specPath)) {
          val in = fs.open(specPath)
          val stored = try {
            val buf = new java.io.ByteArrayOutputStream()
            org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
            buf.toString("UTF-8")
          } finally in.close()
          require(stored == spec,
            s"exportShards: resume params (nShards=$nShards, salt=$salt) " +
              s"differ from the original export's marker at $specPath " +
              s"(${stored.trim.replace('\n', ' ')}) — resuming under a " +
              "different sharding would silently drop rows; re-export " +
              "fresh or pass the original params")
        } else {
          require(!fs.listStatus(p).exists(st =>
            st.isDirectory && st.getPath.getName.startsWith("shard=")),
            s"exportShards: $path holds shard directories but no " +
              "_export_spec marker — cannot verify the original nShards/" +
              "salt, so completed shards cannot be trusted for a skip; " +
              "re-export fresh (resume = false)")
          writeSpec()
        }
        fs.listStatus(p).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("shard="))
          // an EMPTY shard directory is crash debris, not a commit —
          // only a directory with a data file counts as done
          .filter(st => fs.listStatus(st.getPath).exists(isDataFile))
          .map(_.getPath.getName.stripPrefix("shard="))
          .filter(n => n.nonEmpty && n.forall(_.isDigit))
          .map(_.toInt)
      }
    val todo =
      if (done.isEmpty) assigned
      else assigned.where(not(col("shard").isin(done: _*)))
    // ALWAYS dynamic partition overwrite: only the shard directories
    // being (re)written are replaced, so the _export_spec marker and
    // any completed shards survive; the fresh path truncated above
    todo.repartition(nShards, col("shard"))
      .write.partitionBy("shard").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(path)
    val back = df.sparkSession.read.parquet(path)
    val manifest = back.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(textCol))).as("n_chars"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$path/_manifest")
    df.sparkSession.read.parquet(s"$path/_manifest")
  }
}
