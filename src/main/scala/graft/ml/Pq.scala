package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the memory/shuffle
  * side of the ANN story. A `dim`-component quantized vector (8 bytes a
  * component = 512 B at dim 64) compresses to `m` one-byte-ish codes
  * (one per subspace) by snapping each `dim/m`-component SUBVECTOR to
  * its nearest entry in a per-subspace codebook. At 100 TB that is the
  * difference between an index that fits executor memory and one that
  * does not: 2M x 64 floats = ~1 GB of vector payload becomes ~16 MB of
  * codes, and every probe-side shuffle moves codes, not vectors.
  *
  * Scoring is ADC (asymmetric distance computation): the QUERY stays
  * exact, each candidate is represented by its reconstruction, and
  * dot(q, recon(codes)) decomposes into a per-subspace table lookup —
  * `lut[s][code_s]` where `lut[s][c] = dot(q_s, codebook[s][c])` is
  * computed ONCE per query (m*k small dot products), after which every
  * candidate costs m integer array lookups instead of a dim-wide dot.
  *
  * Everything is integer-exact and cross-engine reproducible: vectors
  * quantize through [[Similarity.quantize]], codebooks are md5-derived
  * literals (same scheme as [[Similarity.ivfCentroids]]), encoding is a
  * `least()` argmin over per-code integer distances (the codegen-safe
  * argmin — BASELINE.md round-10 ArraySort cliff), and ADC scores are
  * integer sums — so a DuckDB oracle replays encode + probe bit-for-bit
  * (q128/q129). Recall economics at soak scale live in MlBench `pq`.
  */
object Pq {

  /** Deterministic per-subspace codebooks: `m` subspaces x `k` codes x
    * `subDim` components, md5-derived in [-scale, scale) — the PQ
    * analog of [[Similarity.ivfCentroids]], literal-portable to SQL
    * oracles. Production deployments train codebooks per subspace
    * (k-means on subvectors) and pass them through the same parameter;
    * every operator here takes the matrix, not the scheme. */
  def pqCodebooks(m: Int, k: Int, subDim: Int,
                  scale: Int = 1000): Array[Array[Array[Long]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(m, k, subDim) { (s, c, d) =>
      md.reset()
      val hex = md.digest(s"pq$s-$c-$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % (2L * scale) - scale
    }
  }

  /** Train per-subspace codebooks with k-means over the corpus's OWN
    * subvectors — the production path: PQ's accuracy is entirely a
    * function of how well the codebook tiles the data distribution,
    * and random codebooks quantize real data to noise (measured in
    * MlBench `pq`: md5-literal codebooks score ~0% top-1 on the 2M
    * soak corpus where trained ones are usable; the md5 scheme exists
    * for cross-engine oracle replay, not production). Reproducible for
    * a FIXED environment: seed and iteration count are pinned and the
    * training sample is hash-selected and repartitioned to a constant
    * width before the fit — but k-means center updates are float
    * tree-aggregations, so a different Spark version (or a last-ulp
    * platform difference) can still flip a rounded codebook entry;
    * persist trained codebooks (writeIvf stores them on the index)
    * rather than re-deriving them per run. Returns the same
    * m x k x subDim long matrix [[pqCodebooks]] produces, in the
    * quantized integer space — always exactly `k` rows per subspace:
    * when k-means converges to fewer distinct centers than `k` (a
    * subspace whose sample has few distinct points), the codebook is
    * padded by cycling the trained centers, so the m x k x subDim
    * rectangularity contract `ivfPqTopK` requires always holds
    * (duplicate codes are harmless — the encode argmin ties to the
    * smaller code id, so a padded copy never wins).
    *
    * Sampling is a fixed hash-acceptance draw (`sampleFraction` of the
    * corpus, by a 20-bit xxhash threshold on the vector bytes) — ONE
    * pass, no `count()` pre-pass: at 100 TB an exact-count stride
    * would double the pre-train I/O for no accuracy gain — BOUNDED at
    * `maxSampleRows` regardless of corpus size
    * ([[Similarity.boundedTrainingSample]]; round-13 ADVICE — the
    * unbounded 10% draw scaled the pinned training set linearly with
    * the corpus). */
  def trainCodebooks(df: DataFrame, vecCol: String = "embedding",
                     m: Int = 8, k: Int = 256, dim: Int = 64,
                     scale: Int = 1000, sampleFraction: Double = 0.1,
                     maxSampleRows: Int = 1 << 18): Array[Array[Array[Long]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    // constant-width, content-ordered, row-capped sample: the fit's
    // float aggregation order no longer follows the caller's core
    // count / input layout, and the checkpoint it pins is bounded
    val sample = Similarity.boundedTrainingSample(df, vecCol,
        sampleFraction, maxSampleRows, scale)
      .localCheckpoint()
    Array.tabulate(m) { s =>
      val feats = sample.select(array_to_vector(
        transform(slice(col("_q"), s * subDim + 1, subDim),
          x => x.cast("double"))).as("features"))
      Similarity.padToK(new KMeans().setK(k).setSeed(42L).setMaxIter(10)
        .fit(feats).clusterCenters.map(_.toArray.map(math.round)), k)
    }
  }

  /** PQ-encode a quantized long-array column: array of `m` code ids,
    * code s = argmin_c |v_s - codebook(s)(c)|^2 over the s-th
    * subvector. Pure codegen'd column expression: per subspace the
    * distance of code c folds to `|c|^2 - 2 * dot(v_s, c)` (the |v_s|^2
    * term shifts every code equally), each dot a literal-array DotLong,
    * and the argmin is `least()` over (d, c) structs — ties to the
    * smaller code id, same contract as [[Similarity.nearestCells]]. */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Long]]]): Column = {
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    array((0 until m).map { s =>
      val sub = slice(vec, s * subDim + 1, subDim)
      val structs = codebooks(s).zipWithIndex.map { case (c, ci) =>
        val c2 = c.map(v => v * v).sum
        struct((lit(c2) - lit(2L) * Similarity.dotLong(sub, typedLit(c.toSeq))).as("d"),
          lit(ci.toLong).as("c"))
      }
      (if (structs.length == 1) structs.head else least(structs: _*))
        .getField("c")
    }: _*)
  }

  /** The per-query ADC lookup table as a column: `m` arrays of `k`
    * integer dots, `lut[s][c] = dot(v_s, codebook(s)(c))` — computed
    * once per query row (m*k subDim-wide dots), then every candidate
    * scores with m lookups. */
  def adcLut(vec: Column, codebooks: Array[Array[Array[Long]]]): Column = {
    val subDim = codebooks(0)(0).length
    array(codebooks.zipWithIndex.map { case (cb, s) =>
      val sub = slice(vec, s * subDim + 1, subDim)
      array(cb.map(c => Similarity.dotLong(sub, typedLit(c.toSeq))): _*)
    }: _*)
  }

  /** ADC score of a code array against a per-query LUT:
    * `sum_s lut[s][codes[s]]` ~ dot(query, reconstruction(codes)).
    * Unrolled to `m` literal element_at lookups — stays in whole-stage
    * codegen (no aggregate() lambda in the per-candidate hot path). */
  def adcScore(lut: Column, codes: Column, m: Int): Column =
    (0 until m).map(s =>
      element_at(element_at(lut, s + 1), codes(s).cast("int") + 1))
      .reduce(_ + _)

  /** IVF-PQ top-k: the [[Similarity.ivfTopK]] candidate structure
    * (coarse cells bound the candidate set; equi-join on the cell id)
    * with PQ-ADC scoring instead of exact dots — the candidate side
    * ships `m` byte-ish codes per vector instead of the `dim`-long
    * vector, and each candidate costs m lookups instead of a dim-wide
    * multiply. Optionally re-rank: `rerank > 0` takes the top `rerank`
    * ADC candidates per query and re-orders them by EXACT quantized
    * dot (one narrow self-join back to the vectors for the shortlist
    * only — the standard PQ recall repair, measured in MlBench `pq`).
    * Output: (idCol, nb, score, rank) — `score` is the ADC estimate
    * when rerank == 0, the exact dot for the re-ranked shortlist.
    *
    * Distributed shape: vectors reduce to (id, cell, codes) — the
    * index payload — ONE encode pass; queries carry their LUT from the
    * same scan that assigns probe cells; the join is an equi-join on
    * the cell id; the per-query top-k is a window over candidates.
    * Nothing quadratic, nothing vector-wide after the encode except
    * the explicitly-bounded re-rank shortlist. */
  def ivfPqTopK(df: DataFrame, k: Int, idCol: String = "vec_id",
                vecCol: String = "embedding",
                codebooks: Array[Array[Array[Long]]],
                centroids: Array[Array[Long]], nProbe: Int = 2,
                rerank: Int = 0, scale: Int = 1000,
                queries: DataFrame = null): DataFrame = {
    val m = codebooks.length
    require(m >= 1 && codebooks.forall(_.length == codebooks(0).length) &&
      codebooks.forall(_.forall(_.length == codebooks(0)(0).length)),
      "codebooks must be a rectangular m x k x subDim matrix")
    require(codebooks(0)(0).length * m == centroids(0).length,
      s"codebooks cover ${codebooks(0)(0).length * m} dims, " +
        s"centroids have ${centroids(0).length}")
    val base = graft.core.Sizing.fanOutSmallScan(df)
      .select(col(idCol).cast("long").as(idCol),
        Similarity.quantize(col(vecCol), scale).as("_q"))
    // query side defaults to the corpus itself (every vector probes);
    // pass `queries` for the serve shape — a small probe set against a
    // large encoded corpus (ids share the corpus id space, so the
    // self-pair filter still applies)
    val qbase =
      if (queries == null) base
      else queries.select(col(idCol).cast("long").as(idCol),
        Similarity.quantize(col(vecCol), scale).as("_q"))
    // candidate side: membership cell + codes; the vector itself is
    // dropped unless the re-rank pass needs it back
    val members = base.select(col(idCol).as("nb"),
      element_at(Similarity.nearestCells(col("_q"), centroids, 1), 1).as("_cell"),
      pqEncode(col("_q"), codebooks).as("_codes"))
    // query side: probe cells + the ADC lookup table. No distinct
    // anywhere: nearestCells yields nProbe DISTINCT cells per query and
    // each member owns exactly ONE membership cell, so a (query, nb)
    // pair can match at most once — the join is duplicate-free by
    // construction (no defensive exchange)
    val probes = qbase.select(col(idCol), col("_q"),
        posexplode(Similarity.nearestCells(col("_q"), centroids, nProbe))
          .as(Seq("_p", "_cell")))
      .select(col(idCol), col("_cell"), adcLut(col("_q"), codebooks).as("_lut"))
    val scored = probes.join(members, Seq("_cell"))
      .filter(col(idCol) =!= col("nb"))
      .select(col(idCol), col("nb"),
        adcScore(col("_lut"), col("_codes"), m).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("nb"))
    if (rerank <= 0)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    else {
      require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
      val shortlist = scored.withColumn("_r", row_number().over(w))
        .filter(col("_r") <= rerank).drop("_r", "score")
      val exact = shortlist
        .join(qbase.select(col(idCol).as("_qid"), col("_q")),
          col(idCol) === col("_qid"))
        .join(base.select(col(idCol).as("nb"), col("_q").as("_qb")), Seq("nb"))
        .select(col(idCol), col("nb"),
          Similarity.dotLong(col("_q"), col("_qb")).as("score"))
      val w2 = org.apache.spark.sql.expressions.Window
        .partitionBy(col(idCol)).orderBy(col("score").desc, col("nb"))
      exact.withColumn("rank", row_number().over(w2)).filter(col("rank") <= k)
    }
  }
}
