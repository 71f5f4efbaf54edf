package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, quality stats, language-ID heuristic,
  * document fingerprinting. All pure codegen'd column expressions — no
  * UDFs — so they run at full whole-stage-codegen speed over 100 TB and
  * are expressible 1:1 in the DuckDB oracle.
  */
object TextOps {

  /** Whitespace tokens (the baseline tokenizer; a BPE-ish regex variant
    * below). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-ish token count: words + digit runs + punctuation
    * as separate tokens (approximation of byte-pair pretokenization). */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
      t => length(t) > 0))

  /** k-word shingles, space-joined; empty array when fewer than k words
    * (guarding Spark's descending-sequence pitfall).
    *
    * Shape matters: a naive `transform(sequence(1, n-k+1), i ->
    * concat_ws(slice(w, i, k)))` re-evaluates the tokenizing `split`
    * inside the lambda once PER SHINGLE (interpreted higher-order
    * functions don't cache subexpressions) — O(words²) regex work per
    * document. Zipping k shifted slices instead evaluates the split k+1
    * times per row and the lambda touches only its own variable. */
  def wordShingles(text: Column, k: Int): Column = {
    val w = tokens(text)
    val n = size(w) - (k - 1)
    val shifted = (0 until k).map(j => slice(w, lit(j + 1), n))
    when(n >= 1,
      transform(arrays_zip(shifted: _*),
        s => concat_ws(" ", (0 until k).map(j => s.getField(j.toString)): _*)))
      .otherwise(array())
  }

  /** Re-shape flat text into `sep`-joined chunks of `k` words — the
    * paragraph-structure generator shared by the paragraph-dedup
    * queries (SparkEntry q125/q126/q131) and the MlBench paradedup
    * soak corpus. The DuckDB twin (SparkEntry `paraChunkCtes`) replays
    * the identical chunking; keep both in lockstep. */
  def paragraphChunks(text: Column, k: Int, sep: String = "\n"): Column = {
    val ws = split(trim(text), "\\s+")
    concat_ws(sep,
      transform(sequence(lit(0), ceil(size(ws) / lit(k.toDouble)).cast("int") - 1),
        i => array_join(slice(ws, i * k + 1, lit(k)), " ")))
  }

  /** Count of tokens found in `vocab` (stopword / wordlist hits). */
  def wordlistHits(text: Column, vocab: Seq[String]): Column =
    wordlistHitsTokens(tokens(text), vocab)

  def wordlistHitsTokens(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => t.isin(vocab.map(lit): _*)))

  /** Language-ID heuristic: score per language = hits against that
    * language's function-word list (normalized per token), argmax wins.
    * Mirrors the reference-era n-gram heuristics; deterministic and
    * distributed (pure projection). */
  val defaultWordlists: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "que"))

  def langId(text: Column,
             wordlists: Map[String, Seq[String]] = defaultWordlists): Column =
    langIdTokens(tokens(text), wordlists)

  /** langId over a pre-tokenized array column — lets a pipeline that
    * already materialized the token array (see `qualityStatsTokens`)
    * score languages without re-running the tokenizing regex per list. */
  def langIdTokens(toks: Column,
                   wordlists: Map[String, Seq[String]] = defaultWordlists): Column = {
    val scored = wordlists.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(wordlistHitsTokens(toks, words).as("hits"), lit(lang).as("lang"))
    }
    // max(struct(hits, lang)): highest hits, ties -> lexicographically
    // last language code; "und" (undetermined) when nothing hits.
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  /** Quality-scoring stats (length / punct / stopword ratios, reference-
    * style heuristics, integer-valued for exact cross-engine compare).
    *
    * Tokenizes ONCE into a temporary array column and derives every stat
    * from it. The naive per-stat `tokens(t)` spelled the tokenizing
    * regex split ~6 times in one Project; higher-order functions are
    * interpreted (no whole-stage codegen, no subexpression elimination),
    * so each copy both re-ran the regex per row AND inflated the
    * generated/analyzed expression tree (measured: ~6 s of one-time
    * plan+codegen cost on q66's doubled tree). CollapseProject keeps the
    * barrier: it refuses to inline a non-cheap alias referenced more
    * than once. */
  def qualityStats(df: DataFrame, textCol: String = "text"): DataFrame =
    qualityStatsTokens(df.withColumn("_toks", tokens(col(textCol))), textCol)
      .drop("_toks")

  /** As `qualityStats`, but keeps/reuses the materialized `_toks` token
    * array column so downstream stages (langIdTokens, fingerprints) can
    * share the single tokenization. */
  def qualityStatsTokens(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = col("_toks")
    df.withColumn("n_chars2", length(t))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_distinct_tokens", size(array_distinct(toks)))
      .withColumn("n_spaces", length(t) - length(regexp_replace(t, " ", "")))
      .withColumn("mean_token_len_x100",
        floor(length(regexp_replace(t, "\\s", "")).cast("double") * 100 /
          size(toks)).cast("long"))
      .withColumn("distinct_ratio_x100",
        floor(size(array_distinct(toks)).cast("double") * 100 /
          size(toks)).cast("long"))
  }

  /** Corpus-frequency-class quality signal — a float-free stand-in for
    * n-gram LM perplexity (the CCNet-style filter): every `k`-gram
    * occurrence in a document is scored by the FREQUENCY CLASS
    * `floor(log2(global occurrence count of that gram))`, computed
    * exactly as `length(binary(count)) - 1` so no transcendental float
    * is involved (engine-exact, unlike a real log). Low mean class =
    * rare-heavy, "surprising" text; high = templated/boilerplate. The
    * division is left to the caller: the result carries the integer
    * `(n_grams, sum_fc, min_fc)` per document, so the oracle compare
    * and any downstream threshold stay exact.
    *
    * Scale shape: an inverted-index join — one groupBy on the gram for
    * the global counts, one join back on the gram, one groupBy on the
    * doc id. Work is proportional to the token stream; nothing is
    * collected or broadcast (the gram vocabulary shuffles). */
  def freqClassStats(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id", k: Int = 2): DataFrame = {
    val bg = docs.select(col(idCol),
      explode(wordShingles(col(textCol), k)).as("_g"))
    val counts = bg.groupBy("_g").agg(count(lit(1)).as("_cnt"))
    val fc = length(conv(col("_cnt"), 10, 2)) - 1
    bg.join(counts, "_g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(fc).cast("long").as("sum_fc"),
        min(fc).cast("long").as("min_fc"))
  }

  /** Document fingerprint: minimum md5 over k-word shingles (a 1-
    * permutation MinHash; equal fingerprints => likely near-dups).
    * Rolling-hash flavored alternative to full MinHash signatures. */
  def fingerprint(text: Column, k: Int = 3): Column =
    array_min(transform(wordShingles(text, k), s => md5(s)))

  /** Signed hashed-n-gram document embedding (the feature-hashing /
    * SimHash-style text front-end for [[SemDedup.semanticDedup]] and
    * the ANN family): each distinct n-word shingle hashes to a bucket
    * in [0, dim) and contributes a deterministic +-1, so
    * `embedding[b] = sum of signs of the shingles landing in b` —
    * near-duplicate documents share most shingles and therefore most
    * of their (signed) mass, putting same-template cosines near the
    * shared-shingle fraction and unrelated pairs near 0 (measured on
    * the 2M/8M soak corpora: same-cluster ~0.86, cross ~0,
    * BASELINE.md round14-semtext).
    *
    * Computed ENTIRELY IN-ROW by ONE fused codegen'd kernel
    * (graft.expr.HashedNgramEmbed: tokenize once, then shingle + hash
    * + accumulate per row) — zero shuffle, zero explode, linear by
    * construction at any corpus size. Two spellings were measured and
    * rejected on the way here (BASELINE.md round15-embed): the explode
    * + two-shuffled-aggs soak scaffolding went SUPERLINEAR at 8M
    * (1475.5 s vs 94.9 s at 2M — the shuffled shingle stream enters a
    * spill regime), and a pure-Column higher-order-function fold was
    * linear but paid dim x shingles INTERPRETED lambda dispatches per
    * row (695.7 s at 2M — HOFs don't codegen). The kernel is the same
    * arithmetic as both, fused: OpsSpec pins bit-equality against the
    * explode spelling for both hash variants.
    *
    * `hash="xxhash64"` (default) matches the recorded soak embeddings
    * bit-for-bit (XXH64 seed 42; sign = the "sgn" literal chained
    * through the variadic xxhash64); `hash="md5"` derives bucket and
    * sign from md5 hex digits (bucket = first 6 digits mod dim, sign =
    * digit 7's parity) so an external SQL oracle can replay every
    * component exactly (the q139 contract). Documents with fewer than
    * `n` tokens (or NULL text) embed as the zero vector. Output:
    * array<float> of integer-valued components (exact in float well
    * past any real document's shingle count). */
  def hashedNgramEmbedding(df: DataFrame, textCol: String = "text",
                           outCol: String = "embedding", n: Int = 3,
                           dim: Int = 64, distinct: Boolean = true,
                           hash: String = "xxhash64"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val md5Mode = hash match {
      case "xxhash64" => false
      case "md5" => true
      case other => throw new IllegalArgumentException(
        s"hash must be 'xxhash64' or 'md5', got '$other'")
    }
    // NULL text embeds as the zero vector (the kernel is null-safe and
    // would propagate NULL; the coalesce pins the zero-vector contract)
    df.withColumn(outCol, graft.expr.Exprs.hashed_ngram_embed(
      coalesce(tokens(col(textCol)), array().cast("array<string>")),
      n, dim, distinct, md5Mode))
  }

  /** PII patterns for curation filters, restricted to syntax Java regex
    * and RE2 (the oracle engine) interpret identically — no backrefs,
    * no lookaround: email, dotted-quad IPv4, and 13-19-digit runs
    * (card/account-shaped numbers). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val DigitRunRe = "\\d{13,19}"

  /** Non-overlapping match count of an RE2-safe pattern — pure column
    * expression (codegen'd regexp_extract_all). */
  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** Redact PII in place: email -> <EMAIL>, IPv4 -> <IP>, long digit
    * runs -> <NUM>, applied in that order (so digits inside an already-
    * redacted email are gone before the digit pass). */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      DigitRunRe, "<NUM>")

  /** Gopher-style repetition signal: per document, the multiplicity of
    * its most frequent k-word shingle and the total shingle count
    * (top_count/n_shingles is the repeated-fraction filter). Two
    * aggregations on (doc, shingle) — scales by shuffle, never per-doc
    * quadratic; documents with fewer than k words emit no row (the
    * caller left-joins and fills 0). */
  def topShingleStats(df: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", k: Int = 2): DataFrame = {
    val sh = df.select(col(idCol),
      explode(wordShingles(col(textCol), k)).as("_sh"))
    sh.groupBy(col(idCol), col("_sh")).agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol))
      .agg(max(col("_c")).as("top_count"), sum(col("_c")).as("n_shingles"))
  }
}
