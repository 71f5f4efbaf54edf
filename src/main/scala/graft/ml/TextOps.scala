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

  /** Count of tokens found in `vocab` (stopword / wordlist hits). */
  def wordlistHits(text: Column, vocab: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(vocab.map(lit): _*)))

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
             wordlists: Map[String, Seq[String]] = defaultWordlists): Column = {
    val scored = wordlists.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(wordlistHits(text, words).as("hits"), lit(lang).as("lang"))
    }
    // max(struct(hits, lang)): highest hits, ties -> lexicographically
    // last language code; "und" (undetermined) when nothing hits.
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  /** Quality-scoring stats (length / punct / stopword ratios, reference-
    * style heuristics, integer-valued for exact cross-engine compare). */
  def qualityStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_chars2", length(t))
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_distinct_tokens", size(array_distinct(tokens(t))))
      .withColumn("n_spaces", length(t) - length(regexp_replace(t, " ", "")))
      .withColumn("mean_token_len_x100",
        floor(length(regexp_replace(t, "\\s", "")).cast("double") * 100 /
          tokenCount(t)).cast("long"))
      .withColumn("distinct_ratio_x100",
        floor(size(array_distinct(tokens(t))).cast("double") * 100 /
          tokenCount(t)).cast("long"))
  }

  /** Document fingerprint: minimum md5 over k-word shingles (a 1-
    * permutation MinHash; equal fingerprints => likely near-dups).
    * Rolling-hash flavored alternative to full MinHash signatures. */
  def fingerprint(text: Column, k: Int = 3): Column =
    array_min(transform(wordShingles(text, k), s => md5(s)))
}
