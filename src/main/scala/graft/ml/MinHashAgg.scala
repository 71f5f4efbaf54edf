package graft.ml

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** MinHash signature as a custom typed AGGREGATE function (the
  * Aggregator/TypedImperativeAggregate pattern from the Spark guide —
  * SURVEY.md §7.2.8): one pass over a group's shingles builds the
  * k-element signature with a tiny mutable buffer and an associative
  * merge, so the signature computation gets map-side partial
  * aggregation instead of materializing per-shingle rows into k
  * separate min() aggregates.
  *
  * Hash family matches Dedup.minhashSignature exactly: element i is the
  * lexicographic min of md5 hex of (seed-prefix i+1) ++ shingle — so
  * signatures are interchangeable between the two implementations (and
  * with the DuckDB oracle).
  */
class MinHashAgg(numHashes: Int)
    extends Aggregator[String, Array[String], Seq[String]] {

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  override def zero: Array[String] = Array.fill(numHashes)(null)

  override def reduce(buf: Array[String], shingle: String): Array[String] = {
    if (shingle != null) {
      var i = 0
      while (i < numHashes) {
        val h = md5Hex((i + 1).toString + shingle)
        if (buf(i) == null || h.compareTo(buf(i)) < 0) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < numHashes) {
      if (a(i) == null || (b(i) != null && b(i).compareTo(a(i)) < 0)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[String]): Seq[String] = buf.toSeq

  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object MinHashAgg {
  /** Column form: minhash(shingleCol) -> array<string> signature. */
  def minhash(shingleCol: Column, numHashes: Int = 4): Column =
    udaf(new MinHashAgg(numHashes), Encoders.STRING).apply(shingleCol)
}
