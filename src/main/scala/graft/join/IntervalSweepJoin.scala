package graft.join

import graft.core.Cols
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Sort-merge interval join (SURVEY.md §4.3 option (c) — the alternative
  * physical strategy to the binned join for the long-interval / deep-
  * overlap regime).
  *
  * Both sides are co-partitioned by group key and sorted by sweep
  * position once; a single forward plane-sweep per partition maintains
  * the active interval set of each side and emits every overlapping pair
  * exactly once. Cost: one shuffle + sort per side and O(pairs) emission;
  * memory: the maximum concurrent overlap depth (active sets), not the
  * partition size. Compared to the binned join it never explodes rows
  * (no fan-out for long intervals) and needs no bin-width tuning; the
  * binned join wins when overlap depth is huge but pair output is
  * filtered downstream. Both produce identical pair sets (property-
  * tested) — pick per workload.
  *
  * Mirrors the reference's ruranges sort-sweep kernel semantics
  * (reference methods/overlap.py:20-47): `slack` extends the LEFT side
  * for matching only.
  */
object IntervalSweepJoin {
  import Cols.{Start, End}

  def pairs(left: DataFrame, right: DataFrame, keys: Seq[String],
            slack: Long = 0, suffix: String = "_b"): DataFrame = {
    val r0 = RangeJoin.suffixRight(left, right, suffix)
    val rKeys = keys.map(_ + suffix)
    val rs = Start + suffix
    val re = End + suffix
    val rOut = r0.columns.filterNot(rKeys.contains)

    // \u0001-separated tuple key with a null sentinel: concat_ws silently
    // skips nulls, which would conflate ("a", null) with ("a")
    def tupleKey(cs: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
      concat_ws("\u0001", cs.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*)
    val key = tupleKey(keys.map(col))
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(rOut.map(col): _*)
    val lSchema = left.schema
    val rSchema = StructType(rOut.map(c => r0.schema(c)))

    val lTag = left.select(key.as("_k"), (col(Start) - slack).as("_pos"),
      lit(0).as("_side"), lStruct.as("_l"),
      lit(null).cast(rSchema).as("_r"))
    val rTag = r0.select(tupleKey(rKeys.map(col)).as("_k"),
      col(rs).as("_pos"), lit(1).as("_side"),
      lit(null).cast(lSchema).as("_l"), rStruct.as("_r"))
    val u = lTag.unionByName(rTag)
    val sorted = u.repartition(col("_k"))
      .sortWithinPartitions(col("_k"), col("_pos"), col("_side"))

    val lStartIdx = lSchema.fieldIndex(Start)
    val lEndIdx = lSchema.fieldIndex(End)
    val rStartIdx = rSchema.fieldIndex(rs)
    val rEndIdx = rSchema.fieldIndex(re)
    val outSchema = StructType((lSchema.fields ++ rSchema.fields)
      .map(f => StructField(f.name, f.dataType, nullable = true)))

    sorted.mapPartitions { it =>
      var curKey: String = null
      val activeL = new scala.collection.mutable.ArrayBuffer[Row]()
      val activeR = new scala.collection.mutable.ArrayBuffer[Row]()
      def evict(buf: scala.collection.mutable.ArrayBuffer[Row], pos: Long,
                endOf: Row => Long): Unit = {
        var i = 0
        while (i < buf.length) {
          if (endOf(buf(i)) <= pos) { buf.remove(i) } else i += 1
        }
      }
      it.flatMap { row =>
        val k = row.getString(0)
        if (k != curKey) { curKey = k; activeL.clear(); activeR.clear() }
        val pos = row.getLong(1)
        evict(activeR, pos, r => r.getLong(rEndIdx))
        evict(activeL, pos, l => l.getLong(lEndIdx) + slack)
        if (row.getInt(2) == 0) { // left row
          val l = row.getStruct(3)
          activeL += l
          activeR.iterator.map(r => Row.fromSeq(l.toSeq ++ r.toSeq))
        } else { // right row
          val r = row.getStruct(4)
          activeR += r
          activeL.iterator.map(l => Row.fromSeq(l.toSeq ++ r.toSeq)).toList
        }
      }
    }(Encoders.row(outSchema))
  }
}
