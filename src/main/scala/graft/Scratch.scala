package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway investigation main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = Seq("q23_minhash", "q24_lsh_jaccard", "q25_knn", "q60_simhash",
      "q61_cosine_lsh", "q66_pipeline", "q70_lsh_topk", "q82_ivf_topk")
      .filter(SparkEntry.queries.contains)

    // interleaved A/B: alternate the toggle each iteration so JIT/codegen
    // warm-up affects both modes equally; report medians of the last 8
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val on = scala.collection.mutable.ArrayBuffer[Double]()
      val off = scala.collection.mutable.ArrayBuffer[Double]()
      (1 to 12).foreach { i =>
        val enable = i % 2 == 0
        spark.conf.set(graft.core.Sizing.FanoutKey,
          if (enable) (256L << 20).toString else "0")
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        if (i > 4) (if (enable) on else off) += dt
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"[scratch] $name: off=${med(off.toSeq)}%.2f on=${med(on.toSeq)}%.2f")
    }
    spark.stop()
  }
}
