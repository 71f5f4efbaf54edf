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
    import graft.ml.Dedup

    def time(label: String)(body: => Long): Unit = {
      (1 to 4).foreach { _ =>
        val t0 = System.nanoTime()
        val n = body
        println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
      }
    }

    def stream(label: String, repart: Boolean): Unit =
      time(s"q92-shape repart=$repart") {
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try {
          val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
          val src0 = spark.readStream.schema(schema).parquet(s"$sfDir/documents.parq*")
          val src = if (repart) src0.repartition(32) else src0
          val sig = Dedup.minhashSignature(src, "text", "doc_id", 4, 3)
            .withColumn("_et", timestamp_seconds(lit(1700000000L) +
              pmod(col("doc_id"), lit(1000))))
            .withWatermark("_et", "2 hours")
            .dropDuplicatesWithinWatermark("h1", "h2", "h3", "h4")
            .select(col("h1"), col("h2"), col("h3"), col("h4"))
          val name = s"scr_${System.nanoTime}"
          val q = sig.writeStream.format("memory").queryName(name)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          spark.table(name).count()
        } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      }

    stream("base", repart = false)
    stream("repart", repart = true)
    stream("base2", repart = false)
    stream("repart2", repart = true)
    spark.stop()
  }
}
