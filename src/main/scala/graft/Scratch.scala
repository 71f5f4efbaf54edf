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
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        val n = body
        println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
      }
    }

    // (a) batch equivalent of q92's compute: minhash + distinct
    time("batch minhash+distinct") {
      val src = spark.read.parquet(s"$sfDir/documents.parquet")
      Dedup.minhashSignature(src, "text", "doc_id", 4, 3)
        .select("h1", "h2", "h3", "h4").distinct().count()
    }

    // (b..d) streaming variants
    def stream(label: String, parts: Int, provider: Option[String]): Unit =
      time(s"stream parts=$parts provider=${provider.getOrElse("default")}") {
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        provider.foreach(p => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p))
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        try {
          val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
          val src = spark.readStream.schema(schema).parquet(s"$sfDir/documents.parq*")
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

    stream("default", 4, None)
    stream("default", 1, None)
    stream("default", 32, None)
    stream("rocksdb", 4,
      Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))

    // (e) where does stream setup time go? run an EMPTY passthrough stream
    time("stream passthrough noop (no state)") {
      val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
      val src = spark.readStream.schema(schema).parquet(s"$sfDir/documents.parq*")
      val name = s"scr_${System.nanoTime}"
      val q = src.select(col("doc_id")).writeStream.format("memory")
        .queryName(name).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(name).count()
    }

    spark.stop()
  }
}
