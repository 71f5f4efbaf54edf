package graft

import graft.core.Cols
import graft.ops.Coverage
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary profiling harness (not part of the library surface).
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import Cols._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val g = Tables.gr(spark, dir)
    val g2 = Tables.gr2(spark, dir)
    time("warmup")(g.count() + g2.count())
    time("rleBinary plain")(Coverage.rleBinary(g, g2, Seq(Chrom)).count())
    time("rleBinary salt64k")(Coverage.rleBinarySalted(g, g2, Seq(Chrom), saltBin = 65536).count())
    time("rleBinary salt16k")(Coverage.rleBinarySalted(g, g2, Seq(Chrom), saltBin = 16384).count())
    time("rle plain")(Coverage.toRle(g, Seq(Chrom), None, "score").count())
    time("rle salt64k")(Coverage.toRleSalted(g, Seq(Chrom), None, "score", saltBin = 65536).count())
    // events-only / window-only bisect for rleBinary
    val k = Seq(col(Chrom))
    def events(df: org.apache.spark.sql.DataFrame, dA: Long, dB: Long) =
      df.select(k :+ explode(array(
          struct(col(Start).as("_pos"), lit(dA).as("_da"), lit(dB).as("_db")),
          struct(col(End).as("_pos"), lit(-dA).as("_da"), lit(-dB).as("_db")))).as("_ev"): _*)
        .select(k ++ Seq(col("_ev._pos").as("_pos"), col("_ev._da").as("_da"),
          col("_ev._db").as("_db")): _*)
    val ev = events(g, 1, 0).unionByName(events(g2, 0, 1))
      .groupBy(k :+ col("_pos"): _*)
      .agg(sum(col("_da")).as("_da"), sum(col("_db")).as("_db"))
    time("rleBinary ev only")(ev.count())
    spark.stop()
  }
}
