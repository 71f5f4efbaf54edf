package graft

import org.apache.spark.sql.SparkSession

/** Per-run unique catalog databases for tests that write managed
  * tables: a fresh (forked) JVM's metastore does not know about a
  * previous run's tables, so `saveAsTable` is a CREATE — which Spark
  * rejects when the managed LOCATION still exists on disk. Same
  * pattern as SparkEntry.perRunDb: sweep the prefix's STALE leftovers
  * (untouched >= 10 min, so a concurrently-running shard's live
  * warehouse is never deleted), then mint a unique db. */
object TestDbs {
  def perRun(spark: SparkSession, prefix: String): String = {
    val staleBefore = System.currentTimeMillis() - 10 * 60 * 1000
    for (old <- Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
           if old.getName.startsWith(prefix) && old.isDirectory &&
             old.lastModified() < staleBefore) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(old)
    }
    val db = s"$prefix${System.nanoTime}"
    spark.sql(s"CREATE DATABASE $db LOCATION '/tmp/${db}_warehouse'")
    db
  }
}
