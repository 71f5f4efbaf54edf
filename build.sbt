ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pyranges_1xspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32 executor threads of string-heavy codegen in one JVM need heap
  // headroom: 8g showed GC-driven 2-3x per-query variance across a full
  // bench suite (e.g. 2.7s isolated vs 7.4s in-suite); 24g removes it.
  // The host grants 128 GiB; override with SPARK_DRIVER_MEM if smaller.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++ sys.env.get("SPARK_GRAFT_BINSIZE")
  .map(b => s"-Dspark.graft.join.binSize=$b").toSeq ++
  // Throughput GC for the single-JVM batch workload: interleaved full-
  // suite A/B at 24g/32 threads measured ParallelGC 121.1/126.8 s vs G1
  // 138.7 s (~10% — G1's pause-time goal buys nothing in a batch bench).
  // Override with SPARK_GRAFT_GC=G1 (or any -XX:+Use<x>GC name).
  Seq(s"-XX:+Use${sys.env.getOrElse("SPARK_GRAFT_GC", "Parallel")}GC")
