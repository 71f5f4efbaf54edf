package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump physical plans of selected queries for plan-quality
  * review (pushdown, broadcast, codegen spans, shuffle count). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q03_merge", "q14_join", "q16_count", "q20_setunion")
    for (n <- names) {
      println(s"\n======================= $n =======================")
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      println(plan.linesIterator.take(60).mkString("\n"))
      val s = plan
      println(f"[plan-stats] exchanges=${"Exchange".r.findAllIn(s).size} " +
        f"sorts=${"Sort ".r.findAllIn(s).size} " +
        f"bhj=${"BroadcastHashJoin".r.findAllIn(s).size} " +
        f"smj=${"SortMergeJoin".r.findAllIn(s).size} " +
        f"wholestage=${"WholeStageCodegen".r.findAllIn(s).size}")
    }
    spark.stop()
  }
}
