package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted physical plan for selected
  * queries so scan pushdown (PushedFilters/ReadSchema), join strategies
  * (broadcast vs sort-merge), whole-stage codegen spans, and top-k
  * (TakeOrderedAndProject) can be eyeballed and regression-checked.
  * Usage: runMain graft.Plans [sfDir] [query...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val which = if (args.length > 1) args.tail.toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (name, _) => which.isEmpty || which(name) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        // NonFatal ONLY (the Verify/Bench rule): swallowing an OOM or
        // LinkageError and iterating a corrupted JVM prints plans that
        // may be silently wrong.
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case scala.util.control.NonFatal(e) =>
          println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
