package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.util.control.NonFatal
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    // A surviving stale dump defeats the cleanup's whole purpose: the
    // driver's DuckDB compare would validate LAST run's data for a
    // now-broken query — warn loudly instead of ignoring the result.
    if (!f.delete() && f.exists())
      System.err.println(s"[verify] WARNING: could not delete stale $f " +
        "— a previous run's dump may survive under it")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    // Optional extra args: run only the named queries (local iteration;
    // the driver's two-arg invocation is unchanged and runs everything).
    // A misspelled name must fail loudly — a silently-empty filter would
    // report success while writing nothing (or leave a stale dump).
    val only = args.drop(2).toSet
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      // NonFatal only: an OOM/interrupt must surface, not leave the JVM
      // corrupted mid-suite (same rationale as Bench's timed loop).
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case NonFatal(e) =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // A failure BEFORE the write never touched the dir — delete any
        // previous run's dump so the compare can't silently validate
        // stale data for a now-broken query.
        deleteRecursively(new java.io.File(s"$outDir/$name"))
      }
    }
    def q(s: String): String = Json.quote(s) // shared escaper (graft.Json)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
