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

  /** Top-level key names of a CORRECTNESS_r{N}.json dump: the strings at
    * brace depth 1 followed by ':'. A real JSON parse is overkill for a
    * warn-only diff, but nested keys ("rows_match", …) must not leak in,
    * so this is a depth-aware scan, not a regex.
    */
  private[graft] def correctnessKeys(json: String): Set[String] = {
    val out = scala.collection.mutable.Set[String]()
    var depth = 0; var i = 0
    while (i < json.length) {
      val c = json(i)
      if (c == '{' || c == '[') { depth += 1; i += 1 }
      else if (c == '}' || c == ']') { depth -= 1; i += 1 }
      else if (c == '"') {
        val start = i + 1
        var j = start
        while (j < json.length && json(j) != '"') {
          if (json(j) == '\\') j += 1
          j += 1
        }
        val key = json.substring(start, math.min(j, json.length))
        var k = j + 1
        while (k < json.length && json(k).isWhitespace) k += 1
        if (depth == 1 && k < json.length && json(k) == ':') out += key
        i = j + 1
      } else i += 1
    }
    out.toSet
  }

  /** Round-7 lesson, automated: queries present in the PREVIOUS round's
    * driver correctness file but absent from the current registry. A
    * rename or a data-vintage regression makes queries VANISH silently
    * (absent ≠ failed in the driver's report) — this is the warning that
    * round 7 lacked.
    */
  private[graft] def vanishedQueries(prev: Set[String],
                                     current: Set[String]): Set[String] =
    prev -- current

  /** Newest CORRECTNESS_r{N}.json under `dir` (by round number), if any. */
  private[graft] def latestCorrectnessFile(dir: java.io.File): Option[java.io.File] = {
    val re = raw"CORRECTNESS_r(\d+)\.json".r
    Option(dir.listFiles()).getOrElse(Array.empty).flatMap { f =>
      f.getName match {
        case re(n) => Some((n.toInt, f))
        case _     => None
      }
    }.sortBy(-_._1).headOption.map(_._2)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: Verify <sfDir> <outDir> [query...]")
    val sfDir = args(0); val outDir = args(1)
    // Oracle type-discipline gate (the round-10 HUGEINT lesson): an
    // uncast windowed sum must never reach the driver's type-sensitive
    // hash — fail the whole dump loudly before writing anything.
    val lintHits = OracleLint.violations(SparkEntry.oracleSql)
    require(lintHits.isEmpty,
      s"oracle type lint: ${lintHits.size} uncast windowed sum(s):\n" +
        lintHits.mkString("\n"))
    // Query-set regression watch: warn when a query registered in the
    // previous round's driver run is gone from the current registry.
    latestCorrectnessFile(new java.io.File(".")).foreach { f =>
      val prev = correctnessKeys(Files.readString(f.toPath))
      val gone = vanishedQueries(prev, SparkEntry.queries.keySet)
      if (gone.nonEmpty)
        System.err.println(s"[verify] WARNING: ${gone.size} quer(ies) in " +
          s"${f.getName} are no longer registered: " +
          gone.toSeq.sorted.mkString(", "))
    }
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
