package graft.examples

import org.apache.spark.sql.SparkSession

/** Shared temp-index-dir tracking for the runnable tours
  * ([[TakedownTour]], [[SyncTour]]): every dir handed out by the
  * tracked factory is deleted in a finally — the smoke specs drive the
  * tours inside the suite, and without cleanup repeated test runs
  * accumulate orphan index dirs under the system temp root. One
  * definition (the two tours used to carry verbatim copies — the next
  * cleanup fix must land once).
  */
private[examples] object ExampleTmp {

  def withTrackedTempDirs[A](spark: SparkSession, logPrefix: String)(
      body: (String => String) => A): A = {
    val created = scala.collection.mutable.Buffer.empty[String]
    def tracked(prefix: String): String = {
      val d = java.nio.file.Files.createTempDirectory(prefix).toString
      created += d
      d
    }
    def deleteQuiet(path: String): Unit =
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[$logPrefix] temp index cleanup of $path failed: $e")
      }
    try body(tracked)
    finally created.foreach(deleteQuiet)
  }
}
