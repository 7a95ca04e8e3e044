package graft.operators

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Generation-manifest lifecycle shared by every persisted index format
  * ([[Similarity]]'s ANN cell dirs, [[Search]]'s lexical postings):
  * numbered JSON manifests, dot-temp staged commits, and the
  * grace-window generation sweep. Format semantics — the adoption layout
  * of pre-manifest indexes, the manifest's fields, which names count as
  * data dirs, and the referenced set a sweep must retain — stay with
  * each owner; this object owns only the crash-safety-critical
  * mechanics, so a commit- or sweep-protocol fix lands exactly once.
  *
  * Commit protocol (the [[graft.streaming.IncrementalTrend]] pattern):
  * data dirs exist on disk BEFORE any manifest references them, and the
  * rename of the staged dot-temp onto `manifest-<seq>.json` is the
  * atomic commit point — a reader resolves either the old generation or
  * the new one, never a torn index. Writers are SINGLE-WRITER by
  * contract; [[commit]] refuses an already-existing destination so a
  * same-generation race fails loudly even on posix-like filesystems
  * (where a bare rename silently REPLACES the winner's manifest — HDFS
  * rename fails instead). The check-then-rename is not atomic, so this
  * is a backstop, not a license to run concurrent writers.
  */
private[graft] object GenManifest {

  val ManifestRe = """manifest-(\d{10})\.json""".r
  def manifestName(seq: Long): String = f"manifest-$seq%010d.json"

  def fsRoot(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val root = new Path(dir)
    (root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  /** Recursively delete an index root before a full rebuild — ONE
    * implementation for every index family (lex, ANN, exact-dedup), so
    * a future reset-protocol change (trash-instead-of-delete, extra
    * validation) lands exactly once — the same single-definition rule
    * this object exists for. Callers own validate-BEFORE-destroy: every
    * build must run its input guards before calling this.
    */
  def resetDir(spark: SparkSession, dir: String): Unit = {
    val (fs, root) = fsRoot(spark, dir)
    if (fs.exists(root)) fs.delete(root, true)
  }

  /** Highest committed generation, None when no manifest file exists
    * (callers adopt pre-manifest indexes as generation 0). */
  def latestSeq(fs: FileSystem, root: Path): Option[Long] = {
    val seqs =
      if (!fs.exists(root)) Seq.empty[Long]
      else fs.listStatus(root).toSeq.map(_.getPath.getName).collect {
        case ManifestRe(d) => d.toLong
      }
    if (seqs.isEmpty) None else Some(seqs.max)
  }

  /** The parsed manifest of a SPECIFIC generation, None when its file is
    * absent — gen 0 of an adopted index is synthesized by the caller,
    * never on disk. */
  def readNode(fs: FileSystem, root: Path, seq: Long): Option[JsonNode] = {
    val p = new Path(root, manifestName(seq))
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new ObjectMapper().readTree(in)) finally in.close()
    }
  }

  def newNode(): ObjectNode = new ObjectMapper().createObjectNode()

  /** Decode a manifest's OPTIONAL `tdirs` node — ONE definition for
    * every tombstone family (this was five near-verbatim copies, the
    * exact drift class this object exists to prevent). Absent = a
    * pre-retraction manifest, tombstone-free by construction; a
    * PRESENT node decoding to nothing (empty array, or a scalar whose
    * elements() iterator is empty) is DAMAGE — unrepresentable from any
    * committer — and reading it as tombstone-free would silently
    * RESURRECT retracted content, strictly worse than a crash. `what`
    * names the manifest for the diagnostic (e.g. "manifest generation
    * 3 under /idx").
    */
  def readTDirs(node: JsonNode, what: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val t = Option(node.get("tdirs"))
      .map(_.elements().asScala.map(_.asText()).toSeq)
    if (t.exists(_.isEmpty))
      throw new IllegalStateException(
        s"$what carries an empty/scalar tdirs node — damaged manifest; " +
          "reading it as tombstone-free would resurrect retracted content")
    t.getOrElse(Nil)
  }

  /** Integer meta/config fields carried IN the manifest (r18 serve-path
    * fusion): a serve already reads the manifest driver-side to resolve
    * the layout, so carrying the index geometry/stats in the SAME node
    * removes the 1-row meta/stats parquet read — one whole Spark job —
    * from every serve. The parquet meta table stays the at-rest source
    * of truth and the fallback for manifests written before these
    * fields existed AND for adopted gen-0 indexes with no manifest at
    * all (readers must treat [[metaVals]] = None as "read the parquet").
    */
  def putMetaVals(node: ObjectNode, fields: (String, Long)*): Unit = {
    val m = node.putObject("metaVals")
    fields.foreach { case (k, v) => m.put(k, v) }
  }

  /** The manifest-carried meta fields, None when the node predates them.
    * A PRESENT-but-malformed node fails loudly (the readTDirs damage
    * rule): silently falling back to a parquet meta that a later commit
    * may have rolled past would serve a stale geometry.
    */
  def metaVals(node: JsonNode): Option[Map[String, Long]] =
    Option(node.get("metaVals")).map { m =>
      import scala.jdk.CollectionConverters._
      if (!m.isObject)
        throw new IllegalStateException(
          "manifest metaVals node is not an object — damaged manifest")
      m.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
    }

  /** Stage `node` to a dot-temp, then rename onto the numbered manifest —
    * the atomic commit point. Fails loudly if the destination already
    * exists (single-writer contract violated) or the rename is refused;
    * the orphaned data dir of an aborted commit is overwritten by the
    * next attempt at this generation. */
  def commit(spark: SparkSession, dir: String, seq: Long,
      node: ObjectNode): Unit = {
    val (fs, root) = fsRoot(spark, dir)
    // Destination check BEFORE staging: strictly cheaper, shrinks the
    // race window, and the abort path leaves no orphan dot-temp behind
    // (the aborted pipeline won't run the sweep that would collect it).
    val dst = new Path(root, manifestName(seq))
    if (fs.exists(dst))
      throw new IllegalStateException(
        s"manifest commit failed: $dst already exists — concurrent " +
          "writer? (appends/compactions are single-writer)")
    val tmp = new Path(root,
      s".manifest-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, false)
    try out.write(new ObjectMapper().writeValueAsBytes(node))
    finally out.close()
    if (!fs.rename(tmp, dst)) {
      try fs.delete(tmp, false)
      catch { case scala.util.control.NonFatal(_) => () }
      throw new IllegalStateException(
        s"manifest commit failed: rename $tmp -> $dst")
    }
  }

  /** Grace-window sweep after a durable commit at `current`: deletes
    * manifests older than `current - 1`, crashed dot-temp stages, and
    * every name `isDataDir` admits that `referenced` — the union of the
    * current and predecessor generations' dirs, computed by the owner —
    * does not contain. Retaining the predecessor gives an in-flight
    * reader of the previous generation one further commit of grace
    * (the IncrementalTrend RetainedGenerations=2 policy). `isDataDir`
    * must positive-match ONLY sweepable data-dir names, so index
    * metadata can never be deleted by a bug in the referenced-set
    * arithmetic.
    *
    * BEST-EFFORT: runs after the commit is durable — a failure here must
    * never surface as an operation failure, because the natural caller
    * response (retry the append) would encode the SAME delta under a new
    * generation and duplicate every row. Leftovers are unreferenced and
    * the next commit's sweep collects them. Idempotent; safe to run
    * standalone (e.g. a no-op compaction still sweeping old garbage).
    */
  def sweep(spark: SparkSession, dir: String, current: Long,
      referenced: Set[String], isDataDir: String => Boolean): Unit =
    try {
      val (fs, root) = fsRoot(spark, dir)
      fs.listStatus(root).foreach { st =>
        st.getPath.getName match {
          case ManifestRe(d) if d.toLong < current - 1 =>
            fs.delete(st.getPath, false)
          case n if n.startsWith(".manifest-") =>
            fs.delete(st.getPath, false)
          case n if isDataDir(n) && !referenced.contains(n) =>
            fs.delete(st.getPath, true)
          case _ => ()
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[graft] generation sweep at $dir (gen $current) failed " +
            s"(commit already durable; next commit re-collects): " +
            e.getMessage)
    }

  /** The owner-side sweep scaffold every index family was copy-pasting
    * (ANN, lexical, dedup): compute the referenced set over the retained
    * generations (current and current−1 — the reader-grace window) via
    * the family's manifest decoder, skipping the sweep LOUDLY-BUT-SAFELY
    * if that read fails (the commit is already durable; a failed
    * best-effort sweep must never fail the operation or trigger a
    * retry-append that would duplicate the delta). Only the per-format
    * decoding stays with each owner.
    */
  def sweepOwned(spark: SparkSession, dir: String, current: Long,
      isDataDir: String => Boolean)(
      referencedOf: (FileSystem, Path, Long) => Seq[String]): Unit = {
    val referenced =
      try {
        val (fs, root) = fsRoot(spark, dir)
        Seq(current - 1, current).filter(_ >= 0)
          .flatMap(g => referencedOf(fs, root, g))
          .filter(_.nonEmpty).toSet
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft] generation sweep at $dir " +
            s"skipped (referenced-set read failed; index remains " +
            s"correct): ${e.getMessage}")
          return
      }
    sweep(spark, dir, current, referenced, isDataDir)
  }

  // ---- retraction kernels (shared by the doc-keyed tombstone families:
  // DedupIndex + MediaIndex; ExactDedupIndex keeps its hash-keyed
  // resolveMembers, which aggregates per hash rather than per row) ------

  /** The generation number a data dir's rows belong to — encoded in the
    * dir name (an unsuffixed build dir is generation 0; "-<seq>" names
    * carry their commit's seq). Manifest seqs are allocated once each,
    * so insert rows and a tombstone for one key can never tie; a
    * compact fold re-stamps surviving rows at its own (higher) seq
    * AFTER purging tombstones, which preserves the newest-op-wins
    * order.
    */
  def genOf(dirName: String): Long =
    dirName.lastIndexOf('-') match {
      case -1 => 0L
      case i  => dirName.substring(i + 1).toLong
    }

  /** Generation read with the generation number attached as `__g`.
    * Scratch-name guard (the Skew.requireScratchFree convention): a
    * generation table that ever grows a `__g` column would be silently
    * REPLACED by withColumn and the liveness filter would consume the
    * wrong values.
    */
  def readWithGen(spark: SparkSession, dir: String,
      dirs: Seq[String]): org.apache.spark.sql.DataFrame =
    dirs.map { d =>
      val t = spark.read.parquet(s"$dir/$d")
      Skew.requireScratchFree(t, Seq("__g"),
        "generation read (retraction scratch)")
      t.withColumn("__g", org.apache.spark.sql.functions.lit(genOf(d)))
    }.reduce(_.unionByName(_))

  /** Per-key newest tombstone generation `(keyCol, __tg)` — takedown-
    * sized by contract (compact folds it away), hence broadcast at
    * every use.
    */
  def tombMax(spark: SparkSession, dir: String, tDirs: Seq[String],
      keyCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, max}
    readWithGen(spark, dir, tDirs)
      .groupBy(col(keyCol)).agg(max(col("__g")).as("__tg"))
  }

  /** Liveness filter over generation rows carrying `__g`: a key's row
    * is live iff its insert generation outlives the key's newest
    * tombstone (re-ingest after takedown restores membership). `tm` is
    * the [[tombMax]] table for the SAME `keyCol`.
    */
  def liveRows(rows: org.apache.spark.sql.DataFrame, keyCol: String,
      tm: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    Skew.requireScratchFree(rows, Seq("__tid", "__tg"),
      "liveness resolution (retraction scratch)")
    rows.join(broadcast(tm.withColumnRenamed(keyCol, "__tid")),
        col(keyCol) === col("__tid"), "left")
      .filter(col("__tg").isNull || col("__g") > col("__tg"))
      .drop("__tid", "__tg", "__g")
  }

  /** The cross-generation union read every family's consumers share —
    * ONE place for any future per-generation schema handling, now for
    * EVERY family at once (each had its own verbatim copy).
    */
  def readGenerations(spark: SparkSession, dir: String,
      dirs: Seq[String]): org.apache.spark.sql.DataFrame =
    dirs.map(d => spark.read.parquet(s"$dir/$d"))
      .reduce(_.unionByName(_))

  /** The ONE liveness fold for a doc-/key-keyed tombstone family: a
    * bare generation read when tombstone-free (the common case — plan
    * unchanged), the newest-op-wins resolution otherwise. Family
    * wrappers delegate here so the fold can never drift between the
    * dedup and media families (it was a hand-synced pair).
    */
  def foldedLive(spark: SparkSession, dir: String, dirs: Seq[String],
      tDirs: Seq[String], keyCol: String): org.apache.spark.sql.DataFrame =
    if (tDirs.isEmpty) readGenerations(spark, dir, dirs)
    else liveRows(readWithGen(spark, dir, dirs), keyCol,
      tombMax(spark, dir, tDirs, keyCol))

  /** The partition-pruned read with retraction applied — the serve-path
    * kernel: the literal `IN` filter is applied BEFORE the liveness
    * join so every generation scan still prunes (plan-locked per
    * family); the tombstone-free index takes the bare pruned read and
    * its plan is unchanged.
    */
  def readPrunedLive(spark: SparkSession, dir: String, dirs: Seq[String],
      partCol: String, keys: Seq[Long], tDirs: Seq[String],
      keyCol: String,
      tm: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    if (tDirs.isEmpty)
      readGenerations(spark, dir, dirs).filter(col(partCol).isin(keys: _*))
    else liveRows(
      readWithGen(spark, dir, dirs).filter(col(partCol).isin(keys: _*)),
      // A serve with SEVERAL pruned reads passes its one materialized
      // tombMax (r18 fusion) instead of rebuilding + re-broadcasting
      // the takedown table per read.
      keyCol, tm.getOrElse(tombMax(spark, dir, tDirs, keyCol)))
  }

  /** Liveness CLASSIFICATION over rows carrying a generation column —
    * the newest-insert-outlives-newest-tombstone rule as an appended
    * `__live` flag instead of [[liveRows]]' filter, for the reports
    * that must SEE dead rows ([[takedownCensus]], the ANN
    * takedown-health's per-cell split). `genCol` names the insert-
    * generation column ("__g" for raw [[readWithGen]] rows, a per-key
    * max for pre-folded frames); `tm` is the [[tombMax]] table for the
    * SAME `keyCol`, broadcast here like every takedown-sized join.
    */
  def classifyLiveness(rows: org.apache.spark.sql.DataFrame,
      keyCol: String, genCol: String,
      tm: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    Skew.requireScratchFree(rows, Seq("__tid", "__tg", "__live"),
      "liveness classification (retraction scratch)")
    rows.join(broadcast(tm.withColumnRenamed(keyCol, "__tid")),
        col(keyCol) === col("__tid"), "left")
      .withColumn("__live",
        col("__tg").isNull || col(genCol) > col("__tg"))
      .drop("__tid", "__tg")
  }

  /** Takedown-pressure census over a tombstone family's at-rest keys —
    * ONE row (`liveName`, `deadName`, dead_ppm): how many distinct keys
    * are live vs tombstoned (dead keys still occupy files and inflate
    * every scan until the family's compact purges them), with the dead
    * share in exact integer parts-per-million. The key-level liveness
    * rule is the same newest-insert-outlives-newest-tombstone
    * resolution [[liveRows]] applies per row — here folded per KEY
    * (max insert generation vs the key's newest tombstone), the
    * StatsIndex `neg_cells` analog for the doc-/hash-keyed families.
    * Tombstone-free indexes report all-live with zero extra work (no
    * join is planned at all).
    */
  def takedownCensus(spark: SparkSession, dir: String, dirs: Seq[String],
      tDirs: Seq[String], keyCol: String, liveName: String,
      deadName: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    // The output names never reach SQL text: the arithmetic runs over
    // FIXED internal names and the caller's names attach by rename — a
    // name needing quoting (or spelling an expression) can't silently
    // change the census arithmetic. Scratch guard like every __-kernel.
    require(!liveName.startsWith("__") && !deadName.startsWith("__") &&
        liveName != deadName &&
        liveName != "dead_ppm" && deadName != "dead_ppm",
      s"takedownCensus output names collide with kernel scratch or the " +
        s"fixed dead_ppm column: ($liveName, $deadName)")
    val perKey = readWithGen(spark, dir, dirs)
      .groupBy(col(keyCol)).agg(max(col("__g")).as("__mg"))
    val classified =
      if (tDirs.isEmpty) perKey.withColumn("__live", lit(true))
      else classifyLiveness(perKey, keyCol, "__mg",
        tombMax(spark, dir, tDirs, keyCol))
    classified.agg(
        coalesce(sum(when(col("__live"), lit(1L)).otherwise(lit(0L))),
          lit(0L)).as("__lv"),
        coalesce(sum(when(col("__live"), lit(0L)).otherwise(lit(1L))),
          lit(0L)).as("__dd"))
      .selectExpr("__lv", "__dd",
        // Every family's build refuses an empty index, so the zero-total
        // arm is defensive (ANSI would otherwise raise DIVIDE_BY_ZERO
        // on a damaged dir instead of reporting).
        "CAST(CASE WHEN __lv + __dd = 0 THEN 0 " +
          "ELSE (__dd * 1000000) DIV (__lv + __dd) " +
          "END AS BIGINT) AS dead_ppm")
      .withColumnRenamed("__lv", liveName)
      .withColumnRenamed("__dd", deadName)
  }
}
