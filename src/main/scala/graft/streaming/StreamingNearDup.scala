package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{Dedup, TextAnalysis}

/** Streaming twin of the MinHash+LSH near-dup pipeline
  * ([[graft.operators.Dedup.minhashNearDups]]) — the dedup stage a crawl
  * pipeline runs WITHIN its ingest horizon (exact and chunk dedup already
  * have streaming twins; this closes the near-dup gap).
  *
  * Shape: the signature/band half is the batch pipeline's column algebra
  * evaluated per ROW (materialized md5 arrays → 8 sliced minima → 4 band
  * keys — map-side, no aggregation, so it composes with a stream); the
  * candidate+verify half is ONE `flatMapGroupsWithState` keyed on the
  * (band, key) bucket. State per bucket: the docs seen within the
  * watermark horizon (id, event-time, shingle set), expired by event-time
  * timeout exactly like `dropDuplicatesWithinWatermark` expires its keys —
  * state is bounded by the horizon, never the corpus.
  *
  * Exactly-once pair emission WITHOUT a second stateful dedup operator
  * (chaining another stateful op after fgws is where Spark's support gets
  * thin): a pair colliding in several bands is emitted only by the
  * SMALLEST colliding band index — both shingle sets are in hand, so each
  * bucket recomputes the pair's band keys (deterministic md5 algebra) and
  * checks whether it is the first. The stream≡batch spec pins this Scala
  * re-derivation to the batch Column implementation.
  *
  * Jaccard is verified exactly (set intersection over the carried shingle
  * sets) with the batch path's 6-dp HALF_UP rounding, so emitted pairs
  * carry identical values to [[graft.operators.Dedup.minhashNearDups]]
  * when both docs fall inside the horizon.
  */
object StreamingNearDup {

  /** One (band, key) bucket hit for an arriving document. */
  case class BandHit(band: Int, key: String, docId: Long, tsMs: Long,
      ts: Timestamp, sset: Seq[String])

  /** A doc retained in bucket state until the watermark passes ts+delay.
    * `keys` carries the doc's 4 band keys, computed once on arrival —
    * recomputing the full MinHash signature (2 md5s per shingle) per
    * stored entry per arriving row would make the verify step quadratic
    * in bucket occupancy × shingle count.
    */
  case class BandEntry(docId: Long, tsMs: Long, sset: Seq[String],
      keys: Seq[String])

  case class NearDupPair(doc_a: Long, doc_b: Long, jaccard: Double)

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** Scala twin of the batch signature algebra (two seeded md5s per
    * shingle, each sliced into four 32-bit hex values, min per slice) —
    * MUST stay in lockstep with Dedup.signaturesFromExploded; the
    * stream≡batch spec enforces it end to end.
    */
  private[graft] def signatureOf(sset: Seq[String]): IndexedSeq[String] = {
    val ma = sset.map(s => md5Hex("a:" + s))
    val mb = sset.map(s => md5Hex("b:" + s))
    def mins(ms: Seq[String]): IndexedSeq[String] =
      (0 until 4).map(i => ms.map(_.substring(i * 8, i * 8 + 8)).min)
    (mins(ma) ++ mins(mb)).toIndexedSeq
  }

  /** Band keys from a shingle set (band b hashes signature slots 2b,2b+1
    * — same layout as Dedup.bandBucketsFromSignatures).
    */
  private[graft] def bandKeysOf(sset: Seq[String]): IndexedSeq[String] = {
    val h = signatureOf(sset)
    (0 until Dedup.Bands).map(b => md5Hex(h(2 * b) + h(2 * b + 1)))
  }

  /** Exact Jaccard with the batch path's round(·, 6): java BigDecimal
    * valueOf + HALF_UP is precisely Spark's Round implementation for
    * doubles.
    */
  private[graft] def jaccardOf(a: Seq[String], b: Seq[String]): Double = {
    val sa = a.toSet; val sb = b.toSet
    val inter = sa.intersect(sb).size
    val j = inter.toDouble / (sa.size + sb.size - inter).toDouble
    java.math.BigDecimal.valueOf(j)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  private def delayToMs(delay: String): Long = {
    val m = """(\d+)\s+(second|minute|hour|day)s?""".r
    delay.trim match {
      case m(n, unit) =>
        val base = unit match {
          case "second" => 1000L
          case "minute" => 60000L
          case "hour"   => 3600000L
          case "day"    => 86400000L
        }
        n.toLong * base
      case other =>
        throw new IllegalArgumentException(s"unparseable delay: '$other'")
    }
  }

  private def pairsFromBucket(bandIdx: Int, rows: Iterator[BandHit],
      state: GroupState[Seq[BandEntry]], delayMs: Long,
      threshold: Double): Iterator[NearDupPair] = {
    val wm = state.getCurrentWatermarkMs()
    // Horizon expiry: an entry dies once the watermark passes ts+delay —
    // the same state discipline as dropDuplicatesWithinWatermark.
    var entries = state.getOption.getOrElse(Seq.empty)
      .filter(e => e.tsMs + delayMs > wm)
    val out = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
    if (!state.hasTimedOut) {
      // Deterministic intra-batch order; later rows pair with earlier
      // ones appended below, so same-batch pairs are found too.
      for (r <- rows.toSeq.sortBy(h => (h.tsMs, h.docId))) {
        val rKeys = bandKeysOf(r.sset) // once per row, not per pair
        for (e <- entries if e.docId != r.docId) {
          // Multi-band dedup: only the smallest colliding band emits.
          val first =
            (0 until Dedup.Bands).find(b => e.keys(b) == rKeys(b))
          if (first.contains(bandIdx)) {
            val j = jaccardOf(e.sset, r.sset)
            if (j >= threshold)
              out += NearDupPair(math.min(e.docId, r.docId),
                math.max(e.docId, r.docId), j)
          }
        }
        entries = entries :+ BandEntry(r.docId, r.tsMs, r.sset, rKeys)
      }
    }
    if (entries.isEmpty) state.remove()
    else {
      state.update(entries)
      // Wake at the earliest expiry so an idle bucket still frees state.
      state.setTimeoutTimestamp(
        math.max(entries.map(_.tsMs + delayMs).min, wm + 1))
    }
    out.iterator
  }

  // ---- SimHash twin ------------------------------------------------------

  /** One (block, key) pigeonhole hit for an arriving document. */
  case class BlockHit(blk: Int, key: Long, docId: Long, tsMs: Long,
      ts: Timestamp, simhash: Long)

  case class BlockEntry(docId: Long, tsMs: Long, simhash: Long)

  case class SimhashPair(doc_a: Long, doc_b: Long, dist: Long)

  /** Scala twin of TextAnalysis.wsTokens' COLUMN semantics. With boundary
    * empties filtered on the batch side (wsTokens drops the "" tokens
    * Spark's space-only `trim` + empty-keeping `split` would otherwise
    * leave around tabs/newlines), the space-only-vs-all-whitespace trim
    * distinction disappears — the surviving tokens are identical — so the
    * twin is plain Java trim + split + non-empty filter. Pinned to the
    * Column implementation by the stream≡batch spec (incl. the
    * newline/tab-terminated fixture).
    */
  private[graft] def wsTokensScala(text: String): Array[String] =
    text.trim.split("\\s+").filter(_.nonEmpty)

  /** Scala twin of the 60-bit SimHash column algebra
    * (Dedup.simhashes64): per-token 60-bit md5-derived value, bit-wise
    * ±1 votes over ALL tokens (repeats included, as the batch explode
    * counts them), sign → fingerprint bit. Pinned to the Column
    * implementation by the stream≡batch spec (incl. the whitespace
    * quirk fixture — see [[wsTokensScala]]).
    */
  private[graft] def simhash64Of(text: String): Long = {
    val toks = wsTokensScala(text)
    if (toks.isEmpty) return 0L
    val votes = new Array[Long](60)
    toks.foreach { t =>
      val h = java.lang.Long.parseLong(md5Hex(t).substring(0, 15), 16)
      var b = 0
      while (b < 60) {
        votes(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L); b += 1
      }
    }
    (0 until 60).foldLeft(0L) { (sig, b) =>
      if (votes(b) > 0) sig | (1L << b) else sig
    }
  }

  private def blockKeysOf(simhash: Long, blocks: Int, width: Int): IndexedSeq[Long] =
    (0 until blocks).map(b => (simhash >> (b * width)) & ((1L << width) - 1))

  private def pairsFromBlockBucket(blkIdx: Int, blocks: Int, width: Int,
      rows: Iterator[BlockHit], state: GroupState[Seq[BlockEntry]],
      delayMs: Long, maxDist: Int): Iterator[SimhashPair] = {
    val wm = state.getCurrentWatermarkMs()
    var entries = state.getOption.getOrElse(Seq.empty)
      .filter(e => e.tsMs + delayMs > wm)
    val out = scala.collection.mutable.ArrayBuffer.empty[SimhashPair]
    if (!state.hasTimedOut) {
      for (r <- rows.toSeq.sortBy(h => (h.tsMs, h.docId))) {
        val kb = blockKeysOf(r.simhash, blocks, width) // once per row
        for (e <- entries if e.docId != r.docId) {
          // Pigeonhole dedup: only the smallest colliding block emits.
          val ka = blockKeysOf(e.simhash, blocks, width)
          if ((0 until blocks).find(b => ka(b) == kb(b)).contains(blkIdx)) {
            val dist = java.lang.Long.bitCount(e.simhash ^ r.simhash).toLong
            if (dist <= maxDist)
              out += SimhashPair(math.min(e.docId, r.docId),
                math.max(e.docId, r.docId), dist)
          }
        }
        entries = entries :+ BlockEntry(r.docId, r.tsMs, r.simhash)
      }
    }
    if (entries.isEmpty) state.remove()
    else {
      state.update(entries)
      state.setTimeoutTimestamp(
        math.max(entries.map(_.tsMs + delayMs).min, wm + 1))
    }
    out.iterator
  }

  /** Streaming twin of the 60-bit SimHash near-dup pipeline
    * ([[graft.operators.Dedup.simhashNearDups64]]): fingerprints computed
    * per row in the typed map stage (a stream admits no explode+groupBy
    * vote aggregation before another stateful op), pigeonhole block keys
    * exploded, ONE fgws per (block, key) bucket with horizon-expired
    * state — the same discipline as [[streamingMinhashNearDups]], with
    * far lighter state (one 60-bit fingerprint per doc instead of a
    * shingle set). Emits (doc_a, doc_b, dist) exactly once per pair
    * (smallest colliding block wins).
    */
  def streamingSimhashNearDups(docs: DataFrame, tsCol: String = "ts",
      delay: String = "10 minutes", maxDist: Int = 3): Dataset[SimhashPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val delayMs = delayToMs(delay)
    val blocks = maxDist + 1
    val width = 60 / blocks
    val hits = docs.select(col("doc_id"), col(tsCol).as("ts"), col("text"))
      .as[(Long, Timestamp, String)]
      .flatMap { case (docId, ts, text) =>
        val sig = simhash64Of(text)
        blockKeysOf(sig, blocks, width).zipWithIndex.map { case (k, b) =>
          BlockHit(b, k, docId, ts.getTime, ts, sig)
        }
      }
      .withWatermark("ts", delay)
    hits.groupByKey(h => (h.blk, h.key))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: (Int, Long), rows: Iterator[BlockHit],
            state: GroupState[Seq[BlockEntry]]) =>
          pairsFromBlockBucket(key._1, blocks, width, rows, state,
            delayMs, maxDist)
      }
  }

  /** The streaming near-dup query: docs (doc_id, text, `tsCol`) →
    * append-mode pairs (doc_a, doc_b, jaccard) for near-dups arriving
    * within `delay` of each other. Thresholds/shingling match the batch
    * defaults.
    */
  def streamingMinhashNearDups(docs: DataFrame, tsCol: String = "ts",
      delay: String = "10 minutes", n: Int = 3,
      threshold: Double = 0.5): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val delayMs = delayToMs(delay)
    val toks = docs.select(col("doc_id"), col(tsCol).as("ts"),
      TextAnalysis.wsTokens(col("text")).as("toks"))
    val sets = toks.select(col("doc_id"), col("ts"),
      Dedup.shinglesFromTokens(col("toks"), n).as("sset"))
    // Per-row signature: md5 arrays materialized first (one md5 per seed
    // per shingle — the HOF re-evaluation discipline), then 8 sliced
    // minima and the 4 band keys, all map-side.
    val withM = sets
      .withColumn("ma", transform(col("sset"),
        s => md5(concat(lit("a:"), s))))
      .withColumn("mb", transform(col("sset"),
        s => md5(concat(lit("b:"), s))))
    def minSlice(arr: String, i: Int) =
      array_min(transform(col(arr), m => substring(m, i * 8 + 1, 8)))
    val hs = (0 until 4).map(i => minSlice("ma", i)) ++
      (0 until 4).map(i => minSlice("mb", i))
    val bands = (0 until Dedup.Bands).map { b =>
      struct(lit(b).as("band"), md5(concat(hs(2 * b), hs(2 * b + 1))).as("key"))
    }
    val hits = withM
      .select(col("doc_id"), col("ts"), col("sset"),
        explode(array(bands: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("doc_id").as("docId"), unix_millis(col("ts")).as("tsMs"),
        col("ts"), col("sset"))
      .withWatermark("ts", delay)
      .as[BandHit]
    hits.groupByKey(h => (h.band, h.key))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: (Int, String), rows: Iterator[BandHit],
            state: GroupState[Seq[BandEntry]]) =>
          pairsFromBucket(key._1, rows, state, delayMs, threshold)
      }
  }
}
