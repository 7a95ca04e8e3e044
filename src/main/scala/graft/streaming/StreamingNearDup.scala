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

  /** A doc retained in bucket state until the watermark passes ts+delay. */
  case class BandEntry(docId: Long, tsMs: Long, sset: Seq[String])

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
        for (e <- entries if e.docId != r.docId) {
          // Multi-band dedup: only the smallest colliding band emits.
          val first = {
            val ka = bandKeysOf(e.sset); val kb = bandKeysOf(r.sset)
            (0 until Dedup.Bands).find(b => ka(b) == kb(b))
          }
          if (first.contains(bandIdx)) {
            val j = jaccardOf(e.sset, r.sset)
            if (j >= threshold)
              out += NearDupPair(math.min(e.docId, r.docId),
                math.max(e.docId, r.docId), j)
          }
        }
        entries = entries :+ BandEntry(r.docId, r.tsMs, r.sset)
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
