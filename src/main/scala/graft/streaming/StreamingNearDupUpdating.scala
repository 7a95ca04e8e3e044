package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.operators.{Dedup, TextAnalysis}
import StreamingNearDup.{BandEntry, NearDupPair, jaccardOf}

/** The MUTATE-IN-PLACE variant of the streaming MinHash near-dup twin —
  * the reference's own state discipline (every event updates the page's
  * state in place, `/root/reference/index.js:270-272`) lifted to the
  * near-dup monitor: a CHANGED-content redelivery of a live `doc_id`
  * RETRACTS the old version's bucket entries and ADMITS the new ones,
  * so every future arrival pairs against the doc's CURRENT content.
  * [[StreamingNearDup.streamingMinhashNearDups]] keeps its spec-pinned
  * first-delivery-wins contract (v2 dropped); this twin is the opt-in
  * upgrade for feeds where in-place updates are real.
  *
  * Why two stateful stages: retraction needs a per-DOC memory (which
  * bucket keys did v1 occupy?) that no per-bucket state can answer —
  * v2's hits route to v2's buckets, never to the v1 buckets that must
  * forget it. Spark 4's `transformWithState` makes the chain legal
  * where fgws could not (measured in round 15: a second watermark
  * declaration below a stateful op is an AnalysisException, and typed
  * stages strip the event-time tag fgws' EventTimeTimeout requires):
  * the version stage re-assigns its OUTPUT event-time column (the
  * `eventTimeColumnName` overload), which is the documented chaining
  * path for a downstream stateful operator.
  *
  * Stage 1 (key = doc_id): ValueState holds the last admitted version's
  * content hash + band keys. New hash → emit retract(old keys) +
  * admit(new); identical hash → pure redelivery, no-op (≡ the
  * first-wins gate); state expires at the same event-time horizon the
  * buckets use, so the two stages' memories can never disagree about
  * whether a version is live.
  *
  * Stage 2 (key = (band, key)): the [[StreamingNearDup]] bucket
  * discipline plus the retract op — deltas apply in (tsMs, kind) order
  * (retract before admit at one instant), pairs emit via the shared
  * smallest-colliding-band rule over both sides' CURRENT key arrays
  * (every live entry belongs to its doc's current version by
  * construction, so the exactly-once argument carries over verbatim).
  *
  * Append-mode semantics: an alert already emitted against a SUPERSEDED
  * version stands — an append sink cannot un-emit — exactly as the
  * reference's mutate-in-place fold cannot un-fire a past trend event.
  * The stream ≡ batch claim is therefore ARRIVAL-ORDER mutate-in-place:
  * each arrival pairs against the then-current state; when updates
  * precede the arrivals they should influence, the emitted set equals
  * the batch pairs over the FINAL corpus (spec-pinned).
  *
  * State is horizon-bounded like the first-wins twin: one snapshot per
  * live doc + the bucket entries, both expired by event-time timers.
  */
object StreamingNearDupUpdating {

  /** One content version of a doc, as decoded by the column stage. */
  case class DocVersion(docId: Long, ts: Timestamp, tsMs: Long,
      hash: String, sset: Seq[String], keys: Seq[String])

  /** Admit (kind 1, keys = the new version's) or retract (kind 0,
    * keys = the SUPERSEDED version's — they route the delta to the
    * buckets that must forget it; sset rides empty). `seq` is the
    * per-doc EMISSION sequence within stage 1's invocation: the bucket
    * stage replays one doc's deltas in exactly this order — a
    * (ts, kind)-style sort instead would reorder a same-timestamp
    * multi-version update into retract,admit,admit, skipping the second
    * admit on the docId-presence check and stranding the superseded
    * version's entries until horizon expiry.
    */
  case class DocDelta(kind: Int, seq: Int, docId: Long, ts: Timestamp,
      tsMs: Long, sset: Seq[String], keys: Seq[String])

  /** A delta exploded onto one (band, key) bucket. */
  case class DeltaHit(kind: Int, seq: Int, band: Int, key: String,
      docId: Long, ts: Timestamp, tsMs: Long, sset: Seq[String],
      keys: Seq[String])

  /** Stage-1 state: the last admitted version of this doc. */
  case class DocSnapshot(hash: String, tsMs: Long, keys: Seq[String])

  /** Stage-2 state: the bucket's live entries (a product wrapper —
    * tws value state wants a product encoder at the top level).
    */
  case class BucketState(entries: Seq[BandEntry])

  final class VersionProcessor(delayMs: Long)
      extends StatefulProcessor[Long, DocVersion, DocDelta] {

    @transient private var snap: ValueState[DocSnapshot] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      snap = getHandle.getValueState[DocSnapshot]("doc",
        Encoders.product[DocSnapshot], TTLConfig.NONE)

    private def rearm(tsMs: Long): Unit = {
      // tws timers accumulate (the TrendProcessor rule): drop any
      // pending expiry before arming the snapshot's current horizon.
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(tsMs + delayMs)
    }

    override def handleInputRows(key: Long, rows: Iterator[DocVersion],
        tv: TimerValues): Iterator[DocDelta] = {
      val wm = tv.getCurrentWatermarkInMs()
      // A snapshot past the horizon is already dead in every bucket —
      // treat it as absent so a late-returning doc re-admits cleanly.
      var cur = (if (snap.exists()) Option(snap.get()) else None)
        .filter(_.tsMs + delayMs > wm)
      val out = scala.collection.mutable.ArrayBuffer.empty[DocDelta]
      // Event-time order within the batch; same-instant distinct
      // versions tie-break on the content hash (deterministic — the
      // input carries no finer ordering to honor).
      for (v <- rows.toSeq.sortBy(r => (r.tsMs, r.hash))) {
        cur match {
          case Some(s) if s.hash == v.hash =>
            // Pure redelivery (at-least-once source): the admitted
            // version stands; no delta, no state movement.
            ()
          case other =>
            other.foreach(s =>
              out += DocDelta(0, out.size, v.docId, v.ts, v.tsMs,
                Seq.empty, s.keys))
            out += DocDelta(1, out.size, v.docId, v.ts, v.tsMs,
              v.sset, v.keys)
            cur = Some(DocSnapshot(v.hash, v.tsMs, v.keys))
        }
      }
      cur match {
        case Some(s) => snap.update(s); rearm(s.tsMs)
        case None    => if (snap.exists()) snap.clear()
      }
      out.iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[DocDelta] = {
      if (snap.exists() &&
          snap.get().tsMs + delayMs <= tv.getCurrentWatermarkInMs())
        snap.clear()
      Iterator.empty
    }
  }

  final class BucketProcessor(delayMs: Long, threshold: Double,
      bucketCap: Int)
      extends StatefulProcessor[(Int, String), DeltaHit, NearDupPair] {

    @transient private var st: ValueState[BucketState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[BucketState]("bucket",
        Encoders.product[BucketState], TTLConfig.NONE)

    private def persist(entries: Seq[BandEntry], wm: Long): Unit =
      if (entries.isEmpty) {
        if (st.exists()) st.clear()
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      } else {
        st.update(BucketState(entries))
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
        getHandle.registerTimer(
          math.max(entries.map(_.tsMs + delayMs).min, wm + 1))
      }

    override def handleInputRows(key: (Int, String),
        rows: Iterator[DeltaHit], tv: TimerValues): Iterator[NearDupPair] = {
      val wm = tv.getCurrentWatermarkInMs()
      var entries = (if (st.exists()) st.get().entries else Seq.empty)
        .filter(e => e.tsMs + delayMs > wm)
      val out = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
      // (tsMs, docId, seq): one doc's deltas replay in stage 1's exact
      // emission order (seq) — retract-before-admit per VERSION, so a
      // same-timestamp multi-version update applies as
      // admit(v1),retract(v1),admit(v2) and never strands v1; distinct
      // docs at one instant order by id (deterministic; same-instant
      // admits pair symmetrically either way).
      for (r <- rows.toSeq.sortBy(h => (h.tsMs, h.docId, h.seq))) {
        if (r.kind == 0) {
          entries = entries.filterNot(_.docId == r.docId)
        } else if (!entries.exists(_.docId == r.docId) &&
            entries.size < bucketCap) {
          // The [[StreamingNearDup.pairsFromBucket]] verify: smallest
          // colliding band over both CURRENT key arrays emits; every
          // live entry is its doc's current version (retracts route by
          // the superseded keys), so the exactly-once rule is intact.
          for (e <- entries) {
            val first =
              (0 until Dedup.Bands).find(b => e.keys(b) == r.keys(b))
            if (first.contains(key._1)) {
              val j = jaccardOf(e.sset, r.sset)
              if (j >= threshold)
                out += NearDupPair(math.min(e.docId, r.docId),
                  math.max(e.docId, r.docId), j)
            }
          }
          entries = entries :+ BandEntry(r.docId, r.tsMs, r.sset, r.keys)
        }
      }
      persist(entries, wm)
      out.iterator
    }

    override def handleExpiredTimer(key: (Int, String), tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[NearDupPair] = {
      val wm = tv.getCurrentWatermarkInMs()
      persist((if (st.exists()) st.get().entries else Seq.empty)
        .filter(e => e.tsMs + delayMs > wm), wm)
      Iterator.empty
    }
  }

  /** The updating near-dup query: docs (doc_id, text, `tsCol`) →
    * append-mode pairs under mutate-in-place version semantics.
    * Thresholds/shingling match [[graft.operators.Dedup.minhashNearDups]].
    */
  def streamingMinhashNearDupsUpdating(docs: DataFrame,
      tsCol: String = "ts", delay: String = "10 minutes", n: Int = 3,
      threshold: Double = 0.5,
      maxBucketDf: Int = Int.MaxValue): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // tws requires the RocksDB state store provider (the TrendStreamTws
    // session conf).
    spark.conf.set(TrendStreamTws.rocksdbConf._1,
      TrendStreamTws.rocksdbConf._2)
    val delayMs = StreamingNearDup.delayToMs(delay)
    val bucketCap = if (maxBucketDf <= 0) Int.MaxValue else maxBucketDf
    val versions = docs.select(col("doc_id"), col(tsCol).as("ts"),
        // Content identity = the exact-dedup family hash (null ≡ empty):
        // stage 1's redelivery test keys on it.
        md5(coalesce(col("text"), lit(""))).as("hash"),
        TextAnalysis.wsTokens(col("text")).as("toks"))
      // Null event time / doc_id: the non-nullable encoder kill, same
      // rationale as the first-wins twin. Token-less docs are KEPT here
      // (unlike the first-wins gate): a blank v2 is a real update that
      // must retract v1 — it admits nothing (empty keys) but owns the
      // doc snapshot.
      .where(col("ts").isNotNull && col("doc_id").isNotNull)
      .withWatermark("ts", delay)
      .select(col("doc_id").as("docId"), col("ts"),
        unix_millis(col("ts")).as("tsMs"), col("hash"),
        Dedup.shinglesFromTokens(col("toks"), n).as("sset"))
      .withColumn("ma", transform(col("sset"),
        s => md5(concat(lit("a:"), s))))
      .withColumn("mb", transform(col("sset"),
        s => md5(concat(lit("b:"), s))))
      // Blank docs produce all-NULL band keys (empty sset minima) —
      // normalize to an EMPTY array so the admit explodes to nothing
      // while the version row still reaches stage 1.
      .withColumn("keys",
        filter(Dedup.bandKeyArray(col("ma"), col("mb")), k => k.isNotNull))
      .select(col("docId"), col("ts"), col("tsMs"), col("hash"),
        col("sset"), col("keys"))
      .as[DocVersion]
    val deltas = versions
      .groupByKey(_.docId)
      // The eventTimeColumnName overload: output `ts` is re-assigned as
      // the event-time column, which is what makes the SECOND stateful
      // stage legal (a fresh withWatermark below a stateful op is an
      // AnalysisException; a typed stage strips the tag — both measured
      // in round 15).
      .transformWithState(new VersionProcessor(delayMs), "ts",
        OutputMode.Append())
    val hits = deltas
      .select(col("kind"), col("seq"), col("docId"), col("ts"),
        col("tsMs"), col("sset"), col("keys"),
        // OUTER, like every exploder over a derived array (the
        // InferFiltersFromGenerate rule); the null row an empty keys
        // array emits drops on the exploded attribute below.
        posexplode_outer(col("keys")).as(Seq("band", "key")))
      .where(col("key").isNotNull)
      .select(col("kind").cast("int").as("kind"),
        col("seq").cast("int").as("seq"),
        col("band").cast("int").as("band"), col("key"), col("docId"),
        col("ts"), col("tsMs"), col("sset"), col("keys"))
      .as[DeltaHit]
    hits.groupByKey(h => (h.band, h.key))
      .transformWithState(new BucketProcessor(delayMs, threshold,
        bucketCap), TimeMode.EventTime(), OutputMode.Append())
  }
}
