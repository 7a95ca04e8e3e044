package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Product-analytics operators over the `events` table: gap-based
  * sessionization, cohort retention, ordered step-conversion funnels,
  * first-order-to-third-order event-type transitions, and daily
  * rate-anomaly verdicts — each with a streaming twin where the shape
  * has one (sessionizeStream, funnelStepsStream, rateAnomalyStream).
  *
  * Scale design, shared across the family: every batch operator is a
  * single-shuffle-per-stage plan keyed on `user_id` (windows and final
  * aggregations reuse the same hash partitioning; funnels fold to ONE
  * row per user), per-cohort/per-day summary tables are tiny and
  * broadcast, and nothing ever materializes an unpartitioned
  * corpus-sized window. Streaming state is bounded per entity and
  * expired at the watermark horizon (each twin documents its own bound
  * and exactness caveats at its definition).
  */
object EventAnalytics {

  /** Gap-based sessionization: a user's events, ordered by (ts, event_id),
    * start a new session whenever the gap from the previous event exceeds
    * `gapMinutes`. Output: one row per session with start/end, event and
    * purchase counts, and the 2-dp value total (2-dp inputs put the true
    * sum on the 2-dp grid, so the rounded double is engine-identical —
    * the q1 discipline).
    *
    * The boundary flag + running sum is the textbook distributed form:
    * both windows and the final aggregation share the `user_id` hash
    * partitioning, so the whole operator is ONE shuffle; per-user sort is
    * bounded by that user's event count.
    */
  def sessionize(events: DataFrame, gapMinutes: Long = 360L): DataFrame = {
    // Same param discipline as every sibling (funnelSteps, rateAnomaly):
    // gapMinutes <= 0 makes every event its own session silently (while
    // the STREAM twin throws at analysis for the same input — a twin
    // divergence), and an absurd gap would WRAP the micros conversion
    // negative with the same every-event-is-a-session outcome —
    // multiplyExact turns that into a loud ArithmeticException.
    require(gapMinutes >= 1L, s"gapMinutes=$gapMinutes must be >= 1")
    val gapUs = math.multiplyExact(gapMinutes, 60L * 1000000L)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(w)
    val marked = events
      // NULL guards mirrored in the oracle SQL (cohortRetention's rule):
      // a NULL ts is unorderable and the engines disagree on where it
      // sorts (Spark ASC = nulls FIRST, DuckDB = nulls LAST), which
      // would shift is_new and every session_seq in the partition; NULL
      // user_id rows would additionally pile onto one hot window
      // partition. Sessions of an unattributable or untimed event are
      // meaningless — drop them up front, identically on both sides.
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("value"))
      .withColumn("is_new",
        when(prevTs.isNull ||
          unix_micros(col("ts")) - unix_micros(prevTs) >
            lit(gapUs), 1L).otherwise(0L))
    val sess = marked.withColumn("session_seq",
      sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("purchases"),
        round(sum(col("value")), 2).as("total_value"))
  }

  /** Streaming twin of [[sessionize]]: Spark's `session_window` merges
    * events into gap-bounded sessions as they arrive, emitting each
    * session once the watermark passes its close — state per (user,
    * open session), bounded by the watermark horizon. On a complete
    * stream it produces the SAME sessions as the batch operator (the
    * identity a spec pins): `session_window.start` = the batch
    * `session_start`; the window's `end` is last-event + gap by
    * definition, so the batch `session_end` (last event ts) is `end`
    * minus the gap.
    *
    * KNOWN BOUNDARY ASYMMETRY at an exact-gap timestamp: batch starts a
    * new session only when the gap is STRICTLY greater than `gapMinutes`
    * (equality merges), while `session_window`'s half-open
    * `[ts, last+gap)` window does NOT merge an event arriving exactly at
    * `last+gap` (equality splits). The twins agree on every gap except
    * `== gapMinutes` exactly; the stream≡batch spec keeps its fixtures
    * off that boundary, and callers who need equality semantics at the
    * boundary should sessionize with `gapMinutes+1` minus one microsecond
    * of tolerance on one side.
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Long = 360L,
      delay: String = "1 hour"): DataFrame = {
    // The batch twin's require, duplicated here like every other twin
    // pair (funnelSteps/funnelStepsStream, rateAnomaly/rateAnomalyStream):
    // relying on session_window to reject a non-positive interval is a
    // version-dependent behavior, and a silently-empty stream where
    // batch loudly rejects the same input is a twin divergence.
    require(gapMinutes >= 1L, s"gapMinutes=$gapMinutes must be >= 1")
    // Null event-time filter BEFORE the stateful stage (the streaming
    // twins' convention): a null ts reaching session_window inside a
    // watermarked aggregation is undefined-to-throwing territory, and
    // the batch twin drops the same rows — the stream ≡ batch identity
    // requires both sides to drop them.
    events.filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", delay)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("purchases"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("window_end"),
        col("n_events"), col("purchases"), col("total_value"))
  }

  /** Ordered step-conversion funnel: for each user, the first occurrence
    * of `steps(0)` anchors the funnel; each later step counts only if it
    * happens STRICTLY after the previous completed step and within
    * `windowMinutes` of the anchor (inclusive at the window edge).
    * Output: one row per step with the users reaching it and the ppm
    * conversion from step 1 (integer floor division — engine-identical).
    *
    * Scale shape: ONE shuffle. Events filter to the step types (pushed
    * to the scan), fold to one row per user in a single aggregation —
    * per-step timestamp arrays, bounded by that user's activity on the
    * funnel's types, the same per-entity-state bound sessionization
    * carries — and the sequential step mins are higher-order array
    * expressions inside one projection. The summary is a single-row
    * aggregate unpivoted through a literal struct array; no joins, no
    * windows, no per-step re-scan of the log (the k-join formulation
    * would shuffle the log k−1 times).
    */
  /** The funnel twins' shared parameter contract — ONE definition so the
    * batch and stream operators can never accept different inputs (the
    * dayVerdict/funnelWalk single-sourcing rule, applied to the guards).
    */
  private def requireFunnelParams(steps: Seq[String],
      windowMinutes: Long): Unit = {
    require(steps.size >= 2 && steps.size <= 8,
      s"funnel needs 2..8 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    require(windowMinutes >= 1, s"windowMinutes=$windowMinutes must be >= 1")
  }

  def funnelSteps(events: DataFrame, steps: Seq[String],
      windowMinutes: Long): DataFrame = {
    requireFunnelParams(steps, windowMinutes)
    val winUs = math.multiplyExact(windowMinutes, 60L * 1000000L)
    val k = steps.size
    val ev = events
      // Same null rule as sessionize, mirrored in the oracle: untimed or
      // unattributable events can anchor nothing.
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isin(steps: _*))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsu"))
    val arrays = steps.zipWithIndex.map { case (st, i) =>
      // when() without otherwise yields NULL for other types and
      // collect_list drops NULLs — each array holds exactly step i's
      // timestamps for the user.
      collect_list(when(col("event_type") === st, col("tsu"))).as(s"a$i")
    }
    val perUser = ev.groupBy(col("user_id"))
      .agg(arrays.head, arrays.tail: _*)
    // t0 = anchor; t_i = min step-i ts strictly after t_{i-1} and within
    // the anchored window. array_min over a filtered array is null on
    // empty, and a NULL t_{i-1} nulls the lambda predicate, so "missed a
    // step" propagates forward without branches.
    val chained = (1 until k).foldLeft(
      perUser.withColumn("t0", array_min(col("a0")))) { (df, i) =>
      df.withColumn(s"t$i",
        array_min(filter(col(s"a$i"), x =>
          x > col(s"t${i - 1}") && x <= col("t0") + lit(winUs))))
    }
    val counts = chained.agg(
      count(col("t0")).as("u0"),
      (1 until k).map(i => count(col(s"t$i")).as(s"u$i")): _*)
    counts.select(col("u0").as("__base"), explode(array(
        steps.zipWithIndex.map { case (st, i) =>
          struct(lit((i + 1).toLong).as("step_idx"), lit(st).as("step"),
            col(s"u$i").as("users"))
        }: _*)).as("s"))
      .select(col("s.step_idx"), col("s.step"), col("s.users"),
        // decimal(38,0) product — see typeTransitions' prob_ppm.
        when(col("__base") > 0L,
          expr("CAST(s.users AS DECIMAL(38,0)) * 1000000 DIV __base"))
          .as("conv_ppm"))
  }

  /** Event-type transition matrix: for each ordered (from, to) pair of
    * CONSECUTIVE events of one user ((ts, event_id) order — the
    * sessionize tie-break), the transition count and the integer ppm
    * probability out of the `from` state — the first-order Markov view
    * of user behavior.
    *
    * Scale shape: one `user_id` exchange for the lead window (per-user
    * sort bounded by that user's events), then the corpus folds to the
    * |types|² transition table; the per-from totals window runs over
    * that tiny table only.
    */
  def typeTransitions(events: DataFrame, order: Int = 1): DataFrame = {
    require(order >= 1 && order <= 3, s"order=$order outside [1, 3]")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val base = events
      // The sessionize null rule, mirrored in the oracle: null ts is
      // unorderable (engines disagree on null placement) and null users
      // would pile onto one window partition.
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
    // Higher orders condition on the last `order` events: the from-state
    // is their '>'-joined types (e.g. "view>click" at order 2). Chains
    // shorter than the context (lag null at a user's head) contribute
    // nothing — an order-k model has no k-1-gram backoff here, matching
    // the textbook Markov-chain estimate; the oracle filters identically.
    // The lag columns materialize FIRST (one shared window pass), then
    // the null gate — concat_ws would silently SKIP a null lag and emit
    // a shorter context string instead of dropping the row.
    val lagCols = (order - 1 to 1 by -1)
      .map(j => lag(col("event_type"), j).over(w))
    val withCtx = lagCols.zipWithIndex.foldLeft(base) { case (df, (c, i)) =>
      df.withColumn(s"__l_$i", c)
    }
    // Order >= 2 must also gate the CURRENT event_type: the oracle's
    // `l1 || '>' || event_type` is NULL when either side is, while
    // concat_ws would silently skip it and emit a shorter context —
    // the column is nullable even though the current data carries no
    // nulls (the sessionize latent-null rule). Order 1 keeps the
    // original semantics (from_type = event_type, null and all).
    val ctxNonNull = (0 until order - 1)
      .foldLeft(if (order == 1) lit(true) else col("event_type").isNotNull)(
        (acc, i) => acc && col(s"__l_$i").isNotNull)
    val fromCol =
      if (order == 1) col("event_type")
      else concat_ws(">",
        (0 until order - 1).map(i => col(s"__l_$i")) :+ col("event_type"): _*)
    val pairs = withCtx
      .where(col("to_type").isNotNull && ctxNonNull)
      .select(fromCol.as("from_type"), col("to_type"))
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val perFrom = Window.partitionBy(col("from_type"))
    counts
      .withColumn("from_total", sum(col("cnt")).over(perFrom))
      // decimal(38,0) product (the pmiTopK widening rule): a hot pair
      // past ~9.2e12 occurrences would ANSI-abort the plain long product
      // where the oracle computes through HUGEINT. IntegralDivide
      // returns BIGINT, so the emitted type is unchanged.
      .withColumn("prob_ppm",
        expr("CAST(cnt AS DECIMAL(38,0)) * 1000000 div from_total"))
  }

  /** One ingested funnel-step event in the streaming twin. */
  case class FunnelHit(user_id: Long, step: Int, ts: java.sql.Timestamp,
      tsu: Long)

  /** One closed funnel: the user's anchor (first step-1 event, µs) and
    * how many steps completed inside the anchored window.
    */
  case class FunnelProgress(user_id: Long, anchor_us: Long,
      steps_completed: Long)

  /** The batch chain on ONE user's buffered (step, µs) events — the
    * Scala twin of [[funnelSteps]]' array-HOF fold, shared by the
    * streaming timeout handler and its spec.
    */
  private[graft] def funnelWalk(buf: Seq[(Int, Long)], k: Int,
      winUs: Long): Option[(Long, Long)] = {
    def stepTimes(i: Int) = buf.collect { case (`i`, t) => t }
    val anchor = stepTimes(0).minOption
    anchor.map { a =>
      var prev = a
      var completed = 1L
      var i = 1
      var alive = true
      while (i < k && alive) {
        stepTimes(i).filter(t => t > prev && t <= a + winUs)
          .minOption match {
          case Some(t) => prev = t; completed += 1
          case None => alive = false
        }
        i += 1
      }
      (a, completed)
    }
  }

  /** Streaming twin of [[funnelSteps]], per-user detail grain: buffers a
    * user's step events and emits ONE (anchor, steps_completed) row when
    * the event-time watermark passes the anchored window's close — at
    * that point every in-window event has arrived (or is contractually
    * late), so the emitted chain equals the batch fold over the same
    * events exactly (spec-pinned). Append-mode, exactly-once per user:
    * after emission the state collapses to an empty-buffer tombstone so
    * post-window stragglers can never re-anchor a second funnel (the
    * batch side has one global anchor per user — a re-anchored emission
    * would diverge from it).
    *
    * State bound: per ANCHORED user, the single anchor row plus the LIVE
    * later-step events — a step>0 row is retained only while it could
    * still chain (after the current anchor, or above the watermark where
    * an even-earlier late anchor could still land in front of it; a
    * future anchor arrives at event-time >= the watermark, so rows at or
    * below BOTH the anchor and the watermark are provably dead, as are
    * all step-0 rows other than the min). Per anchor-less user, only
    * events above the watermark, expired outright once the watermark
    * passes the newest survivor. Per closed user, an O(1) tombstone —
    * the price of the exactly-once-per-user emission guarantee.
    *
    * `tombstoneTtlMinutes` bounds closed-user state: a positive TTL
    * expires each tombstone `ttl` minutes of EVENT TIME past its
    * emission watermark, so total state for a long-running stream is
    * O(open users + recently-closed users) instead of one row per
    * ever-seen user. The DEFAULT is 7 days (10080) — bounded state is
    * the right default for an unbounded stream; the DOCUMENTED
    * divergence from the batch fold is that a step-0 event arriving
    * more than the TTL after the user's funnel closed re-anchors a
    * second funnel the one-global-anchor batch fold does not have
    * (spec-pinned at the default). Pass `0` to opt into permanent
    * tombstones: the exact batch twin, at the price of one state row
    * per ever-emitted user, forever.
    */
  def funnelStepsStream(events: DataFrame, steps: Seq[String],
      windowMinutes: Long, delay: String = "1 hour",
      tombstoneTtlMinutes: Long = 7L * 24L * 60L)
      : Dataset[FunnelProgress] = {
    require(tombstoneTtlMinutes >= 0L,
      s"tombstoneTtlMinutes=$tombstoneTtlMinutes must be >= 0")
    requireFunnelParams(steps, windowMinutes)
    val winUs = math.multiplyExact(windowMinutes, 60L * 1000000L)
    val k = steps.size
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (st, i)) =>
        when(col("event_type") === st, lit(i)).otherwise(acc)
      }
    val hits = events
      // The streaming twins' null rule: a null ts has no watermark
      // semantics and a null user_id would kill the non-nullable
      // FunnelHit encoder — one malformed event must not stop the query.
      .where(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isin(steps: _*))
      .select(col("user_id"), stepIdx.as("step"), col("ts"),
        unix_micros(col("ts")).as("tsu"))
      .withWatermark("ts", delay)
      .as[FunnelHit]
    hits.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[FunnelHit],
            state: GroupState[Seq[(Int, Long)]]) =>
          if (state.hasTimedOut) {
            val buf = state.getOption.getOrElse(Seq.empty)
            funnelWalk(buf, k, winUs) match {
              case Some((a, c)) =>
                // Tombstone, not remove(): a removed user would re-anchor
                // on any later step-1 event and emit a second funnel the
                // batch twin does not have. With a TTL, the tombstone
                // carries its own expiry stamp (a step=-1 marker row — a
                // value the isin gate upstream can never produce) so the
                // DATA path can honor an elapsed TTL deterministically:
                // a key with new data is invoked in data mode, never
                // timed-out mode, in the same trigger — expiry must not
                // depend on that interleaving. The timer is the cleanup
                // path for keys that never see data again.
                if (tombstoneTtlMinutes > 0L) {
                  val expiryMs = math.addExact(
                    state.getCurrentWatermarkMs(),
                    math.multiplyExact(tombstoneTtlMinutes, 60000L))
                  state.update(
                    Seq((-1, math.multiplyExact(expiryMs, 1000L))))
                  state.setTimeoutTimestamp(expiryMs)
                } else state.update(Seq.empty)
                Iterator.single(FunnelProgress(user, a, c))
              case None =>
                // Anchor-less horizon expiry: the watermark has passed
                // every buffered event, and a future anchor arrives at
                // event-time >= the watermark, so nothing here can ever
                // chain — drop the state entirely (a fresh funnel from
                // future events is exactly what batch would compute).
                state.remove()
                Iterator.empty
            }
          } else {
            val wmMs = state.getCurrentWatermarkMs()
            // A TTL'd tombstone whose expiry the watermark has passed is
            // treated as already removed, even though its cleanup timer
            // hasn't fired (this key has data this trigger, so the call
            // is in data mode): the re-anchor semantics must not depend
            // on timer/data interleaving within one trigger.
            val prev = state.getOption match {
              case Some(p) if p.nonEmpty && p.head._1 == -1 &&
                  math.multiplyExact(wmMs, 1000L) > p.head._2 => None
              case other => other
            }
            val isTombstone =
              prev.exists(p => p.isEmpty || p.head._1 == -1)
            if (isTombstone) {
              // Closed user: drain and ignore — exactly-once emission.
              rows.foreach(_ => ())
              // Spark clears a key's timeout on EVERY function invocation
              // (the function must re-set it each call) — without this
              // re-arm, one in-TTL straggler would strand the tombstone
              // in state forever, defeating the bound the TTL provides.
              prev.foreach { p =>
                if (p.nonEmpty && p.head._1 == -1)
                  state.setTimeoutTimestamp(
                    math.max(p.head._2 / 1000L, wmMs + 1L))
              }
              Iterator.empty
            } else {
              val merged = prev.getOrElse(Seq.empty) ++
                rows.map(h => (h.step, h.tsu))
              val anchor = merged.collect { case (0, t) => t }.minOption
              anchor match {
                case Some(a) =>
                  // With an anchor known, prune everything provably dead:
                  // out-of-window rows; step-0 rows other than the min
                  // (the anchor only ever moves EARLIER, via new events);
                  // and step>0 rows at or below both the anchor and the
                  // watermark — chaining needs t > anchor, and any
                  // future replacement anchor arrives at event-time >=
                  // the watermark, so t <= min(a, wm) can never chain.
                  // (Rows in (wm, a] must stay: a late earlier anchor
                  // a' < t could still make them chain — the reason the
                  // naive "drop everything <= a" prune would diverge
                  // from the batch fold.)
                  val wmUs = math.multiplyExact(wmMs, 1000L)
                  state.update(merged.filter { case (s, t) =>
                    t <= a + winUs &&
                      (if (s == 0) t == a else t > a || t > wmUs)
                  })
                  // Fire once the watermark proves the window complete:
                  // close is ms-ceiling of anchor+window so an edge-exact
                  // (µs) event still precedes the timer. A window already
                  // behind the watermark fires at the next tick (wm + 1);
                  // the walk ignores stragglers past the window either way.
                  val closeMs = math.addExact(a, winUs) / 1000L + 1L
                  state.setTimeoutTimestamp(math.max(closeMs, wmMs + 1L))
                case None =>
                  // No anchor yet. A future anchor arrives at event-time
                  // >= the watermark and later steps must be STRICTLY
                  // after it, so buffered events at or below the
                  // watermark are provably dead — prune them, and expire
                  // the state once the watermark passes the newest
                  // survivor (+2 ms for the µs→ms grain). Without this,
                  // a user that never signs up buffers its step events
                  // forever.
                  val live = merged.filter(_._2 >= wmMs * 1000L)
                  if (live.isEmpty) state.remove()
                  else {
                    state.update(live)
                    state.setTimeoutTimestamp(math.max(
                      live.map(_._2).max / 1000L + 2L, wmMs + 1L))
                  }
              }
              Iterator.empty
            }
          }
      }
  }

  /** Integer UTC day — `unix_micros(ts) DIV 86400e6` floors identically
    * in both engines (timestamps are non-negative here; `to_date` would
    * re-open the DATE hash-representation gap cohortRetention dodged).
    * ONE definition for the batch operator and the streaming twin: a
    * day-boundary retune edited at one site would silently split the
    * stream's day keys from the batch's.
    */
  private def utcDay: Column = expr("unix_micros(ts) DIV 86400000000")

  /** Daily event-rate spike detection: per (event_type, UTC day) counts
    * compared against the trailing `baselineDays`-day mean, flagged when
    * `cnt` exceeds `factorPct`% of that mean. The compare is the integer
    * cross-multiplication `cnt · base_days · 100 > factorPct · base_cnt`
    * — no division, no floats, engine-identical by construction. Days
    * with an empty trailing window (the series head) report
    * `is_spike = false` with `base_days = 0`, never a null verdict.
    *
    * Scale shape: the log folds map-side to (type, day) rows — the only
    * corpus-sized exchange moves those folded groups — and the trailing
    * window is a RANGE frame over the tiny daily table, partitioned by
    * type. Nothing re-scans raw events.
    */
  def rateAnomaly(events: DataFrame, baselineDays: Int = 7,
      factorPct: Int = 200): DataFrame = {
    require(baselineDays >= 1 && baselineDays <= 365,
      s"baselineDays=$baselineDays outside [1, 365]")
    require(factorPct >= 1, s"factorPct=$factorPct must be >= 1")
    val daily = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_type"), utcDay.as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rangeBetween(-baselineDays.toLong, -1L)
    daily
      .withColumn("base_cnt", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("base_days", count(col("cnt")).over(w))
      .withColumn("is_spike",
        // decimal(38,0) cross-multiplication (the pmiTopK widening rule):
        // a plain long product ANSI-aborts past ~2.5e14 events/day while
        // the oracle computes through HUGEINT — the verdict must compute,
        // not cliff. Emitted columns stay BIGINT.
        col("base_days") > 0L &&
          col("cnt").cast("decimal(38,0)") * col("base_days") * lit(100L) >
            lit(factorPct.toLong).cast("decimal(38,0)") * col("base_cnt"))
  }

  /** One closed day's verdict in the streaming twin of [[rateAnomaly]]. */
  case class DayRate(event_type: String, day: Long, cnt: Long,
      base_cnt: Long, base_days: Long, is_spike: Boolean)

  /** The per-day verdict arithmetic — shared by the streaming twin and
    * its spec; mirrors [[rateAnomaly]]'s integer cross-multiplication
    * exactly.
    */
  private[graft] def dayVerdict(tpe: String, day: Long, cnt: Long,
      counts: Map[Long, Long], baselineDays: Int, factorPct: Int): DayRate = {
    val base = counts.view
      .filterKeys(d => d >= day - baselineDays && d <= day - 1).toMap
    // addExact, matching the batch twin's ANSI LongType windowed sum:
    // a bare Long fold would WRAP silently (garbage base_cnt + verdict)
    // at the same magnitude where the batch side fails loudly — the
    // compute-don't-wrap twin rule the cross-multiplication below
    // already follows.
    val baseCnt = base.values.foldLeft(0L)(math.addExact)
    val baseDays = base.size.toLong
    DayRate(tpe, day, cnt, baseCnt, baseDays,
      // BigInt, matching the batch twin's decimal(38,0) cross-
      // multiplication: bare Long products here would WRAP silently
      // (is_spike = false) at magnitudes where the batch verdict still
      // computes exactly — the round-8 jaccardOf stream≡batch lesson.
      baseDays > 0L &&
        BigInt(cnt) * baseDays * 100 > BigInt(factorPct) * baseCnt)
  }

  /** Streaming twin of [[rateAnomaly]]: one fgws group per event_type
    * holds the rolling (day → count) map; a day's verdict emits ONCE,
    * when the event-time watermark passes the day's end (all of its
    * events have arrived or are contractually late), computed against
    * the trailing counts exactly as the batch window does — stream-final
    * ≡ batch on a complete stream (spec-pinned).
    *
    * State bound: per event_type, the open day plus the trailing
    * `baselineDays` closed days (older days evict at emission time);
    * emitted verdicts are final — a straggler for a closed day is
    * watermark-late by definition and never mutates history.
    */
  def rateAnomalyStream(events: DataFrame, baselineDays: Int = 7,
      factorPct: Int = 200, delay: String = "1 hour"): Dataset[DayRate] = {
    require(baselineDays >= 1 && baselineDays <= 365,
      s"baselineDays=$baselineDays outside [1, 365]")
    require(factorPct >= 1, s"factorPct=$factorPct must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    val rows = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_type"), col("ts"), utcDay.as("day"))
      .withWatermark("ts", delay)
      .as[(String, java.sql.Timestamp, Long)]
    // State: (day -> count so far, days already emitted as a max-emitted
    // watermark — emittedThrough — so replay after restart stays
    // idempotent and a late row can never re-open a closed day).
    rows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (tpe: String, it: Iterator[(String, java.sql.Timestamp, Long)],
            state: GroupState[(Map[Long, Long], Long)]) =>
          val (counts0, emitted0) =
            state.getOption.getOrElse((Map.empty[Long, Long], Long.MinValue))
          val counts = it.foldLeft(counts0) { case (m, (_, _, d)) =>
            // Closed days are immutable: a row below emittedThrough is
            // watermark-late that slipped the pre-filter — dropping it
            // mirrors the batch twin's view of the on-time stream.
            if (d <= emitted0) m else m.updated(d, m.getOrElse(d, 0L) + 1L)
          }
          val wmMs = state.getCurrentWatermarkMs()
          val wmDay = // last FULLY-closed day: day end (exclusive) <= wm
            math.floorDiv(wmMs, 86400000L) - 1L
          val ready = counts.keys.filter(d => d > emitted0 && d <= wmDay)
            .toSeq.sorted
          val out = ready.map { d =>
            dayVerdict(tpe, d, counts(d), counts, baselineDays, factorPct)
          }
          val emitted = if (ready.nonEmpty) ready.max else emitted0
          // Evict counts no future verdict can read: anything older than
          // baselineDays behind the newest still-unemitted day. The
          // nothing-emitted sentinel keeps everything (MinValue − k
          // would wrap positive and evict the whole map).
          val kept =
            if (emitted == Long.MinValue) counts
            else counts.view
              .filterKeys(_ >= emitted - baselineDays + 1).toMap
          state.update((kept, emitted))
          // Wake when the watermark passes the next open day's END
          // (+1 ms — the timer fires strictly after its timestamp).
          val openDays = kept.keys.filter(_ > emitted)
          if (openDays.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              math.multiplyExact(openDays.min + 1L, 86400000L) + 1L,
              wmMs + 1L))
          out.iterator
      }
  }

  /** Cohort retention: users are cohorted by their first active day; each
    * (cohort_day, offset_days) cell counts the cohort's users active that
    * many days later, with the retention share as an exact integer
    * division (engine-identical double).
    *
    * Scale shape: the corpus collapses to DISTINCT (user, day) rows first
    * (one aggregation), first-day derives from those per-user rows (same
    * key — exchange reused), and the per-cohort sizes are a days-sized
    * table that BROADCASTS back onto the cell aggregation. The raw event
    * log is scanned once.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val activeDays = events
      // NULL user_id rows are droppable up front: a null key can never
      // equi-join into any retention cell, but groupBy would still keep
      // it as a phantom cohort member — inflating cohort_users relative
      // to the oracle's count(DISTINCT user_id), which drops NULL.
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val firstDay = activeDays.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    val cells = activeDays.join(firstDay, Seq("user_id"))
      .select(col("user_id"), col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("offset_days"))
      // Plain count, not count_distinct: the input is distinct (user,
      // day) and day<->offset is a bijection per user, so each user
      // contributes at most one row per cell — count_distinct would pay
      // Spark's two-phase distinct expansion on the corpus-sized path
      // for a value that equals count(1) by construction.
      .groupBy(col("cohort_day"), col("offset_days"))
      .agg(count(lit(1)).as("active_users"))
    // firstDay has exactly one row per user — same argument.
    val sizes = firstDay.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_users"))
    cells.join(broadcast(sizes), Seq("cohort_day"))
      // ISO string, not DATE: every other emitted column type has a
      // proven cross-engine hash representation; dates do not (Spark
      // parquet DATE vs DuckDB DATE round-trip differently through the
      // comparer), and the string is unambiguous.
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("offset_days"), col("active_users"), col("cohort_users"),
        // floor-quantized, NOT round(): integer-ratio doubles can sit a
        // ULP below a decimal .5 midpoint, where Spark's shortest-repr
        // HALF_UP and DuckDB's float round diverge (measured: 41/640).
        Quant.q6(col("active_users").cast("double") /
          col("cohort_users").cast("double")).as("retention"))
  }
}
