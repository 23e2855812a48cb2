package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stream-shaped operators over the `events(event_id, ts, user_id,
  * event_type, value, props)` table. Each transform is written against a
  * plain DataFrame so it runs identically under batch (the oracle path)
  * and `readStream` (the production path); [[hourlyAggStream]] /
  * [[sessionizeStream]] add the watermark/state wiring.
  */
object EventOps {

  /** Tumbling 1-hour aggregation by event type. `window()` keeps the plan
    * Structured-Streaming-compatible (unlike date_trunc). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), graft.Num.rnd(sum("value"), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding 1-hour window every 15 minutes by event type — each event
    * lands in windowDuration/slideDuration = 4 overlapping windows.
    * `window()` with a slide keeps the plan streaming-compatible; the
    * expansion is a projection (explode of 4 window structs per row), not
    * a join. Windows are assigned on the raw `ts` (a derived/truncated
    * column would not inherit the watermark, leaving Append-mode streams
    * without state eviction); the grid is second-aligned, so assignment is
    * identical to the oracle's second-truncated arithmetic — sub-second
    * parts can never cross a whole-second window boundary. */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), graft.Num.rnd(sum("value"), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming wiring for [[slidingAgg]]: watermark + sliding windowed
    * state (state size bounded by horizon/slide windows per key). */
  def slidingAggStream(stream: DataFrame, watermark: String = "2 hours"): DataFrame =
    slidingAgg(stream.withWatermark("ts", watermark))

  /** As-of join — the operator Spark lacks natively: for each `leftType`
    * event, the MOST RECENT `rightType` event of the same user with
    * right.ts ≤ left.ts (ties at equal ts allowed; among equal-ts right
    * rows the largest event_id wins — fully deterministic). Output: one
    * row per left event with (matched_id, matched_value, lag_us), nulls
    * when no prior right event exists.
    *
    * Plan shape: NOT the inequality join (which expands O(|L|·|R|) per
    * user before picking one row — exactly what the DuckDB oracle does and
    * exactly what dies at scale). Both sides union into one relation
    * tagged right-before-left at equal ts, ONE shuffle on user_id, and a
    * running `last(_, ignoreNulls)` window carries the latest right-side
    * attributes forward into each left row — O(|L|+|R|) rows, per-user
    * sort bounded by that user's events, mergeable under AQE. */
  def asofJoin(events: DataFrame, leftType: String, rightType: String): DataFrame = {
    val slim = events.select(col("user_id"), col("ts"), col("event_id"),
      col("value"), col("event_type"))
    val r = slim.filter(col("event_type") === rightType).withColumn("__side", lit(0))
    val l = slim.filter(col("event_type") === leftType).withColumn("__side", lit(1))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("__side").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rCol = (c: String) => when(col("__side") === 0, col(c))
    r.unionByName(l)
      .withColumn("__m_id", last(rCol("event_id"), ignoreNulls = true).over(w))
      .withColumn("__m_ts", last(rCol("ts"), ignoreNulls = true).over(w))
      .withColumn("__m_value", last(rCol("value"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("event_id"), col("user_id"),
        col("__m_id").as("matched_id"),
        graft.Num.rnd(col("__m_value"), 2).as("matched_value"),
        (unix_micros(col("ts")) - unix_micros(col("__m_ts"))).as("lag_us"))
  }

  /** Time-band range join: for each `leftType` event, the number of
    * `rightType` events in the half-open lookback window
    * (left.ts − lookback, left.ts], corpus-wide. The classic range join
    * that naively explodes O(|L|·|R|): here both sides bucket by
    * ⌊ts/lookback⌋ — a right event can only serve lefts in its own or the
    * next bucket, so it emits two bucket keys and ONE equi-join + exact
    * filter covers the window ([[graft.NeighborJoin.withinRadiusBucketed]]
    * applied to time). Shuffle O(|L| + 2|R| + candidates); candidates ≤
    * rights within ±1 bucket of each left, near-linear when the lookback
    * is small against the stream's span. Inner semantics: lefts with zero
    * prior rights are absent. */
  def rangeJoinCount(events: DataFrame, leftType: String, rightType: String,
                     lookbackSeconds: Long = 300): DataFrame = {
    require(lookbackSeconds > 0, s"lookback must be > 0, got $lookbackSeconds")
    val band = lookbackSeconds * 1000000L
    val l = events.filter(col("event_type") === leftType)
      .select(col("event_id"), unix_micros(col("ts")).as("__lus"))
      .withColumn("__b", floor(col("__lus") / band).cast("long"))
    val r = events.filter(col("event_type") === rightType)
      .select(unix_micros(col("ts")).as("__rus"))
      .withColumn("__b", explode(array(
        floor(col("__rus") / band).cast("long"),
        floor(col("__rus") / band).cast("long") + 1)))
    l.join(r, "__b")
      .filter(col("__rus") > col("__lus") - band && col("__rus") <= col("__lus"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_prior"))
  }

  /** Batch sessionization: 30-min-gap sessions per user over
    * second-truncated timestamps (ns/µs parquet precision differences
    * vanish at second grain — both engines see identical instants).
    * Output: one row per session. */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val ts = date_trunc("second", col("ts"))
    val byUser = Window.partitionBy("user_id").orderBy(col("tsec"), col("event_id"))
    events
      .withColumn("tsec", ts)
      .withColumn("prev", lag("tsec", 1).over(byUser))
      .withColumn("is_new",
        when(col("prev").isNull ||
          col("tsec").cast("long") - col("prev").cast("long") > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_no", sum("is_new").over(
        Window.partitionBy("user_id").orderBy(col("tsec"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_no")
      .agg(
        date_format(min("tsec"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count(lit(1)).as("n_events"),
        graft.Num.rnd(sum("value"), 2).as("sum_value"))
      .select("user_id", "session_no", "session_start", "n_events", "sum_value")
  }

  /** Sessionization with a DATA-LEARNED gap threshold — the
    * q44-style learned-parameter composition: the session gap is
    * `factor ×` the corpus's median same-user inter-event gap
    * ([[interEventGapRows]]) instead of a hand-picked constant, so the
    * same pipeline adapts across feeds with minute-grain vs day-grain
    * cadence. The threshold is floored to whole seconds from a
    * double product of exact inputs — bit-identical in any engine, so the
    * oracle recomputes it relationally rather than splicing a literal.
    * The scalar median is a driver-side read BETWEEN two jobs (the q69
    * two-pass pattern — a percentile can't be both computed and compared
    * against inside one declarative pass without a cross join; the scalar
    * is one row). Emitted as a constant `gap_s` column for audit. */
  def adaptiveSessionize(events: DataFrame, factor: Double = 3.0): DataFrame = {
    require(factor > 0, s"factor must be > 0, got $factor")
    val medRow = interEventGapRows(events)
      .agg(percentile(col("__gap_us"), lit(0.5)).as("m")).head()
    // No user has two events → no gaps → no learnable threshold. The
    // session assignment is then threshold-independent (every event is its
    // user's first), and gap_s reports SQL-null — exactly what the
    // oracle's empty-aggregate scalar subquery yields, so the edge case
    // stays hash-verifiable instead of diverging on a made-up default.
    if (medRow.isNullAt(0))
      sessionize(events).withColumn("gap_s", lit(null).cast("long"))
    else {
      val gapS = math.floor(factor * medRow.getDouble(0) / 1e6).toLong
      sessionize(events, gapS).withColumn("gap_s", lit(gapS))
    }
  }

  /** Streaming wiring for [[hourlyAgg]]: event-time watermark + windowed
    * state. Returns the transformed streaming frame ready for
    * `writeStream.outputMode(Append)`. */
  def hourlyAggStream(stream: DataFrame, watermark: String = "2 hours"): DataFrame =
    hourlyAgg(stream.withWatermark("ts", watermark))

  /** As-of stream state per user: unmatched-yet lefts and the rights that
    * could still serve one. Bounded: rights older than the watermark
    * collapse to the single latest (the only one any future left can
    * match), lefts emit as soon as the watermark passes their event time. */
  final case class AsofBuf(rights: Seq[(Long, Long, Double)],
                           lefts: Seq[(Long, Long)])
  final case class AsofOut(event_id: Long, user_id: Long,
                           matched_id: Option[Long],
                           matched_value: Option[Double],
                           lag_us: Option[Long])

  /** Streaming twin of [[asofJoin]] — event-time correct under
    * out-of-order arrival: a left event is FINALIZED only once the
    * watermark passes its event time, because until then an admissible
    * late right with an earlier-but-closer timestamp could still arrive
    * and change the match (the MemoryStream test delivers exactly that).
    *
    * Input: (user_id, ts, event_id, value, isRight). Per user the state
    * holds pending lefts (ts ≤ watermark ⇒ emit) and candidate rights;
    * rights at-or-before the watermark collapse to the single latest by
    * (ts, event_id) — no future left can prefer an older one — so state is
    * O(events within the watermark horizon + 1) per user, not history.
    * Pending lefts arm an event-time timeout just past the earliest one,
    * so no-data micro-batches flush them as the watermark advances.
    * Deterministic ties mirror the batch twin: equal-ts match allowed,
    * max event_id among equal-ts rights. */
  def asofJoinStream(
      events: Dataset[(Long, java.sql.Timestamp, Long, Double, Boolean)],
      watermark: String = "2 hours"): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    val tsUs = (t: java.sql.Timestamp) =>
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    events
      .withWatermark("_2", watermark)
      .groupByKey(_._1)
      .flatMapGroupsWithState[AsofBuf, AsofOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[AsofBuf]) =>
          val prev = state.getOption.getOrElse(AsofBuf(Nil, Nil))
          val batch = rows.toSeq
          val rights = prev.rights ++
            batch.filter(_._5).map(r => (tsUs(r._2), r._3, r._4))
          val lefts = prev.lefts ++
            batch.filterNot(_._5).map(l => (tsUs(l._2), l._3))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, pending) = lefts.partition(_._1 <= wmUs)
          val out = ready.sortBy(l => (l._1, l._2)).map { case (lus, lid) =>
            val m = rights.filter(_._1 <= lus)
            if (m.isEmpty) AsofOut(lid, user, None, None, None)
            else {
              val best = m.maxBy(r => (r._1, r._2))
              // same 2-decimal +1e-9 rounding as the batch twin's Num.rnd,
              // so stream and batch rows are byte-identical
              val v = BigDecimal(best._3 + 1e-9)
                .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
              AsofOut(lid, user, Some(best._2), Some(v), Some(lus - best._1))
            }
          }
          // collapse watermark-sealed rights to the single latest; keep
          // all unsealed
          val (closed, live) = rights.partition(_._1 <= wmUs)
          val kept = (if (closed.isEmpty) Nil
                      else Seq(closed.maxBy(r => (r._1, r._2)))) ++ live
          if (kept.isEmpty && pending.isEmpty) state.remove()
          else {
            state.update(AsofBuf(kept, pending))
            // flush pending lefts as soon as the watermark passes them;
            // strictly above the current watermark by construction
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(pending.map(_._1).min / 1000L + 1000L)
          }
          out.iterator
      }
  }

  /** Ordered funnel: per user, the first completion time of each step in
    * `steps`, where step i+1 must happen STRICTLY AFTER the user's step-i
    * completion (second grain, like [[sessionize]]). `stage` = number of
    * steps completed. The training-data flavor of conversion analysis —
    * e.g. view → click → purchase.
    *
    * Plan shape: ONE shuffle. A single groupBy(user) collects each step's
    * event times into per-step arrays (partial-aggregated map-side), then
    * the greedy chain t₁ = min(l₁), tᵢ = min{t ∈ lᵢ : t > tᵢ₋₁} is pure
    * per-row array arithmetic (codegen'd higher-order functions) — no
    * self-joins, no window. The relational alternative is k−1 chained
    * aggregate+join rounds on user_id (exactly what the DuckDB oracle
    * does); one collect beats k shuffles and its state is each user's OWN
    * events per step, the same bound sessionization already carries. */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"steps must be non-empty and distinct, got $steps")
    val lists = steps.zipWithIndex.map { case (s, i) =>
      collect_list(when(col("event_type") === s,
        date_trunc("second", col("ts")))).as(s"__l$i")
    }
    val grouped = events.groupBy(col("user_id")).agg(lists.head, lists.tail: _*)
    val withTs = steps.indices.foldLeft(grouped) { case (df, i) =>
      val t = if (i == 0) array_min(col("__l0"))
              else array_min(filter(col(s"__l$i"), x => x > col(s"__t${i - 1}")))
      df.withColumn(s"__t$i", t)
    }
    val stepCols = steps.indices.map(i =>
      date_format(col(s"__t$i"), "yyyy-MM-dd HH:mm:ss").as(s"step${i + 1}_ts"))
    val stage = steps.indices.map(i =>
      when(col(s"__t$i").isNotNull, 1L).otherwise(0L)).reduce(_ + _)
    withTs.select(col("user_id") +: stepCols :+ stage.as("stage"): _*)
  }

  /** Per-user rolling last-`n`-events statistics, ordered by (second-
    * truncated ts, event_id): running sum/avg over a bounded row frame plus
    * the frame's actual width (< n during warm-up). ONE shuffle on user_id;
    * the frame is O(n) executor state per open window — the standard
    * feature-engineering shape ("user's average spend over their last 5
    * events") that a 100 TB pipeline computes per key, never per scan. */
  def rollingStats(events: DataFrame, n: Int = 5): DataFrame = {
    require(n >= 1, s"window size must be >= 1, got $n")
    val w = Window.partitionBy("user_id")
      .orderBy(date_trunc("second", col("ts")), col("event_id"))
      .rowsBetween(-(n - 1), Window.currentRow)
    events.select(
      col("user_id"), col("event_id"),
      graft.Num.rnd(sum("value").over(w), 2).as("roll_sum"),
      graft.Num.rnd(avg("value").over(w), 4).as("roll_avg"),
      count(lit(1)).over(w).as("n_window"))
  }

  /** Rolling-stats stream state per user: the ≤ n−1 most recent SEALED
    * (tsUs, event_id, value) rows — the frame prefix every future event
    * needs — plus the not-yet-sealed arrivals. */
  final case class RollBuf(tail: Seq[(Long, Long, Double)],
                           buf: Seq[(Long, Long, Double)])
  final case class RollOut(user_id: Long, event_id: Long,
                           roll_sum: Double, roll_avg: Double, n_window: Long)

  /** Streaming twin of [[rollingStats]] — emits each event's last-`n`
    * rolling sum/avg exactly when the event becomes WATERMARK-FINAL.
    * An event at (tsec, event_id) is sealed once the watermark passes
    * tsec: any later arrival has ts > wm ≥ tsec, sorts strictly after it
    * in the (tsec, event_id) frame order, and a backward-looking row frame
    * can't be changed by rows that sort after — the same
    * finalize-under-the-watermark argument as [[asofJoinStream]].
    *
    * Input: (user_id, ts, event_id, value), second-truncated upstream or
    * not (truncation applied here). State per user is O(n): sealed rows
    * collapse to the last n−1 (all any future frame can reach) plus the
    * unsealed arrivals within the watermark horizon. A timeout just past
    * the earliest unsealed event flushes it on no-data micro-batches. */
  def rollingStatsStream(
      events: Dataset[(Long, java.sql.Timestamp, Long, Double)],
      n: Int = 5, watermark: String = "2 hours"): Dataset[RollOut] = {
    require(n >= 1, s"window size must be >= 1, got $n")
    import events.sparkSession.implicits._
    val tsUs = (t: java.sql.Timestamp) =>
      t.getTime / 1000 * 1000000L // second truncation, like the batch twin
    def rnd(v: Double, s: Int): Double =
      BigDecimal(v + 1e-9).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    events
      .withWatermark("_2", watermark)
      .groupByKey(_._1)
      .flatMapGroupsWithState[RollBuf, RollOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[RollBuf]) =>
          val prev = state.getOption.getOrElse(RollBuf(Nil, Nil))
          val buf = prev.buf ++ rows.map(r => (tsUs(r._2), r._3, r._4))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, pending) = buf.partition(_._1 <= wmUs)
          val sealedOrder = ready.sortBy(r => (r._1, r._2))
          // running frame: previous tail + sealed-so-far, windowed to n
          var frame = prev.tail
          val out = sealedOrder.map { case (_, eid, v) =>
            frame = (frame :+ (0L, eid, v)).takeRight(n)
            val vs = frame.map(_._3)
            RollOut(user, eid, rnd(vs.sum, 2), rnd(vs.sum / vs.size, 4), vs.size.toLong)
          }
          val tail = (prev.tail ++ sealedOrder).takeRight(n - 1)
          if (tail.isEmpty && pending.isEmpty) state.remove()
          else {
            state.update(RollBuf(tail, pending))
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(pending.map(_._1).min / 1000L + 1000L)
          }
          out.iterator
      }
  }

  /** Daily active users + 7-day rolling distinct actives per day. A
    * rolling COUNT DISTINCT has no window form in either engine; the
    * scalable construction turns it into plain aggregation: dedupe to
    * (user, day) pairs, then each pair COVERS days d..d+6, so exploding the
    * 7-day coverage and counting distinct users per covered day IS the
    * trailing-window distinct — two hash aggs + one 7× projection, no
    * per-day rescans. Output: one row per day WITH events (day, dau,
    * dau7d); the trailing window is [day−6, day]. */
  def rollingActiveUsers(events: DataFrame): DataFrame = {
    val pairs = events.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val dau = pairs.groupBy("day").agg(count(lit(1)).as("dau"))
    val dau7 = pairs
      .select(col("user_id"), explode(sequence(lit(0), lit(6))).as("o"), col("day"))
      .select(col("user_id"), date_add(col("day"), col("o")).as("day"))
      .groupBy("day").agg(countDistinct("user_id").as("dau7d"))
    dau.join(dau7, "day")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("dau7d"))
  }

  /** Rolling-DAU stream state per covered day: the users seen ON the day
    * (o = 0 contributions) and the users seen in its trailing 7-day
    * window (any o). */
  final case class DauBuf(own: Set[Long], win: Set[Long])
  final case class DauOut(day: String, dau: Long, dau7d: Long)

  /** Streaming twin of [[rollingActiveUsers]] — emits each event-day's
    * (dau, dau7d) exactly when the day becomes WATERMARK-FINAL. The batch
    * twin's coverage-explode IS the streaming decomposition: each (user,
    * event) contributes to day d..d+6 BEFORE the watermark is declared, so
    * the stateful op groups by COVERED DAY and day D's window [D−6, D]
    * seals once the watermark passes D's end — every contributing event
    * has ts ≤ end(D) < wm, and later arrivals are watermark-filtered.
    *
    * State per open day is the exact distinct-user sets (own + window) —
    * O(DAU·7) across the watermark horizon, the price of hash-exact
    * parity with the batch twin; at 100 TB swap the sets for HLL sketches
    * (approx_count_distinct's backing structure) for O(kB)/day state with
    * the usual error bound. Event-time timeouts flush sealed days on
    * no-data micro-batches; days with no own-day events (pure trailing
    * coverage) emit nothing, matching the batch inner join. */
  def rollingActiveUsersStream(
      events: Dataset[(Long, java.sql.Timestamp)],
      watermark: String = "2 hours"): Dataset[DauOut] = {
    import events.sparkSession.implicits._
    val covered = events.flatMap { case (u, t) =>
      val day = Math.floorDiv(t.getTime, 86400000L) // session is pinned UTC
      (0 to 6).map(o => (day + o, u, o == 0, t))
    }
    covered
      .withWatermark("_4", watermark)
      .groupByKey(_._1)
      .flatMapGroupsWithState[DauBuf, DauOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (day, rows, state: GroupState[DauBuf]) =>
          val prev = state.getOption.getOrElse(DauBuf(Set.empty, Set.empty))
          var own = prev.own
          var win = prev.win
          rows.foreach { r => win += r._2; if (r._3) own += r._2 }
          val sealMs = (day + 1) * 86400000L
          if (state.getCurrentWatermarkMs() >= sealMs) {
            state.remove()
            if (own.nonEmpty)
              Iterator.single(DauOut(
                java.time.LocalDate.ofEpochDay(day).toString,
                own.size.toLong, win.size.toLong))
            else Iterator.empty
          } else {
            state.update(DauBuf(own, win))
            state.setTimeoutTimestamp(sealMs)
            Iterator.empty
          }
      }
  }

  /** Funnel stream state per user: committed step-completion epoch-seconds
    * (a prefix of the step chain, each ≤ the watermark when committed) and
    * the not-yet-sealed events. */
  final case class FunnelBuf(chain: Seq[Long], buf: Seq[(Long, Int)])
  final case class FunnelOut(user_id: Long, step: Int, step_ts: Long)

  /** Streaming twin of [[funnel]] — emits (user, step, completion second)
    * exactly when a step commitment becomes WATERMARK-FINAL. Step i's
    * completion tᵢ = min{ts of step-i events > tᵢ₋₁} is committed only
    * once the watermark passes tᵢ: any later-arriving event has ts > wm ≥
    * tᵢ, so it can neither improve the min NOR disturb the committed
    * prefix — the same finalize-under-the-watermark argument as
    * [[asofJoinStream]], applied to a chain. State per user is the
    * committed chain (≤ |steps| longs) plus only the events still above
    * the watermark: O(horizon), not history. An event-time timeout at the
    * earliest unsealed event flushes commitments through no-data batches.
    *
    * Input: (user_id, event-time ts, step index 0..k−1). Output rows union
    * to exactly the non-null step columns of batch [[funnel]] once the
    * watermark passes the last event (OpsSpec pins this equivalence with
    * out-of-order and late-but-admissible deliveries). */
  def funnelStream(events: Dataset[(Long, java.sql.Timestamp, Int)],
                   nSteps: Int,
                   watermark: String = "2 hours"): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    require(nSteps >= 1, s"nSteps must be >= 1, got $nSteps")
    events
      .withWatermark("_2", watermark)
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelBuf, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[FunnelBuf]) =>
          val prev = state.getOption.getOrElse(FunnelBuf(Nil, Nil))
          val buf = prev.buf ++ rows.map(r => (r._2.getTime / 1000, r._3))
          val wmSec = state.getCurrentWatermarkMs() / 1000
          val (finalized, open) = buf.partition(_._1 <= wmSec)
          // extend the committed chain greedily over the sealed events;
          // each newly committed step must itself be watermark-final
          var chain = prev.chain
          val out = scala.collection.mutable.ListBuffer.empty[FunnelOut]
          var advanced = true
          while (advanced && chain.size < nSteps) {
            val need = chain.size // next step index
            val after = chain.lastOption.getOrElse(Long.MinValue)
            val cand = finalized.collect {
              case (ts, s) if s == need && ts > after => ts }
            advanced = false
            if (cand.nonEmpty && cand.min <= wmSec) {
              chain = chain :+ cand.min
              out += FunnelOut(user, need + 1, cand.min)
              advanced = true
            }
          }
          // sealed events can't contribute further: steps they could
          // complete are committed or permanently blocked below the chain
          if (chain.size == nSteps && open.isEmpty) {
            state.remove()
          } else {
            state.update(FunnelBuf(chain, open))
            if (open.nonEmpty)
              state.setTimeoutTimestamp(open.map(_._1).min * 1000 + 1000)
          }
          out.iterator
      }
  }

  /** Open-session buffer: (epoch-second, value) events not yet emitted —
    * only sessions the watermark has not closed, so state size is bounded
    * by the watermark horizon's events per user, not history. */
  final case class SessBuf(events: Seq[(Long, Double)])
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                              n_events: Long, sum_value: Double)

  /** Production streaming sessionization: event-time WATERMARK + event-time
    * TIMEOUT, correct under out-of-order arrival (the per-batch-ordered
    * assumption of rounds 1–3 is gone).
    *
    * Protocol, per user: state buffers the OPEN sessions' events; each
    * invocation merges the batch's events (Spark has already dropped rows
    * older than the watermark), re-sorts the buffer, splits it into
    * gap-delimited sessions, and emits exactly the sessions the watermark
    * has sealed — last event + gap < watermark means no admissible late
    * event can extend or reorder them. Open sessions stay buffered and arm
    * an event-time timeout at (last + gap); when the watermark passes it,
    * Spark re-invokes the function with no data (no-data micro-batches) and
    * the same seal-and-emit logic flushes them. Session identity (start,
    * count, sum) is order-insensitive WITHIN a second, and same-second
    * events always share a session, so the emitted rows equal batch
    * [[sessionize]] whenever no event arrives later than the watermark
    * allows (OpsSpec pins this with shuffled out-of-order batches).
    *
    * Late-beyond-watermark events are dropped by Spark before the function
    * runs — the documented streaming contract; the batch twin remains the
    * backfill path. */
  def sessionizeStream(events: Dataset[(Long, java.sql.Timestamp, Double)],
                       gapSeconds: Long = 1800,
                       watermark: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("_2", watermark)
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessBuf, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[SessBuf]) =>
          val merged =
            (state.getOption.map(_.events).getOrElse(Seq.empty) ++
              rows.map(r => (r._2.getTime / 1000, r._3))).sortBy(_._1)
          // split into gap-delimited sessions (buffer is time-sorted)
          val sessions = merged.foldLeft(List.empty[List[(Long, Double)]]) {
            case (acc, e) => acc match {
              case cur :: rest if e._1 - cur.head._1 <= gapSeconds =>
                (e :: cur) :: rest // cur is newest-first; head = last event
              case _ => List(e) :: acc
            }
          }.map(_.reverse).reverse
          val wmSec = state.getCurrentWatermarkMs() / 1000
          val (closed, open) = sessions.partition(s => s.last._1 + gapSeconds < wmSec)
          val out = closed.map(s => SessionOut(user,
            new java.sql.Timestamp(s.head._1 * 1000), s.size.toLong, s.map(_._2).sum))
          if (open.isEmpty) state.remove()
          else {
            state.update(SessBuf(open.flatten))
            // arm at the EARLIEST open session's close point so it flushes
            // as soon as the watermark passes it (not when the newest one
            // does); strictly above the current watermark by construction:
            // open ⇒ last + gap ≥ wmSec ⇒ (last+gap)*1000 + 1000 > wmMs
            state.setTimeoutTimestamp((open.head.last._1 + gapSeconds) * 1000 + 1000)
          }
          out.iterator
      }
  }

  /** N-day retention matrix: users are cohorted by their FIRST active day;
    * each cell counts how many of that cohort are active again `offset`
    * days later (offset 0 = cohort size), with the retention ratio
    * alongside. The naive construction — self-join activity against a
    * first-seen relation on user_id — shuffles the full activity table
    * twice. This one folds the join away: ONE shuffle on user_id builds
    * each user's distinct-day set (collect_set is bounded by the calendar
    * span, never event volume, and partial aggregation dedups map-side),
    * the cohort day is `array_min` of that set, and exploding
    * (cohort_day, offset) pairs leaves each (user, offset) unique — so the
    * final count(*) IS the distinct-user count, no countDistinct shuffle.
    * The ratio window runs over the tiny aggregated matrix (≤ days²). */
  def retentionMatrix(events: DataFrame, maxOffset: Int = 14): DataFrame = {
    require(maxOffset >= 0, s"maxOffset must be >= 0, got $maxOffset")
    val offsets = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy("user_id")
      .agg(collect_set("day").as("days"))
      .select(array_min(col("days")).as("cohort_day"),
        explode(col("days")).as("day"))
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .filter(col("day_offset") <= maxOffset)
    val m = offsets.groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
    val wc = Window.partitionBy("cohort_day")
    m.select(
      date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
      col("day_offset"), col("n_users"),
      graft.Num.rnd(col("n_users") /
        max(when(col("day_offset") === 0, col("n_users"))).over(wc), 4)
        .as("retention"))
  }

  /** First-order event-type transition matrix: per user, each event's
    * successor type via `lead` over (ts, event_id) — one shuffle on
    * user_id whose per-partition sort is bounded by that user's events —
    * then a hash count over the tiny (from, to) cross-type matrix and a
    * row-probability window over it. The from/to matrix is O(types²)
    * regardless of data scale, so everything after the lead window is
    * broadcast-sized. */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val counts = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    counts.select(col("from_type"), col("to_type"), col("n"),
      graft.Num.rnd(col("n") / sum("n").over(Window.partitionBy("from_type")), 4)
        .as("p"))
  }

  /** Inter-event gap distribution per event type: for every event with a
    * same-user predecessor (any type), the time since that predecessor,
    * aggregated per the LATER event's type — the arrival-process statistic
    * behind session-gap tuning, bot detection and retention models.
    *
    * Plan: ONE shuffle on user_id for the lag window (per-user bounded
    * sort), then a partial-aggregated shuffle on event_type over the
    * pre-computed gaps. All gap arithmetic stays exact BIGINT micros;
    * seconds appear only in the final rounded projection (sum/n division
    * of exact integers — engine-stable, no double accumulation order).
    * Median via the sort-based exact `percentile` (the q16-proven
    * quantile_cont pairing). */
  def interEventGaps(events: DataFrame): DataFrame =
    interEventGapRows(events)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_gaps"),
        // decimal(38,0) sum: exact at any scale (DuckDB's BIGINT sum
        // promotes to HUGEINT; a raw long sum here would ANSI-overflow
        // first at ~2^63 total micros) — cast to double only at the end,
        // the same narrowing both engines apply before the division.
        graft.Num.rnd(sum(col("__gap_us").cast("decimal(38,0)")).cast("double") /
          count(lit(1)) / lit(1e6), 4).as("avg_gap_s"),
        graft.Num.rnd(percentile(col("__gap_us"), lit(0.5)) / lit(1e6), 4)
          .as("median_gap_s"),
        max(col("__gap_us")).as("max_gap_us"))

  /** The windowed half of [[interEventGaps]]: one row per event with a
    * same-user predecessor — (user_id, event_id, event_type, __gap_us).
    * Ordered by (__us, event_id), identical to (ts, event_id): micros are
    * injective on the microsecond-grain timestamps. This is the relation
    * [[interEventGapsStream]] reproduces incrementally. */
  def interEventGapRows(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("__us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("__us"))
      .withColumn("__gap_us", col("__us") - lag(col("__us"), 1).over(w))
      .filter(col("__gap_us").isNotNull)
      .drop("__us")
  }

  /** Daily event-type count pivot — long-to-wide: one row per day, one
    * column per event type. The type set is data-dependent (the same
    * contract as the one-hot encoder's `get_dummies` schema): a
    * config-time distinct scan discovers it, then the pivot is spelled as
    * one conditional count per type in a single groupBy — NOT
    * `Dataset.pivot`, which even with explicit values plans a two-phase
    * (day, type) pre-aggregation + pivotfirst, i.e. TWO exchanges. The
    * conditional-count spelling is one partial/final HashAggregate pair
    * over ONE exchange carrying a single wide row per (map, day), and
    * `count` never returns null so absent cells are 0 by construction
    * (PropertySpec pins the plan shape). Wide-side cardinality is the
    * type vocabulary; this operator is for bounded vocabularies (the
    * unbounded case belongs in long form). */
  def pivotDailyCounts(events: DataFrame): DataFrame = {
    val days = events
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
    // null types can't name a column — they are skipped (their rows still
    // count toward no bucket, exactly like Dataset.pivot drops them)
    val types = events.select("event_type")
      .where(col("event_type").isNotNull).distinct()
      .collect().map(_.getString(0)).sorted
    require(!types.contains("day"),
      "event_type value 'day' collides with the pivot's day column")
    if (types.isEmpty) days.select("day").distinct()
    else days.groupBy("day").agg(
      count(when(col("event_type") === lit(types.head), 1)).as(types.head),
      types.tail.toSeq.map(t =>
        count(when(col("event_type") === lit(t), 1)).as(t)): _*)
  }

  /** Hourly volume anomaly detection — the data-quality monitor over an
    * event feed: per (hour, type) counts from [[hourlyAgg]], then each
    * type's hours scored against its own median/MAD
    * ([[graft.Summary.madOutliers]]); an hour whose volume sits k robust
    * deviations from the type's median is flagged. Pure composition: the
    * hourly aggregation reduces the corpus to a (hours × types)-sized
    * relation BEFORE the robust-stats passes, so the two percentile scans
    * read pre-aggregated rows, not events. */
  def hourlyAnomalies(events: DataFrame, k: Double = 3.0): DataFrame =
    graft.Summary.madOutliers(
      hourlyAgg(events)
        .select(col("hour_start"), col("event_type"),
          col("n_events").cast("double").as("n_events")),
      "n_events", Seq("event_type"), k)

  /** Retention-stream state per user: the sealed cohort day (epoch days,
    * None until the watermark passes its START), the offsets already
    * emitted (≤ maxOffset+1 of them — O(1)), and the day set buffered
    * while the cohort candidate can still be lowered (watermark-horizon
    * bounded). */
  final case class RetBuf(cohortDay: Option[Long], emitted: Set[Int],
                          pending: Set[Long])
  final case class RetOut(cohort_day: String, day_offset: Long)

  /** Streaming twin of [[retentionMatrix]]'s per-user cell extraction:
    * emits one (cohort_day, day_offset) increment the first time a user is
    * seen at that offset; a downstream streaming count per cell IS the
    * retention matrix (tests pin cell counts against batch).
    *
    * Correctness under out-of-order arrival hinges on ONE fact: a user's
    * cohort day only ever moves EARLIER, and once the watermark passes the
    * START of the earliest day seen, any admissible late event has
    * ts > wm ≥ that start, so its day cannot be earlier — the cohort is
    * final. Until then nothing is emitted (an emitted offset would be
    * relative to a revisable cohort); after sealing, offsets are
    * append-only facts — (user, day) presence is monotone — so each
    * distinct admissible day emits exactly once, immediately. State is
    * O(maxOffset) sealed + the unsealed horizon, with an event-time
    * timeout to seal through no-data micro-batches. */
  def retentionMatrixStream(
      events: Dataset[(Long, java.sql.Timestamp)], maxOffset: Int = 14,
      watermark: String = "2 hours"): Dataset[RetOut] = {
    import events.sparkSession.implicits._
    require(maxOffset >= 0, s"maxOffset must be >= 0, got $maxOffset")
    val MsPerDay = 86400000L
    val fmt = (day: Long) =>
      java.time.LocalDate.ofEpochDay(day).toString
    events
      .withWatermark("_2", watermark)
      .groupByKey(_._1)
      .flatMapGroupsWithState[RetBuf, RetOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[RetBuf]) =>
          val prev = state.getOption.getOrElse(RetBuf(None, Set.empty, Set.empty))
          val days = prev.pending ++
            rows.map(r => Math.floorDiv(r._2.getTime, MsPerDay))
          val wmDay = Math.floorDiv(state.getCurrentWatermarkMs(), MsPerDay)
          val (cohort, rest) = prev.cohortDay match {
            case Some(c) => (Some(c), days)
            case None if days.nonEmpty && wmDay >= days.min =>
              (Some(days.min), days) // sealed: no admissible earlier day
            case None => (None, days)
          }
          val out = cohort match {
            case None => Nil
            case Some(c) =>
              rest.toSeq.map(d => (d - c).toInt).distinct
                .filter(o => o >= 0 && o <= maxOffset && !prev.emitted(o))
                .sorted.map(o => RetOut(fmt(c), o.toLong))
          }
          val emitted = prev.emitted ++ out.map(_.day_offset.toInt)
          // once sealed, pending days are spent on arrival — drop them
          state.update(RetBuf(cohort, emitted,
            if (cohort.isDefined) Set.empty else rest))
          if (cohort.isEmpty && rest.nonEmpty)
            // seal as soon as the watermark reaches the candidate's start
            state.setTimeoutTimestamp(rest.min * MsPerDay + 1000L)
          out.iterator
      }
  }

  /** Transition-stream state per user: the last SEALED event (all a future
    * transition needs) plus the not-yet-sealed arrivals. */
  final case class TransBuf(last: Option[(Long, Long, String)],
                            buf: Seq[(Long, Long, String)])
  final case class TransOut(user_id: Long, from_type: String, to_type: String)

  /** Per-user feature export — the feature-store materialization a
    * CTR-style trainer joins against: activity volume, type and active-day
    * cardinalities, first/last seen, value totals. ONE groupBy on user_id;
    * the two exact count-distincts ride Catalyst's Expand (2× map volume,
    * still one partial-aggregated exchange — the q103 trade, and
    * `approx_count_distinct` is the documented swap at extreme scale).
    * avg_value is the explicit sum/count division of the shared rounding
    * convention. */
  def userFeatures(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        count_distinct(col("event_type")).as("n_types"),
        count_distinct(to_date(col("ts"))).as("n_days"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("first_seen"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("last_seen"),
        graft.Num.rnd(sum("value"), 2).as("total_value"),
        graft.Num.rnd(sum("value") / count(lit(1)), 4).as("avg_value"))

  /** The shared sealed-prefix kernel behind [[eventTransitionsStream]]
    * and [[interEventGapsStream]]: per user, events become FINAL once the
    * watermark passes their (tsUs, event_id) position — any admissible
    * late arrival has ts > wm and sorts strictly after every sealed row,
    * so a fold over the sealed prefix is immutable (the
    * [[asofJoinStream]] argument applied to adjacency). State per user is
    * O(1) sealed (just the last event — the left endpoint of whatever the
    * fold emits next) plus the unsealed horizon; a timeout just past the
    * earliest unsealed event flushes it on no-data micro-batches. `emit`
    * maps each (user, predecessor, event) adjacency to the twin's output
    * row. */
  private def sealedAdjacencyStream[T](
      events: Dataset[(Long, java.sql.Timestamp, Long, String)],
      watermark: String,
      emit: (Long, (Long, Long, String), (Long, Long, String)) => T)(
      implicit te: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    import events.sparkSession.implicits._
    val tsUs = (t: java.sql.Timestamp) =>
      t.getTime / 1000 * 1000000L + t.getNanos / 1000L
    events
      .withWatermark("_2", watermark)
      .groupByKey(_._1)
      .flatMapGroupsWithState[TransBuf, T](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[TransBuf]) =>
          val prev = state.getOption.getOrElse(TransBuf(None, Nil))
          val buf = prev.buf ++ rows.map(r => (tsUs(r._2), r._3, r._4))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, pending) = buf.partition(_._1 <= wmUs)
          val ordered = ready.sortBy(r => (r._1, r._2))
          var last = prev.last
          val out = ordered.flatMap { e =>
            val row = last.map(l => emit(user, l, e))
            last = Some(e)
            row
          }
          // `last` alone never expires: it is the left endpoint of the
          // next adjacency whenever this user speaks again — one tuple
          // per live user, the irreducible state of the operator.
          state.update(TransBuf(last, pending))
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(pending.map(_._1).min / 1000L + 1000L)
          out.iterator
      }
  }

  /** Streaming twin of [[eventTransitions]]'s per-user transition
    * extraction: emits each (from_type, to_type) edge exactly when its
    * LATER endpoint becomes watermark-final ([[sealedAdjacencyStream]]).
    * The count/probability aggregation downstream is an ordinary streaming
    * groupBy over these edges; tests pin edge-set equality against the
    * batch twin. */
  def eventTransitionsStream(
      events: Dataset[(Long, java.sql.Timestamp, Long, String)],
      watermark: String = "2 hours"): Dataset[TransOut] = {
    import events.sparkSession.implicits._
    sealedAdjacencyStream(events, watermark,
      (user, l, e) => TransOut(user, l._3, e._3))
  }

  final case class GapOut(user_id: Long, event_id: Long,
                          event_type: String, gap_us: Long)

  /** Streaming twin of [[interEventGaps]]' per-event gap rows — emits each
    * event's distance to its same-user predecessor exactly when the event
    * becomes watermark-final ([[sealedAdjacencyStream]]: the gap and the
    * transition edge are the same adjacency read through different
    * projections). The per-type rollup of [[interEventGaps]] is then a
    * plain streaming aggregation downstream. First event per user emits
    * nothing (no predecessor), exactly like batch's null-lag filter. */
  def interEventGapsStream(
      events: Dataset[(Long, java.sql.Timestamp, Long, String)],
      watermark: String = "2 hours"): Dataset[GapOut] = {
    import events.sparkSession.implicits._
    sealedAdjacencyStream(events, watermark,
      (user, l, e) => GapOut(user, e._2, e._3, e._1 - l._1))
  }

  final case class HHBuf(counts: Map[String, Long], total: Long)
  final case class HeavyOut(window_start: java.sql.Timestamp, token: String,
                            n: Long, share: Double)

  /** Streaming heavy hitters: per event-time TUMBLING window, every token
    * whose share of that window's token stream exceeds `minShare` — the
    * feed-monitoring twin of [[TextAnalysis.heavyHitters]] (which stays
    * the corpus/batch path with its Misra–Gries candidate sketch; a single
    * window's vocabulary is Zipf-bounded, so exact per-window counts are
    * the right state here, and the output is exact like the batch twin).
    *
    * State per LIVE window: one token→count map + the running total,
    * keyed by window start. A window is sealed and emitted EXACTLY ONCE
    * when the watermark passes its end (EventTimeTimeout just past the
    * window end flushes on no-data micro-batches), then its state is
    * removed — live state is O(windows inside the watermark horizon ×
    * window vocabulary), never history. Tokenization and the > ⌊minShare·N⌋
    * threshold replicate the batch operator; `share` is rounded with the
    * same +1e-9 HALF_UP convention so stream rows are byte-comparable to a
    * batch recomputation (stream-vs-batch pinned by OpsSpec). */
  def heavyHittersStream(docs: Dataset[(java.sql.Timestamp, String)],
                         minShare: Double, windowSeconds: Long = 3600,
                         watermark: String = "2 hours"): Dataset[HeavyOut] = {
    require(minShare > 0 && minShare < 1,
      s"minShare must be in (0, 1), got $minShare")
    require(windowSeconds >= 1, s"windowSeconds must be >= 1, got $windowSeconds")
    import docs.sparkSession.implicits._
    val toks = docs.flatMap { case (ts, text) =>
      text.split("\\s+").iterator.filter(_.nonEmpty).map(t => (ts, t))
    }
    toks
      .withWatermark("_1", watermark)
      // floorDiv, not /: integer division truncates toward zero, so a
      // pre-1970 (negative-millis) event time would bin into the window
      // ABOVE it, disagreeing with the batch twin's floor() assignment
      // (ADVICE r8). floorDiv floors for all timestamps.
      .groupByKey { case (ts, _) =>
        Math.floorDiv(Math.floorDiv(ts.getTime, 1000L), windowSeconds) * windowSeconds }
      .flatMapGroupsWithState[HHBuf, HeavyOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (winStartSec, rows, state: GroupState[HHBuf]) =>
          val prev = state.getOption.getOrElse(HHBuf(Map.empty, 0L))
          var counts = prev.counts
          var total = prev.total
          rows.foreach { case (_, t) =>
            counts = counts.updated(t, counts.getOrElse(t, 0L) + 1L)
            total += 1L
          }
          val endMs = (winStartSec + windowSeconds) * 1000L
          if (state.getCurrentWatermarkMs() >= endMs) {
            val thresh = math.floor(minShare * total).toLong
            val out = counts.toSeq.filter(_._2 > thresh).sortBy(_._1)
              .map { case (t, n) =>
                HeavyOut(new java.sql.Timestamp(winStartSec * 1000L), t, n,
                  BigDecimal(1e-9 + n.toDouble / total)
                    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
              }
            state.remove()
            out.iterator
          } else {
            state.update(HHBuf(counts, total))
            state.setTimeoutTimestamp(endMs + 1000L)
            Iterator.empty
          }
      }
  }
}
