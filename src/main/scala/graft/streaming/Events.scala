package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Event-stream operators (engine extension; the reference has no streaming
  * surface, SURVEY §2.12). Every windowing shape is defined ONCE as a
  * transformation on a DataFrame, so the same code runs:
  *  - batch: over the static events table (oracle-checkable below), and
  *  - streaming: over `readStream` input with a watermark
  *    ([[withWatermarked]]) — Structured Streaming's incremental engine
  *    executes the identical logical plan; see StreamingSpec for the
  *    MemoryStream-driven runs.
  *
  * Timestamps are truncated to seconds before sessionizing so batch
  * (DuckDB ns precision) and Spark (µs precision) agree on gap boundaries.
  */
object Events {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "e1_tumbling_hourly" -> e1TumblingHourly,
    "e2_sliding_halfhour" -> e2SlidingHalfhour,
    "e3_sessions" -> e3Sessions,
    "e4_json_props" -> e4JsonProps,
    "e5_asof_attribution" -> e5AsofAttribution
  )

  /** Tumbling 1-hour windows per event type — the canonical streaming agg
    * (`window()` is the same expression batch or stream).
    */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), col("total"))

  def e1TumblingHourly: Q = (s, dir) =>
    tumblingHourly(Tables.events(s, dir))
      .orderBy(col("w_start"), col("event_type"))

  /** Sliding windows: 1 hour long, every 30 minutes — each event lands in
    * two windows.
    */
  def slidingHalfhour(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"))

  def e2SlidingHalfhour: Q = (s, dir) =>
    slidingHalfhour(Tables.events(s, dir))
      .orderBy(col("w_start"), col("event_type"))

  /** Per-user session windows with a 10-minute inactivity gap, via the
    * built-in `session_window`. Boundary semantics (verified empirically):
    * an event exactly `gap` after the previous one MERGES into the session
    * — Spark merges touching windows — so a new session starts only when
    * the gap is STRICTLY greater than the timeout. Batch formulation; the
    * streaming twin uses the same expression, or flatMapGroupsWithState
    * for custom state (StreamingSpec).
    */
  def sessions(events: DataFrame): DataFrame =
    sessionCore(events.withColumn("tss", date_trunc("second", col("ts"))))

  /** Streaming twin of [[sessions]]: the identical session expression over
    * a watermarked event time — open sessions live in the state store,
    * finalize once the watermark passes their gap, and (because the state
    * store is checkpointed) survive a stop/restart of the query
    * exactly-once (spec'd in StreamingSpec's checkpoint-recovery case).
    */
  def sessionsWatermarked(stream: DataFrame,
      delay: String = "30 minutes"): DataFrame =
    sessionCore(stream
      .withColumn("tss", date_trunc("second", col("ts")))
      .withWatermark("tss", delay))

  /** The ONE session definition both modes share (module invariant: batch
    * and stream run the same logical plan).
    */
  private def sessionCore(truncated: DataFrame): DataFrame =
    truncated
      .groupBy(session_window(col("tss"), "10 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("s_start"),
        col("user_id"), col("n_events"), col("total"))

  def e3Sessions: Q = (s, dir) =>
    sessions(Tables.events(s, dir))
      .orderBy(col("user_id"), col("s_start"))

  /** Semi-structured props: JSON field extraction + aggregation. */
  def e4JsonProps: Q = (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** As-of join (engine extension — the standard event/feature-store
    * operator Spark has no native keyword for): each purchase matched to
    * the same user's LATEST click at-or-before it.
    *
    * Deliberately NOT a range join: both sides union on (user_id, ts) and
    * a `last(click_ts) ignore nulls` over the preceding-rows frame carries
    * the most recent click forward — ONE shuffle on user_id + one sort,
    * O(n log n) with no join explosion and no interval bound to tune.
    * This is the as-of shape that survives 100 TB: the range-join
    * formulation (clickToPurchase) multiplies candidates per interval,
    * while this one streams each user's timeline exactly once. Ties at
    * the same instant: clicks sort before purchases (kind 0 < 1), so
    * at-or-before includes same-timestamp clicks.
    *
    * Oracle: DuckDB's native ASOF LEFT JOIN — an independent algorithm
    * (binary search per probe) validating the window formulation.
    */
  def asofLatestClick(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("kind"),
        col("event_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("kind"),
        col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionAll(purchases)
      .withColumn("click_ts",
        last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_at"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_at"))
  }

  def e5AsofAttribution: Q = (s, dir) =>
    asofLatestClick(Tables.events(s, dir))
      .orderBy(col("user_id"), col("event_id"))

  /** Streaming entry: the same transforms over a file stream with event-time
    * watermarking — late data beyond 30 minutes is dropped from state.
    */
  def withWatermarked(stream: DataFrame): DataFrame =
    tumblingHourly(stream.withWatermark("ts", "30 minutes"))

  /** Attribution join: each purchase matched to the same user's clicks in
    * the preceding hour. Defined once; in streaming both sides carry
    * watermarks and the time-interval condition bounds the join state
    * (Structured Streaming's stream-stream inner join), in batch it is a
    * plain range join.
    */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"),
      col("ts").as("click_ts"))
    val p = purchases.select(col("user_id").as("p_user"),
      col("ts").as("purchase_ts"), col("value"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("p_user").as("user_id"),
        date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss")
          .as("purchase_at"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_at"),
        col("value"))
  }

  // ---- DuckDB oracles (batch-equivalent semantics) -------------------------

  def oracles: Map[String, String] = Map(
    "e1_tumbling_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS w_start,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "e2_sliding_halfhour" ->
      """WITH starts AS (
        |  SELECT event_type, date_trunc('hour', ts)
        |      + to_minutes(30 * (extract(minute FROM ts) // 30)) AS s0
        |  FROM events)
        |, expanded AS (
        |  SELECT event_type, s0 AS w_start FROM starts
        |  UNION ALL
        |  SELECT event_type, s0 - INTERVAL 30 MINUTE FROM starts)
        |SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
        |  event_type, count(*) AS n
        |FROM expanded GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin,
    "e3_sessions" ->
      """WITH t AS (SELECT user_id, value,
        |    date_trunc('second', ts) AS tss FROM events),
        |flagged AS (SELECT user_id, value, tss,
        |  CASE WHEN tss - lag(tss) OVER (PARTITION BY user_id ORDER BY tss)
        |      > INTERVAL 10 MINUTE OR
        |    lag(tss) OVER (PARTITION BY user_id ORDER BY tss) IS NULL
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM t),
        |sess AS (SELECT user_id, value, tss,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY tss
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT strftime(min(tss), '%Y-%m-%d %H:%M:%S') AS s_start,
        |  user_id, count(*) AS n_events, round(sum(value), 2) AS total
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, s_start""".stripMargin,
    "e4_json_props" ->
      """SELECT event_type, count(*) AS n,
        |  sum(json_extract_string(props, '$.k')::INT)::BIGINT AS sum_k,
        |  max(json_extract_string(props, '$.k')::INT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "e5_asof_attribution" ->
      """WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT p.user_id AS user_id, p.event_id AS event_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_at,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_at
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin
  )
}
