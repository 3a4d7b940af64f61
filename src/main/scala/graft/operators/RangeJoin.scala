package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Binned point-in-interval range join (engine extension; the reference has
  * no join surface at all — SURVEY §2.5 — and Spark itself plans a
  * non-equi time-containment join as BroadcastNestedLoopJoin, which is
  * O(points·intervals) compares and requires one side to fit in memory).
  *
  * The binned form is the shape that survives 100 TB on BOTH sides:
  * quantize time into fixed-width bins, give each point its one covering
  * bin, explode each interval into the bins it overlaps (a bounded
  * factor: ceil(interval_len / bin_width) + 1 rows per interval), then
  * hash-join on the bin key and re-check the exact predicate. The
  * nested-loop compare becomes one shuffle on `__bin` + an equi hash
  * join; no broadcast requirement, no O(n·m) blow-up, and skewed bins
  * (a flash-sale hour) ride AQE's skew-join splitting like any other
  * hot key. Bin width is the one tuning knob: ~the median interval
  * length balances interval replication against bin selectivity.
  *
  * Contrast with [[graft.streaming.Events.asofLatestClick]]: as-of wants
  * the LATEST predecessor (a window over a union solves it with zero
  * join), while overlap wants EVERY containing interval — a genuine
  * join; binning is what bounds it.
  */
object RangeJoin {

  type Q = (SparkSession, String) => DataFrame

  /** Per-interval bin-explosion cap. An interval spanning more than this
    * many bins (a year-long interval against 1-second bins) means the
    * bin width is mis-chosen for the workload: the explode would
    * multiply the interval side by millions and the job would "work"
    * while silently shuffling garbage volume. Fail the ROW loudly
    * (raise_error inside the plan — no driver-side pre-scan) instead.
    */
  val MaxBinsPerInterval = 10000L

  def queries: Map[String, Q] = Map(
    "e6_range_campaigns" -> e6RangeCampaigns,
    "e7_session_campaign_overlap" -> e7SessionCampaignOverlap
  )

  /** Floor-division of a timestamp into a `binMicros`-wide bin id.
    * Integer-exact at the FULL timestamp range: the pmod subtraction
    * makes the numerator an exact multiple of the divisor, and the
    * division runs in decimal (Spark gives the quotient ≥ 18 fractional
    * digits of exact decimal arithmetic — integral here, so the long
    * cast is lossless). A double division would round for
    * |unix_micros| ≥ 2^53 (beyond ~year 2255) and could misassign an
    * edge-sitting point (ADVICE r7). pmod (not %) keeps floor semantics
    * for pre-epoch timestamps.
    */
  private[operators] def binOf(t: Column, binMicros: Long): Column =
    ((unix_micros(t) - pmod(unix_micros(t), lit(binMicros)))
      .cast("decimal(20,0)") / lit(binMicros)).cast("long")

  /** Join every point row to every interval row whose
    * [start, end) contains the point's timestamp.
    *
    * @param points    frame with timestamp column `tsCol`
    * @param intervals frame with timestamp columns `startCol`/`endCol`
    *                  (end exclusive; empty/inverted intervals dropped).
    *                  Column names must not clash with `points`' —
    *                  asserted, because the exact-predicate recheck
    *                  resolves by name after the join.
    * @param binMicros bin width in microseconds (> 0)
    */
  def binnedPointInterval(
      points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binMicros: Long): DataFrame = {
    requireJoinable(points, intervals, binMicros)
    val p = points.withColumn("__bin", binOf(col(tsCol), binMicros))
    val i = explodeBins(intervals, startCol, endCol, binMicros)
    p.join(i, Seq("__bin"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }

  /** Interval-to-interval overlap join: every (left, right) pair whose
    * half-open intervals intersect (aS < bE && bS < aE — touching
    * intervals do NOT overlap).
    *
    * Same binning as [[binnedPointInterval]] with one extra problem: a
    * pair can share MANY bins and would match once per shared bin. The
    * usual fix (`distinct` after the join) is a second shuffle over the
    * result; instead each pair is emitted exactly once by construction —
    * only in the bin containing `max(aStart, bStart)`. Any overlapping
    * pair both covers that instant (it is inside both intervals' spans),
    * so both sides have a row in that bin; and it is one specific bin,
    * so no other shared bin survives the filter. Exactly-once without a
    * dedup pass, spec-pinned against the naive join.
    */
  def binnedIntervalOverlap(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      binMicros: Long): DataFrame = {
    requireJoinable(left, right, binMicros)
    explodeBins(left, lStart, lEnd, binMicros)
      .join(explodeBins(right, rStart, rEnd, binMicros), Seq("__bin"))
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        col("__bin") === greatest(
          binOf(col(lStart), binMicros), binOf(col(rStart), binMicros)))
      .drop("__bin")
  }

  private def requireJoinable(a: DataFrame, b: DataFrame,
      binMicros: Long): Unit = {
    require(binMicros > 0, s"bin width must be positive: $binMicros")
    val clash = a.columns.toSet intersect b.columns.toSet
    require(clash.isEmpty, s"ambiguous columns across sides: $clash")
    require(!a.columns.contains("__bin") && !b.columns.contains("__bin"),
      "__bin is reserved by the binned range join")
  }

  /** Empty/inverted intervals dropped; end exclusive (last covered
    * instant is end − 1µs); rows wider than [[MaxBinsPerInterval]] bins
    * fail loudly inside the plan.
    */
  private[operators] def explodeBins(df: DataFrame, s: String, e: String,
      binMicros: Long): DataFrame = {
    val lastBin = binOf(col(e) - expr("INTERVAL 1 MICROSECOND"), binMicros)
    val firstBin = binOf(col(s), binMicros)
    df.where(col(e) > col(s))
      .withColumn("__bin", explode(sequence(firstBin,
        when(lastBin - firstBin < lit(MaxBinsPerInterval), lastBin)
          .otherwise(raise_error(concat(
            lit(s"interval spans more than $MaxBinsPerInterval bins " +
              "(bin width mis-chosen for this workload): "),
            col(s).cast("string"), lit(" .. "), col(e).cast("string")))))))
  }

  /** The campaign table e6 joins against, derived deterministically from
    * the events fixture: one 48-hour campaign per distinct event day,
    * running [day 08:00, day+2 08:00). Consecutive days overlap, so each
    * event matches 2–3 campaigns — the multi-match case a point-interval
    * join must get right (an as-of join cannot express this).
    */
  def campaignsOf(events: DataFrame): DataFrame =
    events.select(to_date(col("ts")).as("campaign_day")).distinct()
      .select(col("campaign_day"),
        (col("campaign_day").cast("timestamp") + expr("INTERVAL 8 HOURS"))
          .as("start_ts"),
        (col("campaign_day").cast("timestamp") + expr("INTERVAL 56 HOURS"))
          .as("end_ts"))

  /** e6: per-campaign event attribution via the binned join (12 h bins ≈
    * a quarter of the 48 h interval length → ≤ 5 bin rows per campaign).
    * The campaign side here is small enough to broadcast — the point is
    * that NOTHING in the plan relies on that: the same plan holds when
    * the interval side is a billion ad flights.
    */
  def e6RangeCampaigns: Q = (s, dir) => {
    val ev = Tables.events(s, dir).select(col("ts"), col("value"))
    val joined = binnedPointInterval(
      ev, "ts", campaignsOf(Tables.events(s, dir)),
      "start_ts", "end_ts", binMicros = 12L * 3600 * 1000000)
    joined
      .groupBy(col("campaign_day"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(
        date_format(col("campaign_day").cast("timestamp"), "yyyy-MM-dd")
          .as("campaign_day"),
        col("n_events"), col("sum_value"))
      .orderBy(col("campaign_day"))
  }

  /** Per-user session intervals — the session_window the e3 oracle
    * already proved equivalent to gap-based sessionization, kept as
    * timestamps instead of formatted strings so the interval join can
    * consume them. End = last event + gap, Spark's session semantics.
    */
  def sessionIntervals(events: DataFrame): DataFrame =
    events.withColumn("tss", date_trunc("second", col("ts")))
      .groupBy(session_window(col("tss"), "10 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("w.start").as("sess_start"), col("w.end").as("sess_end"))

  /** e7: which campaigns did each user session overlap — the
    * interval-interval case (a session can straddle a campaign boundary,
    * so point-in-interval on any single event timestamp under-counts).
    * Both sides are intervals and both sides grow with the data: the
    * binned overlap join with exactly-once max-start-bin emission is
    * the 100 TB form; `distinct`-after-join would add a result-sized
    * shuffle, and a nested loop would not finish.
    */
  def e7SessionCampaignOverlap: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    binnedIntervalOverlap(
      sessionIntervals(ev), "sess_start", "sess_end",
      campaignsOf(ev), "start_ts", "end_ts",
      binMicros = 12L * 3600 * 1000000)
      .groupBy(col("campaign_day"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
      .select(
        date_format(col("campaign_day").cast("timestamp"), "yyyy-MM-dd")
          .as("campaign_day"),
        col("n_sessions"), col("n_users"))
      .orderBy(col("campaign_day"))
  }

  // ---- DuckDB oracles ------------------------------------------------------

  def oracles: Map[String, String] = Map(
    // the oracle runs the naive inequality join — an independent
    // algorithm (nested loop over the exact predicate) validating the
    // bin-explode-recheck decomposition end to end
    "e6_range_campaigns" ->
      """WITH campaigns AS (
        |  SELECT d AS campaign_day,
        |    CAST(d AS TIMESTAMP) + INTERVAL 8 HOUR AS start_ts,
        |    CAST(d AS TIMESTAMP) + INTERVAL 56 HOUR AS end_ts
        |  FROM (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events))
        |SELECT strftime(CAST(campaign_day AS TIMESTAMP), '%Y-%m-%d')
        |    AS campaign_day,
        |  count(*) AS n_events, round(sum(e.value), 2) AS sum_value
        |FROM events e JOIN campaigns c
        |  ON e.ts >= c.start_ts AND e.ts < c.end_ts
        |GROUP BY c.campaign_day ORDER BY campaign_day""".stripMargin,
    // sessions rebuilt with the e3 oracle's gap CTE (independently of
    // session_window), then the naive interval-overlap join
    "e7_session_campaign_overlap" ->
      """WITH t AS (SELECT user_id, date_trunc('second', ts) AS tss
        |  FROM events),
        |flagged AS (SELECT user_id, tss,
        |  CASE WHEN tss - lag(tss) OVER (PARTITION BY user_id ORDER BY tss)
        |      > INTERVAL 10 MINUTE OR
        |    lag(tss) OVER (PARTITION BY user_id ORDER BY tss) IS NULL
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM t),
        |sess AS (SELECT user_id, tss,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY tss
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged),
        |si AS (SELECT user_id, min(tss) AS sess_start,
        |    max(tss) + INTERVAL 10 MINUTE AS sess_end
        |  FROM sess GROUP BY user_id, sid),
        |campaigns AS (
        |  SELECT d AS campaign_day,
        |    CAST(d AS TIMESTAMP) + INTERVAL 8 HOUR AS start_ts,
        |    CAST(d AS TIMESTAMP) + INTERVAL 56 HOUR AS end_ts
        |  FROM (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events))
        |SELECT strftime(CAST(campaign_day AS TIMESTAMP), '%Y-%m-%d')
        |    AS campaign_day,
        |  count(*) AS n_sessions, count(DISTINCT user_id) AS n_users
        |FROM si JOIN campaigns c
        |  ON si.sess_start < c.end_ts AND c.start_ts < si.sess_end
        |GROUP BY c.campaign_day ORDER BY campaign_day""".stripMargin
  )
}
