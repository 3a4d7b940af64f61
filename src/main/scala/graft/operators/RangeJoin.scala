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

  def queries: Map[String, Q] = Map(
    "e6_range_campaigns" -> e6RangeCampaigns
  )

  /** Floor-division of a timestamp into a `binMicros`-wide bin id.
    * Integer-exact: the pmod subtraction makes the numerator an exact
    * multiple, so the double division yields the integer quotient
    * exactly (both operands and the true quotient are < 2^53); a plain
    * `unix_micros(t) / binMicros` ride on double rounding could
    * misassign a point sitting exactly on a bin edge. pmod (not %)
    * keeps floor semantics for pre-epoch timestamps.
    */
  private def binOf(t: Column, binMicros: Long): Column =
    ((unix_micros(t) - pmod(unix_micros(t), lit(binMicros))) /
      lit(binMicros)).cast("long")

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
    require(binMicros > 0, s"bin width must be positive: $binMicros")
    val clash = points.columns.toSet intersect intervals.columns.toSet
    require(clash.isEmpty, s"ambiguous columns across sides: $clash")
    val p = points.withColumn("__bin", binOf(col(tsCol), binMicros))
    val i = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__bin", explode(sequence(
        binOf(col(startCol), binMicros),
        // end is exclusive: the last covered instant is end − 1µs
        binOf(col(endCol) - expr("INTERVAL 1 MICROSECOND"), binMicros))))
    p.join(i, Seq("__bin"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
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
        |GROUP BY c.campaign_day ORDER BY campaign_day""".stripMargin
  )
}
