package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The binned point-in-interval join must equal the naive
  * crossJoin+filter formulation — an independent algorithm — for every
  * bin width, including widths larger than any interval, smaller than
  * all, and exactly boundary-aligned. Boundary semantics pinned
  * explicitly: a point at `start` matches, a point at `end` does not.
  */
class RangeJoinSpec extends AnyFunSuite with SparkTestBase {

  private val HourUs = 3600L * 1000000

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Deterministic pseudo-random points + intervals around one day. */
  private def fixtures: (DataFrame, DataFrame) = {
    import spark.implicits._
    val base = ts("2024-03-01 00:00:00").getTime // ms epoch
    val points = (0 until 400).map { i =>
      val offMin = (i * 7919) % (48 * 60) // spread over 2 days
      (i.toLong, new Timestamp(base + offMin * 60000L))
    }.toDF("pid", "pt")
    val intervals = (0 until 60).map { j =>
      val startMin = (j * 6007) % (48 * 60)
      val lenMin = 1 + (j * 251) % 600 // 1 min .. 10 h
      (j.toLong, new Timestamp(base + startMin * 60000L),
        new Timestamp(base + (startMin + lenMin) * 60000L))
    }.toDF("iid", "ivl_start", "ivl_end")
    (points, intervals)
  }

  private def naive(points: DataFrame, intervals: DataFrame): Set[(Long, Long)] =
    points.crossJoin(intervals)
      .where(col("pt") >= col("ivl_start") && col("pt") < col("ivl_end"))
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def binned(points: DataFrame, intervals: DataFrame,
      binUs: Long): Set[(Long, Long)] =
    RangeJoin.binnedPointInterval(points, "pt", intervals,
      "ivl_start", "ivl_end", binUs)
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("binned join equals the naive nested-loop join at many bin widths") {
    val (p, i) = fixtures
    val expected = naive(p, i)
    assert(expected.nonEmpty)
    for (binUs <- Seq(HourUs / 4, HourUs, 6 * HourUs, 24 * HourUs,
        7L * 24 * HourUs)) {
      assert(binned(p, i, binUs) === expected, s"binUs=$binUs")
    }
  }

  test("start inclusive, end exclusive, empty intervals dropped") {
    import spark.implicits._
    val p = Seq(
      (1L, ts("2024-03-01 08:00:00")), // == start → in
      (2L, ts("2024-03-01 09:59:59")), // last second → in
      (3L, ts("2024-03-01 10:00:00")), // == end → out
      (4L, ts("2024-03-01 07:59:59"))  // before → out
    ).toDF("pid", "pt")
    val i = Seq(
      (10L, ts("2024-03-01 08:00:00"), ts("2024-03-01 10:00:00")),
      (11L, ts("2024-03-01 08:00:00"), ts("2024-03-01 08:00:00")), // empty
      (12L, ts("2024-03-01 10:00:00"), ts("2024-03-01 08:00:00"))  // inverted
    ).toDF("iid", "ivl_start", "ivl_end")
    // bin width aligned exactly on the 2-hour interval: the end−1µs bin
    // arithmetic is what keeps point 3 out and point 1 in
    assert(binned(p, i, 2 * HourUs) === Set((1L, 10L), (2L, 10L)))
    // and with a deliberately misaligned width
    assert(binned(p, i, 7L * 60 * 1000000) === Set((1L, 10L), (2L, 10L)))
  }

  test("interval spanning many bins matches a point in each covered bin") {
    import spark.implicits._
    val p = (0 until 30).map(h =>
      (h.toLong, ts(f"2024-03-01 $h%02d:30:00".take(19)))).toDF("pid", "pt")
    val i = Seq((1L, ts("2024-03-01 03:00:00"), ts("2024-03-01 21:00:00")))
      .toDF("iid", "ivl_start", "ivl_end")
    val got = binned(p, i, HourUs) // 18 one-hour bins
    assert(got === (3 until 21).map(h => (h.toLong, 1L)).toSet)
  }

  test("column-name clash is rejected") {
    import spark.implicits._
    val p = Seq((1L, ts("2024-03-01 00:00:00"))).toDF("pid", "pt")
    val i = Seq((1L, ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00")))
      .toDF("pid", "ivl_start", "ivl_end")
    assertThrows[IllegalArgumentException] {
      RangeJoin.binnedPointInterval(p, "pt", i, "ivl_start", "ivl_end", HourUs)
    }
    val pReserved = Seq((1L, ts("2024-03-01 00:00:00")))
      .toDF("__bin", "pt")
    assertThrows[IllegalArgumentException] {
      RangeJoin.binnedPointInterval(pReserved, "pt",
        i.withColumnRenamed("pid", "iid"), "ivl_start", "ivl_end", HourUs)
    }
  }

  test("pre-epoch timestamps bin with floor semantics, not truncation") {
    // negative epoch micros: a truncating division would shift bins
    // toward zero and points near an edge would change sides; pmod keeps
    // floor semantics so 1969 data joins exactly like 2024 data
    import spark.implicits._
    val base = ts("1969-06-01 00:00:00").getTime
    val p = (0 until 300).map { i =>
      (i.toLong, new Timestamp(base + ((i * 7919) % (72 * 60)) * 60000L))
    }.toDF("pid", "pt")
    val i = (0 until 40).map { j =>
      val startMin = (j * 6007) % (72 * 60)
      (j.toLong, new Timestamp(base + startMin * 60000L),
        new Timestamp(base + (startMin + 1 + (j * 251) % 480) * 60000L))
    }.toDF("iid", "ivl_start", "ivl_end")
    val expected = naive(p, i)
    assert(expected.nonEmpty)
    for (binUs <- Seq(7919L * 1000000, HourUs, 24 * HourUs)) {
      assert(binned(p, i, binUs) === expected, s"binUs=$binUs")
    }
  }

  test("binOf is exact beyond the double-precision range (year 9999)") {
    // |unix_micros| >= 2^53: a double-division quotient would round and
    // could misassign an edge-sitting point; the decimal form may not
    // (ADVICE r7). Edge timestamps at exact multiples of the bin width
    // are the sensitive inputs.
    import spark.implicits._
    val binUs = 3600L * 1000000 // 1h
    val farUs = 253402300800000000L // 9999-12-31T00:00:00Z in micros
    val pts = Seq(
      farUs, // exact bin edge
      farUs - 1, // one tick before the edge
      farUs + 1, // one tick after
      farUs + binUs - 1).zipWithIndex
      .map { case (us, i) => (i.toLong, us) }.toDF("pid", "us")
      .select(col("pid"), timestamp_micros(col("us")).as("pt"))
    val got = pts.select(col("pid"),
      RangeJoin.binOf(col("pt"), binUs).as("bin"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edgeBin = farUs / binUs
    assert(got === Map(0L -> edgeBin, 1L -> (edgeBin - 1),
      2L -> edgeBin, 3L -> edgeBin))
  }

  test("hot-bin skew: one interval covering most bins stays bounded") {
    // the worst case VERDICT r7 §next-6 asks to pin: a single "brand"
    // campaign spanning ~500 hourly bins while the points pile into one
    // hot hour. The mitigation is STRUCTURAL, not AQE-dependent: the wide
    // interval is replicated exactly once per covered bin (bounded by
    // MaxBinsPerInterval, loudly enforced), so its join work spreads
    // across every bin's task instead of one key seeing |points| ×
    // |intervals| rows; the hot POINT bin meets only the intervals that
    // overlap that hour. AQE skew-split can further split the hot bin at
    // real sizes, but correctness never depends on it.
    import spark.implicits._
    val base = ts("2024-03-01 00:00:00").getTime
    val hourMs = 3600 * 1000L
    // 2000 points in ONE hot hour + 500 spread across the month
    val pts = ((0 until 2000).map(i =>
      (i.toLong, new Timestamp(base + 240 * hourMs + (i * 1800) % hourMs))) ++
      (0 until 500).map(i =>
        (2000L + i, new Timestamp(base + (i % 500) * hourMs + 7 * 60000L))))
      .toDF("pid", "pt")
    // one 500-hour mega-interval + 30 narrow 2-hour ones
    val ivs = ((0 until 30).map { j =>
      (j.toLong, new Timestamp(base + j * 16 * hourMs),
        new Timestamp(base + (j * 16 + 2) * hourMs))
    } :+ (99L, new Timestamp(base), new Timestamp(base + 500 * hourMs)))
      .toDF("iid", "ivl_start", "ivl_end")
    val expected = naive(pts, ivs)
    assert(expected.size > 2000) // the mega-interval matches the hot bin
    assert(binned(pts, ivs, HourUs) === expected)
    // bounded replication, exactly once per covered bin: 500 rows for
    // the mega-interval + 2 per narrow interval
    val exploded = RangeJoin.explodeBins(ivs, "ivl_start", "ivl_end", HourUs)
    assert(exploded.count() === 500L + 30 * 2)
    assert(exploded.where(col("iid") === 99).count() === 500L)
  }

  test("interval wider than the bin cap fails loudly inside the plan") {
    import spark.implicits._
    val p = Seq((1L, ts("2024-03-01 00:00:00"))).toDF("pid", "pt")
    // 2 years against 1-hour bins: > MaxBinsPerInterval (10000)
    val i = Seq((1L, ts("2024-01-01 00:00:00"), ts("2026-01-01 00:00:00")))
      .toDF("iid", "ivl_start", "ivl_end")
    val ex = intercept[Exception] {
      RangeJoin.binnedPointInterval(p, "pt", i,
        "ivl_start", "ivl_end", HourUs).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("spans more than")), msgs(ex))
  }

  /** Second interval set with distinct column names for overlap tests. */
  private def rightIntervals: DataFrame = {
    import spark.implicits._
    val base = ts("2024-03-01 00:00:00").getTime
    (0 until 45).map { k =>
      val startMin = (k * 9473) % (48 * 60)
      val lenMin = 1 + (k * 397) % 900 // 1 min .. 15 h
      (k.toLong, new Timestamp(base + startMin * 60000L),
        new Timestamp(base + (startMin + lenMin) * 60000L))
    }.toDF("rid", "r_start", "r_end")
  }

  private def naiveOverlap(l: DataFrame, r: DataFrame): Seq[(Long, Long)] =
    l.crossJoin(r)
      .where(col("ivl_start") < col("r_end") &&
        col("r_start") < col("ivl_end"))
      .select(col("iid"), col("rid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq

  private def binnedOverlap(l: DataFrame, r: DataFrame,
      binUs: Long): Seq[(Long, Long)] =
    RangeJoin.binnedIntervalOverlap(l, "ivl_start", "ivl_end",
      r, "r_start", "r_end", binUs)
      .select(col("iid"), col("rid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq

  test("interval overlap equals naive join AND emits each pair once") {
    val l = fixtures._2
    val r = rightIntervals
    val expected = naiveOverlap(l, r)
    assert(expected.nonEmpty)
    for (binUs <- Seq(HourUs / 2, 3 * HourUs, 24 * HourUs)) {
      val got = binnedOverlap(l, r, binUs)
      // multiset equality: the max-start-bin emission must produce each
      // overlapping pair EXACTLY once with no distinct pass to hide
      // duplicates behind
      assert(got.sorted === expected.sorted, s"binUs=$binUs")
      assert(got.distinct.length === got.length, s"dups at binUs=$binUs")
    }
  }

  test("touching intervals do not overlap; containment matches once") {
    import spark.implicits._
    val l = Seq(
      (1L, ts("2024-03-01 08:00:00"), ts("2024-03-01 10:00:00")),
      (2L, ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00"))
    ).toDF("iid", "ivl_start", "ivl_end")
    val r = Seq(
      (10L, ts("2024-03-01 10:00:00"), ts("2024-03-01 12:00:00")), // touch 1
      (11L, ts("2024-03-01 09:00:00"), ts("2024-03-01 09:30:00")), // inside 1
      (12L, ts("2024-03-01 08:00:00"), ts("2024-03-01 10:00:00"))  // == 1
    ).toDF("rid", "r_start", "r_end")
    val got = binnedOverlap(l, r, HourUs)
    assert(got.sorted === Seq((1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L),
      (2L, 12L)).sorted)
  }

  test("e6 campaign derivation overlaps: events match 2-3 campaigns") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val joined = RangeJoin.binnedPointInterval(
      ev.select(col("ts"), col("event_id")),
      "ts", RangeJoin.campaignsOf(ev), "start_ts", "end_ts",
      12L * HourUs)
    val perEvent = joined.groupBy(col("event_id"))
      .agg(count(lit(1)).as("n"))
      .agg(min(col("n")), max(col("n"))).head()
    // interior events: 08:00+ of day d matches campaigns d, d-1 (and d-2
    // before 08:00); only dataset-edge days fall to 1
    assert(perEvent.getLong(0) >= 1 && perEvent.getLong(1) <= 3)
  }
}
