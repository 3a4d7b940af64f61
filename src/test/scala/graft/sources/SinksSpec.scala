package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The write-side contract: date-partitioned layout prunes at the scan,
  * and compaction reduces file count without touching content — or the
  * layout, when told the partition columns.
  */
class SinksSpec extends AnyFunSuite with SparkTestBase {

  private val tmpDirs = scala.collection.mutable.ArrayBuffer.empty[java.io.File]

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toFile
    tmpDirs += d
    d.toString
  }

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmTree)
    f.delete()
  }

  override def afterAll(): Unit = {
    tmpDirs.foreach(rmTree)
    super.afterAll()
  }

  test("date-partitioned sink: day directories + partition-pruned reads") {
    val out = tmp("graft_sink_")
    val events = Tables.events(spark, sfDir)
    Writers.writeEventsByDay(events, out)
    val dayDirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("day="))
    assert(dayDirs.length > 1, "expected multiple day partitions")
    val back = spark.read.parquet(out)
    assert(back.count() === events.count())
    // a day filter must reach the scan as a PartitionFilter (directory
    // pruning), not a post-scan Filter over all rows
    val oneDay = dayDirs.head.stripPrefix("day=")
    val plan = back.filter(col("day") === oneDay)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"day filter not pushed to partition pruning:\n$plan")
    val expected = events
      .filter(date_format(col("ts"), "yyyy-MM-dd") === oneDay).count()
    assert(back.filter(col("day") === oneDay).count() === expected)
  }

  test("compaction: fewer, size-targeted files, identical content") {
    val src = tmp("graft_small_")
    val dst = tmp("graft_compact_")
    // simulate the small-file problem: 32 tiny files (lineitem has
    // enough rows that no round-robin partition comes up empty)
    Tables.lineitem(spark, sfDir).repartition(32).write
      .mode("overwrite").parquet(src)
    val (before, planned) = Writers.compact(spark, src, dst,
      targetFileBytes = 1L * 1024 * 1024)
    assert(before === 32)
    assert(planned < before, "compaction must reduce the file count")
    val written = new java.io.File(dst).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(written === planned)
    // content preserved exactly (order-insensitive)
    val a = spark.read.parquet(src).collect().map(_.toSeq).toSet
    val b = spark.read.parquet(dst).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("partitioned compaction preserves the day layout and pruning") {
    val src = tmp("graft_sink_")
    val dst = tmp("graft_compact_")
    Writers.writeEventsByDay(Tables.events(spark, sfDir), src)
    Writers.compact(spark, src, dst,
      targetFileBytes = 4L * 1024 * 1024, partitionCols = Seq("day"))
    val srcDays = new java.io.File(src).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("day=")).sorted
    val dstDays = new java.io.File(dst).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("day=")).sorted
    assert(dstDays.toSeq === srcDays.toSeq,
      "compaction must keep the partition directories")
    val back = spark.read.parquet(dst)
    val plan = back.filter(col("day") === srcDays.head.stripPrefix("day="))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"))
    assert(back.count() === spark.read.parquet(src).count())
    // in-place compaction is refused loudly, not half-done
    assertThrows[IllegalArgumentException] {
      Writers.compact(spark, src, src)
    }
  }

  test("dynamic partition pruning: a filtered dim prunes day directories") {
    // the day= layout's second payoff beyond static pruning: when the
    // filter arrives through a JOIN (classic fact⋈dim), Spark's DPP
    // builds the day list from the broadcast dim at runtime and prunes
    // fact directories that static planning could not — at 100 TB this
    // is the difference between scanning the full history and the two
    // days the dim selected
    import spark.implicits._
    val out = tmp("graft_dpp_")
    Writers.writeEventsByDay(Tables.events(spark, sfDir), out)
    val fact = spark.read.parquet(out)
    // partition-column type inference reads day= back as DATE
    val allDays = fact.select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(allDays.length > 2)
    // the dim must be a real source with a surviving Filter node — a
    // local relation constant-folds its filter away and the DPP rule no
    // longer sees a selective predicate to propagate
    val dimPath = tmp("graft_dpp_dim_")
    allDays.map(d => (d, if (d <= allDays(1)) "keep" else "drop"))
      .toSeq.toDF("d_day", "d_tag").write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dimPath)
    val joined = fact
      .join(spark.read.parquet(dimPath).where(col("d_tag") === "keep"),
        col("day") === col("d_day"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")
    val want = fact.where(col("day") <= allDays(1)).count()
    assert(joined.count() === want && want > 0)
  }

  test("sorted layout: range filter skips row groups at the reader") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val events = Tables.events(spark, sfDir).select(col("ts"), col("value"))
    val sortedPath = tmp("graft_sorted_")
    val shuffledPath = tmp("graft_shuffled_")
    Writers.writeSortedBy(events, sortedPath, "ts", numFiles = 8)
    // adversarial twin: same rows, same file count, but round-robin
    // placement so every file's ts [min,max] spans the whole domain
    events.repartition(8).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(shuffledPath)

    // the middle ~10% of the time span
    val Array(lo, hi) = events
      .agg(min(col("ts")).cast("long"), max(col("ts")).cast("long"))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val (qlo, qhi) = (lo + (hi - lo) * 45 / 100, lo + (hi - lo) * 55 / 100)
    def rangeOf(path: String) =
      spark.read.parquet(path).where(
        col("ts") >= timestamp_seconds(lit(qlo)) &&
          col("ts") < timestamp_seconds(lit(qhi)))

    val matching = rangeOf(sortedPath).count()
    assert(matching > 0 && matching === rangeOf(shuffledPath).count())

    /** Rows the SCAN emitted (post row-group pruning, pre residual
      * Filter) — the metric the sorted layout is supposed to shrink.
      */
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect() // no exchange in this plan → executedPlan is final
      val scan = df.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }.head
      assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual"),
        "ts range predicate must reach the parquet reader")
      scan.metrics("numOutputRows").value
    }
    val total = events.count()
    val sortedRows = scanRows(rangeOf(sortedPath))
    val shuffledRows = scanRows(rangeOf(shuffledPath))
    // unsorted: every row group overlaps the range → the scan emits all
    // rows; sorted: only the covering groups → a fraction. The factor-2
    // bound is loose (observed ~8x) so stat-boundary jitter can't flake.
    assert(shuffledRows === total)
    assert(sortedRows * 2 < shuffledRows,
      s"sorted scan emitted $sortedRows of $shuffledRows — no skipping")
  }
}
