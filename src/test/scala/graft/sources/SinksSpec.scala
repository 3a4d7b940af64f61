package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The write-side contract: date-partitioned layout prunes at the scan,
  * and compaction reduces file count without touching content.
  */
class SinksSpec extends AnyFunSuite with SparkTestBase {

  test("date-partitioned sink: day directories + partition-pruned reads") {
    val out = Files.createTempDirectory("graft_sink_").toString
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
    val src = Files.createTempDirectory("graft_small_").toString
    val dst = Files.createTempDirectory("graft_compact_").toString
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
}
