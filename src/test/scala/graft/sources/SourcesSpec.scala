package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.mopso.{Config, Mopso, MopsoConfig}
import graft.operators.Diagnostics

/** The reference's own input convention (P1,
  * Spark_MOPSO_Avg.scala:1191-1236): headerless numeric CSV, last column =
  * integer label, optional 0-based shift, unlabeled mode, header-drop mode.
  * Plus the S4-S6 report sinks and E6 diagnostics.
  */
class SourcesSpec extends AnyFunSuite with SparkTestBase {

  private def tmpCsv(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-csv")
    val f = dir.resolve("data.csv")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("labeled CSV with 1-based labels parses as-is") {
    val path = tmpCsv(Seq("1.0,2.0,1", "3.5,4.5,2", "0.1,0.2,1"))
    val df = Tables.labeledCsv(spark, path, labelStartWithZero = false)
    val rows = df.collect()
    assert(rows.length === 3)
    assert(rows.map(_.getInt(1)).sorted.toSeq === Seq(1, 1, 2))
    assert(rows.head.getSeq[Double](0).length === 2)
  }

  test("0-based labels shift up by one (labelStartWithZero)") {
    val path = tmpCsv(Seq("1.0,2.0,0", "3.5,4.5,2"))
    val df = Tables.labeledCsv(spark, path, labelStartWithZero = true)
    assert(df.select(col("label")).collect().map(_.getInt(0)).sorted.toSeq
      === Seq(1, 3))
  }

  test("unlabeled mode: every column a feature, label 0") {
    val path = tmpCsv(Seq("1.0,2.0,3.0", "4.0,5.0,6.0"))
    val df = Tables.labeledCsv(spark, path, labeled = false)
    val rows = df.collect()
    assert(rows.forall(_.getInt(1) === 0))
    assert(rows.forall(_.getSeq[Double](0).length === 3))
  }

  test("header mode drops the first line") {
    val path = tmpCsv(Seq("f0,f1,label", "1.0,2.0,1", "3.0,4.0,2"))
    val df = Tables.labeledCsv(spark, path, header = true,
      labelStartWithZero = false)
    assert(df.count() === 2)
  }

  test("report sink writes a single timestamped text file") {
    val cfg = MopsoConfig.avg(numPartitions = 2).copy(
      iterMax = 2, partitioning = Config.PartByIdRange)
    val r = Mopso.run(spark, Tables.labeledPoints(spark, sfDir), cfg, 1L)
    val out = Files.createTempDirectory("graft-report").toString
    val path = Report.saveMopsoReport(spark, r, out)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(files.length === 1) // coalesce(1) → one part file
    val text = Files.readString(files.head.toPath)
    assert(text.contains("archive size:"))
    assert(text.contains("kmeans baseline purity:"))
  }

  test("partition diagnostics report per-partition label mix") {
    val byLabel = Tables.labeledPoints(spark, sfDir)
      .repartition(4, col("label"))
    val stats = Diagnostics.partitionLabelStats(byLabel).collect()
    assert(stats.map(_.getLong(1)).sum === 500L)
    val byRange = Tables.labeledPoints(spark, sfDir)
      .repartitionByRange(4, col("id"))
    val rstats = Diagnostics.partitionLabelStats(byRange).collect()
    assert(rstats.length === 4)
  }
}
