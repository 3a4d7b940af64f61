package graft

import java.nio.file.Files

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Pins the CLI twin of the reference's `main(dataName, workers, subPop,
  * iterMax, labelStartWithZero)` surface: positional parsing in the
  * reference's arg order, variant dispatch, and an end-to-end run over a
  * reference-convention CSV producing the stamped text report.
  */
class CliSpec extends AnyFunSuite with SparkTestBase {

  test("parse: reference arg order, defaults, and optional knobs") {
    val a = Cli.parse(Array("/data/iris.csv", "4", "8", "30", "1"))
    assert(a === Cli.CliArgs("/data/iris.csv", 4, 8, 30,
      labelStartWithZero = true))
    val b = Cli.parse(Array("x.csv", "2", "4", "5", "0",
      "single", "/tmp/out", "7"))
    assert(b.variant === "single" && b.outDir === "/tmp/out" &&
      b.seed === 7L && !b.labelStartWithZero)
    intercept[IllegalArgumentException](Cli.parse(Array("x.csv", "2", "4")))
    intercept[IllegalArgumentException](
      Cli.parse(Array("x.csv", "2", "4", "5", "2")))
    intercept[IllegalArgumentException](
      Cli.parse(Array("x.csv", "2", "4", "5", "1", "bogus")))
    // non-numeric counts fail with the usage text, not a bare
    // NumberFormatException
    val e = intercept[IllegalArgumentException](
      Cli.parse(Array("x.csv", "four", "4", "5", "1")))
    assert(e.getMessage.contains("workers") && e.getMessage.contains("usage:"))
  }

  test("configFor maps variants to their reference presets") {
    val base = Array("x.csv", "2", "6", "9", "1")
    val avg = Cli.configFor(Cli.parse(base))
    assert(avg.iterMax === 9 && avg.numPartitions === 6 &&
      avg.scope === graft.mopso.Config.ScopePartition)
    val lp = Cli.configFor(Cli.parse(base :+ "labelPartition"))
    assert(lp.partitioning === graft.mopso.Config.PartByLabel)
    val single = Cli.configFor(Cli.parse(base :+ "single"))
    assert(single.numPartitions === 1 &&
      single.scope === graft.mopso.Config.ScopeGlobal)
  }

  test("end-to-end: CSV in, stamped report out") {
    val rng = new Random(7L)
    val centers = Array(Array(0.0, 0.0), Array(9.0, 9.0))
    val lines = (0 until 60).map { i =>
      val k = i % 2
      val fs = centers(k).map(c => c + rng.nextGaussian() * 0.5)
      (fs.map(v => f"$v%.5f") :+ k.toString).mkString(",")
    }
    val dir = Files.createTempDirectory("graft-cli")
    val csv = dir.resolve("blobs2.csv")
    Files.writeString(csv, lines.mkString("\n"))
    val out = dir.resolve("out").toString

    val a = Cli.parse(Array(csv.toString, "4", "4", "2", "1",
      "avg", out, "42"))
    val reportPath = Cli.run(spark, a)

    assert(reportPath.startsWith(out))
    val files = new java.io.File(reportPath).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(files.length === 1, "single-file text report (S4 coalesce(1))")
    val text = Files.readString(files.head.toPath)
    assert(text.contains("archive size:"))
    assert(text.contains("k: 2, features: 2, points: 60"))
    assert(text.contains("kmeans baseline purity:"))

    // subPop=0: auto partitioning (60 points -> 1 partition) runs e2e
    val auto = Cli.parse(Array(csv.toString, "4", "0", "2", "1",
      "avg", dir.resolve("out_auto").toString, "42"))
    val autoReport = Cli.run(spark, auto)
    assert(new java.io.File(autoReport).listFiles()
      .exists(_.getName.startsWith("part-")))
  }
}
