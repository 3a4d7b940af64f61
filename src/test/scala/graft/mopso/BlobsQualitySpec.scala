package graft.mopso

import java.nio.file.Files

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.mopso.Config._
import graft.sources.Tables

/** FIXTURES.md §A quality gate: on well-separated Gaussian blobs, seeded
  * MOPSO must land purity in the K-Means baseline's neighborhood (the
  * reference's own success criterion, Spark_MOPSO_Avg.scala:361-389),
  * fed through the reference's CSV convention end to end.
  */
class BlobsQualitySpec extends AnyFunSuite with SparkTestBase {

  /** blobs_k3: 300 × 4 features, 3 well-separated Gaussians, labels 1-3. */
  private def writeBlobsCsv(): String = {
    val rng = new Random(4242L)
    val centers = Array(
      Array(0.0, 0.0, 0.0, 0.0),
      Array(8.0, 8.0, 0.0, 4.0),
      Array(-6.0, 5.0, 9.0, -3.0))
    val lines = (0 until 300).map { i =>
      val k = i % 3
      val fs = centers(k).map(c => c + rng.nextGaussian() * 0.6)
      (fs.map(v => f"$v%.5f") :+ (k + 1).toString).mkString(",")
    }
    val dir = Files.createTempDirectory("graft-blobs")
    val f = dir.resolve("blobs_k3.csv")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("MOPSO on separable blobs reaches near-baseline purity") {
    val path = writeBlobsCsv()
    val data = Tables.labeledCsv(spark, path, labelStartWithZero = false)
    val cfg = MopsoConfig.avg(numPartitions = 4).copy(
      iterMax = 10, partitioning = PartRandom)
    val r = Mopso.run(spark, data, cfg, seed = 42L)
    assert(r.k === 3)
    assert(r.numFeatures === 4)
    assert(r.totalPoints === 300L)
    // K-Means nails well-separated blobs
    assert(r.kmeansPurity > 0.95,
      s"kmeans baseline should solve blobs, got ${r.kmeansPurity}")
    // the quality gate: best VALID archive purity ≥ baseline − ε
    val validPurities = r.purities.zip(r.purityValid)
      .collect { case (p, true) => p }
    val best = if (validPurities.nonEmpty) validPurities.max
      else r.purities.max
    assert(best >= r.kmeansPurity - 0.1,
      s"MOPSO purity $best vs kmeans ${r.kmeansPurity}")
  }
}
