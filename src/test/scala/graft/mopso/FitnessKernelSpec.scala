package graft.mopso

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Linalg

/** The fitness kernel vs a naive transliteration of the reference's
  * Dev/Conn (MOPSO_Single.scala:1061-1088 / Spark_MOPSO_Avg.scala:
  * 1030-1063): the engine's bounded-insertion neighbor lists and fused
  * assignment must reproduce the O(n²)-sort formulation exactly, ties
  * included.
  */
class FitnessKernelSpec extends AnyFunSuite {

  /** Direct transliteration of reference Conn (stable sortBy + take(L)). */
  private def refConn(points: Array[Array[Double]], clusters: Array[Int],
      l: Int): Double = {
    var result = 0.0
    for (i <- points.indices) {
      val distances = new ArrayBuffer[(Int, Double)]()
      for (j <- points.indices if i != j)
        distances += ((clusters(j), Linalg.euclid(points(i), points(j))))
      val nn = distances.sortBy(_._2).take(l)
      for (index <- nn.indices)
        if (clusters(i) == nn(index)._1) result += 1.0 / (index + 1)
    }
    result
  }

  private def refAssign(points: Array[Array[Double]],
      centers: Array[Array[Double]]): (Array[Int], Double) = {
    var dev = 0.0
    val ks = points.map { p =>
      val ds = centers.zipWithIndex.map { case (c, k) =>
        (k + 1, Linalg.euclid(p, c))
      }
      val best = ds.minBy(_._2)
      dev += best._2
      best._1
    }
    (ks, dev)
  }

  private def randomPoints(n: Int, f: Int, rng: Random) =
    Array.fill(n)(Array.fill(f)(rng.nextDouble() * 10))

  test("assignment matches the minBy formulation, 1-based ties to lower id") {
    val rng = new Random(11)
    val pts = randomPoints(200, 5, rng)
    val centers = randomPoints(4, 5, rng)
    val (got, dev) = FitnessKernel.assign(pts, centers)
    val (want, wantDev) = refAssign(pts, centers)
    assert(got.sameElements(want))
    assert(math.abs(dev - wantDev) < 1e-9)
  }

  test("assignment tie-break: equidistant centers pick the lower cluster id") {
    val pts = Array(Array(0.0, 0.0))
    val centers = Array(Array(1.0, 0.0), Array(-1.0, 0.0)) // both dist 1
    val (ks, _) = FitnessKernel.assign(pts, centers)
    assert(ks(0) === 1)
  }

  test("devConn matches the reference transliteration on random data") {
    val rng = new Random(23)
    val pts = randomPoints(150, 4, rng)
    val centers = randomPoints(5, 4, rng)
    val nbrs = FitnessKernel.buildNeighbors(pts, 10)
    val (clusters, _) = FitnessKernel.assign(pts, centers)
    val (_, conn) =
      FitnessKernel.devConn(PartData(pts, nbrs), centers, 10)
    assert(math.abs(conn - refConn(pts, clusters, 10)) < 1e-9)
  }

  test("neighbor lists stable under duplicate distances") {
    // a grid with many exactly-equal pair distances
    val pts = (for (x <- 0 until 5; y <- 0 until 5)
      yield Array(x.toDouble, y.toDouble)).toArray
    val nbrs = FitnessKernel.buildNeighbors(pts, 8)
    // reference ranking for point i: stable sort by (dist), insertion order j
    for (i <- pts.indices) {
      val ref = pts.indices.filter(_ != i)
        .map(j => (j, Linalg.euclid(pts(i), pts(j))))
        .sortBy(_._2).take(8).map(_._1) // Seq#sortBy is stable
      assert(nbrs(i).toSeq === ref,
        s"neighbor mismatch at point $i")
    }
  }

  test("partition partial scales by rate") {
    val rng = new Random(31)
    val pts = randomPoints(60, 3, rng)
    val centers = randomPoints(3, 3, rng)
    val pd = PartData(pts, FitnessKernel.buildNeighbors(pts, 10))
    val (dev, conn) = FitnessKernel.devConn(pd, centers, 10)
    val (sdev, sconn) = FitnessKernel.partitionPartial(pd, centers, 10, 240)
    assert(math.abs(sdev - dev * 60.0 / 240) < 1e-12)
    assert(math.abs(sconn - conn * 60.0 / 240) < 1e-12)
  }
}
