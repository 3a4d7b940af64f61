package graft.mopso

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Linalg
import graft.mopso.Config._

/** Property-based invariants (SURVEY §5.3): archive algebra, assignment,
  * normalization — over randomized fitness sets and point clouds.
  * (scalatestplus isn't on the offline classpath, so generators are
  * sampled directly with a fixed seed — 100 cases per property.)
  */
class ArchivePropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], cases: Int = 100)(body: A => Unit): Unit = {
    var seed = Seed(42L)
    var done = 0
    var attempts = 0
    while (done < cases && attempts < cases * 10) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => body(a); done += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(done == cases, s"generator produced only $done/$cases samples")
  }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(for { a <- ga; b <- gb } yield (a, b))(t => body(t._1, t._2))

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val fitnessGen: Gen[Array[Double]] = for {
    f1 <- Gen.choose(0.0, 100.0)
    f2 <- Gen.choose(0.0, 100.0)
  } yield Array(f1, f2)

  private val entriesGen: Gen[Array[ArchiveEntry]] =
    Gen.chooseNum(1, 40).flatMap { n =>
      Gen.listOfN(n, fitnessGen).map(_.map(f =>
        ArchiveEntry(Array(Array(0.0)), f, Array(0.0))).toArray)
    }

  test("archive update: result is mutually non-dominated and ≤ repository") {
    forAll(entriesGen) { entries =>
      val updated = Archive.update(entries, 15, CrowdProduct)
      assert(updated.length <= 15)
      assert(updated.nonEmpty)
      for (a <- updated; b <- updated)
        assert(!Archive.dominates(b.fitness, a.fitness) ||
          (b.fitness(0) == a.fitness(0) && b.fitness(1) == a.fitness(1)))
    }
  }

  test("archive update is idempotent below capacity") {
    forAll(entriesGen) { entries =>
      val once = Archive.update(entries, 1000, CrowdProduct)
      val twice = Archive.update(once, 1000, CrowdProduct)
      assert(once.map(_.fitness.toSeq).toSeq === twice.map(_.fitness.toSeq).toSeq)
    }
  }

  test("dominance is irreflexive and antisymmetric") {
    forAll2(fitnessGen, fitnessGen) { (a, b) =>
      assert(!Archive.dominates(a, a))
      assert(!(Archive.dominates(a, b) && Archive.dominates(b, a)))
    }
  }

  test("crowding: last endpoint of a ≥3 front is +∞; middles finite on distinct fronts") {
    forAll(Gen.chooseNum(3, 20)) { n =>
      // strictly decreasing f2 over increasing f1 → all non-dominated
      val entries = Array.tabulate(n)(i =>
        ArchiveEntry(Array(Array(0.0)),
          Array(i.toDouble, (n - i).toDouble), Array(-1.0)))
      val sorted = Archive.crowding(entries, CrowdProduct)
      assert(sorted(n - 1).crowding(0).isPosInfinity)
      assert(sorted(0).crowding(0) === -1.0) // stale (ref `==` typo)
      for (i <- 1 until n - 1) assert(!sorted(i).crowding(0).isInfinite)
    }
  }

  test("normalized fitness lands in [0,1]") {
    forAll(entriesGen) { entries =>
      val norm = Archive.normalizeFitness(entries)
      assert(norm.forall(f => f.forall(v => v >= 0.0 && v <= 1.0)))
    }
  }

  private val pointsGen: Gen[(Array[Array[Double]], Array[Array[Double]])] =
    for {
      f <- Gen.chooseNum(1, 6)
      n <- Gen.chooseNum(1, 50)
      k <- Gen.chooseNum(1, 5)
      pts <- Gen.listOfN(n, Gen.listOfN(f, Gen.choose(-10.0, 10.0)))
      cs <- Gen.listOfN(k, Gen.listOfN(f, Gen.choose(-10.0, 10.0)))
    } yield (pts.map(_.toArray).toArray, cs.map(_.toArray).toArray)

  test("assignment distance equals the minimum over centers") {
    forAll(pointsGen) { case (pts, cs) =>
      val (clusters, dev) = FitnessKernel.assign(pts, cs)
      var expectDev = 0.0
      pts.zip(clusters).foreach { case (p, k) =>
        val dists = cs.map(c => Linalg.euclid(p, c))
        assert(math.abs(dists(k - 1) - dists.min) < 1e-12)
        expectDev += dists.min
      }
      assert(math.abs(dev - expectDev) < 1e-9)
      assert(clusters.forall(k => k >= 1 && k <= cs.length))
    }
  }

  test("partition partials sum to the global Dev (algebraic case, A8)") {
    forAll(pointsGen) { case (pts, cs) =>
      whenever(pts.length >= 2) {
        val (a, b) = pts.splitAt(pts.length / 2)
        val total = pts.length.toLong
        def pd(x: Array[Array[Double]]) =
          PartData(x, FitnessKernel.buildNeighbors(x, 3))
        val (devA, _) = FitnessKernel.devConn(pd(a), cs, 3)
        val (devB, _) = FitnessKernel.devConn(pd(b), cs, 3)
        val (devAll, _) = FitnessKernel.devConn(pd(pts), cs, 3)
        // rate-scaled partials: devA·(|a|/n) + devB·(|b|/n) vs global·1 —
        // Dev is a plain sum so rate-scaling partials does NOT equal the
        // global sum; the un-scaled partials do:
        assert(math.abs((devA + devB) - devAll) < 1e-9)
      }
    }
  }
}
