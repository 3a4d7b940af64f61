package graft.mopso

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.mopso.Config._

/** Unit tests for the archive algebra M1-M5 against truth tables
  * transliterated from MOPSO_Single.scala / Spark_MOPSO_Avg.scala
  * (SURVEY §5.1) — including the reference's typo quirks, which are load-
  * bearing semantics here.
  */
class ArchiveSpec extends AnyFunSuite {

  private def e(f1: Double, f2: Double, crowd: Double = 0.0) =
    ArchiveEntry(Array(Array(0.0)), Array(f1, f2), Array(crowd))

  // M1 truth table (Spark_MOPSO_Avg.scala:1020-1026)
  test("dominance: strict minimization with the <=/< asymmetry") {
    assert(Archive.dominates(Array(1.0, 1.0), Array(2.0, 2.0)))
    assert(Archive.dominates(Array(2.0, 1.0), Array(2.0, 2.0))) // equal f1
    assert(!Archive.dominates(Array(1.0, 2.0), Array(2.0, 2.0))) // equal f2
    assert(!Archive.dominates(Array(2.0, 2.0), Array(2.0, 2.0))) // self
    assert(!Archive.dominates(Array(3.0, 1.0), Array(2.0, 2.0))) // trade-off
    assert(!Archive.dominates(Array(2.0, 2.0), Array(1.0, 1.0)))
  }

  test("update keeps a mutually non-dominated set") {
    val entries = Array(
      e(1.0, 5.0), e(2.0, 4.0), e(3.0, 3.0), // front
      e(3.0, 5.0), e(2.0, 4.5), // dominated
      e(1.0, 5.0)) // duplicate of front member — kept (no strict f2)
    val front = Archive.update(entries, 15, CrowdProduct)
    assert(front.length === 4)
    for (a <- front; b <- front)
      assert(!Archive.dominates(b.fitness, a.fitness) ||
        java.util.Arrays.equals(a.fitness, b.fitness))
    assert(front.count(x => x.fitness(0) == 1.0 && x.fitness(1) == 5.0) === 2)
  }

  test("update truncates to repository, dropping the most crowded") {
    val rng = new Random(7)
    // strictly decreasing f2 over increasing f1 → all non-dominated
    val entries = Array.tabulate(25)(i => e(i.toDouble, 25.0 - i))
    val kept = Archive.update(entries, 15, CrowdProduct)
    assert(kept.length === 15)
    // endpoints survive: last endpoint has +∞ crowding; the first endpoint
    // keeps its initial 0.0 (the `==` typo) and IS dropped first — quirk
    assert(kept.exists(x => x.fitness(1) == 25.0))
  }

  test("crowding quirks: size 2 leaves index 1 stale; size>=3 leaves first endpoint stale") {
    val two = Array(e(1.0, 1.0, crowd = 99.0), e(2.0, 2.0, crowd = 77.0))
    val sorted2 = Archive.crowding(two, CrowdProduct)
    assert(sorted2(0).crowding(0).isPosInfinity)
    assert(sorted2(1).crowding(0) === 77.0) // stale: double-set typo

    val three = Array(
      e(3.0, 1.0, crowd = 11.0), e(2.0, 2.0, crowd = 22.0),
      e(1.0, 3.0, crowd = 33.0))
    val sorted3 = Archive.crowding(three, CrowdProduct)
    assert(sorted3(0).crowding(0) === 11.0) // stale: `==` no-op typo
    assert(sorted3(2).crowding(0).isPosInfinity)
    // middle (f2=2): |3-1| * |1-3| = 4
    assert(sorted3(1).crowding(0) === 4.0)
  }

  test("crowding mean-sqrt formula (Avg variant, Spark_MOPSO_Avg.scala:989-991)") {
    val three = Array(e(3.0, 1.0), e(2.0, 2.0), e(1.0, 3.0))
    val sorted3 = Archive.crowding(three, CrowdMeanSqrt)
    // middle: (sqrt(euclid([3,1],[2,2])) + sqrt(euclid([1,3],[2,2]))) / 2
    val expected = (math.sqrt(math.sqrt(2.0)) + math.sqrt(math.sqrt(2.0))) / 2
    assert(math.abs(sorted3(1).crowding(0) - expected) < 1e-12)
  }

  test("leaderMaxCrowding picks the max-crowding middle entry") {
    val rng = new Random(3)
    // 5-entry front, product crowding gives distinct middles
    val entries = Array(
      e(5.0, 1.0), e(3.0, 2.0), e(2.5, 3.0), e(2.0, 4.0), e(1.0, 5.0))
    val leader =
      Archive.leaderMaxCrowding(entries, CrowdProduct, rng)
    // middles: f2=2 → |5-2.5|·|1-3|=5; f2=3 → |3-2|·|2-4|=2; f2=4 → |2.5-1|·|3-5|=3
    assert(leader.fitness(1) === 2.0)
  }

  test("leader selection falls back to random among 1-2 entries") {
    val rng = new Random(1)
    val one = Array(e(1.0, 1.0))
    assert(Archive.leaderMaxCrowding(one, CrowdProduct, rng) eq one(0))
    val two = Array(e(1.0, 2.0), e(2.0, 1.0))
    val got = Archive.leaderMaxCrowding(two, CrowdProduct, rng)
    assert(two.contains(got))
  }

  test("normalizeFitness maps objectives to [0,1]") {
    val entries = Array(e(1.0, 10.0), e(2.0, 20.0), e(3.0, 30.0))
    val norm = Archive.normalizeFitness(entries)
    assert(norm(0).sameElements(Array(0.0, 0.0)))
    assert(norm(1).sameElements(Array(0.5, 0.5)))
    assert(norm(2).sameElements(Array(1.0, 1.0)))
  }

  test("pbest inverted mode replaces when OLD dominates NEW") {
    val rng = new Random(5)
    val p = Particle(
      Array(Array(1.0)), Array(Array(0.0)), Array(9.0, 9.0),
      Array(Array(2.0)), Array(1.0, 1.0), Array(0.0))
    // old best (1,1) dominates new (5,5) → inverted semantics REPLACE
    val updated = Swarm.pbestUpdate(p, Array(5.0, 5.0), PbestInverted, rng)
    assert(updated.bestFitness.sameElements(Array(5.0, 5.0)))
    assert(updated.bestPosition(0)(0) === 1.0)
  }

  test("pbest discard mode keeps the original best (Avg quirk)") {
    val rng = new Random(5)
    val p = Particle(
      Array(Array(1.0)), Array(Array(0.0)), Array(9.0, 9.0),
      Array(Array(2.0)), Array(1.0, 1.0), Array(0.0))
    val updated = Swarm.pbestUpdate(p, Array(5.0, 5.0), PbestDiscard, rng)
    assert(updated.bestFitness.sameElements(Array(1.0, 1.0)))
    assert(updated.bestPosition(0)(0) === 2.0)
    assert(updated.fitness.sameElements(Array(5.0, 5.0)))
  }

  test("weight schedules match the per-variant formulas") {
    // Single (MOPSO_Single.scala:132): decrease from Wmax to Wmin
    assert(Swarm.weight(WDecrease, 0, 30, 0.9, 0.4) === 0.9)
    assert(math.abs(Swarm.weight(WDecrease, 30, 30, 0.9, 0.4) - 0.4) < 1e-12)
    // Avg (Spark_MOPSO_Avg.scala:199): (Wmax + iter·ΔW)/iter_max
    assert(math.abs(
      Swarm.weight(WIncreaseScaled, 1, 30, 0.9, 0.4) - (0.9 + 0.5) / 30) < 1e-12)
  }
}
