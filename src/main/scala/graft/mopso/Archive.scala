package graft.mopso

import scala.util.Random

import graft.core.Linalg
import graft.mopso.Config._

/** A non-dominated solution: (position K×F, fitness [dev, conn], crowding).
  * `crowding` is a mutable 1-element array ON PURPOSE: the reference passes
  * the same array object between particles and archive entries
  * (Spark_MOPSO_Avg.scala:177-185 copies `line._6` by reference), and two
  * of its crowding code paths read stale values (see [[Archive.crowding]]),
  * so aliasing is observable behavior.
  */
final case class ArchiveEntry(
    position: Array[Array[Double]],
    fitness: Array[Double],
    crowding: Array[Double])

/** The multi-objective "archive algebra" (SURVEY §2.8, M1-M5): pure
  * driver-side Scala over ≤65 candidates. Each quirk of the reference is
  * replicated and called out — they are the tested semantics.
  */
object Archive {

  /** M1 dominance (Spark_MOPSO_Avg.scala:1020-1026): b dominates a ⇔
    * b.f1 ≤ a.f1 ∧ b.f2 < a.f2 (the `<∧<` disjunct is subsumed). Both
    * objectives minimized. Note the asymmetry: equal f1 + smaller f2
    * dominates; smaller f1 + equal f2 does not.
    */
  def dominates(b: Array[Double], a: Array[Double]): Boolean =
    b(0) <= a(0) && b(1) < a(1)

  /** M2 (isDominatedIn, Spark_MOPSO_Avg.scala:1008-1017): dominated by any
    * entry of the set. Self-comparison is harmless (strict f2).
    */
  def isDominatedIn(cost: Array[Double], entries: Array[ArchiveEntry]): Boolean =
    entries.exists(e => dominates(e.fitness, cost))

  /** Sort the front by f2 ascending (sortFronts,
    * Spark_MOPSO_Avg.scala:1000-1003). Stable, like Scala's sortBy.
    */
  def sortFronts(entries: Array[ArchiveEntry]): Array[ArchiveEntry] =
    entries.sortBy(_.fitness(1))

  /** M3 crowding distance, replicated with the reference's quirks
    * (identical in all three distributed variants;
    * Spark_MOPSO_Avg.scala:966-995, MOPSO_Single.scala:994-1020):
    *
    *  - size 1: the single entry gets +∞.
    *  - size 2: index 0 is assigned TWICE (typo) — index 1 keeps whatever
    *    crowding value its (possibly shared) array already held.
    *  - size ≥ 3: the FIRST endpoint line uses `==` instead of `=` (a
    *    comparison, not an assignment) — so only the LAST endpoint becomes
    *    +∞; the first keeps its stale value.
    *  - middle entries: formula per variant — product |Δf1|·|Δf2| of the
    *    flanking neighbors, or mean of √(euclid) to each flanking neighbor.
    *
    * Mutates the crowding arrays in place (reference does too) and returns
    * the f2-sorted view.
    */
  def crowding(
      entries: Array[ArchiveEntry],
      formula: CrowdingFormula): Array[ArchiveEntry] = {
    val sf = sortFronts(entries)
    val size = sf.length
    if (size == 0) return sf
    if (size == 1) { sf(0).crowding(0) = Double.PositiveInfinity; return sf }
    if (size == 2) {
      sf(0).crowding(0) = Double.PositiveInfinity
      sf(0).crowding(0) = Double.PositiveInfinity // ref typo: index 1 untouched
      return sf
    }
    // ref typo: `sortfronts(0)._3(0) == PositiveInfinity` is a no-op compare
    sf(size - 1).crowding(0) = Double.PositiveInfinity
    for (i <- 1 until size - 1) {
      val pre = sf(i - 1); val cur = sf(i); val next = sf(i + 1)
      val d = formula match {
        case CrowdProduct =>
          math.abs(pre.fitness(0) - next.fitness(0)) *
            math.abs(pre.fitness(1) - next.fitness(1))
        case CrowdMeanSqrt =>
          (math.sqrt(Linalg.euclid(pre.fitness, cur.fitness)) +
            math.sqrt(Linalg.euclid(next.fitness, cur.fitness))) / 2.0
      }
      cur.crowding(0) = d
    }
    sf
  }

  /** M2+M4 archive update (updateArchive, Spark_MOPSO_Avg.scala:870-901):
    * keep non-dominated entries; on overflow past `repository`, compute
    * crowding, sort ASC and drop the `overflow` smallest (most crowded).
    * Scala's stable sort preserves front order among crowding ties.
    */
  def update(
      entries: Array[ArchiveEntry],
      repository: Int,
      formula: CrowdingFormula): Array[ArchiveEntry] = {
    var nd = entries.filter(e => !isDominatedIn(e.fitness, entries))
    val overflow = nd.length - repository
    if (overflow > 0) {
      nd = crowding(nd, formula)
      nd = nd.sortBy(_.crowding(0))
      nd = nd.drop(overflow)
    }
    nd
  }

  /** M5 leader selection (getGlobalBest, Spark_MOPSO_Avg.scala:905-938):
    * max crowding among the non-endpoint entries; the equality scan runs
    * over the FULL set (endpoints included), ties broken uniformly.
    */
  def leaderMaxCrowding(
      entries: Array[ArchiveEntry],
      formula: CrowdingFormula,
      rng: Random): ArchiveEntry = {
    val cd = crowding(entries, formula)
    val size = cd.length
    if (size == 1) return cd(0)
    if (size == 2) return cd(rng.nextInt(2))
    val middle = cd.drop(1).dropRight(1)
    val maxC = middle.maxBy(_.crowding(0)).crowding(0)
    val candidates = cd.filter(_.crowding(0) == maxC)
    candidates(rng.nextInt(candidates.length))
  }

  /** M5b (getGlobalBestNew, Spark_MOPSO_Avg.scala:943-962): sort the middle
    * by crowding ASCENDING and pick among the first ⌊n·0.1⌋+1 — i.e. the
    * most crowded entries, despite the "top decile" intent. Replicated.
    */
  def leaderTopDecile(
      entries: Array[ArchiveEntry],
      formula: CrowdingFormula,
      rng: Random): ArchiveEntry = {
    val cd = crowding(entries, formula)
    val size = cd.length
    if (size == 1) return cd(0)
    if (size == 2) return cd(rng.nextInt(2))
    val sorted = cd.drop(1).dropRight(1).sortBy(_.crowding(0))
    val top = (sorted.length * 0.1).toInt + 1
    sorted(rng.nextInt(top))
  }

  def leader(
      entries: Array[ArchiveEntry],
      rule: LeaderRule,
      formula: CrowdingFormula,
      rng: Random): ArchiveEntry = rule match {
    case LeaderMaxCrowding => leaderMaxCrowding(entries, formula, rng)
    case LeaderTopDecile => leaderTopDecile(entries, formula, rng)
  }

  /** F4 min-max normalization of archive fitness
    * (dataNormalization, Spark_MOPSO_Avg.scala:407-427).
    */
  def normalizeFitness(entries: Array[ArchiveEntry]): Array[Array[Double]] = {
    if (entries.isEmpty) return Array.empty
    val f1s = entries.map(_.fitness(0)); val f2s = entries.map(_.fitness(1))
    val (mn1, mx1) = (f1s.min, f1s.max)
    val (mn2, mx2) = (f2s.min, f2s.max)
    entries.map { e =>
      Array(
        if (mx1 == mn1) 0.0 else (e.fitness(0) - mn1) / (mx1 - mn1),
        if (mx2 == mn2) 0.0 else (e.fitness(1) - mn2) / (mx2 - mn2))
    }
  }
}
