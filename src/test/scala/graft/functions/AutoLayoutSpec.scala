package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Clustering

/** AutoLayout is the documented surface, not a fork: every rule must be
  * the SAME function as the operator family's own, across the measured
  * range, so the table in its scaladoc can never drift from behavior.
  */
class AutoLayoutSpec extends AnyFunSuite {

  test("AutoLayout delegations are identical to the family rules") {
    val ns = Seq(1L, 500L, 2000L, 20000L, 200000L, 2000000L, 1000000000L)
    ns.foreach { n =>
      assert(AutoLayout.lshPlanes(n) === Clustering.lshPlanesFor(n))
      assert(AutoLayout.ivfCells(n) === Similarity.ivfCellsFor(n))
    }
    val nlists = Seq(10, 20, 63, 200, 632, 6325)
    nlists.foreach { nl =>
      assert(AutoLayout.ivfProbes(nl) === Similarity.ivfProbesFor(nl))
    }
    assert(AutoLayout.nearDupPlanes === Similarity.NearDupPlanes)
    assert(AutoLayout.nearDupPairCap === Dedup.MaxBucket)
    Seq(0.125, 0.5, 0.84, 1.0).foreach { t =>
      assert(AutoLayout.minhashBands(Dedup.NumHashes, t) ===
        Dedup.minhashBandsFor(Dedup.NumHashes, t))
    }
    Seq(500L, 20000L, 200000L).foreach { n =>
      val nl = Similarity.ivfCellsFor(n)
      val np = Similarity.ivfProbesFor(nl)
      assert(AutoLayout.pqRerank(n, nl, np) ===
        Similarity.pqRerankFor(n, nl, np))
    }
  }

  test("calibrated probes meet the recall target on the fixture") {
    val spark = graft.SparkTestBase.session
    val dir = "/root/testdata/sf0.001"
    val n = graft.sources.Tables.embeddings(spark, dir).count()
    val nlist = Similarity.ivfCellsFor(n)
    val floor = Similarity.ivfProbesFor(nlist)
    val np = Similarity.ivfProbesCalibrated(spark, dir, step = 1L)
    // the walk starts at the closed-form floor and lands on the grid
    val grid = Iterator.iterate(floor)(_ * 2)
      .takeWhile(_ < nlist).toSeq :+ nlist
    assert(np >= floor && grid.contains(np))
    // the chosen setting actually meets the target it was picked for
    val rec = Similarity.ivfRecallCurve(spark, dir,
      Similarity.hardQueries(spark, dir, step = 1L), Seq(np),
      trained = true).head._2
    assert(rec >= Similarity.ProbeRecallTarget,
      s"calibrated np=$np recall=$rec")
    // AutoLayout delegation
    assert(AutoLayout.ivfProbesCalibrated(spark, dir) ===
      Similarity.ivfProbesCalibrated(spark, dir))
  }

  test("calibrated LSH tables meet the neighbor-recall target") {
    val spark = graft.SparkTestBase.session
    val dir = "/root/testdata/sf0.001"
    val t = Clustering.lshTablesCalibrated(spark, dir, step = 1L)
    // grid membership: doubling walk from the tuned base count, capped
    // by BOTH the max-tables bound and the corpus's own plane budget
    // (n / planes) — the same cap the implementation enforces
    val n = graft.sources.Tables.labeledPoints(spark, dir).count()
    val planes = Clustering.lshPlanesFor(n)
    val hardCap = math.max(1,
      math.min(Clustering.LshMaxTables.toLong, n / planes).toInt)
    val grid = Iterator.iterate(math.min(Clustering.LshTables, hardCap))(
        _ * 2)
      .takeWhile(_ < hardCap).toSeq :+ hardCap
    assert(grid.contains(t))
    // the chosen count actually meets the target it was picked for
    // (or is the cap — the documented unreachable-target signal)
    if (t < hardCap) {
      val rec = Clustering.lshSampledRecall(spark, dir, planes, t,
        step = 1L)
      assert(rec >= Clustering.LshRecallTarget, s"t=$t recall=$rec")
    }
    assert(AutoLayout.lshTablesCalibrated(spark, dir) ===
      Clustering.lshTablesCalibrated(spark, dir))
  }

  test("pq rerank rule: fixture floor and decade points") {
    // fixture fixed point: 500·4/(10·50) = 4 → the 50 floor; s9's
    // oracle-checked serving settings are unchanged by the rule
    assert(Similarity.pqRerankFor(500L, 10, 4) === 50)
    // the measured decades: ≈ candidate-mass/50
    assert(Similarity.pqRerankFor(20000L, 63, 8) === 51)
    assert(Similarity.pqRerankFor(200000L, 200, 15) === 300)
  }

  test("minhash banding rule: S-curve thresholds and the d3 fixed point") {
    // at d3's implied target the rule returns EXACTLY the pinned 2×4
    // layout — the d3/d6 oracle family is byte-unchanged by the rule
    assert(Dedup.minhashBandsFor(Dedup.NumHashes, 0.84) ===
      (Dedup.NumHashes / Dedup.BandSize, Dedup.BandSize))
    // d10's target: (1/4)^(1/2) = 0.5 exactly
    assert(Dedup.minhashBandsFor(Dedup.NumHashes, Dedup.D10TargetJaccard)
      === (4, 2))
    // extremes pick the extreme layouts
    assert(Dedup.minhashBandsFor(8, 0.13) === (8, 1))
    assert(Dedup.minhashBandsFor(8, 1.0) === (1, 8))
    // a 128-hash production signature: the rule lands on the divisor
    // pair whose threshold brackets the target most tightly
    val (b, r) = Dedup.minhashBandsFor(128, 0.8)
    assert((b, r) === (8, 16)) // threshold (1/8)^(1/16) ≈ 0.878, the
    // nearest reachable point of the divisor grid (r=8's 0.707 is
    // farther); a finer target needs a longer signature, not a knob
  }

  test("fixture fixed points: every rule reproduces the oracle layout") {
    // sf0.01: 500 points/vectors — the layouts every oracle family pins
    assert(AutoLayout.lshPlanes(500L) === Clustering.LshPlanes)
    assert(AutoLayout.ivfCells(500L) === Clustering.K)
    // the probes rule is recall-targeted (⌈√nlist⌉, r11) — the ORACLE
    // fixed point lives in s7 itself, which pins nprobe = 1
    assert(AutoLayout.ivfProbes(Clustering.K) === 4)
  }
}
