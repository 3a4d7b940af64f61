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
