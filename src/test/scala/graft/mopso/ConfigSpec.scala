package graft.mopso

import org.scalatest.funsuite.AnyFunSuite

/** partitionsFor is the codified SCALE.md rule: hold per-partition size
  * constant so the partition-scoped O(Σ nᵤ²) work stays linear in n.
  */
class ConfigSpec extends AnyFunSuite {

  test("partitionsFor holds per-partition size at the target") {
    val t = MopsoConfig.TargetPointsPerPartition
    assert(MopsoConfig.partitionsFor(0) === 1)
    assert(MopsoConfig.partitionsFor(1) === 1)
    assert(MopsoConfig.partitionsFor(t) === 1)
    assert(MopsoConfig.partitionsFor(t + 1) === 2)
    // linear in data: 10x points -> 10x partitions (exactly, on multiples)
    assert(MopsoConfig.partitionsFor(200 * t) === 200)
    assert(MopsoConfig.partitionsFor(2000 * t) === 2000)
    // never exceeds the per-partition budget
    for (n <- Seq(1L, 999L, 12345L, 1000000L, 123456789L)) {
      val p = MopsoConfig.partitionsFor(n)
      assert((n + p - 1) / p <= t, s"n=$n p=$p")
    }
    // custom target respected
    assert(MopsoConfig.partitionsFor(100, targetPerPartition = 10) === 10)
    assertThrows[IllegalArgumentException] {
      MopsoConfig.partitionsFor(10, targetPerPartition = 0)
    }
  }
}
