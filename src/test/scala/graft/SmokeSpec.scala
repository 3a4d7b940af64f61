package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must execute end-to-end at the smallest fixture —
  * the guard against fixture-size assumptions (a filter that empties the
  * table, a quota larger than a group, a probe id past the universe). The
  * driver's Verify gate runs at sf0.01; this sweeps the same surface at
  * sf0.001.
  */
class SmokeSpec extends AnyFunSuite with SparkTestBase {
  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"smoke sf0.001: $name") {
      assert(fn(spark, sfDir).count() >= 0L)
    }
  }
}
