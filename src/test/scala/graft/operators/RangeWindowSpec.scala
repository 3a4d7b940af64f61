package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the equality promised by the c12/c13 scaladocs: the
  * range-partitioned boundary-exchange crowding pass
  * ([[Clustering.crowdingRange]]) and the aggregate+broadcast minmax
  * ([[Clustering.minmaxAgg]]) must produce EXACTLY what their
  * global-window twins produce — on the real fixture front (7 rows over
  * 8 range partitions, so most partitions are empty) and on a synthetic
  * front wider than several partitions with runs of tied f2 values
  * (ties are where the (f2, id) total order and the boundary handoff
  * can silently diverge).
  */
class RangeWindowSpec extends AnyFunSuite with SparkTestBase {

  private def fixtureFront: DataFrame =
    Clustering.paretoFront(Clustering.fitnessPoints(spark, sfDir), spark)

  /** 500 ids; f2 comes in runs of 5 equal values (ties resolved by id in
    * both formulations), f1 is a deterministic non-monotone mix.
    */
  private def syntheticFront(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map { i =>
      (i.toLong, ((i * 37) % 101).toDouble / 7.0, (i / 5).toDouble)
    }.toDF("id", "f1", "f2").repartition(7)
  }

  private def crowdingMap(df: DataFrame): Map[Long, Option[Double]] =
    df.collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    }.toMap

  private def minmaxMap(df: DataFrame): Map[Long, (Double, Double)] =
    df.collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap

  test("crowdingRange == crowdingGlobalWindow on the fixture front " +
    "(empty range partitions)") {
    val f = fixtureFront
    val global = crowdingMap(Clustering.crowdingGlobalWindow(f))
    val ranged = crowdingMap(Clustering.crowdingRange(f, spark))
    assert(ranged === global)
    assert(global.nonEmpty)
  }

  test("crowdingRange == crowdingGlobalWindow on a multi-partition " +
    "synthetic front with f2 ties") {
    val f = syntheticFront(500)
    val global = crowdingMap(Clustering.crowdingGlobalWindow(f))
    val ranged = crowdingMap(Clustering.crowdingRange(f, spark))
    assert(ranged.size === 500)
    assert(ranged === global)
    // exactly the two global endpoints are unbounded (NULL)
    assert(global.values.count(_.isEmpty) === 2)
  }

  test("crowdingRange: a front smaller than the partition count still " +
    "matches (every boundary is an empty-partition hop)") {
    import spark.implicits._
    // tie on f2 across the would-be boundary, plus a global endpoint tie
    val f = Seq((1L, 3.0, 5.0), (2L, 1.0, 5.0), (3L, 4.0, 7.0))
      .toDF("id", "f1", "f2")
    val global = crowdingMap(Clustering.crowdingGlobalWindow(f))
    val ranged = crowdingMap(Clustering.crowdingRange(f, spark))
    assert(ranged === global)
  }

  test("minmaxAgg == minmaxGlobalWindow on fixture and synthetic fronts") {
    Seq(fixtureFront, syntheticFront(500)).foreach { f =>
      val agg = minmaxMap(Clustering.minmaxAgg(f))
      val win = minmaxMap(Clustering.minmaxGlobalWindow(f))
      assert(agg === win)
      assert(agg.nonEmpty)
    }
  }
}
