package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based hardening of TopKByKey's partial-aggregation algebra:
  * for ANY chunking of the input into partial buffers, any serde
  * round-trips, and any merge order, eval must equal the global
  * sorted-take-k — this is precisely the freedom the engine has when it
  * splits rows across mappers and merges partials in shuffle-arrival
  * order. (scalatestplus isn't on the offline classpath, so generators
  * are sampled directly with a fixed seed.)
  */
class TopKPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], cases: Int = 200)(body: A => Unit): Unit = {
    var seed = Seed(7L)
    var done = 0
    var attempts = 0
    while (done < cases && attempts < cases * 10) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => body(a); done += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(done == cases, s"generator produced only $done/$cases samples")
  }

  private val caseGen: Gen[(List[(Double, Long)], Int, List[Int], Long)] = for {
    n <- Gen.chooseNum(0, 60)
    keys <- Gen.listOfN(n, Gen.chooseNum(-1000, 1000).map(_ / 8.0))
    k <- Gen.chooseNum(1, 12)
    cuts <- Gen.listOfN(4, Gen.chooseNum(0, math.max(n, 1)))
    shuffleSeed <- Gen.long
  } yield (keys.zipWithIndex.map { case (d, i) => (d, i.toLong) },
    k, cuts, shuffleSeed)

  test("any chunking + serde + merge order == global sorted take-k") {
    forAll(caseGen) { case (pairs, k, cuts, shuffleSeed) =>
      val agg = TopKByKey(
        BoundReference(0, DoubleType, nullable = true),
        BoundReference(1, LongType, nullable = true), k)
      val rng = new scala.util.Random(shuffleSeed)
      // shuffle rows, split at random cut points into partial buffers
      val rows = rng.shuffle(pairs)
      val bounds = (cuts.map(math.min(_, rows.length)) :+ 0 :+ rows.length)
        .distinct.sorted
      val chunks = bounds.zip(bounds.tail).map { case (a, b) =>
        rows.slice(a, b)
      }
      val buffers = chunks.map { chunk =>
        val b = agg.createAggregationBuffer()
        chunk.foreach { case (d, v) => agg.update(b, InternalRow(d, v)) }
        // every partial crosses the wire at least once
        agg.deserialize(agg.serialize(b))
      }
      // merge in a random order (shuffle-arrival order is arbitrary)
      val merged = rng.shuffle(buffers)
        .foldLeft(agg.createAggregationBuffer()) { (acc, b) =>
          agg.merge(acc, b)
        }
      val got = agg.eval(merged).asInstanceOf[ArrayData].toLongArray().toSeq
      // keys are quantized so ties occur; which VALUE survives a tie
      // legitimately depends on merge order, so the checked contract is
      // exactly the aggregate's: the k smallest keys as a multiset, with
      // values delivered in ascending-key order
      val sortedPairs = pairs.sortBy(_._1)
      val expectKeys = sortedPairs.take(k).map(_._1)
      val keyOf = pairs.map { case (d, v) => (v, d) }.toMap // value -> key
      assert(got.length === math.min(k, pairs.length))
      // the returned values' keys equal the k smallest keys as a multiset
      assert(got.map(keyOf).sorted === expectKeys.sorted)
      // and the values arrive in ascending-key order
      assert(got.map(keyOf).toSeq === got.map(keyOf).sorted)
    }
  }

  test("update prune keeps earlier insertion on exact key ties") {
    // the documented stability contract: for equal keys the earlier
    // update survives once the buffer overflows
    val agg = TopKByKey(
      BoundReference(0, DoubleType, nullable = true),
      BoundReference(1, LongType, nullable = true), k = 2)
    val b = agg.createAggregationBuffer()
    // five ties at key 1.0 force a prune (buffer > 2k)
    (0L until 5L).foreach(v => agg.update(b, InternalRow(1.0, v)))
    val out = agg.eval(b).asInstanceOf[ArrayData].toLongArray().toSeq
    assert(out === Seq(0L, 1L))
  }

  test("buffers merge correctly when one side is empty") {
    val agg = TopKByKey(
      BoundReference(0, DoubleType, nullable = true),
      BoundReference(1, LongType, nullable = true), k = 3)
    val empty = agg.deserialize(agg.serialize(agg.createAggregationBuffer()))
    val b = agg.createAggregationBuffer()
    agg.update(b, InternalRow(2.0, 20L))
    val m1 = agg.merge(
      mutable.ArrayBuffer.empty[(Any, Any)] ++= b, empty)
    assert(agg.eval(m1).asInstanceOf[ArrayData].toLongArray().toSeq ===
      Seq(20L))
    val m2 = agg.merge(agg.createAggregationBuffer(), b)
    assert(agg.eval(m2).asInstanceOf[ArrayData].toLongArray().toSeq ===
      Seq(20L))
  }
}
