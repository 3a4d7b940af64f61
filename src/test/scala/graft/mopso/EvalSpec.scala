package graft.mopso

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Clustering
import graft.sources.Tables

/** Driver-side evaluation twins vs the DataFrame formulations: the local
  * silhouette must match the oracle-checked c14 query on the same fixed
  * centers, and the best-archive selection must pick the max.
  */
class EvalSpec extends AnyFunSuite with SparkTestBase {

  private def block: EvalBlock = {
    val rows = Tables.labeledPoints(spark, sfDir).collect()
      .sortBy(_.getLong(0))
    EvalBlock(
      rows.map(_.getSeq[Double](1).toArray),
      rows.map(_.getInt(2)),
      Array.empty)
  }

  test("local silhouette matches the DataFrame formulation (c14)") {
    val centers = Clustering.centers(spark, sfDir).map(_._2).toArray
    val local = Eval.silhouette(block, centers)
    val df = Clustering.c14Silhouette(spark, sfDir).head().getDouble(0)
    assert(math.abs(local - df) < 1e-6) // c14 rounds to 6 decimals
  }

  test("selectBestBySilhouette picks the max-scoring entry, sorted centers") {
    val b = block
    val archive = Array(
      ArchiveEntry(Clustering.centers(spark, sfDir).map(_._2).toArray,
        Array(1.0, 1.0), Array(0.0)),
      // a degenerate single-cluster-ish candidate scores worse
      ArchiveEntry(Array(b.points(0), b.points(0).map(_ + 1e-9)),
        Array(2.0, 2.0), Array(0.0)))
    val (sils, best) = Eval.selectBestBySilhouette(archive, b)
    assert(sils.length === 2)
    assert(sils(0) === sils.max)
    assert(best.zip(best.tail).forall { case (a, c) => a(0) <= c(0) })
  }

  test("local simplified silhouette matches the DataFrame formulation (c20)") {
    val centers = Clustering.centers(spark, sfDir).map(_._2).toArray
    val local = Eval.simplifiedSilhouette(block, centers)
    val df = Clustering.c20SilhouetteSimplified(spark, sfDir)
      .head().getDouble(0)
    assert(math.abs(local - df) < 1e-6) // c20 rounds to 6 decimals
  }

  test("exact and simplified silhouette agree on the best archive entry") {
    // rank-agreement gate (VERDICT r7 §next-1): on well-separated blobs
    // the two scorers must select the SAME winner, so flipping
    // `silhouetteSimplified` never changes the E3 final result on clean
    // data. (The embeddings fixture's c20 centroids are the FIRST TEN
    // VECTORS, not blob centers, so it is deliberately not used here.)
    val blobCenters =
      Array(Array(0.0, 0.0, 0.0), Array(50.0, 50.0, 0.0),
        Array(0.0, 100.0, 100.0))
    val pts = for {
      (c, ci) <- blobCenters.zipWithIndex
      i <- 0 until 30
    } yield c.zipWithIndex.map { case (x, d) =>
      // deterministic jitter, spread ±1.5 around the blob center
      x + ((i * 7 + d * 3 + ci) % 31 - 15) * 0.1
    }
    val b = EvalBlock(pts, pts.map(_ => 0), Array.empty)
    val archive = Array(
      ArchiveEntry(blobCenters, Array(1.0, 1.0), Array(0.0)),
      // collapsed candidate: every centroid piled on one point
      ArchiveEntry(Array(pts(0), pts(0).map(_ + 1e-9)),
        Array(2.0, 2.0), Array(0.0)),
      // under-K candidate: merges two blobs into one cluster
      ArchiveEntry(Array(blobCenters(0), blobCenters(2)),
        Array(3.0, 3.0), Array(0.0)))
    val (exact, _) = Eval.selectBestBySilhouette(archive, b)
    val (simp, _) = Eval.selectBestBySilhouette(archive, b, simplified = true)
    assert(exact.indexOf(exact.max) === simp.indexOf(simp.max))
    assert(exact.indexOf(exact.max) === 0) // the true blob centers win
  }

  test("overlapping clusters: simplified reorders only partition-equivalent " +
    "entries (VERDICT r8 §next-5)") {
    // ADVERSARIAL case — two blobs whose spread equals their separation,
    // and two candidate entries sharing the SAME decision boundary
    // (x = 0.5): the true centers, and the same centers pushed outward.
    val sep = 1.0
    val pts = for {
      ci <- Seq(0, 1)
      i <- 0 until 30
    } yield Array(
      ci * sep + ((i * 7 + ci) % 31 - 15) * (1.0 / 15),
      ((i * 11 + ci * 3) % 31 - 15) * (1.0 / 15))
    val b = EvalBlock(pts.toArray, pts.map(_ => 0).toArray, Array.empty)
    val trueCenters = Array(Array(0.0, 0.0), Array(sep, 0.0))
    val wideCenters = Array(Array(-1.0, 0.0), Array(sep + 1.0, 0.0))
    val archive = Array(
      ArchiveEntry(trueCenters, Array(1.0, 1.0), Array(0.0)),
      ArchiveEntry(wideCenters, Array(2.0, 2.0), Array(0.0)))
    // both entries induce the IDENTICAL partition…
    val (cl1, _) = FitnessKernel.assign(b.points, trueCenters)
    val (cl2, _) = FitnessKernel.assign(b.points, wideCenters)
    assert(cl1.toSeq === cl2.toSeq)
    // …so the exact scorer (a function of the partition alone) ties —
    // and indexOf(max) selects entry 0
    val (exact, exactBest) = Eval.selectBestBySilhouette(archive, b)
    assert(math.abs(exact(0) - exact(1)) < 1e-12)
    // the simplified scorer sees the centroid geometry: the outward pair
    // inflates b(i) at an unchanged boundary and STRICTLY wins — the
    // scorers disagree on the entry
    val (simp, simpBest) =
      Eval.selectBestBySilhouette(archive, b, simplified = true)
    assert(simp(1) > simp(0),
      s"expected wide entry to win under simplified: ${simp.toSeq}")
    // acceptability bound: the disagreement is representation-only — the
    // two winners cluster every point identically, so the E3 final
    // PARTITION is unchanged (and on separated blobs the r7 case already
    // pins outright winner agreement)
    val (wl1, _) = FitnessKernel.assign(b.points, exactBest)
    val (wl2, _) = FitnessKernel.assign(b.points, simpBest)
    assert(wl1.toSeq === wl2.toSeq)
  }

  test("distributed simplified scorer matches the local one per entry") {
    // the one-pass all-entries aggregate (100 TB face of E3 selection)
    // must agree with the collected-block scorer on every center set
    val b = block
    val sets = Seq(
      Clustering.centers(spark, sfDir).map(_._2).toArray,
      Array(b.points(0), b.points(400)),
      Array(b.points(0))) // k < 2 → 0.0
    val dist = Eval.simplifiedSilhouetteDf(
      Tables.labeledPoints(spark, sfDir).select("features"), sets)
    val local = sets.map(cs => Eval.simplifiedSilhouette(b, cs))
    assert(dist.length === 3)
    dist.zip(local).foreach { case (d, l) =>
      assert(math.abs(d - l) < 1e-9, s"distributed $d vs local $l")
    }
  }

  test("simplified silhouette degenerate cases score 0") {
    val b = block
    assert(Eval.simplifiedSilhouette(b, Array(b.points(0))) === 0.0) // k=1
    assert(Eval.simplifiedSilhouette(
      EvalBlock(Array.empty, Array.empty, Array.empty),
      Array(Array(0.0), Array(1.0))) === 0.0) // n=0
  }

  test("degenerate single-cluster entry scores 0, never ~1") {
    val b = block
    val far = Array.fill(64)(1e6)
    val centers = Array(b.points(0), far) // nothing ever assigns to 'far'
    assert(Eval.silhouette(b, centers) === 0.0)
  }

  test("accuracy counts matching pairs") {
    assert(Eval.accuracy(Array((1, 1), (2, 3), (4, 4))) === 2.0 / 3)
    assert(Eval.accuracy(Array.empty) === 0.0)
  }
}
