package graft.functions

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.Tables

/** s10/s10b truncated-dimension ANN (the Matryoshka/OPQ serving shape):
  * the degenerate-prefix law (truncDim = Dim reproduces the exact
  * answer), the shortlist-monotonicity law (exact rerank means a wider
  * shortlist never loses a true-top-k hit), the honest raw-prefix
  * recall on near-iid embeddings, and the learned rotation's measured
  * recovery at the same kept-dims budget.
  */
class TruncatedAnnSpec extends AnyFunSuite with SparkTestBase {

  private def hits(truncDim: Int, shortlistN: Int): Set[(Long, Long)] =
    Similarity.truncatedTopK(Tables.embeddings(spark, sfDir), truncDim,
        shortlistN)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exact: Set[(Long, Long)] =
    Similarity.queries("s1_cosine_topk")(spark, sfDir)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("truncDim = Dim degenerates to the exact s1 answer") {
    val got = hits(Similarity.Dim, Similarity.TruncShortlist)
    assert(got.size === 25)
    assert(got === exact,
      "full-prefix stage-1 ranking IS the exact ranking, so the rerank " +
        "must reproduce s1 exactly")
  }

  test("exact rerank makes recall monotone in the shortlist") {
    // a true-top-5 member inside ANY candidate set always survives an
    // exact rerank to the top 5 (at most 4 vectors in the whole corpus
    // score above it) — so recall can only grow as the shortlist widens
    val recalls = Seq(5, 10, Similarity.TruncShortlist).map { c =>
      (hits(Similarity.TruncDim, c) intersect exact).size
    }
    assert(recalls === recalls.sorted,
      s"recall must be non-decreasing in shortlist depth, got $recalls")
  }

  test("rotation recovers what the raw prefix loses at the same budget") {
    // the fixture's embedding dims are near-iid: a raw 16-of-64 prefix
    // keeps ~1/4 of the signal (recall 0.44 here) — the honest s10
    // weakness s10b exists to fix. The PCA rotation concentrates
    // variance into the kept dims and must beat the prefix at the SAME
    // TruncDim and shortlist depth (measured 0.64 vs 0.44).
    val prefix = (hits(Similarity.TruncDim, Similarity.TruncShortlist)
      intersect exact).size / 25.0
    val rotated = (Similarity.queries("s10b_ann_rotated")(spark, sfDir)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      intersect exact).size / 25.0
    assert(prefix >= 0.3, s"raw-prefix recall sanity floor, got $prefix")
    assert(rotated >= 0.6, s"rotated recall floor, got $rotated")
    assert(rotated > prefix,
      s"learned rotation must beat the raw prefix: $rotated vs $prefix")
  }

  test("the persisted rotation is orthonormal and carries the evr gauge") {
    val path = Files.createTempDirectory("s10rot").toString + "/rot"
    Similarity.writeRotation(spark, sfDir, path)
    val rows = spark.read.parquet(path)
      .select("j", "w", "evr").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray,
        r.getDouble(2)))
      .sortBy(_._1)
    assert(rows.length === Similarity.TruncDim)
    assert(rows.forall(_._2.length === Similarity.Dim))
    for ((j1, w1, _) <- rows; (j2, w2, _) <- rows if j1 <= j2) {
      val dot = w1.zip(w2).map { case (a, b) => a * b }.sum
      val expect = if (j1 == j2) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9,
        s"component $j1 . $j2 = $dot, expected $expect")
    }
    // the worth-it gauge: kept explained variance must beat the
    // no-structure baseline TruncDim/Dim for the rotation to pay —
    // this fixture concentrates (≈0.38 vs 0.25), which is exactly why
    // the recall test above sees rotated > prefix
    val kept = rows.map(_._3).sum
    val baseline = Similarity.TruncDim.toDouble / Similarity.Dim
    assert(kept > baseline + 0.05,
      s"kept evr $kept should clear the flat-spectrum baseline $baseline")
    // evr rows are sorted: PCA orders components by variance
    val evrs = rows.map(_._3).toSeq
    assert(evrs === evrs.sorted.reverse)
  }
}
