package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** d9 substring-span dedup: the window-hash → global-count → islands
  * chain on constructed corpora where every expected number is computable
  * by hand, plus the fixture invariants the oracle cannot see (internal
  * consistency between the five output columns).
  */
class SubstringSpanSpec extends AnyFunSuite with SparkTestBase {

  private val W = Dedup.SpanWindow

  private def profile(rows: (Long, String)*): Map[Long, Row] = {
    import spark.implicits._
    Dedup.substringSpanProfile(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  private def words(tag: String, n: Int): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  test("a shared W-token span is found in both documents, nowhere else") {
    val span = words("shared", W) // exactly one window wide
    val a = words("alpha", 10) + " " + span + " " + words("omega", 10)
    val b = words("beta", 6) + " " + span + " " + words("gamma", 14)
    val c = words("unique", 28)
    val m = profile(1L -> a, 2L -> b, 3L -> c)

    // 28 tokens → 21 windows each; the shared span occupies ONE window
    // position in a and b (every longer window mixes unique context)
    assert(m(1L).getLong(1) === 21 && m(2L).getLong(1) === 21)
    assert(m(1L).getLong(2) === 1, "doc a: one duplicated window")
    assert(m(2L).getLong(2) === 1, "doc b: one duplicated window")
    assert(m(1L).getLong(3) === 1 && m(1L).getLong(4) === W,
      "one maximal span of exactly W tokens")
    assert(m(3L).getLong(2) === 0 && m(3L).getLong(3) === 0 &&
      m(3L).getLong(4) === 0, "unique doc: clean profile")
    assert(math.abs(m(1L).getDouble(5) - 1.0 / 21) < 1e-6)
  }

  test("a longer shared span merges consecutive windows into one run") {
    val span = words("quoted", 2 * W) // 2W tokens → W+1 duplicated windows
    val a = words("pre", 5) + " " + span + " " + words("post", 5)
    val b = words("intro", 9) + " " + span + " " + words("outro", 1)
    val m = profile(1L -> a, 2L -> b)
    // run of W+1 consecutive windows → one span of (W+1) + W−1 = 2W tokens
    assert(m(1L).getLong(2) === W + 1, "W+1 duplicated window positions")
    assert(m(1L).getLong(3) === 1, "merged into ONE maximal span")
    assert(m(1L).getLong(4) === 2 * W, "span length = the copied text")
    assert(m(2L).getLong(4) === 2 * W, "same span in the other doc")
  }

  test("within-document repetition counts as duplication") {
    val span = words("loop", W)
    val a = span + " " + words("mid", W) + " " + span // self-repeat
    val b = words("other", 3 * W)
    val m = profile(1L -> a, 2L -> b)
    assert(m(1L).getLong(2) === 2, "both occurrences marked")
    assert(m(1L).getLong(3) === 2, "two separate spans")
    assert(m(2L).getLong(2) === 0)
  }

  test("documents shorter than one window profile as zero, ratio 0.0") {
    val m = profile(1L -> words("tiny", W - 1), 2L -> words("tiny", W - 1))
    // identical short docs — still no window to hash
    assert(m(1L).getLong(1) === 0 && m(1L).getLong(2) === 0)
    assert(m(1L).getDouble(5) === 0.0)
  }

  private def removal(rows: (Long, String)*): Map[Long, (String, Long, Long)] = {
    import spark.implicits._
    Dedup.spanRemoval(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("removal keeps the corpus-global first occurrence only") {
    val span = words("shared", W)
    val a = words("alpha", 10) + " " + span + " " + words("omega", 10)
    val b = words("beta", 6) + " " + span + " " + words("gamma", 14)
    val m = removal(1L -> a, 2L -> b)
    // doc 1 is the (doc_id, p)-min occurrence: untouched
    assert(m(1L)._1 === a && m(1L)._3 === 0)
    // doc 2 loses exactly the span's W tokens, context survives
    assert(m(2L)._3 === W)
    assert(m(2L)._1 === words("beta", 6) + " " + words("gamma", 14))
  }

  test("within-document repeat: first kept, second cut") {
    val span = words("loop", W)
    val a = span + " " + words("mid", W) + " " + span
    val m = removal(1L -> a)
    assert(m(1L)._3 === W)
    assert(m(1L)._1 === span + " " + words("mid", W))
  }

  test("a long duplicated span is cut as the union of its windows") {
    val span = words("quoted", 2 * W)
    val a = words("pre", 5) + " " + span + " " + words("post", 5)
    val b = words("intro", 9) + " " + span + " " + words("outro", 1)
    val m = removal(1L -> a, 2L -> b)
    assert(m(1L)._3 === 0, "first occurrence untouched")
    assert(m(2L)._3 === 2 * W,
      "W+1 overlapping cut windows merge to the 2W-token span")
    assert(m(2L)._1 === words("intro", 9) + " " + words("outro", 1))
  }

  test("removal fixture invariants: token conservation, profile accord") {
    val prof = Dedup.queries("d9_substring_spans")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // doc -> n_dup_windows
    val rows = Dedup.queries("d9b_span_removal")(spark, sfDir).collect()
    assert(rows.length === prof.size)
    rows.foreach { r =>
      val (doc, kept, removed) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(kept >= 0 && removed >= 0)
      // a doc with nothing removed must have clean_text covering all toks
      if (removed == 0)
        assert(r.getString(1).isEmpty === (kept == 0))
      // removal only happens where the profile saw duplicated windows
      if (removed > 0) assert(prof(doc) > 0,
        s"doc $doc lost tokens without a duplicated window")
    }
    assert(rows.map(_.getLong(3)).sum > 0, "fixture must exercise removal")
  }

  test("fixture invariants: counts nest, ratio bounded, spans cover") {
    val rows = Dedup.queries("d9_substring_spans")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, dw, ds, mst, ratio) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))
      assert(dw <= nw, s"dup windows exceed windows: $r")
      assert(ds <= dw, s"more spans than duplicated windows: $r")
      assert(ratio >= 0.0 && ratio <= 1.0, s"ratio out of range: $r")
      if (dw > 0) {
        assert(mst >= W, s"a span is at least one window wide: $r")
        // longest run mst−W+1 windows can't exceed the doc's dup windows
        assert(mst - W + 1 <= dw, s"span longer than its windows: $r")
      } else assert(mst === 0 && ds === 0)
    }
    // the fixture corpus contains near-duplicate documents (FIXTURES.md)
    // — token-window duplication must actually fire on it
    assert(rows.map(_.getLong(2)).sum > 0,
      "no duplicated window anywhere in the fixture")
  }
}
