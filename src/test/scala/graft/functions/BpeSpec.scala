package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the distributed BPE trainer/applier against an INDEPENDENT local
  * reference implementation (the textbook Sennrich greedy scan, written
  * imperatively here — a third algorithm besides the Spark fold and the
  * DuckDB list_reduce oracle).
  */
class BpeSpec extends AnyFunSuite with SparkTestBase {

  // ---- local reference implementation -------------------------------------

  /** Greedy left-to-right single-pair merge, scan-position semantics. */
  private def refMerge(word: Vector[String], lhs: String,
      rhs: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      if (i < word.length - 1 && word(i) == lhs && word(i + 1) == rhs) {
        out += (lhs + rhs); i += 2
      } else { out += word(i); i += 1 }
    }
    out.result()
  }

  /** Reference trainer: weighted pair counts, argmax with
    * (count DESC, lhs ASC, rhs ASC) ties, m merges.
    */
  private def refTrain(freqs: Map[String, Long],
      m: Int): (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    var words = freqs.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 0 until m) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val ((lhs, rhs), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
      merges += ((lhs, rhs, cnt))
      words = words.map { case (syms, f) => (refMerge(syms, lhs, rhs), f) }
    }
    (merges.result(),
      freqs.keys.map { w =>
        var syms = w.map(_.toString).toVector
        merges.result().foreach { case (l, r, _) => syms = refMerge(syms, l, r) }
        w -> syms
      }.toMap)
  }

  private val corpus: Map[String, Long] = Map(
    "low" -> 5L, "lower" -> 2L, "lowest" -> 6L,
    "newer" -> 6L, "wider" -> 3L, "new" -> 2L)

  private def corpusDf = {
    import spark.implicits._
    corpus.toSeq.toDF("word", "freq")
      .withColumn("syms", regexp_extract_all(col("word"), lit("."), lit(0)))
  }

  test("distributed trainer replays the reference merge sequence") {
    val m = 10
    val (got, finalWords) = Bpe.trainWords(corpusDf, m)
    val (want, refWords) = refTrain(corpus, m)
    assert(got.map(g => (g.lhs, g.rhs, g.score)) === want)
    // final symbol tables agree word-for-word
    val gotWords = finalWords.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toVector).toMap
    assert(gotWords === refWords)
  }

  test("mergeFold handles overlapping runs like the reference scan") {
    import spark.implicits._
    val cases = Seq(
      (Seq("a", "a", "a", "a"), "a", "a"), // even run: [aa, aa]
      (Seq("a", "a", "a"), "a", "a"), // odd run: [aa, a]
      (Seq("a", "b", "a", "b", "b"), "a", "b"), // [ab, ab, b]
      (Seq("x"), "x", "x"), // single symbol untouched
      (Seq("ab", "b", "ab", "b"), "ab", "b")) // merged token as lhs
    cases.foreach { case (syms, l, r) =>
      val got = Seq(syms).toDF("syms")
        .select(Bpe.mergeFold(col("syms"), l, r))
        .head().getSeq[String](0).toVector
      assert(got === refMerge(syms.toVector, l, r),
        s"mergeFold($syms, $l, $r)")
    }
  }

  test("applier output is consistent: merges preserve concatenated content") {
    val (_, finalWords) = Bpe.trainWords(corpusDf, 8)
    finalWords.collect().foreach { case Row(w: String, _, syms: Any) =>
      assert(syms.asInstanceOf[scala.collection.Seq[String]]
        .mkString("") === w)
    }
  }

  test("trainer early-stops when no pair reaches MinPairFreq") {
    import spark.implicits._
    // "ab"×3 supports ONE real merge; after it the only remaining pair
    // is (c,d) with count 1 — below MinPairFreq, so the loop must stop
    // at 1 merge even with budget 10 (production semantics: m is a
    // budget, not a promise)
    val tiny = Seq(("ab", 3L), ("cd", 1L)).toDF("word", "freq")
      .withColumn("syms", regexp_extract_all(col("word"), lit("."), lit(0)))
    val (merges, words) = Bpe.trainWords(tiny, 10)
    assert(merges.map(m => (m.lhs, m.rhs, m.score)) === Seq(("a", "b", 3L)))
    // the word table is still fully rewritten up to the stop point
    val syms = words.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toVector).toMap
    assert(syms === Map("ab" -> Vector("ab"), "cd" -> Vector("c", "d")))
  }

  test("trainer early-stops at zero merges on a pairless corpus") {
    import spark.implicits._
    val singles = Seq(("a", 5L), ("b", 2L)).toDF("word", "freq")
      .withColumn("syms", regexp_extract_all(col("word"), lit("."), lit(0)))
    val (merges, _) = Bpe.trainWords(singles, 4)
    assert(merges.isEmpty)
  }

  test("driver-train admission gates on bytes as well as rows (ADVICE r21)") {
    // a synthetic long-word table can blow the driver heap far below
    // the 2M row bound — the char budget must refuse it
    assert(Bpe.fitsDriverTrain(1000L, 1000L * 40))
    assert(!Bpe.fitsDriverTrain(Bpe.DriverTrainMaxWords + 1, 10L))
    assert(!Bpe.fitsDriverTrain(1000L, Bpe.DriverTrainMaxChars + 1))
    // boundary: exactly at both bounds still fits
    assert(Bpe.fitsDriverTrain(Bpe.DriverTrainMaxWords,
      Bpe.DriverTrainMaxChars))
  }

  test("early stop agrees with the reference trainer run to exhaustion") {
    // reference trainer with the same min-frequency stop; both must
    // produce the identical (shorter-than-budget) merge sequence
    var words = corpus.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val want = Seq.newBuilder[(String, String, Long)]
    var done = false
    while (!done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val best = counts.minByOption { case ((l, r), c) => (-c, l, r) }
      best match {
        case Some(((l, r), c)) if c >= Bpe.MinPairFreq =>
          want += ((l, r, c))
          words = words.map { case (syms, f) => (refMerge(syms, l, r), f) }
        case _ => done = true
      }
    }
    val wantSeq = want.result()
    val (got, _) = Bpe.trainWords(corpusDf, 1000)
    assert(got.map(g => (g.lhs, g.rhs, g.score)) === wantSeq)
    assert(got.length < 1000, "fixture corpus should exhaust below budget")
  }
}
