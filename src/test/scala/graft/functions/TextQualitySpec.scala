package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Relational
import graft.sources.Tables

/** Invariants of the quality gate (t7), boilerplate detection (t8), the
  * int8 quantization measurement (s6), and the pivot (q21) — the semantics
  * the sf0.001 smoke sweep and the sf0.01 oracle can't see on their own.
  */
class TextQualitySpec extends AnyFunSuite with SparkTestBase {

  test("t7 cascade: first failing rule wins, keep means every rule passed") {
    import spark.implicits._
    // 5 tokens (fails too_short) that are also all identical (would fail
    // low_diversity) and stopword-free (would fail no_stopwords): the
    // verdict must be the FIRST rule, too_short
    val docs = Seq(
      1L -> Seq.fill(5)("zap").mkString(" "),
      // 40 tokens, all the same word: passes length, fails diversity —
      // and has no stopwords, so the cascade must stop at low_diversity
      2L -> Seq.fill(40)("zap").mkString(" "),
      // 40 distinct stopword-free tokens: fails only no_stopwords
      3L -> (1 to 40).map(i => s"w$i").mkString(" "),
      // 40 distinct tokens with enough stopwords: keep
      4L -> ((1 to 38).map(i => s"w$i") ++ Seq("the", "a")).mkString(" ")
    ).toDF("doc_id", "text")
    val got = TextAnalysis
      .withQualityVerdict(docs.withColumn("toks",
        TextAnalysis.tokensCol(col("text"))))
      .select(col("doc_id"), col("verdict"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "too_short", 2L -> "low_diversity",
      3L -> "no_stopwords", 4L -> "keep"))
  }

  test("t13 bigram LM matches hand-computed surprisal; short docs drop") {
    import spark.implicits._
    val docs = Seq(
      0L -> "a b a b",
      1L -> "a b",
      2L -> "x",       // one token: no bigrams → absent from output
      3L -> "b a x y"
    ).toDF("doc_id", "text")
    // V = 4 (a,b,x,y); cb: (a,b)=3 (b,a)=2 (a,x)=1 (x,y)=1;
    // cl: a=4 b=2 x=1 → surp(a,b) = −ln(4/8), surp(b,a) = −ln(3/6),
    // surp(a,x) = −ln(2/8), surp(x,y) = −ln(2/5), micro-nat-rounded
    val got = TextAnalysis.lmScore2(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet === Set(0L, 1L, 3L))
    assert(got(0L) === ((3L, 0.693147)))
    assert(got(1L) === ((1L, 0.693147)))
    // (693147 + 1386294 + 916291) / 3e6
    assert(got(3L) === ((3L, 0.998577)))
    // the apply face against the self-trained model is exactly equal
    val applied = TextAnalysis
      .lmScore2Apply(docs, TextAnalysis.lm2Model(docs))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(applied === got)
    // frozen-model OOV: an unseen bigram drops from count and sum —
    // "a b" scored against the model, "b z" entirely unseen vanishes
    val oov = TextAnalysis.lmScore2Apply(
      Seq(7L -> "a b z").toDF("doc_id", "text"),
      TextAnalysis.lm2Model(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(oov.toSeq === Seq((7L, 1L, 0.693147)))
  }

  test("lmScoreApply drops OOV tokens from both the sum and n_tokens") {
    import spark.implicits._
    // frozen model trained on a 2-word corpus; the scored doc mixes
    // in-vocab tokens with tokens the model never saw (ADVICE r10: the
    // documented inner-join drop semantics were untested — a join-type
    // regression would silently score OOV as zero-surprisal tokens)
    val trainDocs = Seq(1L -> "alpha beta alpha").toDF("doc_id", "text")
    val model = TextAnalysis.lmModel(trainDocs)
    val scored = TextAnalysis.lmScoreApply(
      Seq(10L -> "alpha zzz beta qqq alpha").toDF("doc_id", "text"), model)
      .collect()
    assert(scored.length === 1)
    val r = scored.head
    // n_tokens counts IN-VOCAB tokens only: 3 of the 5 survive the join
    assert(r.getLong(1) === 3L)
    // and the surprisal average is over those 3 — exactly what the same
    // model yields on the OOV-free projection of the doc
    val clean = TextAnalysis.lmScoreApply(
      Seq(10L -> "alpha beta alpha").toDF("doc_id", "text"), model)
      .collect().head
    assert(r.getDouble(2) === clean.getDouble(2))
    // a fully-OOV document vanishes (no rows), not a zero-score row
    val allOov = TextAnalysis.lmScoreApply(
      Seq(11L -> "zzz qqq").toDF("doc_id", "text"), model).count()
    assert(allOov === 0L)
  }

  test("t8 counts DOCUMENT frequency: within-doc repeats count once") {
    val rows = TextAnalysis.t8Boilerplate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // df is a count of documents, so no gram's df can exceed the corpus
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.forall(r => r.getLong(1) >= TextAnalysis.MinDf &&
      r.getLong(1) <= nDocs))
    // ordering contract: non-increasing df, gram ascending within a df tie
    val pairs = rows.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sliding(2).forall {
      case Array((d1, g1), (d2, g2)) => d1 > d2 || (d1 == d2 && g1 < g2)
      case _ => true
    })
    // distinct-per-doc semantics, independently: the fixture's most
    // frequent gram's df equals the number of documents containing it
    val (topDf, topGram) = pairs.head
    val containing = Tables.documents(spark, sfDir)
      .withColumn("toks", TextAnalysis.tokensCol(col("text")))
      .where(array_contains(
        TextAnalysis.shinglesCol(col("toks")), topGram))
      .count()
    assert(containing == topDf)
  }

  test("s6 quantization: codes bound the error, recall is sane") {
    val r = Similarity.s6QuantRecall(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val codeSum = row.getLong(0)
    val mae = row.getDouble(1)
    val nHit = row.getLong(2)
    val nExact = row.getLong(3)
    val recall = row.getDouble(4)
    val n = Tables.embeddings(spark, sfDir).count()
    // codes are in [0, 255] per value, so their sum is bounded by N·Dim·255
    assert(codeSum > 0 && codeSum <= n * Similarity.Dim * 255L)
    // scalar quantization error is at most half a step of the widest
    // dimension; the fixture's per-dim ranges are < 4.0, so half a step
    // is < 4/255/2 ≈ 0.0078 = 7843 micro
    assert(mae > 0 && mae < 8000)
    assert(nExact == 25 && nHit <= nExact)
    // int8 reconstruction barely moves a 64-dim euclidean ranking
    assert(recall >= 0.8 && recall <= 1.0)
  }

  test("t11 BM25 equals an exact local reimplementation; ranks by term mass") {
    import spark.implicits._
    import TextAnalysis.{Bm25B, Bm25K1, Bm25Query}
    val corpus = Seq(
      1L -> "join join merge filler filler",
      2L -> "join filler filler filler filler",
      3L -> "window dup dup",
      4L -> "nothing relevant here at all")
    val got = TextAnalysis.bm25(corpus.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // exact local twin: same formula, same constants, same rounding
    val toks = corpus.toMap.view.mapValues(_.split("\\s+").toSeq).toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val df = Bm25Query.map(t =>
      t -> toks.values.count(_.contains(t)).toDouble).toMap
    val want = toks.map { case (id, ts) =>
      val score = Bm25Query.map { t =>
        val tf = ts.count(_ == t).toDouble
        val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
        idf * (tf * (Bm25K1 + 1)) /
          (tf + Bm25K1 * ((1 - Bm25B) + Bm25B * ts.size / avgdl))
      }.sum
      id -> BigDecimal(score).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    assert(got === want)
    // two hits of a rarer mix beat one; no query terms → exactly zero
    assert(got(1L) > got(2L) && got(2L) > 0.0)
    assert(got(4L) === 0.0)
  }

  test("t12 LM score equals an exact local twin; word soup outscores repeats") {
    import spark.implicits._
    val corpus = Seq(
      1L -> "zap zap zap zap zap zap",
      2L -> "quark vortex nimbus oriole jasper flume")
    val got = TextAnalysis.lmScore(corpus.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exact local twin with the SAME integer micro-nat quantization
    val allToks = corpus.flatMap(_._2.split("\\s+"))
    val counts = allToks.groupBy(identity).view.mapValues(_.size).toMap
    val (tTotal, vSize) = (allToks.size, counts.size)
    def surpU(c: Int): Long =
      BigDecimal(-math.log((c + 1.0) / (tTotal + vSize)) * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val want = corpus.map { case (id, text) =>
      val ts = text.split("\\s+").toSeq
      val su = ts.map(t => surpU(counts(t))).sum
      (id, ts.size.toLong,
        BigDecimal(su.toDouble / (ts.size * 1000000.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got.toSet === want.toSet)
    // the repeated-token doc is the predictable one: lower surprisal
    val byId = got.map(r => r._1 -> r._3).toMap
    assert(byId(1L) < byId(2L))
  }

  test("q21 pivot cells equal the equivalent group-by aggregation") {
    val pivoted = Relational.q21Pivot(spark, sfDir).collect()
    val years = pivoted.map(_.getInt(0))
    assert(years.distinct.length == years.length && years.nonEmpty)
    // independently aggregate one (year, priority) cell the long way
    val expected = Tables.orders(spark, sfDir)
      .where(year(col("o_orderdate")) === years.head &&
        col("o_orderpriority") === Relational.OrderPriorities.head)
      .agg(round(sum(col("o_totalprice")), 2)).collect().head
    val cell = pivoted.find(_.getInt(0) == years.head).get.get(1)
    assert((expected.isNullAt(0) && cell == null) ||
      cell == expected.getDouble(0))
  }

  test("t14 scrub: redactions counted, nothing PII-shaped survives") {
    val rows = TextAnalysis.t14PiiScrub(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // the composed text plants exactly one phone and one customer
    // number per row — both must be counted and both replaced
    assert(rows.forall { case (_, _, np, ni) => np == 1L && ni == 1L })
    val phone = TextAnalysis.PhonePattern.r
    val idrun = TextAnalysis.IdRunPattern.r
    assert(rows.forall { case (_, t, _, _) =>
      phone.findFirstIn(t).isEmpty && idrun.findFirstIn(t).isEmpty })
    assert(rows.forall(_._2.contains("[PHONE]")))
    assert(rows.forall(_._2.contains("[ID]")))
  }

  test("t15 line dedup equals a plain-Scala twin and is idempotent") {
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val rows = TextAnalysis.t15LineDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(rows.length === texts.size)
    rows.foreach { case (id, nLines, nKept, clean) =>
      val ws = texts(id).split(" ", -1)
      val l1 = ws.slice(0, 8).mkString(" ")
      val l2 = ws.slice(8, 16).mkString(" ")
      val lines = Seq(l1, l2, l1, texts(id), l2)
      val expected = lines.distinct // Scala distinct keeps first occurrence
      assert(nLines === 5L)
      assert(nKept === expected.length.toLong)
      assert(clean === expected.mkString("\n"),
        s"doc $id: dedup must keep first occurrences in order")
      // idempotence: a second pass removes nothing
      val again = clean.split("\n", -1).toSeq.distinct
      assert(again.mkString("\n") === clean)
      // the composed duplicates really are dropped
      assert(nKept < nLines)
    }
  }

  test("t16 removal: planted boilerplate always dies, survivors are rare") {
    val rows = TextAnalysis.t16BoilerplateRemoval(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.length === 500)
    rows.foreach { case (id, nLines, nRemoved, clean) =>
      assert(nLines === 5L)
      // the global banner (df = corpus) and the per-source footer
      // (df = docs-per-source >= threshold) are removed from EVERY doc
      assert(nRemoved >= 2L, s"doc $id removed only $nRemoved")
      assert(!clean.contains(TextAnalysis.T16Banner))
      assert(!clean.split("\n", -1).exists(_.startsWith("via src")))
    }
    // every surviving line's document frequency is under the threshold
    // (driver recount over the same composed lines)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val composed = docs.map { case (id, text, src) =>
      val ws = text.split(" ", -1)
      id -> Seq(ws.take(8).mkString(" "), TextAnalysis.T16Banner,
        ws.slice(8, 16).mkString(" "), s"via $src", text)
    }.toMap
    val df = composed.values.flatMap(_.distinct)
      .groupBy(identity).view.mapValues(_.size).toMap
    rows.foreach { case (id, _, _, clean) =>
      val survivors =
        if (clean.isEmpty) Seq.empty else clean.split("\n", -1).toSeq
      survivors.foreach { line =>
        assert(df(line) < TextAnalysis.T16MinDf,
          s"doc $id kept boilerplate line '$line' (df ${df(line)})")
      }
      // removal preserves order: survivors appear as a subsequence of
      // the composed lines
      val it = composed(id).iterator
      assert(survivors.forall(l => it.contains(l)),
        s"doc $id: survivors out of order")
    }
  }
}
