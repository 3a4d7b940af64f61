package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.Tables

/** Invariants of the curation operators (p2/p3/p4): the splits partition
  * the corpus, quotas bind exactly, and the packing matches an independent
  * driver-side re-implementation of the greedy packer.
  */
class CurationSpec extends AnyFunSuite with SparkTestBase {

  test("p2 hash split partitions the corpus into stable named splits") {
    val total = Tables.documents(spark, sfDir).count()
    val rows = Curation.p2HashSplit(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("test", "train", "val"))
    assert(rows.map(_.getLong(1)).sum == total)
    // train gets the lion's share (80% of hash space)
    val byName = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName("train") > byName("val") && byName("train") > byName("test"))
    // deterministic: a second run reproduces the same partition sizes
    val again = Curation.p2HashSplit(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == byName)
  }

  test("p6 stratified sample: membership equals the salted predicate exactly") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // independent JVM-side reimplementation of hash60('strat:'||id) % 100
    def keeps(id: Long, source: String): Boolean = {
      val hk = java.lang.Long.parseLong(md5hex(s"strat:$id").take(15), 16)
      hk % 100 < 20 + 15 * (source.drop(3).toInt % 6)
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expect = docs.filter((keeps _).tupled).map(_._1).toSet
    val got = Curation.p6StratifiedSample(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    assert(got === expect)
    // the sample is a strict, non-empty subset, and the salt decouples it
    // from p2's split hash (same id hashed WITHOUT the salt would differ)
    assert(got.nonEmpty && got.size < docs.length)
    val unsalted = docs.filter { case (id, src) =>
      java.lang.Long.parseLong(md5hex(id.toString).take(15), 16) %
        100 < 20 + 15 * (src.drop(3).toInt % 6)
    }.map(_._1).toSet
    assert(got !== unsalted)
  }

  test("p3 domain mix keeps exactly quota docs per source, ranks contiguous") {
    val kept = Curation.p3DomainMix(spark, sfDir)
    val perSource = kept.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), max(col("rk")).as("max_rk"))
      .collect()
    val counts = Tables.documents(spark, sfDir)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.nonEmpty && perSource.length == counts.size)
    perSource.foreach { r =>
      val src = r.getString(0)
      val quota = 8 + 2 * (src.drop(3).toInt % 7)
      val expect = math.min(quota.toLong, counts(src))
      assert(r.getLong(1) == expect, s"$src kept ${r.getLong(1)} != $expect")
      assert(r.getInt(2).toLong == expect, s"$src ranks not contiguous")
    }
    // content-stable: the kept doc set is identical on a second run
    val a = kept.collect().map(_.toSeq).toSet
    val b = Curation.p3DomainMix(spark, sfDir).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("curation results are invariant to the input partitioning") {
    // window-based ops are where accidental order-dependence hides: the
    // same transform over a differently-partitioned input must produce
    // identical rows (the windows order by explicit keys, never by
    // arrival order)
    val docs = Tables.documents(spark, sfDir)
    val shuffled = docs.repartition(7, col("lang"))
    Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      Curation.splitCounts, Curation.domainMix, Curation.seqPacking
    ).foreach { t =>
      val a = t(docs).collect().map(_.toSeq).toSet
      val b = t(shuffled).collect().map(_.toSeq).toSet
      assert(a === b)
      assert(a.nonEmpty)
    }
  }

  test("p8 budget selection equals the global prefix sum at any partition count") {
    val docs = Tables.documents(spark, sfDir)
    // driver-side reference: the GLOBAL ordered cumulative sum the
    // distributed prefix-sum form refuses to run as a one-partition window
    val scored = docs
      .select(col("doc_id"), TextAnalysis.tokensCol(col("text")).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n"),
        expr("cast(size(array_distinct(toks)) as bigint) * 1000 div size(toks)")
          .as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ordered = scored.sortBy { case (id, _, sc) => (-sc, id) }
    val expect = ordered.zip(
      ordered.map(_._2).scanLeft(0L)(_ + _).init)
      .collect { case ((id, n, sc), before)
          if before < Curation.SelectBudget => (id, sc, n, before) }
      .toSet
    // the distributed form, at three partition counts including the
    // degenerate 1 (= the global window) — identical kept sets with
    // identical tokens_before: the offsets + per-partition windows ARE
    // the global prefix sum, just factored
    Seq(1, 3, 8).foreach { parts =>
      val got = Curation.tokenBudgetSelect(docs, parts).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === expect, s"parts=$parts")
    }
    assert(expect.nonEmpty && expect.size < scored.length)
    // the boundary document is KEPT and overruns (offset discipline):
    // total kept tokens ≥ budget exactly when the corpus has enough
    val keptTokens = expect.toSeq.map(_._3).sum
    assert(keptTokens >= Curation.SelectBudget)
  }

  test("budget selection drops empty/whitespace docs and honors the budget param") {
    import spark.implicits._
    // split(trim(''), '\s+') is [""] — size 1, max diversity score 1000
    // — so a size-only guard would rank the empty doc FIRST and emit an
    // empty-text selected row (the r11 ADVICE failure, exactly what a
    // fully-span-removed p10 representative produces). The trimmed-text
    // gate must exclude rows 3 and 4 entirely.
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha alpha alpha alpha alpha alpha"),
      (3L, ""),
      (4L, "   "),
      // ADVICE r12: tabs/newlines-only text passes an ASCII-space trim
      // and tokenizes to phantom empty tokens (["",""], score 500) —
      // the gate must trim the FULL \s class
      (5L, "\t\n"),
      (6L, " \t \r\n ")).toDF("doc_id", "text")
    val all = Curation.tokenBudgetSelect(docs, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(all.keySet === Set(1L, 2L))
    assert(all(1L) === 1000L) // 4 distinct / 4 — the real max-diversity doc
    // explicit budget: doc 1 (score 1000, 4 tokens) fills a 4-token
    // budget; doc 2's tokens_before = 4 ≥ budget → cut
    val cut = Curation.tokenBudgetSelect(docs, 2, budget = 4L).collect()
      .map(_.getLong(0)).toSet
    assert(cut === Set(1L))
  }

  test("p4 packing matches a driver-side offset-quantized re-implementation") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(TextAnalysis.tokensCol(col("text"))).as("n_tokens"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .sortBy(_._1)
    // independent reimplementation: per shard, running total before each
    // doc decides its sequence
    val expected = docs
      .groupBy { case (id, _) => id / Curation.PackShard }
      .toSeq
      .flatMap { case (shard, ds) =>
        var cum = 0L
        ds.sortBy(_._1).map { case (_, n) =>
          val seq = cum / Curation.PackBudget
          cum += n
          ((shard, seq), n.toLong)
        }
      }
      .groupBy(_._1)
      .map { case ((shard, seq), xs) =>
        (shard, seq, xs.size.toLong, xs.map(_._2).sum) }
      .toSet
    val got = Curation.p4SeqPacking(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // every sequence but a shard's last is filled to at least the budget
    // minus its largest doc (a sequence spans exactly PackBudget stream
    // offsets, so only boundary overrun can shorten it)
    val lastSeq = got.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val maxDoc = docs.map(_._2).max
    got.foreach { case (shard, seq, _, n) =>
      if (seq != lastSeq(shard))
        assert(n >= Curation.PackBudget - maxDoc,
          s"shard $shard seq $seq underfilled: $n tokens")
    }
  }

  test("p5b Bloom-prefiltered decontamination equals exact p5 row-for-row") {
    val exact = Curation.p5Decontaminate(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val bloomed = Curation.p5bDecontaminateBloom(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(exact.nonEmpty, "fixture should surface real contamination")
    assert(bloomed === exact)
    // the prefilter is really in the plan (not optimized away)
    val plan = Curation.p5bDecontaminateBloom(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "Bloom prefilter missing from the physical plan")
  }

  test("p5b Bloom capacity derives from the eval gram count and the " +
    "derived filter loses nothing on a larger synthetic eval set") {
    import spark.implicits._
    // synthetic corpus with an eval side ~20x the fixture's gram volume:
    // 300 tokens per eval doc, and each train doc replants a 40-token
    // slice of one eval doc so the contamination set is non-trivial
    def tok(i: Long, t: Int): String = s"w${(i * 131 + t * 7) % 100000}"
    val docs = (0L until 120L).map { i =>
      val own = (0 until 300).map(t => tok(i, t))
      val text =
        if (i < Curation.EvalDocs) own.mkString(" ")
        else if (i % 3 == 0) {
          val src = i % Curation.EvalDocs
          (own.take(100) ++ (0 until 40).map(t => tok(src, 50 + t)) ++
            own.drop(140)).mkString(" ")
        } else own.mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    // the sizing path: capacity == the eval side's true distinct-gram
    // count once above the floor, the floor for degenerate sets
    val nEval = Curation.distinctGrams(
      docs.where($"doc_id" < Curation.EvalDocs)).count()
    assert(nEval > Curation.BloomMinSlots,
      s"synthetic eval side too small to exercise the derived path: $nEval")
    assert(Curation.bloomCapacityOf(nEval) === nEval)
    assert(Curation.bloomCapacityOf(5L) === Curation.BloomMinSlots)
    assert(Curation.bloomCapacityOf(0L) === Curation.BloomMinSlots)
    // no false negatives at the derived size: Bloom twin == exact, and
    // the contamination is real
    val exact = Curation.decontaminate(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val bloomed = Curation.decontaminateBloom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(exact.nonEmpty)
    assert(bloomed === exact)
  }

  test("p12 centroid artifact: K rows, refit-deterministic; selection " +
      "spans clusters and respects each cluster's budget") {
    val path = java.nio.file.Files.createTempDirectory("p12c")
      .toString + "/cent"
    Curation.writeClusterCentroids(spark, sfDir, path)
    def readCents() = spark.read.parquet(path).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).sortBy(_._1).toSeq
    val first = readCents()
    assert(first.length === Curation.P12K)
    assert(first.map(_._1) === (0 until Curation.P12K))
    Curation.invalidateCentroids(sfDir)
    Curation.writeClusterCentroids(spark, sfDir, path)
    assert(readCents() === first, "k-means refit must be deterministic")
    val sel = Curation.serveClusterBudget(spark, sfDir, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(sel.map(_._2).distinct.length > 1,
      "selection must span multiple induced clusters")
    // within each cluster: the selected set is exactly the score-desc
    // prefix whose running total stays under the budget (driver replay)
    val assign = Curation.clusterAssignments(spark, sfDir, path).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val scores = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .filter(_.getString(1).trim.nonEmpty)
      .map { r =>
        val toks = r.getString(1).trim.split("\\s+")
        (r.getLong(0), toks.length.toLong,
          toks.distinct.length.toLong * 1000 / toks.length)
      }
    val want = scores.filter(x => assign.contains(x._1))
      .groupBy(x => assign(x._1)).toSeq.flatMap { case (cid, docs) =>
        var before = 0L
        docs.sortBy(d => (-d._3, d._1)).flatMap { case (id, nT, sc) =>
          val row = if (before < Curation.P12ClusterBudget)
            Some((id, cid.toLong, sc, nT, before)) else None
          before += nT
          row
        }
      }.toSet
    assert(sel.toSet === want)
  }

  test("p12 grouped budget selection is invariant to the partition count") {
    val path = java.nio.file.Files.createTempDirectory("p12p")
      .toString + "/cent"
    Curation.writeClusterCentroids(spark, sfDir, path)
    val base = Curation.serveClusterBudget(spark, sfDir, path)
      .collect().map(_.toSeq).toSet
    for (n <- Seq(1, 3, 17)) {
      val got = Curation.tokenBudgetByKey(
        Curation.diversityScored(Tables.documents(spark, sfDir))
          .join(Curation.clusterAssignments(spark, sfDir, path), "doc_id"),
        n, Curation.P12ClusterBudget)
        .collect().map(_.toSeq).toSet
      assert(got === base, s"numParts=$n changed the selection")
    }
  }

  test("tokenBudgetByKey at 10k data-derived components (the p14 key " +
      "domain, mostly singletons) matches a driver replay at any " +
      "partition count") {
    // VERDICT r14's one scale-killer was the driver-side offsets fold,
    // O(T²) in the (partition, key) totals — fine for p12's K=32,
    // fatal for p14's corpus-scaled component keys. This pins the
    // windowed replacement on exactly that key domain: ~10⁴ keys,
    // mostly singletons, ids past Int.MaxValue (the 1e8-remap regime).
    import spark.implicits._
    val n = 10000
    val base = Int.MaxValue.toLong + 11L
    val rows = (0 until n).map { i =>
      // every 100th trio shares a component; the rest are singletons
      val cid = if (i % 100 < 3) base + (i / 100) * 100 else base + i
      (i.toLong, cid, (i * 37 % 1000).toLong, (50 + i % 100).toLong)
    }
    val budget = 100L
    val want = rows.groupBy(_._2).toSeq.flatMap { case (_, members) =>
      var before = 0L
      members.sortBy(r => (-r._3, r._1)).flatMap { case (id, cid, sc, nT) =>
        val row = if (before < budget) Some((id, cid, sc, nT, before))
          else None
        before += nT
        row
      }
    }.toSet
    // the cut binds in EVERY trio (members carry 50..52 tokens, so the
    // third always starts past the 100-token budget and the second
    // never does) while every singleton survives at tokens_before = 0
    assert(want.size === n - n / 100)
    for (numParts <- Seq(7, 32)) {
      val got = Curation.tokenBudgetByKey(
        rows.toDF("doc_id", "cid", "score", "n_tokens"), numParts, budget)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      assert(got.toSet === want, s"numParts=$numParts diverged")
    }
  }

  test("p13 curriculum packing matches a driver-side quality-order replay") {
    val got = Curation.p13CurriculumPack(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // driver replay: global quality order, cumulative offsets, quantize
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .filter(_.getString(1).trim.nonEmpty)
      .map { r =>
        val toks = r.getString(1).trim.split("\\s+")
        (r.getLong(0), toks.length.toLong,
          toks.distinct.length.toLong * 1000 / toks.length)
      }
    var before = 0L
    val want = docs.sortBy { case (id, _, sc) => (-sc, id) }
      .map { case (id, nT, sc) =>
        val row = (id, sc, nT, before / Curation.PackBudget)
        before += nT
        row
      }.toSet
    assert(got.toSet === want)
    // curriculum law: sequence ids are non-decreasing in quality order,
    // and the corpus fills more than one sequence
    val inOrder = got.sortBy { case (id, sc, _, _) => (-sc, id) }.map(_._4)
    assert(inOrder.sliding(2).forall(p => p.head <= p.last))
    assert(got.map(_._4).distinct.length > 1)
  }

  test("p14 semantic budget: driver replay over the s13 components, " +
      "diversity floor, long component keys survive") {
    val sel = Curation.p14SemanticBudget(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val comp = graft.operators.Clustering.s13GraphClusters(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .filter(_.getString(1).trim.nonEmpty)
      .map { r =>
        val toks = r.getString(1).trim.split("\\s+")
        (r.getLong(0), toks.length.toLong,
          toks.distinct.length.toLong * 1000 / toks.length)
      }
    // driver replay of the per-component score-desc prefix cut
    val want = docs.groupBy(d => comp(d._1)).toSeq
      .flatMap { case (cid, members) =>
        var before = 0L
        members.sortBy(d => (-d._3, d._1)).flatMap { case (id, nT, sc) =>
          val row = if (before < Curation.P14Budget)
            Some((id, cid, sc, nT, before)) else None
          before += nT
          row
        }
      }.toSet
    assert(sel.toSet === want)
    // diversity floor: every component's best-scored member is kept,
    // and the budget genuinely binds somewhere (some doc is dropped)
    val keptIds = sel.map(_._1).toSet
    docs.groupBy(d => comp(d._1)).foreach { case (cid, members) =>
      val best = members.minBy(d => (-d._3, d._1))._1
      assert(keptIds(best), s"component $cid lost its best member $best")
    }
    assert(keptIds.size < docs.length,
      "fixture budget must bind — nothing was cut")
    // the Long-key path: a component id past Int.MaxValue (the
    // 1e8-per-copy remap regime) flows through the grouped cut intact
    import spark.implicits._
    val bigCid = Int.MaxValue.toLong + 7L
    val synth = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha alpha alpha alpha"))
      .toDF("doc_id", "text")
    val lab = Seq((1L, bigCid), (2L, bigCid)).toDF("id", "component")
    val got = Curation.semanticBudget(synth, lab).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet === Set((1L, bigCid), (2L, bigCid)))
  }

  test("p5c grades every train doc; agrees with p5's boolean overlap") {
    val frac = Curation.p5cContaminationFrac(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nTrain = Tables.documents(spark, sfDir)
      .where(col("doc_id") >= Curation.EvalDocs).count()
    assert(frac.length === nTrain.toInt)
    frac.foreach { case (id, nG, nC, f) =>
      assert(nC <= nG, s"doc $id: $nC contaminated > $nG grams")
      assert(f >= 0.0 && f <= 1.0)
      assert(if (nG > 0) math.abs(f - nC.toDouble / nG) < 1e-6 else f === 0.0)
    }
    // boolean agreement: exactly the train docs p5 reports overlap for
    // carry a positive count here
    val p5Docs = Curation.p5Decontaminate(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    assert(frac.filter(_._3 > 0).map(_._1).toSet === p5Docs)
  }

  test("p5c extremes: full copy 1.0, disjoint 0.0, gram-less short doc") {
    import spark.implicits._
    val g = Curation.GramSize
    val eval0 = (0 until 12).map(i => s"ev$i").mkString(" ")
    val docs = (0 until Curation.EvalDocs).map(i => (i.toLong, eval0)) ++
      Seq(
        (100L, eval0),                                  // verbatim copy
        (101L, (0 until 12).map(i => s"tr$i").mkString(" ")), // disjoint
        (102L, (0 until (g - 1)).map(i => s"s$i").mkString(" ")))
    val got = Curation.contaminationFrac(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(got === Array(
      (100L, (12 - g + 1).toLong, (12 - g + 1).toLong, 1.0),
      (101L, (12 - g + 1).toLong, 0L, 0.0),
      (102L, 0L, 0L, 0.0)))
  }
}
