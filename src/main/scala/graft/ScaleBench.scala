package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Measured-scaling harness (VERDICT r4 "What's missing" §2: the 100 TB
  * claims were plan-audited but only ever measured at sf0.1).
  *
  * Materializes a ×`mult` scaled copy of the sf0.1 fixtures and times a
  * representative heavy query set against it, so SCALE.md can cite
  * MEASURED scaling curves instead of argued ones.
  *
  * Scaling model (documented, deliberate):
  *  - Fact tables (`lineitem`, `orders`, `events`, `documents`,
  *    `embeddings`) are unioned ×mult with per-copy key remapping
  *    (`key + copy·1e8`) so copies stay distinct entities — orderkeys
  *    remap in lock-step in orders+lineitem, preserving join fan-out.
  *  - Dimension tables stay fixed (each customer simply owns ×mult
  *    orders — the usual fact-grows-faster-than-dims shape).
  *  - `documents.text` gets a per-copy suffix and `embeddings.embedding`
  *    a per-copy epsilon shift: without them every doc/vector would have
  *    mult−1 EXACT clones and the dedup/ANN workloads would degenerate
  *    into one giant duplicate class instead of scaling realistically.
  *  - `events.ts` shifts by `copy` seconds to avoid exact-timestamp
  *    collisions in the as-of join.
  *
  * Query set: the per-shape heavy hitters. The O(n²)-by-design exact
  * oracle forms (c9/c10/c14 all-pairs, d5's capped verifier) are
  * excluded — their documented scale twins (c17/c19, d3-fed
  * verification) are in the set; that substitution IS the scale story.
  *
  * Methodology: one untimed warmup query for JIT/codegen, then ONE timed
  * pass per query through the noop sink (multi-second queries; median-of-3
  * would triple a multi-minute run for noise that matters at the 0.1s
  * scale, not here).
  *
  * Usage: `runMain graft.ScaleBench [srcDir] [mult] [workDir] [set]`
  * — defaults `/root/testdata/sf0.1`, 10, `/tmp/graft_scale`, `full`.
  * `set=linear` drops the queries with Θ(n²) COMPUTE (c19's exact
  * all-pairs Conn — shuffle-bounded but still quadratic work) for the
  * larger multipliers where only the scalable forms are the point.
  */
object ScaleBench {

  private val CopyOffset = 100000000L

  /** Wall-clock of a thunk — the one timing helper every comparison
    * mode shares (a per-mode copy invites unit drift that would skew
    * cross-mode record comparisons).
    */
  private def timed[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  val scaleSet: Seq[String] = Seq(
    "q1_pricing_summary", "q3_revenue_by_nation", "q13_monthly_revenue",
    "q14_top_customer_per_nation", "q16b_approx_percentiles",
    "d1_exact_dedup", "d2_minhash_sig", "d3_lsh_pairs", "d4_simhash",
    "d6_dedup_groups",
    // round-14: incremental dedup — the serve row hits the store the
    // pre-timed d11_index_build row wrote, so the decade claim is the
    // SERVING cost (delta sign + one corpus-band scan, no corpus
    // shuffle), with the corpus-sized build carried separately
    "d11_incremental_dedup",
    "p1_corpus_curation", "p2_hash_split", "p5_decontaminate",
    "s1_cosine_topk", "s2_lsh_buckets", "s3_ann_ivf",
    "s4_embedding_neardup", "s5_ann_recall",
    // round-10: the auto-nlist IVF (cells derived from the count, √n
    // build) — the scale form whose pinned-K twin s3 would probe a
    // fixed FRACTION of the corpus per query
    "s7_ann_ivf_auto",
    // round-11: the PQ code scan (memory-bound ANN companion), the
    // IVFADC serving composition, and the substring-span dedup
    // (linear window-hash shuffles)
    "s8_ann_pq", "s9_ann_ivfadc", "d9_substring_spans",
    "d9b_span_removal", "p7_quality_score",
    // round-11b: the auto-banded moderate-threshold LSH, the
    // distributed token-budget cut (three narrow passes, no global
    // window — the per-partition offsets ARE the scale claim), and the
    // bigram-LM scorer (model shuffle one key wider than t12's)
    "d10_lsh_auto", "p8_token_budget", "t13_bigram_lm",
    "p10_pipeline_e2e",
    // round-13: the learned pipeline (VERDICT r12 next-2) — expect the
    // in-query model fits (LR + bigram LM, both vocabulary-bound) to
    // dominate while the gates-first tail rides p10's shape
    "p11_pipeline_learned",
    "t1_token_stats", "t3_fingerprint", "t5_repetition",
    "t7_quality_gate", "t8_boilerplate",
    "e1_tumbling_hourly", "e3_sessions", "e5_asof_attribution",
    "e6_range_campaigns", "e7_session_campaign_overlap",
    "t9_heavy_hitters", "t10_oov_rate",
    // round-9 scorers + sampler (VERDICT r9 §next-5): t12's vocab-sized
    // shuffle join is the one with a real transition to observe; t11 and
    // p6 are scan-shaped and should ride flat
    "t11_bm25", "t12_lm_score", "p6_stratified_sample",
    // t4b first so t4c's row times the APPLY leg alone (the trainer
    // memoizes per (dir, m) within the JVM)
    "t4b_bpe_merges", "t4c_bpe_apply",
    // round-14: rep selection (d6's closure + one combine), graded
    // decontamination (p5's broadcast probe + one grouped count), and
    // the cluster-balanced budget (serve row assigns from the
    // pre-built centroids; the seeded k-means fit is its own
    // p12_centroid_build row) — all expected linear
    "d12_group_reps", "p5c_contamination_frac", "p12_cluster_budget",
    // round-14: filtered ANN — candidate mass is selectivity·2n/√nlist
    // (the widened probe rule), so the row should track s7's shape at
    // ~a tenth the ranked candidates
    "s11_ann_filtered",
    // round-14: corpus-level boilerplate removal — three linear
    // line-level shuffles (the d9b family)
    "t16_boilerplate_removal",
    // round-14: curriculum packing — p8's three narrow passes + a
    // per-row division; should track p8's decade shape exactly
    "p13_curriculum_pack",
    // round-14: the kNN graph — c21's candidate chain + L-bounded
    // aggregate WITHOUT the exact-leg denominator, so the row prices
    // the production graph build alone
    "s12_knn_graph",
    // round-14: mutual-kNN components — the s12 build + one graph-sized
    // self-join + the d6 propagation loop; the delta over s12's row
    // prices the clustering itself
    "s13_graph_clusters",
    // round-14: the semantic-component budget cut — s13's build + one
    // doc-side join + the p12 grouped prefix sum; the delta over s13's
    // row prices the cut
    "p14_semantic_budget",
    // round-14: graph-index serving — the corpus-sized build is its own
    // s14_index_build row; this row serves a 1/8 delta batch against
    // the frozen store (delta signs itself, probes pre-signed buckets,
    // argmin — no corpus re-sign, no corpus shuffle)
    "s14_graph_assign",
    "c1_assign", "c17_conn_partitioned", "c19_conn_topk",
    "c20_silhouette_simplified",
    "mm2_frame_census", "mm8_wav_meta", "mm9_pcm_stats",
    "mm10_audio_neardup", "mm10b_audio_dedup",
    // round-13: the capped image near-dup groups (VERDICT r12 next-8) —
    // fixed blocking-key space, so only the cap keeps the decade flat
    "mm6b_pixel_dedup",
    // the full seeded MOPSO loop — the reference's defining scaling risk
    // (per-iteration broadcast + bounded collect, SURVEY §7.4.5); linear
    // per iteration, so it stays in the linear set too
    "m1_mopso_archive")

  /** Per-dimension amplitude of the `indep` embedding perturbation:
    * uniform in [−A, A] per (copy, vector, dimension) gives an expected
    * displacement of √(64/3)·A ≈ 0.69 — about half the fixture's
    * typical inter-point distance (~1.4 at per-dim std 0.125) — so a
    * copy is a genuinely NEW point in the same density region, not an
    * ε-shadow of its original (VERDICT r12 next-9: the ε-copy fixture
    * made every recall number partly a measurement of copy structure).
    * Deterministic: xxhash64(vec_id, copy, dim) is the generator.
    */
  private val IndepAmp = 0.15

  /** One scaled copy of a fact table: keys shifted, content perturbed. */
  private def copyOf(spark: SparkSession, src: String, name: String,
      i: Int, perturb: String = "eps"): DataFrame = {
    val off = CopyOffset * i
    name match {
      case "lineitem" =>
        Tables.lineitem(spark, src)
          .withColumn("l_orderkey", col("l_orderkey") + lit(off))
      case "orders" =>
        Tables.orders(spark, src)
          .withColumn("o_orderkey", col("o_orderkey") + lit(off))
      case "events" =>
        Tables.events(spark, src)
          .withColumn("event_id", col("event_id") + lit(off))
          .withColumn("ts",
            col("ts") + expr(s"INTERVAL $i SECOND"))
      case "documents" =>
        val d = Tables.documents(spark, src)
          .withColumn("doc_id", col("doc_id") + lit(off))
        val shifted =
          if (i == 0) d
          else d.withColumn("text", concat(col("text"), lit(s" cp$i")))
        shifted.withColumn("n_chars", length(col("text")).cast("long"))
      case "embeddings" =>
        val base = Tables.table(spark, src, "embeddings")
          .withColumn("vec_id", col("vec_id") + lit(off))
        if (perturb == "indep") {
          // independent per-(copy, vector, dimension) displacement —
          // see [[IndepAmp]]; copy 0 stays the original corpus
          if (i == 0) base
          else base.withColumn("embedding",
            zip_with(col("embedding"),
              transform(
                sequence(lit(0),
                  lit(graft.functions.Similarity.Dim - 1)), d =>
                ((pmod(xxhash64(col("vec_id"), lit(i), d, lit("indep")),
                  lit(1000000L)) / lit(1000000.0) - lit(0.5)) *
                  lit(2 * IndepAmp))),
              (x, u) => (x + u).cast("float")))
        } else {
          val eps = (i * 5e-4).toFloat
          base.withColumn("embedding",
            transform(col("embedding"), x => (x + lit(eps)).cast("float")))
        }
      case other =>
        Tables.table(spark, src, other)
    }
  }

  private val factTables =
    Seq("lineitem", "orders", "events", "documents", "embeddings")

  /** Builds the scaled dataset dir (idempotent: skips when present).
    * `only` restricts to a table subset — the cheap-metrics `layout`
    * mode needs just the embeddings fact, not a full x1000 star schema.
    */
  def materialize(spark: SparkSession, src: String, mult: Int,
      work: String, only: Option[Set[String]] = None,
      perturb: String = "eps"): Unit = {
    Tables.names.filter(n => only.forall(_.contains(n))).foreach { name =>
      val dest = s"$work/$name.parquet"
      if (!new java.io.File(dest, "_SUCCESS").exists()) {
        val df =
          if (factTables.contains(name))
            (0 until mult).map(copyOf(spark, src, name, _, perturb))
              .reduce(_ union _)
          else Tables.table(spark, src, name)
        df.write.mode("overwrite").parquet(dest)
      }
    }
  }

  /** The q3 broadcast→shuffle mitigation, measured: bucket lineitem and
    * orders on the order key (one-time ingest cost, reported separately),
    * run the SAME q3 plan over the bucketed tables, and time it against
    * the plain-parquet form in the same session. Bucketing satisfies the
    * big-big join's required distribution, so neither fact side shuffles
    * — the co-located-join pattern ScaleTechniquesSpec proves
    * exchange-free, here demonstrated at scale. Returns the timing
    * entries; asserts both forms agree before trusting either number.
    */
  private def q3BucketCompare(spark: SparkSession,
      work: String): Seq[(String, Double)] = {
    val db = "graft_bucket"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db " +
      s"LOCATION '$work/bucket_warehouse'")
    spark.sql(s"USE $db")
    // always rebuild: a warehouse surviving a fact regeneration would
    // otherwise time stale bucketed data (ADVICE r7)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    val t0 = System.nanoTime()
    Tables.lineitem(spark, work).write
      .bucketBy(32, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    Tables.orders(spark, work).write
      .bucketBy(32, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_b")
    val buildSec = (System.nanoTime() - t0) / 1e9
    import graft.operators.Relational
    def run(li: DataFrame, o: DataFrame): (Double, Array[(String, Double, Long)]) = {
      val df = Relational.q3Core(li, o,
        Tables.customer(spark, work), Tables.nation(spark, work))
      val t = System.nanoTime()
      val rows = df.collect().map(r => // 25 rows
        (r.getString(0), r.getDouble(1), r.getLong(2)))
      ((System.nanoTime() - t) / 1e9, rows)
    }
    def plain() = run(Tables.lineitem(spark, work), Tables.orders(spark, work))
    def bucketed() = run(spark.table("li_b"), spark.table("o_b"))
    // one untimed pass each: JIT/codegen + page cache, fair to both forms
    plain(); bucketed()
    val (plainSec, plainRows) = plain()
    val (bucketSec, bucketRows) = bucketed()
    // keys and counts must match exactly; the revenue sums ride different
    // aggregation orders (shuffle-hash vs colocated SMJ), so the rounded
    // cent may legitimately differ by one ulp-flip — tolerate 1 cent
    require(plainRows.length == bucketRows.length &&
      plainRows.zip(bucketRows).forall { case ((n1, r1, c1), (n2, r2, c2)) =>
        n1 == n2 && c1 == c2 && math.abs(r1 - r2) <= 0.011
      }, "bucketed q3 diverged from the plain plan")
    Seq("q3_plain" -> plainSec, "q3_bucketed" -> bucketSec,
      "q3_bucket_build" -> buildSec)
  }

  /** The m1 superlinearity mitigation, measured: the reference's
    * partition-scoped Conn (A8) precomputes neighbor lists in O(Σ nᵤ²),
    * so with the partition count PINNED (m1's driver-contract config
    * keeps the reference's 8) per-partition size grows with the data and
    * the loop goes quadratic — measured 17x for the x10→x100 decade.
    * The engine's `numPartitions` knob restores linearity by holding
    * per-partition size constant instead (nᵤ fixed → O(n·nᵤ)). This mode
    * times the same seeded run both ways at ×mult. The scaled form runs
    * FIRST (cold), the pinned form second with every JIT benefit — so a
    * measured gap understates the mitigation rather than inflating it.
    * (Different partitioning means partition-scoped fitness differs —
    * these are two configs of the same workload, not twins; both runs
    * must still produce a non-empty archive.)
    */
  private def m1TimeRun(spark: SparkSession, work: String,
      parts: Int, sampleFraction: Double = 1.0): Double = {
    import graft.mopso.{Config, Mopso, MopsoConfig}
    val pts = Tables.labeledPoints(spark, work)
    val cfg = MopsoConfig.avg(numPartitions = parts).copy(
      iterMax = 10, partitioning = Config.PartByIdRange,
      fitnessSampleFraction = sampleFraction)
    val t0 = System.nanoTime()
    val r = Mopso.run(spark, pts, cfg, seed = 42L)
    require(r.archive.nonEmpty, s"empty archive at parts=$parts")
    (System.nanoTime() - t0) / 1e9
  }

  private def m1PartitionCompare(spark: SparkSession, work: String,
      mult: Int): Seq[(String, Double)] = {
    val scaledParts = 8 * mult
    val rows =
      Seq(s"m1_parts$scaledParts" -> m1TimeRun(spark, work, scaledParts))
    if (mult < 1000) rows :+ ("m1_parts8" -> m1TimeRun(spark, work, 8))
    else {
      // the reference-pinned 8-partition face at the third decade
      // (VERDICT r17 next-7): its partition-local Conn precompute is
      // Σ nᵤ² = n²/8 pair ops — exact arithmetic from the even
      // PartByIdRange split, the lshCandidatePairCount discipline —
      // which at the x100-measured pair rate is hours of wall clock,
      // not a timed row. The record carries the wall as arithmetic
      // plus the two survivors MEASURED: the scaled-partition face
      // (nᵤ held constant — linear) and the §7.4.6 sampled face at
      // the PINNED 8 partitions (neighbor build shrinks with the
      // square of the fraction; fraction 0.1 ≈ the x100 budget).
      val n = Tables.labeledPoints(spark, work).count().toDouble
      rows ++ Seq(
        "m1_parts8_pair_ops" -> n * n / 8.0,
        "m1_parts8_sample01" -> m1TimeRun(spark, work, 8, 0.1))
    }
  }

  /** The vocab pipeline at corpus scale (VERDICT r7 §next-7): t6+t10
    * chained, but with a PRODUCTION-sized vocabulary (50k entries — the
    * fixture queries use 20 to keep oracles readable) so the broadcast
    * leg is measured at its real size. Three timings: induction alone
    * (one corpus scan → TakeOrderedAndProject of per-mapper partials),
    * application alone against the materialized vocab (broadcast join +
    * doc_id agg), and the un-cached end-to-end chain (what a one-shot
    * pipeline pays). Sanity: apply output row count equals the doc
    * count and OOV ratios stay in [0, 1].
    */
  private def vocabChainCompare(spark: SparkSession,
      work: String): Seq[(String, Double)] = {
    import graft.functions.TextAnalysis.tokensCol
    val VocabBig = 50000
    def induced = Tables.documents(spark, work)
      .select(explode(tokensCol(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(VocabBig)
    def applied(vocab: DataFrame) = Tables.documents(spark, work)
      .select(col("doc_id"), explode(tokensCol(col("text"))).as("tok"))
      .join(broadcast(vocab.withColumn("in_vocab", lit(1))),
        Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1).otherwise(0)).as("n_oov"))
      .select(col("doc_id"),
        round(col("n_oov") / col("n_tokens"), 6).as("oov_ratio"))
    // warmup: JIT + page cache, fair to all three timings
    applied(induced.select(col("tok"))).write
      .format("noop").mode("overwrite").save()
    val (tInduce, vocab) = timed {
      val v = induced.select(col("tok")).cache()
      v.count()
      v
    }
    val (tApply, nRows) = timed {
      val out = applied(vocab).cache()
      val n = out.count()
      val bad = out.where(col("oov_ratio") < 0 || col("oov_ratio") > 1).count()
      out.unpersist()
      require(bad == 0, "oov_ratio out of [0,1]")
      n
    }
    require(nRows == Tables.documents(spark, work).count(),
      "apply lost documents")
    vocab.unpersist()
    val (tChain, _) = timed {
      applied(induced.select(col("tok"))).write
        .format("noop").mode("overwrite").save()
    }
    Seq("vocab_induce" -> tInduce, "vocab_apply" -> tApply,
      "vocab_chained_e2e" -> tChain)
  }

  /** The BPE trainer at production-shaped merge depth (VERDICT r8
    * §next-2): the fixture queries train M=32 merges to keep the oracle
    * CTE chain readable; a real tokenizer runs tens of thousands. This
    * mode times the full trainer at M=1000 (and M=4000 below x100)
    * against the scaled corpus, recording the merge count actually
    * reached (early stop is live semantics now — the count IS the
    * result if the vocabulary exhausts first). The vocabulary-bound
    * claim is the point: x10→x100 is 10× the corpus but the same
    * distinct-word table, so the per-merge cost — and hence the whole
    * loop beyond the initial scan — should barely move.
    */
  private def bpeDepthCompare(spark: SparkSession, work: String,
      mult: Int): Seq[(String, Double)] = {
    import graft.functions.Bpe
    val depths = if (mult >= 100) Seq(1000) else Seq(1000, 4000)
    val scaledRows = depths.flatMap { m =>
      val t0 = System.nanoTime()
      val (merges, words) = Bpe.train(spark, work, m)
      val sec = (System.nanoTime() - t0) / 1e9
      require(words.count() > 0, "trainer lost the word table")
      Seq(s"bpe_m$m" -> sec, s"bpe_m${m}_merges" -> merges.length.toDouble)
    }
    scaledRows ++ zipfDepthRows(spark, work, mult)
  }

  /** BPE at PRODUCTION depth (VERDICT r9 §next-4): the scaled TPC-H-ish
    * corpus exhausts its mergeable pairs at ~90–180 merges — two orders
    * of magnitude short of a 30k-merge production run — so the per-merge
    * cost curve was never pinned in the regime that matters. This
    * generates a vocabulary-RICH synthetic corpus (Zipf-tailed rank
    * distribution over syllable-composed word types: rank spelled in
    * base-8 syllables, so frequent words are short and the type set has
    * deep shared substructure for merges to consume) and runs the FULL
    * trainer — pre-tokenize, word-count contraction, merge loop — to
    * ≥1k ACTUAL merges with no early stop. Corpus tokens grow with
    * `mult`; the word TABLE stays vocabulary-bound, which is exactly the
    * claim the depth rows measure (per-merge cost flat across the
    * decade). Two depths pin the curve's slope, not just one point. The
    * driver-gate oracle is untouched (M=32 on the fixture corpus).
    */
  private def zipfDepthRows(spark: SparkSession, work: String,
      mult: Int): Seq[(String, Double)] = {
    import graft.functions.Bpe
    val zdir = work + "_zipf"
    writeZipfCorpus(spark, zdir, nDocs = 2000L * mult)
    // 4000 added r11 (VERDICT r10 §next-5): the ~20k-type vocabulary
    // sustains it (each multi-syllable type ultimately collapses to one
    // symbol, so available merges ≈ the type count), pinning the
    // per-merge curve 4× deeper — 30k is then one extrapolation step
    Seq(250, 1000, 4000).flatMap { m =>
      val t0 = System.nanoTime()
      val (merges, words) = Bpe.train(spark, zdir, m)
      val sec = (System.nanoTime() - t0) / 1e9
      require(words.count() > 0, "trainer lost the zipf word table")
      require(merges.length == m,
        s"zipf corpus exhausted at ${merges.length} < $m merges — " +
          "not the production-depth regime this mode exists to pin")
      Seq(s"bpezipf_m$m" -> sec,
        s"bpezipf_m${m}_merges" -> merges.length.toDouble)
    }
  }

  /** Zipf vocabulary constants: ~[[ZipfVocab]] word types, log-uniform
    * rank sampling (density ∝ 1/rank — Zipf s≈1), [[ZipfWordsPerDoc]]
    * tokens per document.
    */
  private val ZipfVocab = 20000.0
  private val ZipfWordsPerDoc = 100

  /** The corpus generator: fully distributed (spark.range + per-position
    * hash sampling, no driver loop, no RNG — xxhash64 keyed by (doc,
    * position) is the deterministic seed), written as a documents table
    * so [[graft.functions.Bpe.train]] runs its production path on it.
    */
  private def writeZipfCorpus(spark: SparkSession, dir: String,
      nDocs: Long, vocab: Double = ZipfVocab): Unit = {
    val syls = array(Seq("ba", "ce", "di", "fo", "gu", "he", "ki", "lo")
      .map(lit): _*)
    // rank → base-8 digits → syllables: rank 1 = "ce", rank 9 = "cece" …
    def wordOf(rank: org.apache.spark.sql.Column) =
      concat_ws("", transform(
        regexp_extract_all(conv(rank.cast("string"), 10, 8),
          lit("."), lit(0)),
        d => element_at(syls, ascii(d) - 47)))
    // u log-uniform in [0,1) → rank = floor(V^u) ∈ [1, V): P(r) ∝ 1/r
    def rankAt(i: org.apache.spark.sql.Column) = floor(pow(lit(vocab),
      pmod(xxhash64(col("id"), i, lit("zipfbpe")), lit(1000000L))
        / lit(1000000.0))).cast("long")
    spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(ZipfWordsPerDoc)),
          i => wordOf(rankAt(i)))).as("text"))
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
  }

  /** BPE at FULL production depth — 30k real merges (VERDICT r12
    * next-7, carried from r11): the 20k-type zipf corpus exhausts
    * around its type count, so this mode generates a 50k-type corpus
    * (available merges ≈ the type count — each multi-syllable type
    * ultimately collapses to one symbol) and runs the trainer to
    * m = 30000 with no early stop, recording total seconds and two
    * interior checkpoints so the per-merge cost curve is pinned IN the
    * production regime rather than extrapolated from 4k. The
    * vocabulary-bound claim is the point: per-merge cost should hold
    * the ~0.18 s/merge slope the 250/1000/4000 rows measured.
    */
  private def bpe30kRows(spark: SparkSession, work: String,
      mult: Int): Seq[(String, Double)] = {
    import graft.functions.Bpe
    val zdir = work + "_zipf50k"
    writeZipfCorpus(spark, zdir, nDocs = 2000L * mult, vocab = 50000.0)
    Seq(1000, 30000).flatMap { m =>
      val t0 = System.nanoTime()
      val (merges, words) = Bpe.train(spark, zdir, m)
      val sec = (System.nanoTime() - t0) / 1e9
      require(words.count() > 0, "trainer lost the 50k-zipf word table")
      require(merges.length == m,
        s"50k-type corpus exhausted at ${merges.length} < $m merges")
      Seq(s"bpezipf50k_m$m" -> sec,
        s"bpezipf50k_m${m}_merges" -> merges.length.toDouble)
    }
  }

  /** The auto-IVF recall/cost curve at corpus scale (the s7 twin of the
    * `connlsh` mode): growing nlist with √n keeps per-probe work
    * √-scaled, but at FIXED nprobe = 1 the probed corpus fraction
    * shrinks as 1/√n — whether recall survives is a measurement, not an
    * assumption. This mode records, at the decade's derived nlist and
    * from a ~100-query hash-sampled set (exact denominators O(s·n),
    * computed ONCE per curve — the lshSampledRecall pattern), the
    * recall over an nprobe grid for THREE query/index combinations:
    * easy (corpus-sampled) queries on the oracle-convention index, HARD
    * (cell-radius-displaced, [[graft.functions.Similarity.hardQueries]])
    * queries on the same index, and the hard queries on the TRAINED
    * (seeded k-means) quantizer — the curve the engine's recall-targeted
    * [[graft.functions.Similarity.ivfProbesFor]] rule is derived from.
    * Also rides the s4/d7 watch metrics (uncapped vs capped candidate
    * mass) and the capped d7 groups end-to-end time.
    */
  private def ivfAutoCompare(spark: SparkSession,
      work: String): Seq[(String, Double)] = {
    import graft.functions.{Dedup, Similarity}
    val n = Tables.embeddings(spark, work).count()
    val nlist = Similarity.ivfCellsFor(n)
    val step = math.max(1L, n / 100L)
    def timeRanked(np: Int): Double = {
      val t0 = System.nanoTime()
      Similarity.annIvfAutoRanked(spark, work, np,
          Similarity.querySampleFilter(step))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // the nprobe grid (VERDICT r10 §next-1): the cheap point, the
    // engine's recall-targeted rule, √nlist and 2√nlist, the r10
    // constant-corpus-fraction rule, and nlist/2 — enough of the curve
    // to SEE the recall-target crossing, not just straddle it
    val sq = math.ceil(math.sqrt(nlist.toDouble)).toInt
    val grid = Seq(1, Similarity.ivfProbesFor(nlist), sq, 2 * sq,
      math.max(1, nlist / graft.operators.Clustering.K),
      math.max(1, nlist / 2)).distinct.sorted
    timeRanked(1) // untimed warmup: JIT/codegen + page cache, fair to all settings
    // easy (corpus-sampled) vs HARD (displaced out-of-corpus) queries:
    // each curve computes its exact denominator ONCE (ivfRecallCurve)
    val easy = Similarity.ivfRecallCurve(spark, work,
      Tables.embeddings(spark, work)
        .where(Similarity.querySampleFilter(step))
        .select(col("vec_id"), col("features")), grid)
    val hardQs = Similarity.hardQueries(spark, work, step)
    val hard = Similarity.ivfRecallCurve(spark, work, hardQs, grid)
    // the same hard queries against the TRAINED (seeded k-means)
    // quantizer — the production IVF build; its curve is the one the
    // engine's nprobe rule is derived from
    val hardKq = Similarity.ivfRecallCurve(spark, work, hardQs, grid,
      trained = true)
    def d7Timed(): Double = {
      val t0 = System.nanoTime()
      val groups = Dedup.queries("d7_semantic_groups")(spark, work)
      groups.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    Seq(
      "ivf_n_vectors" -> n.toDouble,
      "ivf_nlist" -> nlist.toDouble,
      // the embeddings-family fixed layout worth WATCHING per decade:
      // s4/d7's 8-plane near-dup buckets (layout fixed by the cosine
      // threshold's recall needs, not free to grow like c21's) — the
      // uncapped candidate mass next to the capped emission d7 now rides
      "s4_bucket_pairs" ->
        Similarity.nearDupCandidatePairs(spark, work).toDouble,
      "s4_bucket_pairs_capped" ->
        Similarity.nearDupCandidatePairsCapped(spark, work).toDouble,
      // the capped groups form end-to-end at the decade (the measured
      // mitigation, VERDICT r10 §next-2)
      "d7_groups_sec" -> d7Timed(),
      // quantizer geometry: mean cell radius of each quantizer (the
      // hard-query displacement anchor is the TRAINED one's)
      "ivf_rbar_first" ->
        Similarity.meanCellRadius(spark, work, step, trained = false),
      "ivf_rbar_kq" ->
        Similarity.meanCellRadius(spark, work, step, trained = true)) ++
      grid.flatMap { np =>
        Seq(s"ivf_np${np}_sec" -> timeRanked(np),
          s"ivf_np${np}_recall" ->
            easy.find(_._1 == np).get._2,
          s"ivf_np${np}_hardrecall" ->
            hard.find(_._1 == np).get._2,
          s"ivf_np${np}_hardrecall_kq" ->
            hardKq.find(_._1 == np).get._2)
      }
  }

  /** s10/s10b decade probe: recall@5 and wall-clock of the truncated-
    * prefix shortlist at m ∈ {8, 16, 32} kept dims and of the learned
    * PCA rotation at m = TruncDim, all against ONE exact top-5
    * denominator over the scaled corpus. The question per decade: does
    * the rotation's recall edge over the raw prefix survive corpus
    * growth (the kept-dims budget is the memory story; recall is what
    * it buys), and does the fit stay a one-Gram-matrix pass. The
    * rotation rows split fit from serve (p7/s9 discipline).
    */
  private def truncCompare(spark: SparkSession,
      work: String): Seq[(String, Double)] = {
    import graft.functions.Similarity
    val e = Tables.embeddings(spark, work)
    val n = e.count()
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("qid"), col("nid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def timedPairs(df: => org.apache.spark.sql.DataFrame)
        : (Set[(Long, Long)], Double) = {
      val t0 = System.nanoTime()
      val p = pairs(df)
      (p, (System.nanoTime() - t0) / 1e9)
    }
    // untimed warmup (JIT/codegen + page cache, fair to all settings)
    pairs(Similarity.truncatedTopK(e, 8, 5))
    val (exact, exactSec) =
      timedPairs(Similarity.truncatedTopK(e, Similarity.Dim, 5))
    def recall(got: Set[(Long, Long)]): Double =
      (got intersect exact).size.toDouble / exact.size
    val prefixRows = Seq(8, 16, 32).flatMap { m =>
      val (got, sec) = timedPairs(
        Similarity.truncatedTopK(e, m, Similarity.TruncShortlist))
      Seq(s"prefix${m}_sec" -> sec, s"prefix${m}_recall" -> recall(got))
    }
    val rotPath = s"/tmp/graft_scale_rot/${new java.io.File(work).getName}"
    val tFit = System.nanoTime()
    Similarity.writeRotation(spark, work, rotPath)
    val fitSec = (System.nanoTime() - tFit) / 1e9
    val (rotGot, rotSec) = timedPairs(
      Similarity.serveRotated(spark, work, rotPath))
    // the build-time worth-it gauge: kept explained variance vs the
    // flat-spectrum baseline TruncDim/Dim — when it reads near the
    // baseline, expect the rotated recall row at parity with prefix
    val keptEvr = spark.read.parquet(rotPath)
      .agg(sum(col("evr"))).collect()(0).getDouble(0)
    Seq("trunc_n_vectors" -> n.toDouble, "exact_sec" -> exactSec) ++
      prefixRows ++ Seq(
        s"rot${Similarity.TruncDim}_fit_sec" -> fitSec,
        s"rot${Similarity.TruncDim}_sec" -> rotSec,
        s"rot${Similarity.TruncDim}_recall" -> recall(rotGot),
        s"rot${Similarity.TruncDim}_evr" -> keptEvr)
  }

  /** Cheap-metrics-only layout probe for multipliers where end-to-end
    * timing is beside the point (VERDICT r10 §next-3: the log₂/√ layout
    * rules were two-point extrapolations — one x1000 row turns them into
    * data). Materializes ONLY the embeddings fact (both rules' inputs
    * derive from it) and records the O(n) histogram counts: candidate
    * pairs at the pinned vs auto LSH layout, the derived nlist, and the
    * s4 watch metrics. No recall, no wall-clock rows — the counts are
    * exact arithmetic and they alone decide whether a layout survives
    * the decade.
    */
  private def layoutProbe(spark: SparkSession,
      work: String): Seq[(String, Double)] = {
    import graft.functions.Similarity
    import graft.operators.Clustering
    val n = Tables.labeledPoints(spark, work).count()
    val scaled = Clustering.lshPlanesFor(n)
    val nlist = Similarity.ivfCellsFor(n)
    Seq(
      "connlsh_n_points" -> n.toDouble,
      "connlsh_auto_planes" -> scaled.toDouble,
      s"connlsh_planes${Clustering.LshPlanes}_pairs" ->
        Clustering.lshCandidatePairCount(spark, work,
          Clustering.LshPlanes, Clustering.LshTables).toDouble,
      s"connlsh_planes${scaled}_pairs" ->
        Clustering.lshCandidatePairCount(spark, work,
          scaled, Clustering.LshTables).toDouble,
      "ivf_n_vectors" -> n.toDouble,
      "ivf_nlist" -> nlist.toDouble,
      "s4_bucket_pairs" ->
        Similarity.nearDupCandidatePairs(spark, work).toDouble,
      "s4_bucket_pairs_capped" ->
        Similarity.nearDupCandidatePairsCapped(spark, work).toDouble,
      // r15: the graph build's capped-emission valve, measured as a
      // candidate-mass formula over the bucket histogram — the number
      // that decides whether the s12 chain survives the third decade
      // (SCALE.md §r15: uncapped = 608.9B at x1000-eps)
      s"graph_pairs_capped${Clustering.GraphBuildCap}" ->
        Clustering.lshCappedCandidatePairCount(spark, work,
          scaled, Clustering.LshTables,
          Clustering.GraphBuildCap).toDouble,
      "cheap_metrics_only" -> 1.0)
  }

  /** LSH-fed Conn at corpus scale (the c21 claim, measured): a FIXED
    * sign-LSH layout has a fixed bucket-mass distribution, so its
    * candidate compute is Θ(n²) — the 4×8 layout that reads as "2.5×
    * pruning" at fixture size is quadratic all the same. The scale knob
    * is PLANES: growing them with log₂(mult) splits every table into
    * ~mult× more buckets, holding per-bucket occupancy (and hence
    * candidate pairs per point) roughly constant across the decade.
    * This mode records, for the pinned fixture layout and the scaled
    * one, the exact candidate-pair count (from the bucket histogram, no
    * pair materialization) and the end-to-end LSH Conn time; the pinned
    * timing is skipped with -1 when its own pair count says the run is
    * a quadratic stall (> ~1.5e9 pairs), because the count already IS
    * the verdict.
    */
  private def connLshCompare(spark: SparkSession, work: String,
      mult: Int): Seq[(String, Double)] = {
    import graft.operators.Clustering
    val tables = Clustering.LshTables
    val pinned = Clustering.LshPlanes
    // the scaled layout is now the ENGINE's rule (Clustering.lshPlanesFor,
    // promoted from this mode's r9 ad-hoc log2(mult) — VERDICT r9
    // §next-3): derived from the actual point count, so this mode
    // exercises exactly what production connLshAuto would run
    val n = Tables.labeledPoints(spark, work).count()
    val scaled = Clustering.lshPlanesFor(n)
    def pairsOf(p: Int): Long =
      Clustering.lshCandidatePairCount(spark, work, p, tables)
    def timeConn(p: Int): Double = {
      val t0 = System.nanoTime()
      val v = Clustering.connLshValue(spark, work, p, tables).head()
      require(!v.isNullAt(0) && v.getDouble(0) > 0.0,
        s"degenerate conn_lsh at planes=$p")
      (System.nanoTime() - t0) / 1e9
    }
    val pairsPinned = pairsOf(pinned)
    val pairsScaled = pairsOf(scaled)
    val secScaled = timeConn(scaled)
    val secPinned =
      if (pairsPinned > 1500000000L) {
        System.err.println(s"[scale] connlsh planes=$pinned skipped: " +
          s"$pairsPinned candidate pairs is the quadratic stall itself")
        -1.0
      } else timeConn(pinned)
    // recall AT SCALE from a ~200-point deterministic sample: the exact
    // denominator is O(s·n) for the sample where the full one is the
    // quadratic this mode exists to avoid (step=1 equals c21's recall
    // column, spec-pinned — the sample estimates the same quantity)
    val step = math.max(1L, n / 200L)
    // the OR-amplification axis (round 13): on independently-perturbed
    // copies (the `indep` fixture) neighbors are genuinely spread and
    // plane growth trades recall away — growing TABLES at the scaled
    // plane count buys recall back linearly in candidate mass (each
    // table is an independent OR chance), where shrinking planes would
    // buy it back exponentially in mass. Recorded at 2x/4x tables so
    // the recall-per-candidate trade is a measured curve, not a knob
    // description. ONE exact denominator serves all three recalls.
    val recalls = Clustering.lshSampledRecallMulti(spark, work, scaled,
      Seq(tables, 2 * tables, 4 * tables), step).toMap
    val recallScaled = recalls(tables)
    val tableAxis = Seq(2 * tables, 4 * tables).flatMap { tt =>
      Seq(
        s"connlsh_planes${scaled}_t${tt}_pairs" ->
          Clustering.lshCandidatePairCount(spark, work, scaled, tt)
            .toDouble,
        s"connlsh_planes${scaled}_t${tt}_recall" -> recalls(tt))
    }
    Seq(s"connlsh_planes${pinned}_pairs" -> pairsPinned.toDouble,
      s"connlsh_planes${scaled}_pairs" -> pairsScaled.toDouble,
      s"connlsh_planes${pinned}_sec" -> secPinned,
      s"connlsh_planes${scaled}_sec" -> secScaled,
      s"connlsh_planes${scaled}_recall" -> recallScaled,
      "connlsh_auto_planes" -> scaled.toDouble,
      "connlsh_n_points" -> n.toDouble) ++ tableAxis
  }

  /** The PQ/IVFADC recall-and-cost rows per decade (round 11): the s8
    * family's production variants measured the way `ivfauto` measures
    * s7 — hash-sampled corpus queries (easy) AND boundary-displaced
    * hard queries, flat PQ vs the IVFADC residual composition, raw ADC
    * vs reranked. The flat-ADC row is the honest baseline (quantization
    * noise vs the corpus's flat neighbor gaps); the IVFADC + rerank row
    * is what a serving workload inherits.
    */
  private def pqCompare(spark: SparkSession,
      work: String): Seq[(String, Double)] = {
    import graft.functions.Similarity
    val e = Tables.embeddings(spark, work)
    val n = e.count()
    val nlist = Similarity.ivfCellsFor(n)
    val np = Similarity.ivfProbesFor(nlist)
    val step = math.max(1L, n / 200L)
    val q = e.where(Similarity.querySampleFilter(step))
      .select(col("vec_id"), col("features"))
    val (tFlat, flat) = timed(Similarity.pqRecallCurve(spark, work, q,
      Seq((false, 0), (false, 100))).map(_._2))
    // the r11 x100 lesson: rr50 (fine at x10, candidates/query ≈ 2.5k)
    // reads 0.905 easy / 0.578 hard at x100 (candidates/query ≈ 15k) —
    // the shortlist must grow with per-query candidate mass, so the
    // curve measures the rerank AXIS, including the [[Similarity
    // .pqRerankFor]] rule's point, not one pinned depth
    val rrAuto = Similarity.pqRerankFor(n, nlist, np)
    val (tAdc, adc) = timed(Similarity.ivfAdcRecallCurve(spark, work, q,
      Seq((np, 0), (np, 50), (np, rrAuto))).map(_._2))
    val hq = Similarity.hardQueries(spark, work, step)
    val (tHard, hard) = timed(Similarity.ivfAdcRecallCurve(spark, work,
      hq, Seq((np, 50), (np, rrAuto), (np, 2 * rrAuto))).map(_._2))
    Seq("pq_n" -> n.toDouble, "pq_nlist" -> nlist.toDouble,
      "pq_np" -> np.toDouble, "pq_rr_auto" -> rrAuto.toDouble,
      "pq_flat_recall" -> flat(0), "pq_flat_rr100_recall" -> flat(1),
      "pq_ivfadc_recall" -> adc(0), "pq_ivfadc_rr50_recall" -> adc(1),
      "pq_ivfadc_rrauto_recall" -> adc(2),
      "pq_ivfadc_hard_rr50_recall" -> hard(0),
      "pq_ivfadc_hard_rrauto_recall" -> hard(1),
      "pq_ivfadc_hard_rr2auto_recall" -> hard(2),
      "pq_flat_sec" -> tFlat, "pq_ivfadc_sec" -> tAdc,
      "pq_hard_sec" -> tHard)
  }

  /** d9b's pipeline-ORDER mitigation, measured (round 11): the scaled
    * fixture's ε-copies make every window a corpus-global duplicate, so
    * acting on spans over the RAW corpus explodes the cut-index to its
    * W × positions bound (125.6s and a 32 GiB heap at x100). The
    * engine's stated production order runs document dedup FIRST; this
    * mode times span removal over the d6 near-dup group REPRESENTATIVES
    * (exact dedup alone cannot catch the suffix-perturbed copies — the
    * honest leg is the group closure) against the raw-corpus leg, plus
    * the structural quantity the explode rides: the summed
    * duplicated-window position mass before/after. What remains after
    * dedup is within-corpus repeated PASSAGES — d9b's actual job.
    */
  private def d9bOrderCompare(spark: SparkSession,
      work: String): Seq[(String, Double)] = {
    import graft.functions.Dedup
    val docs = Tables.documents(spark, work)
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    def timeIt(in: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      Dedup.spanRemoval(in).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def dupWinMass(in: org.apache.spark.sql.DataFrame): Long =
      Dedup.substringSpanProfile(in)
        .agg(coalesce(sum(col("n_dup_windows")), lit(0L)))
        .head().getLong(0)
    // dedup-first leg: d6's transitive near-dup groups, one
    // representative (the group minimum) per component
    val reps = Dedup.d6DedupGroups(spark, work)
      .where(col("doc_id") === col("group_id"))
      .select(col("doc_id"))
      .join(docs, Seq("doc_id"))
      .localCheckpoint(eager = true) // consumed by profile + removal
    val nReps = reps.count()
    Seq(
      "d9b_n_docs" -> n.toDouble,
      "d9b_n_reps" -> nReps.toDouble,
      "d9b_dupwin_raw" -> dupWinMass(docs).toDouble,
      "d9b_dupwin_reps" -> dupWinMass(reps).toDouble,
      "d9b_sec_raw" -> timeIt(docs),
      "d9b_sec_reps" -> timeIt(reps))
  }

  /** Persisted-index serving at decade scale (round 11): write the
    * IVFADC index tables, serve a hash-sampled query batch FROM DISK,
    * and verify row parity against the in-memory ranking — the PqSpec
    * round-trip contract, exercised at the decades — plus the on-disk
    * compression that makes the 100 TB story concrete (parquet bytes
    * of the codes table vs the raw embedding vectors).
    */
  private def pqDiskCompare(spark: SparkSession,
      work: String): Seq[(String, Double)] = {
    import graft.functions.Similarity
    val e = Tables.embeddings(spark, work)
    val n = e.count()
    val nlist = Similarity.ivfCellsFor(n)
    val np = Similarity.ivfProbesFor(nlist)
    val rr = Similarity.pqRerankFor(n, nlist, np)
    val idx = work + "_ivfadc_idx"
    val (tBuild, _) = timed(Similarity.writeIvfAdcIndex(spark, work, idx))
    val q = e.where(Similarity.querySampleFilter(math.max(1L, n / 200L)))
      .select(col("vec_id"), col("features"))
      .localCheckpoint(eager = true)
    // parity tuples carry the rounded score too — the documented claim
    // is row-identical serving, not rank-identical (ADVICE r11)
    def rows(df: org.apache.spark.sql.DataFrame)
        : Set[(Long, Int, Long, Double)] =
      df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
    val (tDisk, served) = timed(rows(
      Similarity.serveIvfAdcFromIndex(spark, work, idx, q, np, rr)))
    val (tMem, inMem) = timed(rows(
      Similarity.pqIvfAdcRanked(spark, work, q, np, rr)))
    def dirBytes(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(root)) 0L
      else {
        val s = java.nio.file.Files.walk(root)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      }
    }
    // incremental-maintenance staleness curve (VERDICT r12 next-4).
    // Appending UNDRIFTED arrivals measures nothing here — the scaled
    // fixture's copies share the base's density regions, so frozen
    // quantizers stay near-optimal and recall reads 1.000 at every
    // fraction (verified). Staleness is a DRIFT phenomenon, so each
    // fraction's arrivals are displaced one trained-cell radius (the
    // hardQueries amplitude) into regions the base quantizer never
    // saw; the stale index (base-trained quantizers, arrivals appended
    // frozen) is then measured against a FULL REBUILD on the drifted
    // corpus, on queries sampled from the drifted arrivals themselves
    // — the affected region, where the gap actually lives. That gap
    // per fraction is the rebuild-trigger curve an operator needs.
    val step = math.max(1L, n / 200L)
    val rbar = Similarity.meanCellRadius(spark, work, step,
      trained = true)
    val amp = rbar / math.sqrt(Similarity.Dim / 3.0)
    val raw = Tables.table(spark, work, "embeddings")
    val staleRows = Seq(10, 25, 50).flatMap { pct =>
      val arrF = pmod(xxhash64(col("vec_id"), lit("stale")),
        lit(100)) < lit(pct)
      // drifted corpus dir: base unchanged, arrivals displaced
      val dDir = s"${work}_drift$pct"
      val drifted = raw.where(arrF).withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          (x + lit(2.0 * amp) *
            (pmod(xxhash64(col("vec_id"), i, lit("drift")),
              lit(1000000L)) / lit(1000000.0) - lit(0.5)))
            .cast("float")))
      raw.where(!arrF).union(drifted)
        .write.mode("overwrite").parquet(s"$dDir/embeddings.parquet")
      val de = Tables.embeddings(spark, dDir)
      val base = de.where(!arrF)
      // stale: quantizers trained pre-drift (base only), drifted
      // arrivals appended frozen
      val idxS = s"${idx}_stale$pct"
      val nb = base.count()
      val nlistS = Similarity.ivfCellsFor(nb)
      val tS0 = System.nanoTime()
      Similarity.writeIvfAdcIndexOf(spark, base, nlistS, idxS,
        key = idxS)
      Similarity.appendToIvfAdcIndex(spark, idxS,
        de.where(arrF).select(col("vec_id"), col("features")))
      val tStale = (System.nanoTime() - tS0) / 1e9
      // rebuilt: quantizers retrained on the full drifted corpus
      val idxR = s"${idx}_rebuilt$pct"
      val tR0 = System.nanoTime()
      Similarity.writeIvfAdcIndex(spark, dDir, idxR)
      val tRebuild = (System.nanoTime() - tR0) / 1e9
      val qd = de.where(arrF).where(Similarity.querySampleFilter(step))
        .select(col("vec_id"), col("features"))
      // serve each index at ITS OWN derived rule: the stale index has
      // fewer cells (base-sized nlist), so probing it at the rebuilt
      // index's absolute nprobe would scan a LARGER corpus fraction
      // and bias the stale recall upward — the recorded gap must be
      // staleness, not a probe-fraction artifact (review r13)
      val npS = Similarity.ivfProbesFor(nlistS)
      val rrS = Similarity.pqRerankFor(n, nlistS, npS)
      val rec = Similarity.recallCurve(spark, dDir, qd, Seq(
        "stale" -> ((qf: org.apache.spark.sql.DataFrame) =>
          Similarity.serveIvfAdcFromIndex(spark, dDir, idxS, qf,
            npS, rrS)),
        "rebuilt" -> ((qf: org.apache.spark.sql.DataFrame) =>
          Similarity.serveIvfAdcFromIndex(spark, dDir, idxR, qf, np, rr))
      )).toMap
      Seq(
        s"pqdisk_stale${pct}_recall" -> rec("stale"),
        s"pqdisk_rebuilt${pct}_recall" -> rec("rebuilt"),
        s"pqdisk_stale${pct}_basebuild_append_sec" -> tStale,
        s"pqdisk_rebuilt${pct}_build_sec" -> tRebuild)
    }
    Seq(
      "pqdisk_n" -> n.toDouble,
      "pqdisk_queries" -> q.count().toDouble,
      "pqdisk_build_sec" -> tBuild,
      "pqdisk_serve_sec" -> tDisk,
      "pqdisk_mem_sec" -> tMem,
      "pqdisk_parity" -> (if (served == inMem) 1.0 else 0.0),
      "pqdisk_codes_bytes" -> dirBytes(s"$idx/codes").toDouble,
      "pqdisk_raw_vector_bytes" ->
        (n.toDouble * Similarity.Dim * 8),
      "pqdisk_drift_rbar" -> rbar) ++ staleRows
  }

  /** The x1000 LAYERED answer, TIMED (VERDICT r12 next-3 — previously
    * arithmetic only): the three mitigation FAMILIES of a 100 TB
    * ingest, each timed against the FULL x1000 fixture. (1) dedup
    * first: the d6 transitive near-dup closure over all documents,
    * recording the representative count as the collapse evidence;
    * (2) CAPPED near-dup candidates over the embeddings — the
    * materialized candidate count lands next to scale_layout.json's
    * arithmetic prediction (ordered-pair units: clique m(m−1) + star
    * 2(c−m); the emitted unordered rows count half), then the d7
    * verified groups end-to-end; (3) ONE ANN serving leg from the
    * persisted IVFADC index, build timed separately
    * (build-once/serve-many). Each stage runs over the full corpus —
    * these are independent family costs at x1000, summed as an upper
    * bound; the dedup-first ORDERING claim itself (downstream stages
    * run on survivors only) is what p10/p11's oracle-checked
    * compositions and decade rows carry, and d9border measures its
    * win directly. Only documents + embeddings materialize — the star
    * schema isn't part of this claim and a x1000 lineitem would be
    * 600M rows of noise.
    */
  /** d11 at depth: the SAME fixed 500-document arriving batch (the
    * sf0.1 delta ids, present verbatim in every scaled copy-0) served
    * against corpus stores one and two decades apart. The build row
    * carries the corpus-sized cost (sign + band + rank + closure — the
    * once-per-corpus work); the serve row's only corpus-dependent term
    * is the single streaming scan of the band store, so it should move
    * by far less than the 10× corpus growth between rows — THAT gap is
    * the incremental claim, measured. A full-delta serve row (the 10%
    * batch, growing with the corpus) rides along for reference.
    */
  private def d11DeepRows(spark: SparkSession,
      work: String): Seq[(String, Double)] = {
    import graft.functions.{Dedup, Similarity}
    val nDocs = Tables.documents(spark, work).count()
    val path = s"${Similarity.artifactRoot(work)}/dedup_index"
    Dedup.invalidateDedupIndex(work)
    val (tBuild, _) = timed(Dedup.writeDedupIndex(spark, work, path))
    val delta = Tables.documents(spark, work)
      .where(pmod(col("doc_id"), lit(Dedup.DeltaMod))
        === Dedup.DeltaResidue)
      .select(col("doc_id"), col("text"))
    val fixed = delta.where(col("doc_id") < 5000)
    // untimed warmup of the serving plan (JIT + store page cache), then
    // the timed fixed-batch serve — the cross-decade comparison row
    Dedup.assignAgainstIndex(spark, work, path, fixed)
      .write.format("noop").mode("overwrite").save()
    val (tFixed, _) = timed {
      Dedup.assignAgainstIndex(spark, work, path, fixed)
        .write.format("noop").mode("overwrite").save()
    }
    // timed: ONE materialization (noop write), same as every decade
    // row; the matched count re-executes the plan and is NOT timed
    val (tFull, _) = timed {
      Dedup.assignAgainstIndex(spark, work, path, delta)
        .write.format("noop").mode("overwrite").save()
    }
    val nFull = Dedup.assignAgainstIndex(spark, work, path, delta)
      .where(col("n_matches") > 0).count()
    Seq(
      "d11_n_docs" -> nDocs.toDouble,
      "d11_index_build_sec" -> tBuild,
      "d11_serve_batch500_sec" -> tFixed,
      "d11_serve_fulldelta_sec" -> tFull,
      "d11_fulldelta_matched" -> nFull.toDouble)
  }

  /** The d11 backfill boundary, measured (the q3 bucketing pattern
    * applied to the dedup store): at 10%-of-corpus deltas the broadcast
    * of the delta band table stops being the right plan, so save the
    * band store BUCKETED on its join key and let the DELTA side shuffle
    * into the store's layout instead — the corpus still never shuffles
    * in either form. Both serving plans are priced on the SAME full
    * delta, their outputs asserted identical, and the one-time
    * bucketing cost reported beside them.
    */
  private def d11BucketCompare(spark: SparkSession,
      work: String): Seq[(String, Double)] = {
    import graft.functions.{Dedup, Similarity}
    val path = s"${Similarity.artifactRoot(work)}/dedup_index"
    Dedup.invalidateDedupIndex(work)
    val (tBuild, _) = timed(Dedup.writeDedupIndex(spark, work, path))
    val delta = Tables.documents(spark, work)
      .where(pmod(col("doc_id"), lit(Dedup.DeltaMod))
        === Dedup.DeltaResidue)
      .select(col("doc_id"), col("text"))
    def checksum(out: DataFrame): (Long, Long, Long) = {
      val r = out.agg(count(lit(1)), sum(col("group_id")),
        sum(col("n_matches"))).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val groups = spark.read.parquet(s"$path/groups")
    def broadcastForm() = checksum(Dedup.assignFrom(spark, work,
      spark.read.parquet(s"$path/bands"), groups, delta,
      broadcastDelta = true))
    val db = "graft_d11_bucket"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db " +
      s"LOCATION '$work/d11_bucket_warehouse'")
    spark.sql(s"USE $db")
    spark.sql("DROP TABLE IF EXISTS d11_bands_b")
    val (tBucket, _) = timed {
      spark.read.parquet(s"$path/bands").write
        .bucketBy(32, "band", "key").sortBy("band", "key")
        .saveAsTable("d11_bands_b")
    }
    def bucketedForm() = checksum(Dedup.assignFrom(spark, work,
      spark.table("d11_bands_b"), groups, delta,
      broadcastDelta = false))
    // one untimed pass each (JIT + page cache), then the timed pair
    broadcastForm(); bucketedForm()
    val (tB, csB) = timed(broadcastForm())
    val (tS, csS) = timed(bucketedForm())
    require(csB == csS,
      s"bucketed d11 diverged from the broadcast plan: $csB vs $csS")
    Seq("d11_serve_broadcast" -> tB, "d11_serve_bucketed" -> tS,
      "d11_store_bucket_build" -> tBucket, "d11_index_build" -> tBuild)
  }

  /** The d11bucket comparison for the GRAPH store: the same delta
    * batch served against (a) the plain parquet points table (the
    * store side shuffles on (tbl, bucket) because the feature-carrying
    * batch is past the broadcast threshold) and (b) a
    * bucket-partitioned saveAsTable of the pre-exploded rows (the
    * store side reads exchange-free; only the batch side moves).
    * Checksum-guarded: both layouts must produce identical
    * assignments.
    */
  private def s14BucketCompare(spark: SparkSession,
      work: String): Seq[(String, Double)] = {
    import graft.operators.Clustering
    import graft.functions.Similarity
    val path = s"${Similarity.artifactRoot(work)}/s14_graph_full"
    Clustering.invalidateKnnGraphIndex(work)
    val (tBuild, _) =
      timed(Clustering.writeKnnGraphIndex(spark, work, path))
    val delta = Tables.labeledPoints(spark, work)
      .where(pmod(col("id"), lit(Clustering.S14Mod)) ===
        lit(Clustering.S14Res))
      .select(col("id"), col("features"))
    def checksum(out: DataFrame): (Long, Long, Long) = {
      val r = out.agg(count(lit(1)), sum(col("component")),
        sum(coalesce(col("neighbor"), lit(0L)))).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // since r15 the build itself exports the bucketed serving layout
    // and assignFromGraphIndex rides it by default; the comparison pins
    // the plain-parquet fallback against the promoted default
    def plainForm() = checksum(Clustering.assignFromGraphIndex(
      delta, path, useBucketed = false))
    def bucketedForm() = checksum(Clustering.assignFromGraphIndex(
      delta, path))
    // one untimed pass each (JIT + page cache), then THREE timed passes
    // per layout (the BASELINE.md drift protocol's same-session warm
    // pair, VERDICT r15 next-4): the median decides, the spread shows
    // whether a small-batch constant is real or VM noise
    plainForm(); bucketedForm()
    val ps = (1 to 3).map(_ => timed(plainForm()))
    val bs = (1 to 3).map(_ => timed(bucketedForm()))
    require(ps.map(_._2).distinct.size == 1 &&
        ps.head._2 == bs.head._2 && bs.map(_._2).distinct.size == 1,
      s"bucketed s14 diverged from the plain store: " +
        s"${ps.map(_._2)} vs ${bs.map(_._2)}")
    ps.zipWithIndex.map { case ((t, _), i) => s"s14_serve_plain_p${i + 1}" -> t } ++
      bs.zipWithIndex.map { case ((t, _), i) => s"s14_serve_bucketed_p${i + 1}" -> t } ++
      Seq("s14_serve_plain" -> ps.map(_._1).sorted.apply(1),
        "s14_serve_bucketed" -> bs.map(_._1).sorted.apply(1),
        "s14_index_build" -> tBuild)
  }

  /** Components-vs-mutualRank table (VERDICT r14 next-6): is the
    * `S13MutualRank = 2` pin — chosen from fixture percolation — still
    * the right hub/percolation knob once near-dup chains lengthen at
    * the decades? The auto-layout ranked graph (the CAPPED production
    * chain since r16, orphan fan-out included) is built ONCE and
    * persisted so the five closures share one candidate chain; per
    * rank 1..5 the record carries component count, max component size,
    * singleton share, the closure time, and a PARTITION CHECKSUM —
    * Σ pmod(xxhash64(id, component), 10⁶), exactly representable in the
    * record's doubles — so "identical at ranks r and r′" is backed by
    * label-level evidence, not just matching summary stats (ADVICE
    * r15).
    */
  private def s13RankCompare(spark: SparkSession,
      work: String): Seq[(String, Double)] = {
    import graft.operators.Clustering
    val graphPath = s"$work/s13rank_graph"
    val orphPath = s"$work/s13rank_orphans"
    val (tGraph, _) = timed {
      val n = Tables.labeledPoints(spark, work).count()
      val (graph, orphans) = Clustering.cappedGraphAt(spark, work,
        Clustering.lshPlanesFor(n), Clustering.LshTables,
        Clustering.GraphBuildCap)
      graph.select(col("xi"), col("rnk").as("rank"), col("yi"))
        .write.mode("overwrite").parquet(graphPath)
      orphans.write.mode("overwrite").parquet(orphPath)
    }
    val ids = Tables.labeledPoints(spark, work)
    val n = ids.count().toDouble
    val graph = spark.read.parquet(graphPath)
    val orphans = spark.read.parquet(orphPath)
    val rows = (1 to 5).flatMap { rank =>
      val (t, stats) = timed {
        val comp = Clustering.mutualComponents(ids, graph, rank,
          orphans = Some(orphans)).localCheckpoint(eager = true)
        val r = comp
          .groupBy(col("component"))
          .agg(count(lit(1)).as("sz"))
          .agg(count(lit(1)), max(col("sz")),
            sum(when(col("sz") === 1, 1L).otherwise(0L)))
          .collect()(0)
        val ck = comp.agg(sum(pmod(
            xxhash64(col("id"), col("component")), lit(1000000L))))
          .collect()(0).getLong(0)
        (r.getLong(0), r.getLong(1), r.getLong(2), ck)
      }
      Seq(s"s13rank${rank}_components" -> stats._1.toDouble,
        s"s13rank${rank}_max_size" -> stats._2.toDouble,
        s"s13rank${rank}_singleton_share" -> stats._3 / n,
        s"s13rank${rank}_partition_checksum" -> stats._4.toDouble,
        s"s13rank${rank}_closure_sec" -> t)
    }
    Seq("s13rank_graph_build" -> tGraph) ++ rows
  }

  /** Sampled neighbor recall of the CAPPED production graph vs both the
    * exact top-L and the uncapped chain (VERDICT r15 next-1's "measured
    * recall" requirement): every ~step-th id (hash-sampled, ~500
    * queries) gets its exact top-L from the broadcast O(s·n) ranking —
    * the denominator that stays linear at decades where the full
    * exact pass is the quadratic stall — and the capped/uncapped
    * LSH-fed top-L at the auto layout, query side pruned BEFORE the
    * bucket join. Records recall-vs-exact for both chains plus the
    * capped chain's edge overlap with the uncapped one (what the cap
    * actually discards), with per-leg wall clock.
    */
  private def graphRecallCompare(spark: SparkSession,
      work: String): Seq[(String, Double)] = {
    import graft.operators.Clustering
    val n = Tables.labeledPoints(spark, work).count()
    // env overrides so the recall of a STEERED layout (r20: the x1000
    // store certifies at 28 planes / cap 256 / hash prefix) is
    // measurable against the same exact denominator as the auto one
    val numPlanes = sys.env.get("SPARK_GRAFT_RECALL_PLANES")
      .map(_.trim.toInt).getOrElse(Clustering.lshPlanesFor(n))
    val capN = sys.env.get("SPARK_GRAFT_RECALL_CAP")
      .map(_.trim.toInt).getOrElse(Clustering.GraphBuildCap)
    val hashOrder = sys.env.get("SPARK_GRAFT_RECALL_HASH").contains("1")
    val step = math.max(1L, n / 500L)
    val xiF = Some(Clustering.sampledId(col("xi"), step))
    val (tEx, (exact, nExact)) =
      timed(Clustering.sampledExactNeighbors(spark, work, step))
    def leg(df: org.apache.spark.sql.DataFrame) =
      timed(df.select(col("xi"), col("yi")).localCheckpoint(eager = true))
    val (tU, unc) = leg(Clustering.lshRankedNeighbors(spark, work,
      numPlanes, Clustering.LshTables, xiFilter = xiF))
    val (tC, cap) = leg(Clustering.cappedGraphAt(spark, work,
      numPlanes, Clustering.LshTables, capN,
      xiFilter = xiF, hashOrder = hashOrder)._1)
    val nU = unc.count().toDouble
    def hits(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Double =
      a.join(b, Seq("xi", "yi"), "left_semi").count().toDouble
    Seq(
      "graphrecall_n_points" -> n.toDouble,
      "graphrecall_planes" -> numPlanes.toDouble,
      "graphrecall_cap" -> capN.toDouble,
      "graphrecall_hash_order" -> (if (hashOrder) 1.0 else 0.0),
      // distinct xi, not nExact/L: a tiny corpus or tie filtering can
      // hand a sampled query fewer than L exact neighbors (ADVICE r16)
      "graphrecall_n_queries" ->
        exact.select(col("xi")).distinct().count().toDouble,
      "graphrecall_exact_sec" -> tEx,
      "graphrecall_uncapped_sec" -> tU,
      "graphrecall_capped_sec" -> tC,
      "graphrecall_uncapped_vs_exact" -> hits(unc, exact) / nExact,
      "graphrecall_capped_vs_exact" -> hits(cap, exact) / nExact,
      "graphrecall_capped_vs_uncapped" -> hits(cap, unc) / nU)
  }

  /** Adversarial mega-bucket probe for the capped generator (VERDICT
    * r15 next-6): a synthetic corpus whose every point lands in ONE
    * bucket per table, at 10⁵ and 10⁶ members — far past any
    * data-derived bucket mass — timing the whole capped chain. The two
    * suspects are the per-bucket row_number sort (a single task sorts
    * the whole corpus once per table) and the result-sized pair dedup
    * (n·tables·cap rows before DISTINCT); if the single-task sort is
    * the wall, the cap selection moves to the TopKByKey aggregate
    * (min-cap-by-id is exactly its shape). Emits rows/sec so the two
    * sizes expose the scaling exponent directly.
    */
  private def megaBucketProbe(spark: SparkSession): Seq[(String, Double)] = {
    import graft.operators.Clustering
    Seq(100000, 1000000).flatMap { n =>
      // collinear ε-clones: every dot product positive ⇒ one bucket per
      // table; distances distinct so the ranking is total
      val pc = spark.range(n.toLong).select(col("id"),
        array((0 until 4).map(d =>
          lit(1.0) + col("id") * lit(1e-12) * lit(d + 1)): _*)
          .as("features"),
        lit(0).as("cluster"))
      val planes = (0 until
        Clustering.LshPlanes * Clustering.LshTables)
        .map(i => Array.fill(4)(1.0 + i * 1e-9)).toSeq
      val (t, cnt) = timed {
        Clustering.lshRankedNeighborsCapped(pc, planes,
          Clustering.LshPlanes, Clustering.LshTables,
          Clustering.GraphBuildCap).count()
      }
      Seq(s"megabucket_${n}_sec" -> t,
        s"megabucket_${n}_graph_rows" -> cnt.toDouble)
    }
  }

  /** Graph-store staleness curve (VERDICT r14 next-3 — the d11/s9
    * protocol, applied to neighborhood state): build the index on a
    * base split, append the held-out fraction in four sequential
    * batches against the FROZEN planes, then compare the resulting
    * store-wide component partition against a fresh full-corpus
    * rebuild. Drift is the Rand and adjusted-Rand index between the
    * two partitions, computed from contingency COUNTS (three grouped
    * aggregates — never a pair enumeration), plus each store's
    * component count: appended points inherit through bucket
    * collisions but never refine the base neighborhoods or the
    * layout, so agreement decays as the appended fraction grows — the
    * rebuild cadence is the point on this curve a deployment
    * tolerates, exactly as measured for d11/s9.
    */
  /** Capped-vs-uncapped SERVE parity and cost at a decade (VERDICT r16
    * next-1 verification leg + next-8 recall geometry): build the full
    * auto-layout store once, then serve the 1/8 delta batch through
    * (a) the default face — the physically capped bucketed store — and
    * (b) the uncapped plain explode (exactly the join that died on
    * disk spill at x1000). Three timed passes each after a warm pass
    * (the warm-pair protocol); ONE untimed joined pass measures the
    * assignment delta: the fraction of batch vectors whose component /
    * neighbor changes under the prefix. A capped bucket always keeps a
    * non-empty prefix, so the singleton sets must be IDENTICAL — the
    * mode asserts that invariant rather than measuring it.
    */
  private def s14CapCompare(spark: SparkSession,
      work: String): Seq[(String, Double)] = {
    import graft.operators.Clustering
    import graft.functions.Similarity
    val path = s"${Similarity.artifactRoot(work)}/s14_graph_hold"
    Clustering.invalidateKnnGraphIndex(work)
    // ADVICE r17: build on the =!= S14Res HOLDOUT (the s14GraphAssign
    // shape) — a full-corpus store lets every probe self-match at
    // distance 0, so the parity delta would partly measure
    // self-matches instead of novel-point serving
    val pts = Tables.labeledPoints(spark, work)
      .select(col("id"), col("features"))
    val base = pts.where(pmod(col("id"), lit(Clustering.S14Mod)) =!=
      lit(Clustering.S14Res))
    val (tBuild, _) = timed(Clustering.writeKnnGraphIndexOf(spark, base,
      Clustering.lshPlanesFor(base.count()), path,
      s"$work->$path->cap_holdout"))
    val delta = pts
      .where(pmod(col("id"), lit(Clustering.S14Mod)) ===
        lit(Clustering.S14Res))
    def run(capped: Boolean): Long =
      Clustering.assignFromGraphIndex(delta, path,
        useBucketed = capped, capped = capped).count()
    // one joined pass: capped-vs-uncapped assignment deltas on `batch`
    // — factored so the r2dist-ordered export and the stitched
    // deployment re-measure the identical quantity
    def diffs(batch: DataFrame): (Long, Long, Long, Long) = {
      val c = Clustering.assignFromGraphIndex(batch, path)
        .select(col("id"), col("neighbor").as("cn"),
          col("component").as("cc"))
      val u = Clustering.assignFromGraphIndex(batch, path,
          useBucketed = false, capped = false)
        .select(col("id"), col("neighbor").as("un"),
          col("component").as("uc"))
      val r = c.join(u, "id").agg(
        count(lit(1)).as("n"),
        sum(when(col("cc") =!= col("uc"), 1L).otherwise(0L)).as("cdiff"),
        sum(when(!(col("cn") <=> col("un")), 1L).otherwise(0L)).as("ndiff"),
        sum(when(col("cn").isNull =!= col("un").isNull, 1L).otherwise(0L))
          .as("singdiff")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    run(capped = true); run(capped = false) // warm: JIT + page cache
    val cs = (1 to 3).map(_ => timed(run(capped = true)))
    val us = (1 to 3).map(_ => timed(run(capped = false)))
    val (n0, cd0, nd0, sd0) = diffs(delta)
    require(sd0 == 0L,
      s"capped serve changed the singleton set ($sd0 rows) — " +
        "a non-empty bucket must keep a non-empty prefix")
    // phase 2 (VERDICT r18 next-2, the re-opened r16-#8 swap): rebuild
    // the serving export with the (r2dist, nid) prefix — keep the rows
    // whose own rank-2 distance is smallest, i.e. the dense-mass
    // members — and re-measure the SAME parity against the SAME
    // uncapped baseline (order-independent by construction)
    val storeOrder = spark.read.parquet(s"$path/store_meta")
      .collect()(0).getString(3)
    Clustering.exportBucketedStore(spark, path, Clustering.GraphBuildCap,
      order = "r2dist")
    run(capped = true) // warm the re-exported table
    val cs2 = (1 to 3).map(_ => timed(run(capped = true)))
    val (n2, cd2, nd2, sd2) = diffs(delta)
    require(sd2 == 0L, s"r2dist-ordered serve changed the singleton set")
    // phase 3 (VERDICT r18 next-7): the parity a STITCHED deployment
    // sees. Restore the build's hash-order export, append HALF the
    // delta with
    // stitch on (the map repairs the chain breaks the holdout build
    // severed), then measure capped-vs-uncapped on the OTHER half —
    // novel points, both faces canonicalized through the map — to test
    // the r18 claim that the component-level delta largely collapses
    // into the merges the map repairs.
    Clustering.exportBucketedStore(spark, path, Clustering.GraphBuildCap,
      order = storeOrder)
    val half = pmod(xxhash64(col("id"), lit("s14caphalf")), lit(2L))
    val halfA = delta.where(half === 0L)
    val halfB = delta.where(half === 1L)
    (0 until 2).foreach { b =>
      Clustering.appendToGraphIndex(
        halfA.where(pmod(xxhash64(col("id"), lit("s14batch")), lit(2L))
          === lit(b.toLong)), path, stitch = true)
    }
    val mapRows = Clustering.readComponentMap(spark, path).count()
    val (n3, cd3, nd3, _) = diffs(halfB)
    // a tiny delta can leave a half/batch empty — 0/0 would land NaN
    // in the JSON record and break downstream parsing (ADVICE r19)
    def frac(c: Long, n: Long): Double =
      if (n == 0L) 0.0 else c.toDouble / n
    Seq(
      "s14cap_index_build" -> tBuild,
      "s14cap_serve_capped" -> cs.map(_._1).sorted.apply(1),
      "s14cap_serve_uncapped" -> us.map(_._1).sorted.apply(1),
      "s14cap_n_batch" -> n0.toDouble,
      "s14cap_component_diff_frac" -> frac(cd0, n0),
      "s14cap_neighbor_diff_frac" -> frac(nd0, n0),
      "s14cap_serve_capped_r2" -> cs2.map(_._1).sorted.apply(1),
      "s14cap_component_diff_frac_r2" -> frac(cd2, n2),
      "s14cap_neighbor_diff_frac_r2" -> frac(nd2, n2),
      "s14cap_stitch_map_rows" -> mapRows.toDouble,
      "s14cap_n_batch_stitched" -> n3.toDouble,
      "s14cap_component_diff_frac_stitched" -> frac(cd3, n3),
      "s14cap_neighbor_diff_frac_stitched" -> frac(nd3, n3))
  }

  /** `stitch = false` is the frozen-base staleness protocol (the r15–17
    * records); `stitch = true` re-runs the IDENTICAL protocol with the
    * append-time stitch on (VERDICT r17 next-1's verification leg) —
    * same fresh baseline, same fractions, same batch split — plus the
    * per-fraction stitch-map size, so the two records differ only in
    * the repair under measurement. The stale partition reads
    * [[Clustering.storeComponents]] (raw labels ∘ stitch map; the
    * identity when no map exists, so the frozen numbers are unchanged).
    */
  /** (rand, ari) agreement of two labelings joined as (`a`, `b`)
    * columns — contingency COUNTS only (three grouped aggregates),
    * never a pair enumeration.
    */
  private def randAri(joint: DataFrame, a: String,
      b: String): (Double, Double) = {
    def c2(cnt: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (cnt * (cnt - 1) / 2).cast("double")
    def sumPairs(keys: String*): Double =
      joint.groupBy(keys.map(col): _*).agg(count(lit(1)).as("m"))
        .agg(coalesce(sum(c2(col("m"))), lit(0.0)))
        .collect()(0).getDouble(0)
    val nTot = joint.count().toDouble
    val sumAb = sumPairs(a, b)
    val sumA = sumPairs(a)
    val sumB = sumPairs(b)
    val totPairs = nTot * (nTot - 1) / 2
    val rand = (totPairs + 2 * sumAb - sumA - sumB) / totPairs
    val expAb = sumA * sumB / totPairs
    val ari = if ((sumA + sumB) / 2 == expAb) 1.0
      else (sumAb - expAb) / ((sumA + sumB) / 2 - expAb)
    (rand, ari)
  }

  /** d11 lexical-store staleness (VERDICT r18 next-6 — the s14stale
    * protocol shape on the signature store). The store is build-once /
    * serve-forever and serving never mutates it, so the lexical
    * analogue of the graph family's chain breaks is arrival↔arrival
    * duplication the frozen base cannot link: two arriving near-dups
    * of each other with no base-side member each label themselves, and
    * a duplication chain threaded through arrivals fragments at every
    * missing link. Per fraction: build the store on the (100−pct)%
    * hash-holdout base, serve the arriving pct in ONE pass (batches
    * compose exactly over an immutable store — the spec-pinned
    * store-stability law — so sequential batching cannot change the
    * answer, unlike the graph store's state-mutating appends), then
    * compare [base groups ∪ arrival labels] against the full-corpus
    * closure a fresh rebuild would store.
    */
  private def d11StaleCompare(spark: SparkSession,
      work: String): Seq[(String, Double)] = {
    import graft.functions.{Dedup, Similarity}
    val docs = Tables.documents(spark, work)
      .select(col("doc_id"), col("text"))
    val freshPath = s"${Similarity.artifactRoot(work)}/d11_stale_fresh"
    val (tFresh, _) = timed {
      Dedup.dedupGroupsOf(docs).write.mode("overwrite").parquet(freshPath)
    }
    val fresh = spark.read.parquet(freshPath)
      .select(col("doc_id"), col("group_id").as("fresh_g"))
    val nFreshComp = fresh.select(col("fresh_g")).distinct().count()
    val pcts = sys.env.get("SPARK_GRAFT_STALE_PCTS")
      .map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(12, 25, 50))
    val rows = pcts.flatMap { pct =>
      val arrF = pmod(xxhash64(col("doc_id"), lit("d11stale")),
        lit(100L)) < lit(pct.toLong)
      val path = s"${Similarity.artifactRoot(work)}/d11_stale$pct"
      val (tBuild, _) = timed(
        Dedup.writeDedupIndexOf(spark, docs.where(!arrF), path))
      val arrivals = docs.where(arrF)
      // the BACKFILL serve plan (broadcastDelta = false): a 12–50%
      // arrival fraction is corpus-scaled, and the daily-batch plan's
      // forced delta broadcasts die at spark.driver.maxResultSize
      // collecting it (measured at x1000) — exactly the backfill
      // boundary `scale_d11bucket.json` §r14 priced
      val served = Dedup.assignFrom(spark, work,
          spark.read.parquet(s"$path/bands"),
          spark.read.parquet(s"$path/groups"), arrivals,
          broadcastDelta = false)
        .select(col("doc_id"), col("group_id")).persist()
      val (tServe, _) = timed(served.count())
      val stale = spark.read.parquet(s"$path/groups")
        .select(col("doc_id"), col("group_id"))
        .unionByName(served)
        .select(col("doc_id"), col("group_id").as("stale_g"))
      val joint = stale.join(fresh, "doc_id").persist()
      val (rand, ari) = randAri(joint, "stale_g", "fresh_g")
      val nStaleComp = joint.select(col("stale_g")).distinct().count()
      joint.unpersist(); served.unpersist()
      // the backfill-vs-rebuild comparison, printed per run (VERDICT
      // r19 next-4): serving this fraction through the frozen store
      // vs the fresh full-corpus rebuild measured above. > 1 means
      // the store operator is past the cadence crossover (the
      // assignFrom scaladoc rule: ≈ 15% of corpus mass) and should
      // rebuild instead of serving the backlog.
      val serveOverRebuild = if (tFresh > 0.0) tServe / tFresh else 0.0
      if (serveOverRebuild > 1.0)
        System.err.println(f"[graft] d11stale$pct: serving the " +
          f"backlog cost $tServe%.1f s vs $tFresh%.1f s for a fresh " +
          "rebuild — past the backfill-vs-rebuild crossover, " +
          "REBUILD NOW")
      Seq(s"d11stale${pct}_rand" -> rand,
        s"d11stale${pct}_ari" -> ari,
        s"d11stale${pct}_components" -> nStaleComp.toDouble,
        s"d11stale${pct}_base_build_sec" -> tBuild,
        s"d11stale${pct}_serve_sec" -> tServe,
        s"d11stale${pct}_serve_over_rebuild" -> serveOverRebuild)
    }
    Seq("d11stale_fresh_build_sec" -> tFresh,
      "d11stale_fresh_components" -> nFreshComp.toDouble) ++ rows
  }

  /** [[graft.operators.Clustering.StitchFidelityMax]] calibration
    * sweep (VERDICT r19 next-5): the refusal bound today rests on two
    * endpoints — faithful stores certify ≈ 1.0 and stitch soundly, the
    * x1000 catastrophe certifies ~255 and percolates (ARI 0.005). This
    * mode fills the curve between them with CONTROLLED starvation:
    * build the 12%-holdout base store at a decade that certifies
    * faithful (x100 measures 1.0), then per inflation factor copy the
    * store, multiply the stored r2dist of a hash-chosen HALF of the
    * tier-0 rows by the factor (exactly the starved shape — thresholds
    * wider than their true neighborhoods, read by BOTH gate legs:
    * the c-side threshold and the rank-1 witness), re-derive the
    * serving face from the rewritten points, DELETE the certificate
    * (the sweep measures what stitching WOULD do at that inflation —
    * the production gate refuses ≥ 2), append the arrivals in four
    * stitched waves, and measure ARI vs the fresh full-corpus rebuild.
    * Factor 1 is the control: byte-identical protocol, no inflation —
    * it must reproduce the validated stitched band.
    */
  private def fidelSweepCompare(spark: SparkSession,
      work: String): Seq[(String, Double)] = {
    import graft.operators.Clustering
    import graft.functions.Similarity
    val pts = Tables.labeledPoints(spark, work)
      .select(col("id"), col("features"))
    val n = pts.count()
    Clustering.invalidateKnnGraphIndex(work)
    val freshPath = s"${Similarity.artifactRoot(work)}/s14_stale_fresh"
    val reuseFresh = sys.env.get("SPARK_GRAFT_STALE_REUSE").contains("1") &&
      new java.io.File(s"$freshPath/store_meta").exists()
    val (tFresh, _) =
      if (reuseFresh) (0.0, ())
      else timed(Clustering.writeKnnGraphIndexOf(spark, pts,
        Clustering.lshPlanesFor(n), freshPath, s"$work->stale_fresh"))
    val fresh = spark.read.parquet(s"$freshPath/points")
      .select(col("id"), col("component").as("fresh_c"))
    val pct = 12
    val arrF = pmod(xxhash64(col("id"), lit("s14stale")), lit(100L)) <
      lit(pct.toLong)
    val base = pts.where(!arrF)
    val basePath = s"${Similarity.artifactRoot(work)}/s14_fidel_base"
    val (tBase, _) = timed(Clustering.writeKnnGraphIndexOf(spark, base,
      Clustering.lshPlanesFor(base.count()), basePath,
      s"$work->fidel_base"))
    val baseCert = spark.read
      .parquet(s"$basePath/stitch_fidelity").collect()(0)
    val arrivals = pts.where(arrF)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(basePath).getFileSystem(conf)
    val factors = sys.env.get("SPARK_GRAFT_SWEEP_FACTORS")
      .map(_.split(",").toSeq.map(_.trim.toDouble))
      .getOrElse(Seq(1.0, 2.0, 8.0, 32.0))
    val rows = factors.flatMap { f =>
      val tag = f.toInt
      val path = s"${Similarity.artifactRoot(work)}/s14_fidel_x$tag"
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(basePath), fs,
        new org.apache.hadoop.fs.Path(path), false, conf)
      if (f != 1.0) {
        // ×f on a hash-half of the tier-0 thresholds (+∞ and NULL pass
        // through arithmetic unchanged); points/ is the source of
        // truth, so the serving face is re-derived from it afterwards
        val inflated = spark.read.parquet(s"$path/points")
          .withColumn("r2dist",
            when(pmod(xxhash64(col("id"), lit("fidelsweep")), lit(2L))
                === lit(0L) && col("tier") === lit(0),
              col("r2dist") * lit(f))
            .otherwise(col("r2dist")))
        inflated.write.mode("overwrite")
          .parquet(s"$path/points_inflated")
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/points"), true)
        fs.rename(
          new org.apache.hadoop.fs.Path(s"$path/points_inflated"),
          new org.apache.hadoop.fs.Path(s"$path/points"))
        // cap AND order from store_meta (ADVICE r20): letting cap
        // default to GraphBuildCap would silently re-export a
        // cap-steered base store at the wrong cap and overwrite its
        // store_meta with it
        val meta = spark.read.parquet(s"$path/store_meta").collect()(0)
        Clustering.exportBucketedStore(spark, path,
          cap = meta.getInt(0), order = meta.getString(3))
      }
      // the sweep bypasses the production gate on purpose: it measures
      // what the stitch WOULD do at this inflation
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/stitch_fidelity"),
        true)
      val (tApp, _) = timed {
        (0 until 4).foreach { b =>
          Clustering.appendToGraphIndex(
            arrivals.where(pmod(xxhash64(col("id"), lit("s14batch")),
              lit(4L)) === lit(b.toLong)), path, stitch = true)
        }
      }
      val mapRows = Clustering.readComponentMap(spark, path).count()
      val joint = Clustering.storeComponents(spark, path)
        .select(col("id"), col("component").as("stale_c"))
        .join(fresh, "id").persist()
      val (rand, ari) = randAri(joint, "stale_c", "fresh_c")
      val nComp = joint.select(col("stale_c")).distinct().count()
      joint.unpersist()
      Seq(s"fidelsweep_x${tag}_ari" -> ari,
        s"fidelsweep_x${tag}_rand" -> rand,
        s"fidelsweep_x${tag}_components" -> nComp.toDouble,
        s"fidelsweep_x${tag}_map_rows" -> mapRows.toDouble,
        s"fidelsweep_x${tag}_append_sec" -> tApp)
    }
    Seq("fidelsweep_fresh_build_sec" -> tFresh,
      "fidelsweep_base_build_sec" -> tBase,
      "fidelsweep_base_cert_p50" -> baseCert.getDouble(0),
      "fidelsweep_base_cert_p90" -> baseCert.getDouble(1)) ++ rows
  }

  /** Probe-only (planes, cap) fidelity landscape of the scaled corpus
    * — no store builds. SPARK_GRAFT_PROBE_PLANES / _CAPS override the
    * default grid (auto..auto+16 step 4 x cap {64, 128, 256}).
    */
  private def fidelProbeCompare(spark: SparkSession,
      work: String): Seq[(String, Double)] = {
    import graft.operators.Clustering
    val pts = Tables.labeledPoints(spark, work)
      .select(col("id"), col("features"))
    val auto = Clustering.lshPlanesFor(pts.count())
    val planes = sys.env.get("SPARK_GRAFT_PROBE_PLANES")
      .map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(0, 4, 8, 12, 16).map(auto + _))
    val caps = sys.env.get("SPARK_GRAFT_PROBE_CAPS")
      .map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(Clustering.GraphBuildCap, 128, 256))
    val grid = for (c <- caps; p <- planes) yield (p, c)
    val pairRows =
      if (!sys.env.get("SPARK_GRAFT_PROBE_PAIRS").contains("1")) Seq.empty
      else Clustering.cappedPairMassSweep(spark, pts, grid).map {
        case (p, c, m) => s"fidelprobe_c${c}_p${p}_pairs" -> m.toDouble
      }
    Clustering.fidelityProbeSweep(spark, pts, grid).flatMap {
      case (p, c, cert) => Seq(
        s"fidelprobe_c${c}_p${p}_p50" -> cert.p50,
        s"fidelprobe_c${c}_p${p}_p90" -> cert.p90,
        s"fidelprobe_c${c}_p${p}_frac" -> cert.fracAbove)
    } ++ pairRows :+ ("fidelprobe_auto_planes" -> auto.toDouble)
  }

  private def s14StaleCompare(spark: SparkSession,
      work: String, stitch: Boolean = false): Seq[(String, Double)] = {
    import graft.operators.Clustering
    import graft.functions.Similarity
    val pts = Tables.labeledPoints(spark, work)
      .select(col("id"), col("features"))
    val n = pts.count()
    def c2(cnt: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (cnt * (cnt - 1) / 2).cast("double")
    def sumPairs(df: DataFrame, keys: Seq[String]): Double =
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("m"))
        .agg(coalesce(sum(c2(col("m"))), lit(0.0))).collect()(0).getDouble(0)
    // SPARK_GRAFT_STALE_PHASE (VERDICT r18 next-4): run ONE protocol
    // phase in THIS JVM against on-disk state — `fresh` (full-corpus
    // baseline build), `base` (holdout store build), `append` (the
    // arrival waves; SPARK_GRAFT_STALE_BATCHES subsets them for
    // one-JVM-per-wave, the production ingest shape), `ari` (the
    // contingency aggregates over the two persisted stores), or `all`
    // (default — the single-JVM protocol, fine through x100). The
    // x1000 protocol exceeds ANY single JVM by measured lifetime walls
    // (block-manager, driver heap, disk — SCALE.md §r18); per-phase
    // JVMs are both the mitigation and how a real deployment ingests.
    val phase = sys.env.getOrElse("SPARK_GRAFT_STALE_PHASE", "all")
    require(Set("all", "fresh", "base", "append", "ari")(phase),
      s"unknown SPARK_GRAFT_STALE_PHASE $phase")
    def in(p: String) = phase == "all" || phase == p
    // the fresh baseline: ONE full-corpus rebuild shared by every
    // fraction (planes re-derived from the whole corpus).
    // SPARK_GRAFT_STALE_REUSE=1 reuses an EXISTING fresh store on disk
    // (store_meta present) instead of rebuilding; the record then shows
    // fresh_build_sec = 0, the honesty flag that this process did not
    // pay the build. The fresh store is never appended to, so reuse is
    // safe; stale stores are always rebuilt (appends mutate them).
    Clustering.invalidateKnnGraphIndex(work)
    val freshPath = s"${Similarity.artifactRoot(work)}/s14_stale_fresh"
    val reuseFresh = sys.env.get("SPARK_GRAFT_STALE_REUSE").contains("1") &&
      new java.io.File(s"$freshPath/store_meta").exists()
    val (tFresh, _) =
      if (!in("fresh") || reuseFresh) (0.0, ())
      else timed(Clustering.writeKnnGraphIndexOf(spark, pts,
        Clustering.lshPlanesFor(n), freshPath, s"$work->stale_fresh"))
    if (phase == "fresh")
      return Seq("s14stale_fresh_build_sec" -> tFresh,
        "s14stale_fresh_components" ->
          spark.read.parquet(s"$freshPath/points")
            .select(col("component")).distinct().count().toDouble)
    val pcts = sys.env.get("SPARK_GRAFT_STALE_PCTS")
      .map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(12, 25, 50))
    val batches = sys.env.get("SPARK_GRAFT_STALE_BATCHES")
      .map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(0 until 4)
    val rows = pcts.flatMap { pct =>
      val arrF = pmod(xxhash64(col("id"), lit("s14stale")), lit(100L)) <
        lit(pct.toLong)
      val base = pts.where(!arrF)
      val stalePath = s"${Similarity.artifactRoot(work)}/s14_stale$pct" +
        (if (stitch) "st" else "")
      val (tBuild, _) =
        if (!in("base")) (0.0, ())
        else timed(Clustering.writeKnnGraphIndexOf(spark, base,
          Clustering.lshPlanesFor(base.count()), stalePath,
          s"$work->stale$pct->stitch=$stitch"))
      val arrivals = pts.where(arrF)
      val (tAppend, _) =
        if (!in("append")) (0.0, ())
        else timed {
          batches.foreach { b =>
            Clustering.appendToGraphIndex(
              arrivals.where(pmod(xxhash64(col("id"), lit("s14batch")),
                lit(4L)) === lit(b.toLong)), stalePath, stitch = stitch)
          }
        }
      val buildRows =
        Seq(s"s14stale${pct}_base_build_sec" -> tBuild,
          s"s14stale${pct}_append_sec" -> tAppend)
      if (!in("ari")) buildRows
      else {
        val fresh = spark.read.parquet(s"$freshPath/points")
          .select(col("id"), col("component").as("fresh_c"))
        val mapRows =
          if (stitch)
            Clustering.readComponentMap(spark, stalePath).count()
          else 0L
        val joint = Clustering.storeComponents(spark, stalePath)
          .select(col("id"), col("component").as("stale_c"))
          .join(fresh, "id").persist()
        val nTot = joint.count().toDouble
        val sumAb = sumPairs(joint, Seq("stale_c", "fresh_c"))
        val sumA = sumPairs(joint, Seq("stale_c"))
        val sumB = sumPairs(joint, Seq("fresh_c"))
        val nStaleComp = joint.select(col("stale_c")).distinct().count()
        joint.unpersist()
        val totPairs = nTot * (nTot - 1) / 2
        val rand = (totPairs + 2 * sumAb - sumA - sumB) / totPairs
        val expAb = sumA * sumB / totPairs
        val ari = if ((sumA + sumB) / 2 == expAb) 1.0
          else (sumAb - expAb) / ((sumA + sumB) / 2 - expAb)
        buildRows ++
          Seq(s"s14stale${pct}_rand" -> rand,
            s"s14stale${pct}_ari" -> ari,
            s"s14stale${pct}_components" -> nStaleComp.toDouble) ++
          (if (stitch) Seq(s"s14stale${pct}_map_rows" -> mapRows.toDouble)
          else Seq.empty)
      }
    }
    // the ari phase re-emits the fresh component count (its record is
    // the one the staleness table reads); build seconds only when this
    // JVM actually built
    val freshRows =
      if (phase == "all" || phase == "ari")
        Seq("s14stale_fresh_build_sec" -> tFresh,
          "s14stale_fresh_components" ->
            spark.read.parquet(s"$freshPath/points")
              .select(col("component")).distinct().count().toDouble)
      else Seq.empty
    freshRows ++ rows
  }

  private def layeredCompare(spark: SparkSession,
      work: String): Seq[(String, Double)] = {
    import graft.functions.{Dedup, Similarity}
    val nDocs = Tables.documents(spark, work).count()
    val e = Tables.embeddings(spark, work)
    val nVecs = e.count()
    // layer 1: dedup first
    val (tDedup, nReps) = timed {
      Dedup.queries("d6_dedup_groups")(spark, work)
        .where(col("doc_id") === col("group_id")).count()
    }
    // layer 2: capped candidate emission (count vs the layout-probe
    // prediction), then the verified semantic groups
    val predicted = Similarity.nearDupCandidatePairsCapped(spark, work)
    val buckets = e
      .select(col("vec_id").as("doc_id"),
        Similarity.bucketExpr(spark, work, Similarity.NearDupPlanes)
          .as("bucket"))
      .groupBy(col("bucket"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .where(size(col("ids")) > 1)
    val (tCand, nCand) = timed(Dedup.pairsFromBuckets(buckets).count())
    val (tD7, _) = timed {
      Dedup.queries("d7_semantic_groups")(spark, work)
        .write.format("noop").mode("overwrite").save()
    }
    // layer 3: persisted-index serving
    val idx = work + "_ivfadc_idx"
    val (tBuild, _) = timed(Similarity.writeIvfAdcIndex(spark, work, idx))
    val nlist = Similarity.ivfCellsFor(nVecs)
    val np = Similarity.ivfProbesFor(nlist)
    val rr = Similarity.pqRerankFor(nVecs, nlist, np)
    val q = e.where(Similarity.querySampleFilter(
        math.max(1L, nVecs / 200L)))
      .select(col("vec_id"), col("features"))
      .localCheckpoint(eager = true)
    val nQ = q.count()
    val (tServe, nServed) = timed(
      Similarity.serveIvfAdcFromIndex(spark, work, idx, q, np, rr)
        .count())
    require(nServed == nQ * 5, s"served $nServed rows for $nQ queries")
    Seq(
      "layered_n_docs" -> nDocs.toDouble,
      "layered_n_vecs" -> nVecs.toDouble,
      "layered_dedup_sec" -> tDedup,
      "layered_n_reps" -> nReps.toDouble,
      "layered_cand_pairs_predicted" -> predicted.toDouble,
      "layered_cand_pairs_emitted_ordered" -> (2.0 * nCand),
      "layered_cand_sec" -> tCand,
      "layered_neardup_groups_sec" -> tD7,
      "layered_index_build_sec" -> tBuild,
      "layered_nlist" -> nlist.toDouble,
      "layered_np" -> np.toDouble,
      "layered_rr" -> rr.toDouble,
      "layered_queries" -> nQ.toDouble,
      "layered_serve_sec" -> tServe,
      "layered_e2e_sec" -> (tDedup + tD7 + tBuild + tServe))
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 10
    val work0 = if (args.length > 2) args(2) else "/tmp/graft_scale"
    // `indep` (5th arg) switches the embedding copies to independent
    // per-dim perturbation ([[IndepAmp]]) under a distinct work dir
    val perturb = if (args.length > 4) args(4) else "eps"
    val work = s"$work0/x$mult" + (if (perturb == "indep") "i" else "")
    // mm10: the scaled fixture replicates container params verbatim, so
    // in-bucket pair verification goes quadratic at x100 (SCALE.md §R8).
    // These are dropped in `linear` mode AND unconditionally at mult ≥
    // 100 — a default `full` run at x100 would otherwise hang on them
    // (their measured mitigations c19→LSH-fed and mm10→mm10b stay in)
    val quadraticCompute = Set("c19_conn_topk", "mm10_audio_neardup")
    val mode = if (args.length > 3) args(3) else "full"
    val set =
      // explicit query list (`only:a,b`) — focused mitigation runs; the
      // caller owns the quadratic-compute risk here
      // `onlye:` = the same explicit list, materializing ONLY the
      // documents/embeddings fixtures — for doc/vector-only sets at
      // multipliers where scaling the fact tables would dwarf the run
      if (mode.startsWith("only:") || mode.startsWith("onlye:")) {
        val names = mode.dropWhile(_ != ':').drop(1).split(",").toSeq
        names.foreach(n => require(SparkEntry.queries.contains(n),
          s"unknown query $n"))
        names
      } else if (mode == "linear" || mult >= 100) {
        if (mode != "linear")
          System.err.println(s"[scale] mult=$mult: dropping " +
            quadraticCompute.mkString(", ") + " (quadratic compute)")
        scaleSet.filterNot(quadraticCompute)
      } else scaleSet
    val spark = graft.core.GraftSession.local("graft-scale", 32)

    materialize(spark, src, mult, work,
      only = if (mode == "layout" || mode == "trunc")
          Some(Set("embeddings"))
        else if (mode == "layered" || mode.startsWith("onlye:"))
          Some(Set("documents", "embeddings"))
        else if (mode == "d11deep" || mode == "d11bucket" ||
            mode == "d11stale")
          Some(Set("documents"))
        else if (mode == "s14bucket" || mode == "s13rank" ||
            mode == "s14stale" || mode == "s14stitch" ||
            mode == "graphrecall" || mode == "s14cap" ||
            mode == "fidelsweep" || mode == "fidelprobe" ||
            mode == "m1part") // m1 reads labeledPoints = embeddings only
          Some(Set("embeddings"))
        // bpe30k / megabucket generate their own corpora — no fixture
        else if (mode == "bpe30k" || mode == "megabucket") Some(Set.empty)
        else None,
      perturb = perturb)

    if (mode == "q3bucket" || mode == "m1part" || mode == "vocab" ||
        mode == "bpe" || mode == "bpe30k" || mode == "connlsh" ||
        mode == "ivfauto" || mode == "layout" || mode == "pq" ||
        mode == "d9border" || mode == "pqdisk" || mode == "layered" ||
        mode == "d11deep" || mode == "d11bucket" || mode == "trunc" ||
        mode == "d11stale" ||
        mode == "s14bucket" || mode == "s13rank" || mode == "s14stale" ||
        mode == "s14stitch" || mode == "graphrecall" ||
        mode == "megabucket" || mode == "s14cap" ||
        mode == "fidelsweep" || mode == "fidelprobe") {
      // comparison-only modes over the scaled facts
      val (metric, results, defaultOut) =
        if (mode == "q3bucket")
          ("q3_bucket_compare", q3BucketCompare(spark, work),
            "scale_q3bucket.json")
        else if (mode == "vocab")
          ("vocab_chain", vocabChainCompare(spark, work),
            "scale_vocab.json")
        else if (mode == "bpe")
          ("bpe_depth", bpeDepthCompare(spark, work, mult),
            "scale_bpe.json")
        else if (mode == "bpe30k")
          ("bpe_30k", bpe30kRows(spark, work, mult),
            "scale_bpe30k.json")
        else if (mode == "connlsh")
          ("connlsh_layout", connLshCompare(spark, work, mult),
            "scale_connlsh.json")
        else if (mode == "ivfauto")
          ("ivfauto_curve", ivfAutoCompare(spark, work),
            "scale_ivfauto.json")
        else if (mode == "layout")
          ("layout_probe", layoutProbe(spark, work),
            "scale_layout.json")
        else if (mode == "pq")
          ("pq_curve", pqCompare(spark, work),
            "scale_pq.json")
        else if (mode == "d9border")
          ("d9b_order", d9bOrderCompare(spark, work),
            "scale_d9b.json")
        else if (mode == "pqdisk")
          ("pqdisk", pqDiskCompare(spark, work),
            "scale_pqdisk.json")
        else if (mode == "layered")
          ("layered_x1000", layeredCompare(spark, work),
            "scale_x1000.json")
        else if (mode == "d11deep")
          ("d11_deep", d11DeepRows(spark, work),
            "scale_d11deep.json")
        else if (mode == "d11bucket")
          ("d11_bucket_compare", d11BucketCompare(spark, work),
            "scale_d11bucket.json")
        else if (mode == "d11stale")
          ("d11_staleness", d11StaleCompare(spark, work),
            "scale_d11stale.json")
        else if (mode == "s14bucket")
          ("s14_bucket_compare", s14BucketCompare(spark, work),
            "scale_s14bucket.json")
        else if (mode == "s13rank")
          ("s13_rank_table", s13RankCompare(spark, work),
            "scale_s13rank.json")
        else if (mode == "graphrecall")
          ("graph_recall", graphRecallCompare(spark, work),
            "scale_graphrecall.json")
        else if (mode == "megabucket")
          ("megabucket_probe", megaBucketProbe(spark),
            "scale_megabucket.json")
        else if (mode == "s14stale")
          ("s14_staleness", s14StaleCompare(spark, work),
            "scale_s14stale.json")
        else if (mode == "s14stitch")
          ("s14_staleness_stitch",
            s14StaleCompare(spark, work, stitch = true),
            "scale_s14stitch.json")
        else if (mode == "s14cap")
          ("s14_cap_parity", s14CapCompare(spark, work),
            "scale_s14cap.json")
        else if (mode == "fidelsweep")
          ("fidelity_sweep", fidelSweepCompare(spark, work),
            "scale_fidelsweep.json")
        else if (mode == "fidelprobe")
          ("fidelity_probe", fidelProbeCompare(spark, work),
            "scale_fidelprobe.json")
        else if (mode == "trunc")
          ("trunc_curve", truncCompare(spark, work),
            "scale_trunc.json")
        else
          ("m1_partition_compare", m1PartitionCompare(spark, work, mult),
            "scale_m1part.json")
      def fmt(v: Double): String =
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val line = s"""{"metric":"$metric","mult":$mult,""" +
        s""""unit":"sec","queries":$qs,"src":"$src"}"""
      println(line)
      // the indep fixture gets its OWN default record file — without
      // this an un-env-var'd indep run would clobber the eps-decade
      // ledger (the commit-2369f0b incident class)
      val outDefault =
        if (perturb == "indep")
          defaultOut.stripSuffix(".json") + "_indep.json"
        else defaultOut
      java.nio.file.Files.write(
        java.nio.file.Paths.get(sys.env.getOrElse(
          "SPARK_GRAFT_SCALE_OUT", outDefault)),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      spark.stop()
      return
    }
    // count only the tables this mode materialized (`onlye:` skips the
    // relational facts — counting them would fail on the missing paths)
    val rows = factTables
      .filter(t => new java.io.File(s"$work/$t.parquet", "_SUCCESS")
        .exists())
      .map(t => t -> Tables.table(spark, work, t).count()).toMap

    // free disk under the work volume, GB — logged around every timed
    // row at the third decade (VERDICT r16 next-7: the x1000 serve
    // failure was detected as spill death with 6.7 GB of artifacts
    // resident; the record must let a quadratic-join wall and a plain
    // disk-exhaustion wall be told apart)
    def diskFreeGb: Double =
      new java.io.File(work0).getUsableSpace / 1e9
    val diskRows = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    // the warm pass rides timeOne too — label its disk rows apart so
    // the timed row's before/after keys stay unique in the record
    var warming = true
    def timeOne(name: String, dir: String = work): Double = {
      val tag = if (warming) s"warm_$name" else name
      if (mult >= 1000) {
        val free = diskFreeGb
        diskRows += (s"${tag}_disk_free_gb_before" -> free)
        System.err.println(
          f"[scale] disk free before $tag: $free%.1f GB")
      }
      val t0 = System.nanoTime()
      // s12's registered face pins the oracle's 4×8 layout; the decade
      // row times the production auto-layout build (the c21/connlsh
      // split — a fixed layout is Θ(n²) in candidates at scale)
      try (name match {
        case "s12_knn_graph" =>
          graft.operators.Clustering.s12KnnGraphAuto(spark, dir)
        case "s13_graph_clusters" =>
          graft.operators.Clustering.s13GraphClustersAuto(spark, dir)
        case "p14_semantic_budget" =>
          graft.functions.Curation.semanticBudget(
            Tables.documents(spark, dir),
            graft.operators.Clustering.s13GraphClustersAuto(spark, dir)
              .select(col("id"), col("component")))
        case "s14_graph_assign" =>
          // serve-only: the s14_index_build row pre-built the full
          // auto-layout store; this prices labeling a 1/8 batch
          graft.operators.Clustering.assignFromGraphIndex(
            Tables.labeledPoints(spark, dir)
              .select(col("id"), col("features"))
              .where(pmod(col("id"),
                lit(graft.operators.Clustering.S14Mod)) ===
                lit(graft.operators.Clustering.S14Res)),
            s"${graft.functions.Similarity.artifactRoot(dir)}/s14_graph_full")
        case _ => SparkEntry.queries(name)(spark, dir)
      }).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[scale] $name failed: ${e.getMessage}")
        if (mult >= 1000) {
          val free = diskFreeGb
          diskRows += (s"${tag}_disk_free_gb_after" -> free)
          System.err.println(
            f"[scale] disk free after FAILED $tag: $free%.1f GB")
        }
        return -1.0
      }
      if (mult >= 1000) {
        val free = diskFreeGb
        diskRows += (s"${tag}_disk_free_gb_after" -> free)
        System.err.println(f"[scale] disk free after $tag: $free%.1f GB")
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: JIT + codegen (+ page cache at the small multipliers);
    // an explicit-list run at the big multipliers warms against the
    // UNSCALED source instead — the point is hot code paths, not a
    // free second decade run (an s12 warmup at x1000 would cost about
    // as much as the timed row itself). Artifact-backed rows (serve
    // faces reading a store their build row writes) would silently
    // no-op against the unscaled src, leaving the timed row carrying
    // JIT cost (ADVICE r15) — warm with the first NON-artifact query
    // in the set, pre-building the src store only when the whole set
    // is artifact-backed, and LOG a failed warm pass either way
    val artifactBacked = Set("s14_graph_assign")
    val warmT =
      if ((mode.startsWith("only:") || mode.startsWith("onlye:")) &&
          mult >= 100) {
        val w = set.find(!artifactBacked.contains(_)).getOrElse {
          graft.operators.Clustering.invalidateKnnGraphIndex(src)
          graft.operators.Clustering.writeKnnGraphIndex(spark, src,
            s"${graft.functions.Similarity.artifactRoot(src)}/s14_graph_full")
          set.head
        }
        timeOne(w, src)
      } else timeOne(set.head)
    warming = false
    if (warmT < 0)
      System.err.println(
        "[scale] WARMUP PASS FAILED — timed rows may carry JIT/codegen cost")
    // artifact-backed rows: build each store BEFORE its serving query is
    // timed (the graft.Bench build-row discipline), so the decade rows
    // separate the once-per-corpus build from the per-batch serve
    // ordered: the p7 weights table is an input to the p11 LM fit, so
    // p7_model_build runs first and each later row times only its own
    // work (r13's p7_quality_score decade rows included the build; from
    // r14 the serve rows are pure serving — noted in SCALE.md)
    val s14BuildPhases =
      scala.collection.mutable.ArrayBuffer[(String, Double)]()
    val buildRows: Seq[(String, Double)] =
      Seq(
        "p7_model_build" -> (set.contains("p7_quality_score"), () => {
          graft.functions.QualityModel.invalidate(work)
          graft.functions.QualityModel.writeServedModel(spark, work,
            s"${graft.functions.Similarity.artifactRoot(work)}/p7_model")
        }),
        "p11_lm_build" -> (set.contains("p11_pipeline_learned"), () => {
          graft.functions.Dedup.invalidateLm(work)
          graft.functions.Dedup.writeP11LmModel(spark, work,
            s"${graft.functions.Similarity.artifactRoot(work)}/p11_lm")
        }),
        "d11_index_build" -> (set.contains("d11_incremental_dedup"), () => {
          graft.functions.Dedup.invalidateDedupIndex(work)
          graft.functions.Dedup.writeDedupIndex(spark, work,
            s"${graft.functions.Similarity.artifactRoot(work)}/dedup_index")
        }),
        "p12_centroid_build" -> (set.contains("p12_cluster_budget"), () => {
          graft.functions.Curation.invalidateCentroids(work)
          graft.functions.Curation.writeClusterCentroids(spark, work,
            s"${graft.functions.Similarity.artifactRoot(work)}/p12_centroids")
        }),
        "s9_index_build" -> (set.contains("s9_ann_ivfadc"), () => {
          graft.functions.Similarity.invalidateIvfAdcBuild(work)
          graft.functions.Similarity.writeIvfAdcIndex(spark, work,
            s"${graft.functions.Similarity.artifactRoot(work)}/ivfadc")
        }),
        "s14_index_build" -> (set.contains("s14_graph_assign"), () => {
          graft.operators.Clustering.invalidateKnnGraphIndex(work)
          // per-phase wall clock into the record (VERDICT r17 next-4:
          // name the phase carrying the build's above-linear residual)
          s14BuildPhases ++= graft.operators.Clustering
            .writeKnnGraphIndex(spark, work,
              s"${graft.functions.Similarity.artifactRoot(work)}/s14_graph_full")
            .map { case (k, v) => s"s14_build_$k" -> v }
        })).collect { case (name, (true, build)) =>
          if (mult >= 1000)
            diskRows += (s"${name}_disk_free_gb_before" -> diskFreeGb)
          val (t, _) = timed(build())
          if (mult >= 1000)
            diskRows += (s"${name}_disk_free_gb_after" -> diskFreeGb)
          name -> t
        }
    val timedSet = set.map(n => n -> timeOne(n)) ++ buildRows
    // VERDICT r9 §next-8: the m1 partition-scaling mitigation (8·mult
    // partitions holds per-partition size constant — O(n·nᵤ) instead of
    // the reference-pinned 8-partition O(Σnᵤ²)) re-measured in EVERY
    // decade refresh, so scale_out/scale_x100 always carry the mitigated
    // row next to the reference-pinned m1_mopso_archive
    val results =
      (if (set.contains("m1_mopso_archive"))
        timedSet :+ ("m1_mopso_archive_scaledparts" ->
          m1TimeRun(spark, work, 8 * mult))
      else timedSet) ++ s14BuildPhases ++ diskRows

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val rj = rows.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"scale_total","value":${fmt(total)},""" +
      s""""unit":"sec","mult":$mult,"queries":$qs,"rows":$rj,"src":"$src"}"""
    println(line)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
          if (perturb == "indep") "scale_out_indep.json"
          else "scale_out.json")),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
