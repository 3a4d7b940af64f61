package graft.functions

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis.tokensCol
import graft.sources.Tables

/** Learned document-quality scoring (p7) — the trained companion to the
  * t7 heuristic gate cascade, closing the standard training-data-pipeline
  * pattern (CCNet/Gopher lineage): a cheap teacher labels the corpus, a
  * hashed-feature linear model learns the boundary, and SERVING is the
  * model reduced to a TABLE — the t12 model-as-a-table discipline —
  * scored by pure codegen expressions, never a UDF and never MLlib on
  * the hot path.
  *
  * Train (driver-initiated, memoized per dir): weak labels from the t7
  * verdict (`keep` = 1), unigram counts over [[NumFeatures]] hash
  * buckets, L2-regularized logistic regression. The bucket index is
  * computed by the SAME SQL expression serving uses —
  * `pmod(hash(tok), N)` — so train/serve featurization skew is
  * impossible BY CONSTRUCTION (the first cut trained on MLlib
  * HashingTF and served on functions.hash; the two Murmur3 variants
  * disagree, and only the parity spec caught it — hence this design).
  * Deterministic: LBFGS from zero initial coefficients on a fixed
  * dataset — the m1/coarseCentroids family (spec-pinned, no SQL
  * oracle).
  *
  * Serve: tokens explode → bucket → broadcast join against the
  * non-zero weight rows → per-doc sum + sigmoid (Σ_token w(bucket) =
  * the count-vector dot product). One scan, one narrow shuffle on
  * doc_id; at 100 TB the model rides as a few-thousand-row broadcast
  * and scoring is embarrassingly parallel. The same plan scores an
  * arriving stream against the frozen weights (StreamingSpec).
  */
object QualityModel {

  type Q = (SparkSession, String) => DataFrame

  /** Hash-bucket count: 2^15 buckets for a ~23k-type fixture vocabulary
    * keeps collisions rare while the weight table stays broadcast-sized
    * at any corpus scale (the model size is the CAP, not the corpus).
    */
  val NumFeatures: Int = 1 << 15

  def queries: Map[String, Q] = Map(
    "p7_quality_score" -> p7QualityScore)

  /** Training is not SQL-replayable (the m1 convention), but SERVING
    * is: p7 persists the fitted model as a token-keyed, micro-nat
    * integer weights table + intercept (see [[servedModel]]) and
    * scores from THAT parquet — so the oracle reads the same artifact
    * and replays tokenize → join → integer sum → sigmoid. Integer
    * weight sums are order-independent (the t12/t13 micro-nat
    * discipline), which is what makes the cross-engine hash
    * deterministic rather than fp-order-lucky. The driver's gate runs
    * at sf0.01; [[p7QualityScore]] writes the artifact before serving.
    */
  def oracles: Map[String, String] = Map(
    "p7_quality_score" ->
      s"""WITH ${qualityScoreSqlFrom("documents")}
         |SELECT doc_id, quality FROM qs ORDER BY doc_id""".stripMargin)

  /** The served-model replay as a reusable CTE chain over
    * `src(doc_id, text)`, ending in `qs(doc_id, quality)` — tokenize →
    * left-join the persisted micro-nat weights → integer sum → sigmoid,
    * rounded to 6 places exactly like [[scoreDocsServed]]. ONE source
    * of truth for the p7 oracle and Dedup's p11 pipeline oracle (both
    * gate on the rounded value, so the fragments must be literally the
    * same SQL). CTE names are p-prefixed so the chain composes without
    * collisions.
    */
  private[graft] def qualityScoreSqlFrom(src: String): String =
    s"""pw AS (SELECT tok, w_micro
       |    FROM read_parquet('$p7WeightsPath/weights/*.parquet')),
       |pm AS (SELECT b_micro
       |  FROM read_parquet('$p7WeightsPath/meta/*.parquet')),
       |ptk AS (SELECT doc_id,
       |    unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |  FROM $src),
       |pz AS (SELECT doc_id, sum(coalesce(w_micro, 0))::BIGINT AS zm
       |  FROM ptk LEFT JOIN pw USING (tok) GROUP BY doc_id),
       |qs AS (SELECT doc_id,
       |    round(1.0 / (1.0 + exp(-((zm + b_micro) / 1000000.0))), 6)
       |      AS quality
       |  FROM pz CROSS JOIN pm)""".stripMargin

  /** Shared with the p11 oracle (Dedup) — both replay the served
    * artifact the verify run's own queries write, derived from the
    * verify dir via the same [[Similarity.artifactRoot]] keying the
    * Spark side uses (ADVICE r12: no more hardcoded sf0.01 path).
    */
  private[functions] def p7WeightsPath =
    s"${Similarity.artifactRoot(Similarity.oracleDir)}/p7_model"

  /** p7: every document scored by the trained model — (doc_id, quality),
    * quality = P(keep | tokens) rounded to 6 places — served from the
    * PERSISTED model artifact: [[writeServedModel]] then
    * [[scoreDocsServed]] over the re-read parquet (the s9 discipline —
    * the checked artifact is the served artifact).
    */
  def p7QualityScore: Q = (s, dir) => {
    val path = s"${Similarity.artifactRoot(dir)}/p7_model"
    writeServedModel(s, dir, path)
    val w = s.read.parquet(s"$path/weights")
    val bMicro = s.read.parquet(s"$path/meta")
      .collect()(0).getLong(0)
    scoreDocsServed(Tables.documents(s, dir), w, bMicro)
      .orderBy(col("doc_id"))
  }

  /** Labeled training frame: the t7 verdict as the weak teacher. */
  private[graft] def labeled(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withQualityVerdict(
      Tables.documents(s, dir).withColumn("toks", tokensCol(col("text"))))
      .select(col("doc_id"), col("toks"),
        when(col("verdict") === "keep", 1.0).otherwise(0.0).as("label"))

  /** SQL-bucketed sparse training features (doc_id, label, features):
    * bucket indices and counts come from the serving expression and a
    * plain count aggregate; only the final sparse-vector assembly is a
    * typed map (training-path-only — the hot scoring path stays pure
    * codegen expressions).
    */
  private[graft] def featurized(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    labeled(s, dir)
      .select(col("doc_id"), col("label"), explode(col("toks")).as("tok"))
      .select(col("doc_id"), col("label"),
        pmod(hash(col("tok")), lit(NumFeatures)).as("idx"))
      .groupBy(col("doc_id"), col("label"), col("idx"))
      .agg(count(lit(1)).cast("double").as("c"))
      .groupBy(col("doc_id"), col("label"))
      .agg(sort_array(collect_list(struct(col("idx"), col("c"))))
        .as("pairs"))
      .as[(Long, Double, Seq[(Int, Double)])]
      .map { case (doc, y, ps) =>
        (doc, y, Vectors.sparse(NumFeatures,
          ps.map(_._1).toArray, ps.map(_._2).toArray))
      }
      .toDF("doc_id", "label", "features")
  }

  /** The fitted model of record (memoized per dir). Exposed to the spec
    * so the serving-parity check scores THIS exact model two ways.
    */
  private[graft] def fitModel(s: SparkSession, dir: String)
      : org.apache.spark.ml.classification.LogisticRegressionModel =
    modelCache.synchronized {
      modelCache.getOrElseUpdate(dir, {
        // regParam 1e-3 / tol 1e-6, not the old 1e-6 / 1e-9 (VERDICT
        // r18 next-5): the teacher label is a DETERMINISTIC function
        // of the tokens, so the training set is (near-)separable and
        // the near-unregularized logistic loss has no finite
        // minimizer — LBFGS walked the weights outward until its line
        // search failed ("ERROR LBFGS: Failure! ... Giving up" in the
        // sf0.1 bench tail). 1e-3 gives the objective a finite
        // optimum; tol 1e-6 stops BEFORE the fp noise floor, where
        // the measured failure mode lives (a 1e-8 tolerance made the
        // strong-Wolfe zoom hunt for descent below summation-order
        // noise — the same fit flipped between clean and "Giving up"
        // with nothing changed but input partitioning). Standardization
        // stays at the MLlib default (true). The served artifact is
        // re-derived from whatever this fit produces, so the p7 oracle
        // (which replays the artifact) is parameter-agnostic; the
        // teacher-accuracy floor is spec-pinned and re-verified under
        // these values.
        val m = new LogisticRegression()
          .setMaxIter(200).setRegParam(1e-3).setTol(1e-6)
          .fit(featurized(s, dir))
        assertConverged(m)
        m
      })
    }

  /** Clean-convergence gate on the fit of record (VERDICT r18 next-5):
    * every objective value finite, the history never resets upward
    * (a breeze line-search failure retries from the same point — the
    * loss stalls or bounces instead of descending), and the tolerance
    * was reached before the iteration cap. Runs inside [[fitModel]] so
    * the bench's `p7_model_build` row — and any other trainer — fails
    * loudly instead of silently serving a gave-up optimizer's weights.
    */
  private[graft] def assertConverged(
      m: org.apache.spark.ml.classification.LogisticRegressionModel): Unit = {
    val h = m.summary.objectiveHistory
    require(h.nonEmpty && h.forall(v => !v.isNaN && !v.isInfinite),
      s"p7 training objective not finite: ${h.take(5).mkString(",")}…")
    // RELATIVE monotonicity tolerance (ADVICE r19): the objective is
    // O(1)-scale, and benign fp summation wobble under a different
    // partitioning can exceed an absolute 1e-12 — a real line-search
    // failure bounces by orders of magnitude more than 1e-9·|obj|.
    // Floored at the old absolute 1e-12 (ADVICE r20): near a zero
    // objective the relative band alone shrinks BELOW 1e-12 — stricter
    // than the rule it replaced — and benign wobble at convergence on
    // a well-separated corpus would crash the train.
    h.sliding(2).foreach {
      case Array(a, b) =>
        require(b <= a + math.max(1e-12, 1e-9 * math.abs(a)),
        s"p7 training objective reset upward ($a -> $b) — line-search " +
          "failure territory")
      case _ => ()
    }
    // ==maxIter alone is a WARNING, not a crash (ADVICE r19): a fit
    // that is still strictly descending at the cap genuinely failed to
    // reach tolerance, but one whose tail has flattened to relative
    // noise converged in every sense that matters — crashing there
    // turns a usable model into an outage on corpora that merely
    // iterate longer. "Flat" = the last step's relative improvement
    // is below the configured tol (1e-6).
    if (m.summary.totalIterations >= 200) {
      val tailImprove =
        if (h.length < 2) 0.0
        else (h(h.length - 2) - h.last) /
          math.max(math.abs(h(h.length - 2)), 1e-12)
      require(tailImprove <= 1e-6,
        s"p7 training hit the iteration cap (${m.summary.totalIterations})" +
          s" while still descending (last relative step $tailImprove)" +
          " — did not reach tolerance")
      System.err.println("[graft] p7 training reached the iteration cap " +
        "with a flat tail (relative step " + tailImprove +
        ") — treating as converged")
    }
  }

  private val modelCache = scala.collection.mutable.Map[String,
    org.apache.spark.ml.classification.LogisticRegressionModel]()

  /** The served form: non-zero coefficient rows (idx, w) + intercept. */
  private[graft] def weights(s: SparkSession,
      dir: String): (DataFrame, Double) = {
    import s.implicits._
    val m = fitModel(s, dir)
    val rows = m.coefficients.toArray.zipWithIndex
      .filter(_._1 != 0.0)
      .map { case (wv, i) => (i, wv) }.toSeq
    (rows.toDF("idx", "w"), m.intercept)
  }

  /** The SERVED form of record: one row per distinct corpus TOKEN with
    * its bucket weight quantized to micro-nats (w_micro = round(w·1e6)
    * as a long). Token-keyed because the oracle engine cannot compute
    * Spark's Murmur3 — the `pmod(hash(tok), N)` featurization runs HERE
    * (once, at model-export time, the same expression training used,
    * so the HashingTF-style skew the parity spec once caught is still
    * impossible) and the serving join needs only string equality.
    * Integer micro-nat weights make the per-document sum exact and
    * order-independent in any engine (t12/t13 discipline). Zero-weight
    * tokens are dropped; both engines coalesce missing joins to 0.
    * Broadcast-sized by construction: ≤ vocabulary, and the model
    * (not the corpus) caps the number of distinct weights.
    */
  private[graft] def servedModel(s: SparkSession,
      dir: String): (DataFrame, Long) = {
    val (w, b) = weights(s, dir)
    val toks = Tables.documents(s, dir)
      .select(explode(tokensCol(col("text"))).as("tok"))
      .distinct()
    val wTok = toks
      .select(col("tok"), pmod(hash(col("tok")), lit(NumFeatures)).as("idx"))
      .join(broadcast(w), Seq("idx"), "left")
      .select(col("tok"),
        round(coalesce(col("w"), lit(0.0)) * 1e6, 0).cast("long")
          .as("w_micro"))
      .where(col("w_micro") =!= 0L)
    (wTok, math.round(b * 1e6))
  }

  /** Persist the served model: `weights/` (tok, w_micro) and `meta/`
    * (b_micro) — the p7 oracle reads these exact tables.
    *
    * Memoized per (dir, path) within the JVM (`force` rebuilds): the
    * first call in any process trains and writes a FRESH artifact (so
    * the correctness gate always hashes the model this code version
    * produces — never a stale on-disk one), and every later call
    * serves from it. That is the production build-once/serve-many
    * split: the bench's repeated p7 passes time the serving face,
    * while [[graft.Bench]] carries the build cost in its own
    * `p7_model_build` row (VERDICT r12 next-6 — the in-query rebuild
    * was 60% of p7's bench time).
    */
  def writeServedModel(s: SparkSession, dir: String, path: String,
      force: Boolean = false): Unit = {
    val key = s"$dir->$path"
    if (!force && writtenModels.contains(key)) return
    import s.implicits._
    val (wTok, bMicro) = servedModel(s, dir)
    wTok.write.mode("overwrite").parquet(s"$path/weights")
    Seq(bMicro).toDF("b_micro").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
    writtenModels.add(key)
  }

  private val writtenModels =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Drops every per-JVM memo for `dir` — fitted model AND
    * written-artifact marker — so the next [[writeServedModel]]
    * retrains from scratch. The bench's `p7_model_build` row calls
    * this first: `force` alone re-exports but would reuse the cached
    * LR fit, silently excluding the training cost from the recorded
    * build time.
    */
  def invalidate(dir: String): Unit = {
    modelCache.synchronized { modelCache.remove(dir) }
    val it = writtenModels.iterator()
    while (it.hasNext) if (it.next().startsWith(dir + "->")) it.remove()
  }

  /** Scores (doc_id, text) rows against a frozen token-keyed micro-nat
    * weight table — the ONE plan batch p7, the oracle replay, and the
    * streaming twin all run. explode_outer keeps empty documents (they
    * score sigmoid(b)); the integer sum is exact, so the plan is
    * partitioning- and engine-independent.
    */
  private[graft] def scoreDocsServed(docs: DataFrame, wTok: DataFrame,
      bMicro: Long): DataFrame =
    docs
      .select(col("doc_id"), explode_outer(tokensCol(col("text"))).as("tok"))
      .join(broadcast(wTok), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("w_micro"), lit(0L))).as("zm"))
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) +
          exp(-((col("zm") + lit(bMicro)) / lit(1e6)))), 6)
          .as("quality"))

  /** Bucket-keyed full-precision serving — the TRAINING-face twin kept
    * for the parity spec (weights-table plan vs `model.transform`) and
    * as the reference the micro-nat served form is bounded against.
    */
  private[graft] def scoreDocs(docs: DataFrame, w: DataFrame,
      b: Double): DataFrame =
    docs
      .select(col("doc_id"), explode_outer(tokensCol(col("text"))).as("tok"))
      .select(col("doc_id"),
        pmod(hash(col("tok")), lit(NumFeatures)).as("idx"))
      .join(broadcast(w), Seq("idx"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("w"), lit(0.0))).as("z"))
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) + exp(-(col("z") + lit(b)))), 6)
          .as("quality"))
}
