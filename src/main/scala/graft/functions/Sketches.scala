package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

import graft.sources.Tables

/** Count-Min-Sketch heavy hitters — the third bounded-error sketch twin
  * next to q22 (HLL++ distinct) and q16b (approx percentile), and the
  * mergeable structure a 100 TB frequency question actually uses: each
  * executor folds its partition into a fixed depth×width counter grid,
  * grids merge associatively, and the result answers any point-frequency
  * query with a ONE-SIDED error bound (estimate ≥ truth always;
  * ≤ truth + ε·N with probability 1−δ). The exact top-k (t6) needs a
  * shuffle of every distinct token; the sketch needs constant state per
  * partition regardless of cardinality.
  */
object Sketches {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "t9_heavy_hitters" -> t9HeavyHitters
  )

  /** ε (fractional over-count bound) and δ via confidence; fixed seed so
    * the sketch — and therefore t9's booleans — are deterministic.
    * Spark's CountMinSketchImpl sizes depth = ceil(−log₂(1−conf)) = 7 and
    * width = ceil(2/ε) = 400: ~22 KB of Long counters broadcast, at ANY
    * corpus size.
    */
  val CmsEps = 0.005
  val CmsConfidence = 0.99
  val CmsSeed = 42

  /** t9: the exact top-[[TextAnalysis.VocabSize]] tokens (t6's plan)
    * annotated with whether the CMS point estimate honors the one-sided
    * bound estimate ∈ [n, n + ε·N]. Booleans, not raw estimates, so the
    * DuckDB oracle (which cannot run the sketch) verifies the exact
    * column and the bound verdicts hash-exactly — the q22/q16b pattern.
    *
    * The probe expression is CodegenFallback, deliberately: it touches
    * only the k result rows AFTER aggregation, never the corpus-sized
    * stream, so breaking whole-stage codegen there costs nothing.
    */
  def t9HeavyHitters: Q = (s, dir) => {
    val toks = Tables.documents(s, dir)
      .select(explode(TextAnalysis.tokensCol(col("text"))).as("tok"))
    val cms = toks.stat.countMinSketch(
      "tok", CmsEps, CmsConfidence, CmsSeed)
    // N for the ε·N bound comes from the sketch itself (totalCount is
    // the number of added items) — no separate count() pass over the
    // corpus
    val totalTokens = cms.totalCount()
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      cms.writeTo(bos)
      bos.toByteArray
    }
    val bound = math.ceil(CmsEps * totalTokens).toLong
    val est = cmsEstimate(lit(bytes), col("tok"))
    toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(TextAnalysis.VocabSize)
      .select(col("tok"), col("n"),
        (est >= col("n") && est <= col("n") + lit(bound))
          .as("within_bound"))
      .orderBy(col("n").desc, col("tok"))
  }

  def cmsEstimate(sketchBytes: Column, key: Column): Column =
    Bridge.column(CountMinEstimate(
      Bridge.expression(sketchBytes), Bridge.expression(key)))

  // ---- DuckDB oracles ------------------------------------------------------

  /** The oracle verifies the exact leg cell-for-cell and the bound
    * verdicts as literal TRUE — if any estimate violated its one-sided
    * bound, the Spark side would emit false and the hash compare fails.
    */
  def oracles: Map[String, String] = Map(
    "t9_heavy_hitters" ->
      s"""SELECT tok, count(*) AS n, TRUE AS within_bound
         |FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
         |  FROM documents)
         |GROUP BY tok ORDER BY n DESC, tok
         |LIMIT ${TextAnalysis.VocabSize}""".stripMargin
  )
}

/** Point-frequency probe of a serialized
  * [[org.apache.spark.util.sketch.CountMinSketch]]. The sketch argument
  * must be foldable (a literal — the broadcast-in-plan pattern p5b uses
  * for its Bloom filter): it deserializes ONCE per executor expression
  * instance via the transient lazy val, not per row. Keys hash via their
  * UTF8 bytes — the same representation CountMinSketchAgg feeds the
  * builder, so probe and build agree.
  */
case class CountMinEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  @transient private lazy val cms: CountMinSketch = {
    require(left.foldable, "CountMinEstimate: sketch must be a literal")
    CountMinSketch.readFrom(new ByteArrayInputStream(
      left.eval().asInstanceOf[Array[Byte]]))
  }

  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    cms.estimateCount(key.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cms_estimate"
}
