package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.Tables

/** CMS contract: one-sided error on EVERY key (not just the reported
  * top-k), deterministic bytes under the fixed seed, and exact
  * mergeability (the property that makes it a distributed aggregate:
  * same-seed grids built on disjoint halves merge to the full-corpus
  * grid, counter for counter).
  */
class SketchesSpec extends AnyFunSuite with SparkTestBase {

  private def toks = Tables.documents(spark, sfDir)
    .select(explode(TextAnalysis.tokensCol(col("text"))).as("tok"))

  private def buildBytes(df: org.apache.spark.sql.DataFrame): Array[Byte] = {
    val cms = df.stat.countMinSketch("tok",
      Sketches.CmsEps, Sketches.CmsConfidence, Sketches.CmsSeed)
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    bos.toByteArray
  }

  test("estimate >= exact for every distinct token; bound for top-k") {
    val bytes = buildBytes(toks)
    val total = toks.count()
    val bound = math.ceil(Sketches.CmsEps * total).toLong
    val est = Sketches.cmsEstimate(lit(bytes), col("tok"))
    val perTok = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .select(col("tok"), col("n"), est.as("est"))
    assert(perTok.where(col("est") < col("n")).count() === 0,
      "CMS must never under-count")
    val top = perTok.orderBy(col("n").desc, col("tok"))
      .limit(TextAnalysis.VocabSize)
    assert(top.where(col("est") > col("n") + lit(bound)).count() === 0,
      s"top-k estimate exceeded n + $bound")
  }

  test("fixed seed -> identical sketch bytes across builds") {
    assert(java.util.Arrays.equals(buildBytes(toks), buildBytes(toks)))
  }

  test("same-seed sketches over disjoint halves merge to the full sketch") {
    import org.apache.spark.util.sketch.CountMinSketch
    def parse(b: Array[Byte]) =
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))
    val docs = Tables.documents(spark, sfDir)
    def half(pred: org.apache.spark.sql.Column) = docs.where(pred)
      .select(explode(TextAnalysis.tokensCol(col("text"))).as("tok"))
    val lo = parse(buildBytes(half(col("doc_id") % 2 === 0)))
    val hi = parse(buildBytes(half(col("doc_id") % 2 === 1)))
    lo.mergeInPlace(hi)
    val full = parse(buildBytes(toks))
    val sample = toks.distinct().limit(200).collect().map(_.getString(0))
    sample.foreach { t =>
      assert(lo.estimateCount(t.getBytes("UTF-8")) ===
        full.estimateCount(t.getBytes("UTF-8")), s"token $t")
    }
  }

  test("t9 runs green on the fixture: every verdict true") {
    val out = Sketches.t9HeavyHitters(spark, sfDir).collect()
    assert(out.length === TextAnalysis.VocabSize)
    assert(out.forall(_.getBoolean(2)), "a bound verdict was false")
  }

  test("non-literal sketch argument fails loudly at eval") {
    val df = toks.limit(3)
      .select(Sketches.cmsEstimate(col("tok").cast("binary"), col("tok")))
    val ex = intercept[Exception] { df.collect() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(
      _.getMessage != null) && causes(ex).exists(c =>
        Option(c.getMessage).exists(_.contains("sketch must be a literal"))))
  }
}
