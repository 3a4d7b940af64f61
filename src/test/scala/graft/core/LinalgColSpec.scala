package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.VectorExpressions
import graft.sources.Tables

/** The native codegen vector expressions must be bit-identical to the
  * built-in zip_with/aggregate formulations (same fold order) on real
  * fixture vectors — this is what keeps the DuckDB oracle agreement intact
  * after the hot-path swap.
  */
class LinalgColSpec extends AnyFunSuite with SparkTestBase {

  private def pairs = {
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("features"))
    val a = e.select(col("vec_id").as("ai"), col("features").as("av"))
      .filter(col("ai") < 40)
    val b = e.select(col("vec_id").as("bi"), col("features").as("bv"))
      .filter(col("bi") >= 40 && col("bi") < 80)
    a.crossJoin(b)
  }

  test("EuclidDistance expression == built-in formulation, bit for bit") {
    val diff = pairs.select(
      VectorExpressions.euclid(col("av"), col("bv")).as("fast"),
      Linalg.euclidColBuiltin(col("av"), col("bv")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff === 0L)
  }

  test("DotProduct expression == built-in formulation, bit for bit") {
    val diff = pairs.select(
      VectorExpressions.dot(col("av"), col("bv")).as("fast"),
      Linalg.dotColBuiltin(col("av"), col("bv")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff === 0L)
  }

  test("CosineSimilarity expression == built-in formulation, bit for bit") {
    val diff = pairs.select(
      VectorExpressions.cosine(col("av"), col("bv")).as("fast"),
      Linalg.cosineColBuiltin(col("av"), col("bv")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff === 0L)
  }

  test("WeightedEuclid expression == built-in formulation, bit for bit") {
    // raw signed fixture vectors — no shifted-positive restriction: the
    // built-in twin carries the same zero-sum CASE guard as the kernel
    // (Spark NaN semantics make NaN = NaN true, so negative-weight-sum
    // rows still compare bit-for-bit)
    val diff = pairs.select(
      VectorExpressions.weightedEuclid(col("av"), col("bv")).as("fast"),
      Linalg.weightedEuclidColBuiltin(col("av"), col("bv")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff === 0L)
  }

  test("weightedEuclidColBuiltin guards zero-sum input like the kernel") {
    import spark.implicits._
    val row = Seq((Seq(1.0, -1.0), Seq(5.0, 7.0))).toDF("a", "b")
      .select(
        Linalg.weightedEuclidColBuiltin(col("a"), col("b")).as("ref"),
        VectorExpressions.weightedEuclid(col("a"), col("b")).as("fast"))
      .head()
    assert(row.getDouble(0) === 0.0 && row.getDouble(1) === 0.0)
    // zero-sum AND length-mismatched: the kernel nulls on the length
    // check BEFORE the weights — the guard must not short-circuit to 0.0
    val mm = Seq((Seq(1.0, -1.0), Seq(5.0, 7.0, 9.0))).toDF("a", "b")
      .select(
        Linalg.weightedEuclidColBuiltin(col("a"), col("b")).as("ref"),
        VectorExpressions.weightedEuclid(col("a"), col("b")).as("fast"))
      .head()
    assert(mm.isNullAt(0) && mm.isNullAt(1))
  }

  test("WeightedEuclid matches the driver twin and guards zero-sum input") {
    import spark.implicits._
    val a = Array(1.0, 2.0, 3.0)
    val b = Array(4.0, 6.0, 8.0)
    val got = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(VectorExpressions.weightedEuclid(col("a"), col("b")))
      .head().getDouble(0)
    assert(got === Linalg.weightedEuclid(a, b))
    // zero-sum weights → all-zero weight vector → 0.0 (driver semantics)
    val z = Seq((Seq(1.0, -1.0), Seq(5.0, 7.0))).toDF("a", "b")
      .select(VectorExpressions.weightedEuclid(col("a"), col("b")))
      .head().getDouble(0)
    assert(z === 0.0)
    assert(Linalg.weightedEuclid(Array(1.0, -1.0), Array(5.0, 7.0)) === 0.0)
  }

  test("length-mismatched arrays yield NULL, matching the built-in twin") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val row = df.select(
      VectorExpressions.euclid(col("a"), col("b")).as("fast"),
      Linalg.euclidColBuiltin(col("a"), col("b")).as("ref"),
      VectorExpressions.dot(col("a"), col("b")).as("d"),
      VectorExpressions.cosine(col("a"), col("b")).as("c"),
      VectorExpressions.weightedEuclid(col("a"), col("b")).as("w")).head()
    assert(row.isNullAt(0) && row.isNullAt(1)) // both surfaces agree
    assert(row.isNullAt(2) && row.isNullAt(3) && row.isNullAt(4))
  }

  test("expressions null-propagate and run in interpreted mode too") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0, 1.0)))
    ).toDF("a", "b")
    val rows = df.select(
      VectorExpressions.euclid(col("a"), col("b")).as("d")).collect()
    assert(math.abs(rows(0).getDouble(0) - math.sqrt(8.0)) < 1e-12)
    assert(rows(1).isNullAt(0))
    // interpreted (non-codegen) path: direct eval
    val e = graft.functions.EuclidDistance(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(0.0, 0.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3.0, 4.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) === 5.0)
  }

  test("SignBuckets == the compositional when/dot chain at every layout " +
      "(incl. past the 64-dot codegen cliff)") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("features"))
    // plane sets drawn from the corpus (the s2 convention); 4×8 is the
    // fixture layout, 16×8 is the x1000 auto layout — the size where the
    // compositional form stops JIT-compiling (SCALE.md §r16)
    val planeRows = e.orderBy(col("vec_id")).limit(16 * 8)
      .select(col("features")).collect()
      .map(_.getSeq[Double](0).toArray).toSeq
    for (numPlanes <- Seq(1, 4, 16)) {
      val numTables = 8
      val ps = planeRows.take(numPlanes * numTables)
      val composed = org.apache.spark.sql.functions.array(
        (0 until numTables).map { t =>
          Linalg.signBucketColComposed(col("features"),
            ps.slice(t * numPlanes, (t + 1) * numPlanes))
        }: _*)
      val native = VectorExpressions
        .signBuckets(col("features"), ps, numPlanes)
      val diff = e.select(native.as("fast"), composed.as("ref"))
        .filter(col("fast") =!= col("ref")).count()
      assert(diff === 0L, s"SignBuckets diverged at $numPlanes x $numTables")
      // the single-table face routes through the same expression
      val diff1 = e.select(
        Linalg.signBucketCol(col("features"), ps.take(numPlanes)).as("f"),
        Linalg.signBucketColComposed(col("features"), ps.take(numPlanes))
          .as("r"))
        .filter(col("f") =!= col("r")).count()
      assert(diff1 === 0L)
    }
    // ragged input → null on the RAW expression (the
    // VectorFoldExpression convention)
    val ragged = spark.range(1).select(
      org.apache.spark.sql.functions.array(lit(1.0), lit(2.0))
        .as("features"))
    assert(ragged.select(VectorExpressions.signBuckets(col("features"),
        Seq(Array(1.0, 2.0, 3.0)), 1).as("s"))
      .head().isNullAt(0))
  }

  test("signBucketCol fails loudly on a ragged vector, maps NULL to " +
      "NULL, unchanged on well-formed input") {
    // the shared bucket entry point (Similarity band joins,
    // GlobalNeighbors, every LSH consumer): a dimension-mismatched
    // vector must FAIL THE JOB with both sizes named — the raw
    // expression's NULL would silently drop the row from candidate
    // generation (VERDICT r17 next-2)
    val planes = Seq(Array(1.0, -2.0, 3.0))
    val ragged = spark.range(1).select(
      org.apache.spark.sql.functions.array(lit(1.0), lit(2.0))
        .as("features"))
    val err = intercept[Exception] {
      ragged.select(Linalg.signBucketCol(col("features"), planes))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(m =>
        m.contains("expected dimension 3") && m.contains("got 2")),
      s"ragged guard message missing sizes: ${msgs(err)}")
    // NULL vector: absence is a modeled state, not corruption → NULL out
    val nullVec = spark.range(1).select(
      lit(null).cast("array<double>").as("features"))
    assert(nullVec.select(Linalg.signBucketCol(col("features"), planes))
      .head().isNullAt(0))
    // well-formed rows are untouched: guard-wrapped == raw expression
    val ok = spark.range(8).select(
      org.apache.spark.sql.functions.array(
        col("id").cast("double"), lit(-1.5), lit(0.25)).as("features"))
    val diff = ok.select(
        Linalg.signBucketCol(col("features"), planes).as("g"),
        org.apache.spark.sql.functions.element_at(
          VectorExpressions.signBuckets(col("features"), planes, 1), 1)
          .as("r"))
      .filter(!(col("g") <=> col("r"))).count()
    assert(diff === 0L)
  }

  test("SQL registration exposes the kernels to spark.sql") {
    VectorExpressions.register(spark)
    val d = spark.sql(
      "SELECT euclid(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS d, " +
        "cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
        "weighted_euclid(array(1.0d, 1.0d), array(1.0d, 1.0d)) AS w")
      .head()
    assert(d.getDouble(0) === 5.0)
    assert(math.abs(d.getDouble(1) - 1.0) < 1e-12)
    assert(d.getDouble(2) === 0.0)
  }
}
