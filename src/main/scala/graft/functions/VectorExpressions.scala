package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the hot vector kernels (SURVEY §4: the
  * one place custom Catalyst work pays — euclid runs n·K times per
  * particle-iteration and n² times in KNN/Conn/silhouette).
  *
  * The built-in formulation `sqrt(aggregate(zip_with(a,b,(x,y)->(x-y)²),0,+))`
  * is semantically identical but materializes an intermediate 64-element
  * array per row pair; these expressions generate a single allocation-free
  * loop inside whole-stage codegen (~4× on the 4M-pair KNN benchmarks).
  * Summation order is the same left-to-right fold, so results are
  * bit-identical to the built-in version and to the DuckDB oracle.
  */
abstract class VectorFoldExpression extends BinaryExpression
    with ExpectsInputTypes {
  // declared as Seq[DataType] (a subtype of the private[sql]
  // Seq[AbstractDataType] signature) — ArrayType(DoubleType) inputs get
  // implicit casts from array<float> etc. at analysis time
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // NULL also arises from non-null ragged inputs (length mismatch), so
  // the result is nullable regardless of the children
  override def nullable: Boolean = true
}

/** sqrt(Σ (aᵢ−bᵢ)²) — reference `dist` (Spark_MOPSO_Avg.scala:1067-1075). */
case class EuclidDistance(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // built-in twin (zip_with) null-pads mismatched lengths → NULL result;
    // truncating instead would silently mask ragged data
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1 }
    math.sqrt(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    double d = $a.getDouble($i) - $b.getDouble($i);
         |    $s += d * d;
         |  }
         |  ${ev.value} = java.lang.Math.sqrt($s);
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·bᵢ. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot/(‖a‖·‖b‖) in one pass — same fold order as the built-in
  * dot/norm·norm composition, so values are bit-identical.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $d = 0.0; double $na = 0.0; double $nb = 0.0;
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    double xv = $a.getDouble($i); double yv = $b.getDouble($i);
         |    $d += xv * yv; $na += xv * xv; $nb += yv * yv;
         |  }
         |  ${ev.value} = $d / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** sqrt(Σ (aᵢ/Σa)·(aᵢ−bᵢ)²) — reference weighted distance
  * (Spark_MOPSO_Avg.scala:1088-1096): the weight vector derives from the
  * FIRST argument by x/sum(x) (Linalg.weightsBySum twin); a zero-sum `a`
  * yields all-zero weights → 0.0, exactly like Linalg.weightedEuclid.
  * Both sums are left-to-right folds, bit-identical to the driver twin.
  */
case class WeightedEuclid(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var sa = 0.0
    var i = 0
    while (i < n) { sa += x.getDouble(i); i += 1 }
    var s = 0.0
    if (sa != 0.0) {
      i = 0
      while (i < n) {
        val xv = x.getDouble(i)
        val d = xv - y.getDouble(i)
        s += (xv / sa) * d * d
        i += 1
      }
    }
    math.sqrt(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sa = ctx.freshName("sa")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $sa = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $sa += $a.getDouble($i); }
         |  double $s = 0.0;
         |  if ($sa != 0.0) {
         |    for (int $i = 0; $i < $n; $i++) {
         |      double xv = $a.getDouble($i);
         |      double d = xv - $b.getDouble($i);
         |      $s += (xv / $sa) * d * d;
         |    }
         |  }
         |  ${ev.value} = java.lang.Math.sqrt($s);
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ALL LSH tables' sign buckets for one vector in ONE expression:
  * bucket(t) = Σ_j (features·plane[t·numPlanes+j] > 0) << j, returned as
  * array<long> of length numTables.
  *
  * Why this exists (SCALE.md §r16): the compositional formulation — one
  * `when(dot > 0, 1<<j)` chain per plane, numPlanes·numTables inlined
  * [[DotProduct]] subtrees — stops being compilable as the layout grows.
  * At the fixture's 4×8 = 32 dots the generated stage JITs fine (2.1 s /
  * 200k rows measured); at the auto layouts the decades derive (8×8 = 64
  * dots → 40.5 s, 16×8 = 128 dots → 74 s on the same rows) the generated
  * method blows past the JIT's huge-method limit and the whole scan
  * stage runs de-optimized — a ~100× per-row cliff that silently
  * dominated every graph-family operator at x100+ and stalled the x1000
  * build. One expression with a referenced `double[]` plane matrix keeps
  * the generated method a fixed few hundred bytes at ANY layout.
  *
  * Bucket arithmetic is bit-identical to the compositional form (disjoint
  * bits OR'd vs summed; same ascending-index dot fold, same `> 0` test),
  * spec-pinned against it in VectorExpressionsSpec.
  */
case class SignBuckets(child: Expression, planes: Seq[Seq[Double]],
    numPlanes: Int) extends org.apache.spark.sql.catalyst.expressions
    .UnaryExpression with ExpectsInputTypes {
  require(numPlanes > 0 && numPlanes < 63 &&
    planes.nonEmpty && planes.length % numPlanes == 0,
    s"SignBuckets needs 1..62 planes per table and a whole number of " +
      s"tables, got ${planes.length} planes at $numPlanes per table")
  private lazy val flat: Array[Double] = planes.flatten.toArray
  private lazy val dim: Int = planes.head.length
  private lazy val numTables: Int = planes.length / numPlanes
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // null also arises from a dimension mismatch (the [[VectorFoldExpression]]
  // ragged-input convention)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var j = 0
      while (j < numPlanes) {
        val base = (t * numPlanes + j) * dim
        var s = 0.0
        var i = 0
        while (i < dim) { s += x.getDouble(i) * flat(base + i); i += 1 }
        if (s > 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val flatRef = ctx.addReferenceObj("planesFlat", flat, "double[]")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val bucket = ctx.freshName("bucket")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$numTables];
         |  for (int $t = 0; $t < $numTables; $t++) {
         |    long $bucket = 0L;
         |    for (int $j = 0; $j < $numPlanes; $j++) {
         |      int $base = ($t * $numPlanes + $j) * $dim;
         |      double $s = 0.0;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        $s += $v.getDouble($i) * $flatRef[$base + $i];
         |      }
         |      if ($s > 0) $bucket |= (1L << $j);
         |    }
         |    $out[$t] = $bucket;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object VectorExpressions {
  def euclid(a: Column, b: Column): Column =
    Bridge.column(EuclidDistance(
      Bridge.expression(a), Bridge.expression(b)))
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Bridge.expression(a), Bridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(
      Bridge.expression(a), Bridge.expression(b)))
  def weightedEuclid(a: Column, b: Column): Column =
    Bridge.column(WeightedEuclid(
      Bridge.expression(a), Bridge.expression(b)))
  def signBuckets(features: Column, planes: Seq[Array[Double]],
      numPlanes: Int): Column =
    Bridge.column(SignBuckets(Bridge.expression(features),
      planes.map(_.toSeq), numPlanes))

  /** SQL registration so the kernels are usable from spark.sql(...). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("euclid",
      exprs => EuclidDistance(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("weighted_euclid",
      exprs => WeightedEuclid(exprs(0), exprs(1)), "built-in")
  }
}
