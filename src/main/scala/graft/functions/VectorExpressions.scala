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
