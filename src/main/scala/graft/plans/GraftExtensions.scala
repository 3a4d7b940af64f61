package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, EuclidDistance, WeightedEuclid}

/** SparkSessionExtensions entry point: registers the engine's native
  * vector kernels as SQL functions at session build time —
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)`). The per-session
  * alternative is `VectorExpressions.register(spark)`. No custom
  * Rule/Strategy is injected — SURVEY §4: Spark's planner covers every
  * plan shape the engine needs; the function surface is the only
  * extension point that pays.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("euclid"),
      info(classOf[EuclidDistance], "euclid",
        "euclid(a, b) - Euclidean distance of two double arrays."),
      (exprs: Seq[Expression]) => EuclidDistance(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info(classOf[DotProduct], "dot_product",
        "dot_product(a, b) - dot product of two double arrays."),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info(classOf[CosineSimilarity], "cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two double arrays."),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("weighted_euclid"),
      info(classOf[WeightedEuclid], "weighted_euclid",
        "weighted_euclid(a, b) - Euclidean distance weighted by a/sum(a)."),
      (exprs: Seq[Expression]) => WeightedEuclid(exprs(0), exprs(1))))
  }
}
