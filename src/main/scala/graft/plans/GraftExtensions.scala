package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineSimilarity, CountMinEstimate, DotProduct, EuclidDistance, TopKByKey, WeightedEuclid}

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
    // aggregate builders return the AggregateFunction; the analyzer wraps
    // it in an AggregateExpression like any built-in aggregate
    ext.injectFunction((
      FunctionIdentifier("top_k_by_key"),
      info(classOf[TopKByKey], "top_k_by_key",
        "top_k_by_key(key, value, k) - values of the k smallest keys, " +
          "ascending; k must be an integer literal."),
      (exprs: Seq[Expression]) => exprs(2) match {
        case Literal(k: Int, IntegerType) => TopKByKey(exprs(0), exprs(1), k)
        case other => throw new IllegalArgumentException(
          s"top_k_by_key: k must be an integer literal, got $other")
      }))
    ext.injectFunction((
      FunctionIdentifier("cms_estimate"),
      info(classOf[CountMinEstimate], "cms_estimate",
        "cms_estimate(sketch, key) - Count-Min point-frequency estimate " +
          "of a string key; sketch must be a binary literal."),
      (exprs: Seq[Expression]) => CountMinEstimate(exprs(0), exprs(1))))
  }
}
