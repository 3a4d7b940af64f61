package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The extensions class must inject the vector kernels into a session
  * built with `withExtensions` (same SparkContext, fresh session state).
  */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("withExtensions session resolves euclid/cosine_sim in SQL") {
    spark.sparkContext // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = s2.sql(
        "SELECT euclid(array(0.0d,0.0d), array(3.0d,4.0d)) AS d, " +
          "dot_product(array(1.0d,2.0d), array(3.0d,4.0d)) AS p, " +
          "cosine_sim(array(1.0d,0.0d), array(0.0d,1.0d)) AS c").head()
      assert(row.getDouble(0) === 5.0)
      assert(row.getDouble(1) === 11.0)
      assert(math.abs(row.getDouble(2)) < 1e-12)
      // the bounded top-k aggregate resolves in SQL too
      val topk = s2.sql(
        "SELECT top_k_by_key(k, v, 2) AS t FROM VALUES " +
          "(3.0d, 30L), (1.0d, 10L), (2.0d, 20L) AS tab(k, v)")
        .head().getSeq[Long](0)
      assert(topk === Seq(10L, 20L))
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
