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
      // cms_estimate resolves and over-counts never under-counts
      val cms = org.apache.spark.util.sketch.CountMinSketch.create(
        0.01, 0.99, 42)
      Seq("a", "a", "b").foreach(t => cms.addBinary(t.getBytes("UTF-8")))
      val bos = new java.io.ByteArrayOutputStream()
      cms.writeTo(bos)
      s2.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row("a"),
          org.apache.spark.sql.Row("b"), org.apache.spark.sql.Row("zz")),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("tok",
            org.apache.spark.sql.types.StringType))))
        .createOrReplaceTempView("cms_toks")
      val hex = bos.toByteArray.map("%02X".format(_)).mkString
      val ests = s2.sql(
        s"SELECT tok, cms_estimate(X'$hex', tok) AS est FROM cms_toks")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(ests("a") >= 2 && ests("b") >= 1 && ests("zz") >= 0)
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
