package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection utility: prints the formatted physical plan for the
  * named queries (or a representative default set) against sf0.001.
  * Usage: runMain graft.Explain [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("graft-explain", 8)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q3_revenue_by_nation",
        "q4_ship_filter_agg", "q19_above_brand_avg", "c1_assign",
        "c9_knn", "c19_conn_topk", "d3_lsh_pairs", "e5_asof_attribution",
        "s3_ann_ivf", "e6_range_campaigns", "d8_simhash_pairs",
        "t9_heavy_hitters")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
