package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection utility: prints the formatted physical plan for the
  * named queries against sf0.001 — by default EVERY registered query
  * except the trainer-loop ones (m1 full MOPSO, t4b/t4c BPE: their plan
  * of record is the per-iteration job, and building them spins the whole
  * loop), so the default list self-maintains as the surface grows
  * (VERDICT r7 residual nit).
  * Usage: runMain graft.Explain [queryName... | prefix like 'q' 'mm']
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("graft-explain", 8)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val all = SparkEntry.queries.keys.toSeq.sorted
    val iterative = Set("m1_mopso_archive", "t4b_bpe_merges", "t4c_bpe_apply")
    val names =
      if (args.nonEmpty)
        args.toSeq.flatMap(a =>
          if (all.contains(a)) Seq(a)
          else all.filter(_.startsWith(a)))
      else all.filterNot(iterative)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
