package graft

import org.apache.spark.sql.functions._

/** Scratch measurement driver for optimization round 21: per-phase
  * timings of the expensive bench rows (build rows return phase maps;
  * query rows get split by hand here). Not part of the bench contract.
  * Usage: runMain graft.Probe21 [mode...]
  */
object Probe21 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("graft-probe21", 32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val modes = if (args.nonEmpty) args.toSet else Set("s14build", "s9build", "s13")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[probe21] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }

    if (modes("s14build")) {
      // warmup then timed, like the bench
      (1 to 2).foreach { i =>
        graft.operators.Clustering.invalidateKnnGraphIndex(dir)
        val t0 = System.nanoTime()
        val phases = graft.operators.Clustering.writeKnnGraphIndex(spark, dir,
          s"${graft.functions.Similarity.artifactRoot(dir)}/s14_graph_full")
        val tot = (System.nanoTime() - t0) / 1e9
        println(f"[probe21] s14_index_build pass$i total=$tot%.2f s")
        phases.foreach { case (n, v) => println(f"[probe21]   $n%-28s $v%.3f") }
      }
    }

    if (modes("s9build")) {
      (1 to 2).foreach { i =>
        graft.functions.Similarity.invalidateIvfAdcBuild(dir)
        timed(s"s9_index_build pass$i") {
          graft.functions.Similarity.writeIvfAdcIndex(spark, dir,
            s"${graft.functions.Similarity.artifactRoot(dir)}/ivfadc")
        }
      }
    }

    if (modes("s13")) {
      (1 to 2).foreach { i =>
        val (graph, orphans) = graft.operators.Clustering.cappedGraphAt(
          spark, dir, graft.operators.Clustering.LshPlanes,
          graft.operators.Clustering.LshTables,
          graft.operators.Clustering.GraphBuildCap)
        timed(s"s13 chain pass$i") {
          graph.write.format("noop").mode("overwrite").save()
        }
        timed(s"s13 full pass$i") {
          graft.operators.Clustering.s13GraphClusters(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }

    if (modes("trend")) {
      (1 to 8).foreach { i =>
        val t0 = System.nanoTime()
        graft.operators.Clustering.c21ConnLsh(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val info = spark.sparkContext.getRDDStorageInfo
        val mem = info.map(_.memSize).sum / 1e6
        val rt = Runtime.getRuntime
        println(f"[probe21] c21 pass$i: $dt%.2f s  cachedRdds=${info.length} " +
          f"cachedMB=$mem%.0f heapUsedMB=${(rt.totalMemory - rt.freeMemory) / 1e6}%.0f")
      }
    }

    if (modes("q22")) {
      (1 to 3).foreach { i =>
        timed(s"q22 pass$i") {
          graft.operators.Relational.q22ApproxDistinct(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
