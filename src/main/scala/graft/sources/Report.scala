package graft.sources

import java.text.SimpleDateFormat
import java.util.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.mopso.MopsoResult

/** Result sinks (SURVEY §2.1 S4-S6): the reference saves a single-partition
  * text report to a timestamped directory
  * (`sc.parallelize(buf,1).saveAsTextFile(out)`, Spark_MOPSO_Avg.scala:797;
  * path stamping `NowDate()`, :802-807; local PrintWriter twin
  * MOPSO_Single.scala:247-284).
  */
object Report {

  /** S6: timestamped path segment (NowDate, Spark_MOPSO_Avg.scala:802-807). */
  def nowStamp(): String =
    new SimpleDateFormat("yyyy-MM-dd-HH-mm-ss").format(new Date())

  /** Render a MOPSO result as the reference-style report lines: archive
    * shape, per-entry fitness + purity, k-means baseline
    * (Spark_MOPSO_Avg.scala:701-760 report text shape).
    */
  def renderLines(r: MopsoResult): Seq[String] = {
    val header = Seq(
      s"archive size: ${r.archive.length}",
      s"k: ${r.k}, features: ${r.numFeatures}, points: ${r.totalPoints}",
      s"elapsed sec: ${r.elapsedSec}")
    val entries = r.archive.zip(r.purities.zip(r.purityValid)).zipWithIndex
      .map { case ((e, (p, valid)), i) =>
        f"entry $i: dev=${e.fitness(0)}%.6f conn=${e.fitness(1)}%.6f " +
          f"purity=$p%.6f valid=$valid" +
          r.silhouettes.map(s => f" silhouette=${s(i)}%.6f").getOrElse("")
      }
    val baseline = Seq(
      f"kmeans baseline purity: ${r.kmeansPurity}%.6f (valid=${r.kmeansPurityValid})")
    header ++ entries.toSeq ++ baseline
  }

  /** S4: single-file text sink — `coalesce(1).write.text` (the modern
    * spelling of parallelize(buf,1).saveAsTextFile). `stamp=true` appends
    * the S6 timestamp directory like the reference's output convention.
    */
  def saveText(spark: SparkSession, lines: Seq[String], outDir: String,
      stamp: Boolean = false): String = {
    import spark.implicits._
    val path = if (stamp) s"$outDir/${nowStamp()}" else outDir
    lines.toDF("line").coalesce(1).write.mode("overwrite").text(path)
    path
  }

  def saveMopsoReport(spark: SparkSession, r: MopsoResult, outDir: String,
      stamp: Boolean = true): String =
    saveText(spark, renderLines(r), outDir, stamp)
}
