package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Production parquet sinks for the pipeline surface: date-partitioned
  * layout and small-file compaction.
  *
  * At 100 TB the write side decides the read side's fate: a
  * date-partitioned layout gives every downstream time-ranged query
  * partition pruning for free, and compaction fixes the small-file
  * problem (a streaming or highly-parallel writer leaves thousands of
  * KB-sized files whose per-file open/footer cost dominates scans; the
  * fix is a periodic rewrite into size-targeted files). Both are plain
  * DataFrame writers — no driver-side data movement.
  */
object Writers {

  /** Write `events`-shaped data partitioned by event day
    * (`day=YYYY-MM-DD/` directories). Readers filtering on `day` prune
    * whole directories before any IO (PartitionFilters in the scan plan,
    * verified in SinksSpec); `maxRecordsPerFile` caps runaway files
    * inside a hot partition.
    */
  def writeEventsByDay(events: DataFrame, outPath: String,
      maxRecordsPerFile: Long = 5000000L): Unit =
    events
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write
      .partitionBy("day")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(SaveMode.Overwrite)
      .parquet(outPath)

  /** Compact a parquet dataset into ~`targetFileBytes`-sized files:
    * plan file count from the CURRENT on-disk size (ceil(bytes/target)),
    * then rewrite through one shuffle. Returns (files before, planned
    * output partitions). Content is preserved row-for-row (spec-checked);
    * ordering is not, like every distributed rewrite.
    *
    * `partitionCols` preserves a partitioned layout (e.g. the `day=`
    * directories [[writeEventsByDay]] lays down): rows repartition BY the
    * partition columns so each directory's rows land in few tasks, and
    * the rewrite keeps the directory structure — without it a compaction
    * pass would flatten the layout and take directory pruning away from
    * every downstream reader. A partition directory is the compaction
    * quantum in that mode (never less than one file per directory).
    *
    * Writes to a FRESH path, by contract: in-place compaction is not
    * atomic on a plain filesystem (Spark refuses to overwrite a path it
    * is reading). Periodic jobs should compact to a sibling path and
    * swap; the require makes that contract loud instead of a confusing
    * runtime AnalysisException.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      partitionCols: Seq[String] = Nil): (Int, Int) = {
    require(new Path(inPath) != new Path(outPath),
      "compact writes to a fresh path (in-place overwrite of the input " +
        "is not atomic); compact to a sibling directory and swap")
    val fs = new Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listFiles(new Path(inPath), true)
    var nFiles = 0
    var totalBytes = 0L
    while (files.hasNext) {
      val f = files.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        nFiles += 1
        totalBytes += f.getLen
      }
    }
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inPath)
    val writer =
      (if (partitionCols.isEmpty) df.repartition(nOut)
       else df.repartition(nOut, partitionCols.map(col): _*))
        .write.mode(SaveMode.Overwrite)
    (if (partitionCols.isEmpty) writer
     else writer.partitionBy(partitionCols: _*)).parquet(outPath)
    (nFiles, nOut)
  }
}
