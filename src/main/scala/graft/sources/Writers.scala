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
    * then rewrite through a round-robin repartition — an even rebalance
    * with one shuffle, no skew sensitivity to the input layout. Returns
    * (files before, files after). Content is preserved row-for-row
    * (spec-checked); ordering is not, like every distributed rewrite.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
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
    spark.read.parquet(inPath)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    (nFiles, nOut)
  }
}
