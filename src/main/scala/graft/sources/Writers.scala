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
    *
    * The day key is the UTC day of the instant, computed by epoch-day
    * arithmetic (timestamp→long is the UTC epoch second, so the layout is
    * identical under any `spark.sql.session.timeZone` — `date_format`
    * would render the session-local day and reshuffle the directory
    * layout across differently-configured writers).
    */
  def writeEventsByDay(events: DataFrame, outPath: String,
      maxRecordsPerFile: Long = 5000000L): Unit =
    events
      .withColumn("day",
        date_add(lit(java.sql.Date.valueOf("1970-01-01")),
          floor(col("ts").cast("long") / 86400L).cast("int"))
          .cast("string"))
      .write
      .partitionBy("day")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(SaveMode.Overwrite)
      .parquet(outPath)

  /** Sort-on-write layout: range-partition rows by `sortCol` into
    * `numFiles` files, each sorted within, so every parquet row group
    * carries TIGHT min/max stats on the key. A range predicate on that
    * key then skips whole row groups inside the reader — the scan emits
    * ~only the matching rows — where an unsorted layout leaves every row
    * group's [min,max] spanning the full domain and the scan emits
    * everything for the residual Filter to discard. SinksSpec measures
    * the difference on the scan's own numOutputRows metric.
    *
    * This is the other half of the layout story next to
    * [[writeEventsByDay]]: directory partitioning prunes at FILE
    * granularity on the partition key (coarse, free at planning); sorted
    * row groups prune at PAGE/ROW-GROUP granularity on any stats-typed
    * column (fine, free at read). At 100 TB both compose: partition by
    * day, sort within by the hot range key, and a time-ranged scan reads
    * a sliver of one directory. Cost: one range exchange at write time —
    * paid once, saved on every read.
    */
  def writeSortedBy(df: DataFrame, outPath: String, sortCol: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode(SaveMode.Overwrite).parquet(outPath)

  /** Compact a parquet dataset into ~`targetFileBytes`-sized files:
    * plan file count from the CURRENT on-disk size (ceil(bytes/target)),
    * then rewrite through one shuffle. Returns (files before, files
    * actually written) — counted on disk after the rewrite, so the second
    * number is meaningful in both modes (unpartitioned: ≈ planned
    * partitions; partitioned: one file per partition directory per task
    * that holds its rows). Content is preserved row-for-row
    * (spec-checked); ordering is not, like every distributed rewrite.
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
    val hconf = spark.sparkContext.hadoopConfiguration
    val inFs = new Path(inPath).getFileSystem(hconf)
    val outFs = new Path(outPath).getFileSystem(hconf)
    // compare fully-qualified paths so equivalent spellings of the same
    // location ('file:///x' vs '/x', trailing slash) hit the require, not
    // Spark's less friendly cannot-overwrite-input failure downstream
    val qIn = inFs.makeQualified(new Path(inPath))
    val qOut = outFs.makeQualified(new Path(outPath))
    require(qIn != qOut,
      "compact writes to a fresh path (in-place overwrite of the input " +
        "is not atomic); compact to a sibling directory and swap")
    def countParquet(fs: org.apache.hadoop.fs.FileSystem, p: Path): (Int, Long) = {
      val files = fs.listFiles(p, true)
      var n = 0
      var bytes = 0L
      while (files.hasNext) {
        val f = files.next()
        if (f.getPath.getName.endsWith(".parquet")) { n += 1; bytes += f.getLen }
      }
      (n, bytes)
    }
    val (nFiles, totalBytes) = countParquet(inFs, qIn)
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inPath)
    val writer =
      (if (partitionCols.isEmpty) df.repartition(nOut)
       else df.repartition(nOut, partitionCols.map(col): _*))
        .write.mode(SaveMode.Overwrite)
    (if (partitionCols.isEmpty) writer
     else writer.partitionBy(partitionCols: _*)).parquet(outPath)
    (nFiles, countParquet(outFs, qOut)._1)
  }
}
