package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for tests and standalone drivers.
  *
  * Config is sized for the harness's `local[32]` single-JVM mode but every
  * choice also holds on a real cluster: shuffle partitions sized to cores
  * (not the 200 default), AQE on (runtime coalesce + skew-join splitting),
  * UTC so timestamp semantics match the DuckDB oracle.
  */
object GraftSession {
  def local(appName: String = "graft", cores: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ObjectHashAggregateExec falls back to SORT-based aggregation once
      // a task holds this many distinct keys. The 128 default predates
      // bounded-state aggregates: it makes any TypedImperativeAggregate
      // over more than 128 groups per task (c19's per-point TopKByKey,
      // percentile_approx in q16b) sort its ENTIRE input stream — 2× on
      // c19 at 20k points (44s → 22s at ScaleBench x10). 2M keeps the
      // spill valve (a task still falls back before holding millions of
      // buffers) while letting small-state aggregates stay hash-based.
      // Engine-wide convention, documented here rather than mutated
      // per-query (review r6: a hidden 10M set in one query builder
      // removed the memory guard for every later query in the session).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 21).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
