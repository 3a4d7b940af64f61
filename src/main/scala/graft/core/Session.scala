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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
