package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the driver-generated star schema (TESTDATA.md) plus the
  * reference's own labeled-CSV convention
  * (parser at Spark_MOPSO_Avg.scala:1191-1236).
  *
  * All readers return plain DataFrames so Catalyst sees a declarative scan:
  * column pruning and predicate pushdown reach the parquet reader for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to map
    * to TimestampType (PARQUET_TYPE_ILLEGAL). Read it as raw nanos via the
    * legacy conf and convert to a (µs) timestamp explicitly — integer
    * `div`, not `/`, because ns epoch values exceed double's 2^53 exact
    * range. Session TZ is UTC so the wall-clock matches the naive ns
    * timestamps DuckDB sees.
    *
    * NOTE this sets `nanosAsLong` for the SESSION (an engine-wide
    * convention, deliberately not restored: the conf is consulted lazily
    * at scan planning, so a set/restore around the read would be a race;
    * any other NANOS source in the session reads as LongType and must
    * convert the same way).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }

  /** Normalizes the `ts` column to TimestampType whatever the parquet
    * writer produced — raw nanos-as-long (TIMESTAMP(NANOS) under the
    * legacy conf), TIMESTAMP_NTZ (µs without isAdjustedToUTC), or already
    * TIMESTAMP. Session TZ is UTC, so the naive→instant cast is the
    * identity on the wall-clock DuckDB sees. Shared by the batch accessor
    * and the streaming file source (same schema, same conversion).
    */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")

  /** Embeddings with the float vector upcast to array<double> — the engine's
    * canonical `features` representation (SURVEY §7.4.7: array<double>, not
    * VectorUDT, so columns stay SQL-composable and oracle-checkable).
    */
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
      .withColumn("features", col("embedding").cast(ArrayType(DoubleType)))

  /** Labeled points in the engine's canonical schema, derived from the
    * embeddings fixture: (id, features: array<double>, label: int).
    */
  def labeledPoints(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(
      col("vec_id").as("id"), col("features"), col("label"))

  /** Reference-convention CSV reader (P1, Spark_MOPSO_Avg.scala:1191-1236):
    * headerless all-numeric CSV, last column = integer class label.
    * `labelStartWithZero=true` declares the FILE's labels 0-based and
    * shifts them up by one to the engine's 1-based convention
    * (:1217-1220); with `false` the labels are taken as already 1-based.
    * `labeled=false` parses every column as a feature with label 0
    * (:1224-1235); `header=true` drops the first line (:1199-1202).
    */
  def labeledCsv(
      spark: SparkSession,
      path: String,
      labeled: Boolean = true,
      labelStartWithZero: Boolean = true,
      header: Boolean = false): DataFrame = {
    val raw = spark.read
      .option("header", header.toString)
      .option("inferSchema", "false")
      .csv(path)
    val cols = raw.columns
    if (labeled) {
      val featureCols = cols.dropRight(1).map(c => col(c).cast(DoubleType))
      val shift = if (labelStartWithZero) 1 else 0
      raw.select(
        array(featureCols.toIndexedSeq: _*).as("features"),
        (col(cols.last).cast(IntegerType) + lit(shift)).as("label"))
    } else {
      raw.na.drop("all")
        .select(
          array(cols.toIndexedSeq.map(c => col(c).cast(DoubleType)): _*)
            .as("features"),
          lit(0).as("label"))
    }
  }
}
