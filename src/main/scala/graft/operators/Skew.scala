package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (builder brief: "salting for skew"; AQE's
  * skew-join split handles sort-merge joins adaptively, but a hot key in a
  * shuffled equi-join can still pin one task — salting splits it
  * deterministically).
  *
  * Shape: the skewed (probe) side gets a deterministic pseudo-random salt
  * in [0, buckets) derived from row content via xxhash64 — NOT rand(),
  * so retried tasks recompute identical salts and the join stays
  * fault-tolerant-deterministic. The build side is exploded `buckets`
  * times so every (key, salt) pair finds its match. Join key becomes
  * (key, salt) — the hot key's rows spread over `buckets` tasks.
  *
  * Cost: build side inflates ×buckets — use when the build side is small
  * relative to the hot key's row count (the usual case: a dimension-ish
  * side against a heavily skewed fact).
  */
object Skew {

  /** Inner equi-join with a salted key. `saltSource` should reference
    * probe-side columns that vary within the hot key (e.g. a row id) so
    * the salt actually spreads.
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      saltSource: Column,
      buckets: Int = 16): DataFrame = {
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(buckets)).cast("int"))
    val exploded = build.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
