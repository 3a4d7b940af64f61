package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.Tables

/** The two explicit scale techniques from the brief — salting for skewed
  * joins and bucketing for co-located joins — proven at the plan/result
  * level, not just described.
  */
class ScaleTechniquesSpec extends AnyFunSuite with SparkTestBase {

  test("salted join returns exactly the plain join's result") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .sorted.toSeq
    val salted = Skew.saltedJoin(li, o, "l_orderkey",
        saltSource = col("l_linenumber"), buckets = 8)
      .select(col("l_orderkey"), col("l_linenumber"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .sorted.toSeq
    assert(salted === plain)
  }

  test("salt values spread the hot key across buckets, deterministically") {
    val li = Tables.lineitem(spark, sfDir)
    val salts = li
      .select(pmod(xxhash64(col("l_linenumber")), lit(8)).cast("int")
        .as("salt"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(salts.size > 1) // actually spreads
    val again = li
      .select(pmod(xxhash64(col("l_linenumber")), lit(8)).cast("int")
        .as("salt"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(salts === again) // content-derived, not rand(): recompute-stable
  }

  test("approx_percentile tracks the exact percentiles within 1%") {
    // q16 documents approx_percentile (mergeable t-digest partials, no
    // per-group sort) as the 100 TB drop-in for the exact form — this
    // pins the accuracy claim on the same grouped frame
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
        .as("approx"),
        expr("percentile(l_quantity, 0.5)").as("exact"))
      .collect()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      val (a, e) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(a - e) <= 0.01 * math.max(1.0, e.abs),
        s"flag ${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("approx_count_distinct tracks exact distinct within 5%") {
    // the HLL++ production form of A2/q9-style distinct counting
    val r = Tables.orders(spark, sfDir)
      .agg(countDistinct(col("o_custkey")).as("exact"),
        approx_count_distinct(col("o_custkey")).as("approx"))
      .head()
    val (e, a) = (r.getLong(0), r.getLong(1))
    assert(math.abs(a - e).toDouble / e <= 0.05, s"approx $a vs exact $e")
  }

  test("q19's correlated scalar subquery decorrelates to aggregate + join") {
    // the documented guarantee: RewriteCorrelatedScalarSubquery turns the
    // per-row subquery into a brand-level aggregate joined back — no
    // surviving subquery node in the physical plan
    val plan = Relational.q19AboveBrandAvg(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Subquery"), s"per-row subquery survived:\n$plan")
    assert(plan.contains("HashAggregate"))
    assert(plan.contains("Join"))
  }

  test("bucketed tables join with zero shuffle exchanges") {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    val s2 = spark.newSession()
    // warehouse.dir is static — the explicit LOCATION below keeps all
    // table data under the temp dir instead
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val dbName = s"bucketdemo_${System.nanoTime()}"
    s2.sql(s"CREATE DATABASE $dbName LOCATION '$wh/$dbName'")
    s2.sql(s"USE $dbName")
    try {
      Tables.lineitem(s2, sfDir)
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_b")
      Tables.orders(s2, sfDir)
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_b")
      val joined = s2.table("li_b")
        .join(s2.table("o_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located join: the bucketing satisfies the join's distribution —
      // no ShuffleExchange feeds the SortMergeJoin. (The tree prints
      // top-down, so the join's INPUTS are the text after the join node;
      // the aggregate's exchange above it is expected.)
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.split("SortMergeJoin")(1).contains("Exchange"),
        s"join inputs should be exchange-free:\n$plan")
      // and it still computes the right answer
      val n = joined.agg(sum(col("n"))).head().getLong(0)
      assert(n === Tables.lineitem(s2, sfDir).count())
    } finally {
      s2.sql(s"DROP DATABASE IF EXISTS $dbName CASCADE")
    }
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    // Spark's runtime-filter optimizer injects a bloom filter built from
    // the FILTERED build side into the probe side's scan — probe rows
    // whose join key cannot match die at the scan, before the shuffle.
    // At 100 TB this is the difference between shuffling all of lineitem
    // and shuffling only the lines of high-priority orders. Production
    // thresholds (10 GB probe scan) are sized for clusters; lowering
    // them here shows the PLAN the optimizer produces at scale.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "100MB")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter." +
      "applicationSideScanSizeThreshold", "0")
    val li = Tables.lineitem(s2, sfDir)
    val sel = Tables.orders(s2, sfDir)
      .where(col("o_orderpriority") === "1-URGENT")
    val joined = li.join(sel, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") &&
      plan.contains("bloom_filter_agg"),
      s"runtime bloom filter not injected:\n$plan")
    // the filter is pruning-only — the result matches the plain session
    val want = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
        .where(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.head().getLong(0) === want && want > 0)
  }
}
