package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Clustering

/** TopKByKey is a TypedImperativeAggregate, so its partial-aggregate
  * merge and UnsafeRow-bytes serde only run under multi-partition
  * aggregation — this spec drives both the real engine path (16-partition
  * ObjectHashAggregate vs a window-function oracle) and the serde/merge
  * methods directly, plus the c19 == c10 cross-algorithm equality the
  * aggregate exists for.
  */
class TopKAggregateSpec extends AnyFunSuite with SparkTestBase {

  test("multi-partition topKByKey == window row_number ranking") {
    // deterministic pseudo-random keys; struct(k, v) ranking key breaks
    // collisions by v, mirroring the window's ORDER BY k, v
    val df = spark.range(2000).select(
      (col("id") % 7).as("g"),
      pmod(col("id") * 2654435761L, lit(100003L)).cast("double").as("k"),
      col("id").as("v"))
      .repartition(16) // forces partial buffers + serde + merge
    val agged = df.groupBy(col("g"))
      .agg(TopKAggregate.topKByKey(struct(col("k"), col("v")), col("v"), 5)
        .as("top"))
    // the bounded-state aggregate must actually plan as ObjectHashAggregate
    // (partial + final), not fall back to sort-based aggregation
    assert(agged.queryExecution.executedPlan.toString
      .contains("ObjectHashAggregate"))
    val got = agged
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "v")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("g")).orderBy(col("k"), col("v"))
    val want = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .collect().map(r => (r.getLong(0), r.getInt(3) - 1, r.getLong(2))).toSet
    assert(got === want)
  }

  test("serialize/deserialize round-trips and merge respects the bound") {
    val agg = TopKByKey(
      BoundReference(0, DoubleType, nullable = true),
      BoundReference(1, LongType, nullable = true), k = 3)
    val b1 = agg.createAggregationBuffer()
    Seq((5.0, 50L), (1.0, 10L), (3.0, 30L), (2.0, 20L), (4.0, 40L))
      .foreach { case (k, v) => agg.update(b1, InternalRow(k, v)) }
    // wire round-trip of the partial state
    val restored = agg.deserialize(agg.serialize(b1))
    assert(restored.toSet === b1.toSet)
    val b2 = agg.createAggregationBuffer()
    Seq((0.5, 5L), (2.5, 25L), (9.0, 90L))
      .foreach { case (k, v) => agg.update(b2, InternalRow(k, v)) }
    val merged = agg.merge(restored, b2)
    val out = agg.eval(merged).asInstanceOf[ArrayData].toLongArray()
    // 3 smallest keys across both buffers: 0.5 → 5, 1.0 → 10, 2.0 → 20
    assert(out.toSeq === Seq(5L, 10L, 20L))
    // null ranking keys are dropped, not ranked
    val b3 = agg.createAggregationBuffer()
    agg.update(b3, InternalRow(null, 99L))
    assert(b3.isEmpty)
  }

  test("c19 bounded-aggregate Conn == c10 window Conn on the fixture") {
    val c19 = Clustering.c19ConnTopk(spark, sfDir).head().getDouble(0)
    val c10 = Clustering.c10Conn(spark, sfDir).head().getDouble(0)
    assert(c19 === c10)
  }
}
