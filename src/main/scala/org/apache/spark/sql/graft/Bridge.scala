package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the Column-from-Expression
  * constructor path `private[sql]` (Column now wraps a ColumnNode); this
  * shim lives under the org.apache.spark.sql package purely to re-export
  * that capability to the engine's custom Catalyst expressions — the
  * standard extension-library pattern for this API gap.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Drain the listener bus (private[spark]) — ScaleBench's per-phase
    * shuffle-byte accounting reads listener-accumulated task metrics
    * right after an action returns, when end-of-task events may still
    * be queued; without the drain the recorded bytes undercount by
    * whatever the bus hadn't delivered yet.
    */
  def drainListenerBus(sc: org.apache.spark.SparkContext,
      timeoutMillis: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }

  /** Lineage truncation for iterative loops: persist the frame's
    * INTERNAL (UnsafeRow) rows and wrap them in a fresh LogicalRDD leaf
    * with DEFAULT statistics. This is what `Dataset.localCheckpoint`
    * does minus two things the closure loop cannot afford:
    *  - no origin-stats rewrite (Spark 4's `LogicalRDD.fromDataset`
    *    pins the origin plan's size estimate, and a per-round join's
    *    size-only estimate is a PRODUCT of its children — each round
    *    then multiplies the previous round's pinned estimate until the
    *    BigInteger digit count overflows; see the closure's note), and
    *  - no InternalRow → external Row → InternalRow double conversion
    *    (the old `df.rdd` + `createDataFrame` detour paid a full
    *    per-field boxing pass and a RowEncoder pass per round — pure
    *    serialization overhead at corpus-sized label frames).
    * Rows are copied before caching (toRdd reuses row buffers), matching
    * localCheckpoint's own contract. Returns the wrapped frame and the
    * persisted RDD so the caller controls unpersist timing.
    */
  def cachedLineageCut(df: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.rdd.RDD[_]) = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val session = ds.sparkSession
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val plan = org.apache.spark.sql.execution.LogicalRDD(
      ds.queryExecution.analyzed.output, rdd)(session)
    (org.apache.spark.sql.classic.Dataset.ofRows(session, plan), rdd)
  }
}
