package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded top-k aggregate (SURVEY §4's optional Catalyst upgrade): keeps
  * the k smallest (key, value) pairs by `key` (any orderable Catalyst type
  * — structs order lexicographically, so `struct(dist, id)` gives
  * deterministic distance-then-id ranking) and evaluates to the values
  * sorted ascending by key.
  *
  * Why an imperative aggregate and not a window: `row_number() OVER
  * (PARTITION BY q ORDER BY dist)` must shuffle and sort EVERY candidate
  * row (n² rows for an all-pairs ranking); this aggregate's partial state
  * is k-bounded, so map-side combine reduces the shuffle to k rows per
  * group per mapper — the difference between O(n²) and O(n·k) network for
  * exact KNN-style queries (c19, the distributed global-Conn build).
  */
case class TopKByKey(
    key: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Any, Any)]] {

  require(k > 0, "top_k_by_key requires k > 0")

  override def children: Seq[Expression] = Seq(key, value)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(value.dataType, containsNull = value.nullable)

  @transient private lazy val keyOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(key.dataType)
  @transient private lazy val pairOrdering: Ordering[(Any, Any)] =
    Ordering.by[(Any, Any), Any](_._1)(keyOrdering)

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Any, Any)] =
    mutable.ArrayBuffer.empty

  // The buffer is a size-k binary MAX-heap by key (root = current worst
  // survivor). Once full, each candidate costs exactly ONE key comparison
  // against the root, and `InternalRow.copyValue` — the per-row
  // allocation that dominated the flat-buffer + periodic-sort version —
  // runs only for candidates that actually displace a survivor (O(k log n)
  // of them in expectation under random arrival order, not O(n)).

  private def siftUp(buf: mutable.ArrayBuffer[(Any, Any)], start: Int): Unit = {
    var i = start
    while (i > 0) {
      val parent = (i - 1) / 2
      if (keyOrdering.compare(buf(i)._1, buf(parent)._1) > 0) {
        val t = buf(i); buf(i) = buf(parent); buf(parent) = t
        i = parent
      } else return
    }
  }

  private def siftDown(buf: mutable.ArrayBuffer[(Any, Any)], start: Int): Unit = {
    val n = buf.length
    var i = start
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var largest = i
      if (l < n && keyOrdering.compare(buf(l)._1, buf(largest)._1) > 0) largest = l
      if (r < n && keyOrdering.compare(buf(r)._1, buf(largest)._1) > 0) largest = r
      if (largest == i) return
      val t = buf(i); buf(i) = buf(largest); buf(largest) = t
      i = largest
    }
  }

  /** Offer an ALREADY-COPIED pair (merge path / deserialized state). */
  private def offerOwned(buf: mutable.ArrayBuffer[(Any, Any)],
      pair: (Any, Any)): Unit =
    if (buf.length < k) {
      buf += pair
      siftUp(buf, buf.length - 1)
    } else if (keyOrdering.compare(pair._1, buf(0)._1) < 0) {
      buf(0) = pair
      siftDown(buf, 0)
    }

  override def update(buf: mutable.ArrayBuffer[(Any, Any)],
      input: InternalRow): mutable.ArrayBuffer[(Any, Any)] = {
    val kv = key.eval(input)
    if (kv != null) { // null keys are unrankable — dropped, like ORDER BY LIMIT
      if (buf.length < k) {
        // eval results may alias reused row buffers — copy before storing
        buf += ((InternalRow.copyValue(kv),
          InternalRow.copyValue(value.eval(input))))
        siftUp(buf, buf.length - 1)
      } else if (keyOrdering.compare(kv, buf(0)._1) < 0) {
        // compare BEFORE copying: rejected candidates (the vast majority
        // of an all-pairs stream) never allocate
        buf(0) = ((InternalRow.copyValue(kv),
          InternalRow.copyValue(value.eval(input))))
        siftDown(buf, 0)
      }
    }
    buf
  }

  override def merge(b1: mutable.ArrayBuffer[(Any, Any)],
      b2: mutable.ArrayBuffer[(Any, Any)]): mutable.ArrayBuffer[(Any, Any)] = {
    b2.foreach(offerOwned(b1, _))
    b1
  }

  override def eval(buf: mutable.ArrayBuffer[(Any, Any)]): Any = {
    buf.sortInPlace()(pairOrdering)
    new GenericArrayData(buf.map(_._2).toArray)
  }

  // partial-aggregate state crosses the wire as length-prefixed UnsafeRows
  // of (key, value)
  @transient private lazy val pairProjection =
    UnsafeProjection.create(Array(key.dataType, value.dataType))

  override def serialize(buf: mutable.ArrayBuffer[(Any, Any)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    val row = new GenericInternalRow(2)
    buf.foreach { case (kv, vv) =>
      row.update(0, kv)
      row.update(1, vv)
      val u = pairProjection(row)
      out.writeInt(u.getSizeInBytes)
      out.write(u.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Any, Any)] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new mutable.ArrayBuffer[(Any, Any)](n)
    var i = 0
    while (i < n) {
      val len = in.getInt
      val rowBytes = new Array[Byte](len)
      in.get(rowBytes)
      val u = new UnsafeRow(2)
      u.pointTo(rowBytes, len)
      buf += ((InternalRow.copyValue(u.get(0, key.dataType)),
        InternalRow.copyValue(u.get(1, value.dataType))))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), value = newChildren(1))
}

object TopKAggregate {
  /** `top_k_by_key(key, value, k)` as a DataFrame aggregate Column. */
  def topKByKey(key: Column, value: Column, k: Int): Column =
    Bridge.column(
      TopKByKey(Bridge.expression(key), Bridge.expression(value), k)
        .toAggregateExpression())
}
