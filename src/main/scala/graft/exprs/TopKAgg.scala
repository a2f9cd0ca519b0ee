package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded per-group top-k as a Catalyst TypedImperativeAggregate: keeps
  * the `k` smallest `(ord, tie)` pairs per group with an arbitrary
  * `payload` value attached, returned as an array sorted ascending.
  *
  * Why an aggregate when `row_number() OVER (...) <= k` exists — measured
  * honestly: Spark 3.5+ already plans that filter as a partial
  * `WindowGroupLimit` BELOW the exchange, so the batch window form's
  * shuffle is equally bounded (the r9 soak A/B measured both flat at
  * O(groups·k) bytes). What the aggregate adds:
  *  - **streaming**: window functions are unsupported on streaming
  *    Datasets; this aggregate runs in a streaming groupBy with state
  *    bounded at groups·k forever (gate `q_stream_topk`) — per-group
  *    top-k over a stream is otherwise inexpressible.
  *  - **single-pass composability**: rides one hash aggregation next to
  *    counts/sums over the same groupBy (the window form needs a second
  *    shuffle+join to combine).
  *  - a size-k heap per group (O(n log k), no sort buffer) where the
  *    WindowGroupLimit partial mode sorts each map partition
  *    (O(n log n)); and unlike `collect_list`-then-`slice`, the buffer
  *    can never grow past k (a billion-row group OOMs collect_list's).
  *
  * Determinism contract (same as the window form it replaces): `(ord,
  * tie)` must be a total order over the rows the caller cares to
  * distinguish — rows that compare equal on both keep an arbitrary
  * representative when they straddle the k boundary, exactly like
  * `row_number` with a non-unique ORDER BY. Rows with null `ord` are
  * ignored; a null `tie` sorts as the empty string.
  */
case class TopKAgg(ord: Expression, tie: Expression, payload: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[TopKAgg.Entry]] {

  require(k >= 1, s"top-k needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(ord, tie, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(payload.dataType, containsNull = payload.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"top_k ord must be BIGINT, got ${ord.dataType.sql}")
    else if (tie.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"top_k tie must be STRING, got ${tie.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  // serialize payload values through a single-field UnsafeRow: works for
  // any payload type (struct/array/atomic), gives stable bytes for the
  // partial-buffer exchange, and copy() detaches from reused input buffers
  @transient private lazy val payloadProj = UnsafeProjection.create(Array(payload.dataType))
  @transient private lazy val scratchRow = new GenericInternalRow(1)

  override def createAggregationBuffer(): java.util.PriorityQueue[TopKAgg.Entry] =
    new java.util.PriorityQueue[TopKAgg.Entry](math.min(k, 16), TopKAgg.maxFirst)

  private def offer(q: java.util.PriorityQueue[TopKAgg.Entry], e: TopKAgg.Entry): Unit =
    if (q.size < k) q.offer(e)
    else {
      val worst = q.peek()
      if (TopKAgg.ascending.compare(e, worst) < 0) { q.poll(); q.offer(e) }
    }

  override def update(q: java.util.PriorityQueue[TopKAgg.Entry],
                      input: InternalRow): java.util.PriorityQueue[TopKAgg.Entry] = {
    val o = ord.eval(input)
    if (o != null) {
      val ordL = o.asInstanceOf[Long]
      val tieV0 = tie.eval(input).asInstanceOf[UTF8String]
      val tieV = if (tieV0 == null) UTF8String.EMPTY_UTF8 else tieV0
      // cheap reject on the (possibly buffer-backed) tie BEFORE paying any
      // copy: once a heap is full, rejection is the overwhelmingly common
      // case, and it needs no allocation at all
      if (q.size < k || TopKAgg.lt(ordL, tieV, q.peek())) {
        scratchRow.update(0, payload.eval(input))
        offer(q, TopKAgg.Entry(ordL, tieV.clone(), payloadProj(scratchRow).copy()))
      }
    }
    q
  }

  override def merge(a: java.util.PriorityQueue[TopKAgg.Entry],
                     b: java.util.PriorityQueue[TopKAgg.Entry]): java.util.PriorityQueue[TopKAgg.Entry] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(q: java.util.PriorityQueue[TopKAgg.Entry]): Any = {
    val arr = q.toArray(new Array[TopKAgg.Entry](q.size))
    java.util.Arrays.sort(arr, TopKAgg.ascending)
    new GenericArrayData(arr.map(_.row.get(0, payload.dataType)))
  }

  override def serialize(q: java.util.PriorityQueue[TopKAgg.Entry]): Array[Byte] = {
    var n = 4
    val it0 = q.iterator()
    while (it0.hasNext) { val e = it0.next(); n += 8 + 4 + e.tie.numBytes() + 4 + e.row.getSizeInBytes }
    val bb = java.nio.ByteBuffer.allocate(n)
    bb.putInt(q.size)
    val it = q.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.ordL)
      val tb = e.tie.getBytes
      bb.putInt(tb.length); bb.put(tb)
      val rb = e.row.getBytes
      bb.putInt(rb.length); bb.put(rb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[TopKAgg.Entry] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val size = bb.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < size) {
      val ordL = bb.getLong
      val tb = new Array[Byte](bb.getInt); bb.get(tb)
      val rb = new Array[Byte](bb.getInt); bb.get(rb)
      val row = new UnsafeRow(1)
      row.pointTo(rb, rb.length)
      q.offer(TopKAgg.Entry(ordL, UTF8String.fromBytes(tb), row))
      i += 1
    }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(ord = newChildren(0), tie = newChildren(1), payload = newChildren(2))
}

object TopKAgg {
  final case class Entry(ordL: Long, tie: UTF8String, row: UnsafeRow)

  /** ascending (ord, tie) — the keep-order */
  val ascending: java.util.Comparator[Entry] = new java.util.Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Long.compare(a.ordL, b.ordL)
      if (c != 0) c else a.tie.compareTo(b.tie)
    }
  }
  /** max-first heap order: peek() is the worst retained entry */
  val maxFirst: java.util.Comparator[Entry] = ascending.reversed()

  private[exprs] def lt(ordL: Long, tie: UTF8String, worst: Entry): Boolean = {
    val c = java.lang.Long.compare(ordL, worst.ordL)
    c < 0 || (c == 0 && tie.compareTo(worst.tie) < 0)
  }

  /** Column form: array of the k payload values with the smallest
    * (ord, tie), sorted ascending. */
  def topK(ord: Column, tie: Column, payload: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKAgg(GraftColumnBridge.expression(ord), GraftColumnBridge.expression(tie),
        GraftColumnBridge.expression(payload), k).toAggregateExpression())
}
