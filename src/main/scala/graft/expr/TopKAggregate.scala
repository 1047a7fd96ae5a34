package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/**
 * Bounded per-group top-k as a PARTIAL-AGGREGATING aggregate.
 *
 * `top_k_rows(struct(score, payload…), k)` keeps the k best rows of
 * each group in a fixed-size heap — best = highest `score` (field 0,
 * double), ties broken by the remaining struct fields ascending — and
 * returns them best-first as `array<struct<…>>`.
 *
 * Why this exists (reference: pramen has no ANN surface; this backs
 * graft's multi-query similarity search): the naive per-query top-k,
 * `Window.partitionBy(query_id)` + `row_number <= k`, shuffles EVERY
 * scored row — corpus × queries — into #queries reducer partitions.
 * At 100 TB with 10 queries, ten reducers each receive the whole
 * corpus. As a `TypedImperativeAggregate` the map side emits at most
 * k rows per query per partition, so the shuffle carries
 * ≤ k × queries × partitions tiny rows regardless of corpus size —
 * the multi-query analog of `TakeOrderedAndProject`.
 *
 * The heap buffer holds ≤ k copied `UnsafeRow`s (score + payload),
 * serialized length-prefixed between partial and final aggregation.
 *
 * Null semantics: rows whose SCORE (field 0) is null are dropped —
 * they can't rank. (A window `row_number` formulation would instead
 * sort them last and could return them when a group has < k scored
 * rows; callers who need null-scored rows must filter/score them
 * upstream.) A null struct is likewise skipped.
 */
case class TopKRows(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRows.Buffer] with UnaryLike[Expression] {

  require(k > 0, s"top_k_rows: k must be positive, got $k")

  @transient private lazy val structType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val fieldTypes = structType.fields.map(_.dataType)
  @transient private lazy val orderings: Array[Ordering[Any]] =
    fieldTypes.map(dt => TypeUtils.getInterpretedOrdering(dt))
  @transient private lazy val copyProjection = UnsafeProjection.create(structType)

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType if st.nonEmpty =>
      if (st.fields(0).dataType != DoubleType)
        TypeCheckResult.TypeCheckFailure(
          s"top_k_rows: first struct field (the score) must be DOUBLE, got ${st.fields(0).dataType.sql}")
      else st.fields.drop(1).find(f => !RowOrdering.isOrderable(f.dataType)) match {
        case Some(f) => TypeCheckResult.TypeCheckFailure(
          s"top_k_rows: tie-break field ${f.name} has unorderable type ${f.dataType.sql}")
        case None => TypeCheckResult.TypeCheckSuccess
      }
    case other =>
      TypeCheckResult.TypeCheckFailure(s"top_k_rows expects a struct input, got ${other.sql}")
  }

  /** >0 when `a` is a better row than `b`: higher score first, then
   * remaining fields ascending (nulls rank worst). Total order, so
   * the final array — and any rank cutoff — is deterministic. */
  private def goodness(a: InternalRow, b: InternalRow): Int = {
    val c = java.lang.Double.compare(a.getDouble(0), b.getDouble(0))
    if (c != 0) return c
    var i = 1
    while (i < fieldTypes.length) {
      val av = if (a.isNullAt(i)) null else a.get(i, fieldTypes(i))
      val bv = if (b.isNullAt(i)) null else b.get(i, fieldTypes(i))
      val cc =
        if (av == null && bv == null) 0
        else if (av == null) -1
        else if (bv == null) 1
        else -orderings(i).compare(av, bv)
      if (cc != 0) return cc
      i += 1
    }
    0
  }

  /** Heap ordered worst-first so `peek` is the eviction candidate. */
  private def newHeap(): java.util.PriorityQueue[UnsafeRow] =
    new java.util.PriorityQueue[UnsafeRow](k,
      (a: UnsafeRow, b: UnsafeRow) => goodness(a, b))

  override def createAggregationBuffer(): TopKRows.Buffer =
    new TopKRows.Buffer(newHeap())

  override def update(buffer: TopKRows.Buffer, input: InternalRow): TopKRows.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0)) offer(buffer, row, copyOnKeep = true)
    }
    buffer
  }

  override def merge(buffer: TopKRows.Buffer, other: TopKRows.Buffer): TopKRows.Buffer = {
    val it = other.heap.iterator()
    while (it.hasNext) offer(buffer, it.next(), copyOnKeep = false)
    buffer
  }

  /** Compare BEFORE copying: a row that doesn't beat the current worst
   * never allocates. `copyOnKeep` is false for merge inputs, which
   * already own their bytes (deserialized per-row arrays). */
  private def offer(buffer: TopKRows.Buffer, row: InternalRow, copyOnKeep: Boolean): Unit = {
    val heap = buffer.heap
    if (heap.size() < k) {
      heap.offer(keep(row, copyOnKeep))
    } else if (goodness(row, heap.peek()) > 0) {
      heap.poll()
      heap.offer(keep(row, copyOnKeep))
    }
  }

  private def keep(row: InternalRow, copy: Boolean): UnsafeRow =
    if (copy) copyProjection(row).copy()
    else row.asInstanceOf[UnsafeRow]

  override def eval(buffer: TopKRows.Buffer): Any = {
    // drain a COPY: eval must not mutate the buffer — Spark may call it
    // repeatedly on the same buffer (e.g. top_k_rows in a window frame),
    // and a destructive drain would leave later calls an empty heap.
    val heap = new java.util.PriorityQueue[UnsafeRow](buffer.heap)
    val rows = new Array[UnsafeRow](heap.size())
    var i = rows.length - 1
    // draining the worst-first heap fills best-first from the back
    while (i >= 0) { rows(i) = heap.poll(); i -= 1 }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: TopKRows.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.heap.size())
    val it = buffer.heap.iterator()
    while (it.hasNext) {
      val bytes = it.next().getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): TopKRows.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val heap = newHeap()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val sz = in.readInt()
      val bytes = new Array[Byte](sz)
      in.readFully(bytes)
      val row = new UnsafeRow(fieldTypes.length)
      row.pointTo(bytes, sz)
      heap.offer(row)
      i += 1
    }
    new TopKRows.Buffer(heap)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKRows =
    copy(child = newChild)

  override def prettyName: String = "top_k_rows"
}

object TopKRows {
  /** Mutable fixed-size heap of owned `UnsafeRow`s, worst row at head. */
  final class Buffer(val heap: java.util.PriorityQueue[UnsafeRow])
}
