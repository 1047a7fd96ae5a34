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
 * Size-bounded bucket collection: the k SMALLEST rows of each group
 * under full-struct ascending order, plus an exact count of members
 * the cap dropped.
 *
 * `bounded_min_k(struct(…), k)` returns
 * `struct<members: array<struct<…>>, dropped: bigint>` where
 * `members` is exactly what `slice(sort_array(collect_list(x)), 1, k)`
 * would return — but the aggregation STATE is a fixed k-row heap, not
 * the whole bucket. The slice formulation caps what is KEPT, not what
 * is BUFFERED: `collect_list` materializes the entire bucket in one
 * executor buffer before the slice applies, so a hot bucket of
 * distinct hashes sharing one band/block value (boilerplate shingle
 * bands, near-blank images whose pHash block is 0) is an OOM at real
 * scale even though every tested SF passes. This is the same lesson
 * already applied to Jaccard blocking (count + df prefilter, r12) and
 * line-dedup window state (count + one struct): no aggregation buffer
 * ever holds an unbounded posting list.
 *
 * `dropped` makes the cap observable: `seen - kept`, exact under
 * partial aggregation (seen counts add across merges). The banding
 * candidate generators surface `sum(dropped)` / truncated-bucket
 * counts through `Dataset.observe`, so silent recall truncation is a
 * metric instead of a mystery.
 *
 * Null child rows (the `when(cond, struct(…))` conditional-collection
 * idiom) are skipped entirely — not collected, not counted as seen —
 * matching `collect_list`'s null handling.
 */
case class BoundedMinK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedMinK.Buffer] with UnaryLike[Expression] {

  require(k > 0, s"bounded_min_k: k must be positive, got $k")

  @transient private lazy val structType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val fieldTypes = structType.fields.map(_.dataType)
  @transient private lazy val orderings: Array[Ordering[Any]] =
    fieldTypes.map(dt => TypeUtils.getInterpretedOrdering(dt))
  @transient private lazy val copyProjection = UnsafeProjection.create(structType)

  override def dataType: DataType = StructType(Seq(
    StructField("members", ArrayType(structType, containsNull = false), nullable = false),
    StructField("dropped", LongType, nullable = false)))
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType if st.nonEmpty =>
      st.fields.find(f => !RowOrdering.isOrderable(f.dataType)) match {
        case Some(f) => TypeCheckResult.TypeCheckFailure(
          s"bounded_min_k: field ${f.name} has unorderable type ${f.dataType.sql}")
        case None => TypeCheckResult.TypeCheckSuccess
      }
    case other =>
      TypeCheckResult.TypeCheckFailure(s"bounded_min_k expects a struct input, got ${other.sql}")
  }

  /** Ascending full-struct order (nulls first), matching `sort_array`
   * on array<struct> so the kept set — and pair generation downstream
   * — is bit-identical to the slice(sort_array(collect_list …))
   * formulation it replaces. */
  private def cmp(a: InternalRow, b: InternalRow): Int = {
    var i = 0
    while (i < fieldTypes.length) {
      val av = if (a.isNullAt(i)) null else a.get(i, fieldTypes(i))
      val bv = if (b.isNullAt(i)) null else b.get(i, fieldTypes(i))
      val c =
        if (av == null && bv == null) 0
        else if (av == null) -1
        else if (bv == null) 1
        else orderings(i).compare(av, bv)
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** Heap ordered LARGEST-first: the head is the eviction candidate
   * (we keep the k smallest). Initial capacity stays SMALL and grows
   * on demand: most buckets hold a handful of members (band buckets
   * are sparse by design), and an up-front k-slot array per group —
   * ~8 KB at the default cap — would be allocated millions of times
   * over for 1-2 row buckets. */
  private def newHeap(): java.util.PriorityQueue[UnsafeRow] =
    new java.util.PriorityQueue[UnsafeRow](math.min(k, 16),
      (a: UnsafeRow, b: UnsafeRow) => cmp(b, a))

  override def createAggregationBuffer(): BoundedMinK.Buffer =
    new BoundedMinK.Buffer(newHeap(), 0L)

  override def update(buffer: BoundedMinK.Buffer, input: InternalRow): BoundedMinK.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      buffer.seen += 1
      offer(buffer, v.asInstanceOf[InternalRow], copyOnKeep = true)
    }
    buffer
  }

  override def merge(buffer: BoundedMinK.Buffer, other: BoundedMinK.Buffer): BoundedMinK.Buffer = {
    buffer.seen += other.seen
    val it = other.heap.iterator()
    while (it.hasNext) offer(buffer, it.next(), copyOnKeep = false)
    buffer
  }

  /** Compare BEFORE copying: a row that doesn't beat the current
   * largest never allocates. */
  private def offer(buffer: BoundedMinK.Buffer, row: InternalRow, copyOnKeep: Boolean): Unit = {
    val heap = buffer.heap
    if (heap.size() < k) {
      heap.offer(keep(row, copyOnKeep))
    } else if (cmp(row, heap.peek()) < 0) {
      heap.poll()
      heap.offer(keep(row, copyOnKeep))
    }
  }

  private def keep(row: InternalRow, copy: Boolean): UnsafeRow =
    if (copy) copyProjection(row).copy()
    else row.asInstanceOf[UnsafeRow]

  override def eval(buffer: BoundedMinK.Buffer): Any = {
    // drain a COPY: eval must not mutate the buffer (Spark may call it
    // repeatedly on the same buffer)
    val heap = new java.util.PriorityQueue[UnsafeRow](buffer.heap)
    val rows = new Array[UnsafeRow](heap.size())
    // largest-first heap drains into ascending order from the back
    var i = rows.length - 1
    while (i >= 0) { rows(i) = heap.poll(); i -= 1 }
    InternalRow(new GenericArrayData(rows.asInstanceOf[Array[Any]]),
      buffer.seen - rows.length)
  }

  override def serialize(buffer: BoundedMinK.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buffer.seen)
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

  override def deserialize(storage: Array[Byte]): BoundedMinK.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val seen = in.readLong()
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
    new BoundedMinK.Buffer(heap, seen)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedMinK =
    copy(child = newChild)

  override def prettyName: String = "bounded_min_k"
}

object BoundedMinK {
  /** k-row largest-first heap + exact count of non-null rows seen. */
  final class Buffer(val heap: java.util.PriorityQueue[UnsafeRow], var seen: Long)
}
