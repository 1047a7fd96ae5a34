package graft.expr

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/**
 * KLL quantile sketches (Karnin-Lang-Liberty 2016, via the Apache
 * DataSketches library Spark itself ships) — the QUANTILE member of
 * the mergeable-summary family next to the HLL distinct sketch and
 * the Misra-Gries heavy-hitters summary: per-day sketch rows of a few
 * KB answer "p99 of value over any date range" by merging sketches,
 * never rescanning data. Normalized rank error ~1.65% at the default
 * k=200, shrinking with k; sketches with fewer than ~k retained
 * values are EXACT (no compaction has fired), so small-group
 * quantiles are order statistics, not estimates.
 *
 * `kll_sketch_agg(value[, k])` builds a sketch (binary) per group;
 * `kll_merge_agg(sketch)` merges previously-built sketch rows;
 * `kll_quantile(sketch, p)` reads a quantile out of a sketch blob —
 * a scalar over days×groups sketch rows, far off any corpus-sized
 * path (CodegenFallback is fine at that altitude).
 */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"kll_sketch_agg: k out of range: $k")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg expects a numeric value, got ${other.sql}")
  }

  @transient private lazy val toDouble =
    org.apache.spark.sql.catalyst.expressions.Cast(child, DoubleType)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = toDouble.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(storage: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(storage))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_sketch_agg"
}

/** Merge previously-serialized KLL sketch rows into one sketch. The
  * buffer adopts the FIRST input sketch's k (a fresh default-k buffer
  * would silently downgrade higher-k sketches merged through it —
  * DataSketches merge takes the coarser k), so range merges preserve
  * whatever accuracy the producers configured. */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllMergeAgg.Buffer] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg expects a serialized sketch (binary), got ${other.sql}")
  }

  override def createAggregationBuffer(): KllMergeAgg.Buffer = new KllMergeAgg.Buffer(null)

  override def update(buf: KllMergeAgg.Buffer, input: InternalRow): KllMergeAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val in = KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      if (buf.sk == null) buf.sk = in   // heapify returns an owned heap copy
      else buf.sk.merge(in)
    }
    buf
  }

  override def merge(buf: KllMergeAgg.Buffer, other: KllMergeAgg.Buffer): KllMergeAgg.Buffer = {
    if (other.sk != null) {
      if (buf.sk == null) buf.sk = other.sk
      else buf.sk.merge(other.sk)
    }
    buf
  }

  private def orEmpty(buf: KllMergeAgg.Buffer): KllDoublesSketch =
    if (buf.sk == null) KllDoublesSketch.newHeapInstance() else buf.sk

  override def eval(buf: KllMergeAgg.Buffer): Any = orEmpty(buf).toByteArray
  // a no-input buffer serializes as a zero-byte marker, NOT an empty
  // default-k sketch — merging a real sketch into a default-k shell on
  // the final side would re-introduce the downgrade this class exists
  // to prevent
  override def serialize(buf: KllMergeAgg.Buffer): Array[Byte] =
    if (buf.sk == null) Array.emptyByteArray else buf.sk.toByteArray
  override def deserialize(storage: Array[Byte]): KllMergeAgg.Buffer =
    if (storage.isEmpty) new KllMergeAgg.Buffer(null)
    else new KllMergeAgg.Buffer(KllDoublesSketch.heapify(Memory.wrap(storage)))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_merge_agg"
}

object KllMergeAgg {
  /** Mutable holder so the k of the first REAL sketch can be adopted
    * lazily (the aggregate contract fixes the buffer object at
    * creation time, before any input is seen). */
  final class Buffer(var sk: KllDoublesSketch)
}

/** `kll_quantile(sketchBinary, p)` → the value at normalized rank p
  * (INCLUSIVE search); null for an empty sketch or null input. Scalar
  * over sketch ROWS (days × groups), never a corpus path. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile expects (binary, double), got (${l.sql}, ${r.sql})")
    }

  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val p = right.eval(input)
    if (s == null || p == null) return null
    val sketch = KllDoublesSketch.heapify(Memory.wrap(s.asInstanceOf[Array[Byte]]))
    if (sketch.isEmpty) null
    else sketch.getQuantile(p.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllQuantile =
    copy(left = l, right = r)
  override def prettyName: String = "kll_quantile"
}
