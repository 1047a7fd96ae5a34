package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Element-wise sum of an `array<float|double>` column as ONE aggregate
 * expression: `vector_sum(vec)` → `array<double>`.
 *
 * Why this exists (backs the k-means centroid update in
 * `AnnSearch.kmeansCentroids` / `Clustering`): the declarative
 * formulation — `dim` separate `sum(element_at(vec, i))` aggregate
 * expressions — puts the embedding dimensionality INTO THE PLAN.
 * At production dims (1024–4096) that is thousands of aggregate
 * expressions per `groupBy`: Catalyst analysis, optimizer passes and
 * Janino codegen all scale with expression count, so the driver —
 * not the data — becomes the bottleneck. As a single
 * `TypedImperativeAggregate` the plan is O(1) in dim; the per-row
 * work is one primitive loop over the array, the buffer is one
 * `Array[Double](dim)`, and partial (map-side) aggregation still
 * applies, so the shuffle carries one dim-length row per group per
 * partition.
 *
 * Semantics: null rows are skipped; null ELEMENTS contribute 0; the
 * first non-null row fixes the length and ragged inputs throw (an
 * embedding table with mixed dims is corrupt — summing a prefix would
 * silently produce wrong centroids). All-null group → null.
 */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorSum.Buffer] with UnaryLike[Expression] {

  @transient private lazy val elementIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_sum expects array<float|double> input, got ${other.sql}")
  }

  override def createAggregationBuffer(): VectorSum.Buffer = new VectorSum.Buffer(null)

  override def update(buffer: VectorSum.Buffer, input: InternalRow): VectorSum.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buffer.sums == null) buffer.sums = new Array[Double](n)
      else if (buffer.sums.length != n) throw new IllegalArgumentException(
        s"vector_sum: ragged input — saw arrays of length ${buffer.sums.length} and $n")
      val sums = buffer.sums
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i))
          sums(i) += (if (elementIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: VectorSum.Buffer, other: VectorSum.Buffer): VectorSum.Buffer = {
    if (other.sums != null) {
      if (buffer.sums == null) buffer.sums = other.sums.clone()
      else {
        if (buffer.sums.length != other.sums.length) throw new IllegalArgumentException(
          s"vector_sum: ragged input — merging lengths ${buffer.sums.length} and ${other.sums.length}")
        var i = 0
        while (i < buffer.sums.length) { buffer.sums(i) += other.sums(i); i += 1 }
      }
    }
    buffer
  }

  override def eval(buffer: VectorSum.Buffer): Any =
    // copy: eval must not hand out the live buffer (repeated eval /
    // downstream mutation must not corrupt later merges)
    if (buffer.sums == null) null else new GenericArrayData(buffer.sums.clone())

  override def serialize(buffer: VectorSum.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (buffer.sums == null) out.writeInt(-1)
    else {
      out.writeInt(buffer.sums.length)
      var i = 0
      while (i < buffer.sums.length) { out.writeDouble(buffer.sums(i)); i += 1 }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): VectorSum.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    if (n < 0) new VectorSum.Buffer(null)
    else {
      val sums = new Array[Double](n)
      var i = 0
      while (i < n) { sums(i) = in.readDouble(); i += 1 }
      new VectorSum.Buffer(sums)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSum =
    copy(child = newChild)

  override def prettyName: String = "vector_sum"
}

object VectorSum {
  /** Mutable element-wise sums; null until the first non-null row. */
  final class Buffer(var sums: Array[Double])
}
