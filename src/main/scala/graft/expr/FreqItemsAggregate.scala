package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `approx_top_items(item, k, capacity)` — Misra-Gries heavy hitters as
 * a mergeable aggregate: the frequency companion to the HLL distinct
 * sketch. One corpus pass with a BOUNDED per-partition summary
 * (`capacity` counters) finds every item whose true frequency exceeds
 * n/(capacity+1), with per-item undercount ≤ n/(capacity+1) — the
 * "top domains / top tokens over 100 TB" question without a
 * corpus-keyed groupBy holding every distinct item in the shuffle.
 *
 * Scale shape: the map side keeps ≤ capacity counters per partition
 * and the one shuffle carries ≤ capacity (item, count) pairs per
 * partition — independent of item cardinality. (The exact
 * `groupBy(item).count` formulation shuffles one row per DISTINCT
 * item; at crawl-token cardinalities that is the whole vocabulary.)
 * Merging summaries preserves the error bound (Agarwal et al. 2012,
 * "Mergeable summaries"): merged counts add, then the summary is
 * re-capped by subtracting the (capacity+1)-th largest count.
 *
 * Counts are LOWER bounds; when no eviction ever fires (capacity ≥
 * distinct items seen) they are exact and the result equals the exact
 * top-k — which is what the oracle gate pins. Output: the k best
 * surviving items as `array<struct<item, count>>`, ordered
 * (count desc, item asc) — a total order, so results are
 * reproducible for fixed summary contents. Null items are ignored.
 */
case class ApproxTopItems(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"approx_top_items: k must be positive, got $k")
  require(capacity >= k,
    s"approx_top_items: capacity ($capacity) must be >= k ($k)")

  private val structType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"approx_top_items expects a string item, got ${other.sql}")
  }

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](capacity * 2)

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  /** Classic MG step, generalized to weighted offers for merge: inc if
    * tracked, insert if room, else decrement-all by the offered weight
    * (capped at the current minimum so no count goes negative from a
    * large weight — the remainder re-offers, terminating because each
    * round either inserts or strictly shrinks the map). */
  private def offer(buf: java.util.HashMap[String, Long], item: String, w: Long): Unit = {
    var weight = w
    while (weight > 0) {
      val cur = buf.get(item)
      if (cur != 0L || buf.containsKey(item)) { buf.put(item, cur + weight); return }
      if (buf.size < capacity) { buf.put(item, weight); return }
      // evict: subtract the min(weight, smallest count) from everyone
      var minC = Long.MaxValue
      val it0 = buf.values().iterator()
      while (it0.hasNext) { val c = it0.next(); if (c < minC) minC = c }
      val dec = math.min(weight, minC)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nc = e.getValue - dec
        if (nc <= 0L) it.remove() else e.setValue(nc)
      }
      weight -= dec
    }
  }

  override def merge(buf: java.util.HashMap[String, Long],
                     other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(buf, e.getKey, e.getValue)
    }
    buf
  }

  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    import scala.jdk.CollectionConverters._
    // tie-break in UTF8String BINARY order, not Java String UTF-16
    // code-unit order — supplementary-plane characters sort
    // differently between the two, and the k-cutoff must agree with
    // TopKRows re-ranks and SQL ORDER BY on the same items
    val top = buf.entrySet().asScala.toArray
      .map(e => (e.getKey, UTF8String.fromString(e.getKey), e.getValue))
      .sortWith { case ((_, ua, ca), (_, ub, cb)) =>
        ca > cb || (ca == cb && ua.compareTo(ub) < 0)
      }
      .take(k)
      .map { case (_, u, c) => proj(InternalRow(u, c)).copy() }
    new GenericArrayData(top.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](capacity * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val bytes = new Array[Byte](len); in.readFully(bytes)
      buf.put(new String(bytes, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ApproxTopItems =
    copy(child = newChild)

  override def prettyName: String = "approx_top_items"
}
