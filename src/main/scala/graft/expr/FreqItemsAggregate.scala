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
 * Mutable Misra-Gries summary with an amortized O(log capacity) offer.
 *
 * The classic step "decrement EVERY counter and drop the zeroed ones"
 * is represented with a global `offset`: an entry's logical counter is
 * `stored − offset`, so decrement-all is ONE offset bump, and a
 * (stored → items) bucket index (TreeMap) makes each purge touch only
 * the entries that actually die — the bucket at the old minimum. The
 * math is bit-identical to the naive walk (same dec = min(weight,
 * min-counter), same removals), only the cost changes: the r18 sf10
 * probe measured the naive form at 354 s for ~57M bigram offers
 * (an O(capacity) min-scan + decrement walk per EVICTING offer once
 * the map is full — quadratic-in-capacity throughput collapse on any
 * corpus whose distinct count exceeds capacity, which is exactly the
 * regime the sketch exists for).
 */
final class MgSummary(val capacity: Int) {
  /** Live entries: item → stored value; logical count = stored − offset.
    * Invariant: stored > offset for every live entry. */
  val stored = new java.util.HashMap[String, Long](capacity * 2)
  private val buckets = new java.util.TreeMap[Long, java.util.HashSet[String]]()
  private var offset = 0L

  private def bucketAdd(s: Long, item: String): Unit = {
    var set = buckets.get(s)
    if (set == null) { set = new java.util.HashSet[String](); buckets.put(s, set) }
    set.add(item); ()
  }

  private def bucketRemove(s: Long, item: String): Unit = {
    val set = buckets.get(s)
    set.remove(item)
    if (set.isEmpty) { buckets.remove(s); () }
  }

  /** MG offer, generalized to weighted items for merges: increment if
    * tracked, insert if room, else decrement-all by min(weight,
    * current minimum counter) — the remainder re-offers, terminating
    * because every live entry's logical count is ≥ 1, so each round
    * either inserts or strictly reduces the remaining weight. */
  def offer(item: String, w0: Long): Unit = {
    var w = w0
    while (w > 0) {
      val cur = stored.get(item)
      if (cur != 0L || stored.containsKey(item)) {
        stored.put(item, cur + w)
        bucketRemove(cur, item); bucketAdd(cur + w, item)
        return
      }
      if (stored.size < capacity) {
        val s = offset + w
        stored.put(item, s); bucketAdd(s, item)
        return
      }
      val dec = math.min(w, buckets.firstKey() - offset)
      offset += dec
      // only the buckets that fell to/below zero die — each removal is
      // paid for by the insertion that created the entry
      while (!buckets.isEmpty && buckets.firstKey() <= offset) {
        val e = buckets.pollFirstEntry()
        val it = e.getValue.iterator()
        while (it.hasNext) { stored.remove(it.next()); () }
      }
      w -= dec
    }
  }

  def size: Int = stored.size

  /** Iterate (item, LOGICAL count) — what merges/serialization/eval see. */
  def foreachEntry(f: (String, Long) => Unit): Unit = {
    val it = stored.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); f(e.getKey, e.getValue - offset) }
  }
}

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
  extends TypedImperativeAggregate[MgSummary]
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

  override def createAggregationBuffer(): MgSummary = new MgSummary(capacity)

  override def update(buf: MgSummary, input: InternalRow): MgSummary = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MgSummary, other: MgSummary): MgSummary = {
    other.foreachEntry((item, c) => buf.offer(item, c))
    buf
  }

  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def eval(buf: MgSummary): Any = {
    // tie-break in UTF8String BINARY order, not Java String UTF-16
    // code-unit order — supplementary-plane characters sort
    // differently between the two, and the k-cutoff must agree with
    // TopKRows re-ranks and SQL ORDER BY on the same items
    val entries = scala.collection.mutable.ArrayBuffer.empty[(UTF8String, Long)]
    buf.foreachEntry((item, c) => entries += ((UTF8String.fromString(item), c)))
    val top = entries.toArray
      .sortWith { case ((ua, ca), (ub, cb)) =>
        ca > cb || (ca == cb && ua.compareTo(ub) < 0)
      }
      .take(k)
      .map { case (u, c) => proj(InternalRow(u, c)).copy() }
    new GenericArrayData(top.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: MgSummary): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreachEntry { (item, c) =>
      val bytes = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): MgSummary = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = new MgSummary(capacity)
    var i = 0
    // entries are unique and n <= capacity, so these offers never evict
    while (i < n) {
      val len = in.readInt()
      val bytes = new Array[Byte](len); in.readFully(bytes)
      buf.offer(new String(bytes, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
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
