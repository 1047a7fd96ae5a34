package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/**
 * `bloom_might_contain(hash, filter_bytes)` — probe a serialized
 * `org.apache.spark.util.sketch.BloomFilter` with a 64-bit hash, as a
 * native codegen'd expression (the same shape as Spark's internal
 * runtime-filter `BloomFilterMightContain`, which is not callable from
 * user code).
 *
 * Why it exists (backs `Decontaminate.contaminatedIdsBloom`): the
 * exact decontamination path broadcasts the benchmark's DISTINCT
 * shingle hashes as a semi-join hash set — 8 bytes per shingle, which
 * stops fitting when the benchmark side is itself corpus-sized (union
 * of every eval suite + their paraphrases). A Bloom filter at the same
 * false-positive rate is ~5-10× smaller and mergeable, so it builds
 * distributed and ships once per executor; rows that pass the probe
 * are then verified EXACTLY against the real hash set — the filter
 * only bounds how much survives to that join, it never decides
 * membership.
 *
 * The filter bytes are a foldable argument: they live in the plan as
 * one binary literal, deserialized once per task (transient lazy), and
 * the per-row probe is a primitive call from generated code — no UDF,
 * no interpreted fallback.
 */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a bigint hash, got ${t.sql}")
  }

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes))

  /** Called from both interpreted eval and generated code. */
  def test(h: Long): Boolean = filter.mightContainLong(h)

  override protected def nullSafeEval(input: Any): Any = test(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the expression instance itself is the reference object: generated
    // code calls test() on it, sharing the one deserialized filter
    val ref = ctx.addReferenceObj("bloom", this, classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, h => s"$ref.test($h)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"

  // value-based equality over the filter bytes: the default case-class
  // equality compares Array[Byte] by REFERENCE, so two semantically
  // identical probes would never compare equal and plan
  // canonicalization / subexpression elimination / cached-plan lookup
  // could not unify them. The filter can be 100+ MB (that is the
  // point of the feature), and Catalyst calls equals/hashCode many
  // times per optimizer pass — the hash is cached PER ARRAY IDENTITY
  // in the companion (a per-instance lazy val would be discarded by
  // every withNewChildInternal copy, repaying the full scan per
  // transformed node) and equals short-circuits on reference and hash
  // before scanning bytes.
  private def filterBytesHash: Int = BloomMightContain.contentHash(filterBytes)

  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child &&
        ((filterBytes eq b.filterBytes) ||
          (filterBytesHash == b.filterBytesHash &&
            java.util.Arrays.equals(filterBytes, b.filterBytes)))
    case _ => false
  }

  override def hashCode(): Int = 31 * child.hashCode() + filterBytesHash
}

object BloomMightContain {
  /** Serialize a sketch BloomFilter for the expression's byte argument. */
  def serialize(filter: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    filter.writeTo(out)
    out.toByteArray
  }

  // identity-keyed (WeakHashMap hashes arrays by reference), so every
  // expression copy sharing one filter array pays the content scan
  // exactly once; weak keys let the filter be collected with its plan
  private val hashCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[Array[Byte], Integer]())

  private[expr] def contentHash(bytes: Array[Byte]): Int =
    hashCache.computeIfAbsent(bytes, b => Integer.valueOf(java.util.Arrays.hashCode(b)))
}
