package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * `token_window_hashes(tokens, w)` — one 64-bit hash per
 * `w`-token sliding window, computed by a ROLLING polynomial over
 * per-token xxHash64 values: O(tokens) total work.
 *
 * Why it exists (the ExactSubstr occurrence stream,
 * [[graft.operators.TextPrep.dedupTokenWindows]]): the composable
 * formulation materializes each window as a STRING
 * (`array_join(slice(tokens, i, w), " ")`) and hashes it — O(len × w)
 * character copying per document, 50× the bytes at the
 * production window size 50. Here every token hashes ONCE
 * (xxHash64 over its UTF-8 bytes, so token content is fully mixed
 * before combining) and window hashes roll in O(1):
 * `H(i+1) = (H(i) − h(i)·B^(w−1))·B + h(i+w)` over Z/2⁶⁴ with an odd
 * multiplier — the Rabin-Karp discipline. Two windows are EQUAL as
 * token sequences iff their hashes collide-or-match; cross-sequence
 * collisions are the standard 64-bit fingerprint trade (the polynomial
 * combine is algebraically weaker than hashing the concatenated
 * string, but inputs are pre-mixed per token, and the dedup consumer
 * already accepts 64-bit-fingerprint semantics).
 *
 * `numElements < w` yields an empty array (sub-window documents have
 * no windows — the pass-through contract). Null token slots hash as
 * the empty string. Output positions align with
 * `wordShinglesFromTokens`: index i covers tokens [i, i+w).
 */
case class TokenWindowHashes(child: Expression, windowSize: Int)
    extends UnaryExpression {

  require(windowSize >= 1, s"windowSize must be >= 1: $windowSize")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_window_hashes expects array<string> tokens, got ${t.sql}")
  }

  private val B = 0x9E3779B97F4A7C15L
  /** B^(w-1) in Z/2^64, precomputed once. */
  private val Bw1: Long = {
    var p = 1L; var i = 1
    while (i < windowSize) { p *= B; i += 1 }
    p
  }

  private def tokenHash(arr: ArrayData, i: Int): Long =
    if (arr.isNullAt(i)) XXH64.hashInt(0, 42L)
    else {
      val s = arr.getUTF8String(i)
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
    }

  /** Called from both interpreted eval and generated code. */
  def roll(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    if (n < windowSize) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = tokenHash(arr, i); i += 1 }
    val out = new Array[Long](n - windowSize + 1)
    var h = 0L
    i = 0
    while (i < windowSize) { h = h * B + hs(i); i += 1 }
    out(0) = h
    i = 1
    while (i <= n - windowSize) {
      h = (h - hs(i - 1) * Bw1) * B + hs(i + windowSize - 1)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    roll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("twh", this, classOf[TokenWindowHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.roll($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "token_window_hashes"
}
