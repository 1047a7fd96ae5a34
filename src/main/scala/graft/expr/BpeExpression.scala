package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `bpe_encode(tokens, merges_bytes)` — byte-pair-encoding
 * subword segmentation (Sennrich et al. 2016) as a native codegen'd
 * expression: each whitespace token splits into characters plus the
 * `</w>` end-of-word marker, then adjacent symbol pairs merge
 * greedily in RANK order (the learned merge table) until no ranked
 * pair remains — the exact GPT-2/sentencepiece-BPE apply loop. The
 * output is the concatenation of every token's subwords, in order.
 *
 * Scale contract (the train/serve split of
 * [[graft.operators.Bpe]]): training needs global statistics and runs
 * on a bounded word-frequency aggregate; APPLYING the merges is a pure
 * per-row function, so it belongs in the scan — this expression rides
 * the plan as one binary literal (the [[UnigramPerplexity]]
 * discipline), builds its rank map once per task, and keeps the
 * corpus pass shuffle-free and inside whole-stage codegen.
 *
 * Merge ranks serialize as the pair key `"left right"` (symbols
 * descend from whitespace-split tokens, so a space cannot occur inside
 * one) → rank. Characters are Java chars (surrogate pairs split —
 * acceptable for the BMP-dominated corpora this targets; a code-point
 * walk is the drop-in refinement). Null/empty tokens contribute no
 * subwords; a null token array yields null.
 */
case class BpeEncode(child: Expression, mergesBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects array<string> tokens, got ${t.sql}")
  }

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = UnigramPerplexity.deserialize(mergesBytes)
    val out = new java.util.HashMap[String, Integer](m.size() * 2)
    m.forEach((k, v) => out.put(k.toString, Integer.valueOf(v.toInt)))
    out
  }

  /** The greedy rank-order merge loop for one word. */
  private def encodeWord(word: String, out: java.util.ArrayList[UTF8String]): Unit = {
    if (word.isEmpty) return
    var syms = new java.util.ArrayList[String](word.length + 1)
    var i = 0
    while (i < word.length) { syms.add(String.valueOf(word.charAt(i))); i += 1 }
    syms.add(BpeEncode.EndOfWord)
    var done = false
    while (!done && syms.size() > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < syms.size() - 1) {
        val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); bestIdx = j }
        j += 1
      }
      if (bestIdx < 0) done = true
      else {
        syms.set(bestIdx, syms.get(bestIdx) + syms.get(bestIdx + 1))
        syms.remove(bestIdx + 1)
      }
    }
    var k = 0
    while (k < syms.size()) { out.add(UTF8String.fromString(syms.get(k))); k += 1 }
  }

  /** Called from both interpreted eval and generated code. */
  def encode(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n * 4)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        if (tok.numBytes() > 0) encodeWord(tok.toString, out)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"

  // value-based equality over the merge bytes (see UnigramPerplexity)
  private def bytesHash: Int = UnigramPerplexity.contentHash(mergesBytes)

  override def equals(other: Any): Boolean = other match {
    case p: BpeEncode =>
      child == p.child &&
        ((mergesBytes eq p.mergesBytes) ||
          (bytesHash == p.bytesHash &&
            java.util.Arrays.equals(mergesBytes, p.mergesBytes)))
    case _ => false
  }

  override def hashCode(): Int = 31 * child.hashCode() + bytesHash
}

object BpeEncode {
  /** The Sennrich end-of-word marker symbol. */
  val EndOfWord = "</w>"

  /** Serialize ordered merges to the expression's byte argument: pair
    * key `"left right"` → rank, via the shared sorted-map format. */
  def serialize(merges: Seq[(String, String)]): Array[Byte] =
    UnigramPerplexity.serialize(
      merges.zipWithIndex.map { case ((a, b), r) => s"$a $b" -> r.toDouble }.toMap)
}
