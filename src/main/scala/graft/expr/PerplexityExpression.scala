package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `unigram_ppl(tokens, model_bytes, oov_log_prob)` — per-document
 * unigram perplexity `exp(−mean token log-prob)` as a native codegen'd
 * expression probing a hash-map model, null for tokenless documents.
 *
 * Why it exists (the production shape of `LmScore` scoring — CCNet
 * reduced to unigrams): the aggregate formulation
 * (`LmScore.perplexities`: explode tokens → broadcast-join the model →
 * groupBy(doc)) multiplies the corpus to ONE ROW PER TOKEN and pushes
 * that through a shuffle — at 100 TB that is a ~1000× row blow-up
 * shuffled corpus-wide, for a score that is a pure function of each
 * row. This expression folds over the token array in place: O(tokens)
 * per row, O(1) hash probes, zero extra rows, zero shuffle, and the
 * scan stays inside whole-stage codegen. The earlier row-local
 * `LmScore.perplexity` column folds over a MAP LITERAL, which Catalyst
 * probes by LINEAR SCAN per token (measured ~8 minutes for 500 docs ×
 * 20k vocab) — this expression is that column done right: the model
 * rides the plan as ONE binary literal (the
 * [[BloomMightContain]] discipline), deserialized once per task into a
 * real hash map (UTF8String keys, so probing allocates nothing).
 *
 * Empty-string tokens are skipped (the `tokens()` of an empty text is
 * `[""]`), matching the aggregate path's `tok != ''` filter; null for
 * zero countable tokens matches its left-join-produces-null contract.
 */
case class UnigramPerplexity(child: Expression, modelBytes: Array[Byte],
                             oovLogProb: Double) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_ppl expects array<string> tokens, got ${t.sql}")
  }

  @transient private lazy val probe: java.util.HashMap[UTF8String, java.lang.Double] =
    UnigramPerplexity.deserialize(modelBytes)

  /** Called from both interpreted eval and generated code. */
  def score(arr: ArrayData): java.lang.Double = {
    val n = arr.numElements()
    var sum = 0.0
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        if (tok.numBytes() > 0) {
          val lp = probe.get(tok)
          sum += (if (lp == null) oovLogProb else lp.doubleValue())
          cnt += 1
        }
      }
      i += 1
    }
    if (cnt == 0) null else java.lang.Double.valueOf(math.exp(-sum / cnt))
  }

  override protected def nullSafeEval(input: Any): Any = score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ppl", this, classOf[UnigramPerplexity].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = $ref.score($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "unigram_ppl"

  // value-based equality over the model bytes with an identity-cached
  // content hash — the BloomMightContain discipline: default case-class
  // equality compares Array[Byte] by reference, which would defeat plan
  // canonicalization, and Catalyst calls equals/hashCode many times per
  // optimizer pass over a model that can be megabytes.
  private def bytesHash: Int = UnigramPerplexity.contentHash(modelBytes)

  override def equals(other: Any): Boolean = other match {
    case p: UnigramPerplexity =>
      child == p.child && oovLogProb == p.oovLogProb &&
        ((modelBytes eq p.modelBytes) ||
          (bytesHash == p.bytesHash &&
            java.util.Arrays.equals(modelBytes, p.modelBytes)))
    case _ => false
  }

  override def hashCode(): Int =
    31 * (31 * child.hashCode() + bytesHash) + java.lang.Double.hashCode(oovLogProb)
}

/**
 * `bigram_ppl(tokens, bigram_bytes, unigram_bytes, log_alpha,
 * oov_log_prob)` — per-document STUPID-BACKOFF bigram perplexity
 * (Brants et al. 2007, "Large Language Models in Machine
 * Translation") as a native codegen'd expression: position 0 scores by
 * the add-one unigram model; position i ≥ 1 scores
 * `lp(cur | prev) = lp_bi("prev cur")` when the pair is in the bigram
 * map, else `log α + lp_uni(cur)`. Perplexity is
 * `exp(−mean position log-prob)`; null for tokenless documents.
 *
 * A bigram model sees what unigrams cannot: WORD ORDER. Shuffling a
 * fluent document's tokens leaves its unigram perplexity untouched but
 * destroys every bigram — exactly the gibberish/boilerplate signal a
 * CCNet-style quality tier wants on top of vocabulary fit.
 *
 * Pair keys are `prev + " " + cur`: tokens are whitespace-split so a
 * space can never occur inside one, making the key unambiguous — and
 * the same printable key is what the fit caps on and what a SQL oracle
 * can replay. Probing builds one small UTF8String concat per position;
 * the two models ride the plan as binary literals (the
 * [[UnigramPerplexity]] discipline), deserialized once per task.
 * Empty-string tokens are skipped; `prev` is the last counted token.
 */
case class BigramPerplexity(child: Expression, bigramBytes: Array[Byte],
                            unigramBytes: Array[Byte], logAlpha: Double,
                            oovLogProb: Double) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bigram_ppl expects array<string> tokens, got ${t.sql}")
  }

  @transient private lazy val pairProbe: java.util.HashMap[UTF8String, java.lang.Double] =
    UnigramPerplexity.deserialize(bigramBytes)
  @transient private lazy val uniProbe: java.util.HashMap[UTF8String, java.lang.Double] =
    UnigramPerplexity.deserialize(unigramBytes)

  private val Sep = UTF8String.fromString(" ")

  private def uniLp(tok: UTF8String): Double = {
    val lp = uniProbe.get(tok)
    if (lp == null) oovLogProb else lp.doubleValue()
  }

  /** Called from both interpreted eval and generated code. */
  def score(arr: ArrayData): java.lang.Double = {
    val n = arr.numElements()
    var sum = 0.0
    var cnt = 0
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        if (tok.numBytes() > 0) {
          if (prev == null) {
            sum += uniLp(tok)
          } else {
            val lpBi = pairProbe.get(UTF8String.concat(prev, Sep, tok))
            sum += (if (lpBi != null) lpBi.doubleValue() else logAlpha + uniLp(tok))
          }
          cnt += 1
          prev = tok
        }
      }
      i += 1
    }
    if (cnt == 0) null else java.lang.Double.valueOf(math.exp(-sum / cnt))
  }

  override protected def nullSafeEval(input: Any): Any = score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bppl", this, classOf[BigramPerplexity].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = $ref.score($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bigram_ppl"

  // value-based equality over both model byte arrays, content hashes
  // identity-cached — see UnigramPerplexity
  private def biHash: Int = UnigramPerplexity.contentHash(bigramBytes)
  private def unHash: Int = UnigramPerplexity.contentHash(unigramBytes)

  override def equals(other: Any): Boolean = other match {
    case p: BigramPerplexity =>
      child == p.child && logAlpha == p.logAlpha && oovLogProb == p.oovLogProb &&
        ((bigramBytes eq p.bigramBytes) ||
          (biHash == p.biHash && java.util.Arrays.equals(bigramBytes, p.bigramBytes))) &&
        ((unigramBytes eq p.unigramBytes) ||
          (unHash == p.unHash && java.util.Arrays.equals(unigramBytes, p.unigramBytes)))
    case _ => false
  }

  override def hashCode(): Int =
    31 * (31 * (31 * (31 * child.hashCode() + biHash) + unHash) +
      java.lang.Double.hashCode(logAlpha)) + java.lang.Double.hashCode(oovLogProb)
}

object UnigramPerplexity {
  /** Serialize (word → log-prob) for the expression's byte argument.
    * Sorted by word so EQUAL models serialize to EQUAL bytes (plan
    * canonicalization compares the bytes). */
  def serialize(logProbs: Map[String, Double]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    val sorted = logProbs.toArray.sortBy(_._1)
    out.writeInt(sorted.length)
    sorted.foreach { case (w, lp) =>
      val b = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeDouble(lp)
    }
    out.flush()
    bos.toByteArray
  }

  private[expr] def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, java.lang.Double] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[UTF8String, java.lang.Double](math.max(16, (n / 0.75).toInt))
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.put(UTF8String.fromBytes(b), java.lang.Double.valueOf(in.readDouble()))
      i += 1
    }
    m
  }

  private val hashCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[Array[Byte], Integer]())

  private[expr] def contentHash(bytes: Array[Byte]): Int =
    hashCache.computeIfAbsent(bytes, b => Integer.valueOf(java.util.Arrays.hashCode(b)))
}
