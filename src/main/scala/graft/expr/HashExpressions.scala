package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native 64-bit SimHash over a token array — one primitive loop per
 * row: each token is xxhash64'd once (seed 42, matching Spark's
 * `xxhash64`), its bits vote ±1 into 64 counters, positive counters
 * set the output bit.
 *
 * Replaces the `aggregate`/`zip_with` formulation in `Dedup.simhash`,
 * which allocates a 64-element array per token and dispatches
 * interpreted lambdas ~130× per token. Bit-identical output.
 */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<string>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.SimHash64$$.MODULE$$.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // the xxhash64 builtin SKIPS null children, leaving the seed —
      // match it exactly so HOF and native hashes stay bit-identical
      val h =
        if (s == null) 42L
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/**
 * Native MinHash signature over a shingle array: `k` hash minima,
 * hash_i(s) = xxhash64(i, s) exactly as the SQL `xxhash64(i, s)`
 * builtin computes it (seed 42 → hashLong(i) → hashBytes(s)), so the
 * output is bit-identical to the higher-order-function formulation in
 * `Dedup.minhashSignatureFromShingles` — but in one primitive loop
 * instead of k interpreted array traversals per row.
 *
 * Empty shingle arrays map to the sentinel signature [0..k-1],
 * matching the HOF version.
 */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"minhash_sig needs k > 0, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig expects array<string>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.MinHashSignature$$.MODULE$$.compute($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/**
 * Native random-hyperplane LSH bucketing: for `tables` independent
 * hash tables of `bits` hyperplanes each (flattened into one plane
 * matrix), emits the per-table sign-bit bucket ids as array<long> —
 * one primitive dot-product loop per plane instead of tables×bits
 * interpreted `aggregate(zip_with(...))` trees. Output matches
 * `AnnSearch.lshBucketsAll`.
 */
case class LshBuckets(child: Expression, planes: Array[Array[Double]], bits: Int)
    extends UnaryExpression {
  require(planes.nonEmpty && planes.length % bits == 0,
    s"plane count ${planes.length} must be a multiple of bits=$bits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lsh_buckets expects array<float|double>, got ${t.sql}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], planes, bits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, a => s"graft.expr.LshBuckets$$.MODULE$$.compute($a, $planesRef, $bits, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "lsh_buckets"
}

object LshBuckets {
  def compute(arr: ArrayData, planes: Array[Array[Double]], bits: Int, isFloat: Boolean): ArrayData = {
    val tables = planes.length / bits
    val dim = arr.numElements()
    val out = new Array[Long](tables)
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(dim, plane.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += x * plane(i)
        i += 1
      }
      if (dot > 0) out(p / bits) |= (1L << (p % bits))
      p += 1
    }
    new GenericArrayData(out)
  }
}

/**
 * Native word-shingle generation: n-gram windows over a token array,
 * joined with single spaces — one pass building the output array,
 * replacing the `transform(sequence(...), i => array_join(slice(...)))`
 * HOF chain (an interpreted slice+join per position per row) in the
 * MinHash/Jaccard pipelines. Matches
 * `TextFunctions.wordShinglesFromTokens` exactly (fewer than n tokens
 * → empty array).
 */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"word_shingles needs n > 0, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingles expects array<string>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.WordShingles$$.MODULE$$.compute($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val total = arr.numElements()
    if (total < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](total - n + 1)
    var i = 0
    while (i <= total - n) {
      // array_join (the HOF formulation) SKIPS null elements — match it
      val parts = new Array[UTF8String](n)
      var j = 0
      var kept = 0
      while (j < n) {
        val s = arr.getUTF8String(i + j)
        if (s != null) { parts(kept) = s; kept += 1 }
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, java.util.Arrays.copyOf(parts, kept): _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object MinHashSignature {
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val minima = new Array[Long](k)
    if (n == 0) {
      var i = 0
      while (i < k) { minima(i) = i.toLong; i += 1 }
      return new GenericArrayData(minima)
    }
    java.util.Arrays.fill(minima, Long.MaxValue)
    var s = 0
    while (s < n) {
      val str = arr.getUTF8String(s)
      var i = 0
      while (i < k) {
        // xxhash64(i, s): fold children over seed 42; i is an INT in
        // the HOF formulation (sequence() yields array<int>), and the
        // builtin hashes IntegerType via hashInt
        var h = XXH64.hashInt(i, 42L)
        h =
          if (str == null) h
          else XXH64.hashUnsafeBytes(str.getBaseObject, str.getBaseOffset, str.numBytes, h)
        if (h < minima(i)) minima(i) = h
        i += 1
      }
      s += 1
    }
    new GenericArrayData(minima)
  }
}

/**
 * Per-bucket multi-index-hashing pair generation — the hot loop of
 * [[graft.operators.Dedup.hammingCandidates]] as one primitive-loop
 * expression: given a bucket's sorted `anchors` and `probes` (each
 * `array<struct<doc_id, hash: bigint>>`) and the bucket's block index,
 * emit every anchor×later-anchor and anchor×larger-id-probe pair whose
 * exact 64-bit hamming distance is within `maxHamming` AND whose FIRST
 * qualifying block (smallest block index with segment distance ≤ the
 * probe radius) is THIS block — so each candidate pair is emitted
 * exactly once across all blocks and probe orientations, and no
 * downstream dropDuplicates shuffle is needed.
 *
 * Why an expression and not SQL higher-order functions: the candidate
 * checks are O(anchors × (anchors + probes)) per bucket — tens of
 * millions of bit_count/xor evaluations on a clustered corpus — and
 * `transform`/`filter` lambdas evaluate interpreted, per element, with
 * boxing (measured 7.8 s for the gate corpus vs sub-second in this
 * loop). CodegenFallback is fine at this altitude: one eval call does
 * a whole bucket's work.
 */
case class MihPairs(anchors: Expression, probes: Expression, blk: Expression,
                    maxHamming: Int, radius: Int, nBlocks: Int,
                    cross: Boolean = false)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(nBlocks >= 1 && nBlocks <= 64, s"nBlocks must be in [1, 64], got $nBlocks")
  require(radius >= 0, s"radius must be >= 0, got $radius")

  override def first: Expression = anchors
  override def second: Expression = probes
  override def third: Expression = blk

  private def memberType(e: Expression): Option[StructType] = e.dataType match {
    case ArrayType(s: StructType, _) if s.fields.length == 2 &&
      s.fields(1).dataType == LongType => Some(s)
    case _ => None
  }

  private lazy val idType: DataType =
    memberType(anchors).get.fields(0).dataType

  override def checkInputDataTypes(): TypeCheckResult =
    (memberType(anchors), memberType(probes)) match {
      case (Some(a), Some(p)) if a.fields(0).dataType == p.fields(0).dataType =>
        if (blk.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"mih_pairs: block index must be int, got ${blk.dataType.sql}")
      case _ => TypeCheckResult.TypeCheckFailure(
        "mih_pairs expects two array<struct<id, bigint>> children with matching id types, " +
          s"got ${anchors.dataType.sql} and ${probes.dataType.sql}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", idType, nullable = true),
    StructField("id_b", idType, nullable = true),
    StructField("hamming", IntegerType, nullable = false))), containsNull = false)

  // balanced block geometry, derived once
  private lazy val widths: Array[Int] = {
    val base = 64 / nBlocks
    val extra = 64 % nBlocks
    Array.tabulate(nBlocks)(b => if (b < extra) base + 1 else base)
  }
  private lazy val offsets: Array[Int] = widths.scanLeft(0)(_ + _).dropRight(1)
  private lazy val masks: Array[Long] =
    widths.map(w => if (w >= 64) -1L else (1L << w) - 1)
  private lazy val ordering: Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(idType)

  /** First block whose segment of `x` has ≤ radius set bits, or -1. */
  private def firstQualifyingBlock(x: Long): Int = {
    var b = 0
    while (b < nBlocks) {
      if (java.lang.Long.bitCount((x >>> offsets(b)) & masks(b)) <= radius) return b
      b += 1
    }
    -1
  }

  override protected def nullSafeEval(aVal: Any, pVal: Any, bVal: Any): Any = {
    val aArr = aVal.asInstanceOf[ArrayData]
    val pArr = pVal.asInstanceOf[ArrayData]
    val thisBlk = bVal.asInstanceOf[Int]
    val na = aArr.numElements()
    val np = pArr.numElements()
    // unpack once: getStruct in the inner loop would re-decode per
    // check. A null hash (upstream forgot its isNotNull filter) must
    // fail loudly — xor'ing the slot's stale bytes would silently
    // produce wrong candidates.
    def unpack(arr: ArrayData, n: Int, role: String): (Array[Any], Array[Long]) = {
      val ids = new Array[Any](n); val hs = new Array[Long](n)
      var i = 0
      while (i < n) {
        val r = arr.getStruct(i, 2)
        if (r.isNullAt(1))
          throw new IllegalArgumentException(
            s"mih_pairs: null hash in $role member $i — filter null hashes upstream")
        ids(i) = r.get(0, idType); hs(i) = r.getLong(1)
        i += 1
      }
      (ids, hs)
    }
    val (aIds, aHash) = unpack(aArr, na, "anchor")
    val (pIds, pHash) = unpack(pArr, np, "probe")
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    if (cross) {
      // bucket-directory mode: A and B are the member lists of two
      // DISTINCT buckets of this block (the neighbor join visits each
      // unordered bucket pair exactly once), so every a×b pairing is
      // checked and the emission is ordered by id — uniqueness comes
      // from the first-qualifying-block rule alone
      var i = 0
      while (i < na) {
        val hi = aHash(i)
        var j = 0
        while (j < np) {
          val x = hi ^ pHash(j)
          if (java.lang.Long.bitCount(x) <= maxHamming && firstQualifyingBlock(x) == thisBlk) {
            val d = java.lang.Long.bitCount(x)
            if (ordering.compare(aIds(i), pIds(j)) <= 0)
              out += InternalRow(aIds(i), pIds(j), d)
            else out += InternalRow(pIds(j), aIds(i), d)
          }
          j += 1
        }
        i += 1
      }
    } else {
      var i = 0
      while (i < na) {
        val hi = aHash(i)
        var j = i + 1
        while (j < na) {
          val x = hi ^ aHash(j)
          if (java.lang.Long.bitCount(x) <= maxHamming && firstQualifyingBlock(x) == thisBlk)
            out += InternalRow(aIds(i), aIds(j), java.lang.Long.bitCount(x))
          j += 1
        }
        j = 0
        while (j < np) {
          val x = hi ^ pHash(j)
          if (java.lang.Long.bitCount(x) <= maxHamming &&
              ordering.compare(pIds(j), aIds(i)) > 0 &&
              firstQualifyingBlock(x) == thisBlk)
            out += InternalRow(aIds(i), pIds(j), java.lang.Long.bitCount(x))
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(anchors = newFirst, probes = newSecond, blk = newThird)

  override def prettyName: String = if (cross) "mih_cross_pairs" else "mih_pairs"
}
