package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * `pq_encode(vec, codebookBytes)` — row-local product-quantization
 * encoding: for each of m subspaces, the L2-argmin centroid index
 * against that subspace's ksub codewords, emitted as one
 * `array<tinyint>` (idx − 128, the [[graft.operators.ProductQuant]]
 * storage convention).
 *
 * Why native (r17): the HOF formulation (`zip_with` over subspaces →
 * `slice` → `transform` over ksub codewords → `aggregate(zip_with)`
 * distance → ksub `struct` allocations → `array_min`) allocates
 * ~2·ksub arrays/structs PER SUBSPACE PER ROW and runs its lambdas as
 * closures — at m=16/ksub=32 that is ~1k heap allocations per encoded
 * vector on the index-BUILD path, the one that scans the whole corpus
 * at 100 TB. Here the codebook rides the plan as one binary literal,
 * the vector is read once into a scratch array, and the m·ksub·dsub
 * distance loop runs in primitive Java inside whole-stage codegen.
 * Accumulation order is bit-identical to the HOF chain (sequential
 * over elements, float inputs promoted to double, `Double.compare`
 * argmin with ties to the LOWEST index — `array_min` over
 * struct(d, i) semantics); the retired Column formulation stays as
 * the spec-pinned parity twin (`ProductQuant.codesOfColumns`).
 */
case class PqEncode(child: Expression, codebookBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects an array<float|double> vector, got ${t.sql}")
    }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val codebooks: Array[Array[Array[Double]]] =
    PqEncode.deserialize(codebookBytes)

  def encode(arr: ArrayData): GenericArrayData = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val dim = m * dsub
    if (arr.numElements() != dim)
      throw new IllegalArgumentException(
        s"pq_encode: input vector has ${arr.numElements()} dims, " +
          s"codebooks expect $dim (m=$m × dsub=$dsub)")
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"pq_encode: input vector has a null element at $i — " +
            "malformed embedding, refusing to encode garbage")
      x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val cbj = codebooks(j)
      val off = j * dsub
      var bestD = 0.0
      var bestC = 0
      var c = 0
      while (c < cbj.length) {
        val row = cbj(c)
        var acc = 0.0
        var t = 0
        while (t < dsub) { val d = x(off + t) - row(t); acc += d * d; t += 1 }
        // Double.compare orders NaN greatest (array_min semantics);
        // strict < keeps the lowest index on ties
        if (c == 0 || java.lang.Double.compare(acc, bestD) < 0) {
          bestD = acc; bestC = c
        }
        c += 1
      }
      out(j) = (bestC - 128).toByte
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqe", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"

  private def bytesHash: Int = UnigramPerplexity.contentHash(codebookBytes)

  override def equals(other: Any): Boolean = other match {
    case p: PqEncode =>
      child == p.child &&
        ((codebookBytes eq p.codebookBytes) ||
          (bytesHash == p.bytesHash && java.util.Arrays.equals(codebookBytes, p.codebookBytes)))
    case _ => false
  }

  override def hashCode(): Int = 31 * child.hashCode() + bytesHash
}

object PqEncode {
  def serialize(codebooks: Array[Array[Array[Double]]]): Array[Byte] = {
    require(codebooks.nonEmpty && codebooks(0).nonEmpty,
      "pq_encode: empty codebooks")
    val ksub = codebooks(0).length
    val dsub = codebooks(0)(0).length
    require(ksub <= 256, s"pq_encode: ksub $ksub does not fit a byte code")
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(codebooks.length); out.writeInt(ksub); out.writeInt(dsub)
    codebooks.foreach { cbj =>
      require(cbj.length == ksub, s"pq_encode: ragged ksub ${cbj.length} != $ksub")
      cbj.foreach { row =>
        require(row.length == dsub, s"pq_encode: ragged dsub ${row.length} != $dsub")
        row.foreach(out.writeDouble)
      }
    }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Array[Array[Array[Double]]] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val m = in.readInt(); val ksub = in.readInt(); val dsub = in.readInt()
    Array.fill(m)(Array.fill(ksub)(Array.fill(dsub)(in.readDouble())))
  }
}

/**
 * `pq_adc_cosine(codes, dotT, nrmT, qNorm)` — the ADC probe's scoring
 * kernel: Σ_j dotT[j][code_j] over Σ_j nrmT[j][code_j], normalized by
 * the query norm, with the shared zero guards. One implementation for
 * BOTH probe shapes — single-query (both tables literal) and batched
 * (the per-query dot table rides the broadcast probe row as a column)
 * — so a fix to the lookup or the guards can never apply to one and
 * not the other (the adcCosine contract, kept).
 *
 * Why native (r17, the pq_encode companion): the HOF formulation ran
 * two `aggregate(zip_with(codes, table, element_at...))` chains per
 * row per query — closure calls plus a zipped-array allocation per
 * table per row, on the path that scans EVERY encoded row for EVERY
 * query. Here it is 2m primitive array reads. Codes store idx − 128
 * (tinyint); tables are m × ksub doubles.
 */
case class PqAdcCosine(codes: Expression, dotT: Expression,
                       nrmT: Expression, qNorm: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def first: Expression = codes
  override def second: Expression = dotT
  override def third: Expression = nrmT
  override def fourth: Expression = qNorm

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isDoubleTable(t: DataType): Boolean = t match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (!codes.dataType.isInstanceOf[ArrayType] ||
        codes.dataType.asInstanceOf[ArrayType].elementType != ByteType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc_cosine: codes must be array<tinyint>, got ${codes.dataType.sql}")
    else if (!isDoubleTable(dotT.dataType) || !isDoubleTable(nrmT.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "pq_adc_cosine: dot/norm tables must be array<array<double>>")
    else if (qNorm.dataType != DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc_cosine: qNorm must be double, got ${qNorm.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  // primitive Double return: the generated code assigns the result
  // straight into the stage's double slot — an Any/Object return made
  // janino fail with 'Cannot cast Object to double' and the whole
  // stage fell back to interpreted eval (caught by CodegenMonitor the
  // first time this expression ran under it)
  def score(codesAny: Any, dotAny: Any, nrmAny: Any, qNormAny: Any): Double = {
    val cs = codesAny.asInstanceOf[ArrayData]
    val dt = dotAny.asInstanceOf[ArrayData]
    val nt = nrmAny.asInstanceOf[ArrayData]
    val qn = qNormAny.asInstanceOf[Double]
    val m = cs.numElements()
    if (dt.numElements() != m || nt.numElements() != m)
      throw new IllegalArgumentException(
        s"pq_adc_cosine: codes have $m subspaces, tables have " +
          s"${dt.numElements()}/${nt.numElements()}")
    var d = 0.0; var n2 = 0.0
    var j = 0
    while (j < m) {
      val c = cs.getByte(j) + 128
      val dRow = dt.getArray(j)
      val nRow = nt.getArray(j)
      // out-of-range code = corrupted index bytes or a wrong-model
      // wiring bug; fail LOUDLY — the HOF chain's non-ANSI element_at
      // would return null here and the bad row would silently score
      // null instead of surfacing the corruption
      if (c < 0 || c >= dRow.numElements() || c >= nRow.numElements())
        throw new IllegalArgumentException(
          s"pq_adc_cosine: code ${cs.getByte(j)} out of range for ksub ${dRow.numElements()}")
      d += dRow.getDouble(c)
      n2 += nRow.getDouble(c)
      j += 1
    }
    if (n2 <= 0.0 || qn == 0.0) 0.0 else d / (math.sqrt(n2) * qn)
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    score(a, b, c, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adc", this, classOf[PqAdcCosine].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = $ref.score($a, $b, $c, $d);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(codes = newFirst, dotT = newSecond, nrmT = newThird, qNorm = newFourth)

  override def prettyName: String = "pq_adc_cosine"
}
