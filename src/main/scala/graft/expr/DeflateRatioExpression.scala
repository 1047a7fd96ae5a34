package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `deflate_ratio(text)` — compressed-size / raw-size of the UTF-8
 * bytes under zlib DEFLATE: the classic repetitive-text detector of
 * the Gopher/MassiveText rule family. Natural prose compresses to
 * roughly 0.3–0.6; looping boilerplate, keyword stuffing and
 * templated spam crush far below that; random bytes sit near (or
 * above) 1.0. It catches LONG-RANGE repetition that per-line
 * ([[graft.functions.TextFunctions.repetitionRatio]]) and bigram
 * ([[graft.operators.TextPrep.repetitionMetrics]]) signals miss — a
 * paragraph pasted 40 times with varied line breaks defeats both but
 * not the compressor.
 *
 * `java.util.zip.Deflater` ships with the JDK — no library, no UDF;
 * the expression keeps the scan inside whole-stage codegen. One
 * Deflater allocates per call and releases in a finally (native zlib
 * memory must not wait for the GC). Null input → null; empty text →
 * null (a ratio of nothing is not 0 quality). This is a row-local
 * quality SIGNAL — thresholds belong to the caller, and a SQL oracle
 * cannot replay zlib, so gates over it are rows-only with the
 * analytic cases pinned in spec.
 */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio expects a string, got ${t.sql}")
  }

  def ratio(s: UTF8String): java.lang.Double = {
    val raw = s.getBytes
    if (raw.isEmpty) return null
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      java.lang.Double.valueOf(compressed.toDouble / raw.length)
    } finally d.end()
  }

  override protected def nullSafeEval(input: Any): Any =
    ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dr", this, classOf[DeflateRatio].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = $ref.ratio($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "deflate_ratio"
}
