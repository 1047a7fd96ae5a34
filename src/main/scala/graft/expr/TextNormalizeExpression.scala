package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode normalization as a native codegen'd expression:
 * `normalize_text(text, 'NFC'|'NFD'|'NFKC'|'NFKD')`.
 *
 * Why an expression (reference: pramen has no text surface; this backs
 * graft's curation family): a crawl mixes composed and decomposed
 * encodings of the same glyphs ("é" as U+00E9 vs e+U+0301, ligatures,
 * full-width forms), which breaks exact/MinHash dedup, fingerprints
 * and token counts — the SAME text hashes differently. Spark ships no
 * normalizer function, and a Scala UDF would pay per-row
 * serialization and break whole-stage codegen. The generated code
 * calls one helper with an `isNormalized` fast path, so the
 * (overwhelmingly common) already-normalized row pays one decode scan
 * and skips the re-encode + new UTF8String entirely.
 */
case class NormalizeText(child: Expression, form: String) extends UnaryExpression {

  override def dataType: DataType = StringType

  // resolved ONCE at first use (after checkInputDataTypes has vetted
  // the name) — the per-row path must not pay a string-keyed map
  // lookup for a value fixed at analysis time
  @transient private lazy val resolvedForm: java.text.Normalizer.Form =
    java.text.Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"normalize_text expects a string input, got ${child.dataType.sql}")
    else if (!NormalizeText.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"normalize_text: unknown form '$form' (expected NFC, NFD, NFKC or NFKD)")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalizeUtf8(input.asInstanceOf[UTF8String], resolvedForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the resolved Form rides the codegen references array, so the
    // generated per-row call passes the enum constant directly
    val formRef = ctx.addReferenceObj("normForm", resolvedForm,
      classOf[java.text.Normalizer.Form].getName)
    // MODULE$ call: companion helpers get no static forwarder, the
    // generated class must go through the module instance
    defineCodeGen(ctx, ev, c =>
      s"""graft.expr.NormalizeText$$.MODULE$$.normalizeUtf8($c, $formRef)""")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)

  override def prettyName: String = "normalize_text"
}

object NormalizeText {
  val Forms: Set[String] = java.text.Normalizer.Form.values().map(_.name).toSet

  def normalizeUtf8(s: UTF8String, f: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    // fast path: corpus text is overwhelmingly already in the target
    // form — isNormalized only scans, and returning the input
    // UTF8String unchanged skips the re-encode
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}
