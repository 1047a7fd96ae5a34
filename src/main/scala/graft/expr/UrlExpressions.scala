package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.util.regex.Pattern

/**
 * URL canonicalization as ONE native codegen'd expression:
 * `canonicalize_url(url)`.
 *
 * Why an expression (r17): the original Column formulation chained ~10
 * `regexp_replace`/`when` steps whose branches REUSE upstream columns —
 * Catalyst inlines each reuse as a full copy of the upstream tree, so
 * the expanded expression carried hundreds of regexp nodes. Two
 * consequences at scale: (a) the generated `processNext()` blew
 * janino's 64 KB method limit in composed plans (q_frontier's
 * synthesize → canonicalize → dedup stage), silently dropping the
 * whole stage to interpreted eval; (b) every duplicated subtree
 * re-matched its regexes per row — the url-curation family
 * (q_url_filter is sf1/sf10-tracked; frontier rounds canonicalize both
 * sides of the anti-join) paid the chain several times over. Here the
 * patterns compile ONCE into static fields and each row takes one
 * linear pass; the generated code is a single helper call, so the
 * surrounding stage keeps whole-stage codegen.
 *
 * SEMANTICS ARE PINNED to the original Column chain: the DuckDB
 * oracles (q_url_canon, q_frontier, q_url_filter) replay each RE2
 * step, and `UrlCurationSpec` keeps the retired Column formulation
 * verbatim as a parity twin — both implementations must agree
 * byte-for-byte on the adversarial corpus. Every step below names the
 * Column call it replaces; the java.util.regex patterns and
 * replacement strings are IDENTICAL (Spark's regexp_replace /
 * regexp_extract are themselves j.u.r `replaceAll` / `find+group`).
 */
case class CanonicalizeUrl(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"canonicalize_url expects a string input, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    CanonicalizeUrl.canonicalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // MODULE$ call: companion helpers get no static forwarder, the
    // generated class must go through the module instance
    defineCodeGen(ctx, ev, c =>
      s"""graft.expr.CanonicalizeUrl$$.MODULE$$.canonicalize($c)""")

  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)

  override def prettyName: String = "canonicalize_url"
}

object CanonicalizeUrl {
  // compiled once per JVM; identical pattern strings to the retired
  // Column chain (UrlCurationSpec pins the parity)
  private val Frag = Pattern.compile("#.*$")
  private val Track = Pattern.compile(
    "[?&](?:utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src)=[^&#]*")
  private val QAmp = Pattern.compile("\\?&")
  private val MultiAmp = Pattern.compile("&&+")
  private val TrailSep = Pattern.compile("[?&]$")
  private val Promote = Pattern.compile("^([^?#]*?)&([^&?#]*=)")
  private val Https443 = Pattern.compile("(?i)^(https://[^/:?#]+):443([/?#].*)?$")
  private val Http80 = Pattern.compile("(?i)^(http://[^/:?#]+):80([/?#].*)?$")
  private val SchemeHost = Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*")
  private val TrailSlash = Pattern.compile("(.)/$")

  def canonicalize(url: UTF8String): UTF8String = {
    val in = url.toString
    // regexp_replace(url, "#.*$", "")
    val noFrag = Frag.matcher(in).replaceAll("")
    // regexp_replace(noFrag, "[?&](?:utm_...|ref_src)=[^&#]*", "")
    val noTrack = Track.matcher(noFrag).replaceAll("")
    // regexp_replace ×3: "\?&"→"?", "&&+"→"&", "[?&]$"→""
    val cleaned = TrailSep.matcher(
      MultiAmp.matcher(
        QAmp.matcher(noTrack).replaceAll("?")).replaceAll("&")).replaceAll("")
    // a leading tracking param takes the '?' with it, orphaning the
    // next param behind '&': promote the first orphaned '&' to '?'.
    // Guards (see the retired chain's comments): promotion fires only
    // when a tracking param was actually removed AND no '?' survived —
    // literal path ampersands must stay path
    val fixedSep =
      if (noTrack == noFrag || cleaned.contains("?")) cleaned
      else Promote.matcher(cleaned).replaceAll("$1?$2")
    // default-port strip; j.u.r substitutes "" for a non-participating
    // $2, exactly like the Column chain's regexp_replace
    val noPort = Http80.matcher(
      Https443.matcher(fixedSep).replaceAll("$1$2")).replaceAll("$1$2")
    // lowercase scheme://host only (regexp_extract idx 0 returns ""
    // on no match; replaceAll leaves the input whole) — lowercasing
    // through UTF8String to match Spark's `lower` exactly
    val m = SchemeHost.matcher(noPort)
    val lowered =
      if (m.find())
        UTF8String.fromString(m.group(0)).toLowerCase.toString +
          noPort.substring(m.end())
      else noPort
    // trailing-slash strip only when no query remains
    val out =
      if (lowered.contains("?")) lowered
      else TrailSlash.matcher(lowered).replaceAll("$1")
    if (out == in) url else UTF8String.fromString(out)
  }
}
