package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * robots.txt (RFC 9309, the Robots Exclusion Protocol) parsing and
 * matching — the crawl-politeness filter of an ingestion pipeline.
 *
 * The scale design splits the work into two expressions:
 *
 *  - `robots_compile(txt, agent)` runs ONCE PER HOST (the robots side
 *    of the join — bounded by the host count, tiny next to the URL
 *    corpus): it parses the file, selects the agent's group and
 *    serializes the rules PRE-SORTED by RFC precedence, so the per-URL
 *    side never re-parses or re-sorts.
 *  - `robots_allowed(path, compiled)` runs per URL: a first-match walk
 *    over the precedence-ordered rules — row-local, no allocation
 *    beyond the split, inside whole-stage codegen.
 *
 * Matching semantics (RFC 9309 §2.2): rules are path-prefix patterns
 * with `*` wildcards and a `$` end anchor; the most specific (longest)
 * pattern wins; on a tie, Allow wins. An empty `Disallow:` allows
 * everything. Group selection: the longest user-agent token that
 * prefix-matches the crawler's product token (case-insensitive), else
 * the `*` groups; multiple groups for the same token merge.
 */
object RobotsTxt {

  final case class Rule(pattern: String, allow: Boolean)

  /** Parsed groups: (lowercased UA tokens, rules in file order), plus
    * the file-global sitemap URLs. */
  def parse(txt: String): (Vector[(Vector[String], Vector[Rule])], Vector[String]) = {
    val (g, sm, _) = parseAll(txt)
    (g, sm)
  }

  /** Full parse: groups, sitemaps, and each group's crawl-delay
    * (parallel to groups) — ONE scanner for rules and delays, so the
    * group-selection semantics cannot diverge between them. */
  def parseAll(txt: String): (Vector[(Vector[String], Vector[Rule])],
                              Vector[String], Vector[Option[Double]]) = {
    val groups = Vector.newBuilder[(Vector[String], Vector[Rule])]
    val sitemaps = Vector.newBuilder[String]
    val delays = Vector.newBuilder[Option[Double]]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var delay: Option[Double] = None
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) { groups += ((agents, rules)); delays += delay }
      agents = Vector.empty; rules = Vector.empty; delay = None; inRules = false
    }
    txt.linesIterator.foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      val i = line.indexOf(':')
      if (i > 0) {
        val field = line.substring(0, i).trim.toLowerCase
        // interior control characters are stripped: U+0001 is the
        // compiled program's record delimiter, and a value smuggling
        // one would split into bogus broader rules
        val value = line.substring(i + 1).trim.filter(_ >= ' ')
        field match {
          case "user-agent" =>
            if (inRules) flush()
            // an empty product token would prefix-match EVERY agent
            // and shadow the '*' group; the RFC says ignore the line
            if (value.nonEmpty) agents :+= value.toLowerCase
          case "allow" | "disallow" if agents.nonEmpty =>
            inRules = true
            // empty Disallow = no restriction (RFC); empty Allow inert
            if (value.nonEmpty) rules :+= Rule(value, field == "allow")
          case "crawl-delay" if agents.nonEmpty =>
            inRules = true // delay ends a UA run like a rule does
            if (delay.isEmpty) delay = value.toDoubleOption
          case "sitemap" => sitemaps += value
          case _ => ()
        }
      }
    }
    flush()
    (groups.result(), sitemaps.result(), delays.result())
  }

  /** The agent's effective rules: groups with the longest UA token
    * prefix-matching `agent` (so a `graftbot` line governs
    * `graftbot/1.0`); `*` groups only when no named token matches. */
  def rulesFor(groups: Vector[(Vector[String], Vector[Rule])],
               agent: String): Vector[Rule] = {
    val a = agent.toLowerCase
    def matchLen(g: (Vector[String], Vector[Rule])): Int =
      g._1.iterator.filter(t => t != "*" && a.startsWith(t)).map(_.length)
        .maxOption.getOrElse(-1)
    val best = groups.iterator.map(matchLen).maxOption.getOrElse(-1)
    if (best >= 0)
      groups.iterator.filter(g => matchLen(g) == best).flatMap(_._2).toVector
    else
      groups.iterator.filter(_._1.contains("*")).flatMap(_._2).toVector
  }

  /** Crawl-delay seconds for the agent's group (the de-facto common
    * extension; not part of the compiled hot path). Group selection is
    * rulesFor's longest-token-match — the delay always comes from the
    * group whose RULES govern the agent. */
  def crawlDelay(txt: String, agent: String): Option[Double] = {
    val (groups, _, delays) = parseAll(txt)
    val a = agent.toLowerCase
    def matchLen(g: (Vector[String], Vector[Rule])): Int =
      g._1.iterator.filter(t => t != "*" && a.startsWith(t)).map(_.length)
        .maxOption.getOrElse(-1)
    val best = groups.iterator.map(matchLen).maxOption.getOrElse(-1)
    val selected =
      if (best >= 0) groups.indices.filter(i => matchLen(groups(i)) == best)
      else groups.indices.filter(i => groups(i)._1.contains("*"))
    selected.iterator.flatMap(delays).nextOption()
  }

  /** Precedence-compiled rule program: entries `A<pattern>` /
    * `D<pattern>` sorted longest-pattern-first (Allow first on ties),
    * joined by U+0001 — so [[allowed]] is a first-match walk. */
  def compile(txt: String, agent: String): String = {
    val (groups, _) = parse(txt)
    rulesFor(groups, agent)
      .sortBy(r => (-r.pattern.length, if (r.allow) 0 else 1))
      .map(r => (if (r.allow) "A" else "D") + r.pattern)
      .mkString("\u0001")
  }

  /** First matching rule wins; no rule → allowed (RFC default). */
  def allowed(path: String, compiled: String): Boolean = {
    if (compiled.isEmpty) return true
    var start = 0
    while (start < compiled.length) {
      var end = compiled.indexOf('\u0001', start)
      if (end < 0) end = compiled.length
      if (end > start) {
        val allow = compiled.charAt(start) == 'A'
        if (globMatch(compiled.substring(start + 1, end), path)) return allow
      }
      start = end + 1
    }
    true
  }

  /** RFC 9309 pattern match: path-PREFIX semantics, `*` matches any
    * run of octets, a trailing `$` anchors the end of the path.
    * Iterative with single-star backtracking — no regex compilation in
    * the per-URL hot path. */
  def globMatch(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    var pi = 0; var si = 0
    var starPi = -1; var starSi = 0
    while (si < path.length) {
      if (pi < p.length && p.charAt(pi) == '*') {
        starPi = pi; starSi = si; pi += 1
      } else if (pi < p.length && p.charAt(pi) == path.charAt(si)) {
        pi += 1; si += 1
      } else if (pi == p.length && !anchored) {
        return true // pattern consumed: prefix matched
      } else if (starPi >= 0) {
        starSi += 1; si = starSi; pi = starPi + 1
      } else {
        return false
      }
    }
    // path consumed: trailing '*'s match the empty tail
    while (pi < p.length && p.charAt(pi) == '*') pi += 1
    pi == p.length
  }
}

/** `robots_compile(robots_txt, agent)` → precedence-compiled rule
  * program for [[RobotsAllowed]]. Run on the HOST side of the join. */
case class RobotsCompile(txt: Expression, agent: Expression)
    extends BinaryExpression {

  override def left: Expression = txt
  override def right: Expression = agent
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (txt.dataType, agent.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (t, a) => TypeCheckResult.TypeCheckFailure(
        s"robots_compile expects (string, string), got (${t.sql}, ${a.sql})")
    }

  def compileU(t: UTF8String, a: UTF8String): UTF8String =
    UTF8String.fromString(RobotsTxt.compile(t.toString, a.toString))

  override protected def nullSafeEval(t: Any, a: Any): Any =
    compileU(t.asInstanceOf[UTF8String], a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rc", this, classOf[RobotsCompile].getName)
    nullSafeCodeGen(ctx, ev, (t, a) => s"${ev.value} = $ref.compileU($t, $a);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(txt = newLeft, agent = newRight)

  override def prettyName: String = "robots_compile"
}

/** `robots_allowed(path, compiled)` → whether the compiled rules admit
  * the path. Null-compiled (no robots row for the host) is handled by
  * the CALLER (coalesce to true — an absent robots.txt allows). */
case class RobotsAllowed(path: Expression, compiled: Expression)
    extends BinaryExpression {

  override def left: Expression = path
  override def right: Expression = compiled
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (path.dataType, compiled.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (p, c) => TypeCheckResult.TypeCheckFailure(
        s"robots_allowed expects (string, string), got (${p.sql}, ${c.sql})")
    }

  def allowedB(p: UTF8String, c: UTF8String): Boolean =
    RobotsTxt.allowed(p.toString, c.toString)

  override protected def nullSafeEval(p: Any, c: Any): Any =
    allowedB(p.asInstanceOf[UTF8String], c.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ra", this, classOf[RobotsAllowed].getName)
    nullSafeCodeGen(ctx, ev, (p, c) => s"${ev.value} = $ref.allowedB($p, $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(path = newLeft, compiled = newRight)

  override def prettyName: String = "robots_allowed"
}
