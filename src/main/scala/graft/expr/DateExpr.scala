package graft.expr

import java.time.{DayOfWeek, LocalDate}
import java.time.temporal.TemporalAdjusters

/**
 * Date-arithmetic expression DSL used to derive information dates and
 * dependency windows, e.g. `@infoDate - 1`, `beginOfMonth(@runDate)`,
 * `lastSaturday(@infoDate) + 7`.
 *
 * Capability surface mirrors the reference evaluator
 * (reference: pramen/core .../core/expr/DateExprEvaluator.scala:1,
 * .../expr/parser/DateExpressionEvaluator.scala) but is a fresh
 * single-pass recursive-descent implementation.
 *
 * Grammar:
 * {{{
 *   expr    := term (('+' | '-') term)*
 *   term    := int | date-literal | '@'var | func '(' expr (',' expr)* ')' | '(' expr ')'
 *   date-literal := 'yyyy-MM-dd'  (single-quoted)
 * }}}
 * Values are either `LocalDate` or `Int`. `date + int` adds days;
 * `date - date` yields the day difference (Int).
 */
final class DateExpr(vars: Map[String, Any]) {

  def evalDate(expression: String): LocalDate = eval(expression) match {
    case d: LocalDate => d
    case other => throw new IllegalArgumentException(
      s"Expected a date from '$expression', got: $other")
  }

  def evalInt(expression: String): Int = eval(expression) match {
    case n: Int => n
    case other => throw new IllegalArgumentException(
      s"Expected a number from '$expression', got: $other")
  }

  def eval(expression: String): Any = {
    val p = new DateExpr.Parser(expression, vars)
    val v = p.parseExpr()
    p.expectEnd()
    v
  }
}

object DateExpr {
  def apply(vars: (String, Any)*): DateExpr = new DateExpr(vars.toMap)

  /** Convenience: evaluate with a single `@infoDate` variable bound. */
  def evalDate(expression: String, infoDate: LocalDate): LocalDate =
    DateExpr("infoDate" -> infoDate, "date" -> infoDate).evalDate(expression)

  private val FuncNames = Set(
    "monthOf", "yearOf", "yearMonthOf", "dayOfMonth", "dayOfWeek",
    "beginOfMonth", "endOfMonth", "lastDayOfMonth",
    "plusDays", "minusDays", "plusWeeks", "minusWeeks",
    "plusMonths", "minusMonths",
    "lastMonday", "lastTuesday", "lastWednesday", "lastThursday",
    "lastFriday", "lastSaturday", "lastSunday")

  private final class Parser(s: String, vars: Map[String, Any]) {
    private var pos = 0

    def parseExpr(): Any = {
      var left = parseTerm()
      skipWs()
      while (pos < s.length && (s(pos) == '+' || s(pos) == '-')) {
        val op = s(pos); pos += 1
        val right = parseTerm()
        left = applyOp(left, op, right)
        skipWs()
      }
      left
    }

    def expectEnd(): Unit = {
      skipWs()
      if (pos < s.length)
        fail(s"unexpected trailing input '${s.substring(pos)}'")
    }

    private def applyOp(l: Any, op: Char, r: Any): Any = (l, r) match {
      case (a: Int, b: Int) => if (op == '+') a + b else a - b
      case (d: LocalDate, n: Int) =>
        if (op == '+') d.plusDays(n.toLong) else d.minusDays(n.toLong)
      case (a: LocalDate, b: LocalDate) if op == '-' =>
        java.time.temporal.ChronoUnit.DAYS.between(b, a).toInt
      case _ => fail(s"cannot apply '$op' to $l and $r")
    }

    private def parseTerm(): Any = {
      skipWs()
      if (pos >= s.length) fail("unexpected end of expression")
      s(pos) match {
        case '(' =>
          pos += 1
          val v = parseExpr()
          expect(')')
          v
        case '\'' => parseDateLiteral()
        case '@' => pos += 1; parseVar()
        case c if c.isDigit => parseInt()
        case '-' if pos + 1 < s.length && s(pos + 1).isDigit =>
          pos += 1; val n = parseInt().asInstanceOf[Int]; -n
        case c if c.isLetter => parseFunc()
        case c => fail(s"unexpected character '$c'")
      }
    }

    private def parseDateLiteral(): LocalDate = {
      expect('\'')
      val end = s.indexOf('\'', pos)
      if (end < 0) fail("unterminated date literal")
      val lit = s.substring(pos, end)
      pos = end + 1
      LocalDate.parse(lit)
    }

    private def parseVar(): Any = {
      val name = parseIdent()
      vars.getOrElse(name, fail(s"undefined variable '@$name'"))
    }

    private def parseInt(): Any = {
      val start = pos
      while (pos < s.length && s(pos).isDigit) pos += 1
      s.substring(start, pos).toInt
    }

    private def parseIdent(): String = {
      val start = pos
      while (pos < s.length && (s(pos).isLetterOrDigit || s(pos) == '_')) pos += 1
      if (pos == start) fail("expected identifier")
      s.substring(start, pos)
    }

    private def parseFunc(): Any = {
      val name = parseIdent()
      if (!FuncNames.contains(name)) fail(s"unknown function '$name'")
      expect('(')
      val args = scala.collection.mutable.ArrayBuffer[Any](parseExpr())
      skipWs()
      while (pos < s.length && s(pos) == ',') { pos += 1; args += parseExpr(); skipWs() }
      expect(')')
      call(name, args.toSeq)
    }

    private def call(name: String, args: Seq[Any]): Any = {
      def date(i: Int): LocalDate = args(i) match {
        case d: LocalDate => d
        case o => fail(s"$name: argument ${i + 1} must be a date, got $o")
      }
      def int(i: Int): Int = args(i) match {
        case n: Int => n
        case o => fail(s"$name: argument ${i + 1} must be a number, got $o")
      }
      def arity(n: Int): Unit =
        if (args.length != n) fail(s"$name expects $n argument(s), got ${args.length}")

      def lastDow(d: LocalDate, dow: DayOfWeek): LocalDate =
        d.`with`(TemporalAdjusters.previousOrSame(dow))

      name match {
        case "monthOf"        => arity(1); date(0).getMonthValue
        case "yearOf"         => arity(1); date(0).getYear
        case "yearMonthOf"    => arity(1); val d = date(0); f"${d.getYear}%04d-${d.getMonthValue}%02d"
        case "dayOfMonth"     => arity(1); date(0).getDayOfMonth
        case "dayOfWeek"      => arity(1); date(0).getDayOfWeek.getValue
        case "beginOfMonth"   => arity(1); date(0).withDayOfMonth(1)
        case "endOfMonth" | "lastDayOfMonth" =>
          arity(1); date(0).`with`(TemporalAdjusters.lastDayOfMonth())
        case "plusDays"       => arity(2); date(0).plusDays(int(1).toLong)
        case "minusDays"      => arity(2); date(0).minusDays(int(1).toLong)
        case "plusWeeks"      => arity(2); date(0).plusWeeks(int(1).toLong)
        case "minusWeeks"     => arity(2); date(0).minusWeeks(int(1).toLong)
        case "plusMonths"     => arity(2); date(0).plusMonths(int(1).toLong)
        case "minusMonths"    => arity(2); date(0).minusMonths(int(1).toLong)
        case "lastMonday"     => arity(1); lastDow(date(0), DayOfWeek.MONDAY)
        case "lastTuesday"    => arity(1); lastDow(date(0), DayOfWeek.TUESDAY)
        case "lastWednesday"  => arity(1); lastDow(date(0), DayOfWeek.WEDNESDAY)
        case "lastThursday"   => arity(1); lastDow(date(0), DayOfWeek.THURSDAY)
        case "lastFriday"     => arity(1); lastDow(date(0), DayOfWeek.FRIDAY)
        case "lastSaturday"   => arity(1); lastDow(date(0), DayOfWeek.SATURDAY)
        case "lastSunday"     => arity(1); lastDow(date(0), DayOfWeek.SUNDAY)
        case _ => fail(s"unknown function '$name'")
      }
    }

    private def expect(c: Char): Unit = {
      skipWs()
      if (pos >= s.length || s(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    private def skipWs(): Unit = while (pos < s.length && s(pos).isWhitespace) pos += 1

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"Date expression error at pos $pos in '$s': $msg")
  }
}
