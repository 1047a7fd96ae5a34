package graft.expr

import org.scalatest.funsuite.AnyFunSuite

import java.time.LocalDate

/** M7: date-expression DSL. */
class DateExprSpec extends AnyFunSuite {
  private val d = LocalDate.parse("2024-06-15") // a Saturday

  private def ev(expr: String): Any = DateExpr("infoDate" -> d, "runDate" -> d).eval(expr)

  test("plain variable and literals") {
    assert(ev("@infoDate") == d)
    assert(ev("'2024-01-31'") == LocalDate.parse("2024-01-31"))
    assert(ev("42") == 42)
  }

  test("date plus/minus days") {
    assert(ev("@infoDate - 1") == d.minusDays(1))
    assert(ev("@infoDate + 10") == d.plusDays(10))
    assert(ev("@infoDate - 1 + 2") == d.plusDays(1))
  }

  test("date difference yields int") {
    assert(ev("@infoDate - '2024-06-01'") == 14)
  }

  test("month functions") {
    assert(ev("beginOfMonth(@infoDate)") == LocalDate.parse("2024-06-01"))
    assert(ev("endOfMonth(@infoDate)") == LocalDate.parse("2024-06-30"))
    assert(ev("lastDayOfMonth('2024-02-10')") == LocalDate.parse("2024-02-29")) // leap year
    assert(ev("monthOf(@infoDate)") == 6)
    assert(ev("yearOf(@infoDate)") == 2024)
    assert(ev("yearMonthOf(@infoDate)") == "2024-06")
    assert(ev("dayOfMonth(@infoDate)") == 15)
    assert(ev("dayOfWeek(@infoDate)") == 6) // ISO Saturday
  }

  test("plus/minus functions") {
    assert(ev("plusDays(@infoDate, 3)") == d.plusDays(3))
    assert(ev("minusWeeks(@infoDate, 2)") == d.minusWeeks(2))
    assert(ev("plusMonths(@infoDate, 1)") == LocalDate.parse("2024-07-15"))
    assert(ev("minusMonths('2024-03-31', 1)") == LocalDate.parse("2024-02-29"))
  }

  test("lastDayOfWeek family is previous-or-same") {
    assert(ev("lastSaturday(@infoDate)") == d) // already Saturday
    assert(ev("lastMonday(@infoDate)") == LocalDate.parse("2024-06-10"))
    assert(ev("lastSunday(@infoDate)") == LocalDate.parse("2024-06-09"))
  }

  test("nesting and parentheses") {
    assert(ev("beginOfMonth(@infoDate - 20)") == LocalDate.parse("2024-05-01"))
    assert(ev("lastMonday(beginOfMonth(@infoDate)) + 7") == LocalDate.parse("2024-06-03"))
    assert(ev("(@infoDate - 1) - 1") == d.minusDays(2))
  }

  test("errors: unknown var, unknown func, trailing input, type mismatch") {
    assertThrows[IllegalArgumentException](ev("@nope"))
    assertThrows[IllegalArgumentException](ev("frobnicate(@infoDate)"))
    assertThrows[IllegalArgumentException](ev("@infoDate - 1 xyz"))
    assertThrows[IllegalArgumentException](
      DateExpr("infoDate" -> d).evalInt("@infoDate"))
    assertThrows[IllegalArgumentException](
      DateExpr("infoDate" -> d).evalDate("5"))
  }
}
