package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import java.time.{DayOfWeek, LocalDate}

/** M8: schedules. */
class ScheduleSpec extends AnyFunSuite {
  test("daily fires every day") {
    assert(Schedule.Daily().isEnabled(LocalDate.parse("2024-06-15")))
    assert(Schedule.Daily().isEnabled(LocalDate.parse("2024-06-16")))
  }

  test("weekly fires only on listed days") {
    val s = Schedule.Weekly(Seq(DayOfWeek.MONDAY, DayOfWeek.SATURDAY))
    assert(s.isEnabled(LocalDate.parse("2024-06-15")))  // Sat
    assert(s.isEnabled(LocalDate.parse("2024-06-10")))  // Mon
    assert(!s.isEnabled(LocalDate.parse("2024-06-12"))) // Wed
  }

  test("monthly: listed day, 'last', and short-month clamping") {
    val s = Schedule.Monthly(Seq(1, 15))
    assert(s.isEnabled(LocalDate.parse("2024-06-01")))
    assert(s.isEnabled(LocalDate.parse("2024-06-15")))
    assert(!s.isEnabled(LocalDate.parse("2024-06-20")))

    val last = Schedule.Monthly(Seq(-1))
    assert(last.isEnabled(LocalDate.parse("2024-02-29")))
    assert(!last.isEnabled(LocalDate.parse("2024-02-28")))
    assert(last.isEnabled(LocalDate.parse("2024-04-30")))

    // day 31 in a 30-day month fires on the 30th
    val d31 = Schedule.Monthly(Seq(31))
    assert(d31.isEnabled(LocalDate.parse("2024-04-30")))
    assert(d31.isEnabled(LocalDate.parse("2024-05-31")))
    assert(!d31.isEnabled(LocalDate.parse("2024-05-30")))
  }

  test("parse compact specs") {
    assert(Schedule.parse("daily") == Schedule.Daily())
    assert(Schedule.parse("incremental") == Schedule.Incremental)
    assert(Schedule.parse("weekly:1,6") ==
      Schedule.Weekly(Seq(DayOfWeek.MONDAY, DayOfWeek.SATURDAY)))
    assert(Schedule.parse("monthly:1,15,last") == Schedule.Monthly(Seq(1, 15, -1)))
    assertThrows[IllegalArgumentException](Schedule.parse("hourly"))
    assertThrows[IllegalArgumentException](Schedule.parse("weekly"))
  }
}
