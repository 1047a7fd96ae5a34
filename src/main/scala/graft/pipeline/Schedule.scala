package graft.pipeline

import java.time.{DayOfWeek, LocalDate}
import java.time.temporal.TemporalAdjusters

/**
 * Job schedules: whether a job is due on a given run date.
 * Capability surface mirrors the reference
 * (reference: pramen/core .../core/schedule/ScheduleParser.scala:20,
 * api/jobdef/Schedule) — daily, weekly (days of week), monthly (days
 * of month, -1/"last" = last day), incremental.
 */
sealed trait Schedule {
  def isEnabled(runDate: LocalDate): Boolean
}

object Schedule {
  case object Incremental extends Schedule {
    def isEnabled(runDate: LocalDate): Boolean = true
  }

  final case class Daily() extends Schedule {
    def isEnabled(runDate: LocalDate): Boolean = true
  }

  final case class Weekly(days: Seq[DayOfWeek]) extends Schedule {
    require(days.nonEmpty, "Weekly schedule needs at least one day of week")
    def isEnabled(runDate: LocalDate): Boolean = days.contains(runDate.getDayOfWeek)
  }

  /** Days of month; -1 means the last day of the month. */
  final case class Monthly(days: Seq[Int]) extends Schedule {
    require(days.nonEmpty, "Monthly schedule needs at least one day of month")
    def isEnabled(runDate: LocalDate): Boolean = {
      val lastDay = runDate.`with`(TemporalAdjusters.lastDayOfMonth()).getDayOfMonth
      days.exists {
        case -1 => runDate.getDayOfMonth == lastDay
        case d  => d == runDate.getDayOfMonth ||
          // e.g. day 31 in a 30-day month fires on the last day
          (d > lastDay && runDate.getDayOfMonth == lastDay)
      }
    }
  }

  /**
   * Parse from a compact string spec:
   * `"daily"`, `"weekly:1,6"` (ISO day numbers), `"monthly:1,15,last"`,
   * `"incremental"`.
   */
  def parse(spec: String): Schedule = {
    val parts = spec.trim.split(":", 2)
    parts(0).toLowerCase match {
      case "daily"       => Daily()
      case "incremental" => Incremental
      case "weekly" =>
        require(parts.length == 2, "weekly schedule needs days, e.g. weekly:1,7")
        Weekly(parts(1).split(",").map(d => DayOfWeek.of(d.trim.toInt)).toSeq)
      case "monthly" =>
        require(parts.length == 2, "monthly schedule needs days, e.g. monthly:1,last")
        Monthly(parts(1).split(",").map { d =>
          val t = d.trim.toLowerCase
          if (t == "last" || t == "l") -1 else t.toInt
        }.toSeq)
      case other => throw new IllegalArgumentException(s"Unknown schedule type: $other")
    }
  }
}
