package graft.jobs

import java.time.{Instant, ZoneOffset, ZonedDateTime}

/** Minimal UNIX 5-field cron evaluator (minute hour day-of-month month
  * day-of-week), supporting wildcards, step expressions, lists, and
  * ranges — enough to reproduce the reference's pull-model schedule check
  * (`TableDiscoveryAndUploadJob.java:127-139`, default hourly on the hour),
  * which only needs "when is the next execution after T".
  */
object CronSchedule {

  final case class Cron(min: Set[Int], hour: Set[Int], dom: Set[Int], mon: Set[Int], dow: Set[Int])

  private def field(spec: String, lo: Int, hi: Int): Set[Int] =
    spec.split(",").flatMap { part =>
      val (body, step) = part.split("/") match {
        case Array(b)    => (b, 1)
        case Array(b, s) => (b, s.toInt)
        case _ => throw new IllegalArgumentException(s"Bad cron field: $part")
      }
      val range = body match {
        case "*" => lo to hi
        case r if r.contains("-") =>
          val Array(a, b) = r.split("-"); a.toInt to b.toInt
        case n => n.toInt to n.toInt
      }
      range.by(step)
    }.toSet

  def parse(expr: String): Cron = expr.trim.split("\\s+") match {
    case Array(m, h, dom, mon, dow) =>
      Cron(field(m, 0, 59), field(h, 0, 23), field(dom, 1, 31),
        field(mon, 1, 12), field(dow, 0, 6))
    case _ => throw new IllegalArgumentException(s"Expected 5 cron fields: $expr")
  }

  /** Next matching minute strictly after `after` (UTC), like the reference's
    * ExecutionTime.nextExecution. Standard cron: when both day fields are
    * restricted, either may match. Searches at most a year of minutes.
    */
  def nextExecution(cron: Cron, after: Instant): Instant = {
    var t = ZonedDateTime.ofInstant(after, ZoneOffset.UTC)
      .withSecond(0).withNano(0).plusMinutes(1)
    val domAny = cron.dom.size == 31
    val dowAny = cron.dow.size == 7
    var i = 0
    while (i < 366 * 24 * 60) {
      val dayOk =
        if (domAny && dowAny) true
        else if (domAny) cron.dow(t.getDayOfWeek.getValue % 7)
        else if (dowAny) cron.dom(t.getDayOfMonth)
        else cron.dom(t.getDayOfMonth) || cron.dow(t.getDayOfWeek.getValue % 7)
      if (cron.min(t.getMinute) && cron.hour(t.getHour) &&
        cron.mon(t.getMonthValue) && dayOk) return t.toInstant
      t = t.plusMinutes(1)
      i += 1
    }
    throw new IllegalStateException(s"No cron execution within a year: $cron")
  }
}
