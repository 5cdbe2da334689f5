package graft.pipeline

import java.time.{Duration, Instant, ZonedDateTime, ZoneId}
import java.time.temporal.ChronoUnit

/** T1: cron-rule schedules with the reference's surface
  * (`/root/reference/provider.go:69-87` registers the rule with a cron
  * library; `clickhouse/reader/main.go:35` defaults `-schedule` to
  * `@midnight`). Supported:
  *
  *   - 5-field rules `min hour dom month dow` with `*`, lists `a,b`,
  *     ranges `a-b`, steps `*&#47;n` and `a-b/n`, month/day names
  *     (`JAN`..`DEC`, `SUN`..`SAT`), and the standard dom/dow union rule
  *     (when BOTH are restricted, a day matching EITHER fires);
  *   - descriptors `@midnight`/`@daily`, `@hourly`, `@weekly`,
  *     `@monthly`, `@yearly`/`@annually`;
  *   - `@every <dur>` with `h`/`m`/`s` components (`@every 1h30m`).
  *
  * `next` is pure (instant in → instant out), so schedules are testable
  * against a fake clock and the runner owns no time arithmetic.
  */
sealed trait Schedule {
  /** The first fire time STRICTLY after `from` (minute resolution for
    * cron rules; second resolution for `@every`/intervals). */
  def next(from: Instant, zone: ZoneId): Instant
}

object Schedule {

  /** Fixed-delay interval (the pre-cron `intervalSeconds` surface). */
  final case class Every(period: Duration) extends Schedule {
    require(!period.isNegative && !period.isZero, "period must be positive")
    def next(from: Instant, zone: ZoneId): Instant = from.plus(period)
  }

  /** Parsed 5-field cron rule. Sets are the matching values per field;
    * `domStar`/`dowStar` record whether the source field was `*` (needed
    * for the union rule — a parsed `*` and an explicit full range behave
    * differently on the day fields, exactly as in standard cron).
    */
  final case class Fields(minutes: Set[Int], hours: Set[Int], dom: Set[Int],
      months: Set[Int], dow: Set[Int], domStar: Boolean, dowStar: Boolean)
      extends Schedule {

    private def dayMatches(t: ZonedDateTime): Boolean = {
      val domOk = dom.contains(t.getDayOfMonth)
      val dowOk = dow.contains(t.getDayOfWeek.getValue % 7) // cron: SUN=0
      if (domStar && dowStar) true
      else if (domStar) dowOk
      else if (dowStar) domOk
      else domOk || dowOk // both restricted: union (standard cron)
    }

    def next(from: Instant, zone: ZoneId): Instant = {
      var t = from.atZone(zone).truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
      val limit = t.plusYears(5) // no rule has a gap this long
      while (t.isBefore(limit)) {
        if (!months.contains(t.getMonthValue))
          t = t.withDayOfMonth(1).truncatedTo(ChronoUnit.DAYS).plusMonths(1)
        else if (!dayMatches(t))
          t = t.truncatedTo(ChronoUnit.DAYS).plusDays(1)
        else if (!hours.contains(t.getHour))
          t = t.truncatedTo(ChronoUnit.HOURS).plusHours(1)
        else if (!minutes.contains(t.getMinute))
          t = t.plusMinutes(1)
        else return t.toInstant
      }
      throw new IllegalStateException(s"no fire time within 5 years of $from")
    }
  }

  private val monthNames = Seq("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
    "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")
  private val dayNames = Seq("SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT")

  private def names(field: String, kind: Seq[(String, Int)]): String =
    kind.foldLeft(field.toUpperCase) { case (s, (n, v)) => s.replace(n, v.toString) }

  /** One cron field → matching value set. */
  private def parseField(field: String, lo: Int, hi: Int,
      nameMap: Seq[(String, Int)] = Nil): Set[Int] = {
    val f = names(field, nameMap)
    f.split(',').flatMap { part =>
      val (rangePart, step) = part.split('/') match {
        case Array(r)    => (r, 1)
        case Array(r, s) => (r, s.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron field '$part'")
      }
      require(step > 0, s"bad cron step in '$part'")
      val (from, to) = rangePart match {
        case "*" => (lo, hi)
        case r if r.contains('-') =>
          val Array(a, b) = r.split('-'); (a.toInt, b.toInt)
        // A bare value with a step ("5/15") ranges to the max, like Vixie cron.
        case v if part.contains('/') => (v.toInt, hi)
        case v => val x = v.toInt; (x, x)
      }
      require(from >= lo && to <= hi && from <= to,
        s"cron field '$part' out of range [$lo,$hi]")
      (from to to by step).toSet
    }.toSet
  }

  private def parseEvery(dur: String): Every = {
    val m = "(?:(\\d+)h)?(?:(\\d+)m)?(?:(\\d+)s)?".r
    dur.trim match {
      case m(h, mi, s) if Seq(h, mi, s).exists(_ != null) =>
        def n(x: String) = Option(x).map(_.toLong).getOrElse(0L)
        Every(Duration.ofSeconds(n(h) * 3600 + n(mi) * 60 + n(s)))
      case other => throw new IllegalArgumentException(
        s"bad @every duration '$other' (want e.g. 90s, 10m, 1h30m)")
    }
  }

  /** Parse a cron rule / descriptor / `@every` duration. */
  def parse(rule: String): Schedule = rule.trim match {
    case "@midnight" | "@daily" => parse("0 0 * * *")
    case "@hourly"              => parse("0 * * * *")
    case "@weekly"              => parse("0 0 * * 0")
    case "@monthly"             => parse("0 0 1 * *")
    case "@yearly" | "@annually" => parse("0 0 1 1 *")
    case e if e.startsWith("@every ") => parseEvery(e.stripPrefix("@every "))
    case fields =>
      fields.split("\\s+") match {
        case Array(mi, h, dm, mo, dw) =>
          Fields(
            parseField(mi, 0, 59),
            parseField(h, 0, 23),
            parseField(dm, 1, 31),
            parseField(mo, 1, 12, monthNames.zipWithIndex.map { case (n, i) => (n, i + 1) }),
            // 7 is an alias for Sunday (0) in most crons
            parseField(dw, 0, 7, dayNames.zipWithIndex).map(d => if (d == 7) 0 else d),
            // Vixie cron sets the day-field star flag for ANY field
            // starting with '*' (so "*/2" in dom does NOT trigger the
            // dom/dow union rule).
            domStar = dm.startsWith("*"), dowStar = dw.startsWith("*"))
        case _ => throw new IllegalArgumentException(
          s"bad cron rule '$rule' (want 5 fields or a @descriptor)")
      }
  }
}
