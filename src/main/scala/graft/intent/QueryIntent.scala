package graft.intent

import java.time.{DayOfWeek, LocalDate, YearMonth, ZoneOffset, ZonedDateTime}

/** F7: temporal-intent classification — regex parse of time language in a
  * query ("last week", "in March", "two months ago", "from Nov to Feb",
  * "recently") into since/until bounds plus graph/recency adjustments.
  * Pure Scala port of the reference semantics (query_intent.py:105-305):
  * runs on the driver before the plan is composed, so it never touches
  * Spark. Branch order (most → least specific) matches the reference.
  */
object QueryIntent {

  case class TemporalIntent(
      since: Option[String] = None,
      until: Option[String] = None,
      recencyBoost: Boolean = false,
      suppressGraph: Boolean = false)

  case class SearchAdjustments(
      since: Option[String] = None,
      until: Option[String] = None,
      graphWeight: Option[Double] = None,
      recencyWeight: Option[Double] = None,
      autoDetected: Boolean = false)

  private val WordToNum = Map(
    "a" -> 1, "an" -> 1, "one" -> 1, "two" -> 2, "three" -> 3, "four" -> 4,
    "five" -> 5, "six" -> 6, "seven" -> 7, "eight" -> 8, "nine" -> 9,
    "ten" -> 10, "eleven" -> 11, "twelve" -> 12, "few" -> 3, "couple" -> 2,
    "several" -> 4)

  private val MonthNames = Map(
    "january" -> 1, "february" -> 2, "march" -> 3, "april" -> 4, "may" -> 5,
    "june" -> 6, "july" -> 7, "august" -> 8, "september" -> 9,
    "october" -> 10, "november" -> 11, "december" -> 12,
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "jun" -> 6, "jul" -> 7,
    "aug" -> 8, "sep" -> 9, "oct" -> 10, "nov" -> 11, "dec" -> 12)

  private val WeekdayNames = Map(
    "monday" -> 0, "tuesday" -> 1, "wednesday" -> 2, "thursday" -> 3,
    "friday" -> 4, "saturday" -> 5, "sunday" -> 6)

  private val monthPat = MonthNames.keys.mkString("|")
  private val weekdayPat = WeekdayNames.keys.mkString("|")
  private val numPat = "(?:\\d+|" + WordToNum.keys.mkString("|") + ")"

  private val MonthRange =
    s"(?i)(?:from\\s+|between\\s+)($monthPat)\\s+(?:to|and)\\s+($monthPat)".r.unanchored
  private val InMonth = s"(?i)(?:in|from|during|month\\s+of)\\s+($monthPat)\\b".r.unanchored
  private val Yesterday = "(?i)\\byesterday\\b".r.unanchored
  private val LastPeriod = "(?i)\\blast\\s+(week|month|year)\\b".r.unanchored
  private val LastWeekday = s"(?i)\\blast\\s+($weekdayPat)\\b".r.unanchored
  private val NAgo = s"(?i)\\b($numPat)\\s+(day|week|month|year)s?\\s+ago\\b".r.unanchored
  private val PastN = s"(?i)\\b(?:past|last)\\s+($numPat)\\s+(day|week|month|year)s?\\b".r.unanchored
  private val ThisPeriod = "(?i)\\bthis\\s+(week|month|year)\\b".r.unanchored
  private val Recency = "(?i)\\b(?:recently|latest|most\\s+recent|newest)\\b".r.unanchored

  private def iso(d: LocalDate): String = f"${d.getYear}%04d-${d.getMonthValue}%02d-${d.getDayOfMonth}%02dT00:00:00Z"
  private def isoEnd(d: LocalDate): String = f"${d.getYear}%04d-${d.getMonthValue}%02d-${d.getDayOfMonth}%02dT23:59:59Z"
  private def parseNumber(s: String): Int =
    s.toIntOption.getOrElse(WordToNum.getOrElse(s.toLowerCase, 1))
  private def startOfWeek(d: LocalDate): LocalDate = d.minusDays(d.getDayOfWeek.getValue - 1L)
  private def startOfMonth(y: Int, m: Int): LocalDate = LocalDate.of(y, m, 1)
  private def endOfMonth(y: Int, m: Int): LocalDate = YearMonth.of(y, m).atEndOfMonth()

  /** Reference-exact branch ladder (query_intent.py:105-253). */
  def detectTemporalIntent(query: String, referenceDate: LocalDate): Option[TemporalIntent] = {
    val now = referenceDate
    MonthRange.findFirstMatchIn(query).map { m =>
      val m1 = MonthNames(m.group(1).toLowerCase)
      val m2 = MonthNames(m.group(2).toLowerCase)
      val endYear = if (m2 <= now.getMonthValue) now.getYear else now.getYear - 1
      val startYear = if (m1 > m2) endYear - 1 else endYear
      TemporalIntent(Some(iso(startOfMonth(startYear, m1))),
        Some(isoEnd(endOfMonth(endYear, m2))), suppressGraph = true)
    }.orElse(InMonth.findFirstMatchIn(query).map { m =>
      val mo = MonthNames(m.group(1).toLowerCase)
      val year = if (mo <= now.getMonthValue) now.getYear else now.getYear - 1
      TemporalIntent(Some(iso(startOfMonth(year, mo))),
        Some(isoEnd(endOfMonth(year, mo))), suppressGraph = true)
    }).orElse(Yesterday.findFirstMatchIn(query).map { _ =>
      val y = now.minusDays(1)
      TemporalIntent(Some(iso(y)), Some(isoEnd(y)), suppressGraph = true)
    }).orElse(LastPeriod.findFirstMatchIn(query).map { m =>
      m.group(1).toLowerCase match {
        case "week" =>
          val mon = startOfWeek(now).minusWeeks(1)
          TemporalIntent(Some(iso(mon)), Some(isoEnd(mon.plusDays(6))), suppressGraph = true)
        case "month" =>
          val (y, mo) = if (now.getMonthValue == 1) (now.getYear - 1, 12)
                        else (now.getYear, now.getMonthValue - 1)
          TemporalIntent(Some(iso(startOfMonth(y, mo))), Some(isoEnd(endOfMonth(y, mo))),
            suppressGraph = true)
        case _ =>
          TemporalIntent(Some(iso(LocalDate.of(now.getYear - 1, 1, 1))),
            Some(isoEnd(LocalDate.of(now.getYear - 1, 12, 31))), suppressGraph = true)
      }
    }).orElse(LastWeekday.findFirstMatchIn(query).map { m =>
      val target = WeekdayNames(m.group(1).toLowerCase)
      var daysBack = ((now.getDayOfWeek.getValue - 1) - target) % 7
      if (daysBack <= 0) daysBack += 7
      val d = now.minusDays(daysBack.toLong)
      TemporalIntent(Some(iso(d)), Some(isoEnd(d)), suppressGraph = true)
    }).orElse(NAgo.findFirstMatchIn(query).map { m =>
      val n = parseNumber(m.group(1))
      m.group(2).toLowerCase match {
        case "day" =>
          val t = now.minusDays(n.toLong)
          TemporalIntent(Some(iso(t)), Some(isoEnd(t)), suppressGraph = true)
        case "week" =>
          val mon = startOfWeek(now.minusWeeks(n.toLong))
          TemporalIntent(Some(iso(mon)), Some(isoEnd(mon.plusDays(6))), suppressGraph = true)
        case "month" =>
          val t = now.minusDays(n * 30L)
          TemporalIntent(Some(iso(t)), Some(isoEnd(t)), suppressGraph = true)
        case _ =>
          val t = now.minusDays(n * 365L)
          TemporalIntent(Some(iso(t)), Some(isoEnd(t)), suppressGraph = true)
      }
    }).orElse(PastN.findFirstMatchIn(query).map { m =>
      val n = parseNumber(m.group(1))
      val since = m.group(2).toLowerCase match {
        case "day"   => now.minusDays(n.toLong)
        case "week"  => now.minusWeeks(n.toLong)
        case "month" => now.minusDays(n * 30L)
        case _       => now.minusDays(n * 365L)
      }
      TemporalIntent(Some(iso(since)), None, suppressGraph = true)
    }).orElse(ThisPeriod.findFirstMatchIn(query).map { m =>
      val since = m.group(1).toLowerCase match {
        case "week"  => startOfWeek(now)
        case "month" => startOfMonth(now.getYear, now.getMonthValue)
        case _       => LocalDate.of(now.getYear, 1, 1)
      }
      TemporalIntent(Some(iso(since)), None, suppressGraph = true)
    }).orElse(Recency.findFirstMatchIn(query).map { _ =>
      TemporalIntent(recencyBoost = true)
    })
  }

  /** Caller-override merge (query_intent.py:266-305). */
  def classifyQuery(
      query: String,
      referenceDate: LocalDate,
      callerSince: Option[String] = None,
      callerUntil: Option[String] = None,
      callerGraphWeight: Option[Double] = None): SearchAdjustments =
    detectTemporalIntent(query, referenceDate) match {
      case None => SearchAdjustments(autoDetected = false)
      case Some(t) =>
        SearchAdjustments(
          since = callerSince.orElse(t.since),
          until = callerUntil.orElse(t.until),
          graphWeight =
            if (t.suppressGraph && callerGraphWeight.isEmpty) Some(0.0)
            else callerGraphWeight,
          recencyWeight = if (t.recencyBoost) Some(0.2) else None,
          autoDetected = true)
    }
}
