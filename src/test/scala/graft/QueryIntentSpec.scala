package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.intent.QueryIntent
import graft.intent.QueryIntent.TemporalIntent

/** F7 intent parser vs the reference's documented cases
  * (query_intent.py:105-253; tests/test_query_intent.py style). Reference
  * date pinned to Wed 2026-07-15. */
class QueryIntentSpec extends AnyFunSuite {

  private val ref = LocalDate.of(2026, 7, 15) // a Wednesday

  test("month range, no wrap") {
    val t = QueryIntent.detectTemporalIntent("meetings from March to May", ref).get
    assert(t == TemporalIntent(Some("2026-03-01T00:00:00Z"),
      Some("2026-05-31T23:59:59Z"), recencyBoost = false, suppressGraph = true))
  }

  test("month range wraps year (Nov to Feb)") {
    val t = QueryIntent.detectTemporalIntent("from November to February", ref).get
    assert(t.since.contains("2025-11-01T00:00:00Z"))
    assert(t.until.contains("2026-02-28T23:59:59Z"))
  }

  test("in-month picks most recent past occurrence") {
    val t = QueryIntent.detectTemporalIntent("decisions in March", ref).get
    assert(t.since.contains("2026-03-01T00:00:00Z"))
    assert(t.until.contains("2026-03-31T23:59:59Z"))
    val t2 = QueryIntent.detectTemporalIntent("what happened in September", ref).get
    assert(t2.since.contains("2025-09-01T00:00:00Z"))
  }

  test("yesterday") {
    val t = QueryIntent.detectTemporalIntent("what did I do yesterday", ref).get
    assert(t.since.contains("2026-07-14T00:00:00Z"))
    assert(t.until.contains("2026-07-14T23:59:59Z"))
  }

  test("last week is previous Mon-Sun") {
    val t = QueryIntent.detectTemporalIntent("notes from last week", ref).get
    assert(t.since.contains("2026-07-06T00:00:00Z"))
    assert(t.until.contains("2026-07-12T23:59:59Z"))
  }

  test("last month / last year") {
    val m = QueryIntent.detectTemporalIntent("last month", ref).get
    assert(m.since.contains("2026-06-01T00:00:00Z"))
    assert(m.until.contains("2026-06-30T23:59:59Z"))
    val y = QueryIntent.detectTemporalIntent("reviews last year", ref).get
    assert(y.since.contains("2025-01-01T00:00:00Z"))
    assert(y.until.contains("2025-12-31T23:59:59Z"))
  }

  test("last weekday never resolves to today") {
    val t = QueryIntent.detectTemporalIntent("last wednesday", ref).get
    assert(t.since.contains("2026-07-08T00:00:00Z")) // a week back, not today
    val fri = QueryIntent.detectTemporalIntent("last friday", ref).get
    assert(fri.since.contains("2026-07-10T00:00:00Z"))
  }

  test("two months ago uses 30-day months") {
    val t = QueryIntent.detectTemporalIntent("two months ago", ref).get
    assert(t.since.contains("2026-05-16T00:00:00Z")) // 60 days back
  }

  test("past N days sets since only") {
    val t = QueryIntent.detectTemporalIntent("past 10 days", ref).get
    assert(t.since.contains("2026-07-05T00:00:00Z"))
    assert(t.until.isEmpty)
    assert(t.suppressGraph)
  }

  test("word numbers: a couple of weeks") {
    val t = QueryIntent.detectTemporalIntent("couple weeks ago", ref).get
    // 2 weeks back -> week of Mon 2026-06-29
    assert(t.since.contains("2026-06-29T00:00:00Z"))
  }

  test("this month") {
    val t = QueryIntent.detectTemporalIntent("decisions this month", ref).get
    assert(t.since.contains("2026-07-01T00:00:00Z"))
    assert(t.until.isEmpty)
  }

  test("recently sets boost only") {
    val t = QueryIntent.detectTemporalIntent("recent changes, what is the latest plan", ref).get
    assert(t == TemporalIntent(None, None, recencyBoost = true, suppressGraph = false))
  }

  test("no temporal language -> None") {
    assert(QueryIntent.detectTemporalIntent("how does auth work", ref).isEmpty)
  }

  test("classifyQuery: caller overrides win; graph suppressed otherwise") {
    val a = QueryIntent.classifyQuery("in March", ref)
    assert(a.autoDetected && a.graphWeight.contains(0.0) && a.since.isDefined)
    val b = QueryIntent.classifyQuery("in March", ref,
      callerSince = Some("2020-01-01T00:00:00Z"), callerGraphWeight = Some(0.3))
    assert(b.since.contains("2020-01-01T00:00:00Z"))
    assert(b.graphWeight.contains(0.3))
    val c = QueryIntent.classifyQuery("latest status", ref)
    assert(c.recencyWeight.contains(0.2))
  }
}
