package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import graft.joins.Joins

/** Temporal-join semantics pinned on hand frames, plus the plan-shape
  * property that makes rangeJoinByTime scale: the bucketed form plans as an
  * equi-join, never a nested-loop product. */
class JoinsSpec extends SparkSpec {

  import spark.implicits._

  // ---- asOfBackward ----------------------------------------------------

  private def lefts = Seq(
    // (id, key, us)
    (1L, "a", 100L), (2L, "a", 205L), (3L, "a", 300L),
    (4L, "b", 50L), (5L, "b", 500L)
  ).toDF("id", "key", "l_us")

  private def rights = Seq(
    // (rid, key, us)
    (10L, "a", 100L),  // equal-time: must match left id=1 (at-or-before)
    (11L, "a", 200L), (12L, "a", 205L), // two candidates for id=2
    (13L, "a", 299L),
    (14L, "b", 400L)   // after b's first left row, before its second
  ).toDF("rid", "key", "r_us")

  private def asOf(tol: Long) =
    Joins.asOfBackward(lefts, rights, Seq("key"), "l_us", "r_us",
        rightCols = Seq("rid", "r_us"), rightTieCol = "rid", toleranceUs = tol)
      .select("id", "rid").as[(Long, Long)].collect().toMap

  test("asOfBackward picks latest at-or-before per key; unmatched drop") {
    val m = asOf(Long.MaxValue)
    assert(m == Map(1L -> 10L, 2L -> 12L, 3L -> 13L, 5L -> 14L))
    // id=4 (t=50, key=b) has no prior right row -> dropped
  }

  test("asOfBackward tolerance excludes matches older than the window") {
    val m = asOf(1L) // only equal/1us-apart survive: id=1 (Δ0), id=2 (Δ0), id=3 (Δ1)
    assert(m == Map(1L -> 10L, 2L -> 12L, 3L -> 13L))
  }

  test("asOfBackward breaks equal-time right ties by largest tie column") {
    val dup = Seq((20L, "a", 200L), (21L, "a", 200L)).toDF("rid", "key", "r_us")
    val got = Joins.asOfBackward(
        lefts.filter($"id" === 2), dup, Seq("key"), "l_us", "r_us",
        rightCols = Seq("rid"), rightTieCol = "rid")
      .select("rid").as[Long].head()
    assert(got == 21L)
  }

  // ---- rangeJoinByTime -------------------------------------------------

  test("rangeJoinByTime equals the naive cross-filter, boundary inclusive") {
    val a = Seq((1L, 0L), (2L, 100L), (3L, 250L)).toDF("aid", "a_us")
    val b = Seq((10L, 60L), (11L, 160L), (12L, 340L)).toDF("bid", "b_us")
    val tol = 60L
    val got = Joins.rangeJoinByTime(a, b, "a_us", "b_us", tol)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    val want = a.crossJoin(b)
      .filter(abs($"a_us" - $"b_us") <= tol)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(got.contains((1L, 10L)), "|0-60| == tol must be inclusive")
    assert(!got.contains((3L, 12L)), "|250-340| > tol must be excluded")
  }

  test("rangeJoinByTime honors extraKeys") {
    val a = Seq((1L, "u", 100L), (2L, "v", 100L)).toDF("aid", "k", "a_us")
    val b = Seq((10L, "u", 120L)).toDF("bid", "k", "b_us")
    val got = Joins.rangeJoinByTime(a, b, "a_us", "b_us", 60L, extraKeys = Seq("k"))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }

  test("rangeJoinByTime plans as an equi-join, not a nested-loop product") {
    val a = Seq((1L, 0L)).toDF("aid", "a_us")
    val b = Seq((10L, 60L)).toDF("bid", "b_us")
    val plan: SparkPlan = Joins.rangeJoinByTime(a, b, "a_us", "b_us", 60L)
      .queryExecution.executedPlan
    val bad = plan.collect {
      case p if p.nodeName.contains("CartesianProduct") => p
      case p if p.nodeName.contains("BroadcastNestedLoopJoin") => p
    }
    assert(bad.isEmpty, s"nested-loop shape in plan:\n$plan")
  }

  test("registered aj/rj queries return rows at sf0.001") {
    assert(Queries.all("aj_click_attribution")(spark, sf()).count() > 0)
    assert(Queries.all("rj_error_bursts")(spark, sf()).count() > 0)
  }

  // ---- fuzzy entity resolution ----------------------------------------

  test("bestFuzzyMatches: distinct-name grain, blocking, tie by name") {
    val recs = Seq(
      "Red Widget", "red widget", "rad widget", // 2 records of one name
      "blue widget", "green bolt", "grean bolt",
      "red nut", "red cap" // dist 3 but different blocks -> never paired
    ).toDF("nm")
    val got = graft.dedup.EntityResolution.bestFuzzyMatches(recs, "nm", maxDist = 3)
      .select("name", "n_records", "match_name", "dist")
      .as[(String, Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // 'red widget' counts both case variants; its best match at dist 1 is
    // 'rad widget'; 'blue widget' is 4 edits from either -> no match row
    assert(got("red widget") == ((2L, "rad widget", 1L)))
    assert(got("rad widget") == ((1L, "red widget", 1L)))
    assert(!got.contains("blue widget"))
    assert(got("green bolt") == ((1L, "grean bolt", 1L)))
    // cross-block pairs are never considered: 'red nut'/'red cap' are 3
    // edits apart but in different blocks, so neither appears at all
    assert(!got.contains("red nut") && !got.contains("red cap"))
    // every emitted match shares the blocking token with its name
    assert(got.forall { case (n, (_, m, _)) =>
      n.split(" ").last == m.split(" ").last })
  }

  test("blockingMetrics: hand-computed reduction ratio and pair completeness") {
    // 4 entities: "red nut"/"red cap" are a TRUE pair (dist 3) split
    // across blocks (nut/cap) — the blocking recall loss; "green bolt"/
    // "grean bolt" are a true pair SHARING a block. all_pairs = C(4,2)=6,
    // candidate = 1 (the bolt pair), true = 2, matched = 1
    val recs = Seq("red nut", "red cap", "green bolt", "grean bolt").toDF("nm")
    val r = graft.dedup.EntityResolution.blockingMetrics(recs, "nm", maxDist = 3)
      .as[(Long, Long, Long, Long, Long, Double, Double)].head()
    assert(r == ((4L, 6L, 1L, 2L, 1L, 0.833333, 0.5)))
  }

  test("registered er_fuzzy_parts returns rows at sf0.001") {
    assert(Queries.all("er_fuzzy_parts")(spark, sf()).count() > 0)
  }
}
