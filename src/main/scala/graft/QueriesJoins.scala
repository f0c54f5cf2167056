package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.joins.Joins

/** Registry section 4: join-shaped operators Spark lacks natively —
  * temporal joins (as-of, time-range) over the usage-event log and fuzzy
  * entity resolution — all built so the plan is an equi-join exchange
  * rather than a cartesian (see [[graft.joins.Joins]],
  * [[graft.dedup.EntityResolution]]).
  */
object QueriesJoins {

  import Queries.Q

  private val DayUs = 24L * 3600 * 1000000
  private val TenMinUs = 600L * 1000000

  val queries: Map[String, Q] = Map(
    // backward as-of join: each purchase attributed to the same user's most
    // recent click at-or-before it, within a 24h window (inner as-of —
    // unattributed purchases drop; nullable columns flip oracle dtypes)
    "aj_click_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("purchase_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("click_us"))
      Joins.asOfBackward(purchases, clicks, Seq("user_id"),
          leftTimeUs = "purchase_us", rightTimeUs = "click_us",
          rightCols = Seq("click_id", "click_us"), rightTieCol = "click_id",
          toleranceUs = DayUs)
        .select(col("event_id"), col("user_id"), col("purchase_us"),
          col("click_id"), (col("purchase_us") - col("click_us")).as("gap_us"))
        .orderBy("event_id")
    }),
    // bucketized time-range join: error/click cross-correlation within ±10min
    // (any user) — the inequality predicate becomes an equi-join on the
    // tolerance bucket, never a nested-loop product
    "rj_error_bursts" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), unix_micros(col("ts")).as("error_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), unix_micros(col("ts")).as("click_us"))
      Joins.rangeJoinByTime(errors, clicks, "error_us", "click_us", TenMinUs)
        .select(col("error_id"), col("click_id"),
          (col("click_us") - col("error_us")).as("delta_us"))
        .orderBy("error_id", "click_id")
    }),
    // fuzzy entity resolution over part names: distinct-name granularity,
    // last-token blocking, best match by (edit distance, name)
    "er_fuzzy_parts" -> ((s, dir) => {
      val parts = Tables.load(s, dir, "part")
      graft.dedup.EntityResolution.bestFuzzyMatches(parts, "p_name", maxDist = 3)
        .orderBy("name")
    }),
    // blocking-quality audit: reduction ratio + pair completeness of the
    // last-token blocking vs the exact all-pairs truth — the decision
    // table that grades a blocking scheme before it ships
    "er_blocking_metrics" -> ((s, dir) =>
      graft.dedup.EntityResolution.blockingMetrics(
        Tables.load(s, dir, "part"), "p_name", maxDist = 3)))

  val oracles: Map[String, String] = Map(
    "aj_click_attribution" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS purchase_us
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_us
        |           FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.purchase_us, c.click_id,
        |       p.purchase_us - c.click_us AS gap_us
        |FROM p ASOF JOIN c
        |  ON p.user_id = c.user_id AND p.purchase_us >= c.click_us
        |WHERE p.purchase_us - c.click_us <= 86400000000
        |ORDER BY p.event_id""".stripMargin,
    "rj_error_bursts" ->
      """WITH e AS (SELECT event_id AS error_id, epoch_us(ts) AS error_us
        |           FROM events WHERE event_type = 'error'),
        |     c AS (SELECT event_id AS click_id, epoch_us(ts) AS click_us
        |           FROM events WHERE event_type = 'click')
        |SELECT e.error_id, c.click_id, c.click_us - e.error_us AS delta_us
        |FROM e JOIN c ON abs(e.error_us - c.click_us) <= 600000000
        |ORDER BY 1, 2""".stripMargin,
    "er_fuzzy_parts" ->
      """WITH nm AS (
        |  SELECT lower(p_name) AS name,
        |         regexp_extract(lower(p_name), '([^ ]+)$', 1) AS blk,
        |         count(*) AS n_records
        |  FROM part GROUP BY 1, 2),
        |cand AS (
        |  SELECT a.name, a.n_records, b.name AS match_name,
        |         CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |  FROM nm a JOIN nm b ON a.blk = b.blk AND a.name <> b.name
        |  WHERE levenshtein(a.name, b.name) <= 3),
        |rk AS (SELECT *, row_number() OVER (
        |         PARTITION BY name ORDER BY dist, match_name) AS rn
        |       FROM cand)
        |SELECT name, CAST(n_records AS BIGINT) AS n_records, match_name, dist
        |FROM rk WHERE rn = 1 ORDER BY name""".stripMargin,
    "er_blocking_metrics" ->
      """WITH bn AS (
        |  SELECT DISTINCT lower(p_name) AS name,
        |         regexp_extract(lower(p_name), '([^ ]+)$', 1) AS blk
        |  FROM part),
        |bp AS (
        |  SELECT CAST(count(*) AS BIGINT) AS all_pairs,
        |    CAST(sum(CASE WHEN a.blk = b.blk THEN 1 ELSE 0 END) AS BIGINT) AS candidate_pairs,
        |    CAST(sum(CASE WHEN levenshtein(a.name, b.name) <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS true_pairs,
        |    CAST(sum(CASE WHEN a.blk = b.blk AND levenshtein(a.name, b.name) <= 3
        |      THEN 1 ELSE 0 END) AS BIGINT) AS matched_true_pairs
        |  FROM bn a JOIN bn b ON a.name < b.name)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM bn) AS n_entities,
        |  all_pairs, candidate_pairs, true_pairs, matched_true_pairs,
        |  round(1.0 - CAST(candidate_pairs AS DOUBLE) / all_pairs, 6) AS reduction_ratio,
        |  CASE WHEN true_pairs > 0
        |    THEN round(CAST(matched_true_pairs AS DOUBLE) / true_pairs, 6) END AS pair_completeness
        |FROM bp""".stripMargin)
}
