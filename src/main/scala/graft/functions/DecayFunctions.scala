package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exponential half-life decay used by the recency and confidence signals.
  *
  * Reference semantics: `0.5 ** (age_days / half_life_days)` with a 30-day
  * half-life for recency (memory_engine.py:1442-1465) and a per-source-prefix
  * half-life (default 90d) for confidence (memory_engine.py:920-963,
  * extraction_profiles.py:68-113).
  *
  * Determinism contract: "now" is always an explicit epoch-second constant
  * (never `current_timestamp()`), so the same query is reproducible across
  * engines and runs. Age is computed on epoch seconds / 86400.0, matching the
  * oracle's `(epoch(TIMESTAMP '<now>') - epoch(t)) / 86400.0`.
  */
object DecayFunctions {

  /** Fixed reference instant for all deterministic fixtures: 2026-08-01T00:00:00Z. */
  val RefNowEpoch: Long = java.time.Instant.parse("2026-08-01T00:00:00Z").getEpochSecond
  val RefNowSql: String = "TIMESTAMP '2026-08-01 00:00:00'"

  /** Age in fractional days between a timestamp column and a fixed epoch-second "now". */
  def ageDays(ts: Column, nowEpoch: Long = RefNowEpoch): Column =
    (lit(nowEpoch) - unix_timestamp(ts)) / 86400.0

  /** Half-life decay score in (0, 1]: 0.5 ^ (age/halfLife). Age is clamped to
    * >= 0 — the reference returns 1.0 for future timestamps
    * (memory_engine.py:1459-1460, 937-938). */
  def halfLifeDecay(ts: Column, halfLifeDays: Column, nowEpoch: Long = RefNowEpoch): Column =
    pow(lit(0.5), greatest(ageDays(ts, nowEpoch), lit(0.0)) / halfLifeDays)

  def halfLifeDecay(ts: Column, halfLifeDays: Double): Column =
    halfLifeDecay(ts, lit(halfLifeDays), RefNowEpoch)
}
