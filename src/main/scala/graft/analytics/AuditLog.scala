package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** A9: append-only audit-trail query surface (reference audit_log.py:87-160:
  * filtered query with ORDER BY id DESC + LIMIT/OFFSET, the same-filter
  * count, and a retention purge).
  *
  * The audit table is append-only: `query`/`count` are pure reads, and
  * `purge` returns the retained state rather than mutating in place — at
  * scale the retained set is what gets rewritten (or, on a date-partitioned
  * store, the purge is a partition drop; the anti-join here is the general
  * form for stores without date partitioning).
  */
object AuditLog {

  /** Deterministic audit fixture derived from the events table (schema
    * mirrors audit_log.py:36-47: id, ts, action, key_id, key_name,
    * resource_id, source_prefix, ip). */
  def auditLog(spark: SparkSession, sfDir: String, nDocs: Long): DataFrame =
    Tables.events(spark, sfDir).select(
      col("event_id").as("id"),
      col("ts"),
      when(col("event_type") === "view", "memory.read")
        .when(col("event_type") === "click", "memory.search")
        .when(col("event_type") === "purchase", "memory.write")
        .when(col("event_type") === "signup", "key.create")
        .otherwise("auth.denied").as("action"),
      concat(lit("k"), col("user_id") % 7).as("key_id"),
      concat(lit("key-"), col("user_id") % 7).as("key_name"),
      concat(lit("mem/"), col("event_id") % nDocs).as("resource_id"),
      concat(lit("src"), col("user_id") % 3).as("source_prefix"),
      concat(lit("10.0.0."), col("user_id") % 50).as("ip"))

  /** Filtered + paginated audit page, newest first (audit_log.py:87-115),
    * with the same-filter total as `total_matched` on every row (the
    * reference's separate count() call, fused into one job). All three
    * filters are optional equality predicates — pushed into the scan. */
  def query(audit: DataFrame,
            action: Option[String] = None,
            keyId: Option[String] = None,
            resourceId: Option[String] = None,
            limit: Int = 50, offset: Int = 0): DataFrame = {
    val filtered = Seq(
      action.map(col("action") === _),
      keyId.map(col("key_id") === _),
      resourceId.map(col("resource_id") === _)
    ).flatten.foldLeft(audit)(_ filter _)
    // same-filter total as a 1-row aggregate broadcast onto the page —
    // NOT an unpartitioned window, which would funnel the whole filtered
    // set through one task before the top-k sort
    val total = filtered.agg(count(lit(1)).as("total_matched"))
    filtered.crossJoin(broadcast(total))
      .orderBy(col("id").desc)
      .offset(offset).limit(limit)
  }

  /** Retention purge (audit_log.py:138-155): drop entries older than
    * `retentionDays` before `nowEpoch`. Returns the retained rows — the
    * purge set is computed as its own frame and removed by anti-join, the
    * general form when the store is not date-partitioned. */
  def purge(audit: DataFrame, retentionDays: Int, nowEpoch: Long): DataFrame = {
    val cutoff = timestamp_seconds(lit(nowEpoch - retentionDays * 86400L))
    val purged = audit.filter(col("ts") < cutoff).select("id")
    audit.join(purged, Seq("id"), "left_anti")
      .select("id", "ts", "action")
      .orderBy("id")
  }
}
