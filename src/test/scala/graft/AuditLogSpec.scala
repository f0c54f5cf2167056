package graft

import org.apache.spark.sql.functions._
import graft.analytics.AuditLog

/** A9 semantics on a hand-built audit trail: optional-filter composition,
  * newest-first pagination with the fused same-filter total, and the purge
  * retention boundary (entries exactly at the cutoff are retained —
  * audit_log.py:141 deletes strictly-older rows only). */
class AuditLogSpec extends SparkSpec {

  import java.sql.Timestamp

  private def ts(day: Int) = Timestamp.from(
    java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(day * 86400L))

  private def audit() = {
    import spark.implicits._
    (0 until 40).map { i =>
      (i.toLong, ts(i % 20), if (i % 2 == 0) "memory.read" else "memory.write",
        s"k${i % 3}", s"key-${i % 3}", s"mem/${i % 5}", "src0", "10.0.0.1")
    }.toDF("id", "ts", "action", "key_id", "key_name", "resource_id",
      "source_prefix", "ip")
  }

  test("query composes filters, pages newest-first, carries the total") {
    val page = AuditLog.query(audit(), action = Some("memory.read"),
      keyId = Some("k0"), limit = 3, offset = 1).collect()
    // memory.read ∧ k0: ids ≡ 0 (mod 6) → 0,6,12,18,24,30,36; desc skip 1
    assert(page.map(_.getLong(0)).toSeq == Seq(30L, 24L, 18L))
    assert(page.map(_.getAs[Long]("total_matched")).toSet == Set(7L))
  }

  test("no filters = whole-table page") {
    val page = AuditLog.query(audit(), limit = 2, offset = 0).collect()
    assert(page.map(_.getLong(0)).toSeq == Seq(39L, 38L))
    assert(page.head.getAs[Long]("total_matched") == 40L)
  }

  test("purge retains rows at or after the cutoff, drops strictly older") {
    val now = java.time.Instant.parse("2024-01-21T00:00:00Z").getEpochSecond
    val kept = AuditLog.purge(audit(), retentionDays = 10, nowEpoch = now)
      .select("id").collect().map(_.getLong(0)).toSet
    // cutoff = day 10 (Jan 21 − 10 d); fixture day = id % 20 → retained
    // iff id % 20 >= 10, with the day-10 rows exactly AT the cutoff kept
    assert(kept == (0 until 40).filter(_ % 20 >= 10).map(_.toLong).toSet)
  }
}
