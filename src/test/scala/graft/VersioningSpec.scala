package graft

import org.apache.spark.sql.functions._
import graft.ops.Versioning

/** M12/O7 semantics on a hand-built version table: a 3-deep chain, a
  * 2-deep chain, and an unversioned row side by side — plus the fail-loud
  * contract on a supersedes cycle (corrupt state must raise, not truncate).
  */
class VersioningSpec extends SparkSpec {

  import java.sql.Timestamp

  private def ts(day: Int) = Timestamp.from(
    java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(day * 86400L))

  // (id, text, source, created_at, supersedes, is_latest)
  //  1 -> 11 -> 21  (3-deep), 2 -> 12 (2-deep), 3 (no history)
  private def versions() = {
    import spark.implicits._
    Seq(
      (1L, "a v1", "s", ts(0), None: Option[Long], false),
      (11L, "a v2", "s", ts(10), Some(1L), false),
      (21L, "a v3", "s", ts(20), Some(11L), true),
      (2L, "b v1", "s", ts(0), None, false),
      (12L, "b v2", "s", ts(15), Some(2L), true),
      (3L, "c v1", "s", ts(0), None, true)
    ).toDF("id", "text", "source", "created_at", "supersedes", "is_latest")
  }

  test("versionChains walks a 3-deep chain to the origin, depths 0..2") {
    val out = Versioning.versionChains(versions())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == Seq(
      (12L, 12L, 0), (12L, 2L, 1),
      (21L, 21L, 0), (21L, 11L, 1), (21L, 1L, 2)))
  }

  test("unversioned latest rows carry no chain") {
    val heads = Versioning.versionChains(versions())
      .select("head_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!heads.contains(3L))
  }

  test("a supersedes cycle fails loudly instead of truncating") {
    import spark.implicits._
    val cyclic = Seq(
      (1L, "x", "s", ts(0), Some(2L), true),
      (2L, "y", "s", ts(1), Some(1L), false)
    ).toDF("id", "text", "source", "created_at", "supersedes", "is_latest")
    val e = intercept[IllegalArgumentException] {
      Versioning.versionChains(cyclic, maxDepth = 5).count()
    }
    assert(e.getMessage.contains("supersedes cycle"))
  }

  test("asOfSnapshot returns exactly the versions live at T") {
    // T = day 12: chain a shows v2 (v1 superseded day 10, v3 not yet),
    // chain b shows v1 (v2 arrives day 15), c shows its only version
    val out = Versioning.asOfSnapshot(versions(), asOfEpoch =
      java.time.Instant.parse("2024-01-13T00:00:00Z").getEpochSecond)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(11L, 2L, 3L))
  }

  test("asOfSnapshot under a planted double successor: no duplicates, earliest wins") {
    import spark.implicits._
    // corrupt state: 11 and 12 BOTH claim supersedes=1 (day 10 / day 15)
    val corrupt = Seq(
      (1L, "v1", "s", ts(0), None: Option[Long], false),
      (11L, "v2a", "s", ts(10), Some(1L), true),
      (12L, "v2b", "s", ts(15), Some(1L), true)
    ).toDF("id", "text", "source", "created_at", "supersedes", "is_latest")
    def idsAt(day: Int) = Versioning.asOfSnapshot(corrupt, asOfEpoch =
      java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond + day * 86400L)
      .collect().map(_.getLong(0)).toSeq
    // day 5: only v1, and exactly ONCE (the naive left join fans it out x2)
    assert(idsAt(5) == Seq(1L))
    // day 12: v1's validity ended at the EARLIEST successor (day 10)
    assert(idsAt(12) == Seq(11L))
  }

  test("asOfSnapshot before any supersede returns the original corpus") {
    val out = Versioning.asOfSnapshot(versions(), asOfEpoch =
      java.time.Instant.parse("2024-01-02T00:00:00Z").getEpochSecond)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 3L))
  }

  test("versionedFixture holds 1-, 2- and 3-deep chains side by side") {
    val mem = graft.core.Corpus.memories(spark, sf())
    val chains = Versioning.versionChains(Versioning.versionedFixture(mem))
    val depths = chains.groupBy("head_id").agg(max("depth").as("d"))
      .select("d").distinct().collect().map(_.getInt(0)).toSet
    // 2-deep chains head at v2 (max depth 1), 3-deep at v3 (max depth 2)
    assert(depths == Set(1, 2))
  }
}
