package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M12/O7: version-chain traversal and as-of-T time travel over supersede
  * state (reference memory_engine.py:719-741, llm_extract.py:605-661; the
  * temporal tests walk UPDATE→archive→is_latest chains,
  * tests/test_temporal.py:57-101).
  *
  * The reference stores one row per version: a superseding row carries
  * `supersedes` (the prior version's id) and the chain head carries
  * `is_latest`. These operators READ that state — [[Mutations.supersede]]
  * and [[Mutations.executeAudn]] produce it:
  *
  *  - [[versionChains]] reconstructs every entity's full history by walking
  *    `supersedes` links from each latest row back to the origin — the
  *    reference's get_memory_history traversal, as an iterative frontier
  *    join (the connected-components loop shape). Depth is bounded by the
  *    longest chain, not the table size: each round joins the (shrinking)
  *    frontier against the version table on id, which AQE broadcasts once
  *    the frontier fits. Fail-loud on `maxDepth` so a supersedes cycle
  *    (corrupt state) raises instead of silently truncating a chain.
  *
  *  - [[asOfSnapshot]] reconstructs the corpus as it stood at time T:
  *    a version is visible iff it existed at T (created_at <= T) and had
  *    not yet been superseded (its successor — the row whose `supersedes`
  *    points at it — was created after T, or never). One self-join, no
  *    recursion: validity intervals are adjacent links, not whole chains.
  */
object Versioning {

  /** (head_id, version_id, depth): every ancestor of every latest-with-
    * history row, depth 0 = the head itself, increasing toward the origin.
    */
  def versionChains(versions: DataFrame, maxDepth: Int = 20): DataFrame = {
    // the walk target: id -> its own supersedes pointer
    val nodes = versions.select(col("id").as("_nid"), col("supersedes").as("_nsup"))
    var frontier = versions
      .filter(col("is_latest") && col("supersedes").isNotNull)
      .select(col("id").as("head_id"), col("id").as("version_id"),
        col("supersedes").as("_sup"), lit(0).as("depth"))
      .localCheckpoint(true)
    var acc = frontier.select("head_id", "version_id", "depth")
    var depth = 0
    // rows still pointing at an ancestor; 1 scalar per round on the driver
    var remaining = frontier.filter(col("_sup").isNotNull).count()
    while (remaining > 0 && depth < maxDepth) {
      // follow one supersedes hop; checkpoint truncates the growing plan
      frontier = frontier.filter(col("_sup").isNotNull)
        .join(nodes, col("_sup") === col("_nid"))
        .select(col("head_id"), col("_nid").as("version_id"),
          col("_nsup").as("_sup"), (col("depth") + 1).as("depth"))
        .localCheckpoint(true)
      acc = acc.unionByName(frontier.select("head_id", "version_id", "depth"))
      depth += 1
      remaining = frontier.filter(col("_sup").isNotNull).count()
    }
    // fail-loud: a chain longer than maxDepth means a supersedes cycle or
    // corrupt state — silently truncating would return a wrong history
    require(remaining == 0,
      s"version chain did not terminate within $maxDepth hops " +
        s"($remaining rows still walking) — supersedes cycle?")
    acc.orderBy("head_id", "depth")
  }

  /** The corpus as it stood at epoch second `asOfEpoch`: (id, supersedes,
    * source, created_at) of every version visible at that instant.
    *
    * Corrupt-state guard (r9 verdict): the writers never produce two rows
    * claiming the same `supersedes` target, but time travel is exactly the
    * tool reached for when state IS corrupt — so the successor side
    * aggregates `_valid_to = min(created_at)` per predecessor before the
    * join. The join is then 1:1 by construction: a double-successor row
    * can never fan a version out into duplicates (its validity simply ends
    * at the EARLIEST successor, the only reading under which "not yet
    * superseded at T" stays well-defined). VersioningSpec plants a double
    * successor and pins the no-duplicate, earliest-wins behavior. */
  def asOfSnapshot(versions: DataFrame, asOfEpoch: Long): DataFrame = {
    val t = timestamp_seconds(lit(asOfEpoch))
    // a version's validity ends when its FIRST successor is created
    val succ = versions.filter(col("supersedes").isNotNull)
      .select(col("supersedes").as("_pid"), col("created_at"))
      .groupBy("_pid").agg(min("created_at").as("_valid_to"))
    versions.join(succ, col("id") === col("_pid"), "left")
      .filter(col("created_at") <= t &&
        (col("_valid_to").isNull || col("_valid_to") > t))
      .select("id", "supersedes", "source", "created_at")
      .orderBy("id")
  }

  /** Deterministic versioned fixture state over the memories corpus: every
    * id ≡ 7 (mod 100) gains a v2 (created +100 d), every id ≡ 7 (mod 200)
    * additionally a v3 (created +200 d) — so the fixture holds 1-, 2- and
    * 3-deep chains side by side. Version ids are arithmetic (+100000 /
    * +200000) so the DuckDB oracle mirrors the state as plain UNION ALL
    * arithmetic; chain-id assignment policy is [[Mutations.supersede]]'s
    * concern (tested by m4), not this read path's. */
  def versionedFixture(memories: DataFrame): DataFrame = {
    val base = memories.select(col("id"), col("text"), col("source"), col("created_at"))
    val originals = base.select(
      col("id"), col("text"), col("source"), col("created_at"),
      lit(null).cast("long").as("supersedes"),
      (!(col("id") % 100 === 7)).as("is_latest"))
    val v2 = base.filter(col("id") % 100 === 7).select(
      (col("id") + 100000L).as("id"),
      concat(lit("v2: "), col("text")).as("text"),
      col("source"),
      timestamp_seconds(unix_timestamp(col("created_at")) + 100L * 86400).as("created_at"),
      col("id").as("supersedes"),
      (!(col("id") % 200 === 7)).as("is_latest"))
    val v3 = base.filter(col("id") % 200 === 7).select(
      (col("id") + 200000L).as("id"),
      concat(lit("v3: "), col("text")).as("text"),
      col("source"),
      timestamp_seconds(unix_timestamp(col("created_at")) + 200L * 86400).as("created_at"),
      (col("id") + 100000L).as("supersedes"),
      lit(true).as("is_latest"))
    originals.unionByName(v2).unionByName(v3)
  }
}
