package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{DecayFunctions, VectorFunctions}

/** M1-M11 + R13: mutation semantics as pure DataFrame→DataFrame state
  * transitions (reference memory_engine.py:529-1312; llm_extract.py:534-817;
  * app.py:2685-2713). In a batch engine each of these is a merge job that
  * rewrites (or MERGEs into) the table; none hides a write inside a read
  * path — reinforcement (R13) is an explicit job.
  */
object Mutations {

  val NowEpoch: Long = DecayFunctions.RefNowEpoch
  private val nowTs = timestamp_seconds(lit(NowEpoch))

  /** Contiguous sequential ids (maxId+1 … maxId+N) in `order`-sort order
    * WITHOUT a global single-partition window: range-partition on the sort
    * keys (ordered, non-overlapping ranges → partition index == rank block),
    * rank locally per partition, then add per-partition count offsets. The
    * offsets pass touches only numPartitions scalars (the same bookkeeping
    * RDD.zipWithIndex does), so a 100 TB mutation batch never serializes
    * through one task. Ids equal the global row_number by `order` exactly. */
  private def withSeqId(df: DataFrame, order: Seq[Column], maxId: Long,
                        idCol: String): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    // INVARIANT: the counts job and the ranks+offsets job must see IDENTICAL
    // range boundaries. RangePartitioner's reservoir-sample seed derives from
    // the RDD id, so two independent executions of the same
    // repartitionByRange subplan can place boundary rows in different
    // partitions — persist() pins one materialization for both actions
    // (pinned by MutationsSpec "withSeqId runs its range partitioning once").
    val parted = df.repartitionByRange(n, order: _*)
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val local = parted.withColumn("_lrn",
      row_number().over(Window.partitionBy("_pid").orderBy(order: _*)))
    val counts = parted.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).init
    val offsetDf = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(counts.map(_._1).zip(offsets).map {
        case (pid, off) => org.apache.spark.sql.Row(pid, off)
      }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_pid", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("_off", org.apache.spark.sql.types.LongType))))
    val assigned = local.join(broadcast(offsetDf), Seq("_pid"))
      .withColumn(idCol, lit(maxId) + col("_off") + col("_lrn"))
      .drop("_pid", "_lrn", "_off")
    // materialize the (mutation-batch-sized) result off the cached
    // partitioning, then free it — the function leaves no cached corpus blocks
    val out = assigned.localCheckpoint(true)
    parted.unpersist()
    out
  }

  /** M1: add_memories — assign contiguous ids after the current max, stamp
    * timestamps (memory_engine.py:529-627). `maxId` is passed explicitly
    * (single-scalar aggregate of the target table). */
  def addMemories(newRows: DataFrame, maxId: Long): DataFrame =
    withSeqId(newRows, Seq(col("text"), col("source")), maxId, "id")
      .withColumn("created_at", nowTs)
      .withColumn("updated_at", nowTs)

  /** M2: update_memory — patch text for matching ids, bump updated_at; other
    * rows unchanged (memory_engine.py:981-1078). Returns the full new state
    * (the re-embed of changed rows happens downstream off the `changed`
    * flag). */
  def updateText(memories: DataFrame, patches: DataFrame): DataFrame =
    memories.join(patches.select(col("id"), col("new_text")), Seq("id"), "left")
      .withColumn("changed", col("new_text").isNotNull)
      .withColumn("text", coalesce(col("new_text"), col("text")))
      .withColumn("updated_at", when(col("changed"), nowTs).otherwise(col("updated_at")))
      .drop("new_text")

  /** M3: upsert by (source, entity_key) — update when the key exists, create
    * otherwise (memory_engine.py:1250-1312). Output: one row per incoming
    * record with the action taken and the target id (new ids follow maxId in
    * (source, entity_key) order). */
  def upsertByEntity(memories: DataFrame, incoming: DataFrame, maxId: Long): DataFrame = {
    val existing = memories.select(col("source"), col("entity_key"), col("id").as("existing_id"))
    val joined = incoming.join(existing, Seq("source", "entity_key"), "left")
    val updates = joined.filter(col("existing_id").isNotNull)
      .select(col("source"), col("entity_key"), lit("update").as("action"),
        col("existing_id").as("target_id"))
    val creates = withSeqId(joined.filter(col("existing_id").isNull),
        Seq(col("source"), col("entity_key")), maxId, "target_id")
      .select(col("source"), col("entity_key"), lit("create").as("action"),
        col("target_id"))
    updates.unionByName(creates)
  }

  /** M4: supersede — archive the old row, create a replacement carrying
    * `supersedes` + `previous_text` (memory_engine.py:719-741). Output: the
    * new-version rows. */
  def supersede(memories: DataFrame, targetIds: DataFrame, maxId: Long): DataFrame = {
    val targets = memories.join(targetIds, Seq("id"), "left_semi")
    withSeqId(targets.withColumnRenamed("id", "supersedes"),
        Seq(col("supersedes")), maxId, "id")
      .select(
        col("id"),
        concat(col("text"), lit(" [superseded]")).as("text"),
        col("source"),
        col("supersedes"),
        col("text").as("previous_text"),
        lit(true).as("is_latest"))
  }

  /** M5: merge N→1 — one new row per group with the members' texts joined
    * (ordered by member id), a `supersedes` link to every old row, olds
    * archived (memory_engine.py:743-764; app.py:3291). Output: one row per
    * (merged row, superseded member). */
  def mergeGroups(memories: DataFrame, groups: DataFrame, maxId: Long): DataFrame = {
    val members = memories.join(groups, "id")
    val merged = withSeqId(
      members
        .groupBy("group_id")
        .agg(
          concat_ws(" | ",
            transform(array_sort(collect_list(struct(col("id"), col("text")))),
              x => x.getField("text"))).as("text"),
          array_sort(collect_list(col("id"))).as("superseded")),
      Seq(col("group_id")), maxId, "new_id")
    merged.select(col("new_id").as("id"), col("text"),
        explode(col("superseded")).as("supersedes"))
      .orderBy("id", "supersedes")
  }

  /** M6: delete by source prefix — pinned rows are immune to pattern deletes
    * (memory_engine.py:864-918). Output: surviving state. */
  def deleteByPrefix(memories: DataFrame, prefix: String): DataFrame =
    memories.filter(!(col("source").startsWith(prefix) && !coalesce(col("pinned"), lit(false))))

  /** M7: link CRUD — add a typed edge unless it already exists or the target
    * is dangling (memory_engine.py:772-862). Output: the edge list after the
    * additions, exploded as (src, dst, link_type). */
  def addLinks(memories: DataFrame, newLinks: DataFrame): DataFrame = {
    val existing = memories
      .select(col("id").as("src"), explode_outer(col("links")).as("l"))
      .select(col("src"), col("l.to_id").as("dst"), col("l.link_type").as("link_type"))
      .filter(col("dst").isNotNull)
    val ids = memories.select(col("id"))
    val additions = newLinks
      .join(ids.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(ids.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst", "link_type")
    existing.unionByName(additions)
      .distinct()
      .orderBy("src", "dst", "link_type")
  }

  /** M8: folder rename — rewrite a source prefix across matching rows
    * (app.py:2685-2713). Output: (id, source) of changed rows. */
  def renameFolder(memories: DataFrame, from: String, to: String): DataFrame =
    memories.filter(col("source").startsWith(from))
      .select(col("id"),
        concat(lit(to), expr(s"substring(source, ${from.length + 1})")).as("source"))
      .orderBy("id")

  /** M9: lifecycle policy enforcement (memory_engine.py:1080-1248;
    * extraction_profiles.py). Longest-prefix policy match (broadcast join),
    * then: archive when age > ttl_days, or when read-time confidence <
    * threshold and age > min_age_days; pinned/archived rows untouched.
    * Output: (id, policy_prefix, action, reason). */
  def enforcePolicies(memories: DataFrame, policies: DataFrame,
                      nowEpoch: Long = NowEpoch): DataFrame = {
    val cand = memories.filter(!col("archived") && !col("pinned"))
    val matched = cand.join(broadcast(policies),
        col("source").startsWith(col("source_prefix")) || col("source_prefix") === "")
    val w = Window.partitionBy("id").orderBy(length(col("source_prefix")).desc)
    val best = matched.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
    val age = DecayFunctions.ageDays(col("created_at"), nowEpoch)
    val conf = DecayFunctions.halfLifeDecay(
      coalesce(col("last_reinforced_at"), col("updated_at"), col("created_at")),
      col("confidence_half_life_days"), nowEpoch)
    best.select(
      col("id"), col("source_prefix").as("policy_prefix"),
      when(age > col("ttl_days"), "archive_ttl")
        .when(conf < col("confidence_threshold") && age > col("min_age_days"),
          "archive_low_confidence")
        .otherwise("keep").as("action"))
      .orderBy("id")
  }

  /** M10: AUDN action executor (llm_extract.py:534-693). Decisions join the
    * target rows; pinned or archived targets demote destructive actions to
    * NOOP. Output: (fact_id, action, effective_action, target_id). */
  def executeAudn(memories: DataFrame, decisions: DataFrame): DataFrame = {
    val targets = memories.select(col("id").as("target_id"),
      col("pinned").as("t_pinned"), col("archived").as("t_archived"),
      lit(true).as("t_exists"))
    decisions.join(targets, Seq("target_id"), "left")
      .withColumn("effective_action",
        when(col("action").isin("UPDATE", "DELETE") &&
          (coalesce(col("t_pinned"), lit(false)) || coalesce(col("t_archived"), lit(false))),
          "NOOP")
          // missing-target sentinel: a real row with NULL pinned must not
          // be mistaken for a dangling target
          .when(col("action").isin("UPDATE", "DELETE") && col("t_exists").isNull, "NOOP")
          .otherwise(col("action")))
      .select("fact_id", "action", "effective_action", "target_id")
      .orderBy("fact_id")
  }

  /** M11: auto-linking — link each new row to its top-2 most similar
    * existing rows above a minimum score (llm_extract.py:701-817).
    * Output: (id, to_id, sim). */
  def autoLink(memories: DataFrame, newIds: DataFrame, minSim: Double = 0.2,
               corpusRows: Option[Long] = None): DataFrame = {
    val news = memories.join(newIds, Seq("id"), "left_semi")
      .select(col("id"), col("embedding"))
    val olds = memories.join(newIds, Seq("id"), "left_anti")
      .select(col("id"), col("embedding"))
    // bounded per-row top-2 scan (same kernel as D2/D8) instead of a
    // news×corpus nested-loop join that materializes every pair; beyond
    // broadcast scale `corpusRows` (table stats) selects the LSH path
    corpusRows.map(graft.dedup.Dedup.topNeighborsAuto(news, olds, 2, _))
      .getOrElse(graft.dedup.Dedup.topNeighbors(news, olds, searchK = 2))
      .filter(col("sim") >= minSim)
      .select(col("ia").as("id"), col("ib").as("to_id"), col("sim"))
      .orderBy("id", "to_id")
  }

  /** [[autoLink]] answered from the persisted IVF index over the existing
    * store — the last of the index-backed ingest gates (the reference
    * auto-links each added memory against its ANN store,
    * memory_engine.py:548-561 + the link pass): the whole batch of new
    * docs' link candidates come from ONE partition-pruned probed scan
    * ([[graft.ann.IvfIndex.probedCandidatesBatch]]), the existing corpus
    * is never scanned at all — not even for metadata (pinned by
    * PlanAuditSpec). Same top-2 + threshold semantics as [[autoLink]];
    * the candidate pool is the probed cells (IVF's recall trade,
    * adjudicated by `m11_auto_link_indexed`'s probed-cell-restricted
    * oracle). The index is over the PRE-add store, so self-matches cannot
    * occur by construction. */
  def autoLinkIndexed(spark: org.apache.spark.sql.SparkSession,
                      ivfPath: String, newMemories: DataFrame,
                      minSim: Double = 0.2, nprobe: Int = 2): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("id"))
    graft.ann.IvfIndex.probedCandidatesBatch(spark, ivfPath,
        newMemories.select(col("id").as("qid"), col("embedding").as("qv")),
        nprobe)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 2 && col("sim") >= minSim)
      .select(col("qid").as("id"), col("id").as("to_id"), col("sim"))
      .orderBy("id", "to_id")
  }

  /** R13: reinforcement as an explicit batch job — stamp
    * `last_reinforced_at` for the retrieved ids (memory_engine.py:945-950).
    * Output: (id, last_reinforced_at) for the touched rows. */
  def reinforce(memories: DataFrame, ids: DataFrame,
                nowEpoch: Long = NowEpoch): DataFrame =
    memories.join(ids, Seq("id"), "left_semi")
      .select(col("id"), timestamp_seconds(lit(nowEpoch)).as("last_reinforced_at"))
      .orderBy("id")
}
