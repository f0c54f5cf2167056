package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ann.IvfIndex

/** The reference's FULL add path, composed from the index-backed ingest
  * gates (memory_engine.py:548-610: embed → is_novel against the ANN
  * store → insert → auto-link → index update), batch-shaped for 100 TB:
  * every decision for a whole incoming batch comes from ONE
  * partition-pruned probed scan of the store's persisted IVF index
  * ([[graft.ann.IvfIndex.probedCandidatesBatch]]) — the store itself is
  * never rescanned by an ingest, and only the rows that PASS the gate are
  * embedded into the indexes (one O(batch) refresh generation per index).
  *
  * The gate compares against the PRE-add store, so incoming rows never
  * match themselves and two near-identical rows inside one batch both
  * pass (the reference behaves the same — is_novel consults the store,
  * not the in-flight batch; intra-batch dedup is D8/StreamDedup's job
  * upstream). */
object IngestGateway {

  /** Gate + resolve a batch WITHOUT writing: per incoming row, the probed
    * top-1 similarity against the store decides novelty (no candidate or
    * top_sim < `noveltyThreshold` ⇒ added) and the probed top-2 at
    * `minLinkSim` count the auto-links an added row would receive
    * (memory_engine.py's link pass, [[Mutations.autoLinkIndexed]]'s
    * semantics). Pure — the decision report a dry-run/audit consumes.
    *
    * Output, one row per incoming doc:
    * (id, action 'added'|'skipped_duplicate', top_sim, top_match_id,
    * n_links — 0 for skipped rows: a duplicate writes nothing). */
  def gateBatch(spark: SparkSession, ivfPath: String, incoming: DataFrame,
                noveltyThreshold: Double = 0.88, minLinkSim: Double = 0.2,
                nprobe: Int = 2): DataFrame = {
    val probed = IvfIndex.probedCandidatesBatch(spark, ivfPath,
        incoming.select(col("id").as("qid"), col("embedding").as("qv")), nprobe)
      .withColumn("_rn", row_number().over(
        Window.partitionBy("qid").orderBy(desc("sim"), asc("id"))))
      .filter(col("_rn") <= 2)
      .localCheckpoint(true) // two consumers: the top-1 gate + the link count
    val top1 = probed.filter(col("_rn") === 1)
      .select(col("qid"), col("id").as("top_match_id"), col("sim").as("top_sim"))
    val links = probed.filter(col("sim") >= minLinkSim)
      .groupBy("qid").agg(count(lit(1)).as("_nl"))
    incoming.select(col("id").as("qid"))
      .join(top1, Seq("qid"), "left")
      .join(links, Seq("qid"), "left")
      .withColumn("action",
        when(col("top_sim").isNull || col("top_sim") < noveltyThreshold, "added")
          .otherwise("skipped_duplicate"))
      .select(col("qid").as("id"), col("action"), col("top_sim"),
        col("top_match_id"),
        when(col("action") === "added", coalesce(col("_nl"), lit(0L)))
          .otherwise(lit(0L)).as("n_links"))
      .orderBy("id")
  }

  /** [[gateBatch]] + the add itself: the rows that pass the gate land in
    * the BM25 / IVF / (optionally) LSH indexes as ONE refresh generation
    * each, sealed per index by the exactly-once `batchId` stamp (the same
    * guard as [[graft.streaming.EventStream.refreshBatch]] — a replayed
    * micro-batch no-ops). Returns the gate report (computed BEFORE the
    * writes, against the pre-add store). Exactly-once applies to the
    * INDEX STATE: a replayed batch recomputes its report against the
    * post-add store (the added rows now match themselves), so consumers
    * that need the original decisions persist the first report — the
    * indexes themselves cannot double-apply either way. */
  def ingestBatch(spark: SparkSession, incoming: DataFrame,
                  bm25Path: String, ivfPath: String,
                  lshPath: Option[String] = None,
                  noveltyThreshold: Double = 0.88, minLinkSim: Double = 0.2,
                  nprobe: Int = 2, batchId: Option[Long] = None): DataFrame = {
    val report = gateBatch(spark, ivfPath, incoming,
      noveltyThreshold, minLinkSim, nprobe).localCheckpoint(true)
    val novel = incoming.join(
      report.filter(col("action") === "added").select("id"), Seq("id"), "left_semi")
    def fresh(p: String) = !batchId.exists(b =>
      graft.sources.IndexManifest.lastBatch(p).exists(_ >= b))
    if (fresh(bm25Path))
      graft.search.BM25Index.refresh(spark, bm25Path, novel, batchId = batchId)
    if (fresh(ivfPath))
      IvfIndex.refresh(spark, ivfPath, novel, batchId = batchId)
    lshPath.filter(fresh).foreach(p =>
      graft.dedup.LshIndex.refresh(spark, p, novel.select("id", "text"),
        batchId = batchId))
    report
  }
}
