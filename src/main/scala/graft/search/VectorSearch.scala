package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** R1: brute-force vector top-k (kNN) with pre-filters and threshold
  * (reference memory_engine.py:1383-1440; qdrant_store.py:188-215).
  *
  * Plan shape: parquet scan (filters pushed down) → one codegen'd projection
  * computing the dot product → `TakeOrderedAndProject` for the top-k. No
  * shuffle: each partition computes its local top-k and only k rows travel
  * to the driver, so the plan is flat at any corpus size.
  *
  * Scale path beyond brute force: [[graft.ann.Ann]] (IVF-style partition
  * pruning). Brute-force exact scoring stays the correctness baseline, as in
  * the reference (exhaustive cosine over the collection).
  */
object VectorSearch {

  /** Attach a rounded cosine-similarity column for an L2-normalized query
    * vector (dot == cosine for normalized inputs). */
  def withSimilarity(memories: DataFrame, queryVec: Seq[Float], simCol: String = "sim"): DataFrame =
    memories.withColumn(simCol, roundScore(dot(col("embedding"), typedLit(queryVec))))

  /** Top-k by similarity with visibility filters; ties broken by id so
    * results are reproducible across engines (SURVEY.md §7.4). */
  def topK(
      memories: DataFrame,
      queryVec: Seq[Float],
      k: Int,
      sourcePrefix: Option[String] = None,
      includeArchived: Boolean = false,
      since: Option[String] = None,
      until: Option[String] = None,
      threshold: Option[Double] = None): DataFrame = {
    val filtered = memories.filter(
      Filters.visible(sourcePrefix, includeArchived, since, until))
    val scored = withSimilarity(filtered, queryVec)
    val thresholded = threshold.map(t => scored.filter(col("sim") >= t)).getOrElse(scored)
    thresholded
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }

  /** D1: novelty check — a text is novel iff its top-1 similarity against
    * the corpus is below the threshold (memory_engine.py:2187-2193, default
    * 0.88). Returns the top-1 row with an is_novel flag. */
  def novelty(memories: DataFrame, queryVec: Seq[Float], threshold: Double = 0.88): DataFrame =
    topK(memories, queryVec, k = 1, includeArchived = true)
      .withColumn("is_novel", col("sim") < threshold)

  /** [[novelty]] answered from the persisted IVF index — the ingest-path
    * gate as the reference runs it: `is_novel` per add probes the ANN
    * store (memory_engine.py:548-561), never a corpus scan. The top-1
    * comes from the nprobe probed cell dirs
    * ([[graft.ann.IvfIndex.probedCandidates]]) — IVF's standard recall
    * trade, adjudicated by `d1_novelty_indexed`'s probed-cell-restricted
    * oracle; the plan reads NO corpus table at all (pinned by
    * PlanAuditSpec). Archived rows are still visible, exactly like the
    * in-session gate (the index carries every live doc). */
  def noveltyIndexed(spark: org.apache.spark.sql.SparkSession, ivfPath: String,
                     queryVec: Seq[Float], threshold: Double = 0.88,
                     nprobe: Int = 2): DataFrame =
    graft.ann.IvfIndex.probedCandidates(spark, ivfPath, queryVec, nprobe)
      .orderBy(desc("sim"), asc("id"))
      .limit(1)
      .select(col("id"), col("sim"), (col("sim") < threshold).as("is_novel"))
}
