package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D5-D7: consolidation candidates and prune selection
  * (reference consolidator.py:36-278).
  *
  * The reference finds consolidation clusters with a per-seed query storm
  * (≤500 sampled seeds × hybrid-search k=10, consolidator.py:73-124); the
  * set-based equivalent is one similarity join + clustering with the same
  * thresholds — [[Dedup.findDuplicates]] + [[Clusters.similarClusters]] at
  * the consolidation threshold, with a min cluster size of 3.
  *
  * The LLM merge step itself (D6, consolidator.py:146-218) is out of engine
  * scope; its input (clusters) and output application (delete olds + add
  * merged with `consolidated_from`) are dataflow.
  */
object Consolidation {

  /** D5: consolidation clusters — similarity clustering with minClusterSize
    * = 3 (consolidator.py:96-124's grouping rule, set-based). */
  def consolidationClusters(memories: DataFrame, threshold: Double = 0.75,
                            maxCandidates: Int = 500): DataFrame = {
    // bounded work: the reference caps candidates with random.sample
    // (consolidator.py:78) — an id-ordered head cut would consolidate
    // only the OLDEST memories forever; the deterministic analogue of a
    // random sample is the hash-spread cut (the r15-verdict sample-bias
    // fix, [[graft.functions.SparkHash.spread]]), ties by id
    val bounded = memories
      .orderBy(graft.functions.SparkHash.spread(col("id")), col("id"))
      .limit(maxCandidates)
    val pairs = Dedup.findDuplicates(bounded, threshold)
    Clusters.similarClusters(pairs, threshold, minClusterSize = 3)
  }

  /** D7: prune candidates — never retrieved (anti-join vs retrieval_log)
    * AND older than the per-category threshold (detail 60d,
    * decision/learning 120d), pinned excluded (consolidator.py:221-278). */
  def pruneCandidates(memories: DataFrame, retrievalLog: DataFrame,
                      nowEpoch: Long): DataFrame = {
    val ageDays = (lit(nowEpoch) - unix_timestamp(col("created_at"))) / 86400.0
    val ageLimit = when(col("category") === "detail", 60.0).otherwise(120.0)
    memories
      .join(retrievalLog.select(col("memory_id").as("id")).distinct(), Seq("id"), "left_anti")
      .filter(!col("pinned") && !col("archived") && ageDays > ageLimit)
      .select(col("id"), col("category"), round(ageDays, 4).as("age_days"))
      .orderBy("id")
  }

  /** D6 application step: given (cluster, id) assignments and a merged-text
    * table (cluster → new text, from the out-of-scope LLM), produce the
    * merge write: olds archived, one new row per cluster with
    * `consolidated_from` (consolidator.py:202-218). */
  def applyConsolidation(clusters: DataFrame, mergedTexts: DataFrame,
                         maxId: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("cluster")
    mergedTexts.join(
        clusters.groupBy("cluster").agg(collect_list("id").as("consolidated_from")),
        "cluster")
      .select(
        (lit(maxId) + row_number().over(w)).as("id"),
        col("merged_text").as("text"),
        array_sort(col("consolidated_from")).as("consolidated_from"))
  }
}
