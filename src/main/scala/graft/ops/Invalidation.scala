package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Incremental-maintenance planner: given a batch of CHANGED documents,
  * enumerate exactly which keys of which derived artifacts the change
  * touches — the "what do I refresh" answer that turns every index and
  * statistic in this engine into an O(batch) maintenance problem instead
  * of a rebuild (the materialized-view maintenance idea, e.g. Gupta &
  * Mumick '95's delta framing, applied to the pipeline's artifacts):
  *
  *  - `ivf_cell`  — the ANN cells whose partitions gain/lose rows
  *    ([[graft.ann.IvfIndex]] refreshes per cell);
  *  - `bm25_term` — the term-stats rows whose tf/df change
  *    ([[graft.search.BM25Index]] refreshes per term);
  *  - `shingle`   — the 3-gram hashes the Bloom decontamination gate and
  *    the LSH banding read ([[graft.text.BloomDecontam]] /
  *    [[graft.dedup.MinHashLsh]]).
  *
  * Scale shape: one pass over the batch per artifact family (assignment
  * is a broadcast argmin, terms/shingles are map-side explodes), output
  * is (id, artifact, key) — the worklist a maintenance scheduler groups
  * by artifact and joins against the stored tables. Nothing touches the
  * corpus: cost is O(batch), which is the entire point. */
object Invalidation {

  def plan(batch: DataFrame, centroids: DataFrame): DataFrame = {
    val cells = graft.ann.Ann
      .assign(batch.select(col("id"), col("embedding")), centroids)
      .select(col("id"), lit("ivf_cell").as("artifact"),
        col("ivf_cell").cast("string").as("key"))
    val terms = batch
      .select(col("id"), explode(TextFunctions.tokens(col("text"))).as("t"))
      .distinct()
      .select(col("id"), lit("bm25_term").as("artifact"), col("t").as("key"))
    val shingles = batch
      .select(col("id"),
        explode(array_distinct(TextFunctions.shingleHashes(col("text"), 3))).as("h"))
      .select(col("id"), lit("shingle").as("artifact"),
        col("h").cast("string").as("key"))
    cells.unionByName(terms).unionByName(shingles)
  }
}
