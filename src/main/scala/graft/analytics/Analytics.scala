package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A1-A8: the analytics layer — straight aggregations over the memories
  * table and the usage-log tables (reference usage_tracker.py:364-861,
  * app.py:2273-2299, 2670-2682; memory_engine.py:2766-2809).
  *
  * Everything here is one or two shuffled aggregations with map-side partial
  * combine; at 100 TB the event tables are date-partitioned parquet and the
  * period filters prune partitions before the scan.
  */
object Analytics {

  /** A1: folder rollup — count memories per first path segment of `source`
    * (app.py:2670-2682). */
  def folderRollup(memories: DataFrame): DataFrame =
    memories
      .groupBy(split(col("source"), "/").getItem(0).as("folder"))
      .agg(count(lit(1)).as("n"))
      .orderBy("folder")

  /** A2: search-quality stats over a period (usage_tracker.py:364-445):
    * retrieval volume, rank distribution (top-3 vs deeper), feedback ratio,
    * distinct memories touched. One row. */
  def searchQuality(retrievalLog: DataFrame, feedback: DataFrame,
                    since: String, until: String): DataFrame = {
    val rl = retrievalLog.filter(col("ts").between(lit(since).cast("timestamp"), lit(until).cast("timestamp")))
    val fb = feedback.filter(col("ts").between(lit(since).cast("timestamp"), lit(until).cast("timestamp")))
    val r = rl.agg(
      count(lit(1)).as("total_retrievals"),
      countDistinct(col("memory_id")).as("distinct_memories"),
      sum(when(col("rank") <= 3, 1).otherwise(0)).as("top3"),
      countDistinct(col("query")).as("distinct_queries"))
    val f = fb.agg(
      sum(when(col("signal") === "useful", 1).otherwise(0)).as("useful"),
      sum(when(col("signal") === "not_useful", 1).otherwise(0)).as("not_useful"))
    r.crossJoin(f)
      .withColumn("top3_ratio", round(col("top3") / col("total_retrievals"), 6))
      .withColumn("useful_ratio", round(col("useful") / (col("useful") + col("not_useful")), 6))
  }

  /** A3: problem queries — repeated queries whose feedback is mostly
    * negative (usage_tracker.py:810-833). */
  def problemQueries(feedback: DataFrame, limit: Int = 20): DataFrame =
    feedback.groupBy("query")
      .agg(
        count(lit(1)).as("n_feedback"),
        sum(when(col("signal") === "not_useful", 1).otherwise(0)).as("not_useful"))
      .filter(col("n_feedback") >= 2 &&
        col("not_useful") / col("n_feedback") >= 0.5)
      .orderBy(desc("not_useful"), asc("query"))
      .limit(limit)

  /** A4: stale memories — retrieved ≥ minRetrievals times, have feedback,
    * zero useful votes (usage_tracker.py:835-861). */
  def staleMemories(retrievalLog: DataFrame, feedback: DataFrame,
                    minRetrievals: Int = 3): DataFrame = {
    val r = retrievalLog.groupBy("memory_id").agg(count(lit(1)).as("retrievals"))
    val f = feedback.groupBy("memory_id").agg(
      count(lit(1)).as("n_feedback"),
      sum(when(col("signal") === "useful", 1).otherwise(0)).as("useful"))
    r.join(f, "memory_id")
      .filter(col("retrievals") >= minRetrievals && col("useful") === 0)
      .select("memory_id", "retrievals", "n_feedback")
      .orderBy("memory_id")
  }

  /** A5: graph-search stats (usage_tracker.py:461-535): activation rate and
    * yield of the graph signal. One row. */
  def graphSearchStats(events: DataFrame): DataFrame =
    events.agg(
      count(lit(1)).as("total_searches"),
      sum(when(col("graph_weight") > 0, 1).otherwise(0)).as("graph_activated"),
      sum(when(col("graph_count") > 0, 1).otherwise(0)).as("with_graph_results"),
      sum(col("direct_count")).as("direct_results"),
      sum(col("graph_count")).as("graph_results"))

  /** A6: extraction quality per model (usage_tracker.py:536-809):
    * job counts, action sums, token costs, fallback rate. */
  def extractionQuality(outcomes: DataFrame): DataFrame =
    outcomes.groupBy("model")
      .agg(
        count(lit(1)).as("jobs"),
        sum("stored").as("stored"),
        sum("updated").as("updated"),
        sum("deleted").as("deleted"),
        sum("fallback").as("fallbacks"),
        sum("tokens").as("total_tokens"),
        round(avg("tokens"), 4).as("avg_tokens"))
      .orderBy("model")

  /** A6b: extraction token usage + estimated cost per model
    * (usage_tracker.py:607-662). The reference groups by
    * (provider, model, stage) then folds per model; the sums commute, so one
    * groupBy(model) is the same result. Pricing is a tiny when-ladder;
    * unknown models take the $1/$4-per-1M fallback (:644-646). */
  def usageTokens(tokens: DataFrame,
                  pricing: Map[String, (Double, Double)]): DataFrame = {
    def price(sel: ((Double, Double)) => Double, fallback: Double): Column =
      pricing.toSeq.sortBy(_._1).foldLeft(lit(fallback)) { case (acc, (m, p)) =>
        when(col("model") === m, lit(sel(p))).otherwise(acc)
      }
    tokens.groupBy("model")
      .agg(
        count(lit(1)).as("calls"),
        sum("input_tokens").as("input_tokens"),
        sum("output_tokens").as("output_tokens"))
      .withColumn("est_cost_usd",
        round(col("input_tokens") / 1000000.0 * price(_._1, 1.0)
          + col("output_tokens") / 1000000.0 * price(_._2, 4.0), 4))
      .orderBy("model")
  }

  /** A6c: quality summary — retrieval precision + extraction rates + graph
    * yield in one row (usage_tracker.py:665-752). */
  def qualitySummary(feedback: DataFrame, outcomes: DataFrame,
                     graphEvents: DataFrame): DataFrame = {
    val fb = feedback.agg(
      sum(when(col("signal") === "useful", 1).otherwise(0)).as("useful"),
      sum(when(col("signal") === "not_useful", 1).otherwise(0)).as("not_useful"))
    val ex = outcomes.agg(
      count(lit(1)).as("total_extractions"),
      sum("extracted").as("x"), sum("stored").as("s"), sum("updated").as("u"),
      sum("noop").as("n"), sum("deleted").as("d"), sum("conflict").as("c"),
      sum("fallback").as("fb"))
    val gr = graphEvents.agg(
      count(lit(1)).as("total_graph_searches"),
      sum("graph_count").as("total_graph_results"))
    fb.crossJoin(ex).crossJoin(gr).select(
      round(col("useful") / (col("useful") + col("not_useful")), 4)
        .as("positive_feedback_rate"),
      (col("useful") + col("not_useful")).as("searches_with_feedback"),
      col("total_extractions"),
      round(col("s") / col("x"), 4).as("add_rate"),
      round(col("u") / col("x"), 4).as("update_rate"),
      round(col("n") / col("x"), 4).as("noop_rate"),
      round(col("d") / col("x"), 4).as("delete_rate"),
      round(col("c") / col("x"), 4).as("conflict_rate"),
      round(col("fb") / col("x"), 4).as("fallback_rate"),
      col("total_graph_searches"), col("total_graph_results"))
  }

  /** A6d: recent retrieval failures — negative feedback, newest first
    * (usage_tracker.py:754-775). */
  def retrievalFailures(feedback: DataFrame, limit: Int = 10): DataFrame =
    feedback.filter(col("signal") === "not_useful")
      .orderBy(desc("ts"), asc("id"))
      .limit(limit)
      .select(col("id").as("feedback_id"), col("memory_id"), col("query"), col("ts"))

  /** A6e: worst extraction batches by noop ratio (usage_tracker.py:777-800).
    * Ordered by the UNROUNDED ratio (as the reference's CAST(noop AS REAL)/
    * extracted), job_id tie-break for a deterministic limit boundary. */
  def extractionFailures(outcomes: DataFrame, limit: Int = 10): DataFrame =
    outcomes.filter(col("extracted") > 0 && col("noop") > 0)
      .withColumn("_ratio", col("noop").cast("double") / col("extracted"))
      .orderBy(desc("_ratio"), desc("ts"), asc("job_id"))
      .limit(limit)
      .select(col("job_id"), col("model"), col("extracted"), col("stored"),
        col("noop"), round(col("_ratio"), 4).as("noop_ratio"), col("conflict"))

  /** A7: conflict listing — rows with `conflicts_with` set, joined to the
    * conflicting row (app.py:2273-2299). */
  def conflicts(memories: DataFrame): DataFrame =
    memories
      .filter(col("conflicts_with").isNotNull && !col("archived"))
      .select(col("id"), col("source"), col("conflicts_with"))
      .join(memories.select(col("id").as("conflicts_with"),
        col("source").as("other_source"), col("archived").as("other_archived")),
        "conflicts_with")
      .select("id", "source", "conflicts_with", "other_source", "other_archived")
      .orderBy("id")

  /** A8: stats/readiness (memory_engine.py:2766-2809). One row. */
  def stats(memories: DataFrame): DataFrame =
    memories.agg(
      count(lit(1)).as("total"),
      sum(when(col("archived"), 1).otherwise(0)).as("archived"),
      sum(when(col("pinned"), 1).otherwise(0)).as("pinned"),
      countDistinct(col("source")).as("sources"),
      max(size(col("embedding"))).as("dim"))
}
