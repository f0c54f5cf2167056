package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.search.VectorSearch

/** O2-O6: ordering / pagination / presentation operators
  * (reference memory_engine.py:1318-1320, 2348-2390; app.py:2646-2667;
  * mcp-server/index.js:261-331; evidence_packet.py:91-161). */
object Presentation {

  /** O2: pagination over a deterministic ordering. Spark 3.4+ has a native
    * global `offset` (planned as GlobalLimit/Offset — no window needed). */
  def paginate(df: DataFrame, orderCol: String, offset: Int, limit: Int): DataFrame =
    df.orderBy(col(orderCol).asc).offset(offset).limit(limit)

  /** O3: timeline — fan out query variants, union, dedupe by id, sort
    * chronologically ascending (mcp-server/index.js:261-331). */
  def timeline(memories: DataFrame, queryVecs: Seq[Seq[Float]], perQueryK: Int = 20): DataFrame = {
    val branches = queryVecs.map(v =>
      VectorSearch.topK(memories, v, perQueryK)
        .select(col("id"), coalesce(col("document_at"), col("created_at")).as("date")))
    branches.reduce(_ unionAll _)
      .dropDuplicates("id")
      .orderBy(asc("date"), asc("id"))
  }

  /** O4: evidence packet — rank hits, classify into primary / supporting /
    * older_or_archived sections with a confidence level per row
    * (evidence_packet.py:91-161: top hit is primary; live `is_latest`
    * non-archived rows support; the rest are historical; level from score
    * bands high ≥0.5 / medium ≥0.35 / low). */
  def evidencePacket(memories: DataFrame, queryVec: Seq[Float], k: Int = 20): DataFrame = {
    val hits = VectorSearch.topK(memories, queryVec, k, includeArchived = true)
    val ranked = hits.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(desc("sim"), asc("id"))))
    ranked.select(
      col("id"), col("sim"), col("rank"),
      when(col("rank") === 1, "primary")
        .when(!col("archived") && col("is_latest"), "supporting")
        .otherwise("older_or_archived").as("section"),
      when(col("sim") >= 0.5, "high")
        .when(col("sim") >= 0.35, "medium")
        .otherwise("low").as("confidence_level"))
      .orderBy("rank")
  }

  /** O5: sorted distinct sources (memory_engine.py:1318-1320). */
  def distinctSources(memories: DataFrame): DataFrame =
    memories.select("source").distinct().orderBy("source")

  /** O6: counts — total / prefix-filtered / archived-excluded in one pass
    * (memory_engine.py:2348-2369). */
  def counts(memories: DataFrame, prefix: String): DataFrame =
    memories.agg(
      count(lit(1)).as("total"),
      sum(when(col("source").startsWith(prefix), 1).otherwise(0)).as("with_prefix"),
      sum(when(!col("archived"), 1).otherwise(0)).as("visible"))
}
