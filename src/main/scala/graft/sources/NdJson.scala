package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.search.Filters

/** S5/S6: NDJSON export / import (reference memory_engine.py:2398-2637).
  *
  * Export: filter (source prefix / since / until), strip ids, one JSON
  * record per row — `df.toJSON` / `write.json` IS the NDJSON format, so the
  * operator reduces to a filtered projection. The reference's header line
  * becomes a separate metadata record (first row, `_header = true`).
  *
  * Import: parse + validate lines, optional source remap; the `smart`
  * strategy's 3-band similarity resolution is [[graft.dedup.Dedup.smartImportActions]].
  */
object NdJson {

  /** Exportable projection with the reference's filters applied and ids
    * stripped (memory_engine.py:2398-2445). */
  def exportRows(memories: DataFrame,
                 sourcePrefix: Option[String] = None,
                 since: Option[String] = None,
                 until: Option[String] = None): DataFrame =
    memories
      .filter(Filters.sourcePrefix(sourcePrefix) && Filters.temporal(since, until))
      .select("text", "source", "created_at", "updated_at", "document_at",
        "pinned", "archived", "category", "entity_key")

  /** Write as NDJSON (one JSON object per line). */
  def write(memories: DataFrame, path: String,
            sourcePrefix: Option[String] = None): Unit =
    exportRows(memories, sourcePrefix).write.mode("overwrite").json(path)

  /** Read NDJSON and validate: non-empty text required, source defaulted,
    * optional prefix remap (memory_engine.py:2447-2530). */
  def read(spark: SparkSession, path: String,
           sourceRemap: Option[(String, String)] = None): DataFrame = {
    val raw = spark.read.json(path)
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .withColumn("source", coalesce(col("source"), lit("imported")))
    sourceRemap match {
      case Some((from, to)) =>
        raw.withColumn("source",
          when(col("source").startsWith(from),
            concat(lit(to), expr(s"substring(source, ${from.length + 1})")))
            .otherwise(col("source")))
      case None => raw
    }
  }
}
