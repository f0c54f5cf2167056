package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.embed.Embedder

/** S4: rebuild-from-files ingest — read markdown files, chunk, embed,
  * atomically replace the table (reference memory_engine.py:2699-2764;
  * app.py:2718-2750). The reference walks *.md files in-process; here the
  * file listing IS the DataFrame source (`spark.read.text` wholetext), the
  * chunker fold runs per document on executors, and the replace is the
  * write-then-swap of [[Store.save]] — embed-before-destroy order kept. */
object Ingest {

  /** Read whole files under `glob` as (source=file name, content). */
  def readMarkdown(spark: SparkSession, glob: String): DataFrame =
    spark.read.option("wholetext", "true").text(glob)
      .withColumn("source", element_at(split(input_file_name(), "/"), -1))
      .withColumnRenamed("value", "content")

  /** Full pipeline: files → chunks → embeddings → new table rows with
    * deterministic ids (ordered by chunk source key). */
  def rebuildFromFiles(spark: SparkSession, glob: String, embedder: Embedder,
                       targetPath: String): Long = {
    val chunks = Chunker.chunkDocuments(readMarkdown(spark, glob))
    val w = org.apache.spark.sql.expressions.Window.orderBy("chunk_source", "text")
    val rows = embedder.embed(chunks)
      .withColumn("id", row_number().over(w).cast("long") - 1)
      .select(col("id"), col("text"), col("chunk_source").as("source"), col("embedding"))
    Store.save(rows, targetPath)
  }
}
