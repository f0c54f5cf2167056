package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{dot, roundScore}
import graft.sources.Store

/** Persisted binary-quantization index — the durable 16-byte-per-row
  * sidecar of [[BinaryQuant]], symmetric to [[IvfIndex]]/[[IvfPqIndex]]
  * on the cell-pruned side. Unlike those, sign packing is DATA-INDEPENDENT
  * (no centroids, no codebooks — nothing trained), so ingestion is exact
  * by construction: encoding an append batch is byte-identical to what a
  * full rebuild would produce, with no stored-artifact coupling at all.
  * That makes the binary tier the cheapest index to keep fresh at 100 TB:
  * refresh cost is O(batch) encode + metadata renames, and there is no
  * drift-vs-rebuild question to audit.
  *
  * The stored table is (id, bq0, bq1) — the scan that serves a query reads
  * 24 bytes/row and never touches a vector; the exact re-rank late-
  * materializes only `candidates` embeddings from the corpus itself.
  * Visibility (archived) is applied at re-rank time, NOT baked into the
  * index — archival flips must not require index maintenance. */
object BinaryIndex {

  /** Build and persist the packed table, write-then-swap. */
  def build(memories: DataFrame, path: String, idCol: String = "id"): Unit =
    Store.save(
      BinaryQuant.encode(memories.select(col(idCol).as("id"), col("embedding")))
        .select("id", "bq0", "bq1"),
      path)

  /** O(batch) ingestion: encode ONLY the added rows and publish them as a
    * new generation of the packed table ([[Store.appendBatch]] — the batch
    * dir is invisible until the pointer swap, so the refresh is atomic for
    * readers AND crash-safe: a died refresh leaves an unreferenced dir,
    * not a half-published batch; the r8 ADVICE crash-atomicity gap). */
  def refresh(spark: SparkSession, path: String, addedMemories: DataFrame,
              idCol: String = "id"): Unit =
    Store.appendBatch(
      BinaryQuant.encode(addedMemories.select(col(idCol).as("id"), col("embedding")))
        .select("id", "bq0", "bq1"),
      path)

  /** Serving path: Hamming top-`candidates` over the stored packed table
    * (flat 24-byte-row scan → TakeOrderedAndProject), then an exact
    * re-rank that late-materializes only the candidate vectors from
    * `memories` and applies visibility there: (id, hamming, sim). */
  def topK(spark: SparkSession, path: String, memories: DataFrame,
           queryVec: Seq[Float], k: Int, candidates: Int = 50,
           includeArchived: Boolean = false): DataFrame = {
    val (q0, q1) = BinaryQuant.packQuery(queryVec)
    val cand = Store.load(spark, path)
      .select(col("id"), BinaryQuant.hamming(q0, q1).as("hamming"))
      .orderBy(asc("hamming"), asc("id"))
      .limit(candidates)
    memories.filter(graft.search.Filters.notArchived(includeArchived))
      .join(cand, "id")
      .select(col("id"), col("hamming"),
        roundScore(dot(col("embedding"), typedLit(queryVec))).as("sim"))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }
}
