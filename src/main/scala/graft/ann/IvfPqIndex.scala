package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{dot, roundScore}
import graft.sources.Store

/** Persisted IVF-PQ index — the durable Faiss-IVFPQ layout: [[IvfIndex]]'s
  * cell-partitioned store with each row's PQ codes materialized at write
  * time. A probe then composes THREE prunes before any float vector is
  * read:
  *
  *  1. partition prune — `ivf_cell IN (...)` lists only the nprobe probed
  *     directories (planning time, like [[IvfIndex]]);
  *  2. column prune — the ADC ranking selects (id, ivf_cell, pq_codes)
  *     only, so the parquet reader never decodes the `embedding` column
  *     for the pruned cells (1 byte/subspace of index traffic, the whole
  *     point of PQ at 100 TB);
  *  3. late materialization — only the `candidates` ADC survivors re-read
  *     their full vectors for the exact re-rank.
  *
  * Codes are RESIDUAL (Faiss IVFPQ, Jégou '11 §IV.A): each stored row's
  * `pq_codes` quantize `x − centroid[ivf_cell]` against
  * [[Pq.residualCodebooks]], so the byte budget describes within-cell
  * variation and the probe adds the per-cell `q·centroid` constant back
  * in the ADC fold. Centroids and codebooks are a deterministic function
  * of the embeddings table alone, so [[refresh]] is exact for the same
  * reason [[IvfIndex.refresh]] is: encoding an append batch against the
  * STORED centroids + codebooks is byte-identical to a full rebuild —
  * Faiss `add` never moves centroids or codewords. */
object IvfPqIndex {

  /** Build and persist: centroids + residual codebooks + cell-partitioned
    * (id, embedding, ivf_cell, pq_codes) assignments. */
  def build(memories: DataFrame, embeddings: DataFrame, path: String,
            idCol: String = "id"): Unit = {
    val cents = Ann.centroidsByLabel(embeddings)
    val books = Pq.residualCodebooks(embeddings, cents)
    Store.save(cents, s"$path/centroids")
    Store.save(books, s"$path/codebooks")
    Store.savePartitioned(
      Pq.encodeResidual(
        Ann.assign(memories.select(col(idCol).as("id"), col("embedding")), cents),
        books, cents),
      s"$path/assignments", "ivf_cell")
  }

  /** O(batch) ingestion against the stored centroids + codebooks,
    * published as a new generation of the assignments table (shared
    * [[Store.appendBatch]] discipline with [[IvfIndex.refresh]]: atomic
    * pointer swap, crash leaves only an unreferenced dir). */
  def refresh(spark: SparkSession, path: String, addedMemories: DataFrame,
              idCol: String = "id"): Unit = {
    val cents = Store.load(spark, s"$path/centroids")
    val books = Store.load(spark, s"$path/codebooks")
    Store.appendBatch(
      Pq.encodeResidual(
        Ann.assign(addedMemories.select(col(idCol).as("id"), col("embedding")), cents),
        books, cents),
      s"$path/assignments", "ivf_cell")
  }

  /** Probe: rank stored centroids (bounded driver-side job), residual-ADC
    * rank the probed cells FROM CODES ONLY (ivf_cell is the partition
    * column — free), exact-rerank the `candidates` survivors. Output
    * matches the in-memory [[Pq.ivfPqTopK]]: (id, ivf_cell, sim). */
  def topK(spark: SparkSession, path: String, queryVec: Seq[Float],
           k: Int, nprobe: Int = 2, candidates: Int = 50): DataFrame = {
    val centRows = Pq.collectCentroids(Store.load(spark, s"$path/centroids"))
    val qd = queryVec.map(_.toDouble)
    val cells = centRows.map { case (l, cv) => (l, Pq.dotFold(cv, qd)) }
      .sortBy { case (l, s) => (-s, l) }.take(nprobe).map(_._1)
    val probedCents = centRows.filter(c => cells.contains(c._1))
    val bookRows = Pq.collectBooks(Store.load(spark, s"$path/codebooks"))
    val probed = Store.load(spark, s"$path/assignments")
      .filter(col("ivf_cell").isin(cells: _*))
    // ADC stage reads (id, pq_codes) only — embedding stays un-decoded
    val cand = Pq.adcScoresResidualRows(probed.select("id", "ivf_cell", "pq_codes"),
        bookRows, probedCents, queryVec, Pq.SubDim)
      .orderBy(desc("adc"), asc("id")).limit(candidates)
    probed.join(cand.select("id"), Seq("id"), "left_semi")
      .select(col("id"), col("ivf_cell"),
        roundScore(dot(col("embedding"), typedLit(queryVec))).as("sim"))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }
}
