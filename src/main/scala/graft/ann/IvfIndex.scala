package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{dot, roundScore}
import graft.sources.Store

/** Persisted IVF index — the durable form of [[Ann]]'s query-time pruning,
  * symmetric to [[graft.search.BM25Index]] for the lexical side. The
  * reference keeps its vectors in a Qdrant collection that persists across
  * queries (memory_engine.py:130-156); at cluster scale the analogous
  * structure is a small centroid table plus the assignments written
  * PARTITIONED BY CELL, so a probe is a planning-time partition prune: the
  * scan lists only the `nprobe` probed directories and never touches the
  * other nlist − nprobe cells — not even their parquet footers. AnnSpec
  * pins both the result (bit-equal to the in-memory [[Ann.ivfTopK]]) and
  * the pruning (files read < files stored, PartitionFilters in the scan).
  *
  * Centroids come from [[Ann.centroidsByLabel]] over the embeddings table,
  * so they are a function of that table alone — which is what makes
  * [[refresh]] exact: assigning an append batch against the STORED
  * centroids (classic IVF ingestion — Faiss `add` never moves centroids)
  * yields byte-identical assignments to a full rebuild. */
object IvfIndex {

  /** Build and persist: centroid table + cell-partitioned assignments.
    * Write-then-swap via [[Store.savePartitioned]], same as every other
    * persisted table in the engine. */
  def build(memories: DataFrame, embeddings: DataFrame, path: String,
            idCol: String = "id"): Unit = {
    val cents = Ann.centroidsByLabel(embeddings)
    Store.save(cents, s"$path/centroids")
    Store.savePartitioned(
      Ann.assign(memories.select(col(idCol).as("id"), col("embedding")), cents),
      s"$path/assignments", "ivf_cell")
  }

  /** O(batch) ingestion: assign ONLY the added rows against the stored
    * centroids and publish them as a new generation of the assignments
    * table ([[Store.appendBatch]]): the batch lands in its own immutable
    * cell-partitioned data dir, invisible to readers until the generation
    * pointer swaps — so a concurrent probe sees exactly the old or the new
    * index, and a crash mid-refresh leaves only an unreferenced dir,
    * never a partially-visible batch. The probed `ivf_cell IN` filter
    * prunes hive dirs inside every batch dir alike. */
  def refresh(spark: SparkSession, path: String, addedMemories: DataFrame,
              idCol: String = "id"): Unit = {
    val cents = Store.load(spark, s"$path/centroids")
    Store.appendBatch(
      Ann.assign(addedMemories.select(col(idCol).as("id"), col("embedding")), cents),
      s"$path/assignments", "ivf_cell")
  }

  /** O(batch) delete (the r9 verdict's invalidation EXECUTOR, vector
    * side): tombstone the deleted ids out of the assignments table —
    * [[Store.deleteBatch]] writes one key dir + one pointer swap; no cell
    * is rewritten, no corpus row is read. Centroids are untouched (classic
    * IVF — Faiss `remove_ids` never moves centroids), which is exactly
    * what makes the result byte-identical to a rebuild over the surviving
    * rows against the SAME stored centroids (`ann_ivf_delete_refresh`'s
    * oracle; AnnSpec pins delete→refresh ≡ reduced-corpus rebuild). */
  def deleteRefresh(spark: SparkSession, path: String, deletedIds: DataFrame,
                    idCol: String = "id"): Unit = {
    Store.deleteBatch(spark, s"$path/assignments",
      deletedIds.select(col(idCol).as("id")))
    ()
  }

  /** O(batch) update for re-crawled/changed documents: ONE generation
    * that tombstones the changed ids and appends their re-assignment
    * against the STORED centroids ([[Store.upsertBatch]] — a concurrent
    * probe sees the old or the new assignment, never both). The
    * invalidation plan's `ivf_cell` rows for the batch name exactly the
    * cells whose partitions this generation's batch dir adds rows to. */
  def upsertRefresh(spark: SparkSession, path: String, changedMemories: DataFrame,
                    idCol: String = "id"): Unit = {
    val cents = Store.load(spark, s"$path/centroids")
    Store.upsertBatch(
      Ann.assign(changedMemories.select(col(idCol).as("id"), col("embedding")), cents),
      s"$path/assignments",
      changedMemories.select(col(idCol).as("id")),
      "ivf_cell")
    ()
  }

  /** Targeted physical maintenance: rewrite ONLY the named cells of the
    * assignments table ([[Store.compactPartitions]]), dropping their
    * accumulated tombstone debt — the cells come straight from the
    * invalidation plan's `ivf_cell` worklist, closing the plan→execute→
    * compact cycle. Untouched cells' files are not rewritten. */
  def compactCells(spark: SparkSession, path: String, cells: Seq[Int]): Unit = {
    Store.compactPartitions(spark, s"$path/assignments", "ivf_cell",
      cells.map(c => c: Any))
    ()
  }

  /** The query path: rank stored centroids against the query (a scalar,
    * driver-side job over ≤ [[Ann.MaxNlist]] rows — the same bounded shape
    * as BM25Index's query-term pruning), then scan ONLY those cells.
    * `ivf_cell IN (literals)` on the partition column prunes at planning
    * time. Output matches [[Ann.ivfTopK]]: (id, ivf_cell, sim). */
  def topK(spark: SparkSession, path: String, queryVec: Seq[Float],
           k: Int, nprobe: Int = 2): DataFrame = {
    val cells = Store.load(spark, s"$path/centroids")
      .withColumn("_qsim", dot(col("centroid"), typedLit(queryVec)))
      .orderBy(desc("_qsim"), asc("label")).limit(nprobe)
      .select("label").collect().map(_.getInt(0)).toSeq
    Store.load(spark, s"$path/assignments")
      .filter(col("ivf_cell").isin(cells: _*))
      .select(col("id"), col("ivf_cell"),
        roundScore(dot(col("embedding"), typedLit(queryVec))).as("sim"))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }
}
