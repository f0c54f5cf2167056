package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{dot, roundScore}
import graft.sources.{IndexManifest, Store}

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
  * yields byte-identical assignments to a full rebuild. The flip side of
  * frozen centroids is silent recall decay under heavy churn —
  * [[driftAudit]] is the monitor (build-time per-cell stats persisted in
  * `cellstats`, compared against the live assignments).
  *
  * All tables publish through [[Store]] generations and resolve through
  * ONE [[IndexManifest]] pointer per index, so a reader never pairs a new
  * assignments generation with stale centroids/cellstats mid-maintenance.
  */
object IvfIndex {

  private val Tables = Seq("centroids", "assignments", "cellstats")

  /** Build and persist: centroid table + cell-partitioned assignments +
    * per-cell build-time stats (the drift baseline), sealed by one index
    * manifest. */
  def build(memories: DataFrame, embeddings: DataFrame, path: String,
            idCol: String = "id"): Unit = {
    val cents = Ann.centroidsByLabel(embeddings)
    Store.save(cents, s"$path/centroids")
    Store.savePartitioned(
      Ann.assign(memories.select(col(idCol).as("id"), col("embedding")), cents),
      s"$path/assignments", "ivf_cell")
    val spark = memories.sparkSession
    Store.save(cellStatsOf(spark, path), s"$path/cellstats")
    IndexManifest.capture(path, Tables)
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
              idCol: String = "id", batchId: Option[Long] = None): Unit = {
    val cents = Store.load(spark, s"$path/centroids")
    Store.appendBatch(
      Ann.assign(addedMemories.select(col(idCol).as("id"), col("embedding")), cents),
      s"$path/assignments", "ivf_cell")
    IndexManifest.capture(path, Tables, batchId)
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
                    idCol: String = "id", batchId: Option[Long] = None): Unit = {
    Store.deleteBatch(spark, s"$path/assignments",
      deletedIds.select(col(idCol).as("id")))
    IndexManifest.capture(path, Tables, batchId)
  }

  /** O(batch) update for re-crawled/changed documents: ONE generation
    * that tombstones the changed ids and appends their re-assignment
    * against the STORED centroids ([[Store.upsertBatch]] — a concurrent
    * probe sees the old or the new assignment, never both). One row per
    * id (fail-loud on duplicates — two versions of a doc in one batch
    * would leave two live assignment rows; CDC feeds reduce to the last
    * event per key first). The invalidation plan's `ivf_cell` rows for
    * the batch name exactly the cells whose partitions this generation's
    * batch dir adds rows to. */
  def upsertRefresh(spark: SparkSession, path: String, changedMemories: DataFrame,
                    idCol: String = "id", batchId: Option[Long] = None): Unit = {
    val rows = changedMemories.select(col(idCol).as("id"), col("embedding"))
      .localCheckpoint(true)
    val nBatch = rows.count()
    require(rows.select("id").distinct().count() == nBatch,
      s"upsertRefresh: batch carries duplicate ids ($nBatch rows) — two " +
        "versions of one doc would both stay live; reduce to the last " +
        "version per id first")
    val cents = Store.load(spark, s"$path/centroids")
    Store.upsertBatch(
      Ann.assign(rows, cents),
      s"$path/assignments",
      rows.select("id"),
      "ivf_cell")
    IndexManifest.capture(path, Tables, batchId)
  }

  /** Targeted physical maintenance: rewrite ONLY the named cells of the
    * assignments table ([[Store.compactPartitions]]), dropping their
    * accumulated tombstone debt — the cells come straight from the
    * invalidation plan's `ivf_cell` worklist, closing the plan→execute→
    * compact cycle. Untouched cells' files are not rewritten. */
  def compactCells(spark: SparkSession, path: String, cells: Seq[Int]): Unit = {
    Store.compactPartitions(spark, s"$path/assignments", "ivf_cell",
      cells.map(c => c: Any))
    IndexManifest.capture(path, Tables)
  }

  /** Per-cell profile of the LIVE assignments against the stored
    * centroids: (ivf_cell, n, mean_sim) with mean assign-similarity
    * 6dp-rounded — one broadcast join + one aggregation, the same shape
    * at build time (the baseline) and audit time (the current state). */
  private def cellStatsOf(spark: SparkSession, path: String): DataFrame = {
    val cents = Store.load(spark, s"$path/centroids")
      .select(col("label").as("ivf_cell"), col("centroid"))
    Store.load(spark, s"$path/assignments")
      .join(broadcast(cents), "ivf_cell")
      .select(col("ivf_cell"), dot(col("embedding"), col("centroid")).as("_sim"))
      .groupBy("ivf_cell")
      .agg(count(lit(1)).as("n"), round(avg("_sim"), 6).as("mean_sim"))
  }

  /** Drift monitor (r10 verdict #7): [[refresh]]/[[upsertRefresh]] assign
    * against FROZEN build-time centroids forever (correct Faiss
    * semantics), so after heavy churn the partition quality decays
    * silently — cells bloat past their build-time share and new vectors
    * sit farther from their assigned centroid. This audit compares the
    * live assignments to the persisted build-time `cellstats`:
    *
    *   (ivf_cell, n_built, n_now, mean_sim_built, mean_sim_now,
    *    growth = n_now/n_built (6dp), sim_drop = built − now (6dp),
    *    retrain = growth > growthLimit OR sim_drop > simDropLimit)
    *
    * Any `retrain` row is the re-train signal (rebuild centroids from the
    * current corpus — the operation frozen-centroid ingestion defers, not
    * avoids). Cells that gained their FIRST rows after build (n_built=0
    * never happens — centroids come from the build corpus — but a cell
    * emptied by deletes shows n_now=0) stay in the report via the full
    * outer join. Cost: one broadcast join + aggregation over the live
    * assignments — a monitoring pass, never on the query path. */
  def driftAudit(spark: SparkSession, path: String,
                 growthLimit: Double = 2.0,
                 simDropLimit: Double = 0.1): DataFrame = {
    val built = IndexManifest.resolve(spark, path)("cellstats")
      .select(col("ivf_cell"), col("n").as("n_built"),
        col("mean_sim").as("mean_sim_built"))
    val now = cellStatsOf(spark, path)
      .select(col("ivf_cell"), col("n").as("n_now"),
        col("mean_sim").as("mean_sim_now"))
    built.join(now, Seq("ivf_cell"), "full_outer")
      .select(col("ivf_cell"),
        coalesce(col("n_built"), lit(0L)).as("n_built"),
        coalesce(col("n_now"), lit(0L)).as("n_now"),
        coalesce(col("mean_sim_built"), lit(0.0)).as("mean_sim_built"),
        coalesce(col("mean_sim_now"), lit(0.0)).as("mean_sim_now"))
      .withColumn("growth", round(col("n_now") /
        greatest(col("n_built"), lit(1L)), 6))
      .withColumn("sim_drop",
        round(col("mean_sim_built") - col("mean_sim_now"), 6))
      .withColumn("retrain",
        col("growth") > growthLimit || col("sim_drop") > simDropLimit)
  }

  /** The query path: rank stored centroids against the query (a scalar,
    * driver-side job over ≤ [[Ann.MaxNlist]] rows — the same bounded shape
    * as BM25Index's query-term pruning), then scan ONLY those cells.
    * `ivf_cell IN (literals)` on the partition column prunes at planning
    * time. Centroids and assignments resolve through one [[IndexManifest]]
    * read — a consistent pair even mid-maintenance. Output matches
    * [[Ann.ivfTopK]]: (id, ivf_cell, sim). */
  def topK(spark: SparkSession, path: String, queryVec: Seq[Float],
           k: Int, nprobe: Int = 2): DataFrame = {
    val ld = IndexManifest.resolve(spark, path)
    val cells = ld("centroids")
      .withColumn("_qsim", dot(col("centroid"), typedLit(queryVec)))
      .orderBy(desc("_qsim"), asc("label")).limit(nprobe)
      .select("label").collect().map(_.getInt(0)).toSeq
    ld("assignments")
      .filter(col("ivf_cell").isin(cells: _*))
      .select(col("id"), col("ivf_cell"),
        roundScore(dot(col("embedding"), typedLit(queryVec))).as("sim"))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }
}
