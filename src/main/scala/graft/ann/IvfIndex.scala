package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SparkHash
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
  * Tables under the index root:
  *
  *   <path>/centroids    (label, centroid)        [[Ann.centroidsByLabel]]
  *   <path>/assignments  (id, embedding, ivf_cell, csim)  hive-partitioned
  *                       by ivf_cell; `csim` is the ASSIGN-TIME similarity
  *                       to the owning centroid, persisted so the drift
  *                       monitor reads a 2-column pruned scan instead of
  *                       re-running the broadcast-join+dot over the corpus
  *                       (the r11 verdict's double-pass on build)
  *   <path>/cellstats    (ivf_cell, n, mean_sim)  BUILD-TIME per-cell
  *                       profile — [[driftAudit]]'s baseline
  *   <path>/ids          (id, db)  hive-partitioned by db = hash(id) mod
  *                       [[DBuckets]] — the id-keyed presence sidecar
  *                       (Faiss's IDMap, as a prunable table): assignments
  *                       partition by CELL, so "is this id indexed" would
  *                       otherwise scan every cell; maintenance reads only
  *                       the batch ids' buckets — the fail-loud that stops
  *                       a replayed add from leaving duplicate live rows
  *   <path>/INDEX        the [[IndexManifest]] pointer over all four
  *
  * Centroids come from [[Ann.centroidsByLabel]] over the embeddings table,
  * so they are a function of that table alone — which is what makes
  * [[refresh]] exact: assigning an append batch against the STORED
  * centroids (classic IVF ingestion — Faiss `add` never moves centroids)
  * yields byte-identical assignments to a full rebuild. The flip side of
  * frozen centroids is silent recall decay under heavy churn —
  * [[driftAudit]] is the monitor (`ann_ivf_drift`'s oracle recomputes the
  * report from the raw corpus in SQL).
  *
  * All tables publish through [[Store]] generations and resolve through
  * ONE [[IndexManifest]] pointer per index, so a reader never pairs a new
  * assignments generation with stale centroids/cellstats mid-maintenance
  * (pinned by IndexManifestSpec's mid-maintenance resolve case).
  */
object IvfIndex {

  /** Id-hash bucket count of the presence sidecar — the partition set a
    * maintenance batch's presence check reads (same knob as
    * [[graft.search.BM25Index.DBuckets]]). */
  val DBuckets = 32

  /** Conf key bounding the (qid, qv, ivf_cell) probe frame
    * [[probedCandidatesBatch]] may BROADCAST: each probe row carries the
    * full query vector, so a bulk import mis-routed through the indexed
    * gates (|batch| ≈ 10⁶ × nprobe rows ≈ 0.5–1 GB) would otherwise land
    * on the driver and every executor — the same failure class
    * [[graft.sources.MaintenanceIds]]' id cap stops on the write side,
    * except the gates probe BEFORE any refresh so that cap never fires.
    * Past the cap the join degrades gracefully to a shuffle on `ivf_cell`
    * (both sides repartitioned — no driver materialization, no broadcast),
    * so output is identical either way; the conf lets a deployment with a
    * bigger driver raise it deliberately. */
  val GateMaxProbeRowsKey = "graft.gate.maxProbeRows"
  val GateMaxProbeRowsDefault: Long = 1000000L

  /** Salt fan-out of the past-cap shuffle fallback in
    * [[probedCandidatesBatch]]: a hot probed cell's output spreads over
    * this many reducer tasks instead of one (the probe frame is
    * replicated this many times — bounded, it is the smaller side). */
  val GateFallbackSalts = 8

  private val Tables = Seq("centroids", "assignments", "cellstats", "ids")

  private def collectIds(ids: DataFrame, failOnDup: Boolean,
                         what: String): Array[Long] =
    graft.sources.MaintenanceIds.collect(ids, failOnDup, what,
      "two versions of one doc would both stay live; reduce to the " +
        "last version per id first")

  private def localIds(spark: SparkSession, ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.toDF("id")
  }

  /** Sub-splits per cell in the assignments write layout: repartitioning
    * by cell alone would put a hot cell's whole population in ONE task
    * (the skew [[Ann.splitSkewedCells]] exists to fight); by (cell,
    * hash(id) mod SubSplits) a write lands ≤ SubSplits files per cell from
    * balanced tasks — instead of every task writing into every cell dir
    * (tasks × nlist tiny files, the planning-time poison at 100 TB). */
  val SubSplits = 4

  private def cellLayout(assigned: DataFrame): DataFrame =
    assigned.repartition(col("ivf_cell"),
      pmod(hash(col("id")), lit(SubSplits)))

  // repartitioned by the hive column so a write lands DBuckets files, not
  // numPartitions × DBuckets (the small-files guard on every bucketed write)
  private[ann] def idRows(spark: SparkSession, ids: Seq[Long]): DataFrame =
    localIds(spark, ids)
      .withColumn("db", pmod(hash(col("id")), lit(DBuckets)))
      .repartition(col("db"))

  /** How many of `ids` are already indexed — a PRUNED read of the id
    * sidecar's batch buckets (bucket list driver-side Murmur3, batch side
    * a broadcast local relation); never touches assignments. */
  private[ann] def presentCount(spark: SparkSession, path: String,
                                ids: Seq[Long]): Long = {
    if (ids.isEmpty) return 0L
    val dbs = ids.map(SparkHash.bucketOfLong(_, DBuckets)).distinct
    Store.load(spark, s"$path/ids")
      .filter(col("db").isin(dbs: _*))
      .join(broadcast(localIds(spark, ids)), "id")
      .count()
  }

  /** Build and persist all four tables, sealed by one index manifest.
    * `cellstats` (the drift baseline) aggregates the JUST-WRITTEN
    * assignments' (ivf_cell, csim) columns — a pruned 2-column scan, not
    * a second broadcast-join+dot pass over the corpus (r11 verdict #7). */
  def build(memories: DataFrame, embeddings: DataFrame, path: String,
            idCol: String = "id"): Unit =
    buildWithCentroids(memories, Ann.centroidsByLabel(embeddings), path, idCol)

  /** [[build]] with TRAINED centroids (r15 verdict #3 — the production
    * seeding at 100 TB): cells come from [[IndexBuild.trainedCentroids]]
    * (spherical k-means over the corpus embeddings) instead of a fixture
    * label seeding, so probed cells follow the data's actual cluster
    * structure and a given recall target needs fewer probes (quantified
    * by the existing ladder — [[graft.eval.RetrievalEval.ivfRecallSweep]]
    * runs unchanged over a trained index). Everything downstream —
    * refresh/delete/upsert/compact/drift/retrain, probe pruning, the
    * manifest — is the one shared lifecycle; only the centroid table
    * differs. Invariant-spec-gated (kmeans is not SQL-oracle-able): the
    * oracle-gated queries keep the replayable label seeding.
    *
    * `nlist = None` (the default — r16 verdict #2) sizes the cell count
    * by the Faiss 4·√N guideline ([[IndexBuild.suggestNlist]]) from one
    * count() of the corpus at build time; pass `Some(n)` to override
    * (tuned deployments, or comparability with a fixed-nlist build). */
  def buildTrained(memories: DataFrame, path: String,
                   nlist: Option[Int] = None,
                   idCol: String = "id", seed: Long = 42L): Unit =
    buildWithCentroids(memories,
      IndexBuild.trainedCentroids(
        memories.select(col("embedding")),
        nlist.getOrElse(IndexBuild.suggestNlist(memories.count())), seed),
      path, idCol)

  /** [[build]] against a caller-supplied centroid table (the spec/fixture
    * entry point; also the re-train path — new centroids, same corpus). */
  def buildWithCentroids(memories: DataFrame, centroids: DataFrame,
                         path: String, idCol: String = "id"): Unit = {
    val spark = memories.sparkSession
    Store.save(centroids, s"$path/centroids")
    val rows = memories.select(col(idCol).as("id"), col("embedding"))
    Store.savePartitioned(
      cellLayout(Ann.assignWithSim(rows, Store.load(spark, s"$path/centroids"))),
      s"$path/assignments", "ivf_cell")
    Store.save(cellStatsOf(spark, path), s"$path/cellstats")
    Store.savePartitioned(
      rows.select("id").withColumn("db", pmod(hash(col("id")), lit(DBuckets)))
        .repartition(col("db")),
      s"$path/ids", "db")
    IndexManifest.capture(path, Tables)
  }

  /** O(batch) ingestion: assign ONLY the added rows against the stored
    * centroids and publish them as a new generation of the assignments
    * table ([[Store.appendBatch]]): the batch lands in its own immutable
    * cell-partitioned data dir, invisible to readers until the generation
    * pointer swaps — so a concurrent probe sees exactly the old or the new
    * index, and a crash mid-refresh leaves only an unreferenced dir,
    * never a partially-visible batch. Fail-loud: every added id must be
    * NEW to the index (the pruned sidecar read) — a replayed add would
    * otherwise leave two live assignment rows; route re-crawls through
    * [[upsertRefresh]] and replays through the batch-id guard
    * ([[graft.streaming.EventStream.refreshBatch]]). */
  def refresh(spark: SparkSession, path: String, addedMemories: DataFrame,
              idCol: String = "id", batchId: Option[Long] = None): Unit = {
    val rows = addedMemories.select(col(idCol).as("id"), col("embedding"))
    val ids = collectIds(rows.select("id"), failOnDup = true, "refresh")
    if (ids.isEmpty) { IndexManifest.capture(path, Tables, batchId); return }
    val already = presentCount(spark, path, ids.toSeq)
    require(already == 0,
      s"refresh: $already of ${ids.length} ids are ALREADY indexed — " +
        "re-adding would leave duplicate live assignment rows; route " +
        "re-crawls through upsertRefresh (or dedupe the replayed batch)")
    val cents = Store.load(spark, s"$path/centroids")
    // the PRESENCE sidecar (what the replay guard above reads) publishes
    // FIRST: a crash between the two appends leaves the batch ids visible
    // to the replay's presentCount check, so a re-delivered batch
    // fail-louds instead of silently appending the assignments a second
    // time — two live rows per id that topK/probedCandidates would both
    // return (the r12 crash window, closed by ordering; pinned by the
    // FaultPoints crash-replay spec)
    Store.appendBatch(idRows(spark, ids.toSeq), s"$path/ids", "db")
    graft.sources.FaultPoints.hit("ivf.refresh.afterPresence")
    Store.appendBatch(cellLayout(Ann.assignWithSim(rows, cents)),
      s"$path/assignments", "ivf_cell")
    IndexManifest.capture(path, Tables, batchId)
  }

  /** O(batch) delete: [[applyCdc]] with an empty changed side — tombstone
    * the deleted ids out of the assignments and sidecar tables; no cell is
    * rewritten, no corpus row is read. Centroids are untouched (classic
    * IVF — Faiss `remove_ids` never moves centroids), which is exactly
    * what makes the result byte-identical to a rebuild over the surviving
    * rows against the SAME stored centroids (`ann_ivf_delete_refresh`'s
    * oracle; AnnSpec pins delete→refresh ≡ reduced-corpus rebuild). */
  def deleteRefresh(spark: SparkSession, path: String, deletedIds: DataFrame,
                    idCol: String = "id", batchId: Option[Long] = None): Unit =
    applyCdc(spark, path, changed = null,
      deletedIds = deletedIds.select(col(idCol).as("id")), batchId = batchId)

  /** O(batch) update for re-crawled/changed documents: [[applyCdc]] with
    * an empty deleted side — ONE generation per table that tombstones the
    * batch ids and appends their re-assignment against the STORED
    * centroids. */
  def upsertRefresh(spark: SparkSession, path: String, changedMemories: DataFrame,
                    idCol: String = "id", batchId: Option[Long] = None): Unit =
    applyCdc(spark, path, changed = changedMemories, deletedIds = null,
      idCol = idCol, batchId = batchId)

  /** The general O(batch) maintenance pass — a mixed CDC batch applied in
    * ONE generation per table (the [[graft.search.BM25Index.applyCdc]]
    * shape, vector side): assignments and the id sidecar each get a single
    * [[Store.upsertBatch]] whose tombstone keys are ALL batch ids and
    * whose data dir carries the changed docs' fresh rows; one manifest
    * swap seals the batch. Duplicate changed ids raise; an id in both
    * slices raises; deleted ids must be indexed unless
    * `requireDeletesPresent = false` (the seq-reduced CDC path, where an
    * add+delete inside one batch legitimately reduces to a no-op delete). */
  def applyCdc(spark: SparkSession, path: String,
               changed: DataFrame, deletedIds: DataFrame,
               idCol: String = "id", batchId: Option[Long] = None,
               requireDeletesPresent: Boolean = true): Unit = {
    val rows = Option(changed).map(_.select(col(idCol).as("id"), col("embedding")))
    val chIds = rows.map(r => collectIds(r.select("id"), failOnDup = true, "applyCdc"))
      .getOrElse(Array.empty[Long])
    val delIds = Option(deletedIds)
      .map(x => collectIds(x.select(col("id")), failOnDup = false, "applyCdc deletes"))
      .getOrElse(Array.empty[Long])
    val overlap = chIds.toSet.intersect(delIds.toSet)
    require(overlap.isEmpty,
      s"applyCdc: ids ${overlap.take(3).mkString(", ")} appear in BOTH the " +
        "changed and deleted slices — reduce the batch to its last event per key")
    if (chIds.isEmpty && delIds.isEmpty) {
      IndexManifest.capture(path, Tables, batchId); return
    }
    if (requireDeletesPresent && delIds.nonEmpty) {
      val delPresent = presentCount(spark, path, delIds.toSeq)
      require(delPresent == delIds.length,
        s"applyCdc: only $delPresent of ${delIds.length} deleted ids are " +
          "indexed — deleting unknown ids usually means a mis-routed batch; " +
          "pass requireDeletesPresent=false for seq-reduced CDC feeds")
    }
    val allIds = (chIds ++ delIds).toSeq
    val keys = localIds(spark, allIds)
    if (chIds.nonEmpty) {
      val cents = Store.load(spark, s"$path/centroids")
      Store.upsertBatch(cellLayout(Ann.assignWithSim(rows.get, cents)),
        s"$path/assignments", keys, "ivf_cell")
      Store.upsertBatch(idRows(spark, chIds.toSeq), s"$path/ids", keys, "db")
    } else {
      Store.deleteBatch(spark, s"$path/assignments", keys)
      Store.deleteBatch(spark, s"$path/ids", keys)
    }
    IndexManifest.capture(path, Tables, batchId)
  }

  /** Targeted physical maintenance: rewrite ONLY the named cells of the
    * assignments table ([[Store.compactPartitions]]), dropping their
    * accumulated tombstone debt — the cells come straight from the
    * invalidation plan's `ivf_cell` worklist, closing the plan→execute→
    * compact cycle. `idBuckets` optionally sweeps the same batch's debt
    * out of the id-sidecar's `db` buckets (the
    * [[graft.ops.Invalidation.compactionSweep]] path — the sidecar is
    * maintained row-for-row with assignments, so a batch's buckets come
    * from the same driver-side hash). Untouched partitions' files are
    * not rewritten. */
  def compactCells(spark: SparkSession, path: String, cells: Seq[Int],
                   idBuckets: Seq[Int] = Seq.empty): Unit = {
    if (cells.nonEmpty)
      Store.compactPartitions(spark, s"$path/assignments", "ivf_cell",
        cells.map(c => c: Any))
    if (idBuckets.nonEmpty)
      Store.compactPartitions(spark, s"$path/ids", "db",
        idBuckets.map(b => b: Any))
    IndexManifest.capture(path, Tables)
  }

  /** Per-cell profile of the LIVE assignments: (ivf_cell, n, mean_sim)
    * with mean assign-time similarity 6dp-rounded — a 2-column aggregation
    * over the stored (ivf_cell, csim), no join, no dot recompute. Same
    * shape at build time (the baseline) and audit time (the current
    * state). */
  private def cellStatsOf(spark: SparkSession, path: String): DataFrame =
    Store.load(spark, s"$path/assignments")
      .groupBy("ivf_cell")
      .agg(count(lit(1)).as("n"), round(avg("csim"), 6).as("mean_sim"))

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
    * avoids; [[buildWithCentroids]] with fresh centroids IS the re-train).
    * A cell emptied by deletes shows n_now=0 via the full outer join.
    * Cost: one 2-column aggregation over the stored assignments — a
    * monitoring pass, never on the query path. Oracled by `ann_ivf_drift`
    * (planted growth flips `retrain`); AnnSpec pins the planted-shift
    * case at unit scale. */
  def driftAudit(spark: SparkSession, path: String,
                 growthLimit: Double = 2.0,
                 simDropLimit: Double = 0.1): DataFrame = {
    val ld = IndexManifest.resolve(spark, path)
    val built = ld("cellstats")
      .select(col("ivf_cell"), col("n").as("n_built"),
        col("mean_sim").as("mean_sim_built"))
    val now = ld("assignments")
      .groupBy("ivf_cell")
      .agg(count(lit(1)).as("n_now"), round(avg("csim"), 6).as("mean_sim_now"))
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

  /** [[retrainCells]]' member read — the scan that makes retraining
    * O(flagged members), never O(corpus): the `ivf_cell IN (flagged)`
    * predicate is a PARTITION filter on the cell-partitioned assignments
    * table, so planning lists only the flagged cells' dirs (pinned by
    * PlanAuditSpec — a regression to a full-table scan must fail there,
    * not on a cluster). */
  private[graft] def flaggedMembers(spark: SparkSession, path: String,
                                    cellVals: Seq[Any]): DataFrame =
    Store.load(spark, s"$path/assignments")
      .filter(col("ivf_cell").isin(cellVals: _*))
      .select("id", "embedding", "ivf_cell")

  /** The audit → retrain trigger in ONE call: run [[driftAudit]], collect
    * the flagged cells (bounded by nlist ≤ [[Ann.MaxNlist]] — a
    * planning-time list, same shape as the probe's centroid ranking) and
    * dispatch [[retrainCells]] when any flag. This is the cadence hook the
    * streaming maintenance paths call every `auditEvery` micro-batches
    * ([[graft.streaming.EventStream.refreshBatch]] / `cdcBatch`), closing
    * the drift loop UNATTENDED: churn lands O(batch), the audit reads a
    * 2-column pruned scan on a schedule, and retraining touches only the
    * flagged members. Replay-idempotent WITHOUT a batch stamp: a re-run
    * straight after a retrain reads the just re-seeded baseline, flags
    * nothing, and no-ops — so a crash between an index apply and its
    * retrain costs a deferred retrain (the next cadence firing), never a
    * double one. Returns the retrained cells (empty = audit was clean). */
  def retrainIfDrifted(spark: SparkSession, path: String,
                       growthLimit: Double = 2.0,
                       simDropLimit: Double = 0.1,
                       batchId: Option[Long] = None,
                       splitSimFloor: Option[Double] = None): Seq[Int] = {
    val flagged = driftAudit(spark, path, growthLimit, simDropLimit)
      .filter(col("retrain")).select("ivf_cell")
      .collect().map(_.getInt(0)).toSeq
    if (flagged.nonEmpty)
      retrainCells(spark, path, flagged, batchId, splitSimFloor)
    flagged
  }

  /** Targeted retraining — the executor that closes [[driftAudit]]'s loop
    * (audit flags `retrain` cells; this acts on them), the O(flagged)
    * alternative to the full rebuild [[buildWithCentroids]] is:
    *
    *   1. re-center each flagged cell's centroid as the normalized mean of
    *      its CURRENT live members (one Lloyd/sequential-k-means recenter
    *      step over exactly the drifted cells — MacQueen-style, public),
    *   2. reassign ONLY those members against the UPDATED centroid set
    *      (members may migrate to unflagged cells — correct: the point of
    *      recentring is that some members no longer belong),
    *   3. re-seed the flagged cells' drift baseline from their fresh
    *      assignments, so the next [[driftAudit]] measures from the
    *      retrain point.
    *
    * Unflagged cells' members are never rescanned or reassigned, and their
    * baselines are intentionally untouched — a migrant arriving in an
    * unflagged cell IS real growth against that cell's unchanged centroid.
    * Cost: one partition-pruned scan of the flagged cells + an
    * O(members × nlist) broadcast assign — never O(corpus). Flagged cells
    * with no live members keep their original centroid (nothing to
    * recenter from) and simply vanish from the baseline like any empty
    * cell. Publishes one upsert generation on assignments whose tombstone
    * keys are the FLAGGED PARTITION VALUES (untouched cells' files stay
    * byte-identical — pinned by AnnSpec), full rewrites of the two small
    * tables (centroids, cellstats), and one manifest swap. Oracled end to
    * end by `ann_ivf_retrain` (audit → flag → recenter → reassign → merged
    * live view, all recomputed from the raw corpus in SQL).
    *
    * SPLIT-ON-RETRAIN (r12 verdict #4): one recenter step cannot fix a
    * genuinely BIMODAL flooded cell — the mean lands between the modes and
    * every member stays far from it. When `splitSimFloor` is set, any
    * flagged cell whose POST-recenter mean csim (6dp) still sits below the
    * floor is bisected (one deterministic bisecting-k-means step, public:
    * Steinbach '00): seed A = the recentered centroid, seed B = the
    * member FARTHEST from it (lowest csim, ties by lowest id); members
    * strictly closer to B form a NEW cell (labels continue past the
    * current max, in ascending split-cell order), both halves get
    * normalized-mean centroids and fresh csims/baselines. Everything
    * stays inside the SAME single publish (one upsert generation, one
    * manifest swap). `ann_ivf_retrain_split` oracles the whole
    * flag→recenter→reassign→bisect cascade from raw-corpus SQL; AnnSpec
    * pins a planted bimodal flood splitting into a clean audit. */
  def retrainCells(spark: SparkSession, path: String, cells: Seq[Int],
                   batchId: Option[Long] = None,
                   splitSimFloor: Option[Double] = None): Unit = {
    import spark.implicits._
    if (cells.isEmpty) { IndexManifest.capture(path, Tables, batchId); return }
    val cellVals = cells.map(c => c: Any)
    val members = flaggedMembers(spark, path, cellVals).localCheckpoint(true)
    if (members.isEmpty) {
      // every flagged cell is empty (deletes drained them): keep their
      // centroids, drop their baseline rows — they re-enter the baseline
      // if rows ever land there again
      Store.save(
        Store.load(spark, s"$path/cellstats")
          .filter(!col("ivf_cell").isin(cellVals: _*)),
        s"$path/cellstats")
      IndexManifest.capture(path, Tables, batchId); return
    }
    val oldCents = Store.load(spark, s"$path/centroids")
    val fresh = Ann.centroidsByLabel(
      members.select(col("ivf_cell").as("label"), col("embedding")))
    val newCents = oldCents.join(fresh, Seq("label"), "left_anti")
      .unionByName(fresh)
      .localCheckpoint(true)
    val reassigned = Ann.assignWithSim(
      members.select("id", "embedding"), newCents).localCheckpoint(true)
    val reseeded0 = reassigned.filter(col("ivf_cell").isin(cellVals: _*))
      .groupBy("ivf_cell")
      .agg(count(lit(1)).as("n"), round(avg("csim"), 6).as("mean_sim"))
      .localCheckpoint(true) // read twice: the split decision + the stats
    val splitCells: Seq[Int] = splitSimFloor.map { floor =>
      reseeded0.filter(col("mean_sim") < floor)
        .select("ivf_cell").collect().map(_.getInt(0)).toSeq.sorted
    }.getOrElse(Nil)
    val (finalAssigned, finalCents, finalStats) =
      if (splitCells.isEmpty) (reassigned, newCents, reseeded0)
      else {
        // [[Ann.centroidsByLabel]] caps at MaxNlist rows; the composite
        // half labels below need 2 rows per split cell — past the cap
        // half-centroids would silently drop and their members vanish
        // from the inner join. A retrain splitting thousands of cells at
        // once is a rebuild-sized event anyway: fail loud.
        require(splitCells.size * 2 <= Ann.MaxNlist,
          s"retrainCells: ${splitCells.size} cells flagged for bisection " +
            s"(> ${Ann.MaxNlist / 2}) — drift this broad means the whole " +
            "partitioning is stale; rebuild with buildWithCentroids instead")
        // the TOTAL live cell count is bounded too: every centroid
        // broadcast, the probe's driver-side cell collect and the
        // plan-audit boundedness reasoning all size against nlist ≤
        // MaxNlist — repeated split retrains must not creep past it
        val liveCells = newCents.count()
        require(liveCells + splitCells.size <= Ann.MaxNlist,
          s"retrainCells: bisecting ${splitCells.size} cells would grow the " +
            s"live cell count to ${liveCells + splitCells.size} > " +
            s"${Ann.MaxNlist} (Ann.MaxNlist) — the centroid-broadcast sizing " +
            "and probe boundedness rely on that cap; rebuild with " +
            "buildWithCentroids (fresh nlist) instead")
        val splitVals = splitCells.map(c => c: Any)
        val maxLabel = newCents.agg(max("label")).head().getInt(0)
        val lm = splitCells.zipWithIndex
          .map { case (c, i) => (c, maxLabel + 1 + i) }
          .toDF("ivf_cell", "_newlbl")
        val sm = reassigned.filter(col("ivf_cell").isin(splitVals: _*))
        // seed B per cell: the member farthest from the recentered
        // centroid — deterministic (csim asc, id asc)
        val seedB = sm.groupBy("ivf_cell")
          .agg(min_by(col("embedding"), struct(col("csim"), col("id"))).as("_bemb"))
        val halves = sm.join(broadcast(seedB), "ivf_cell")
          .withColumn("_half",
            when(dot(col("embedding"), col("_bemb")) > col("csim"), 1).otherwise(0))
          .localCheckpoint(true) // read twice: half centroids + final rows
        val hc = Ann.centroidsByLabel(
          halves.select((col("ivf_cell") * 2 + col("_half")).as("label"),
            col("embedding")))
          .select(expr("label div 2").cast("int").as("ivf_cell"),
            pmod(col("label"), lit(2)).cast("int").as("_half"), col("centroid"))
        val splitRows = halves.join(broadcast(hc), Seq("ivf_cell", "_half"))
          .join(broadcast(lm), "ivf_cell")
          .select(col("id"), col("embedding"),
            when(col("_half") === 1, col("_newlbl"))
              .otherwise(col("ivf_cell")).as("ivf_cell"),
            dot(col("embedding"), col("centroid")).as("csim"))
        val fa = reassigned.filter(!col("ivf_cell").isin(splitVals: _*))
          .unionByName(splitRows)
          .localCheckpoint(true) // read twice: the write + the stats
        val splitCents = hc.join(broadcast(lm), "ivf_cell")
          .select(when(col("_half") === 1, col("_newlbl"))
            .otherwise(col("ivf_cell")).as("label"), col("centroid"))
        val fc = newCents
          .join(lm.select(col("ivf_cell").as("label")), Seq("label"), "left_anti")
          .unionByName(splitCents)
        val touched = cellVals ++ splitCells.indices.map(i => (maxLabel + 1 + i): Any)
        val fs = fa.filter(col("ivf_cell").isin(touched: _*))
          .groupBy("ivf_cell")
          .agg(count(lit(1)).as("n"), round(avg("csim"), 6).as("mean_sim"))
        (fa, fc, fs)
      }
    Store.save(finalCents, s"$path/centroids")
    // tombstone by partition value: evicts the flagged cells' rows from
    // every prior dir; the batch dir carries the reassigned rows wherever
    // they now land (incl. migrants into unflagged cells, whose old rows
    // lived only in flagged partitions, and split halves in brand-new
    // label dirs, which need no tombstones)
    val keys = cells.toDF("ivf_cell")
    Store.upsertBatch(cellLayout(finalAssigned), s"$path/assignments", keys,
      "ivf_cell")
    Store.save(
      Store.load(spark, s"$path/cellstats")
        .filter(!col("ivf_cell").isin(cellVals: _*))
        .unionByName(finalStats),
      s"$path/cellstats")
    IndexManifest.capture(path, Tables, batchId)
  }

  /** The query path: rank stored centroids against the query (a scalar,
    * driver-side job over ≤ [[Ann.MaxNlist]] rows — the same bounded shape
    * as BM25Index's query-term pruning), then scan ONLY those cells.
    * `ivf_cell IN (literals)` on the partition column prunes at planning
    * time. Centroids and assignments resolve through one [[IndexManifest]]
    * read — a consistent pair even mid-maintenance. Output matches
    * [[Ann.ivfTopK]]: (id, ivf_cell, sim). */
  def topK(spark: SparkSession, path: String, queryVec: Seq[Float],
           k: Int, nprobe: Int = 2): DataFrame =
    probedCandidates(spark, path, queryVec, nprobe)
      .orderBy(desc("sim"), asc("id"))
      .limit(k)

  /** The probed-cell candidate frame BEFORE the top-k cut — (id, ivf_cell,
    * sim) over exactly the `nprobe` pruned cells, scored against the
    * query. [[topK]] is this plus the ordered cut; an index-backed hybrid
    * search ([[graft.search.HybridSearch.searchIndexed]]) instead joins it
    * to the corpus attributes, applies the visibility filters, and ranks
    * it as the vector leg — the candidate pool stays bounded by the
    * probed cells' population either way.
    *
    * `fromRank` is the DELTA form for adaptive probe escalation: only the
    * cells ranked (fromRank, nprobe] are scanned — a widening round reads
    * the newly-probed dirs ONLY, never re-reads the dirs an earlier round
    * already scanned (the cell ranking is deterministic over the static
    * centroid table, so probe(0, a) ∪ probe(a, b) ≡ probe(0, b)). */
  def probedCandidates(spark: SparkSession, path: String,
                       queryVec: Seq[Float], nprobe: Int = 2,
                       fromRank: Int = 0,
                       resolver: Option[String => DataFrame] = None): DataFrame = {
    val ld = resolver.getOrElse(IndexManifest.resolve(spark, path))
    val cells = ld("centroids")
      .withColumn("_qsim", dot(col("centroid"), typedLit(queryVec)))
      .orderBy(desc("_qsim"), asc("label")).limit(nprobe)
      .select("label").collect().map(_.getInt(0)).toSeq
      .drop(fromRank) // delta probing: the first fromRank cells are kept
    ld("assignments")
      .filter(col("ivf_cell").isin(cells: _*))
      .select(col("id"), col("ivf_cell"),
        roundScore(dot(col("embedding"), typedLit(queryVec))).as("sim"))
  }

  /** The index's live cell count (≤ [[Ann.MaxNlist]]) — the escalation
    * ceiling for adaptive probing: once nprobe reaches it, the probed pool
    * IS the whole index. One count over the small centroid table. */
  def cellCount(spark: SparkSession, path: String,
                resolver: Option[String => DataFrame] = None): Int =
    resolver.getOrElse(IndexManifest.resolve(spark, path))("centroids")
      .count().toInt

  /** [[probedCandidates]] for a whole BATCH of query vectors in one pass —
    * the persisted form of [[Ann.ivfBatchTopK]] and the read the
    * index-backed ingest gates stand on ([[graft.search.VectorSearch
    * .noveltyIndexed]], [[graft.dedup.Dedup.smartImportActionsIndexed]]):
    * the reference's add path probes its ANN store once per incoming
    * document (memory_engine.py:548-561); at 100 TB a micro-batch of adds
    * must amortize that into ONE pruned scan, not |batch| corpus scans.
    *
    * `queries` is (qid, qv). Per-qid probe ranking is a broadcast of the
    * ≤[[Ann.MaxNlist]]-row centroid table crossed against the batch (a
    * bounded |batch| × nlist frame, ranked per qid); the UNION of probed
    * cells — collected driver-side, bounded by nlist — becomes a
    * planning-time `ivf_cell IN (…)` partition prune, so the assignments
    * scan lists only the probed dirs once for the whole batch. Each
    * candidate row is then scored only against the queries probing its
    * cell. Output: (qid, id, ivf_cell, sim) — callers rank per qid.
    * Resolves through ONE [[IndexManifest]] read (consistent mid-
    * maintenance, like every other reader). An optional `np` column on
    * `queries` overrides `nprobe` PER QID — the per-query adaptive probe
    * escalation of the shared-plan batch search; an optional `np_from`
    * column drops each qid's first np_from cells — the DELTA form (a
    * widening round scans only the newly-probed dirs, as
    * [[probedCandidates]]' fromRank). The probe frame is
    * broadcast only while ≤ [[GateMaxProbeRowsKey]] rows — past that cap
    * (a bulk batch) the join falls back to a shuffle on `ivf_cell`,
    * identical output without the driver/broadcast pressure. */
  def probedCandidatesBatch(spark: SparkSession, path: String,
                            queries: DataFrame, nprobe: Int = 2,
                            resolver: Option[String => DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ld = resolver.getOrElse(IndexManifest.resolve(spark, path))
    val npCol = if (queries.columns.contains("np")) col("np") else lit(nprobe)
    val npFromCol =
      if (queries.columns.contains("np_from")) col("np_from") else lit(0)
    val pw = Window.partitionBy("qid").orderBy(desc("_cs"), asc("label"))
    val probes = queries.crossJoin(broadcast(ld("centroids")))
      .select(col("qid"), col("qv"), col("label"),
        dot(col("centroid"), col("qv")).as("_cs"),
        npCol.as("_np"), npFromCol.as("_npf"))
      .withColumn("_rn", row_number().over(pw))
      .filter(col("_rn") <= col("_np") && col("_rn") > col("_npf"))
      .select(col("qid"), col("qv"), col("label").as("ivf_cell"))
      .localCheckpoint(true) // read twice: the cell collect + the join
    // ONE job serves both planning needs (r14 verdict #3 — the separate
    // probes.count() serialized a second job into every gate micro-batch):
    // the per-cell counts are the distinct probed cells AND, summed, the
    // probe-frame size the broadcast cap checks. ≤ nlist result rows.
    val cellCounts = probes.groupBy("ivf_cell")
      .agg(count(lit(1)).as("_n")).collect()
    val cells = cellCounts.map(_.getInt(0)).toSeq // bounded by nlist
    val probeRows = cellCounts.map(_.getLong(1)).sum
    val pruned = ld("assignments").filter(col("ivf_cell").isin(cells: _*))
    // broadcast only under the conf-keyed cap: each probe row carries the
    // query vector, so a bulk batch would pressure the driver and blow the
    // broadcast comfort zone — past the cap, shuffle instead (same output,
    // no driver materialization). The fallback pre-salts the join (r14
    // verdict #6): plain repartition(ivf_cell) puts a hot cell — one every
    // qid probes — on ONE reducer emitting |qids probing it| × |cell|
    // rows; salting the CORPUS side by hash(id) and replicating the probe
    // frame [[GateFallbackSalts]]× spreads that product over
    // GateFallbackSalts tasks per cell (the probe frame is the smaller
    // side past the cap — the cell populations are the ones that must
    // never be replicated).
    val cap = spark.conf.get(GateMaxProbeRowsKey,
      GateMaxProbeRowsDefault.toString).toLong
    val joined =
      if (probeRows <= cap) pruned.join(broadcast(probes), "ivf_cell")
      else graft.joins.Joins.saltedJoin(pruned, probes, Seq("ivf_cell"),
        salts = GateFallbackSalts, saltOn = xxhash64(col("id")))
    joined.select(col("qid"), col("id"), col("ivf_cell"),
      roundScore(dot(col("embedding"), col("qv"))).as("sim"))
  }
}
