package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{dot, roundScore}
import graft.sources.Store

/** Two-level coarse quantizer — the PROTOTYPE growth path past
  * [[Ann.MaxNlist]] (r16 verdict #6, design-note grade; full lifecycle
  * wiring deliberately deferred until a round budgets it).
  *
  * Where the flat design binds: every flat-IVF path broadcasts the
  * centroid table ([[Ann.assignWithSim]], [[Ann.ivfBatchTopK]]) or
  * driver-ranks it per query ([[IvfIndex.probedCandidates]] collects the
  * ranked cells), so nlist is capped at [[Ann.MaxNlist]] = 4096 to keep
  * that frame broadcast-bounded. At 10¹¹ rows the Faiss 4·√N guideline
  * wants ~10⁶ cells; pinning nlist at 4096 instead leaves ~2.4·10⁷ rows
  * PER CELL — nprobe 1 still prunes 4096×, but every probe then scans
  * tens of millions of rows, and the cell granularity is too coarse for
  * the recall/scan-fraction trade the guideline sizes.
  *
  * The two-level answer (the IMI/two-level-IVF shape — Babenko &
  * Lempitsky '12 "inverted multi-index", and Faiss's IVF-in-IVF coarse
  * quantizers — public designs): effective cells = nlist₁ × fanout (up to
  * 4096² ≈ 1.7·10⁷) while NO materialized frame ever exceeds MaxNlist
  * rows at a time —
  *
  *  - level 1: ≤ MaxNlist coarse centroids, broadcast/ranked exactly like
  *    the flat table today;
  *  - level 2: each level-1 cell carries its own ≤ `fanout` sub-centroids.
  *    The sub-centroid table has nlist₁·fanout rows TOTAL but is only ever
  *    touched through a cell-keyed equi-join (assignment) or restricted to
  *    the nprobe₁ probed cells (query) — the per-step frame is bounded by
  *    nprobe₁ × fanout ≤ MaxNlist, never the full product;
  *  - probe = rank level 1 (bounded), rank ONLY the survivors' sub-cells
  *    (bounded), scan assignments partition-pruned to the probed
  *    (cell, sub-cell) pairs. At scale the assignments persist partitioned
  *    by both keys, so the pruning is file-level exactly like
  *    [[IvfIndex]]'s cell dirs today.
  *
  * Column naming: the sub-quantizer key is `l2_cell` — deliberately NOT
  * [[Ann.splitSkewedCells]]'s `ivf_subcell`, which is a physical-layout
  * hash split with probe semantics UNTOUCHED; `l2_cell` changes probe
  * semantics (a probe may read a subset of a level-1 cell).
  *
  * Correctness gate (AnnSpec, the kmeans-adjudication style — invariant
  * specs, not oracles): the two-level probe at exhaustive settings
  * (nprobe₁ = nlist₁, nprobe₂ = all sub-cells) reproduces the flat
  * exhaustive probe = brute top-k bit for bit, and a non-exhaustive probe
  * scans a strict subset of the corpus. Recall at partial settings rides
  * the same ladder discipline as the flat index (probed-vs-exact top-k
  * overlap, logged by the spec).
  */
object TwoLevelIvf {

  /** Level-2 sub-centroids: L2-normalized mean per (ivf_cell, sub-label),
    * sub-label = id mod `fanout` within the cell — the same deterministic
    * positional seeding as the flat fixture builds ([[Ann
    * .centroidsByLabel]]'s 2-key form); a production build would feed
    * per-cell trained centers here instead ([[IndexBuild
    * .trainedCentroids]] run per cell — deferred with the lifecycle).
    * Input: an assigned frame (id, embedding, ivf_cell). Output:
    * (ivf_cell, l2_label, centroid), ≤ nlist₁·fanout rows, constructed by
    * ONE map-side-combined aggregation (never a per-cell driver loop). */
  def subCentroids(assigned: DataFrame, fanout: Int): DataFrame = {
    require(fanout > 0 && fanout <= Ann.MaxNlist,
      s"fanout must be in (0, ${Ann.MaxNlist}], got $fanout")
    val keyed = assigned.select(col("ivf_cell"),
      pmod(col("id"), lit(fanout)).cast("int").as("l2_label"),
      col("embedding"))
    val sums = keyed
      .select(col("ivf_cell"), col("l2_label"), posexplode(col("embedding")))
      .groupBy("ivf_cell", "l2_label", "pos")
      .agg(sum(col("col").cast("double")).as("s"), count(lit(1)).as("n"))
      .groupBy("ivf_cell", "l2_label")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), (col("s") / col("n")).as("m")))),
        x => x.getField("m")).as("mean"))
    sums.select(col("ivf_cell"), col("l2_label"),
      transform(col("mean"),
        x => x / sqrt(aggregate(col("mean"), lit(0.0), (a, y) => a + y * y)))
        .as("centroid"))
  }

  /** Assign each level-1-assigned row to its nearest sub-centroid WITHIN
    * its own cell: adds `l2_cell`. The candidate set per row is its cell's
    * ≤ fanout sub-centroids via a cell-keyed equi-join. No broadcast hint
    * on purpose: at fixture scale AQE broadcasts the tiny table itself,
    * but at production nlist₁ × fanout (up to ~1.7·10⁷ rows × 64 doubles
    * ≈ GBs) the table must NOT be forced onto the driver and every
    * executor — the equi-join is what scales: a shuffle-on-cell
    * co-locates each partition with exactly its own ≤ fanout centers, so
    * no task ever holds more than one cell's sub-table. Ties break
    * (csim desc, l2_label asc), the [[Ann.assignWithSim]] rule. */
  def assignSub(assigned: DataFrame, subcents: DataFrame): DataFrame = {
    val others = assigned.columns.filterNot(_ == "id").toSeq
    val scored = assigned.join(subcents, Seq("ivf_cell"))
      .withColumn("_csim", dot(col("embedding"), col("centroid")))
    scored.groupBy("id")
      .agg(max_by(
        struct(others.map(col) ++ Seq(col("l2_label").as("_l2")): _*),
        struct(col("_csim"), (-col("l2_label")).as("_nl"))).as("_w"))
      .select(col("id") +: (others.map(c => col(s"_w.$c").as(c)) :+
        col("_w._l2").as("l2_cell")): _*)
  }

  private val Tables = Seq("centroids", "subcentroids", "assignments", "ids")

  /** Build and PERSIST the two-level index (the r17 slice of the deferred
    * lifecycle — build + read; refresh/compact/retrain still ride the flat
    * [[IvfIndex]] until a round budgets the full two-level lifecycle):
    * level-1 centroids and level-2 sub-centroids as small tables,
    * assignments written partitioned by BOTH quantizer keys so a partial
    * probe prunes directories on (ivf_cell, l2_cell) at planning time —
    * the file-level pruning [[IvfIndex]] gets from `ivf_cell` alone,
    * squared: at 10¹¹ rows with nlist₁ = fanout = 4096 a probe reads
    * nprobe₂ / 1.7·10⁷ of the corpus instead of nprobe / 4096. The
    * (cell, sub-cell) key pair also IS the write-skew split — l2_cell
    * subdivides a hot cell's population across tasks the way
    * [[IvfIndex.SubSplits]]' hash split does, but with probe semantics
    * attached. Sealed by the same [[graft.sources.IndexManifest]] pointer
    * swap as every other index (readers see old or new, never a partial
    * build). */
  def buildIndex(memories: DataFrame, embeddings: DataFrame, path: String,
                 fanout: Int, idCol: String = "id"): Unit = {
    val spark = memories.sparkSession
    Store.save(Ann.centroidsByLabel(embeddings), s"$path/centroids")
    val rows = memories.select(col(idCol).as("id"), col("embedding"))
    // checkpointed: the level-1 argmax pass feeds BOTH the sub-centroid
    // means and the re-assignment — without the cut each consumer would
    // re-run the corpus scan + broadcast-join argmax (build-time 2×)
    val assigned = Ann.assign(rows, Store.load(spark, s"$path/centroids"))
      .localCheckpoint(true)
    Store.save(subCentroids(assigned, fanout), s"$path/subcentroids")
    Store.savePartitioned(
      assignSub(assigned, Store.load(spark, s"$path/subcentroids"))
        .repartition(col("ivf_cell"), col("l2_cell")),
      s"$path/assignments", "ivf_cell", "l2_cell")
    Store.savePartitioned(
      rows.select("id")
        .withColumn("db", pmod(hash(col("id")), lit(IvfIndex.DBuckets)))
        .repartition(col("db")),
      s"$path/ids", "db")
    graft.sources.IndexManifest.capture(path, Tables)
  }

  /** O(batch) ingestion — the second lifecycle slice: assign ONLY the
    * added rows against the STORED level-1 centroids and level-2
    * sub-centroids (classic IVF — adds never move either quantizer
    * level, Faiss `add` semantics) and publish them as one new
    * generation per table, invisible until the manifest pointer swaps.
    * Replay-guarded exactly like [[IvfIndex.refresh]]: every added id
    * must be NEW to the index (a PRUNED read of the id sidecar's batch
    * buckets — never an assignments scan), and the sidecar publishes
    * FIRST so a crash-replayed batch fail-louds instead of silently
    * double-appending. Fail-loud on coverage too: every added row must
    * land in a level-1 cell that HAS a stored sub-table — the cell-keyed
    * sub-assign join would otherwise silently DROP rows landing in a
    * cell the build never populated; route those through a rebuild (or
    * the per-cell retrain, deferred with the rest of the lifecycle).
    * `ann_twolevel_refresh`'s oracle replays the sub-centroids from the
    * BUILT half and the assignment over the full corpus — the hash-match
    * proves refresh ≡ rebuild against the same stored quantizers. */
  def refresh(spark: SparkSession, path: String, addedMemories: DataFrame,
              idCol: String = "id"): Unit = {
    val rows = addedMemories.select(col(idCol).as("id"), col("embedding"))
    val ids = graft.sources.MaintenanceIds.collect(rows.select("id"),
      failOnDup = true, "two-level refresh",
      "two versions of one doc would both stay live; reduce to the " +
        "last version per id first")
    if (ids.isEmpty) { graft.sources.IndexManifest.capture(path, Tables); return }
    val already = IvfIndex.presentCount(spark, path, ids.toSeq)
    require(already == 0,
      s"two-level refresh: $already of ${ids.length} ids are ALREADY " +
        "indexed — re-adding would leave duplicate live assignment rows")
    // coverage check BEFORE the sidecar publishes: a coverage failure
    // must leave the index untouched (a corrected retry would otherwise
    // hit the replay guard on ids the failed attempt never appended)
    val assigned2 = assignSub(
      Ann.assign(rows, Store.load(spark, s"$path/centroids")),
      Store.load(spark, s"$path/subcentroids"))
      .localCheckpoint(true)
    val n = assigned2.count()
    require(n == ids.length,
      s"two-level refresh: ${ids.length - n} of ${ids.length} added rows " +
        "landed in cells with no stored sub-centroids (the sub-assign " +
        "join would silently drop them); rebuild or retrain those cells " +
        "first")
    // the sidecar still publishes FIRST among the appends: a crash
    // between the two leaves the batch ids visible to the replay guard,
    // so a re-delivered batch fail-louds instead of double-appending
    // (the flat refresh's r12 crash-window ordering)
    Store.appendBatch(IvfIndex.idRows(spark, ids.toSeq), s"$path/ids", "db")
    Store.appendBatch(
      assigned2.repartition(col("ivf_cell"), col("l2_cell")),
      s"$path/assignments", "ivf_cell", "l2_cell")
    graft.sources.IndexManifest.capture(path, Tables)
  }

  /** O(batch) delete — tombstone the deleted ids out of the assignments
    * and id-sidecar tables, one generation each ([[Store.deleteBatch]]):
    * no cell is rewritten, no corpus row is read, and neither quantizer
    * level moves (classic IVF remove semantics — Faiss `remove_ids`
    * never moves centroids), which is exactly what makes the result
    * byte-identical to a rebuild over the survivors against the SAME
    * stored quantizers (`ann_twolevel_delete`'s oracle — the flat
    * [[IvfIndex.deleteRefresh]] contract, both levels). Fail-loud: every
    * deleted id must be indexed (the pruned sidecar read) — deleting
    * unknown ids usually means a mis-routed batch. Compaction of the
    * accumulated tombstone debt stays on the flat lifecycle's
    * [[Store.compactPartitions]] path (deferred with retrain). */
  def deleteRefresh(spark: SparkSession, path: String,
                    deletedIds: DataFrame, idCol: String = "id"): Unit = {
    val ids = graft.sources.MaintenanceIds.collect(
      deletedIds.select(col(idCol).as("id")), failOnDup = false,
      "two-level delete", "reduce the batch to its last event per key")
    if (ids.isEmpty) { graft.sources.IndexManifest.capture(path, Tables); return }
    val present = IvfIndex.presentCount(spark, path, ids.toSeq)
    require(present == ids.length,
      s"two-level delete: only $present of ${ids.length} deleted ids are " +
        "indexed — deleting unknown ids usually means a mis-routed batch")
    val keys = {
      import spark.implicits._
      ids.toSeq.toDF("id")
    }
    Store.deleteBatch(spark, s"$path/assignments", keys)
    Store.deleteBatch(spark, s"$path/ids", keys)
    graft.sources.IndexManifest.capture(path, Tables)
  }

  /** The persisted two-level probe: rank the stored level-1 centroids,
    * rank ONLY the survivors' stored sub-centroids (both frames bounded ≤
    * MaxNlist rows, both ranks collected driver-side exactly like
    * [[IvfIndex.probedCandidates]]' cell rank), then scan the assignments
    * restricted to the nprobe₂ winning (ivf_cell, l2_cell) pairs — a
    * planning-time partition prune on BOTH keys (PlanAuditSpec pins the
    * PartitionFilters). Same ranking + tie-break rules as the in-session
    * [[probeTopK]]; resolves through ONE manifest read. */
  def probedCandidatesIndexed(spark: SparkSession, path: String,
                              queryVec: Seq[Float], nprobe1: Int = 2,
                              nprobe2: Int = 4): DataFrame = {
    val ld = graft.sources.IndexManifest.resolve(spark, path)
    val cells1 = ld("centroids")
      .withColumn("_qs", dot(col("centroid"), typedLit(queryVec)))
      .orderBy(desc("_qs"), asc("label")).limit(nprobe1)
      .select("label").collect().map(_.getInt(0)).toSeq
    val pairs = ld("subcentroids")
      .filter(col("ivf_cell").isin(cells1: _*))
      .withColumn("_qs", dot(col("centroid"), typedLit(queryVec)))
      .orderBy(desc("_qs"), asc("ivf_cell"), asc("l2_label")).limit(nprobe2)
      .select("ivf_cell", "l2_label")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    require(pairs.nonEmpty, s"two-level probe found no sub-cells at $path")
    val pruned = pairs.map { case (c, l) =>
      col("ivf_cell") === lit(c) && col("l2_cell") === lit(l)
    }.reduce(_ || _)
    ld("assignments").filter(pruned)
      .select(col("id"), col("ivf_cell"), col("l2_cell"),
        roundScore(dot(col("embedding"), typedLit(queryVec))).as("sim"))
  }

  /** [[probedCandidatesIndexed]] for a whole BATCH of query vectors in
    * one pass — the two-level form of [[IvfIndex.probedCandidatesBatch]]
    * (what the recall ladder and any batch gate stand on): per-qid probe
    * ranks at BOTH levels, each a bounded window — level 1 over the
    * ≤ MaxNlist broadcast centroid table, level 2 over ONLY the level-1
    * survivors' sub-tables (the union of probed cells, collected
    * driver-side ≤ nlist₁, restricts the sub-centroid read before any
    * join) — then ONE assignments scan pruned to the union of probed
    * (ivf_cell, l2_cell) pairs (≤ |queries|·nprobe₂, driver-bounded),
    * each candidate row scored only against the queries probing its
    * pair. `queries` is (qid, qv); output (qid, id, sim) — callers rank
    * per qid. The probe frame is broadcast: bounded by
    * |queries|·nprobe₂ rows, the eval-cadence shape (a bulk-batch
    * fallback like the flat gate's [[IvfIndex.GateMaxProbeRowsKey]]
    * shuffle belongs with the deferred lifecycle wiring). */
  def probedCandidatesBatch(spark: SparkSession, path: String,
                            queries: DataFrame, nprobe1: Int = 2,
                            nprobe2: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ld = graft.sources.IndexManifest.resolve(spark, path)
    val w1 = Window.partitionBy("qid").orderBy(desc("_qs"), asc("label"))
    val probe1 = queries.crossJoin(broadcast(ld("centroids")))
      .withColumn("_qs", dot(col("qv"), col("centroid")))
      .withColumn("_rn", row_number().over(w1)).filter(col("_rn") <= nprobe1)
      .select(col("qid"), col("qv"), col("label").as("ivf_cell"))
      .localCheckpoint(true) // reused: the cell union + the level-2 rank
    val cells = probe1.select("ivf_cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    require(cells.nonEmpty, s"two-level batch probe found no cells at $path")
    val w2 = Window.partitionBy("qid")
      .orderBy(desc("_qs"), asc("ivf_cell"), asc("l2_label"))
    val probe2 = probe1
      .join(broadcast(ld("subcentroids")
        .filter(col("ivf_cell").isin(cells: _*))), Seq("ivf_cell"))
      .withColumn("_qs", dot(col("qv"), col("centroid")))
      .withColumn("_rn", row_number().over(w2)).filter(col("_rn") <= nprobe2)
      .select(col("qid"), col("qv"), col("ivf_cell"),
        col("l2_label").as("l2_cell"))
      .localCheckpoint(true) // reused: the pair union + the scoring join
    val pairs = probe2.select("ivf_cell", "l2_cell").distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val pruned = pairs.map { case (c, l) =>
      col("ivf_cell") === lit(c) && col("l2_cell") === lit(l)
    }.reduce(_ || _)
    ld("assignments").filter(pruned)
      .join(broadcast(probe2), Seq("ivf_cell", "l2_cell"))
      .select(col("qid"), col("id"),
        roundScore(dot(col("embedding"), col("qv"))).as("sim"))
  }

  /** [[probedCandidatesIndexed]] plus the ordered cut — the persisted
    * counterpart of [[probeTopK]] (identical output at identical probe
    * settings; AnnSpec pins it, `ann_twolevel_indexed`'s oracle
    * adjudicates it end to end). */
  def topKIndexed(spark: SparkSession, path: String, queryVec: Seq[Float],
                  k: Int, nprobe1: Int = 2, nprobe2: Int = 4): DataFrame =
    probedCandidatesIndexed(spark, path, queryVec, nprobe1, nprobe2)
      .orderBy(desc("sim"), asc("id"))
      .limit(k)

  /** The two-level probed top-k: rank level-1 centroids (bounded ≤
    * MaxNlist), restrict the level-2 ranking to the nprobe₁ survivors
    * (bounded ≤ nprobe₁·fanout), scan only rows in the nprobe₂ winning
    * (ivf_cell, l2_cell) pairs. Exhaustive settings (nprobe₁ ≥ nlist₁,
    * nprobe₂ ≥ total sub-cells) reproduce the flat exhaustive probe =
    * brute top-k bit for bit (AnnSpec). */
  def probeTopK(assigned2: DataFrame, cent1: DataFrame, subcents: DataFrame,
                queryVec: Seq[Float], k: Int,
                nprobe1: Int = 2, nprobe2: Int = 4): DataFrame = {
    val c1 = cent1
      .withColumn("_qs", dot(col("centroid"), typedLit(queryVec)))
      .orderBy(desc("_qs"), asc("label")).limit(nprobe1)
      .select(col("label").as("ivf_cell"))
    val c2 = subcents.join(broadcast(c1), Seq("ivf_cell"))
      .withColumn("_qs", dot(col("centroid"), typedLit(queryVec)))
      .orderBy(desc("_qs"), asc("ivf_cell"), asc("l2_label")).limit(nprobe2)
      .select(col("ivf_cell"), col("l2_label").as("l2_cell"))
    assigned2.join(broadcast(c2), Seq("ivf_cell", "l2_cell"))
      .select(col("id"), col("ivf_cell"), col("l2_cell"),
        roundScore(dot(col("embedding"), typedLit(queryVec))).as("sim"))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }
}
