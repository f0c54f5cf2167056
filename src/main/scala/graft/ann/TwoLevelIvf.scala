package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{dot, roundScore}

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
    * ≤ fanout sub-centroids via a cell-keyed equi-join — the broadcast
    * here ships the whole sub-centroid table at fixture scale, but the
    * JOIN is what scales: a shuffle-on-cell co-locates each partition
    * with exactly its own ≤ fanout centers, so no task ever holds more
    * than one cell's sub-table. Ties break (csim desc, l2_label asc),
    * the [[Ann.assignWithSim]] rule. */
  def assignSub(assigned: DataFrame, subcents: DataFrame): DataFrame = {
    val others = assigned.columns.filterNot(_ == "id").toSeq
    val scored = assigned.join(broadcast(subcents), Seq("ivf_cell"))
      .withColumn("_csim", dot(col("embedding"), col("centroid")))
    scored.groupBy("id")
      .agg(max_by(
        struct(others.map(col) ++ Seq(col("l2_label").as("_l2")): _*),
        struct(col("_csim"), (-col("l2_label")).as("_nl"))).as("_w"))
      .select(col("id") +: (others.map(c => col(s"_w.$c").as(c)) :+
        col("_w._l2").as("l2_cell")): _*)
  }

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
