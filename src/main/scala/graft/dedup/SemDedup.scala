package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.functions.VectorFunctions.{dot, roundScore}

/** SemDeDup (Abbas et al. '23, arXiv:2303.09540 — public): semantic
  * deduplication by k-means cells — embeddings are clustered, and pairwise
  * cosine similarity is examined only WITHIN a cell; a row is dropped iff
  * some same-cell row with a smaller id is `eps`-similar to it. That is the
  * paper's upper-triangular max-similarity rule (keep the first item of
  * each close pair, no transitive chaining), which is also the engine's D3
  * drop-higher-id semantics (reference memory_engine.py:2239-2272).
  *
  * Scale shape: this is precisely why SemDeDup beats exhaustive
  * embedding-dedup at corpus scale — the quadratic pair space is bounded
  * per cell (k grows with n, so cells stay ~constant-sized), and the cell
  * id is an equi-join key, so candidate generation is one bucketed
  * self-join, never a global cross product. Centroids are a small broadcast
  * table ([[Ann.MaxNlist]]-capped); the within-cell join shuffles each row
  * once on its cell.
  */
object SemDedup {

  /** Session-conf key for the cell self-join's salt count (default
    * [[DefaultSalts]]): the within-cell pair join is keyed by ivf_cell
    * alone, so the LARGEST cell otherwise rides one reducer — the one
    * skew risk of the SemDeDup shape at corpus scale (cells are
    * ~constant-sized by design, but real clusters are not uniform).
    * Salting spreads each cell over `salts` reducers at the price of
    * replicating the build side `salts`× (guide §2.5 hot-key salting;
    * the [[graft.joins.Joins.saltedJoin]] contract keeps the pair set
    * row-identical). */
  val SaltsConf = "graft.semdedup.salts"
  val DefaultSalts = 8

  /** Survivors (id, ivf_cell) after semantic dedup of `rows` (id,
    * embedding) against fixed `centroids` (label, centroid). Deterministic:
    * assignment ties break by label ([[Ann.assign]]), similarity is rounded
    * to 6dp before the threshold, and the drop rule depends only on ids —
    * and the salted pair join is pair-set-identical to the plain cell
    * join (each pair matches exactly once; SemDedupSpec pins equality on
    * a planted hot cell). */
  def semanticDedup(rows: DataFrame, centroids: DataFrame,
                    eps: Double = 0.9): DataFrame = {
    val assigned = Ann.assign(rows.select(col("id"), col("embedding")), centroids)
      .select(col("id"), col("ivf_cell"), col("embedding"))
      .localCheckpoint(true) // feeds both sides of the pair join + survivors
    val a = assigned
      .select(col("id").as("id_a"), col("ivf_cell"), col("embedding").as("_ea"))
    val b = assigned
      .select(col("id").as("id_b"), col("ivf_cell"), col("embedding").as("_eb"))
    val salts = rows.sparkSession.conf
      .get(SaltsConf, DefaultSalts.toString).toInt
    val dropped = graft.joins.Joins
      .saltedJoin(a, b, Seq("ivf_cell"), salts, saltOn = xxhash64(col("id_a")))
      .filter(col("id_b") < col("id_a"))
      .filter(roundScore(dot(col("_ea"), col("_eb"))) >= eps)
      .select(col("id_a").as("id")).distinct()
    assigned.join(dropped, Seq("id"), "left_anti")
      .select(col("id"), col("ivf_cell"))
  }

  /** Embedding-level train/benchmark decontamination — the semantic
    * companion of [[graft.text.BloomDecontam]]'s n-gram gate: an eval
    * example contaminates a training doc when their embeddings are
    * `eps`-cosine-close even after paraphrase (the n-gram gate only
    * catches verbatim overlap; near-verbatim rewrites survive it —
    * the gap the embedding check closes; public method, e.g. the
    * paraphrase-contamination audits of Yang et al. '23,
    * arXiv:2311.04850).
    *
    * Same cell-bucketed shape as [[semanticDedup]]: both sides are
    * assigned to centroid cells, candidate pairs live in one equi-joined
    * cell, the exact cosine runs on candidates only. At 100 TB the bench
    * side is tiny (benchmarks are ~10⁴ rows): it broadcast-joins against
    * the train side's cell-partitioned scan, so the pass is one
    * map-side pipeline over the corpus — no shuffle of the big side at
    * all beyond its (reusable) cell assignment.
    *
    * Output: (id, bench_id, sim) — every contaminated (train, bench)
    * pair at 6dp-rounded cosine ≥ eps. Dropping flagged ids is the
    * caller's anti-join (same discipline as BloomDecontam). */
  def semanticContamination(train: DataFrame, bench: DataFrame,
                            centroids: DataFrame, eps: Double): DataFrame = {
    val t = Ann.assign(train.select(col("id"), col("embedding")), centroids)
      .select(col("id"), col("ivf_cell"), col("embedding").as("_et"))
    val b = Ann.assign(bench.select(col("id"), col("embedding")), centroids)
      .select(col("id").as("bench_id"), col("ivf_cell"), col("embedding").as("_eb"))
    t.join(broadcast(b), Seq("ivf_cell"))
      .withColumn("sim", roundScore(dot(col("_et"), col("_eb"))))
      .filter(col("sim") >= eps)
      .select(col("id"), col("bench_id"), col("sim"))
  }
}
