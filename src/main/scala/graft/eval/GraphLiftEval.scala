package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.search.HybridSearch

/** 2-hop graph-lift A/B eval — the engine-side reproduction of the
  * reference's headline graph benchmark (eval/run_musique_graph_eval.py:
  * 1-12, eval/graph_runner.py:1-12): per question, a scoped corpus of one
  * anchor document plus distractors is searched with the SAME query at
  * graph_weight 0 and 0.1, and the metric is recall@k of the LINKED
  * supporting documents — the retrieval lift attributable purely to graph
  * expansion.
  *
  * Questions are seeded deterministically from the fixture corpus: anchor
  * A's question is A's own embedding (the query "asks about" A, which the
  * base ranker finds at rank 1 — the MuSiQue para-1 role); the supporting
  * documents are A's existing `related_to` chain A → A+20 → A+40 (the
  * fixture link stride), playing para-2 (hop 1) and the 3-hop tail
  * (hop 2). Distractors are the rest of A's 60-id window. Anchors are
  * chosen so the anchor and both hops dodge the fixture's archived rule
  * (id % 11 == 0) and sit below the embeddings count at every SF.
  *
  * Scale shape: each question runs the REAL [[HybridSearch.search]] plan
  * (vector-only base + PPR expansion) over a planning-time-pruned id
  * window — the reference's per-question source_prefix scope — and the
  * per-question plans union into one job (the R15 batch shape). The
  * collected anchor query vectors are a bounded fixture (|Anchors| rows),
  * the same driver-side shape as the engine's standard queryVec fixture. */
object GraphLiftEval {

  /** Anchor doc ids: % 11 ≠ 0 for A, A+20, A+40 (visible under the
    * archived rule) and A + Window < 500 ≤ |embeddings| at every SF. */
  val Anchors: Seq[Long] = Seq(102L, 203L, 304L, 405L)
  /** Per-question scope: ids in [A, A + Window] — anchor + 2 hops + ~55
    * distractors (the MuSiQue 20-paragraph shape, scaled up). */
  val Window = 59L
  val Hop1 = 20L
  val Hop2 = 40L
  val K = 5
  /** The A/B arms: graph expansion off vs the reference's default 0.1. */
  val GraphWeights: Seq[Double] = Seq(0.0, 0.1)
  /** A token outside the synthetic vocabulary: keeps the BM25 branch
    * well-formed (non-empty query) but contributing no candidates, so the
    * base ranker is the vector signal alone. */
  val NullToken = "xqzzy"

  /** Search params for one (anchor, graphWeight) arm. */
  def params(queryVec: Seq[Float], gw: Double): HybridSearch.Params =
    HybridSearch.Params(queryTokens = Seq(NullToken), queryVec = queryVec,
      k = K, vectorWeight = 1.0, graphWeight = gw)

  /** Run the A/B: `queryVecs` maps each anchor to its query vector (the
    * anchor's own embedding — a bounded driver-side fixture). Output one
    * row per graph_weight: (graph_weight, n_questions, hop1_hits,
    * hop2_hits, recall_hop1, recall_hop2) — nonzero lift shows as
    * recall_hop1 rising between the two rows. */
  def graphLift(memories: DataFrame,
                queryVecs: Map[Long, Seq[Float]]): DataFrame = {
    val spark = memories.sparkSession
    val results = (for {
      a <- Anchors
      gw <- GraphWeights
    } yield {
      val scoped = memories.filter(col("id").between(a, a + Window))
      HybridSearch.search(scoped, None, params(queryVecs(a), gw))
        .select(lit(a).as("anchor"), lit(gw).as("gw"), col("id"))
    }).reduce(_ unionAll _)
    val targets = spark.createDataFrame(
      Anchors.map(a => (a, a + Hop1, a + Hop2))).toDF("anchor", "hop1", "hop2")
    results.join(broadcast(targets), "anchor")
      .groupBy("gw")
      .agg(
        count_distinct(col("anchor")).as("n_questions"),
        sum(when(col("id") === col("hop1"), 1L).otherwise(0L)).as("hop1_hits"),
        sum(when(col("id") === col("hop2"), 1L).otherwise(0L)).as("hop2_hits"))
      .select(col("gw").as("graph_weight"), col("n_questions"),
        col("hop1_hits"), col("hop2_hits"),
        round(col("hop1_hits").cast("double") / col("n_questions"), 6)
          .as("recall_hop1"),
        round(col("hop2_hits").cast("double") / col("n_questions"), 6)
          .as("recall_hop2"))
      .orderBy("graph_weight")
  }
}
