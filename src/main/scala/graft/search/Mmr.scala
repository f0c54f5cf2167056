package graft.search

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorFunctions

/** Maximal Marginal Relevance re-ranking (Carbonell-Goldstein SIGIR '98,
  * public) — diversity-aware selection over a retrieval candidate pool:
  * greedily pick the document maximizing
  *
  *   mmr(c) = λ·rel(c) − (1−λ)·max_{s ∈ selected} sim(c, s)
  *
  * so each pick is relevant AND far from what is already selected — the
  * standard de-redundancy step between top-k retrieval and an LLM context
  * window (near-dup chunks burn budget without adding evidence).
  *
  * Scale shape: the DISTRIBUTED part is the candidate scan (the same flat
  * top-`candidates` plan as [[VectorSearch.topK]]); the greedy runs on the
  * driver over those ≤ `candidates` rows — an inherently sequential
  * argmax chain over a BOUNDED set (the [[graft.text.Bpe]] 1-row-argmax
  * discipline: document the bound, never loop over unbounded data). At
  * 100 TB the candidate pool is still `candidates` rows; nothing here
  * grows with the corpus.
  *
  * Determinism contract: relevance and pairwise sims are 6dp-rounded
  * ([[VectorFunctions.roundScore]] semantics), each greedy score is one
  * HALF_UP 6dp round of `λ·rel − (1−λ)·maxPrevSim`, ties break by id —
  * the DuckDB oracle reproduces the chain by fixed unrolling. */
object Mmr {

  val DefaultLambda = 0.7

  /** The diversity weight is its OWN literal, not computed as 1 − λ:
    * double(1) − double(0.7) = 0.30000000000000004, while the oracle's SQL
    * literal is double(0.3) — the mirrored-expression discipline requires
    * both engines to multiply by the same bit pattern. */
  val DefaultMu = 0.3

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Top-`n` MMR selection from the `candidates`-deep vector top-k pool:
    * (rank, id, rel, mmr). */
  def rerank(memories: DataFrame, queryVec: Seq[Float], n: Int = 5,
             candidates: Int = 20,
             lambda: Double = DefaultLambda,
             mu: Double = DefaultMu): DataFrame = {
    val spark = memories.sparkSession
    val pool = VectorSearch.topK(memories, queryVec, k = candidates)
      .select("id", "sim")
      .join(memories.select(col("id"), col("embedding")), "id")
      .select(col("id"), col("sim"),
        col("embedding").cast("array<double>").as("emb"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Double](2).toArray))
    def pairSim(a: Array[Double], b: Array[Double]): Double =
      r6(a.zip(b).map { case (x, y) => x * y }.sum)
    val embOf = pool.map(p => p._1 -> p._3).toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    val remaining = scala.collection.mutable.LinkedHashMap(
      pool.map(p => p._1 -> p): _*)
    for (_ <- 0 until math.min(n, pool.length)) {
      val scored = remaining.values.map { case (id, rel, emb) =>
        val penalty =
          if (selected.isEmpty) 0.0
          else selected.map(s => pairSim(emb, embOf(s._1))).max
        (id, rel, r6(lambda * rel - mu * penalty))
      }.toSeq
      val best = scored.minBy { case (id, _, mmr) => (-mmr, id) }
      selected += best
      remaining.remove(best._1)
    }
    val rows = selected.zipWithIndex.map { case ((id, rel, mmr), i) =>
      Row(i + 1, id, rel, mmr)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("rel", DoubleType, nullable = false),
        StructField("mmr", DoubleType, nullable = false))))
  }
}
