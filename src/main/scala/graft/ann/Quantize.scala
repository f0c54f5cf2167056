package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.VectorFunctions
import graft.search.Filters

/** Int8 scalar-quantized (SQ8) vector scoring — the compressed-index tier of
  * the ANN stack (brute-force float = correctness baseline, IVF = partition
  * pruning, SQ8 = memory compression; a production deployment composes
  * IVF × SQ8 like Faiss's IVF-SQ8, both techniques public).
  *
  * Per vector: scale = max |x_i| (stored as a double column) and a byte
  * code array (BinaryType, 1 byte/dim — 4× smaller than float32, 8× than
  * the oracle-visible float64). Approximate cosine between rows a, b:
  *
  *   sim ≈ scale_a * scale_b * Σ code_a[i]·code_b[i] / 127²
  *
  * The integer dot is EXACT (long arithmetic), the two scales are exact
  * (max of abs), so the recovered score is one deterministic double
  * expression — the DuckDB oracle reproduces it bit-for-bit, no float-sum
  * ordering hazard anywhere.
  *
  * Scale shape: encoding is one codegen pass fused into the scan; scoring
  * is scan → integer dot → TakeOrderedAndProject (identical plan to
  * [[graft.search.VectorSearch.topK]], minus 4× the memory traffic). The
  * two-stage variant re-ranks a small quantized candidate pool with exact
  * float dots — the standard recall-restoring pattern.
  */
object Quantize {

  /** 127² — the denominator recovering a unit-scale score from the int dot. */
  val Denom = 16129.0

  def sq8Scale(vec: Column): Column =
    array_max(transform(vec.cast("array<double>"), x => abs(x)))

  def sq8Encode(vec: Column, scale: Column): Column =
    ColumnBridge.column(graft.expressions.Sq8Encode(
      ColumnBridge.expression(vec.cast("array<double>")),
      ColumnBridge.expression(scale.cast("double"))))

  /** Declarative HOF formulation of the encoder (array<long> codes) — the
    * semantic pin for KernelEquivalenceSpec. */
  def sq8EncodeHof(vec: Column, scale: Column): Column =
    when(scale > 0,
      transform(vec.cast("array<double>"),
        x => floor(x * 127.0 / scale + 0.5).cast("long")))
      .otherwise(transform(vec.cast("array<double>"), _ => lit(0L)))

  def sq8Dot(a: Column, b: Column): Column =
    ColumnBridge.column(graft.expressions.Sq8Dot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Attach (sq8_scale, sq8_code) to a frame with a vector column. */
  def encode(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val sc = sq8Scale(col(vecCol))
    df.withColumn("sq8_scale", sc)
      .withColumn("sq8_code", sq8Encode(col(vecCol), col("sq8_scale")))
  }

  /** Driver-side quantization of the query vector (it is already a scalar
    * on the driver): (scale, code bytes). */
  def encodeQuery(queryVec: Seq[Float]): (Double, Array[Byte]) = {
    val xs = queryVec.map(_.toDouble)
    val scale = if (xs.isEmpty) 0.0 else xs.map(math.abs).max
    val code =
      if (scale > 0) xs.map(x => math.floor(x * 127.0 / scale + 0.5).toByte).toArray
      else new Array[Byte](xs.length)
    (scale, code)
  }

  /** Quantized scores against a query vector: (id, qscore) — no filter,
    * no ranking; callers compose their own visibility and top-k. */
  def quantizedScores(df: DataFrame, queryVec: Seq[Float]): DataFrame = {
    val (qScale, qCode) = encodeQuery(queryVec)
    encode(df).select(col("id"),
      round(col("sq8_scale") * qScale * sq8Dot(col("sq8_code"), lit(qCode))
        / Denom, 6).as("qscore"))
  }

  /** Top-k by quantized score: (id, qscore). Same flat scan →
    * TakeOrderedAndProject plan as exact kNN. */
  def topKQuantized(memories: DataFrame, queryVec: Seq[Float], k: Int,
                    includeArchived: Boolean = false): DataFrame =
    quantizedScores(memories.filter(Filters.notArchived(includeArchived)), queryVec)
      .orderBy(desc("qscore"), asc("id"))
      .limit(k)

  /** Two-stage retrieval: quantized top-`candidates` prefilter, exact
    * float re-rank to top-`k`: (id, sim). At 100 TB stage 1 touches only
    * the compressed codes; stage 2 reads `candidates` full vectors. */
  def topKReranked(memories: DataFrame, queryVec: Seq[Float], k: Int,
                   candidates: Int = 50,
                   includeArchived: Boolean = false): DataFrame = {
    val cand = topKQuantized(memories, queryVec, candidates, includeArchived)
    memories.join(cand.select("id"), Seq("id"), "left_semi")
      .select(col("id"), VectorFunctions.roundScore(
        VectorFunctions.dot(col("embedding"), typedLit(queryVec))).as("sim"))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }
}
