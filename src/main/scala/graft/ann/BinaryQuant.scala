package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.search.Filters

/** 1-bit (sign) binary quantization — the extreme-compression tier of the
  * ANN stack (float = exact baseline, SQ8 = 4×, PQ = 32×, binary = 256×
  * vs float64 oracle / 32× vs float32). Public technique: sign-random-
  * projection hashing (Charikar STOC '02) specialized to the identity
  * planes — i.e. keep only the sign of each coordinate — as deployed by
  * modern vector stores ("binary quantization") for a Hamming-distance
  * pre-filter followed by an exact re-rank.
  *
  * Per 64-dim vector: TWO long columns, each packing 32 sign bits
  * (bit i of half h set iff x[32h+i] > 0). 16 bytes/row; for unit
  * vectors E[angle] relates to Hamming by θ ≈ π·h/64, so ranking by
  * ascending Hamming approximates ranking by descending cosine.
  *
  * Scale shape: candidate generation is a flat scan over the two packed
  * longs → `bit_count(a XOR q)` (codegen'd integer popcount, no array
  * traffic at all) → `TakeOrderedAndProject`; only `candidates` ids leave
  * the stage, and the exact re-rank reads just those full vectors. At
  * 100 TB the packed halves ride in a 16-byte column the scan prunes to,
  * making the pre-filter memory-bandwidth-bound rather than FLOP-bound —
  * the reason this tier exists.
  */
object BinaryQuant {

  /** Dims packed per half-word. The 64-dim corpus embedding uses exactly
    * two halves; packing 32 bits per long keeps every intermediate
    * non-negative (no sign-bit hazards in either engine's fold). */
  val HalfBits = 32

  /** Sign-pack one 32-dim half (dims offset+1 .. offset+32, 1-based) into
    * a long: descending fold acc·2 + bit — each bit is multiplied by 2
    * exactly `i` times, so bit i lands at weight 2^i with no shifts and no
    * overflow (max 2^32 − 1). */
  def packHalf(vec: Column, offset: Int): Column =
    aggregate(
      sequence(lit(HalfBits - 1), lit(0), lit(-1)),
      lit(0L),
      (acc, i) => acc * 2 + when(
        element_at(vec, (i + lit(offset + 1)).cast("int")).cast("double") > 0,
        lit(1L)).otherwise(lit(0L)))

  /** Attach the packed sign halves (bq0, bq1) to a frame with a 64-dim
    * vector column — the stored form of a persisted binary index. */
  def encode(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    df.withColumn("bq0", packHalf(col(vecCol), 0))
      .withColumn("bq1", packHalf(col(vecCol), HalfBits))

  /** Driver-side packing of the query vector (already a scalar on the
    * driver): (half0, half1) with the same bit order as [[packHalf]]. */
  def packQuery(queryVec: Seq[Float]): (Long, Long) = {
    require(queryVec.length == 2 * HalfBits,
      s"BinaryQuant packs exactly ${2 * HalfBits} dims; got ${queryVec.length}")
    def half(off: Int): Long =
      (0 until HalfBits).foldLeft(0L) { (acc, i) =>
        if (queryVec(off + i) > 0) acc | (1L << i) else acc
      }
    (half(0), half(HalfBits))
  }

  /** Hamming distance between a row's packed halves and the packed query:
    * two XORs + two popcounts, all codegen integer ops. */
  def hamming(q0: Long, q1: Long): Column =
    (bit_count(col("bq0").bitwiseXOR(lit(q0))) +
      bit_count(col("bq1").bitwiseXOR(lit(q1)))).cast("int")

  /** Hamming-nearest `candidates` ids: (id, hamming), ties broken by id.
    * Flat scan → TakeOrderedAndProject — no shuffle, no vector reads. */
  def candidatesByHamming(memories: DataFrame, queryVec: Seq[Float],
                          candidates: Int,
                          includeArchived: Boolean = false): DataFrame = {
    val (q0, q1) = packQuery(queryVec)
    encode(memories.filter(Filters.notArchived(includeArchived)))
      .select(col("id"), hamming(q0, q1).as("hamming"))
      .orderBy(asc("hamming"), asc("id"))
      .limit(candidates)
  }

  /** Two-stage binary retrieval: Hamming top-`candidates` pre-filter, exact
    * float re-rank to top-`k`: (id, hamming, sim). Monotone in
    * `candidates` for true-top-k members (a wider pool can only add rows
    * that out-rank non-members), the property BinaryQuantSpec pins. */
  def topKBinary(memories: DataFrame, queryVec: Seq[Float], k: Int,
                 candidates: Int = 50,
                 includeArchived: Boolean = false): DataFrame = {
    val cand = candidatesByHamming(memories, queryVec, candidates, includeArchived)
    memories.join(cand, "id")
      .select(col("id"), col("hamming"),
        VectorFunctions.roundScore(
          VectorFunctions.dot(col("embedding"), typedLit(queryVec))).as("sim"))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }
}
