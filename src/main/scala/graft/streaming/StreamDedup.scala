package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.dedup.SimHash
import graft.functions.TextFunctions

/** Streaming ingest dedup gate — the online admission control in front of a
  * continuously-fed corpus (the reference admits rows one REST call at a
  * time and runs novelty checks inline, memory_engine.py:2187-2193; at
  * cluster scale the same gate is a Structured Streaming stage).
  *
  * Two layers, both incremental:
  *  1. exact: `dropDuplicates` on the normalized-text key — Spark keeps the
  *     seen-key set in the state store, so re-ingested exact copies are
  *     dropped across micro-batches;
  *  2. near-dup vs the existing corpus: the incoming row's SimHash
  *     fingerprint is banded into pigeonhole chunks and left-outer-joined
  *     against the STATIC corpus chunk index (a stream-static equi-join —
  *     stateless, the static side reused per micro-batch); a chunk row is
  *     `matched` when the full hamming distance verifies ≤ maxHamming, and
  *     the per-row "no chunk matched" reduction runs as
  *     `flatMapGroupsWithState` (a streaming anti-join against the derived
  *     hit set is not a supported shape; the stateful group-reduce is).
  *
  * The chunk index is the same pigeonhole structure
  * [[SimHash.nearDuplicates]] uses for batch dedup (hamming ≤ maxHamming ⇒
  * at least one of 4 chunks equal), so the gate's semantics are exactly the
  * batch operator's, applied incrementally. Every transform also runs
  * unchanged on a batch frame (the equivalence spec drives both modes).
  */
object StreamDedup {

  /** Per-row fingerprint + normalized exact-dup key. */
  def withKeys(rows: DataFrame, textCol: String = "text"): DataFrame =
    rows
      .withColumn("_norm", array_join(TextFunctions.tokens(col(textCol)), " "))
      .withColumn("_fp", SimHash.fingerprint(col(textCol)))

  /** The static corpus side: (_chunk_i, _chunk_v, _cfp) band rows. */
  def corpusChunkIndex(corpus: DataFrame, textCol: String = "text",
                       chunks: Int = SimHash.Chunks): DataFrame =
    SimHash.withChunks(
      corpus.select(SimHash.fingerprint(col(textCol)).as("_cfp")), "_cfp", chunks)
      .select(col("_chunk_i"), col("_chunk_v"), col("_cfp"))

  /** Public (not private): Catalyst's generated encoder class lives outside
    * this package and must construct it. */
  case class ChunkVote(id: Long, text: String, matched: Boolean)

  /** Admission gate: drops exact duplicates (cross-batch, state-store
    * backed) and rows whose fingerprint is within `maxHamming` of any
    * corpus fingerprint. `rows` may be a streaming or a batch frame with
    * (id, text); returns the admitted (id, text) rows. */
  def admit(rows: DataFrame, chunkIndex: DataFrame, maxHamming: Int = 3,
            textCol: String = "text"): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val keyed = withKeys(rows, textCol).dropDuplicates("_norm")
    val banded = SimHash.withChunks(keyed, "_fp")
    val flagged = banded
      .join(chunkIndex,
        banded("_chunk_i") === chunkIndex("_chunk_i") &&
          banded("_chunk_v") === chunkIndex("_chunk_v"), "left_outer")
      .select(banded("id").as("id"), col(textCol).as("text"),
        (col("_cfp").isNotNull &&
          SimHash.hamming(col("_fp"), col("_cfp")) <= maxHamming).as("matched"))
      .as[ChunkVote]
    flagged
      .groupByKey(_.id)
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, votes: Iterator[ChunkVote], _: GroupState[Boolean]) =>
          val vs = votes.toSeq
          if (vs.exists(_.matched)) Iterator.empty else Iterator((id, vs.head.text))
      }
      .toDF("id", "text")
  }
}
