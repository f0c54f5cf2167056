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
  * at least one of 4 chunks equal). Every transform also runs unchanged on
  * a batch frame (the equivalence spec drives both modes).
  *
  * SCOPE — the near-dup layer is CORPUS-ONLY: admitted rows are not folded
  * back into the chunk index, so two near-duplicate (but not
  * exact-duplicate) rows arriving in the stream are BOTH admitted, whereas
  * running batch SimHash dedup over the same rows would drop one. This is
  * deliberate: intra-stream near-dup admission is arrival-order-dependent
  * (whichever lands first wins), so making it stateful would trade the
  * gate's determinism — pinned by StreamingSpec's stream≡batch check — for
  * a coverage gain the periodic batch re-dedup pass already provides.
  * Callers needing intra-batch near-dup closure should run
  * [[SimHash.nearDuplicates]] over admitted output as a compaction step.
  */
object StreamDedup {

  /** Per-row fingerprint + normalized exact-dup key. Token-less rows get a
    * NULL fingerprint: the batch operator ([[SimHash.nearDuplicates]] via
    * `fingerprints`) excludes them from pairing entirely, so the gate must
    * never near-dup-reject them — a null chunk value joins nothing. */
  def withKeys(rows: DataFrame, textCol: String = "text"): DataFrame =
    rows
      .withColumn("_norm", array_join(TextFunctions.tokens(col(textCol)), " "))
      .withColumn("_fp", when(size(TextFunctions.tokens(col(textCol))) > 0,
        SimHash.fingerprint(col(textCol))))

  /** The static corpus side: (_chunk_i, _chunk_v, _cfp) band rows.
    * Token-less corpus docs are excluded, matching the batch operator. */
  def corpusChunkIndex(corpus: DataFrame, textCol: String = "text",
                       chunks: Int = SimHash.Chunks): DataFrame =
    SimHash.withChunks(
      corpus.filter(size(TextFunctions.tokens(col(textCol))) > 0)
        .select(SimHash.fingerprint(col(textCol)).as("_cfp")), "_cfp", chunks)
      .select(col("_chunk_i"), col("_chunk_v"), col("_cfp"))

  /** Public (not private): Catalyst's generated encoder class lives outside
    * this package and must construct it. */
  case class ChunkVote(id: Long, text: String, norm: String, matched: Boolean)

  /** Admission gate: drops exact duplicates (cross-batch, state-store
    * backed, KEEP-LOWEST-ID like [[graft.dedup.Dedup.dedupExact]]) and rows
    * whose fingerprint is within `maxHamming` of any corpus fingerprint.
    * `rows` may be a streaming or a batch frame with (id, text); returns
    * the admitted (id, text) rows.
    *
    * One stateful operator keyed on the normalized text handles both exact
    * layers: rows sharing a key have identical token multisets, hence
    * identical fingerprints and identical near-dup verdicts, so the group
    * reduce deterministically keeps the minimum id (a bare
    * `dropDuplicates` would keep a partition-order-dependent row) and the
    * group state drops re-ingested keys in later micro-batches. */
  def admit(rows: DataFrame, chunkIndex: DataFrame, maxHamming: Int = 3,
            textCol: String = "text"): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val banded = SimHash.withChunks(withKeys(rows, textCol), "_fp")
    val flagged = banded
      .join(chunkIndex,
        banded("_chunk_i") === chunkIndex("_chunk_i") &&
          banded("_chunk_v") === chunkIndex("_chunk_v"), "left_outer")
      .select(banded("id").as("id"), col(textCol).as("text"),
        col("_norm").as("norm"),
        (col("_cfp").isNotNull &&
          SimHash.hamming(col("_fp"), col("_cfp")) <= maxHamming).as("matched"))
      .as[ChunkVote]
    flagged
      .groupByKey(_.norm)
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, votes: Iterator[ChunkVote], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val vs = votes.toSeq
            val minId = vs.map(_.id).min
            val rowsOfMin = vs.filter(_.id == minId)
            if (rowsOfMin.exists(_.matched)) Iterator.empty
            else Iterator((minId, rowsOfMin.head.text))
          }
      }
      .toDF("id", "text")
  }
}
