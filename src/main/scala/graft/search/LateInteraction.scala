package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.embed.{DeterministicFakeSession, HashingEmbedder}
import graft.functions.{TextFunctions, VectorFunctions}

/** Late-interaction (MaxSim) re-ranking — the ColBERT scoring shape
  * (Khattab & Zaharia, SIGIR '20, public): instead of one vector per
  * document, score a candidate by summing, over each QUERY token, the
  * maximum similarity any DOCUMENT token reaches against it:
  *
  *   maxsim(q, d) = Σ_{t ∈ tokens(q)} max_{s ∈ tokens(d)} ⟨E(t), E(s)⟩
  *
  * Token-level soft matching recovers relevance that one pooled vector
  * blurs away (a candidate containing the query's exact rare terms beats
  * one that is only diffusely similar). Token embeddings here are the
  * fastText subword shape (Bojanowski '17, public): a token embeds as the
  * hashing projection of itself plus its character trigrams, so
  * morphological variants ("retrieval" / "retrieving") land near each
  * other while unrelated tokens do not — and the whole chain stays inside
  * the deterministic, SQL-replayable [[graft.expressions.HashEmbed]]
  * kernel the correctness harness already pins (e1_embed_checksum).
  *
  * Scale shape: the DISTRIBUTED part is the candidate scan (the same flat
  * top-`candidates` plan as [[VectorSearch.topK]], one corpus pass). The
  * late interaction itself touches only `candidates` documents: distinct
  * doc tokens explode to ≤ candidates×|doc| rows, the query side is a
  * ≤|query-tokens|-row broadcast, and the MaxSim fold is two bounded
  * aggregations. Token vectors are recomputed per row by the codegen'd
  * kernel rather than joined through a shuffled vocabulary table — at any
  * corpus size the rerank stage is O(candidates · doc_len · |q|), never
  * a function of corpus rows.
  *
  * Determinism contract: per-pair token dots are rounded to integer
  * micro-units (round(dot·1e6) as BIGINT) before max/sum, so the fold is
  * order-free and exact; `maxsim` = micros/1e6 rounded 6dp; ties break by
  * id. The DuckDB oracle replays trigram expansion, hashing projection,
  * and the micro-unit MaxSim fold from the raw corpus.
  */
object LateInteraction {

  /** Subword gram text for one (already lowercased, whitespace-free)
    * token: the token itself plus its character trigrams, space-joined —
    * the input the hashing embedder turns into a bag-of-subwords vector.
    * Tokens shorter than 3 chars embed as themselves alone. */
  def gramText(tok: Column): Column = {
    val tris = when(length(tok) >= 3,
      transform(sequence(lit(1), length(tok) - lit(2)), i => tok.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))
    concat_ws(" ", concat(array(tok), tris))
  }

  /** Subword hashing embedding of a single token (L2-normalized
    * float array, dim-dimensional). Pure codegen'd column expression. */
  def tokenEmbedding(tok: Column, dim: Int = 64): Column =
    HashingEmbedder(dim).embeddingColumn(gramText(tok))

  /** Top-`n` MaxSim rerank of the `candidates`-deep doc-embedding pool
    * for `queryText`: (rank, id, rel, maxsim). `rel` is the pool's
    * doc-level similarity (6dp), `maxsim` the late-interaction score. */
  def rerank(memories: DataFrame, queryText: String, n: Int = 5,
             candidates: Int = 20, dim: Int = 64): DataFrame = {
    // pool: doc-level retrieval for the query text's hashing embedding —
    // one corpus scan; text rides along so the rerank never rescans
    val qv = DeterministicFakeSession(dim).encode(Seq(queryText)).head.toSeq
    val pool = VectorSearch.topK(memories, qv, k = candidates)
      .select(col("id"), col("sim").as("rel"), col("text"))
    maxSimTail(pool, queryText, n, dim)
  }

  /** [[rerank]] with the candidate pool read from the persisted IVF index
    * instead of a corpus vector scan: the scored leg is ONE
    * partition-pruned probed-cell scan
    * ([[graft.ann.IvfIndex.probedCandidates]]), joined to the corpus
    * attributes for the text payload and visibility flag — the same
    * attribute-join shape as
    * [[HybridSearch.signalContribsIndexed searchIndexed]]'s vector leg:
    * the corpus read is column-pruned to (id, text, archived) and never
    * touches the vector column (pinned by PlanAuditSpec). Same IVF recall
    * trade as every other indexed leg, adjudicated by the
    * probed-cell-restricted oracle. */
  def rerankIndexed(spark: org.apache.spark.sql.SparkSession, ivfPath: String,
                    memories: DataFrame, queryText: String, n: Int = 5,
                    candidates: Int = 20, nprobe: Int = 2,
                    dim: Int = 64): DataFrame =
    maxSimTail(indexedPool(spark, ivfPath, memories, queryText, candidates,
      nprobe, dim), queryText, n, dim)

  /** The production cascade: MaxSim as the rerank stage over the FUSED
    * hybrid retrieval — [[HybridSearch.search]] (RRF over vector + BM25 +
    * the extra rank signals) supplies the `candidates`-deep pool, the
    * late interaction re-orders it on token evidence. `rel` is the fused
    * rrf score (6dp). The pool's text rides an id-equi-join against the
    * corpus attributes (column-pruned, ≤candidates result rows) — the
    * rerank stage itself never touches a corpus-sized frame. */
  def rerankHybrid(memories: DataFrame, feedback: Option[DataFrame],
                   p: HybridSearch.Params, queryText: String, n: Int = 5,
                   candidates: Int = 20, dim: Int = 64): DataFrame = {
    val pool = HybridSearch.search(memories, feedback, p.copy(k = candidates))
      .select(col("id"), col("rrf_score").as("rel"))
      .join(memories.select(col("id"), col("text")), Seq("id"))
      .select(col("id"), col("rel"), col("text"))
    maxSimTail(pool, queryText, n, dim)
  }

  /** [[rerankIndexed]]'s pool construction, separated so PlanAuditSpec can
    * pin its scan shape directly (the MaxSim tail checkpoints the
    * ≤candidates pool rows, which truncates the visible lineage). */
  private[graft] def indexedPool(spark: org.apache.spark.sql.SparkSession,
                                 ivfPath: String, memories: DataFrame,
                                 queryText: String, candidates: Int,
                                 nprobe: Int, dim: Int): DataFrame = {
    val qv = DeterministicFakeSession(dim).encode(Seq(queryText)).head.toSeq
    val attrs = memories.select(col("id"), col("text"), col("archived"))
    graft.ann.IvfIndex.probedCandidates(spark, ivfPath, qv, nprobe)
      .join(attrs, Seq("id"))
      .filter(!coalesce(col("archived"), lit(false)))
      .orderBy(desc("sim"), asc("id")).limit(candidates)
      .select(col("id"), col("sim").as("rel"), col("text"))
  }

  /** The late-interaction stage proper, over any bounded candidate pool
    * `(id, rel, text)`: distinct doc tokens → subword embeddings → per
    * query-token micro-unit max → per-doc sum → top-`n`. Shared by the
    * in-session and index-backed legs so the scoring cannot drift. */
  private def maxSimTail(pool0: DataFrame, queryText: String, n: Int,
                         dim: Int): DataFrame = {
    val spark = pool0.sparkSession
    import spark.implicits._
    // the pool feeds TWO consumers (the token explode and the final rank
    // join) — materialize its ≤candidates rows once, or the upstream
    // corpus/probed scan executes twice
    val pool = pool0.localCheckpoint(true)
    // distinct doc tokens over the pool (MaxSim over duplicates of the
    // same token is the max over one of them — distinct is exact here)
    val docTok = pool
      .select(col("id"),
        explode(array_distinct(TextFunctions.tokens(col("text")))).as("term"))
      .withColumn("de", tokenEmbedding(col("term"), dim))
    // distinct query tokens: a bounded broadcast frame
    val qTerms = queryText.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    val qTok = broadcast(qTerms.toDF("qterm")
      .withColumn("qe", tokenEmbedding(col("qterm"), dim)))
    // bounded crossJoin: |pool tokens| × |query tokens| (broadcast side)
    val simMicro = round(VectorFunctions.dot(col("de"), col("qe")) * lit(1e6), 0)
      .cast("long")
    val score = docTok.crossJoin(qTok)
      .select(col("id"), col("qterm"), simMicro.as("sm"))
      .groupBy("id", "qterm").agg(max("sm").as("ms"))
      .groupBy("id").agg(sum("ms").as("smicro"))
    // left join: a token-less pool doc keeps rank with maxsim 0
    val fused = pool.join(score, Seq("id"), "left_outer")
      .withColumn("smicro", coalesce(col("smicro"), lit(0L)))
    // unpartitioned window is bounded: ≤ `candidates` rows reach it
    fused
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("smicro"), asc("id"))).cast("int"))
      .filter(col("rank") <= n)
      .select(col("rank"), col("id"), col("rel"),
        round(col("smicro") / lit(1e6), 6).as("maxsim"))
      .orderBy("rank")
  }
}
