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
    * Tokens shorter than 3 chars embed as themselves alone. A length-3
    * token's single trigram IS the token, so that feature appears twice
    * in the bag — INTENTIONAL double weighting (the fastText formulation
    * keeps the whole-word feature alongside every n-gram without
    * special-casing boundary lengths; Bojanowski '17 §3.2 uses <>-marked
    * boundaries for the same effect), mirrored exactly by the oracle's
    * gramSql and pinned by LateInteractionSpec. */
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
    * for `queryText`: (rank, id, rel, maxsim) — plus a `blend` column
    * under the blend modes (including the [[ModeBlendWrrf]] default).
    * `rel` is the pool's doc-level similarity (6dp), `maxsim` the
    * late-interaction score. */
  def rerank(memories: DataFrame, queryText: String, n: Int = 5,
             candidates: Int = 20, dim: Int = 64,
             mode: String = ModeBlendWrrf): DataFrame = {
    // pool: doc-level retrieval for the query text's hashing embedding —
    // one corpus scan; text rides along so the rerank never rescans
    val qv = DeterministicFakeSession(dim).encode(Seq(queryText)).head.toSeq
    val pool = VectorSearch.topK(memories, qv, k = candidates)
      .select(col("id"), col("sim").as("rel"), col("text"))
    maxSimTail(pool, queryText, n, dim, mode)
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
                    dim: Int = 64, mode: String = ModeBlendWrrf): DataFrame =
    maxSimTail(indexedPool(spark, ivfPath, memories, queryText, candidates,
      nprobe, dim), queryText, n, dim, mode)

  /** The production cascade: MaxSim as the rerank stage over the FUSED
    * hybrid retrieval — [[HybridSearch.search]] (RRF over vector + BM25 +
    * the extra rank signals) supplies the `candidates`-deep pool, the
    * late interaction re-orders it on token evidence. `rel` is the fused
    * rrf score (6dp). The pool's text rides an id-equi-join against the
    * corpus attributes (column-pruned, ≤candidates result rows) — the
    * rerank stage itself never touches a corpus-sized frame. */
  def rerankHybrid(memories: DataFrame, feedback: Option[DataFrame],
                   p: HybridSearch.Params, queryText: String, n: Int = 5,
                   candidates: Int = 20, dim: Int = 64,
                   mode: String = ModeBlendWrrf): DataFrame = {
    val pool = HybridSearch.search(memories, feedback, p.copy(k = candidates))
      .select(col("id"), col("rrf_score").as("rel"))
      .join(memories.select(col("id"), col("text")), Seq("id"))
      .select(col("id"), col("rel"), col("text"))
    maxSimTail(pool, queryText, n, dim, mode)
  }

  /** The BATCH production cascade (r16 verdict #1): N hybrid retrievals'
    * pooled candidates re-ranked in ONE late-interaction pass.
    * `queries` pairs each query's [[HybridSearch.Params]] with its rerank
    * text; the pool is [[HybridSearch.batchSearch]]'s per-qid top-`candidates`
    * with the text riding one id-equi-join against the corpus attributes
    * (column-pruned, ≤N·candidates result rows). Output = the per-qid
    * union of [[rerankHybrid]] results + `query_idx`, in one job graph —
    * the rerank stage's token explode, broadcast query-token join and
    * windowed folds all run once for the whole batch
    * ([[maxSimTailBatch]]). Oracled by `r18_maxsim_batch` as the per-qid
    * union of N single-query `r18_maxsim_blend` replays. */
  def rerankHybridBatch(memories: DataFrame, feedback: Option[DataFrame],
                        queries: Seq[(HybridSearch.Params, String)], n: Int = 5,
                        candidates: Int = 20, dim: Int = 64,
                        mode: String = ModeBlendWrrf): DataFrame = {
    val pool = HybridSearch
      .batchSearch(memories, feedback, queries.map(_._1.copy(k = candidates)))
      .select(col("query_idx").as("qid"), col("id"), col("rrf_score").as("rel"))
      .join(memories.select(col("id"), col("text")), Seq("id"))
      .select(col("qid"), col("id"), col("rel"), col("text"))
    maxSimTailBatch(pool, queries.map(_._2), n, dim, mode)
  }

  /** [[rerankHybridBatch]] from the PERSISTED indexes — the full
    * production batch at 100 TB: the candidate pool is
    * [[HybridSearch.batchSearchIndexed]]'s shared plan (ONE pruned
    * postings scan + ONE probed-cell scan for the whole batch, one
    * consistent index epoch), the text rides one id-equi-join, and the
    * rerank stage is the one-pass batch tail — so N queries cost one
    * scan per index plus one constant token fold, end to end. Same IVF
    * recall trade as every indexed leg, adjudicated by
    * `r18_maxsim_batch_indexed`'s per-qid probed-cell-restricted oracle
    * union. */
  def rerankIndexedBatch(spark: org.apache.spark.sql.SparkSession,
                         bm25Path: String, ivfPath: String,
                         memories: DataFrame, feedback: Option[DataFrame],
                         queries: Seq[(HybridSearch.Params, String)],
                         n: Int = 5, candidates: Int = 20, nprobe: Int = 2,
                         dim: Int = 64, mode: String = ModeBlendWrrf): DataFrame = {
    val pool = HybridSearch
      .batchSearchIndexed(spark, bm25Path, ivfPath, memories, feedback,
        queries.map(_._1.copy(k = candidates)), nprobe)
      .select(col("query_idx").as("qid"), col("id"), col("rrf_score").as("rel"))
      .join(memories.select(col("id"), col("text")), Seq("id"))
      .select(col("qid"), col("id"), col("rel"), col("text"))
    maxSimTailBatch(pool, queries.map(_._2), n, dim, mode)
  }

  /** Final-ranking modes of the MaxSim tail (r14 verdict #2 — the eval
    * instruments showed pure-MaxSim ordering losing recall@1 to the pool
    * order while winning the deep tail, so the cascade should BLEND the
    * fused and token signals, not replace one with the other):
    *
    *  - [[ModeMaxSim]]  rank by the MaxSim micro-score alone (the ColBERT
    *    rerank shape; the original r14 behavior — kept for the pure-rerank
    *    instruments, no longer the default).
    *  - [[ModeBlendRrf]] rank by RRF of the pool rank and the MaxSim rank
    *    (0-based ranks, the engine's [[HybridSearch.RrfK]] constant,
    *    blend 6dp-rounded, ties by id) — keeps the pool's top-1 signal
    *    while letting token evidence repair the tail; measured by
    *    `ev_maxsim_blend`.
    *  - [[ModeBlendTie]] rank by the pool score FIRST, MaxSim only as the
    *    tiebreaker (rel desc, maxsim desc, id) — the conservative blend:
    *    identical to the pool order wherever the fused score
    *    discriminates. */
  val ModeMaxSim = "maxsim"
  val ModeBlendRrf = "blend_rrf"
  val ModeBlendTie = "blend_tie"

  /** [[ModeBlendWrrf]]: pool-weighted steep-k RRF —
    * blend = 2w/(k₀+pool_rank) + 2(1−w)/(k₀+maxsim_rank), 0-based ranks,
    * w = [[BlendPoolWeight]], k₀ = [[BlendRrfK]] (the 2× scale makes
    * w = 0.5 at k₀ = RrfK coincide with [[ModeBlendRrf]]'s unweighted
    * form — one formula serves both modes). The standard RrfK = 60
    * curve is too flat to protect the pool's top-1 (any maxsim-rank-0
    * competitor outscores a pool-rank-0 gold whose maxsim rank is deep);
    * at k₀ = 1 a pool-rank-0 gold survives any single-rank deficit
    * whenever w > (k₀+1)·(C−1) / ((k₀+1)·(C−1) + (k₀+C−1)) — ≈ 0.655 for a
    * 20-candidate pool, and MONOTONE INCREASING in C with supremum
    * (k₀+1)/(k₀+2) = 2/3 as C → ∞ (divide through by C), so w = 0.7 > 2/3
    * protects the pool's top-1 at EVERY candidate-pool size, not just the
    * measured C = 20 (spec-pinned at C = 100 by LateInteractionSpec);
    * [[maxSimTail]] `require`s the constants stay on the protected side of
    * that supremum. A pool-tail gold with strong token evidence still
    * clears the top-10 bar. Measured against the other modes by
    * `ev_maxsim_blend` — the sf0.01 table shows this mode alone keeping
    * BOTH the pool's recall@1 and MaxSim's recall@10 win. The production
    * DEFAULT of [[rerank]]/[[rerankIndexed]]/[[rerankHybrid]] since the
    * r15 instruments (`ev_maxsim_blend`, `ev_maxsim_cascade_blend`,
    * `ev_maxsim_blend_sweep`) measured it dominant: recall@1 0.857 vs pure
    * MaxSim's 0.286 at equal recall@10 1.0. */
  val ModeBlendWrrf = "blend_wrrf"
  val BlendPoolWeight = 0.7
  val BlendRrfK = 1

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
    * query-token micro-unit max → per-doc sum → top-`n` under `mode`'s
    * final ordering (see [[ModeMaxSim]]/[[ModeBlendRrf]]/[[ModeBlendTie]]).
    * Shared by the in-session, index-backed AND batch legs (a constant-qid
    * call into [[maxSimCore]]) so the scoring cannot drift. */
  private[graft] def maxSimTail(pool0: DataFrame, queryText: String, n: Int,
                                dim: Int, mode: String = ModeBlendWrrf): DataFrame =
    maxSimCore(pool0.withColumn("qid", lit(0)), Seq(queryText), n, dim, mode,
      emitQid = false)

  /** R17 (r16 verdict #1) — the BATCH cascade tail, the last per-query
    * production loop closed: rerank N queries' pooled candidates in ONE
    * token-explode pass and one per-qid windowed fold, instead of N
    * [[maxSimTail]] invocations (N token passes + N driver round-trips —
    * the shape every eval harness scoring a query set, and the production
    * cascade behind the reference's batch-search endpoint
    * (app.py:2163-2209), pays without this). `pool0` is the batch
    * search's pooled frame `(qid, id, rel, text)`; `queryTexts(qid)` is
    * each query's rerank text. Output = the per-qid union of the
    * single-query results plus `query_idx` (pinned equal to N independent
    * [[maxSimTail]] runs by `r18_maxsim_batch`'s oracle and
    * LateInteractionSpec). The token pass count is INDEPENDENT of N
    * (JobCountSpec pins it): doc tokens explode once over the whole
    * pooled frame, the per-query token table joins on qid as one bounded
    * broadcast, and every window below partitions by qid. */
  private[graft] def maxSimTailBatch(pool0: DataFrame, queryTexts: Seq[String],
                                     n: Int, dim: Int,
                                     mode: String = ModeBlendWrrf): DataFrame =
    maxSimCore(pool0, queryTexts, n, dim, mode, emitQid = true)

  /** The qid-keyed MaxSim fold both tails delegate to. `pool0` carries
    * `(qid, id, rel, text)`; windows partition by qid (a single-query call
    * passes a constant qid — same ranking; the qid-threading precedent is
    * [[HybridSearch]]'s `fuseContribs`). `emitQid` appends `query_idx`
    * for the batch form. */
  private def maxSimCore(pool0: DataFrame, queryTexts: Seq[String], n: Int,
                         dim: Int, mode: String, emitQid: Boolean): DataFrame = {
    val spark = pool0.sparkSession
    import spark.implicits._
    // the pool feeds TWO consumers (the token explode and the final rank
    // join) — materialize its ≤N·candidates rows once, or the upstream
    // corpus/probed scan executes twice
    val pool = pool0.select("qid", "id", "rel", "text").localCheckpoint(true)
    // distinct doc tokens over the pool (MaxSim over duplicates of the
    // same token is the max over one of them — distinct is exact here);
    // per (qid, id): a doc pooled by two queries scores against each
    val docTok = pool
      .select(col("qid"), col("id"),
        explode(array_distinct(TextFunctions.tokens(col("text")))).as("term"))
      .withColumn("de", tokenEmbedding(col("term"), dim))
    // distinct query tokens PER QID: one bounded broadcast frame for the
    // whole batch (Σ|query tokens| rows)
    val qPairs = queryTexts.zipWithIndex.flatMap { case (txt, i) =>
      txt.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.map(t => (i, t))
    }
    val qTok = broadcast(qPairs.toDF("qid", "qterm")
      .withColumn("qe", tokenEmbedding(col("qterm"), dim)))
    // bounded broadcast join: |pool tokens| × |own query's tokens| rows —
    // the single-query crossJoin generalized to an equi-join on qid
    val simMicro = round(VectorFunctions.dot(col("de"), col("qe")) * lit(1e6), 0)
      .cast("long")
    val score = docTok.join(qTok, Seq("qid"))
      .select(col("qid"), col("id"), col("qterm"), simMicro.as("sm"))
      .groupBy("qid", "id", "qterm").agg(max("sm").as("ms"))
      .groupBy("qid", "id").agg(sum("ms").as("smicro"))
    // left join: a token-less pool doc keeps rank with maxsim 0 (and a
    // qid with an empty token list scores its whole pool at 0)
    val fused = pool.join(score, Seq("qid", "id"), "left_outer")
      .withColumn("smicro", coalesce(col("smicro"), lit(0L)))
    // qid-partitioned windows are bounded: ≤ `candidates` rows per qid
    val byQid = Window.partitionBy("qid")
    val base = Seq(col("rank"), col("id"), col("rel"),
      round(col("smicro") / lit(1e6), 6).as("maxsim"))
    val qidCol =
      if (emitQid) Seq(col("qid").cast("int").as("query_idx")) else Nil
    val ranked = mode match {
      case ModeMaxSim =>
        fused.withColumn("rank", row_number()
            .over(byQid.orderBy(desc("smicro"), asc("id"))).cast("int"))
          .select(base ++ qidCol: _*)
      case ModeBlendRrf | ModeBlendWrrf =>
        // the top-1-protection bound is monotone in the pool size with
        // supremum (k₀+1)/(k₀+2); keeping the weight strictly above it
        // makes the guarantee pool-size-independent (see [[ModeBlendWrrf]])
        if (mode == ModeBlendWrrf)
          require(BlendPoolWeight > (BlendRrfK + 1.0) / (BlendRrfK + 2.0),
            s"blend_wrrf: BlendPoolWeight = $BlendPoolWeight must exceed " +
              s"(k0+1)/(k0+2) = ${(BlendRrfK + 1.0) / (BlendRrfK + 2.0)} or " +
              "a large candidate pool loses the pool-top-1 protection")
        val (k, w) =
          if (mode == ModeBlendRrf) (lit(HybridSearch.RrfK), lit(0.5))
          else (lit(BlendRrfK), lit(BlendPoolWeight))
        fused
          .withColumn("_pr",
            row_number().over(byQid.orderBy(desc("rel"), asc("id"))) - 1)
          .withColumn("_mr",
            row_number().over(byQid.orderBy(desc("smicro"), asc("id"))) - 1)
          .withColumn("blend", round(
            w * lit(2.0) / (k + col("_pr")) +
              (lit(1.0) - w) * lit(2.0) / (k + col("_mr")), 6))
          .withColumn("rank", row_number()
            .over(byQid.orderBy(desc("blend"), asc("id"))).cast("int"))
          .select(base ++ Seq(col("blend")) ++ qidCol: _*)
      case ModeBlendTie =>
        fused.withColumn("rank", row_number()
            .over(byQid.orderBy(desc("rel"), desc("smicro"), asc("id"))).cast("int"))
          .select(base ++ qidCol: _*)
      case other => throw new IllegalArgumentException(
        s"maxSimTail: unknown mode '$other' " +
          "(maxsim | blend_rrf | blend_tie | blend_wrrf)")
    }
    val cut = ranked.filter(col("rank") <= n)
    if (emitQid) cut.orderBy("query_idx", "rank") else cut.orderBy("rank")
  }
}
