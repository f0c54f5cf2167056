package graft

import org.apache.spark.sql.functions._
import graft.ann.{Ann, BinaryQuant, Pq, Quantize}
import graft.core.{Corpus, OracleCtes, OracleHybrid, OracleText, Tables}
import graft.search.{GraphSearch, VectorSearch}
import graft.text.TextAnalysis

/** Registry section 6 (round 8 cont.) — the extreme-compression and
  * corpus-tiering additions: 1-bit binary-quantized retrieval (Hamming
  * pre-filter + exact re-rank), CCNet perplexity bucketing
  * (head/middle/tail data tiers), T=2 temperature-sampling mixture
  * planning, and label-propagation community detection with Newman
  * modularity over the similarity graph.
  */
object QueriesTiers {

  import Queries.Q

  /** Fixed synchronous LPA rounds — mirrored by the oracle's unroll depth.
    * "Run exactly r synchronous rounds" IS the operator's contract (not
    * "run to convergence": synchronous LPA has no convergence guarantee),
    * so the oracle is exact at any depth; TiersSpec hand-traces the
    * round-by-round evolution on a fixture where 4 rounds do converge. */
  val LpaRounds = 4

  private def dupPairs(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.dedup.Dedup.findDuplicates(Corpus.memories(s, dir), threshold = 0.35)
      .select("id_a", "id_b")

  val queries: Map[String, Q] = Map(
    // 1-bit binary quantization: Hamming top-50 over two packed longs
    // (16 bytes/row — the scan never touches the vector column), exact
    // re-rank of the candidates only
    "ann_bq_topk" -> ((s, dir) =>
      BinaryQuant.topKBinary(Corpus.memories(s, dir), Queries.queryVec(s, dir),
        k = 10, candidates = 50)),
    // recall audit for the binary tier: |bq top-10 ∩ exact top-10| / 10
    "ann_bq_recall" -> ((s, dir) => {
      val mem = Corpus.memories(s, dir)
      val qv = Queries.queryVec(s, dir)
      val bq = BinaryQuant.topKBinary(mem, qv, k = 10, candidates = 50).select("id")
      val exact = VectorSearch.topK(mem, qv, k = 10).select("id")
      bq.join(exact, "id")
        .agg(round(count(lit(1)) / 10.0, 6).as("recall_at_10"))
    }),
    // persisted binary index: build on the first half, O(batch) refresh
    // with the second — the oracle is the FULL-CORPUS binary SQL, so the
    // hash-match proves refresh ≡ rebuild (sign packing is data-
    // independent: nothing trained, nothing to drift)
    "ann_bq_indexed" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_bq_index_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(path)
      val mem = Corpus.memories(s, dir)
      val half = Corpus.nDocs(s, dir) / 2
      graft.ann.BinaryIndex.build(mem.filter(col("id") < half), path)
      graft.ann.BinaryIndex.refresh(s, path, mem.filter(col("id") >= half))
      graft.ann.BinaryIndex.topK(s, path, mem, Queries.queryVec(s, dir),
        k = 10, candidates = 50)
    }),
    // the compression-tier sizing table: candidate recall@10 at a FIXED
    // 50-candidate budget for each quantized pre-filter (SQ8 72 B/vec,
    // PQ 8 B/vec, binary 16 B/vec) against the exact top-10 — since the
    // exact re-rank preserves every true neighbor in the pool, pool
    // recall IS serving recall, and this one table is the measurement
    // that picks a tier (memory budget × recall floor) before a 100 TB
    // deployment commits to one
    "ann_tier_sweep" -> ((s, dir) => {
      val mem = Corpus.memories(s, dir)
      val vis = mem.filter(graft.search.Filters.notArchived(false))
      val qv = Queries.queryVec(s, dir)
      val exact = VectorSearch.topK(mem, qv, k = 10).select("id")
        .localCheckpoint(true)
      val books = Pq.codebooks(Tables.embeddings(s, dir))
      def arm(cand: org.apache.spark.sql.DataFrame, tier: String, bytes: Int) =
        cand.join(exact, "id")
          .agg(round(count(lit(1)) / 10.0, 6).as("recall_at_10"))
          .select(lit(tier).as("tier"),
            lit(bytes).cast("int").as("bytes_per_vec"), col("recall_at_10"))
      val sq8 = Quantize.quantizedScores(vis, qv)
        .orderBy(desc("qscore"), asc("id")).limit(50).select("id")
      val pq = Pq.pqTopK(Pq.encode(vis, books), books, qv, k = 50).select("id")
      val bq = BinaryQuant.candidatesByHamming(mem, qv, candidates = 50)
        .select("id")
      // the energy-sorted OPQ permutation at the same 8 B/vec budget —
      // the zero-serving-cost arm that decides rotated vs plain PQ
      val perm = Pq.energyPermutation(Tables.embeddings(s, dir))
      val rot = Pq.rotate(col("embedding"), perm)
      val oBooks = Pq.codebooks(
        Tables.embeddings(s, dir).withColumn("embedding", rot))
      val opq = Pq.pqTopK(Pq.encode(vis.withColumn("embedding", rot), oBooks),
        oBooks, perm.map(qv), k = 50).select("id")
      arm(sq8, "sq8", 72).unionAll(arm(pq, "pq", 8)).unionAll(arm(bq, "bq", 16))
        .unionAll(arm(opq, "opq", 8))
        .orderBy("tier")
    }),
    // CCNet head/middle/tail perplexity tiers over the document corpus
    "tc_ppl_buckets" -> ((s, dir) =>
      TextAnalysis.perplexityBuckets(Queries.docs(s, dir)).orderBy("id")),
    // T=2 temperature sampling plan per language (√-flattened shares)
    "tp_temperature_mix" -> ((s, dir) =>
      graft.text.Curation.temperatureMix(Queries.docs(s, dir)).orderBy("domain")),
    // click↔view interval join (the stream-stream attribution shape) run
    // in batch mode over the events table; StreamingSpec pins the same
    // transform fed through two watermarked MemoryStreams ≡ this
    "st_click_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.streaming.EventStream.clickViewPairs(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "view"))
        .orderBy("click_id", "view_id")
    }),
    // hot-key (5-language) totals join executed through the SALTED path:
    // probe rows salted by xxhash64(id), build side replicated 8×, join on
    // (lang, salt) — row-identical to the plain join (the oracle is the
    // plain SQL join), while each hot language spreads over 8 reducers
    "tc_lang_share" -> ((s, dir) => {
      val (_, bpe) = TextAnalysis.tokenCounts(col("text"))
      val d = Queries.docs(s, dir)
        .select(col("id"), col("lang"), bpe.cast("long").as("n_tok"))
      val totals = d.groupBy("lang").agg(sum("n_tok").as("_lt"))
      graft.joins.Joins.saltedJoin(d, totals, Seq("lang"),
          salts = 8, saltOn = xxhash64(col("id")))
        .select(col("id"), col("lang"), col("n_tok"),
          round(col("n_tok").cast("double") / col("_lt"), 6).as("lang_share"))
        .orderBy("id")
    }),
    // fill-in-the-middle training examples (PSM serialization), cut points
    // a pure LCG function of the doc id — map-only, partition-invariant
    "tp_fim_transform" -> ((s, dir) =>
      graft.text.Packing.fimTransform(Queries.docs(s, dir)).orderBy("id")),
    // sliding 64-token windows at stride 48 — the RAG-ingestion chunker
    "tp_chunk_windows" -> ((s, dir) =>
      graft.text.Packing.chunkWindows(Queries.docs(s, dir))
        .orderBy("id", "chunk_id")),
    // the SAME component labels as gr_components, computed by the
    // alternating large-star/small-star edge rewriting (Kiveris '14) —
    // the O(log² n)-round massive-graph formulation; the shared oracle
    // SQL is what proves the two algorithms agree through the driver
    "gr_components_stars" -> ((s, dir) =>
      GraphSearch.components(Corpus.memories(s, dir),
        graft.dedup.Clusters.connectedComponentsStars(_)).orderBy("id")),
    // IVF × binary composition: cell pruning, then the 16-byte Hamming
    // pre-filter on the pool, then exact re-rank — the maximal-compression
    // serving path on the tier-sweep curve
    "ann_ivfbq_topk" -> ((s, dir) => {
      val cent = Ann.centroidsByLabel(Tables.embeddings(s, dir))
      Ann.ivfBqTopK(Ann.assign(Corpus.memories(s, dir), cent), cent,
        Queries.queryVec(s, dir), k = 10, nprobe = 2, candidates = 50)
    }),
    // batched multi-query IVF: 3 query vectors served by ONE probed scan —
    // the amortization a neighbor-mining pipeline runs
    "ann_ivf_batch" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cent = Ann.centroidsByLabel(emb)
      val qs = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Ann.ivfBatchTopK(Ann.assign(Corpus.memories(s, dir), cent), cent, qs,
          k = 10, nprobe = 2)
        .orderBy("qid", "rank")
    }),
    // packing-efficiency table: packed (concat-and-chunk) vs padded
    // (one-doc-per-sequence) fill rates at three context lengths — the
    // decision table that justifies the packing stage's existence
    "tp_pack_efficiency" -> ((s, dir) => {
      val (_, bpe) = TextAnalysis.tokenCounts(col("text"))
      val toks = Queries.docs(s, dir)
        .select(bpe.cast("long").as("n")).filter(col("n") > 0)
        .localCheckpoint(true)
      Seq(128, 512, 2048).map { l =>
        toks.agg(
            count(lit(1)).as("n_docs"),
            sum("n").as("total_tokens"),
            expr(s"CAST((sum(n) + ${l - 1}) div $l AS BIGINT)").as("packed_seqs"),
            sum(expr(s"(n + ${l - 1}) div $l")).as("padded_seqs"))
          .select(lit(l).cast("int").as("seq_len"), col("n_docs"),
            col("total_tokens"), col("packed_seqs"), col("padded_seqs"),
            round(col("total_tokens").cast("double") / (col("packed_seqs") * l), 6)
              .as("packed_fill"),
            round(col("total_tokens").cast("double") / (col("padded_seqs") * l), 6)
              .as("padded_fill"))
      }.reduce(_ unionAll _).orderBy("seq_len")
    }),
    // snapshot diff: added/removed/changed classification between two
    // corpus states — the audit between snapshots that a rollback or an
    // incremental re-embed reads. "after" applies a deterministic edit
    // set (rev2 texts on id%7=0, deletions of id%13=5, re-idded adds)
    "s10_snapshot_diff" -> ((s, dir) => {
      val mem = Corpus.memories(s, dir)
        .select(col("id"), col("text"), col("source"), col("archived"))
      val after = mem.filter(pmod(col("id"), lit(13)) =!= 5)
        .withColumn("text", when(pmod(col("id"), lit(7)) === 0,
          concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
        .unionByName(mem.filter(pmod(col("id"), lit(31)) === 0)
          .withColumn("id", col("id") + 1000000L))
      graft.sources.Store.diff(mem, after).orderBy("id")
    }),
    // MMR diversity re-ranking: greedy λ·rel − μ·maxSim selection over
    // the 20-candidate vector pool — the de-redundancy step between
    // retrieval and a context window
    "r16_mmr_rerank" -> ((s, dir) =>
      graft.search.Mmr.rerank(Corpus.memories(s, dir),
        Queries.queryVec(s, dir), n = 5, candidates = 20)),
    // per-node clustering coefficient over the similarity graph — which
    // near-dup neighborhoods are clique-like, node by node
    "gr_local_clustering" -> ((s, dir) =>
      GraphSearch.localClustering(dupPairs(s, dir)).orderBy("id")),
    // deterministic label-propagation communities of the similarity graph
    "gr_communities" -> ((s, dir) =>
      GraphSearch.labelPropagation(dupPairs(s, dir), rounds = LpaRounds)
        .orderBy("id")),
    // Newman modularity of that partition — the one-number answer to "did
    // LPA find real structure" (Q > 0) before acting on the communities
    "gr_modularity" -> ((s, dir) => {
      val pairs = dupPairs(s, dir)
      GraphSearch.modularity(pairs,
        GraphSearch.labelPropagation(pairs, rounds = LpaRounds))
    }),
    // ColBERT-shape late interaction: the doc-embedding top-20 pool
    // re-scored by per-query-token MaxSim over subword (char-trigram)
    // hashing token embeddings — exact token evidence re-ranks what one
    // pooled vector blurs
    "r18_maxsim_rerank" -> ((s, dir) =>
      // mode pinned: this is the pure-rerank INSTRUMENT (the ColBERT
      // ordering the blend is measured against); the production default
      // is ModeBlendWrrf since the r15 instruments measured it dominant
      graft.search.LateInteraction.rerank(Corpus.memories(s, dir),
        Queries.QueryTokens.mkString(" "), n = 5, candidates = 20,
        mode = graft.search.LateInteraction.ModeMaxSim)),
    // the same MaxSim stage with the candidate pool read from the
    // persisted IVF index (one probed-cell scan; the corpus is touched
    // only for the probed candidates' text/visibility by id-join)
    "r18_maxsim_indexed" -> ((s, dir) => {
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_li_ivf_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(ivfPath)
      val mem = Corpus.memories(s, dir)
      graft.ann.IvfIndex.build(mem, Tables.embeddings(s, dir), ivfPath)
      graft.search.LateInteraction.rerankIndexed(s, ivfPath, mem,
        Queries.QueryTokens.mkString(" "), n = 5, candidates = 20,
        mode = graft.search.LateInteraction.ModeMaxSim)
    }),
    // passage-level MaxP: line passages of the synthesized c4 pages,
    // each hash-embedded and scored, documents ranked by their BEST
    // passage (max-over-passages, earliest passage wins ties)
    "r19_passage_maxp" -> ((s, dir) =>
      graft.search.Passage.maxP(Queries.c4Pages(s, dir),
        Queries.queryVec(s, dir), k = 10)),
    // the r18 instrument: does MaxSim reranking the vector pool BUY
    // retrieval quality on this corpus? self-retrieval recall/MRR under
    // the pool order vs the MaxSim order, one row per mode
    "ev_maxsim_rerank" -> ((s, dir) =>
      graft.eval.RetrievalEval.maxSimSelfRetrieval(Queries.docs(s, dir))),
    // the cascade's own instrument: fused-hybrid pool (RRF of vector+BM25
    // legs) re-ranked by MaxSim — does late interaction still help AFTER
    // fusion has blended token evidence in through the BM25 leg?
    "ev_maxsim_cascade" -> ((s, dir) =>
      graft.eval.RetrievalEval.maxSimCascadeEval(Queries.docs(s, dir))),
    // the production cascade: the FUSED hybrid top-20 (RRF over
    // vector+BM25+recency+feedback+confidence) re-ordered by MaxSim —
    // retrieve wide with the fused signals, re-rank narrow on token
    // evidence
    "r18_maxsim_hybrid" -> ((s, dir) =>
      graft.search.LateInteraction.rerankHybrid(
        Corpus.memories(s, dir), Some(Corpus.searchFeedback(s, dir)),
        Queries.hybridParams(s, dir), Queries.QueryTokens.mkString(" "),
        n = 5, candidates = 20,
        mode = graft.search.LateInteraction.ModeMaxSim)),
    // passage retrieval through the persisted passage IVF index (r14
    // verdict next-round #3): build the index over exploded c4-page
    // passages (pid = id·2²⁰ + pos, cells = pid mod 8), answer MaxP from
    // ONE probed-cell scan — no passage re-embedded at query time
    "r19_passage_indexed" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_pix_ivf_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(path)
      graft.search.Passage.buildIndex(Queries.c4Pages(s, dir), path)
      graft.search.Passage.maxPIndexed(s, path, Queries.queryVec(s, dir),
        k = 10)
    }),
    // the passage index on the measured-recall ladder: ivfRecallSweep runs
    // UNCHANGED over passage embeddings + the passage index (it is the
    // same IvfIndex lifecycle) — probed-vs-exact top-10 overlap per rung,
    // and autoNprobe therefore sizes the passage nprobe for free
    "ev_passage_recall" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_prec_ivf_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(path)
      val pages = Queries.c4Pages(s, dir)
      graft.search.Passage.buildIndex(pages, path)
      graft.eval.RetrievalEval.ivfRecallSweep(s,
        graft.search.Passage.passageEmbeddings(pages), path,
        nprobes = Seq(1, 2, 4))
    }),
    // the blend instrument (r14 verdict #2): the same vector pool measured
    // under pool / maxsim / blend_rrf / blend_tie final orderings — the
    // table that picks the production cascade mode instead of assuming it
    "ev_maxsim_blend" -> ((s, dir) =>
      graft.eval.RetrievalEval.maxSimBlendEval(Queries.docs(s, dir))),
    // the cascade-side blend instrument: the SAME five orderings over the
    // FUSED hybrid pool — r18_maxsim_blend reranks that pool, so the
    // production mode is validated on its own candidate distribution
    "ev_maxsim_cascade_blend" -> ((s, dir) =>
      graft.eval.RetrievalEval.maxSimCascadeBlendEval(Queries.docs(s, dir))),
    // the pool-weight ladder behind BlendPoolWeight = 0.7: the same
    // scored pool ranked at w ∈ {0.5..0.9}, one metrics row per rung —
    // the production constant is a read-off from this curve
    "ev_maxsim_blend_sweep" -> ((s, dir) =>
      graft.eval.RetrievalEval.maxSimBlendWeightSweep(Queries.docs(s, dir))),
    // the production cascade in the mode ev_maxsim_blend MEASURES as
    // dominant (sf0.01: recall@1 0.857 = pool, recall@10 1.0 = maxsim's
    // win, MRR 0.917 > both): the fused hybrid pool re-ordered by the
    // pool-weighted steep-k RRF of (pool rank, MaxSim rank) — the fused
    // top-1 signal survives while token evidence repairs the tail,
    // instead of MaxSim replacing the fused order outright
    // NO explicit mode: the production cascade runs on the API DEFAULT,
    // which IS ModeBlendWrrf since r16 (r15 verdict #1) — this oracle gate
    // therefore pins the default itself, not just the mode constant
    "r18_maxsim_blend" -> ((s, dir) =>
      graft.search.LateInteraction.rerankHybrid(
        Corpus.memories(s, dir), Some(Corpus.searchFeedback(s, dir)),
        Queries.hybridParams(s, dir), Queries.QueryTokens.mkString(" "),
        n = 5, candidates = 20)),
    // the BATCH cascade (r16 verdict #1 — the last per-query production
    // loop): two hybrid retrievals (vec_id 0/1, each with its own rerank
    // text) pooled by batchSearch, re-ranked in ONE token-explode pass +
    // one per-qid windowed fold on the API-default blend. Oracle = the
    // per-qid union of the two single-query r18_maxsim_blend replays —
    // the hash-match IS the batch ≡ N-independent-runs proof (the
    // r15_batch_* precedent), and the disjoint qid-1 token set means a
    // cross-qid token leak cannot match
    "r18_maxsim_batch" -> ((s, dir) => {
      val p0 = Queries.hybridParams(s, dir)
      val p1 = p0.copy(queryVec = Queries.queryVec(s, dir, 1))
      graft.search.LateInteraction.rerankHybridBatch(
        Corpus.memories(s, dir), Some(Corpus.searchFeedback(s, dir)),
        Seq((p0, Queries.QueryTokens.mkString(" ")),
          (p1, Queries.QueryTokens2.mkString(" "))),
        n = 5, candidates = 20)
    }),
    // the INDEXED batch cascade — the full production shape: the pool is
    // batchSearchIndexed's shared plan (one pruned postings scan + one
    // probed-cell scan + one index epoch for the whole batch), the rerank
    // the one-pass batch tail. Oracle = the per-qid union of two indexed
    // blend replays, each vector CTE restricted to ITS query's probed
    // cells (the r15_batch_indexed restriction composed with the
    // r18_maxsim_blend tail)
    "r18_maxsim_batch_indexed" -> ((s, dir) => {
      val bm25Path = s"${sys.props("java.io.tmpdir")}/graft_mbx_bm25_${ProcessHandle.current().pid()}"
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_mbx_ivf_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(bm25Path); Queries.reapAtExit(ivfPath)
      val mem = Corpus.memories(s, dir)
      graft.search.BM25Index.build(mem, bm25Path)
      graft.ann.IvfIndex.build(mem, Tables.embeddings(s, dir), ivfPath)
      val p0 = Queries.hybridParams(s, dir)
      val p1 = p0.copy(queryVec = Queries.queryVec(s, dir, 1))
      graft.search.LateInteraction.rerankIndexedBatch(s, bm25Path, ivfPath,
        mem, Some(Corpus.searchFeedback(s, dir)),
        Seq((p0, Queries.QueryTokens.mkString(" ")),
          (p1, Queries.QueryTokens2.mkString(" "))),
        n = 5, candidates = 20)
    }),
    // the WARM batch cascade — the production steady-state throughput
    // shape at 100 TB: the per-JVM prebuilt index pair (bench rep 1 pays
    // the one-time build, reps 2-3 time the warm read — the
    // r4_hybrid_prebuilt precedent), ONE shared-plan batch pool and ONE
    // batch tail for all N queries. Same builds, same rows, same oracle
    // as r18_maxsim_batch_indexed (the prebuilt pair IS the same
    // full-corpus build memoized). NOT job-count-pinned: the memo makes
    // in-suite counts order-dependent by design.
    "r18_batch_prebuilt" -> ((s, dir) => {
      val (bm25Path, ivfPath) = Queries.prebuiltHybridIndexes(s, dir)
      val mem = Corpus.memories(s, dir)
      val p0 = Queries.hybridParams(s, dir)
      val p1 = p0.copy(queryVec = Queries.queryVec(s, dir, 1))
      graft.search.LateInteraction.rerankIndexedBatch(s, bm25Path, ivfPath,
        mem, Some(Corpus.searchFeedback(s, dir)),
        Seq((p0, Queries.QueryTokens.mkString(" ")),
          (p1, Queries.QueryTokens2.mkString(" "))),
        n = 5, candidates = 20)
    }))

  private val bqQ =
    "(SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)"

  /** Binary-tier CTEs: bqh(id, hamming) computed SEMANTICALLY (per-dim sign
    * disagreement count) — the Spark side computes the same number through
    * packed-long XOR+popcount, so the hash-match proves the bit packing —
    * and bqc(id, hamming), the Hamming top-50 candidate pool. */
  private val bqCtes: String =
    s"""bqh AS MATERIALIZED (
       |  SELECT m.id, CAST(len(list_filter(range(1, 65), i ->
       |    (CAST(m.embedding[i] AS DOUBLE) > 0) <> (CAST(q.qv[i] AS DOUBLE) > 0))) AS INTEGER) AS hamming
       |  FROM memories m CROSS JOIN $bqQ q WHERE NOT m.archived),
       |bqc AS MATERIALIZED (
       |  SELECT id, hamming FROM bqh ORDER BY hamming, id LIMIT 50)""".stripMargin

  /** Unigram-LM + centi-grid tercile CTEs: unll(id, n_tok, nll) (kept in
    * lockstep with the ta_unigram_nll oracle), ubin (+ integer centi-bin),
    * ut(t1, t2) — nearest-rank tercile thresholds over the bounded
    * histogram, integer-ceildiv ranks. */
  private val pplCtes: String = {
    val t = OracleText.toks("text")
    s"""uterm AS MATERIALIZED (
       |  SELECT doc_id AS id, t.term FROM documents, unnest($t) AS t(term)),
       |ustats AS MATERIALIZED (SELECT term, count(*) AS tf FROM uterm GROUP BY 1),
       |utot AS (SELECT CAST(sum(tf) AS BIGINT) AS total FROM ustats),
       |ulnp AS MATERIALIZED (
       |  SELECT term,
       |    CAST(round(ln(CAST(tf AS DOUBLE) / total) * 1e6, 0) AS BIGINT) AS lnp_micro
       |  FROM ustats, utot),
       |unll AS MATERIALIZED (
       |  SELECT id, CAST(count(*) AS BIGINT) AS n_tok,
       |    round(-CAST(sum(lnp_micro) AS DOUBLE) / 1e6 / count(*), 6) AS nll
       |  FROM uterm JOIN ulnp USING (term) GROUP BY id),
       |ubin AS MATERIALIZED (
       |  SELECT id, n_tok, nll, CAST(round(nll * 10000, 0) AS BIGINT) AS bin FROM unll),
       |ucum AS (
       |  SELECT bin, sum(c) OVER (ORDER BY bin) AS cum
       |  FROM (SELECT bin, count(*) AS c FROM ubin GROUP BY 1)),
       |un AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ubin),
       |ut AS (
       |  SELECT min(CASE WHEN cum >= (n + 2) // 3 THEN bin END) AS t1,
       |         min(CASE WHEN cum >= (2 * n + 2) // 3 THEN bin END) AS t2
       |  FROM ucum, un)""".stripMargin
  }

  /** Unrolled synchronous-LPA chain over `lpe(a, b)`: lp0 .. lp$rounds,
    * each round the (count desc, label asc) neighbor argmax — kept in
    * lockstep with [[graft.search.GraphSearch.labelPropagation]]. */
  private def lpaChain(rounds: Int): String = {
    val init =
      """lp0 AS MATERIALIZED (
        |  SELECT v, v AS lab FROM (
        |    SELECT a AS v FROM lpe UNION SELECT b FROM lpe))""".stripMargin
    val steps = (0 until rounds).map { i =>
      s"""nl$i AS (
         |  SELECT e.a AS v, l.lab FROM lpe e JOIN lp$i l ON l.v = e.b
         |  UNION ALL
         |  SELECT e.b AS v, l.lab FROM lpe e JOIN lp$i l ON l.v = e.a),
         |lp${i + 1} AS MATERIALIZED (
         |  SELECT v, lab FROM (
         |    SELECT v, lab, row_number() OVER (PARTITION BY v ORDER BY c DESC, lab) AS rn
         |    FROM (SELECT v, lab, count(*) AS c FROM nl$i GROUP BY 1, 2))
         |  WHERE rn = 1)""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }

  private val lpaHead: String =
    s"""${OracleCtes.memories},
       |${OracleText.dupPairsCte(0.35)},
       |lpe AS MATERIALIZED (
       |  SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
       |  FROM pr WHERE id_a <> id_b),
       |${lpaChain(LpaRounds)}""".stripMargin

  /** Single-quote escape for string values interpolated into oracle SQL
    * literals (r14 ADVICE: a quote or SQL-significant character in a
    * query token would otherwise silently break the oracle text). */
  private def sqlLit(s: String): String = s.replace("'", "''")

  private val liQText = sqlLit(Queries.QueryTokens.mkString(" "))

  /** The MaxSim score CTEs over a pool CTE `lpool(id, rel, text)` and the
    * query-embed chain `lq*` — shared by every r18 oracle tail so the
    * scoring replay cannot drift between legs/modes. Ends with
    * lfin(id, rel, smicro). Parameterized by the query token set (the
    * batch oracle replays qid 1 with [[Queries.QueryTokens2]]); the no-arg
    * lazy vals keep every pre-existing oracle byte-identical. */
  private def maxSimScoreCtesFor(tokens: Seq[String]): String = {
    val qVals = tokens.map(t => s"('${sqlLit(t)}')").mkString(", ")
    s"""ldt AS MATERIALIZED (
       |  SELECT p.id, t.term
       |  FROM lpool p, unnest(list_distinct(${OracleText.toks("p.text")})) AS t(term)),
       |${OracleText.embedCtesOver(s"(SELECT term AS id, ${OracleText.gramSql("term")} AS text FROM (SELECT DISTINCT term FROM ldt)) ldsrc", 64, "ld")},
       |${OracleText.embedCtesOver(s"(SELECT term AS id, ${OracleText.gramSql("term")} AS text FROM (VALUES $qVals) v(term)) lesrc", 64, "le")},
       |lms AS MATERIALIZED (
       |  SELECT d.id, qe.id AS qterm,
       |    max(CAST(round(${OracleCtes.dot64("de.e", "qe.e")} * 1e6, 0) AS BIGINT)) AS ms
       |  FROM ldt d JOIN ldf de ON de.id = d.term CROSS JOIN lef qe
       |  GROUP BY 1, 2),
       |lsc AS (SELECT id, CAST(sum(ms) AS BIGINT) AS smicro FROM lms GROUP BY 1),
       |lfin AS MATERIALIZED (
       |  SELECT p.id, p.rel, coalesce(s.smicro, CAST(0 AS BIGINT)) AS smicro
       |  FROM lpool p LEFT JOIN lsc s USING (id))""".stripMargin
  }

  private lazy val maxSimScoreCtesSql: String =
    maxSimScoreCtesFor(Queries.QueryTokens)

  /** Pure-MaxSim final ordering (the original r18 tail). */
  private lazy val maxSimTailSql: String =
    s"""$maxSimScoreCtesSql
       |SELECT * FROM (
       |  SELECT CAST(row_number() OVER (ORDER BY smicro DESC, id) AS INTEGER) AS rank,
       |    id, rel, round(smicro / 1e6, 6) AS maxsim
       |  FROM lfin)
       |WHERE rank <= 5 ORDER BY rank""".stripMargin

  /** Weighted-RRF blend final ordering (r14 verdict #2, LateInteraction
    * ModeBlendWrrf — the mode ev_maxsim_blend measures as dominant):
    * 0-based pool and MaxSim ranks fused as 2w/(k₀+pr) + 2(1−w)/(k₀+mr),
    * blend 6dp, ties by id. */
  private def maxSimBlendTailSqlFor(tokens: Seq[String]): String = {
    val li = graft.search.LateInteraction
    val (w, k0) = (li.BlendPoolWeight, li.BlendRrfK)
    s"""${maxSimScoreCtesFor(tokens)},
       |lrk AS (
       |  SELECT id, rel, smicro,
       |    row_number() OVER (ORDER BY rel DESC, id) AS pr,
       |    row_number() OVER (ORDER BY smicro DESC, id) AS mr
       |  FROM lfin)
       |SELECT * FROM (
       |  SELECT CAST(row_number() OVER (ORDER BY bl DESC, id) AS INTEGER) AS rank,
       |    id, rel, round(smicro / 1e6, 6) AS maxsim, bl AS blend
       |  FROM (SELECT id, rel, smicro,
       |          round(${2 * w}/($k0 + pr - 1) + ${2 * (1 - w)}/($k0 + mr - 1), 6) AS bl
       |        FROM lrk))
       |WHERE rank <= 5 ORDER BY rank""".stripMargin
  }

  private lazy val maxSimBlendTailSql: String =
    maxSimBlendTailSqlFor(Queries.QueryTokens)

  /** One full single-query blend-cascade replay (the r18_maxsim_blend SQL
    * parameterized over vec_id + rerank tokens) — the batch oracle unions
    * two of these. */
  private def maxSimBlendSqlFor(vecId: Long, tokens: Seq[String]): String =
    s"""WITH ${OracleCtes.memories},
       |${OracleCtes.searchFeedback},
       |${OracleHybrid.fusedCtes(Queries.oracleHybridParams.copy(k = 20), n = 1000000, vecId = vecId)},
       |lpool AS MATERIALIZED (
       |  SELECT f.id, round(f.rrf, 6) AS rel, m.text
       |  FROM fused f JOIN memories m USING (id)
       |  ORDER BY f.rrf DESC, f.id LIMIT 20),
       |${maxSimBlendTailSqlFor(tokens)}""".stripMargin

  /** [[maxSimBlendSqlFor]] with the vector leg's candidate pool restricted
    * to the query's probed cells (asg/cent/probe replayed from first
    * principles against THIS query's vec_id — the r15_batch_indexed
    * restriction) — one leg of the indexed batch oracle's union. */
  private def maxSimBlendIndexedSqlFor(vecId: Long, tokens: Seq[String]): String =
    s"""WITH ${OracleCtes.memories},
       |${OracleCtes.searchFeedback},
       |${Queries.ivfCtesOver("memories", vecId)},
       |${OracleHybrid.fusedCtes(Queries.oracleHybridParams.copy(k = 20), n = 1000000, vecId = vecId,
          vecJoin = "JOIN asg ia ON m.id = ia.id JOIN probe ip ON ia.ivf_cell = ip.label")},
       |lpool AS MATERIALIZED (
       |  SELECT f.id, round(f.rrf, 6) AS rel, m.text
       |  FROM fused f JOIN memories m USING (id)
       |  ORDER BY f.rrf DESC, f.id LIMIT 20),
       |${maxSimBlendTailSqlFor(tokens)}""".stripMargin

  /** Shared head of the MaxSim instruments' oracles: corpus, the
    * truncated-self-retrieval query set, and both embed chains
    * (ef = corpus docs, qef = queries). */
  private lazy val maxSimEvalHeadSql: String = {
    val ev = graft.eval.RetrievalEval
    val t = OracleText.toks("text")
    s"""corpus AS MATERIALIZED (SELECT doc_id AS id, text FROM documents),
       |qdoc AS MATERIALIZED (
       |  SELECT id AS qid, array_to_string(t[1:greatest(len(t) // 2, 1)], ' ') AS text
       |  FROM (SELECT id, $t AS t FROM corpus)
       |  WHERE id % ${ev.SampleMod} = 0 AND len(t) >= 4
       |  ORDER BY ${graft.functions.SparkHash.spreadSql("qid")}, qid LIMIT ${ev.MaxQueries}),
       |${OracleText.embedCtesOver("corpus", 64)},
       |${OracleText.embedCtesOver("(SELECT qid AS id, text FROM qdoc) qsrc", 64, "qe")}""".stripMargin
  }

  /** Shared tail of the MaxSim instruments' oracles, over a pool CTE
    * `mpool(qid, id, ps)` in scope: the micro-unit MaxSim fold (one
    * term-embed chain over the union of doc+query terms), gold ranks
    * counted within the pool under the pool order vs the MaxSim order
    * (sentinel when the gold missed the pool), one metrics row per
    * mode. Parameterized only by the emitted mode labels so the two
    * instruments cannot drift. */
  /** One metrics row over a rank relation `rel(qid, rnk)`. */
  private def maxSimEvalMetSql(mode: String, rel: String): String =
    s"""SELECT '$mode' AS mode, CAST(count(*) AS BIGINT) AS n_queries,
       |  round(CAST(count(*) FILTER (WHERE rnk <= 1) AS DOUBLE) / count(*), 6) AS recall_at_1,
       |  round(CAST(count(*) FILTER (WHERE rnk <= 5) AS DOUBLE) / count(*), 6) AS recall_at_5,
       |  round(CAST(count(*) FILTER (WHERE rnk <= 10) AS DOUBLE) / count(*), 6) AS recall_at_10,
       |  round(CAST(sum(CASE WHEN rnk <= 10 THEN 1000000 // rnk ELSE 0 END) AS DOUBLE) / 1000000.0 / count(*), 6) AS mrr_at_10
       |FROM $rel""".stripMargin

  /** The MaxSim-instrument score CTEs over a pool CTE `mpool(qid, id, ps)`
    * — one term-embed chain over the union of doc+query terms, the
    * micro-unit MaxSim fold per (qid, id). Ends with
    * mfin(qid, id, ps, smicro); shared by every instrument tail so the
    * replay cannot drift between them. */
  private lazy val maxSimEvalScoreCtesSql: String =
    s"""mdt AS MATERIALIZED (
       |  SELECT p.qid, p.id, t.term
       |  FROM mpool p JOIN corpus c ON c.id = p.id,
       |    unnest(list_distinct(${OracleText.toks("c.text")})) AS t(term)),
       |mqt AS MATERIALIZED (
       |  SELECT q.qid, t.term AS qterm
       |  FROM qdoc q, unnest(list_distinct(${OracleText.toks("q.text")})) AS t(term)),
       |${OracleText.embedCtesOver(s"(SELECT term AS id, ${OracleText.gramSql("term")} AS text FROM (SELECT DISTINCT term FROM (SELECT term FROM mdt UNION SELECT qterm FROM mqt))) mtsrc", 64, "mt")},
       |mms AS MATERIALIZED (
       |  SELECT d.qid, d.id, q.qterm,
       |    max(CAST(round(${OracleCtes.dot64("de.e", "qe.e")} * 1e6, 0) AS BIGINT)) AS ms
       |  FROM mdt d JOIN mqt q ON q.qid = d.qid
       |  JOIN mtf de ON de.id = d.term JOIN mtf qe ON qe.id = q.qterm
       |  GROUP BY 1, 2, 3),
       |msc AS (SELECT qid, id, CAST(sum(ms) AS BIGINT) AS smicro FROM mms GROUP BY 1, 2),
       |mfin AS MATERIALIZED (
       |  SELECT p.qid, p.id, p.ps, coalesce(s.smicro, CAST(0 AS BIGINT)) AS smicro
       |  FROM mpool p LEFT JOIN msc s ON s.qid = p.qid AND s.id = p.id)""".stripMargin

  private def maxSimEvalTailSql(poolMode: String, maxMode: String): String = {
    val ev = graft.eval.RetrievalEval
    s"""$maxSimEvalScoreCtesSql,
       |mgold AS (SELECT qid, ps AS gs, smicro AS gm FROM mfin WHERE id = qid),
       |mprank AS (
       |  SELECT f.qid, CASE WHEN g.gs IS NULL THEN ${ev.UnrankedSentinel}
       |    ELSE 1 + count(*) FILTER (
       |      WHERE f.ps > g.gs OR (f.ps = g.gs AND f.id < f.qid)) END AS rnk
       |  FROM mfin f LEFT JOIN mgold g USING (qid) GROUP BY f.qid, g.gs),
       |mmrank AS (
       |  SELECT f.qid, CASE WHEN g.gm IS NULL THEN ${ev.UnrankedSentinel}
       |    ELSE 1 + count(*) FILTER (
       |      WHERE f.smicro > g.gm OR (f.smicro = g.gm AND f.id < f.qid)) END AS rnk
       |  FROM mfin f LEFT JOIN mgold g USING (qid) GROUP BY f.qid, g.gm)
       |${maxSimEvalMetSql(maxMode, "mmrank")}
       |UNION ALL
       |${maxSimEvalMetSql(poolMode, "mprank")}
       |ORDER BY mode""".stripMargin
  }

  private def pdot(a: String, b: String) =
    s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  /** The passage-index replay shared by the r19 indexed oracles: the c4
    * page chain, exploded passages, the passage embed chain, composite
    * pids with pid-mod-8 labels, per-label normalized-mean centroids, and
    * the nearest-centroid assignment. Ends with pemb(pid, label, emb),
    * pcent(label, centroid), pasg(pid, cell). Kept in lockstep with
    * [[graft.search.Passage.buildIndex]]. */
  private lazy val passageIndexCtes: String = {
    val stride = graft.search.Passage.PosStride
    val nlist = 8
    s"""${OracleText.c4Ctes()},
       |ppas0 AS (
       |  SELECT id, unnest(range(0, len(lines))) AS pos0, unnest(lines) AS para
       |  FROM c4split),
       |ppas AS MATERIALIZED (
       |  SELECT id, CAST(pos0 AS INT) AS pos, para FROM ppas0),
       |${OracleText.embedCtesOver("(SELECT CAST(id AS VARCHAR) || '#' || CAST(pos AS VARCHAR) AS id, para AS text FROM ppas) ppsrc", 64, "pp")},
       |pemb AS MATERIALIZED (
       |  SELECT p.id * $stride + p.pos AS pid,
       |    CAST((p.id * $stride + p.pos) % $nlist AS INT) AS label,
       |    f.e AS emb
       |  FROM ppas p JOIN ppf f
       |    ON f.id = CAST(p.id AS VARCHAR) || '#' || CAST(p.pos AS VARCHAR)),
       |pc0 AS (
       |  SELECT label, t.i, avg(emb[t.i]) AS m
       |  FROM pemb, range(1, 65) t(i) GROUP BY 1, 2),
       |pcn AS (SELECT label, sqrt(sum(m * m)) AS nrm FROM pc0 GROUP BY 1),
       |pcent AS MATERIALIZED (
       |  SELECT c.label, list(c.m / n.nrm ORDER BY c.i) AS centroid
       |  FROM pc0 c JOIN pcn n USING (label) GROUP BY c.label),
       |pasg AS MATERIALIZED (
       |  SELECT pid, label AS cell FROM (
       |    SELECT e.pid, c.label, row_number() OVER (PARTITION BY e.pid ORDER BY
       |      ${pdot("e.emb", "c.centroid")} DESC, c.label) AS rn
       |    FROM pemb e, pcent c) WHERE rn = 1)""".stripMargin
  }

  /** [[graft.eval.RetrievalEval.ivfRecallSweep]] replayed over the
    * passage index — the probed-vs-exact overlap per rung, qs capped with
    * the same order-stable LIMIT as the memories-side sweep oracle. */
  private def passageRecallSweepSql(nprobes: Seq[Int]): String = {
    val ev = graft.eval.RetrievalEval
    val exSim = s"round(${pdot("e.emb", "q.qv")}, 6)"
    val rungs = nprobes.map { np =>
      s"""prq$np AS MATERIALIZED (
         |  SELECT qid, label FROM (
         |    SELECT q.qid, c.label, row_number() OVER (PARTITION BY q.qid ORDER BY
         |      ${pdot("c.centroid", "q.qv")} DESC, c.label) AS rn
         |    FROM pqs q, pcent c) WHERE rn <= $np),
         |pix$np AS MATERIALIZED (
         |  SELECT qid, pid FROM (
         |    SELECT q.qid, e.pid,
         |      row_number() OVER (PARTITION BY q.qid ORDER BY $exSim DESC, e.pid) AS rn
         |    FROM pqs q JOIN prq$np p ON p.qid = q.qid
         |    JOIN pasg a ON a.cell = p.label
         |    JOIN pemb e ON e.pid = a.pid) WHERE rn <= 10),
         |phits$np AS (SELECT qid, count(*) AS h FROM pex JOIN pix$np USING (qid, pid) GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val selects = nprobes.map { np =>
      s"""SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(10 AS BIGINT) AS k, CAST($np AS BIGINT) AS nprobe,
         |  CAST(sum(ne) AS BIGINT) AS n_exact,
         |  CAST(coalesce(sum(h), 0) AS BIGINT) AS n_hits,
         |  CAST(coalesce((2 * 1000000 * coalesce(sum(h), 0) + sum(ne)) // (2 * sum(ne)), 0) AS BIGINT) AS recall_ppm
         |FROM pexn LEFT JOIN phits$np USING (qid)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $passageIndexCtes,
       |pqs AS MATERIALIZED (
       |  SELECT pid AS qid, emb AS qv FROM pemb
       |  WHERE pid % ${ev.SampleMod} = 0
       |  ORDER BY ${graft.functions.SparkHash.spreadSql("qid")}, qid LIMIT ${ev.MaxQueries}),
       |pex AS MATERIALIZED (
       |  SELECT qid, pid FROM (
       |    SELECT q.qid, e.pid,
       |      row_number() OVER (PARTITION BY q.qid ORDER BY $exSim DESC, e.pid) AS rn
       |    FROM pemb e, pqs q) WHERE rn <= 10),
       |pexn AS (SELECT qid, count(*) AS ne FROM pex GROUP BY 1),
       |$rungs
       |SELECT * FROM (
       |$selects
       |) ORDER BY nprobe""".stripMargin
  }

  /** The w-ladder tail over mfin: shared pr/mr window ranks, one
    * 6dp-rounded blend ordering + gold-rank read per rung, the shared
    * metrics row per rung (mode `wrrf_0NN`). Kept in lockstep with
    * [[graft.eval.RetrievalEval.maxSimBlendWeightSweep]]. */
  private def maxSimBlendWeightSweepTailSql(weights: Seq[Double]): String = {
    val ev = graft.eval.RetrievalEval
    val k0 = graft.search.LateInteraction.BlendRrfK
    val rungs = weights.zipWithIndex.map { case (w, i) =>
      s"""msw$i AS (
         |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY
         |    round(${2 * w}/($k0 + pr - 1) + ${2 * (1 - w)}/($k0 + mr - 1), 6) DESC, id) AS wr
         |  FROM msrk),
         |msg$i AS (
         |  SELECT q.qid, coalesce(b.wr, ${ev.UnrankedSentinel}) AS rnk
         |  FROM qdoc q LEFT JOIN msw$i b ON b.qid = q.qid AND b.id = q.qid)""".stripMargin
    }.mkString(",\n")
    val mets = weights.zipWithIndex.map { case (w, i) =>
      maxSimEvalMetSql(f"wrrf_${math.round(w * 100)}%03d", s"msg$i")
    }.mkString("\nUNION ALL\n")
    s"""$maxSimEvalScoreCtesSql,
       |msrk AS MATERIALIZED (
       |  SELECT qid, id,
       |    row_number() OVER (PARTITION BY qid ORDER BY ps DESC, id) AS pr,
       |    row_number() OVER (PARTITION BY qid ORDER BY smicro DESC, id) AS mr
       |  FROM mfin),
       |$rungs
       |SELECT * FROM (
       |$mets
       |) ORDER BY mode""".stripMargin
  }

  /** The vector-mode pool of the MaxSim instruments (per-qid top-20 of
    * the hash-embedded corpus), shared by ev_maxsim_rerank and
    * ev_maxsim_blend: mpool(qid, id, ps). */
  private lazy val maxSimVectorPoolCtes: String =
    """mvs AS (
      |  SELECT q.id AS qid, d.id,
      |    round(list_sum(list_transform(range(1, 65), i -> d.e[i] * q.e[i])), 6) AS sim
      |  FROM ef d CROSS JOIN qef q),
      |mpool AS MATERIALIZED (
      |  SELECT qid, id, sim AS ps FROM (
      |    SELECT qid, id, sim,
      |      row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rn
      |    FROM mvs) WHERE rn <= 20)""".stripMargin

  /** The fused-hybrid pool of the cascade instruments (vector + BM25 legs
    * oversampled 30, RRF 0.7 / 1−0.7, cut at 20 by unrounded f, ranked by
    * round(f, 6)), shared by ev_maxsim_cascade and
    * ev_maxsim_cascade_blend: mpool(qid, id, ps). */
  private lazy val maxSimHybridPoolCtes: String =
    s"""cvs AS (
       |  SELECT q.id AS qid, d.id,
       |    round(list_sum(list_transform(range(1, 65), i -> d.e[i] * q.e[i])), 6) AS sim
       |  FROM ef d CROSS JOIN qef q),
       |cvr AS MATERIALIZED (SELECT qid, id, rn - 1 AS rv FROM (
       |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rn
       |  FROM cvs) WHERE rn <= 30),
       |${OracleHybrid.bm25BatchCtes("corpus", "qdoc")},
       |cbr AS MATERIALIZED (SELECT qid, id, rn - 1 AS rb FROM (
       |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY bm25 DESC, id) AS rn
       |  FROM bm WHERE bm25 > 0) WHERE rn <= 30),
       |cfu AS (SELECT coalesce(v.qid, b.qid) AS qid, coalesce(v.id, b.id) AS id,
       |  coalesce(0.7 / (v.rv + ${graft.search.HybridSearch.RrfK}), 0.0)
       |    + coalesce((1.0 - 0.7) / (b.rb + ${graft.search.HybridSearch.RrfK}), 0.0) AS f
       |  FROM cvr v FULL OUTER JOIN cbr b ON v.qid = b.qid AND v.id = b.id),
       |mpool AS MATERIALIZED (
       |  SELECT qid, id, round(f, 6) AS ps FROM (
       |    SELECT qid, id, f, row_number() OVER (PARTITION BY qid ORDER BY f DESC, id) AS rn
       |    FROM cfu) WHERE rn <= 20)""".stripMargin

  /** The four-mode blend-instrument tail (r14 verdict #2): per-qid window
    * ranks under the pool, MaxSim, RRF-blend and pool-first-tiebreak
    * orderings of the SAME mfin rows, the gold's position (miss sentinel
    * when absent) through the shared metrics row per mode. */
  private def maxSimBlendEvalTailSql(prefix: String = ""): String = {
    val ev = graft.eval.RetrievalEval
    val k = graft.search.HybridSearch.RrfK
    val li = graft.search.LateInteraction
    val (w, k0) = (li.BlendPoolWeight, li.BlendRrfK)
    s"""$maxSimEvalScoreCtesSql,
       |mrk AS (
       |  SELECT qid, id,
       |    row_number() OVER (PARTITION BY qid ORDER BY ps DESC, id) AS pr,
       |    row_number() OVER (PARTITION BY qid ORDER BY smicro DESC, id) AS mr,
       |    row_number() OVER (PARTITION BY qid ORDER BY ps DESC, smicro DESC, id) AS tr
       |  FROM mfin),
       |mbl AS MATERIALIZED (
       |  SELECT qid, id, pr, mr, tr,
       |    row_number() OVER (PARTITION BY qid ORDER BY
       |      round(1.0/($k + pr - 1) + 1.0/($k + mr - 1), 6) DESC, id) AS br,
       |    row_number() OVER (PARTITION BY qid ORDER BY
       |      round(${2 * w}/($k0 + pr - 1) + ${2 * (1 - w)}/($k0 + mr - 1), 6) DESC, id) AS wr
       |  FROM mrk),
       |mg AS MATERIALIZED (
       |  SELECT q.qid, b.pr, b.mr, b.tr, b.br, b.wr
       |  FROM qdoc q LEFT JOIN mbl b ON b.qid = q.qid AND b.id = q.qid),
       |mgp AS (SELECT qid, coalesce(pr, ${ev.UnrankedSentinel}) AS rnk FROM mg),
       |mgm AS (SELECT qid, coalesce(mr, ${ev.UnrankedSentinel}) AS rnk FROM mg),
       |mgb AS (SELECT qid, coalesce(br, ${ev.UnrankedSentinel}) AS rnk FROM mg),
       |mgt AS (SELECT qid, coalesce(tr, ${ev.UnrankedSentinel}) AS rnk FROM mg),
       |mgw AS (SELECT qid, coalesce(wr, ${ev.UnrankedSentinel}) AS rnk FROM mg)
       |SELECT * FROM (
       |${maxSimEvalMetSql(s"${prefix}pool", "mgp")}
       |UNION ALL
       |${maxSimEvalMetSql(s"${prefix}maxsim", "mgm")}
       |UNION ALL
       |${maxSimEvalMetSql(s"${prefix}blend_rrf", "mgb")}
       |UNION ALL
       |${maxSimEvalMetSql(s"${prefix}blend_tie", "mgt")}
       |UNION ALL
       |${maxSimEvalMetSql(s"${prefix}blend_wrrf", "mgw")})
       |ORDER BY mode""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "ann_bq_topk" ->
      s"""WITH ${OracleCtes.memories},
         |$bqCtes
         |SELECT c.id, c.hamming,
         |  round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) AS sim
         |FROM bqc c JOIN memories m USING (id) CROSS JOIN $bqQ q
         |ORDER BY sim DESC, c.id LIMIT 10""".stripMargin,
    "ann_bq_recall" ->
      s"""WITH ${OracleCtes.memories},
         |$bqCtes,
         |bqt AS (
         |  SELECT c.id FROM bqc c JOIN memories m USING (id) CROSS JOIN $bqQ q
         |  ORDER BY round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) DESC, c.id
         |  LIMIT 10),
         |bqx AS (
         |  SELECT m.id FROM memories m CROSS JOIN $bqQ q WHERE NOT m.archived
         |  ORDER BY round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) DESC, m.id
         |  LIMIT 10)
         |SELECT round(CAST(count(*) AS DOUBLE) / 10.0, 6) AS recall_at_10
         |FROM bqt JOIN bqx USING (id)""".stripMargin,
    // full-corpus binary SQL — the build+refresh split must reproduce it;
    // the index stores ALL rows (visibility is a re-rank-time filter), so
    // the candidate CTE here is unfiltered, unlike ann_bq_topk's
    "ann_bq_indexed" ->
      s"""WITH ${OracleCtes.memories},
         |bqih AS MATERIALIZED (
         |  SELECT m.id, CAST(len(list_filter(range(1, 65), i ->
         |    (CAST(m.embedding[i] AS DOUBLE) > 0) <> (CAST(q.qv[i] AS DOUBLE) > 0))) AS INTEGER) AS hamming
         |  FROM memories m CROSS JOIN $bqQ q),
         |bqic AS (SELECT id, hamming FROM bqih ORDER BY hamming, id LIMIT 50)
         |SELECT c.id, c.hamming,
         |  round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) AS sim
         |FROM bqic c JOIN memories m USING (id) CROSS JOIN $bqQ q
         |WHERE NOT m.archived
         |ORDER BY sim DESC, c.id LIMIT 10""".stripMargin,
    "ann_tier_sweep" -> {
      def arm(tier: String, bytes: Int, candSel: String) =
        s"""(SELECT '$tier' AS tier, CAST($bytes AS INTEGER) AS bytes_per_vec,
           |  round(CAST((SELECT count(*) FROM ($candSel) c JOIN swxt USING (id)) AS DOUBLE) / 10.0, 6) AS recall_at_10)""".stripMargin
      s"""WITH ${OracleCtes.memories},
         |vism AS MATERIALIZED (SELECT * FROM memories WHERE NOT archived),
         |$bqCtes,
         |${OracleCtes.sq8Ctes()},
         |${QueriesScale.pqCtes("vism")},
         |oen AS (
         |  SELECT t.i AS pos, sum(
         |    CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000, 0) AS BIGINT) *
         |    CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000, 0) AS BIGINT)) AS e
         |  FROM embeddings, range(1, 65) t(i) GROUP BY 1),
         |operm AS MATERIALIZED (
         |  SELECT r + 1 AS newpos, pos AS oldpos
         |  FROM (SELECT pos, row_number() OVER (ORDER BY e DESC, pos) - 1 AS r FROM oen)),
         |oremb AS MATERIALIZED (
         |  SELECT e.label, e.vec_id,
         |    list(CAST(e.embedding[p.oldpos] AS DOUBLE) ORDER BY p.newpos) AS embedding
         |  FROM embeddings e, operm p GROUP BY 1, 2),
         |ovism AS MATERIALIZED (
         |  SELECT m.id,
         |    list(CAST(m.embedding[p.oldpos] AS DOUBLE) ORDER BY p.newpos) AS embedding
         |  FROM vism m, operm p GROUP BY 1),
         |${QueriesScale.pqCtes("ovism", "oremb", "oq")},
         |swxt AS MATERIALIZED (
         |  SELECT m.id FROM memories m CROSS JOIN $bqQ q WHERE NOT m.archived
         |  ORDER BY round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) DESC, m.id
         |  LIMIT 10)
         |SELECT * FROM (
         |${arm("sq8", 72, "SELECT id FROM sq8 ORDER BY qscore DESC, id LIMIT 50")}
         | UNION ALL ${arm("pq", 8, "SELECT id FROM pqadc ORDER BY adc DESC, id LIMIT 50")}
         | UNION ALL ${arm("bq", 16, "SELECT id FROM bqc")}
         | UNION ALL ${arm("opq", 8, "SELECT id FROM oqadc ORDER BY adc DESC, id LIMIT 50")})
         |ORDER BY tier""".stripMargin
    },
    "tp_temperature_mix" ->
      s"""WITH tmt AS MATERIALIZED (
         |  SELECT lang AS domain,
         |    CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS tokens
         |  FROM documents GROUP BY 1),
         |tms AS (
         |  SELECT domain, tokens,
         |    CAST(round(sqrt(CAST(tokens AS DOUBLE)) * 1e6, 0) AS BIGINT) AS s_micro
         |  FROM tmt WHERE tokens > 0),
         |tmtot AS (
         |  SELECT CAST(sum(tokens) AS BIGINT) AS total,
         |    CAST(sum(s_micro) AS BIGINT) AS s_sum FROM tms)
         |SELECT domain, tokens,
         |  round(CAST(tokens AS DOUBLE) / total, 6) AS natural_share,
         |  round(CAST(s_micro AS DOUBLE) / s_sum, 6) AS sampled_share,
         |  round(CAST(s_micro AS DOUBLE) * total / (CAST(s_sum AS DOUBLE) * tokens), 6) AS boost
         |FROM tms, tmtot ORDER BY domain""".stripMargin,
    // identical SQL to gr_components: the stars rewriting must produce the
    // exact same (id, component, csize) labeling as the min-label loop
    "gr_components_stars" -> Queries.grComponentsSql,
    "st_click_attribution" ->
      s"""SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id,
         |  CAST(epoch_us(c.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
         |FROM events c JOIN events v ON c.user_id = v.user_id
         |  AND c.event_type = 'click' AND v.event_type = 'view'
         |  AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 6 HOUR
         |ORDER BY click_id, view_id""".stripMargin,
    "tc_lang_share" ->
      s"""WITH lsd AS MATERIALIZED (
         |  SELECT doc_id AS id, lang,
         |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tok
         |  FROM documents),
         |lst AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS lt FROM lsd GROUP BY 1)
         |SELECT d.id, d.lang, d.n_tok,
         |  round(CAST(d.n_tok AS DOUBLE) / t.lt, 6) AS lang_share
         |FROM lsd d JOIN lst t USING (lang) ORDER BY d.id""".stripMargin,
    "tp_fim_transform" -> {
      val t = OracleText.toks("text")
      s"""WITH ffa AS MATERIALIZED (
         |  SELECT doc_id AS id, $t AS t FROM documents),
         |ffb AS (
         |  SELECT id, t, CAST(len(t) AS BIGINT) AS n,
         |    1 + (((id % 2147483648) * 1103515245 + 12345) % 2147483648) % (CAST(len(t) AS BIGINT) - 2) AS a
         |  FROM ffa WHERE len(t) >= 3),
         |ffc AS (
         |  SELECT id, t, n, a,
         |    a + 1 + (((id % 2147483648) * 69069 + 1) % 2147483648) % (n - a - 1) AS b
         |  FROM ffb),
         |ffd AS (
         |  SELECT id, n,
         |    array_to_string(list_slice(t, 1, a), ' ') AS prefix,
         |    array_to_string(list_slice(t, a + 1, b), ' ') AS middle,
         |    array_to_string(list_slice(t, b + 1, n), ' ') AS suffix
         |  FROM ffc)
         |SELECT id, n AS n_tok, prefix, middle, suffix,
         |  '<fim_prefix>' || prefix || '<fim_suffix>' || suffix ||
         |    '<fim_middle>' || middle AS fim
         |FROM ffd ORDER BY id""".stripMargin
    },
    "tp_chunk_windows" -> {
      val t = OracleText.toks("text")
      s"""WITH cwa AS MATERIALIZED (
         |  SELECT doc_id AS id, $t AS t FROM documents),
         |cwb AS (
         |  SELECT id, t, CAST(len(t) AS BIGINT) AS n,
         |    CASE WHEN len(t) <= 64 THEN 1
         |         ELSE 1 + (CAST(len(t) AS BIGINT) - 64 + 47) // 48 END AS nw
         |  FROM cwa WHERE len(t) > 0)
         |SELECT id, CAST(u.k AS INTEGER) AS chunk_id,
         |  CAST(len(list_slice(t, u.k * 48 + 1, u.k * 48 + 64)) AS BIGINT) AS n_tok_chunk,
         |  array_to_string(list_slice(t, u.k * 48 + 1, u.k * 48 + 64), ' ') AS chunk_text
         |FROM cwb, unnest(range(0, nw)) AS u(k)
         |ORDER BY id, chunk_id""".stripMargin
    },
    "tc_ppl_buckets" ->
      s"""WITH $pplCtes
         |SELECT id, n_tok, nll,
         |  CASE WHEN bin <= t1 THEN 'head'
         |       WHEN bin <= t2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM ubin, ut ORDER BY id""".stripMargin,
    "gr_communities" ->
      s"""WITH $lpaHead
         |SELECT v AS id, lab AS community FROM lp$LpaRounds ORDER BY id""".stripMargin,
    "ann_ivf_batch" -> {
      def qv(v: Int) =
        s"(SELECT embedding AS qv FROM embeddings WHERE vec_id = $v)"
      def probe(v: Int) =
        s"""abp$v AS (
           |  SELECT label FROM (
           |    SELECT c.label, row_number() OVER (ORDER BY
           |      list_sum(list_transform(range(1, 65), i -> c.centroid[i] * CAST(q.qv[i] AS DOUBLE))) DESC,
           |      c.label) AS rn
           |    FROM cent c, ${qv(v)} q)
           |  WHERE rn <= 2)""".stripMargin
      def arm(v: Int) =
        s"""(SELECT CAST($v AS BIGINT) AS qid, CAST(rn AS INTEGER) AS rank, id, ivf_cell, sim
           |  FROM (
           |    SELECT m.id, a.ivf_cell,
           |      round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) AS sim,
           |      row_number() OVER (ORDER BY
           |        round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) DESC, m.id) AS rn
           |    FROM memories m JOIN asg a ON m.id = a.id
           |    JOIN abp$v p ON a.ivf_cell = p.label CROSS JOIN ${qv(v)} q)
           |  WHERE rn <= 10)""".stripMargin
      s"""WITH ${OracleCtes.memories},
         |${Queries.ivfCtes},
         |${probe(0)}, ${probe(1)}, ${probe(2)}
         |SELECT * FROM (${arm(0)} UNION ALL ${arm(1)} UNION ALL ${arm(2)})
         |ORDER BY qid, rank""".stripMargin
    },
    "ann_ivfbq_topk" ->
      s"""WITH ${OracleCtes.memories},
         |${Queries.ivfCtes},
         |bqpool AS MATERIALIZED (
         |  SELECT m.id, a.ivf_cell, m.embedding
         |  FROM memories m JOIN asg a ON m.id = a.id
         |  JOIN probe p ON a.ivf_cell = p.label),
         |bqph AS MATERIALIZED (
         |  SELECT o.id, CAST(len(list_filter(range(1, 65), i ->
         |    (CAST(o.embedding[i] AS DOUBLE) > 0) <> (CAST(q.qv[i] AS DOUBLE) > 0))) AS INTEGER) AS hamming
         |  FROM bqpool o CROSS JOIN $bqQ q),
         |bqpc AS (SELECT id, hamming FROM bqph ORDER BY hamming, id LIMIT 50)
         |SELECT o.id, o.ivf_cell, c.hamming,
         |  round(${OracleCtes.dot64("o.embedding", "q.qv")}, 6) AS sim
         |FROM bqpool o JOIN bqpc c USING (id) CROSS JOIN $bqQ q
         |ORDER BY sim DESC, o.id LIMIT 10""".stripMargin,
    "tp_pack_efficiency" -> {
      def arm(l: Int) =
        s"""(SELECT CAST($l AS INTEGER) AS seq_len,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n) AS BIGINT) AS total_tokens,
           |  CAST((sum(n) + ${l - 1}) // $l AS BIGINT) AS packed_seqs,
           |  CAST(sum((n + ${l - 1}) // $l) AS BIGINT) AS padded_seqs,
           |  round(CAST(sum(n) AS DOUBLE) / (((sum(n) + ${l - 1}) // $l) * $l), 6) AS packed_fill,
           |  round(CAST(sum(n) AS DOUBLE) / (sum((n + ${l - 1}) // $l) * $l), 6) AS padded_fill
           |  FROM pet)""".stripMargin
      s"""WITH pet AS MATERIALIZED (
         |  SELECT CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n
         |  FROM documents
         |  WHERE len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) > 0)
         |SELECT * FROM (${arm(128)} UNION ALL ${arm(512)} UNION ALL ${arm(2048)})
         |ORDER BY seq_len""".stripMargin
    },
    "s10_snapshot_diff" ->
      s"""WITH ${OracleCtes.memories},
         |sbef AS MATERIALIZED (SELECT id, text, source, archived FROM memories),
         |saft AS MATERIALIZED (
         |  SELECT id,
         |    CASE WHEN id % 7 = 0 THEN text || ' [rev2]' ELSE text END AS text,
         |    source, archived
         |  FROM sbef WHERE id % 13 <> 5
         |  UNION ALL
         |  SELECT id + 1000000, text, source, archived
         |  FROM sbef WHERE id % 31 = 0)
         |SELECT * FROM (
         |  SELECT coalesce(b.id, a.id) AS id,
         |    CASE WHEN b.id IS NULL THEN 'added'
         |         WHEN a.id IS NULL THEN 'removed'
         |         WHEN b.text <> a.text OR b.source <> a.source
         |           OR b.archived <> a.archived THEN 'changed' END AS change
         |  FROM sbef b FULL OUTER JOIN saft a ON b.id = a.id)
         |WHERE change IS NOT NULL ORDER BY id""".stripMargin,
    "r16_mmr_rerank" -> {
      // fixed unrolling of the 5-step greedy chain; penalty = correlated
      // max over the already-selected prefix, scores 6dp-rounded BEFORE
      // the (mmr desc, id) argmax exactly like the driver-side greedy
      def step(k: Int) =
        s"""ms$k AS (
           |  SELECT c.id, c.rel, round(0.7 * c.rel - 0.3 *
           |      (SELECT max(p.s) FROM mps p JOIN mp${k - 1} w ON p.ib = w.id
           |       WHERE p.ia = c.id), 6) AS mmr
           |  FROM mcand c WHERE c.id NOT IN (SELECT id FROM mp${k - 1})
           |  ORDER BY mmr DESC, c.id LIMIT 1),
           |mp$k AS (SELECT id FROM mp${k - 1} UNION ALL SELECT id FROM ms$k)""".stripMargin
      s"""WITH ${OracleCtes.memories},
         |mq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |mcand AS MATERIALIZED (
         |  SELECT m.id, round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) AS rel
         |  FROM memories m CROSS JOIN mq q WHERE NOT m.archived
         |  ORDER BY rel DESC, id LIMIT 20),
         |mce AS MATERIALIZED (
         |  SELECT c.id, m.embedding FROM mcand c JOIN memories m USING (id)),
         |mps AS MATERIALIZED (
         |  SELECT a.id AS ia, b.id AS ib,
         |    round(${OracleCtes.dot64("a.embedding", "b.embedding")}, 6) AS s
         |  FROM mce a JOIN mce b ON a.id <> b.id),
         |ms1 AS (SELECT id, rel, round(0.7 * rel, 6) AS mmr
         |  FROM mcand ORDER BY rel DESC, id LIMIT 1),
         |mp1 AS (SELECT id FROM ms1),
         |${step(2)},
         |${step(3)},
         |${step(4)},
         |${step(5)}
         |SELECT * FROM (
         |  SELECT CAST(1 AS INTEGER) AS rank, id, rel, mmr FROM ms1
         |  UNION ALL SELECT 2, id, rel, mmr FROM ms2
         |  UNION ALL SELECT 3, id, rel, mmr FROM ms3
         |  UNION ALL SELECT 4, id, rel, mmr FROM ms4
         |  UNION ALL SELECT 5, id, rel, mmr FROM ms5)
         |ORDER BY rank""".stripMargin
    },
    "gr_local_clustering" ->
      s"""WITH ${OracleCtes.memories},
         |${OracleText.dupPairsCte(0.35)},
         |lcu AS MATERIALIZED (
         |  SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
         |  FROM pr WHERE id_a <> id_b),
         |lcd AS MATERIALIZED (
         |  SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS v FROM lcu UNION ALL SELECT b FROM lcu) GROUP BY 1),
         |lco AS MATERIALIZED (
         |  SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS lo,
         |         CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS hi
         |  FROM (SELECT e.a, e.b, dj.deg AS da, dk.deg AS db
         |        FROM lcu e JOIN lcd dj ON dj.v = e.a JOIN lcd dk ON dk.v = e.b)),
         |lct AS MATERIALIZED (
         |  SELECT w1.lo, w1.hi AS h1, w2.hi AS h2
         |  FROM lco w1 JOIN lco w2 ON w1.lo = w2.lo AND w1.hi < w2.hi
         |  JOIN lcu e ON w1.hi = e.a AND w2.hi = e.b),
         |lcn AS (
         |  SELECT v, CAST(count(*) AS BIGINT) AS n_tri FROM (
         |    SELECT lo AS v FROM lct UNION ALL SELECT h1 FROM lct
         |    UNION ALL SELECT h2 FROM lct) GROUP BY 1)
         |SELECT d.v AS id, d.deg, CAST(coalesce(n.n_tri, 0) AS BIGINT) AS n_tri,
         |  CASE WHEN d.deg >= 2
         |       THEN round(2.0 * coalesce(n.n_tri, 0) / (d.deg * (d.deg - 1)), 6)
         |       ELSE 0.0 END AS lcc
         |FROM lcd d LEFT JOIN lcn n ON n.v = d.v ORDER BY id""".stripMargin,
    "gr_modularity" ->
      s"""WITH $lpaHead,
         |lmd AS (
         |  SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS v FROM lpe UNION ALL SELECT b FROM lpe) GROUP BY 1),
         |ldc AS (
         |  SELECT l.lab, CAST(sum(d.deg) AS BIGINT) AS d_c
         |  FROM lmd d JOIN lp$LpaRounds l ON l.v = d.v GROUP BY 1),
         |lec AS (
         |  SELECT la.lab, CAST(count(*) AS BIGINT) AS e_c
         |  FROM lpe e JOIN lp$LpaRounds la ON la.v = e.a
         |  JOIN lp$LpaRounds lb ON lb.v = e.b
         |  WHERE la.lab = lb.lab GROUP BY 1),
         |lm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM lpe)
         |SELECT CAST(count(*) AS BIGINT) AS n_communities, m AS n_edges,
         |  CASE WHEN m > 0
         |       THEN round((4.0 * m * sum(coalesce(e_c, 0)) - sum(d_c * d_c))
         |         / (4.0 * m * m), 6)
         |       ELSE 0.0 END AS modularity
         |FROM ldc LEFT JOIN lec USING (lab) CROSS JOIN lm GROUP BY m""".stripMargin,
    // late-interaction MaxSim: query doc-vector → top-20 pool → per
    // (doc token, query token) subword-embedding dots in integer
    // micro-units → max per query token, summed per doc
    "r18_maxsim_rerank" ->
      s"""WITH ${OracleCtes.memories},
         |${OracleText.embedCtesOver(s"(SELECT 0 AS id, '$liQText' AS text) lqsrc", 64, "lq")},
         |lpool AS MATERIALIZED (
         |  SELECT m.id, round(${OracleCtes.dot64("m.embedding", "q.e")}, 6) AS rel, m.text
         |  FROM memories m CROSS JOIN lqf q WHERE NOT m.archived
         |  ORDER BY rel DESC, m.id LIMIT 20),
         |$maxSimTailSql""".stripMargin,
    // the same MaxSim stage over the IVF-probed pool: the oracle's pool is
    // r18's SQL restricted to the probed cells (asg/probe replayed from
    // first principles, probe ranked against the hash-embedded query) —
    // exactly the recall trade the indexed leg makes
    "r18_maxsim_indexed" ->
      s"""WITH ${OracleCtes.memories},
         |${OracleText.embedCtesOver(s"(SELECT 0 AS id, '$liQText' AS text) lqsrc", 64, "lq")},
         |${Queries.ivfCtesOverQ("memories", "(SELECT e AS qv FROM lqf)")},
         |lpool AS MATERIALIZED (
         |  SELECT m.id, round(${OracleCtes.dot64("m.embedding", "q.e")}, 6) AS rel, m.text
         |  FROM memories m
         |  JOIN asg a ON m.id = a.id
         |  JOIN probe p ON a.ivf_cell = p.label
         |  CROSS JOIN lqf q WHERE NOT m.archived
         |  ORDER BY rel DESC, m.id LIMIT 20),
         |$maxSimTailSql""".stripMargin,
    // passage MaxP: the c4split line decomposition posexploded, each
    // passage hash-embedded and dot-scored in micro-units, per-doc argmax
    // by (score desc, pos asc), docs ranked by best passage
    "r19_passage_maxp" ->
      s"""WITH ${OracleText.c4Ctes()},
         |ppas0 AS (
         |  SELECT id, unnest(range(0, len(lines))) AS pos0, unnest(lines) AS para
         |  FROM c4split),
         |ppas AS MATERIALIZED (
         |  SELECT id, CAST(pos0 AS INT) AS pos, para FROM ppas0),
         |${OracleText.embedCtesOver("(SELECT CAST(id AS VARCHAR) || '#' || CAST(pos AS VARCHAR) AS id, para AS text FROM ppas) ppsrc", 64, "pp")},
         |pq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |psc AS MATERIALIZED (
         |  SELECT p.id, p.pos,
         |    CAST(round(${OracleCtes.dot64("f.e", "q.qv")} * 1e6, 0) AS BIGINT) AS sm
         |  FROM ppas p JOIN ppf f
         |    ON f.id = CAST(p.id AS VARCHAR) || '#' || CAST(p.pos AS VARCHAR)
         |  CROSS JOIN pq q)
         |SELECT id, n_passages, best_pos, round(sm / 1e6, 6) AS score FROM (
         |  SELECT id, pos AS best_pos, sm,
         |    CAST(count(*) OVER (PARTITION BY id) AS BIGINT) AS n_passages,
         |    row_number() OVER (PARTITION BY id ORDER BY sm DESC, pos) AS rn
         |  FROM psc) WHERE rn = 1
         |ORDER BY sm DESC, id LIMIT 10""".stripMargin,
    // the indexed passage leg: the SAME passage/embed replay as
    // r19_passage_maxp, then the passage-index construction from first
    // principles — pid-mod-8 label seeding, per-label normalized-mean
    // centroids, nearest-centroid assignment, top-2 probe against the
    // query — and the MaxP fold restricted to the probed cells (the
    // established probed-cell-restriction oracle pattern)
    "r19_passage_indexed" ->
      s"""WITH $passageIndexCtes,
         |pq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |pprobe AS (
         |  SELECT label FROM (
         |    SELECT c.label, row_number() OVER (ORDER BY
         |      ${pdot("c.centroid", "q.qv")} DESC, c.label) AS rn
         |    FROM pcent c, pq q) WHERE rn <= 2),
         |pisc AS MATERIALIZED (
         |  SELECT CAST(e.pid // ${graft.search.Passage.PosStride} AS BIGINT) AS id,
         |    CAST(e.pid % ${graft.search.Passage.PosStride} AS INT) AS pos,
         |    CAST(round(round(${pdot("e.emb", "q.qv")}, 6) * 1e6, 0) AS BIGINT) AS sm
         |  FROM pemb e JOIN pasg a USING (pid)
         |  JOIN pprobe p ON a.cell = p.label CROSS JOIN pq q)
         |SELECT id, n_passages, best_pos, round(sm / 1e6, 6) AS score FROM (
         |  SELECT id, pos AS best_pos, sm,
         |    CAST(count(*) OVER (PARTITION BY id) AS BIGINT) AS n_passages,
         |    row_number() OVER (PARTITION BY id ORDER BY sm DESC, pos) AS rn
         |  FROM pisc) WHERE rn = 1
         |ORDER BY sm DESC, id LIMIT 10""".stripMargin,
    // the passage index on the measured-recall ladder: probed-vs-exact
    // top-10 overlap per nprobe rung, the same sweep semantics (and the
    // same query/corpus bounds) as ev_ivf_recall_sweep, replayed over the
    // passage chain — the number an operator sizes the passage nprobe from
    "ev_passage_recall" -> passageRecallSweepSql(Seq(1, 2, 4)),
    // the MaxSim instrument: self-retrieval queries, per-qid top-20 vector
    // pool, ONE term-embed chain over the union of doc+query terms, the
    // micro-unit MaxSim fold per (qid, id), gold ranks counted within the
    // pool under both orderings, the standard metrics row per mode
    "ev_maxsim_rerank" ->
      s"""WITH $maxSimEvalHeadSql,
         |$maxSimVectorPoolCtes,
         |${maxSimEvalTailSql("pool", "maxsim")}""".stripMargin,
    // the blend instrument: the SAME vector pool + MaxSim fold, the gold
    // ranked under all five final orderings by per-qid windows
    "ev_maxsim_blend" ->
      s"""WITH $maxSimEvalHeadSql,
         |$maxSimVectorPoolCtes,
         |${maxSimBlendEvalTailSql()}""".stripMargin,
    // the cascade-side blend instrument: the fused-hybrid pool (the
    // ev_maxsim_cascade CTEs verbatim) under the same five orderings —
    // validates the production r18_maxsim_blend mode on its own pool
    "ev_maxsim_cascade_blend" ->
      s"""WITH $maxSimEvalHeadSql,
         |$maxSimHybridPoolCtes,
         |${maxSimBlendEvalTailSql("hybrid_")}""".stripMargin,
    // the w-ladder: shared pr/mr ranks, one blend window + gold read per
    // rung, metric rows unioned in ladder order
    "ev_maxsim_blend_sweep" ->
      s"""WITH $maxSimEvalHeadSql,
         |$maxSimVectorPoolCtes,
         |${maxSimBlendWeightSweepTailSql(Seq(0.5, 0.6, 0.7, 0.8, 0.9))}""".stripMargin,
    // the cascade in blend mode: the fused-hybrid pool SQL verbatim, the
    // RRF-of-ranks blend tail instead of the pure-MaxSim ordering (the
    // shared replay text the batch oracle unions two instances of)
    "r18_maxsim_blend" -> maxSimBlendSqlFor(0, Queries.QueryTokens),
    // the batch cascade: the per-qid union of two INDEPENDENT single-query
    // blend-cascade replays (vec_id 0 with QueryTokens, vec_id 1 with the
    // disjoint QueryTokens2) — the hash-match proves the one-pass batch
    // tail ≡ N single-query runs, including that no qid's query tokens
    // leak into the other's fold (the r15_batch_* union precedent)
    "r18_maxsim_batch" ->
      s"""SELECT q0.*, 0 AS query_idx FROM (
         |${maxSimBlendSqlFor(0, Queries.QueryTokens)}
         |) q0
         |UNION ALL
         |SELECT q1.*, 1 AS query_idx FROM (
         |${maxSimBlendSqlFor(1, Queries.QueryTokens2)}
         |) q1""".stripMargin,
    // the indexed batch cascade: the same union shape with each leg's
    // vector CTE probed-cell-restricted against ITS query's vector — the
    // shared-plan batch + one-pass rerank must hash-match two fully
    // independent indexed cascades
    "r18_maxsim_batch_indexed" ->
      s"""SELECT q0.*, 0 AS query_idx FROM (
         |${maxSimBlendIndexedSqlFor(0, Queries.QueryTokens)}
         |) q0
         |UNION ALL
         |SELECT q1.*, 1 AS query_idx FROM (
         |${maxSimBlendIndexedSqlFor(1, Queries.QueryTokens2)}
         |) q1""".stripMargin,
    // the prebuilt pair is the SAME full-corpus build memoized, so the
    // warm batch cascade shares the indexed batch's oracle verbatim — the
    // hash-match is exactly the proof that warm reads equal a fresh build
    // (the r4_hybrid_prebuilt ≡ r4_hybrid_indexed precedent)
    "r18_batch_prebuilt" ->
      s"""SELECT q0.*, 0 AS query_idx FROM (
         |${maxSimBlendIndexedSqlFor(0, Queries.QueryTokens)}
         |) q0
         |UNION ALL
         |SELECT q1.*, 1 AS query_idx FROM (
         |${maxSimBlendIndexedSqlFor(1, Queries.QueryTokens2)}
         |) q1""".stripMargin,
    // the cascade's own instrument: the fused-hybrid pool (vector + BM25
    // legs oversampled 30, RRF 0.7 / 1−0.7, cut at 20 by unrounded f,
    // ranked by round(f, 6) — the indexed-eval conventions) re-ranked by
    // MaxSim, gold ranks under both orderings
    "ev_maxsim_cascade" ->
      s"""WITH $maxSimEvalHeadSql,
         |$maxSimHybridPoolCtes,
         |${maxSimEvalTailSql("hybrid_pool", "hybrid_maxsim")}""".stripMargin,
    // the cascade's pool is the fused-hybrid SQL verbatim (vector + BM25
    // oversampled legs, RRF, recency/feedback/confidence signals) cut at
    // 20, feeding the shared MaxSim tail
    "r18_maxsim_hybrid" ->
      s"""WITH ${OracleCtes.memories},
         |${OracleCtes.searchFeedback},
         |${OracleHybrid.fusedCtes(Queries.oracleHybridParams.copy(k = 20), n = 1000000, vecId = 0)},
         |lpool AS MATERIALIZED (
         |  SELECT f.id, round(f.rrf, 6) AS rel, m.text
         |  FROM fused f JOIN memories m USING (id)
         |  ORDER BY f.rrf DESC, f.id LIMIT 20),
         |$maxSimTailSql""".stripMargin)
}
