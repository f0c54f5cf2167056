package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ann.{Ann, Quantize}
import graft.core.{Corpus, OracleCtes, OracleHybrid, OracleText, Tables}
import graft.dedup.{Clusters, Dedup, MinHashLsh, SimHash}
import graft.embed.HashingEmbedder
import graft.functions.TextFunctions
import graft.search.{BM25, BM25Index, Filters, GraphSearch, HybridSearch, VectorSearch}
import graft.text.TextAnalysis

/** Central registry: every implemented operator from SURVEY.md §2 exposed as
  * a named query (driver contract), with a DuckDB oracle where the semantics
  * are SQL-expressible.
  *
  * Conventions that keep the DuckDB hash-compare green (SURVEY.md §7.4):
  *  - output columns are ids/strings/longs/rounded doubles — no timestamps,
  *    arrays, or structs in result schemas;
  *  - every score is rounded (6 digits) BEFORE ranking; ties broken by id;
  *  - aliases match between the Spark plan and the oracle SQL exactly.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  /** Query vector fixture: the embedding of vec_id = 0. */
  def queryVec(spark: SparkSession, sfDir: String, vecId: Long = 0L): Seq[Float] =
    Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") === vecId)
      .select("embedding")
      .head().getSeq[Float](0)

  // ---------------------------------------------------------------- retrieval

  /** Fixed query-token fixture for the BM25/hybrid queries. "dup" is the
    * one rare term in the synthetic vocabulary (df≈25/500) — the only one
    * with a positive BM25 idf — so including it keeps the BM25 branch
    * non-degenerate (rank_bm25 drops docs whose score sums ≤ 0). */
  val QueryTokens: Seq[String] = Seq("dup", "merge", "window", "spark")

  /** Second fixed query text for the BATCH queries' qid 1 — in-vocabulary
    * (df ≈ 900/1000 each at sf0.001) and disjoint from [[QueryTokens]], so
    * a batch implementation that leaked one qid's query tokens into the
    * other's MaxSim fold cannot hash-match the per-query-union oracle. */
  val QueryTokens2: Seq[String] = Seq("join", "filter", "stream", "batch")

  /** R7 per-prefix confidence half-life fixture: "src1" (also the longest
    * match for src10..src19) decays at 30d, every other source at 150d;
    * the 90d default is the fallback for unmatched prefixes. */
  val ConfidenceProfiles: Seq[(String, Double)] = Seq(("src1", 30.0), ("src", 150.0))

  /** Hybrid params used by the registered flagship queries: all 5 signals on.
    * Weight algebra: aux=0.2 → core=0.8; vec=0.448, bm25=0.192, recency=0.16,
    * feedback=0.1, confidence=0.1. */
  def hybridParams(s: SparkSession, dir: String, graphWeight: Double = 0.0): HybridSearch.Params =
    HybridSearch.Params(
      queryTokens = QueryTokens,
      queryVec = queryVec(s, dir),
      k = 10,
      vectorWeight = 0.7,
      recencyWeight = 0.2,
      feedbackWeight = 0.1,
      confidenceWeight = 0.1,
      confidenceProfiles = ConfidenceProfiles,
      graphWeight = graphWeight)

  /** Static copy of the params for oracle generation (queryVec not needed). */
  private[graft] val oracleHybridParams: HybridSearch.Params =
    HybridSearch.Params(
      queryTokens = QueryTokens, queryVec = Nil, k = 10,
      vectorWeight = 0.7, recencyWeight = 0.2,
      feedbackWeight = 0.1, confidenceWeight = 0.1,
      confidenceProfiles = ConfidenceProfiles)

  private val retrievalQueries: Map[String, Q] = Map(
    "r1_vector_topk" -> ((s, dir) => {
      VectorSearch.topK(Corpus.memories(s, dir), queryVec(s, dir), k = 10)
        .select("id", "source", "sim")
    }),
    "f_filters_visible" -> ((s, dir) => {
      Corpus.memories(s, dir)
        .filter(Filters.visible(
          prefix = Some("src1"),
          since = Some("2024-02-01 00:00:00"),
          until = Some("2025-12-31 00:00:00")))
        .select("id", "source", "category")
    }),
    "r2_bm25" -> ((s, dir) => {
      BM25.ranked(Corpus.memories(s, dir), QueryTokens, oversample = 10)
        .select("id", "bm25")
    }),
    // R2 over the PERSISTED index (build -> swap -> prune-to-query-terms
    // scan): same Okapi scores as r2_bm25, so it shares the oracle — the
    // registered proof that the precomputed term-stats table the 100 TB
    // deployment queries is interchangeable with the in-session scorer
    "r2_bm25_indexed" -> ((s, dir) => {
      val path = "/root/repo/target/tmp/bm25_index"
      val mem = Corpus.memories(s, dir)
      BM25Index.build(mem, path)
      BM25Index.scores(s, path, QueryTokens)
        .join(mem.filter(!col("archived")).select("id"), "id")
        .filter(col("bm25") > 0)
        .orderBy(desc("bm25"), asc("id"))
        .limit(10)
        .select("id", "bm25")
    }),
    // BM25 delete maintenance (r9 verdict #1, lexical side): build the
    // persisted index on the full corpus, tombstone a third of the docs
    // (O(batch) — postings dirs untouched, vocabulary tables recomputed
    // at the reduced N), then score. The oracle recomputes BM25 from
    // scratch over the SURVIVING corpus — n, avgdl and every idf shift,
    // so a stale scalar or a leaked posting row cannot hash-match
    "r2_bm25_delete_refresh" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_bm25_del_${ProcessHandle.current().pid()}"
      reapAtExit(path)
      val mem = Corpus.memories(s, dir)
      BM25Index.build(mem, path)
      BM25Index.deleteRefresh(s, path, mem.filter(col("id") % 3 === 1).select("id"))
      BM25Index.scores(s, path, QueryTokens)
        .join(mem.filter(!col("archived") && col("id") % 3 =!= 1).select("id"), "id")
        .filter(col("bm25") > 0)
        .orderBy(desc("bm25"), asc("id"))
        .limit(10)
        .select("id", "bm25")
    }),
    // O8: query-focused snippets over the BM25 top-10 — the best 8-token
    // window by query-term density per hit (most hits, earliest start),
    // map-only over the bounded hit set
    "o8_snippets" -> ((s, dir) => {
      val mem = Corpus.memories(s, dir)
      val hits = BM25.ranked(mem, QueryTokens, oversample = 10)
        .join(mem.select("id", "text"), "id")
      graft.ops.Presentation.snippets(hits, QueryTokens).orderBy("id")
    }),
    // RM3-lite pseudo-relevance feedback: top-10 feedback docs mine up to
    // 5 POSITIVE-weight expansion terms (tf-idf relevance-model weights),
    // final score = bm25(original) + 0.4*bm25(expansion). The fixture's
    // synthetic vocabulary is saturated (1 positive-idf term corpus-wide),
    // so this pins the do-no-harm degenerate path — empty expansion ≡
    // base ranking; real vocabulary-mismatch recovery is pinned by the
    // hand-built corpus in BM25IndexSpec
    "r17_prf_expansion" -> ((s, dir) =>
      BM25.prfExpanded(Corpus.memories(s, dir), QueryTokens)),
    // RM3 from the persisted index (the tvecs term-vector sidecar makes
    // the feedback-doc read a pruned scan): same oracle SQL as the
    // in-session r17 — the index is full-corpus, so the paths must match
    "r17_prf_indexed" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_prf_bm25_${ProcessHandle.current().pid()}"
      reapAtExit(path)
      graft.search.BM25Index.build(Corpus.memories(s, dir), path)
      graft.search.BM25Index.prfExpanded(s, path, QueryTokens)
    }),
    "r4_hybrid_rrf" -> ((s, dir) => {
      HybridSearch.search(
        Corpus.memories(s, dir), Some(Corpus.searchFeedback(s, dir)),
        hybridParams(s, dir))
    }),
    // the flagship hybrid answered ENTIRELY from the persisted indexes —
    // the 100 TB query path: the BM25 leg is one pb-pruned postings scan
    // (scores pinned equal to the in-session scorer), the vector leg is
    // the nprobe probed cell dirs instead of a full corpus scan; fusion
    // and all extra rank signals are the SAME code (fuseContribs). The
    // oracle is the hybrid SQL with the vector CTE restricted to the
    // probed cells, so the hash-match adjudicates the whole indexed path
    // end to end — including the one semantic difference, IVF's bounded
    // candidate pool
    "r4_hybrid_indexed" -> ((s, dir) => {
      val bm25Path = s"${sys.props("java.io.tmpdir")}/graft_hyb_bm25_${ProcessHandle.current().pid()}"
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_hyb_ivf_${ProcessHandle.current().pid()}"
      reapAtExit(bm25Path); reapAtExit(ivfPath)
      val mem = Corpus.memories(s, dir)
      graft.search.BM25Index.build(mem, bm25Path)
      graft.ann.IvfIndex.build(mem, Tables.embeddings(s, dir), ivfPath)
      HybridSearch.searchIndexed(s, bm25Path, ivfPath, mem,
        Some(Corpus.searchFeedback(s, dir)), hybridParams(s, dir))
    }),
    // the indexed hybrid against a PREBUILT index pair (r15 verdict #7 —
    // the timed line had no warm indexed READ: every *_indexed entry
    // rebuilds its index in-query, so their timings are build-dominated,
    // the adjudicated ann_ivf_indexed pattern). The per-JVM memo builds
    // once; bench reps 2-3 (and so the median of 3) time the pruned
    // postings scan + probed-cell read — the production steady-state
    // shape at 100 TB, where indexes persist across queries. Same plan,
    // same rows, same oracle SQL as r4_hybrid_indexed (HybridIndexedSpec
    // pins the row-for-row equality). NOT job-count-pinned: the memo
    // makes in-suite counts order-dependent by design.
    "r4_hybrid_prebuilt" -> ((s, dir) => {
      val (bm25Path, ivfPath) = prebuiltHybridIndexes(s, dir)
      HybridSearch.searchIndexed(s, bm25Path, ivfPath, Corpus.memories(s, dir),
        Some(Corpus.searchFeedback(s, dir)), hybridParams(s, dir))
    }),
    // the R6 signal fed by the STREAM-maintained net table instead of the
    // raw log: runningFeedbackNets (mapGroupsWithState — identical code
    // path on a batch frame) feeds HybridSearch.search directly; the
    // oracle is r4's batch-aggregated SQL, so the hash-match proves
    // stream-fed ≡ batch-aggregated, closing the loop the streaming
    // scaladoc promises
    "r6_feedback_stream" -> ((s, dir) => {
      HybridSearch.search(
        Corpus.memories(s, dir),
        Some(graft.streaming.EventStream.runningFeedbackNets(
          Corpus.searchFeedback(s, dir))),
        hybridParams(s, dir))
    }),
    "r10_graph_search" -> ((s, dir) => {
      HybridSearch.search(
        Corpus.memories(s, dir), Some(Corpus.searchFeedback(s, dir)),
        hybridParams(s, dir, graphWeight = 0.1))
    }),
    // the graph-expanded hybrid from the persisted indexes: seeds come
    // from the indexed legs (probed cells + pruned postings), the PPR
    // tail and reserved-slot merge are the same code as r10 — the full
    // retrieval family (search/batch/explain/graph) now runs index-backed
    "r10_graph_indexed" -> ((s, dir) => {
      val bm25Path = s"${sys.props("java.io.tmpdir")}/graft_ghyb_bm25_${ProcessHandle.current().pid()}"
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_ghyb_ivf_${ProcessHandle.current().pid()}"
      reapAtExit(bm25Path); reapAtExit(ivfPath)
      val mem = Corpus.memories(s, dir)
      graft.search.BM25Index.build(mem, bm25Path)
      graft.ann.IvfIndex.build(mem, Tables.embeddings(s, dir), ivfPath)
      HybridSearch.searchIndexed(s, bm25Path, ivfPath, mem,
        Some(Corpus.searchFeedback(s, dir)),
        hybridParams(s, dir, graphWeight = 0.1))
    }),
    // threshold+graph combination: graph-only hits reserve slots but are
    // dropped at emit (similarity unverifiable) ⇒ k-r rows, reference
    // semantics (memory_engine.py:1697-1714)
    "r12_threshold_graph" -> ((s, dir) => {
      HybridSearch.search(
        Corpus.memories(s, dir), Some(Corpus.searchFeedback(s, dir)),
        hybridParams(s, dir, graphWeight = 0.1).copy(threshold = Some(0.2)))
    }),
    // global PageRank over the link graph — the corpus-level authority
    // prior beside the per-query truncated PPR (integer micro-units,
    // bit-exact against the unrolled oracle)
    "gr_pagerank" -> ((s, dir) =>
      GraphSearch.pageRank(Corpus.memories(s, dir)).orderBy("id")),
    // connected components of the link graph (min-member-id labels,
    // singleton components for linkless nodes)
    "gr_components" -> ((s, dir) =>
      GraphSearch.components(Corpus.memories(s, dir)).orderBy("id")),
    // landmark BFS tables: exact hop distances from 3 fixed landmarks out
    // to 4 hops — the d(u,l)+d(l,v) distance-estimation sketch for massive
    // graphs (one BFS table per landmark, no per-query traversal)
    "gr_landmark_bfs" -> ((s, dir) =>
      GraphSearch.landmarkDistances(Corpus.memories(s, dir), Seq(0L, 1L, 2L))
        .orderBy("landmark", "id")),
    // O(batch) CC maintenance: base labels from 90% of the edges, the
    // id_a%10==7 slice folded in as the ingest batch via component-level
    // merges + one broadcast relabel — oracle is the FULL-recompute SQL,
    // so the hash-match proves increment ≡ recompute (the
    // ann_ivf_indexed refresh discipline on the graph tier)
    "gr_components_incremental" -> ((s, dir) =>
      GraphSearch.components(Corpus.memories(s, dir), pairs => {
        val p = pairs.localCheckpoint(true) // split reads it twice
        val labels = graft.dedup.Clusters
          .connectedComponentsAuto(p.filter(col("id_a") % 10 =!= 7))
        graft.dedup.Clusters.connectedComponentsIncremental(
          labels, p.filter(col("id_a") % 10 === 7))
      }).orderBy("id"))
  )

  /** The RM3 replay: base BM25, fbtop mining with the
    * positive-weight discipline, expansion scoring, beta-combine.
    * Shared by r17_prf_expansion (in-session) and r17_prf_indexed
    * (tvecs-sidecar path) -- the index is full-corpus, so one SQL
    * adjudicates both. */
  private val prfExpansionSql: String =
    s"""WITH ${OracleCtes.memories},
       |${OracleHybrid.bm25Ctes(QueryTokens)},
       |fbtop AS (SELECT id FROM bm WHERE bm25 > 0 ORDER BY bm25 DESC, id LIMIT 10),
       |expw AS (
       |  SELECT tf.term, round(sum(tf.tf * idf.idf), 6) AS w
       |  FROM tf JOIN fbtop USING (id) JOIN idf USING (term)
       |  WHERE tf.term NOT IN (SELECT term FROM qt)
       |  GROUP BY 1),
       |expt AS (SELECT term FROM expw WHERE w > 0 ORDER BY w DESC, term LIMIT 5),
       |bmexp AS (
       |  SELECT tf.id,
       |    round(sum(idf.idf * tf.tf * (${graft.search.BM25.K1} + 1.0) /
       |      (tf.tf + ${graft.search.BM25.K1} * (1.0 - ${graft.search.BM25.B} + ${graft.search.BM25.B} * dl.dl / (SELECT avgdl FROM bmstats)))), 6) AS bm25e
       |  FROM tf JOIN expt USING (term) JOIN idf USING (term) JOIN dl USING (id)
       |  GROUP BY 1)
       |SELECT coalesce(b.id, e.id) AS id,
       |  coalesce(b.bm25, 0.0) AS bm25_base, coalesce(e.bm25e, 0.0) AS bm25_exp,
       |  round(coalesce(b.bm25, 0.0) + 0.4 * coalesce(e.bm25e, 0.0), 6) AS score
       |FROM bm b FULL JOIN bmexp e ON b.id = e.id
       |ORDER BY score DESC, id LIMIT 10""".stripMargin

  private val retrievalOracles: Map[String, String] = Map(
    "r1_vector_topk" ->
      s"""WITH ${OracleCtes.memories}
         |SELECT m.id, m.source, round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) AS sim
         |FROM memories m
         |CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |WHERE NOT m.archived
         |ORDER BY sim DESC, m.id
         |LIMIT 10""".stripMargin,
    "f_filters_visible" ->
      s"""WITH ${OracleCtes.memories}
         |SELECT id, source, category FROM memories
         |WHERE source LIKE 'src1%' AND NOT archived
         |  AND (coalesce(document_at, created_at, updated_at) IS NULL OR
         |       coalesce(document_at, created_at, updated_at)
         |         BETWEEN TIMESTAMP '2024-02-01 00:00:00' AND TIMESTAMP '2025-12-31 00:00:00')
         |ORDER BY id""".stripMargin,
    "r2_bm25" ->
      s"""WITH ${OracleCtes.memories},
         |${OracleHybrid.bm25Ctes(QueryTokens)}
         |SELECT b.id, b.bm25 FROM bm b JOIN memories m USING (id)
         |WHERE b.bm25 > 0 AND NOT m.archived
         |ORDER BY b.bm25 DESC, b.id LIMIT 10""".stripMargin,
    "r2_bm25_indexed" ->
      s"""WITH ${OracleCtes.memories},
         |${OracleHybrid.bm25Ctes(QueryTokens)}
         |SELECT b.id, b.bm25 FROM bm b JOIN memories m USING (id)
         |WHERE b.bm25 > 0 AND NOT m.archived
         |ORDER BY b.bm25 DESC, b.id LIMIT 10""".stripMargin,
    // from-scratch BM25 over the SURVIVING corpus: n/avgdl/idf all
    // recompute under the reduced-corpus CTE, exactly what deleteRefresh
    // must reproduce from the tombstoned index
    "r2_bm25_delete_refresh" ->
      s"""WITH ${OracleCtes.memories},
         |livemem AS MATERIALIZED (SELECT * FROM memories WHERE id % 3 <> 1),
         |${OracleHybrid.bm25Ctes(QueryTokens, "livemem")}
         |SELECT b.id, b.bm25 FROM bm b JOIN livemem m USING (id)
         |WHERE b.bm25 > 0 AND NOT m.archived
         |ORDER BY b.bm25 DESC, b.id LIMIT 10""".stripMargin,
    // the delete SQL verbatim: rewriting the touched buckets' files
    // (compactBuckets) must be semantically invisible
    "r2_bm25_compact" ->
      s"""WITH ${OracleCtes.memories},
         |livemem AS MATERIALIZED (SELECT * FROM memories WHERE id % 3 <> 1),
         |${OracleHybrid.bm25Ctes(QueryTokens, "livemem")}
         |SELECT b.id, b.bm25 FROM bm b JOIN livemem m USING (id)
         |WHERE b.bm25 > 0 AND NOT m.archived
         |ORDER BY b.bm25 DESC, b.id LIMIT 10""".stripMargin,
    "o8_snippets" -> {
      val qlist = QueryTokens.distinct.map(t => s"'$t'").mkString("[", ", ", "]")
      s"""WITH ${OracleCtes.memories},
         |${OracleHybrid.bm25Ctes(QueryTokens)},
         |sh AS (
         |  SELECT b.id, b.bm25, ${graft.core.OracleText.toks("m.text")} AS t
         |  FROM bm b JOIN memories m USING (id)
         |  WHERE b.bm25 > 0 AND NOT m.archived
         |  ORDER BY b.bm25 DESC, b.id LIMIT 10),
         |shw AS (
         |  SELECT id, bm25, t, least(len(t), 8) AS w, len(t) AS n
         |  FROM sh WHERE len(t) > 0),
         |swin AS (
         |  SELECT id, bm25, t, w, CAST(s.x AS INT) AS start_pos,
         |    CAST(len(list_filter(list_slice(t, s.x, s.x + w - 1),
         |      x -> list_contains($qlist, x))) AS INT) AS n_hits
         |  FROM shw, unnest(range(1, n - w + 2)) s(x)),
         |sbest AS (
         |  SELECT *, row_number() OVER (PARTITION BY id
         |    ORDER BY n_hits DESC, start_pos) AS rn FROM swin)
         |SELECT id, bm25, start_pos, n_hits,
         |  array_to_string(list_slice(t, start_pos, start_pos + w - 1), ' ') AS snippet
         |FROM sbest WHERE rn = 1 ORDER BY id""".stripMargin
    },
    // shared by the in-session and index-backed RM3 (r17_prf_indexed):
    // the index is full-corpus, so one SQL adjudicates both
    "r17_prf_expansion" -> prfExpansionSql,
    "r17_prf_indexed" -> prfExpansionSql,
    "r4_hybrid_rrf" ->
      OracleHybrid.hybridSql(oracleHybridParams, n = 1000000, withFeedback = true),
    // r4's SQL with the vector CTE restricted to the IVF-probed cells:
    // what the index-backed hybrid must reproduce exactly
    "r4_hybrid_indexed" ->
      OracleHybrid.hybridSql(oracleHybridParams, n = 1000000,
        withFeedback = true, extraCtes = ivfCtes,
        vecJoin = "JOIN asg ia ON m.id = ia.id JOIN probe ip ON ia.ivf_cell = ip.label"),
    // identical SQL to r4_hybrid_indexed: the prebuilt pair is the SAME
    // full-corpus build, only memoized across executions — the hash-match
    // proves warm reads return exactly what a fresh build-and-probe does
    "r4_hybrid_prebuilt" ->
      OracleHybrid.hybridSql(oracleHybridParams, n = 1000000,
        withFeedback = true, extraCtes = ivfCtes,
        vecJoin = "JOIN asg ia ON m.id = ia.id JOIN probe ip ON ia.ivf_cell = ip.label"),
    // identical SQL to r4: the stream-maintained net table must reproduce
    // the batch-aggregated feedback signal exactly
    "r6_feedback_stream" ->
      OracleHybrid.hybridSql(oracleHybridParams, n = 1000000, withFeedback = true),
    "r10_graph_search" ->
      OracleHybrid.graphSql(oracleHybridParams.copy(graphWeight = 0.1),
        n = 1000000, withFeedback = true),
    // r10's SQL with the vector CTE restricted to the IVF-probed cells
    "r10_graph_indexed" ->
      OracleHybrid.graphSql(oracleHybridParams.copy(graphWeight = 0.1),
        n = 1000000, withFeedback = true, extraCtes = ivfCtes,
        vecJoin = "JOIN asg ia ON m.id = ia.id JOIN probe ip ON ia.ivf_cell = ip.label"),
    "r12_threshold_graph" ->
      OracleHybrid.graphSql(oracleHybridParams.copy(graphWeight = 0.1, threshold = Some(0.2)),
        n = 1000000, withFeedback = true),
    "gr_pagerank" -> {
      // K unrolled integer-micro-unit rounds; // is floor division, which
      // equals Spark's `div` truncation on the all-positive operands here
      def prRound(prev: String, curr: String): String =
        s"""$curr AS MATERIALIZED (
           |  SELECT n.id,
           |    CAST(150000 + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS pr
           |  FROM prnodes n LEFT JOIN (
           |    SELECT e.dst, CAST(sum(p.pr // d.deg) AS BIGINT) AS s
           |    FROM edges e JOIN $prev p ON p.id = e.src
           |    JOIN prdeg d ON d.src = e.src
           |    GROUP BY 1) s ON s.dst = n.id)""".stripMargin
      val rounds = (1 to GraphSearch.MaxIters)
        .map(i => prRound(s"pr${i - 1}", s"pr$i")).mkString(",\n")
      s"""WITH ${OracleCtes.edges},
         |prdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
         |prnodes AS (SELECT doc_id AS id FROM documents),
         |pr0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM prnodes),
         |$rounds
         |SELECT id, round(CAST(pr AS DOUBLE) / 1e6, 6) AS pagerank
         |FROM pr${GraphSearch.MaxIters} ORDER BY id""".stripMargin
    },
    "gr_components" -> grComponentsSql,
    // identical SQL: the incremental fold must reproduce the full
    // recompute exactly
    "gr_components_incremental" -> grComponentsSql,
    "gr_landmark_bfs" ->
      s"""WITH RECURSIVE ${OracleCtes.edges},
         |lb AS (
         |  SELECT CAST(l.x AS BIGINT) AS landmark, CAST(l.x AS BIGINT) AS id, 0 AS dist
         |  FROM (VALUES (0), (1), (2)) l(x)
         |  UNION
         |  SELECT b.landmark, e.dst AS id, b.dist + 1
         |  FROM lb b JOIN edges e ON e.src = b.id
         |  WHERE b.dist < 4)
         |SELECT landmark, id, CAST(min(dist) AS INT) AS dist
         |FROM lb GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )

  /** Shared by gr_components and gr_components_stars (QueriesTiers): both
    * CC algorithms must reproduce this exact labeling. A def (not a map
    * lookup) so QueriesTiers' oracle map never references Queries.oracles
    * during initialization (circular-init hazard). */
  private[graft] def grComponentsSql: String =
    s"""WITH RECURSIVE ${OracleCtes.edges},
       |gced AS MATERIALIZED (SELECT DISTINCT src AS s, dst AS t FROM edges),
       |gcreach AS (
       |  SELECT s AS node, s AS r FROM gced
       |  UNION SELECT e.t, gcreach.r FROM gcreach JOIN gced e ON e.s = gcreach.node),
       |gccomp AS MATERIALIZED (
       |  SELECT node AS id, min(r) AS component FROM gcreach GROUP BY 1),
       |gcfull AS MATERIALIZED (
       |  SELECT d.doc_id AS id, COALESCE(c.component, d.doc_id) AS component
       |  FROM documents d LEFT JOIN gccomp c ON c.id = d.doc_id),
       |gcsz AS (
       |  SELECT component, CAST(count(*) AS BIGINT) AS csize
       |  FROM gcfull GROUP BY 1)
       |SELECT f.id, f.component, z.csize
       |FROM gcfull f JOIN gcsz z USING (component)
       |ORDER BY f.id""".stripMargin

  // ---------------------------------------------------------------- analytics smoke

  private val sanityQueries: Map[String, Q] = Map(
    "q1_lineitem_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    // TPC-H Q3 shape (shipping priority): 3-way join + revenue top-10 —
    // the classic multi-join OLAP plan over the warehouse tables; revenue
    // accumulates in exact integer cents (order-free), one closing divide
    "q3_shipping_priority" -> ((s, dir) => {
      val cents = round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100, 0).cast("long")
      Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.load(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(cents).as("_c"))
        .select(col("l_orderkey"),
          round(col("_c").cast("double") / 100, 2).as("revenue"),
          col("o_orderdate"), col("o_orderpriority"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
    }),
    // TPC-H Q5 shape (local supplier volume): 6-way join where customer
    // and supplier must share a nation, revenue rolled up per nation —
    // nation/region broadcast, the fact tables shuffle on their keys
    "q5_local_supplier_volume" -> ((s, dir) => {
      val cents = round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100, 0).cast("long")
      Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.load(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(sum(cents).as("_c"))
        .select(col("n_name"),
          round(col("_c").cast("double") / 100, 2).as("revenue"))
        .orderBy(desc("revenue"), asc("n_name"))
    })
  )

  private val sanityOracles: Map[String, String] = Map(
    "q1_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  round(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100, 0) AS BIGINT)) AS DOUBLE) / 100, 2) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier_volume" ->
      """SELECT n_name,
        |  round(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100, 0) AS BIGINT)) AS DOUBLE) / 100, 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
  )

  // ------------------------------------------------------- dedup / text / ann

  private[graft] def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).withColumnRenamed("doc_id", "id")

  /** Per-JVM memoized BM25+IVF index pair over a fixture dir's memories —
    * the prebuilt-read timing fixture (r15 verdict #7): built ONCE per
    * (process, dir) so repeated executions of `r4_hybrid_prebuilt` time
    * the warm probe path instead of re-paying the build. Same builds as
    * `r4_hybrid_indexed` (full corpus, label-seeded centroids), so the
    * two queries share one oracle. Concurrency (driver ADVICE r16):
    * the memo holds a per-dir future installed under the map's own
    * atomicity, the multi-second builds run OUTSIDE any lock — only
    * same-dir callers wait on a build, and the tmp-path tag is a
    * process-wide counter (collision-safe by construction, unlike the
    * old dir.hashCode tag). A failed build evicts its future so a later
    * caller can retry. Queries still run sequentially in Verify/Bench;
    * this only matters to racing suite code. */
  private val prebuiltMemo = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[(String, String)]]()
  private val prebuiltTag = new java.util.concurrent.atomic.AtomicInteger(0)
  private[graft] def prebuiltHybridIndexes(s: SparkSession,
                                           dir: String): (String, String) = {
    val installed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val fut = prebuiltMemo.computeIfAbsent(dir, _ => {
      installed.set(true)
      new java.util.concurrent.CompletableFuture[(String, String)]()
    })
    if (installed.get())
      try {
        val tag = s"${ProcessHandle.current().pid()}_${prebuiltTag.getAndIncrement()}"
        val bm25Path = s"${sys.props("java.io.tmpdir")}/graft_pre_bm25_$tag"
        val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_pre_ivf_$tag"
        reapAtExit(bm25Path); reapAtExit(ivfPath)
        val mem = Corpus.memories(s, dir)
        graft.search.BM25Index.build(mem, bm25Path)
        graft.ann.IvfIndex.build(mem, Tables.embeddings(s, dir), ivfPath)
        fut.complete((bm25Path, ivfPath))
      } catch {
        case t: Throwable =>
          prebuiltMemo.remove(dir, fut); fut.completeExceptionally(t); throw t
      }
    fut.join()
  }

  /** Register a JVM-exit delete for a per-process tmp tree, once per path. */
  private val reaped = scala.collection.concurrent.TrieMap.empty[String, Boolean]
  private[graft] def reapAtExit(path: String): Unit =
    reaped.getOrElseUpdate(path, {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try graft.sources.Store.deleteRecursive(path)
        catch { case _: Throwable => () }))
      true
    })

  /** Deterministic line-structured corpus for the C4-rule queries: the raw
    * fixture docs carry no line breaks or punctuation, so pages are
    * synthesized from each doc's tokens — 5-token lines where line i of doc
    * id ends in '.' or '?' unless (id+i)%3==0 (no terminal mark), shrinks
    * to 2 words when (id+i)%5==0, and gains a policy phrase when
    * (id+i)%7==0; docs with id%37==0 get a lorem-ipsum line and id%41==0 a
    * brace line (page-level drops). Mirrored verbatim in the oracle SQL
    * ([[OracleText.c4PagesSql]]). */
  private[graft] def c4Pages(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .select(col("id"), TextFunctions.tokens(col("text")).as("_t"))
      .withColumn("_nl", floor(size(col("_t")) / 5).cast("int"))
      .filter(col("_nl") >= 1)
    base
      .withColumn("_lines", transform(sequence(lit(0), col("_nl") - 1), i => {
        val m = col("id") + i
        val len = when(pmod(m, lit(5)) === 0, lit(2)).otherwise(lit(5))
        val words = array_join(slice(col("_t"), i * 5 + 1, len), " ")
        val policy = when(pmod(m, lit(7)) === 0, lit(" privacy policy"))
          .otherwise(lit(""))
        val punct = when(pmod(m, lit(3)) === 0, lit(""))
          .when(pmod(m, lit(3)) === 1, lit(".")).otherwise(lit("?"))
        concat(words, policy, punct)
      }))
      .select(col("id"), concat(
        array_join(col("_lines"), "\n"),
        when(pmod(col("id"), lit(37)) === 0,
          lit("\nlorem ipsum dolor sit amet.")).otherwise(lit("")),
        when(pmod(col("id"), lit(41)) === 0,
          lit("\nvar cfg = { mode: 1 };")).otherwise(lit(""))).as("text"))
  }

  private val dedupQueries: Map[String, Q] = Map(
    "dd_exact_survivors" -> ((s, dir) =>
      Dedup.dedupExact(docs(s, dir)).select("id").orderBy("id")),
    "d2_neardup_cosine" -> ((s, dir) =>
      Dedup.findDuplicates(Corpus.memories(s, dir), threshold = 0.35)),
    "d2_neardup_lsh" -> ((s, dir) => {
      // the 100 TB candidate path: LSH-bucketed candidates + exact verify,
      // same output contract as d2_neardup_cosine (recall limited to pairs
      // sharing a hyperplane-LSH band bucket)
      val mem = Corpus.memories(s, dir)
      Dedup.topNeighborsLsh(mem, mem, searchK = 5)
        .filter(col("sim") >= 0.35)
        .select(
          least(col("ia"), col("ib")).as("id_a"),
          greatest(col("ia"), col("ib")).as("id_b"),
          round(col("sim"), 4).as("similarity"))
        .dropDuplicates("id_a", "id_b")
        .orderBy(desc("similarity"), asc("id_a"), asc("id_b"))
    }),
    "d3_dedup_survivors" -> ((s, dir) =>
      Dedup.deduplicate(Corpus.memories(s, dir), threshold = 0.35)
        .select("id").orderBy("id")),
    "d4_similar_clusters" -> ((s, dir) => {
      val pairs = Dedup.findDuplicates(Corpus.memories(s, dir), threshold = 0.3)
      Clusters.similarClusters(pairs, threshold = 0.3)
    }),
    "lsh_minhash_neardup" -> ((s, dir) =>
      MinHashLsh.nearDuplicates(docs(s, dir), threshold = 0.2)
        .orderBy("id_a", "id_b")),
    "lsh_jaccard_exact" -> ((s, dir) =>
      MinHashLsh.exactJaccardPairs(docs(s, dir), threshold = 0.2)
        .orderBy("id_a", "id_b")),
    // the PERSISTED shingle/band index with its full maintenance
    // lifecycle — the executor for the invalidation plan's `shingle`
    // artifact family: build on the first half, O(batch)-refresh the
    // rest, tombstone a slice, then answer near-dup pairs from the stored
    // tables. Oracle = the whole MinHash pipeline recomputed in SQL over
    // the SURVIVING corpus, so the hash-match proves incremental
    // maintenance of the persisted artifact ≡ full recompute
    "lsh_index_refresh" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_lsh_idx_${ProcessHandle.current().pid()}"
      reapAtExit(path)
      val d = docs(s, dir)
      val half = Corpus.nDocs(s, dir) / 2
      graft.dedup.LshIndex.build(d.filter(col("id") < half), path)
      graft.dedup.LshIndex.refresh(s, path, d.filter(col("id") >= half))
      graft.dedup.LshIndex.deleteRefresh(s, path,
        d.filter(col("id") % 7 === 3).select("id"))
      graft.dedup.LshIndex.nearDuplicates(s, path, threshold = 0.2)
        .orderBy("id_a", "id_b")
    }),
    // the LSH index through one MIXED CDC pass — adds (a held-out slice),
    // updates (re-crawled docs take the next doc's text), deletes — then
    // near-dup pairs answered from the stored tables. Oracle = the full
    // MinHash pipeline recomputed in SQL over the POST-CDC corpus, so the
    // hash-match proves the applyCdc path (incl. update re-banding, which
    // lsh_index_refresh's add/delete form never exercises) lands exactly
    // on rebuild state
    "lsh_index_cdc" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_lsh_cdc_${ProcessHandle.current().pid()}"
      reapAtExit(path)
      val d = docs(s, dir)
      graft.dedup.LshIndex.build(d.filter(col("id") % 50 =!= 10), path)
      val next = d.select((col("id") - 1).as("id"), col("text").as("_t2"))
      val updates = d.select("id").filter(col("id") % 50 === 0)
        .join(next, "id").select(col("id"), col("_t2").as("text"))
      val adds = d.filter(col("id") % 50 === 10).select("id", "text")
      val dels = d.filter(col("id") % 50 === 25).select("id")
      graft.dedup.LshIndex.applyCdc(s, path, adds.unionByName(updates), dels)
      graft.dedup.LshIndex.nearDuplicates(s, path, threshold = 0.2)
        .orderBy("id_a", "id_b")
    }),
    // targeted LSH physical maintenance (the r2_bm25_compact discipline on
    // the shingle side, completing the third family's lifecycle): delete a
    // slice, rewrite ONLY the shingle buckets the deleted ids hash into
    // plus the band partitions (a delete touches all NumBands of them —
    // bounded at 8), then answer near-dups from the compacted tables.
    // Oracle = the delete-survivor SQL verbatim: compaction must be
    // semantically invisible. LshIndexSpec pins the physical side
    // (untouched shingle buckets' files byte-identical)
    "lsh_index_compact" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_lsh_cmp_${ProcessHandle.current().pid()}"
      reapAtExit(path)
      val d = docs(s, dir)
      graft.dedup.LshIndex.build(d, path)
      val deleted = d.filter(col("id") % 7 === 3).select("id")
      graft.dedup.LshIndex.deleteRefresh(s, path, deleted)
      val ids = deleted.as(org.apache.spark.sql.Encoders.scalaLong)
        .collect().toSeq
      graft.dedup.LshIndex.compactBuckets(s, path,
        graft.dedup.LshIndex.bucketsForIds(ids),
        0 until graft.dedup.MinHashLsh.NumBands)
      graft.dedup.LshIndex.nearDuplicates(s, path, threshold = 0.2)
        .orderBy("id_a", "id_b")
    }),
    // incremental candidate generation from the stored index: after the
    // second half lands as a refresh batch, generate ONLY the pairs whose
    // greater side is in the batch (old-old pairs were resolved when the
    // old half landed). Oracle = the full-recompute pair SQL restricted
    // to batch-side greater ids — exact because batch ids are strictly
    // greater than every stored id (the nearDuplicatesIncremental
    // contract)
    "lsh_index_batch_pairs" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_lsh_bp_${ProcessHandle.current().pid()}"
      reapAtExit(path)
      val d = docs(s, dir)
      val half = Corpus.nDocs(s, dir) / 2
      graft.dedup.LshIndex.build(d.filter(col("id") < half), path)
      graft.dedup.LshIndex.refresh(s, path, d.filter(col("id") >= half))
      graft.dedup.LshIndex.nearDuplicatesForBatch(s, path,
        d.filter(col("id") >= half).select("id"), threshold = 0.2)
        .orderBy("id_a", "id_b")
    }),
    "sh_simhash_fp" -> ((s, dir) =>
      SimHash.fingerprints(docs(s, dir)).orderBy("id")),
    "sh_simhash_neardup" -> ((s, dir) =>
      SimHash.nearDuplicates(docs(s, dir), maxHamming = 3)
        .orderBy("id_a", "id_b")),
    "ta_text_profile" -> ((s, dir) => {
      val base = docs(s, dir)
        .filter(size(TextFunctions.tokens(col("text"))) > 0)
      val li = TextAnalysis.langId(col("text"))
      val (ws, bpe) = TextAnalysis.tokenCounts(col("text"))
      base.select(col("id"),
        li.getField("lang").as("lang"),
        li.getField("score").as("lang_score"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        ws.as("n_ws"), bpe.as("n_bpe")).orderBy("id")
    }),
    "fp_winnowing" -> ((s, dir) =>
      docs(s, dir)
        .filter(size(TextFunctions.tokens(col("text"))) >= 6)
        .select(col("id"),
          explode(TextAnalysis.winnowingFingerprint(col("text"))).as("fp"))
        .orderBy("id", "fp")),
    "e1_embed_checksum" -> ((s, dir) =>
      HashingEmbedder(64).embed(docs(s, dir))
        .select(col("id"), posexplode(col("embedding")))
        .groupBy("id")
        .agg(round(sum((col("pos") + 1) * col("col").cast("double")), 6).as("checksum"))
        .orderBy("id")),
    "ann_ivf_topk" -> ((s, dir) => {
      val cent = Ann.centroidsByLabel(Tables.embeddings(s, dir))
      val assigned = Ann.assign(Corpus.memories(s, dir), cent)
      Ann.ivfTopK(assigned, cent, queryVec(s, dir), k = 10, nprobe = 2)
        .select("id", "ivf_cell", "sim")
    }),
    // cell-skew defense: subdivide over-full cells into hash subcells
    // (balanced physical partitions at scale), probe the parent → union
    // of splits. Oracle = the UNSPLIT IVF SQL verbatim: the hash-match
    // proves the split changes layout only, never results
    "ann_ivf_skew_split" -> ((s, dir) => {
      val cent = Ann.centroidsByLabel(Tables.embeddings(s, dir))
      val split = Ann.splitSkewedCells(
        Ann.assign(Corpus.memories(s, dir), cent),
        maxCell = Corpus.nDocs(s, dir) / 16)
      Ann.ivfTopK(split, cent, queryVec(s, dir), k = 10, nprobe = 2)
        .select("id", "ivf_cell", "sim")
    }),
    // two-level coarse quantizer on the LIVE query path (r16 verdict #6
    // upgraded from spec-gated prototype to oracle-gated): level-1 = the
    // flat positional centroids, level-2 = positional sub-centroids
    // (id mod fanout) within each cell, probe prunes BOTH levels — the
    // growth path past MaxNlist with every materialized frame bounded
    // (TwoLevelIvf scaladoc). The oracle replays both quantizer levels
    // from first principles at the same partial probe settings
    "ann_ivf_twolevel" -> ((s, dir) => {
      val cent = Ann.centroidsByLabel(Tables.embeddings(s, dir))
      val assigned = Ann.assign(Corpus.memories(s, dir), cent)
      val sub = graft.ann.TwoLevelIvf.subCentroids(assigned, fanout = 4)
      val assigned2 = graft.ann.TwoLevelIvf.assignSub(assigned, sub)
      graft.ann.TwoLevelIvf.probeTopK(assigned2, cent, sub,
        queryVec(s, dir), k = 10, nprobe1 = 2, nprobe2 = 4)
    }),
    // the PERSISTED two-level index: assignments partitioned by BOTH
    // quantizer keys, probe = planning-time partition prune on the
    // nprobe2 winning (ivf_cell, l2_cell) pairs (PlanAuditSpec pins the
    // PartitionFilters). Oracle = the same two-level replay: stored
    // tables make both levels exact, so the hash-match proves the pruned
    // read ≡ the in-session computation — ann_ivf_indexed's precedent on
    // two keys
    "ann_twolevel_indexed" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_2lvl_${ProcessHandle.current().pid()}"
      reapAtExit(path)
      graft.ann.TwoLevelIvf.buildIndex(
        Corpus.memories(s, dir), Tables.embeddings(s, dir), path, fanout = 4)
      graft.ann.TwoLevelIvf.topKIndexed(s, path, queryVec(s, dir),
        k = 10, nprobe1 = 2, nprobe2 = 4)
    }),
    // O(batch) two-level refresh: build on the first half, refresh with
    // the second. The oracle replays sub-centroid means from the BUILT
    // half (stored quantizers never move on add) and assignment over the
    // full corpus, so the hash-match proves refresh ≡ rebuild against
    // the same stored quantizer levels — the ann_ivf_indexed precedent,
    // both levels
    "ann_twolevel_refresh" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_2lvl_rf_${ProcessHandle.current().pid()}"
      reapAtExit(path)
      val mem = Corpus.memories(s, dir)
      val half = Corpus.nDocs(s, dir) / 2
      graft.ann.TwoLevelIvf.buildIndex(
        mem.filter(col("id") < half), Tables.embeddings(s, dir), path,
        fanout = 4)
      graft.ann.TwoLevelIvf.refresh(s, path, mem.filter(col("id") >= half))
      graft.ann.TwoLevelIvf.topKIndexed(s, path, queryVec(s, dir),
        k = 10, nprobe1 = 2, nprobe2 = 4)
    }),
    // O(batch) two-level delete: build on the full corpus, tombstone a
    // third — the oracle is the full-corpus two-level replay minus the
    // deleted rows (quantizers never move on delete), so the hash-match
    // proves the tombstoned read ≡ a survivor rebuild against the same
    // stored quantizer levels (the flat ann_ivf_delete_refresh pattern)
    "ann_twolevel_delete" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_2lvl_del_${ProcessHandle.current().pid()}"
      reapAtExit(path)
      val mem = Corpus.memories(s, dir)
      graft.ann.TwoLevelIvf.buildIndex(
        mem, Tables.embeddings(s, dir), path, fanout = 4)
      graft.ann.TwoLevelIvf.deleteRefresh(s, path,
        mem.filter(col("id") % 3 === 1).select("id"))
      graft.ann.TwoLevelIvf.topKIndexed(s, path, queryVec(s, dir),
        k = 10, nprobe1 = 2, nprobe2 = 4)
    }),
    // persisted IVF: build on the first half, O(batch) refresh with the
    // second — the oracle is the FULL-CORPUS IVF SQL, so the hash-match
    // proves refresh ≡ rebuild (stored centroids make assignment exact)
    "ann_ivf_indexed" -> ((s, dir) => {
      // tmp-root + per-process suffix: survives any checkout location and
      // two concurrent suites/benches never share a live index directory
      // (build's write-then-swap makes re-runs within one JVM idempotent);
      // a shutdown hook reaps the tree so repeated JVM runs don't litter tmp
      val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_index_${ProcessHandle.current().pid()}"
      reapAtExit(path)
      val mem = Corpus.memories(s, dir)
      val half = Corpus.nDocs(s, dir) / 2
      graft.ann.IvfIndex.build(
        mem.filter(col("id") < half), Tables.embeddings(s, dir), path)
      graft.ann.IvfIndex.refresh(s, path, mem.filter(col("id") >= half))
      graft.ann.IvfIndex.topK(s, path, queryVec(s, dir), k = 10, nprobe = 2)
    }),
    // multi-generation refresh: build on the first quarter, then THREE
    // successive O(batch) refreshes — four pointer swaps, four
    // generations — against the same full-corpus oracle, proving the
    // generation chain accumulates no drift however many refreshes a
    // long-lived index absorbs (the single-refresh case is
    // ann_ivf_indexed; a real ingest pipeline refreshes forever)
    "ann_ivf_multigen" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_mg_${ProcessHandle.current().pid()}"
      reapAtExit(path)
      val mem = Corpus.memories(s, dir)
      val quarter = Corpus.nDocs(s, dir) / 4
      graft.ann.IvfIndex.build(
        mem.filter(col("id") < quarter), Tables.embeddings(s, dir), path)
      for (i <- 1 to 3) {
        val lo = quarter * i
        val batch =
          if (i < 3) mem.filter(col("id") >= lo && col("id") < quarter * (i + 1))
          else mem.filter(col("id") >= lo)
        graft.ann.IvfIndex.refresh(s, path, batch)
      }
      graft.ann.IvfIndex.topK(s, path, queryVec(s, dir), k = 10, nprobe = 2)
    }),
    // recall audit for the ANN scale path: |IVF top-10 ∩ exact top-10| / 10 —
    // the metric that decides whether nprobe is sized right at scale
    "ann_ivf_recall" -> ((s, dir) => {
      val mem = Corpus.memories(s, dir)
      val qv = queryVec(s, dir)
      val cent = Ann.centroidsByLabel(Tables.embeddings(s, dir))
      val ivf = Ann.ivfTopK(Ann.assign(mem, cent), cent, qv, k = 10, nprobe = 2)
        .select("id")
      val exact = VectorSearch.topK(mem, qv, k = 10).select("id")
      ivf.join(exact, "id")
        .agg(round(count(lit(1)) / 10.0, 6).as("recall_at_10"))
    }),
    // SemDeDup (Abbas '23): k-means-cell semantic dedup — within-cell
    // cosine pruning at eps, fixture centroids from the labeled embeddings.
    // eps=0.3 (not the paper's 0.95): the synthetic hashing embeddings top
    // out near 0.49 within-cell, and 0.3 drops ~35% — both branches live
    "tc_semantic_dedup" -> ((s, dir) => {
      val cent = Ann.centroidsByLabel(Tables.embeddings(s, dir))
      graft.dedup.SemDedup.semanticDedup(Corpus.memories(s, dir), cent, eps = 0.3)
        .orderBy("id")
    }),
    // embedding-level decontamination: bench slice (id%20==3, the
    // tc_bloom_decontam convention) vs the train rest, candidate pairs
    // cell-bucketed, exact cosine on candidates only — catches the
    // paraphrased contamination the n-gram Bloom gate misses. eps=0.3:
    // cross-slice same-cell sims top out near 0.38 on the fixture, so
    // 0.3 keeps the flagged set live and selective
    "tc_semantic_decontam" -> ((s, dir) => {
      val mem = Corpus.memories(s, dir)
      val cent = Ann.centroidsByLabel(Tables.embeddings(s, dir))
      graft.dedup.SemDedup.semanticContamination(
        mem.filter(col("id") % 20 =!= 3), mem.filter(col("id") % 20 === 3),
        cent, eps = 0.3)
        .orderBy("id", "bench_id")
    }),
    // incremental-maintenance worklist: for a 2%-changed batch, exactly
    // which ivf cells / bm25 terms / decontam shingles need refresh —
    // the O(batch) planner behind every incremental artifact here
    "op_invalidation_plan" -> ((s, dir) => {
      val mem = Corpus.memories(s, dir)
      graft.ops.Invalidation.plan(
        mem.filter(col("id") % 50 === 0),
        Ann.centroidsByLabel(Tables.embeddings(s, dir)))
        .orderBy("id", "artifact", "key")
    }),
    // the invalidation EXECUTOR (r9 verdict #1), end to end: build both
    // persisted indexes on the full corpus, then apply one maintenance
    // batch — ids%50==0 re-crawled (their text/embedding becomes the next
    // doc's — SQL-expressible new content), ids%50==25 deleted — via
    // tombstone+append generations, never a rebuild. The summary the
    // query returns (live row counts, N, total tokens) is recomputed by
    // the oracle from the UPDATED corpus, so the hash-match proves the
    // O(batch) maintenance left exactly full-recompute state
    "op_invalidation_apply" -> ((s, dir) => {
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_inv_ivf_${ProcessHandle.current().pid()}"
      val bm25Path = s"${sys.props("java.io.tmpdir")}/graft_inv_bm25_${ProcessHandle.current().pid()}"
      val lshPath = s"${sys.props("java.io.tmpdir")}/graft_inv_lsh_${ProcessHandle.current().pid()}"
      reapAtExit(ivfPath); reapAtExit(bm25Path); reapAtExit(lshPath)
      val mem = Corpus.memories(s, dir)
      graft.ann.IvfIndex.build(mem, Tables.embeddings(s, dir), ivfPath)
      graft.search.BM25Index.build(mem, bm25Path)
      graft.dedup.LshIndex.build(mem.select("id", "text"), lshPath)
      // re-crawled content = the NEXT doc's text+embedding (inner join
      // drops the max-id edge where no next doc exists)
      val next = mem.select((col("id") - 1).as("id"),
        col("text").as("_t2"), col("embedding").as("_e2"))
      val changed = mem.select("id").filter(col("id") % 50 === 0)
        .join(next, "id")
        .select(col("id"), col("_t2").as("text"), col("_e2").as("embedding"))
      val deleted = mem.filter(col("id") % 50 === 25).select("id")
      graft.ops.Invalidation.execute(s, changed, deleted, ivfPath, bm25Path,
          lshPath = Some(lshPath))
        .orderBy("stat")
    }),
    // the plan → execute → COMPACT cycle end to end: the same mixed batch
    // applied, then compactionSweep derives every family's touched-
    // partition worklist from the batch's before/after images (the CDC
    // before/after-envelope convention) and rewrites ONLY those
    // partitions — postings by the images' term buckets, doclens/shingles/
    // id-sidecar by the images' id buckets, IVF by the images' assigned
    // cells, bands whole (bounded at 8). Oracle = the post-maintenance
    // state SQL verbatim: the sweep must be semantically invisible. The
    // per-family physical pins (untouched files byte-identical) live in
    // BM25IndexSpec / AnnSpec / LshIndexSpec
    "op_compaction_sweep" -> ((s, dir) => {
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_swp_ivf_${ProcessHandle.current().pid()}"
      val bm25Path = s"${sys.props("java.io.tmpdir")}/graft_swp_bm25_${ProcessHandle.current().pid()}"
      val lshPath = s"${sys.props("java.io.tmpdir")}/graft_swp_lsh_${ProcessHandle.current().pid()}"
      reapAtExit(ivfPath); reapAtExit(bm25Path); reapAtExit(lshPath)
      val mem = Corpus.memories(s, dir)
      graft.ann.IvfIndex.build(mem, Tables.embeddings(s, dir), ivfPath)
      graft.search.BM25Index.build(mem, bm25Path)
      graft.dedup.LshIndex.build(mem.select("id", "text"), lshPath)
      val next = mem.select((col("id") - 1).as("id"),
        col("text").as("_t2"), col("embedding").as("_e2"))
      val changed = mem.select("id").filter(col("id") % 50 === 0)
        .join(next, "id")
        .select(col("id"), col("_t2").as("text"), col("_e2").as("embedding"))
      val deleted = mem.filter(col("id") % 50 === 25).select("id")
      graft.ops.Invalidation.execute(s, changed, deleted, ivfPath, bm25Path,
        lshPath = Some(lshPath))
      val oldImage = mem
        .join(changed.select("id").unionByName(deleted), Seq("id"), "left_semi")
        .select("id", "text", "embedding")
      graft.ops.Invalidation.compactionSweep(s, oldImage, changed,
        ivfPath, bm25Path, lshPath = Some(lshPath))
      graft.ops.Invalidation.stateSummary(s, ivfPath, bm25Path,
          lshPath = Some(lshPath))
        .orderBy("stat")
    }),
    // IVF delete maintenance in isolation: build full, tombstone a THIRD
    // of the corpus (a slice guaranteed to intersect the top-k, so a
    // dropped tombstone can't silently pass), probe. Oracle = the
    // full-corpus IVF SQL minus the deleted ids against the SAME stored
    // centroids (deletes never move centroids — Faiss remove_ids
    // semantics), so the hash-match proves delete→refresh ≡ rebuild
    "ann_ivf_delete_refresh" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_del_${ProcessHandle.current().pid()}"
      reapAtExit(path)
      val mem = Corpus.memories(s, dir)
      graft.ann.IvfIndex.build(mem, Tables.embeddings(s, dir), path)
      graft.ann.IvfIndex.deleteRefresh(s, path,
        mem.filter(col("id") % 3 === 1).select("id"))
      graft.ann.IvfIndex.topK(s, path, queryVec(s, dir), k = 10, nprobe = 2)
    }),
    // the full plan→execute→compact cycle: delete a third, then rewrite
    // ONLY the cells the invalidation plan names (every other cell's
    // files untouched — StoreGenerationsSpec pins the physical side),
    // probe. Same oracle as the delete: targeted compaction must be
    // semantically invisible
    "ann_ivf_compact_cells" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_cmp_${ProcessHandle.current().pid()}"
      reapAtExit(path)
      val mem = Corpus.memories(s, dir)
      graft.ann.IvfIndex.build(mem, Tables.embeddings(s, dir), path)
      val deleted = mem.filter(col("id") % 3 === 1)
      graft.ann.IvfIndex.deleteRefresh(s, path, deleted.select("id"))
      // the planner names the touched cells; compact exactly those
      val cells = graft.ops.Invalidation.plan(deleted,
          Ann.centroidsByLabel(Tables.embeddings(s, dir)))
        .filter(col("artifact") === "ivf_cell")
        .select(col("key").cast("int")).distinct()
        .collect().map(_.getInt(0)).toSeq
      graft.ann.IvfIndex.compactCells(s, path, cells)
      graft.ann.IvfIndex.topK(s, path, queryVec(s, dir), k = 10, nprobe = 2)
    }),
    // IVF drift audit: build on the first half (cellstats = the frozen
    // baseline), O(batch)-refresh the second half against the stored
    // centroids, then report per-cell growth and assign-sim decay vs the
    // baseline. The oracle recomputes both states from the raw corpus in
    // SQL (assign argmax + per-cell avgs over the half and the whole), so
    // the hash-match proves the persisted baseline, the csim column, and
    // the audit arithmetic all agree with first principles. Per-cell
    // growth fluctuates around 2.0 (sampling noise of the id split), so
    // the default growthLimit=2.0 flips `retrain` on some cells and not
    // others — both branches live in the hashed output
    "ann_ivf_drift" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_drift_${ProcessHandle.current().pid()}"
      reapAtExit(path)
      val mem = Corpus.memories(s, dir)
      val half = Corpus.nDocs(s, dir) / 2
      graft.ann.IvfIndex.build(
        mem.filter(col("id") < half), Tables.embeddings(s, dir), path)
      graft.ann.IvfIndex.refresh(s, path, mem.filter(col("id") >= half))
      graft.ann.IvfIndex.driftAudit(s, path).orderBy("ivf_cell")
    }),
    // the drift loop CLOSED: driftAudit flags cells (growth / assign-sim
    // decay vs the build-time baseline), retrainCells re-centers EXACTLY
    // those cells from their current members, reassigns only the members
    // against the updated centroid set (migration into unflagged cells
    // allowed — that is the point of recentring), and re-seeds the flagged
    // cells' baseline. Output = the full post-retrain live assignments;
    // the oracle replays audit → flag → recenter → reassign → merge from
    // the raw corpus in SQL, so the hash-match proves flag selection, the
    // recenter math, migration, and the untouched remainder all at once
    "ann_ivf_retrain" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_rt_${ProcessHandle.current().pid()}"
      reapAtExit(path)
      val mem = Corpus.memories(s, dir)
      val half = Corpus.nDocs(s, dir) / 2
      graft.ann.IvfIndex.build(
        mem.filter(col("id") < half), Tables.embeddings(s, dir), path)
      graft.ann.IvfIndex.refresh(s, path, mem.filter(col("id") >= half))
      val flagged = graft.ann.IvfIndex.driftAudit(s, path)
        .filter(col("retrain")).select("ivf_cell")
        .as(org.apache.spark.sql.Encoders.scalaInt).collect().toSeq
      graft.ann.IvfIndex.retrainCells(s, path, flagged)
      graft.sources.IndexManifest.resolve(s, path)("assignments")
        .select(col("id"), col("ivf_cell"),
          round(col("csim"), 6).as("csim"))
        .orderBy("id")
    }),
    // split-on-retrain: half the streamed-in rows carry ONE planted
    // embedding (vec 0) — a point-mass second mode that floods its cell;
    // the recenter step leaves the cell's mean csim under the floor, so
    // retrainCells BISECTS it (seed B = farthest member, one Lloyd step,
    // new label past the max). Oracle = the same first-principles replay
    // extended with the bisect cascade
    "ann_ivf_retrain_split" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_rts_${ProcessHandle.current().pid()}"
      reapAtExit(path)
      val half = Corpus.nDocs(s, dir) / 2
      val planted = Corpus.memories(s, dir).withColumn("embedding",
        when(col("id") >= half && col("id") % 2 === 1,
          typedLit(queryVec(s, dir))).otherwise(col("embedding")))
      graft.ann.IvfIndex.build(
        planted.filter(col("id") < half), Tables.embeddings(s, dir), path)
      graft.ann.IvfIndex.refresh(s, path, planted.filter(col("id") >= half))
      val flagged = graft.ann.IvfIndex.driftAudit(s, path)
        .filter(col("retrain")).select("ivf_cell")
        .as(org.apache.spark.sql.Encoders.scalaInt).collect().toSeq
      graft.ann.IvfIndex.retrainCells(s, path, flagged,
        splitSimFloor = Some(SplitSimFloor))
      graft.sources.IndexManifest.resolve(s, path)("assignments")
        .select(col("id"), col("ivf_cell"),
          round(col("csim"), 6).as("csim"))
        .orderBy("id")
    }),
    // the drift loop UNATTENDED: the second half arrives as a streamed
    // micro-batch (refreshBatch, the foreachBatch body) with auditEvery=1,
    // so the cadence hook runs driftAudit right after the apply and
    // retrainIfDrifted dispatches the targeted retrain on whatever
    // flagged. Oracle = the SAME first-principles replay as
    // ann_ivf_retrain (one SQL adjudicates the explicit and the
    // streaming-triggered path); StreamingSpec drives the real
    // MemoryStream form and the replay no-op
    "st_drift_retrain" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_sdr_${ProcessHandle.current().pid()}"
      reapAtExit(path)
      val mem = Corpus.memories(s, dir)
      val half = Corpus.nDocs(s, dir) / 2
      graft.ann.IvfIndex.build(
        mem.filter(col("id") < half), Tables.embeddings(s, dir), path)
      graft.streaming.EventStream.refreshBatch(
        mem.filter(col("id") >= half), batchId = 0L,
        bm25Path = None, ivfPath = Some(path), auditEvery = 1)
      graft.sources.IndexManifest.resolve(s, path)("assignments")
        .select(col("id"), col("ivf_cell"),
          round(col("csim"), 6).as("csim"))
        .orderBy("id")
    }),
    // targeted BM25 physical maintenance: delete a third, then rewrite
    // ONLY the postings/doclens buckets the deleted docs' terms and ids
    // hash into (driver-side Murmur3 over the same worklist the
    // invalidation plan enumerates as `bm25_term`), then score. Oracle =
    // the delete-refresh SQL verbatim: targeted compaction must be
    // semantically invisible. BM25IndexSpec pins the physical side
    // (untouched buckets' files not rewritten)
    "r2_bm25_compact" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_bm25_cmp_${ProcessHandle.current().pid()}"
      reapAtExit(path)
      val mem = Corpus.memories(s, dir)
      BM25Index.build(mem, path)
      val deleted = mem.filter(col("id") % 3 === 1)
      BM25Index.deleteRefresh(s, path, deleted.select("id"))
      val terms = deleted
        .select(explode(TextFunctions.tokens(col("text"))).as("t"))
        .distinct().as(org.apache.spark.sql.Encoders.STRING).collect().toSeq
      val ids = deleted.select("id").as(org.apache.spark.sql.Encoders.scalaLong)
        .collect().toSeq
      BM25Index.compactBuckets(s, path,
        BM25Index.bucketsForTerms(terms), BM25Index.bucketsForIds(ids))
      BM25Index.scores(s, path, QueryTokens)
        .join(mem.filter(!col("archived") && col("id") % 3 =!= 1).select("id"), "id")
        .filter(col("bm25") > 0)
        .orderBy(desc("bm25"), asc("id"))
        .limit(10)
        .select("id", "bm25")
    }),
    // unified decontamination report: every flagged (train, bench) pair
    // with WHICH gate caught it — n-gram overlap, embedding cosine, or
    // both. The attribution table a decontamination review reads: pairs
    // caught ONLY semantically are the paraphrased leaks the n-gram gate
    // would have shipped
    "tc_decontam_report" -> ((s, dir) => {
      val mem = Corpus.memories(s, dir)
      val bench = mem.filter(col("id") % 20 === 3)
      val train = mem.filter(col("id") % 20 =!= 3)
      val ng = graft.text.Curation.contamination(
        train.select("id", "text"), bench.select("id", "text"), minShared = 5)
      val sem = graft.dedup.SemDedup.semanticContamination(train, bench,
        Ann.centroidsByLabel(Tables.embeddings(s, dir)), eps = 0.3)
      ng.join(sem, Seq("id", "bench_id"), "full_outer")
        .select(col("id"), col("bench_id"),
          col("n_shared").isNotNull.as("ngram_hit"),
          col("sim").isNotNull.as("semantic_hit"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          coalesce(col("sim"), lit(0.0)).as("sim"))
        .orderBy("id", "bench_id")
    }),
    // flagship 100 TB training-data curation pipeline: profile → filter →
    // exact dedup → MinHash-LSH near-dup removal, every stage distributed
    "tc_curation_survivors" -> ((s, dir) => {
      graft.text.Curation.curate(docs(s, dir)).survivors
        .select("id", "lang", "quality", "n_ws", "n_bpe").orderBy("id")
    }),
    "tc_curation_funnel" -> ((s, dir) =>
      graft.text.Curation.funnel(docs(s, dir))),
    // corpus card: per-language doc/token/quality rollup of the profile
    // stage. The averages are computed from exact integer sums (quality is
    // 6dp-rounded per row, so quality*1e6 is integral) — double summation
    // order differs between Spark partial aggregation and DuckDB and flips
    // the 6th decimal (round-3 ADVICE #1); integer sums are order-free.
    "tc_corpus_stats" -> ((s, dir) =>
      graft.text.Curation.profile(docs(s, dir))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_ws").as("total_ws"),
          sum(round(col("quality") * 1e6).cast("long")).as("_qmicro"),
          sum(col("n_bpe").cast("long")).as("_bpe"))
        .select(col("lang"), col("n_docs"), col("total_ws"),
          round(col("_qmicro") / 1e6 / col("n_docs"), 6).as("avg_quality"),
          round(col("_bpe").cast("double") / col("n_docs"), 6).as("avg_bpe"))
        .orderBy("lang")),
    // dedup clusters: connected components over the MinHash near-dup pairs —
    // the keep-one-per-cluster shape (every node has an edge, so size >= 2)
    "tc_neardup_clusters" -> ((s, dir) => {
      val pairs = MinHashLsh.nearDuplicates(docs(s, dir), threshold = 0.2)
      Clusters.connectedComponentsAuto(pairs)
        .select(col("component").as("cluster"), col("id"))
        .orderBy("cluster", "id")
    }),
    // benchmark decontamination: corpus docs sharing >=5 distinct 3-gram
    // shingles with an eval-set doc (fixture: every 25th doc, offset 7).
    // Counts cast to long on both sides (driver compares dtypes)
    "tc_contamination" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(col("id") % 25 === 7).select("id", "text")
      graft.text.Curation.contamination(d, bench, minShared = 5)
        .orderBy("id", "bench_id")
    }),
    // bloom-gated decontamination: same semantics, broadcast Bloom probe
    // fused into the scan so the verify join only sees admitted grams
    // (different bench fixture than tc_contamination to vary coverage)
    "tc_bloom_decontam" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(col("id") % 20 === 3).select("id", "text")
      graft.text.BloomDecontam.bloomContamination(d, bench, minShared = 5)
        .orderBy("id", "bench_id")
    }),
    // PII scrub stage: deterministic injected PII (every 7th doc gets an
    // email, an IPv4 and a phone) -> typed-sentinel redaction + counts
    "tc_pii_scrub" -> ((s, dir) => {
      val injected = docs(s, dir).withColumn("text",
        when(col("id") % 7 === 0, concat(col("text"),
          lit(" contact user"), col("id"), lit("@example.com on 10.1.2."),
          col("id") % 250, lit(" or +1555000"), col("id")))
          .otherwise(col("text")))
      graft.text.Curation.scrubPii(injected)
        .select(col("id"), col("n_email").cast("long").as("n_email"),
          col("n_ip").cast("long").as("n_ip"),
          col("n_phone").cast("long").as("n_phone"),
          length(col("text")).cast("long").as("clean_len"))
        .orderBy("id")
    }),
    // Gopher repetition filters: duplicate-line fraction + top-bigram token
    // coverage (fixture: every 5th doc duplicated onto a second line so the
    // line-level signal is non-degenerate on the single-line corpus)
    "tc_repetition" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("text",
        when(col("id") % 5 === 0, concat(col("text"), lit("\n"), col("text")))
          .otherwise(col("text")))
      TextAnalysis.repetitionStats(d).orderBy("id")
    }),
    // deterministic per-source-prefix downsampling (auditable corpus quotas)
    "tc_sample_quota" -> ((s, dir) =>
      graft.text.Curation.deterministicSample(
        docs(s, dir), Seq(("src1", 0.25), ("src", 0.75)))
        .select("id", "source").orderBy("id")),
    // SQ8 compressed-vector tier: quantized top-k, two-stage re-rank, and
    // the recall audit that sizes the candidate pool
    "ann_sq8_topk" -> ((s, dir) =>
      Quantize.topKQuantized(Corpus.memories(s, dir), queryVec(s, dir), k = 10)),
    "ann_sq8_rerank" -> ((s, dir) =>
      Quantize.topKReranked(Corpus.memories(s, dir), queryVec(s, dir),
        k = 10, candidates = 50)),
    "ann_sq8_recall" -> ((s, dir) => {
      val mem = Corpus.memories(s, dir)
      val qv = queryVec(s, dir)
      Quantize.topKQuantized(mem, qv, k = 10).select("id")
        .join(VectorSearch.topK(mem, qv, k = 10).select("id"), "id")
        .agg(round(count(lit(1)) / 10.0, 6).as("recall_at_10"))
    }),
    // concat-and-chunk training-sequence packing manifest
    "tp_pack_sequences" -> ((s, dir) =>
      graft.text.Packing.packSequences(docs(s, dir)).orderBy("seq_id")),
    // domain-mixture plan: per-language sampling rates / epochs realizing
    // a target mixture inside a 50%-of-corpus token budget
    "tp_mixture_plan" -> ((s, dir) =>
      graft.text.Curation.mixturePlan(
        docs(s, dir), MixtureTargets).orderBy("domain")),
    // IVF cell pruning × SQ8 compressed scoring × exact re-rank — the
    // composed ANN layout a 100 TB deployment runs (Faiss IVF-SQ shape)
    "ann_ivfsq8_topk" -> ((s, dir) => {
      val cent = Ann.centroidsByLabel(Tables.embeddings(s, dir))
      val assigned = Ann.assign(Corpus.memories(s, dir), cent)
      Ann.ivfSq8TopK(assigned, cent, queryVec(s, dir), k = 10)
    }),
    // train/val hash split + near-dup leakage audit across the split
    // materialized mixture: one row per (doc, copy) under the plan's rates
    "tp_mixture_apply" -> ((s, dir) =>
      graft.text.Curation.mixtureApply(docs(s, dir), MixtureTargets)
        .orderBy("id", "copy")),
    // deterministic global shuffle into training shards
    "tp_shuffle_shards" -> ((s, dir) =>
      graft.text.Packing.shuffleShards(docs(s, dir)).orderBy("id")),
    "tp_split_leakage" -> ((s, dir) =>
      graft.text.Curation.splitLeakage(docs(s, dir))
        .orderBy("val_id", "train_id")),
    // unigram-LM perplexity filter (CCNet-style fluency signal)
    "ta_unigram_nll" -> ((s, dir) =>
      TextAnalysis.unigramNll(docs(s, dir)).orderBy("id")),
    // add-k smoothed bigram LM fluency (the CCNet-filter shape, order 2)
    "ta_bigram_nll" -> ((s, dir) =>
      TextAnalysis.bigramNll(docs(s, dir)).orderBy("id")),
    // interpolated Kneser-Ney bigram LM trained on the src1 slice (the
    // termDrift reference-domain convention), scoring all docs — the
    // CCNet in-domain-vs-off-domain perplexity tiering signal
    "ta_kn_bigram_nll" -> ((s, dir) =>
      TextAnalysis.knBigramNll(docs(s, dir),
        col("source").startsWith("src1")).orderBy("id")),
    // C4 heuristic cleaning rules (Raffel '20 §2.2) over the synthesized
    // line-structured pages (raw fixture docs have no lines/punctuation)
    "tc_c4_filters" -> ((s, dir) =>
      graft.text.Curation.c4Filters(c4Pages(s, dir)).orderBy("id")),
    "tc_c4_funnel" -> ((s, dir) =>
      graft.text.Curation.c4Funnel(c4Pages(s, dir))),
    // Count-Min Sketch term-frequency summary: true top-20 terms vs their
    // sketch estimates (deterministic pairwise hashes -> exact oracle)
    "sk_cms_heavy_terms" -> ((s, dir) => {
      val d = docs(s, dir)
      val truth = d
        .select(explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("true_cnt"))
        .orderBy(desc("true_cnt"), asc("term")).limit(20)
        .localCheckpoint(true) // feeds the estimate probe and the join
      val cms = graft.text.Sketches.cmsTermCounts(d)
      graft.text.Sketches.cmsEstimate(cms, truth.select("term"))
        .join(truth, Seq("term"))
        .select(col("term"), col("true_cnt"), col("est").as("cms_est"))
        .orderBy(desc("true_cnt"), col("term"))
    }),
    // paragraph-level exact dedup with reconstruction; id%7 docs get their
    // text doubled into two identical paragraphs so the within-doc and
    // cross-doc claim paths are both exercised
    "tc_paragraph_dedup" -> ((s, dir) =>
      graft.text.Curation.dedupParagraphs(
        docs(s, dir).withColumn("text",
          when(col("id") % 7 === 0, concat(col("text"), lit("\n\n"), col("text")))
            .otherwise(col("text"))))
        .orderBy("id")),
    // span-level repeated-passage detection over positioned winnowing
    "tc_repeated_spans" -> ((s, dir) =>
      TextAnalysis.repeatedSpans(docs(s, dir)).orderBy("id")),
    // EXACT substring dedup (Lee et al. '21 ExactSubstr, distributed form):
    // verbatim g-gram grouping, no fingerprint/winnowing approximation
    "tc_exact_spans" -> ((s, dir) =>
      TextAnalysis.exactRepeatedSpans(docs(s, dir), g = 8).orderBy("id")),
    // incremental curation: curate the first half, fold the second half in
    // through the retained state — the oracle is the FULL-BATCH curation
    // SQL, so the hash-match proves increment == recuration
    "tc_curation_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val half = Corpus.nDocs(s, dir) / 2
      val old = graft.text.Curation.curate(d.filter(col("id") < half))
      graft.text.Curation.curateIncrement(old, d.filter(col("id") >= half))
        .select("id", "lang", "quality", "n_ws", "n_bpe").orderBy("id")
    }),
    // classifier feature assembly (the SQL-expressible half of the quality
    // model; the MLlib fit itself stays spec-gated) — goes through the real
    // withFeatures path so the oracle pins what the model actually consumes
    "qm_features" -> ((s, dir) =>
      graft.text.QualityModel.withFeatures(docs(s, dir))
        .select(col("id"),
          round(col("f_len_sat"), 6).as("f_len_sat"),
          round(col("f_stop_ratio"), 6).as("f_stop_ratio"),
          round(col("f_unique_ratio"), 6).as("f_unique_ratio"),
          round(col("f_digit_ratio"), 6).as("f_digit_ratio"),
          round(col("f_chars_per_token"), 6).as("f_chars_per_token"))
        .orderBy("id")),
    // streaming admission gate run in BATCH mode (flatMapGroupsWithState on
    // a batch frame is deterministic: norm-keyed min-id reduce + corpus
    // SimHash chunk join) — corpus = id%3==0 docs, incoming = the rest
    "sd_admit_batch" -> ((s, dir) => {
      val d = docs(s, dir)
      val idx = graft.streaming.StreamDedup.corpusChunkIndex(
        d.filter(col("id") % 3 === 0))
      graft.streaming.StreamDedup.admit(d.filter(col("id") % 3 =!= 0), idx)
        .orderBy("id")
    }),
    // HyperLogLog distinct-term estimate beside the exact count (the
    // mergeable cardinality sketch next to the CMS frequency sketch)
    "sk_hll_distinct" -> ((s, dir) =>
      graft.text.Sketches.hllDistinctTerms(docs(s, dir))),
    // per-source HLL: one ≤64-register sketch per partition key — the
    // grouped form a 100 TB profiling pass ships per shard/source/date
    "sk_hll_by_source" -> ((s, dir) =>
      graft.text.Sketches.hllDistinctByKey(docs(s, dir), "source")),
    // sketch algebra: vocab overlap between the src1 slice and the rest
    // via HLL inclusion-exclusion (union = cell-wise register max) —
    // cross-slice questions answered from per-slice sketches alone
    "sk_hll_overlap" -> ((s, dir) =>
      graft.text.Sketches.hllOverlap(docs(s, dir),
        col("source").startsWith("src1"))),
    // nearest-rank length quantiles (corpus card): histogram-first, the
    // only ordered pass runs over the distinct-length histogram
    "ta_length_quantiles" -> ((s, dir) =>
      TextAnalysis.lengthQuantiles(docs(s, dir))),
    // Heaps-law vocabulary-growth curve: id-range slices (map-only),
    // terms charged to their first-occurrence slice, tiny cumsum
    "ta_vocab_growth" -> ((s, dir) =>
      TextAnalysis.vocabGrowth(docs(s, dir), buckets = 10)),
    // Zipf rank-frequency least-squares fit over the top-1000 terms
    // (integer micro-unit regression sums; slope ≈ -1 for natural text)
    "ta_zipf_slope" -> ((s, dir) =>
      TextAnalysis.zipfSlope(docs(s, dir), topN = 1000)),
    // distributed BPE tokenizer-merge training: top-6 learned merges
    // (Sennrich '16), oracle = the same 6 rounds unrolled in SQL
    "tk_bpe_merges" -> ((s, dir) =>
      graft.text.Bpe.trainMerges(docs(s, dir), k = 6).orderBy("merge_rank")),
    // train → apply composition: per-doc token counts under the learned
    // table (symbol counts computed per DISTINCT word, joined back to the
    // occurrence stream — the scale shape of tokenizer application)
    "tk_bpe_tokenize" -> ((s, dir) => {
      val d = docs(s, dir)
      val merges = graft.text.Bpe.trainMerges(d, k = 6)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      // feeds both the distinct-word sizing frame and the occurrence join
      val words = d.select(col("id"),
        explode(TextFunctions.tokens(col("text"))).as("w"))
        .localCheckpoint(true)
      val wsize = graft.text.Bpe.applyMerges(words.select("w").distinct(), merges)
        .select(col("w"), size(col("tokens")).as("_ns"))
      words.join(wsize, "w")
        .groupBy("id")
        .agg(count(lit(1)).as("n_words"), sum(col("_ns")).as("n_bpe"))
        .orderBy("id")
    }),
    // per-document top-3 TF-IDF keyword extraction (salient-term summary)
    "ta_tfidf_keywords" -> ((s, dir) =>
      TextAnalysis.tfidfKeywords(docs(s, dir), k = 3)
        .orderBy("id", "kw_rank")),
    // signal-agreement audit: Pearson r between heuristic quality and
    // unigram-LM NLL — does the cheap filter proxy the expensive one?
    "ta_quality_nll_corr" -> ((s, dir) =>
      graft.text.Curation.qualityFluencyCorr(docs(s, dir))),
    // per-day trending terms by share-lift vs the corpus baseline — the
    // temporal drift monitor of a continuously-ingesting corpus
    "ta_trending_terms" -> ((s, dir) =>
      TextAnalysis.trendingTerms(Corpus.memories(s, dir))
        .orderBy("day", "rank")),
    // per-language BPE fertility (pieces per word) under the trained merge
    // table — the mT5/XLM-R tokenizer-equity table: a high-fertility
    // language pays more sequence length per word of content
    "tk_fertility" -> ((s, dir) => {
      val d = docs(s, dir)
      val merges = graft.text.Bpe.trainMerges(d, k = 6)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val words = d.select(col("lang"),
        explode(TextFunctions.tokens(col("text"))).as("w"))
        .localCheckpoint(true)
      val wsize = graft.text.Bpe.applyMerges(words.select("w").distinct(), merges)
        .select(col("w"), size(col("tokens")).as("_ns"))
      words.join(wsize, "w")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"), sum(col("_ns")).as("n_pieces"))
        .select(col("lang"), col("n_words"), col("n_pieces"),
          round(col("n_pieces").cast("double") / col("n_words"), 6).as("fertility"))
        .orderBy("lang")
    }),
    // DSIR importance-resampling scores (hashed-unigram log-likelihood
    // ratio vs the lang='en' target slice; kept = more target-like than raw)
    "tc_dsir_sample" -> ((s, dir) =>
      graft.text.Curation.dsirScores(docs(s, dir), col("lang") === "en")
        .orderBy("id"))
  )

  /** Mixture-plan fixture: integer target weights per language. de is
    * upsampled past its natural share (exercises the epochs>1 repeat path),
    * en/fr/es are subsampled, and zh is deliberately absent (weight 0 →
    * dropped from the mixture). */
  val MixtureTargets: Seq[(String, Long)] =
    Seq(("en", 1L), ("de", 6L), ("fr", 2L), ("es", 1L))

  /** IVF CTE chain: cent0/centn/cent (centroids), asg (cell assignment
    * over `from` — default the memories corpus; the CDC oracle passes its
    * post-maintenance `live` view), probe (the nprobe=2 query-nearest
    * cells) — shared by the IVF and IVF×SQ8 oracles. */
  /** The centroid CTEs alone (cent0/centn/cent) — the per-label normalized
    * means of the full embeddings table, [[graft.ann.Ann.centroidsByLabel]]
    * in SQL. Shared by [[ivfCtesOver]] and the indexed ingest-gate oracles
    * (whose asg/probe shapes differ from the fixed-query form). */
  // lazy: referenced (via ivfCtes) by oracle maps declared ABOVE this
  // point — a strict val would still be null during their initialization
  private[graft] lazy val centCtes: String =
    """cent0 AS (
       |  SELECT label, t.i, avg(CAST(embedding[t.i] AS DOUBLE)) AS m
       |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
       |centn AS (SELECT label, sqrt(sum(m * m)) AS nrm FROM cent0 GROUP BY 1),
       |cent AS MATERIALIZED (
       |  SELECT c.label, list(c.m / n.nrm ORDER BY c.i) AS centroid
       |  FROM cent0 c JOIN centn n USING (label) GROUP BY c.label)""".stripMargin

  /** [[ivfCtesOver]] with the probe ranked against an arbitrary
    * query-vector relation `qSrc` (must expose one row with a `qv` list)
    * instead of a fixed embeddings-table row — the text-query indexed
    * legs (e.g. `r18_maxsim_indexed`) probe with a hash-embedded query. */
  private[graft] def ivfCtesOverQ(from: String, qSrc: String): String =
    s"""$centCtes,
       |asg AS MATERIALIZED (
       |  SELECT id, label AS ivf_cell FROM (
       |    SELECT m.id, c.label, row_number() OVER (PARTITION BY m.id ORDER BY
       |      list_sum(list_transform(range(1, 65), i -> CAST(m.embedding[i] AS DOUBLE) * c.centroid[i])) DESC,
       |      c.label) AS rn
       |    FROM $from m, cent c) WHERE rn = 1),
       |probe AS (
       |  SELECT label FROM (
       |    SELECT c.label, row_number() OVER (ORDER BY
       |      list_sum(list_transform(range(1, 65), i -> c.centroid[i] * CAST(q.qv[i] AS DOUBLE))) DESC,
       |      c.label) AS rn
       |    FROM cent c, $qSrc q)
       |  WHERE rn <= 2)""".stripMargin

  private[graft] def ivfCtesOver(from: String, vecId: Long = 0): String =
    ivfCtesOverQ(from,
      s"(SELECT embedding AS qv FROM embeddings WHERE vec_id = $vecId)")

  private[graft] def ivfCtes: String = ivfCtesOver("memories")

  private val ivfTopkSql: String =
    s"""WITH ${OracleCtes.memories},
         |$ivfCtes
         |SELECT m.id, a.ivf_cell,
         |  round(${OracleCtes.dot64("m.embedding", "q2.qv")}, 6) AS sim
         |FROM memories m
         |JOIN asg a ON m.id = a.id
         |JOIN probe p ON a.ivf_cell = p.label
         |CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q2
         |ORDER BY sim DESC, m.id LIMIT 10""".stripMargin

  /** The two-level replay, shared by `ann_ivf_twolevel` (in-session) and
    * `ann_twolevel_indexed` (persisted — build ≡ compute, the
    * ann_ivf_indexed oracle-sharing precedent): level 1 verbatim from the
    * flat chain (cent/asg/probe = the nprobe1=2 rank), sub-centroid means
    * per (cell, id-mod-fanout) with the % wrapped pmod-style so the
    * replay stays total off the non-negative fixture domain, the
    * within-cell argmax re-assignment (csim DESC, l2_label tie), and the
    * bounded level-2 probe rank (qs DESC, ivf_cell, l2_label; rn <= 4) —
    * TwoLevelIvf.{subCentroids,assignSub,probeTopK} from first
    * principles. */
  /** The level-2 CTE chain (sub0/subn/subc/asg2) over `memories` joined
    * to a level-1 assignment CTE named `asg` — TwoLevelIvf.{subCentroids,
    * assignSub} from first principles at fanout 4. Shared by the
    * two-level top-k oracles here and the two-level recall-ladder oracle
    * (QueriesExt) so there is exactly ONE replay text for the level-2
    * quantizer. `subFrom` is the row set the sub-centroid MEANS are
    * computed from (default: the whole corpus — the in-session and
    * build-full oracles); the refresh oracle passes the BUILT half,
    * because stored sub-centroids never move on add while asg2 still
    * assigns every row. */
  private[graft] def twoLevelCtesOver(asg: String,
                                      subFrom: String = "memories"): String =
    s"""sub0 AS (
       |  SELECT a.ivf_cell, ((m.id % 4) + 4) % 4 AS l2_label, t.i,
       |    avg(CAST(m.embedding[t.i] AS DOUBLE)) AS mn
       |  FROM $subFrom m JOIN $asg a USING (id), range(1, 65) t(i)
       |  GROUP BY 1, 2, 3),
       |subn AS (SELECT ivf_cell, l2_label, sqrt(sum(mn * mn)) AS nrm FROM sub0 GROUP BY 1, 2),
       |subc AS MATERIALIZED (
       |  SELECT s.ivf_cell, s.l2_label, list(s.mn / n.nrm ORDER BY s.i) AS centroid
       |  FROM sub0 s JOIN subn n USING (ivf_cell, l2_label) GROUP BY 1, 2),
       |asg2 AS MATERIALIZED (
       |  SELECT id, ivf_cell, l2_label AS l2_cell FROM (
       |    SELECT m.id, a.ivf_cell, c.l2_label, row_number() OVER (PARTITION BY m.id ORDER BY
       |      ${OracleCtes.dot64("m.embedding", "c.centroid")} DESC, c.l2_label) AS rn
       |    FROM memories m JOIN $asg a USING (id)
       |    JOIN subc c ON a.ivf_cell = c.ivf_cell) WHERE rn = 1)""".stripMargin

  private def twoLevelTopkSql(subFrom: String, pre: String = "",
                              where: String = ""): String = {
    val qv = "(SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)"
    s"""WITH ${OracleCtes.memories},
       |$pre${ivfCtesOver("memories")},
       |${twoLevelCtesOver("asg", subFrom)},
       |probe2 AS (
       |  SELECT ivf_cell, l2_label AS l2_cell FROM (
       |    SELECT s.ivf_cell, s.l2_label, row_number() OVER (ORDER BY
       |      ${OracleCtes.dot64("s.centroid", "q.qv")} DESC, s.ivf_cell, s.l2_label) AS rn
       |    FROM subc s JOIN probe p ON s.ivf_cell = p.label, $qv q)
       |  WHERE rn <= 4)
       |SELECT m.id, a2.ivf_cell, a2.l2_cell,
       |  round(${OracleCtes.dot64("m.embedding", "q2.qv")}, 6) AS sim
       |FROM memories m JOIN asg2 a2 USING (id)
       |JOIN probe2 p2 ON a2.ivf_cell = p2.ivf_cell AND a2.l2_cell = p2.l2_cell
       |CROSS JOIN $qv q2
       |${where}ORDER BY sim DESC, m.id LIMIT 10""".stripMargin
  }

  private lazy val ivfTwoLevelSql: String = twoLevelTopkSql("memories")

  /** [[ivfTwoLevelSql]] minus the deleted third, against the SAME
    * full-corpus quantizers (deletes move neither level) — what the
    * two-level deleteRefresh must serve from the tombstoned assignments
    * (the flat [[ivfDeleteTopkSql]] pattern). */
  private lazy val ivfTwoLevelDeleteSql: String =
    twoLevelTopkSql("memories", where = "WHERE m.id % 3 <> 1\n")

  /** [[ivfTwoLevelSql]] with the sub-centroid means computed from the
    * BUILT half only (stored sub-centroids never move on add) while asg2
    * still assigns the WHOLE corpus — what build-half + O(batch) refresh
    * must serve: refresh ≡ rebuild against the same stored quantizers.
    * The half bound replays Scala's integer `nDocs / 2` via DuckDB's
    * integer `//`. */
  private lazy val ivfTwoLevelRefreshSql: String = twoLevelTopkSql(
    "built",
    pre = "built AS MATERIALIZED (\n" +
      "  SELECT * FROM memories WHERE id < (SELECT count(*) // 2 FROM documents)),\n")

  /** [[ivfTopkSql]] minus the deleted third, against the SAME full-corpus
    * centroids (deletes never move centroids) — what deleteRefresh must
    * serve from the tombstoned assignments. */
  private val ivfDeleteTopkSql: String =
    s"""WITH ${OracleCtes.memories},
         |$ivfCtes
         |SELECT m.id, a.ivf_cell,
         |  round(${OracleCtes.dot64("m.embedding", "q2.qv")}, 6) AS sim
         |FROM memories m
         |JOIN asg a ON m.id = a.id
         |JOIN probe p ON a.ivf_cell = p.label
         |CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q2
         |WHERE m.id % 3 <> 1
         |ORDER BY sim DESC, m.id LIMIT 10""".stripMargin

  /** The retrain loop from first principles: original centroids + argmax
    * assignments, the audit arithmetic selecting the flagged cells,
    * recentred centroids = normalized per-cell mean of the flagged
    * members, reassignment of ONLY those members against the merged
    * centroid set, final live view = untouched rows UNION reassigned
    * rows. Shared by `ann_ivf_retrain` (explicit audit→collect→retrain)
    * and `st_drift_retrain` (the streaming cadence trigger,
    * [[graft.ann.IvfIndex.retrainIfDrifted]]) — the build-half +
    * stream-batch-rest split lands on the same live corpus, so one SQL
    * adjudicates both paths. */
  /** The shared retrain replay core (cent0 … re) over corpus CTE `from` —
    * [[ivfRetrainSql]] runs it on `memories` verbatim; the split oracle
    * runs it on a planted-corpus CTE and appends the bisect replay. */
  private def ivfRetrainCore(from: String): String = {
    val csim = "list_sum(list_transform(range(1, 65), i -> CAST(m.embedding[i] AS DOUBLE) * c.centroid[i]))"
    s"""cent0 AS (
       |  SELECT label, t.i, avg(CAST(embedding[t.i] AS DOUBLE)) AS m
       |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
       |centn AS (SELECT label, sqrt(sum(m * m)) AS nrm FROM cent0 GROUP BY 1),
       |cent AS MATERIALIZED (
       |  SELECT c.label, list(c.m / n.nrm ORDER BY c.i) AS centroid
       |  FROM cent0 c JOIN centn n USING (label) GROUP BY c.label),
       |asgs AS MATERIALIZED (
       |  SELECT id, label AS ivf_cell, s AS csim FROM (
       |    SELECT m.id, c.label, $csim AS s,
       |      row_number() OVER (PARTITION BY m.id ORDER BY $csim DESC, c.label) AS rn
       |    FROM $from m, cent c) WHERE rn = 1),
       |built AS (
       |  SELECT ivf_cell, count(*) AS nb, round(avg(csim), 6) AS msb
       |  FROM asgs WHERE id < (SELECT count(*) FROM documents) // 2 GROUP BY 1),
       |nowt AS (
       |  SELECT ivf_cell, count(*) AS nn, round(avg(csim), 6) AS msn
       |  FROM asgs GROUP BY 1),
       |flags AS MATERIALIZED (
       |  SELECT ivf_cell FROM built FULL JOIN nowt USING (ivf_cell)
       |  WHERE round(coalesce(nn, 0) / CAST(greatest(coalesce(nb, 0), 1) AS DOUBLE), 6) > 2.0
       |     OR round(coalesce(msb, 0.0) - coalesce(msn, 0.0), 6) > 0.1),
       |mem2 AS MATERIALIZED (
       |  SELECT a.id, a.ivf_cell, m.embedding
       |  FROM asgs a JOIN $from m ON a.id = m.id
       |  WHERE a.ivf_cell IN (SELECT ivf_cell FROM flags)),
       |f0 AS (
       |  SELECT ivf_cell AS label, t.i, avg(CAST(embedding[t.i] AS DOUBLE)) AS m
       |  FROM mem2, range(1, 65) t(i) GROUP BY 1, 2),
       |fn AS (SELECT label, sqrt(sum(m * m)) AS nrm FROM f0 GROUP BY 1),
       |fc AS (
       |  SELECT c.label, list(c.m / n.nrm ORDER BY c.i) AS centroid
       |  FROM f0 c JOIN fn n USING (label) GROUP BY c.label),
       |nc AS MATERIALIZED (
       |  SELECT label, centroid FROM cent
       |  WHERE label NOT IN (SELECT label FROM fc)
       |  UNION ALL SELECT label, centroid FROM fc),
       |re AS MATERIALIZED (
       |  SELECT id, label AS ivf_cell, s AS csim FROM (
       |    SELECT m.id, c.label, $csim AS s,
       |      row_number() OVER (PARTITION BY m.id ORDER BY $csim DESC, c.label) AS rn
       |    FROM mem2 m, nc c) WHERE rn = 1)""".stripMargin
  }

  private val ivfRetrainSql: String =
    s"""WITH ${OracleCtes.memories},
       |${ivfRetrainCore("memories")}
       |SELECT id, ivf_cell, round(csim, 6) AS csim FROM (
       |  SELECT id, ivf_cell, csim FROM asgs
       |  WHERE ivf_cell NOT IN (SELECT ivf_cell FROM flags)
       |  UNION ALL SELECT id, ivf_cell, csim FROM re)
       |ORDER BY id""".stripMargin

  /** Post-recenter mean-csim floor below which a flagged cell bisects
    * (`ann_ivf_retrain_split` and its oracle share it). 0.96 sits above
    * the planted cell's post-recenter mean (0.944 at sf0.01 — the point
    * mass dominates the mean, so one recenter step parks the centroid ON
    * the flood and strands the originals), so the registered query
    * actually exercises the bisect cascade, not just its gate. */
  val SplitSimFloor = 0.96

  /** [[ivfRetrainSql]] over the planted bimodal corpus, extended with the
    * bisect replay: reseeded means → split set → farthest-member seed →
    * one partition step → per-half normalized-mean centroids → final live
    * view (untouched ∪ reassigned-unsplit ∪ split halves). */
  private val ivfRetrainSplitSql: String = {
    val bdot = "list_sum(list_transform(range(1, 65), i -> CAST(m.embedding[i] AS DOUBLE) * CAST(b.bemb[i] AS DOUBLE)))"
    val hdot = "list_sum(list_transform(range(1, 65), i -> CAST(h.embedding[i] AS DOUBLE) * c.centroid[i]))"
    s"""WITH ${OracleCtes.memories},
       |mem1 AS MATERIALIZED (
       |  SELECT id, CASE WHEN id >= (SELECT count(*) FROM documents) // 2 AND id % 2 = 1
       |    THEN (SELECT embedding FROM embeddings WHERE vec_id = 0)
       |    ELSE embedding END AS embedding
       |  FROM memories),
       |${ivfRetrainCore("mem1")},
       |rs AS (
       |  SELECT ivf_cell, round(avg(csim), 6) AS ms FROM re
       |  WHERE ivf_cell IN (SELECT ivf_cell FROM flags) GROUP BY 1),
       |splitc AS MATERIALIZED (
       |  SELECT ivf_cell, row_number() OVER (ORDER BY ivf_cell) AS si
       |  FROM rs WHERE ms < $SplitSimFloor),
       |maxl AS (SELECT max(label) AS ml FROM nc),
       |seedb AS MATERIALIZED (
       |  SELECT ivf_cell, bemb FROM (
       |    SELECT r.ivf_cell, m.embedding AS bemb,
       |      row_number() OVER (PARTITION BY r.ivf_cell ORDER BY r.csim, r.id) AS rn
       |    FROM re r JOIN splitc USING (ivf_cell)
       |    JOIN mem1 m ON m.id = r.id) WHERE rn = 1),
       |halves AS MATERIALIZED (
       |  SELECT r.ivf_cell, r.id, m.embedding,
       |    CASE WHEN $bdot > r.csim THEN 1 ELSE 0 END AS half
       |  FROM re r JOIN splitc USING (ivf_cell)
       |  JOIN mem1 m ON m.id = r.id JOIN seedb b USING (ivf_cell)),
       |h0 AS (
       |  SELECT ivf_cell, half, t.i, avg(CAST(embedding[t.i] AS DOUBLE)) AS m
       |  FROM halves, range(1, 65) t(i) GROUP BY 1, 2, 3),
       |hn AS (SELECT ivf_cell, half, sqrt(sum(m * m)) AS nrm FROM h0 GROUP BY 1, 2),
       |hcn AS MATERIALIZED (
       |  SELECT h.ivf_cell, h.half, list(h.m / n.nrm ORDER BY h.i) AS centroid
       |  FROM h0 h JOIN hn n USING (ivf_cell, half) GROUP BY h.ivf_cell, h.half),
       |split_rows AS (
       |  SELECT h.id,
       |    CAST(CASE WHEN h.half = 1 THEN (SELECT ml FROM maxl) + s.si
       |         ELSE h.ivf_cell END AS INTEGER) AS ivf_cell,
       |    $hdot AS csim
       |  FROM halves h JOIN hcn c USING (ivf_cell, half) JOIN splitc s USING (ivf_cell))
       |SELECT id, ivf_cell, round(csim, 6) AS csim FROM (
       |  SELECT id, ivf_cell, csim FROM asgs
       |  WHERE ivf_cell NOT IN (SELECT ivf_cell FROM flags)
       |  UNION ALL SELECT id, ivf_cell, csim FROM re
       |  WHERE ivf_cell NOT IN (SELECT ivf_cell FROM splitc)
       |  UNION ALL SELECT id, ivf_cell, csim FROM split_rows)
       |ORDER BY id""".stripMargin
  }

  private val dedupOracles: Map[String, String] = Map(
    "tc_semantic_dedup" ->
      s"""WITH ${OracleCtes.memories},
         |$ivfCtes,
         |sdp AS (
         |  SELECT DISTINCT a.id AS id
         |  FROM asg a JOIN asg b ON a.ivf_cell = b.ivf_cell AND b.id < a.id
         |  JOIN memories x ON x.id = a.id
         |  JOIN memories y ON y.id = b.id
         |  WHERE round(${OracleCtes.dot64("x.embedding", "y.embedding")}, 6) >= 0.3)
         |SELECT a.id, a.ivf_cell FROM asg a
         |WHERE a.id NOT IN (SELECT id FROM sdp)
         |ORDER BY a.id""".stripMargin,
    "op_invalidation_plan" -> {
      val t = OracleText.toks("m.text")
      s"""WITH ${OracleCtes.memories},
         |$ivfCtes,
         |${OracleText.shingleCte()},
         |inb AS (SELECT id FROM memories WHERE id % 50 = 0)
         |SELECT * FROM (
         |  SELECT a.id, 'ivf_cell' AS artifact, CAST(a.ivf_cell AS VARCHAR) AS key
         |  FROM asg a JOIN inb USING (id)
         |  UNION ALL
         |  SELECT DISTINCT m.id, 'bm25_term' AS artifact, u.term AS key
         |  FROM memories m JOIN inb ON m.id = inb.id, unnest($t) u(term)
         |  UNION ALL
         |  SELECT s.id, 'shingle' AS artifact, CAST(u.h AS VARCHAR) AS key
         |  FROM sh s JOIN inb USING (id), unnest(s.sh) u(h))
         |ORDER BY id, artifact, key""".stripMargin
    },
    // full recompute of the post-maintenance index state over the UPDATED
    // corpus (ids%50==0 carry the next doc's text, ids%50==25 gone): the
    // executor's O(batch) tombstone generations must land exactly here
    "op_invalidation_apply" -> {
      val t = OracleText.toks("live.text")
      s"""WITH ${OracleCtes.memories},
         |chg AS (
         |  SELECT m.id, m2.text FROM memories m
         |  JOIN memories m2 ON m2.id = m.id + 1 WHERE m.id % 50 = 0),
         |live AS MATERIALIZED (
         |  SELECT m.id, coalesce(c.text, m.text) AS text
         |  FROM memories m LEFT JOIN chg c USING (id)
         |  WHERE m.id % 50 <> 25),
         |lt AS MATERIALIZED (
         |  SELECT live.id, u.term FROM live, unnest($t) u(term))
         |SELECT stat, value FROM (
         |  SELECT 'bm25_doclens_rows' AS stat,
         |    (SELECT count(DISTINCT id) FROM lt) AS value
         |  UNION ALL SELECT 'bm25_n', (SELECT count(*) FROM live)
         |  UNION ALL SELECT 'bm25_posting_rows',
         |    (SELECT count(*) FROM (SELECT DISTINCT id, term FROM lt))
         |  UNION ALL SELECT 'bm25_total_tokens', (SELECT count(*) FROM lt)
         |  UNION ALL SELECT 'ivf_assignment_rows', (SELECT count(*) FROM live)
         |  UNION ALL SELECT 'lsh_shingle_rows',
         |    (SELECT count(*) FROM live WHERE len($t) >= 3)
         |  UNION ALL SELECT 'lsh_band_rows',
         |    (SELECT 8 * count(*) FROM live WHERE len($t) >= 3))
         |ORDER BY stat""".stripMargin
    },
    // the post-maintenance state SQL verbatim: the targeted compaction
    // sweep across all three families must be semantically invisible
    "op_compaction_sweep" -> {
      val t = OracleText.toks("live.text")
      s"""WITH ${OracleCtes.memories},
         |chg AS (
         |  SELECT m.id, m2.text FROM memories m
         |  JOIN memories m2 ON m2.id = m.id + 1 WHERE m.id % 50 = 0),
         |live AS MATERIALIZED (
         |  SELECT m.id, coalesce(c.text, m.text) AS text
         |  FROM memories m LEFT JOIN chg c USING (id)
         |  WHERE m.id % 50 <> 25),
         |lt AS MATERIALIZED (
         |  SELECT live.id, u.term FROM live, unnest($t) u(term))
         |SELECT stat, value FROM (
         |  SELECT 'bm25_doclens_rows' AS stat,
         |    (SELECT count(DISTINCT id) FROM lt) AS value
         |  UNION ALL SELECT 'bm25_n', (SELECT count(*) FROM live)
         |  UNION ALL SELECT 'bm25_posting_rows',
         |    (SELECT count(*) FROM (SELECT DISTINCT id, term FROM lt))
         |  UNION ALL SELECT 'bm25_total_tokens', (SELECT count(*) FROM lt)
         |  UNION ALL SELECT 'ivf_assignment_rows', (SELECT count(*) FROM live)
         |  UNION ALL SELECT 'lsh_shingle_rows',
         |    (SELECT count(*) FROM live WHERE len($t) >= 3)
         |  UNION ALL SELECT 'lsh_band_rows',
         |    (SELECT 8 * count(*) FROM live WHERE len($t) >= 3))
         |ORDER BY stat""".stripMargin
    },
    "tc_decontam_report" ->
      s"""WITH ${OracleCtes.memories},
         |${OracleText.shingleCte()},
         |$ivfCtes,
         |drb AS (SELECT id AS bench_id, sh FROM sh WHERE id % 20 = 3),
         |drt AS (SELECT id, sh FROM sh WHERE id % 20 <> 3),
         |drn AS MATERIALIZED (
         |  SELECT t.id, b.bench_id,
         |    CAST(len(list_intersect(t.sh, b.sh)) AS BIGINT) AS n_shared
         |  FROM drt t, drb b
         |  WHERE len(list_intersect(t.sh, b.sh)) >= 5),
         |drs AS MATERIALIZED (
         |  SELECT a.id, b.id AS bench_id,
         |    round(${OracleCtes.dot64("x.embedding", "y.embedding")}, 6) AS sim
         |  FROM asg a JOIN asg b ON a.ivf_cell = b.ivf_cell
         |  JOIN memories x ON x.id = a.id
         |  JOIN memories y ON y.id = b.id
         |  WHERE a.id % 20 <> 3 AND b.id % 20 = 3
         |    AND round(${OracleCtes.dot64("x.embedding", "y.embedding")}, 6) >= 0.3)
         |SELECT coalesce(n.id, s.id) AS id,
         |  coalesce(n.bench_id, s.bench_id) AS bench_id,
         |  n.id IS NOT NULL AS ngram_hit, s.id IS NOT NULL AS semantic_hit,
         |  coalesce(n.n_shared, 0) AS n_shared, coalesce(s.sim, 0.0) AS sim
         |FROM drn n FULL JOIN drs s ON n.id = s.id AND n.bench_id = s.bench_id
         |ORDER BY id, bench_id""".stripMargin,
    "tc_semantic_decontam" ->
      s"""WITH ${OracleCtes.memories},
         |$ivfCtes
         |SELECT a.id, b.id AS bench_id,
         |  round(${OracleCtes.dot64("x.embedding", "y.embedding")}, 6) AS sim
         |FROM asg a JOIN asg b ON a.ivf_cell = b.ivf_cell
         |JOIN memories x ON x.id = a.id
         |JOIN memories y ON y.id = b.id
         |WHERE a.id % 20 <> 3 AND b.id % 20 = 3
         |  AND round(${OracleCtes.dot64("x.embedding", "y.embedding")}, 6) >= 0.3
         |ORDER BY a.id, bench_id""".stripMargin,
    "dd_exact_survivors" ->
      """SELECT doc_id AS id FROM (
        |  SELECT doc_id, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1 ORDER BY id""".stripMargin,
    "d2_neardup_cosine" ->
      s"""WITH ${OracleCtes.memories},
         |${OracleText.dupPairsCte(0.35)}
         |SELECT id_a, id_b, similarity FROM pr
         |ORDER BY similarity DESC, id_a, id_b""".stripMargin,
    "d2_neardup_lsh" ->
      s"""WITH ${OracleCtes.memories},
         |sbit AS MATERIALIZED (
         |  SELECT m.id, t.j,
         |    CASE WHEN list_sum(list_transform(range(1, 65), d ->
         |      CAST(m.embedding[d] AS DOUBLE) *
         |      (CAST(((1103515245 * (t.j * 64 + d - 1) + 12345) % 2001) - 1000 AS DOUBLE) / 1000.0))) >= 0
         |      THEN 1 ELSE 0 END AS bit
         |  FROM memories m, range(0, 16) t(j)
         |),
         |bkey AS MATERIALIZED (
         |  SELECT id, j // 8 AS band, CAST(sum(bit * (1 << (j % 8))) AS BIGINT) AS key
         |  FROM sbit GROUP BY 1, 2
         |),
         |bsz AS (SELECT band, key, count(*) AS cnt FROM bkey GROUP BY 1, 2),
         |bok AS MATERIALIZED (
         |  SELECT k.id, k.band, k.key FROM bkey k JOIN bsz z USING (band, key)
         |  WHERE z.cnt <= 10000),
         |lcp AS MATERIALIZED (
         |  SELECT a.id AS ia, b.id AS ib
         |  FROM bok a JOIN bok b ON a.band = b.band AND a.key = b.key AND a.id <> b.id
         |  GROUP BY 1, 2
         |),
         |sims AS MATERIALIZED (
         |  SELECT p.ia, p.ib, round(${OracleCtes.dot64("x.embedding", "y.embedding")}, 6) AS sim
         |  FROM lcp p JOIN memories x ON x.id = p.ia JOIN memories y ON y.id = p.ib
         |),
         |tk AS (
         |  SELECT ia, ib, sim FROM (
         |    SELECT ia, ib, sim, row_number() OVER (PARTITION BY ia ORDER BY sim DESC, ib) AS rn
         |    FROM sims) WHERE rn <= 5)
         |SELECT DISTINCT least(ia, ib) AS id_a, greatest(ia, ib) AS id_b, round(sim, 4) AS similarity
         |FROM tk WHERE sim >= 0.35
         |ORDER BY similarity DESC, id_a, id_b""".stripMargin,
    "d3_dedup_survivors" ->
      s"""WITH ${OracleCtes.memories},
         |${OracleText.dupPairsCte(0.35)}
         |SELECT id FROM memories WHERE id NOT IN (SELECT id_b FROM pr)
         |ORDER BY id""".stripMargin,
    "d4_similar_clusters" ->
      s"""WITH RECURSIVE ${OracleCtes.memories},
         |${OracleText.dupPairsCte(0.3)},
         |ed AS MATERIALIZED (
         |  SELECT id_a AS s, id_b AS t FROM pr
         |  UNION SELECT id_b, id_a FROM pr),
         |reach AS (
         |  SELECT s AS node, s AS r FROM ed
         |  UNION SELECT e.t, reach.r FROM reach JOIN ed e ON e.s = reach.node),
         |comp AS MATERIALIZED (SELECT node AS id, min(r) AS component FROM reach GROUP BY 1),
         |szd AS (SELECT component, count(*) AS csize FROM comp GROUP BY 1),
         |mem2 AS MATERIALIZED (
         |  SELECT c.id, c.component, z.csize FROM comp c JOIN szd z USING (component)
         |  WHERE z.csize >= 2),
         |sym AS (
         |  SELECT id_a AS id, id_b AS other, similarity FROM pr
         |  UNION ALL SELECT id_b, id_a, similarity FROM pr),
         |sc AS (
         |  SELECT m.id, m.component, m.csize,
         |    sum(CASE WHEN o.component = m.component AND y.similarity >= 0.3
         |        THEN 1 ELSE 0 END) AS similar_count
         |  FROM mem2 m LEFT JOIN sym y ON y.id = m.id
         |  LEFT JOIN mem2 o ON o.id = y.other
         |  GROUP BY 1, 2, 3),
         |tight AS MATERIALIZED (SELECT * FROM sc WHERE similar_count >= (csize - 1) / 2.0),
         |surv AS (
         |  SELECT component, count(*) AS fsize, min(id) AS cluster FROM tight
         |  GROUP BY 1 HAVING count(*) >= 2)
         |SELECT v.cluster, t.id FROM tight t JOIN surv v USING (component)
         |ORDER BY 1, 2""".stripMargin,
    "lsh_minhash_neardup" ->
      s"""WITH ${OracleText.shingleCte()},
         |${OracleText.minhashCtes},
         |cp AS MATERIALIZED (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM band a JOIN band b ON a.b = b.b AND a.key = b.key AND a.id < b.id)
         |SELECT * FROM (
         |  SELECT cp.id_a, cp.id_b,
         |    round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |      / len(list_distinct(x.sh || y.sh)), 6) AS jaccard
         |  FROM cp JOIN sh x ON cp.id_a = x.id JOIN sh y ON cp.id_b = y.id)
         |WHERE jaccard >= 0.2 ORDER BY id_a, id_b""".stripMargin,
    // the full MinHash pair SQL over the POST-CDC corpus: doc%50==25
    // deleted, doc%50==0 carrying the next doc's text (kept as-is at the
    // max-id edge where no next doc exists — the inner join drops that
    // update on the Spark side too), the %50==10 adds simply present
    "lsh_index_cdc" ->
      s"""WITH live AS MATERIALIZED (
         |  SELECT d.doc_id, coalesce(n.text, d.text) AS text
         |  FROM documents d
         |  LEFT JOIN documents n
         |    ON n.doc_id = d.doc_id + 1 AND d.doc_id % 50 = 0
         |  WHERE d.doc_id % 50 <> 25),
         |${OracleText.shingleCte(from = "live")},
         |${OracleText.minhashCtes},
         |cp AS MATERIALIZED (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM band a JOIN band b ON a.b = b.b AND a.key = b.key AND a.id < b.id)
         |SELECT * FROM (
         |  SELECT cp.id_a, cp.id_b,
         |    round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |      / len(list_distinct(x.sh || y.sh)), 6) AS jaccard
         |  FROM cp JOIN sh x ON cp.id_a = x.id JOIN sh y ON cp.id_b = y.id)
         |WHERE jaccard >= 0.2 ORDER BY id_a, id_b""".stripMargin,
    // the delete-survivor SQL verbatim: rewriting the touched shingle/band
    // partitions (compactBuckets) must be semantically invisible
    "lsh_index_compact" ->
      s"""WITH ${OracleText.shingleCte(where = "doc_id % 7 <> 3")},
         |${OracleText.minhashCtes},
         |cp AS MATERIALIZED (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM band a JOIN band b ON a.b = b.b AND a.key = b.key AND a.id < b.id)
         |SELECT * FROM (
         |  SELECT cp.id_a, cp.id_b,
         |    round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |      / len(list_distinct(x.sh || y.sh)), 6) AS jaccard
         |  FROM cp JOIN sh x ON cp.id_a = x.id JOIN sh y ON cp.id_b = y.id)
         |WHERE jaccard >= 0.2 ORDER BY id_a, id_b""".stripMargin,
    // the full-corpus pair SQL restricted to pairs whose greater side is
    // in the refresh batch (ids >= half): what incremental candidate
    // generation from the stored index must produce exactly
    "lsh_index_batch_pairs" ->
      s"""WITH ${OracleText.shingleCte()},
         |${OracleText.minhashCtes},
         |cp AS MATERIALIZED (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM band a JOIN band b ON a.b = b.b AND a.key = b.key AND a.id < b.id
         |  WHERE b.id >= (SELECT count(*) FROM documents) // 2)
         |SELECT * FROM (
         |  SELECT cp.id_a, cp.id_b,
         |    round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |      / len(list_distinct(x.sh || y.sh)), 6) AS jaccard
         |  FROM cp JOIN sh x ON cp.id_a = x.id JOIN sh y ON cp.id_b = y.id)
         |WHERE jaccard >= 0.2 ORDER BY id_a, id_b""".stripMargin,
    // lsh_minhash_neardup's SQL over the post-maintenance survivor set:
    // build+refresh+delete of the persisted index ≡ this full recompute
    "lsh_index_refresh" ->
      s"""WITH ${OracleText.shingleCte(where = "doc_id % 7 <> 3")},
         |${OracleText.minhashCtes},
         |cp AS MATERIALIZED (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM band a JOIN band b ON a.b = b.b AND a.key = b.key AND a.id < b.id)
         |SELECT * FROM (
         |  SELECT cp.id_a, cp.id_b,
         |    round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |      / len(list_distinct(x.sh || y.sh)), 6) AS jaccard
         |  FROM cp JOIN sh x ON cp.id_a = x.id JOIN sh y ON cp.id_b = y.id)
         |WHERE jaccard >= 0.2 ORDER BY id_a, id_b""".stripMargin,
    "lsh_jaccard_exact" ->
      s"""WITH ${OracleText.shingleCte()}
         |SELECT * FROM (
         |  SELECT a.id AS id_a, b.id AS id_b,
         |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / len(list_distinct(a.sh || b.sh)), 6) AS jaccard
         |  FROM sh a JOIN sh b ON a.id < b.id)
         |WHERE jaccard >= 0.2 ORDER BY id_a, id_b""".stripMargin,
    "sh_simhash_fp" ->
      s"""WITH ${OracleText.simhashCtes}
         |SELECT id, simhash FROM sfp ORDER BY id""".stripMargin,
    "sh_simhash_neardup" ->
      s"""WITH ${OracleText.simhashCtes}
         |SELECT * FROM (
         |  SELECT a.id AS id_a, b.id AS id_b,
         |    bit_count(xor(a.simhash, b.simhash)) AS hamming
         |  FROM sfp a JOIN sfp b ON a.id < b.id)
         |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,
    "ta_text_profile" -> OracleText.textProfileSql,
    "fp_winnowing" -> {
      val t = OracleText.toks("text")
      val hs = s"list_transform(range(1, len($t) - 1), i -> ${OracleText.polyHash(s"array_to_string(list_slice($t, i, i + 2), ' ')")})"
      s"""WITH wf AS MATERIALIZED (
         |  SELECT doc_id AS id,
         |    list_distinct(list_transform(range(1, len(hs) - 2), i -> list_min(list_slice(hs, i, i + 3)))) AS fp
         |  FROM (SELECT doc_id, $hs AS hs FROM documents WHERE len($t) >= 6))
         |SELECT w.id, u.h AS fp FROM wf w, unnest(w.fp) AS u(h) ORDER BY 1, 2""".stripMargin
    },
    "e1_embed_checksum" ->
      s"""WITH ${OracleText.embedCtes(64)}
         |SELECT id, round(list_sum(list_transform(range(1, 65), i -> e[i] * i)), 6) AS checksum
         |FROM ef ORDER BY id""".stripMargin,
    "ann_ivf_topk" -> ivfTopkSql,
    // the split is layout-only: results must equal the unsplit plan
    "ann_ivf_skew_split" -> ivfTopkSql,
    // two-level replay from first principles: level 1 verbatim from the
    // flat chain (cent/asg/probe = the nprobe1=2 rank), then sub-centroid
    // means per (cell, id-mod-fanout) — the % wrapped pmod-style so the
    // replay stays total even off the non-negative fixture domain — the
    // within-cell argmax re-assignment (csim DESC, l2_label tie), and the
    // bounded level-2 probe rank (qs DESC, ivf_cell, l2_label; rn <= 4),
    // mirroring TwoLevelIvf.{subCentroids,assignSub,probeTopK} exactly
    "ann_ivf_twolevel" -> ivfTwoLevelSql,
    // the PERSISTED two-level probe against the same replay: build ≡
    // compute (stored tables make both quantizer levels exact), so the
    // hash-match adjudicates the partition-pruned read end to end — the
    // ann_ivf_indexed precedent, on both keys
    "ann_twolevel_indexed" -> ivfTwoLevelSql,
    // built-half sub-centroids + full-corpus assignment: the hash-match
    // proves the O(batch) refresh equals a rebuild against the same
    // stored quantizer levels
    "ann_twolevel_refresh" -> ivfTwoLevelRefreshSql,
    // full-corpus two-level replay minus the deleted third: tombstone
    // maintenance must equal a survivor rebuild on both quantizer levels
    "ann_twolevel_delete" -> ivfTwoLevelDeleteSql,
    // full-corpus IVF SQL: the build+refresh split must reproduce it
    "ann_ivf_indexed" -> ivfTopkSql,
    // same full-corpus SQL: 4 generations of refresh must equal a rebuild
    "ann_ivf_multigen" -> ivfTopkSql,
    // reduced-corpus SQL: tombstone maintenance must equal a rebuild
    "ann_ivf_delete_refresh" -> ivfDeleteTopkSql,
    // same SQL: targeted compaction must be semantically invisible
    "ann_ivf_compact_cells" -> ivfDeleteTopkSql,
    // drift audit from first principles: recompute the argmax assignment
    // AND the assign-time similarity for every row in SQL, profile the
    // built half (the cellstats baseline) and the whole corpus (the live
    // state), and rebuild the report — growth, sim decay, retrain flag
    "ann_ivf_drift" -> {
      val csim = "list_sum(list_transform(range(1, 65), i -> CAST(m.embedding[i] AS DOUBLE) * c.centroid[i]))"
      s"""WITH ${OracleCtes.memories},
         |cent0 AS (
         |  SELECT label, t.i, avg(CAST(embedding[t.i] AS DOUBLE)) AS m
         |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
         |centn AS (SELECT label, sqrt(sum(m * m)) AS nrm FROM cent0 GROUP BY 1),
         |cent AS MATERIALIZED (
         |  SELECT c.label, list(c.m / n.nrm ORDER BY c.i) AS centroid
         |  FROM cent0 c JOIN centn n USING (label) GROUP BY c.label),
         |asgs AS MATERIALIZED (
         |  SELECT id, label AS ivf_cell, s AS csim FROM (
         |    SELECT m.id, c.label, $csim AS s,
         |      row_number() OVER (PARTITION BY m.id ORDER BY $csim DESC, c.label) AS rn
         |    FROM memories m, cent c) WHERE rn = 1),
         |built AS (
         |  SELECT ivf_cell, count(*) AS nb, round(avg(csim), 6) AS msb
         |  FROM asgs WHERE id < (SELECT count(*) FROM documents) // 2 GROUP BY 1),
         |nowt AS (
         |  SELECT ivf_cell, count(*) AS nn, round(avg(csim), 6) AS msn
         |  FROM asgs GROUP BY 1)
         |SELECT ivf_cell,
         |  CAST(coalesce(nb, 0) AS BIGINT) AS n_built,
         |  CAST(coalesce(nn, 0) AS BIGINT) AS n_now,
         |  coalesce(msb, 0.0) AS mean_sim_built,
         |  coalesce(msn, 0.0) AS mean_sim_now,
         |  round(coalesce(nn, 0) / CAST(greatest(coalesce(nb, 0), 1) AS DOUBLE), 6) AS growth,
         |  round(coalesce(msb, 0.0) - coalesce(msn, 0.0), 6) AS sim_drop,
         |  (round(coalesce(nn, 0) / CAST(greatest(coalesce(nb, 0), 1) AS DOUBLE), 6) > 2.0
         |   OR round(coalesce(msb, 0.0) - coalesce(msn, 0.0), 6) > 0.1) AS retrain
         |FROM built FULL JOIN nowt USING (ivf_cell)
         |ORDER BY ivf_cell""".stripMargin
    },
    // both map to the shared first-principles replay [[ivfRetrainSql]]:
    // ann_ivf_retrain drives audit -> collect -> retrainCells explicitly,
    // st_drift_retrain the streaming cadence trigger (retrainIfDrifted
    // inside refreshBatch) -- same live corpus, same adjudicating SQL
    "ann_ivf_retrain" -> ivfRetrainSql,
    "ann_ivf_retrain_split" -> ivfRetrainSplitSql,
    "st_drift_retrain" -> ivfRetrainSql,
    "ann_ivf_recall" ->
      s"""SELECT round(CAST(count(*) AS DOUBLE) / 10.0, 6) AS recall_at_10
         |FROM ($ivfTopkSql) i
         |JOIN (${retrievalOracles("r1_vector_topk")}) e ON i.id = e.id""".stripMargin,
    "tc_curation_survivors" ->
      s"""WITH ${OracleText.curationCtes()}
         |SELECT id, lang, quality, n_ws, n_bpe FROM csurv ORDER BY id""".stripMargin,
    "tc_curation_funnel" ->
      s"""WITH ${OracleText.curationCtes()}
         |SELECT (SELECT count(*) FROM cprof) AS n_profiled,
         |  (SELECT count(*) FROM ckeep) AS n_kept,
         |  (SELECT count(*) FROM cex) AS n_exact,
         |  (SELECT count(*) FROM cpairs) AS nd_pairs,
         |  (SELECT count(*) FROM csurv) AS n_survivors""".stripMargin,
    "tc_corpus_stats" ->
      s"""WITH ${OracleText.curationCtes()}
         |SELECT lang, count(*) AS n_docs, CAST(sum(n_ws) AS BIGINT) AS total_ws,
         |  round(sum(CAST(round(quality * 1000000) AS BIGINT)) / 1000000.0 / count(*), 6) AS avg_quality,
         |  round(CAST(sum(n_bpe) AS DOUBLE) / count(*), 6) AS avg_bpe
         |FROM cprof GROUP BY lang ORDER BY lang""".stripMargin,
    "tc_neardup_clusters" ->
      s"""WITH RECURSIVE ${OracleText.shingleCte()},
         |${OracleText.minhashCtes},
         |cp AS MATERIALIZED (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM band a JOIN band b ON a.b = b.b AND a.key = b.key AND a.id < b.id),
         |pr AS MATERIALIZED (
         |  SELECT id_a, id_b FROM (
         |    SELECT cp.id_a, cp.id_b,
         |      round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |        / len(list_distinct(x.sh || y.sh)), 6) AS jaccard
         |    FROM cp JOIN sh x ON cp.id_a = x.id JOIN sh y ON cp.id_b = y.id)
         |  WHERE jaccard >= 0.2),
         |ed AS (SELECT id_a AS s, id_b AS t FROM pr UNION SELECT id_b, id_a FROM pr),
         |reach AS (
         |  SELECT s AS node, s AS r FROM ed
         |  UNION SELECT e.t, reach.r FROM reach JOIN ed e ON e.s = reach.node)
         |SELECT min(r) AS cluster, node AS id FROM reach GROUP BY node
         |ORDER BY cluster, id""".stripMargin,
    "tc_contamination" ->
      s"""WITH ${OracleText.shingleCte()},
         |bsh AS MATERIALIZED (SELECT id AS bench_id, sh FROM sh WHERE id % 25 = 7)
         |SELECT s.id, b.bench_id,
         |  CAST(len(list_intersect(s.sh, b.sh)) AS BIGINT) AS n_shared
         |FROM sh s, bsh b
         |WHERE len(list_intersect(s.sh, b.sh)) >= 5
         |ORDER BY id, bench_id""".stripMargin,
    // exact intersection SQL — the bloom prefilter must be invisible in
    // the result (no false negatives; verify join kills false positives)
    "tc_bloom_decontam" ->
      s"""WITH ${OracleText.shingleCte()},
         |bsh AS MATERIALIZED (SELECT id AS bench_id, sh FROM sh WHERE id % 20 = 3)
         |SELECT s.id, b.bench_id,
         |  CAST(len(list_intersect(s.sh, b.sh)) AS BIGINT) AS n_shared
         |FROM sh s, bsh b
         |WHERE len(list_intersect(s.sh, b.sh)) >= 5
         |ORDER BY id, bench_id""".stripMargin,
    "tc_pii_scrub" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val phone = "\\+\\d{7,15}"
      s"""WITH base AS (
         |  SELECT doc_id AS id,
         |    CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' ||
         |      CAST(doc_id AS VARCHAR) || '@example.com on 10.1.2.' ||
         |      CAST(doc_id % 250 AS VARCHAR) || ' or +1555000' || CAST(doc_id AS VARCHAR)
         |    ELSE text END AS t
         |  FROM documents)
         |SELECT id,
         |  CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(t, '$ipv4')) AS BIGINT) AS n_ip,
         |  CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS n_phone,
         |  CAST(len(regexp_replace(regexp_replace(regexp_replace(t,
         |    '$email', '<EMAIL>', 'g'), '$ipv4', '<IP>', 'g'),
         |    '$phone', '<PHONE>', 'g')) AS BIGINT) AS clean_len
         |FROM base ORDER BY id""".stripMargin
    },
    "tc_repetition" -> {
      val tk = OracleText.toks("t")
      s"""WITH base AS MATERIALIZED (
         |  SELECT doc_id AS id,
         |    CASE WHEN doc_id % 5 = 0 THEN text || chr(10) || text ELSE text END AS t
         |  FROM documents),
         |dl AS (
         |  SELECT id, t,
         |    CASE WHEN len(ls) > 0
         |      THEN round(1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls), 6)
         |      ELSE 0.0 END AS dup_line_frac
         |  FROM (SELECT id, t,
         |    list_filter(string_split(t, chr(10)), l -> len(trim(l)) > 0) AS ls
         |    FROM base)),
         |bgx AS (
         |  SELECT id, len($tk) AS n,
         |    unnest(list_transform(range(1, len($tk)),
         |      i -> array_to_string(list_slice($tk, i, i + 1), ' '))) AS bg
         |  FROM base WHERE len($tk) >= 2),
         |cnt AS (SELECT id, n, bg, count(*) AS c FROM bgx GROUP BY 1, 2, 3),
         |top AS (SELECT id, round(2.0 * max(c) / n, 6) AS top_bigram_frac
         |  FROM cnt GROUP BY id, n)
         |SELECT d.id, d.dup_line_frac,
         |  coalesce(top.top_bigram_frac, 0.0) AS top_bigram_frac
         |FROM dl d LEFT JOIN top USING (id) ORDER BY id""".stripMargin
    },
    "tc_sample_quota" ->
      """SELECT doc_id AS id, source FROM documents
        |WHERE (doc_id * 1103515245 + 12345) % 2147483648
        |  < (CASE WHEN source LIKE 'src1%' THEN CAST('0.25' AS DOUBLE)
        |          WHEN source LIKE 'src%' THEN CAST('0.75' AS DOUBLE)
        |          ELSE 1.0 END) * 2147483648
        |ORDER BY id""".stripMargin,
    "ann_sq8_topk" -> annSq8TopkSql,
    "ann_ivfsq8_topk" -> annIvfSq8TopkSql,
    "tp_split_leakage" -> tpSplitLeakageSql,
    "ta_unigram_nll" -> {
      val t = OracleText.toks("text")
      s"""WITH uterm AS MATERIALIZED (
         |  SELECT doc_id AS id, t.term FROM documents, unnest($t) AS t(term)),
         |ustats AS MATERIALIZED (SELECT term, count(*) AS tf FROM uterm GROUP BY 1),
         |utot AS (SELECT CAST(sum(tf) AS BIGINT) AS total FROM ustats),
         |ulnp AS MATERIALIZED (
         |  SELECT term,
         |    CAST(round(ln(CAST(tf AS DOUBLE) / total) * 1e6, 0) AS BIGINT) AS lnp_micro
         |  FROM ustats, utot)
         |SELECT id, CAST(count(*) AS BIGINT) AS n_tok,
         |  round(-CAST(sum(lnp_micro) AS DOUBLE) / 1e6 / count(*), 6) AS nll
         |FROM uterm JOIN ulnp USING (term)
         |GROUP BY id ORDER BY id""".stripMargin
    },
    "sk_cms_heavy_terms" -> {
      val t = OracleText.toks("text")
      val hterm = OracleText.polyHash("term")
      val ab = graft.text.Sketches.A.zip(graft.text.Sketches.B).zipWithIndex
        .map { case ((a, b), d) => s"($d, CAST($a AS BIGINT), CAST($b AS BIGINT))" }
        .mkString(", ")
      val (p, w) = (graft.text.Sketches.P, graft.text.Sketches.Width)
      s"""WITH ctt AS MATERIALIZED (
         |  SELECT t.term, $hterm AS h FROM documents, unnest($t) AS t(term)),
         |cab AS (SELECT * FROM (VALUES $ab) x(d, a, b)),
         |ctruth AS MATERIALIZED (
         |  SELECT term, CAST(count(*) AS BIGINT) AS true_cnt, min(h) AS h
         |  FROM ctt GROUP BY 1 ORDER BY true_cnt DESC, term LIMIT 20),
         |ccms AS MATERIALIZED (
         |  SELECT cab.d, ((cab.a * ctt.h + cab.b) % $p) % $w AS cell,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM ctt CROSS JOIN cab GROUP BY 1, 2),
         |cest AS (
         |  SELECT tr.term, min(c.cnt) AS cms_est
         |  FROM ctruth tr CROSS JOIN cab
         |  JOIN ccms c ON c.d = cab.d
         |    AND c.cell = ((cab.a * tr.h + cab.b) % $p) % $w
         |  GROUP BY 1)
         |SELECT tr.term, tr.true_cnt, e.cms_est
         |FROM ctruth tr JOIN cest e USING (term)
         |ORDER BY tr.true_cnt DESC, tr.term""".stripMargin
    },
    "tc_paragraph_dedup" -> {
      val tp = OracleText.toks("para")
      s"""WITH pdoc AS (
         |  SELECT doc_id AS id,
         |    CASE WHEN doc_id % 7 = 0 THEN text || chr(10) || chr(10) || text
         |         ELSE text END AS t
         |  FROM documents),
         |psplit AS (
         |  SELECT id, list_filter(
         |    list_transform(string_split_regex(t, '\\n\\s*\\n'), p -> trim(p)),
         |    p -> len(p) > 0) AS ps
         |  FROM pdoc),
         |pp AS MATERIALIZED (
         |  SELECT id, CAST(u.i - 1 AS INT) AS pos, ps[u.i] AS para
         |  FROM psplit, unnest(range(1, len(ps) + 1)) u(i)),
         |pk AS (
         |  SELECT id, pos, para,
         |    row_number() OVER (
         |      PARTITION BY array_to_string($tp, ' ') ORDER BY id, pos) AS rn
         |  FROM pp)
         |SELECT id, CAST(count(*) AS BIGINT) AS n_kept,
         |  string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text
         |FROM pk WHERE rn = 1 GROUP BY id ORDER BY id""".stripMargin
    },
    "ta_bigram_nll" -> {
      val t = OracleText.toks("text")
      s"""WITH bbg AS MATERIALIZED (
         |  SELECT doc_id AS id,
         |    unnest(list_transform(range(1, len($t)),
         |      i -> array_to_string(list_slice($t, i, i + 1), ' '))) AS bg
         |  FROM documents WHERE len($t) >= 2),
         |bvoc AS (SELECT CAST(count(DISTINCT t.term) AS BIGINT) AS v
         |  FROM documents, unnest($t) AS t(term)),
         |bstats AS MATERIALIZED (SELECT bg, count(*) AS cbg FROM bbg GROUP BY 1),
         |bctx AS MATERIALIZED (
         |  SELECT string_split(bg, ' ')[1] AS ctx, CAST(sum(cbg) AS BIGINT) AS cctx
         |  FROM bstats GROUP BY 1),
         |blnp AS MATERIALIZED (
         |  SELECT s.bg,
         |    CAST(round(ln((s.cbg + CAST('0.1' AS DOUBLE)) /
         |      (c.cctx + CAST('0.1' AS DOUBLE) * bvoc.v)) * 1e6, 0) AS BIGINT) AS lnp_micro
         |  FROM bstats s JOIN bctx c ON string_split(s.bg, ' ')[1] = c.ctx, bvoc)
         |SELECT id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  round(-CAST(sum(lnp_micro) AS DOUBLE) / 1e6 / count(*), 6) AS nll
         |FROM bbg JOIN blnp USING (bg)
         |GROUP BY id ORDER BY id""".stripMargin
    },
    "ta_quality_nll_corr" -> {
      val t = OracleText.toks("text")
      s"""WITH qft AS MATERIALIZED (
         |  SELECT doc_id AS id, text, $t AS t FROM documents),
         |qfq AS MATERIALIZED (
         |  SELECT id, CAST(round(${OracleText.qualityExpr("text", "t")} * 1e6, 0) AS BIGINT) AS x
         |  FROM qft WHERE len(t) > 0),
         |qfu AS MATERIALIZED (
         |  SELECT id, t.term FROM qft, unnest(qft.t) AS t(term)),
         |qfs AS MATERIALIZED (SELECT term, count(*) AS tf FROM qfu GROUP BY 1),
         |qfl AS MATERIALIZED (
         |  SELECT term, CAST(round(ln(CAST(tf AS DOUBLE) /
         |    (SELECT CAST(sum(tf) AS BIGINT) FROM qfs)) * 1e6, 0) AS BIGINT) AS lnp_micro
         |  FROM qfs),
         |qfn AS MATERIALIZED (
         |  SELECT id, CAST(round(round(-CAST(sum(lnp_micro) AS DOUBLE) / 1e6 / count(*), 6) * 1e3, 0) AS BIGINT) AS y
         |  FROM qfu JOIN qfl USING (term) GROUP BY id),
         |qfa AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy
         |  FROM qfq JOIN qfn USING (id))
         |SELECT n_docs,
         |  round((CAST(n_docs AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
         |    sqrt((CAST(n_docs AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
         |         (CAST(n_docs AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr
         |FROM qfa""".stripMargin
    },
    "ta_trending_terms" -> {
      val t = OracleText.toks("m.text")
      s"""WITH ${OracleCtes.memories},
         |ttd AS MATERIALIZED (
         |  SELECT CAST(date_trunc('day', m.created_at) AS DATE) AS day, u.term
         |  FROM memories m, unnest($t) AS u(term)),
         |ttc AS MATERIALIZED (
         |  SELECT day, term, CAST(count(*) AS BIGINT) AS n FROM ttd GROUP BY 1, 2),
         |ttn AS (SELECT day, CAST(sum(n) AS BIGINT) AS dn FROM ttc GROUP BY 1),
         |ttg AS (SELECT term, CAST(sum(n) AS BIGINT) AS cn FROM ttc GROUP BY 1),
         |ttt AS (SELECT CAST(sum(n) AS BIGINT) AS ct FROM ttc),
         |ttr AS (
         |  SELECT c.day, c.term, c.n,
         |    round(CAST(c.n * t.ct AS DOUBLE) / (d.dn * g.cn), 6) AS lift
         |  FROM ttc c JOIN ttn d USING (day) JOIN ttg g USING (term), ttt t
         |  WHERE c.n >= 2),
         |ttk AS (SELECT *, row_number() OVER (PARTITION BY day
         |  ORDER BY lift DESC, term) AS rank FROM ttr)
         |SELECT day, CAST(rank AS INT) AS rank, term, n, lift
         |FROM ttk WHERE rank <= 3 ORDER BY day, rank""".stripMargin
    },
    "tk_fertility" -> {
      val t = OracleText.toks("text")
      s"""WITH ${OracleText.bpeCtes(6)},
         |wsz AS MATERIALIZED (
         |  SELECT w, len(list_filter(string_split(trim(s, chr(1)),
         |    chr(1)||chr(1)), x -> len(x) > 0)) AS ns
         |  FROM w6)
         |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(z.ns) AS BIGINT) AS n_pieces,
         |  round(CAST(sum(z.ns) AS DOUBLE) / count(*), 6) AS fertility
         |FROM documents d, unnest($t) AS u(term)
         |JOIN wsz z ON z.w = u.term
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "ta_kn_bigram_nll" -> {
      val t = OracleText.toks("text")
      val pc = "(coalesce(o.cont, 0) + 1.0) / (t.tt + kv.v + 1.0)"
      s"""WITH kbg AS MATERIALIZED (
         |  SELECT doc_id AS id, (source LIKE 'src1%') AS tr,
         |    unnest(list_transform(range(1, len($t)),
         |      i -> array_to_string(list_slice($t, i, i + 1), ' '))) AS bg
         |  FROM documents WHERE len($t) >= 2),
         |kdb AS MATERIALIZED (
         |  SELECT id, tr, bg, CAST(count(*) AS BIGINT) AS cnt
         |  FROM kbg GROUP BY 1, 2, 3),
         |kbs AS MATERIALIZED (
         |  SELECT bg, CAST(sum(cnt) AS BIGINT) AS cbg FROM kdb WHERE tr GROUP BY 1),
         |kcx AS MATERIALIZED (
         |  SELECT string_split(bg, ' ')[1] AS u, CAST(sum(cbg) AS BIGINT) AS cctx,
         |    CAST(count(*) AS BIGINT) AS n1ctx
         |  FROM kbs GROUP BY 1),
         |kct AS MATERIALIZED (
         |  SELECT string_split(bg, ' ')[2] AS w, CAST(count(*) AS BIGINT) AS cont
         |  FROM kbs GROUP BY 1),
         |ktt AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM kbs),
         |kv AS (SELECT CAST(count(DISTINCT u.term) AS BIGINT) AS v
         |  FROM documents, unnest($t) AS u(term) WHERE source LIKE 'src1%'),
         |klnp AS MATERIALIZED (
         |  SELECT d.bg, CAST(round(ln(
         |    CASE WHEN c.cctx IS NOT NULL THEN
         |      (greatest(coalesce(s.cbg, 0) - 0.75, 0.0)
         |        + 0.75 * c.n1ctx * ($pc)) / c.cctx
         |    ELSE $pc END) * 1e6, 0) AS BIGINT) AS lnp_micro
         |  FROM (SELECT DISTINCT bg FROM kdb) d
         |  LEFT JOIN kbs s USING (bg)
         |  LEFT JOIN kcx c ON string_split(d.bg, ' ')[1] = c.u
         |  LEFT JOIN kct o ON string_split(d.bg, ' ')[2] = o.w, ktt t, kv)
         |SELECT id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
         |  round(-CAST(sum(lnp_micro * cnt) AS DOUBLE) / 1e6 / sum(cnt), 6) AS nll
         |FROM kdb JOIN klnp USING (bg)
         |GROUP BY id ORDER BY id""".stripMargin
    },
    "tk_bpe_merges" -> {
      val sel = (0 until 6).map(i =>
        s"""SELECT CAST(${i + 1} AS INT) AS merge_rank, a AS left_sym,
           |  b AS right_sym, cnt AS pair_count FROM b$i""".stripMargin)
      "WITH " + OracleText.bpeCtes(6) + "\n" +
        sel.mkString(" UNION ALL ") + " ORDER BY merge_rank"
    },
    "tk_bpe_tokenize" -> {
      val t = OracleText.toks("text")
      s"""WITH ${OracleText.bpeCtes(6)},
         |wsz AS MATERIALIZED (
         |  SELECT w, len(list_filter(string_split(trim(s, chr(1)),
         |    chr(1)||chr(1)), x -> len(x) > 0)) AS ns
         |  FROM w6)
         |SELECT d.doc_id AS id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(z.ns) AS BIGINT) AS n_bpe
         |FROM documents d, unnest($t) AS t(term)
         |JOIN wsz z ON z.w = t.term
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "sk_hll_distinct" -> {
      val t = OracleText.toks("text")
      val h = OracleText.polyHash("t.term")
      val est = "(CAST('0.709' AS DOUBLE) * 64 * 64) / (s + (64 - n_buckets_used))"
      s"""WITH hterm0 AS (
         |  SELECT $h AS h0 FROM documents, unnest($t) AS t(term)),
         |hterm AS MATERIALIZED (
         |  SELECT (h0 * h0 + 1313131 * h0 + 777777) % 1000000007 AS h
         |  FROM hterm0),
         |hreg AS MATERIALIZED (
         |  SELECT h % 64 AS bucket,
         |    max(CASE WHEN h // 64 = 0 THEN 25
         |             ELSE 25 - length(bin(h // 64)) END) AS r
         |  FROM hterm GROUP BY 1),
         |hagg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_buckets_used,
         |    sum(pow(2.0, -r)) AS s
         |  FROM hreg),
         |htruth AS (
         |  SELECT CAST(count(DISTINCT t.term) AS BIGINT) AS true_distinct
         |  FROM documents, unnest($t) AS t(term))
         |SELECT true_distinct,
         |  round(CASE WHEN $est <= CAST('160.0' AS DOUBLE)
         |          AND (64 - n_buckets_used) > 0
         |        THEN 64.0 * ln(64.0 / (64 - n_buckets_used))
         |        ELSE $est END, 6) AS hll_est,
         |  n_buckets_used
         |FROM htruth, hagg""".stripMargin
    },
    "sk_hll_overlap" -> {
      val t = OracleText.toks("text")
      val h = OracleText.polyHash("t.term")
      def estSel(src: String, name: String) =
        s"""(SELECT round(CASE WHEN (CAST('0.709' AS DOUBLE) * 64 * 64) / (s + (64 - n_buckets_used)) <= CAST('160.0' AS DOUBLE)
           |    AND (64 - n_buckets_used) > 0
           |  THEN 64.0 * ln(64.0 / (64 - n_buckets_used))
           |  ELSE (CAST('0.709' AS DOUBLE) * 64 * 64) / (s + (64 - n_buckets_used)) END, 6)
           |  FROM (SELECT CAST(count(*) AS BIGINT) AS n_buckets_used,
           |    sum(pow(2.0, -r)) AS s FROM $src)) AS $name""".stripMargin
      s"""WITH vterm0 AS (
         |  SELECT (source LIKE 'src1%') AS a, $h AS h0
         |  FROM documents, unnest($t) AS t(term)),
         |vterm AS MATERIALIZED (
         |  SELECT a, (h0 * h0 + 1313131 * h0 + 777777) % 1000000007 AS h
         |  FROM vterm0),
         |vreg AS MATERIALIZED (
         |  SELECT a, h % 64 AS bucket,
         |    max(CASE WHEN h // 64 = 0 THEN 25
         |             ELSE 25 - length(bin(h // 64)) END) AS r
         |  FROM vterm GROUP BY 1, 2),
         |vuni AS (SELECT bucket, max(r) AS r FROM vreg GROUP BY 1),
         |vtruth AS (
         |  SELECT CAST(count(*) AS BIGINT) AS true_overlap FROM (
         |    SELECT DISTINCT t.term FROM documents, unnest($t) AS t(term)
         |    WHERE source LIKE 'src1%'
         |    INTERSECT
         |    SELECT DISTINCT t.term FROM documents, unnest($t) AS t(term)
         |    WHERE source NOT LIKE 'src1%'))
         |SELECT true_overlap, est_a, est_b, est_union,
         |  round(est_a + est_b - est_union, 6) AS overlap_est
         |FROM (SELECT true_overlap,
         |  ${estSel("(SELECT r FROM vreg WHERE a)", "est_a")},
         |  ${estSel("(SELECT r FROM vreg WHERE NOT a)", "est_b")},
         |  ${estSel("vuni", "est_union")}
         |FROM vtruth)""".stripMargin
    },
    "sk_hll_by_source" -> {
      val t = OracleText.toks("text")
      val h = OracleText.polyHash("t.term")
      val est = "(CAST('0.709' AS DOUBLE) * 64 * 64) / (s + (64 - n_buckets_used))"
      s"""WITH gterm0 AS (
         |  SELECT source, $h AS h0 FROM documents, unnest($t) AS t(term)),
         |gterm AS MATERIALIZED (
         |  SELECT source, (h0 * h0 + 1313131 * h0 + 777777) % 1000000007 AS h
         |  FROM gterm0),
         |greg AS MATERIALIZED (
         |  SELECT source, h % 64 AS bucket,
         |    max(CASE WHEN h // 64 = 0 THEN 25
         |             ELSE 25 - length(bin(h // 64)) END) AS r
         |  FROM gterm GROUP BY 1, 2),
         |gagg AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_buckets_used,
         |    sum(pow(2.0, -r)) AS s
         |  FROM greg GROUP BY 1),
         |gtruth AS (
         |  SELECT source, CAST(count(DISTINCT t.term) AS BIGINT) AS true_distinct
         |  FROM documents, unnest($t) AS t(term) GROUP BY 1)
         |SELECT g.source, true_distinct,
         |  round(CASE WHEN $est <= CAST('160.0' AS DOUBLE)
         |          AND (64 - n_buckets_used) > 0
         |        THEN 64.0 * ln(64.0 / (64 - n_buckets_used))
         |        ELSE $est END, 6) AS hll_est,
         |  n_buckets_used
         |FROM gtruth g JOIN gagg a ON g.source = a.source
         |ORDER BY g.source""".stripMargin
    },
    "ta_length_quantiles" -> {
      val t = OracleText.toks("text")
      def q(suffix: String) = Seq(50, 90, 99).map(p =>
        s"CAST(min(CASE WHEN cum >= ($p * n_docs + 99) // 100 THEN v END) AS BIGINT) AS p${p}_$suffix")
        .mkString(",\n|  ")
      s"""WITH lens AS MATERIALIZED (
         |  SELECT CAST(length(text) AS BIGINT) AS vc,
         |    CAST(len($t) AS BIGINT) AS vw FROM documents),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM lens),
         |cc AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum
         |  FROM (SELECT vc AS v, count(*) AS c FROM lens GROUP BY 1)),
         |cw AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum
         |  FROM (SELECT vw AS v, count(*) AS c FROM lens GROUP BY 1)),
         |qc AS (SELECT
         |  ${q("chars")}
         |  FROM cc, n),
         |qw AS (SELECT
         |  ${q("ws")}
         |  FROM cw, n)
         |SELECT n_docs, p50_chars, p90_chars, p99_chars, p50_ws, p90_ws, p99_ws
         |FROM n, qc, qw""".stripMargin
    },
    "ta_zipf_slope" -> {
      val t = OracleText.toks("text")
      // double arithmetic mirrors the Spark expression tree token-for-token
      val (n, sx, sy, sxy, sxx, syy) = (
        "CAST(n_terms AS DOUBLE)", "CAST(sx AS DOUBLE)", "CAST(sy AS DOUBLE)",
        "CAST(sxy AS DOUBLE)", "CAST(sxx AS DOUBLE)", "CAST(syy AS DOUBLE)")
      val cov = s"($n * $sxy - $sx * $sy)"
      val varx = s"($n * $sxx - $sx * $sx)"
      val vary = s"($n * $syy - $sy * $sy)"
      s"""WITH ztf AS MATERIALIZED (
         |  SELECT t.term, CAST(count(*) AS BIGINT) AS cnt
         |  FROM documents, unnest($t) AS t(term) GROUP BY 1
         |  ORDER BY cnt DESC, term LIMIT 1000),
         |zr AS (SELECT cnt,
         |  row_number() OVER (ORDER BY cnt DESC, term) AS rank FROM ztf),
         |zm AS (SELECT
         |  CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6, 0) AS BIGINT) AS x,
         |  CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e6, 0) AS BIGINT) AS y
         |  FROM zr),
         |za AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
         |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |  CAST(sum(x * y) AS BIGINT) AS sxy,
         |  CAST(sum(x * x) AS BIGINT) AS sxx,
         |  CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM zm)
         |SELECT n_terms,
         |  round($cov / $varx, 6) AS zipf_slope,
         |  round(($cov * $cov) / ($varx * $vary), 6) AS r2
         |FROM za""".stripMargin
    },
    "ta_vocab_growth" -> {
      val t = OracleText.toks("text")
      val bkt = "least(9, ((%s - lo) * 10) // (hi - lo + 1))"
      s"""WITH b AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
         |vdb AS (
         |  SELECT CAST(${bkt.format("doc_id")} AS INTEGER) AS bucket,
         |    CAST(count(*) AS BIGINT) AS n_docs
         |  FROM documents, b GROUP BY 1),
         |vft AS MATERIALIZED (
         |  SELECT t.term, min(doc_id) AS fid
         |  FROM documents, unnest($t) AS t(term) GROUP BY 1),
         |vtb AS (
         |  SELECT CAST(${bkt.format("fid")} AS INTEGER) AS bucket,
         |    CAST(count(*) AS BIGINT) AS new_terms
         |  FROM vft, b GROUP BY 1),
         |vj AS (
         |  SELECT coalesce(vdb.bucket, vtb.bucket) AS bucket,
         |    coalesce(n_docs, 0) AS n_docs,
         |    coalesce(new_terms, 0) AS new_terms
         |  FROM vdb FULL JOIN vtb ON vdb.bucket = vtb.bucket)
         |SELECT bucket,
         |  CAST(sum(n_docs) OVER (ORDER BY bucket) AS BIGINT) AS docs_cum,
         |  CAST(sum(new_terms) OVER (ORDER BY bucket) AS BIGINT) AS vocab_cum,
         |  new_terms
         |FROM vj ORDER BY bucket""".stripMargin
    },
    "ta_tfidf_keywords" -> {
      val t = OracleText.toks("text")
      s"""WITH kterm AS MATERIALIZED (
         |  SELECT doc_id AS id, t.term FROM documents, unnest($t) AS t(term)),
         |ktf AS MATERIALIZED (
         |  SELECT id, term, CAST(count(*) AS BIGINT) AS tf FROM kterm GROUP BY 1, 2),
         |kdf AS (SELECT term, count(*) AS df FROM ktf GROUP BY 1),
         |kn AS (SELECT count(*) AS n FROM documents),
         |ks AS (
         |  SELECT id, term, tf,
         |    round(CAST(tf AS DOUBLE) * ln(CAST(n AS DOUBLE) / df), 6) AS score
         |  FROM ktf JOIN kdf USING (term), kn),
         |kr AS (
         |  SELECT id, CAST(row_number() OVER (
         |      PARTITION BY id ORDER BY score DESC, term) AS INT) AS kw_rank,
         |    term, tf, score
         |  FROM ks)
         |SELECT id, kw_rank, term, tf, score FROM kr
         |WHERE kw_rank <= 3 ORDER BY id, kw_rank""".stripMargin
    },
    "tc_dsir_sample" -> {
      val t = OracleText.toks("text")
      val h = OracleText.polyHash("t.term")
      s"""WITH dso AS MATERIALIZED (
         |  SELECT doc_id AS id, (lang = 'en') AS is_t, $h % 1024 AS bucket
         |  FROM documents, unnest($t) AS t(term)),
         |dsc AS MATERIALIZED (
         |  SELECT id, is_t, bucket, CAST(count(*) AS BIGINT) AS cnt
         |  FROM dso GROUP BY 1, 2, 3),
         |dsr AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS c_raw FROM dsc GROUP BY 1),
         |dst AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS c_tgt FROM dsc WHERE is_t GROUP BY 1),
         |dsw AS (
         |  SELECT r.bucket, r.c_raw, COALESCE(t.c_tgt, 0) AS c_tgt
         |  FROM dsr r LEFT JOIN dst t USING (bucket)),
         |dstot AS (
         |  SELECT CAST(sum(c_raw) AS BIGINT) AS t_raw,
         |         CAST(sum(c_tgt) AS BIGINT) AS t_tgt FROM dsw),
         |dsm AS MATERIALIZED (
         |  SELECT bucket, CAST(round((
         |      ln((c_tgt + CAST('0.5' AS DOUBLE)) / (t_tgt + CAST('512.0' AS DOUBLE)))
         |    - ln((c_raw + CAST('0.5' AS DOUBLE)) / (t_raw + CAST('512.0' AS DOUBLE)))
         |    ) * 1e6, 0) AS BIGINT) AS w
         |  FROM dsw, dstot),
         |dss AS (
         |  SELECT id, CAST(sum(cnt) AS BIGINT) AS n_tok,
         |    round(CAST(sum(w * cnt) AS DOUBLE) / 1e6
         |      / CAST(sum(cnt) AS BIGINT), 6) AS dsir_score
         |  FROM dsc JOIN dsm USING (bucket) GROUP BY id)
         |SELECT id, n_tok, dsir_score,
         |  dsir_score >= CAST('0.0' AS DOUBLE) AS kept
         |FROM dss ORDER BY id""".stripMargin
    },
    "tc_c4_filters" ->
      s"""WITH ${OracleText.c4Ctes()}
         |SELECT id, len(lines) AS n_lines, len(kept) AS n_kept,
         |  array_to_string(kept, chr(10)) AS text
         |FROM c4kept
         |WHERE NOT contains(lower(text), 'lorem ipsum')
         |  AND NOT contains(text, '{')
         |  AND len(kept) >= 3
         |ORDER BY id""".stripMargin,
    "tc_c4_funnel" ->
      s"""WITH ${OracleText.c4Ctes()},
         |c4f AS (
         |  SELECT contains(lower(text), 'lorem ipsum') AS lorem,
         |         contains(text, '{') AS brace,
         |         len(lines) AS nl, len(kept) AS nk
         |  FROM c4kept)
         |SELECT count(*) AS n_docs,
         |  CAST(coalesce(sum(CASE WHEN lorem THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dropped_lorem,
         |  CAST(coalesce(sum(CASE WHEN NOT lorem AND brace THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dropped_brace,
         |  CAST(coalesce(sum(CASE WHEN NOT lorem AND NOT brace AND nk < 3 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dropped_short,
         |  CAST(coalesce(sum(CASE WHEN NOT lorem AND NOT brace AND nk >= 3 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_survivors,
         |  CAST(coalesce(sum(nl), 0) AS BIGINT) AS n_lines_total,
         |  CAST(coalesce(sum(nk), 0) AS BIGINT) AS n_kept_total
         |FROM c4f""".stripMargin,
    "tc_repeated_spans" -> {
      val t = OracleText.toks("text")
      val hs = s"list_transform(range(1, len($t) - 1), i -> ${OracleText.polyHash(s"array_to_string(list_slice($t, i, i + 2), ' ')")})"
      s"""WITH wsh AS MATERIALIZED (
         |  SELECT doc_id AS id, hs AS h
         |  FROM (SELECT doc_id, $hs AS hs FROM documents WHERE len($t) >= 6)),
         |wpos AS MATERIALIZED (
         |  SELECT id, h, unnest(list_distinct(
         |    list_transform(range(0, len(h) - 3), j ->
         |      list_max(list_filter(range(j, j + 4),
         |        p -> h[p + 1] = list_min(h[j+1:j+4])))))) AS pos
         |  FROM wsh),
         |wfp AS MATERIALIZED (
         |  SELECT id, CAST(pos AS BIGINT) AS pos, h[pos + 1] AS fp FROM wpos),
         |wshare AS (SELECT fp FROM wfp GROUP BY fp HAVING count(DISTINCT id) >= 2),
         |whit AS (SELECT id, pos FROM wfp WHERE fp IN (SELECT fp FROM wshare)),
         |wisl AS (
         |  SELECT id, pos,
         |    CASE WHEN max(pos + 3) OVER (PARTITION BY id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         |      OR pos > max(pos + 3) OVER (PARTITION BY id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      THEN 1 ELSE 0 END AS newf
         |  FROM whit),
         |wisl2 AS (SELECT id, pos, sum(newf) OVER (PARTITION BY id ORDER BY pos
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM wisl),
         |wspans AS (SELECT id, island, min(pos) AS s, max(pos + 3) AS e
         |  FROM wisl2 GROUP BY 1, 2)
         |SELECT id, CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(e - s) AS BIGINT) AS dup_tokens
         |FROM wspans GROUP BY id ORDER BY id""".stripMargin
    },
    "tc_exact_spans" -> {
      val t = OracleText.toks("text")
      s"""WITH gtk AS MATERIALIZED (
         |  SELECT doc_id AS id, $t AS t FROM documents WHERE len($t) >= 8),
         |gr AS MATERIALIZED (
         |  SELECT id, CAST(u.p AS BIGINT) AS pos,
         |    array_to_string(t[u.p + 1:u.p + 8], ' ') AS gram
         |  FROM gtk, unnest(range(0, len(t) - 7)) u(p)),
         |gshare AS (SELECT gram FROM gr GROUP BY gram HAVING count(DISTINCT id) >= 2),
         |ghit AS (SELECT id, pos FROM gr WHERE gram IN (SELECT gram FROM gshare)),
         |gisl AS (
         |  SELECT id, pos,
         |    CASE WHEN max(pos + 8) OVER (PARTITION BY id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         |      OR pos > max(pos + 8) OVER (PARTITION BY id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      THEN 1 ELSE 0 END AS newf
         |  FROM ghit),
         |gisl2 AS (SELECT id, pos, sum(newf) OVER (PARTITION BY id ORDER BY pos
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM gisl),
         |gspans AS (SELECT id, island, min(pos) AS s, max(pos + 8) AS e
         |  FROM gisl2 GROUP BY 1, 2)
         |SELECT id, CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(e - s) AS BIGINT) AS dup_tokens
         |FROM gspans GROUP BY id ORDER BY id""".stripMargin
    },
    // deliberately the full-batch SQL: the increment must reproduce it
    "tc_curation_incremental" ->
      s"""WITH ${OracleText.curationCtes()}
         |SELECT id, lang, quality, n_ws, n_bpe FROM csurv ORDER BY id""".stripMargin,
    "qm_features" -> {
      val t = OracleText.toks("text")
      val stops = TextAnalysis.Profiles.head._2.map(s => s"'$s'").mkString("[", ", ", "]")
      s"""SELECT doc_id AS id,
         |  round(least(len(t) / 100.0, 1.0), 6) AS f_len_sat,
         |  round(CAST(len(list_filter(t, x -> list_contains($stops, x))) AS DOUBLE) / nz, 6) AS f_stop_ratio,
         |  round(CAST(len(list_distinct(t)) AS DOUBLE) / nz, 6) AS f_unique_ratio,
         |  round(CAST(len(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / greatest(len(text), 1), 6) AS f_digit_ratio,
         |  round(CAST(len(text) AS DOUBLE) / nz, 6) AS f_chars_per_token
         |FROM (SELECT doc_id, text, $t AS t, greatest(len($t), 1) AS nz FROM documents)
         |ORDER BY id""".stripMargin
    },
    // batch-mode streaming gate: exact layer keeps min id per normalized
    // text; near-dup layer drops rows within hamming<=3 of any corpus
    // (id%3=0) fingerprint — pigeonhole chunk join == plain hamming<=3
    "sd_admit_batch" ->
      s"""WITH ${OracleText.simhashCtes},
         |inc AS MATERIALIZED (
         |  SELECT d.doc_id AS id, d.text,
         |    array_to_string(${OracleText.toks("d.text")}, ' ') AS norm, s.simhash
         |  FROM documents d LEFT JOIN sfp s ON d.doc_id = s.id
         |  WHERE d.doc_id % 3 <> 0),
         |keep AS (SELECT min(id) AS id FROM inc GROUP BY norm)
         |SELECT i.id, i.text FROM inc i JOIN keep k ON i.id = k.id
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM sfp c WHERE c.id % 3 = 0 AND i.simhash IS NOT NULL
         |    AND bit_count(xor(i.simhash, c.simhash)) <= 3)
         |ORDER BY i.id""".stripMargin,
    "ann_sq8_rerank" ->
      s"""WITH ${OracleCtes.memories},
         |${OracleCtes.sq8Ctes()},
         |cand AS (SELECT id FROM sq8 ORDER BY qscore DESC, id LIMIT 50),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT m.id, round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) AS sim
         |FROM memories m JOIN cand USING (id), q
         |ORDER BY sim DESC, id LIMIT 10""".stripMargin,
    "ann_sq8_recall" ->
      s"""SELECT round(CAST(count(*) AS DOUBLE) / 10.0, 6) AS recall_at_10
         |FROM ($annSq8TopkSql) a
         |JOIN (${retrievalOracles("r1_vector_topk")}) e ON a.id = e.id""".stripMargin,
    "tp_pack_sequences" ->
      s"""WITH ptok AS (
         |  SELECT doc_id AS id,
         |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tok
         |  FROM documents),
         |poff AS (
         |  SELECT id, n_tok,
         |    CAST(sum(n_tok) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS BIGINT) AS st
         |  FROM ptok),
         |pspan AS (
         |  SELECT id, st, n_tok,
         |    unnest(generate_series(st // 512, (st + n_tok - 1) // 512)) AS seq_id
         |  FROM poff WHERE n_tok > 0)
         |SELECT seq_id, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(least(st + n_tok, (seq_id + 1) * 512) - greatest(st, seq_id * 512)) AS BIGINT) AS n_tokens,
         |  min(id) AS first_doc, max(id) AS last_doc
         |FROM pspan GROUP BY 1 ORDER BY seq_id""".stripMargin,
    "tp_mixture_plan" -> {
      val sumW = MixtureTargets.map(_._2).sum.toDouble // short literal, exact
      s"""WITH $mixtureReqCtes
         |SELECT domain, tokens,
         |  round(CAST(tokens AS DOUBLE) / total, 6) AS natural_share,
         |  round(CAST(w AS DOUBLE) / $sumW, 6) AS target_share,
         |  required_tokens,
         |  round(CAST(required_tokens AS DOUBLE) / tokens, 6) AS sample_rate,
         |  CAST(ceil(CAST(required_tokens AS DOUBLE) / tokens) AS INT) AS epochs
         |FROM req2 ORDER BY domain""".stripMargin
    },
    "tp_mixture_apply" ->
      s"""WITH $mixtureReqCtes,
         |rates AS (SELECT domain, round(CAST(required_tokens AS DOUBLE) / tokens, 6) AS rate FROM req2),
         |cnt AS (
         |  SELECT d.doc_id AS id, d.lang AS domain,
         |    CAST(floor(r.rate) AS BIGINT) +
         |      CASE WHEN (d.doc_id * 1103515245 + 12345) % 2147483648
         |           < (r.rate - floor(r.rate)) * 2147483648 THEN 1 ELSE 0 END AS n
         |  FROM documents d JOIN rates r ON d.lang = r.domain)
         |SELECT id, domain, CAST(u.c AS BIGINT) AS copy
         |FROM cnt, unnest(range(0, n)) u(c)
         |ORDER BY id, copy""".stripMargin,
    "tp_shuffle_shards" ->
      """WITH sk AS (
        |  SELECT doc_id AS id,
        |    (doc_id * 1103515245 + 12345) % 2147483648 AS k
        |  FROM documents)
        |SELECT id, CAST(k % 64 AS INT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY k % 64 ORDER BY k, id) - 1 AS BIGINT) AS pos
        |FROM sk ORDER BY id""".stripMargin
  )

  /** Shared mixture-plan CTE prefix (pd/tot/tg/req/req2) — per-domain token
    * mass, targets, budget, required_tokens. */
  private def mixtureReqCtes: String = {
    val vals = MixtureTargets
      .map { case (d, w) => s"('$d', CAST($w AS BIGINT))" }.mkString(", ")
    val sumW = MixtureTargets.map(_._2).sum.toDouble
    s"""pd AS (
       |  SELECT lang AS domain,
       |    CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS tokens
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total FROM pd),
       |tg AS (SELECT * FROM (VALUES $vals) t(domain, w)),
       |req AS (
       |  SELECT pd.domain, pd.tokens, t.total,
       |    coalesce(tg.w, CAST(0 AS BIGINT)) AS w,
       |    CAST(floor(CAST(t.total AS DOUBLE) * 0.5) AS BIGINT) AS budget
       |  FROM pd CROSS JOIN tot t LEFT JOIN tg USING (domain)),
       |req2 AS (
       |  SELECT *, CAST(floor(CAST(budget AS DOUBLE) * w / $sumW) AS BIGINT) AS required_tokens
       |  FROM req)""".stripMargin
  }

  // def, not val: referenced during dedupOracles' initialization above
  private def annSq8TopkSql: String =
    s"""WITH ${OracleCtes.memories},
       |${OracleCtes.sq8Ctes()}
       |SELECT id, qscore FROM sq8 ORDER BY qscore DESC, id LIMIT 10""".stripMargin

  private def annIvfSq8TopkSql: String =
    s"""WITH ${OracleCtes.memories},
       |$ivfCtes,
       |pool AS MATERIALIZED (
       |  SELECT m.id, a.ivf_cell, m.embedding FROM memories m
       |  JOIN asg a ON m.id = a.id
       |  JOIN probe p ON a.ivf_cell = p.label),
       |${OracleCtes.sq8Ctes(from = "pool")},
       |cand AS (SELECT id FROM sq8 ORDER BY qscore DESC, id LIMIT 50),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
       |SELECT po.id, po.ivf_cell,
       |  round(${OracleCtes.dot64("po.embedding", "q.qv")}, 6) AS sim
       |FROM pool po JOIN cand USING (id), q
       |ORDER BY sim DESC, po.id LIMIT 10""".stripMargin

  private def tpSplitLeakageSql: String =
    s"""WITH ${OracleText.shingleCte()},
       |${OracleText.minhashCtes},
       |cp AS MATERIALIZED (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM band a JOIN band b ON a.b = b.b AND a.key = b.key AND a.id < b.id),
       |lpairs AS (
       |  SELECT * FROM (
       |    SELECT cp.id_a, cp.id_b,
       |      round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
       |        / len(list_distinct(x.sh || y.sh)), 6) AS jaccard
       |    FROM cp JOIN sh x ON cp.id_a = x.id JOIN sh y ON cp.id_b = y.id)
       |  WHERE jaccard >= 0.2),
       |flags AS (
       |  SELECT doc_id AS id,
       |    (doc_id * 1103515245 + 12345) % 2147483648
       |      < CAST('0.2' AS DOUBLE) * 2147483648 AS v
       |  FROM documents)
       |SELECT CASE WHEN fa.v THEN p.id_a ELSE p.id_b END AS val_id,
       |  CASE WHEN fa.v THEN p.id_b ELSE p.id_a END AS train_id, p.jaccard
       |FROM lpairs p
       |JOIN flags fa ON p.id_a = fa.id
       |JOIN flags fb ON p.id_b = fb.id
       |WHERE fa.v <> fb.v ORDER BY val_id, train_id""".stripMargin


  val all: Map[String, Q] =
    retrievalQueries ++ sanityQueries ++ dedupQueries ++ QueriesOps.queries ++ QueriesExt.queries ++ QueriesJoins.queries ++ QueriesScale.queries ++ QueriesEval.queries ++ QueriesTiers.queries

  val oracles: Map[String, String] =
    retrievalOracles ++ sanityOracles ++ dedupOracles ++ QueriesOps.oracles ++ QueriesExt.oracles ++ QueriesJoins.oracles ++ QueriesScale.oracles ++ QueriesEval.oracles ++ QueriesTiers.oracles
}
