package graft

import org.apache.spark.sql.functions._
import graft.core.{Corpus, OracleCtes, OracleHybrid, OracleText, Tables}
import graft.dedup.{Consolidation, Dedup}
import graft.functions.DecayFunctions
import graft.multimodal.Multimodal
import graft.search.{HybridSearch, VectorSearch}
import graft.sources.{Chunker, NdJson, Store}
import graft.streaming.EventStream

/** Registry section 3: novelty/consolidation/prune, explain, streaming
  * transforms (batch-validated), multimodal plumbing, and the chunker. */
object QueriesExt {

  import Queries.Q

  /** Shared oracle CTE chain for D5/D6: bounded corpus -> top-5-neighbor
    * pairs at the consolidation threshold -> components -> tighten ->
    * surviving clusters (tight, surv). */
  private lazy val consolidationCtes: String =
    s"""WITH RECURSIVE ${OracleCtes.memories},
       |bounded AS MATERIALIZED (SELECT * FROM memories
       |  ORDER BY ${graft.functions.SparkHash.spreadSql("id")}, id LIMIT 500),
       |pr AS MATERIALIZED (
       |  SELECT DISTINCT least(ia, ib) AS id_a, greatest(ia, ib) AS id_b, round(sim, 4) AS similarity
       |  FROM (
       |    SELECT ia, ib, sim, row_number() OVER (PARTITION BY ia ORDER BY sim DESC, ib) AS rn
       |    FROM (
       |      SELECT a.id AS ia, b.id AS ib,
       |        round(${OracleCtes.dot64("a.embedding", "b.embedding")}, 6) AS sim
       |      FROM bounded a JOIN bounded b ON a.id <> b.id))
       |  WHERE rn <= 5 AND sim >= 0.32
       |),
       |ed AS MATERIALIZED (
       |  SELECT id_a AS s, id_b AS t FROM pr UNION SELECT id_b, id_a FROM pr),
       |reach AS (
       |  SELECT s AS node, s AS r FROM ed
       |  UNION SELECT e.t, reach.r FROM reach JOIN ed e ON e.s = reach.node),
       |comp AS MATERIALIZED (SELECT node AS id, min(r) AS component FROM reach GROUP BY 1),
       |szd AS (SELECT component, count(*) AS csize FROM comp GROUP BY 1),
       |mem2 AS MATERIALIZED (
       |  SELECT c.id, c.component, z.csize FROM comp c JOIN szd z USING (component)
       |  WHERE z.csize >= 3),
       |sym AS (
       |  SELECT id_a AS id, id_b AS other, similarity FROM pr
       |  UNION ALL SELECT id_b, id_a, similarity FROM pr),
       |sc AS (
       |  SELECT m.id, m.component, m.csize,
       |    sum(CASE WHEN o.component = m.component AND y.similarity >= 0.32
       |        THEN 1 ELSE 0 END) AS similar_count
       |  FROM mem2 m LEFT JOIN sym y ON y.id = m.id
       |  LEFT JOIN mem2 o ON o.id = y.other
       |  GROUP BY 1, 2, 3),
       |tight AS MATERIALIZED (SELECT * FROM sc WHERE similar_count >= (csize - 1) / 2.0),
       |surv AS (
       |  SELECT component, count(*) AS fsize, min(id) AS cluster FROM tight
       |  GROUP BY 1 HAVING count(*) >= 3)""".stripMargin

  /** The probed-vs-exact recall replay, one rung per nprobe sharing the
    * centroid/assignment/exact-leg CTEs — `ev_ivf_recall` is the
    * single-rung form, `ev_ivf_recall_sweep` the operator-facing curve. */
  private def ivfRecallSweepSql(nprobes: Seq[Int]): String = {
    def cdot(v: String) =
      s"list_sum(list_transform(range(1, 65), i -> CAST($v[i] AS DOUBLE) * c.centroid[i]))"
    val exSim = s"round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6)"
    val rungs = nprobes.map { np =>
      s"""probeq$np AS MATERIALIZED (
         |  SELECT qid, label FROM (
         |    SELECT q.qid, c.label, row_number() OVER (PARTITION BY q.qid ORDER BY
         |      ${cdot("q.qv")} DESC, c.label) AS rn
         |    FROM qs q, cent c) WHERE rn <= $np),
         |ix$np AS MATERIALIZED (
         |  SELECT qid, id FROM (
         |    SELECT q.qid, m.id,
         |      row_number() OVER (PARTITION BY q.qid ORDER BY $exSim DESC, m.id) AS rn
         |    FROM qs q JOIN probeq$np p ON p.qid = q.qid
         |    JOIN asgm a ON a.ivf_cell = p.label
         |    JOIN memories m ON m.id = a.id) WHERE rn <= 10),
         |hits$np AS (SELECT qid, count(*) AS h FROM ex JOIN ix$np USING (qid, id) GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val selects = nprobes.map { np =>
      s"""SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(10 AS BIGINT) AS k, CAST($np AS BIGINT) AS nprobe,
         |  CAST(sum(ne) AS BIGINT) AS n_exact,
         |  CAST(coalesce(sum(h), 0) AS BIGINT) AS n_hits,
         |  CAST(coalesce((2 * 1000000 * coalesce(sum(h), 0) + sum(ne)) // (2 * sum(ne)), 0) AS BIGINT) AS recall_ppm
         |FROM exn LEFT JOIN hits$np USING (qid)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${OracleCtes.memories},
       |${Queries.centCtes},
       |qs AS MATERIALIZED (
       |  SELECT id AS qid, embedding AS qv FROM memories
       |  WHERE id % ${graft.eval.RetrievalEval.SampleMod} = 0
       |  ORDER BY ${graft.functions.SparkHash.spreadSql("qid")}, qid LIMIT ${graft.eval.RetrievalEval.MaxQueries}),
       |asgm AS MATERIALIZED (
       |  SELECT id, label AS ivf_cell FROM (
       |    SELECT m.id, c.label, row_number() OVER (PARTITION BY m.id ORDER BY
       |      ${cdot("m.embedding")} DESC, c.label) AS rn
       |    FROM memories m, cent c) WHERE rn = 1),
       |ex AS MATERIALIZED (
       |  SELECT qid, id FROM (
       |    SELECT q.qid, m.id,
       |      row_number() OVER (PARTITION BY q.qid ORDER BY $exSim DESC, m.id) AS rn
       |    FROM memories m, qs q) WHERE rn <= 10),
       |exn AS (SELECT qid, count(*) AS ne FROM ex GROUP BY 1),
       |$rungs
       |SELECT * FROM (
       |$selects
       |) ORDER BY nprobe""".stripMargin
  }

  /** Oracle for [[graft.eval.RetrievalEval.twoLevelRecallSweep]]: the flat
    * sweep's protocol head (the qs sample, a level-1 assignment CTE named
    * `asg`, the shared exact leg) plus the shared two-level CTE chain
    * ([[Queries.twoLevelCtesOver]]), then per rung: the per-qid level-1
    * rank (rn <= np1), the per-qid level-2 rank over ONLY the survivors'
    * sub-cells (qs DESC, ivf_cell, l2_label; rn <= np2), the probed
    * top-10 through asg2's (cell, sub-cell) pairs, and the overlap count
    * — recall_ppm by the same half-up integer formula as the Scala
    * side. */
  private def twoLevelRecallSweepSql(rungs: Seq[(Int, Int)]): String = {
    def cdot(v: String) =
      s"list_sum(list_transform(range(1, 65), i -> CAST($v[i] AS DOUBLE) * c.centroid[i]))"
    def sdot(v: String) =
      s"list_sum(list_transform(range(1, 65), i -> CAST($v[i] AS DOUBLE) * s.centroid[i]))"
    val exSim = s"round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6)"
    val rungCtes = rungs.map { case (np1, np2) =>
      val t = s"${np1}_$np2"
      s"""p1q$t AS MATERIALIZED (
         |  SELECT qid, label FROM (
         |    SELECT q.qid, c.label, row_number() OVER (PARTITION BY q.qid ORDER BY
         |      ${cdot("q.qv")} DESC, c.label) AS rn
         |    FROM qs q, cent c) WHERE rn <= $np1),
         |p2q$t AS MATERIALIZED (
         |  SELECT qid, ivf_cell, l2_cell FROM (
         |    SELECT q.qid, s.ivf_cell, s.l2_label AS l2_cell, row_number() OVER (PARTITION BY q.qid ORDER BY
         |      ${sdot("q.qv")} DESC, s.ivf_cell, s.l2_label) AS rn
         |    FROM qs q JOIN p1q$t p ON p.qid = q.qid
         |    JOIN subc s ON s.ivf_cell = p.label) WHERE rn <= $np2),
         |ix$t AS MATERIALIZED (
         |  SELECT qid, id FROM (
         |    SELECT q.qid, m.id,
         |      row_number() OVER (PARTITION BY q.qid ORDER BY $exSim DESC, m.id) AS rn
         |    FROM qs q JOIN p2q$t p ON p.qid = q.qid
         |    JOIN asg2 a ON a.ivf_cell = p.ivf_cell AND a.l2_cell = p.l2_cell
         |    JOIN memories m ON m.id = a.id) WHERE rn <= 10),
         |hits$t AS (SELECT qid, count(*) AS h FROM ex JOIN ix$t USING (qid, id) GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val selects = rungs.map { case (np1, np2) =>
      val t = s"${np1}_$np2"
      s"""SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(10 AS BIGINT) AS k, CAST($np1 AS BIGINT) AS nprobe1,
         |  CAST($np2 AS BIGINT) AS nprobe2,
         |  CAST(sum(ne) AS BIGINT) AS n_exact,
         |  CAST(coalesce(sum(h), 0) AS BIGINT) AS n_hits,
         |  CAST(coalesce((2 * 1000000 * coalesce(sum(h), 0) + sum(ne)) // (2 * sum(ne)), 0) AS BIGINT) AS recall_ppm
         |FROM exn LEFT JOIN hits$t USING (qid)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${OracleCtes.memories},
       |${Queries.centCtes},
       |qs AS MATERIALIZED (
       |  SELECT id AS qid, embedding AS qv FROM memories
       |  WHERE id % ${graft.eval.RetrievalEval.SampleMod} = 0
       |  ORDER BY ${graft.functions.SparkHash.spreadSql("qid")}, qid LIMIT ${graft.eval.RetrievalEval.MaxQueries}),
       |asg AS MATERIALIZED (
       |  SELECT id, label AS ivf_cell FROM (
       |    SELECT m.id, c.label, row_number() OVER (PARTITION BY m.id ORDER BY
       |      ${cdot("m.embedding")} DESC, c.label) AS rn
       |    FROM memories m, cent c) WHERE rn = 1),
       |${Queries.twoLevelCtesOver("asg")},
       |ex AS MATERIALIZED (
       |  SELECT qid, id FROM (
       |    SELECT q.qid, m.id,
       |      row_number() OVER (PARTITION BY q.qid ORDER BY $exSim DESC, m.id) AS rn
       |    FROM memories m, qs q) WHERE rn <= 10),
       |exn AS (SELECT qid, count(*) AS ne FROM ex GROUP BY 1),
       |$rungCtes
       |SELECT * FROM (
       |$selects
       |) ORDER BY nprobe1, nprobe2""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "d1_novelty" -> ((s, dir) =>
      VectorSearch.novelty(Corpus.memories(s, dir), Queries.queryVec(s, dir))
        .select("id", "sim", "is_novel")),
    "d5_consolidation_clusters" -> ((s, dir) =>
      Consolidation.consolidationClusters(Corpus.memories(s, dir), threshold = 0.32)),
    // D6 application step: deterministic stand-in for the out-of-scope LLM
    // text (merged:<cluster>) — exercises the archive-olds/add-merged write
    // shape (consolidator.py:202-218) end to end. consolidated_from is
    // emitted as a sorted comma-joined STRING: the compare driver sorts
    // result columns with pandas, which cannot hash an array cell
    // (round-3 ADVICE #2 — the array output made this query unverifiable)
    "d6_apply_consolidation" -> ((s, dir) => {
      val clusters = Consolidation.consolidationClusters(
        Corpus.memories(s, dir), threshold = 0.32)
      val merged = clusters.select("cluster").distinct()
        .withColumn("merged_text", concat(lit("merged:"), col("cluster")))
      Consolidation.applyConsolidation(clusters, merged, maxId = 100000L)
        .withColumn("consolidated_from",
          concat_ws(",", col("consolidated_from").cast("array<string>")))
        .orderBy("id")
    }),
    "d7_prune_candidates" -> ((s, dir) =>
      Consolidation.pruneCandidates(
        Corpus.memories(s, dir), Corpus.retrievalLog(s, dir),
        DecayFunctions.RefNowEpoch)),
    "r14_explain" -> ((s, dir) =>
      HybridSearch.explain(
        Corpus.memories(s, dir), Some(Corpus.searchFeedback(s, dir)),
        Queries.hybridParams(s, dir))),
    // exercises the filtered_by_source count and the graph/PPR params branch
    "r14_explain_graph" -> ((s, dir) =>
      HybridSearch.explain(
        Corpus.memories(s, dir), Some(Corpus.searchFeedback(s, dir)),
        Queries.hybridParams(s, dir, graphWeight = 0.1)
          .copy(sourcePrefix = Some("src1")))),
    // explain from the persisted indexes, with the hardest param mix
    // (source prefix → the filtered_by_source count reads BM25Index
    // scores; graph weights → the PPR params branch): the labeled
    // contribution rows adjudicate each indexed leg's RANKS, not just the
    // fused top-k
    "r14_explain_indexed" -> ((s, dir) => {
      val bm25Path = s"${sys.props("java.io.tmpdir")}/graft_xhyb_bm25_${ProcessHandle.current().pid()}"
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_xhyb_ivf_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(bm25Path); Queries.reapAtExit(ivfPath)
      val mem = Corpus.memories(s, dir)
      graft.search.BM25Index.build(mem, bm25Path)
      graft.ann.IvfIndex.build(mem, Tables.embeddings(s, dir), ivfPath)
      HybridSearch.explainIndexed(s, bm25Path, ivfPath, mem,
        Some(Corpus.searchFeedback(s, dir)),
        Queries.hybridParams(s, dir, graphWeight = 0.1)
          .copy(sourcePrefix = Some("src1")))
    }),
    // retrieval-quality eval harness: truncated self-retrieval recall@k /
    // MRR over vector (E1 hashing embedder) and BM25 modes
    "ev_self_retrieval" -> ((s, dir) =>
      graft.eval.RetrievalEval.selfRetrieval(
        Tables.documents(s, dir)
          .select(col("doc_id").as("id"), col("text")))),
    // the END-TO-END indexed leg (r13 verdict #4): the same protocol run
    // through the FUSED hybrid pipeline, exact vs persisted-index legs in
    // one row — measures what RRF fusion does with the vector leg's IVF
    // recall loss. The fixture fills at the default nprobe at sf ≥ 0.01
    // (probed cells ≫ oversample), so no escalation widens the probe list
    // the oracle replays
    "ev_self_retrieval_indexed" -> ((s, dir) => {
      val base = s"${sys.props("java.io.tmpdir")}/graft_sri_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(base)
      graft.eval.RetrievalEval.selfRetrievalIndexed(s,
        Tables.documents(s, dir).select(col("doc_id").as("id"), col("text")),
        s"$base/bm25", s"$base/ivf")
    }),
    // the IVF recall trade as a measured number (one row, continuously
    // produced) instead of only a per-query oracle adjudication: sampled
    // memories query THEIR OWN corpus through the probed index vs the
    // exact top-k; recall_ppm is the nprobe-sizing signal
    "ev_ivf_recall" -> ((s, dir) => {
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_rec_ivf_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(ivfPath)
      val mem = Corpus.memories(s, dir)
      graft.ann.IvfIndex.build(mem, Tables.embeddings(s, dir), ivfPath)
      graft.eval.RetrievalEval.ivfRecall(s, mem, ivfPath)
    }),
    // the nprobe LADDER in one pass (the Faiss-tuning curve as a standing
    // query): shared query sample + exact leg, one pruned probe read per
    // rung — the number an operator sizes nprobe from
    "ev_ivf_recall_sweep" -> ((s, dir) => {
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_recs_ivf_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(ivfPath)
      val mem = Corpus.memories(s, dir)
      graft.ann.IvfIndex.build(mem, Tables.embeddings(s, dir), ivfPath)
      graft.eval.RetrievalEval.ivfRecallSweep(s, mem, ivfPath)
    }),
    // the TWO-LEVEL ladder (r17): the (nprobe1, nprobe2) recall curve
    // over the persisted two-level index — the instrument that sizes the
    // two-level probe the way ev_ivf_recall_sweep sizes flat nprobe, and
    // the measured evidence for the MaxNlist growth path's recall trade
    "ev_twolevel_recall" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_rec2l_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(path)
      val mem = Corpus.memories(s, dir)
      graft.ann.TwoLevelIvf.buildIndex(mem, Tables.embeddings(s, dir), path,
        fanout = 4)
      graft.eval.RetrievalEval.twoLevelRecallSweep(s, mem, path)
    }),
    // 2-hop graph-lift A/B: the reference's headline graph benchmark
    // (eval/run_musique_graph_eval.py) — same queries at graph_weight 0 vs
    // 0.1 over per-question scoped corpora, recall of the linked supports
    "ev_graph_lift" -> ((s, dir) => {
      val qvs = graft.eval.GraphLiftEval.Anchors
        .map(a => a -> Queries.queryVec(s, dir, a)).toMap
      graft.eval.GraphLiftEval.graphLift(Corpus.memories(s, dir), qvs)
    }),
    "mm_feature_checksum" -> ((s, dir) => {
      val media = Multimodal.syntheticMediaTable(
        Tables.documents(s, dir).select(col("doc_id").as("id")))
      Multimodal.featureChecksums(
        Multimodal.extractFeatures(media, Multimodal.DeterministicFakeCodec()))
        .orderBy("media_id")
    }),
    // multimodal frame-sample (flatMap batch shape: 1 video -> N frames)
    "mm_frame_sample" -> ((s, dir) => {
      val media = Multimodal.syntheticMediaTable(
        Tables.documents(s, dir).select(col("doc_id").as("id")))
      Multimodal.sampleFrames(media)
        .toDF("media_id", "frame_idx", "frame_hash")
        .orderBy("media_id", "frame_idx")
    }),
    // ViT patchification (1 image -> 2-D indexed patch grid: the batch
    // shape that turns an image table into a training-token table)
    "mm_patchify" -> ((s, dir) => {
      val media = Multimodal.syntheticMediaTable(
        Tables.documents(s, dir).select(col("doc_id").as("id")))
      Multimodal.patchify(media)
        .orderBy("media_id", "patch_row", "patch_col")
    }),
    // multimodal resize (1:1 batch shape with size-changing payload)
    "mm_resize" -> ((s, dir) => {
      val media = Multimodal.syntheticMediaTable(
        Tables.documents(s, dir).select(col("doc_id").as("id")))
      Multimodal.resizeImages(media).orderBy("media_id")
    }),
    // cross-modal near-dup join (r16 verdict #7): text docs and media
    // blobs encoded into ONE shared 8-dim space by the stub codec fold,
    // candidates by the (argmax, argmin) joint bucket, exact cosine >=
    // 0.985 verifies — never all-pairs. Oracle replays both folds, the
    // bucket join and the rounded cut from the raw tables
    "mm_crossmodal_neardup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id").as("id"), col("text"))
      val media = Multimodal.syntheticMediaTable(docs.select("id"))
      Multimodal.crossModalNearDup(docs, media,
        Multimodal.DeterministicFakeCodec())
    }),
    // gap-based sessionization of the usage log (batch form of the
    // stateful streaming session machine; 30-min gap cutoff)
    "st_sessionize" -> ((s, dir) =>
      EventStream.sessionize(Tables.events(s, dir))
        .orderBy("user_id", "session_idx")),
    "st_event_window_counts" -> ((s, dir) =>
      EventStream.windowedEventCounts(Tables.events(s, dir))
        .orderBy("window_start", "event_type")),
    // ingest-quality monitor: per-day corpus-health stats (count, mean
    // quality, low-quality fraction, language spread) — the streaming
    // dashboard aggregate, here in its batch oracle form
    "st_quality_window" -> ((s, dir) =>
      EventStream.qualityWindowStats(Corpus.memories(s, dir))
        .orderBy("window_start")),
    // streaming index maintenance, batch oracle form: build both persisted
    // indexes on half the corpus, ingest the rest as TWO micro-batches
    // (exactly what foreachBatch feeds startIndexRefresh per trigger —
    // StreamingSpec drives the real MemoryStream form), then serve a
    // lexical and a vector probe from the streamed-up indexes. Oracle =
    // the full-corpus BM25 + IVF SQL, so the hash-match proves streamed
    // ingest converges on the one-shot build
    "st_index_refresh" -> ((s, dir) => {
      val bm25Path = s"${sys.props("java.io.tmpdir")}/graft_stix_bm25_${ProcessHandle.current().pid()}"
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_stix_ivf_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(bm25Path); Queries.reapAtExit(ivfPath)
      val mem = Corpus.memories(s, dir)
      val nd = Corpus.nDocs(s, dir)
      graft.search.BM25Index.build(mem.filter(col("id") < nd / 2), bm25Path)
      graft.ann.IvfIndex.build(mem.filter(col("id") < nd / 2),
        Tables.embeddings(s, dir), ivfPath)
      for ((lo, hi) <- Seq((nd / 2, 3 * nd / 4), (3 * nd / 4, nd))) {
        val b = mem.filter(col("id") >= lo && col("id") < hi)
        graft.search.BM25Index.refresh(s, bm25Path, b)
        graft.ann.IvfIndex.refresh(s, ivfPath, b)
      }
      val bm = graft.search.BM25Index.scores(s, bm25Path, Queries.QueryTokens)
        .join(mem.filter(!col("archived")).select("id"), "id")
        .filter(col("bm25") > 0)
        .orderBy(desc("bm25"), asc("id")).limit(10)
        .select(lit("bm25").as("kind"), col("id"), col("bm25").as("score"))
      val iv = graft.ann.IvfIndex.topK(s, ivfPath, Queries.queryVec(s, dir),
        k = 10, nprobe = 2)
        .select(lit("vector").as("kind"), col("id"), col("sim").as("score"))
      bm.unionByName(iv).orderBy("kind", "id")
    }),
    // the full CDC maintenance shape, batch oracle form: build both
    // indexes with one slice HELD OUT, then apply ONE mixed change batch
    // — adds (the held-out slice), updates (re-crawled docs take the next
    // doc's content), deletes — through the same dispatch foreachBatch
    // runs per micro-batch (applyCdcBatch), then probe both indexes.
    // Oracle = full-recompute SQL over the post-CDC corpus: every op
    // path must land exactly on rebuild state
    "st_cdc_maintenance" -> ((s, dir) => {
      val bm25Path = s"${sys.props("java.io.tmpdir")}/graft_cdc_bm25_${ProcessHandle.current().pid()}"
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_cdc_ivf_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(bm25Path); Queries.reapAtExit(ivfPath)
      val mem = Corpus.memories(s, dir)
      graft.search.BM25Index.build(mem.filter(col("id") % 50 =!= 10), bm25Path)
      graft.ann.IvfIndex.build(mem.filter(col("id") % 50 =!= 10),
        Tables.embeddings(s, dir), ivfPath)
      val next = mem.select((col("id") - 1).as("id"),
        col("text").as("_t2"), col("embedding").as("_e2"))
      val updates = mem.select("id").filter(col("id") % 50 === 0).join(next, "id")
        .select(col("id"), col("_t2").as("text"), col("_e2").as("embedding"),
          lit("update").as("op"))
      val adds = mem.filter(col("id") % 50 === 10)
        .select(col("id"), col("text"), col("embedding"), lit("add").as("op"))
      val dels = mem.filter(col("id") % 50 === 25)
        .select(col("id"), col("text"), col("embedding"), lit("delete").as("op"))
      EventStream.applyCdcBatch(adds.unionByName(updates).unionByName(dels),
        bm25Path, ivfPath)
      val bm = graft.search.BM25Index.scores(s, bm25Path, Queries.QueryTokens)
        .filter(col("bm25") > 0)
        .orderBy(desc("bm25"), asc("id")).limit(10)
        .select(lit("bm25").as("kind"), col("id"), col("bm25").as("score"))
      val iv = graft.ann.IvfIndex.topK(s, ivfPath, Queries.queryVec(s, dir),
        k = 10, nprobe = 2)
        .select(lit("vector").as("kind"), col("id"), col("sim").as("score"))
      bm.unionByName(iv).orderBy("kind", "id")
    }),
    "sf_feedback_nets" -> ((s, dir) =>
      EventStream.runningFeedbackNets(Corpus.searchFeedback(s, dir))
        .select(col("memoryId").as("memory_id"), col("net"), col("nEvents").as("n_events"))
        .orderBy("memory_id")),
    "d8_smart_import" -> ((s, dir) => {
      // incoming = odd-id rows re-identified, alternately stamped a year
      // later/earlier (exercises add / replace / skip_older bands);
      // existing = the even-id half, so best matches are genuine neighbors
      val mem = Corpus.memories(s, dir)
      val incoming = mem.filter(col("id") % 2 === 1)
        .select((col("id") + 10000).as("id"), col("embedding"),
          when(col("id") % 3 === 1, col("created_at") + expr("INTERVAL 365 DAYS"))
            .otherwise(col("created_at") - expr("INTERVAL 365 DAYS")).as("created_at"))
      val existing = mem.filter(col("id") % 2 === 0)
      Dedup.smartImportActions(incoming, existing, skipThreshold = 0.95, addThreshold = 0.30)
        .orderBy("id")
    }),
    // D1 as the reference's ingest path actually runs it: is_novel per add
    // probes the persisted ANN store (memory_engine.py:548-561), never a
    // corpus scan — the plan reads ONLY the index's probed cell dirs
    // (pinned by PlanAuditSpec). Oracle = d1's SQL restricted to the
    // probed cells, adjudicating the IVF recall trade end to end
    "d1_novelty_indexed" -> ((s, dir) => {
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_nov_ivf_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(ivfPath)
      val mem = Corpus.memories(s, dir)
      graft.ann.IvfIndex.build(mem, Tables.embeddings(s, dir), ivfPath)
      VectorSearch.noveltyIndexed(s, ivfPath, Queries.queryVec(s, dir))
        .select("id", "sim", "is_novel")
    }),
    // D8 with the best-match read from the persisted IVF index over the
    // EXISTING store: the whole import batch's matches come from ONE
    // partition-pruned probed scan (probedCandidatesBatch), the existing
    // corpus' embeddings are never re-scanned. Oracle = d8's SQL with the
    // candidate pool restricted to each incoming row's probed cells
    "d8_smart_import_indexed" -> ((s, dir) => {
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_si_ivf_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(ivfPath)
      val mem = Corpus.memories(s, dir)
      val incoming = mem.filter(col("id") % 2 === 1)
        .select((col("id") + 10000).as("id"), col("embedding"),
          when(col("id") % 3 === 1, col("created_at") + expr("INTERVAL 365 DAYS"))
            .otherwise(col("created_at") - expr("INTERVAL 365 DAYS")).as("created_at"))
      val existing = mem.filter(col("id") % 2 === 0)
      graft.ann.IvfIndex.build(existing, Tables.embeddings(s, dir), ivfPath)
      Dedup.smartImportActionsIndexed(s, incoming, existing, ivfPath,
        skipThreshold = 0.95, addThreshold = 0.30)
        .orderBy("id")
    }),
    "m5_merge_groups" -> ((s, dir) => {
      val mem = Corpus.memories(s, dir)
      val groups = mem.filter(col("id") % 33 === 0)
        .select(col("id"), (col("id") / 100).cast("long").as("group_id"))
      graft.ops.Mutations.mergeGroups(mem, groups, maxId = 100000L)
    }),
    "r11_graph_via" -> ((s, dir) => {
      val mem = Corpus.memories(s, dir)
      val seeds = mem.filter(col("id") % 50 === 0)
        .select(col("id"), (lit(1.0) - col("id") / 1000.0).as("p"))
      val traced = mem.filter(col("id") % 40 === 0).select("id")
      graft.search.GraphSearch.traceContributors(
        graft.search.GraphSearch.edges(mem), seeds, traced)
    }),
    "r15_batch_search" -> ((s, dir) => {
      val p0 = Queries.hybridParams(s, dir)
      val p1 = p0.copy(queryVec = Queries.queryVec(s, dir, 1))
      HybridSearch.batchSearch(
        Corpus.memories(s, dir), Some(Corpus.searchFeedback(s, dir)), Seq(p0, p1))
    }),
    // the batch form from the persisted indexes: N queries = N pruned
    // postings slices + N·nprobe cell dirs, never N corpus scans; the
    // builds amortize across the batch. Oracle = the union of the
    // per-query indexed hybrid SQLs (each vector CTE restricted to ITS
    // query's probed cells)
    "r15_batch_indexed" -> ((s, dir) => {
      val bm25Path = s"${sys.props("java.io.tmpdir")}/graft_bhyb_bm25_${ProcessHandle.current().pid()}"
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_bhyb_ivf_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(bm25Path); Queries.reapAtExit(ivfPath)
      val mem = Corpus.memories(s, dir)
      graft.search.BM25Index.build(mem, bm25Path)
      graft.ann.IvfIndex.build(mem, Tables.embeddings(s, dir), ivfPath)
      val p0 = Queries.hybridParams(s, dir)
      val p1 = p0.copy(queryVec = Queries.queryVec(s, dir, 1))
      HybridSearch.batchSearchIndexed(s, bm25Path, ivfPath, mem,
        Some(Corpus.searchFeedback(s, dir)), Seq(p0, p1))
    }),
    // the GRAPH tail of the shared batch plan (r13 verdict #8): a
    // homogeneous graph-expanded batch runs ONE visible-edge frame + one
    // qid-keyed PPR loop + per-qid reserved-slot merges instead of N
    // per-query graph plans. Oracle = the per-query indexed graph SQLs
    // unioned — the hash-match IS the shared ≡ union proof
    "r15_batch_graph_indexed" -> ((s, dir) => {
      val bm25Path = s"${sys.props("java.io.tmpdir")}/graft_bgr_bm25_${ProcessHandle.current().pid()}"
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_bgr_ivf_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(bm25Path); Queries.reapAtExit(ivfPath)
      val mem = Corpus.memories(s, dir)
      graft.search.BM25Index.build(mem, bm25Path)
      graft.ann.IvfIndex.build(mem, Tables.embeddings(s, dir), ivfPath)
      val p0 = Queries.hybridParams(s, dir, graphWeight = 0.1)
      val p1 = p0.copy(queryVec = Queries.queryVec(s, dir, 1))
      HybridSearch.batchSearchIndexed(s, bm25Path, ivfPath, mem,
        Some(Corpus.searchFeedback(s, dir)), Seq(p0, p1))
    }),
    // MLlib BRP-LSH approx join — no SQL oracle (MLlib internals); the
    // driver records a rows-only check, invariants live in AnnSpec
    "ann_lsh_brp_pairs" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding"))
      graft.ann.IndexBuild.lshNearDuplicates(emb, maxL2Dist = 1.2)
        .orderBy("id_a", "id_b")
    }),
    // S5/S6: full NDJSON export→import round-trip (write, read back, remap)
    // oracled as the equivalent projection over the source parquet — the
    // JSON serialization round-trip is inside the measured path
    // S1/S2: save (write-then-swap), mutate, save AGAIN over the same path
    // (the atomic replace), load back + integrity check — the parquet
    // round-trip and the swap are both inside the measured path
    "s1_store_swap" -> ((s, dir) => {
      val path = "/root/repo/target/tmp/s1_store"
      Store.save(Corpus.memories(s, dir), path)
      val mutated = Store.load(s, path).filter(!col("source").startsWith("src2"))
      Store.save(mutated, path)
      val re = Store.load(s, path)
      val (_, _, ok) = Store.integrityCheck(re)
      re.select(col("id"), col("source"), col("entity_key"), col("archived"))
        .withColumn("integrity_ok", lit(ok))
        .orderBy("id")
    }),
    // Store maintenance: small-files compaction — save 8-way (the
    // many-tiny-files state an append-heavy store reaches), compact to the
    // 128 MB byte target (tiny corpus → 1 file), and verify the rewrite
    // kept every row; the narrow coalesce + write-then-swap are both
    // inside the measured path
    "s9_compact" -> ((s, dir) => {
      import s.implicits._
      val path = "/root/repo/target/tmp/s9_compact"
      Store.deleteRecursive(path)
      Store.save(Corpus.memories(s, dir).repartition(8), path)
      val (before, after, rows) = Store.compact(s, path)
      Seq((before.toLong, after.toLong, rows))
        .toDF("files_before", "files_after", "n_rows")
    }),
    // S7: 7 dated snapshots at keep=5 must leave exactly the 5 newest
    "s7_snapshot_retention" -> ((s, dir) => {
      import s.implicits._
      val bdir = "/root/repo/target/tmp/s7_snaps"
      Store.deleteRecursive(bdir)
      val mem = Corpus.memories(s, dir).select("id", "source")
      (1 to 7).map(d => f"2026080${d}T000000")
        .foreach(st => Store.snapshot(mem, bdir, "mem", st, keep = 5))
      Store.listSnapshots(bdir, "mem").toDF("snapshot").orderBy("snapshot")
    }),
    // S4: rebuild-from-files — deterministic single-chunk markdown fixtures
    // (one paragraph, no headers, 31..900 chars) per selected doc, then the
    // full files -> chunk -> embed -> atomic-swap pipeline; output re-loaded
    // from the swapped table. The fixture WRITE is bounded driver-side (a
    // handful of local .md files); the rebuild is the distributed path.
    "s4_rebuild_files" -> ((s, dir) => {
      val docsDir = "/root/repo/target/tmp/s4_docs"
      val target = "/root/repo/target/tmp/s4_table"
      Store.deleteRecursive(docsDir)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(docsDir))
      Tables.documents(s, dir).filter(col("doc_id") % 25 === 0)
        .select(col("doc_id"),
          trim(regexp_replace(substring(col("text"), 1, 900), "\\s+", " ")).as("content"))
        // header-looking content would be consumed by the chunker's header
        // branch (no chunk emitted) — exclude it on BOTH sides so the
        // fixture stays single-chunk under any regenerated corpus
        .filter(length(col("content")) > 30 && !col("content").rlike("^#{1,4} "))
        .collect().foreach { r =>
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$docsDir/doc${r.getLong(0)}.md"), r.getString(1))
        }
      graft.sources.Ingest.rebuildFromFiles(s, s"$docsDir/*.md",
        graft.embed.HashingEmbedder(64), target)
      Store.load(s, target)
        .select(col("id"), col("source"), posexplode(col("embedding")))
        .groupBy("id", "source")
        .agg(round(sum((col("pos") + 1) * col("col").cast("double")), 6).as("checksum"))
        .orderBy("id")
    }),
    "s5_roundtrip" -> ((s, dir) => {
      val path = "/root/repo/target/tmp/s5_roundtrip"
      NdJson.write(Corpus.memories(s, dir), path, sourcePrefix = Some("src1"))
      NdJson.read(s, path, sourceRemap = Some(("src1", "imported/src1")))
        .select(col("text"), col("source"), col("category"), col("entity_key"),
          col("pinned"), col("archived"))
        .orderBy("entity_key")
    }),
    // E2: re-embed + atomic write-then-swap + load-back, checksummed
    "e2_reembed_swap" -> ((s, dir) => {
      val path = "/root/repo/target/tmp/e2_reembed"
      val mem = Corpus.memories(s, dir).select("id", "text")
      graft.embed.Reembed.reembedAll(mem, graft.embed.HashingEmbedder(64), path)
      graft.sources.Store.load(s, path)
        .select(col("id"), posexplode(col("embedding")))
        .groupBy("id")
        .agg(round(sum((col("pos") + 1) * col("col").cast("double")), 6).as("checksum"))
        .orderBy("id")
    }),
    // F7: fixed query-string table → temporal-intent adjustments; the oracle
    // VALUES are the REFERENCE engine's own outputs for these queries at
    // reference_date 2026-08-01 (query_intent.py classify_query)
    "f7_intent_classify" -> ((s, dir) => {
      import s.implicits._
      val refDate = java.time.LocalDate.of(2026, 8, 1)
      Seq(
        "what did I do yesterday", "deploys last week", "decisions in march",
        "events from nov to feb", "what happened three days ago",
        "changes over the past two weeks", "plans for this month",
        "recently changed configs", "last friday standup",
        "no temporal language here")
        .map { q =>
          val a = graft.intent.QueryIntent.classifyQuery(q, refDate)
          (q, a.since.getOrElse(""), a.until.getOrElse(""),
            a.graphWeight.map(w => f"$w%.1f").getOrElse(""),
            a.recencyWeight.map(w => f"$w%.1f").getOrElse(""),
            a.autoDetected)
        }
        .toDF("query", "since", "until", "graph_weight", "recency_weight", "auto_detected")
    }),
    // stateful per-document fold — no SQL oracle; driver records rows>0
    "s3_chunk_markdown" -> ((s, dir) => {
      val mds = Tables.documents(s, dir)
        .groupBy("source")
        .agg(concat_ws("\n\n",
          collect_list(concat(lit("# section "), col("doc_id"), lit("\n"), col("text"))))
          .as("content"))
      Chunker.chunkDocuments(mds)
        .select(col("chunk_source"), length(col("text")).as("chunk_len"))
        .orderBy("chunk_source")
    })
  )

  private val oracleParams = Queries.oracleHybridParams

  val oracles: Map[String, String] = Map(
    "ev_graph_lift" -> {
      import graft.eval.GraphLiftEval._
      // per-question scope: swap the memories CTE for a windowed view —
      // the SQL mirror of memories.filter(id between A and A+Window)
      def scopedMem(a: Long): String = {
        val base = OracleCtes.memories
        require(base.startsWith("memories AS MATERIALIZED ("),
          "OracleCtes.memories head changed; update scopedMem")
        "memories0" + base.stripPrefix("memories") +
          s""",
             |memories AS MATERIALIZED (
             |  SELECT * FROM memories0 WHERE id BETWEEN $a AND ${a + Window})""".stripMargin
      }
      def block(a: Long, gw: Double): String = {
        val p = params(Nil, gw)
        val sql =
          if (gw <= 0)
            OracleHybrid.hybridSql(p, Window + 1, withFeedback = false,
              vecId = a, memoriesCte = scopedMem(a))
          else
            OracleHybrid.graphSql(p, Window + 1, withFeedback = false,
              vecId = a, memoriesCte = scopedMem(a))
        s"SELECT CAST($a AS BIGINT) AS anchor, CAST('$gw' AS DOUBLE) AS gw, id FROM (\n$sql\n)"
      }
      val union = (for { a <- Anchors; gw <- GraphWeights } yield block(a, gw))
        .mkString("\nUNION ALL\n")
      val targets = Anchors.map(a => s"($a, ${a + Hop1}, ${a + Hop2})")
        .mkString(", ")
      // no stripMargin here: the embedded blocks are already rendered and
      // must not be margin-processed twice
      "WITH results AS (\n" + union + "\n),\n" +
        s"targets AS (SELECT * FROM (VALUES $targets) AS t(anchor, hop1, hop2))\n" +
        "SELECT r.gw AS graph_weight,\n" +
        "  CAST(count(DISTINCT r.anchor) AS BIGINT) AS n_questions,\n" +
        "  CAST(sum(CASE WHEN r.id = t.hop1 THEN 1 ELSE 0 END) AS BIGINT) AS hop1_hits,\n" +
        "  CAST(sum(CASE WHEN r.id = t.hop2 THEN 1 ELSE 0 END) AS BIGINT) AS hop2_hits,\n" +
        "  round(CAST(sum(CASE WHEN r.id = t.hop1 THEN 1 ELSE 0 END) AS DOUBLE) / count(DISTINCT r.anchor), 6) AS recall_hop1,\n" +
        "  round(CAST(sum(CASE WHEN r.id = t.hop2 THEN 1 ELSE 0 END) AS DOUBLE) / count(DISTINCT r.anchor), 6) AS recall_hop2\n" +
        "FROM results r JOIN targets t USING (anchor)\n" +
        "GROUP BY 1 ORDER BY graph_weight"
    },
    // the whole probed-vs-exact protocol replayed from the raw corpus:
    // per-label centroids, per-memory cell assignment, per-QUERY probes
    // (one rung per nprobe over the sampled queries' own embeddings), both
    // top-10 legs, overlap counted per qid, one integer-ppm row per rung
    "ev_ivf_recall" -> ivfRecallSweepSql(Seq(2)),
    "ev_ivf_recall_sweep" -> ivfRecallSweepSql(Seq(1, 2, 4)),
    // the two-level protocol replayed the same way, both quantizer levels
    // from first principles (the shared twoLevelCtesOver chain), one
    // integer-ppm row per (nprobe1, nprobe2) rung
    "ev_twolevel_recall" -> twoLevelRecallSweepSql(Seq((1, 2), (2, 4), (4, 8))),
    "ev_self_retrieval" -> {
      val t = OracleText.toks("text")
      val dot = "list_sum(list_transform(range(1, 65), i -> d.e[i] * q.e[i]))"
      def met(mode: String, rel: String) =
        s"""SELECT '$mode' AS mode, CAST(count(*) AS BIGINT) AS n_queries,
           |  round(CAST(count(*) FILTER (WHERE rnk <= 1) AS DOUBLE) / count(*), 6) AS recall_at_1,
           |  round(CAST(count(*) FILTER (WHERE rnk <= 5) AS DOUBLE) / count(*), 6) AS recall_at_5,
           |  round(CAST(count(*) FILTER (WHERE rnk <= 10) AS DOUBLE) / count(*), 6) AS recall_at_10,
           |  round(CAST(sum(CASE WHEN rnk <= 10 THEN 1000000 // rnk ELSE 0 END) AS DOUBLE) / 1000000.0 / count(*), 6) AS mrr_at_10
           |FROM $rel""".stripMargin
      s"""WITH corpus AS MATERIALIZED (SELECT doc_id AS id, text FROM documents),
         |qdoc AS MATERIALIZED (
         |  SELECT id AS qid, array_to_string(t[1:greatest(len(t) // 2, 1)], ' ') AS text
         |  FROM (SELECT id, $t AS t FROM corpus)
         |  WHERE id % ${graft.eval.RetrievalEval.SampleMod} = 0 AND len(t) >= 4
         |  ORDER BY ${graft.functions.SparkHash.spreadSql("qid")}, qid LIMIT ${graft.eval.RetrievalEval.MaxQueries}),
         |${OracleText.embedCtesOver("corpus", 64)},
         |${OracleText.embedCtesOver("(SELECT qid AS id, text FROM qdoc) qsrc", 64, "qe")},
         |vs AS MATERIALIZED (
         |  SELECT q.id AS qid, d.id, round($dot, 6) AS sim
         |  FROM ef d CROSS JOIN qef q),
         |vself AS (SELECT qid, sim AS ssim FROM vs WHERE id = qid),
         |vrank AS (
         |  SELECT v.qid, 1 + count(*) FILTER (
         |    WHERE v.sim > s.ssim OR (v.sim = s.ssim AND v.id < v.qid)) AS rnk
         |  FROM vs v JOIN vself s USING (qid) GROUP BY 1),
         |${OracleHybrid.bm25BatchCtes("corpus", "qdoc")},
         |bself AS (SELECT qid, bm25 AS sbm FROM bm WHERE id = qid),
         |brank AS (
         |  SELECT b.qid, 1 + count(*) FILTER (
         |    WHERE b.bm25 > s.sbm OR (b.bm25 = s.sbm AND b.id < b.qid)) AS rnk
         |  FROM bm b JOIN bself s USING (qid) GROUP BY 1)
         |${met("vector", "vrank")}
         |UNION ALL
         |${met("bm25", "brank")}
         |ORDER BY mode""".stripMargin
    },
    // the fused two-leg replay: hash embeds (ef/qef), the id-mod-8 seeded
    // centroids + assignment + per-qid probes, BOTH vector branch pools
    // (full vs probed-restricted), the shared BM25 branch, RRF fusion with
    // the resolved weights (0.7 / (1.0 − 0.7) — the EXPRESSION, not 0.3:
    // the engine computes the bm25 weight as 1−vectorWeight in doubles),
    // per-qid fused top-10, self position, one metrics row
    "ev_self_retrieval_indexed" -> {
      val dot = "list_sum(list_transform(range(1, 65), i -> d.e[i] * q.e[i]))"
      s"""WITH corpus AS MATERIALIZED (SELECT doc_id AS id, text FROM documents),
         |qdoc AS MATERIALIZED (
         |  SELECT id AS qid, array_to_string(t[1:greatest(len(t) // 2, 1)], ' ') AS text
         |  FROM (SELECT id, ${OracleText.toks("text")} AS t FROM corpus)
         |  WHERE id % ${graft.eval.RetrievalEval.SampleMod} = 0 AND len(t) >= 4
         |  ORDER BY ${graft.functions.SparkHash.spreadSql("qid")}, qid LIMIT ${graft.eval.RetrievalEval.MaxQueries}),
         |${OracleText.embedCtesOver("corpus", 64)},
         |${OracleText.embedCtesOver("(SELECT qid AS id, text FROM qdoc) qsrc", 64, "qe")},
         |scent0 AS (SELECT id % 8 AS label, t.i, avg(e[t.i]) AS m
         |  FROM ef, range(1, 65) t(i) GROUP BY 1, 2),
         |scentn AS (SELECT label, sqrt(sum(m * m)) AS nrm FROM scent0 GROUP BY 1),
         |scent AS MATERIALIZED (
         |  SELECT c.label, list(c.m / n.nrm ORDER BY c.i) AS centroid
         |  FROM scent0 c JOIN scentn n USING (label) GROUP BY c.label),
         |sasg AS MATERIALIZED (
         |  SELECT id, label AS cell FROM (
         |    SELECT d.id, c.label, row_number() OVER (PARTITION BY d.id ORDER BY
         |      list_sum(list_transform(range(1, 65), i -> d.e[i] * c.centroid[i])) DESC, c.label) AS rn
         |    FROM ef d, scent c) WHERE rn = 1),
         |sprobe AS MATERIALIZED (
         |  SELECT qid, label FROM (
         |    SELECT q.id AS qid, c.label, row_number() OVER (PARTITION BY q.id ORDER BY
         |      list_sum(list_transform(range(1, 65), i -> q.e[i] * c.centroid[i])) DESC, c.label) AS rn
         |    FROM qef q, scent c) WHERE rn <= 2),
         |vs AS MATERIALIZED (
         |  SELECT q.id AS qid, d.id, round($dot, 6) AS sim FROM ef d CROSS JOIN qef q),
         |vre AS MATERIALIZED (SELECT qid, id, rn - 1 AS r FROM (
         |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rn
         |  FROM vs) WHERE rn <= 30),
         |vri AS MATERIALIZED (SELECT qid, id, rn - 1 AS r FROM (
         |  SELECT v.qid, v.id, row_number() OVER (PARTITION BY v.qid ORDER BY v.sim DESC, v.id) AS rn
         |  FROM vs v JOIN sasg a ON v.id = a.id
         |  JOIN sprobe p ON p.qid = v.qid AND a.cell = p.label) WHERE rn <= 30),
         |${OracleHybrid.bm25BatchCtes("corpus", "qdoc")},
         |brk AS MATERIALIZED (SELECT qid, id, rn - 1 AS r FROM (
         |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY bm25 DESC, id) AS rn
         |  FROM bm WHERE bm25 > 0) WHERE rn <= 30),
         |fe AS (SELECT coalesce(v.qid, b.qid) AS qid, coalesce(v.id, b.id) AS id,
         |  coalesce(0.7 / (v.r + 60), 0.0) + coalesce((1.0 - 0.7) / (b.r + 60), 0.0) AS f
         |  FROM vre v FULL OUTER JOIN brk b ON v.qid = b.qid AND v.id = b.id),
         |fi AS (SELECT coalesce(v.qid, b.qid) AS qid, coalesce(v.id, b.id) AS id,
         |  coalesce(0.7 / (v.r + 60), 0.0) + coalesce((1.0 - 0.7) / (b.r + 60), 0.0) AS f
         |  FROM vri v FULL OUTER JOIN brk b ON v.qid = b.qid AND v.id = b.id),
         |tke AS (SELECT qid, id, f FROM (SELECT qid, id, f,
         |  row_number() OVER (PARTITION BY qid ORDER BY f DESC, id) AS rn FROM fe) WHERE rn <= 10),
         |tki AS (SELECT qid, id, f FROM (SELECT qid, id, f,
         |  row_number() OVER (PARTITION BY qid ORDER BY f DESC, id) AS rn FROM fi) WHERE rn <= 10),
         |sre AS (SELECT qid, rnk FROM (SELECT qid, id,
         |  row_number() OVER (PARTITION BY qid ORDER BY round(f, 6) DESC, id) AS rnk FROM tke)
         |  WHERE id = qid),
         |sri AS (SELECT qid, rnk FROM (SELECT qid, id,
         |  row_number() OVER (PARTITION BY qid ORDER BY round(f, 6) DESC, id) AS rnk FROM tki)
         |  WHERE id = qid),
         |nq AS (SELECT count(*) AS n FROM qdoc),
         |me AS (SELECT count(*) AS h, coalesce(sum(1000000 // rnk), 0) AS mrr FROM sre),
         |mi AS (SELECT count(*) AS h, coalesce(sum(1000000 // rnk), 0) AS mrr FROM sri)
         |SELECT CAST(nq.n AS BIGINT) AS n_queries, CAST(10 AS BIGINT) AS k,
         |  CAST(2 AS BIGINT) AS nprobe,
         |  round(CAST(me.h AS DOUBLE) / nq.n, 6) AS recall_at_k_exact,
         |  round(CAST(mi.h AS DOUBLE) / nq.n, 6) AS recall_at_k_indexed,
         |  round(CAST(me.mrr AS DOUBLE) / 1000000.0 / nq.n, 6) AS mrr_at_k_exact,
         |  round(CAST(mi.mrr AS DOUBLE) / 1000000.0 / nq.n, 6) AS mrr_at_k_indexed,
         |  round(round(CAST(mi.h AS DOUBLE) / nq.n, 6)
         |    - round(CAST(me.h AS DOUBLE) / nq.n, 6), 6) AS recall_delta
         |FROM nq, me, mi""".stripMargin
    },
    "d1_novelty" ->
      s"""WITH ${OracleCtes.memories}
         |SELECT m.id, round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) AS sim,
         |  round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) < 0.88 AS is_novel
         |FROM memories m
         |CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |ORDER BY sim DESC, m.id LIMIT 1""".stripMargin,
    // d1's SQL with the candidate pool restricted to the IVF-probed cells:
    // exactly what the index-backed ingest gate must reproduce
    "d1_novelty_indexed" ->
      s"""WITH ${OracleCtes.memories},
         |${Queries.ivfCtes}
         |SELECT m.id, round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) AS sim,
         |  round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) < 0.88 AS is_novel
         |FROM memories m
         |JOIN asg a ON m.id = a.id
         |JOIN probe p ON a.ivf_cell = p.label
         |CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |ORDER BY sim DESC, m.id LIMIT 1""".stripMargin,
    "d5_consolidation_clusters" ->
      s"""$consolidationCtes
         |SELECT v.cluster, t.id FROM tight t JOIN surv v USING (component)
         |ORDER BY 1, 2""".stripMargin,
    "d6_apply_consolidation" ->
      s"""$consolidationCtes,
         |asg AS (SELECT v.cluster, t.id FROM tight t JOIN surv v USING (component))
         |SELECT 100000 + row_number() OVER (ORDER BY cluster) AS id,
         |  'merged:' || CAST(cluster AS VARCHAR) AS text,
         |  array_to_string(list_sort(list(id)), ',') AS consolidated_from
         |FROM asg GROUP BY cluster ORDER BY id""".stripMargin,
    "d7_prune_candidates" ->
      s"""WITH ${OracleCtes.memories},
         |${OracleCtes.retrievalLog}
         |SELECT id, category,
         |  round((epoch(TIMESTAMP '2026-08-01 00:00:00') - epoch(created_at)) / 86400.0, 4) AS age_days
         |FROM memories m
         |WHERE NOT pinned AND NOT archived
         |  AND id NOT IN (SELECT DISTINCT memory_id FROM retrieval_log)
         |  AND (epoch(TIMESTAMP '2026-08-01 00:00:00') - epoch(created_at)) / 86400.0 >
         |      CASE WHEN category = 'detail' THEN 60.0 ELSE 120.0 END
         |ORDER BY id""".stripMargin,
    "r14_explain" ->
      OracleHybrid.explainSql(oracleParams, n = 1000000, withFeedback = true),
    "r14_explain_graph" ->
      OracleHybrid.explainSql(
        oracleParams.copy(graphWeight = 0.1, sourcePrefix = Some("src1")),
        n = 1000000, withFeedback = true),
    // r14_explain_graph's SQL with the vector CTE probed-cell-restricted
    "r14_explain_indexed" ->
      OracleHybrid.explainSql(
        oracleParams.copy(graphWeight = 0.1, sourcePrefix = Some("src1")),
        n = 1000000, withFeedback = true,
        extraCtes = Queries.ivfCtesOver("memories"),
        vecJoin = "JOIN asg ia ON m.id = ia.id JOIN probe ip ON ia.ivf_cell = ip.label"),
    "mm_frame_sample" -> {
      val blob = "'blob-' || repeat(CAST(id AS VARCHAR), CAST(id % 7 + 1 AS INT))"
      s"""WITH mm AS (
         |  SELECT doc_id AS id, $blob AS s
         |  FROM (SELECT doc_id FROM documents)),
         |v AS (SELECT id, s, len(s) AS n FROM mm WHERE id % 3 = 2),
         |fr0 AS (SELECT id, s, n, unnest(range(0, n // 8)) AS f FROM v),
         |fr AS (SELECT * FROM fr0 WHERE f % 2 = 0)
         |SELECT id AS media_id, CAST(f AS INT) AS frame_idx,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(range(f * 8 + 1, least((f + 1) * 8, n) + 1),
         |      i -> CAST(ascii(s[i]) AS BIGINT))),
         |    (acc, x) -> (acc * 31 + x) % 1000000007) AS frame_hash
         |FROM fr ORDER BY media_id, frame_idx""".stripMargin
    },
    "mm_resize" -> {
      val blob = "'blob-' || repeat(CAST(id AS VARCHAR), CAST(id % 7 + 1 AS INT))"
      s"""WITH mm AS (
         |  SELECT doc_id AS id, $blob AS s
         |  FROM (SELECT doc_id FROM documents)),
         |im AS (SELECT id, s, len(s) AS n FROM mm WHERE id % 3 = 0)
         |SELECT id AS media_id, 16 AS out_len,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(range(0, 16), j -> CAST(ascii(s[(j * n) // 16 + 1]) AS BIGINT))),
         |    (acc, x) -> (acc * 31 + x) % 1000000007) AS resized_hash
         |FROM im ORDER BY media_id""".stripMargin
    },
    "mm_patchify" -> {
      val blob = "'blob-' || repeat(CAST(id AS VARCHAR), CAST(id % 7 + 1 AS INT))"
      s"""WITH mm AS (
         |  SELECT doc_id AS id, $blob AS s
         |  FROM (SELECT doc_id FROM documents)),
         |im AS (SELECT id, s, len(s) AS n, (len(s) + 7) // 8 AS h
         |  FROM mm WHERE id % 3 = 0),
         |g AS (
         |  SELECT id, CAST(pr.x AS INT) AS patch_row, CAST(pc.x AS INT) AS patch_col, s,
         |    list_filter(list_transform(range(0, 16),
         |      k -> (pr.x * 4 + k // 4) * 8 + (pc.x * 4 + k % 4)), p -> p < n) AS ps
         |  FROM im, range(0, 100) pr(x), range(0, 2) pc(x)
         |  WHERE pr.x < (h + 3) // 4)
         |SELECT id AS media_id, patch_row, patch_col,
         |  CAST(len(ps) AS INT) AS n_px,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(ps, p -> CAST(ascii(s[p + 1]) AS BIGINT))),
         |    (acc, x) -> (acc * 31 + x) % 1000000007) AS patch_hash
         |FROM g WHERE len(ps) > 0
         |ORDER BY media_id, patch_row, patch_col""".stripMargin
    },
    // both modality folds replayed from the raw tables, the joint-bucket
    // equi-join (list_position = array_position: first index wins ties),
    // cosine in double over the float-cast features, the cut on the
    // ROUNDED score — the whole candidate-generation geometry is in the
    // hash
    "mm_crossmodal_neardup" -> {
      val blob = "'blob-' || repeat(CAST(id AS VARCHAR), CAST(id % 7 + 1 AS INT))"
      def fold(src: String) =
        s"""list_transform(range(0, 8), i ->
           |      CAST(CAST(list_sum(list_transform(range(1, len($src) + 1),
           |        p -> CASE WHEN (p - 1) % 8 = i THEN ascii($src[p]) ELSE 0 END))
           |        / 255.0 / greatest(len($src), 1) AS FLOAT) AS DOUBLE))""".stripMargin
      s"""WITH docs AS (SELECT doc_id AS id, text FROM documents),
         |cmm AS (SELECT id, $blob AS s FROM docs),
         |ctf AS (SELECT id, ${fold("text")} AS f FROM docs),
         |cmf AS (SELECT id,
         |    CASE WHEN id % 3 = 0 THEN 'image' WHEN id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         |    ${fold("s")} AS f FROM cmm),
         |ctb AS (SELECT id, f, list_position(f, list_max(f)) AS bmax,
         |    list_position(f, list_min(f)) AS bmin FROM ctf),
         |cmb AS (SELECT id, kind, f, list_position(f, list_max(f)) AS bmax,
         |    list_position(f, list_min(f)) AS bmin FROM cmf)
         |SELECT doc_id, media_id, kind, sim FROM (
         |  SELECT t.id AS doc_id, m.id AS media_id, m.kind,
         |    round(list_sum(list_transform(range(1, 9), i -> t.f[i] * m.f[i])) /
         |      (sqrt(list_sum(list_transform(range(1, 9), i -> t.f[i] * t.f[i]))) *
         |       sqrt(list_sum(list_transform(range(1, 9), i -> m.f[i] * m.f[i])))), 6) AS sim
         |  FROM ctb t JOIN cmb m USING (bmax, bmin))
         |WHERE sim >= 0.985
         |ORDER BY doc_id, media_id""".stripMargin
    },
    "mm_feature_checksum" -> {
      val blob = "'blob-' || repeat(CAST(id AS VARCHAR), CAST(id % 7 + 1 AS INT))"
      s"""WITH mm AS (
         |  SELECT doc_id AS id, $blob AS s
         |  FROM (SELECT doc_id FROM documents)
         |  ),
         |f AS (
         |  SELECT id,
         |    CASE WHEN id % 3 = 0 THEN 'image' WHEN id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         |    list_transform(range(0, 8), i ->
         |      CAST(CAST(list_sum(list_transform(range(1, len(s) + 1),
         |        p -> CASE WHEN (p - 1) % 8 = i THEN ascii(s[p]) ELSE 0 END))
         |        / 255.0 / greatest(len(s), 1) AS FLOAT) AS DOUBLE)) AS feat
         |  FROM mm)
         |SELECT id AS media_id, kind, 8 AS feature_dim,
         |  round(list_sum(list_transform(range(1, 9), i -> feat[i] * i)), 6) AS checksum
         |FROM f ORDER BY media_id""".stripMargin
    },
    "d8_smart_import" ->
      s"""WITH ${OracleCtes.memories},
         |inc AS MATERIALIZED (
         |  SELECT id + 10000 AS id, embedding,
         |    CASE WHEN id % 3 = 1 THEN created_at + INTERVAL 365 DAY
         |         ELSE created_at - INTERVAL 365 DAY END AS in_ts
         |  FROM memories WHERE id % 2 = 1),
         |ex AS MATERIALIZED (
         |  SELECT id AS ex_id, embedding, created_at AS ex_ts
         |  FROM memories WHERE id % 2 = 0),
         |sc AS (
         |  SELECT i.id, i.in_ts, e.ex_id, e.ex_ts,
         |    round(${OracleCtes.dot64("i.embedding", "e.embedding")}, 6) AS sim
         |  FROM inc i JOIN ex e ON i.id <> e.ex_id),
         |best AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY sim DESC, ex_id) AS rn
         |    FROM sc) WHERE rn = 1)
         |SELECT id, ex_id AS match_id, sim,
         |  CASE WHEN sim >= 0.95 THEN 'skip'
         |       WHEN sim < 0.3 THEN 'add'
         |       WHEN in_ts > ex_ts THEN 'replace'
         |       ELSE 'skip_older' END AS action
         |FROM best ORDER BY id""".stripMargin,
    // d8's SQL with the candidate pool restricted per incoming row to its
    // nprobe=2 probed cells of the index over the EXISTING half (same
    // full-embeddings centroids the builder uses); incoming rows whose
    // probed cells hold no candidate resolve to 'add' via the LEFT JOIN —
    // the indexed gate's left-join semantics exactly
    "d8_smart_import_indexed" -> {
      val centDot = "list_sum(list_transform(range(1, 65), i -> CAST(%s[i] AS DOUBLE) * %s[i]))"
      s"""WITH ${OracleCtes.memories},
         |inc AS MATERIALIZED (
         |  SELECT id + 10000 AS id, embedding,
         |    CASE WHEN id % 3 = 1 THEN created_at + INTERVAL 365 DAY
         |         ELSE created_at - INTERVAL 365 DAY END AS in_ts
         |  FROM memories WHERE id % 2 = 1),
         |ex AS MATERIALIZED (
         |  SELECT id AS ex_id, embedding, created_at AS ex_ts
         |  FROM memories WHERE id % 2 = 0),
         |${Queries.centCtes},
         |asgex AS MATERIALIZED (
         |  SELECT ex_id, label AS ivf_cell FROM (
         |    SELECT e.ex_id, c.label, row_number() OVER (PARTITION BY e.ex_id ORDER BY
         |      ${centDot.format("e.embedding", "c.centroid")} DESC, c.label) AS rn
         |    FROM ex e, cent c) WHERE rn = 1),
         |probei AS MATERIALIZED (
         |  SELECT qid, label FROM (
         |    SELECT i.id AS qid, c.label, row_number() OVER (PARTITION BY i.id ORDER BY
         |      ${centDot.format("i.embedding", "c.centroid")} DESC, c.label) AS rn
         |    FROM inc i, cent c) WHERE rn <= 2),
         |sc AS (
         |  SELECT i.id, i.in_ts, e.ex_id, e.ex_ts,
         |    round(${OracleCtes.dot64("i.embedding", "e.embedding")}, 6) AS sim
         |  FROM inc i JOIN probei p ON p.qid = i.id
         |  JOIN asgex a ON a.ivf_cell = p.label
         |  JOIN ex e ON e.ex_id = a.ex_id AND i.id <> e.ex_id),
         |best AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY sim DESC, ex_id) AS rn
         |    FROM sc) WHERE rn = 1)
         |SELECT i.id, b.ex_id AS match_id, b.sim,
         |  CASE WHEN b.sim >= 0.95 THEN 'skip'
         |       WHEN b.sim IS NULL OR b.sim < 0.3 THEN 'add'
         |       WHEN i.in_ts > b.ex_ts THEN 'replace'
         |       ELSE 'skip_older' END AS action
         |FROM inc i LEFT JOIN best b ON b.id = i.id
         |ORDER BY i.id""".stripMargin
    },
    "m5_merge_groups" ->
      s"""WITH ${OracleCtes.memories},
         |g AS (
         |  SELECT id, CAST(floor(id / 100.0) AS BIGINT) AS group_id, text
         |  FROM memories WHERE id % 33 = 0),
         |m AS (
         |  SELECT group_id, string_agg(text, ' | ' ORDER BY id) AS text,
         |    list(id ORDER BY id) AS superseded
         |  FROM g GROUP BY 1),
         |m2 AS (SELECT *, 100000 + row_number() OVER (ORDER BY group_id) AS new_id FROM m)
         |SELECT m2.new_id AS id, m2.text, u.s AS supersedes
         |FROM m2, unnest(m2.superseded) AS u(s)
         |ORDER BY 1, 3""".stripMargin,
    "r11_graph_via" ->
      s"""WITH ${OracleCtes.memories},
         |${OracleCtes.edges},
         |seeds AS (SELECT id, 1.0 - id / 1000.0 AS p FROM memories WHERE id % 50 = 0),
         |traced AS (SELECT id FROM memories WHERE id % 40 = 0),
         |n1 AS MATERIALIZED (SELECT src AS id, dst AS n1 FROM edges),
         |tn AS MATERIALIZED (SELECT t.id, n.n1 FROM traced t JOIN n1 n USING (id)),
         |sn AS MATERIALIZED (
         |  SELECT s.id AS seed_id, s.p, n.n1 AS sn1
         |  FROM seeds s LEFT JOIN n1 n ON n.id = s.id),
         |hops AS (
         |  SELECT tn.id, s.id AS seed_id, s.p AS contribution, 1 AS hop
         |  FROM tn JOIN seeds s ON tn.n1 = s.id
         |  UNION ALL
         |  SELECT DISTINCT tn.id, sn.seed_id, sn.p * 0.5, 2
         |  FROM tn JOIN sn ON tn.n1 = sn.sn1
         |  UNION ALL
         |  SELECT DISTINCT tn.id, sn.seed_id, sn.p * 0.25, 3
         |  FROM tn JOIN n1 nn ON tn.n1 = nn.id JOIN sn ON nn.n1 = sn.sn1),
         |best AS (
         |  SELECT id, seed_id, round(arg_min(contribution, hop), 6) AS contribution
         |  FROM hops WHERE id <> seed_id GROUP BY 1, 2)
         |SELECT id, seed_id, contribution,
         |  CAST(rnk AS INT) AS via_rank
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY contribution DESC, seed_id) AS rnk
         |  FROM best)
         |WHERE rnk <= 5""".stripMargin,
    "r15_batch_search" -> {
      val sql0 = OracleHybrid.hybridSql(oracleParams, n = 1000000, withFeedback = true, vecId = 0)
      val sql1 = OracleHybrid.hybridSql(oracleParams, n = 1000000, withFeedback = true, vecId = 1)
      s"""SELECT q0.*, 0 AS query_idx FROM (
         |$sql0
         |) q0
         |UNION ALL
         |SELECT q1.*, 1 AS query_idx FROM (
         |$sql1
         |) q1""".stripMargin
    },
    // per-query indexed hybrid SQLs unioned: each vector CTE restricted
    // to ITS query's probed cells (the probe CTE ranks centroids against
    // that query's vec_id)
    "r15_batch_indexed" -> {
      def one(v: Long) = OracleHybrid.hybridSql(oracleParams, n = 1000000,
        withFeedback = true, vecId = v,
        extraCtes = Queries.ivfCtesOver("memories", v),
        vecJoin = "JOIN asg ia ON m.id = ia.id JOIN probe ip ON ia.ivf_cell = ip.label")
      s"""SELECT q0.*, 0 AS query_idx FROM (
         |${one(0)}
         |) q0
         |UNION ALL
         |SELECT q1.*, 1 AS query_idx FROM (
         |${one(1)}
         |) q1""".stripMargin
    },
    // per-query indexed GRAPH SQLs unioned: each query's full graph tail
    // (probed vector CTE, 3 unrolled PPR rounds, reserved-slot merge)
    // replayed independently — the shared-plan batch must hash-match it
    "r15_batch_graph_indexed" -> {
      def one(v: Long) = OracleHybrid.graphSql(
        oracleParams.copy(graphWeight = 0.1), n = 1000000,
        withFeedback = true, vecId = v,
        extraCtes = Queries.ivfCtesOver("memories", v),
        vecJoin = "JOIN asg ia ON m.id = ia.id JOIN probe ip ON ia.ivf_cell = ip.label")
      s"""SELECT q0.*, 0 AS query_idx FROM (
         |${one(0)}
         |) q0
         |UNION ALL
         |SELECT q1.*, 1 AS query_idx FROM (
         |${one(1)}
         |) q1""".stripMargin
    },
    "s1_store_swap" ->
      s"""WITH ${OracleCtes.memories}
         |SELECT id, source, entity_key, archived, TRUE AS integrity_ok
         |FROM memories WHERE source NOT LIKE 'src2%'
         |ORDER BY id""".stripMargin,
    // files_before is pinned by the 8-way repartition of a non-empty
    // corpus; files_after = ceil(bytes/128MB) = 1 at oracle scale
    "s9_compact" ->
      s"""WITH ${OracleCtes.memories}
         |SELECT CAST(8 AS BIGINT) AS files_before,
         |  CAST(1 AS BIGINT) AS files_after,
         |  CAST(count(*) AS BIGINT) AS n_rows FROM memories""".stripMargin,
    "s7_snapshot_retention" ->
      """SELECT snapshot FROM (VALUES
        |  ('mem_20260803T000000'), ('mem_20260804T000000'),
        |  ('mem_20260805T000000'), ('mem_20260806T000000'),
        |  ('mem_20260807T000000')) AS t(snapshot)
        |ORDER BY snapshot""".stripMargin,
    "s4_rebuild_files" ->
      s"""WITH files AS MATERIALIZED (
         |  SELECT 'doc' || CAST(doc_id AS VARCHAR) || '.md:chunk_0' AS ck,
         |    trim(regexp_replace(substring(text, 1, 900), '\\s+', ' ', 'g')) AS ctext
         |  FROM documents WHERE doc_id % 25 = 0
         |),
         |chunks AS MATERIALIZED (
         |  SELECT ck, ctext FROM files
         |  WHERE len(ctext) > 30 AND NOT regexp_matches(ctext, '^#{1,4} ')),
         |${OracleText.embedCtesOver("(SELECT ck AS id, ctext AS text FROM chunks) c", 64)},
         |ids AS (SELECT ck, row_number() OVER (ORDER BY ck, ctext) - 1 AS rid FROM chunks)
         |SELECT i.rid AS id, i.ck AS source,
         |  round(list_sum(list_transform(range(1, 65), j -> e[j] * j)), 6) AS checksum
         |FROM ids i JOIN ef ON ef.id = i.ck
         |ORDER BY id""".stripMargin,
    "s5_roundtrip" ->
      s"""WITH ${OracleCtes.memories}
         |SELECT text, 'imported/src1' || substring(source, 5) AS source,
         |  category, entity_key, pinned, archived
         |FROM memories WHERE source LIKE 'src1%'
         |ORDER BY entity_key""".stripMargin,
    "e2_reembed_swap" ->
      s"""WITH ${OracleText.embedCtes(64)}
         |SELECT id, round(list_sum(list_transform(range(1, 65), i -> e[i] * i)), 6) AS checksum
         |FROM ef ORDER BY id""".stripMargin,
    "f7_intent_classify" ->
      """SELECT * FROM (VALUES
        |  ('what did I do yesterday', '2026-07-31T00:00:00Z', '2026-07-31T23:59:59Z', '0.0', '', TRUE),
        |  ('deploys last week', '2026-07-20T00:00:00Z', '2026-07-26T23:59:59Z', '0.0', '', TRUE),
        |  ('decisions in march', '2026-03-01T00:00:00Z', '2026-03-31T23:59:59Z', '0.0', '', TRUE),
        |  ('events from nov to feb', '2025-11-01T00:00:00Z', '2026-02-28T23:59:59Z', '0.0', '', TRUE),
        |  ('what happened three days ago', '2026-07-29T00:00:00Z', '2026-07-29T23:59:59Z', '0.0', '', TRUE),
        |  ('changes over the past two weeks', '2026-07-18T00:00:00Z', '', '0.0', '', TRUE),
        |  ('plans for this month', '2026-08-01T00:00:00Z', '', '0.0', '', TRUE),
        |  ('recently changed configs', '', '', '', '0.2', TRUE),
        |  ('last friday standup', '2026-07-31T00:00:00Z', '2026-07-31T23:59:59Z', '0.0', '', TRUE),
        |  ('no temporal language here', '', '', '', '', FALSE))
        |AS t(query, since, until, graph_weight, recency_weight, auto_detected)""".stripMargin,
    "st_sessionize" ->
      """WITH se AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |sg AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS newf
        |  FROM se WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |ss AS (
        |  SELECT user_id, us, sum(newf) OVER (
        |    PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM sg)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(us) AS BIGINT) AS start_us,
        |  CAST(max(us) - min(us) AS BIGINT) AS dur_us
        |FROM ss GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin,
    "st_event_window_counts" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n, sum(value) AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // full recompute over the post-CDC corpus (adds back in, updates
    // carrying the next doc's content, deletes gone): every op path of
    // the mixed batch must land exactly on this state
    "st_cdc_maintenance" ->
      s"""WITH ${OracleCtes.memories},
         |chg AS (
         |  SELECT m.id, m2.text, m2.embedding FROM memories m
         |  JOIN memories m2 ON m2.id = m.id + 1 WHERE m.id % 50 = 0),
         |live AS MATERIALIZED (
         |  SELECT m.id, coalesce(c.text, m.text) AS text,
         |    coalesce(c.embedding, m.embedding) AS embedding
         |  FROM memories m LEFT JOIN chg c USING (id)
         |  WHERE m.id % 50 <> 25),
         |${OracleHybrid.bm25Ctes(Queries.QueryTokens, "live")},
         |${Queries.ivfCtesOver("live")}
         |SELECT kind, id, score FROM (
         |  SELECT 'bm25' AS kind, id, bm25 AS score FROM (
         |    SELECT id, bm25 FROM bm WHERE bm25 > 0
         |    ORDER BY bm25 DESC, id LIMIT 10)
         |  UNION ALL
         |  SELECT 'vector' AS kind, id, sim AS score FROM (
         |    SELECT l.id, round(${OracleCtes.dot64("l.embedding", "q2.qv")}, 6) AS sim
         |    FROM live l
         |    JOIN asg a ON l.id = a.id
         |    JOIN probe p ON a.ivf_cell = p.label
         |    CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q2
         |    ORDER BY sim DESC, l.id LIMIT 10))
         |ORDER BY kind, id""".stripMargin,
    // full-corpus lexical + vector probes: what the build-half + two
    // streamed micro-batches must converge to
    "st_index_refresh" ->
      s"""WITH ${OracleCtes.memories},
         |${OracleHybrid.bm25Ctes(Queries.QueryTokens)},
         |${Queries.ivfCtes}
         |SELECT kind, id, score FROM (
         |  SELECT 'bm25' AS kind, id, bm25 AS score FROM (
         |    SELECT b.id, b.bm25 FROM bm b JOIN memories m USING (id)
         |    WHERE b.bm25 > 0 AND NOT m.archived
         |    ORDER BY b.bm25 DESC, b.id LIMIT 10)
         |  UNION ALL
         |  SELECT 'vector' AS kind, id, sim AS score FROM (
         |    SELECT m.id, round(${OracleCtes.dot64("m.embedding", "q2.qv")}, 6) AS sim
         |    FROM memories m
         |    JOIN asg a ON m.id = a.id
         |    JOIN probe p ON a.ivf_cell = p.label
         |    CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q2
         |    ORDER BY sim DESC, m.id LIMIT 10))
         |ORDER BY kind, id""".stripMargin,
    "st_quality_window" -> {
      val t = graft.core.OracleText.toks("text")
      s"""WITH ${OracleCtes.memories},
         |qw0 AS MATERIALIZED (
         |  SELECT created_at, lang, text, $t AS t FROM memories),
         |qwt AS MATERIALIZED (
         |  SELECT date_trunc('day', created_at) AS ws, lang,
         |    CAST(round((CASE WHEN len(t) = 0 THEN 0.0
         |      ELSE ${graft.core.OracleText.qualityExpr("text", "t")} END) * 1e6, 0) AS BIGINT) AS qm
         |  FROM qw0)
         |SELECT ws AS window_start, count(*) AS n_docs,
         |  CAST((2 * sum(qm) + count(*)) // (2 * count(*)) AS BIGINT) AS mean_quality_micro,
         |  CAST((2 * 1000000 * sum(CASE WHEN qm < 500000 THEN 1 ELSE 0 END) + count(*))
         |    // (2 * count(*)) AS BIGINT) AS low_quality_ppm,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         |FROM qwt GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "sf_feedback_nets" ->
      s"""WITH ${OracleCtes.searchFeedback}
         |SELECT memory_id, CAST(sum(CASE WHEN signal = 'useful' THEN 1 ELSE -1 END) AS BIGINT) AS net,
         |  count(*) AS n_events
         |FROM search_feedback GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
