package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analytics.{Analytics, AuditLog}
import graft.core.{Corpus, OracleCtes, Tables}
import graft.ops.{Mutations, Presentation, Versioning}
import graft.search.VectorSearch

/** Registry section 2: analytics (A1-A8), presentation (O2-O6), and
  * mutation-semantics (M1-M11, R13) operators with DuckDB oracles. */
object QueriesOps {

  import Queries.Q

  private val MaxId = 100000L
  private val NowSql = "TIMESTAMP '2026-08-01 00:00:00'"

  private def mem(s: SparkSession, dir: String): DataFrame = Corpus.memories(s, dir)

  /** Inject user:/assistant: transcript markers (id mod 3) so the timeline's
    * user-facts filter is exercised in both directions. */
  private def withTranscriptMarkers(m: DataFrame): DataFrame =
    m.withColumn("text",
      when(col("id") % 3 === 0, concat(lit("user: "), col("text")))
        .when(col("id") % 3 === 1, concat(lit("assistant: "), col("text")))
        .otherwise(col("text")))

  val queries: Map[String, Q] = Map(
    // ----------------------------------------------------------- analytics
    "a1_folder_rollup" -> ((s, dir) => Analytics.folderRollup(mem(s, dir))),
    "a2_search_quality" -> ((s, dir) =>
      Analytics.searchQuality(Corpus.retrievalLog(s, dir), Corpus.searchFeedback(s, dir),
        "2024-01-01 00:00:00", "2026-01-01 00:00:00")),
    "a3_problem_queries" -> ((s, dir) =>
      Analytics.problemQueries(Corpus.searchFeedback(s, dir))),
    "a4_stale_memories" -> ((s, dir) =>
      Analytics.staleMemories(Corpus.retrievalLog(s, dir), Corpus.searchFeedback(s, dir))),
    "a5_graph_stats" -> ((s, dir) =>
      Analytics.graphSearchStats(Corpus.graphSearchEvents(s, dir))),
    "a6_extraction_quality" -> ((s, dir) =>
      Analytics.extractionQuality(Corpus.extractionOutcomes(s, dir))),
    "a6_usage_tokens" -> ((s, dir) =>
      Analytics.usageTokens(Corpus.extractionTokens(s, dir), Corpus.ModelPricing)),
    "a6_quality_summary" -> ((s, dir) =>
      Analytics.qualitySummary(Corpus.searchFeedback(s, dir),
        Corpus.extractionOutcomes(s, dir), Corpus.graphSearchEvents(s, dir))),
    "a6_failures_retrieval" -> ((s, dir) =>
      Analytics.retrievalFailures(Corpus.searchFeedback(s, dir))),
    "a6_failures_extraction" -> ((s, dir) =>
      Analytics.extractionFailures(Corpus.extractionOutcomes(s, dir))),
    "a7_conflicts" -> ((s, dir) => Analytics.conflicts(mem(s, dir))),
    "a8_stats" -> ((s, dir) => Analytics.stats(mem(s, dir))),
    // -------------------------------------------------------- presentation
    "o2_pagination" -> ((s, dir) =>
      Presentation.paginate(mem(s, dir).select("id", "source"), "id", 50, 25)),
    // user:/assistant: transcript markers injected by id so the
    // user_facts_only filter has both polarities to discriminate
    "o3_timeline" -> ((s, dir) =>
      Presentation.timeline(withTranscriptMarkers(mem(s, dir)),
        Seq(Queries.queryVec(s, dir, 0), Queries.queryVec(s, dir, 1)),
        userFactsOnly = true)),
    // the timeline's variant fan-out routed through the persisted IVF
    // index: ONE probed-cell scan serves BOTH query variants (r14 verdict
    // next-round #4 — the last multi-scan read path), same markers +
    // user-facts filter as o3_timeline
    "o3_timeline_indexed" -> ((s, dir) => {
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_o3_ivf_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(ivfPath)
      val m = mem(s, dir)
      graft.ann.IvfIndex.build(m, graft.core.Tables.embeddings(s, dir), ivfPath)
      Presentation.timelineIndexed(s, ivfPath, withTranscriptMarkers(m),
        Seq(Queries.queryVec(s, dir, 0), Queries.queryVec(s, dir, 1)),
        userFactsOnly = true)
    }),
    "o4_evidence_packet" -> ((s, dir) =>
      Presentation.evidencePacket(mem(s, dir), Queries.queryVec(s, dir),
        queryText = "dedup merge window")),
    // recency-preferring rank-key branch (query matches latest|current|...)
    "o4_evidence_recency" -> ((s, dir) =>
      Presentation.evidencePacket(mem(s, dir), Queries.queryVec(s, dir),
        queryText = "latest dedup merge window")),
    // the evidence packet's candidate stage through the persisted IVF
    // index (r15 verdict next-round #5 — the last presentation read path
    // whose vector leg brute-scanned the corpus per query): ONE probed-cell
    // scan, corpus attrs by id-join, the rank/relation/trail tail verbatim
    "o4_evidence_indexed" -> ((s, dir) => {
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_o4_ivf_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(ivfPath)
      val m = mem(s, dir)
      graft.ann.IvfIndex.build(m, graft.core.Tables.embeddings(s, dir), ivfPath)
      Presentation.evidencePacketIndexed(s, ivfPath, m,
        Queries.queryVec(s, dir), queryText = "dedup merge window")
    }),
    "o4_followups" -> ((s, dir) => {
      import s.implicits._
      Presentation.followUpQueries("What Changed about the dedup   window")
        .zipWithIndex.map { case (q, i) => (i.toLong, q) }
        .toDF("pos", "followup")
    }),
    "o5_distinct_sources" -> ((s, dir) => Presentation.distinctSources(mem(s, dir))),
    "o6_counts" -> ((s, dir) => Presentation.counts(mem(s, dir), "src1")),
    // ----------------------------------------------------------- mutations
    "m1_add_memories" -> ((s, dir) => {
      val newRows = Tables.documents(s, dir).filter(col("doc_id") % 97 === 3)
        .select(concat(col("text"), lit(" (new)")).as("text"), lit("inbox/new").as("source"))
      Mutations.addMemories(newRows, MaxId).select("id", "text", "source", "created_at")
    }),
    "m2_update_text" -> ((s, dir) => {
      val patches = mem(s, dir).filter(col("id") % 50 === 0)
        .select(col("id"), concat(lit("updated: "), col("text")).as("new_text"))
      Mutations.updateText(mem(s, dir), patches)
        .filter(col("changed")).select("id", "text", "updated_at").orderBy("id")
    }),
    "m3_upsert_entity" -> ((s, dir) => {
      val incoming = Tables.documents(s, dir).filter(col("doc_id") % 3 === 0)
        .select(col("source"), concat(lit("ek"), (col("doc_id") + 300) % 600).as("entity_key"))
      Mutations.upsertByEntity(mem(s, dir), incoming, MaxId)
    }),
    "m4_supersede" -> ((s, dir) => {
      val targets = mem(s, dir).filter(col("id") % 100 === 7).select("id")
      Mutations.supersede(mem(s, dir), targets, MaxId)
        .select("id", "supersedes", "previous_text", "is_latest")
    }),
    "m6_delete_prefix" -> ((s, dir) =>
      Mutations.deleteByPrefix(mem(s, dir), "src1").select("id").orderBy("id")),
    "m7_add_links" -> ((s, dir) => {
      val newLinks = mem(s, dir).filter(col("id") % 25 === 0)
        .select(col("id").as("src"), (col("id") + 40).as("dst"), lit("reinforces").as("link_type"))
      Mutations.addLinks(mem(s, dir), newLinks)
    }),
    "m8_rename_folder" -> ((s, dir) =>
      Mutations.renameFolder(mem(s, dir), "src1", "proj/alpha")),
    "m9_policy_enforce" -> ((s, dir) =>
      Mutations.enforcePolicies(mem(s, dir), Corpus.policies(s))),
    "m10_audn_execute" -> ((s, dir) => {
      val nd = Corpus.nDocs(s, dir)
      val decisions = Tables.documents(s, dir).filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("fact_id"),
          when(col("doc_id") % 5 === 0, "ADD").when(col("doc_id") % 5 === 1, "UPDATE")
            .when(col("doc_id") % 5 === 2, "DELETE").when(col("doc_id") % 5 === 3, "NOOP")
            .otherwise("CONFLICT").as("action"),
          (col("doc_id") * 7 % nd).as("target_id"))
      Mutations.executeAudn(mem(s, dir), decisions)
    }),
    "m11_auto_link" -> ((s, dir) => {
      val nd = Corpus.nDocs(s, dir)
      val newIds = mem(s, dir).filter(col("id") >= nd - 20).select("id")
      Mutations.autoLink(mem(s, dir), newIds)
    }),
    // M11 as the ingest path runs it: the new docs' link candidates come
    // from ONE probed scan of the index over the PRE-add store — the
    // existing corpus is never rescanned (the last index-backed write
    // gate). Oracle = m11's SQL restricted per new doc to its probed cells
    "m11_auto_link_indexed" -> ((s, dir) => {
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_al_ivf_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(ivfPath)
      val nd = Corpus.nDocs(s, dir)
      val m = mem(s, dir)
      graft.ann.IvfIndex.build(
        m.filter(col("id") < nd - 20), Tables.embeddings(s, dir), ivfPath)
      Mutations.autoLinkIndexed(s, ivfPath,
        m.filter(col("id") >= nd - 20).select("id", "embedding"))
    }),
    "r13_reinforce" -> ((s, dir) => {
      val ids = VectorSearch.topK(mem(s, dir), Queries.queryVec(s, dir), 10).select("id")
      Mutations.reinforce(mem(s, dir), ids)
    }),
    // the reference's FULL add path (is_novel → insert → auto-link)
    // composed batch-shaped: every decision for the incoming batch from
    // ONE probed scan of the pre-add store's IVF index. Even incoming
    // rows clone the store's vec-0 embedding (re-crawl duplicates — top-1
    // sim ≈ 1 ≥ 0.88 ⇒ skipped); odd rows keep their own (novel ⇒ added,
    // with their probed link counts)
    "op_ingest_gateway" -> ((s, dir) => {
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_gw_ivf_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(ivfPath)
      val nd = Corpus.nDocs(s, dir)
      val m = mem(s, dir)
      graft.ann.IvfIndex.build(
        m.filter(col("id") < nd - 30), Tables.embeddings(s, dir), ivfPath)
      val incoming = m.filter(col("id") >= nd - 30)
        .select((col("id") + 10000).as("id"),
          when(col("id") % 2 === 0, typedLit(Queries.queryVec(s, dir)))
            .otherwise(col("embedding")).as("embedding"))
      graft.ops.IngestGateway.gateBatch(s, ivfPath, incoming)
    }),
    // the opt-in within-batch D3 pass in FRONT of the store gate: the even
    // incoming rows all clone vec-0 — near-dups of EACH OTHER, which the
    // store-only gate admits independently; with dedupWithinBatch only the
    // lowest-id clone reaches the probe, the rest report skipped_in_batch
    "op_ingest_gateway_dedup" -> ((s, dir) => {
      val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_gwd_ivf_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(ivfPath)
      val nd = Corpus.nDocs(s, dir)
      val m = mem(s, dir)
      graft.ann.IvfIndex.build(
        m.filter(col("id") < nd - 30), Tables.embeddings(s, dir), ivfPath)
      val incoming = m.filter(col("id") >= nd - 30)
        .select((col("id") + 10000).as("id"),
          when(col("id") % 2 === 0, typedLit(Queries.queryVec(s, dir)))
            .otherwise(col("embedding")).as("embedding"))
      graft.ops.IngestGateway.gateBatch(s, ivfPath, incoming,
        dedupWithinBatch = true)
    }),
    // ------------------------------------------------------- version chains
    // M12: full supersede-chain reconstruction (get_memory_history);
    // O7: the corpus as-of 2024-01-01 + 200 days (time travel)
    "m12_version_chain" -> ((s, dir) =>
      Versioning.versionChains(Versioning.versionedFixture(mem(s, dir)))),
    "o7_as_of_snapshot" -> ((s, dir) =>
      Versioning.asOfSnapshot(Versioning.versionedFixture(mem(s, dir)),
        Corpus.BaseEpoch + 200L * 86400)),
    // ----------------------------------------------------------- audit log
    // A9: filtered+paginated audit page (newest first, same-filter total
    // fused in) and the 10-day retention purge as-of 2024-01-31
    "a9_audit_query" -> ((s, dir) =>
      AuditLog.query(AuditLog.auditLog(s, dir, Corpus.nDocs(s, dir)),
        action = Some("memory.search"), keyId = Some("k3"),
        limit = 25, offset = 10)),
    "a9_audit_purge" -> ((s, dir) =>
      AuditLog.purge(AuditLog.auditLog(s, dir, Corpus.nDocs(s, dir)),
        retentionDays = 10, nowEpoch = AuditNowEpoch))
  )

  /** Purge reference instant: just past the events fixture's span. */
  private val AuditNowEpoch: Long =
    java.time.Instant.parse("2024-01-31T00:00:00Z").getEpochSecond

  /** Audit-trail fixture as a DuckDB CTE (mirrors AuditLog.auditLog). */
  private val auditCte =
    """audit AS MATERIALIZED (
      |  SELECT event_id AS id, ts,
      |    CASE event_type WHEN 'view' THEN 'memory.read'
      |      WHEN 'click' THEN 'memory.search'
      |      WHEN 'purchase' THEN 'memory.write'
      |      WHEN 'signup' THEN 'key.create'
      |      ELSE 'auth.denied' END AS action,
      |    'k' || CAST(user_id % 7 AS VARCHAR) AS key_id,
      |    'key-' || CAST(user_id % 7 AS VARCHAR) AS key_name,
      |    'mem/' || CAST(event_id % (SELECT count(*) FROM documents) AS VARCHAR) AS resource_id,
      |    'src' || CAST(user_id % 3 AS VARCHAR) AS source_prefix,
      |    '10.0.0.' || CAST(user_id % 50 AS VARCHAR) AS ip
      |  FROM events)""".stripMargin

  /** Versioned-corpus fixture as a DuckDB CTE (mirrors
    * Versioning.versionedFixture: arithmetic version ids, +100 d / +200 d
    * creation offsets, 1/2/3-deep chains side by side). */
  private val versionsCte =
    """versions AS MATERIALIZED (
      |  SELECT id, text, source, created_at, CAST(NULL AS BIGINT) AS supersedes,
      |         NOT (id % 100 = 7) AS is_latest
      |  FROM memories
      |  UNION ALL
      |  SELECT id + 100000, 'v2: ' || text, source,
      |         created_at + to_seconds(8640000), id, NOT (id % 200 = 7)
      |  FROM memories WHERE id % 100 = 7
      |  UNION ALL
      |  SELECT id + 200000, 'v3: ' || text, source,
      |         created_at + to_seconds(17280000), id + 100000, TRUE
      |  FROM memories WHERE id % 200 = 7
      |)""".stripMargin

  /** extraction_outcomes fixture as a DuckDB CTE (mirrors
    * Corpus.extractionOutcomes). */
  private val exoCte =
    """exo AS MATERIALIZED (
      |  SELECT event_id AS job_id, 'm' || CAST(user_id % 3 AS VARCHAR) AS model,
      |    CAST(event_id % 4 AS INT) AS stored, CAST(event_id % 3 AS INT) AS updated,
      |    CAST(event_id % 2 AS INT) AS deleted, CAST(event_id % 5 AS INT) AS noop,
      |    CAST(CASE WHEN event_id % 9 = 0 THEN 1 ELSE 0 END AS INT) AS conflict,
      |    CAST(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END AS INT) AS fallback,
      |    CAST(floor(value * 10) AS BIGINT) AS tokens, ts,
      |    CAST(event_id % 4 + event_id % 3 + event_id % 2 + event_id % 5
      |         + CASE WHEN event_id % 9 = 0 THEN 1 ELSE 0 END AS INT) AS extracted
      |  FROM events WHERE event_type = 'signup')""".stripMargin

  /** O4 oracle body shared by the score-first, recency-first and
    * index-backed variants — only the rank-key ORDER BY differs
    * (evidence_packet.py:59-64), plus for the indexed leg the candidate
    * CTE is restricted to the probed cells (asg/cent/probe replayed from
    * first principles — the established probed-cell-restriction pattern).
    * NO archived filter in either leg: the packet classifies archived
    * evidence rather than hiding it (includeArchived = true). */
  private def evidenceOracle(orderSql: String, probed: Boolean = false): String = {
    val ivf =
      if (probed)
        Queries.ivfCtesOverQ("memories",
          "(SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)") + ",\n"
      else ""
    val probeJoin =
      if (probed) "JOIN asg a ON m.id = a.id JOIN probe p ON a.ivf_cell = p.label\n  "
      else ""
    s"""WITH ${OracleCtes.memories},
       |${ivf}v AS MATERIALIZED (
       |  SELECT m.id, m.source, round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) AS sim,
       |    coalesce(m.document_at, m.updated_at, m.created_at) AS date,
       |    m.archived, m.is_latest
       |  FROM memories m ${probeJoin}CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
       |  ORDER BY sim DESC, m.id LIMIT 20),
       |r AS MATERIALIZED (SELECT *, row_number() OVER (ORDER BY $orderSql) AS rank FROM v),
       |cur AS (SELECT date AS cur_date FROM r WHERE rank = 1),
       |rel AS MATERIALIZED (
       |  SELECT r.*, c.cur_date,
       |    CASE WHEN r.rank = 1 THEN 'current'
       |         WHEN c.cur_date IS NOT NULL AND r.date IS NOT NULL AND r.date < c.cur_date THEN 'older'
       |         WHEN r.archived THEN 'archived'
       |         WHEN c.cur_date IS NULL AND r.date IS NOT NULL THEN 'dated_unranked'
       |         ELSE 'supporting' END AS relation
       |  FROM r, cur c),
       |n_old AS (SELECT count(*) AS n FROM rel WHERE relation IN ('older', 'archived', 'dated_unranked')),
       |trail AS (
       |  SELECT CAST(row_number() OVER (ORDER BY
       |      CASE relation WHEN 'current' THEN 0 WHEN 'supporting' THEN 1 ELSE 2 END, rank) AS INT) AS trail_pos,
       |    id, source, relation, sim AS score,
       |    CASE WHEN cur_date IS NULL THEN 'low'
       |         WHEN (SELECT n FROM n_old) > 0 THEN 'medium' ELSE 'high' END AS confidence_level
       |  FROM rel)
       |SELECT * FROM trail WHERE trail_pos <= 10 ORDER BY trail_pos""".stripMargin
  }

  private val vecTopIds =
    s"""vtop AS (
       |  SELECT m.id FROM memories m
       |  CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
       |  WHERE NOT m.archived
       |  ORDER BY round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) DESC, m.id
       |  LIMIT 10
       |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "a1_folder_rollup" ->
      s"""WITH ${OracleCtes.memories}
         |SELECT string_split(source, '/')[1] AS folder, count(*) AS n
         |FROM memories GROUP BY 1 ORDER BY 1""".stripMargin,
    "a2_search_quality" ->
      s"""WITH ${OracleCtes.retrievalLog},
         |${OracleCtes.searchFeedback},
         |r AS (
         |  SELECT count(*) AS total_retrievals, count(DISTINCT memory_id) AS distinct_memories,
         |    CAST(sum(CASE WHEN rank <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS top3,
         |    count(DISTINCT query) AS distinct_queries
         |  FROM retrieval_log
         |  WHERE ts BETWEEN TIMESTAMP '2024-01-01 00:00:00' AND TIMESTAMP '2026-01-01 00:00:00'),
         |f AS (
         |  SELECT CAST(sum(CASE WHEN signal = 'useful' THEN 1 ELSE 0 END) AS BIGINT) AS useful,
         |    CAST(sum(CASE WHEN signal = 'not_useful' THEN 1 ELSE 0 END) AS BIGINT) AS not_useful
         |  FROM search_feedback
         |  WHERE ts BETWEEN TIMESTAMP '2024-01-01 00:00:00' AND TIMESTAMP '2026-01-01 00:00:00')
         |SELECT r.*, f.*,
         |  round(CAST(top3 AS DOUBLE) / total_retrievals, 6) AS top3_ratio,
         |  round(CAST(useful AS DOUBLE) / (useful + not_useful), 6) AS useful_ratio
         |FROM r, f""".stripMargin,
    "a3_problem_queries" ->
      s"""WITH ${OracleCtes.searchFeedback}
         |SELECT query, count(*) AS n_feedback,
         |  CAST(sum(CASE WHEN signal = 'not_useful' THEN 1 ELSE 0 END) AS BIGINT) AS not_useful
         |FROM search_feedback GROUP BY 1
         |HAVING count(*) >= 2 AND CAST(not_useful AS DOUBLE) / count(*) >= 0.5
         |ORDER BY not_useful DESC, query LIMIT 20""".stripMargin,
    "a4_stale_memories" ->
      s"""WITH ${OracleCtes.retrievalLog},
         |${OracleCtes.searchFeedback},
         |r AS (SELECT memory_id, count(*) AS retrievals FROM retrieval_log GROUP BY 1),
         |f AS (SELECT memory_id, count(*) AS n_feedback,
         |  sum(CASE WHEN signal = 'useful' THEN 1 ELSE 0 END) AS useful
         |  FROM search_feedback GROUP BY 1)
         |SELECT r.memory_id, r.retrievals, f.n_feedback
         |FROM r JOIN f USING (memory_id)
         |WHERE r.retrievals >= 3 AND f.useful = 0 ORDER BY memory_id""".stripMargin,
    "a5_graph_stats" ->
      """SELECT count(*) AS total_searches,
        |  CAST(sum(CASE WHEN graph_weight > 0 THEN 1 ELSE 0 END) AS BIGINT) AS graph_activated,
        |  CAST(sum(CASE WHEN graph_count > 0 THEN 1 ELSE 0 END) AS BIGINT) AS with_graph_results,
        |  CAST(sum(direct_count) AS BIGINT) AS direct_results,
        |  CAST(sum(graph_count) AS BIGINT) AS graph_results
        |FROM (
        |  SELECT CASE WHEN event_id % 4 = 0 THEN 0.0 ELSE 0.1 END AS graph_weight,
        |    CAST(event_id % 5 AS INT) AS direct_count,
        |    CAST(event_id % 3 AS INT) AS graph_count
        |  FROM events WHERE event_type = 'purchase')""".stripMargin,
    "a6_extraction_quality" ->
      """SELECT model, count(*) AS jobs, CAST(sum(stored) AS BIGINT) AS stored,
        |  CAST(sum(updated) AS BIGINT) AS updated,
        |  CAST(sum(deleted) AS BIGINT) AS deleted, CAST(sum(fallback) AS BIGINT) AS fallbacks,
        |  CAST(sum(tokens) AS BIGINT) AS total_tokens, round(avg(tokens), 4) AS avg_tokens
        |FROM (
        |  SELECT 'm' || CAST(user_id % 3 AS VARCHAR) AS model,
        |    CAST(event_id % 4 AS INT) AS stored, CAST(event_id % 3 AS INT) AS updated,
        |    CAST(event_id % 2 AS INT) AS deleted,
        |    CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END AS fallback,
        |    CAST(floor(value * 10) AS BIGINT) AS tokens
        |  FROM events WHERE event_type = 'signup')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "a6_usage_tokens" ->
      """WITH tok AS (
        |  SELECT 'm' || CAST(user_id % 3 AS VARCHAR) AS model,
        |    CAST(floor(value * 10) AS BIGINT) AS input_tokens,
        |    CAST(event_id % 500 AS BIGINT) AS output_tokens
        |  FROM events WHERE event_type = 'view')
        |SELECT model, count(*) AS calls,
        |  CAST(sum(input_tokens) AS BIGINT) AS input_tokens,
        |  CAST(sum(output_tokens) AS BIGINT) AS output_tokens,
        |  round(CAST(sum(input_tokens) AS DOUBLE) / 1000000.0 *
        |      CASE model WHEN 'm0' THEN CAST(1.0 AS DOUBLE) WHEN 'm1' THEN CAST(0.5 AS DOUBLE)
        |                 WHEN 'm2' THEN CAST(2.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END
        |    + CAST(sum(output_tokens) AS DOUBLE) / 1000000.0 *
        |      CASE model WHEN 'm0' THEN CAST(4.0 AS DOUBLE) WHEN 'm1' THEN CAST(2.0 AS DOUBLE)
        |                 WHEN 'm2' THEN CAST(8.0 AS DOUBLE) ELSE CAST(4.0 AS DOUBLE) END, 4) AS est_cost_usd
        |FROM tok GROUP BY 1 ORDER BY 1""".stripMargin,
    "a6_quality_summary" ->
      s"""WITH ${OracleCtes.searchFeedback},
         |$exoCte,
         |fb AS (SELECT CAST(sum(CASE WHEN signal = 'useful' THEN 1 ELSE 0 END) AS BIGINT) AS useful,
         |  CAST(sum(CASE WHEN signal = 'not_useful' THEN 1 ELSE 0 END) AS BIGINT) AS not_useful
         |  FROM search_feedback),
         |ex AS (SELECT count(*) AS total_extractions, CAST(sum(extracted) AS BIGINT) AS x,
         |  CAST(sum(stored) AS BIGINT) AS s, CAST(sum(updated) AS BIGINT) AS u,
         |  CAST(sum(noop) AS BIGINT) AS n, CAST(sum(deleted) AS BIGINT) AS d,
         |  CAST(sum(conflict) AS BIGINT) AS c, CAST(sum(fallback) AS BIGINT) AS fbk FROM exo),
         |gr AS (SELECT count(*) AS total_graph_searches, CAST(sum(graph_count) AS BIGINT) AS total_graph_results
         |  FROM (SELECT CAST(event_id % 3 AS INT) AS graph_count FROM events WHERE event_type = 'purchase'))
         |SELECT round(CAST(useful AS DOUBLE) / (useful + not_useful), 4) AS positive_feedback_rate,
         |  useful + not_useful AS searches_with_feedback, total_extractions,
         |  round(CAST(s AS DOUBLE) / x, 4) AS add_rate,
         |  round(CAST(u AS DOUBLE) / x, 4) AS update_rate,
         |  round(CAST(n AS DOUBLE) / x, 4) AS noop_rate,
         |  round(CAST(d AS DOUBLE) / x, 4) AS delete_rate,
         |  round(CAST(c AS DOUBLE) / x, 4) AS conflict_rate,
         |  round(CAST(fbk AS DOUBLE) / x, 4) AS fallback_rate,
         |  total_graph_searches, total_graph_results
         |FROM fb, ex, gr""".stripMargin,
    "a6_failures_retrieval" ->
      s"""WITH ${OracleCtes.searchFeedback}
         |SELECT id AS feedback_id, memory_id, query, ts FROM search_feedback
         |WHERE signal = 'not_useful' ORDER BY ts DESC, id LIMIT 10""".stripMargin,
    "a6_failures_extraction" ->
      s"""WITH $exoCte
         |SELECT job_id, model, extracted, stored, noop,
         |  round(CAST(noop AS DOUBLE) / extracted, 4) AS noop_ratio, conflict
         |FROM exo WHERE extracted > 0 AND noop > 0
         |ORDER BY CAST(noop AS DOUBLE) / extracted DESC, ts DESC, job_id LIMIT 10""".stripMargin,
    "a7_conflicts" ->
      s"""WITH ${OracleCtes.memories}
         |SELECT a.id, a.source, a.conflicts_with, b.source AS other_source,
         |  b.archived AS other_archived
         |FROM memories a JOIN memories b ON a.conflicts_with = b.id
         |WHERE a.conflicts_with IS NOT NULL AND NOT a.archived
         |ORDER BY a.id""".stripMargin,
    "a8_stats" ->
      s"""WITH ${OracleCtes.memories}
         |SELECT count(*) AS total,
         |  CAST(sum(CASE WHEN archived THEN 1 ELSE 0 END) AS BIGINT) AS archived,
         |  CAST(sum(CASE WHEN pinned THEN 1 ELSE 0 END) AS BIGINT) AS pinned,
         |  count(DISTINCT source) AS sources,
         |  max(len(embedding)) AS dim
         |FROM memories""".stripMargin,
    "o2_pagination" ->
      s"""WITH ${OracleCtes.memories}
         |SELECT id, source FROM memories ORDER BY id LIMIT 25 OFFSET 50""".stripMargin,
    "o3_timeline" ->
      s"""WITH ${OracleCtes.memories},
         |mm AS MATERIALIZED (
         |  SELECT id, source, embedding, document_at, created_at, archived,
         |    CASE WHEN id % 3 = 0 THEN 'user: ' || text
         |         WHEN id % 3 = 1 THEN 'assistant: ' || text
         |         ELSE text END AS text
         |  FROM memories),
         |v0 AS (
         |  SELECT m.id, m.source, m.text, coalesce(m.document_at, m.created_at) AS date
         |  FROM mm m CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |  WHERE NOT m.archived
         |  ORDER BY round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) DESC, m.id LIMIT 20),
         |v1 AS (
         |  SELECT m.id, m.source, m.text, coalesce(m.document_at, m.created_at) AS date
         |  FROM mm m CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1) q
         |  WHERE NOT m.archived
         |  ORDER BY round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) DESC, m.id LIMIT 20),
         |u AS (SELECT DISTINCT id, source, text, date FROM (SELECT * FROM v0 UNION ALL SELECT * FROM v1))
         |SELECT id, source, date FROM u
         |WHERE trim(text) <> '' AND (regexp_matches(text, '(?im)^\\s*user\\s*:')
         |  OR NOT regexp_matches(text, '(?im)^\\s*assistant\\s*:'))
         |ORDER BY date NULLS FIRST, id""".stripMargin,
    // the o3 replay restricted to the probed cells: asg/cent replayed from
    // first principles, one probe CTE per variant vector, each variant's
    // top-20 ranked WITHIN its probed cells — the established
    // probed-cell-restriction oracle pattern, markers/filter/sort verbatim
    "o3_timeline_indexed" ->
      s"""WITH ${OracleCtes.memories},
         |mm AS MATERIALIZED (
         |  SELECT id, source, embedding, document_at, created_at, archived,
         |    CASE WHEN id % 3 = 0 THEN 'user: ' || text
         |         WHEN id % 3 = 1 THEN 'assistant: ' || text
         |         ELSE text END AS text
         |  FROM memories),
         |${Queries.ivfCtesOverQ("memories",
             "(SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)")},
         |probe1 AS (
         |  SELECT label FROM (
         |    SELECT c.label, row_number() OVER (ORDER BY
         |      list_sum(list_transform(range(1, 65), i -> c.centroid[i] * CAST(q.qv[i] AS DOUBLE))) DESC,
         |      c.label) AS rn
         |    FROM cent c, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1) q)
         |  WHERE rn <= 2),
         |tv0 AS (
         |  SELECT m.id, m.source, m.text, coalesce(m.document_at, m.created_at) AS date
         |  FROM mm m JOIN asg a ON m.id = a.id JOIN probe p ON a.ivf_cell = p.label
         |  CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |  WHERE NOT m.archived
         |  ORDER BY round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) DESC, m.id LIMIT 20),
         |tv1 AS (
         |  SELECT m.id, m.source, m.text, coalesce(m.document_at, m.created_at) AS date
         |  FROM mm m JOIN asg a ON m.id = a.id JOIN probe1 p ON a.ivf_cell = p.label
         |  CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1) q
         |  WHERE NOT m.archived
         |  ORDER BY round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) DESC, m.id LIMIT 20),
         |tu AS (SELECT DISTINCT id, source, text, date FROM (SELECT * FROM tv0 UNION ALL SELECT * FROM tv1))
         |SELECT id, source, date FROM tu
         |WHERE trim(text) <> '' AND (regexp_matches(text, '(?im)^\\s*user\\s*:')
         |  OR NOT regexp_matches(text, '(?im)^\\s*assistant\\s*:'))
         |ORDER BY date NULLS FIRST, id""".stripMargin,
    "o4_evidence_packet" -> evidenceOracle(
      "sim DESC, (date IS NOT NULL) DESC, date DESC, is_latest DESC, id"),
    "o4_evidence_recency" -> evidenceOracle(
      "(date IS NOT NULL) DESC, date DESC, sim DESC, is_latest DESC, id"),
    // the o4 replay with the candidate CTE restricted to the probed cells
    // (asg/cent/probe replayed from first principles — the established
    // probed-cell-restriction pattern); rank key and tail verbatim
    "o4_evidence_indexed" -> evidenceOracle(
      "sim DESC, (date IS NOT NULL) DESC, date DESC, is_latest DESC, id",
      probed = true),
    "o4_followups" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), 'What Changed about the dedup window'),
        |  (CAST(1 AS BIGINT), 'latest What Changed about the dedup window'),
        |  (CAST(2 AS BIGINT), 'current What Changed about the dedup window'))
        |AS t(pos, followup)""".stripMargin,
    "o5_distinct_sources" ->
      s"""WITH ${OracleCtes.memories}
         |SELECT DISTINCT source FROM memories ORDER BY source""".stripMargin,
    "o6_counts" ->
      s"""WITH ${OracleCtes.memories}
         |SELECT count(*) AS total,
         |  CAST(sum(CASE WHEN source LIKE 'src1%' THEN 1 ELSE 0 END) AS BIGINT) AS with_prefix,
         |  CAST(sum(CASE WHEN NOT archived THEN 1 ELSE 0 END) AS BIGINT) AS visible
         |FROM memories""".stripMargin,
    "m1_add_memories" ->
      s"""SELECT $MaxId + row_number() OVER (ORDER BY text || ' (new)', 'inbox/new') AS id,
         |  text || ' (new)' AS text, 'inbox/new' AS source, $NowSql AS created_at
         |FROM documents WHERE doc_id % 97 = 3""".stripMargin,
    "m2_update_text" ->
      s"""WITH ${OracleCtes.memories}
         |SELECT id, 'updated: ' || text AS text, $NowSql AS updated_at
         |FROM memories WHERE id % 50 = 0 ORDER BY id""".stripMargin,
    "m3_upsert_entity" ->
      s"""WITH ${OracleCtes.memories},
         |inc AS (
         |  SELECT source, 'ek' || CAST((doc_id + 300) % 600 AS VARCHAR) AS entity_key
         |  FROM documents WHERE doc_id % 3 = 0)
         |SELECT i.source, i.entity_key,
         |  CASE WHEN e.id IS NULL THEN 'create' ELSE 'update' END AS action,
         |  coalesce(e.id, $MaxId + row_number() OVER (
         |    PARTITION BY e.id IS NULL ORDER BY i.source, i.entity_key)) AS target_id
         |FROM inc i LEFT JOIN memories e
         |  ON i.source = e.source AND i.entity_key = e.entity_key""".stripMargin,
    "m4_supersede" ->
      s"""WITH ${OracleCtes.memories}
         |SELECT $MaxId + row_number() OVER (ORDER BY id) AS id,
         |  id AS supersedes, text AS previous_text, TRUE AS is_latest
         |FROM memories WHERE id % 100 = 7""".stripMargin,
    "m6_delete_prefix" ->
      s"""WITH ${OracleCtes.memories}
         |SELECT id FROM memories
         |WHERE NOT (source LIKE 'src1%' AND NOT pinned) ORDER BY id""".stripMargin,
    "m7_add_links" ->
      s"""WITH ${OracleCtes.memories},
         |existing AS (
         |  SELECT d.doc_id AS src, d.doc_id + 20 AS dst, 'related_to' AS link_type
         |  FROM documents d WHERE d.doc_id + 20 < (SELECT count(*) FROM documents)),
         |adds AS (
         |  SELECT id AS src, id + 40 AS dst, 'reinforces' AS link_type
         |  FROM memories WHERE id % 25 = 0 AND id + 40 < (SELECT count(*) FROM documents))
         |SELECT DISTINCT * FROM (SELECT * FROM existing UNION ALL SELECT * FROM adds)
         |ORDER BY src, dst, link_type""".stripMargin,
    "m8_rename_folder" ->
      s"""WITH ${OracleCtes.memories}
         |SELECT id, 'proj/alpha' || substring(source, 5) AS source
         |FROM memories WHERE source LIKE 'src1%' ORDER BY id""".stripMargin,
    "m9_policy_enforce" ->
      s"""WITH ${OracleCtes.memories},
         |pol AS (SELECT * FROM (VALUES
         |  ('src1', 600, 0.30, 120, 60.0),
         |  ('src', 800, 0.20, 180, 90.0),
         |  ('', 1000, 0.10, 365, 90.0))
         |  AS t(source_prefix, ttl_days, confidence_threshold, min_age_days, confidence_half_life_days)),
         |best AS (
         |  SELECT * FROM (
         |    SELECT m.id, m.created_at, m.last_reinforced_at, m.updated_at,
         |      p.source_prefix, p.ttl_days, p.confidence_threshold, p.min_age_days,
         |      p.confidence_half_life_days,
         |      row_number() OVER (PARTITION BY m.id ORDER BY len(p.source_prefix) DESC) AS rn
         |    FROM memories m JOIN pol p
         |      ON (m.source LIKE p.source_prefix || '%' OR p.source_prefix = '')
         |    WHERE NOT m.archived AND NOT m.pinned)
         |  WHERE rn = 1)
         |SELECT id, source_prefix AS policy_prefix,
         |  CASE WHEN (epoch($NowSql) - epoch(created_at)) / 86400.0 > ttl_days THEN 'archive_ttl'
         |       WHEN power(0.5, greatest((epoch($NowSql) - epoch(coalesce(last_reinforced_at, updated_at, created_at))) / 86400.0, 0.0) / confidence_half_life_days) < confidence_threshold
         |            AND (epoch($NowSql) - epoch(created_at)) / 86400.0 > min_age_days
         |         THEN 'archive_low_confidence'
         |       ELSE 'keep' END AS action
         |FROM best ORDER BY id""".stripMargin,
    "m10_audn_execute" ->
      s"""WITH ${OracleCtes.memories},
         |dec AS (
         |  SELECT doc_id AS fact_id,
         |    CASE doc_id % 5 WHEN 0 THEN 'ADD' WHEN 1 THEN 'UPDATE' WHEN 2 THEN 'DELETE'
         |      WHEN 3 THEN 'NOOP' ELSE 'CONFLICT' END AS action,
         |    (doc_id * 7) % (SELECT count(*) FROM documents) AS target_id
         |  FROM documents WHERE doc_id % 10 = 0)
         |SELECT d.fact_id, d.action,
         |  CASE WHEN d.action IN ('UPDATE', 'DELETE') AND (m.pinned OR m.archived) THEN 'NOOP'
         |       WHEN d.action IN ('UPDATE', 'DELETE') AND m.id IS NULL THEN 'NOOP'
         |       ELSE d.action END AS effective_action,
         |  d.target_id
         |FROM dec d LEFT JOIN memories m ON d.target_id = m.id
         |ORDER BY d.fact_id""".stripMargin,
    "m11_auto_link" ->
      s"""WITH ${OracleCtes.memories},
         |news AS (SELECT id, embedding FROM memories
         |  WHERE id >= (SELECT count(*) FROM documents) - 20),
         |olds AS (SELECT id, embedding FROM memories
         |  WHERE id < (SELECT count(*) FROM documents) - 20),
         |scored AS (
         |  SELECT n.id, o.id AS to_id,
         |    round(${OracleCtes.dot64("n.embedding", "o.embedding")}, 6) AS sim,
         |    row_number() OVER (PARTITION BY n.id
         |      ORDER BY round(${OracleCtes.dot64("n.embedding", "o.embedding")}, 6) DESC, o.id) AS rn
         |  FROM news n JOIN olds o ON n.id <> o.id)
         |SELECT id, to_id, sim FROM scored
         |WHERE rn <= 2 AND sim >= 0.2 ORDER BY id, to_id""".stripMargin,
    // the full add-path replay: probed top-1 decides the novelty band,
    // probed top-2 at the link threshold counts an added row's links —
    // all candidate pools restricted per incoming row to its probed cells
    "op_ingest_gateway" -> {
      val centDot = "list_sum(list_transform(range(1, 65), i -> CAST(%s[i] AS DOUBLE) * c.centroid[i]))"
      s"""WITH ${OracleCtes.memories},
         |inc AS MATERIALIZED (
         |  SELECT id + 10000 AS id,
         |    CASE WHEN id % 2 = 0 THEN (SELECT embedding FROM embeddings WHERE vec_id = 0)
         |         ELSE embedding END AS embedding
         |  FROM memories WHERE id >= (SELECT count(*) FROM documents) - 30),
         |ex AS MATERIALIZED (SELECT id, embedding FROM memories
         |  WHERE id < (SELECT count(*) FROM documents) - 30),
         |${Queries.centCtes},
         |asgx AS MATERIALIZED (
         |  SELECT oid, label AS ivf_cell FROM (
         |    SELECT m.id AS oid, c.label, row_number() OVER (PARTITION BY m.id ORDER BY
         |      ${centDot.format("m.embedding", "c.centroid")} DESC, c.label) AS rn
         |    FROM ex m, cent c) WHERE rn = 1),
         |probei AS MATERIALIZED (
         |  SELECT qid, label FROM (
         |    SELECT m.id AS qid, c.label, row_number() OVER (PARTITION BY m.id ORDER BY
         |      ${centDot.format("m.embedding", "c.centroid")} DESC, c.label) AS rn
         |    FROM inc m, cent c) WHERE rn <= 2),
         |sc AS MATERIALIZED (
         |  SELECT i.id, e.id AS cand,
         |    round(${OracleCtes.dot64("i.embedding", "e.embedding")}, 6) AS sim,
         |    row_number() OVER (PARTITION BY i.id
         |      ORDER BY round(${OracleCtes.dot64("i.embedding", "e.embedding")}, 6) DESC, e.id) AS rn
         |  FROM inc i JOIN probei p ON p.qid = i.id
         |  JOIN asgx a ON a.ivf_cell = p.label
         |  JOIN ex e ON e.id = a.oid),
         |top1 AS (SELECT id, cand AS top_match_id, sim AS top_sim FROM sc WHERE rn = 1),
         |lnk AS (SELECT id, count(*) AS n FROM sc WHERE rn <= 2 AND sim >= 0.2 GROUP BY 1)
         |SELECT i.id,
         |  CASE WHEN t.top_sim IS NULL OR t.top_sim < 0.88
         |       THEN 'added' ELSE 'skipped_duplicate' END AS action,
         |  t.top_sim, t.top_match_id,
         |  CAST(CASE WHEN t.top_sim IS NULL OR t.top_sim < 0.88
         |       THEN coalesce(l.n, 0) ELSE 0 END AS BIGINT) AS n_links
         |FROM inc i LEFT JOIN top1 t ON t.id = i.id LEFT JOIN lnk l ON l.id = i.id
         |ORDER BY i.id""".stripMargin
    },
    // the gateway SQL with the in-batch D3 pass in front: the dup-pair CTE
    // (top-5-neighbor semantics, the d3 oracle's) runs over the INCOMING
    // batch at the novelty band; dropped ids report skipped_in_batch and
    // only survivors enter the probe/top-1/link replay
    "op_ingest_gateway_dedup" -> {
      val centDot = "list_sum(list_transform(range(1, 65), i -> CAST(%s[i] AS DOUBLE) * c.centroid[i]))"
      s"""WITH ${OracleCtes.memories},
         |inc AS MATERIALIZED (
         |  SELECT id + 10000 AS id,
         |    CASE WHEN id % 2 = 0 THEN (SELECT embedding FROM embeddings WHERE vec_id = 0)
         |         ELSE embedding END AS embedding
         |  FROM memories WHERE id >= (SELECT count(*) FROM documents) - 30),
         |${graft.core.OracleText.dupPairsCte(0.88, table = "inc")},
         |surv AS MATERIALIZED (
         |  SELECT id, embedding FROM inc WHERE id NOT IN (SELECT id_b FROM pr)),
         |ex AS MATERIALIZED (SELECT id, embedding FROM memories
         |  WHERE id < (SELECT count(*) FROM documents) - 30),
         |${Queries.centCtes},
         |asgx AS MATERIALIZED (
         |  SELECT oid, label AS ivf_cell FROM (
         |    SELECT m.id AS oid, c.label, row_number() OVER (PARTITION BY m.id ORDER BY
         |      ${centDot.format("m.embedding", "c.centroid")} DESC, c.label) AS rn
         |    FROM ex m, cent c) WHERE rn = 1),
         |probei AS MATERIALIZED (
         |  SELECT qid, label FROM (
         |    SELECT m.id AS qid, c.label, row_number() OVER (PARTITION BY m.id ORDER BY
         |      ${centDot.format("m.embedding", "c.centroid")} DESC, c.label) AS rn
         |    FROM surv m, cent c) WHERE rn <= 2),
         |sc AS MATERIALIZED (
         |  SELECT i.id, e.id AS cand,
         |    round(${OracleCtes.dot64("i.embedding", "e.embedding")}, 6) AS sim,
         |    row_number() OVER (PARTITION BY i.id
         |      ORDER BY round(${OracleCtes.dot64("i.embedding", "e.embedding")}, 6) DESC, e.id) AS rn
         |  FROM surv i JOIN probei p ON p.qid = i.id
         |  JOIN asgx a ON a.ivf_cell = p.label
         |  JOIN ex e ON e.id = a.oid),
         |top1 AS (SELECT id, cand AS top_match_id, sim AS top_sim FROM sc WHERE rn = 1),
         |lnk AS (SELECT id, count(*) AS n FROM sc WHERE rn <= 2 AND sim >= 0.2 GROUP BY 1)
         |SELECT i.id,
         |  CASE WHEN t.top_sim IS NULL OR t.top_sim < 0.88
         |       THEN 'added' ELSE 'skipped_duplicate' END AS action,
         |  t.top_sim, t.top_match_id,
         |  CAST(CASE WHEN t.top_sim IS NULL OR t.top_sim < 0.88
         |       THEN coalesce(l.n, 0) ELSE 0 END AS BIGINT) AS n_links
         |FROM surv i LEFT JOIN top1 t ON t.id = i.id LEFT JOIN lnk l ON l.id = i.id
         |UNION ALL
         |SELECT id, 'skipped_in_batch' AS action, CAST(NULL AS DOUBLE) AS top_sim,
         |  CAST(NULL AS BIGINT) AS top_match_id, CAST(0 AS BIGINT) AS n_links
         |FROM inc WHERE id IN (SELECT id_b FROM pr)
         |ORDER BY id""".stripMargin
    },
    // m11's SQL with the candidate pool restricted per NEW doc to its
    // nprobe=2 probed cells of the index over the pre-add store
    "m11_auto_link_indexed" -> {
      val centDot = "list_sum(list_transform(range(1, 65), i -> CAST(%s[i] AS DOUBLE) * c.centroid[i]))"
      s"""WITH ${OracleCtes.memories},
         |news AS MATERIALIZED (SELECT id, embedding FROM memories
         |  WHERE id >= (SELECT count(*) FROM documents) - 20),
         |olds AS MATERIALIZED (SELECT id, embedding FROM memories
         |  WHERE id < (SELECT count(*) FROM documents) - 20),
         |${Queries.centCtes},
         |asgo AS MATERIALIZED (
         |  SELECT oid, label AS ivf_cell FROM (
         |    SELECT m.id AS oid, c.label, row_number() OVER (PARTITION BY m.id ORDER BY
         |      ${centDot.format("m.embedding", "c.centroid")} DESC, c.label) AS rn
         |    FROM olds m, cent c) WHERE rn = 1),
         |probei AS MATERIALIZED (
         |  SELECT qid, label FROM (
         |    SELECT m.id AS qid, c.label, row_number() OVER (PARTITION BY m.id ORDER BY
         |      ${centDot.format("m.embedding", "c.centroid")} DESC, c.label) AS rn
         |    FROM news m, cent c) WHERE rn <= 2),
         |scored AS (
         |  SELECT n.id, o.id AS to_id,
         |    round(${OracleCtes.dot64("n.embedding", "o.embedding")}, 6) AS sim,
         |    row_number() OVER (PARTITION BY n.id
         |      ORDER BY round(${OracleCtes.dot64("n.embedding", "o.embedding")}, 6) DESC, o.id) AS rn
         |  FROM news n JOIN probei p ON p.qid = n.id
         |  JOIN asgo a ON a.ivf_cell = p.label
         |  JOIN olds o ON o.id = a.oid)
         |SELECT id, to_id, sim FROM scored
         |WHERE rn <= 2 AND sim >= 0.2 ORDER BY id, to_id""".stripMargin
    },
    "r13_reinforce" ->
      s"""WITH ${OracleCtes.memories},
         |$vecTopIds
         |SELECT id, $NowSql AS last_reinforced_at FROM vtop ORDER BY id""".stripMargin,
    "m12_version_chain" ->
      s"""WITH RECURSIVE ${OracleCtes.memories},
         |$versionsCte,
         |chain AS (
         |  SELECT id AS head_id, id AS version_id, supersedes AS sup,
         |         CAST(0 AS INT) AS depth
         |  FROM versions WHERE is_latest AND supersedes IS NOT NULL
         |  UNION ALL
         |  SELECT c.head_id, v.id, v.supersedes, c.depth + 1
         |  FROM chain c JOIN versions v ON c.sup = v.id)
         |SELECT head_id, version_id, depth FROM chain
         |ORDER BY head_id, depth""".stripMargin,
    "o7_as_of_snapshot" ->
      s"""WITH ${OracleCtes.memories},
         |$versionsCte,
         |succ AS (SELECT supersedes AS pid, created_at AS valid_to
         |         FROM versions WHERE supersedes IS NOT NULL)
         |SELECT v.id, v.supersedes, v.source, v.created_at
         |FROM versions v LEFT JOIN succ s ON v.id = s.pid
         |WHERE v.created_at <= TIMESTAMP '2024-01-01 00:00:00' + to_seconds(17280000)
         |  AND (s.valid_to IS NULL
         |       OR s.valid_to > TIMESTAMP '2024-01-01 00:00:00' + to_seconds(17280000))
         |ORDER BY v.id""".stripMargin,
    "a9_audit_query" ->
      s"""WITH $auditCte,
         |f AS MATERIALIZED (SELECT * FROM audit
         |  WHERE action = 'memory.search' AND key_id = 'k3')
         |SELECT f.*, (SELECT count(*) FROM f) AS total_matched
         |FROM f ORDER BY id DESC LIMIT 25 OFFSET 10""".stripMargin,
    "a9_audit_purge" ->
      s"""WITH $auditCte
         |SELECT id, ts, action FROM audit
         |WHERE ts >= TIMESTAMP '2024-01-21 00:00:00'
         |ORDER BY id""".stripMargin
  )
}
