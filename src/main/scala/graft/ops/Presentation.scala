package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.search.VectorSearch

/** O2-O6: ordering / pagination / presentation operators
  * (reference memory_engine.py:1318-1320, 2348-2390; app.py:2646-2667;
  * mcp-server/index.js:261-331; evidence_packet.py:91-161). */
object Presentation {

  /** O2: pagination over a deterministic ordering. Spark 3.4+ has a native
    * global `offset` (planned as GlobalLimit/Offset — no window needed). */
  def paginate(df: DataFrame, orderCol: String, offset: Int, limit: Int): DataFrame =
    df.orderBy(col(orderCol).asc).offset(offset).limit(limit)

  /** hasUserFact predicate (mcp-server/index.js:169-175): non-empty text;
    * a `user:` line wins over an `assistant:` line; neither marker = fact. */
  def userFact(text: Column): Column =
    trim(text) =!= "" &&
      (text.rlike("(?im)^\\s*user\\s*:") || !text.rlike("(?im)^\\s*assistant\\s*:"))

  /** O3: timeline — fan out query variants, union, dedupe by
    * (id, source, date), optionally keep only user-stated facts, sort
    * chronologically ascending with undated rows first
    * (mcp-server/index.js:261-331: dedupe key at :305, hasUserFact filter at
    * :304, chronologicalValue sort with NaN → -inf at :163-167). */
  def timeline(memories: DataFrame, queryVecs: Seq[Seq[Float]], perQueryK: Int = 20,
               userFactsOnly: Boolean = false): DataFrame = {
    val branches = queryVecs.map(v =>
      VectorSearch.topK(memories, v, perQueryK)
        .select(col("id"), col("source"), col("text"),
          coalesce(col("document_at"), col("created_at")).as("date")))
    val merged = branches.reduce(_ unionAll _).dropDuplicates("id", "source", "date")
    val kept = if (userFactsOnly) merged.filter(userFact(col("text"))) else merged
    kept.select("id", "source", "date").orderBy(asc_nulls_first("date"), asc("id"))
  }

  /** [[timeline]] answered from the persisted IVF index (r14 verdict
    * next-round #4 — the variant fan-out was the last multi-scan read
    * path not routed through the indexes): ALL query variants probe in
    * ONE [[graft.ann.IvfIndex.probedCandidatesBatch]] pass — one
    * partition-pruned assignments scan for the whole fan-out, never one
    * corpus scan per variant — then each variant's probed candidates rank
    * to its per-variant top-k (a bounded per-qid window over probed rows
    * only), the corpus contributes text/date/visibility by id-equi-join
    * (column-pruned: the vector column is never read — PlanAuditSpec),
    * and the union-dedupe-sort tail is [[timeline]]'s verbatim. Same IVF
    * recall trade as every indexed leg, adjudicated by the
    * probed-cell-restricted oracle; nprobe = cell count reproduces the
    * in-session timeline exactly (PresentationSpec). */
  def timelineIndexed(spark: org.apache.spark.sql.SparkSession,
                      ivfPath: String, memories: DataFrame,
                      queryVecs: Seq[Seq[Float]], perQueryK: Int = 20,
                      userFactsOnly: Boolean = false,
                      nprobe: Int = 2): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val qdf = queryVecs.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("qid", "qv")
    val attrs = memories
      .filter(graft.search.Filters.visible(None, includeArchived = false,
        None, None))
      .select(col("id"), col("source"), col("text"),
        coalesce(col("document_at"), col("created_at")).as("date"))
    val ranked = graft.ann.IvfIndex
      .probedCandidatesBatch(spark, ivfPath, qdf, nprobe)
      .join(attrs, Seq("id"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy("qid").orderBy(desc("sim"), asc("id"))))
      .filter(col("_rn") <= perQueryK)
    val merged = ranked.dropDuplicates("id", "source", "date")
    val kept = if (userFactsOnly) merged.filter(userFact(col("text"))) else merged
    kept.select("id", "source", "date").orderBy(asc_nulls_first("date"), asc("id"))
  }

  /** Query regex that flips the evidence ranking to recency-first
    * (evidence_packet.py:53-56). */
  val RecencyQueryRe: String =
    "(?i).*\\b(latest|current|now|recent|changed|newest|today|yesterday)\\b.*"

  /** O4 follow-up query generation (evidence_packet.py:68-90): the cleaned
    * query plus latest/current/what-changed variants, deduped
    * case-insensitively in order. */
  def followUpQueries(query: String): Seq[String] = {
    val clean = query.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
    if (clean.isEmpty) Nil
    else {
      val lowered = clean.toLowerCase
      val cands = Seq(clean) ++
        (if (!lowered.startsWith("latest ")) Seq(s"latest $clean") else Nil) ++
        (if (!lowered.startsWith("current ")) Seq(s"current $clean") else Nil) ++
        (if (!lowered.startsWith("what changed")) Seq(s"what changed about $clean") else Nil)
      val seen = scala.collection.mutable.Set.empty[String]
      cands.filter(c => seen.add(c.toLowerCase))
    }
  }

  /** O4: evidence packet (evidence_packet.py:40-161). Hits are ranked by the
    * reference's rank key — recency-preferring (dated, date, score,
    * is_latest) when the query matches [[RecencyQueryRe]], score-first
    * otherwise — then every non-top row is classified against the current
    * candidate (older / archived / dated_unranked / supporting) and the
    * source-date trail (current + supporting + older, capped 10) is emitted
    * with the packet-level confidence (low = undated current, medium = older
    * evidence present, high otherwise). */
  def evidencePacket(memories: DataFrame, queryVec: Seq[Float], queryText: String = "",
                     k: Int = 20): DataFrame = {
    val hits = VectorSearch.topK(memories, queryVec, k, includeArchived = true)
      .select(col("id"), col("source"), col("sim"),
        coalesce(col("document_at"), col("updated_at"), col("created_at")).as("date"),
        coalesce(col("archived"), lit(false)).as("archived"),
        coalesce(col("is_latest"), lit(false)).as("is_latest"))
    packetTail(hits, queryText)
  }

  /** [[evidencePacket]] answered from the persisted IVF index (r15 verdict
    * next-round #5 — the packet's vector leg was the last presentation
    * read path brute-scanning the corpus per query): the candidate stage
    * is ONE partition-pruned probed-cell scan
    * ([[graft.ann.IvfIndex.probedCandidates]] — id + 6dp sim, the same
    * rounding as the in-session leg), the corpus contributes
    * source/dates/flags by id-equi-join (column-pruned: the vector column
    * is never read and no corpus row is re-embedded — PlanAuditSpec), and
    * the rank-key/relation/confidence/trail tail is [[evidencePacket]]'s
    * verbatim. The packet keeps archived rows VISIBLE exactly like the
    * in-session leg (includeArchived = true — archived evidence is what
    * the `archived` relation classifies), so no visibility filter applies
    * here either. Same IVF recall trade as every indexed leg, adjudicated
    * by the probed-cell-restricted oracle; nprobe = cell count reproduces
    * the in-session packet exactly (PresentationSpec). */
  def evidencePacketIndexed(spark: org.apache.spark.sql.SparkSession,
                            ivfPath: String, memories: DataFrame,
                            queryVec: Seq[Float], queryText: String = "",
                            k: Int = 20, nprobe: Int = 2): DataFrame =
    packetTail(
      evidenceHitsIndexed(spark, ivfPath, memories, queryVec, k, nprobe),
      queryText)

  /** [[evidencePacketIndexed]]'s candidate stage, separated so
    * PlanAuditSpec can pin its scan shape directly (the packet tail
    * checkpoints the ≤k hit rows, which truncates the visible lineage —
    * the [[graft.search.LateInteraction.indexedPool]] precedent). */
  private[graft] def evidenceHitsIndexed(
      spark: org.apache.spark.sql.SparkSession, ivfPath: String,
      memories: DataFrame, queryVec: Seq[Float], k: Int,
      nprobe: Int): DataFrame = {
    val attrs = memories.select(col("id"), col("source"),
      coalesce(col("document_at"), col("updated_at"), col("created_at")).as("date"),
      coalesce(col("archived"), lit(false)).as("archived"),
      coalesce(col("is_latest"), lit(false)).as("is_latest"))
    graft.ann.IvfIndex.probedCandidates(spark, ivfPath, queryVec, nprobe)
      .join(attrs, Seq("id"))
      .orderBy(desc("sim"), asc("id")).limit(k)
      .select("id", "source", "sim", "date", "archived", "is_latest")
  }

  /** The packet tail shared by the in-session and index-backed legs (so
    * the classification cannot drift): rank by the reference's rank key,
    * classify every non-top row against the current candidate, emit the
    * capped source-date trail with the packet-level confidence. `hits` is
    * any ≤k-row frame of (id, source, sim, date, archived, is_latest). */
  private def packetTail(hits: DataFrame, queryText: String): DataFrame = {
    val preferRecency = queryText.matches(RecencyQueryRe)
    val w = org.apache.spark.sql.expressions.Window
    // rank key (evidence_packet.py:59-64); id asc reproduces Python's
    // stable sort (full-key ties imply equal sim, i.e. original id order)
    val orderCols =
      if (preferRecency)
        Seq(col("date").isNotNull.desc, col("date").desc, col("sim").desc,
          col("is_latest").desc, col("id").asc)
      else
        Seq(col("sim").desc, col("date").isNotNull.desc, col("date").desc,
          col("is_latest").desc, col("id").asc)
    // eager checkpoint: the <=k ranked rows feed the rank-1 broadcast, the
    // n_older aggregate AND the final projection — without it the corpus
    // top-k scan executes three times (same shape as HybridSearch.explain)
    val ranked = hits.withColumn("rank", row_number().over(w.orderBy(orderCols: _*)))
      .localCheckpoint(true)
    val cur = ranked.filter(col("rank") === 1).select(col("date").as("cur_date"))
    val rel = ranked.crossJoin(broadcast(cur))
      .withColumn("relation",
        when(col("rank") === 1, "current")
          .when(col("cur_date").isNotNull && col("date").isNotNull &&
            col("date") < col("cur_date"), "older")
          .when(col("archived"), "archived")
          .when(col("cur_date").isNull && col("date").isNotNull, "dated_unranked")
          .otherwise("supporting"))
    val nOlder = rel
      .agg(sum(when(col("relation").isin("older", "archived", "dated_unranked"), 1)
        .otherwise(0)).as("n_older"))
    rel.crossJoin(broadcast(nOlder))
      .withColumn("confidence_level",
        when(col("cur_date").isNull, "low")
          .when(col("n_older") > 0, "medium")
          .otherwise("high"))
      .withColumn("trail_pos", row_number().over(w.orderBy(
        when(col("relation") === "current", 0)
          .when(col("relation") === "supporting", 1).otherwise(2).asc,
        col("rank").asc)).cast("int"))
      .filter(col("trail_pos") <= 10)
      .select(col("trail_pos"), col("id"), col("source"), col("relation"),
        col("sim").as("score"), col("confidence_level"))
      .orderBy("trail_pos")
  }

  /** O5: sorted distinct sources (memory_engine.py:1318-1320). */
  def distinctSources(memories: DataFrame): DataFrame =
    memories.select("source").distinct().orderBy("source")

  /** O6: counts — total / prefix-filtered / archived-excluded in one pass
    * (memory_engine.py:2348-2369). */
  def counts(memories: DataFrame, prefix: String): DataFrame =
    memories.agg(
      count(lit(1)).as("total"),
      sum(when(col("source").startsWith(prefix), 1).otherwise(0)).as("with_prefix"),
      sum(when(!col("archived"), 1).otherwise(0)).as("visible"))

  /** O8: query-focused snippets — for each hit, the best `window`-token
    * span by query-term density (the keyword-in-context highlight every
    * search result page shows; classic passage retrieval, e.g. Callan '94
    * passage-level evidence, public). Best = most query-token occurrences,
    * ties by earliest start; documents shorter than the window emit whole.
    *
    * Scale shape: MAP-ONLY over the (already top-k-bounded) hit set — the
    * window scan is a codegen-fused fold over each doc's token array
    * (array ops, no explode, no shuffle); the argmax is array_min over
    * (-hits, start) structs, the [[graft.ann.Pq]] lexicographic-argmin
    * idiom. Output adds (start_pos, n_hits, snippet) to the input. */
  def snippets(hits: DataFrame, queryTokens: Seq[String], window: Int = 8,
               textCol: String = "text"): DataFrame = {
    val q = typedLit(queryTokens.distinct)
    val t = graft.functions.TextFunctions.tokens(col(textCol))
    val withBest = hits
      .withColumn("_t", t)
      .withColumn("_n", size(col("_t")))
      .withColumn("_w", least(col("_n"), lit(window)))
      .filter(col("_n") > 0)
      .withColumn("_best", array_min(transform(
        sequence(lit(1), col("_n") - col("_w") + 1),
        s => struct(
          (-size(org.apache.spark.sql.functions.filter(
            slice(col("_t"), s, col("_w")), x => array_contains(q, x)))).as("nh"),
          s.as("s")))))
    withBest
      .withColumn("start_pos", col("_best.s"))
      .withColumn("n_hits", (-col("_best.nh")).cast("int"))
      .withColumn("snippet",
        concat_ws(" ", slice(col("_t"), col("_best.s"), col("_w"))))
      .drop("_t", "_n", "_w", "_best", textCol)
  }
}
