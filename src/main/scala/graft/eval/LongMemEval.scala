package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.embed.HashingEmbedder
import graft.functions.{TextFunctions, VectorFunctions}
import graft.search.{BM25, HybridSearch}

/** LongMemEval-shaped retrieval benchmark — the deterministic analog of the
  * reference's flagship published metric (eval/run_longmemeval.py:1-14,
  * eval/longmemeval.py:19-40; README headline Recall@5 98.3%). The LLM
  * judge half is out of scope; this is the RETRIEVAL half, which is pure
  * IR methodology: seed haystack sessions as memories, ask a question set,
  * score session-level Recall@5 against labeled evidence, report per
  * category.
  *
  * Protocol (every step deterministic and oracle-expressible):
  *
  *  - SESSIONS: each fixture document is one conversation session
  *    (MemPalace's one-doc-per-session convention, the methodology the
  *    reference's `compute_recall_at_k` docstring cites —
  *    eval/longmemeval.py:255-268). Sessions are chunked into TWO memories
  *    on the token midpoint (the reference chunks sessions into bounded
  *    memories and dedups results back to sessions), with memory id =
  *    2·session + chunk and source `eval/lme/b{bucket}/s{session}/c{chunk}`
  *    — the reference's `/s{idx}/c{chunk}` source shape.
  *  - HAYSTACKS: per-question scoped corpora, like the reference's
  *    per-question source prefixes. Question q's haystack is the sessions
  *    with `session % NumBuckets == q % NumBuckets` — its gold session
  *    plus ~1/NumBuckets of the corpus as distractors, scope-addressable
  *    by the source prefix `eval/lme/b{bucket}/`.
  *  - QUESTIONS: every `SampleMod`-th document with ≥ 8 tokens asks about
  *    its own session; the question text is NOT a truncation of the
  *    document (the self-retrieval shortcut) but one of three lossy
  *    views, which double as the reported categories:
  *      qid % 3 == 0 → `interleaved`     — every 2nd token (a paraphrase-
  *                                         grade scramble of the evidence)
  *      qid % 3 == 1 → `verbatim-tail`   — the second token half (an exact
  *                                         quote from the gold session's
  *                                         SECOND chunk)
  *      qid % 3 == 2 → `sparse-keywords` — every 4th token (keyword soup)
  *  - RETRIEVAL: the engine's real hybrid plan — vector + BM25 RRF with
  *    the default weight resolution (vectorWeight 0.7 → 0.7/0.3), RrfK
  *    60, oversample = 3k branch cutoffs, k = [[RetrievalK]] — scoped to
  *    the question's haystack. LongMemEvalSpec pins this batch formulation
  *    result-for-result against [[graft.search.HybridSearch.search]] run
  *    per-question over the seeded frame with the source-prefix filter.
  *  - SCORING: the reference's session-level recall@5
  *    (eval/longmemeval.py:262-305): dedup the top-[[RetrievalK]] chunk
  *    results to unique sessions by first appearance, take the first
  *    [[SessionK]]; recall_any = 1 iff the gold session is among them.
  *
  * Scale shape: questions are bounded ([[MaxQuestions]]) and ride
  * broadcasts; chunk scoring joins are bucket-equi-joins (each question
  * scores only its haystack, never the corpus); every rank window is
  * PARTITIONED BY qid over a branch-bounded pool (≤ oversample rows per
  * question); the BM25 index is the one global [[BM25.batchScores]] stats
  * pass (corpus-wide df, exactly like the engine's serving path, which
  * scores on the global index and post-filters scope).
  */
object LongMemEval {

  /** Haystack count: sessions are dealt into this many scoped corpora. */
  val NumBuckets = 16L

  /** Every SampleMod-th document becomes a question (RetrievalEval's rule). */
  val SampleMod = 37L

  val MaxQuestions = 256
  /** Chunk results retrieved per question (reference retrieval_k = 50). */
  val RetrievalK = 50
  /** Unique sessions scored against gold (the "@5" of Recall@5). */
  val SessionK = 5

  /** PRF trigger (r9 verdict #3): questions with ≤ this many DISTINCT
    * terms get RM3 expansion — the sparse-keyword regime `ev_longmem_gap`
    * names as the weak category. Query-property-based, never
    * category-based: any question sparse enough triggers. */
  val PrfTriggerTerms = 6
  val PrfFbDocs = 10
  val PrfTerms = 5
  val PrfBeta = 0.4

  private val emb = HashingEmbedder(64)

  /** Session chunks: (id, session, bucket, text). Chunk 0 = first
    * ceil(n/2) tokens, chunk 1 = the rest (absent for 1-token docs);
    * id = 2·session + chunk. */
  def chunks(docs: DataFrame): DataFrame = {
    val t = TextFunctions.tokens(col("text"))
    val half = ((size(col("_t")) + 1) / 2).cast("int")
    docs.select(col("id").as("session"), t.as("_t"))
      .filter(size(col("_t")) >= 1)
      .select(col("session"), col("_t"),
        explode(when(size(col("_t")) > half, array(lit(0), lit(1)))
          .otherwise(array(lit(0)))).as("chunk"))
      .select(
        (col("session") * 2 + col("chunk")).as("id"),
        col("session"),
        pmod(col("session"), lit(NumBuckets)).as("bucket"),
        array_join(
          when(col("chunk") === 0, slice(col("_t"), lit(1), half))
            .otherwise(slice(col("_t"), half + 1, size(col("_t")))), " ")
          .as("text"))
  }

  // ---- planted vocabulary-mismatch families (r10/r11 verdict: the
  // fixture corpus has a saturated vocabulary — ~every term in over half
  // the docs, so idf ≤ 0 and RM3 can never mine a positive-weight
  // expansion term from it; the lift metric was structurally 0.0). The
  // standard IR-eval remedy is PLANTED NEEDLES: small probe haystacks in
  // their own buckets (16+g — disjoint from the 16 real buckets, so no
  // real question's haystack changes) whose vocabulary is unique, hence
  // positive-idf. Each group g plants: a GOLD session whose text shares
  // NO term with the question; two FEEDBACK sessions carrying the query
  // term plus a gold term (the RM3 bridge); and distractor sessions with
  // their own noise vocabulary. Base retrieval can only find gold via
  // hash-embedding noise; PRF mines the bridge term from the feedback
  // docs and scores gold through it — the lift the metric exists to
  // measure. Probe chunk texts are specified EXACTLY (2 tokens per chunk)
  // so the oracle generates identical rows without re-deriving the
  // midpoint split.

  val ProbeGroups = 12
  val ProbeDistractors = 12
  /** Probe session ids start far above any fixture doc id (sf1 ≈ 5·10⁵). */
  val ProbeBase = 10000000L

  /** Probe chunk rows, same shape as [[chunks]]: (id, session, bucket,
    * text). */
  def probeChunks(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val rows = for {
      g <- 0 until ProbeGroups
      (off, c, txt) <- Seq(
        (0, 0, s"syzygy$g quorum$g"), (0, 1, s"bezoar$g orrery$g"), // gold
        (1, 0, s"xylograph$g syzygy$g"), (1, 1, s"quorum$g"), // feedback 1
        (2, 0, s"xylograph$g quorum$g"), (2, 1, s"syzygy$g") // feedback 2
      ) ++ (0 until ProbeDistractors).flatMap(d => Seq(
        (3 + d, 0, s"drivel${g}x$d noise${g}x$d"),
        (3 + d, 1, s"blather${g}x$d prattle${g}x$d")))
    } yield {
      val session = ProbeBase + g * 32L + off
      (session * 2 + c, session, NumBuckets + g, txt)
    }
    rows.toDF("id", "session", "bucket", "text")
  }

  /** One question per probe group: the query term alone (sparse → PRF
    * triggers), gold = the group's needle session. */
  def probeQuestions(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    (0 until ProbeGroups)
      .map(g => (ProbeBase + g * 32L, NumBuckets + g,
        "planted-mismatch", s"xylograph$g"))
      .toDF("qid", "bucket", "category", "qtext")
  }

  /** The seeded memories frame — chunks wearing the engine's corpus schema
    * (visibility columns + E1 embedding + the reference's source shape) so
    * the REAL hybrid plan runs on it unmodified. */
  def seededMemories(docs: DataFrame): DataFrame =
    memoriesFromChunks(chunks(docs))

  private def memoriesFromChunks(ch: DataFrame): DataFrame =
    emb.embed(ch)
      .select(col("id"), col("text"),
        concat(lit("eval/lme/b"), col("bucket"), lit("/s"), col("session"),
          lit("/c"), pmod(col("id"), lit(2L))).as("source"),
        lit(false).as("archived"), lit(false).as("pinned"),
        lit(null).cast("timestamp").as("document_at"),
        lit(null).cast("timestamp").as("created_at"),
        lit(null).cast("timestamp").as("updated_at"),
        lit(null).cast("timestamp").as("last_reinforced_at"),
        lit("session-chunk").as("category"),
        col("embedding"), col("session"), col("bucket"))

  /** The bounded question set: (qid, bucket, category, qtext). */
  def questions(docs: DataFrame): DataFrame = {
    val t = TextFunctions.tokens(col("text"))
    val pick = (step: Int, from: Column) =>
      array_join(transform(sequence(from, size(col("_t")), lit(step)),
        i => element_at(col("_t"), i)), " ")
    docs.select(col("id").as("qid"), t.as("_t"))
      .filter(col("qid") % SampleMod === 0 && size(col("_t")) >= 8)
      .select(col("qid"), pmod(col("qid"), lit(NumBuckets)).as("bucket"),
        when(col("qid") % 3 === 0, "interleaved")
          .when(col("qid") % 3 === 1, "verbatim-tail")
          .otherwise("sparse-keywords").as("category"),
        when(col("qid") % 3 === 0, pick(2, lit(1)))
          .when(col("qid") % 3 === 1,
            pick(1, ((size(col("_t")) + 1) / 2).cast("int") + 1))
          .otherwise(pick(4, lit(1))).as("qtext"))
      // hash-spread cut, not first-N-by-id (the r15-verdict sample-bias
      // fix): at a binding cap the question sample spans the whole id
      // range instead of the oldest ingest slice
      .orderBy(graft.functions.SparkHash.spread(col("qid")), col("qid"))
      .limit(MaxQuestions)
  }

  /** Per-question top-[[RetrievalK]] chunk results under the hybrid plan:
    * (qid, id, session, crn) with crn the 1-based result rank. The batch
    * (set-based) formulation of [[HybridSearch.search]] over every scoped
    * haystack at once — same weights, same RrfK, same oversample cutoffs,
    * same (score desc, id asc) ties; LongMemEvalSpec pins the equality. */
  def batchResults(docs: DataFrame): DataFrame =
    batchResultsFrom(seededMemories(docs).localCheckpoint(true),
      questions(docs).localCheckpoint(true))

  private def batchResultsFrom(mem: DataFrame, qs: DataFrame,
                               prf: Boolean = false): DataFrame = {
    val w = HybridSearch.Weights.resolve(0.7, 0.0, 0.0, 0.0)
    val k = RetrievalK
    val oversample = 3 * k
    // vector branch: scoped bucket join, per-qid rank over sims
    val qVecs = qs.select(col("qid"), col("bucket"),
      emb.embeddingColumn(col("qtext")).as("qvec"))
    val vScored = mem.select(col("id"), col("bucket"), col("embedding"))
      .join(broadcast(qVecs), "bucket")
      .select(col("qid"), col("id"),
        VectorFunctions.roundScore(
          VectorFunctions.dot(col("embedding"), col("qvec"))).as("sim"))
    val vw = Window.partitionBy("qid").orderBy(desc("sim"), asc("id"))
    val vContrib = vScored.withColumn("rn", row_number().over(vw))
      .filter(col("rn") <= oversample)
      .select(col("qid"), col("id"),
        (lit(w.vec) / (col("rn") - 1 + HybridSearch.RrfK)).as("c"))
    // bm25 branch: global index stats (the engine scores on the corpus-wide
    // index and post-filters scope — BM25.ranked's exact order of
    // operations), then scope filter, positives, per-qid rank
    val qTerms = qs
      .select(col("qid"), explode(TextFunctions.tokens(col("qtext"))).as("term"))
      .groupBy("qid", "term").agg(count(lit(1)).as("qn"))
    val bBase0 = BM25.batchScores(mem, qTerms)
      .join(mem.select(col("id"), col("bucket")), "id")
      .join(broadcast(qs.select(col("qid"), col("bucket"))), Seq("qid", "bucket"))
      .filter(col("bm25") > 0)
    // under PRF the base ranking is read twice (feedback mining + the
    // combination); one checkpoint, not two executions
    val bBase = if (prf) bBase0.localCheckpoint(true) else bBase0
    val bw = Window.partitionBy("qid").orderBy(desc("bm25"), asc("id"))
    // the batch RM3 form of BM25.prfCombinedScores, per TRIGGERED qid:
    // feedback docs = the scoped top-PrfFbDocs of the base ranking, mined
    // expansion terms = top-PrfTerms positive Σtf·idf non-query terms,
    // effective score = base + β·expansion. Untriggered questions simply
    // contribute no expansion rows, so one uniform combination serves all.
    val bEff = if (!prf) bBase else {
      val trig = qs.filter(
        size(array_distinct(TextFunctions.tokens(col("qtext")))) <= PrfTriggerTerms)
        .select("qid")
      val fb = bBase.join(broadcast(trig), Seq("qid"), "left_semi")
        .withColumn("rn", row_number().over(bw))
        .filter(col("rn") <= PrfFbDocs)
        .select("qid", "id")
      val (tfTab, idfTab) = BM25.miningStats(mem)
      val qTermSet = qs.select(col("qid"),
        explode(array_distinct(TextFunctions.tokens(col("qtext")))).as("term"))
      val ww = Window.partitionBy("qid").orderBy(desc("w"), asc("term"))
      val expTerms = tfTab.join(fb, "id")
        .join(idfTab.select("term", "idf"), "term")
        .join(qTermSet, Seq("qid", "term"), "left_anti")
        .groupBy("qid", "term").agg(round(sum(col("tf") * col("idf")), 6).as("w"))
        .filter(col("w") > 0)
        .withColumn("wrn", row_number().over(ww))
        .filter(col("wrn") <= PrfTerms)
        .select(col("qid"), col("term"), lit(1L).as("qn"))
      val expScored = BM25.batchScores(mem, expTerms)
        .join(mem.select(col("id"), col("bucket")), "id")
        .join(broadcast(qs.select(col("qid"), col("bucket"))), Seq("qid", "bucket"))
        .select(col("qid"), col("id"), col("bm25").as("bm25e"))
      bBase.select("qid", "id", "bm25")
        .join(expScored, Seq("qid", "id"), "full_outer")
        .select(col("qid"), col("id"),
          round(coalesce(col("bm25"), lit(0.0))
            + lit(PrfBeta) * coalesce(col("bm25e"), lit(0.0)), 6).as("bm25"))
        .filter(col("bm25") > 0)
    }
    val bContrib = bEff.withColumn("rn", row_number().over(bw))
      .filter(col("rn") <= oversample)
      .select(col("qid"), col("id"),
        (lit(w.bm25) / (col("rn") - 1 + HybridSearch.RrfK)).as("c"))
    // fuse and rank chunks (≤ 2 contributions per (qid, id): the double
    // sum is order-free because IEEE addition is commutative)
    val cw = Window.partitionBy("qid").orderBy(desc("rrf"), asc("id"))
    vContrib.unionAll(bContrib)
      .groupBy("qid", "id").agg(sum("c").as("rrf"))
      .withColumn("crn", row_number().over(cw))
      .filter(col("crn") <= k)
      .withColumn("session", expr("id div 2"))
      .select("qid", "id", "session", "crn")
  }

  /** The benchmark: (category, n_questions, recall_any_at_5) per question
    * category plus the `overall` row — the engine's analog of the
    * reference's published Recall@5 table. */
  def recallAt5(docs: DataFrame): DataFrame = {
    // one materialization of the bounded question set feeds both the
    // batch retrieval and the scoring join — questions(docs) is a full
    // docs scan and must not run twice inside the benchmark's own path
    val qs = questions(docs).localCheckpoint(true)
    val res = batchResultsFrom(seededMemories(docs).localCheckpoint(true), qs)
    val hits = hitsFrom(res, qs)
    val byCat = hits.groupBy("category")
      .agg(count(lit(1)).as("n_questions"),
        round(avg(col("hit")), 6).as("recall_any_at_5"))
    val overall = hits.groupBy()
      .agg(count(lit(1)).as("n_questions"),
        round(avg(col("hit")), 6).as("recall_any_at_5"))
      .select(lit("overall").as("category"), col("n_questions"),
        col("recall_any_at_5"))
    byCat.unionAll(overall).orderBy("category")
  }

  /** Session-level recall-any hits per question: (qid, category, hit) —
    * dedup result chunks → sessions by first appearance, top [[SessionK]],
    * hit iff the gold session is among them. */
  private def hitsFrom(res: DataFrame, qs: DataFrame): DataFrame = {
    val sw = Window.partitionBy("qid").orderBy(asc("srn"))
    val topSessions = res.groupBy("qid", "session")
      .agg(min("crn").as("srn"))
      .withColumn("sk", row_number().over(sw))
      .filter(col("sk") <= SessionK)
    qs.alias("q")
      .join(topSessions.alias("s"),
        col("s.qid") === col("q.qid") && col("s.session") === col("q.qid"),
        "left")
      .groupBy(col("q.qid").as("qid"), col("q.category").as("category"))
      .agg(max(when(col("s.session").isNotNull, 1).otherwise(0)).as("hit"))
  }

  /** The PRF on/off comparison (r9 verdict #3): per-category recall-any@5
    * under the base plan vs the plan with RM3 expansion behind the
    * sparse-query trigger, plus the lift. The trigger is a property of
    * the QUERY (≤ [[PrfTriggerTerms]] distinct terms), so rich categories
    * ride through both runs untouched — their rows double as the
    * do-no-harm control. */
  def prfRecallLift(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    // the real question families PLUS the planted-mismatch probes: the
    // probes live in their own buckets, so every real haystack is
    // untouched; the global BM25 stats shift by the ~500 probe chunks
    // (idf is corpus-global — both engines recompute identically)
    val qs = questions(docs).unionByName(probeQuestions(spark))
      .localCheckpoint(true)
    val mem = memoriesFromChunks(
        chunks(docs).unionByName(probeChunks(spark)))
      .localCheckpoint(true)
    val hBase = hitsFrom(batchResultsFrom(mem, qs), qs)
    val hPrf = hitsFrom(batchResultsFrom(mem, qs, prf = true), qs)
    def perCat(h: DataFrame, cName: String): DataFrame = {
      val byCat = h.groupBy("category")
        .agg(count(lit(1)).as("n_questions"), round(avg(col("hit")), 6).as(cName))
      val overall = h.groupBy()
        .agg(count(lit(1)).as("n_questions"), round(avg(col("hit")), 6).as(cName))
        .select(lit("overall").as("category"), col("n_questions"), col(cName))
      byCat.unionAll(overall)
    }
    perCat(hBase, "recall_base")
      .join(perCat(hPrf, "recall_prf").drop("n_questions"), "category")
      .withColumn("lift", round(col("recall_prf") - col("recall_base"), 6))
      .orderBy("category")
  }

  /** Chunk-level nDCG@`k` per question category (+ overall) — the graded
    * companion to [[recallAt5]]: where recall-any asks "was the gold
    * session found at all", nDCG scores WHERE its chunks landed, with the
    * standard 1/log2(rank+1) discount (Järvelin-Kekäläinen '02, public).
    * Gains are 1 for each chunk of the question's own session, so
    * IDCG = Σ_{i≤min(nGoldChunks,k)} 1/log2(i+1) and a question with both
    * gold chunks at ranks 1–2 scores exactly 1.0.
    *
    * Determinism contract: every discount is rounded to integer
    * micro-units BEFORE any sum (the unigramNll ln discipline — log2 is
    * the only transcendental and it is 6dp-hardened on both sides), each
    * question's nDCG becomes one mirrored micro-unit division, and the
    * category average is an order-free BIGINT sum. */
  def ndcgAt10(docs: DataFrame, k: Int = 10): DataFrame = {
    val qs = questions(docs).localCheckpoint(true)
    val mem = seededMemories(docs).localCheckpoint(true)
    val res = batchResultsFrom(mem, qs)
    val discMicro = (r: Column) =>
      round(lit(1e6) / log2(r.cast("double") + 1), 0).cast("long")
    val dcg = res.filter(col("crn") <= k && col("session") === col("qid"))
      .groupBy("qid").agg(sum(discMicro(col("crn"))).as("dcg_micro"))
    val gn = mem.groupBy("session").agg(count(lit(1)).as("ng"))
    val perQ = qs.join(gn.withColumnRenamed("session", "qid"), "qid")
      .withColumn("idcg_micro",
        aggregate(sequence(lit(1), least(col("ng"), lit(k.toLong)).cast("int")),
          lit(0L), (acc, i) => acc + discMicro(i)))
      .join(dcg, Seq("qid"), "left")
      .select(col("qid"), col("category"),
        round(lit(1e6) * coalesce(col("dcg_micro"), lit(0L)).cast("double")
          / col("idcg_micro"), 0).cast("long").as("ndcg_micro"))
    val byCat = perQ.groupBy("category")
      .agg(count(lit(1)).as("n_questions"),
        round(sum("ndcg_micro").cast("double") / count(lit(1)) / 1e6, 6)
          .as("ndcg_at_10"))
    val overall = perQ.groupBy()
      .agg(count(lit(1)).as("n_questions"),
        round(sum("ndcg_micro").cast("double") / count(lit(1)) / 1e6, 6)
          .as("ndcg_at_10"))
      .select(lit("overall").as("category"), col("n_questions"),
        col("ndcg_at_10"))
    byCat.unionAll(overall).orderBy("category")
  }
}
