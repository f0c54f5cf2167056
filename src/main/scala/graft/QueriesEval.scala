package graft

import org.apache.spark.sql.DataFrame
import graft.core.{OracleHybrid, OracleText}
import graft.search.HybridSearch

/** Registry section 6 (round 8) — retrieval benchmarking and tokenizer
  * training: the LongMemEval-shaped session-recall harness and the
  * unigram-LM (SentencePiece-style) train/tokenize pair. */
object QueriesEval {

  import Queries.Q

  val queries: Map[String, Q] = Map(
    // the engine's analog of the reference's headline Recall@5: seed
    // haystack sessions, ask lossy-view questions, score session-level
    // R@5 per category through the real hybrid (vector+BM25 RRF) plan
    "ev_longmem_recall" -> ((s, dir) =>
      graft.eval.LongMemEval.recallAt5(Queries.docs(s, dir))),
    // graded companion: chunk-level nDCG@10 per category — WHERE the gold
    // chunks landed, not just whether the session was found
    "ev_longmem_ndcg" -> ((s, dir) =>
      graft.eval.LongMemEval.ndcgAt10(Queries.docs(s, dir))),
    // gap analysis: recall-any@5 (was the session found at all) joined
    // with nDCG@10 (how well its chunks ranked) per category — the
    // found-but-buried gap per question family, in one oracled table
    "ev_longmem_gap" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val docs = Queries.docs(s, dir).localCheckpoint()
      graft.eval.LongMemEval.recallAt5(docs)
        .join(graft.eval.LongMemEval.ndcgAt10(docs)
          .select("category", "ndcg_at_10"), "category")
        .withColumn("gap", round(col("recall_any_at_5") - col("ndcg_at_10"), 6))
        .orderBy("category")
    }),
    // acting on the gap analysis (r9 verdict #3): recall@5 per category
    // with RM3 expansion behind the sparse-query trigger, vs the base
    // plan — the measured category move, with the rich categories as the
    // do-no-harm control rows
    "ev_longmem_prf_lift" -> ((s, dir) =>
      graft.eval.LongMemEval.prfRecallLift(Queries.docs(s, dir))),
    // unigram-LM (SentencePiece-style) tokenizer training, Kudo '18:
    // sign: Viterbi hard-EM in integer micro-nat costs, 2 unrolled rounds
    "tk_unigram_vocab" -> ((s, dir) =>
      graft.text.Unigram.train(Queries.docs(s, dir))),
    // train → apply: per-doc word/piece counts under the learned vocab
    "tk_unigram_tokenize" -> ((s, dir) =>
      graft.text.Unigram.tokenizeCounts(Queries.docs(s, dir))),
    // the deployment shape: train → persist the vocabulary artifact →
    // load → tokenize. Oracle = the in-memory tokenize SQL, so the
    // hash-match proves the store round-trip is exact (the
    // ann_ivfpq_indexed discipline)
    "tk_unigram_stored" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_unigram_vocab_${ProcessHandle.current().pid()}"
      Queries.reapAtExit(path)
      graft.text.Unigram.saveVocab(Queries.docs(s, dir), path)
      graft.text.Unigram.tokenizeCounts(Queries.docs(s, dir),
        vocab = Some(graft.text.Unigram.loadVocab(s, path)))
    }))

  /** Shared core of the LongMemEval oracles: sessions/chunks/questions →
    * hybrid RRF → per-question chunk ranks (lmch, lmq, lcr in scope).
    * `probes = true` (the PRF-lift oracle only) unions in the
    * planted-mismatch families — [[graft.eval.LongMemEval.probeChunks]]
    * regenerated row-for-row in SQL: isolated buckets 16+g, exact
    * 2-token chunk texts, one single-term question per group. */
  private def longMemCoreCtes(probes: Boolean = false): String = {
    val w = HybridSearch.Weights.resolve(0.7, 0.0, 0.0, 0.0)
    val lme = graft.eval.LongMemEval
    val k = lme.RetrievalK
    val over = 3 * k
    val nb = lme.NumBuckets
    val sm = lme.SampleMod
    val t = OracleText.toks("text")
    def gv(s: String) = s"'$s' || CAST(g.g AS VARCHAR)"
    def gd(a: String, b: String) =
      s"'$a' || CAST(g.g AS VARCHAR) || 'x' || CAST(d.d AS VARCHAR) || ' ' || " +
        s"'$b' || CAST(g.g AS VARCHAR) || 'x' || CAST(d.d AS VARCHAR)"
    val probeChunksCte =
      s"""lmpc AS MATERIALIZED (
         |  SELECT (${lme.ProbeBase} + g.g * 32 + t.off) * 2 + t.c AS id,
         |    ${lme.ProbeBase} + g.g * 32 + t.off AS session,
         |    $nb + g.g AS bucket,
         |    CASE t.k
         |      WHEN 0 THEN ${gv("syzygy")} || ' ' || ${gv("quorum")}
         |      WHEN 1 THEN ${gv("bezoar")} || ' ' || ${gv("orrery")}
         |      WHEN 2 THEN ${gv("xylograph")} || ' ' || ${gv("syzygy")}
         |      WHEN 3 THEN ${gv("quorum")}
         |      WHEN 4 THEN ${gv("xylograph")} || ' ' || ${gv("quorum")}
         |      WHEN 5 THEN ${gv("syzygy")}
         |    END AS text
         |  FROM range(0, ${lme.ProbeGroups}) g(g),
         |    (VALUES (0,0,0),(0,1,1),(1,0,2),(1,1,3),(2,0,4),(2,1,5)) t(off, c, k)
         |  UNION ALL
         |  SELECT (${lme.ProbeBase} + g.g * 32 + 3 + d.d) * 2 + c.c,
         |    ${lme.ProbeBase} + g.g * 32 + 3 + d.d,
         |    $nb + g.g,
         |    CASE c.c WHEN 0 THEN ${gd("drivel", "noise")}
         |      ELSE ${gd("blather", "prattle")} END
         |  FROM range(0, ${lme.ProbeGroups}) g(g),
         |    range(0, ${lme.ProbeDistractors}) d(d), (VALUES (0), (1)) c(c)),
         |""".stripMargin
    val chunkUnion = if (!probes) "" else
      "\n  UNION ALL SELECT id, session, bucket, text FROM lmpc"
    val questionUnion = if (!probes) "" else
      s"""
         |  UNION ALL
         |  SELECT ${lme.ProbeBase} + g.g * 32 AS qid, $nb + g.g AS bucket,
         |    'planted-mismatch' AS category, ${gv("xylograph")} AS qtext
         |  FROM range(0, ${lme.ProbeGroups}) g(g)""".stripMargin
    s"""lmd AS MATERIALIZED (SELECT doc_id AS id, $t AS t FROM documents),
       |${if (probes) probeChunksCte else ""}lmch AS MATERIALIZED (
       |  SELECT * FROM (
       |  SELECT d.id * 2 + c.c AS id, d.id AS session, d.id % $nb AS bucket,
       |    array_to_string(CASE WHEN c.c = 0 THEN d.t[1:(len(d.t) + 1) // 2]
       |      ELSE d.t[(len(d.t) + 1) // 2 + 1:len(d.t)] END, ' ') AS text
       |  FROM lmd d, (VALUES (0), (1)) c(c)
       |  WHERE len(d.t) >= 1 AND (c.c = 0 OR len(d.t) > (len(d.t) + 1) // 2)$chunkUnion)),
       |lmq AS MATERIALIZED (
       |  SELECT * FROM (
       |  SELECT id AS qid, id % $nb AS bucket,
       |    CASE id % 3 WHEN 0 THEN 'interleaved' WHEN 1 THEN 'verbatim-tail'
       |      ELSE 'sparse-keywords' END AS category,
       |    CASE id % 3
       |      WHEN 0 THEN array_to_string(list_transform(range(1, len(t) + 1, 2), i -> t[i]), ' ')
       |      WHEN 1 THEN array_to_string(t[(len(t) + 1) // 2 + 1:len(t)], ' ')
       |      ELSE array_to_string(list_transform(range(1, len(t) + 1, 4), i -> t[i]), ' ')
       |    END AS qtext
       |  FROM lmd WHERE id % $sm = 0 AND len(t) >= 8
       |  ORDER BY ${graft.functions.SparkHash.spreadSql("qid")}, qid LIMIT ${lme.MaxQuestions})$questionUnion),
       |${OracleText.embedCtesOver("lmch", 64, "lce")},
       |${OracleText.embedCtesOver("(SELECT qid AS id, qtext AS text FROM lmq) lqsrc", 64, "lqe")},
       |lvs AS MATERIALIZED (
       |  SELECT q.qid, m.id,
       |    round(list_sum(list_transform(range(1, 65), i -> ce.e[i] * qe.e[i])), 6) AS sim
       |  FROM lmq q JOIN lmch m ON m.bucket = q.bucket
       |  JOIN lcef ce ON ce.id = m.id
       |  JOIN lqef qe ON qe.id = q.qid),
       |lvr AS (SELECT qid, id,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rn FROM lvs),
       |lvc AS (SELECT qid, id, ${w.vec} / (rn - 1 + ${HybridSearch.RrfK}) AS c
       |  FROM lvr WHERE rn <= $over),
       |${OracleHybrid.bm25BatchCtes("lmch", "(SELECT qid, qtext AS text FROM lmq)")},
       |lbs AS MATERIALIZED (
       |  SELECT b.qid, b.id, b.bm25 FROM bm b
       |  JOIN lmch m ON m.id = b.id
       |  JOIN lmq q ON q.qid = b.qid AND q.bucket = m.bucket
       |  WHERE b.bm25 > 0),
       |lbr AS (SELECT qid, id,
       |    row_number() OVER (PARTITION BY qid ORDER BY bm25 DESC, id) AS rn FROM lbs),
       |lbc AS (SELECT qid, id, ${w.bm25} / (rn - 1 + ${HybridSearch.RrfK}) AS c
       |  FROM lbr WHERE rn <= $over),
       |lfu AS MATERIALIZED (
       |  SELECT qid, id, sum(c) AS rrf
       |  FROM (SELECT * FROM lvc UNION ALL SELECT * FROM lbc) GROUP BY 1, 2),
       |lcr AS MATERIALIZED (SELECT qid, id,
       |    row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, id) AS crn FROM lfu)""".stripMargin
  }

  /** Recall tail over the core: lhit(qid, category, hit) in scope. */
  private def longMemRecallTailCtes: String = {
    val k = graft.eval.LongMemEval.RetrievalK
    s"""lsr AS (SELECT qid, id // 2 AS session, min(crn) AS srn
       |  FROM lcr WHERE crn <= $k GROUP BY 1, 2),
       |lsk AS (SELECT qid, session,
       |    row_number() OVER (PARTITION BY qid ORDER BY srn) AS sk FROM lsr),
       |lhit AS MATERIALIZED (
       |  SELECT q.qid, q.category,
       |    CASE WHEN EXISTS (SELECT 1 FROM lsk s
       |      WHERE s.qid = q.qid AND s.sk <= ${graft.eval.LongMemEval.SessionK}
       |        AND s.session = q.qid) THEN 1 ELSE 0 END AS hit
       |  FROM lmq q)""".stripMargin
  }

  private val longMemRecallSelect: String =
    s"""SELECT category, CAST(count(*) AS BIGINT) AS n_questions,
       |  round(avg(hit), 6) AS recall_any_at_5
       |FROM lhit GROUP BY category
       |UNION ALL
       |SELECT 'overall', CAST(count(*) AS BIGINT), round(avg(hit), 6) FROM lhit""".stripMargin

  /** nDCG tail over the core: lnq(qid, category, ndcg_micro) in scope. */
  private def longMemNdcgTailCtes: String = {
    val k = 10
    val disc = (r: String) => s"CAST(round(1e6 / log2($r + 1), 0) AS BIGINT)"
    s"""lgn AS (SELECT session, CAST(count(*) AS BIGINT) AS ng FROM lmch GROUP BY 1),
       |ldc AS (
       |  SELECT qid, CAST(sum(${disc("crn")}) AS BIGINT) AS dcg_micro
       |  FROM lcr WHERE crn <= $k AND id // 2 = qid GROUP BY 1),
       |lnq AS MATERIALIZED (
       |  SELECT q.qid, q.category,
       |    CAST(round(1e6 * CAST(coalesce(d.dcg_micro, 0) AS DOUBLE) /
       |      CAST(list_sum(list_transform(range(1, least(g.ng, $k) + 1),
       |        i -> ${disc("i")})) AS BIGINT), 0) AS BIGINT) AS ndcg_micro
       |  FROM lmq q JOIN lgn g ON g.session = q.qid
       |  LEFT JOIN ldc d ON d.qid = q.qid)""".stripMargin
  }

  private val longMemNdcgSelect: String =
    s"""SELECT category, CAST(count(*) AS BIGINT) AS n_questions,
       |  round(CAST(sum(ndcg_micro) AS DOUBLE) / count(*) / 1e6, 6) AS ndcg_at_10
       |FROM lnq GROUP BY category
       |UNION ALL
       |SELECT 'overall', CAST(count(*) AS BIGINT),
       |  round(CAST(sum(ndcg_micro) AS DOUBLE) / count(*) / 1e6, 6) FROM lnq""".stripMargin

  /** Batch RM3 over the core (mirrors LongMemEval.batchResultsFrom with
    * prf=true): triggered sparse questions mine expansion terms from
    * their scoped feedback docs, the BM25 branch ranks base+β·expansion,
    * fusion re-runs with the SAME vector contributions. Ends with
    * lphit(qid, category, hit). */
  private def longMemPrfCtes: String = {
    import graft.search.BM25
    val lme = graft.eval.LongMemEval
    val w = HybridSearch.Weights.resolve(0.7, 0.0, 0.0, 0.0)
    val k = lme.RetrievalK
    val over = 3 * k
    val qt = OracleText.toks("q.qtext")
    s"""lptrig AS (SELECT qid FROM lmq q WHERE len(list_distinct($qt)) <= ${lme.PrfTriggerTerms}),
       |lpqt AS (SELECT DISTINCT q.qid, t.term FROM lmq q, unnest($qt) t(term)),
       |lpw AS (
       |  SELECT f.qid, tf.term, round(sum(tf.tf * idf.idf), 6) AS w
       |  FROM (SELECT l.qid, l.id FROM lbr l JOIN lptrig USING (qid)
       |        WHERE l.rn <= ${lme.PrfFbDocs}) f
       |  JOIN tf ON tf.id = f.id
       |  JOIN idf ON idf.term = tf.term
       |  WHERE NOT EXISTS (SELECT 1 FROM lpqt p
       |    WHERE p.qid = f.qid AND p.term = tf.term)
       |  GROUP BY 1, 2),
       |lpe AS (SELECT qid, term FROM (
       |    SELECT qid, term, row_number() OVER (PARTITION BY qid
       |      ORDER BY w DESC, term) AS wrn
       |    FROM lpw WHERE w > 0) WHERE wrn <= ${lme.PrfTerms}),
       |lpes AS (
       |  SELECT e.qid, tf.id,
       |    round(sum(1 * idf.idf * tf.tf * (${BM25.K1} + 1.0) /
       |      (tf.tf + ${BM25.K1} * (1.0 - ${BM25.B} + ${BM25.B} * dl.dl / (SELECT avgdl FROM bmstats)))), 6) AS bm25e
       |  FROM lpe e JOIN tf ON tf.term = e.term
       |  JOIN idf ON idf.term = e.term
       |  JOIN dl ON dl.id = tf.id
       |  GROUP BY 1, 2),
       |lpesf AS (
       |  SELECT s.qid, s.id, s.bm25e FROM lpes s
       |  JOIN lmch m ON m.id = s.id
       |  JOIN lmq q ON q.qid = s.qid AND q.bucket = m.bucket),
       |lpbm AS MATERIALIZED (
       |  SELECT qid, id, bm25 FROM (
       |    SELECT coalesce(b.qid, e.qid) AS qid, coalesce(b.id, e.id) AS id,
       |      round(coalesce(b.bm25, 0) + ${lme.PrfBeta} * coalesce(e.bm25e, 0), 6) AS bm25
       |    FROM lbs b FULL OUTER JOIN lpesf e ON b.qid = e.qid AND b.id = e.id)
       |  WHERE bm25 > 0),
       |lpbr AS (SELECT qid, id,
       |    row_number() OVER (PARTITION BY qid ORDER BY bm25 DESC, id) AS rn FROM lpbm),
       |lpbc AS (SELECT qid, id, ${w.bm25} / (rn - 1 + ${HybridSearch.RrfK}) AS c
       |  FROM lpbr WHERE rn <= $over),
       |lpfu AS MATERIALIZED (
       |  SELECT qid, id, sum(c) AS rrf
       |  FROM (SELECT * FROM lvc UNION ALL SELECT * FROM lpbc) GROUP BY 1, 2),
       |lpcr AS MATERIALIZED (SELECT qid, id,
       |    row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, id) AS crn FROM lpfu),
       |lpsr AS (SELECT qid, id // 2 AS session, min(crn) AS srn
       |  FROM lpcr WHERE crn <= $k GROUP BY 1, 2),
       |lpsk AS (SELECT qid, session,
       |    row_number() OVER (PARTITION BY qid ORDER BY srn) AS sk FROM lpsr),
       |lphit AS MATERIALIZED (
       |  SELECT q.qid, q.category,
       |    CASE WHEN EXISTS (SELECT 1 FROM lpsk s
       |      WHERE s.qid = q.qid AND s.sk <= ${lme.SessionK}
       |        AND s.session = q.qid) THEN 1 ELSE 0 END AS hit
       |  FROM lmq q)""".stripMargin
  }

  private def longMemPrfLiftSql: String =
    s"""WITH ${longMemCoreCtes(probes = true)},
       |$longMemRecallTailCtes,
       |$longMemPrfCtes,
       |lgr AS (
       |  SELECT category, CAST(count(*) AS BIGINT) AS n_questions,
       |    round(avg(hit), 6) AS recall_base
       |  FROM lhit GROUP BY category
       |  UNION ALL
       |  SELECT 'overall', CAST(count(*) AS BIGINT), round(avg(hit), 6) FROM lhit),
       |lgp AS (
       |  SELECT category, round(avg(hit), 6) AS recall_prf
       |  FROM lphit GROUP BY category
       |  UNION ALL
       |  SELECT 'overall', round(avg(hit), 6) FROM lphit)
       |SELECT r.category, r.n_questions, r.recall_base, p.recall_prf,
       |  round(p.recall_prf - r.recall_base, 6) AS lift
       |FROM lgr r JOIN lgp p USING (category)
       |ORDER BY category""".stripMargin

  private def longMemSql: String =
    s"""WITH ${longMemCoreCtes()},
       |$longMemRecallTailCtes
       |$longMemRecallSelect
       |ORDER BY category""".stripMargin

  private def longMemNdcgSql: String =
    s"""WITH ${longMemCoreCtes()},
       |$longMemNdcgTailCtes
       |$longMemNdcgSelect
       |ORDER BY category""".stripMargin

  /** One retrieval pass, both metrics joined per category with the
    * found-vs-ranked gap — the table that names the weak category. */
  private def longMemGapSql: String =
    s"""WITH ${longMemCoreCtes()},
       |$longMemRecallTailCtes,
       |$longMemNdcgTailCtes,
       |lgr AS ($longMemRecallSelect),
       |lgd AS ($longMemNdcgSelect)
       |SELECT r.category, r.n_questions, r.recall_any_at_5, d.ndcg_at_10,
       |  round(r.recall_any_at_5 - d.ndcg_at_10, 6) AS gap
       |FROM lgr r JOIN lgd d USING (category)
       |ORDER BY category""".stripMargin

  val oracles: Map[String, String] = Map(
    "ev_longmem_recall" -> longMemSql,
    "ev_longmem_ndcg" -> longMemNdcgSql,
    "ev_longmem_gap" -> longMemGapSql,
    "ev_longmem_prf_lift" -> longMemPrfLiftSql,
    "tk_unigram_vocab" ->
      s"""WITH ${OracleText.unigramCtes()}
         |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, piece) AS INT) AS rank,
         |  piece, cnt,
         |  CAST(round(ln(CAST(t.total AS DOUBLE) / cnt) * 1e6, 0) AS BIGINT) AS nll_micro
         |FROM ugfin, (SELECT sum(cnt) AS total FROM ugfin) t
         |ORDER BY rank""".stripMargin,
    "tk_unigram_tokenize" -> unigramTokenizeSql,
    // in-memory tokenize SQL: the save→load split must reproduce it
    "tk_unigram_stored" -> unigramTokenizeSql)

  private lazy val unigramTokenizeSql: String = {
    val t = OracleText.toks("text")
    s"""WITH ${OracleText.unigramCtes()},
       |${OracleText.unigramDpCtes("ug3", "ugvf")},
       |ugnp AS (SELECT w, CAST(count(*) AS BIGINT) AS np FROM ug3p GROUP BY 1),
       |ugocc AS (
       |  SELECT doc_id AS id, t.term AS w
       |  FROM documents, unnest($t) AS t(term)
       |  WHERE len(t.term) BETWEEN 1 AND ${graft.text.Unigram.MaxWordLen})
       |SELECT o.id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(z.np) AS BIGINT) AS n_pieces
       |FROM ugocc o JOIN ugnp z USING (w)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
