package graft.core

import graft.search.{BM25, GraphSearch, HybridSearch}

/** DuckDB oracle SQL generators for the retrieval pipeline (BM25, 5-signal
  * RRF, PPR graph expansion). Each mirrors the Spark operator 1:1 — same
  * weight doubles (interpolated via `Double.toString`, which round-trips),
  * same rounding points, same (score DESC, id ASC) tie-breaks — so the
  * driver's hash compare is exact.
  */
object OracleHybrid {

  /** Tokenizer expression matching TextFunctions.tokens. */
  def toks(c: String): String =
    s"list_filter(string_split_regex(lower($c), '\\s+'), x -> len(x) > 0)"

  /** [[bm25Ctes]] generalized to a bounded BATCH of queries over any
    * (id, text) corpus relation: `queryRel` has (qid, text); emits the same
    * tf/dl/bmstats/dfreq/idf chain plus qt(qid, term, qn) and
    * bm(qid, id, bm25). Mirrors [[graft.search.BM25.batchScores]]. */
  def bm25BatchCtes(corpus: String, queryRel: String): String =
    s"""tf AS MATERIALIZED (
       |  SELECT c.id, t.term, count(*) AS tf
       |  FROM $corpus c, unnest(${toks("c.text")}) AS t(term)
       |  GROUP BY 1, 2
       |),
       |dl AS MATERIALIZED (SELECT id, CAST(len(${toks("text")}) AS DOUBLE) AS dl FROM $corpus),
       |bmstats AS (SELECT (SELECT count(*) FROM $corpus) AS n, (SELECT avg(dl) FROM dl) AS avgdl),
       |dfreq AS MATERIALIZED (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |idf0 AS MATERIALIZED (SELECT term, ln((s.n - df + 0.5) / (df + 0.5)) AS idf FROM dfreq, bmstats s),
       |aidf AS (SELECT avg(idf) AS a FROM idf0),
       |idf AS MATERIALIZED (SELECT term, CASE WHEN idf < 0 THEN ${BM25.Epsilon} * (SELECT a FROM aidf) ELSE idf END AS idf FROM idf0),
       |qt AS (SELECT q.qid, t.term, count(*) AS qn
       |  FROM $queryRel q, unnest(${toks("q.text")}) AS t(term) GROUP BY 1, 2),
       |bm AS MATERIALIZED (
       |  SELECT qt.qid, tf.id,
       |    round(sum(qt.qn * idf.idf * tf.tf * (${BM25.K1} + 1.0) /
       |      (tf.tf + ${BM25.K1} * (1.0 - ${BM25.B} + ${BM25.B} * dl.dl / (SELECT avgdl FROM bmstats)))), 6) AS bm25
       |  FROM tf JOIN qt USING (term) JOIN idf USING (term) JOIN dl USING (id)
       |  GROUP BY 1, 2
       |)""".stripMargin

  /** BM25 CTE chain ending in `bm(id, bm25)` over the `from` corpus CTE
    * (default the full memories table; scores rounded to 6, positives only
    * filtered later). Mirrors [[graft.search.BM25.scores]] — the delete-
    * refresh oracle passes a reduced-corpus CTE name, under which n, avgdl
    * and every idf recompute exactly as [[graft.search.BM25Index
    * .deleteRefresh]] recomputes them from the surviving postings. */
  def bm25Ctes(queryTokens: Seq[String], from: String = "memories"): String = {
    val qvals = queryTokens.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
      .map { case (t, n) => s"('$t', $n)" }.mkString(", ")
    s"""tf AS MATERIALIZED (
       |  SELECT m.id, t.term, count(*) AS tf
       |  FROM $from m, unnest(${toks("m.text")}) AS t(term)
       |  GROUP BY 1, 2
       |),
       |dl AS MATERIALIZED (SELECT id, CAST(len(${toks("text")}) AS DOUBLE) AS dl FROM $from),
       |bmstats AS (SELECT (SELECT count(*) FROM $from) AS n, (SELECT avg(dl) FROM dl) AS avgdl),
       |dfreq AS MATERIALIZED (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |idf0 AS MATERIALIZED (SELECT term, ln((s.n - df + 0.5) / (df + 0.5)) AS idf FROM dfreq, bmstats s),
       |aidf AS (SELECT avg(idf) AS a FROM idf0),
       |idf AS MATERIALIZED (SELECT term, CASE WHEN idf < 0 THEN ${BM25.Epsilon} * (SELECT a FROM aidf) ELSE idf END AS idf FROM idf0),
       |qt AS (SELECT * FROM (VALUES $qvals) AS t(term, qn)),
       |bm AS MATERIALIZED (
       |  SELECT tf.id,
       |    round(sum(qt.qn * idf.idf * tf.tf * (${BM25.K1} + 1.0) /
       |      (tf.tf + ${BM25.K1} * (1.0 - ${BM25.B} + ${BM25.B} * dl.dl / (SELECT avgdl FROM bmstats)))), 6) AS bm25
       |  FROM tf JOIN qt USING (term) JOIN idf USING (term) JOIN dl USING (id)
       |  GROUP BY 1
       |)""".stripMargin
  }

  private def decay(tsExpr: String, halfLife: Double, nowSql: String): String =
    s"power(0.5, greatest((epoch($nowSql) - epoch($tsExpr)) / 86400.0, 0.0) / $halfLife)"

  /** R7 per-prefix half-life resolution CTE (only when profiles are set):
    * longest matching prefix wins, default half-life otherwise. Mirrors the
    * broadcast longest-prefix join in HybridSearch's confidence branch. */
  private def confHlCte(p: HybridSearch.Params): String =
    if (p.confidenceWeight <= 0 || p.confidenceProfiles.isEmpty) ""
    else {
      val vals = p.confidenceProfiles
        // doubles are interpolated as quoted strings: DuckDB parses a bare
        // 17-digit numeric literal as DECIMAL then double-rounds to DOUBLE,
        // which can differ from Scala's Double.toString round-trip by 1 ULP
        .map { case (pre, hl) => s"('$pre', CAST('$hl' AS DOUBLE))" }.mkString(", ")
      s"""
         |confhl AS MATERIALIZED (
         |  SELECT id, coalesce(hl, CAST('${p.confidenceHalfLifeDays}' AS DOUBLE)) AS hl FROM (
         |    SELECT c.id, pr.hl, row_number() OVER (PARTITION BY c.id ORDER BY len(pr.prefix) DESC, pr.prefix) AS rn
         |    FROM cand c JOIN memories m USING (id)
         |    LEFT JOIN (SELECT * FROM (VALUES $vals) AS t(prefix, hl)) pr ON starts_with(m.source, pr.prefix)
         |  ) WHERE rn = 1
         |),""".stripMargin
    }

  /** CTE chain ending in `fused(id, rrf)` — the pre-graph 5-signal RRF pool.
    * Mirrors [[graft.search.HybridSearch.rrfScores]]. Requires the
    * `memories` and (if feedbackWeight>0) `search_feedback` CTEs upstream. */
  /** `vecJoin` optionally restricts the vector leg's candidate pool — the
    * index-backed hybrid (`r4_hybrid_indexed`) passes the IVF probe join
    * so the oracle replays exactly the probed-cell pool
    * [[graft.search.HybridSearch.searchIndexed]] ranks; every other
    * caller leaves it empty (full-corpus exact leg). */
  def fusedCtes(p: HybridSearch.Params, n: Long, vecId: Long,
                vecJoin: String = ""): String = {
    val k = math.min(math.min(p.k.toLong, n), 100L).toInt
    val oversample = math.min(3L * k, n).toInt
    val w = HybridSearch.Weights.resolve(p.vectorWeight, p.recencyWeight,
      p.feedbackWeight, p.confidenceWeight)
    val nowSql = s"TIMESTAMP '${java.time.Instant.ofEpochSecond(p.nowEpoch).toString.replace("T", " ").stripSuffix("Z")}'"
    val prefixPred = p.sourcePrefix.map(x => s"AND m.source LIKE '$x%'").getOrElse("")
    val archPred = if (p.includeArchived) "" else "AND NOT m.archived"
    val thresholdPred = p.threshold.map(t => s"AND round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) >= $t").getOrElse("")
    val temporalPred = {
      val d = "coalesce(m.document_at, m.created_at, m.updated_at)"
      (p.since, p.until) match {
        case (None, None) => ""
        case (s, u) =>
          val lo = s.map(x => s"$d >= TIMESTAMP '$x'").getOrElse("TRUE")
          val hi = u.map(x => s"$d <= TIMESTAMP '$x'").getOrElse("TRUE")
          s"AND ($d IS NULL OR ($lo AND $hi))"
      }
    }
    val extraSignals = Seq(
      if (p.recencyWeight > 0)
        Some(s"""UNION ALL SELECT id, 'recency' AS signal, ${w.recency} / (rnk + ${HybridSearch.RrfK}) FROM (
                |  SELECT c.id, row_number() OVER (ORDER BY coalesce(${decay("coalesce(m.document_at, m.created_at)", p.recencyHalfLifeDays, nowSql)}, 0.0) DESC, c.id) - 1 AS rnk
                |  FROM cand c JOIN memories m USING (id))""".stripMargin)
      else None,
      if (p.feedbackWeight > 0)
        Some(s"""UNION ALL SELECT id, 'feedback' AS signal, ${w.feedback} / (rnk + ${HybridSearch.RrfK}) FROM (
                |  SELECT c.id, row_number() OVER (ORDER BY f.net DESC, c.id) - 1 AS rnk
                |  FROM cand c JOIN (
                |    SELECT memory_id AS id, sum(CASE WHEN signal = 'useful' THEN 1 ELSE -1 END) AS net
                |    FROM search_feedback GROUP BY 1) f USING (id)
                |  WHERE f.net > 0)""".stripMargin)
      else None,
      if (p.confidenceWeight > 0) {
        val anchor = "coalesce(m.last_reinforced_at, m.updated_at, m.created_at)"
        if (p.confidenceProfiles.isEmpty)
          Some(s"""UNION ALL SELECT id, 'confidence' AS signal, ${w.confidence} / (rnk + ${HybridSearch.RrfK}) FROM (
                  |  SELECT c.id, row_number() OVER (ORDER BY ${decay(anchor, p.confidenceHalfLifeDays, nowSql)} DESC, c.id) - 1 AS rnk
                  |  FROM cand c JOIN memories m USING (id))""".stripMargin)
        else
          Some(s"""UNION ALL SELECT id, 'confidence' AS signal, ${w.confidence} / (rnk + ${HybridSearch.RrfK}) FROM (
                  |  SELECT c.id, row_number() OVER (ORDER BY power(0.5, greatest((epoch($nowSql) - epoch($anchor)) / 86400.0, 0.0) / h.hl) DESC, c.id) - 1 AS rnk
                  |  FROM cand c JOIN memories m USING (id) JOIN confhl h ON h.id = c.id)""".stripMargin)
      } else None
    ).flatten.mkString("\n")
    val temporalFinal = {
      val d = "coalesce(m.document_at, m.created_at, m.updated_at)"
      (p.since, p.until) match {
        case (None, None) => ""
        case (s, u) =>
          val lo = s.map(x => s"$d >= TIMESTAMP '$x'").getOrElse("TRUE")
          val hi = u.map(x => s"$d <= TIMESTAMP '$x'").getOrElse("TRUE")
          s"""JOIN memories m ON f0.id = m.id AND ($d IS NULL OR ($lo AND $hi))"""
      }
    }
    s"""${bm25Ctes(p.queryTokens)},
       |vec AS MATERIALIZED (
       |  SELECT m.id, round(${OracleCtes.dot64("m.embedding", "q.qv")}, 6) AS sim
       |  FROM memories m
       |  $vecJoin
       |  CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = $vecId) q
       |  WHERE TRUE $archPred $prefixPred $temporalPred $thresholdPred
       |  ORDER BY sim DESC, m.id LIMIT $oversample
       |),
       |bmr AS MATERIALIZED (
       |  SELECT b.id, b.bm25 FROM bm b JOIN memories m ON b.id = m.id
       |  WHERE b.bm25 > 0 $archPred $prefixPred
       |  ORDER BY b.bm25 DESC, b.id LIMIT $oversample
       |),
       |cand AS MATERIALIZED (
       |  SELECT id, sum(c) AS rrf FROM (
       |    SELECT id, ${w.vec} / (row_number() OVER (ORDER BY sim DESC, id) - 1 + ${HybridSearch.RrfK}) AS c FROM vec
       |    UNION ALL
       |    SELECT id, ${w.bm25} / (row_number() OVER (ORDER BY bm25 DESC, id) - 1 + ${HybridSearch.RrfK}) AS c FROM bmr
       |  ) GROUP BY 1
       |),${confHlCte(p)}
       |expl AS MATERIALIZED (
       |  SELECT id, 'vector+bm25' AS signal, rrf AS c FROM cand
       |  $extraSignals
       |),
       |fused AS MATERIALIZED (
       |  SELECT f0.id, f0.rrf FROM (
       |    SELECT id, sum(c) AS rrf FROM expl GROUP BY 1
       |  ) f0 $temporalFinal
       |)""".stripMargin
  }

  /** R14 explain oracle: labeled per-signal contributions + fused score +
    * resolved weights + filter counts + graph/PPR params. Mirrors
    * [[graft.search.HybridSearch.explain]]. */
  def explainSql(p: HybridSearch.Params, n: Long, withFeedback: Boolean,
                 vecId: Long = 0,
                 extraCtes: String = "", vecJoin: String = ""): String = {
    val w = HybridSearch.Weights.resolve(p.vectorWeight, p.recencyWeight,
      p.feedbackWeight, p.confidenceWeight)
    val fb = if (withFeedback) s",\n${OracleCtes.searchFeedback}" else ""
    val fbsSql = p.sourcePrefix match {
      case Some(pre) =>
        s"""(SELECT count(*) FROM bm WHERE bm25 > 0)
           | - (SELECT count(*) FROM bm b JOIN memories m USING (id)
           |    WHERE b.bm25 > 0 AND m.source LIKE '$pre%')""".stripMargin
      case None => "CAST(0 AS BIGINT)"
    }
    val graphOn = p.graphWeight > 0
    val gw = if (graphOn) p.graphWeight else 0.0
    val pprAlpha = if (graphOn) s"CAST(${GraphSearch.Alpha} AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
    val pprIters = if (graphOn) s"CAST(${GraphSearch.MaxIters} AS INT)" else "CAST(NULL AS INT)"
    val extra = if (extraCtes.nonEmpty) extraCtes + ",\n" else ""
    s"""WITH ${OracleCtes.memories}$fb,
       |$extra${fusedCtes(p, n, vecId, vecJoin)},
       |fused2 AS (SELECT id, sum(c) AS rrf FROM expl GROUP BY 1),
       |cc AS (SELECT count(*) AS candidates_considered FROM cand),
       |fbs AS (SELECT $fbsSql AS filtered_by_source)
       |SELECT e.id, e.signal, round(e.c, 6) AS contrib, round(f.rrf, 6) AS rrf_score,
       |  CAST('${w.vec}' AS DOUBLE) AS w_vector, CAST('${w.bm25}' AS DOUBLE) AS w_bm25,
       |  CAST('${w.recency}' AS DOUBLE) AS w_recency,
       |  CAST('${w.feedback}' AS DOUBLE) AS w_feedback,
       |  CAST('${w.confidence}' AS DOUBLE) AS w_confidence,
       |  cc.candidates_considered, fbs.filtered_by_source,
       |  CAST(0 AS BIGINT) AS filtered_by_auth, CAST(${HybridSearch.RrfK} AS INT) AS rrf_k,
       |  $graphOn AS graph_enabled, CAST('$gw' AS DOUBLE) AS graph_weight,
       |  $pprAlpha AS ppr_alpha, $pprIters AS ppr_iterations
       |FROM expl e JOIN fused2 f USING (id), cc, fbs""".stripMargin
  }

  /** Full fast-path hybrid oracle: SELECT id, source, category, rrf_score.
    * `memoriesCte` lets a caller swap in a SCOPED corpus (the graph-lift
    * eval runs per-question windows, reference run_musique_graph_eval.py's
    * per-question source_prefix scope). */
  def hybridSql(p: HybridSearch.Params, n: Long, withFeedback: Boolean,
                vecId: Long = 0,
                memoriesCte: String = OracleCtes.memories,
                extraCtes: String = "", vecJoin: String = ""): String = {
    val k = math.min(p.k, 100)
    val fb = if (withFeedback) s",\n${OracleCtes.searchFeedback}" else ""
    val extra = if (extraCtes.nonEmpty) extraCtes + ",\n" else ""
    s"""WITH $memoriesCte$fb,
       |$extra${fusedCtes(p, n, vecId, vecJoin)}
       |SELECT f.id, m.source, m.category, round(f.rrf, 6) AS rrf_score
       |FROM fused f JOIN memories m USING (id)
       |ORDER BY f.rrf DESC, f.id LIMIT $k""".stripMargin
  }

  /** Graph-path oracle: 3 unrolled PPR iterations + reserved-slot merge.
    * Mirrors [[graft.search.GraphSearch]]. `memoriesCte` as in
    * [[hybridSql]]. */
  def graphSql(p: HybridSearch.Params, n: Long, withFeedback: Boolean,
               vecId: Long = 0,
               memoriesCte: String = OracleCtes.memories,
               extraCtes: String = "", vecJoin: String = ""): String = {
    val k = math.min(p.k, 100)
    val alpha = GraphSearch.Alpha
    val restart = 1.0 - alpha
    val fb = if (withFeedback) s",\n${OracleCtes.searchFeedback}" else ""
    val prefixPred = p.sourcePrefix.map(x => s"AND source LIKE '$x%'").getOrElse("")
    val archPred = if (p.includeArchived) "" else "AND NOT archived"
    def iter(i: Int): String = {
      val prev = if (i == 1) "ppr0" else s"ppr${i - 1}"
      s"""dang$i AS (
         |  SELECT coalesce(sum(score), 0.0) AS m FROM $prev p
         |  WHERE NOT EXISTS (SELECT 1 FROM deg d WHERE d.id = p.id)
         |),
         |ppr$i AS MATERIALIZED (
         |  SELECT id, sum(c) AS score FROM (
         |    SELECT s.id, $restart * s.p + $alpha * (SELECT m FROM dang$i) * s.p / (SELECT pt FROM ptot) AS c FROM seeds s
         |    UNION ALL
         |    SELECT e.dst AS id, $alpha * p.score / d.deg AS c
         |    FROM $prev p JOIN deg d USING (id) JOIN ve e ON e.src = p.id
         |  ) GROUP BY 1
         |)""".stripMargin
    }
    val extra = if (extraCtes.nonEmpty) extraCtes + ",\n" else ""
    s"""WITH $memoriesCte$fb,
       |$extra${fusedCtes(p, n, vecId, vecJoin)},
       |${OracleCtes.edges},
       |vis AS (SELECT id FROM memories WHERE TRUE $archPred $prefixPred),
       |ve AS MATERIALIZED (
       |  SELECT DISTINCT e.src, e.dst FROM edges e
       |  JOIN vis v1 ON e.src = v1.id JOIN vis v2 ON e.dst = v2.id
       |),
       |deg AS MATERIALIZED (SELECT src AS id, count(*) AS deg FROM ve GROUP BY 1),
       |trrf AS (SELECT max(rrf) AS t FROM fused),
       |seeds AS MATERIALIZED (SELECT id, rrf / (SELECT t FROM trrf) AS p FROM fused WHERE rrf > 0),
       |ptot AS (SELECT CASE WHEN count(*) = 0 THEN 1.0 ELSE sum(rrf) / (SELECT t FROM trrf) END AS pt FROM fused WHERE rrf > 0),
       |ppr0 AS MATERIALIZED (SELECT id, p AS score FROM seeds),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)},
       |maxppr AS (SELECT CASE WHEN max(score) > 0 THEN max(score) ELSE 1.0 END AS m FROM ppr3),
       |cand2 AS MATERIALIZED (
       |  SELECT pr.id,
       |    f.id IS NOT NULL AS is_direct,
       |    round(least((pr.score - coalesce(s.p, 0.0)) / (SELECT m FROM maxppr) * (SELECT t FROM trrf) * ${p.graphWeight},
       |                ${GraphSearch.SupportCap} * (SELECT t FROM trrf)), 6) AS graph_support,
       |    round(least(pr.score / (SELECT m FROM maxppr) * (SELECT t FROM trrf),
       |                ${GraphSearch.SupportCap} * (SELECT t FROM trrf)), 6) AS inject_score
       |  FROM ppr3 pr
       |  LEFT JOIN seeds s ON pr.id = s.id
       |  LEFT JOIN fused f ON pr.id = f.id
       |  WHERE (f.id IS NOT NULL AND pr.score - coalesce(s.p, 0.0) > 0)
       |     OR (f.id IS NULL AND pr.score / (SELECT m FROM maxppr) >= ${GraphSearch.MinRelative})
       |),
       |boosted AS MATERIALIZED (
       |  SELECT f.id, f.rrf + coalesce(c.graph_support, 0.0) AS score, f.rrf AS base,
       |    CASE WHEN c.id IS NOT NULL THEN 'direct+graph' ELSE 'direct' END AS match_type,
       |    coalesce(c.graph_support, 0.0) AS graph_support
       |  FROM fused f LEFT JOIN (SELECT * FROM cand2 WHERE is_direct) c ON f.id = c.id
       |),
       |gonly AS MATERIALIZED (
       |  SELECT id, inject_score AS score, 0.0 AS base, 'graph' AS match_type, graph_support
       |  FROM cand2 WHERE NOT is_direct
       |),
       |rsv AS (SELECT least(${GraphSearch.ReservedSlots}, (SELECT count(*) FROM gonly), $k) AS r),
       |picked AS MATERIALIZED (
       |  SELECT id, score, base, match_type, graph_support FROM (
       |    SELECT b.*, row_number() OVER (ORDER BY score DESC, id) AS rn FROM boosted b)
       |  WHERE rn <= $k - (SELECT r FROM rsv)
       |${if (p.threshold.isDefined) "" else
         s"""  UNION ALL
            |  SELECT id, score, base, match_type, graph_support FROM (
            |    SELECT g.*, row_number() OVER (ORDER BY score DESC, id) AS rn FROM gonly g)
            |  WHERE rn <= (SELECT r FROM rsv)
            |""".stripMargin})
       |SELECT p.id, m.source, m.category, round(p.score, 6) AS rrf_score,
       |  round(p.base, 6) AS base_rrf_score, p.match_type, p.graph_support
       |FROM picked p JOIN memories m ON p.id = m.id
       |ORDER BY p.score DESC, p.id LIMIT $k""".stripMargin
  }
}
