package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Corpus, OracleCtes, OracleHybrid, Tables}
import graft.search.{BM25, Filters, GraphSearch, HybridSearch, VectorSearch}

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
      graphWeight = graphWeight)

  /** Static copy of the params for oracle generation (queryVec not needed). */
  private val oracleHybridParams: HybridSearch.Params =
    HybridSearch.Params(
      queryTokens = QueryTokens, queryVec = Nil, k = 10,
      vectorWeight = 0.7, recencyWeight = 0.2,
      feedbackWeight = 0.1, confidenceWeight = 0.1)

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
    "r4_hybrid_rrf" -> ((s, dir) => {
      HybridSearch.search(
        Corpus.memories(s, dir), Some(Corpus.searchFeedback(s, dir)),
        hybridParams(s, dir))
    }),
    "r10_graph_search" -> ((s, dir) => {
      HybridSearch.search(
        Corpus.memories(s, dir), Some(Corpus.searchFeedback(s, dir)),
        hybridParams(s, dir, graphWeight = 0.1))
    })
  )

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
    "r4_hybrid_rrf" ->
      OracleHybrid.hybridSql(oracleHybridParams, n = 1000000, withFeedback = true),
    "r10_graph_search" ->
      OracleHybrid.graphSql(oracleHybridParams.copy(graphWeight = 0.1),
        n = 1000000, withFeedback = true)
  )

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
    })
  )

  private val sanityOracles: Map[String, String] = Map(
    "q1_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )

  val all: Map[String, Q] =
    retrievalQueries ++ sanityQueries

  val oracles: Map[String, String] =
    retrievalOracles ++ sanityOracles
}
