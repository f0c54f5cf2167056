package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Corpus, OracleCtes, Tables}
import graft.search.{Filters, VectorSearch}

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
         |ORDER BY id""".stripMargin
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
