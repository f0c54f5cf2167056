package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic "memories" corpus and usage-log fixtures, derived from the
  * driver-provided tables (FIXTURES.md §2-3).
  *
  * The reference engine's state is one row-oriented memories table — text +
  * metadata + a dense embedding (reference memory_engine.py:158, 596-613) —
  * plus SQLite usage logs (usage_tracker.py:117-225). Here both are pure
  * functions of `documents`/`embeddings`/`events`, so every operator has a
  * DuckDB-SQL oracle over the same parquet files. The matching oracle CTEs
  * live in [[OracleCtes]]; keep the two in lockstep.
  *
  * Derivation rules (all modular arithmetic on ids — SQL-expressible):
  *  - id = doc_id; text/source/lang from `documents`.
  *  - embedding = embeddings[doc_id % count(embeddings)] (the tables have
  *    different cardinalities at some scale factors).
  *  - created_at = 2024-01-01T00:00:00Z + 7h * id (integral seconds).
  *  - document_at = created_at, except NULL every 5th row (null-date rows
  *    must PASS temporal filters — memory_engine.py:1472-1474).
  *  - last_reinforced_at = created_at + 30d on every 4th row, else NULL.
  *  - pinned every 17th, archived every 11th row; category = id % 3 over
  *    {decision, learning, detail}; entity_key = 'ek<id>';
  *    conflicts_with = id-1 every 37th row (id>0).
  *  - links: `related_to` edge id -> id+20 when id+20 exists (the +20 stride
  *    keeps edges inside one `source` bucket), giving the graph operators a
  *    deterministic topology.
  */
object Corpus {

  /** Epoch seconds of 2024-01-01T00:00:00Z — corpus time origin. */
  val BaseEpoch: Long = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
  /** Seconds between consecutive memory creation times (7 hours). */
  val StepSeconds: Long = 7L * 3600

  // fixture tables are immutable per sfDir — memoize the cardinalities so
  // rebuilding the corpus frame doesn't re-run count jobs per query
  private val countCache = scala.collection.concurrent.TrieMap.empty[(String, String), Long]

  def nDocs(spark: SparkSession, sfDir: String): Long =
    countCache.getOrElseUpdate(("docs", sfDir), Tables.documents(spark, sfDir).count())

  def nVecs(spark: SparkSession, sfDir: String): Long =
    countCache.getOrElseUpdate(("vecs", sfDir), Tables.embeddings(spark, sfDir).count())

  /** The memories table: one row per document, embedding attached.
    *
    * The embeddings side is broadcast: it is a fixture-only modular join; in
    * a production corpus the embedding is already a column of the table.
    */
  def memories(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val embs = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val nv = nVecs(spark, sfDir)
    val nd = nDocs(spark, sfDir)
    val createdAt = timestamp_seconds(lit(BaseEpoch) + col("doc_id") * StepSeconds)
    docs
      .withColumn("vec_id", col("doc_id") % nv)
      .join(broadcast(embs), Seq("vec_id"))
      .drop("vec_id")
      .select(
        col("doc_id").as("id"),
        col("text"),
        col("source"),
        col("lang"),
        col("n_chars"),
        createdAt.as("created_at"),
        createdAt.as("updated_at"),
        when(col("doc_id") % 5 =!= 0, createdAt).as("document_at"),
        when(col("doc_id") % 4 === 0,
          timestamp_seconds(lit(BaseEpoch) + col("doc_id") * StepSeconds + lit(30L * 86400)))
          .as("last_reinforced_at"),
        (col("doc_id") % 17 === 0).as("pinned"),
        (col("doc_id") % 11 === 0).as("archived"),
        lit(true).as("is_latest"),
        when(col("doc_id") % 3 === 0, "decision")
          .when(col("doc_id") % 3 === 1, "learning")
          .otherwise("detail").as("category"),
        concat(lit("ek"), col("doc_id")).as("entity_key"),
        when(col("doc_id") % 37 === 0 && col("doc_id") > 0, col("doc_id") - 1)
          .as("conflicts_with"),
        when(col("doc_id") + 20 < nd,
          array(struct(
            (col("doc_id") + 20).as("to_id"),
            lit("related_to").as("link_type"),
            createdAt.as("created_at"))))
          .otherwise(array().cast("array<struct<to_id:bigint,link_type:string,created_at:timestamp>>"))
          .as("links"),
        col("embedding"))
  }

  /** retrieval_log fixture (usage_tracker.py:268-277 schema): one row per
    * 'view' event. */
  def retrievalLog(spark: SparkSession, sfDir: String): DataFrame = {
    val nd = nDocs(spark, sfDir)
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "view")
      .select(
        (col("event_id") % nd).as("memory_id"),
        concat(lit("q"), col("user_id") % 10).as("query"),
        (col("event_id") % 10 + 1).cast("int").as("rank"),
        col("ts"))
  }

  /** search_feedback fixture (usage_tracker.py:311-323 schema): one row per
    * 'click'/'error' event; signal from the value column. */
  def searchFeedback(spark: SparkSession, sfDir: String): DataFrame = {
    val nd = nDocs(spark, sfDir)
    Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "error"))
      .select(
        col("event_id").as("id"),
        (col("event_id") % nd).as("memory_id"),
        concat(lit("q"), col("user_id") % 10).as("query"),
        when(col("value") >= 100.0, "useful").otherwise("not_useful").as("signal"),
        col("ts"))
  }

  /** graph_search_events fixture (usage_tracker.py:461-472 schema): one row
    * per 'purchase' event. */
  def graphSearchEvents(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(
        concat(lit("q"), col("user_id") % 10).as("query"),
        (when(col("event_id") % 4 === 0, 0.0).otherwise(0.1)).as("graph_weight"),
        (col("event_id") % 5).cast("int").as("direct_count"),
        (col("event_id") % 3).cast("int").as("graph_count"),
        col("ts"))

  /** extraction_outcomes fixture (usage_tracker.py:447-459 schema): one row
    * per 'signup' event. `extracted` = sum of the action counts, so the
    * reference's noop/add/conflict rates (usage_tracker.py:694-712) are
    * well-defined. */
  def extractionOutcomes(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "signup")
      .select(
        col("event_id").as("job_id"),
        concat(lit("m"), col("user_id") % 3).as("model"),
        (col("event_id") % 4).cast("int").as("stored"),
        (col("event_id") % 3).cast("int").as("updated"),
        (col("event_id") % 2).cast("int").as("deleted"),
        (col("event_id") % 5).cast("int").as("noop"),
        when(col("event_id") % 9 === 0, 1).otherwise(0).cast("int").as("conflict"),
        when(col("event_id") % 7 === 0, 1).otherwise(0).cast("int").as("fallback"),
        floor(col("value") * 10).cast("long").as("tokens"),
        col("ts"))
      .withColumn("extracted",
        (col("stored") + col("updated") + col("deleted") + col("noop") + col("conflict"))
          .cast("int"))

  /** extraction_tokens fixture (usage_tracker.py:607-620 schema): one row
    * per 'view' event — provider/model/stage call with token counts. */
  def extractionTokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "view")
      .select(
        concat(lit("p"), col("user_id") % 2).as("provider"),
        concat(lit("m"), col("user_id") % 3).as("model"),
        when(col("event_id") % 2 === 0, "extract").otherwise("consolidate").as("stage"),
        floor(col("value") * 10).cast("long").as("input_tokens"),
        (col("event_id") % 500).cast("long").as("output_tokens"),
        col("ts"))

  /** Per-model (input, output) $/1M-token pricing fixture
    * (usage_tracker.py MODEL_PRICING; unknown models fall back to $1/$4). */
  val ModelPricing: Map[String, (Double, Double)] =
    Map("m0" -> (1.0, 4.0), "m1" -> (0.5, 2.0), "m2" -> (2.0, 8.0))

  /** Lifecycle policy table (extraction_profiles.py:7-20, 68-113): cascading
    * per-prefix policies, longest prefix wins. */
  def policies(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("src1", 600, 0.30, 120, 60.0),
      ("src", 800, 0.20, 180, 90.0),
      ("", 1000, 0.10, 365, 90.0)
    ).toDF("source_prefix", "ttl_days", "confidence_threshold", "min_age_days",
      "confidence_half_life_days")
  }
}

/** DuckDB-dialect CTE bodies mirroring [[Corpus]] — compose oracle SQL as
  * `s"WITH ${OracleCtes.memories} SELECT ..."`. The driver registers each
  * parquet table under its bare name. */
object OracleCtes {

  /** memories CTE (embedding included; timestamp arithmetic is naive-UTC,
    * matching the Spark session's UTC timezone). */
  val memories: String =
    """memories AS MATERIALIZED (
      |  SELECT d.doc_id AS id, d.text, d.source, d.lang, d.n_chars,
      |    TIMESTAMP '2024-01-01 00:00:00' + to_seconds(d.doc_id * 25200) AS created_at,
      |    TIMESTAMP '2024-01-01 00:00:00' + to_seconds(d.doc_id * 25200) AS updated_at,
      |    CASE WHEN d.doc_id % 5 <> 0 THEN TIMESTAMP '2024-01-01 00:00:00' + to_seconds(d.doc_id * 25200) END AS document_at,
      |    CASE WHEN d.doc_id % 4 = 0 THEN TIMESTAMP '2024-01-01 00:00:00' + to_seconds(d.doc_id * 25200 + 2592000) END AS last_reinforced_at,
      |    d.doc_id % 17 = 0 AS pinned,
      |    d.doc_id % 11 = 0 AS archived,
      |    TRUE AS is_latest,
      |    CASE d.doc_id % 3 WHEN 0 THEN 'decision' WHEN 1 THEN 'learning' ELSE 'detail' END AS category,
      |    'ek' || CAST(d.doc_id AS VARCHAR) AS entity_key,
      |    CASE WHEN d.doc_id % 37 = 0 AND d.doc_id > 0 THEN d.doc_id - 1 END AS conflicts_with,
      |    e.embedding
      |  FROM documents d
      |  JOIN embeddings e ON (d.doc_id % (SELECT count(*) FROM embeddings)) = e.vec_id
      |)""".stripMargin

  /** related_to edges CTE, both directions (mirrors Corpus links rule +
    * GraphOps bidirectional expansion). */
  val edges: String =
    """edges AS MATERIALIZED (
      |  SELECT d.doc_id AS src, d.doc_id + 20 AS dst FROM documents d
      |  WHERE d.doc_id + 20 < (SELECT count(*) FROM documents)
      |  UNION ALL
      |  SELECT d.doc_id + 20 AS src, d.doc_id AS dst FROM documents d
      |  WHERE d.doc_id + 20 < (SELECT count(*) FROM documents)
      |)""".stripMargin

  val retrievalLog: String =
    """retrieval_log AS MATERIALIZED (
      |  SELECT event_id % (SELECT count(*) FROM documents) AS memory_id,
      |         'q' || CAST(user_id % 10 AS VARCHAR) AS query,
      |         CAST(event_id % 10 + 1 AS INT) AS rank,
      |         ts
      |  FROM events WHERE event_type = 'view'
      |)""".stripMargin

  val searchFeedback: String =
    """search_feedback AS MATERIALIZED (
      |  SELECT event_id AS id,
      |         event_id % (SELECT count(*) FROM documents) AS memory_id,
      |         'q' || CAST(user_id % 10 AS VARCHAR) AS query,
      |         CASE WHEN value >= 100.0 THEN 'useful' ELSE 'not_useful' END AS signal,
      |         ts
      |  FROM events WHERE event_type IN ('click', 'error')
      |)""".stripMargin

  /** Dot product of two 64-d float list columns in Double, matching
    * VectorFunctions.dot's left-to-right Double fold. */
  def dot64(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  /** SQ8 quantized-scoring CTEs mirroring [[graft.ann.Quantize]]:
    * msq(id, sc, code) over non-archived memories, qsq(qsc, qcode) for the
    * query vector, sq8(id, qscore). code_i = floor(x_i·127/scale + 0.5)
    * with scale = max|x| (which already bounds codes to ±127); the integer
    * dot is exact, so qscore is a single deterministic double expression. */
  def sq8Ctes(vecId: Long = 0L,
              from: String = "memories WHERE NOT archived"): String = {
    def codes(vec: String, sc: String) =
      s"""CASE WHEN $sc > 0
         |      THEN list_transform($vec, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / $sc + 0.5) AS BIGINT))
         |      ELSE list_transform($vec, x -> CAST(0 AS BIGINT)) END""".stripMargin
    s"""msq AS MATERIALIZED (
       |  SELECT id, sc, ${codes("embedding", "sc")} AS code
       |  FROM (SELECT id, embedding,
       |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS sc
       |    FROM $from)
       |),
       |qsq AS MATERIALIZED (
       |  SELECT sc AS qsc, ${codes("qv", "sc")} AS qcode
       |  FROM (SELECT qv, list_max(list_transform(qv, x -> abs(CAST(x AS DOUBLE)))) AS sc
       |    FROM (SELECT embedding AS qv FROM embeddings WHERE vec_id = $vecId))
       |),
       |sq8 AS MATERIALIZED (
       |  SELECT m.id, round(m.sc * q.qsc * CAST(list_sum(list_transform(range(1, 65),
       |    i -> m.code[i] * q.qcode[i])) AS DOUBLE) / 16129.0, 6) AS qscore
       |  FROM msq m, qsq q
       |)""".stripMargin
  }
}
