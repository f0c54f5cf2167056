package graft.search

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import graft.sources.Store

/** The persisted form of the BM25 "index" — the 100 TB story that
  * [[BM25]]'s in-session memoization points at, made concrete.
  *
  * The reference rebuilds its rank_bm25 index in RAM on every write
  * (memory_engine.py:224-232); a corpus that doesn't fit one machine needs
  * the same state as tables:
  *
  *   <path>/postings  (id, term, tf)   repartitioned by term, term-sorted
  *                                     within partitions so a query-term
  *                                     filter prunes row groups at scan time
  *   <path>/terms     (term, df, idf)  final idf (negative idfs already
  *                                     replaced by epsilon * mean idf)
  *   <path>/doclens   (id, dl)         token counts (token-less docs absent,
  *                                     same convention as BM25.indexFor)
  *   <path>/scalars   (n, avgdl)      one row (avg idf is baked into the
  *                                     stored idf column, not re-read)
  *
  * [[refresh]] / [[deleteRefresh]] / [[upsertRefresh]] are the
  * incremental paths (the r9 verdict's invalidation EXECUTOR, lexical
  * side): only the CHANGED documents are ever tokenized; their postings
  * and doclens rows land/leave through [[Store]]'s O(batch)
  * appendBatch/deleteBatch/upsertBatch generations. df/idf/avgdl shift
  * for the whole vocabulary when N changes (idf = ln((N−df+.5)/(df+.5))
  * is global by definition), so the small derived tables recompute from
  * the stored postings — one aggregation over the index, never a
  * re-tokenize of the existing corpus. Each table publishes with the
  * pointer-swap atomicity, so readers never observe a half-refreshed
  * table (cross-table consistency is the caller's batch boundary, as in
  * the reference's single-writer engine, memory_engine.py:616-620).
  * BM25IndexSpec pins build, build+refresh, and build+deleteRefresh
  * bit-for-bit to the from-scratch [[BM25.scores]] over the equivalent
  * corpus.
  *
  * Maintainability contract: a document is maintainable iff it has a
  * doclens row (token-less docs never enter postings/doclens — they
  * cannot be incrementally retired, and [[deleteRefresh]] fail-louds on
  * ids it cannot find rather than silently leaving N stale; the engine's
  * corpora contain none — the chunker drops <20-char fragments).
  */
object BM25Index {

  private val ScalarsSchema = StructType(Seq(
    StructField("n", LongType), StructField("avgdl", DoubleType)))

  /** Tokenize `docs` once and write all four index tables. */
  def build(docs: DataFrame, path: String,
            textCol: String = "text", idCol: String = "id"): Unit = {
    val spark = docs.sparkSession
    val tf = BM25.termFreqs(docs, textCol, idCol)
    // term-clustered layout: the scores() filter on query terms skips
    // whole row groups via min/max term statistics
    Store.save(tf.repartition(col("term")).sortWithinPartitions("term"),
      s"$path/postings")
    // doclens aggregates the STORED postings (one tokenize pass total)
    Store.save(doclensOf(Store.load(spark, s"$path/postings")), s"$path/doclens")
    writeStats(spark, path, docs.count())
  }

  /** Incremental add: tokenize ONLY `addedDocs` and append their postings
    * and doclens rows as new generations — O(batch) I/O (the pre-existing
    * posting dirs are reused, never rewritten); the vocabulary tables
    * recompute from the stored postings. */
  def refresh(spark: SparkSession, path: String, addedDocs: DataFrame,
              textCol: String = "text", idCol: String = "id"): Unit = {
    val oldN = Store.load(spark, s"$path/scalars").head().getLong(0)
    val tf = BM25.termFreqs(addedDocs, textCol, idCol)
      .repartition(col("term")).sortWithinPartitions("term")
      .localCheckpoint(true) // feeds postings AND doclens; tokenize once
    Store.appendBatch(tf, s"$path/postings")
    Store.appendBatch(doclensOf(tf), s"$path/doclens")
    writeStats(spark, path, oldN + addedDocs.count())
  }

  /** O(batch) delete: tombstone the deleted docs' postings and doclens
    * rows (no posting list is rewritten — readers anti-join the id keys
    * until compaction) and recompute the vocabulary tables at the reduced
    * N. Fail-loud: every deleted id must have a doclens row — an unknown
    * or token-less id would silently leave N wrong for every future
    * score, so it raises instead (see the maintainability contract). */
  def deleteRefresh(spark: SparkSession, path: String, deletedIds: DataFrame,
                    idCol: String = "id"): Unit = {
    val ids = deletedIds.select(col(idCol).as("id")).distinct()
      .localCheckpoint(true) // read 3x: presence check + two tombstone dirs
    val asked = ids.count()
    val present = Store.load(spark, s"$path/doclens").join(ids, "id").count()
    require(present == asked,
      s"deleteRefresh: only $present of $asked ids are indexed — deleting " +
        "documents unknown to the index (absent or token-less) would leave " +
        "N stale; rebuild instead")
    val oldN = Store.load(spark, s"$path/scalars").head().getLong(0)
    Store.deleteBatch(spark, s"$path/postings", ids)
    Store.deleteBatch(spark, s"$path/doclens", ids)
    writeStats(spark, path, oldN - asked)
  }

  /** O(batch) update for re-crawled/changed documents: ONE generation per
    * table that tombstones the batch ids and appends their fresh postings
    * and doclens rows ([[Store.upsertBatch]] — a reader sees a doc's old
    * postings or its new ones, never a mix). Batch ids with a doclens row
    * are updates (N unchanged); ids without one are NEW documents (N
    * grows) — see the maintainability contract above. */
  def upsertRefresh(spark: SparkSession, path: String, changedDocs: DataFrame,
                    textCol: String = "text", idCol: String = "id"): Unit = {
    val ids = changedDocs.select(col(idCol).as("id")).distinct()
      .localCheckpoint(true)
    val present = Store.load(spark, s"$path/doclens").join(ids, "id").count()
    val oldN = Store.load(spark, s"$path/scalars").head().getLong(0)
    val tf = BM25.termFreqs(changedDocs, textCol, idCol)
      .repartition(col("term")).sortWithinPartitions("term")
      .localCheckpoint(true)
    Store.upsertBatch(tf, s"$path/postings", ids)
    Store.upsertBatch(doclensOf(tf), s"$path/doclens", ids)
    writeStats(spark, path, oldN - present + changedDocs.count())
  }

  private def doclensOf(postings: DataFrame): DataFrame =
    postings.groupBy("id").agg(sum("tf").cast("double").as("dl"))

  /** The vocabulary-global tables from the LIVE postings view: (term, df,
    * idf) and the (n, avgdl) scalars. One aggregation over the stored
    * index — never a tokenize. */
  private def writeStats(spark: SparkSession, path: String, n: Long): Unit = {
    val post = Store.load(spark, s"$path/postings")
    val dfs = post.groupBy("term").agg(count(lit(1)).as("df"))
    val idfRaw = log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
    val avgIdf = dfs.agg(avg(idfRaw)).head().getDouble(0)
    Store.save(dfs.withColumn("idf",
      when(idfRaw < 0, lit(BM25.Epsilon * avgIdf)).otherwise(idfRaw)),
      s"$path/terms")
    val totalTokens = post.agg(coalesce(sum("tf"), lit(0L))).head().getLong(0)
    val scalars = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(n, if (n > 0) totalTokens.toDouble / n else 0.0)),
      ScalarsSchema)
    Store.save(scalars, s"$path/scalars")
  }

  /** BM25 scores from the persisted index — the same Okapi formula as
    * [[BM25.scores]], but the corpus side is the stored postings pruned to
    * the query terms; only |query| terms' posting lists are read. */
  def scores(spark: SparkSession, path: String,
             queryTokens: Seq[String]): DataFrame = {
    import spark.implicits._
    val sc = Store.load(spark, s"$path/scalars").head()
    val avgdl = sc.getDouble(1)
    val q = queryTokens.groupBy(identity).view.mapValues(_.size).toSeq
      .toDF("term", "qn")
    val terms = Store.load(spark, s"$path/terms")
      .filter(col("term").isin(queryTokens.distinct: _*))
    Store.load(spark, s"$path/postings")
      .filter(col("term").isin(queryTokens.distinct: _*))
      .join(broadcast(q.join(terms, "term")), "term")
      .join(Store.load(spark, s"$path/doclens"), "id")
      .groupBy("id")
      .agg(round(sum(
        col("qn") * col("idf") * col("tf") * (lit(BM25.K1) + 1.0) /
          (col("tf") + lit(BM25.K1) * (lit(1.0) - BM25.B + lit(BM25.B) * col("dl") / avgdl))), 6)
        .as("bm25"))
  }
}
