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
  * [[refresh]] is the incremental path: only the ADDED documents are
  * tokenized; df/idf/avgdl shift for the whole vocabulary, but they
  * recompute from the stored postings — one aggregation over the index,
  * never a re-tokenize of the existing corpus. All four tables write with
  * [[Store.save]]'s write-then-swap atomicity, so readers never observe a
  * half-refreshed index. BM25IndexSpec pins build and build+refresh
  * bit-for-bit to the from-scratch [[BM25.scores]].
  */
object BM25Index {

  private val ScalarsSchema = StructType(Seq(
    StructField("n", LongType), StructField("avgdl", DoubleType)))

  /** Tokenize `docs` once and write all four index tables. */
  def build(docs: DataFrame, path: String,
            textCol: String = "text", idCol: String = "id"): Unit =
    writeDerived(BM25.termFreqs(docs, textCol, idCol), docs.count(), path)

  /** Incremental refresh: tokenize ONLY `addedDocs`, union with the stored
    * postings, recompute the derived tables from the merged postings. */
  def refresh(spark: SparkSession, path: String, addedDocs: DataFrame,
              textCol: String = "text", idCol: String = "id"): Unit = {
    val oldN = Store.load(spark, s"$path/scalars").head().getLong(0)
    val merged = Store.load(spark, s"$path/postings")
      .unionByName(BM25.termFreqs(addedDocs, textCol, idCol))
    writeDerived(merged, oldN + addedDocs.count(), path)
  }

  private def writeDerived(tf: DataFrame, n: Long, path: String): Unit = {
    val spark = tf.sparkSession
    // term-clustered layout: the scores() filter on query terms skips
    // whole row groups via min/max term statistics
    Store.save(tf.repartition(col("term")).sortWithinPartitions("term"),
      s"$path/postings")
    // derived tables aggregate the STORED postings (refresh never pays a
    // second tokenize pass over pre-existing documents)
    val post = Store.load(spark, s"$path/postings")
    val dfs = post.groupBy("term").agg(count(lit(1)).as("df"))
    val idfRaw = log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
    val avgIdf = dfs.agg(avg(idfRaw)).head().getDouble(0)
    Store.save(dfs.withColumn("idf",
      when(idfRaw < 0, lit(BM25.Epsilon * avgIdf)).otherwise(idfRaw)),
      s"$path/terms")
    Store.save(post.groupBy("id").agg(sum("tf").cast("double").as("dl")),
      s"$path/doclens")
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
