package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** R2: BM25 Okapi scoring (reference memory_engine.py:224-232, 1765-1785;
  * rank_bm25's BM25Okapi formula with k1=1.5, b=0.75, epsilon=0.25).
  *
  * The reference rebuilds an in-memory index on every write; here the "index"
  * is two shuffled aggregations over the corpus — term frequencies and
  * document frequencies — that Catalyst pipelines with map-side partial
  * aggregation. At 100 TB these become a precomputed term-stats table
  * refreshed incrementally; the scoring join below is unchanged (the query
  * side is a broadcast of |query| rows).
  *
  * Formula per (doc d, query term t):
  *   idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
  * with idf(t) = ln((N - df + 0.5) / (df + 0.5)), negative idfs replaced by
  * epsilon * mean(idf over the whole vocabulary) — rank_bm25's exact rule.
  */
object BM25 {

  val K1 = 1.5
  val B = 0.75
  val Epsilon = 0.25

  /** (id, term, tf) — term frequencies per document, via the one-pass
    * [[graft.expressions.TermFreqs]] kernel: no (doc, term) shuffle, the
    * counting happens inside the scan (at corpus scale the groupBy form
    * shuffles the entire tokenized text). */
  def termFreqs(docs: DataFrame, textCol: String = "text", idCol: String = "id"): DataFrame =
    docs
      .select(col(idCol).as("id"),
        explode(org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.expressions.TermFreqs(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col(textCol))))).as("t"))
      .select(col("id"), col("t.term").as("term"), col("t.tf").as("tf"))

  /** The declarative explode/groupBy formulation of [[termFreqs]] — the
    * oracle-shaped reference the kernel is pinned to (KernelEquivalenceSpec). */
  def termFreqsDeclarative(docs: DataFrame, textCol: String = "text", idCol: String = "id"): DataFrame =
    docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("id", "term")
      .agg(count(lit(1)).as("tf"))

  /** (id, dl) — document lengths in tokens. */
  def docLens(docs: DataFrame, textCol: String = "text", idCol: String = "id"): DataFrame =
    docs.select(col(idCol).as("id"), size(tokens(col(textCol))).cast("double").as("dl"))

  /** Corpus-level scalars: (N, avgdl, avgIdf). One aggregation job each; in a
    * production deployment these live in the precomputed stats table. */
  case class Stats(n: Long, avgdl: Double, avgIdf: Double)

  /** The memoized "index": persisted term-frequency / idf / doc-length
    * frames plus the corpus scalars, shared by every scores() call over the
    * same (corpus plan, textCol) — r15's branches and repeated hybrid calls
    * pay the tokenize+groupBy once. At 100 TB this is the precomputed
    * term-stats table, refreshed incrementally. */
  private case class Index(tf: DataFrame, idf: DataFrame, dl: DataFrame, st: Stats,
                           dfTbl: DataFrame)

  // keyed on (semantic plan hash, textCol, idCol): same-path-mutated-data
  // staleness is accepted for immutable fixture/corpus runs — callers that
  // rewrite a table between queries must clearCache() (Caches.clearAll does,
  // which Bench/Verify invoke between queries)
  private val indexCache = scala.collection.concurrent.TrieMap.empty[(Int, String, String), Index]

  /** Drop all memoized BM25 state and free the persisted frames. */
  def clearCache(): Unit = {
    indexCache.values.foreach { ix =>
      ix.tf.unpersist(); ix.dfTbl.unpersist(); ix.dl.unpersist()
    }
    indexCache.clear()
  }

  private def indexFor(docs: DataFrame, textCol: String, idCol: String): Index =
    indexCache.getOrElseUpdate((docs.semanticHash(), textCol, idCol), {
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      // ONE tokenize pass: tf is the only scan of the text column. dl derives
      // from tf (dl = Σ tf per doc) — docs with zero tokens are absent from
      // both tf and dl, and can never match a query term, so the scoring
      // join is unaffected; only n/avgdl must still count them (below).
      val tf = termFreqs(docs, textCol, idCol).persist(lvl)
      val dl = tf.groupBy("id").agg(sum("tf").cast("double").as("dl")).persist(lvl)
      // the df table is built ONCE and persisted: avgIdf and the idf frame
      // both derive from it (it was previously aggregated from tf twice —
      // at corpus scale a second full shuffle of the vocabulary, guide §2.3
      // "aggregate before you shuffle" / §2.4 "share one exchange")
      val dfTbl = tf.groupBy("term").agg(count(lit(1)).as("df")).persist(lvl)
      // n counts ALL docs (token-less included); avgdl = Σtf / n (exact long
      // total, one double division — same value as avg over per-doc sizes
      // because token-less docs contribute 0) — no second tokenize pass.
      // n and totalTokens ride ONE action (two 1-row aggregates crossed);
      // only avgIdf needs a second action because its log argument embeds n.
      val ntRow = docs.agg(count(lit(1)).as("_n"))
        .crossJoin(tf.agg(coalesce(sum("tf"), lit(0L)).as("_tt"))).head()
      val n = ntRow.getLong(0)
      val totalTokens = ntRow.getLong(1)
      val avgIdf = dfTbl
        .select(avg(log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5))))
        .head().getDouble(0)
      val st = Stats(n, if (n > 0) totalTokens.toDouble / n else 0.0, avgIdf)
      val idfRaw = log((lit(st.n.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
      val idf = dfTbl
        .withColumn("idf", when(idfRaw < 0, lit(Epsilon * st.avgIdf)).otherwise(idfRaw))
      Index(tf, idf, dl, st, dfTbl)
    })

  /** The RM3 mining view of the memoized index: (tf(id, term, tf),
    * idf(term, df, idf)) — what expansion-term mining joins feedback docs
    * against, in [[prfExpanded]] and in the LongMemEval batch PRF form
    * ([[graft.eval.LongMemEval]]). Read-only frames from the same
    * memoization as [[scores]] — no extra tokenize. */
  def miningStats(docs: DataFrame, textCol: String = "text",
                  idCol: String = "id"): (DataFrame, DataFrame) = {
    val ix = indexFor(docs, textCol, idCol)
    (ix.tf, ix.idf)
  }

  /** BM25 score of every document containing at least one query token:
    * (id, bm25). Duplicate query tokens count twice (rank_bm25 iterates the
    * raw token list). Docs matching no token are absent (their score is 0).
    */
  def scores(docs: DataFrame, queryTokens: Seq[String],
             textCol: String = "text", idCol: String = "id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ix = indexFor(docs, textCol, idCol)
    // query tokens keep multiplicity: qn = occurrences of the term in the query
    val q = queryTokens.groupBy(identity).view.mapValues(_.size).toSeq
      .toDF("term", "qn")
    ix.tf
      .join(broadcast(q.join(ix.idf, "term")), "term")
      .join(ix.dl, "id")
      .groupBy("id")
      .agg(round(sum(
        col("qn") * col("idf") * col("tf") * (lit(K1) + 1.0) /
          (col("tf") + lit(K1) * (lit(1.0) - B + lit(B) * col("dl") / ix.st.avgdl))), 6)
        .as("bm25"))
  }

  /** Batch form of [[scores]]: `queryTerms` is a bounded (qid, term, qn)
    * frame (qn = the term's multiplicity in query qid); returns (qid, id,
    * bm25) for every (query, doc) pair sharing at least one term. Same
    * formula, same 6dp rounding; the query-term set rides one broadcast, so
    * scoring all queries is a single map-side join pass over the corpus
    * term frequencies — the per-query loop form would rebuild that pass per
    * query. */
  def batchScores(docs: DataFrame, queryTerms: DataFrame,
                  textCol: String = "text", idCol: String = "id"): DataFrame = {
    val ix = indexFor(docs, textCol, idCol)
    ix.tf
      .join(broadcast(queryTerms.join(ix.idf, "term")), "term")
      .join(ix.dl, "id")
      .groupBy("qid", "id")
      .agg(round(sum(
        col("qn") * col("idf") * col("tf") * (lit(K1) + 1.0) /
          (col("tf") + lit(K1) * (lit(1.0) - B + lit(B) * col("dl") / ix.st.avgdl))), 6)
        .as("bm25"))
  }

  /** RM3-lite pseudo-relevance feedback expansion (Lavrenko & Croft '01
    * relevance models; the Anserini/Indri RM3 recipe, public): run the
    * query, treat the top `fbDocs` results as pseudo-relevant, mine their
    * highest-weight non-query terms (w(t) = Σ_fb tf·idf — the tf-idf
    * estimate of the relevance model, 6dp-rounded, ties by term), and
    * re-score with the expanded query: score = bm25(original) +
    * β·bm25(expansion). Recovers vocabulary-mismatch docs that share no
    * literal query term — the classic lexical-retrieval quality lever
    * before any neural reranker.
    *
    * Scale shape: both scoring passes reuse the memoized term-stats index
    * (one tokenize of the corpus total); the expansion-term mining joins
    * the ≤fbDocs feedback set against the tf table and collects exactly
    * `fbTerms` rows (bounded, the MMR discipline). Output: (id,
    * bm25_base, bm25_exp, score), top-k by (score desc, id). */
  def prfExpanded(docs: DataFrame, queryTokens: Seq[String], k: Int = 10,
                  fbDocs: Int = 10, fbTerms: Int = 5, beta: Double = 0.4,
                  textCol: String = "text", idCol: String = "id"): DataFrame =
    prfCombinedScores(docs, queryTokens, fbDocs, fbTerms, beta, textCol, idCol)
      .orderBy(desc("score"), asc("id")).limit(k)

  /** The unlimited form of [[prfExpanded]]: (id, bm25_base, bm25_exp,
    * score) for every doc matching the original OR the mined expansion
    * query — what the hybrid BM25 branch ranks when the sparse-query
    * trigger fires ([[HybridSearch]] `Params.prf`). */
  def prfCombinedScores(docs: DataFrame, queryTokens: Seq[String],
                        fbDocs: Int = 10, fbTerms: Int = 5, beta: Double = 0.4,
                        textCol: String = "text", idCol: String = "id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ix = indexFor(docs, textCol, idCol)
    val base = scores(docs, queryTokens, textCol, idCol).localCheckpoint(true)
    val fbTop = base.filter(col("bm25") > 0)
      .orderBy(desc("bm25"), asc("id")).limit(fbDocs).select("id")
    val qset = queryTokens.distinct
    // only POSITIVE-weight terms expand (the RM3 stopword discipline: a
    // negative-idf term is in more than half the corpus and carries no
    // relevance signal — expanding with it would subtract score from
    // every candidate). On a fully saturated vocabulary the mined set is
    // empty and the ranking degrades gracefully to the base query —
    // do-no-harm, pinned by the fixture query; real recovery is pinned
    // by the hand-built spec corpus.
    val expTerms = ix.tf.join(fbTop, "id")
      .filter(!col("term").isin(qset: _*))
      .join(ix.idf, "term")
      .groupBy("term").agg(round(sum(col("tf") * col("idf")), 6).as("w"))
      .filter(col("w") > 0)
      .orderBy(desc("w"), asc("term")).limit(fbTerms)
      .select("term").as[String].collect().toSeq // bounded ≤ fbTerms rows
    val exp =
      if (expTerms.isEmpty)
        base.select(col("id"), lit(0.0).as("bm25e")).limit(0)
      else scores(docs, expTerms, textCol, idCol).withColumnRenamed("bm25", "bm25e")
    base.join(exp, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("bm25"), lit(0.0)).as("bm25_base"),
        coalesce(col("bm25e"), lit(0.0)).as("bm25_exp"),
        round(coalesce(col("bm25"), lit(0.0))
          + lit(beta) * coalesce(col("bm25e"), lit(0.0)), 6).as("score"))
  }

  /** The PRF form of [[ranked]] — the BM25 branch [[HybridSearch]] swaps
    * in when the sparse-query trigger fires: combined base+expansion
    * scores over the corpus, visibility post-filter, positives,
    * top-`oversample` by (score desc, id). Same order of operations as
    * [[ranked]] (global index first, scope second — the engine's serving
    * convention), so the two branches are interchangeable plan shapes. */
  def prfRanked(memories: DataFrame, queryTokens: Seq[String], oversample: Int,
                sourcePrefix: Option[String] = None,
                includeArchived: Boolean = false): DataFrame = {
    val visible = memories.filter(
      Filters.sourcePrefix(sourcePrefix) && Filters.notArchived(includeArchived))
    prfCombinedScores(memories, queryTokens)
      .join(visible.select("id"), "id")
      .filter(col("score") > 0)
      .orderBy(desc("score"), asc("id"))
      .limit(oversample)
  }

  /** The reference's BM25 branch: score all docs, post-filter visibility
    * (source/archived only — NOT temporal, memory_engine.py:1769-1785),
    * keep positive scores, top-`oversample`. */
  def ranked(memories: DataFrame, queryTokens: Seq[String], oversample: Int,
             sourcePrefix: Option[String] = None,
             includeArchived: Boolean = false): DataFrame = {
    val visible = memories.filter(
      Filters.sourcePrefix(sourcePrefix) && Filters.notArchived(includeArchived))
    scores(memories, queryTokens)
      .join(visible.select("id"), "id")
      .filter(col("bm25") > 0)
      .orderBy(desc("bm25"), asc("id"))
      .limit(oversample)
  }
}
