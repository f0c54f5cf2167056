package graft

import org.apache.spark.sql.functions._
import graft.search.{BM25, BM25Index}

/** Pins the persisted BM25 index to the from-scratch scorer: building over
  * the whole corpus, and building over half then refreshing with the rest,
  * must both reproduce BM25.scores exactly (idf epsilon rule, avgdl over
  * all docs, token-less docs excluded from doclens but counted in n). */
class BM25IndexSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "dup merge window spark"),
    (2L, "spark window agg join"),
    (3L, "dup dup shuffle merge"),
    (4L, "broadcast join plan"),
    (5L, "window spark spark dup"),
    (6L, "")
  ).toDF("id", "text")

  private val query = Seq("dup", "spark", "window", "dup")

  private def scoreMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.select("id", "bm25").as[(Long, Double)].collect().toMap

  test("persisted index reproduces BM25.scores exactly") {
    val path = "/root/repo/target/tmp/bm25idx_full"
    graft.sources.Store.deleteRecursive(path)
    BM25Index.build(docs, path)
    assert(scoreMap(BM25Index.scores(spark, path, query)) ==
      scoreMap(BM25.scores(docs, query)))
  }

  test("build-half then incremental refresh equals build-all") {
    val path = "/root/repo/target/tmp/bm25idx_incr"
    graft.sources.Store.deleteRecursive(path)
    BM25Index.build(docs.filter(col("id") <= 3), path)
    BM25Index.refresh(spark, path, docs.filter(col("id") > 3))
    assert(scoreMap(BM25Index.scores(spark, path, query)) ==
      scoreMap(BM25.scores(docs, query)))
    // n must count token-less docs too (id=6 has no tokens)
    assert(graft.sources.Store.load(spark, s"$path/scalars").head().getLong(0) == 6L)
  }

  test("PRF expansion recovers a vocabulary-mismatch doc; saturated vocab does no harm") {
    // feedback docs 1-2 match "espresso" and carry crema/portafilter;
    // doc 3 shares those but NOT the query term — only expansion finds it.
    // Docs 4-15 are distinct-vocab filler so crema/portafilter keep
    // positive idf (df=3 of n=15)
    val corpus = (Seq(
      (1L, "espresso espresso crema"),
      (2L, "espresso crema portafilter"),
      (3L, "crema portafilter tamp")) ++
      (4L to 15L).map(i => (i, s"filler$i other$i noise$i")))
      .toDF("id", "text")
    BM25.clearCache()
    val base = BM25.scores(corpus, Seq("espresso"))
      .as[(Long, Double)].collect().toMap
    assert(!base.contains(3L), "doc 3 shares no query term")
    val prf = BM25.prfExpanded(corpus, Seq("espresso"), k = 5)
      .as[(Long, Double, Double, Double)].collect()
    val byId = prf.map(r => r._1 -> r).toMap
    assert(byId.contains(3L), s"expansion should recover doc 3: ${prf.toSeq}")
    assert(byId(3L)._2 == 0.0 && byId(3L)._3 > 0.0,
      "doc 3 scores through the expansion terms alone")
    // expansion must not demote the docs that matched the original query
    assert(byId(1L)._4 >= byId(1L)._2 && byId(2L)._4 >= byId(2L)._2)
    // saturated vocabulary -> no positive-weight candidates -> base ranking
    val flat = (1L to 6L).map(i => (i, "alpha beta gamma")).toDF("id", "text")
    BM25.clearCache()
    val flatPrf = BM25.prfExpanded(flat, Seq("alpha"), k = 6)
      .as[(Long, Double, Double, Double)].collect()
    assert(flatPrf.forall(r => r._3 == 0.0 && r._4 == r._2),
      s"saturated vocab must degrade to the base ranking: ${flatPrf.toSeq}")
    BM25.clearCache()
  }
}
