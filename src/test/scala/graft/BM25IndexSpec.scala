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
}
