package graft

import org.apache.spark.sql.functions._
import graft.ops.Presentation

/** O8 snippet extraction: the best query-density window is chosen with the
  * documented tie rule, and short docs emit whole. (O2-O6 are oracle-gated;
  * snippets get a hand-checkable spec because the window argmax has edge
  * cases a fixture corpus does not pin.) */
class PresentationSpec extends SparkSpec {

  import spark.implicits._

  test("indexed timeline with an exhaustive probe IS the in-session timeline") {
    // nprobe = cellCount ⇒ every variant's probed pool is the whole
    // index, so the shared-scan leg must reproduce the per-variant
    // corpus-scan leg row for row (markers + user-facts filter included)
    val mem = graft.core.Corpus.memories(spark, sf())
      .withColumn("text",
        when(col("id") % 3 === 0, concat(lit("user: "), col("text")))
          .when(col("id") % 3 === 1, concat(lit("assistant: "), col("text")))
          .otherwise(col("text")))
    val vecs = Seq(Queries.queryVec(spark, sf(), 0), Queries.queryVec(spark, sf(), 1))
    val ivfPath = "/root/repo/target/tmp/pres_o3_ivf"
    graft.sources.Store.deleteRecursive(ivfPath)
    graft.ann.IvfIndex.build(mem, graft.core.Tables.embeddings(spark, sf()), ivfPath)
    val nCells = graft.ann.IvfIndex.cellCount(spark, ivfPath)
    val exhaustive = Presentation.timelineIndexed(spark, ivfPath, mem, vecs,
        userFactsOnly = true, nprobe = nCells)
      .as[(Long, String, Option[java.sql.Timestamp])].collect().toSeq
    val inSession = Presentation.timeline(mem, vecs, userFactsOnly = true)
      .as[(Long, String, Option[java.sql.Timestamp])].collect().toSeq
    assert(exhaustive == inSession)
    graft.sources.Store.deleteRecursive(ivfPath)
  }

  test("indexed evidence packet with an exhaustive probe IS the in-session packet") {
    // nprobe = cellCount ⇒ the probed candidate pool is the whole index,
    // so the index-backed packet must reproduce the corpus-scan packet
    // row for row — for BOTH rank-key branches (score-first and the
    // recency-preferring regex match)
    val mem = graft.core.Corpus.memories(spark, sf())
    val qv = Queries.queryVec(spark, sf())
    val ivfPath = "/root/repo/target/tmp/pres_o4_ivf"
    graft.sources.Store.deleteRecursive(ivfPath)
    graft.ann.IvfIndex.build(mem, graft.core.Tables.embeddings(spark, sf()), ivfPath)
    val nCells = graft.ann.IvfIndex.cellCount(spark, ivfPath)
    Seq("dedup merge window", "latest dedup merge window").foreach { qt =>
      val exhaustive = Presentation
        .evidencePacketIndexed(spark, ivfPath, mem, qv, queryText = qt,
          nprobe = nCells)
        .as[(Int, Long, String, String, Double, String)].collect().toSeq
      val inSession = Presentation.evidencePacket(mem, qv, queryText = qt)
        .as[(Int, Long, String, String, Double, String)].collect().toSeq
      assert(exhaustive == inSession, s"queryText = '$qt'")
    }
    graft.sources.Store.deleteRecursive(ivfPath)
  }

  test("snippets: densest window wins, earliest start on ties, short docs emit whole") {
    val hits = Seq(
      // two hits early, three hits clustered late -> late window wins
      (1L, "cat x x x x x x x x x x cat dog cat y z"),
      // equal density windows -> earliest start
      (2L, "cat a b c d e f g h cat i j k l m n"),
      // shorter than the window -> whole doc, start 1
      (3L, "just cat here"))
      .toDF("id", "text")
    val out = Presentation.snippets(hits, Seq("cat", "dog"), window = 8)
      .select("id", "start_pos", "n_hits", "snippet")
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._3 == 3, s"late cluster has 3 hits: ${out(1L)}")
    assert(out(1L)._4.split(" ").count(Set("cat", "dog")) == 3)
    assert(out(2L)._2 == 1, s"tie must pick the earliest window: ${out(2L)}")
    assert(out(3L) == ((3L, 1, 1, "just cat here")))
    // no query token anywhere -> n_hits 0, first window
    val none = Presentation.snippets(
        Seq((9L, "alpha beta gamma delta")).toDF("id", "text"), Seq("zz"))
      .select("id", "start_pos", "n_hits").as[(Long, Int, Int)].head()
    assert(none == ((9L, 1, 0)))
  }
}
