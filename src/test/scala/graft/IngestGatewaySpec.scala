package graft

import org.apache.spark.sql.functions._
import graft.ops.IngestGateway
import graft.sources.Store

/** Pins the composed add path ([[graft.ops.IngestGateway]]): a mixed batch
  * is gated against the pre-add store's IVF index (duplicate skipped,
  * novel added with its probed link count), the novel slice lands in ALL
  * THREE indexes as one generation each, and a replayed batch no-ops the
  * writes via the per-index batch stamp. */
class IngestGatewaySpec extends SparkSpec {

  import spark.implicits._

  private def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)

  test("gate + add: the duplicate is skipped, the novel row lands everywhere, the replay no-ops") {
    val bm25Path = "/root/repo/target/tmp/gw_bm25"
    val ivfPath = "/root/repo/target/tmp/gw_ivf"
    val lshPath = "/root/repo/target/tmp/gw_lsh"
    Seq(bm25Path, ivfPath, lshPath).foreach(Store.deleteRecursive)
    val seed = Seq((1L, "dup merge window", v(1, 0)),
      (2L, "spark window agg", v(0, 1))).toDF("id", "text", "embedding")
    graft.search.BM25Index.build(seed, bm25Path)
    graft.ann.IvfIndex.buildWithCentroids(seed,
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"),
      ivfPath)
    graft.dedup.LshIndex.build(seed.select("id", "text"), lshPath)
    // id 10 re-crawls doc 1's exact embedding (top-1 sim 1.0 ≥ 0.88 —
    // a duplicate); id 11 is genuinely novel (top-1 = doc 2 at 0.8),
    // linking to both store docs at the 0.2 threshold
    val incoming = Seq(
      (10L, "replayed duplicate text", v(1, 0)),
      (11L, "fresh plan shuffle", v(0.6, 0.8))
    ).toDF("id", "text", "embedding")
    val report = IngestGateway.ingestBatch(spark, incoming,
        bm25Path, ivfPath, Some(lshPath), batchId = Some(0L))
      .select("id", "action", "top_sim", "top_match_id", "n_links")
      .as[(Long, String, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(report(10L) == ((10L, "skipped_duplicate", 1.0, 1L, 0L)),
      s"duplicate row: ${report(10L)}")
    assert(report(11L) == ((11L, "added", 0.8, 2L, 2L)),
      s"novel row: ${report(11L)}")
    // the novel row (and ONLY it) landed in every index
    val expected = Seq((1L, "dup merge window"), (2L, "spark window agg"),
      (11L, "fresh plan shuffle"))
    val probe = Seq("dup", "spark", "window", "plan", "fresh")
    graft.search.BM25.clearCache()
    val idx = graft.search.BM25Index.scores(spark, bm25Path, probe)
      .as[(Long, Double)].collect().toMap
    val raw = graft.search.BM25.scores(expected.toDF("id", "text"), probe)
      .as[(Long, Double)].collect().toMap
    graft.search.BM25.clearCache()
    assert(idx == raw, s"post-ingest BM25 must equal rebuild: $idx vs $raw")
    assert(Store.load(spark, s"$ivfPath/assignments")
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 11L))
    assert(Store.load(spark, s"$lshPath/shingles")
      .select("id").distinct().as[Long].collect().toSet == Set(1L, 2L, 11L))
    // replay of the same micro-batch: the batch stamps make every index
    // write a no-op (the report itself is a per-invocation view — it now
    // reads the POST-add store, which is why the exactly-once claim is
    // about index state, not the returned frame)
    IngestGateway.ingestBatch(spark, incoming,
      bm25Path, ivfPath, Some(lshPath), batchId = Some(0L))
    assert(Store.load(spark, s"$bm25Path/scalars").head().getLong(0) == 3L)
    assert(Store.load(spark, s"$ivfPath/assignments").count() == 3L)
  }

  test("gateBatchAtRecall sizes nprobe from the measured ladder, then gates at it") {
    val ivfPath = "/root/repo/target/tmp/gw_atrecall_ivf"
    Store.deleteRecursive(ivfPath)
    def v4(a: Double, b: Double) = Array(a.toFloat, b.toFloat, 0.0f, 0.0f)
    // the RetrievalEvalSpec autoNprobe fixture: the sampled query (id 37)
    // straddles both cells, so nprobe=1 reads recall 0.6 and nprobe=2 is
    // exhaustive — a 0.9 target must size the gate to nprobe 2
    val store = ((1L to 5L).map(i => (i, v4(1, 0))) ++
      (20L to 40L).map(i => (i, if (i == 37L) v4(0.8, 0.6) else v4(0, 1))))
      .toDF("id", "embedding")
    graft.ann.IvfIndex.buildWithCentroids(store,
      Seq((0, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (1, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
        .toDF("label", "centroid"), ivfPath)
    val incoming = Seq((100L, v4(0.6, 0.8))).toDF("id", "embedding")
    val sized = IngestGateway.gateBatchAtRecall(spark, ivfPath, incoming,
        store, targetRecallPpm = 900000L, ladder = Seq(1, 2))
      .select("id", "action").as[(Long, String)].collect().toSeq
    val atTwo = IngestGateway.gateBatch(spark, ivfPath, incoming, nprobe = 2)
      .select("id", "action").as[(Long, String)].collect().toSeq
    assert(sized == atTwo,
      s"recall-sized gate must equal the nprobe-2 gate: $sized vs $atTwo")
  }

  test("dedupWithinBatch: an in-batch near-dup is dropped before the store gate and never lands") {
    val bm25Path = "/root/repo/target/tmp/gw_dedup_bm25"
    val ivfPath = "/root/repo/target/tmp/gw_dedup_ivf"
    Seq(bm25Path, ivfPath).foreach(Store.deleteRecursive)
    val seed = Seq((1L, "dup merge window", v(1, 0)),
      (2L, "spark window agg", v(0, 1))).toDF("id", "text", "embedding")
    graft.search.BM25Index.build(seed, bm25Path)
    graft.ann.IvfIndex.buildWithCentroids(seed,
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"),
      ivfPath)
    // 10 clones the STORE's doc 1 (store gate: skipped_duplicate); 11 and
    // 12 clone EACH OTHER (sim 1.0, both novel vs the store) — the default
    // gate admits both, the opt-in in-batch D3 pass drops the higher id
    val incoming = Seq(
      (10L, "replayed duplicate text", v(1, 0)),
      (11L, "fresh plan shuffle", v(0.6, 0.8)),
      (12L, "fresh plan shuffle again", v(0.6, 0.8))
    ).toDF("id", "text", "embedding")
    val report = IngestGateway.ingestBatch(spark, incoming,
        bm25Path, ivfPath, batchId = Some(0L), dedupWithinBatch = true)
      .select("id", "action").as[(Long, String)].collect().toMap
    assert(report == Map(10L -> "skipped_duplicate", 11L -> "added",
      12L -> "skipped_in_batch"), s"report: $report")
    // only the in-batch survivor landed
    assert(Store.load(spark, s"$ivfPath/assignments")
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 11L))
    assert(Store.load(spark, s"$bm25Path/scalars").head().getLong(0) == 3L)
  }
}
