package graft

import org.apache.spark.sql.functions._
import graft.sources.{FaultPoints, IndexManifest, Store}
import graft.streaming.EventStream

/** Pins the cross-index read bound documented on
  * [[graft.search.HybridSearch.searchIndexed]]: a reader resolving the
  * BM25 and IVF manifests while a CDC batch is mid-dispatch sees their
  * batch stamps AT MOST one micro-batch apart — each batch stamps every
  * index before the next batch starts, so the only skew window is the gap
  * between the two sequential index applies inside one batch. */
class CrossIndexSkewSpec extends SparkSpec {

  import spark.implicits._

  private def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)

  test("mid-dispatch manifest stamps never diverge by more than one batch") {
    val bm25Path = "/root/repo/target/tmp/skew_bm25"
    val ivfPath = "/root/repo/target/tmp/skew_ivf"
    Seq(bm25Path, ivfPath).foreach(Store.deleteRecursive)
    val seed = Seq((1L, "dup merge window", v(1, 0)),
      (2L, "spark window agg", v(0, 1))).toDF("id", "text", "embedding")
    graft.search.BM25Index.build(seed, bm25Path)
    graft.ann.IvfIndex.buildWithCentroids(seed,
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"),
      ivfPath)
    // observe (not crash): at the point BETWEEN the two index applies —
    // the widest skew window a concurrent reader can hit — record both
    // stamps; across 3 batches the skew must stay ≤ 1, with BM25 (the
    // first apply) never behind IVF
    val observed = scala.collection.mutable.ArrayBuffer[(Option[Long], Option[Long])]()
    FaultPoints.install { l =>
      if (l == "cdc.betweenIndexApplies")
        observed += ((IndexManifest.lastBatch(bm25Path), IndexManifest.lastBatch(ivfPath)))
    }
    try {
      for (b <- 0L to 2L) {
        val batch = Seq((10L + b, s"batch $b text window", v(0.8, 0.6), "add", 1L))
          .toDF("id", "text", "embedding", "op", "seq")
        EventStream.cdcBatch(batch, b, bm25Path, ivfPath)
      }
    } finally FaultPoints.install(null)
    assert(observed.size == 3)
    observed.zipWithIndex.foreach { case ((bmB, ivfB), i) =>
      // mid-batch i: BM25 already stamped i, IVF still at i-1 (None for
      // the first) — exactly one batch of skew, never more
      assert(bmB.contains(i.toLong), s"batch $i: bm25 stamp $bmB")
      val ivfExpected = if (i == 0) None else Some(i.toLong - 1)
      assert(ivfB == ivfExpected, s"batch $i: ivf stamp $ivfB")
      val skew = bmB.getOrElse(-1L) - ivfB.getOrElse(-1L)
      assert(skew >= 0 && skew <= 1, s"batch $i: skew $skew")
    }
    // quiescent: the stamps agree again
    assert(IndexManifest.lastBatch(bm25Path) == IndexManifest.lastBatch(ivfPath))
  }

  test("resolveAll: a reader never observes mixed stamps — it waits out the skew or fail-louds") {
    val bm25Path = "/root/repo/target/tmp/skewall_bm25"
    val ivfPath = "/root/repo/target/tmp/skewall_ivf"
    Seq(bm25Path, ivfPath).foreach(Store.deleteRecursive)
    val seed = Seq((1L, "dup merge window", v(1, 0)),
      (2L, "spark window agg", v(0, 1))).toDF("id", "text", "embedding")
    graft.search.BM25Index.build(seed, bm25Path)
    graft.ann.IvfIndex.buildWithCentroids(seed,
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"),
      ivfPath)
    // unstamped indexes carry no epoch: resolveAll returns immediately
    val lds0 = IndexManifest.resolveAll(spark, Seq(bm25Path, ivfPath))
    assert(lds0(ivfPath)("assignments").count() == 2L)
    // batch 0 lands on both: stamps agree, resolveAll succeeds
    val b0 = Seq((10L, "batch zero window", v(0.8, 0.6), "add", 1L))
      .toDF("id", "text", "embedding", "op", "seq")
    EventStream.cdcBatch(b0, 0L, bm25Path, ivfPath)
    val lds1 = IndexManifest.resolveAll(spark, Seq(bm25Path, ivfPath))
    // the loaders are FROZEN at the agreeing epoch: a publish AFTER
    // resolveAll returns is invisible through them — no torn read ever
    val preN = lds1(bm25Path)("scalars").head().getLong(0)
    val preA = lds1(ivfPath)("assignments").count()
    // mid-skew state: stamp ONLY bm25 with batch 1 (the widest window a
    // writer leaves); a waiting reader sees disagreeing stamps
    IndexManifest.stampBatch(bm25Path, 1L)
    // (a) with no writer to converge the stamps, resolveAll fail-louds
    // after bounded retries instead of hanging the query
    val e = intercept[IllegalStateException] {
      IndexManifest.resolveAll(spark, Seq(bm25Path, ivfPath), maxRetries = 2)
    }
    assert(e.getMessage.contains("stamps still disagree"), e.getMessage)
    // (b) a live writer closes the window: a delayed thread stamps the
    // lagging index; the reader retries until the stamps agree and then
    // resolves — never serving the mixed pair
    val t = new Thread(() => {
      Thread.sleep(150)
      IndexManifest.stampBatch(ivfPath, 1L)
    })
    t.start()
    val lds2 = IndexManifest.resolveAll(spark, Seq(bm25Path, ivfPath))
    t.join()
    assert(IndexManifest.lastBatch(bm25Path) == IndexManifest.lastBatch(ivfPath))
    assert(lds2(ivfPath)("assignments").count() == 3L)
    // the earlier frozen loaders still serve their own epoch untouched
    assert(lds1(bm25Path)("scalars").head().getLong(0) == preN)
    assert(lds1(ivfPath)("assignments").count() == preA)
  }
}
