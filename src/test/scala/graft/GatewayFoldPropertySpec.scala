package graft

import org.apache.spark.sql.functions._
import graft.sources.Store
import graft.streaming.EventStream

/** Seeded randomized property for the gated ingest path: a stream of
  * random micro-batches (duplicates arise naturally — embeddings sample a
  * small set of modes) driven through [[graft.streaming.EventStream
  * .gatedIngestBatch]] must land EXACTLY the rows a local fold of the gate
  * semantics accepts: per batch, a row is accepted iff its max 6dp-rounded
  * similarity against the PRE-batch store is < 0.88 (the reference's
  * is_novel — the gate consults the store, not the in-flight batch). The
  * 2-cell fixture makes the nprobe=2 probe exhaustive, so the fold needs
  * no IVF approximation: any divergence is a real gate/maintenance bug.
  * End-state invariants: IVF live ids == the fold's accepted set, BM25
  * scores == the from-scratch scorer over it, LSH shingle ids agree.
  * Fixed seeds — a failure reproduces byte-for-byte. */
class GatewayFoldPropertySpec extends SparkSpec {

  import spark.implicits._

  private val vocab = Vector("dup", "merge", "window", "spark", "agg",
    "shuffle", "broadcast", "join", "plan", "scan")

  private def textOf(rng: scala.util.Random): String =
    Seq.fill(4 + rng.nextInt(4))(vocab(rng.nextInt(vocab.size))).mkString(" ")

  // embeddings sample 8 fixed unit modes: re-drawing a mode an earlier
  // batch accepted IS a duplicate (sim 1.0); distinct modes sit far
  // enough apart (≤ cos 22.5° ≈ 0.92 for neighbors — some pairs DO gate
  // each other, which is exactly the interesting regime)
  private val modes: Vector[Array[Float]] =
    (0 until 8).map { i =>
      val a = math.Pi * i / 8.0
      Array(math.cos(a).toFloat, math.sin(a).toFloat)
    }.toVector

  private def round6(v: Double): Double =
    if (v >= 0) math.floor(v * 1e6 + 0.5) / 1e6
    else -math.floor(-v * 1e6 + 0.5) / 1e6

  for (seedVal <- Seq(5L, 23L))
    test(s"gateway fold (seed $seedVal): streamed gated ingest == local novelty fold") {
      val rng = new scala.util.Random(seedVal)
      val bm25Path = s"/root/repo/target/tmp/gwfold_bm25_$seedVal"
      val ivfPath = s"/root/repo/target/tmp/gwfold_ivf_$seedVal"
      val lshPath = s"/root/repo/target/tmp/gwfold_lsh_$seedVal"
      Seq(bm25Path, ivfPath, lshPath).foreach(Store.deleteRecursive)
      // seed store: two orthogonal docs (modes 0 and 4 = 90° apart)
      var store = Map[Long, (String, Array[Float])](
        1L -> (("dup merge window", modes(0))),
        2L -> (("spark window agg", modes(4))))
      val seedDf = store.toSeq.map { case (id, (t, e)) => (id, t, e) }
        .toDF("id", "text", "embedding")
      graft.search.BM25Index.build(seedDf, bm25Path)
      graft.ann.IvfIndex.buildWithCentroids(seedDf,
        Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"),
        ivfPath)
      graft.dedup.LshIndex.build(seedDf.select("id", "text"), lshPath)

      var nextId = 10L
      for (b <- 0L until 4L) {
        val rows = (0 until (1 + rng.nextInt(5))).map { _ =>
          val id = nextId; nextId += 1
          (id, textOf(rng), modes(rng.nextInt(modes.size)))
        }
        // the local fold: accept iff max rounded sim vs the PRE-batch
        // store < 0.88 (every row of one batch gates against the same
        // store snapshot — exactly gateBatch's semantics)
        val preStore = store
        rows.foreach { case (id, t, e) =>
          val maxSim = preStore.values.map { case (_, se) =>
            round6(se.zip(e).map { case (x, y) => x.toDouble * y.toDouble }.sum)
          }.foldLeft(Double.NegativeInfinity)(math.max)
          if (preStore.isEmpty || maxSim < 0.88) store += id -> ((t, e))
        }
        EventStream.gatedIngestBatch(
          rows.toDF("id", "text", "embedding"), b, bm25Path, ivfPath,
          Some(lshPath))
      }
      assert(store.size > 2, s"degenerate seed $seedVal: nothing accepted")
      val accepted = store.toSeq.map { case (id, (t, e)) => (id, t, e) }
        .toDF("id", "text", "embedding")
      // vector: live assignments == the fold's accepted ids
      assert(Store.load(spark, s"$ivfPath/assignments")
        .select("id").as[Long].collect().sorted.toSeq ==
        store.keys.toSeq.sorted,
        s"seed $seedVal: gated IVF state diverged from the fold")
      // lexical: stored scores == from-scratch over the accepted set
      val probe = Seq("dup", "spark", "window", "merge", "plan")
      graft.search.BM25.clearCache()
      val idx = graft.search.BM25Index.scores(spark, bm25Path, probe)
        .as[(Long, Double)].collect().toMap
      val raw = graft.search.BM25.scores(accepted.select("id", "text"), probe)
        .as[(Long, Double)].collect().toMap
      graft.search.BM25.clearCache()
      assert(idx == raw, s"seed $seedVal BM25 diverged:\n idx=$idx\n raw=$raw")
      // shingle: same id set landed
      assert(Store.load(spark, s"$lshPath/shingles")
        .select("id").distinct().as[Long].collect().toSet == store.keySet,
        s"seed $seedVal: LSH ids diverged from the fold")
    }

  test("gateway fold with dedupWithinBatch: in-batch D3 drops precede the store gate") {
    val rng = new scala.util.Random(91L)
    val bm25Path = "/root/repo/target/tmp/gwfold_bm25_dedup"
    val ivfPath = "/root/repo/target/tmp/gwfold_ivf_dedup"
    Seq(bm25Path, ivfPath).foreach(Store.deleteRecursive)
    var store = Map[Long, (String, Array[Float])](
      1L -> (("dup merge window", modes(0))),
      2L -> (("spark window agg", modes(4))))
    val seedDf = store.toSeq.map { case (id, (t, e)) => (id, t, e) }
      .toDF("id", "text", "embedding")
    graft.search.BM25Index.build(seedDf, bm25Path)
    graft.ann.IvfIndex.buildWithCentroids(seedDf,
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"),
      ivfPath)
    var nextId = 10L
    for (b <- 0L until 4L) {
      val rows = (0 until (1 + rng.nextInt(5))).map { _ =>
        val id = nextId; nextId += 1
        (id, textOf(rng), modes(rng.nextInt(modes.size)))
      }
      def sim(a: Array[Float], c: Array[Float]): Double =
        round6(a.zip(c).map { case (x, y) => x.toDouble * y.toDouble }.sum)
      // fold layer 1 — the in-batch D3 pass: a row drops when ANY
      // lower-id row of the SAME batch sits at ≥ 0.88 (batches are ≤ 5
      // rows, so the kernel's top-5 neighbor truncation is vacuous and
      // the all-pairs rule is exact; adjacent modes at cos 22.5° ≈ 0.924
      // DO gate each other, not just identical re-draws)
      val inBatch = rows.filter { case (id, _, e) =>
        !rows.exists { case (id2, _, e2) => id2 < id && sim(e2, e) >= 0.88 }
      }
      // fold layer 2 — the store gate over the survivors (pre-batch store)
      val preStore = store
      inBatch.foreach { case (id, t, e) =>
        val maxSim = preStore.values.map { case (_, se) => sim(se, e) }
          .foldLeft(Double.NegativeInfinity)(math.max)
        if (preStore.isEmpty || maxSim < 0.88) store += id -> ((t, e))
      }
      EventStream.gatedIngestBatch(
        rows.toDF("id", "text", "embedding"), b, bm25Path, ivfPath,
        dedupWithinBatch = true)
    }
    assert(store.size > 2, "degenerate seed: nothing accepted")
    assert(Store.load(spark, s"$ivfPath/assignments")
      .select("id").as[Long].collect().sorted.toSeq == store.keys.toSeq.sorted,
      "dedup-gated IVF state diverged from the two-layer fold")
  }
}
