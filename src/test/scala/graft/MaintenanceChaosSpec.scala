package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import graft.sources.Store

/** Seeded chaos over the full maintenance surface: random interleavings of
  * CDC batches, whole-table physical compaction, and drift-triggered
  * retraining — the compositions no per-operator spec exercises (CDC after
  * compaction, compaction after retrain, retrain mid-churn). End-state
  * invariants per family:
  *
  *  - BM25: stored-index scores == from-scratch scorer over the fold's
  *    survivors, and the scalar n == survivor count (compaction and
  *    retraining must be invisible to the lexical index);
  *  - LSH: stored pairs == in-session pipeline over the survivors;
  *  - IVF: the assignments and the id-sidecar agree with each other and
  *    with the survivors (cross-table consistency), every embedding is the
  *    survivor's current one, and every row's stored `csim` equals the
  *    recomputed similarity against its assigned cell's CURRENT stored
  *    centroid (post-retrain, argmax-against-original no longer holds by
  *    design — internal consistency is the invariant that survives).
  *
  * Fixed seeds: a failure reproduces byte-for-byte. */
class MaintenanceChaosSpec extends SparkSpec {

  import spark.implicits._

  private val vocab = Vector("dup", "merge", "window", "spark", "agg",
    "shuffle", "broadcast", "join", "plan", "scan")

  private def textOf(rng: scala.util.Random): String =
    Seq.fill(4 + rng.nextInt(4))(vocab(rng.nextInt(vocab.size))).mkString(" ")

  private def vecOf(rng: scala.util.Random): Array[Float] = {
    val a = 0.1 + rng.nextDouble(); val b = 0.1 + rng.nextDouble()
    val n = math.sqrt(a * a + b * b)
    Array((a / n).toFloat, (b / n).toFloat)
  }

  for (seedVal <- Seq(11L, 42L, 77L))
    test(s"chaos (seed $seedVal): random CDC / compact / retrain interleavings preserve every family's semantics") {
      val rng = new scala.util.Random(seedVal)
      val bm25Path = s"/root/repo/target/tmp/chaos_bm25_$seedVal"
      val ivfPath = s"/root/repo/target/tmp/chaos_ivf_$seedVal"
      val lshPath = s"/root/repo/target/tmp/chaos_lsh_$seedVal"
      Seq(bm25Path, ivfPath, lshPath).foreach(Store.deleteRecursive)
      var state = (1L to 6L).map(i => i -> ((textOf(rng), vecOf(rng)))).toMap
      val seedDf = state.toSeq.map { case (id, (t, e)) => (id, t, e) }
        .toDF("id", "text", "embedding")
      graft.search.BM25Index.build(seedDf, bm25Path)
      graft.ann.IvfIndex.buildWithCentroids(seedDf,
        Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"),
        ivfPath)
      graft.dedup.LshIndex.build(seedDf.select("id", "text"), lshPath)

      var batchId = -1L
      var seqNo = 0L
      def cdcStep(): Unit = {
        val events = (0 until (1 + rng.nextInt(5))).map { _ =>
          val id = 1L + rng.nextInt(8)
          val op = Seq("add", "update", "delete")(rng.nextInt(3))
          seqNo += 1
          val (t, e) =
            if (op == "delete") ("", Array.empty[Float])
            else (textOf(rng), vecOf(rng))
          (id, t, e, op, seqNo)
        }
        events.groupBy(_._1).foreach { case (id, evs) =>
          val last = evs.maxBy(_._5)
          if (last._4 == "delete") state -= id
          else state += id -> ((last._2, last._3))
        }
        batchId += 1
        EventStream.applyCdcBatch(
          events.toDF("id", "text", "embedding", "op", "seq"),
          bm25Path, ivfPath, batchId = Some(batchId),
          lshPath = Some(lshPath))
      }
      def compactStep(): Unit = {
        graft.search.BM25Index.compactBuckets(spark, bm25Path,
          0 until graft.search.BM25Index.PBuckets,
          0 until graft.search.BM25Index.DBuckets)
        graft.dedup.LshIndex.compactBuckets(spark, lshPath,
          0 until graft.dedup.LshIndex.DBuckets,
          0 until graft.dedup.MinHashLsh.NumBands)
        val cells = Store.load(spark, s"$ivfPath/assignments")
          .select("ivf_cell").distinct().as[Int].collect().toSeq
        if (cells.nonEmpty)
          graft.ann.IvfIndex.compactCells(spark, ivfPath, cells,
            0 until graft.ann.IvfIndex.DBuckets)
      }
      def retrainStep(): Unit = {
        // randomly exercise split-on-retrain under chaos: the end-state
        // invariants below (csim vs CURRENT assigned centroid, id-sidecar
        // agreement, survivor embeddings) hold whether or not cells bisect
        val floor = if (rng.nextBoolean()) Some(0.95) else None
        graft.ann.IvfIndex.retrainIfDrifted(spark, ivfPath,
          splitSimFloor = floor); ()
      }

      val probe = Seq("dup", "spark", "window", "merge")
      for (i <- 0 until 8) {
        rng.nextInt(4) match {
          case 0 | 1 => cdcStep() // bias toward churn
          case 2     => compactStep()
          case 3     => retrainStep()
        }
        // interleaved reader: a resolve between ANY two maintenance steps
        // must serve a complete, self-consistent generation set per index
        // (never a mixed or dangling state) — both query paths execute
        // end-to-end on whatever the manifest pins
        if (i % 2 == 1) {
          graft.search.BM25.clearCache()
          graft.search.BM25Index.scores(spark, bm25Path, probe).count()
          graft.search.BM25.clearCache()
          graft.ann.IvfIndex.topK(spark, ivfPath, Seq(1.0f, 0.0f), k = 3).count()
          ()
        }
      }
      assert(state.nonEmpty, s"degenerate seed $seedVal: fold emptied the corpus")
      val survivors = state.toSeq.map { case (id, (t, e)) => (id, t, e) }
        .toDF("id", "text", "embedding")

      // lexical: scores and the scalar n both equal the rebuild view
      graft.search.BM25.clearCache()
      val idx = graft.search.BM25Index.scores(spark, bm25Path, probe)
        .as[(Long, Double)].collect().toMap
      val raw = graft.search.BM25.scores(survivors.select("id", "text"), probe)
        .as[(Long, Double)].collect().toMap
      graft.search.BM25.clearCache()
      assert(idx == raw, s"seed $seedVal BM25 diverged:\n idx=$idx\n raw=$raw")
      assert(Store.load(spark, s"$bm25Path/scalars").head().getLong(0) ==
        state.size.toLong)

      // shingle: stored pairs == in-session pipeline
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(
        pairs(graft.dedup.LshIndex.nearDuplicates(spark, lshPath, 0.2)) ==
          pairs(graft.dedup.MinHashLsh.nearDuplicates(
            survivors.select("id", "text"), 0.2)),
        s"seed $seedVal LSH diverged")

      // vector: cross-table + cross-fold consistency
      val asg = Store.load(spark, s"$ivfPath/assignments")
      val liveIds = asg.select("id").as[Long].collect().sorted.toSeq
      assert(liveIds == state.keys.toSeq.sorted,
        s"seed $seedVal assignments ids diverged from the fold")
      assert(Store.load(spark, s"$ivfPath/ids").select("id")
        .as[Long].collect().sorted.toSeq == liveIds,
        s"seed $seedVal id-sidecar diverged from assignments")
      val emb = asg.select("id", "embedding")
        .as[(Long, Array[Float])].collect().toMap
      state.foreach { case (id, (_, e)) =>
        assert(emb(id).toSeq == e.toSeq,
          s"seed $seedVal id $id carries a stale embedding") }
      // every stored csim (the RAW assign-time dot — unrounded by design)
      // equals the recomputed similarity against the row's assigned
      // cell's CURRENT centroid — same Spark dot codepath, so the
      // comparison is bit-exact
      val cents = Store.load(spark, s"$ivfPath/centroids")
        .select(col("label").as("ivf_cell"), col("centroid"))
      val bad = asg.join(cents, "ivf_cell")
        .filter(graft.functions.VectorFunctions.dot(col("embedding"), col("centroid"))
          =!= col("csim"))
        .count()
      assert(bad == 0L, s"seed $seedVal: $bad rows carry a csim inconsistent " +
        "with their assigned cell's current centroid")
    }
}
