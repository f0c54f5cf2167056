package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Randomized CDC-fold property over the whole maintenance stack: for
  * SEEDED random event histories — any interleaving of add / update /
  * delete over a shared id space, split into arbitrary micro-batches,
  * with in-batch duplicates and deletes of never-indexed ids — the three
  * persisted indexes (BM25, IVF, LSH) maintained batch by batch through
  * [[EventStream.applyCdcBatch]] must land EXACTLY on the state a
  * from-scratch rebuild over the fold's survivors produces. One property
  * subsumes the hand-picked lifecycle cases: the reference fold is ten
  * lines of driver-side Scala (last event per id wins), so any divergence
  * localizes to the maintenance path, not the fixture. Seeds are fixed —
  * a failure reproduces byte-for-byte. */
class CdcFoldPropertySpec extends SparkSpec {

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

  for (seedVal <- Seq(7L, 23L, 99L))
    test(s"random CDC history (seed $seedVal): batch-maintained indexes == rebuild over the fold's survivors") {
      val rng = new scala.util.Random(seedVal)
      val bm25Path = s"/root/repo/target/tmp/cdcprop_bm25_$seedVal"
      val ivfPath = s"/root/repo/target/tmp/cdcprop_ivf_$seedVal"
      val lshPath = s"/root/repo/target/tmp/cdcprop_lsh_$seedVal"
      Seq(bm25Path, ivfPath, lshPath).foreach(graft.sources.Store.deleteRecursive)
      var state = (1L to 4L).map(i => i -> ((textOf(rng), vecOf(rng)))).toMap
      val seedDf = state.toSeq.map { case (id, (t, e)) => (id, t, e) }
        .toDF("id", "text", "embedding")
      graft.search.BM25Index.build(seedDf, bm25Path)
      graft.ann.IvfIndex.buildWithCentroids(seedDf,
        Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"),
        ivfPath)
      graft.dedup.LshIndex.build(seedDf.select("id", "text"), lshPath)
      // 5 micro-batches of 1-6 events over ids 1..8: ops are UNIFORM
      // random, so histories include add-on-indexed (presence-routed to
      // update), update-on-absent (routed to add), delete-of-absent
      // (lenient under seq ordering), and same-id event runs inside one
      // batch (seq-reduced to the last)
      var seqNo = 0L
      for (b <- 0 until 5) {
        val events = (0 until (1 + rng.nextInt(6))).map { _ =>
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
        EventStream.applyCdcBatch(
          events.toDF("id", "text", "embedding", "op", "seq"),
          bm25Path, ivfPath, batchId = Some(b.toLong),
          lshPath = Some(lshPath))
      }
      val survivors = state.toSeq.map { case (id, (t, e)) => (id, t, e) }
        .toDF("id", "text", "embedding")
      assert(state.nonEmpty, s"degenerate seed $seedVal: fold emptied the corpus")
      // lexical: stored-index scores == from-scratch scorer on survivors
      val probe = Seq("dup", "spark", "window", "merge")
      graft.search.BM25.clearCache()
      val idx = graft.search.BM25Index.scores(spark, bm25Path, probe)
        .as[(Long, Double)].collect().toMap
      val raw = graft.search.BM25.scores(survivors.select("id", "text"), probe)
        .as[(Long, Double)].collect().toMap
      graft.search.BM25.clearCache()
      assert(idx == raw, s"seed $seedVal BM25 diverged:\n idx=$idx\n raw=$raw")
      // vector: live assignments == direct assign of survivors against the
      // stored (frozen) centroids
      val live = graft.sources.Store.load(spark, s"$ivfPath/assignments")
        .select("id", "ivf_cell").as[(Long, Int)].collect().toMap
      val expect = graft.ann.Ann.assign(
        survivors.select("id", "embedding"),
        graft.sources.Store.load(spark, s"$ivfPath/centroids"))
        .select("id", "ivf_cell").as[(Long, Int)].collect().toMap
      assert(live == expect && live.size == state.size,
        s"seed $seedVal IVF diverged:\n live=$live\n expect=$expect")
      // shingle: stored-index near-dup pairs == in-session pipeline
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(
        pairs(graft.dedup.LshIndex.nearDuplicates(spark, lshPath, 0.2)) ==
          pairs(graft.dedup.MinHashLsh.nearDuplicates(
            survivors.select("id", "text"), 0.2)),
        s"seed $seedVal LSH diverged")
    }
}
