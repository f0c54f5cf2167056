package graft

import org.apache.spark.sql.functions._
import graft.sources.{IndexManifest, Store}

/** Pins the cross-table atomicity contract of [[graft.sources.IndexManifest]]
  * (IndexManifest.scala:28-33): a reader that resolved the index pointer
  * sees EVERY member table at that resolution's pinned generation — all-old
  * or all-new, never mixed — even while a maintenance pass is mid-publish;
  * plus the grace-window fail-loud of [[Store.loadAt]] and the batch-stamp
  * carry/supersede rules the exactly-once streaming guard rests on. */
class IndexManifestSpec extends SparkSpec {

  import spark.implicits._

  private def freshIndex(path: String): Unit = {
    Store.deleteRecursive(path)
    Store.save(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), s"$path/rows")
    Store.save(Seq((2L, 1L)).toDF("n", "total"), s"$path/stats")
    IndexManifest.capture(path, Seq("rows", "stats"))
  }

  test("a resolve taken mid-maintenance serves ALL member tables at the old pins") {
    val path = "/root/repo/target/tmp/imanifest_mid"
    freshIndex(path)
    val reader = IndexManifest.resolve(spark, path)
    // maintenance publishes member tables FIRST (each through its own
    // Store swap), capture comes last — simulate the mid-publish window:
    // rows has a new live generation, stats too, but no capture yet
    Store.appendBatch(Seq((3L, "c")).toDF("id", "v"), s"$path/rows")
    Store.save(Seq((3L, 2L)).toDF("n", "total"), s"$path/stats")
    // the old resolution AND a brand-new one both read the OLD quadruple
    assert(reader("rows").count() == 2,
      "a pinned reader must not see the unpublished member generation")
    val reader2 = IndexManifest.resolve(spark, path)
    assert(reader2("rows").count() == 2 &&
      reader2("stats").head().getLong(0) == 2L,
      "mid-maintenance resolve must be all-old, never mixed")
    // capture seals the batch: only now does a resolve see all-new
    IndexManifest.capture(path, Seq("rows", "stats"))
    val reader3 = IndexManifest.resolve(spark, path)
    assert(reader3("rows").count() == 3 &&
      reader3("stats").head().getLong(0) == 3L)
  }

  test("loadAt fail-louds on a generation outside the grace window") {
    val path = "/root/repo/target/tmp/imanifest_prune"
    Store.deleteRecursive(path)
    Store.save(Seq(1L).toDF("v"), path) // gen 1
    Store.save(Seq(2L).toDF("v"), path) // gen 2
    Store.save(Seq(3L).toDF("v"), path) // gen 3 — gen 1's manifest pruned
    assert(Store.loadAt(spark, path, 2).as[Long].collect().toSeq == Seq(2L))
    val e = intercept[IllegalArgumentException](Store.loadAt(spark, path, 1))
    assert(e.getMessage.contains("pruned or never published"))
  }

  test("batch stamps carry forward, supersede, and fold into the same pointer swap") {
    val path = "/root/repo/target/tmp/imanifest_batch"
    freshIndex(path)
    assert(IndexManifest.lastBatch(path).isEmpty)
    IndexManifest.capture(path, Seq("rows", "stats"), batchId = Some(4L))
    assert(IndexManifest.lastBatch(path).contains(4L))
    // a capture WITHOUT a batch id (a batch-side maintenance call between
    // micro-batches) must not lose the stamp
    IndexManifest.capture(path, Seq("rows", "stats"))
    assert(IndexManifest.lastBatch(path).contains(4L))
    IndexManifest.stampBatch(path, 7L)
    assert(IndexManifest.lastBatch(path).contains(7L))
    // the stamp and the table pins live in ONE manifest generation
    val st = IndexManifest.current(path).get
    assert(st.tables.keySet == Set("rows", "stats") && st.lastBatch.contains(7L))
  }
}
