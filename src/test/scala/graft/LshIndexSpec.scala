package graft

import org.apache.spark.sql.functions._
import graft.dedup.{LshIndex, MinHashLsh}

/** Pins the persisted MinHash-LSH index to the in-session pipeline: any
  * mix of build / refresh / delete / upsert must answer near-duplicate
  * pairs exactly as [[MinHashLsh.nearDuplicates]] over the equivalent
  * corpus — the shingle-side analog of BM25IndexSpec's maintenance ≡
  * rebuild pins. */
class LshIndexSpec extends SparkSpec {

  import spark.implicits._

  // near-dup families: 1≈2 (one word differs), 4≈5 (shifted copy);
  // 3 and 6 are distinct; 7 is too short to shingle (2 tokens)
  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy cat tonight"),
    (3L, "completely unrelated text about spark partition pruning"),
    (4L, "alpha beta gamma delta epsilon zeta eta theta iota"),
    (5L, "beta gamma delta epsilon zeta eta theta iota kappa"),
    (6L, "storage engines compact immutable files into generations"),
    (7L, "too short")
  ).toDF("id", "text")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet

  test("build + refresh + delete answers pairs exactly as the in-session pipeline") {
    val path = "/root/repo/target/tmp/lsh_idx_spec"
    graft.sources.Store.deleteRecursive(path)
    LshIndex.build(corpus.filter(col("id") <= 3), path)
    LshIndex.refresh(spark, path, corpus.filter(col("id") > 3))
    assert(pairs(LshIndex.nearDuplicates(spark, path, 0.2)) ==
      pairs(MinHashLsh.nearDuplicates(corpus, 0.2)))
    // retire doc 5: the 4≈5 pair must vanish, 1≈2 must survive
    LshIndex.deleteRefresh(spark, path, Seq(5L).toDF("id"))
    assert(pairs(LshIndex.nearDuplicates(spark, path, 0.2)) ==
      pairs(MinHashLsh.nearDuplicates(corpus.filter(col("id") =!= 5), 0.2)))
    // deleting a never-shingled doc (7) and an unknown id is a lenient
    // no-op — no global scalar exists to go stale
    LshIndex.deleteRefresh(spark, path, Seq(7L, 99L).toDF("id"))
    assert(pairs(LshIndex.nearDuplicates(spark, path, 0.2)) ==
      pairs(MinHashLsh.nearDuplicates(corpus.filter(col("id") =!= 5), 0.2)))
  }

  test("incremental batch pairs == the full run's pairs whose greater side is in the batch") {
    val path = "/root/repo/target/tmp/lsh_idx_bp"
    graft.sources.Store.deleteRecursive(path)
    LshIndex.build(corpus.filter(col("id") <= 3), path)
    LshIndex.refresh(spark, path, corpus.filter(col("id") > 3))
    val batch = pairs(LshIndex.nearDuplicatesForBatch(spark, path,
      corpus.filter(col("id") > 3).select("id"), 0.2))
    val full = pairs(MinHashLsh.nearDuplicates(corpus, 0.2))
    assert(batch == full.filter(_._2 > 3L), s"batch $batch vs full $full")
    // the fixture's 4≈5 pair IS batch-touching, so the subset is non-trivial
    assert(batch.exists(p => p._1 == 4L && p._2 == 5L))
  }

  test("upsertRefresh re-bands a re-crawled doc in one generation; refresh fail-louds on replays") {
    val path = "/root/repo/target/tmp/lsh_idx_ups"
    graft.sources.Store.deleteRecursive(path)
    LshIndex.build(corpus, path)
    val e = intercept[IllegalArgumentException] {
      LshIndex.refresh(spark, path, corpus.filter(col("id") === 1))
    }
    assert(e.getMessage.contains("ALREADY indexed"))
    // doc 2 re-crawled into doc 4's family: pairs shift from (1,2) to (2,4)(2,5)
    LshIndex.upsertRefresh(spark, path,
      Seq((2L, "alpha beta gamma delta epsilon zeta eta theta kappa")).toDF("id", "text"))
    val equivalent = corpus.filter(col("id") =!= 2).unionByName(
      Seq((2L, "alpha beta gamma delta epsilon zeta eta theta kappa")).toDF("id", "text"))
    assert(pairs(LshIndex.nearDuplicates(spark, path, 0.2)) ==
      pairs(MinHashLsh.nearDuplicates(equivalent, 0.2)))
    // a re-crawl that shrank below the shingle threshold leaves the index
    LshIndex.upsertRefresh(spark, path, Seq((4L, "now tiny")).toDF("id", "text"))
    assert(pairs(LshIndex.nearDuplicates(spark, path, 0.2)) ==
      pairs(MinHashLsh.nearDuplicates(
        equivalent.filter(col("id") =!= 4), 0.2)))
  }

  test("compactBuckets rewrites ONLY the named partitions; pairs unchanged") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val path = "/root/repo/target/tmp/lsh_idx_compact"
    graft.sources.Store.deleteRecursive(path)
    LshIndex.build(corpus, path)
    LshIndex.deleteRefresh(spark, path, Seq(5L).toDF("id"))
    val pre = pairs(LshIndex.nearDuplicates(spark, path, 0.2))
    def files(table: String) = {
      val w = Files.walk(Paths.get(path, table, "data"))
      try w.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map(_.toString).toSet
      finally w.close()
    }
    val (shBefore, bdBefore) = (files("shingles"), files("bands"))
    val dbs = LshIndex.bucketsForIds(Seq(5L))
    LshIndex.compactBuckets(spark, path, dbs,
      0 until MinHashLsh.NumBands)
    val (shAfter, bdAfter) = (files("shingles"), files("bands"))
    // immutability: no pre-existing file of either table was rewritten
    assert(shBefore.subsetOf(shAfter), s"missing: ${shBefore -- shAfter}")
    assert(bdBefore.subsetOf(bdAfter), s"missing: ${bdBefore -- bdAfter}")
    // targeting: every new shingles DATA file sits in a named db bucket —
    // and whether any exists is itself deterministic: survivors share doc
    // 5's bucket iff their driver-side hash says so (a fully-tombstoned
    // bucket compacts to a tombstone-only generation, no data files)
    val added = (shAfter -- shBefore).filter(_.matches(".*/data/b\\d+/.*"))
    assert(added.forall(f => dbs.exists(b => f.contains(s"db=$b/"))),
      s"compaction wrote outside the named buckets: $added")
    val survivorsShareBucket = corpus.filter(col("id") =!= 5)
      .filter(size(graft.functions.TextFunctions.tokens(col("text"))) >= 3)
      .select("id").as[Long].collect()
      .exists(id => dbs.contains(graft.functions.SparkHash.bucketOfLong(id, LshIndex.DBuckets)))
    assert(added.nonEmpty == survivorsShareBucket)
    // the bands side always rewrites (every partition holds survivors)
    assert((bdAfter -- bdBefore).exists(_.matches(".*/data/b\\d+/.*band=.*")))
    // and the rewrite is semantically invisible
    assert(pairs(LshIndex.nearDuplicates(spark, path, 0.2)) == pre)
  }
}
