package graft

import org.apache.spark.sql.functions._
import graft.text.Curation

/** Training-data curation pipeline: stage semantics and funnel invariants. */
class CurationSpec extends SparkSpec {

  private def df(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "text")
  }

  test("exact dedup keys on normalized text and keeps the lowest id") {
    val docs = df(
      1L -> "The quick  brown fox jumps over a lazy dog in the park",
      2L -> "the quick brown fox jumps over a lazy dog in the park",
      3L -> "a completely different sentence about the database engine for testing here")
    val st = Curation.curate(docs, minQuality = 0.3)
    assert(st.kept.count() === 3)
    assert(st.exact.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
  }

  test("near-dup stage drops the higher id of each pair") {
    val docs = df(
      1L -> "the quick brown fox jumps over a lazy dog in the green park today",
      2L -> "the quick brown fox jumps over a lazy dog in the green park tonight",
      3L -> "a completely different sentence about the database engine for testing here")
    val st = Curation.curate(docs, minQuality = 0.3, jaccardThreshold = 0.5)
    val pairs = st.pairs.collect()
    assert(pairs.length === 1)
    assert((pairs.head.getLong(0), pairs.head.getLong(1)) === (1L, 2L))
    assert(st.survivors.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
  }

  test("profile filter removes wrong-language and low-quality rows") {
    val docs = df(
      1L -> "the quick brown fox jumps over a lazy dog in the park",
      2L -> "der hund und die katze ist nicht mit ein zu auf haus",
      3L -> "the the the the the the the the the the the")
    val st = Curation.curate(docs, minQuality = 0.5)
    assert(st.profiled.count() === 3)
    assert(st.kept.select("id").collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("deterministic sampling: rate bounds, prefix resolution, partition invariance") {
    val docs = core.Tables.documents(spark, sf()).withColumnRenamed("doc_id", "id")
    assert(Curation.deterministicSample(docs, Seq(("src", 0.0))).count() === 0)
    assert(Curation.deterministicSample(docs, Seq(("src", 1.0))).count() === docs.count())
    val sampled = Curation.deterministicSample(docs, Seq(("src1", 0.25), ("src", 0.75)))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(sampled.nonEmpty && sampled.size < docs.count())
    // same rows regardless of physical partitioning — the property that
    // makes the sample reproducible on a cluster
    val resampled = Curation.deterministicSample(docs.repartition(7), Seq(("src1", 0.25), ("src", 0.75)))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(resampled === sampled)
  }

  test("empty and fully-filtered corpora produce zero funnels, not nulls or crashes") {
    val empty = df()
    val zeroRow = Curation.funnel(empty).head()
    assert((0 until 5).map(zeroRow.getLong) === Seq(0L, 0L, 0L, 0L, 0L))
    // nothing passes a quality bar of 1.0: pipeline stages are all empty
    val docs = df(1L -> "the quick brown fox jumps over a lazy dog in the park")
    val strict = Curation.funnel(docs, minQuality = 1.0).head()
    assert(strict.getLong(0) === 1L)
    assert((1 until 5).map(strict.getLong) === Seq(0L, 0L, 0L, 0L))
    assert(Curation.curate(docs, minQuality = 1.0).survivors.count() === 0)
  }

  test("funnel counts are monotone and consistent on the fixture corpus") {
    val docs = core.Tables.documents(spark, sf()).withColumnRenamed("doc_id", "id")
    val st = Curation.curate(docs)
    val row = Curation.funnel(docs).head()
    val (profiled, kept, exact, ndPairs, survivors) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    assert(profiled > 0 && kept > 0 && survivors > 0)
    assert(kept <= profiled && exact <= kept && survivors <= exact)
    // every dropped near-dup is the higher id of some surviving-pair partner
    val droppedByNd = exact - survivors
    val distinctIdB = st.pairs.select("id_b").distinct().count()
    assert(droppedByNd === distinctIdB)
    assert(ndPairs >= distinctIdB)
  }
}
