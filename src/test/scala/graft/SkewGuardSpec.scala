package graft

import org.apache.spark.sql.functions._
import graft.dedup.MinHashLsh
import graft.ann.VectorLsh

/** The LSH maxBucket skew guards under a genuinely pathological bucket
  * (r17 verdict #4 watch item): the r17 count-window form buffers each
  * (band, key) bucket in one window partition before the cnt <= maxBucket
  * filter drops it, so this fixture proves the guard still (a) drops a
  * planted degenerate bucket entirely — no quadratic pair generation —
  * and (b) admits normal buckets unchanged, at a bucket size well past
  * the bound. The old groupBy+join form had the identical single-task
  * exposure in the self-join that followed, so this pins behavior, not a
  * new risk. */
class SkewGuardSpec extends SparkSpec {

  import spark.implicits._

  test("MinHash banding: a bucket past maxBucket generates zero pairs, normal pairs survive") {
    // 30 byte-identical docs -> identical signatures -> one 30-row bucket
    // per band (every band key equal); 2 near-dup docs elsewhere
    val boiler = (1L to 30L).map(i =>
      (i, "cookie banner accept all cookies to continue reading this site"))
    val pair = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight again"),
      (101L, "the quick brown fox jumps over the lazy dog tonight today"))
    val docs = (boiler ++ pair).toDF("id", "text")
    val pairs = MinHashLsh
      .candidatePairsFromShingles(MinHashLsh.shingleSets(docs), maxBucket = 10)
      .collect()
    assert(pairs.nonEmpty, "the normal near-dup pair must still be generated")
    assert(pairs.forall(r => r.getLong(0) >= 100L && r.getLong(1) >= 100L),
      s"the 30-row boilerplate bucket must be dropped by the guard, got: " +
        pairs.map(r => (r.getLong(0), r.getLong(1))).mkString(", "))
    // and with the bound above the bucket size, the bucket pairs appear —
    // the guard is the only thing standing between them and the output
    val unguarded = MinHashLsh
      .candidatePairsFromShingles(MinHashLsh.shingleSets(docs), maxBucket = 1000)
      .count()
    assert(unguarded >= 30L * 29 / 2, "sanity: the planted bucket IS quadratic unguarded")
  }

  test("VectorLsh banding: a bucket past maxBucket generates zero pairs, normal pairs survive") {
    val dim = 8
    def unit(seed: Int): Array[Float] = {
      val a = Array.tabulate(dim)(d => math.sin(seed * 31 + d * 7).toFloat)
      val n = math.sqrt(a.map(x => x.toDouble * x).sum).toFloat
      a.map(_ / n)
    }
    // 30 identical vectors share every band key; one distinct close pair
    val hot = (1L to 30L).map(i => (i, unit(1)))
    val v = unit(5)
    val pairVecs = Seq((100L, v), (101L, v.map(x => x * 0.999f)))
    val df = (hot ++ pairVecs).toDF("id", "embedding")
    val pairs = VectorLsh.candidatePairs(df, dim, maxBucket = 10)
      .select("id_a", "id_b").collect()
    assert(pairs.nonEmpty, "the normal candidate pair must still be generated")
    assert(pairs.forall(r => r.getLong(0) >= 100L && r.getLong(1) >= 100L),
      s"the 30-row hot bucket must be dropped by the guard, got: " +
        pairs.map(r => (r.getLong(0), r.getLong(1))).mkString(", "))
  }
}
