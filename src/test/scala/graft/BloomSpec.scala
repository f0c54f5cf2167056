package graft

import org.apache.spark.sql.functions._
import graft.text.{BloomDecontam, Curation}

/** The bloom prefilter must be invisible in results: no false negatives by
  * construction, false positives killed by the exact verify join. */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  private def docs = core()
  private def core() = {
    val d = graft.core.Tables.documents(spark, sf())
    d.select(col("doc_id").as("id"), col("text"))
  }

  test("bloomContamination == exact contamination on the same fixture") {
    val d = docs
    val bench = d.filter($"id" % 20 === 3)
    val got = BloomDecontam.bloomContamination(d, bench, minShared = 2)
      .select("id", "bench_id", "n_shared")
      .as[(Long, Long, Long)].collect().toSet
    val want = Curation.contamination(d, bench, minShared = 2)
      .select("id", "bench_id", "n_shared")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture must produce collisions")
  }

  test("a tiny, high-fpp filter still yields exact results") {
    // fpp 0.5 floods the candidate stream with false positives; the verify
    // join must still reduce to the exact answer
    val d = docs.limit(100)
    val bench = d.filter($"id" % 10 === 3)
    val got = BloomDecontam.bloomContamination(d, bench, minShared = 1, fpp = 0.5)
      .select("id", "bench_id").as[(Long, Long)].collect().toSet
    val want = Curation.contamination(d, bench, minShared = 1)
      .select("id", "bench_id").as[(Long, Long)].collect().toSet
    assert(got == want)
  }
}
