package graft

import org.apache.spark.sql.functions._
import graft.eval.RetrievalEval

/** Metric math and protocol semantics for the self-retrieval eval harness,
  * on corpora small enough to rank by hand. */
class RetrievalEvalSpec extends SparkSpec {

  private def df(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "text")
  }

  /** Disjoint-vocabulary corpus: every doc is its own best match in both
    * modes (small enough that no two docs share a 64-dim hash bucket with
    * matching sign — verified by the first test, which would catch a
    * collision as recall < 1). Sampled queries (id % 37 == 0): ids 0, 37. */
  private def disjointCorpus = df(
    0L -> "alpha bravo charlie delta echo foxtrot",
    5L -> "golf hotel india juliet kilo lima",
    37L -> "mike november oscar papa quebec romeo",
    38L -> "sierra tango uniform victor whiskey xray")

  test("perfect corpus scores 1.0 across the board in both modes") {
    val out = RetrievalEval.selfRetrieval(disjointCorpus).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("bm25", "vector"))
    out.foreach { r =>
      assert(r.getLong(1) == 2) // ids 0 and 37
      assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0 &&
        r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0, r.toString)
    }
  }

  test("an identical lower-id duplicate outranks the source: rank 2, MRR 0.75") {
    // doc 5 duplicates query doc 37's text; ties resolve by lower id, so
    // query 37 finds its source at rank 2 in both modes while query 0
    // stays at rank 1 -> recall@1 = 0.5, recall@5 = 1.0, MRR = 0.75
    val corpus = disjointCorpus.withColumn("text",
      when(col("id") === 5L,
        lit("mike november oscar papa quebec romeo"))
        .otherwise(col("text")))
    val out = RetrievalEval.selfRetrieval(corpus).collect()
    out.foreach { r =>
      assert(r.getLong(1) == 2)
      assert(r.getDouble(2) == 0.5, s"recall@1: $r")
      assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0, s"recall@5/10: $r")
      assert(r.getDouble(5) == 0.75, s"mrr: $r")
    }
  }

  test("query set is deterministic, bounded, and skips token-poor docs") {
    val corpus = disjointCorpus.withColumn("text",
      when(col("id") === 0L, lit("too short")).otherwise(col("text")))
    val qs = RetrievalEval.querySet(corpus).collect()
    assert(qs.map(_.getLong(0)).toSeq == Seq(37L)) // id 0 dropped: < 4 tokens
    // truncation keeps the first half of the tokens
    assert(qs.head.getString(1) == "mike november oscar")
  }
}
