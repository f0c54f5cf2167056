package graft

import org.apache.spark.sql.functions._
import graft.eval.LongMemEval
import graft.search.HybridSearch

/** Round-8: the LongMemEval-shaped session-recall harness. */
class LongMemEvalSpec extends SparkSpec {

  import spark.implicits._

  test("sessions chunk on the token midpoint with /s{session}/c{chunk} sources") {
    val docs = Seq((4L, "a b c d e f g h i")).toDF("id", "text")
    val ch = LongMemEval.chunks(docs).orderBy("id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // 9 tokens: chunk 0 = first 5, chunk 1 = last 4; ids 2s and 2s+1
    assert(ch == Seq((8L, 4L, 4L, "a b c d e"), (9L, 4L, 4L, "f g h i")))
    val src = LongMemEval.seededMemories(docs)
      .orderBy("id").select("source").as[String].collect().toSeq
    assert(src == Seq("eval/lme/b4/s4/c0", "eval/lme/b4/s4/c1"))
  }

  test("question views are the documented lossy transforms, not truncations") {
    // qid must be ≡ 0 (mod 37); vary qid % 3 with 0, 37, 74
    val docs = Seq(
      (0L, "t1 t2 t3 t4 t5 t6 t7 t8"),
      (37L, "t1 t2 t3 t4 t5 t6 t7 t8"),
      (74L, "t1 t2 t3 t4 t5 t6 t7 t8")).toDF("id", "text")
    val qs = LongMemEval.questions(docs).orderBy("qid")
      .select("qid", "category", "qtext").as[(Long, String, String)].collect().toSeq
    assert(qs == Seq(
      (0L, "interleaved", "t1 t3 t5 t7"),
      (37L, "verbatim-tail", "t5 t6 t7 t8"),
      (74L, "sparse-keywords", "t1 t5")))
  }

  test("recall@5 on a hand haystack: gold session found, counted per category") {
    // bucket 0 haystack: gold session 0 plus SIX distractor sessions
    // (ids ≡ 0 mod 16) — more than SessionK, so a mis-ranking (inverted
    // RRF, broken bm25 join) demotes gold out of the top 5 and FAILS
    // this assertion; sessions 1..3 live in other buckets and never
    // score for question 0
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (16L, "one two three four five six seven eight"),
      (32L, "red orange yellow green blue indigo violet pink"),
      (48L, "cat dog bird fish horse sheep goat cow"),
      (64L, "north south east west up down left right"),
      (80L, "iron copper silver gold tin lead zinc nickel"),
      (96L, "jazz rock folk blues soul funk punk opera"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "noise words here only for the other buckets"),
      (3L, "more unrelated filler text in another bucket")).toDF("id", "text")
    val out = LongMemEval.recallAt5(docs)
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("interleaved", 1L, 1.0), ("overall", 1L, 1.0)))
  }

  test("batch formulation matches the real HybridSearch plan per question") {
    val docs = Queries.docs(spark, sf())
    val mem = LongMemEval.seededMemories(docs).localCheckpoint(true)
    val qs = LongMemEval.questions(docs)
      .select("qid", "bucket", "qtext").as[(Long, Long, String)].collect()
    assert(qs.length >= 2)
    val batch = LongMemEval.batchResults(docs)
      .select("qid", "id", "crn").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    for ((qid, bucket, qtext) <- qs.take(3)) {
      val qvec = Seq(qtext).toDF("text")
        .select(graft.embed.HashingEmbedder(64).embeddingColumn(col("text")))
        .head().getSeq[Float](0)
      val p = HybridSearch.Params(
        queryTokens = qtext.split(" ").toSeq,
        queryVec = qvec,
        k = LongMemEval.RetrievalK,
        sourcePrefix = Some(s"eval/lme/b$bucket/"))
      val real = HybridSearch.search(mem, None, p)
        .select("id").as[Long].collect().toSeq
      assert(batch(qid) == real, s"qid=$qid batch=${batch(qid)} real=$real")
    }
  }

  test("ndcg@10 equals a driver-side recomputation from the ranked results") {
    val docs = Queries.docs(spark, sf())
    val res = LongMemEval.batchResults(docs)
      .select("qid", "session", "crn").as[(Long, Long, Int)].collect()
    val ng = LongMemEval.seededMemories(docs)
      .groupBy("session").count().as[(Long, Long)].collect().toMap
    val qs = LongMemEval.questions(docs)
      .select("qid", "category").as[(Long, String)].collect()
    def disc(r: Long): Long =
      math.round(1e6 / (math.log(r + 1.0) / math.log(2.0)))
    val ndcgMicro = qs.map { case (qid, cat) =>
      val dcg = res.collect {
        case (q, s, crn) if q == qid && s == qid && crn <= 10 => disc(crn.toLong)
      }.sum
      val idcg = (1L to math.min(ng(qid), 10L)).map(disc).sum
      (cat, math.round(1e6 * dcg.toDouble / idcg))
    }
    val expected = (ndcgMicro.groupBy(_._1).view.mapValues(v =>
      (v.size.toLong, BigDecimal(v.map(_._2).sum.toDouble / v.size / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
      + ("overall" -> ((ndcgMicro.size.toLong,
        BigDecimal(ndcgMicro.map(_._2).sum.toDouble / ndcgMicro.size / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))))
    val got = LongMemEval.ndcgAt10(docs)
      .as[(String, Long, Double)].collect()
      .map { case (c, n, v) => c -> ((n, v)) }.toMap
    assert(got == expected)
  }
}
