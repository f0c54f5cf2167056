package graft

import org.apache.spark.sql.functions._
import graft.text.Bpe

/** BPE merge training: hand-computable merge tables, greedy left-to-right
  * application, early stop when the vocabulary runs out of pairs. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("trainMerges reproduces the hand-computed table and stops when dry") {
    // "abab"×3 + "ab"×2: pair (a,b) = 2·3 + 1·2 = 8 beats (b,a) = 3;
    // after fusing, back-to-back (ab)(ab) pairs count 3; then no pairs left
    val docs = Seq((1L, "abab abab abab ab ab")).toDF("id", "text")
    val got = Bpe.trainMerges(docs, k = 6).orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "a", "b", 8L), (2, "ab", "ab", 3L)),
      s"got ${got.toSeq}")
  }

  test("ties break lexicographically on the pair") {
    // "ab"×2 and "cd"×2 tie at count 2 → (a,b) wins round 1, (c,d) round 2
    val docs = Seq((1L, "ab ab cd cd")).toDF("id", "text")
    val got = Bpe.trainMerges(docs, k = 2).orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", "b", 2L), ("c", "d", 2L)))
  }

  test("applyMerges tokenizes new words with rank-ordered greedy merges") {
    val merges = Seq(("a", "b"), ("ab", "ab"))
    val toks = Bpe.applyMerges(Seq("ababab", "aab", "xy").toDF("w"), merges)
      .select("tokens").as[Seq[String]].collect()
    // greedy left-to-right: ab|ab|ab → (abab)|ab; overlap never crosses a
    // symbol boundary; unknown chars stay single symbols
    assert(toks(0) == Seq("abab", "ab"))
    assert(toks(1) == Seq("a", "ab"))
    assert(toks(2) == Seq("x", "y"))
  }
}
