package graft

import org.apache.spark.sql.functions._
import graft.text.Unigram

/** Round-8: unigram-LM (SentencePiece-style) tokenizer training. */
class UnigramSpec extends SparkSpec {

  import spark.implicits._

  test("Viterbi segmentation minimizes total integer cost") {
    val vocab = Map("a" -> 5L, "b" -> 7L, "ab" -> 11L)
    val out = Seq("aab", "ba", "abab").toDF("w")
      .select(col("w"), Unigram.segmentCol(col("w"), vocab).as("ps"))
      .as[(String, Seq[String])].collect().toMap
    assert(out("aab") == Seq("a", "ab")) // 16 beats a+a+b = 17
    assert(out("ba") == Seq("b", "a"))
    assert(out("abab") == Seq("ab", "ab")) // 22 beats a+b+ab = 23
  }

  test("unigram EM learns the planted subword and prunes to the final vocab") {
    // Hand EM (full derivation):
    //  words: ababab×2, ab×1, cd×1. Seed = chars {a:7,b:7,c:1,d:1} +
    //  multi ≥2 {ab:7,ba:4,aba:4,bab:4,abab:4,baba:2} (cd count 1 → out).
    //  Round 1: "ababab" → [abab, ab] (integer tie 4095236 at position 6
    //  between l=2 and l=4 arms breaks to l=2); "ab" → [ab]; "cd" → [c,d]
    //  (no cd piece). Counts: ab:3, abab:2, c:1, d:1 — a/b drop (count 0).
    //  Round 2: same segmentations under the round-1 costs, same counts.
    //  Final: multi top-48 {ab:3, abab:2} + seed chars floored at 1.
    //  Total 9 → nll_micro: ab round(ln(9/3)e6)=1098612,
    //  abab round(ln(9/2)e6)=1504077, chars round(ln 9 e6)=2197225.
    val docs = Seq((1L, "ababab ab"), (2L, "ababab cd")).toDF("id", "text")
    val v = Unigram.train(docs)
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(v == Seq(
      (1, "ab", 3L, 1098612L),
      (2, "abab", 2L, 1504077L),
      (3, "a", 1L, 2197225L),
      (4, "b", 1L, 2197225L),
      (5, "c", 1L, 2197225L),
      (6, "d", 1L, 2197225L)))
    // tokenize: ababab → [abab, ab] (2 pieces), ab → [ab], cd → [c, d]
    val t = Unigram.tokenizeCounts(docs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(t == Seq((1L, 2L, 3L), (2L, 2L, 4L)))
  }

  test("words over MaxWordLen are outside the tokenizer's domain") {
    val docs = Seq((1L, "short waylongerthantwelve ok")).toDF("id", "text")
    val words = Unigram.wordCounts(docs).select("w").as[String].collect().toSet
    assert(words == Set("short", "ok"))
    val t = Unigram.tokenizeCounts(docs).as[(Long, Long, Long)].collect()
    assert(t.head._2 == 2L) // n_words counts only trainable words
  }

  test("DP segmentation equals brute-force enumeration on every short word") {
    // exhaustive oracle: enumerate ALL segmentations of words up to 7
    // chars over a small vocab, pick min total cost with the DP's own
    // tie-break (cost, then piece count... the DP ties by shorter LAST
    // piece at each position, which brute force reproduces by comparing
    // (cost, reversed piece-length sequence) lexicographically)
    val vocab = Map("a" -> 9L, "b" -> 8L, "ab" -> 15L, "ba" -> 13L,
      "aba" -> 21L, "bb" -> 20L, "abab" -> 26L)
    def bruteSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(Unigram.MaxPieceLen, w.length)).flatMap { l =>
        val p = w.substring(0, l)
        if (vocab.contains(p)) bruteSegs(w.substring(l)).map(p +: _) else Nil
      }
    def cost(seg: Seq[String]): Long = seg.map(vocab).sum
    val words = for {
      n <- 1 to 7
      bits <- 0 until (1 << n)
    } yield (0 until n).map(i => if ((bits >> i & 1) == 0) 'a' else 'b').mkString
    val got = words.toDF("w")
      .select(col("w"), Unigram.segmentCol(col("w"), vocab).as("ps"))
      .as[(String, Seq[String])].collect().toMap
    for (w <- words) {
      val all = bruteSegs(w)
      assert(all.nonEmpty, s"$w unsegmentable under test vocab")
      val bestCost = all.map(cost).min
      assert(got(w).mkString == w, s"$w: pieces ${got(w)} don't concatenate back")
      assert(cost(got(w)) == bestCost,
        s"$w: DP cost ${cost(got(w))} vs brute-force optimum $bestCost (${got(w)})")
    }
  }

  test("persisted vocabulary round-trips and tokenizes identically") {
    val docs = Seq((1L, "ababab ab"), (2L, "ababab cd")).toDF("id", "text")
    val path = "/root/repo/target/tmp/unigram_vocab_spec"
    Unigram.saveVocab(docs, path)
    val loaded = Unigram.loadVocab(spark, path)
    val direct = Unigram.trainVocabRows(docs)
      .map { case (p, _, c) => p -> c }.toMap
    assert(loaded == direct)
    assert(Unigram.tokenizeCounts(docs).collect().toSeq ==
      Unigram.tokenizeCounts(docs, vocab = Some(loaded)).collect().toSeq)
  }

  test("training is partition-invariant") {
    val docs = Queries.docs(spark, sf()).limit(200)
    val a = Unigram.train(docs).collect().map(_.toString).toSeq
    val b = Unigram.train(docs.repartition(7)).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
