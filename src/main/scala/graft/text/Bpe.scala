package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions

/** Distributed BPE tokenizer-merge training (Sennrich et al. '16, public
  * method): learn the top-K byte-pair merges of the corpus vocabulary —
  * the data-side half of tokenizer training (the trained merge table is
  * what a tokenizer ships; applying it is a per-row map).
  *
  * Algorithm, exactly the reference formulation: word frequencies once,
  * each word split to character symbols; per round, count adjacent symbol
  * pairs weighted by word frequency, take the globally most frequent pair
  * (ties by pair lexicographically), fuse that pair in every word, repeat.
  *
  * Spark shape: ONE corpus-width shuffle total (the word-count groupBy —
  * the vocabulary table is orders of magnitude smaller than the corpus and
  * is what every round works on). Each round is a map-side-combined pair
  * aggregation plus a 1-row argmax fetch (the PPR loop's single-row-
  * aggregate pattern) and a map-only merge application. K driver
  * round-trips of one row each; the vocabulary never leaves the cluster.
  *
  * Determinism contract: pair counts are exact integer sums; the argmax
  * orders by (count DESC, left, right); merge application is greedy
  * left-to-right (leftmost overlapping occurrence wins), implemented as a
  * literal string replace over a SEP-delimited symbol encoding — the same
  * non-overlapping left-to-right semantics DuckDB's replace() has, so the
  * unrolled oracle reproduces every round bit-for-bit.
  *
  * Symbol encoding: each symbol is wrapped as SEP+sym+SEP and wrapped
  * symbols concatenated, so a pair pattern SEP+a+SEP+SEP+b+SEP can never
  * match across a symbol boundary and back-to-back occurrences of a pair
  * both merge ("abab" -> "(ab)(ab)"). SEP is U+0001; `\s+` does NOT match
  * it, so a pathological token could carry one — delimit() strips it
  * before encoding (mirrored by replace(w, chr(1), '') in the oracle's
  * w0), which makes the SEP-run invariant unconditional.
  */
object Bpe {

  val Sep = "\u0001"

  /** Wrapped-symbol encoding of a word: SEP+c+SEP per character. */
  private def delimit(word: Column): Column =
    concat(lit(Sep),
      array_join(filter(split(regexp_replace(word, Sep, ""), ""),
        c => length(c) > 0), Sep + Sep),
      lit(Sep))

  /** Symbols back out of the encoding. */
  private def syms(s: Column): Column =
    filter(split(trim(s, Sep), Sep + Sep), x => length(x) > 0)

  /** Learn `k` merges; returns (merge_rank, left_sym, right_sym,
    * pair_count) with merge_rank 1-based in learn order. Stops early if
    * the vocabulary runs out of adjacent pairs. */
  def trainMerges(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    var words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(delimit(col("w")).as("s"), col("freq"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var rank = 1
    var dry = false
    while (rank <= k && !dry) {
      val sy = syms(col("s"))
      // guard single-symbol words: sequence(1, 0) steps DESCENDING in
      // Spark, so an unguarded transform indexes out of bounds
      val best = words
        .select(col("freq"), sy.as("_sy"))
        .filter(size(col("_sy")) >= 2)
        .select(col("freq"), explode(
          transform(sequence(lit(1), size(col("_sy")) - 1), i =>
            struct(element_at(col("_sy"), i).as("a"),
              element_at(col("_sy"), i + 1).as("b"))))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1).collect().headOption
      best match {
        case None => dry = true
        case Some(r) =>
          val (a, b, cnt) = (r.getString(0), r.getString(1), r.getLong(2))
          merges += Row(rank, a, b, cnt)
          words = words
            .select(call_function("replace", col("s"),
              lit(Sep + a + Sep + Sep + b + Sep), lit(Sep + a + b + Sep)).as("s"),
              col("freq"))
            .localCheckpoint(true)
          rank += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1),
      StructType(Seq(
        StructField("merge_rank", IntegerType, nullable = false),
        StructField("left_sym", StringType, nullable = false),
        StructField("right_sym", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** Apply a learned merge table to arbitrary words: the tokenize step.
    * Merges MUST apply in rank order (each later merge can consume the
    * output symbols of earlier ones). Map-only; the merge table is a
    * driver-side list (tokenizers ship merge tables of ~30k rows). */
  def applyMerges(words: DataFrame, merges: Seq[(String, String)],
                  wordCol: String = "w"): DataFrame = {
    val encoded = merges.foldLeft(delimit(col(wordCol))) { case (s, (a, b)) =>
      call_function("replace", s,
        lit(Sep + a + Sep + Sep + b + Sep), lit(Sep + a + b + Sep))
    }
    words.withColumn("tokens", syms(encoded))
  }
}
