package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Distributed unigram-LM tokenizer training (Kudo '18, "Subword
  * Regularization" §3 — the SentencePiece unigram model; public method) —
  * the second tokenizer-training surface next to [[Bpe]]: a piece
  * VOCABULARY with probabilities, learned by EM, instead of a merge list.
  *
  * Deterministic formulation (the house oracle rules):
  *  - Seed vocabulary: every character, plus the top [[MaxSeed]]
  *    substrings of length 2..[[MaxPieceLen]] with occurrence count ≥
  *    [[MinSeedCount]] (count desc, piece asc). Seed probabilities are
  *    relative occurrence counts.
  *  - E-step: VITERBI (hard-EM) segmentation of each distinct word under
  *    the current piece costs — the standard hard variant of Kudo's EM;
  *    the full-marginalization E-step differs only in using expected
  *    rather than best-path counts. Costs are INTEGER MICRO-NATS
  *    (round(-ln p · 1e6)), so path costs are order-free BIGINT sums and
  *    the DP argmin is bit-reproducible in SQL; ties break by shorter
  *    piece (cost, then piece length).
  *  - M-step: piece count = Σ word-freq · occurrences in best path;
  *    pieces with zero count leave the vocabulary (their probability is
  *    0); [[EmRounds]] fixed rounds, matching the oracle's unroll.
  *  - Final vocabulary: the top [[TopMulti]] multi-char pieces by
  *    (count desc, piece asc) — the vocab-size prune — plus EVERY seed
  *    character (count floored at 1, Kudo's character-coverage rule), so
  *    any word stays segmentable.
  *
  * Scale shape: ONE corpus-width shuffle total (the word-count groupBy —
  * the same discipline as [[Bpe.trainMerges]]); every E-step is a
  * MAP-ONLY whole-stage-codegen fold over the distinct-word table (the
  * vocabulary rides a literal map, bounded by [[MaxSeed]] + charset), and
  * each M-step is one map-side-combined aggregation over ≤ |word| pieces
  * per word. Per round: one bounded collect of the ≤ MaxSeed-row counts.
  * Words longer than [[MaxWordLen]] chars are excluded from training and
  * tokenization (fixture corpora are whitespace-tokenized English; the
  * cap bounds the per-row DP and the oracle's unroll depth).
  */
object Unigram {

  val MaxPieceLen = 4
  val MaxWordLen = 12
  val EmRounds = 2
  val MinSeedCount = 2L
  val MaxSeed = 512
  /** Multi-char vocabulary budget after the final prune. */
  val TopMulti = 48
  val Micro = 1e6
  private val Inf = 1L << 50

  /** (w, freq) — distinct trainable words (1..MaxWordLen chars). */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")).between(1, MaxWordLen))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Weighted occurrence counts of every substring of length
    * 1..MaxPieceLen: (piece, cnt). */
  private def substringCounts(words: DataFrame): DataFrame = {
    val subs = flatten(transform(sequence(lit(1), length(col("w"))), i =>
      transform(sequence(lit(1), least(lit(MaxPieceLen), length(col("w")) - i + 1)),
        l => col("w").substr(i, l))))
    words.select(col("freq"), explode(subs).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
  }

  /** The seed vocabulary counts: all chars + the capped multi-char set. */
  def seedCounts(words: DataFrame): DataFrame = {
    val all = substringCounts(words).localCheckpoint(true)
    val chars = all.filter(length(col("piece")) === 1)
    val multi = all.filter(length(col("piece")) > 1 && col("cnt") >= MinSeedCount)
      .orderBy(desc("cnt"), asc("piece")).limit(MaxSeed)
    chars.unionAll(multi)
  }

  /** counts → integer micro-nat costs: round(ln(total/cnt)·1e6). */
  private def costsOf(counts: Seq[(String, Long)]): Map[String, Long] = {
    val total = counts.map(_._2).sum.toDouble
    counts.map { case (p, c) =>
      p -> BigDecimal(math.log(total / c) * Micro)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.toMap
  }

  /** Viterbi best-segmentation column over `wordCol` for a literal piece
    * cost map: array<string> of pieces. The forward pass folds positions
    * 1..len carrying the (cost, backpointer-length) frontier; the backward
    * pass folds the backpointers into the piece list. Both are pure
    * codegen HOFs — the E-step never shuffles. */
  def segmentCol(word: Column, vocab: Map[String, Long]): Column = {
    val ps = vocab.keys.toSeq.sorted
    val costLit = map_from_arrays(typedLit(ps), typedLit(ps.map(vocab)))
    val ln = length(word)
    val best = aggregate(
      sequence(lit(1), ln),
      array(struct(lit(0L).as("c"), lit(0).as("l"))),
      (acc, i) => {
        val cands = (1 to MaxPieceLen).map { l =>
          val prev = element_at(acc, greatest(i - l + 1, lit(1)))
          val piece = word.substr(i - lit(l) + 1, lit(l))
          val c = when(lit(l) <= i,
            coalesce(element_at(costLit, piece) + prev.getField("c"), lit(Inf)))
            .otherwise(lit(Inf))
          struct(c.as("c"), lit(l).as("l"))
        }
        concat(acc, array(array_min(array(cands: _*))))
      })
    val bt = aggregate(
      sequence(lit(1), ln),
      struct(ln.as("pos"), array().cast("array<string>").as("ps")),
      (st, _) => {
        val pos = st.getField("pos")
        val bp = element_at(best, greatest(pos, lit(0)) + 1).getField("l")
        when(pos > 0,
          struct((pos - bp).as("pos"),
            concat(array(word.substr(pos - bp + 1, bp)), st.getField("ps")).as("ps")))
          .otherwise(st)
      })
    bt.getField("ps")
  }

  /** One M-step: (piece, cnt) over the best segmentations. */
  def pieceCounts(words: DataFrame, vocab: Map[String, Long]): DataFrame =
    words.select(col("freq"), explode(segmentCol(col("w"), vocab)).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))

  /** The trained vocabulary, driver-side: (piece, cnt, cost_micro) sorted
    * by (cnt desc, piece asc). */
  def trainVocabRows(docs: DataFrame, textCol: String = "text"): Seq[(String, Long, Long)] = {
    val words = wordCounts(docs, textCol).localCheckpoint(true)
    val seed = seedCounts(words)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val seedChars = seed.collect { case (p, _) if p.length == 1 => p }
    var vocab = costsOf(seed)
    var counts = Seq.empty[(String, Long)]
    for (_ <- 1 to EmRounds) {
      counts = pieceCounts(words, vocab)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      vocab = costsOf(counts)
    }
    val byPiece = counts.toMap
    val multi = counts.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }.take(TopMulti)
    // character coverage: every seed char survives with count ≥ 1
    val chars = seedChars.map(c => c -> math.max(byPiece.getOrElse(c, 0L), 1L))
    val fin = (chars ++ multi).sortBy { case (p, c) => (-c, p) }
    val costs = costsOf(fin)
    fin.map { case (p, c) => (p, c, costs(p)) }
  }

  /** `tk_unigram_vocab`: (rank, piece, cnt, nll_micro). */
  def train(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainVocabRows(docs, textCol).zipWithIndex
      .map { case ((p, c, nll), i) => (i + 1, p, c, nll) }
      .toDF("rank", "piece", "cnt", "nll_micro")
  }

  /** Persist a trained vocabulary: (piece, cnt, cost_micro) parquet — the
    * artifact a tokenizer SHIPS (SentencePiece's .model file); at 100 TB
    * the vocabulary is trained once and loaded by every consumer job, so
    * the train → save → load → tokenize path is the deployment shape.
    * [[loadVocab]] restores the exact cost map ([[UnigramSpec]] pins
    * store ≡ in-memory tokenization bit-for-bit). */
  def saveVocab(docs: DataFrame, path: String, textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.sources.Store.save(
      trainVocabRows(docs, textCol).toDF("piece", "cnt", "cost_micro"), path)
  }

  def loadVocab(spark: org.apache.spark.sql.SparkSession, path: String): Map[String, Long] =
    graft.sources.Store.load(spark, path)
      .select("piece", "cost_micro")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** `tk_unigram_tokenize`: per-document (id, n_words, n_pieces) under the
    * trained vocabulary — pieces computed once per DISTINCT word and
    * joined back to the occurrence stream (the [[Bpe]] tokenize shape).
    * Words over MaxWordLen chars are outside the tokenizer's domain and
    * excluded from both counts. */
  def tokenizeCounts(docs: DataFrame, textCol: String = "text",
                     idCol: String = "id",
                     vocab: Option[Map[String, Long]] = None): DataFrame = {
    val finalVocab = vocab.getOrElse(trainVocabRows(docs, textCol)
      .map { case (p, _, cost) => p -> cost }.toMap)
    val occ = docs
      .select(col(idCol).as("id"), explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")).between(1, MaxWordLen))
      .localCheckpoint(true)
    val wsize = occ.select("w").distinct()
      .select(col("w"), size(segmentCol(col("w"), finalVocab)).as("_np"))
    occ.join(wsize, "w")
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"), sum("_np").as("n_pieces"))
      .orderBy("id")
  }
}
