package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Count-Min Sketch over corpus terms (Cormode & Muthukrishnan '05, public)
  * — the fixed-size frequency summary a 100 TB profiling pass ships instead
  * of a full term-frequency table.
  *
  * Deliberately NOT a custom aggregate: a CMS is a (depth × width) grid of
  * counters whose merge is cell-wise addition, and that is exactly what
  * `groupBy(d, cell).count` already does — Spark's map-side partial
  * aggregation builds one bounded grid per task and the shuffle moves at
  * most depth·width rows per partition, the same network profile a
  * hand-rolled TypedImperativeAggregate sketch would have with none of the
  * opacity (the grid stays a queryable DataFrame). Hash rows are pairwise
  * `(a_d·h + b_d) mod P mod width` over the engine's polynomial term hash,
  * all constants fixed — the sketch is bit-deterministic and
  * DuckDB-reproducible.
  *
  * The classic CMS guarantee holds: estimates never undercount, and
  * overshoot exceeds eps·N with probability at most (1/2)^depth for
  * width = 2/eps. */
object Sketches {

  val Depth = 4
  val Width = 256
  val P = 1000000007L
  /** Pairwise hash constants, one (a, b) per sketch row. */
  val A: Seq[Long] = Seq(31L, 131L, 1313L, 13131L)
  val B: Seq[Long] = Seq(7L, 77L, 777L, 7777L)

  /** The d-th row's cell index for a term hash. */
  def cell(d: Int, h: Column): Column =
    pmod(pmod(lit(A(d)) * h + lit(B(d)), lit(P)), lit(Width.toLong))

  /** Build the sketch: (d, cell, cnt) — at most Depth·Width rows however
    * large the corpus. One explode + one map-side-combined groupBy. */
  def cmsTermCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val h = TextFunctions.polyHash(col("term"))
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .select(posexplode(array((0 until Depth).map(d => cell(d, h)): _*))
        .as(Seq("d", "cell")))
      .groupBy("d", "cell")
      .agg(count(lit(1)).as("cnt"))
  }

  /** HyperLogLog bucket count (2^6) and the bit width of the post-bucket
    * hash remainder: the scrambled hash < 1e9+7, so w = g div 64 < 2^24. */
  val HllBuckets = 64
  val HllBits = 24
  /** Standard HLL bias constant alpha_64 (Flajolet et al. '07 §4). */
  val HllAlpha = 0.709
  /** Scrambling constants for the quadratic mix applied over polyHash
    * before the bucket/remainder split: g = (h² + A·h + B) mod P. polyHash
    * alone is AFFINE in a key's trailing characters, so regular
    * vocabularies ("tok0".."tok2999") form arithmetic progressions and the
    * leading-zero statistic degenerates (observed: 10× underestimate; an
    * affine rescramble still left +54% — an AP times a constant is an AP).
    * The h² term makes the image quadratic in the progression index, which
    * scatters it properly. h < P ≈ 1e9 keeps h² inside Long/BIGINT. */
  val HllA = 1313131L
  val HllB = 777777L

  /** HyperLogLog registers over corpus terms: (bucket, r) with
    * r = max over the bucket's terms of the leading-zero rank of the
    * post-bucket hash remainder (Flajolet et al. '07, public). Like the
    * CMS, the sketch IS a groupBy: map-side partial max builds one ≤64-row
    * register set per task and the shuffle moves at most 64 rows per
    * partition; the union of two corpora sketches as the cell-wise max of
    * their registers (SketchSpec pins this). Buckets no term hashes into
    * are absent (rank 0). */
  def hllRegisters(docs: DataFrame, textCol: String = "text"): DataFrame =
    hllRegistersOfTerms(
      docs.select(explode(TextFunctions.tokens(col(textCol))).as("term")))

  /** Register build over an already-exploded `term` frame (shared with the
    * exact-truth count in [[hllDistinctTerms]] so the corpus is scanned
    * once). `keys` prepends grouping columns — the per-group form keeps the
    * same shuffle profile, ≤ 64 register rows per key. */
  private def hllRegistersOfTerms(terms: DataFrame,
                                  keys: Seq[String] = Nil): DataFrame = {
    val h = TextFunctions.polyHash(col("term"))
    val g = pmod(h * h + lit(HllA) * h + lit(HllB), lit(P))
    val front = keys.map(col)
    terms
      .select(front :+ pmod(g, lit(HllBuckets.toLong)).as("bucket")
        :+ (g / HllBuckets).cast("long").as("_w"): _*)
      .select(front :+ col("bucket")
        :+ when(col("_w") === 0, lit(HllBits + 1))
          .otherwise(lit(HllBits + 1) - length(bin(col("_w")))).as("r"): _*)
      .groupBy(front :+ col("bucket"): _*).agg(max("r").as("r"))
  }

  /** The raw-estimate / linear-counting switch over a frame carrying
    * `_s` (Σ 2^-r) and `n_buckets_used` — both branches mirrored in the
    * oracle SQL (see [[hllDistinctTerms]] for why it is bit-deterministic). */
  private def hllEstimate: Column = {
    val m = HllBuckets
    val est = (lit(HllAlpha) * m * m) /
      (col("_s") + (lit(m) - col("n_buckets_used")))
    val zeros = lit(m) - col("n_buckets_used")
    round(when(est <= 2.5 * m && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros)).otherwise(est), 6)
  }

  /** Distinct-term estimate from the registers, beside the exact count the
    * small-SF oracle verifies it against. Every 2^-r term and every partial
    * sum is an exactly-representable dyadic rational (64 terms, exponents
    * in [-25, 0] — well inside the 53-bit mantissa), so the indicator sum
    * is order-free and the estimate is bit-deterministic. Empty buckets
    * contribute 2^0 = 1 each; the small-range correction (E ≤ 2.5m with
    * empty buckets) switches to linear counting, both branches mirrored in
    * the oracle SQL. Output: (true_distinct, hll_est, n_buckets_used). */
  def hllDistinctTerms(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // one corpus scan feeds both the register build and the exact truth
    val terms = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .localCheckpoint(true)
    val regs = hllRegistersOfTerms(terms)
      .agg(count(lit(1)).as("n_buckets_used"),
        sum(pow(lit(2.0), -col("r"))).as("_s"))
    val truth = terms
      .agg(count_distinct(col("term")).as("true_distinct"))
    truth.crossJoin(broadcast(regs))
      .select(col("true_distinct"), hllEstimate.as("hll_est"),
        col("n_buckets_used"))
  }

  /** Per-group distinct-term sketch — the shape a 100 TB profiling pass
    * actually ships: one ≤ 64-register HLL per partition key (source,
    * shard, date...), exact truth alongside for the small-SF oracle. The
    * register build is a single (key, bucket) groupBy with map-side
    * partial max — ≤ 64·|keys| rows cross the wire per task — and the
    * per-key estimate rolls up from the registers alone, so the plan costs
    * the same two shuffles however many keys there are. Output one row per
    * key: (key, true_distinct, hll_est, n_buckets_used). */
  def hllDistinctByKey(docs: DataFrame, keyCol: String,
                       textCol: String = "text"): DataFrame = {
    val terms = docs
      .select(col(keyCol),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .localCheckpoint(true)
    val regs = hllRegistersOfTerms(terms, Seq(keyCol))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_buckets_used"),
        sum(pow(lit(2.0), -col("r"))).as("_s"))
    val truth = terms.groupBy(keyCol)
      .agg(count_distinct(col("term")).as("true_distinct"))
    truth.join(regs, keyCol)
      .select(col(keyCol), col("true_distinct"), hllEstimate.as("hll_est"),
        col("n_buckets_used"))
      .orderBy(keyCol)
  }

  /** Vocabulary overlap between a corpus slice and the rest by HLL
    * inclusion-exclusion: |A∩B| ≈ |A| + |B| − |A∪B|, with |A∪B| read off
    * the per-bucket MAX of the two register sets — the sketch-algebra
    * property (registers merge by cell-wise max) that lets a profiling
    * pass answer cross-slice overlap questions from per-slice sketches
    * ALONE, without re-scanning either slice (Flajolet '07 §5, public;
    * the standard HLL set-operation recipe). Exact truth alongside for
    * the small-SF oracle. The estimate error compounds across three
    * sketches — the documented trade of the inclusion-exclusion form.
    *
    * Output one row: (true_overlap, est_a, est_b, est_union,
    * overlap_est). */
  def hllOverlap(docs: DataFrame, slicePred: Column,
                 textCol: String = "text"): DataFrame = {
    val terms = docs
      .select(slicePred.as("_a"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .localCheckpoint(true) // feeds both register builds and the truth
    val sideRegs = hllRegistersOfTerms(terms, Seq("_a")).localCheckpoint(true)
    def est(regs: DataFrame, name: String) = regs
      .agg(count(lit(1)).as("n_buckets_used"),
        sum(pow(lit(2.0), -col("r"))).as("_s"))
      .select(hllEstimate.as(name))
    val ea = est(sideRegs.filter(col("_a")), "est_a")
    val eb = est(sideRegs.filter(!col("_a")), "est_b")
    val eu = est(sideRegs.groupBy("bucket").agg(max("r").as("r")), "est_union")
    val truth = terms.filter(col("_a")).select("term").distinct()
      .join(terms.filter(!col("_a")).select("term").distinct(), "term")
      .agg(count(lit(1)).as("true_overlap"))
    truth.crossJoin(broadcast(ea)).crossJoin(broadcast(eb))
      .crossJoin(broadcast(eu))
      .select(col("true_overlap"), col("est_a"), col("est_b"), col("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 6).as("overlap_est"))
  }

  /** Point estimates for a set of query terms against a built sketch:
    * est(term) = min over rows of the term's cell counter. The sketch side
    * is ≤ Depth·Width rows and broadcasts. Output (term, est). */
  def cmsEstimate(cms: DataFrame, terms: DataFrame,
                  termCol: String = "term"): DataFrame = {
    val h = TextFunctions.polyHash(col(termCol))
    terms
      .select(col(termCol).as("term"),
        posexplode(array((0 until Depth).map(d => cell(d, h)): _*))
          .as(Seq("d", "cell")))
      .join(broadcast(cms), Seq("d", "cell"))
      .groupBy("term")
      .agg(min("cnt").as("est"))
  }
}
