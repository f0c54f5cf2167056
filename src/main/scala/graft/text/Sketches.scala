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
