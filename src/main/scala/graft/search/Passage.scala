package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.embed.HashingEmbedder
import graft.functions.VectorFunctions

/** Passage-level retrieval with MaxP document aggregation (Dai & Callan,
  * SIGIR '19 "Deeper Text Understanding for IR", public): long documents
  * are scored by their BEST passage — split each document into passages,
  * embed and score every passage against the query, and lift
  * max-over-passages to the document. One strongly relevant paragraph in
  * an otherwise-diffuse document should rank the document; a single
  * pooled document vector averages that evidence away.
  *
  * Scale shape: passages explode one row per passage (bounded by document
  * length), the passage embedding is the codegen'd
  * [[graft.expressions.HashEmbed]] kernel per row (no shuffle, no UDF),
  * the MaxP fold is ONE groupBy(doc) with a struct-max (map-side partial
  * aggregation — never a window over the full corpus), and the final
  * top-k is TakeOrderedAndProject. Nothing here materializes more than
  * one aggregate row per document past the scan.
  *
  * Determinism contract: passage scores are integer micro-units
  * (round(dot·1e6) as BIGINT); the per-document argmax breaks ties on the
  * EARLIEST passage (max of (score, −pos)); document ties break by id.
  */
object Passage {

  /** Explode pages into trimmed non-empty line passages: (id, pos, para).
    * `pos` indexes the kept passages in document order. */
  def passages(pages: DataFrame): DataFrame =
    pages.select(col("id"),
      posexplode(filter(transform(split(col("text"), "\n"), p => trim(p)),
        p => length(p) > 0)).as(Seq("pos", "para")))

  /** Top-`k` documents by best-passage score:
    * (id, n_passages, best_pos, score). */
  def maxP(pages: DataFrame, queryVec: Seq[Float], k: Int = 10,
           dim: Int = 64): DataFrame = {
    val pe = HashingEmbedder(dim).embeddingColumn(col("para"))
    val scored = passages(pages).withColumn("sm",
      round(VectorFunctions.dot(pe, typedLit(queryVec)) * lit(1e6), 0).cast("long"))
    scored
      .groupBy("id")
      .agg(max(struct(col("sm"), (-col("pos")).as("np"))).as("b"),
        count(lit(1)).as("n_passages"))
      .select(col("id"), col("n_passages"),
        (-col("b.np")).cast("int").as("best_pos"),
        round(col("b.sm") / lit(1e6), 6).as("score"), col("b.sm").as("_sm"))
      .orderBy(desc("_sm"), asc("id")).limit(k)
      .drop("_sm")
  }
}
