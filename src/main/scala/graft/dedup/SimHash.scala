package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** SimHash (Charikar '02) near-duplicate fingerprinting over unigram tokens,
  * tf-weighted, 30 bits (polyHash's range fits in 30 bits). Candidate pairs
  * at scale come from the pigeonhole chunk join: hamming(a,b) ≤ maxHamming
  * with `chunks` > maxHamming chunks ⇒ at least one chunk is identical, so an
  * equi-join per chunk finds every qualifying pair without a cross join.
  */
object SimHash {

  val Bits = 30
  val Chunks = 4 // pigeonhole: hamming ≤ 3 ⇒ ≥1 of 4 chunks equal

  /** SimHash fingerprint as a plain column expression (token-less text
    * fingerprints to 0 — callers that must mirror the exploded/oracle
    * formulation filter those rows like [[fingerprints]] does). */
  def fingerprint(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.SimHashFp(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), Bits))

  /** Explode a fingerprint column into pigeonhole band rows: adds
    * (_chunk_i, _chunk_v). Rows within hamming ≤ chunks-1 of each other
    * share at least one (_chunk_i, _chunk_v) pair. */
  def withChunks(df: DataFrame, fpCol: String, chunks: Int = Chunks): DataFrame = {
    val rows = (Bits + chunks - 1) / chunks
    df.withColumn("_chunk_i", explode(sequence(lit(0), lit(chunks - 1))))
      .withColumn("_chunk_v",
        pmod(expr(s"shiftright($fpCol, _chunk_i * $rows)"), lit(1L << rows)))
  }

  /** Hamming distance between two fingerprint columns. */
  def hamming(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    bit_count(a.bitwiseXOR(b))

  /** (id, simhash) — tf-weighted sign aggregation per bit, one codegen pass
    * per document ([[graft.expressions.SimHashFp]]); docs with no tokens are
    * absent, matching the exploded formulation (and the DuckDB oracle). */
  def fingerprints(df: DataFrame, textCol: String = "text"): DataFrame =
    df.filter(size(TextFunctions.tokens(col(textCol))) > 0)
      .select(col("id"), fingerprint(col(textCol)).as("simhash"))

  /** The declarative explode/groupBy formulation of [[fingerprints]] — the
    * oracle-shaped reference the codegen kernel is pinned to
    * (KernelEquivalenceSpec). */
  def fingerprintsDeclarative(df: DataFrame, textCol: String = "text"): DataFrame = {
    val tf = df
      .select(col("id"), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .withColumn("h", TextFunctions.polyHash(col("term")))
    // per (id, bit): sum of +tf where bit set, -tf where clear; bit -> sign
    val bits = tf.select(col("id"), col("tf"), col("h"),
        explode(sequence(lit(0), lit(Bits - 1))).as("bit"))
      .withColumn("w", when(expr("shiftright(h, bit)") % 2 === 1,
        col("tf")).otherwise(-col("tf")))
      .groupBy("id", "bit").agg(sum("w").as("v"))
    bits.groupBy("id").agg(
      sum(when(col("v") > 0, expr("shiftleft(CAST(1 AS BIGINT), bit)"))
        .otherwise(0L)).as("simhash"))
  }

  /** Candidate pairs with hamming(simhash) ≤ maxHamming via the chunk
    * pigeonhole equi-join, then exact hamming verify. Output
    * (id_a, id_b, hamming). */
  def nearDuplicates(df: DataFrame, maxHamming: Int = 3,
                     textCol: String = "text"): DataFrame = {
    require(maxHamming < Chunks, "pigeonhole needs chunks > maxHamming")
    val fp = fingerprints(df, textCol)
    val rows = (Bits + Chunks - 1) / Chunks // bits per chunk
    val chunked = fp.select(col("id"), col("simhash"),
        explode(sequence(lit(0), lit(Chunks - 1))).as("chunk"))
      .withColumn("ckey", pmod(expr(s"shiftright(simhash, chunk * $rows)"), lit(1L << rows)))
    val cands = chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("ha"), col("b.simhash").as("hb"))
      .distinct()
    cands
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
