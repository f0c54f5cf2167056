package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-kernel column functions: tokenization, shingles, and a polynomial
  * rolling hash that is reproducible in ANSI-ish SQL (the DuckDB oracle).
  *
  * Tokenization mirrors the reference's BM25 corpus prep —
  * `text.lower().split()` (memory_engine.py:230, 1767): lowercase, split on
  * whitespace runs, drop empties.
  *
  * We deliberately avoid Spark's Murmur3 `hash()` in any operator that needs
  * a DuckDB oracle: `polyHash` is the cross-engine-stable hash used for
  * MinHash/SimHash/fingerprinting. It stays within Long range: acc <
  * 1e9+7, acc*31 + 0x10FFFF << 2^63.
  */
object TextFunctions {

  /** Modulus for the polynomial rolling hash (large prime). */
  val HashMod: Long = 1000000007L
  /** Multiplier for the polynomial rolling hash. */
  val HashMul: Long = 31L

  /** Lowercased whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Polynomial rolling hash of a string column:
    * fold(chars, 0, (acc, c) => (acc*31 + codepoint(c)) % (1e9+7)).
    * DuckDB-equivalent: list_reduce(list_prepend(0, list_transform(
    *   string_split(s, ''), c -> ascii(c))), (acc, x) -> (acc*31+x) % 1000000007).
    * Backed by the codegen'd [[graft.expressions.PolyHash]] kernel (the
    * split/aggregate formulation is interpreted per character).
    */
  def polyHash(s: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.PolyHash(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(s)))

  /** Word n-gram shingles: array of space-joined n-token windows.
    * Returns an empty array when the document has fewer than n tokens.
    * Native one-pass kernel ([[graft.expressions.Shingles]]) — the HOF
    * formulation ([[shinglesHof]]) is CodegenFallback (every element
    * interpreted) and allocates a slice per window. */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.Shingles(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), n))

  /** The declarative HOF formulation of [[shingles]] — the oracle-shaped
    * reference the codegen kernel is pinned to (KernelEquivalenceSpec). */
  def shinglesHof(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val count = size(toks) - (n - 1)
    when(count > 0,
      transform(sequence(lit(1), count),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Hashes of word n-gram shingles (distinct not applied here). Native
    * one-pass kernel: tokenize + window + rolling hash without the
    * intermediate shingle strings ([[graft.expressions.ShingleHashes]]). */
  def shingleHashes(text: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.ShingleHashes(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), n))

  /** MinHash signature of a shingle-hash array column. Native one-pass
    * kernel ([[graft.expressions.MinHashSig]]) — the nested-HOF formulation
    * (transform(sequence…, array_min(transform…))) is CodegenFallback and
    * allocates a full permuted array per hash function. */
  def minHashSig(sh: Column, numHashes: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.MinHashSig(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(sh), numHashes))

  /** Jaccard similarity of two distinct-element long-array columns. Native
    * sort-merge kernel ([[graft.expressions.JaccardSim]]) replacing
    * size(array_intersect)/size(array_union). */
  def jaccardSim(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.JaccardSim(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))
}
