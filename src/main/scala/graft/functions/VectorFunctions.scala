package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math used by retrieval/dedup/ANN operators.
  *
  * All of these are built from Spark's codegen'd higher-order functions
  * (`zip_with`/`aggregate`/`transform`) rather than Scala UDFs, so they stay
  * inside whole-stage codegen and work on `ArrayType(FloatType)` columns at
  * any scale.
  *
  * Numerical contract: multiplication/accumulation happens in Double,
  * left-to-right over the array, which is exactly what the DuckDB oracle
  * expression `list_sum(list_transform(range(1, d+1), i -> CAST(a[i] AS
  * DOUBLE) * CAST(b[i] AS DOUBLE)))` computes — results agree to the last
  * ulp modulo non-associativity noise, which `roundScore` absorbs.
  *
  * Reference semantics: cosine over L2-normalized float32 vectors
  * (reference qdrant_store.py:90-96, onnx_embedder.py:142-146).
  */
object VectorFunctions {

  /** Dot product of two numeric-array columns as Double (left-to-right
    * fold). Backed by the codegen'd [[graft.expressions.DotProductD]] —
    * the `aggregate(zip_with(...))` formulation is CodegenFallback and
    * dominates the quadratic similarity joins; widening casts keep the
    * math double*double exactly as before (and as the DuckDB oracle). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.DotProductD(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a.cast("array<double>")),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b.cast("array<double>"))))

  /** The HOF formulation kept for cross-checking the native expression. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. For pre-normalized vectors prefer [[dot]] (cheaper). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** L2-normalize a float-array column (returns float array). */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    transform(a, x => (x.cast("double") / n).cast("float"))
  }

  /** Round a score column for stable cross-engine comparison; the reference
    * rounds fused scores to 6 decimals too (memory_engine.py:1706). */
  def roundScore(c: Column, digits: Int = 6): Column = round(c, digits)
}
