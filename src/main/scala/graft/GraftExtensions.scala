package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions._

/** SQL surface for the engine's native kernels: every custom Catalyst
  * `Expression` registered as a SQL function, so pure-SQL clients
  * (`spark-sql`, the Thrift server, `spark.sql(...)` callers) reach the
  * same codegen kernels the DataFrame API uses. Two entry points:
  *
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the standard library-installation hook), or
  *  - [[org.apache.spark.sql.graftbridge.FunctionBridge.register]] on a
  *    live session (notebooks, tests).
  *
  * Kernel parameters (shingle width, dim, window) arrive as literal SQL
  * arguments; non-literal parameters are rejected at registration-call
  * time, matching how Spark's own parameterized functions behave.
  * ExtensionsSpec pins every function's SQL result to its Column form. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn: parameter must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** (name, info, builder) for every registered kernel. Names carry the
    * `graft_` prefix so they can never shadow a Spark built-in. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_poly_hash",
      info("graft_poly_hash", "_FUNC_(str) - polynomial rolling hash of a string"),
      (es: Seq[Expression]) => PolyHash(es.head)),
    ("graft_shingle_hashes",
      info("graft_shingle_hashes", "_FUNC_(str, n) - hashes of all n-token shingles"),
      (es: Seq[Expression]) => ShingleHashes(es.head, intArg(es(1), "graft_shingle_hashes"))),
    ("graft_minhash_sig",
      info("graft_minhash_sig", "_FUNC_(shingles, k) - k-hash MinHash signature"),
      (es: Seq[Expression]) => MinHashSig(es.head, intArg(es(1), "graft_minhash_sig"))),
    ("graft_term_freqs",
      info("graft_term_freqs", "_FUNC_(str) - (term, tf) pairs of the tokenized string"),
      (es: Seq[Expression]) => TermFreqs(es.head)),
    ("graft_simhash",
      info("graft_simhash", "_FUNC_(str, bits) - SimHash fingerprint"),
      (es: Seq[Expression]) => SimHashFp(es.head, intArg(es(1), "graft_simhash"))),
    ("graft_winnow_select",
      info("graft_winnow_select", "_FUNC_(hashes, w) - winnowing-selected hashes"),
      (es: Seq[Expression]) => WinnowSelect(es.head, intArg(es(1), "graft_winnow_select"))),
    ("graft_winnow_positions",
      info("graft_winnow_positions", "_FUNC_(hashes, w) - winnowing-selected positions"),
      (es: Seq[Expression]) => WinnowPositions(es.head, intArg(es(1), "graft_winnow_positions"))),
    ("graft_hash_embed",
      info("graft_hash_embed", "_FUNC_(str, dim) - signed hashing-projection embedding"),
      (es: Seq[Expression]) => HashEmbed(es.head, intArg(es(1), "graft_hash_embed"))),
    ("graft_dot",
      info("graft_dot", "_FUNC_(a, b) - float-array dot product in double"),
      // same widening cast the Column wrapper (VectorFunctions.dot) applies
      (es: Seq[Expression]) => DotProductD(
        org.apache.spark.sql.catalyst.expressions.Cast(es.head,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.catalyst.expressions.Cast(es(1),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))),
    ("graft_jaccard",
      info("graft_jaccard", "_FUNC_(a, b) - Jaccard similarity of two hash arrays"),
      (es: Seq[Expression]) => JaccardSim(es.head, es(1))),
    ("graft_sq8_encode",
      info("graft_sq8_encode", "_FUNC_(vec, scale) - int8 quantization codes"),
      // widen like the Column wrapper: SQL numeric literals land as DECIMAL
      (es: Seq[Expression]) => Sq8Encode(
        org.apache.spark.sql.catalyst.expressions.Cast(es.head,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.catalyst.expressions.Cast(es(1),
          org.apache.spark.sql.types.DoubleType))),
    ("graft_sq8_dot",
      info("graft_sq8_dot", "_FUNC_(codes_a, codes_b) - exact integer dot of int8 codes"),
      (es: Seq[Expression]) => Sq8Dot(es.head, es(1)))
  )
}
