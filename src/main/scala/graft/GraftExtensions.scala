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

  /** Literal positive-int kernel parameter. Builders run at analysis time,
    * so a `require` here reaches SQL users as a planning error instead of
    * an executor-side NPE or a garbage-emitting kernel (w = 0 would walk
    * the winnowing deque past its tail). */
  private def intArg(e: Expression, fn: String, min: Int = 1): Int = {
    require(e.foldable, s"$fn: parameter must be a literal")
    val v = e.eval()
    require(v != null, s"$fn: parameter must not be NULL")
    // explicit integral-type match: a DECIMAL literal (2.5) or DOUBLE
    // literal (2.9) must surface as the same clean planning error as a bad
    // range — not a ClassCastException or a silent truncation to 2
    val l: Long = v match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long    => l.longValue()
      case s: java.lang.Short   => s.longValue()
      case b: java.lang.Byte    => b.longValue()
      case d: org.apache.spark.sql.types.Decimal =>
        require(d.toBigDecimal.isWhole,
          s"$fn: parameter must be an integer literal, got $d")
        d.toLong
      // uniform widening contract: whole-valued DOUBLE/FLOAT literals are
      // accepted exactly like whole-valued DECIMALs; fractional ones get
      // the same clean planning error
      case d: java.lang.Double =>
        require(d.doubleValue() == math.floor(d.doubleValue()) && !d.isInfinite,
          s"$fn: parameter must be an integer literal, got $d")
        d.longValue()
      case f: java.lang.Float =>
        require(f.floatValue() == math.floor(f.floatValue()) && !f.isInfinite,
          s"$fn: parameter must be an integer literal, got $f")
        f.longValue()
      case other =>
        throw new IllegalArgumentException(
          s"requirement failed: $fn: parameter must be an integer literal, " +
            s"got ${other.getClass.getSimpleName} $other")
    }
    require(l >= min && l <= Int.MaxValue,
      s"$fn: parameter must be >= $min, got $l")
    l.toInt
  }

  private def arity(es: Seq[Expression], n: Int, fn: String): Seq[Expression] = {
    require(es.length == n, s"$fn expects $n argument(s), got ${es.length}")
    es
  }

  private def fn1(name: String, usage: String)(f: Expression => Expression)
      : (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name, info(name, usage), es => f(arity(es, 1, name).head))

  private def fn2(name: String, usage: String)(f: (Expression, Expression) => Expression)
      : (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name, info(name, usage), es => { arity(es, 2, name); f(es.head, es(1)) })

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def castArrD(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
  private def castD(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e,
      org.apache.spark.sql.types.DoubleType)

  /** (name, info, builder) for every registered kernel. Names carry the
    * `graft_` prefix so they can never shadow a Spark built-in. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn1("graft_poly_hash", "_FUNC_(str) - polynomial rolling hash of a string")(
      PolyHash(_)),
    fn2("graft_shingle_hashes", "_FUNC_(str, n) - hashes of all n-token shingles")(
      (s, n) => ShingleHashes(s, intArg(n, "graft_shingle_hashes"))),
    fn2("graft_shingles", "_FUNC_(str, n) - space-joined n-token shingle strings")(
      (s, n) => Shingles(s, intArg(n, "graft_shingles"))),
    fn2("graft_minhash_sig", "_FUNC_(shingles, k) - k-hash MinHash signature")(
      (s, k) => MinHashSig(s, intArg(k, "graft_minhash_sig"))),
    fn1("graft_term_freqs", "_FUNC_(str) - (term, tf) pairs of the tokenized string")(
      TermFreqs(_)),
    fn2("graft_simhash", "_FUNC_(str, bits) - SimHash fingerprint")(
      (s, b) => SimHashFp(s, intArg(b, "graft_simhash"))),
    fn2("graft_winnow_select", "_FUNC_(hashes, w) - winnowing-selected hashes")(
      (h, w) => WinnowSelect(h, intArg(w, "graft_winnow_select"))),
    fn2("graft_winnow_positions", "_FUNC_(hashes, w) - winnowing-selected positions")(
      (h, w) => WinnowPositions(h, intArg(w, "graft_winnow_positions"))),
    fn2("graft_hash_embed", "_FUNC_(str, dim) - signed hashing-projection embedding")(
      (s, d) => HashEmbed(s, intArg(d, "graft_hash_embed"))),
    // the widening casts mirror the Column wrappers (VectorFunctions.dot,
    // Quantize.sq8Encode): SQL numeric literals arrive as DECIMAL
    fn2("graft_dot", "_FUNC_(a, b) - float-array dot product in double")(
      (a, b) => DotProductD(castArrD(a), castArrD(b))),
    fn2("graft_jaccard", "_FUNC_(a, b) - Jaccard similarity of two hash arrays")(
      JaccardSim(_, _)),
    fn2("graft_sq8_encode", "_FUNC_(vec, scale) - int8 quantization codes")(
      (v, s) => Sq8Encode(castArrD(v), castD(s))),
    fn2("graft_sq8_dot", "_FUNC_(codes_a, codes_b) - exact integer dot of int8 codes")(
      Sq8Dot(_, _))
  )
}
