package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd text kernels. The column-expression formulations
  * (split→transform→aggregate chains) are CodegenFallback in Spark — every
  * row pays interpreted eval plus per-character UTF8String substring
  * allocations, which dominated the sf0.1 benchmarks for the
  * MinHash/SimHash/winnowing/embedding paths. Each kernel reproduces its
  * HOF formulation bit-for-bit (same char-codepoint fold, same token split,
  * same accumulation order), so the DuckDB oracles are unchanged.
  */
object TextKernels {

  val P: Long = 1000000007L
  val Mul: Long = 31L

  /** Rolling hash of a string: fold codepoints, (acc*31 + cp) % P.
    * Equivalent to aggregate(split(s,''), 0, (acc,c) => (acc*31+ascii(c))%P). */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * Mul + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** Lowercased whitespace tokens, empties dropped — TextFunctions.tokens. */
  def tokenize(s: UTF8String): Array[String] =
    s.toLowerCase.toString.split("\\s+").filter(_.nonEmpty)

  /** Hashes of word n-gram shingles (space-joined token windows); empty
    * array when fewer than n tokens. Matches TextFunctions.shingleHashes. */
  def shingleHashes(s: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(s)
    val count = toks.length - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      var acc = 0L
      var j = 0
      while (j < n) {
        if (j > 0) acc = (acc * Mul + ' '.toInt) % P
        val t = toks(i + j)
        var k = 0
        val len = t.length
        while (k < len) {
          val cp = t.codePointAt(k)
          acc = (acc * Mul + cp) % P
          k += Character.charCount(cp)
        }
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Space-joined n-token shingle STRINGS; empty array when fewer than n
    * tokens. One pass, no per-window slice allocation — matches the HOF
    * formulation transform(sequence(1, count), i -> concat_ws(' ',
    * slice(toks, i, n))) exactly (TextFunctions.shinglesHof), which is
    * CodegenFallback and ~10× slower per element. */
  def shingleStrings(s: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(s)
    val count = toks.length - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature over a shingle-hash array: sig[i] = min over x of
    * ((2i+1)·x + 7919·i + 13) mod P. Matches the HOF formulation
    * transform(sequence(0, k-1), i -> array_min(transform(sh, ...))) used by
    * [[graft.dedup.MinHashLsh.signature]] (and the DuckDB oracle) exactly;
    * x < P and 2i+1 ≤ 2k-1 keep x*(2i+1)+b well inside Long range.
    *
    * PRECONDITION: the shingle array must be non-empty. On an empty array
    * this kernel yields Long.MaxValue per hash, whereas the HOF form yields
    * nulls (array_min of empty) — the equivalence (and containsNull=false)
    * holds only because [[graft.dedup.MinHashLsh.shingleSets]] filters empty
    * shingle sets before signing. */
  def minHashSig(sh: ArrayData, numHashes: Int): ArrayData = {
    val m = sh.numElements()
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val a = 2L * i + 1
      val b = 7919L * i + 13
      var best = Long.MaxValue
      var j = 0
      while (j < m) {
        val h = (sh.getLong(j) * a + b) % P
        if (h < best) best = h
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Jaccard similarity of two distinct-element long arrays:
    * |a∩b| / |a∪b| via sort-merge (no per-pair hash sets). Matches
    * size(array_intersect)/size(array_union) on distinct inputs. */
  def jaccardSim(a: ArrayData, b: ArrayData): Double = {
    val n1 = a.numElements()
    val n2 = b.numElements()
    if (n1 == 0 && n2 == 0) return 0.0
    val x = new Array[Long](n1)
    val y = new Array[Long](n2)
    var i = 0
    while (i < n1) { x(i) = a.getLong(i); i += 1 }
    i = 0
    while (i < n2) { y(i) = b.getLong(i); i += 1 }
    java.util.Arrays.sort(x)
    java.util.Arrays.sort(y)
    var p = 0
    var q = 0
    var inter = 0
    while (p < n1 && q < n2) {
      if (x(p) == y(q)) { inter += 1; p += 1; q += 1 }
      else if (x(p) < y(q)) p += 1
      else q += 1
    }
    inter.toDouble / (n1 + n2 - inter)
  }

  /** polyHash fold over a JVM string (same codepoint fold as [[polyHash]]). */
  def polyHashStr(t: String): Long = {
    var acc = 0L
    var k = 0
    val len = t.length
    while (k < len) {
      val cp = t.codePointAt(k)
      acc = (acc * Mul + cp) % P
      k += Character.charCount(cp)
    }
    acc
  }

  /** SimHash fingerprint (Charikar '02): tf-weighted ±1 vote per bit of each
    * distinct token's polyHash, bit set where the vote sum is positive.
    * One pass per document — replaces the explode(tokens)×explode(bits)
    * groupBy pipeline (two shuffles, 30× row blowup) with a map-side scalar.
    * Matches that declarative formulation exactly: vote sums are integral
    * and commutative, so accumulation order cannot change the sign. */
  def simHash(s: UTF8String, bits: Int): Long = {
    val toks = tokenize(s)
    val tf = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < toks.length) {
      tf.merge(toks(i), 1L, (a, b) => a + b)
      i += 1
    }
    val acc = new Array[Long](bits)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = polyHashStr(e.getKey)
      val c = e.getValue
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) acc(b) += c else acc(b) -= c
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (acc(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  /** Per-document term frequencies in one pass: array of (term, tf) structs
    * in first-occurrence order. explode(termFreqs(text)) yields the same
    * (term, tf) multiset as explode(tokens) -> groupBy(doc, term).count —
    * WITHOUT the (doc, term) shuffle, which at corpus scale is a full
    * shuffle of the tokenized text. */
  def termFreqs(s: UTF8String): ArrayData = {
    val toks = tokenize(s)
    val counts = new java.util.LinkedHashMap[String, Long]()
    var i = 0
    while (i < toks.length) {
      counts.merge(toks(i), 1L, (a, b) => a + b)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing selection (Schleimer et al. '03): sliding window of `w` over
    * the shingle-hash array, keep each window's minimum, distinct in
    * first-occurrence order. Matches the HOF form
    * array_distinct(transform(sequence(1, n-w+1), i -> array_min(slice(h, i, w))))
    * including the short-input edges (whole-array min when 0 < n < w, empty
    * for empty input). O(n) via a monotonic index deque instead of the HOF's
    * O(n·w) slice allocations. */
  def winnowSelect(sh: ArrayData, w: Int): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val m = n - (w - 1)
    if (m <= 0) {
      var best = Long.MaxValue
      var i = 0
      while (i < n) { val v = sh.getLong(i); if (v < best) best = v; i += 1 }
      return new GenericArrayData(Array(best))
    }
    val deque = new Array[Int](n) // indices, values increasing head->tail
    var head = 0
    var tail = 0
    val out = new Array[Long](m)
    var cnt = 0
    val seen = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      val v = sh.getLong(i)
      while (tail > head && sh.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val mn = sh.getLong(deque(head))
        if (seen.add(mn)) { out(cnt) = mn; cnt += 1 }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }

  /** Positioned winnowing selection: 0-based position of each window's
    * RIGHTMOST minimum (Schleimer '03 §3 robust winnowing), distinct, in
    * increasing order; empty when no full window exists (n < w). Same
    * monotonic deque as [[winnowSelect]] — popping `>=` on insert means a
    * later equal value evicts the earlier one, so the deque head is exactly
    * the rightmost minimum; head indices are non-decreasing across windows,
    * so dedup is a single last-emitted compare. O(n) vs the HOF form's
    * O(n·w) per-window argmin scan. */
  def winnowPositions(sh: ArrayData, w: Int): ArrayData = {
    val n = sh.numElements()
    val m = n - (w - 1)
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0
    val out = new Array[Long](m)
    var cnt = 0
    var lastPos = -1
    var i = 0
    while (i < n) {
      val v = sh.getLong(i)
      while (tail > head && sh.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val p = deque(head)
        if (p != lastPos) { out(cnt) = p.toLong; cnt += 1; lastPos = p }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }

  /** Signed-feature-hashing embedding: bucket = hash % dim, sign from
    * (hash/dim) parity, L2-normalized floats. Matches
    * HashingEmbedder.embeddingColumn. */
  def hashEmbed(s: UTF8String, dim: Int): ArrayData = {
    val raw = new Array[Double](dim)
    val toks = tokenize(s)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var acc = 0L
      var k = 0
      while (k < t.length) {
        val cp = t.codePointAt(k)
        acc = (acc * Mul + cp) % P
        k += Character.charCount(cp)
      }
      val bucket = (acc % dim).toInt
      raw(bucket) += (if ((acc / dim) % 2 == 0) 1.0 else -1.0)
      i += 1
    }
    var ss = 0.0
    var d = 0
    while (d < dim) { ss += raw(d) * raw(d); d += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Float](dim)
    d = 0
    while (d < dim) {
      out(d) = if (norm > 0) (raw(d) / norm).toFloat else 0.0f
      d += 1
    }
    new GenericArrayData(out)
  }
}

case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.polyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Shingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingleStrings(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.shingleStrings($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minHashSig(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.minHashSig($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class TermFreqs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "term_freqs"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.termFreqs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.termFreqs($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHashFp(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_fp"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simHash(input.asInstanceOf[UTF8String], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.simHash($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_select"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.winnowSelect(input.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.winnowSelect($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WinnowPositions(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_positions"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.winnowPositions(input.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.winnowPositions($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class JaccardSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaccardSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.TextKernels.jaccardSim($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class HashEmbed(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "hash_embed"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.hashEmbed(input.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.hashEmbed($c, $dim)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
