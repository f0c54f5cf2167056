package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/** Int8 scalar quantization (SQ8) kernels for the 100 TB embedding path.
  *
  * A 384-d float32 embedding column is 1.5 kB/row; at 10^11 rows that is
  * 150 TB of vector data alone. Symmetric per-vector int8 quantization
  * stores 1 byte/dim + one float scale (4× smaller, cache-resident per
  * partition), and the scoring loop becomes an integer multiply-add that
  * JIT vectorizes. Standard technique (e.g. Faiss SQ8 / Lucene int8 HNSW,
  * both public); the reference engine keeps raw float32 in Qdrant
  * (qdrant_store.py:90-96) — this is the batch-engine scale path beyond it.
  *
  * Contract (pinned to declarative HOF forms in KernelEquivalenceSpec):
  *   code[i]  = floor(x[i] * 127 / scale + 0.5)   (scale = max |x|, so the
  *              value is already in [-127, 127]; scale <= 0 → all zeros)
  *   dot(a,b) = Σ a[i]*b[i] over min(len) as a long — exact integer math,
  *              so Spark and the DuckDB oracle agree bit-for-bit.
  */
case class Sq8Encode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sq8_encode needs (array<double>, double), got $l / $r")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq8_encode"

  override def nullSafeEval(v: Any, s: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val scale = s.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Byte](n)
    if (scale > 0) {
      var i = 0
      while (i < n) {
        out(i) = math.floor(x.getDouble(i) * 127.0 / scale + 0.5).toByte
        i += 1
      }
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, s) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |byte[] $out = new byte[$n];
         |if ($s > 0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (byte) java.lang.Math.floor($v.getDouble($i) * 127.0 / $s + 0.5);
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product over two SQ8 code columns (binary): Σ a[i]*b[i] as a
  * long. The approximate cosine is recovered as
  * `scale_a * scale_b * dot / 16129.0` (127² = 16129). */
case class Sq8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sq8_dot needs (binary, binary), got $l / $r")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sq8_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var s = 0L
    var i = 0
    while (i < n) { s += x(i).toLong * y(i).toLong; i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) $a[$i] * (long) $b[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
