package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity expression marked NON-DETERMINISTIC — the optimizer-barrier
  * trick of guide §4.4 (there for expensive Python UDFs, here for expensive
  * built-in expression trees): Catalyst pushes deterministic filters below
  * exchanges and inlines deterministic projections into consumers, which
  * for a CPU-heavy derived column means (a) the whole predicate sinks below
  * the CPU-fan-out repartition onto a single-split scan and serializes on
  * one core, and (b) the expression is evaluated once below the filter and
  * AGAIN in the projection above it. Wrapping the heavy expression's input
  * in Opaque pins the evaluation where it is written: filters on the
  * derived columns stay above the projection (and above the fan-out
  * exchange), and CollapseProject will not duplicate the tree into
  * consumers. Pure pass-through at runtime (interpreted AND codegen), so
  * results are bit-identical; the only cost is the optimizations it
  * deliberately declines.
  */
case class Opaque(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  // stateless: fresh-copy semantics under retry are the child's own
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): Opaque =
    copy(child = newChild)
}

object Opaque {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge
  /** Column form: `opaque(c)` — c's value, optimizer-opaque. */
  def apply(c: Column): Column =
    ColumnBridge.column(Opaque(ColumnBridge.expression(c)))
}
