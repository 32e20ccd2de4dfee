package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave for multi-dimensional data clustering.
  *
  * Sorting by `zorder2(x, y)` before a partitioned write clusters rows so
  * that a parquet file's (x, y) bounding box covers a compact 2-D tile
  * instead of a thin slice of one dimension — min/max zone maps then prune
  * files for predicates on EITHER column, the layout trick behind
  * Delta/Iceberg Z-ordering (public algorithm: bit interleaving of
  * fixed-width keys). Used with [[graft.operators.LakeLayout]]'s
  * `sortWithinPartitions`.
  *
  * Inputs are BIGINTs whose values must fit in signed 32 bits (the
  * interleave consumes 32 bits per dimension; wider inputs fail loudly
  * rather than silently aliasing). The sign bit is bias-flipped so the
  * interleaved order is consistent with numeric order for negative values.
  */
object ZOrder {
  /** Spread the low 32 bits of v to the even bit positions of a long. */
  private def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code of two signed-32-bit values. The sign bit of each input is
    * bias-flipped (Int.MinValue..Int.MaxValue → 0..2^32-1 in order), and
    * bit 63 of the interleave is flipped back so a plain signed-long
    * ORDER BY sorts codes in true unsigned Morton order.
    */
  def morton(x: Long, y: Long): Long = {
    require(x >= Int.MinValue && x <= Int.MaxValue,
      s"zorder2 input out of 32-bit range: $x")
    require(y >= Int.MinValue && y <= Int.MaxValue,
      s"zorder2 input out of 32-bit range: $y")
    val bx = (x.toInt ^ 0x80000000).toLong & 0xffffffffL
    val by = (y.toInt ^ 0x80000000).toLong & 0xffffffffL
    (spread(bx) | (spread(by) << 1)) ^ Long.MinValue
  }
}

/** `zorder2(x, y)`: codegen'd Morton code of two BIGINT columns. */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("zorder2 requires two BIGINT arguments")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder.morton($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "zorder2"
}
