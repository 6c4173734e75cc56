package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression: |A ∩ B| of two canonical-serialized
  * [[graft.ops.Roaring64]] bitmaps.
  *
  * The set-algebra read path for STORED exact-distinct states
  * (SURVEY.md §2.4): OR-merge answers "uniques over any range"
  * (q_agg_bitmap); this answers "uniques present in BOTH states" —
  * exact day-over-day retention from the state table alone
  * (q_agg_bitmap_retention), no raw-event rescan. A native expression
  * rather than a UDF per the §4.3 preference ladder: typed, codegen'd
  * (a static call into the container-walk intersect — the loop itself
  * lives in library code, not generated Java), and visible to Catalyst
  * for null propagation. Evaluated at state-table granularity
  * (|days|×|types| rows), never per event. */
case class RoaringAndCard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"roaring_and_card expects (binary, binary), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "roaring_and_card"

  override def nullSafeEval(a: Any, b: Any): Any =
    graft.ops.Roaring64.andCardinalityOf(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.ops.Roaring64$$.MODULE$$.andCardinalityOf($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RoaringAndCard =
    copy(left = newLeft, right = newRight)
}
