package graft.functions

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Geometric mean as a DeclarativeAggregate — the pure-expression
  * aggregate surface (buffer updates ARE Catalyst expressions, so the
  * whole aggregate participates in codegen; contrast with the
  * imperative buffer of [[CountMinEstimate]] and the typed
  * [[graft.ops.TopKAggregator]]). exp(avg(ln(x))) over positive
  * inputs; nulls and non-positives are ignored. The reference computes
  * p-value-style log aggregations in its GWAS/GTEx parsers — this is
  * that shape as a first-class aggregate function.
  */
case class GeoMean(child: Expression)
    extends DeclarativeAggregate {

  private lazy val sumLog = AttributeReference("sumLog", DoubleType)()
  private lazy val n = AttributeReference("n", LongType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(sumLog, n)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0L))

  private def usable(e: Expression): Expression =
    !IsNull(e) && org.apache.spark.sql.catalyst.expressions
      .GreaterThan(e, Literal(0.0))

  override lazy val updateExpressions: Seq[Expression] = {
    val x = child.cast(DoubleType)
    Seq(
      If(usable(x),
        sumLog + org.apache.spark.sql.catalyst.expressions.Log(x), sumLog),
      If(usable(x), n + Literal(1L), n))
  }

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(sumLog.left + sumLog.right, n.left + n.right)

  override lazy val evaluateExpression: Expression =
    If(org.apache.spark.sql.catalyst.expressions
        .EqualTo(n, Literal(0L)),
      Literal(null, DoubleType),
      org.apache.spark.sql.catalyst.expressions.Exp(
        sumLog / n.cast(DoubleType)))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "geo_mean"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoMean =
    copy(child = newChildren(0))
}
