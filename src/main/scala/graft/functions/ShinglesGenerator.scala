package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingles(text, n)` — a TRUE Catalyst `Generator` (the native UDTF
  * surface, completing SURVEY §4.3's extension ladder): one input row →
  * all word-n-gram shingles as output rows. Registered by
  * `GraftExtensions.registerFunctions`, usable from plain SQL:
  * `SELECT shingles(text, 5) FROM documents LATERAL VIEW`-style or in
  * a SELECT list like `explode`.
  *
  * Versus the `explode(split(...))` + window composition the query
  * path uses, a Generator emits rows directly from the expression
  * evaluator — no intermediate array materialization and no window
  * shuffle — the right tool when shingling is a row-local generator
  * step inside a larger pipeline. Generators evaluate on the
  * interpreted path ([[CodegenFallback]]), which is also true of
  * Spark's own `json_tuple`/`stack`; the hot dedup paths keep their
  * codegen'd formulation.
  */
case class ShinglesGenerator(child: Expression, nExpr: Expression)
    extends Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"shingles requires a STRING column, got ${child.dataType.simpleString}")
    else if (!nExpr.foldable || nExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "shingles size must be a foldable INT, got " +
          s"${nExpr.dataType.simpleString} (foldable=${nExpr.foldable})")
    else if (nExpr.eval(InternalRow.empty) == null ||
        nExpr.eval(InternalRow.empty).asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("shingles size must be >= 1")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val n: Int = nExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val toks = v.asInstanceOf[UTF8String].toString
        .toLowerCase.split(" ")
      if (toks.length < n) Nil
      else (0 to toks.length - n).map { i =>
        InternalRow(UTF8String.fromString(
          toks.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override def children: Seq[Expression] = Seq(child, nExpr)
  override def prettyName: String = "shingles"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShinglesGenerator =
    copy(child = newChildren(0), nExpr = newChildren(1))
}
