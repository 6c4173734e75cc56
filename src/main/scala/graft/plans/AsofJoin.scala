package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.TimestampType

/** Whole-operator custom surface (SURVEY.md §4.3 stretch goal): a native
  * as-of join — logical node + planner strategy + physical merge
  * operator — replacing the union+window rewrite (Joins.joinAsofOn)
  * with the plan a purpose-built engine would pick:
  *
  *   shuffle both sides by key → sort (key, ts) → ONE forward-merge
  *   pass per partition with O(1) state (the last right ts ≤ left ts).
  *
  * Against the rewrite this avoids unioning the streams and running a
  * window over the combined set — at 100 TB that is one fewer wide
  * dataset and no window buffer; the merge is pipelined and never
  * materializes a frame. Boundary semantics identical to DuckDB ASOF:
  * right.ts <= left.ts inclusive, most recent wins, inner (no-match
  * left rows drop).
  *
  * Install: `spark.experimental.extraStrategies :+= AsofStrategy` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  * Keys are LongType, timestamps TimestampType (micros) — the shapes
  * the events table uses; generalizing is mechanical.
  */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression,
    // constructor param (NOT a body val): copy() during tree transforms
    // must preserve the exprId or downstream references dangle
    asofAttr: AttributeReference = AttributeReference("asof_ts", TimestampType)())
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ asofAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsofJoinNode =>
      AsofJoinExec(planLater(n.left), planLater(n.right),
        n.leftKey, n.leftTs, n.rightKey, n.rightTs, n.output) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression,
    override val output: Seq[Attribute]) extends BinaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output.last)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTs, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTs, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyExprs = Seq(leftKey, leftTs)
    val rKeyExprs = Seq(rightKey, rightTs)
    val lOut = left.output
    val rOut = right.output
    // bind the result against the PHYSICAL joined layout (child output
    // order can differ from the logical one after optimization)
    val joinedSchema = lOut :+ output.last
    val outExprs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rProj = UnsafeProjection.create(rKeyExprs, rOut)
      val result = UnsafeProjection.create(outExprs, joinedSchema)
      val tsRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new JoinedRow
      new Iterator[InternalRow] {
        // state: most recent right (key, ts) with key == current left
        // key and ts <= current left ts — O(1) per partition.
        private var rAhead: InternalRow = _       // next unconsumed right row
        private var rAheadKey = 0L; private var rAheadTs = 0L
        private var haveAhead = false
        private var lastKey = 0L; private var lastTs = 0L
        private var haveLast = false
        private var nextOut: InternalRow = _

        // SQL join semantics: NULL keys/timestamps never match — rows
        // with a null key or ts are discarded here rather than read as
        // 0 via getLong (which would let a NULL-keyed row match key 0).
        // The ascending sort puts null groups first, so skipping them
        // on the fly preserves the merge invariants.
        private def pullRight(): Unit = {
          haveAhead = false
          while (!haveAhead && rIter.hasNext) {
            val r = rIter.next()
            val k = rProj(r)
            if (!k.isNullAt(0) && !k.isNullAt(1)) {
              rAheadKey = k.getLong(0); rAheadTs = k.getLong(1)
              haveAhead = true
            }
          }
        }

        pullRight()

        private def advance(): Unit = {
          nextOut = null
          while (nextOut == null && lIter.hasNext) {
            val lRow = lIter.next()
            val lk = lProj(lRow)
            if (!lk.isNullAt(0) && !lk.isNullAt(1)) {
              val key = lk.getLong(0); val ts = lk.getLong(1)
              if (haveLast && lastKey != key) haveLast = false
              // consume right rows up to (key, ts) inclusive
              while (haveAhead && (rAheadKey < key ||
                  (rAheadKey == key && rAheadTs <= ts))) {
                if (rAheadKey == key) {
                  lastKey = key; lastTs = rAheadTs; haveLast = true
                }
                pullRight()
              }
              if (haveLast && lastKey == key) {
                tsRow.update(0, lastTs)
                // copy: the projection reuses its buffer and the
                // one-row lookahead would overwrite it before the
                // consumer reads the previous row
                nextOut = result(joined(lRow, tsRow)).copy()
              } // else: inner semantics — drop the left row
            } // else: null key/ts never matches — drop the left row
          }
        }

        advance()
        override def hasNext: Boolean = nextOut != null
        override def next(): InternalRow = {
          val out = nextOut
          advance()
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API for the native as-of join. */
object Asof {
  /** left.asofJoin(right): for every left row, append `asof_ts` — the
    * greatest right.ts with matching key and ts <= left.ts (inner). */
  def join(leftDf: DataFrame, rightDf: DataFrame,
      key: String, ts: String): DataFrame = {
    val spark: SparkSession = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofStrategy
    // fresh-alias the right side so a self-join can't carry duplicate
    // exprIds into the custom node (DeduplicateRelations only rewrites
    // nodes it understands)
    import org.apache.spark.sql.functions.col
    val rFresh = rightDf.select(
      rightDf.columns.map(c => col(c).as(c + "__r")).toIndexedSeq: _*)
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rFresh.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
    GraftBridge.ofRows(spark,
      AsofJoinNode(lPlan, rPlan,
        attr(lPlan, key), attr(lPlan, ts),
        attr(rPlan, key + "__r"), attr(rPlan, ts + "__r")))
  }
}
