package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count–Min sketch aggregate over a string column — the
  * TypedImperativeAggregate surface (mutable opaque buffer +
  * serialize/merge), i.e. how HLL/sketch aggregates are actually built
  * inside Spark. Completes the extension ladder exercised by this
  * engine: built-ins → Scala UDF → typed Aggregator → native codegen
  * Expression → whole-operator plan — and now an imperative aggregate.
  *
  * `count_min_est(col, 't1,t2,...')` returns the estimated occurrence
  * count for each comma-separated target as array<long>. Estimates are
  * deterministic (seeded permutation hashes), mergeable across
  * partitions in any order (element-wise counter sums), and obey the
  * CMS guarantee: estimate ≥ true count, ≤ true count + εN w.h.p.
  * At 100 TB this is the shape that replaces an exact groupBy count
  * when only heavy hitters matter: constant 8 KB of state per
  * partition instead of a |vocab|-sized shuffle.
  */
case class CountMinEstimate(child: Expression, targetsExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val depth = 4
  private val width = 256

  // validate at analysis time: without this, a non-string child or a
  // non-foldable/non-string targets argument surfaces as a runtime
  // ClassCastException/NPE instead of a clear analysis error (sketch
  // built-ins validate their literal parameters the same way)
  override def checkInputDataTypes(): TypeCheckResult = {
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"count_min_est requires a STRING column, got ${child.dataType.simpleString}")
    else if (!targetsExpr.foldable || !targetsExpr.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        "count_min_est targets must be a foldable STRING like 'a,b,c', got " +
          s"${targetsExpr.dataType.simpleString} (foldable=${targetsExpr.foldable})")
    else if (targetsExpr.eval(InternalRow.empty) == null)
      TypeCheckResult.TypeCheckFailure("count_min_est targets must not be NULL")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val targets: Seq[UTF8String] =
    targetsExpr.eval(InternalRow.empty).asInstanceOf[UTF8String]
      .toString.split(",").toSeq.map(UTF8String.fromString)

  private def slot(d: Int, v: UTF8String): Int = {
    val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
      .hashUnsafeBytes(v.getBaseObject, v.getBaseOffset, v.numBytes(), d * 104729 + 7)
    ((h % width) + width) % width
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var d = 0
      while (d < depth) { buf(d * width + slot(d, s)) += 1; d += 1 }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(targets.map { t =>
      (0 until depth).map(d => buf(d * width + slot(d, t))).min
    }.toArray)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, targetsExpr)
  override def prettyName: String = "count_min_est"

  override def withNewMutableAggBufferOffset(o: Int): CountMinEstimate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinEstimate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinEstimate =
    copy(child = newChildren(0), targetsExpr = newChildren(1))
}
