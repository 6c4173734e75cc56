package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Typed UDAFs for RE-MERGEABLE exact-distinct state (SURVEY.md §2.4
  * q_agg_bitmap): a distinct count carried as a BITMAP is the one form
  * that re-aggregates — daily bitmaps OR together for any date range
  * without touching raw data, where a plain `COUNT(DISTINCT)` result is
  * a dead end (distincts don't add). This is the exact-distinct sibling
  * of q_agg_statemerge's algebraic sums, and the exact counterpart of
  * the HLL sketch rollup (q_agg_hll_rollup) when the id space is dense
  * enough to afford 1 bit per id.
  *
  * [[BitmapBuildAggregator]]: Long ids → fixed-word Array[Long] bitset
  * (word i bit j = id 64·i+j). [[BitmapMergeAggregator]]: OR previously
  * built bitmaps. Both merge by elementwise OR — commutative,
  * idempotent, associative — so partials combine in any order AND
  * overlapping inputs never double-count (idempotence is what sums
  * lack). At 100 TB a dense bitset becomes roaring/compressed chunks,
  * but the algebra — and this operator's shape — is unchanged.
  */
class BitmapBuildAggregator(maxIdCap: Long = 1L << 26)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.empty[Long]
  override def reduce(b: Array[Long], id: Long): Array[Long] = {
    // the dense-bitset guard: beyond the cap (8 MiB of words) a sparse
    // id space needs a compressed bitmap, not a bigger array
    require(id >= 0 && id < maxIdCap, s"id $id outside [0, $maxIdCap)")
    val w = (id >> 6).toInt
    val nb = if (b.length > w) b
             else java.util.Arrays.copyOf(b, math.max(w + 1, b.length * 2))
    nb(w) |= 1L << (id & 63L)
    nb
  }
  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    val (lo, hi) = if (b1.length <= b2.length) (b1, b2) else (b2, b1)
    var i = 0
    while (i < lo.length) { hi(i) |= lo(i); i += 1 }
    hi
  }
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

/** Second level: OR pre-built bitmaps (shorter inputs zero-extend). */
class BitmapMergeAggregator
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.empty[Long]
  private def or(a: Array[Long], b: Array[Long]): Array[Long] = {
    val (lo, hi) = if (a.length <= b.length) (a, b) else (b, a)
    val out = hi.clone()
    var i = 0
    while (i < lo.length) { out(i) |= lo(i); i += 1 }
    out
  }
  override def reduce(b: Array[Long], in: Array[Long]): Array[Long] = or(b, in)
  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = or(b1, b2)
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
