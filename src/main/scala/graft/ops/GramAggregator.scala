package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Typed UDAF: exact Gram/covariance state over quantized embedding
  * vectors (SURVEY.md §2.9 q_emb_gram). One pass accumulates, per
  * partition, the full second-moment state — count, per-dimension sums,
  * and the upper-triangle pair-product sums — as a flat Array[Long];
  * partials merge by elementwise addition.
  *
  * This is the 100 TB design for covariance/PCA feature prep: the raw
  * vectors NEVER shuffle (the d·(d+1)/2-long state is the only thing
  * crossing the wire — ~17 KB at d=64 per partition, vs N·d² rows for
  * the posexplode-self-join formulation), and because the inputs are
  * pre-quantized to integers every add is exact, so the result is
  * independent of partition count and combine order — the property that
  * makes it DuckDB-oracle-able where float accumulation is not.
  *
  * Buffer layout (length 1 + d + d(d+1)/2):
  * [0] = n rows; [1..d] = Σq(i); [1+d + triIdx(i,j)] = Σ q(i)·q(j) for
  * i ≤ j, triIdx(i,j) = i·d − i(i−1)/2 + (j−i).
  */
class GramAggregator(dim: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  private val size = 1 + dim + dim * (dim + 1) / 2

  override def zero: Array[Long] = new Array[Long](size)

  override def reduce(b: Array[Long], q: Array[Long]): Array[Long] = {
    require(q.length == dim, s"expected dim=$dim, got ${q.length}")
    b(0) += 1L
    var i = 0
    var base = 1 + dim
    while (i < dim) {
      val qi = q(i)
      b(1 + i) += qi
      var j = i
      while (j < dim) { b(base + j - i) += qi * q(j); j += 1 }
      base += dim - i
      i += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var k = 0
    while (k < size) { b1(k) += b2(k); k += 1 }
    b1
  }

  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
