package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF building a KMV (k-minimum-values) distinct sketch
  * (SURVEY.md §2.4 q_agg_kmv): the k smallest DISTINCT hash values of
  * a set — the classic bottom-k / theta-family sketch (Beyer et al.
  * 2007, Apache DataSketches lineage — public algorithms).
  *
  * Why this completes the sketch family: HLL (q_agg_approx /
  * q_agg_hll_rollup) estimates cardinality but its states don't
  * support intersection; the bitmap (q_agg_bitmap) is exact set
  * algebra but O(distinct) bytes. KMV sits between: O(k) bytes, and
  * because `k-min(A ∪ B) = k-min(k-min(A) ∪ k-min(B))` EXACTLY, union
  * merges losslessly — the mergeable-state contract — while the k-th
  * order statistic estimates cardinality as (k−1)/u_(k).
  *
  * DETERMINISM is the distinctive property here: the k smallest
  * elements of a set are the same whatever the partitioning or merge
  * order, and the hash is md5-derived — replayable in DuckDB — so
  * unlike every other sketch key this one is fully ORACLE-CHECKED,
  * estimate included.
  *
  * Buffer: a TreeSet trimmed to k (insert O(log k), merge = union +
  * trim). Live between reduce calls (udaf wraps
  * TypedImperativeAggregate); Java serialization only at shuffle —
  * O(groups) states of ≤ k longs. */
class KmvAggregator(k: Int)
    extends Aggregator[Long, java.util.TreeSet[java.lang.Long], Array[Long]] {

  override def zero: java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def reduce(b: java.util.TreeSet[java.lang.Long],
      h: Long): java.util.TreeSet[java.lang.Long] = {
    // skip adds that cannot enter the k-min set (the common case once
    // the sketch saturates — no allocation, one comparison)
    if (b.size < k || h < b.last()) {
      b.add(h)
      if (b.size > k) b.pollLast()
    }
    b
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
    val it = small.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (big.size < k || h < big.last()) {
        big.add(h)
        if (big.size > k) big.pollLast()
      }
    }
    big
  }

  override def finish(r: java.util.TreeSet[java.lang.Long]): Array[Long] = {
    val out = new Array[Long](r.size)
    val it = r.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out // ascending — element k-1 is the k-th order statistic
  }

  override def bufferEncoder: Encoder[java.util.TreeSet[java.lang.Long]] =
    Encoders.javaSerialization[java.util.TreeSet[java.lang.Long]]
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
