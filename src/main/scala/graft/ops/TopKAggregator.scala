package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF: bounded top-k of (price, key) pairs per group (SURVEY.md
  * §2.4 q_udaf_topk; reference capability: merge-time "keep best
  * evidence" accumulation in `Common/merging.py`).
  *
  * The buffer never exceeds k elements, so partial aggregation ships at
  * most k rows per partition per group through the shuffle — the whole
  * point at 100 TB: top-k without sorting the group. Ordering: price
  * DESC, then key ASC (deterministic on price ties).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def best(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy { case (p, id) => (-p, id) }.take(k)

  // (a beats b) in the price-DESC, key-ASC order
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Seq.empty
  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    // the buffer is kept sorted, so a full row only pays O(k) insertion
    // when the element actually displaces something — most rows exit on
    // the O(1) "worse than the current k-th" check
    if (b.length >= k && !beats(a, b.last)) b
    else {
      val i = b.indexWhere(x => beats(a, x)) match {
        case -1 => b.length
        case j => j
      }
      (b.take(i) :+ a) ++ b.drop(i).take(k - i - 1)
    }
  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    best(b1 ++ b2)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
