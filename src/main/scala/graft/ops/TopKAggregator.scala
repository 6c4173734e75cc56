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

  override def zero: Seq[(Double, Long)] = Seq.empty
  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    best(b :+ a)
  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    best(b1 ++ b2)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
