package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF building a MISRA–GRIES heavy-hitter sketch (SURVEY.md
  * §2.4 q_agg_freq): ≤ k counters over a stream such that every item
  * with true frequency > n/(k+1) is GUARANTEED a surviving counter —
  * the classic frequent-items summary (Misra & Gries 1982), with the
  * mergeable-summaries combine step (Agarwal et al. 2012: sum counters,
  * subtract the (k+1)-th largest, drop non-positive — error stays
  * ≤ n/(k+1) under any merge tree).
  *
  * The sketch alone yields approximate counts and a
  * partitioning-dependent candidate SET; q_agg_freq uses it as pass 1
  * of the standard TWO-PASS EXACT heavy-hitters plan: candidates from
  * the sketch (superset of all true hitters, by the guarantee), exact
  * broadcast-filtered recount in pass 2, threshold filter — the final
  * output is EXACT and partition-invariant, which is what makes the
  * key oracle-checkable despite the sketch core.
  *
  * Buffer: a HashMap of ≤ k counters. reduce is amortized O(1) (each
  * O(k) decrement-all pays for ≥ k earlier undecremented inserts);
  * merge is O(k log k) for the order-statistic trim. Java
  * serialization only at shuffle — O(partitions) states of ≤ k
  * entries. */
class FreqAggregator(k: Int)
    extends Aggregator[String, java.util.HashMap[String, Long],
      Array[String]] {

  override def zero: java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def reduce(b: java.util.HashMap[String, Long], t: String)
      : java.util.HashMap[String, Long] = {
    val cur = b.get(t)
    if (cur != 0L || b.containsKey(t)) b.put(t, cur + 1L)
    else if (b.size < k) b.put(t, 1L)
    else { // decrement-all: one shared "charge" against every counter
      val it = b.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
    b
  }

  override def merge(b1: java.util.HashMap[String, Long],
      b2: java.util.HashMap[String, Long])
      : java.util.HashMap[String, Long] = {
    val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
    val it = small.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = big.get(e.getKey)
      big.put(e.getKey, cur + e.getValue)
    }
    if (big.size > k) {
      // subtract the (k+1)-th largest count from all, drop ≤ 0
      val counts = new Array[Long](big.size)
      var i = 0
      val vs = big.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1)) // (k+1)-th largest
      val es = big.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        if (e.getValue <= sub) es.remove()
        else e.setValue(e.getValue - sub)
      }
    }
    big
  }

  override def finish(b: java.util.HashMap[String, Long]): Array[String] = {
    val out = b.keySet().toArray(new Array[String](b.size))
    java.util.Arrays.sort(out, java.util.Comparator.naturalOrder[String]())
    out
  }

  override def bufferEncoder: Encoder[java.util.HashMap[String, Long]] =
    Encoders.javaSerialization[java.util.HashMap[String, Long]]
  override def outputEncoder: Encoder[Array[String]] =
    ExpressionEncoder[Array[String]]()
}
