package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Merging t-digest (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests" — public paper/algorithm) for MERGEABLE
  * approximate-quantile state (SURVEY.md §2.4 q_agg_tdigest).
  *
  * Why it exists: `q_agg_quantile`'s exact `percentile` sorts every
  * group's values inside the aggregate — the right oracle surface, but
  * at 100 TB a full per-group sort is the plan you replace. The
  * t-digest is the monitoring-pipeline staple: a CONSTANT-size state
  * (≈ O(δ) centroids, δ = compression) that builds in one pass,
  * MERGES like the algebraic states of q_agg_statemerge (commutative,
  * associative — so daily sketch rows re-aggregate to any rollup level
  * without rescanning raw data), and answers any quantile afterwards.
  * Tail accuracy is the point of the k₁ scale function: centroids near
  * q=0/1 are forced tiny, so p99 stays sharp while the middle
  * compresses hard.
  *
  * Implementation is the MERGING variant (no per-point tree): points
  * buffer raw; on overflow/read the buffer sorts and a single sweep
  * re-compresses buffer+centroids under the k₁ size bound
  * k(q) = δ/2π · asin(2q−1), merging adjacent centroids while
  * k(q_right) − k(q_left) ≤ 1. Quantile reads interpolate between
  * centroid midpoints, anchored at the tracked exact min/max.
  *
  * Estimates depend (within the accuracy band) on merge order, so the
  * operator is declared oracle-N like q_agg_approx; the spec asserts
  * tolerance against the exact percentiles AND two-phase ≡ one-phase
  * consistency.
  */
final class TDigest(val compression: Double = 100.0) extends Serializable {
  private[ops] var means: Array[Double] = new Array[Double](0)
  private[ops] var weights: Array[Double] = new Array[Double](0)
  private[ops] var nc: Int = 0
  private[ops] var total: Double = 0.0
  private[ops] var lo: Double = Double.PositiveInfinity
  private[ops] var hi: Double = Double.NegativeInfinity
  @transient private var bufV: Array[Double] = _
  @transient private var bufN: Int = 0

  private def k(q: Double): Double = {
    val x = math.min(1.0, math.max(-1.0, 2.0 * q - 1.0))
    compression / (2.0 * math.Pi) * math.asin(x)
  }

  def add(x: Double): Unit = {
    if (bufV == null) { bufV = new Array[Double](512); bufN = 0 }
    bufV(bufN) = x; bufN += 1
    if (x < lo) lo = x
    if (x > hi) hi = x
    if (bufN == bufV.length) flushBuf()
  }

  // the raw-point buffer is transient; fold it into centroids before
  // Java serialization ships a partial buffer across the shuffle —
  // without this, up to 512 unflushed points vanish per partial
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    flushBuf()
    out.defaultWriteObject()
  }

  private def flushBuf(): Unit = {
    if (bufN == 0) return
    val bv = java.util.Arrays.copyOf(bufV, bufN)
    java.util.Arrays.sort(bv)
    bufN = 0
    val cnt = nc + bv.length
    val ms = new Array[Double](cnt); val ws = new Array[Double](cnt)
    var i = 0; var j = 0; var m = 0
    while (i < nc || j < bv.length) {           // 2-way sorted merge
      if (j >= bv.length || (i < nc && means(i) <= bv(j))) {
        ms(m) = means(i); ws(m) = weights(i); i += 1
      } else { ms(m) = bv(j); ws(m) = 1.0; j += 1 }
      m += 1
    }
    compress(ms, ws, cnt, total + bv.length)
  }

  private def compress(ms: Array[Double], ws: Array[Double], cnt: Int,
      newTotal: Double): Unit = {
    if (cnt == 0) { total = newTotal; return }
    val om = new Array[Double](cnt); val ow = new Array[Double](cnt)
    var on = 0
    var cumBefore = 0.0                          // weight before current out-centroid
    var curM = ms(0); var curW = ws(0)
    var i = 1
    while (i < cnt) {
      val proposedW = curW + ws(i)
      if (k((cumBefore + proposedW) / newTotal) -
          k(cumBefore / newTotal) <= 1.0) {
        curM = (curM * curW + ms(i) * ws(i)) / proposedW
        curW = proposedW
      } else {
        om(on) = curM; ow(on) = curW; on += 1
        cumBefore += curW
        curM = ms(i); curW = ws(i)
      }
      i += 1
    }
    om(on) = curM; ow(on) = curW; on += 1
    means = java.util.Arrays.copyOf(om, on)
    weights = java.util.Arrays.copyOf(ow, on)
    nc = on; total = newTotal
  }

  /** Merge `other` into this digest (other is left untouched). */
  def mergeDigest(other: TDigest): Unit = {
    flushBuf(); other.flushBuf()
    if (other.nc == 0) return
    if (other.lo < lo) lo = other.lo
    if (other.hi > hi) hi = other.hi
    val cnt = nc + other.nc
    val ms = new Array[Double](cnt); val ws = new Array[Double](cnt)
    var i = 0; var j = 0; var m = 0
    while (i < nc || j < other.nc) {
      if (j >= other.nc || (i < nc && means(i) <= other.means(j))) {
        ms(m) = means(i); ws(m) = weights(i); i += 1
      } else { ms(m) = other.means(j); ws(m) = other.weights(j); j += 1 }
      m += 1
    }
    compress(ms, ws, cnt, total + other.total)
  }

  def count: Long = { flushBuf(); math.round(total) }

  /** Midpoint-interpolated quantile, min/max-anchored at the tails. */
  def quantile(q: Double): Double = {
    flushBuf()
    if (nc == 0) return Double.NaN
    if (nc == 1) return means(0)
    val target = q * total
    if (target <= weights(0) / 2.0)              // below first midpoint
      return lo + target / (weights(0) / 2.0) * (means(0) - lo)
    var cum = 0.0
    var i = 0
    while (i < nc - 1) {
      val midI = cum + weights(i) / 2.0
      val midNext = cum + weights(i) + weights(i + 1) / 2.0
      if (target <= midNext) {
        val f = (target - midI) / (midNext - midI)
        return means(i) + f * (means(i + 1) - means(i))
      }
      cum += weights(i)
      i += 1
    }
    val midLast = cum + weights(nc - 1) / 2.0    // above last midpoint
    if (total == midLast) return hi
    val f = math.min(1.0, (target - midLast) / (total - midLast))
    means(nc - 1) + f * (hi - means(nc - 1))
  }

  /** Canonical state bytes: compression, min/max, total, centroids. */
  def serialize: Array[Byte] = {
    flushBuf()
    val bb = ByteBuffer.allocate(8 * 4 + 4 + 16 * nc)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putDouble(compression).putDouble(lo).putDouble(hi).putDouble(total)
    bb.putInt(nc)
    var i = 0
    while (i < nc) { bb.putDouble(means(i)).putDouble(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigest {
  def deserialize(bytes: Array[Byte]): TDigest = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val t = new TDigest(bb.getDouble)
    t.lo = bb.getDouble; t.hi = bb.getDouble; t.total = bb.getDouble
    t.nc = bb.getInt
    t.means = new Array[Double](t.nc)
    t.weights = new Array[Double](t.nc)
    var i = 0
    while (i < t.nc) { t.means(i) = bb.getDouble; t.weights(i) = bb.getDouble; i += 1 }
    t
  }
}

/** Finished phase-1 state: canonical sketch bytes + exact count. */
case class TDigestState(sk: Array[Byte], n: Long)

/** Phase 1: raw doubles → per-group t-digest state. Buffer stays live
  * between reduce calls (`udaf` wraps TypedImperativeAggregate);
  * Java-serialization encoder runs only at shuffle/spill — O(groups). */
class TDigestBuildAggregator(compression: Double = 100.0)
    extends Aggregator[Double, TDigest, TDigestState] {
  override def zero: TDigest = new TDigest(compression)
  override def reduce(b: TDigest, x: Double): TDigest = { b.add(x); b }
  override def merge(b1: TDigest, b2: TDigest): TDigest = {
    b1.mergeDigest(b2); b1
  }
  override def finish(r: TDigest): TDigestState =
    TDigestState(r.serialize, r.count)
  override def bufferEncoder: Encoder[TDigest] =
    Encoders.javaSerialization[TDigest]
  override def outputEncoder: Encoder[TDigestState] =
    ExpressionEncoder[TDigestState]()
}

/** Finished rollup: count + the three headline percentile estimates. */
case class TDigestQuantiles(n: Long, p50: Double, p90: Double, p99: Double)

/** Phase 2: merge previously built (serialized) sketches — the rollup
  * that answers quantiles over any key subset from stored states
  * without rescanning raw data. */
class TDigestMergeAggregator(compression: Double = 100.0)
    extends Aggregator[Array[Byte], TDigest, TDigestQuantiles] {
  override def zero: TDigest = new TDigest(compression)
  override def reduce(b: TDigest, in: Array[Byte]): TDigest = {
    b.mergeDigest(TDigest.deserialize(in)); b
  }
  override def merge(b1: TDigest, b2: TDigest): TDigest = {
    b1.mergeDigest(b2); b1
  }
  override def finish(r: TDigest): TDigestQuantiles =
    TDigestQuantiles(r.count, r.quantile(0.5), r.quantile(0.9),
      r.quantile(0.99))
  override def bufferEncoder: Encoder[TDigest] =
    Encoders.javaSerialization[TDigest]
  override def outputEncoder: Encoder[TDigestQuantiles] =
    ExpressionEncoder[TDigestQuantiles]()
}
