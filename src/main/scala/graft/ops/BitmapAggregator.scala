package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Finished bitmap state on the wire: the canonical serialized roaring
  * bytes (re-mergeable downstream) plus its cardinality, precomputed in
  * `finish` so no scalar UDF is needed to popcount it. */
case class BitmapState(bm: Array[Byte], card: Long)

/** Typed UDAFs for RE-MERGEABLE exact-distinct state (SURVEY.md §2.4
  * q_agg_bitmap): a distinct count carried as a BITMAP is the one form
  * that re-aggregates — daily bitmaps OR together for any date range
  * without touching raw data, where a plain `COUNT(DISTINCT)` result is
  * a dead end (distincts don't add). This is the exact-distinct sibling
  * of q_agg_statemerge's algebraic sums, and the exact counterpart of
  * the HLL sketch rollup (q_agg_hll_rollup).
  *
  * r12: the aggregation state is the compressed [[Roaring64]] (array /
  * bitmap containers over 2^16-id chunks), replacing the r11 dense
  * bitset whose 2^26 id cap fail-fasted on any real 64-bit id space.
  * Memory is O(distinct ids) with an 8 KiB/container ceiling for ANY id
  * distribution — sparse 64-bit ids (hashes, snowflake ids, negatives)
  * now cost bytes, not 8 MiB of dense words. OR stays commutative,
  * idempotent, associative, so partials combine in any order AND
  * overlapping inputs never double-count (idempotence is what sums
  * lack).
  *
  * The buffer crosses the partial/final shuffle via Java serialization
  * (`Encoders.javaSerialization`): the buffer object itself stays LIVE
  * between `reduce` calls (`udaf` wraps a `TypedImperativeAggregate`),
  * so the encoder only runs at shuffle/spill boundaries — O(groups)
  * states, never O(rows) — and Java serialization reproduces the
  * array-of-variant-containers layout with zero registration risk. The
  * FINISHED value rides the canonical [[Roaring64.serialize]] format
  * instead, so persisted daily states are byte-stable across JVMs.
  */
class RoaringBuildAggregator
    extends Aggregator[Long, Roaring64, BitmapState] {
  override def zero: Roaring64 = new Roaring64
  override def reduce(b: Roaring64, id: Long): Roaring64 = { b.add(id); b }
  override def merge(b1: Roaring64, b2: Roaring64): Roaring64 = {
    // OR the smaller into the larger (fewer container copies)
    val (big, small) = if (b1.n >= b2.n) (b1, b2) else (b2, b1)
    big.orInPlace(small); big
  }
  override def finish(r: Roaring64): BitmapState =
    BitmapState(r.serialize, r.cardinality)
  override def bufferEncoder: Encoder[Roaring64] =
    Encoders.javaSerialization[Roaring64]
  override def outputEncoder: Encoder[BitmapState] =
    ExpressionEncoder[BitmapState]()
}

/** Second level: OR previously built (serialized) bitmaps — the rollup
  * that answers "uniques over any date range" from daily states without
  * rescanning raw events. Input is the canonical wire bytes. */
class RoaringOrAggregator
    extends Aggregator[Array[Byte], Roaring64, BitmapState] {
  override def zero: Roaring64 = new Roaring64
  override def reduce(b: Roaring64, in: Array[Byte]): Roaring64 = {
    b.orInPlace(Roaring64.deserialize(in)); b
  }
  override def merge(b1: Roaring64, b2: Roaring64): Roaring64 = {
    val (big, small) = if (b1.n >= b2.n) (b1, b2) else (b2, b1)
    big.orInPlace(small); big
  }
  override def finish(r: Roaring64): BitmapState =
    BitmapState(r.serialize, r.cardinality)
  override def bufferEncoder: Encoder[Roaring64] =
    Encoders.javaSerialization[Roaring64]
  override def outputEncoder: Encoder[BitmapState] =
    ExpressionEncoder[BitmapState]()
}
