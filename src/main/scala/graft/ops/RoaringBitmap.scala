package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Array container: sorted low-16 values in `vs(0, card)`. */
private[ops] final class ArrCont(var vs: Array[Char], var card: Int)
    extends Serializable

/** Compressed (roaring-style) 64-bit bitmap for RE-MERGEABLE
  * exact-distinct state (SURVEY.md §2.4 q_agg_bitmap).
  *
  * The r11 dense bitset capped the id space at 2^26 (8 MiB of words) and
  * fail-fasted beyond it — which rejects every real-world 64-bit id
  * space. This replaces it with the standard container decomposition
  * [Chambi et al., "Better bitmap performance with Roaring bitmaps",
  * SPE 2016 — public paper]: ids are bucketed by their high 48 bits
  * (`id >>> 16`, unsigned, so negative longs work too); each container
  * covers 2^16 consecutive ids and is stored as either
  *
  *  - an ARRAY container ([[ArrCont]]): sorted `Array[Char]` of the low
  *    16 bits, used below 4096 entries (≤ 8 KiB) — a lone sparse id
  *    costs 2 bytes, not 8 MiB of dense words; or
  *  - a BITMAP container: 1024 words (8 KiB fixed), used at ≥ 4096
  *    entries where the dense form is smaller than the array.
  *
  * Memory is therefore O(distinct ids) with an 8 KiB/container ceiling,
  * for ANY id distribution over the full unsigned 64-bit space. The
  * algebra the operator depends on is unchanged: OR is commutative,
  * associative AND idempotent, so daily states merge in any order and
  * overlapping inputs never double-count.
  *
  * Containers live in parallel sorted arrays (`keys`/`conts`) rather
  * than a hash map: adds binary-search the key, and since real event
  * streams hit the same container repeatedly a one-slot "last container"
  * cache makes the common case O(1). The sorted layout also makes
  * [[serialize]] canonical (same id set ⇒ same bytes) — required for
  * deterministic state files — and lets [[orInPlace]] merge two bitmaps
  * with a single linear pass.
  *
  * Serialized wire format (little-endian, canonical):
  * {{{
  *   int32  nContainers
  *   repeat nContainers (ascending unsigned key):
  *     int64 key;  int32 card
  *     if card < 4096: card × uint16 sorted values  (array container)
  *     else:           1024 × int64 words           (bitmap container)
  * }}}
  */
final class Roaring64 extends Serializable {
  private[ops] var keys: Array[Long] = new Array[Long](4)
  private[ops] var conts: Array[AnyRef] = new Array[AnyRef](4)
  private[ops] var n: Int = 0
  // one-slot cache: consecutive adds in the same 2^16 range skip the search
  @transient private var lastIdx: Int = -1

  import Roaring64.{ArrCap, unsignedLess}

  private def search(key: Long): Int = {
    // binary search over unsigned keys; returns index or -(ins)-1
    var lo = 0; var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val k = keys(mid)
      if (k == key) return mid
      else if (unsignedLess(k, key)) lo = mid + 1
      else hi = mid - 1
    }
    -(lo + 1)
  }

  private def insertAt(pos: Int, key: Long, c: AnyRef): Unit = {
    if (n == keys.length) {
      keys = java.util.Arrays.copyOf(keys, n * 2)
      conts = java.util.Arrays.copyOf(conts, n * 2)
    }
    System.arraycopy(keys, pos, keys, pos + 1, n - pos)
    System.arraycopy(conts, pos, conts, pos + 1, n - pos)
    keys(pos) = key; conts(pos) = c; n += 1
  }

  def add(id: Long): Unit = {
    val key = id >>> 16
    val low = (id & 0xFFFFL).toChar
    var i = if (lastIdx >= 0 && lastIdx < n && keys(lastIdx) == key) lastIdx
            else search(key)
    if (i < 0) { i = -i - 1; insertAt(i, key, new ArrCont(new Array[Char](8), 0)) }
    lastIdx = i
    conts(i) match {
      case a: ArrCont =>
        // binary search the low value; insert in place if absent
        var lo = 0; var hi = a.card - 1; var found = false
        while (lo <= hi && !found) {
          val mid = (lo + hi) >>> 1
          if (a.vs(mid) == low) found = true
          else if (a.vs(mid) < low) lo = mid + 1
          else hi = mid - 1
        }
        if (!found) {
          if (a.card == a.vs.length)
            a.vs = java.util.Arrays.copyOf(a.vs, a.card * 2)
          System.arraycopy(a.vs, lo, a.vs, lo + 1, a.card - lo)
          a.vs(lo) = low; a.card += 1
          if (a.card == ArrCap)                  // promote: keep card < ArrCap
            conts(i) = Roaring64.arrToWords(a.vs, a.card)
        }
      case w: Array[Long] =>
        w(low >> 6) |= 1L << (low & 63)
    }
  }

  /** OR `other` into this bitmap (single linear merge pass). `other` is
    * left untouched — shared containers are copied, never aliased. */
  def orInPlace(other: Roaring64): Unit = {
    if (other.n == 0) return
    val mKeys = new Array[Long](n + other.n)
    val mConts = new Array[AnyRef](n + other.n)
    var i = 0; var j = 0; var m = 0
    while (i < n || j < other.n) {
      if (j >= other.n || (i < n && unsignedLess(keys(i), other.keys(j)))) {
        mKeys(m) = keys(i); mConts(m) = conts(i); i += 1
      } else if (i >= n || unsignedLess(other.keys(j), keys(i))) {
        mKeys(m) = other.keys(j); mConts(m) = Roaring64.copyCont(other.conts(j))
        j += 1
      } else {
        mKeys(m) = keys(i)
        mConts(m) = Roaring64.orCont(conts(i), other.conts(j))
        i += 1; j += 1
      }
      m += 1
    }
    keys = mKeys; conts = mConts; n = m; lastIdx = -1
  }

  def cardinality: Long = {
    var total = 0L; var i = 0
    while (i < n) {
      conts(i) match {
        case a: ArrCont => total += a.card
        case w: Array[Long] =>
          var k = 0
          while (k < w.length) { total += java.lang.Long.bitCount(w(k)); k += 1 }
      }
      i += 1
    }
    total
  }

  def serialize: Array[Byte] = {
    var bytes = 4; var i = 0
    while (i < n) {
      bytes += 12 + (conts(i) match {
        case a: ArrCont => a.card * 2            // card < ArrCap by invariant
        case _ => 8192
      })
      i += 1
    }
    val bb = ByteBuffer.allocate(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(n)
    i = 0
    while (i < n) {
      bb.putLong(keys(i))
      conts(i) match {
        case a: ArrCont =>
          bb.putInt(a.card)
          var k = 0
          while (k < a.card) { bb.putChar(a.vs(k)); k += 1 }
        case w: Array[Long] =>
          var card = 0; var k = 0
          while (k < 1024) { card += java.lang.Long.bitCount(w(k)); k += 1 }
          bb.putInt(card)
          k = 0
          while (k < 1024) { bb.putLong(w(k)); k += 1 }
      }
      i += 1
    }
    bb.array()
  }
}

object Roaring64 {
  /** Array-container capacity: beyond this the 8 KiB bitmap is smaller.
    * Invariant: an [[ArrCont]] always has card < ArrCap — the add that
    * would reach ArrCap+1 promotes, and a merged union ≥ ArrCap is built
    * as a bitmap container directly. */
  final val ArrCap = 4096

  @inline private[ops] def unsignedLess(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0

  private[ops] def arrToWords(vs: Array[Char], card: Int): Array[Long] = {
    val w = new Array[Long](1024)
    var k = 0
    while (k < card) { val v = vs(k); w(v >> 6) |= 1L << (v & 63); k += 1 }
    w
  }

  private[ops] def copyCont(c: AnyRef): AnyRef = c match {
    case w: Array[Long] => w.clone()
    case a: ArrCont => new ArrCont(java.util.Arrays.copyOf(a.vs, a.card), a.card)
  }

  /** OR two containers; may mutate and return `x`, never mutates `y`. */
  private[ops] def orCont(x: AnyRef, y: AnyRef): AnyRef = (x, y) match {
    case (a: Array[Long], b: Array[Long]) =>
      var k = 0
      while (k < 1024) { a(k) |= b(k); k += 1 }
      a
    case (a: Array[Long], b: ArrCont) =>
      var k = 0
      while (k < b.card) { val v = b.vs(k); a(v >> 6) |= 1L << (v & 63); k += 1 }
      a
    case (a: ArrCont, b: Array[Long]) =>
      val w = b.clone()
      var k = 0
      while (k < a.card) { val v = a.vs(k); w(v >> 6) |= 1L << (v & 63); k += 1 }
      w
    case (a: ArrCont, b: ArrCont) =>
      // sorted-merge union; if the union could cross the cap, go dense
      if (a.card + b.card >= ArrCap) {
        val w = arrToWords(a.vs, a.card)
        var k = 0
        while (k < b.card) { val v = b.vs(k); w(v >> 6) |= 1L << (v & 63); k += 1 }
        var card = 0; k = 0
        while (k < 1024) { card += java.lang.Long.bitCount(w(k)); k += 1 }
        if (card >= ArrCap) w
        else {                                   // union stayed small: demote back
          val vs = new Array[Char](card)
          var m = 0; k = 0
          while (k < 65536) {
            if ((w(k >> 6) & (1L << (k & 63))) != 0) { vs(m) = k.toChar; m += 1 }
            k += 1
          }
          new ArrCont(vs, card)
        }
      } else {
        val out = new Array[Char](a.card + b.card)
        var i = 0; var j = 0; var m = 0
        while (i < a.card || j < b.card) {
          if (j >= b.card || (i < a.card && a.vs(i) < b.vs(j))) {
            out(m) = a.vs(i); i += 1
          } else if (i >= a.card || b.vs(j) < a.vs(i)) {
            out(m) = b.vs(j); j += 1
          } else { out(m) = a.vs(i); i += 1; j += 1 }
          m += 1
        }
        new ArrCont(out, m)
      }
  }

  def deserialize(bytes: Array[Byte]): Roaring64 = {
    val r = new Roaring64
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val cnt = bb.getInt
    r.keys = new Array[Long](math.max(cnt, 4))
    r.conts = new Array[AnyRef](math.max(cnt, 4))
    r.n = cnt
    var i = 0
    while (i < cnt) {
      r.keys(i) = bb.getLong
      val card = bb.getInt
      if (card < ArrCap) {
        val vs = new Array[Char](math.max(card, 8))
        var k = 0
        while (k < card) { vs(k) = bb.getChar; k += 1 }
        r.conts(i) = new ArrCont(vs, card)
      } else {
        val w = new Array[Long](1024)
        var k = 0
        while (k < 1024) { w(k) = bb.getLong; k += 1 }
        r.conts(i) = w
      }
      i += 1
    }
    r
  }

  /** |A ∩ B| of two serialized bitmaps — the second set-algebra
    * primitive stored states support (OR answers "uniques over a
    * range"; AND answers "uniques present in BOTH periods" — exact
    * retention from daily states without rescanning raw events).
    * Containers walk pairwise by unsigned key; only key-matched
    * containers intersect. */
  def andCardinalityOf(ab: Array[Byte], bb: Array[Byte]): Long = {
    val x = deserialize(ab); val y = deserialize(bb)
    var i = 0; var j = 0; var total = 0L
    while (i < x.n && j < y.n) {
      val c = java.lang.Long.compareUnsigned(x.keys(i), y.keys(j))
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else { total += andContCard(x.conts(i), y.conts(j)); i += 1; j += 1 }
    }
    total
  }

  private def andContCard(a: AnyRef, b: AnyRef): Long = (a, b) match {
    case (w1: Array[Long], w2: Array[Long]) =>
      var k = 0; var t = 0L
      while (k < 1024) { t += java.lang.Long.bitCount(w1(k) & w2(k)); k += 1 }
      t
    case (ac: ArrCont, w: Array[Long]) => arrInWords(ac, w)
    case (w: Array[Long], ac: ArrCont) => arrInWords(ac, w)
    case (a1: ArrCont, a2: ArrCont) =>
      var i = 0; var j = 0; var t = 0L
      while (i < a1.card && j < a2.card) {
        if (a1.vs(i) < a2.vs(j)) i += 1
        else if (a2.vs(j) < a1.vs(i)) j += 1
        else { t += 1; i += 1; j += 1 }
      }
      t
  }

  private def arrInWords(ac: ArrCont, w: Array[Long]): Long = {
    var k = 0; var t = 0L
    while (k < ac.card) {
      val v = ac.vs(k)
      if ((w(v >> 6) & (1L << (v & 63))) != 0) t += 1
      k += 1
    }
    t
  }

  /** Cardinality straight off the wire format — no materialization. */
  def cardinalityOf(bytes: Array[Byte]): Long = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val cnt = bb.getInt
    var total = 0L; var i = 0
    while (i < cnt) {
      bb.getLong                                 // key
      val card = bb.getInt
      total += card
      bb.position(bb.position() + (if (card < ArrCap) card * 2 else 8192))
      i += 1
    }
    total
  }
}
