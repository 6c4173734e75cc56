package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `cdc_split(text, w, mod) -> array<string>` — CONTENT-DEFINED
  * CHUNKING: split a document at positions where the polynomial
  * rolling hash of the last `w` codepoints is ≡ 0 (mod `mod`).
  *
  * Why content-defined: fixed-size chunking shifts every boundary when
  * one byte is inserted, so near-identical documents share no chunks;
  * hash-gated boundaries re-synchronise immediately after an edit,
  * which is what makes chunk-level dedup work (the FastCDC/LBFS
  * family). Expected chunk length ≈ `mod` codepoints.
  *
  * Hash definition (shared verbatim with the DuckDB oracle, which
  * recomputes it windowed with explicit 31^k literals):
  * H(i) = Σ_{k=0..w−1} cp(i−k)·31^k over the window ending at 0-based
  * position i; boundary AFTER i whenever H(i) % mod == 0, evaluated at
  * every i ≥ w−1. All arithmetic is exact in Long (cp ≤ 0x10FFFF, so
  * H < 0x110000·31^8 < 2^63 at w ≤ 8 — enforced). Texts shorter than
  * `w` yield one chunk. The evaluator keeps H rolling (O(n) per doc,
  * one subtract-shift-add per step), which is the whole point vs the
  * O(w·n) windowed recompute: this is a native expression so the scan
  * stays inside whole-stage codegen's pipeline with no UDF
  * serialization boundary.
  */
case class CdcSplit(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def foldInt(e: Expression) = e.foldable && e.dataType == IntegerType
    if (!first.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"cdc_split requires STRING, got ${first.dataType.simpleString}")
    else if (!foldInt(second) || !foldInt(third))
      TypeCheckResult.TypeCheckFailure(
        "cdc_split w and mod must be foldable INTs")
    else {
      val wv = second.eval(InternalRow.empty)
      val mv = third.eval(InternalRow.empty)
      if (wv == null || mv == null) TypeCheckResult.TypeCheckFailure(
        "cdc_split w and mod must be non-null")
      else if (wv.asInstanceOf[Int] < 1 || wv.asInstanceOf[Int] > 8)
        TypeCheckResult.TypeCheckFailure("cdc_split w must be in [1, 8]")
      else if (mv.asInstanceOf[Int] < 2)
        TypeCheckResult.TypeCheckFailure("cdc_split mod must be >= 2")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_split"

  private lazy val w: Int = second.eval(InternalRow.empty).asInstanceOf[Int]
  private lazy val mod: Long = third.eval(InternalRow.empty).asInstanceOf[Int].toLong
  // 31^w for the rolling subtract of the outgoing codepoint
  private lazy val powW: Long = { var p = 1L; var k = 0; while (k < w) { p *= 31L; k += 1 }; p }

  /** Shared by eval and codegen (called per row from generated code). */
  def split(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    if (n < w) { out += s }
    else {
      // cps in char-offset space for O(1) substring cuts
      val cps = new Array[Int](n) // codepoints
      val off = new Array[Int](n + 1) // char offset of codepoint i
      var ci = 0; var i = 0
      while (i < n) {
        off(i) = ci
        val cp = str.codePointAt(ci)
        cps(i) = cp
        ci += Character.charCount(cp)
        i += 1
      }
      off(n) = str.length
      var h = 0L
      i = 0
      // H(i) = Σ_{k=0..w−1} cps(i−k)·31^k (newest at 31^0), rolled as
      // H(i) = (H(i−1) − cps(i−w)·31^(w−1))·31 + cps(i); the warm-up
      // H(i) = 31·H(i−1) + cps(i) realises the same polynomial on the
      // growing prefix. Max magnitude < 0x10FFFF·31^8/30 ≈ 3·10^16,
      // exact in Long.
      var start = 0 // codepoint index where the current chunk starts
      while (i < n) {
        h = if (i < w) h * 31L + cps(i)
            else (h - cps(i - w) * (powW / 31L)) * 31L + cps(i)
        if (i >= w - 1 && h % mod == 0L && i + 1 > start) {
          out += UTF8String.fromString(str.substring(off(start), off(i + 1)))
          start = i + 1
        }
        i += 1
      }
      if (start < n)
        out += UTF8String.fromString(str.substring(off(start), off(n)))
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(s: Any, wv: Any, mv: Any): Any =
    split(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcSplit", this, classOf[CdcSplit].getName)
    nullSafeCodeGen(ctx, ev, (s, _, _) => s"${ev.value} = $ref.split($s);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CdcSplit =
    copy(first = f, second = s, third = t)
}
