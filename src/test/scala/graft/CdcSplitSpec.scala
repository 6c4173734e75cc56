package graft

import org.apache.spark.sql.functions.{col, expr}
import graft.ops.TextOps

class CdcSplitSpec extends GraftSuite {
  import spark.implicits._

  private def split(texts: Seq[String], w: Int = 8, mod: Int = 64): Seq[Seq[String]] = {
    graft.plans.GraftExtensions.registerFunctions(spark)
    texts.toDF("text")
      .select(expr(s"cdc_split(text, $w, $mod)").as("chunks"))
      .collect().map(_.getSeq[String](0)).toSeq
  }

  /** Brute-force windowed recompute of the boundary rule. */
  private def bruteChunks(s: String, w: Int, mod: Int): Seq[String] = {
    val cps = s.toCharArray.map(_.toLong) // fixtures are BMP/ASCII
    val n = cps.length
    if (n < w) return Seq(s)
    val cuts = (w - 1 until n).filter { i =>
      val h = (0 until w).map(k => cps(i - k) * math.pow(31.0, k.toDouble).toLong).sum
      h % mod == 0
    }.map(_ + 1)
    val all = (0 +: cuts) :+ n
    val uniq = all.distinct.sorted
    uniq.sliding(2).map { case Seq(a, b) => s.substring(a, b) }.toSeq
      .filter(_.nonEmpty)
  }

  test("cdc_split: rolling evaluator equals brute-force windowed recompute") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and keeps going for a while",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", // uniform content
      "key agg row scan slow fast table value part hash value",
      "short", // below window size
      "exactly8") // == window size
    val got = split(texts)
    texts.zip(got).foreach { case (t, chunks) =>
      assert(chunks == bruteChunks(t, 8, 64), s"text: $t")
      assert(chunks.mkString("") == t, "chunks must concatenate to the input")
    }
  }

  test("cdc_split: boundaries re-synchronise after a point edit") {
    // CDC's reason to exist: a prefix edit must not shift every
    // boundary — chunks far from the edit stay identical
    val base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega ") * 4
    val edited = "X" + base
    val Seq(a, b) = split(Seq(base, edited))
    val shared = a.toSet.intersect(b.toSet)
    assert(shared.nonEmpty,
      s"no shared chunks after edit: a=${a.take(3)} b=${b.take(3)}")
    // the tail of both chunk streams must agree exactly
    assert(a.last == b.last)
  }

  test("chunk dedup ledger: duplicated docs collapse to shared fingerprints") {
    val docs = Seq(
      (1L, "s1", ("lorem ipsum dolor sit amet consectetur adipiscing elit " * 3)),
      (2L, "s1", ("lorem ipsum dolor sit amet consectetur adipiscing elit " * 3)),
      (3L, "s2", "completely different content here that shares nothing at all"))
      .toDF("doc_id", "source", "text")
    val out = TextOps.chunkDedupOn(docs).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_chunks"), r.getAs[Long]("n_uniq_chunks")))).toMap
    // the second identical doc adds chunks but ZERO new fingerprints:
    // distinct over both docs == distinct within one
    val oneDoc = split(Seq("lorem ipsum dolor sit amet consectetur adipiscing elit " * 3)).head
    val (nd, nc, nu) = out("s1")
    assert(nd == 2L && nc == 2L * oneDoc.length &&
      nu == oneDoc.distinct.length.toLong,
      s"identical docs must add no new fingerprints: $out, one=$oneDoc")
    assert(out("s2")._1 == 1L)
  }
}
