package graft

import graft.ops.Multimodal

class MultimodalSpec extends GraftSuite {

  test("media table carries binary payloads with declared types") {
    val rows = Multimodal.mediaTable(spark, sf).collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getAs[Array[Byte]]("media").nonEmpty))
    assert(rows.map(_.getAs[String]("media_type")).toSet ==
      Set("image/png", "audio/wav", "video/mp4"))
  }

  test("decode stub: total bytes equals sum of document n_chars (ASCII)") {
    import org.apache.spark.sql.functions.sum
    val total = Multimodal.decode(spark, sf)
      .agg(sum("total_bytes")).first().getLong(0)
    val chars = Tables.documents(spark, sf)
      .agg(sum("n_chars")).first().getLong(0)
    assert(total == chars)
  }

  test("feature histogram: bins sum to total payload bytes") {
    import org.apache.spark.sql.functions.{col, sum}
    val rows = Multimodal.features(spark, sf)
    assert(rows.count() == 3 * 16) // 3 media types x 16 bins, even empty
    val histTotal = rows.agg(sum(col("n"))).first().getLong(0)
    val byteTotal = Multimodal.meta(spark, sf)
      .agg(sum(col("total_bytes"))).first().getLong(0)
    assert(histTotal == byteTotal)
  }

  test("frame sampling keeps every 4th frame only") {
    import org.apache.spark.sql.functions.sum
    val sampled = Multimodal.frameSample(spark, sf)
      .agg(sum("n_sampled_frames")).first().getLong(0)
    // every doc has ceil(nb/64) frames; sampled = ceil(frames/4) per doc
    val expected = Multimodal.mediaTable(spark, sf)
      .selectExpr("cast(ceil(ceil(length(media) / 64.0) / 4.0) as long) as k")
      .agg(sum("k")).first().getLong(0)
    assert(sampled == expected)
  }
}
