package graft

import graft.ops.Mitab
import graft.plans.GraftExtensions

class ParsersSpec extends GraftSuite {
  import spark.implicits._

  test("MITAB-style TSV parses to typed interaction edges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mitab")
    val f = dir.resolve("interactions.txt")
    java.nio.file.Files.writeString(f,
      "#id_a\tid_b\talt_a\talt_b\taliases_a\taliases_b\n" +
      "uniprotkb:P12345|intact:EBI-1\tuniprotkb:Q99999\t-\t-\tgene:abc|gene:abc2\tgene:xyz\n" +
      "chebi:15365\tncbigene:1017\t-\t-\t-\t-\n")
    val edges = Mitab.readEdges(spark, dir.toString).collect()
    assert(edges.length == 2)
    val e0 = edges.find(_.getString(0) == "uniprotkb:P12345").get
    assert(e0.getString(1) == "uniprotkb:Q99999")
    assert(e0.getString(2) == "uniprotkb")
    assert(e0.getAs[scala.collection.Seq[String]]("subject_aliases").toSeq ==
      Seq("gene:abc", "gene:abc2"))
    val e1 = edges.find(_.getString(0) == "chebi:15365").get
    assert(e1.getString(3) == "ncbigene")
  }

  test("geo_mean DeclarativeAggregate matches exp(avg(ln(x)))") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "geo_mean",
      exprs => graft.functions.GeoMean(exprs.head).toAggregateExpression(),
      "built-in")
    val got = Tables.lineitem(spark, sf)
      .selectExpr("geo_mean(l_quantity) AS g").first().getDouble(0)
    val expected = Tables.lineitem(spark, sf)
      .selectExpr("exp(avg(ln(l_quantity))) AS g").first().getDouble(0)
    assert(math.abs(got - expected) < 1e-9, s"$got vs $expected")
    // nulls / non-positives ignored
    val withJunk = Seq(Some(2.0), Some(8.0), None, Some(-1.0), Some(0.0))
      .toDF("x").selectExpr("geo_mean(x) AS g").first().getDouble(0)
    assert(math.abs(withJunk - 4.0) < 1e-12) // sqrt(2*8)
  }
}
