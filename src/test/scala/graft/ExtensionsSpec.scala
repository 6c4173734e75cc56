package graft

import org.apache.spark.sql.functions._
import graft.plans.CollapseRedundantCase

class ExtensionsSpec extends GraftSuite {
  import spark.implicits._

  test("CollapseRedundantCase rewrites stacked case conversions") {
    val df = Tables.customer(spark, sf)
      .select(upper(upper(lower(col("c_name")))).as("u"))
    val before = df.queryExecution.analyzed
    val after = CollapseRedundantCase(before)
    def uppers(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = {
      var n = 0
      p.transformAllExpressions {
        case e: org.apache.spark.sql.catalyst.expressions.Upper => n += 1; e
      }
      n
    }
    assert(uppers(before) == 2)
    assert(uppers(after) == 1)
  }

  test("CollapseRedundantCase leaves mixed-case stacks alone (Unicode)") {
    // lower(upper('ß')) = "ss" ≠ lower('ß') = 'ß': the mixed collapse
    // would be semantically unsound, so the rule must not fire on it
    val df = Seq("straße", "ı").toDF("s")
      .select(lower(upper(col("s"))).as("v"))
    val before = df.queryExecution.analyzed
    val after = CollapseRedundantCase(before)
    assert(after == before, "mixed-case stack must be preserved")
    val got = df.collect().map(_.getString(0)).toSet
    assert(got.contains("strasse"), s"Unicode semantics changed: $got")
  }

  test("rule is injectable at runtime and preserves results") {
    val df = Tables.customer(spark, sf)
      .select(upper(upper(col("c_name"))).as("u")).orderBy(col("u"))
    val plain = df.collect().map(_.getString(0)).toSeq
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ CollapseRedundantCase
    try {
      val optimized = df.collect().map(_.getString(0)).toSeq
      assert(plain == optimized)
      val opt = df.queryExecution.optimizedPlan.toString
      assert(!opt.contains("upper(upper("), s"not collapsed:\n$opt")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == CollapseRedundantCase)
    }
  }

  test("shingles Generator emits word n-grams from SQL") {
    graft.plans.GraftExtensions.registerFunctions(spark)
    Seq((1L, "Alpha beta GAMMA delta")).toDF("id", "text")
      .createOrReplaceTempView("sh_docs")
    val rows = spark.sql("SELECT id, shingles(text, 3) AS s FROM sh_docs")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq(
      (1L, "alpha beta gamma"), (1L, "beta gamma delta")))
    // the Generator and the explode+window formulation must agree on
    // the full real corpus
    Tables.documents(spark, sf).createOrReplaceTempView("documents_sh")
    val genSet = spark.sql(
      "SELECT shingles(text, 5) AS ng FROM documents_sh")
      .collect().map(_.getString(0)).toSet
    val windowSet = graft.ops.TextOps
      .shingles5(Tables.documents(spark, sf))
      .select("ng").collect().map(_.getString(0)).toSet
    assert(genSet == windowSet)
    // short docs yield no rows; an invalid size fails analysis
    assert(spark.sql("SELECT shingles('a b', 3)").count() == 0)
    intercept[Exception] {
      spark.sql("SELECT shingles('a b c', 0)").collect()
    }
  }

  test("wrong arity raises AnalysisException, not IndexOutOfBounds") {
    graft.plans.GraftExtensions.registerFunctions(spark)
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT shingles('a b c d e')").collect()
    }
    assert(ex.getMessage.contains("shingles"))
    assert(ex.getMessage.contains("2"), "expected arity named in the error")
    val ex2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim(array(1.0d, 2.0d))").collect()
    }
    assert(ex2.getMessage.contains("cosine_sim"))
    val ex3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT count_min_est(1, 2, 3)").collect()
    }
    assert(ex3.getMessage.contains("count_min_est"))
  }

  test("XML ingest: write and read back with the built-in xml source") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xml").toString
    Tables.nation(spark, sf)
      .write.mode("overwrite").format("xml")
      .option("rowTag", "nation").save(dir)
    val back = spark.read.format("xml").option("rowTag", "nation").load(dir)
    assert(back.count() == 25)
    assert(back.columns.toSet == Set("n_nationkey", "n_name", "n_regionkey"))
  }
}
