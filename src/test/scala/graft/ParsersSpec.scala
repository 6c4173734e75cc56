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

  test("GAF-style TSV parses to annotation edges, negated rows dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gaf")
    val f = dir.resolve("annotations.gaf")
    def row(db: String, id: String, qual: String, go: String, ref: String,
        ev: String, aspect: String, taxon: String): String =
      Seq(db, id, "SYM", qual, go, ref, ev, "", aspect,
        "name", "", "protein", taxon, "20240101", "UniProt", "", "")
        .mkString("\t")
    java.nio.file.Files.writeString(f,
      "!gaf-version: 2.2\n" +
      row("UniProtKB", "P12345", "enables", "GO:0003674",
        "PMID:111|PMID:222", "IDA", "F", "taxon:9606") + "\n" +
      row("UniProtKB", "Q99999", "NOT|enables", "GO:0005575",
        "PMID:333", "IEA", "C", "taxon:10090") + "\n" +
      row("MGI", "MGI:88059", "located_in", "GO:0005634",
        "PMID:444", "IBA", "C", "taxon:10090") + "\n")
    val edges = graft.ops.Gaf.readEdges(spark, dir.toString).collect()
    assert(edges.length == 2) // NOT| row dropped
    val e0 = edges.find(_.getString(0) == "UniProtKB:P12345").get
    assert(e0.getString(1) == "biolink:enables")
    assert(e0.getString(2) == "GO:0003674")
    assert(e0.getAs[scala.collection.Seq[String]]("publications").toSeq ==
      Seq("PMID:111", "PMID:222"))
    assert(e0.getAs[String]("taxon") == "9606")
    val e1 = edges.find(_.getString(0) == "MGI:MGI:88059").get
    assert(e1.getString(1) == "biolink:located_in")
  }

  test("OBO stanzas parse to term nodes and is_a/relationship edges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_obo")
    val f = dir.resolve("mini.obo")
    java.nio.file.Files.writeString(f,
      """format-version: 1.2
        |ontology: go
        |
        |[Term]
        |id: GO:0000001
        |name: mitochondrion inheritance
        |namespace: biological_process
        |is_a: GO:0048308 ! organelle inheritance
        |is_a: GO:0048311 ! mitochondrion distribution
        |relationship: part_of GO:0007005 ! mitochondrion organization
        |
        |[Term]
        |id: GO:0000002
        |name: obsolete thing
        |is_obsolete: true
        |is_a: GO:0048308
        |
        |[Typedef]
        |id: part_of
        |name: part of
        |""".stripMargin)
    val terms = graft.ops.Obo.readTerms(spark, dir.toString).collect()
    assert(terms.length == 2) // Typedef stanza excluded
    val t = terms.find(_.getString(0) == "GO:0000001").get
    assert(t.getString(1) == "mitochondrion inheritance")
    assert(t.getString(2) == "biological_process")
    assert(!t.getBoolean(3))
    assert(terms.find(_.getString(0) == "GO:0000002").get.getBoolean(3))
    val edges = graft.ops.Obo.readEdges(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // obsolete term contributes no edges
    assert(edges == Set(
      ("GO:0000001", "biolink:subclass_of", "GO:0048308"),
      ("GO:0000001", "biolink:subclass_of", "GO:0048311"),
      ("GO:0000001", "part_of", "GO:0007005")))
  }

  test("record-per-element XML parses splittably to records and KGX nodes") {
    import graft.ops.Xml
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_xml")
    java.nio.file.Files.writeString(dir.resolve("drugs.xml"),
      """<?xml version="1.0" encoding="UTF-8"?>
        |<drugbank xmlns="http://www.drugbank.ca">
        |  <drug type="small molecule" created="2005-06-13">
        |    <drugbank-id primary="true">DB00001</drugbank-id>
        |    <name>Lepirudin &amp; Co</name>
        |    <synonym>Hirudin variant-1</synonym>
        |    <synonym>Lepirudina</synonym>
        |  </drug>
        |  <drug type="biotech">
        |    <drugbank-id primary="true">DB00002</drugbank-id>
        |    <name>Cetuximab</name>
        |  </drug>
        |</drugbank>
        |""".stripMargin)
    val recs = Xml.records(spark, dir.toString, "drug")
    assert(recs.count() == 2) // prolog/wrapper/epilogue fragments shed
    val first = recs
      .select(Xml.attribute(col("attrs"), "type").as("t"),
        Xml.unescape(Xml.element(col("body"), "name")).as("nm"),
        Xml.elements(col("body"), "synonym").as("syn"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[scala.collection.Seq[String]](2).toSeq)).toSet
    assert(first == Set(
      ("small molecule", "Lepirudin & Co",
        Seq("Hirudin variant-1", "Lepirudina")),
      ("biotech", "Cetuximab", Seq.empty)))
    val nodes = Xml.readNodes(spark, dir.toString, "drug",
        "drugbank-id", "name", "biolink:Drug").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(nodes == Set(
      ("DB00001", "Lepirudin & Co", "biolink:Drug"),
      ("DB00002", "Cetuximab", "biolink:Drug")))
  }

  test("XML unescape decodes entities innermost-first") {
    import graft.ops.Xml
    import org.apache.spark.sql.functions.lit
    val got = spark.range(1)
      .select(Xml.unescape(lit("&amp;lt; &lt;b&gt; &quot;x&apos;s&quot; &amp;")).as("v"))
      .head().getString(0)
    assert(got == "&lt; <b> \"x's\" &")
  }

  test("SQL-dump INSERT statements parse to typed rows") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_sqldump")
    java.nio.file.Files.writeString(dir.resolve("dump.sql"),
      """-- MySQL dump
        |CREATE TABLE drug (id INT, name TEXT, moa TEXT, score DOUBLE);
        |INSERT INTO drug VALUES (1, 'aspirin', 'COX inhibitor, irreversible', 0.9);
        |INSERT INTO `drug` VALUES (2, 'warfarin''s salt', NULL, 0.5);
        |INSERT INTO other VALUES (9, 'ignored');
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("moa", StringType), StructField("score", DoubleType)))
    val rows = graft.ops.SqlDump
      .readInserts(spark, dir.toString, "drug", schema)
      .collect().sortBy(_.getInt(0))
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "aspirin")
    assert(rows(0).getString(2) == "COX inhibitor, irreversible",
      "comma inside a string literal must not split")
    assert(rows(0).getDouble(3) == 0.9)
    assert(rows(1).getString(1) == "warfarin's salt",
      "doubled '' unescapes to a single quote")
    assert(rows(1).isNullAt(2), "bare NULL parses to null")
  }

  test("node-norm service responses parse to a mapping table with failures") {
    val body =
      """{"MESH:D014867": {"id": {"identifier": "CHEBI:15377", "label": "water"},
        |  "equivalent_identifiers": [{"identifier": "MESH:D014867"},
        |                             {"identifier": "CHEBI:15377", "label": "water"}],
        |  "type": ["biolink:SmallMolecule", "biolink:ChemicalEntity"]},
        | "FAKE:123": null}""".stripMargin.replace("\n", " ")
    val df = Seq(body).toDF("resp")
    val parsed = graft.ops.NodeNorm.parseResponses(df, "resp").collect()
    assert(parsed.length == 2)
    val ok = parsed.find(_.getString(0) == "MESH:D014867").get
    assert(ok.getString(1) == "CHEBI:15377")
    assert(ok.getString(2) == "water")
    assert(ok.getAs[scala.collection.Seq[String]]("categories").toSeq ==
      Seq("biolink:SmallMolecule", "biolink:ChemicalEntity"))
    assert(ok.getAs[scala.collection.Seq[String]]("equivalent_ids").toSeq ==
      Seq("MESH:D014867", "CHEBI:15377"))
    val fail = parsed.find(_.getString(0) == "FAKE:123").get
    assert(fail.isNullAt(1), "failed normalization keeps NULL canonical id")
    val mapping = graft.ops.NodeNorm.mappingTable(df, "resp").collect()
    assert(mapping.length == 1 && mapping.head.getString(0) == "MESH:D014867")
    // malformed body surfaces as a NULL-raw_id marker row, not silence
    val broken = graft.ops.NodeNorm
      .parseResponses(Seq("{truncated...").toDF("resp"), "resp").collect()
    assert(broken.length == 1 && broken.head.isNullAt(0))
  }

  test("SourceSpec: declarative specs drive TSV+CSV sources to merged KGX") {
    import graft.ops.{EdgeRule, NodeRule, Pipeline, SourceSpec}
    val dir = java.nio.file.Files.createTempDirectory("graft_specsrc")
    // source 1: headerless interactions TSV (schema pinned by the spec)
    java.nio.file.Files.writeString(dir.resolve("interactions.tsv"),
      "P1\tP2\tbinds\n" +
      "P1\tP3\tbinds\n" +
      "P2\tP3\tregulates\n" +   // unmapped predicate → raw:regulates
      "P2\tP3\tbinds\n" +       // duplicate endpoint pair, new predicate
      "P4\t\tbinds\n")          // null object → edge dropped, node kept
    val interactions = SourceSpec(
      name = "interactions",
      format = "tsv",
      columns = Seq("a", "b", "typ"),
      nodes = Seq(
        NodeRule(idCol = "a", idPrefix = "PROT:", category = "biolink:Protein"),
        NodeRule(idCol = "b", idPrefix = "PROT:", category = "biolink:Protein")),
      edges = Seq(EdgeRule(
        subjectCol = "a", subjectPrefix = "PROT:",
        objectCol = "b", objectPrefix = "PROT:",
        predicateCol = Some("typ"),
        predicateMap = Map("binds" -> "biolink:directly_physically_interacts_with"))))
    // source 2: headered terms CSV with a row filter; P3 overlaps source 1
    java.nio.file.Files.writeString(dir.resolve("terms.csv"),
      "term_id,label,obsolete\n" +
      "T1,alpha term,false\n" +
      "T2,dead term,true\n" +
      "P3,shared protein,false\n")
    val terms = SourceSpec(
      name = "terms",
      format = "csv",
      options = Map("header" -> "true"),
      nodes = Seq(NodeRule(idCol = "term_id", idPrefix = "PROT:",
        category = "biolink:NamedThing", nameCol = Some("label"),
        filter = Some("obsolete <> 'true'"),
        props = Map("obs" -> "obsolete"))))
    // rule-level results
    val (n1, e1) = SourceSpec.load(spark,
      interactions, dir.resolve("interactions.tsv").toString)
    assert(n1.collect().map(_.getString(0)).toSet ==
      Set("PROT:P1", "PROT:P2", "PROT:P3", "PROT:P4"))
    val e1rows = e1.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(e1rows == Set(
      ("PROT:P1", "biolink:directly_physically_interacts_with", "PROT:P2"),
      ("PROT:P1", "biolink:directly_physically_interacts_with", "PROT:P3"),
      ("PROT:P2", "biolink:directly_physically_interacts_with", "PROT:P3"),
      ("PROT:P2", "raw:regulates", "PROT:P3")))
    val (n2, _) = SourceSpec.load(spark,
      terms, dir.resolve("terms.csv").toString)
    assert(n2.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("PROT:T1", "alpha term"), ("PROT:P3", "shared protein")),
      "obsolete row filtered out; names from nameCol")
    // end-to-end: both specs through the spec-driven pipeline
    val out = dir.resolve("kgx").toString
    val ledger = Pipeline.pipelineFromSpecs(spark, Seq(
        interactions -> dir.resolve("interactions.tsv").toString,
        terms -> dir.resolve("terms.csv").toString),
      out).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    graft.ops.ScratchCache.releaseAll()
    assert(ledger("parsed_nodes") == 6L) // 4 interaction + 2 term nodes
    assert(ledger("merged_nodes") == 5L) // PROT:P3 merged across sources
    assert(ledger("merged_multi_source_nodes") == 1L)
    assert(ledger("parsed_edges") == 4L)
    assert(ledger("merged_edges") == 4L)
    // the merged node carries both categories, sorted
    val nodeLines = java.nio.file.Files.list(
        java.nio.file.Paths.get(out, "nodes")).toArray
      .map(_.toString).filter(_.endsWith(".txt"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)
    val p3 = nodeLines.find(_.contains("PROT:P3")).get
    assert(p3.contains("biolink:NamedThing,biolink:Protein"))
    // the terms source's property bag survives the merge; prop-less
    // sources contribute nothing to props_set
    assert(p3.contains("""{\"obs\":\"false\"}"""),
      s"merged node should carry the terms-source props: $p3")
    val p1 = nodeLines.find(_.contains("PROT:P1")).get
    assert(p1.contains("\"props_set\":[]"))
    assert(nodeLines.length == 5)
  }

  test("shipped example specs parse and load end-to-end") {
    import graft.ops.SourceSpec
    // the files under examples/specs are USER-FACING docs — this guard
    // keeps them in sync with the parser as the spec schema evolves
    // resolved against the working directory — sbt runs tests from the
    // repo root, so the guard works on any checkout location
    val gd = SourceSpec.fromJsonFile(
      "examples/specs/gene_disease.spec.json")
    assert(gd.name == "gene_disease" && gd.format == "tsv" &&
      gd.nodes.size == 2 && gd.edges.size == 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_exspec")
    java.nio.file.Files.writeString(dir.resolve("gd.tsv"),
      "G1\tD1\t0.9\nG2\tD1\t0.2\n")
    val (nodes, edges) = SourceSpec.load(spark, gd,
      dir.resolve("gd.tsv").toString)
    // nodes: NCBIGene:G1, NCBIGene:G2, MONDO:D1; the 0.2 edge filtered
    assert(nodes.count() == 3 && edges.count() == 1)
    val cust = SourceSpec.fromJsonFile(
      "examples/specs/customers.spec.json")
    assert(cust.format == "parquet" && cust.nodes.size == 2 &&
      cust.edges.head.predicate == "biolink:located_in")
  }

  test("SourceSpec.fromJson: a config file IS the parser") {
    import graft.ops.SourceSpec
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonspec")
    java.nio.file.Files.writeString(dir.resolve("gd.tsv"),
      "G1\tD1\t0.9\n" +
      "G2\tD1\t0.2\n" + // below the filter threshold → edge dropped
      "G2\tD2\t0.7\n")
    java.nio.file.Files.writeString(dir.resolve("gd.spec.json"),
      """{"name": "genedisease", "format": "tsv",
        |  "columns": ["gene", "disease", "score"],
        |  "nodes": [
        |    {"idCol": "gene", "idPrefix": "NCBIGene:",
        |     "category": "biolink:Gene"},
        |    {"idCol": "disease", "idPrefix": "MONDO:",
        |     "category": "biolink:Disease"}],
        |  "edges": [
        |    {"subjectCol": "gene", "subjectPrefix": "NCBIGene:",
        |     "objectCol": "disease", "objectPrefix": "MONDO:",
        |     "predicate": "biolink:gene_associated_with_condition",
        |     "filter": "cast(score as double) > 0.5",
        |     "props": {"assoc_score": "score", "src_gene": "gene"}}],
        |  "future_key_specs_must_ignore": true}""".stripMargin)
    val spec = SourceSpec.fromJsonFile(dir.resolve("gd.spec.json").toString)
    assert(spec.name == "genedisease" && spec.nodes.size == 2)
    val (nodes, edges) = SourceSpec.load(spark, spec,
      dir.resolve("gd.tsv").toString)
    assert(nodes.collect().map(_.getString(0)).toSet ==
      Set("NCBIGene:G1", "NCBIGene:G2", "MONDO:D1", "MONDO:D2"))
    assert(edges.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet ==
      Set(
        ("NCBIGene:G1", "biolink:gene_associated_with_condition", "MONDO:D1"),
        ("NCBIGene:G2", "biolink:gene_associated_with_condition", "MONDO:D2")))
    // declared props ride along as a deterministic JSON bag (sorted
    // keys, independent of spec authoring order); undeclared → {}
    val eProps = edges.collect()
      .map(r => r.getString(0) -> r.getAs[String]("props")).toMap
    assert(eProps("NCBIGene:G1") ==
      """{"assoc_score":"0.9","src_gene":"G1"}""")
    assert(nodes.select("props").collect().map(_.getString(0)).toSet ==
      Set("{}"))
  }

  test("SourceSpec: gzipped TSVs read transparently; config typos name the rule") {
    import graft.ops.{NodeRule, SourceSpec}
    val dir = java.nio.file.Files.createTempDirectory("graft_gzspec")
    // the reference's sources arrive as .gz archives; Spark's csv
    // reader decompresses by extension with no spec change
    val gz = dir.resolve("genes.tsv.gz")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(gz))
    out.write("G1\talpha\nG2\tbeta\n".getBytes("UTF-8")); out.close()
    val spec = SourceSpec(name = "genes", format = "tsv",
      columns = Seq("gid", "sym"),
      nodes = Seq(NodeRule(idCol = "gid", idPrefix = "NCBIGene:",
        category = "biolink:Gene", nameCol = Some("sym"))))
    val (nodes, _) = SourceSpec.load(spark, spec, gz.toString)
    assert(nodes.collect().map(r => (r.getString(0), r.getString(1)))
      .toSet == Set(("NCBIGene:G1", "alpha"), ("NCBIGene:G2", "beta")))
    // a typo'd column fails fast with spec, rule, and column named
    val typo = spec.copy(nodes = Seq(NodeRule(idCol = "gene_id",
      idPrefix = "NCBIGene:", category = "biolink:Gene")))
    val e = intercept[IllegalArgumentException] {
      SourceSpec.load(spark, typo, gz.toString)
    }
    assert(e.getMessage.contains("'genes' nodes[0]"))
    assert(e.getMessage.contains("'gene_id'"))
    assert(e.getMessage.contains("gid, sym"))
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
