package graft.xml

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** Golden end-to-end test of the XML -> CSV pipeline on the mini
  * fixture (FIXTURES.md §1). Expected outputs hand-derived from the
  * reference semantics (/root/reference/XMLToCSV.py) — the reference
  * itself is not runnable here (no lxml), so these bytes were worked
  * out operator by operator and reviewed against SURVEY.md §1-§2.
  */
class XmlToCsvSpec extends SparkTestBase {

  private def read(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  private lazy val outDir = Files.createTempDirectory("xmltocsv").toString

  private lazy val result = XmlToCsv.run(spark, XmlToCsv.Config(
    xmlFile = "src/test/resources/mini.xml",
    dtdFile = "src/test/resources/mini.dtd",
    outputFile = s"$outDir/out.csv",
    annotate = true,
    neo4j = true,
    relations = Seq("author" -> "authored_by", "cite" -> "has_citation")))

  test("strict --validate e2e produces byte-identical goldens (content models via %field;)") {
    result // force the non-validated golden run first
    val vDir = Files.createTempDirectory("xmltocsv_strict").toString
    XmlToCsv.run(spark, XmlToCsv.Config(
      xmlFile = "src/test/resources/mini.xml",
      dtdFile = "src/test/resources/mini.dtd",
      outputFile = s"$vDir/out.csv",
      annotate = true, neo4j = true, validate = true,
      relations = Seq("author" -> "authored_by", "cite" -> "has_citation")))
    Seq("out_article.csv", "out_book.csv", "out_phdthesis.csv",
      "out_article_header.csv", "out_book_header.csv", "out_phdthesis_header.csv",
      "out_author.csv", "out_author_authored_by.csv",
      "out_cite.csv", "out_cite_has_citation.csv")
      .foreach { f => assert(read(s"$vDir/$f") == read(s"$outDir/$f"), f) }
  }

  test("sharded glob input produces byte-identical output to the single file") {
    result // force the single-file golden run first
    // split the fixture at a record boundary into two self-contained
    // shard files (each with its own prolog + root), run over the glob
    val full = read("src/test/resources/mini.xml").split("\n").toSeq
    val splitAt = full.indexWhere(_.startsWith("<book")) // boundary between records
    val prolog = Seq("<?xml version=\"1.0\" encoding=\"UTF-8\"?>",
      "<!DOCTYPE dblp SYSTEM \"mini.dtd\">", "<dblp>")
    val shardDir = Files.createTempDirectory("xmlshard_e2e")
    Files.write(shardDir.resolve("shard-00.xml"),
      (full.take(splitAt) :+ "</dblp>").mkString("\n").getBytes("UTF-8"))
    Files.write(shardDir.resolve("shard-01.xml"),
      (prolog ++ full.drop(splitAt)).mkString("\n").getBytes("UTF-8"))
    val gDir = Files.createTempDirectory("xmltocsv_glob").toString
    XmlToCsv.run(spark, XmlToCsv.Config(
      xmlFile = s"$shardDir/shard-*.xml",
      dtdFile = "src/test/resources/mini.dtd",
      outputFile = s"$gDir/out.csv",
      annotate = true, neo4j = true,
      relations = Seq("author" -> "authored_by", "cite" -> "has_citation")))
    Seq("out_article.csv", "out_book.csv", "out_phdthesis.csv",
      "out_article_header.csv", "out_book_header.csv", "out_phdthesis_header.csv",
      "out_author.csv", "out_author_authored_by.csv",
      "out_cite.csv", "out_cite_has_citation.csv")
      .foreach { f => assert(read(s"$gDir/$f") == read(s"$outDir/$f"), f) }
  }

  test("schema inference: per-type sorted columns, empty types dropped") {
    result // force
    assert(result.schema.keySet == Set("article", "book", "phdthesis"))
    assert(result.schema("article") == Seq("author", "author-orcid", "cite", "key",
      "mdate", "note", "note-type", "pages", "publtype", "title", "year"))
    assert(result.schema("book") == Seq("key", "note", "title"))
    // textless child with attributes contributes nothing (XMLToCSV.py:130,190)
    assert(result.schema("phdthesis") == Seq("key"))
  }

  test("article CSV: ids, multi-value collapse, quoting, entity expansion") {
    result
    assert(read(s"$outDir/out_article.csv") ==
      "0;Ann|Ann|Bob;0000-1;;a/K1;2020-01-01;;;;;\"On X; a \"\"study\"\" of über\";2020\n" +
      "1;;;a/K1;a/K2;;true;x;-7;informal;;20.5\n")
  }

  test("book and phdthesis CSVs: per-type fan-out, global id continuation") {
    result
    assert(read(s"$outDir/out_book.csv") == "2;b/B1;2020-01-02;T\n")
    assert(read(s"$outDir/out_phdthesis.csv") == "3;p/P1\n")
    // www record is empty: no file, no id consumed
    assert(!Files.exists(Paths.get(s"$outDir/out_www.csv")))
  }

  test("annotated neo4j headers: type lattice incl. negative/float/date quirks") {
    result
    assert(read(s"$outDir/out_article_header.csv") ==
      "article:ID;author:string[];author-orcid:string;cite:string;key:string;" +
        "mdate:date;note:boolean;note-type:string;pages:string;publtype:string;" +
        "title:string;year:float")
    assert(read(s"$outDir/out_book_header.csv") == "book:ID;key:string;note:date;title:string")
    assert(read(s"$outDir/out_phdthesis_header.csv") == "phdthesis:ID;key:string")
  }

  test("relation node/edge files: surrogate ids continue after records") {
    result
    assert(read(s"$outDir/out_author.csv") == ":ID;author:string\n4;Ann\n5;Bob\n")
    assert(read(s"$outDir/out_author_authored_by.csv") == ":START_ID;:END_ID\n0;4\n0;5\n")
    assert(read(s"$outDir/out_cite.csv") == ":ID;cite:string\n6;a/K1\n")
    assert(read(s"$outDir/out_cite_has_citation.csv") == ":START_ID;:END_ID\n1;6\n")
  }

  test("neo4j import script") {
    result
    val sh = read(s"$outDir/neo4j_import.sh")
    assert(sh.startsWith("#!/bin/bash\nneo4j-admin import --mode=csv --database=dblp.db " +
      "--delimiter \";\" --array-delimiter \"|\" --id-type INTEGER"))
    assert(sh.contains(s""" --nodes:article "$outDir/out_article_header.csv,$outDir/out_article.csv""""))
    assert(sh.contains(s""" --nodes:author "$outDir/out_author.csv""""))
    assert(sh.contains(s""" --relationships:authored_by "$outDir/out_author_authored_by.csv""""))
  }

  test("reserved column name id is rejected") {
    val badXml = Files.createTempFile("bad", ".xml")
    val badDtd = Files.createTempFile("bad", ".dtd")
    Files.write(badDtd, "<!ELEMENT dblp (article)*>\n<!ELEMENT article (id)*>\n<!ELEMENT id (#PCDATA)>\n".getBytes)
    Files.write(badXml, "<dblp>\n<article>\n<id>7</id>\n</article>\n</dblp>\n".getBytes)
    assertThrows[Flatten.InvalidElementName] {
      XmlToCsv.run(spark, XmlToCsv.Config(badXml.toString, badDtd.toString,
        s"$outDir/bad.csv"))
    }
  }

  test("plain (non-annotate) run writes header rows") {
    val plainDir = Files.createTempDirectory("xmltocsvplain").toString
    XmlToCsv.run(spark, XmlToCsv.Config(
      "src/test/resources/mini.xml", "src/test/resources/mini.dtd",
      s"$plainDir/out.csv"))
    val book = read(s"$plainDir/out_book.csv")
    assert(book == "id;key;note;title\n2;b/B1;2020-01-02;T\n")
  }
}
