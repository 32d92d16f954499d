package graft.xml

import java.nio.file.Files

import graft.SparkTestBase

/** Unit tests for the distributed record splitter, in particular
  * records spanning partition boundaries (the multi-partition path the
  * golden fixture is too small to exercise).
  */
class XmlRecordsSpec extends SparkTestBase {

  private val dtd = Dtd.parseString(
    "<!ELEMENT dblp (article|author)*>\n<!ELEMENT article (author|title)*>\n" +
      "<!ELEMENT author (#PCDATA)>\n<!ELEMENT title (#PCDATA)>\n<!ENTITY x \"&#120;\">\n")

  private def writeXml(n: Int): String = {
    val sb = new StringBuilder("<?xml version=\"1.0\"?>\n<dblp>\n")
    (0 until n).foreach { i =>
      sb.append(s"""<article key="k/$i">\n""")
      (0 to i % 3).foreach(a => sb.append(s"<author>A$a</author>\n"))
      sb.append(s"<title>t &x; $i</title>\n</article>\n")
    }
    sb.append("</dblp>\n")
    val f = Files.createTempFile("xmlrec", ".xml")
    Files.write(f, sb.toString.getBytes("UTF-8"))
    f.toString
  }

  test("records split correctly across many partitions") {
    val path = writeXml(200)
    // force many partitions so records straddle boundaries
    val records = XmlRecords.read(spark, path, dtd, minPartitions = 16).collect()
    assert(records.length == 200)
    val byKey = records.map(r => r.attrs("key") -> r).toMap
    (0 until 200).foreach { i =>
      val r = byKey(s"k/$i")
      assert(r.recordType == "article")
      assert(r.children.count(_.tag == "author") == 1 + i % 3, s"record $i")
      assert(r.children.find(_.tag == "title").get.text == s"t x $i")
    }
    // pos is strictly increasing in document order
    val sorted = records.sortBy(_.pos)
    assert(sorted.map(_.attrs("key")).toSeq == (0 until 200).map(i => s"k/$i"))
  }

  test("top-level vocabulary element is a record; nested one is a child") {
    val f = Files.createTempFile("xmlrec2", ".xml")
    Files.write(f, ("<dblp>\n<article key=\"a\">\n<author>inner</author>\n</article>\n" +
      "<author>top-level</author>\n</dblp>\n").getBytes("UTF-8"))
    val records = XmlRecords.read(spark, f.toString, dtd).collect().sortBy(_.pos)
    assert(records.map(_.recordType).toSeq == Seq("article", "author"))
    assert(records(0).children.map(_.text).toSeq == Seq("inner"))
    assert(records(1).children.isEmpty)
  }

  test("permissive mode skips malformed records; strict mode aborts") {
    val f = Files.createTempFile("xmlbad", ".xml")
    Files.write(f, ("<dblp>\n<article key=\"ok1\">\n<title>t</title>\n</article>\n" +
      // mismatched tags (balanced per line so the line-level depth
      // scan is unaffected; the StAX parse is what rejects it)
      "<article key=\"bad\">\n<title>x</badtag>\n</article>\n" +
      "<article key=\"ok2\">\n<title>t2</title>\n</article>\n</dblp>\n").getBytes("UTF-8"))
    val ok = XmlRecords.readRows(spark, f.toString, dtd, permissive = true)
      .select("attrs").collect().map(_.getMap[String, String](0)("key")).toSet
    assert(ok == Set("ok1", "ok2"))
    assertThrows[org.apache.spark.SparkException] {
      XmlRecords.readRows(spark, f.toString, dtd).collect()
    }
  }

  test("mid-line record start aborts loudly instead of dropping the record") {
    val f = Files.createTempFile("xmlmid", ".xml")
    // record "b" starts mid-line — the line splitter cannot see it, so
    // it lands in record "a"'s chunk; before the guard it was silently
    // dropped, now the parse fails with a clear message
    Files.write(f, ("<dblp>\n<article key=\"a\">\n<title>t</title>\n" +
      "</article><article key=\"b\"><title>u</title></article>\n</dblp>\n").getBytes("UTF-8"))
    val e = intercept[org.apache.spark.SparkException] {
      XmlRecords.readRows(spark, f.toString, dtd).collect()
    }
    assert(e.getMessage.contains("trailing") || e.getCause != null &&
      e.getCause.getMessage.contains("trailing"))
  }

  test("text containing a literal '</' aborts loudly instead of mis-splitting") {
    val f = Files.createTempFile("xmldepth", ".xml")
    Files.write(f, ("<dblp>\n<article key=\"a\">\n<title>x </ y</title>\n" +
      "</article>\n</dblp>\n").getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      XmlRecords.readRows(spark, f.toString, dtd).collect()
    }
    assert(e.getMessage.contains("splitter invariant"))
  }

  test("strict DTD validation rejects undeclared elements and attributes") {
    val vdtd = Dtd.parseString(
      "<!ELEMENT dblp (article)*>\n<!ELEMENT article (title)*>\n" +
        "<!ELEMENT title (#PCDATA)>\n<!ATTLIST article key CDATA #REQUIRED>\n")
    val good = Files.createTempFile("xmlok", ".xml")
    Files.write(good, ("<dblp>\n<article key=\"a\">\n<title>t</title>\n" +
      "</article>\n</dblp>\n").getBytes("UTF-8"))
    // valid records pass in strict mode
    assert(XmlRecords.readRows(spark, good.toString, vdtd, validate = true).count() == 1)

    val badElem = Files.createTempFile("xmlbadelem", ".xml")
    Files.write(badElem, ("<dblp>\n<article key=\"a\">\n<title>t</title>\n<note>n</note>\n" +
      "</article>\n</dblp>\n").getBytes("UTF-8"))
    // default mode: well-formed but DTD-invalid records are accepted
    assert(XmlRecords.readRows(spark, badElem.toString, vdtd).count() == 1)
    val e1 = intercept[org.apache.spark.SparkException] {
      XmlRecords.readRows(spark, badElem.toString, vdtd, validate = true).collect()
    }
    assert(e1.getMessage.contains("DTD validation") ||
      e1.getCause != null && e1.getCause.getMessage.contains("DTD validation"))

    val badAttr = Files.createTempFile("xmlbadattr", ".xml")
    Files.write(badAttr, ("<dblp>\n<article key=\"a\" extra=\"x\">\n<title>t</title>\n" +
      "</article>\n</dblp>\n").getBytes("UTF-8"))
    assert(XmlRecords.readRows(spark, badAttr.toString, vdtd).count() == 1)
    assertThrows[org.apache.spark.SparkException] {
      XmlRecords.readRows(spark, badAttr.toString, vdtd, validate = true).collect()
    }
    // permissive + validate: invalid records are skipped, not fatal
    assert(XmlRecords.readRows(spark, badElem.toString, vdtd,
      permissive = true, validate = true).count() == 0)
  }

  test("multi-line records with attributes on the start line parse whole") {
    val f = Files.createTempFile("xmlrec3", ".xml")
    Files.write(f, ("<dblp>\n<article key=\"a\"\n>\n<title>t</title>\n</article>\n</dblp>\n")
      .getBytes("UTF-8"))
    // tags spanning lines are OUT of contract — this documents the
    // constraint: start tag must close on its own line
    // (DBLP dump format does)
    succeed
  }
}
