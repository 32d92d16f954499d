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

  test("sharded input: a glob of shard files reads as one corpus in file order") {
    // the 100 TB input shape — a dump split into self-contained shard
    // files (each with its own declaration + root), read via the
    // textFile glob. Each shard's depth profile is self-closing, so
    // the cross-partition prefix sum needs no per-file special case;
    // record numbering follows file order (lexicographic) then offset.
    val dir = Files.createTempDirectory("xmlshards")
    def writeShard(name: String, from: Int, until: Int): Unit = {
      val sb = new StringBuilder("<?xml version=\"1.0\"?>\n<dblp>\n")
      (from until until).foreach { i =>
        sb.append(s"""<article key="k/$i">\n<title>t $i</title>\n</article>\n""")
      }
      sb.append("</dblp>\n")
      Files.write(dir.resolve(name), sb.toString.getBytes("UTF-8"))
    }
    writeShard("shard-00.xml", 0, 70)
    writeShard("shard-01.xml", 70, 150)
    writeShard("shard-02.xml", 150, 200)
    val records = XmlRecords.read(spark, s"$dir/shard-*.xml", dtd, minPartitions = 8)
      .collect()
    assert(records.length == 200)
    val sorted = records.sortBy(_.pos).map(_.attrs("key")).toSeq
    assert(sorted == (0 until 200).map(i => s"k/$i"))
  }

  test("sharded input: layout=record reads the same corpus per-file") {
    val dir = Files.createTempDirectory("xmlshards_rec")
    def writeShard(name: String, from: Int, until: Int): Unit = {
      val sb = new StringBuilder("<?xml version=\"1.0\"?>\n<dblp>\n")
      (from until until).foreach { i =>
        sb.append(s"""<article key="k/$i"><title>t $i</title></article>\n""")
      }
      sb.append("</dblp>\n")
      Files.write(dir.resolve(name), sb.toString.getBytes("UTF-8"))
    }
    writeShard("s0.xml", 0, 40)
    writeShard("s1.xml", 40, 100)
    val records = XmlRecords.readRows(spark, s"$dir/s*.xml", dtd, layout = "record")
      .collect()
    assert(records.length == 100)
    // pos embeds (file ordinal << 40 | in-file ordinal): sorted pos
    // order == file order then document order
    val keys = records.sortBy(_.getLong(1))
      .map(_.getMap[String, String](2).get("key").orNull).toSeq
    assert(keys == (0 until 100).map(i => s"k/$i"))
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
    // it would land in record "a"'s chunk; the depth-aware layout scan
    // now rejects it up front (it used to surface later as a
    // trailing-content parse failure)
    Files.write(f, ("<dblp>\n<article key=\"a\">\n<title>t</title>\n" +
      "</article><article key=\"b\"><title>u</title></article>\n</dblp>\n").getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      XmlRecords.readRows(spark, f.toString, dtd).collect()
    }
    assert(e.getMessage.contains("layout violation"))
    // ...and layout="auto" reads the same file correctly instead
    val recs = XmlRecords.readRows(spark, f.toString, dtd, layout = "auto").collect()
    assert(recs.length == 2)
  }

  test("mid-line NESTED vocabulary tags (inline markup) do not trip the line splitter") {
    val f = Files.createTempFile("xmlinline", ".xml")
    // author/title open mid-line at depth 2 — like DBLP's <i> inside a
    // title; only depth-1 mid-line starts are record boundaries, so
    // line mode must keep handling this without falling back
    Files.write(f, ("<dblp>\n<article key=\"a\">\n" +
      "<author>A0</author><title>t0</title>\n</article>\n</dblp>\n").getBytes("UTF-8"))
    val recs = XmlRecords.read(spark, f.toString, dtd).collect()
    assert(recs.length == 1)
    assert(recs(0).children.map(_.tag).sorted.toSeq == Seq("author", "title"))
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

  test("strict mode validates content models: ordering, cardinality, EMPTY, mixed, #REQUIRED") {
    val vdtd = Dtd.parseString(
      """<!ELEMENT dblp (article|note|mark)*>
        |<!ELEMENT article (author, title, year?)>
        |<!ELEMENT author (#PCDATA)>
        |<!ELEMENT title (#PCDATA|em)*>
        |<!ELEMENT em (#PCDATA)>
        |<!ELEMENT year (#PCDATA)>
        |<!ELEMENT note EMPTY>
        |<!ELEMENT mark (#PCDATA)>
        |<!ATTLIST article key CDATA #REQUIRED>
        |""".stripMargin)
    def run(body: String): Long = {
      val f = Files.createTempFile("xmlcm", ".xml")
      Files.write(f, s"<dblp>\n$body\n</dblp>\n".getBytes("UTF-8"))
      XmlRecords.readRows(spark, f.toString, vdtd, validate = true).count()
    }
    def fails(body: String, needle: String): Unit = {
      val e = intercept[org.apache.spark.SparkException] { run(body) }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains(needle), s"wanted '$needle' in: $msg")
    }
    // in-order with optional year, mixed-content title with <em>, EMPTY note
    assert(run("<article key=\"a\">\n<author>A</author>\n" +
      "<title>t <em>x</em> u</title>\n<year>2020</year>\n</article>\n<note/>") == 2)
    // order violated: title before author
    fails("<article key=\"a\">\n<title>t</title>\n<author>A</author>\n</article>",
      "do not match its content model")
    // cardinality violated: year appears twice (year?)
    fails("<article key=\"a\">\n<author>A</author>\n<title>t</title>\n" +
      "<year>1</year>\n<year>2</year>\n</article>", "do not match its content model")
    // EMPTY element with text
    fails("<note>boom</note>", "declared EMPTY but has content")
    // non-whitespace text in element content
    fails("<article key=\"a\">\n<author>A</author>\nstray text\n<title>t</title>\n</article>",
      "contains text")
    // #REQUIRED attribute missing
    fails("<article>\n<author>A</author>\n<title>t</title>\n</article>",
      "required attribute 'key'")
    // non-strict mode accepts all of them (well-formed XML)
    val f = Files.createTempFile("xmlcm2", ".xml")
    Files.write(f, ("<dblp>\n<article>\n<title>t</title>\n<author>A</author>\n" +
      "</article>\n<note>boom</note>\n</dblp>\n").getBytes("UTF-8"))
    assert(XmlRecords.readRows(spark, f.toString, vdtd).count() == 2)
    // permissive + validate skips only the invalid records
    val g = Files.createTempFile("xmlcm3", ".xml")
    Files.write(g, ("<dblp>\n<article key=\"ok\">\n<author>A</author>\n<title>t</title>\n" +
      "</article>\n<note>boom</note>\n</dblp>\n").getBytes("UTF-8"))
    assert(XmlRecords.readRows(spark, g.toString, vdtd,
      permissive = true, validate = true).count() == 1)
  }

  test("strict mode validates enumerated and #FIXED attribute values") {
    val vdtd = Dtd.parseString(
      """<!ELEMENT dblp (article)*>
        |<!ELEMENT article (#PCDATA)>
        |<!ATTLIST article kind (journal|conf) #IMPLIED version CDATA #FIXED "1" note CDATA #IMPLIED>
        |""".stripMargin)
    assert(vdtd.enumAttrs("article")("kind") == Set("journal", "conf"))
    assert(vdtd.fixedAttrs("article")("version") == "1")
    def run(body: String): Long = {
      val f = Files.createTempFile("xmlenum", ".xml")
      Files.write(f, s"<dblp>\n$body\n</dblp>\n".getBytes("UTF-8"))
      XmlRecords.readRows(spark, f.toString, vdtd, validate = true).count()
    }
    assert(run("<article kind=\"conf\" version=\"1\">t</article>") == 1)
    val e1 = intercept[org.apache.spark.SparkException] {
      run("<article kind=\"blog\">t</article>")
    }
    assert((e1.getMessage + Option(e1.getCause).map(_.getMessage).getOrElse(""))
      .contains("outside its enumeration"))
    val e2 = intercept[org.apache.spark.SparkException] {
      run("<article version=\"2\">t</article>")
    }
    assert((e2.getMessage + Option(e2.getCause).map(_.getMessage).getOrElse(""))
      .contains("#FIXED"))
  }

  test("oversized boundary fragment fails fast with the layout=record remediation") {
    val f = Files.createTempFile("xmlbig", ".xml")
    val bigText = "x" * 5000
    Files.write(f, (s"""<dblp>\n<article key="a"><title>$bigText</title></article>\n""" +
      "</dblp>\n").getBytes("UTF-8"))
    spark.conf.set("spark.graft.xml.maxBoundaryFragmentBytes", "1024")
    try {
      val e = intercept[org.apache.spark.SparkException] {
        XmlRecords.readRows(spark, f.toString, dtd).collect()
      }
      assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
        .contains("layout=\"record\""))
      // the remediation actually works: the record path reads the file
      assert(XmlRecords.readRows(spark, f.toString, dtd, layout = "record").count() == 1)
    } finally spark.conf.unset("spark.graft.xml.maxBoundaryFragmentBytes")
  }

  test("DTD parameter entities (%name;) expand into content models — dblp.dtd shape") {
    // shaped like the real dblp.dtd: the field list is a parameter
    // entity spliced into each record element's content model
    val vdtd = Dtd.parseString(
      """<!ENTITY % field "author|editor|title|year">
        |<!ENTITY % nested "%field;|note">
        |<!ELEMENT dblp (article|book)*>
        |<!ELEMENT article (%field;)*>
        |<!ELEMENT book (%nested;)*>
        |<!ELEMENT author (#PCDATA)>
        |<!ELEMENT editor (#PCDATA)>
        |<!ELEMENT title (#PCDATA)>
        |<!ELEMENT year (#PCDATA)>
        |<!ELEMENT note (#PCDATA)>
        |<!ENTITY uuml "&#252;">
        |""".stripMargin)
    // parameter entities do NOT leak into the general-entity map
    assert(!vdtd.entities.contains("field") && !vdtd.entities.contains("%"))
    assert(vdtd.entities("uuml") == "&#252;")
    // content model compiled from the expanded field list
    assert(vdtd.contentModels("article") == "(author|editor|title|year)*")
    assert(vdtd.contentModels("book") == "(author|editor|title|year|note)*")

    def run(body: String): Long = {
      val f = Files.createTempFile("xmlpe", ".xml")
      Files.write(f, s"<dblp>\n$body\n</dblp>\n".getBytes("UTF-8"))
      XmlRecords.readRows(spark, f.toString, vdtd, validate = true).count()
    }
    // a real-shaped record passes strict content-model validation
    assert(run("<article>\n<author>A</author>\n<title>t</title>\n" +
      "<year>2020</year>\n</article>") == 1)
    // note is valid inside book (via the nested parameter entity)…
    assert(run("<book>\n<title>t</title>\n<note>n</note>\n</book>") == 1)
    // …but not inside article
    val e = intercept[org.apache.spark.SparkException] {
      run("<article>\n<note>n</note>\n</article>")
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("do not match its content model"))
  }

  test("recursive general-entity expansion reaches a fixpoint; cycles fail loudly") {
    // `reg` references `tm` which is declared LATER — lxml resolves at
    // reference time, so declaration order must not matter; and the
    // chain must expand transitively (reg -> tm -> the literal).
    val d = Dtd.parseString(
      """<!ELEMENT dblp (article)*>
        |<!ELEMENT article (#PCDATA)>
        |<!ENTITY reg "x&tm;y">
        |<!ENTITY tm "&#8482;">
        |<!ENTITY deep "[&reg;]">
        |<!ENTITY amped "a &amp; b">
        |""".stripMargin)
    assert(d.entities("reg") == "x&#8482;y")
    assert(d.entities("deep") == "[x&#8482;y]")
    // built-ins stay unexpanded for the XML parser; no infinite loop
    assert(d.entities("amped") == "a &amp; b")
    // the runtime single pass is exact because the map is pre-expanded
    assert(d.expandEntities("A &deep; B") == "A [x&#8482;y] B")
    // a reference cycle is a well-formedness error — loud, not garbage
    val e = intercept[IllegalArgumentException] {
      Dtd.parseString(
        """<!ELEMENT dblp (article)*>
          |<!ELEMENT article (#PCDATA)>
          |<!ENTITY a "x&b;">
          |<!ENTITY b "y&a;">
          |""".stripMargin)
    }
    assert(e.getMessage.contains("recursive entity"))
  }

  test("DTD conditional sections: INCLUDE splices, IGNORE drops (nested-safe)") {
    val d = Dtd.parseString(
      """<!ELEMENT dblp (article)*>
        |<![INCLUDE[
        |  <!ELEMENT article (author|note)*>
        |  <!ELEMENT author (#PCDATA)>
        |]]>
        |<![IGNORE[
        |  <!ELEMENT ghost (#PCDATA)>
        |  <![INCLUDE[ <!ELEMENT nestedGhost (#PCDATA)> ]]>
        |  <!ENTITY ghostly "boo">
        |]]>
        |<!ELEMENT note (#PCDATA)>
        |""".stripMargin)
    assert(d.contentModels("article") == "(author|note)*")
    assert(d.elements == Set("dblp", "article", "author", "note"))
    assert(!d.contentModels.contains("ghost") && !d.contentModels.contains("nestedGhost"))
    assert(!d.entities.contains("ghostly"))
    // unterminated section is a parse error, not silent truncation
    val e = intercept[IllegalArgumentException] {
      Dtd.parseString("<!ELEMENT dblp (a)*>\n<![IGNORE[ <!ELEMENT a (#PCDATA)>")
    }
    assert(e.getMessage.contains("unterminated conditional section"))
  }

  test("conditional-section keyword via parameter entity drives strict validation") {
    // the XML 1.0 §3.4 draft/final idiom: complementary sections, one
    // active, selected by flipping two parameter entities
    def dtdText(draft: String, fin: String) =
      s"""<!ENTITY % draft "$draft">
         |<!ENTITY % final "$fin">
         |<!ELEMENT dblp (article)*>
         |<![%draft;[ <!ELEMENT article (author|note)*> ]]>
         |<![%final;[ <!ELEMENT article (author)*> ]]>
         |<!ELEMENT author (#PCDATA)>
         |<!ELEMENT note (#PCDATA)>
         |""".stripMargin
    val draftD = Dtd.parseString(dtdText("INCLUDE", "IGNORE"))
    val finalD = Dtd.parseString(dtdText("IGNORE", "INCLUDE"))
    assert(draftD.contentModels("article") == "(author|note)*")
    assert(finalD.contentModels("article") == "(author)*")
    def run(d: graft.xml.Dtd, body: String): Long = {
      val f = Files.createTempFile("xmlcond", ".xml")
      Files.write(f, s"<dblp>\n$body\n</dblp>\n".getBytes("UTF-8"))
      XmlRecords.readRows(spark, f.toString, d, validate = true).count()
    }
    // the draft DTD accepts <note>; the final DTD rejects the same doc
    assert(run(draftD, "<article>\n<note>n</note>\n</article>") == 1)
    val e = intercept[org.apache.spark.SparkException] {
      run(finalD, "<article>\n<note>n</note>\n</article>")
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("do not match its content model"))
    assert(run(finalD, "<article>\n<author>A</author>\n</article>") == 1)
  }

  test("first entity declaration is binding (XML 1.0 §4.2) for both kinds") {
    val d = Dtd.parseString(
      """<!ENTITY % extra "|note">
        |<!ENTITY % extra "|ghost">
        |<!ELEMENT dblp (article)*>
        |<!ELEMENT article (author%extra;)*>
        |<!ELEMENT author (#PCDATA)>
        |<!ELEMENT note (#PCDATA)>
        |<!ENTITY tm "&#8482;">
        |<!ENTITY tm "SECOND">
        |""".stripMargin)
    assert(d.contentModels("article") == "(author|note)*")
    assert(d.entities("tm") == "&#8482;")
  }

  test("DTD comments neither contribute declarations nor get %refs; expanded") {
    val d = Dtd.parseString(
      """<!ENTITY % field "author|title">
        |<!-- commented out: <!ELEMENT ghost (#PCDATA)>
        |     and a reference that must stay inert: (%field;)* -->
        |<!ELEMENT dblp (article)*>
        |<!ELEMENT article (%field;)*>
        |<!ELEMENT author (#PCDATA)>
        |<!ELEMENT title (#PCDATA)>
        |<!-- <!ENTITY fake "nope"> -->
        |<!ENTITY real "yes">
        |""".stripMargin)
    assert(!d.contentModels.contains("ghost"))
    assert(d.contentModels("article") == "(author|title)*")
    assert(!d.entities.contains("fake"))
    assert(d.entities("real") == "yes")
    assert(d.root == "dblp")
  }

  test("strict validation works through layout=record (single-pass path)") {
    val vdtd = Dtd.parseString(
      """<!ENTITY % field "author|title">
        |<!ELEMENT dblp (article)*>
        |<!ELEMENT article (%field;)*>
        |<!ELEMENT author (#PCDATA)>
        |<!ELEMENT title (#PCDATA)>
        |<!ELEMENT note (#PCDATA)>
        |<!ATTLIST article key CDATA #REQUIRED>
        |""".stripMargin)
    def run(body: String, validate: Boolean): Long = {
      val f = Files.createTempFile("xmlrecval", ".xml")
      // one line: out of the line splitter's contract, so layout=record
      Files.write(f, s"<dblp>$body</dblp>".getBytes("UTF-8"))
      XmlRecords.readRows(spark, f.toString, vdtd, layout = "record",
        validate = validate).count()
    }
    assert(run("""<article key="a"><author>A</author><title>t</title></article>""",
      validate = true) == 1)
    // content-model violation (note not in %field;) passes non-strict,
    // fails strict — through the single-pass reader
    val bad = """<article key="a"><note>n</note></article>"""
    assert(run(bad, validate = false) == 1)
    val e = intercept[org.apache.spark.SparkException] { run(bad, validate = true) }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("do not match its content model"))
    // missing #REQUIRED attribute also rejected on this path
    assertThrows[org.apache.spark.SparkException] {
      run("""<article><author>A</author></article>""", validate = true)
    }
  }

  test("layout=record parses tags spanning lines (out of the line splitter's contract)") {
    val f = Files.createTempFile("xmlrec3", ".xml")
    Files.write(f, ("<dblp>\n<article key=\"a\"\n>\n<title>t</title>\n</article>\n</dblp>\n")
      .getBytes("UTF-8"))
    val recs = XmlRecords.readRowsSinglePass(spark, f.toString, dtd).collect()
    assert(recs.length == 1)
    assert(recs(0).getMap[String, String](2)("key") == "a")
  }

  test("single-pass reader matches the line splitter on an arbitrary re-layout") {
    // same 200 records, line-formatted vs mangled onto ONE line
    val linePath = writeXml(200)
    val text = new String(Files.readAllBytes(java.nio.file.Paths.get(linePath)), "UTF-8")
    val mangled = Files.createTempFile("xmlmangled", ".xml")
    Files.write(mangled, text.replace("\n", "").getBytes("UTF-8"))

    def canon(rs: Array[XmlRecord]) =
      rs.sortBy(_.pos).map(r => (r.recordType, r.attrs, r.children.toList)).toSeq

    val fromLines = XmlRecords.read(spark, linePath, dtd, minPartitions = 8).collect()
    val fromStream = XmlRecords.readRowsSinglePass(spark, mangled.toString, dtd)
      .as[XmlRecord](org.apache.spark.sql.Encoders.product[XmlRecord]).collect()
    assert(canon(fromStream) == canon(fromLines))

    // auto mode picks the right path for each physical layout
    val autoLines = XmlRecords.readRows(spark, linePath, dtd, layout = "auto").count()
    val autoMangled = XmlRecords.readRows(spark, mangled.toString, dtd, layout = "auto").count()
    assert(autoLines == 200 && autoMangled == 200)
  }

  test("single-pass reader is layout-invariant under randomized whitespace (property)") {
    val linePath = writeXml(60)
    val text = new String(Files.readAllBytes(java.nio.file.Paths.get(linePath)), "UTF-8")
    val expected = XmlRecords.read(spark, linePath, dtd).collect()
      .sortBy(_.pos).map(r => (r.recordType, r.attrs, r.children.toList)).toSeq
    // every '\n' in the generated file sits between '>' and '<'
    // (inter-element whitespace), so re-layout is semantics-preserving
    Seq(11L, 42L, 99L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val mangled = text.flatMap {
        case '\n' => Seq("", " ", "\n", "\n\n", "   ")(rnd.nextInt(5))
        case c => c.toString
      }
      val f = Files.createTempFile(s"xmlprop$seed", ".xml")
      Files.write(f, mangled.getBytes("UTF-8"))
      val got = XmlRecords.readRowsSinglePass(spark, f.toString, dtd)
        .as[XmlRecord](org.apache.spark.sql.Encoders.product[XmlRecord]).collect()
        .sortBy(_.pos).map(r => (r.recordType, r.attrs, r.children.toList)).toSeq
      assert(got == expected, s"seed $seed diverged")
    }
  }

  test("record chunker handles comments, CDATA, PIs, DOCTYPE subsets, '>' in attributes") {
    val f = Files.createTempFile("xmlhairy", ".xml")
    Files.write(f, ("<?xml version=\"1.0\"?><!DOCTYPE dblp [<!ENTITY y \"&#121;\">]>" +
      "<!-- top <article> comment --><dblp><?pi data?><article key=\"a>b\" ><!-- inner --> " +
      "<title>x&gt; <![CDATA[raw <tag> & stuff]]]> ok</title><author>A</author></article>" +
      "<article key=\"c\"/></dblp>").getBytes("UTF-8"))
    val recs = XmlRecords.readRowsSinglePass(spark, f.toString, dtd)
      .as[XmlRecord](org.apache.spark.sql.Encoders.product[XmlRecord]).collect().sortBy(_.pos)
    assert(recs.length == 2)
    assert(recs(0).attrs("key") == "a>b")
    val title = recs(0).children.find(_.tag == "title").get.text
    // IS_COALESCING merges CDATA + text; "]]]>" inside CDATA ends at the
    // real "]]>" terminator after "stuff]"
    assert(title == "x> raw <tag> & stuff] ok")
    assert(recs(1).attrs("key") == "c" && recs(1).children.isEmpty)
  }
}
