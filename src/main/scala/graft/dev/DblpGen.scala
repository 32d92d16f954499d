package graft.dev

import java.nio.file.{Files, Path}
import scala.collection.mutable
import scala.util.Random

/** Deterministic generator of a faithful DBLP-shaped corpus plus its
  * generation-side ground truth.
  *
  * The reference's headline workload is the real multi-GB dblp.xml
  * (/root/reference/README.md:1-10, parse at XMLToCSV.py:108-203).
  * That dump cannot be vendored here, so this generator reproduces its
  * *shape* from public knowledge of dblp.xml / dblp.dtd:
  *
  *  - the real record-type mix (article/inproceedings/proceedings/
  *    book/incollection/phdthesis/mastersthesis/www, person+data
  *    declared but rare), line-formatted exactly like the dump;
  *  - the real DTD structure: one `%field;` parameter entity feeding
  *    every record element's content model, per-type ATTLISTs
  *    (key #REQUIRED), mixed-content title markup (sub/sup/i/tt), and
  *    the Latin-1 named-entity block declared as numeric refs;
  *  - realistic entity density: accented author names, schools and
  *    affiliations written as `&uuml;`-style references;
  *  - title markup quirks at realistic rates, including lxml's
  *    `.text` truncation semantics (text after a markup child is lost,
  *    the markup tag becomes a spurious column — what the reference
  *    actually does on real titles, XMLToCSV.py:190-198).
  *
  * Because the generator composes each record from a structured model,
  * it can compute the byte-exact expected output of the reference
  * semantics WITHOUT parsing XML — an independent oracle for the
  * engine's full pipeline ([[graft.xml.XmlToCsv]]), asserted in
  * `DblpEndToEndSpec` and measured at volume by [[DblpSmoke]].
  */
object DblpGen {

  // ---------------------------------------------------------------
  // record model
  // ---------------------------------------------------------------

  /** Mixed-content node: raw XML text (may contain entity refs) plus
    * its entity-expanded form.
    */
  sealed trait Node
  final case class Txt(raw: String, expanded: String) extends Node
  final case class Mark(tag: String, kids: Seq[Node]) extends Node

  final case class Field(tag: String, attrs: Seq[(String, String)], kids: Seq[Node])

  final case class Rec(rtype: String, attrs: Seq[(String, String)], fields: Seq[Field]) {

    /** Pass-2 capture events in document order, per the reference's
      * iterparse loop (XMLToCSV.py:190-198): every descendant element
      * whose lxml `.text` is non-None contributes (tag -> text) and,
      * only then, (tag-attr -> value) for each of its attributes.
      */
    def cells: Seq[(String, String)] = {
      val out = mutable.ArrayBuffer.empty[(String, String)]
      def walk(tag: String, attrs: Seq[(String, String)], kids: Seq[Node]): Unit = {
        val leading = kids.takeWhile(_.isInstanceOf[Txt])
          .map(_.asInstanceOf[Txt].expanded).mkString
        if (leading.nonEmpty) {
          out += tag -> leading
          attrs.foreach { case (k, v) => out += s"$tag-$k" -> v }
        }
        kids.foreach { case Mark(t, ks) => walk(t, Nil, ks); case _ => }
      }
      fields.foreach(f => walk(f.tag, f.attrs, f.kids))
      out.toSeq
    }

    def xml: String = {
      val sb = new StringBuilder
      sb.append('<').append(rtype)
      attrs.foreach { case (k, v) => sb.append(' ').append(k).append("=\"").append(v).append('"') }
      sb.append(">\n")
      def render(n: Node): String = n match {
        case Txt(raw, _) => raw
        case Mark(t, ks) => s"<$t>${ks.map(render).mkString}</$t>"
      }
      fields.foreach { f =>
        sb.append('<').append(f.tag)
        f.attrs.foreach { case (k, v) => sb.append(' ').append(k).append("=\"").append(v).append('"') }
        sb.append('>').append(f.kids.map(render).mkString).append("</").append(f.tag).append(">\n")
      }
      sb.append("</").append(rtype).append(">")
      sb.toString
    }
  }

  // ---------------------------------------------------------------
  // the DTD (faithful to the public dblp.dtd's structure)
  // ---------------------------------------------------------------

  private val recordTypes = Seq("article", "inproceedings", "proceedings", "book",
    "incollection", "phdthesis", "mastersthesis", "www", "person", "data")

  private val latin1Entities: Seq[(String, Int)] = {
    val upper = Seq("Agrave", "Aacute", "Acirc", "Atilde", "Auml", "Aring", "AElig",
      "Ccedil", "Egrave", "Eacute", "Ecirc", "Euml", "Igrave", "Iacute", "Icirc",
      "Iuml", "ETH", "Ntilde", "Ograve", "Oacute", "Ocirc", "Otilde", "Ouml")
    val upper2 = Seq("Oslash", "Ugrave", "Uacute", "Ucirc", "Uuml", "Yacute", "THORN", "szlig")
    val lower = Seq("agrave", "aacute", "acirc", "atilde", "auml", "aring", "aelig",
      "ccedil", "egrave", "eacute", "ecirc", "euml", "igrave", "iacute", "icirc",
      "iuml", "eth", "ntilde", "ograve", "oacute", "ocirc", "otilde", "ouml")
    val lower2 = Seq("oslash", "ugrave", "uacute", "ucirc", "uuml", "yacute", "thorn", "yuml")
    (upper.zipWithIndex.map { case (n, i) => n -> (192 + i) }) ++
      (upper2.zipWithIndex.map { case (n, i) => n -> (216 + i) }) ++
      (lower.zipWithIndex.map { case (n, i) => n -> (224 + i) }) ++
      (lower2.zipWithIndex.map { case (n, i) => n -> (248 + i) }) ++
      Seq("reg" -> 174, "micro" -> 181, "times" -> 215)
  }

  val dtdText: String = {
    val sb = new StringBuilder
    sb.append("<!ELEMENT dblp (").append(recordTypes.mkString("|")).append(")*>\n\n")
    sb.append("<!ENTITY % field \"author|editor|title|booktitle|pages|year|address|" +
      "journal|volume|number|month|url|ee|cdrom|cite|publisher|note|crossref|isbn|" +
      "series|school|chapter|publnr|stream|rel\">\n\n")
    recordTypes.foreach { t => sb.append(s"<!ELEMENT $t (%field;)*>\n") }
    sb.append('\n')
    recordTypes.foreach { t =>
      sb.append(s"""<!ATTLIST $t
                   |          key      CDATA #REQUIRED
                   |          mdate    CDATA #IMPLIED
                   |          publtype CDATA #IMPLIED
                   |          reviewid CDATA #IMPLIED
                   |          rating   CDATA #IMPLIED
                   |          cdate    CDATA #IMPLIED>
                   |""".stripMargin)
    }
    sb.append(
      """
        |<!ELEMENT author (#PCDATA)>
        |<!ATTLIST author aux CDATA #IMPLIED bibtex CDATA #IMPLIED orcid CDATA #IMPLIED label CDATA #IMPLIED type CDATA #IMPLIED>
        |<!ELEMENT editor (#PCDATA)>
        |<!ATTLIST editor aux CDATA #IMPLIED orcid CDATA #IMPLIED>
        |<!ELEMENT title (#PCDATA|sub|sup|i|tt|ref)*>
        |<!ATTLIST title aux CDATA #IMPLIED bibtex CDATA #IMPLIED>
        |<!ELEMENT booktitle (#PCDATA|sub|sup|i|tt|ref)*>
        |<!ATTLIST booktitle aux CDATA #IMPLIED>
        |<!ELEMENT pages (#PCDATA)>
        |<!ATTLIST pages aux CDATA #IMPLIED>
        |<!ELEMENT year (#PCDATA)>
        |<!ATTLIST year aux CDATA #IMPLIED>
        |<!ELEMENT address (#PCDATA)>
        |<!ELEMENT journal (#PCDATA)>
        |<!ATTLIST journal aux CDATA #IMPLIED>
        |<!ELEMENT volume (#PCDATA)>
        |<!ATTLIST volume aux CDATA #IMPLIED>
        |<!ELEMENT number (#PCDATA)>
        |<!ELEMENT month (#PCDATA)>
        |<!ELEMENT url (#PCDATA)>
        |<!ATTLIST url aux CDATA #IMPLIED type CDATA #IMPLIED>
        |<!ELEMENT ee (#PCDATA)>
        |<!ATTLIST ee aux CDATA #IMPLIED type CDATA #IMPLIED>
        |<!ELEMENT cdrom (#PCDATA)>
        |<!ELEMENT cite (#PCDATA)>
        |<!ATTLIST cite aux CDATA #IMPLIED label CDATA #IMPLIED>
        |<!ELEMENT publisher (#PCDATA)>
        |<!ATTLIST publisher href CDATA #IMPLIED>
        |<!ELEMENT note (#PCDATA)>
        |<!ATTLIST note aux CDATA #IMPLIED type CDATA #IMPLIED label CDATA #IMPLIED>
        |<!ELEMENT crossref (#PCDATA)>
        |<!ELEMENT isbn (#PCDATA)>
        |<!ATTLIST isbn type CDATA #IMPLIED>
        |<!ELEMENT series (#PCDATA)>
        |<!ATTLIST series href CDATA #IMPLIED>
        |<!ELEMENT school (#PCDATA)>
        |<!ELEMENT chapter (#PCDATA)>
        |<!ELEMENT publnr (#PCDATA)>
        |<!ELEMENT stream (#PCDATA)>
        |<!ELEMENT rel (#PCDATA)>
        |<!ATTLIST rel type CDATA #IMPLIED label CDATA #IMPLIED sort CDATA #IMPLIED>
        |<!ELEMENT sub (#PCDATA|sub|sup|i|tt|ref)*>
        |<!ELEMENT sup (#PCDATA|sub|sup|i|tt|ref)*>
        |<!ELEMENT i (#PCDATA|sub|sup|i|tt|ref)*>
        |<!ELEMENT tt (#PCDATA|sub|sup|i|tt|ref)*>
        |<!ELEMENT ref (#PCDATA)>
        |
        |""".stripMargin)
    latin1Entities.foreach { case (n, cp) =>
      sb.append(s"""<!ENTITY $n "&#$cp;">\n""")
    }
    sb.toString
  }

  // ---------------------------------------------------------------
  // content pools
  // ---------------------------------------------------------------

  private def pick[T](r: Random, xs: IndexedSeq[T]): T = xs(r.nextInt(xs.length))

  private val firstNames: IndexedSeq[(String, String)] = IndexedSeq(
    "Wei" -> "Wei", "John" -> "John", "Maria" -> "Maria", "Anna" -> "Anna",
    "David" -> "David", "Chen" -> "Chen", "Rahul" -> "Rahul", "Yuki" -> "Yuki",
    "Ivan" -> "Ivan", "Olga" -> "Olga", "Peter" -> "Peter", "Sara" -> "Sara",
    "Thomas" -> "Thomas", "Laura" -> "Laura", "Marco" -> "Marco", "Elena" -> "Elena",
    "J&ouml;rg" -> "Jörg", "Bj&ouml;rn" -> "Björn", "Jos&eacute;" -> "José",
    "Andr&eacute;" -> "André", "G&uuml;nter" -> "Günter",
    "S&oslash;ren" -> "Søren", "Fran&ccedil;ois" -> "François",
    "Ren&eacute;" -> "René", "P&eacute;ter" -> "Péter",
    "&Aacute;kos" -> "Ákos", "&Eacute;ric" -> "Éric",
    "Ji&#345;&iacute;" -> "Jiří", "&Oslash;ystein" -> "Øystein",
    "In&ecirc;s" -> "Inês")

  private val lastNames: IndexedSeq[(String, String)] = IndexedSeq(
    "Smith" -> "Smith", "Zhang" -> "Zhang", "Wang" -> "Wang", "Kumar" -> "Kumar",
    "Ivanov" -> "Ivanov", "Johnson" -> "Johnson", "Lee" -> "Lee", "Brown" -> "Brown",
    "Tanaka" -> "Tanaka", "Rossi" -> "Rossi", "Silva" -> "Silva", "Nguyen" -> "Nguyen",
    "Garc&iacute;a" -> "García", "M&uuml;ller" -> "Müller",
    "Nov&aacute;k" -> "Novák", "S&oslash;rensen" -> "Sørensen",
    "Sch&ouml;n" -> "Schön", "Bj&ouml;rnsson" -> "Björnsson",
    "Fern&aacute;ndez" -> "Fernández", "Gro&szlig;" -> "Groß",
    "K&#337;v&aacute;ri" -> "Kővári", "L&ouml;we" -> "Löwe")

  /** (raw, expanded) author names; ~40% carry a middle initial, ~5% a
    * dblp homonym suffix. The requested size is capped well below the
    * combinatorial space (first x middle x last ~ 70k forms) so the
    * distinct-collection loop cannot degenerate into coupon-collector
    * stalls at large corpus sizes.
    */
  private def buildAuthorPool(r: Random, size: Int): IndexedSeq[(String, String)] = {
    val target = math.min(size, 8000)
    val seen = mutable.LinkedHashSet.empty[(String, String)]
    while (seen.size < target) {
      val (fr, fe) = pick(r, firstNames)
      val (lr, le) = pick(r, lastNames)
      val mid = if (r.nextInt(100) < 40) s" ${('A' + r.nextInt(26)).toChar}." else ""
      val sfx = if (r.nextInt(100) < 5) f" ${1 + r.nextInt(3)}%04d" else ""
      seen += ((s"$fr$mid $lr$sfx", s"$fe$mid $le$sfx"))
    }
    seen.toIndexedSeq
  }

  private val vocab: IndexedSeq[String] =
    ("Efficient Scalable Distributed Parallel Incremental Approximate Query Processing " +
      "Stream Graph Index Learning Optimization Database Systems Join Aggregation Memory " +
      "Cache Transaction Recovery Consistency Replication Partitioning Sampling Sketching " +
      "Privacy Secure Federated Neural Deep Kernel Convex Sparse Tensor Matrix Random " +
      "Online Adaptive Robust Dynamic Hybrid Modular Formal Verified Quantum Probabilistic " +
      "Semantic Temporal Spatial Relational Columnar Vectorized Compilation Workload")
      .split(' ').toIndexedSeq

  private val journals: IndexedSeq[(String, String)] = IndexedSeq(
    "ACM Trans. Database Syst." -> "tods", "IEEE Trans. Knowl. Data Eng." -> "tkde",
    "VLDB J." -> "vldb", "J. ACM" -> "jacm", "Commun. ACM" -> "cacm",
    "SIAM J. Comput." -> "siamcomp", "Theor. Comput. Sci." -> "tcs",
    "Inf. Process. Lett." -> "ipl", "Proc. VLDB Endow." -> "pvldb")

  private val confs: IndexedSeq[(String, String)] = IndexedSeq(
    "SIGMOD Conference" -> "sigmod", "VLDB" -> "vldb", "ICDE" -> "icde", "KDD" -> "kdd",
    "NeurIPS" -> "nips", "ICML" -> "icml", "POPL" -> "popl", "OSDI" -> "osdi",
    "SOSP" -> "sosp", "EuroSys" -> "eurosys", "CIDR" -> "cidr", "EDBT" -> "edbt")

  private val publishers: IndexedSeq[String] = IndexedSeq(
    "ACM", "IEEE Computer Society", "Springer", "Morgan Kaufmann",
    "VLDB Endowment", "USENIX Association", "IOS Press")

  private val schools: IndexedSeq[(String, String)] = IndexedSeq(
    "MIT" -> "MIT", "Stanford University" -> "Stanford University",
    "University of Aarhus" -> "University of Aarhus",
    "TU M&uuml;nchen" -> "TU München", "ETH Z&uuml;rich" -> "ETH Zürich",
    "Universit&eacute; de Montr&eacute;al" -> "Université de Montréal",
    "Link&ouml;ping University" -> "Linköping University",
    "Pontif&iacute;cia Universidade Cat&oacute;lica" -> "Pontifícia Universidade Católica")

  private val noteTexts: IndexedSeq[(String, String)] = IndexedSeq(
    "Best paper award" -> "Best paper award", "Invited talk" -> "Invited talk",
    "Extended abstract" -> "Extended abstract",
    "TU M&uuml;nchen" -> "TU München", "ETH Z&uuml;rich" -> "ETH Zürich")

  // ---------------------------------------------------------------
  // per-record generation
  // ---------------------------------------------------------------

  private def mdate(r: Random): String =
    f"${2002 + r.nextInt(23)}%04d-${1 + r.nextInt(12)}%02d-${1 + r.nextInt(28)}%02d"

  private def plainField(tag: String, raw: String, expanded: String,
      attrs: Seq[(String, String)] = Nil): Field =
    Field(tag, attrs, Seq(Txt(raw, expanded)))

  private def asciiField(tag: String, v: String, attrs: Seq[(String, String)] = Nil): Field =
    plainField(tag, v, v, attrs)

  private val markTags = IndexedSeq("i", "sub", "sup", "tt")

  /** Title mixed-content at realistic rates: 85% plain, ~10% one inline
    * markup span (truncating the captured title at the span — lxml
    * `.text`), ~2% markup-first (title column NOT captured at all),
    * ~1.5% two spans (possible spurious-column array), ~1.5% nested
    * markup. Some titles carry `;`, `"` or `&amp;` to exercise CSV
    * quoting and built-in entity expansion at volume.
    */
  private def genTitleNodes(r: Random, words: Seq[String]): Seq[Node] = {
    def txt(ws: Seq[String], trailingDot: Boolean, lead: String = "", trail: String = ""): Txt = {
      var s = ws.mkString(" ")
      r.nextInt(100) match {
        case x if x < 4 => s = s + " &amp; " + pick(r, vocab)
        case x if x < 7 => s = s + "; " + pick(r, vocab)
        case x if x < 9 => s = s + " \"" + pick(r, vocab) + "\""
        case _ =>
      }
      val raw = lead + s + trail + (if (trailingDot) "." else "")
      Txt(raw, raw.replace("&amp;", "&"))
    }
    val style = r.nextInt(100)
    if (style < 85) Seq(txt(words, trailingDot = true))
    else if (style < 95) {
      val k = 1 + r.nextInt(math.max(1, words.length - 1))
      Seq(txt(words.take(k), trailingDot = false, trail = " "),
        Mark(pick(r, markTags), Seq({ val w = pick(r, vocab); Txt(w, w) })),
        txt(words.drop(k), trailingDot = true, lead = " "))
    } else if (style < 97)
      Seq(Mark(pick(r, markTags), Seq({ val w = pick(r, vocab); Txt(w, w) })),
        txt(words, trailingDot = true, lead = " "))
    else if (style < 98) {
      val t = pick(r, markTags)
      Seq(txt(words.take(1), trailingDot = false, trail = " "),
        Mark(t, Seq({ val w = pick(r, vocab); Txt(w, w) })),
        Txt(" and ", " and "),
        Mark(t, Seq({ val w = pick(r, vocab); Txt(w, w) })),
        txt(words.drop(1), trailingDot = true, lead = " "))
    } else {
      val w = pick(r, vocab)
      Seq(txt(words, trailingDot = false, trail = " "),
        Mark("i", Seq(Txt(w + " ", w + " "), Mark("sup", Seq(Txt("2", "2"))))),
        Txt(".", "."))
    }
  }

  private def genTitle(r: Random): Field =
    Field("title", Nil, genTitleNodes(r, Seq.fill(3 + r.nextInt(6))(pick(r, vocab))))

  private def authorFields(r: Random, pool: IndexedSeq[(String, String)], n: Int,
      tag: String = "author"): Seq[Field] = {
    val base = Seq.fill(n)(pick(r, pool))
    // rare duplicate author inside one record (kept, sorted — q03 quirk)
    val all = if (n > 0 && r.nextInt(200) == 0) base :+ base.head else base
    all.map { case (raw, exp) =>
      val attrs = if (r.nextInt(100) < 3)
        Seq("orcid" -> f"0000-000${1 + r.nextInt(3)}%d-${1000 + r.nextInt(9000)}%04d-${1000 + r.nextInt(9000)}%04d")
      else Nil
      plainField(tag, raw, exp, attrs)
    }
  }

  private def eeFields(r: Random, i: Int): Seq[Field] = {
    val n = r.nextInt(100) match { case x if x < 25 => 0; case x if x < 85 => 1; case _ => 2 }
    (0 until n).map { j =>
      val v = if (r.nextBoolean()) s"https://doi.org/10.1145/${100000 + i}.$j"
      else f"https://arxiv.org/abs/${1500 + r.nextInt(900)}%04d.${10000 + r.nextInt(89999)}%05d"
      val attrs = if (r.nextInt(100) < 10) Seq("type" -> "oa") else Nil
      asciiField("ee", v, attrs)
    }
  }

  private def pagesField(r: Random): Field = {
    val p0 = 1 + r.nextInt(990)
    if (r.nextInt(100) < 6) asciiField("pages", p0.toString)
    else asciiField("pages", s"$p0-${p0 + 1 + r.nextInt(40)}")
  }

  private def citeFields(r: Random, i: Int): Seq[Field] =
    if (r.nextInt(100) >= 10) Nil
    else (0 to r.nextInt(3)).map { j =>
      if (r.nextInt(100) < 40) asciiField("cite", "...")
      else asciiField("cite", s"journals/${pick(r, journals)._2}/X${math.max(0, i - 1 - r.nextInt(50))}")
    }

  private def recAttrs(r: Random, key: String): Seq[(String, String)] = {
    var a = Seq("mdate" -> mdate(r), "key" -> key)
    if (r.nextInt(100) < 4)
      a = a :+ ("publtype" -> pick(r, IndexedSeq("informal", "survey", "withdrawn", "data")))
    if (r.nextInt(100) < 2) a = a :+ ("cdate" -> mdate(r))
    a
  }

  private def genRecord(r: Random, i: Int, pool: IndexedSeq[(String, String)]): Rec = {
    val x = r.nextInt(1000)
    val year = 1970 + r.nextInt(55)
    if (x < 450) { // article
      val (jn, jk) = pick(r, journals)
      val fs = mutable.ArrayBuffer.empty[Field]
      fs ++= authorFields(r, pool, 1 + r.nextInt(4))
      fs += genTitle(r)
      if (r.nextInt(100) < 85) fs += pagesField(r)
      fs += asciiField("year", year.toString)
      val vol = 1 + r.nextInt(60)
      if (r.nextInt(100) < 75) fs += asciiField("volume",
        if (r.nextInt(100) < 5) s"S$vol" else vol.toString)
      fs += plainField("journal", jn, jn)
      if (r.nextInt(100) < 60) fs += asciiField("number",
        if (r.nextInt(100) < 10) s"${1 + r.nextInt(6)}-${3 + r.nextInt(6)}" else (1 + r.nextInt(12)).toString)
      fs ++= eeFields(r, i)
      if (r.nextInt(100) < 50) fs += asciiField("url", s"db/journals/$jk/$jk$vol.html#X$i")
      if (r.nextInt(100) < 8) fs += asciiField("month",
        pick(r, IndexedSeq("January", "March", "June", "September", "December")))
      if (r.nextInt(100) < 4) {
        val (nr, ne) = pick(r, noteTexts)
        val attrs = if (r.nextInt(100) < 30) Seq("type" -> "source") else Nil
        fs += plainField("note", nr, ne, attrs)
      }
      fs ++= citeFields(r, i)
      Rec("article", recAttrs(r, s"journals/$jk/X$i"), fs.toSeq)
    } else if (x < 830) { // inproceedings
      val (cn, ck) = pick(r, confs)
      val fs = mutable.ArrayBuffer.empty[Field]
      fs ++= authorFields(r, pool, 1 + r.nextInt(5))
      fs += genTitle(r)
      if (r.nextInt(100) < 90) fs += pagesField(r)
      fs += asciiField("year", year.toString)
      fs += plainField("booktitle", cn, cn)
      fs ++= eeFields(r, i)
      if (r.nextInt(100) < 80) fs += asciiField("crossref", s"conf/$ck/$year")
      if (r.nextInt(100) < 40) fs += asciiField("url", s"db/conf/$ck/$ck$year.html#X$i")
      fs ++= citeFields(r, i)
      Rec("inproceedings", recAttrs(r, s"conf/$ck/X$i"), fs.toSeq)
    } else if (x < 855) { // proceedings
      val (cn, ck) = pick(r, confs)
      val fs = mutable.ArrayBuffer.empty[Field]
      fs ++= authorFields(r, pool, 1 + r.nextInt(3), tag = "editor")
      fs += plainField("title", s"Proceedings of the $year $cn", s"Proceedings of the $year $cn")
      fs += plainField("booktitle", cn, cn)
      fs += asciiField("publisher", pick(r, publishers))
      if (r.nextInt(100) < 50) {
        val attrs = if (r.nextInt(100) < 60) Seq("href" -> "db/series/lncs/index.html") else Nil
        fs += Field("series", attrs, Seq(Txt("Lecture Notes in Computer Science",
          "Lecture Notes in Computer Science")))
        fs += asciiField("volume", (1000 + r.nextInt(12000)).toString)
      }
      fs += asciiField("year", year.toString)
      if (r.nextInt(100) < 80) fs += asciiField("isbn",
        f"978-3-${540 + r.nextInt(100)}%03d-${10000 + r.nextInt(89999)}%05d-${r.nextInt(10)}%d")
      fs ++= eeFields(r, i)
      if (r.nextInt(100) < 40) fs += asciiField("url", s"db/conf/$ck/$ck$year.html")
      Rec("proceedings", recAttrs(r, s"conf/$ck/$year"), fs.toSeq)
    } else if (x < 865) { // book
      val fs = mutable.ArrayBuffer.empty[Field]
      if (r.nextInt(100) < 60) fs ++= authorFields(r, pool, 1 + r.nextInt(2))
      else fs ++= authorFields(r, pool, 1 + r.nextInt(2), tag = "editor")
      fs += genTitle(r)
      fs += asciiField("publisher", pick(r, publishers))
      fs += asciiField("year", year.toString)
      fs += asciiField("isbn",
        f"978-0-${100 + r.nextInt(900)}%03d-${10000 + r.nextInt(89999)}%05d-${r.nextInt(10)}%d")
      if (r.nextInt(100) < 30) fs += asciiField("pages", s"1-${150 + r.nextInt(600)}")
      if (r.nextInt(100) < 40) fs += plainField("series",
        "Synthesis Lectures on Data Management", "Synthesis Lectures on Data Management")
      fs ++= eeFields(r, i)
      Rec("book", recAttrs(r, s"books/${pick(r, IndexedSeq("sp", "mk", "acm", "cu"))}/X$i"), fs.toSeq)
    } else if (x < 915) { // incollection
      val fs = mutable.ArrayBuffer.empty[Field]
      fs ++= authorFields(r, pool, 1 + r.nextInt(3))
      fs += genTitle(r)
      fs += plainField("booktitle", "Handbook of Data Management", "Handbook of Data Management")
      if (r.nextInt(100) < 85) fs += pagesField(r)
      fs += asciiField("year", year.toString)
      fs ++= eeFields(r, i)
      if (r.nextInt(100) < 70) fs += asciiField("crossref", s"books/sp/handbook$year")
      Rec("incollection", recAttrs(r, s"books/sp/X$i"), fs.toSeq)
    } else if (x < 930) { // phdthesis
      val fs = mutable.ArrayBuffer.empty[Field]
      fs ++= authorFields(r, pool, 1)
      fs += genTitle(r)
      fs += asciiField("year", year.toString)
      val (sr, se) = pick(r, schools)
      fs += plainField("school", sr, se)
      if (r.nextInt(100) < 20) fs += asciiField("pages", s"1-${100 + r.nextInt(200)}")
      if (r.nextInt(100) < 15) fs += asciiField("isbn",
        f"978-1-${100 + r.nextInt(900)}%03d-${10000 + r.nextInt(89999)}%05d-${r.nextInt(10)}%d")
      fs ++= eeFields(r, i)
      Rec("phdthesis", recAttrs(r, s"phd/x/X$i"), fs.toSeq)
    } else if (x < 933) { // mastersthesis
      val fs = mutable.ArrayBuffer.empty[Field]
      fs ++= authorFields(r, pool, 1)
      fs += genTitle(r)
      fs += asciiField("year", year.toString)
      val (sr, se) = pick(r, schools)
      fs += plainField("school", sr, se)
      Rec("mastersthesis", recAttrs(r, s"ms/x/X$i"), fs.toSeq)
    } else { // www (homepages)
      val fs = mutable.ArrayBuffer.empty[Field]
      fs ++= authorFields(r, pool, 1 + r.nextInt(2))
      fs += plainField("title", "Home Page", "Home Page")
      (0 to r.nextInt(2)).foreach { j =>
        fs += asciiField("url", s"http://www.example.org/~person$i/$j")
      }
      if (r.nextInt(100) < 30) {
        val (nr, ne) = pick(r, noteTexts)
        fs += Field("note", Seq("type" -> "affiliation"), Seq(Txt(nr, ne)))
      }
      Rec("www", Seq("mdate" -> mdate(r), "key" -> s"homepages/${r.nextInt(99)}/${1000 + i}"), fs.toSeq)
    }
  }

  /** Deterministic record stream; consume sequentially and fully —
    * two calls with the same (n, seed) yield identical corpora.
    */
  def records(n: Int, seed: Long): Iterator[Rec] = {
    val r = new Random(seed)
    val pool = buildAuthorPool(r, math.max(60, n / 8))
    (0 until n).iterator.map(i => genRecord(r, i, pool))
  }

  /** Write dblp.xml (+ dblp.dtd) in the real dump's line layout. */
  def writeCorpus(dir: Path, recs: IterableOnce[Rec]): (String, String) = {
    val dtdPath = dir.resolve("dblp.dtd")
    Files.write(dtdPath, dtdText.getBytes("UTF-8"))
    val xmlPath = dir.resolve("dblp.xml")
    val w = Files.newBufferedWriter(xmlPath)
    try {
      w.write("<?xml version=\"1.0\" encoding=\"ISO-8859-1\"?>\n")
      w.write("<!DOCTYPE dblp SYSTEM \"dblp.dtd\">\n")
      w.write("<dblp>\n")
      recs.iterator.foreach { rec => w.write(rec.xml); w.write("\n") }
      w.write("</dblp>\n")
    } finally w.close()
    (xmlPath.toString, dtdPath.toString)
  }

  // ---------------------------------------------------------------
  // expected output (reference semantics, computed from the model)
  // ---------------------------------------------------------------

  final case class Expected(
      schema: Map[String, Seq[String]],
      counts: Map[String, Long],
      dataCsv: Map[String, String],
      headerCsv: Map[String, String],
      relationCsv: Map[String, String])

  /** Python csv QUOTE_MINIMAL with doublequote, LF line ends (the
    * engine's documented divergence from the reference's CRLF).
    */
  private def q(v: String): String =
    if (v.exists(c => c == ';' || c == '"' || c == '\n' || c == '\r'))
      "\"" + v.replace("\"", "\"\"") + "\""
    else v

  /** The reference's get_type (XMLToCSV.py:246-281). Values here are
    * ASCII-digit-only where numeric, so the unicode-isdigit quirks
    * don't bite.
    */
  def refType(v: String): String = {
    if (v == null || v.isEmpty) "any"
    else if (v.forall(c => c >= '0' && c <= '9')) "integer"
    else if (v.matches("""\d+\.\d+""")) "float"
    else if (v.matches("""\d{4}-\d{2}-\d{2}""") && validDate(v.substring(0, 4).toInt, v.substring(5, 7).toInt, v.substring(8, 10).toInt)) "date"
    else if (v.toLowerCase == "true" || v.toLowerCase == "false") "boolean"
    else "string"
  }

  private def validDate(y: Int, m: Int, d: Int): Boolean =
    m >= 1 && m <= 12 && d >= 1 && {
      val leap = (y % 4 == 0 && y % 100 != 0) || y % 400 == 0
      val dm = Seq(31, if (leap) 29 else 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
      d <= dm(m - 1)
    }

  /** The reference's type lattice (XMLToCSV.py:314-331). */
  def lattice(types: Set[String]): String = {
    val t = types - "any"
    if (t.isEmpty) "string"
    else if (t.size == 1) t.head
    else if (t.contains("string")) "string"
    else if (t.size == 2 && t == Set("float", "integer")) "float"
    else if (t.size == 2 && t == Set("date", "datetime")) "datetime"
    else "string"
  }

  def expected(recs: Seq[Rec], relations: Seq[(String, String)]): Expected = {
    // per-record final data + per-type accumulators
    final case class TypeAcc(
        cols: mutable.Set[String] = mutable.Set.empty,
        arrayCols: mutable.Set[String] = mutable.Set.empty,
        colTypes: mutable.Map[String, mutable.Set[String]] = mutable.Map.empty,
        rows: mutable.ArrayBuffer[(Long, Map[String, String])] = mutable.ArrayBuffer.empty,
        var n: Long = 0L)
    val acc = mutable.LinkedHashMap.empty[String, TypeAcc]
    // relation attr -> (value -> set of record ids), insertion-free (sorted later)
    val relValues = relations.map(_._1 -> mutable.Map.empty[String, mutable.Set[Long]]).toMap

    recs.zipWithIndex.foreach { case (rec, idx) =>
      val id = idx.toLong
      val a = acc.getOrElseUpdate(rec.rtype, TypeAcc())
      val values = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
      rec.attrs.foreach { case (k, v) => values.getOrElseUpdate(k, mutable.ArrayBuffer.empty) += v }
      rec.cells.foreach { case (c, v) => values.getOrElseUpdate(c, mutable.ArrayBuffer.empty) += v }
      val row = values.map { case (c, vs) =>
        a.cols += c
        vs.foreach(v => a.colTypes.getOrElseUpdate(c, mutable.Set.empty) += refType(v))
        if (vs.length > 1) {
          a.arrayCols += c
          c -> vs.sorted.mkString("|")
        } else c -> vs.head
      }.toMap
      a.rows += ((id, row))
      a.n += 1
      relations.foreach { case (attr, _) =>
        values.get(attr).foreach(vs => vs.distinct.foreach(v =>
          relValues(attr).getOrElseUpdate(v, mutable.Set.empty) += id))
      }
    }

    val schema = acc.map { case (t, a) => t -> a.cols.toSeq.sorted }.toMap
    val counts = acc.map { case (t, a) => t -> a.n }.toMap
    val dataCsv = acc.map { case (t, a) =>
      val cols = schema(t)
      val sb = new StringBuilder
      a.rows.sortBy(_._1).foreach { case (id, row) =>
        sb.append(id)
        cols.foreach { c => sb.append(';').append(q(row.getOrElse(c, ""))) }
        sb.append('\n')
      }
      t -> sb.toString
    }.toMap
    val headerCsv = acc.map { case (t, a) =>
      val cols = schema(t)
      val parts = s"$t:ID" +: cols.map { c =>
        val ty = lattice(a.colTypes(c).toSet) match {
          case "integer" => "int" // neo4j spelling (XMLToCSV.py:308-311)
          case other => other
        }
        val sfx = if (a.arrayCols.contains(c)) "[]" else ""
        s"$c:$ty$sfx"
      }
      t -> parts.mkString(";")
    }.toMap

    // relation node/edge files: node values sorted (the engine's
    // documented deterministic ordering), ids continue after records
    var offset = recs.length.toLong
    val relCsv = mutable.LinkedHashMap.empty[String, String]
    relations.foreach { case (attr, rel) =>
      val vals = relValues(attr).keys.toSeq.sorted
      val nodeId = vals.zipWithIndex.map { case (v, k) => v -> (offset + k) }.toMap
      val nodeSb = new StringBuilder(s":ID;$attr:string\n")
      vals.foreach { v => nodeSb.append(nodeId(v)).append(';').append(q(v)).append('\n') }
      relCsv += s"$attr" -> nodeSb.toString
      val pairs = relValues(attr).iterator
        .flatMap { case (v, ids) => ids.iterator.map(id => (id, nodeId(v))) }
        .toSeq.sorted
      val edgeSb = new StringBuilder(":START_ID;:END_ID\n")
      pairs.foreach { case (s, e) => edgeSb.append(s).append(';').append(e).append('\n') }
      relCsv += s"${attr}_$rel" -> edgeSb.toString
      offset += vals.length
    }

    Expected(schema, counts, dataCsv, headerCsv, relCsv.toMap)
  }
}
