package graft.xml

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import java.io.StringReader

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.types.{ArrayType, LongType, MapType, StringType, StructField, StructType}

/** One flattened XML element inside a record: its tag, the character
  * data before its first child element (lxml's `.text` convention —
  * null when absent), and its attributes.
  */
final case class XmlChild(tag: String, text: String, attrs: Map[String, String])

/** One top-level record: its type (element name), document-order
  * position, own attributes, and ALL descendant elements in document
  * order. Descendants (not just direct children) are captured because
  * the reference's iterparse loop folds every nested end-event into the
  * record (/root/reference/XMLToCSV.py:190-198) — e.g. markup elements
  * inside a title each become their own column.
  */
final case class XmlRecord(
    recordType: String,
    pos: Long,
    attrs: Map[String, String],
    children: Seq[XmlChild])

/** Distributed XML source (S2/S3's scan, /root/reference/
  * XMLToCSV.py:108-203) — one parse shared by the schema-inference and
  * data passes (the reference parses the file twice; we parse once and
  * cache).
  *
  * Split strategy: the dump is read line-parallel (`sc.textFile`), each
  * line is tagged with a global record index via a per-partition
  * start-count prefix sum (two tiny jobs, no data shuffled for the
  * numbering itself), then lines are reassembled into record chunks by
  * a single shuffle on the record index. This scales: no whole-file
  * read on any single node, and the only constraint is that record
  * start tags begin a line (true of the DBLP dump format).
  *
  * Each chunk is entity-expanded from the DTD map (Spark has no DTD
  * machinery) and parsed with StAX per partition.
  */
object XmlRecords {

  // tag-lexing regexes for the line-level depth scan
  private val openTag = java.util.regex.Pattern.compile("<[A-Za-z_]")
  private val closeTag = java.util.regex.Pattern.compile("</")
  private val selfClose = java.util.regex.Pattern.compile("/>")

  private def countMatches(p: java.util.regex.Pattern, s: String): Int = {
    val m = p.matcher(s); var n = 0; while (m.find()) n += 1; n
  }

  /** Net element-depth change contributed by one line. Assumes tags do
    * not span lines and text content does not contain literal "</" or
    * "/>" (both hold for the DBLP dump format).
    */
  private def depthDelta(line: String): Int =
    countMatches(openTag, line) - countMatches(closeTag, line) - countMatches(selfClose, line)

  /** Read all records of the given types from `xmlPath`.
    *
    * A record opens ONLY at nesting depth 1 (directly under the root) —
    * the reference's `current_tag is None` guard (XMLToCSV.py:120,166):
    * a vocabulary element nested inside a record (e.g. `author` inside
    * `article`) is a child, not a record. Depth at each partition
    * boundary comes from a parallel prefix sum of per-partition depth
    * deltas (one count-only job).
    *
    * Reassembly is shuffle-free: every record that both starts and
    * ends inside a partition is parsed inline by that partition's
    * task; only the partition-boundary fragments (at most one open
    * record's text per boundary, plus the file preamble) are collected
    * and stitched on the driver, then parsed via a small parallelize.
    * Record `pos` is (partition << 40 | start-ordinal) — monotonic in
    * document order, which is all downstream id assignment needs.
    */
  /** Row-level schema of [[readRows]] — matches XmlRecord's shape. */
  val rowSchema: StructType = StructType(Seq(
    StructField("recordType", StringType, nullable = false),
    StructField("pos", LongType, nullable = false),
    StructField("attrs", MapType(StringType, StringType), nullable = false),
    StructField("children", ArrayType(StructType(Seq(
      StructField("tag", StringType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("attrs", MapType(StringType, StringType), nullable = false)))),
      nullable = false)))

  /** Typed view of [[readRows]] (tests, schema pass). */
  def read(spark: SparkSession, xmlPath: String, dtd: Dtd, minPartitions: Int = 0): Dataset[XmlRecord] =
    readRows(spark, xmlPath, dtd, minPartitions).as[XmlRecord](Encoders.product[XmlRecord])

  /** Read all records as a DataFrame directly (no case-class encoder in
    * the plan): persisting THIS caches InternalRows, so downstream
    * scans skip the SerializeFromObject conversion that a cached typed
    * Dataset would pay on every pass.
    *
    * `permissive=false` (default) aborts on malformed records — the
    * reference's DTD-validated behavior. `permissive=true` skips them,
    * counting skips in the returned accumulator-backed metric
    * `graft.xml.malformed` (query it via sparkContext's accumulators
    * or the returned DataFrame count delta).
    */
  def readRows(
      spark: SparkSession,
      xmlPath: String,
      dtd: Dtd,
      minPartitions: Int = 0,
      permissive: Boolean = false,
      validate: Boolean = false): DataFrame = {
    val malformed = spark.sparkContext.longAccumulator("graft.xml.malformed")
    // function VALUE, not a nested def: a def would pull the whole
    // enclosing frame (SparkSession included) into the task closure
    val strict = validate
    val tryParse: (Dtd, String, Long) => Option[XmlRecord] =
      if (!permissive) (d, body, pos) => {
        val r = parseRecord(body, pos)
        if (strict) r.foreach(validateAgainstDtd(d, _))
        r
      }
      else {
        val acc = malformed
        (d, body, pos) =>
          try {
            val r = parseRecord(body, pos)
            if (strict) r.foreach(validateAgainstDtd(d, _))
            r
          } catch {
            case _: javax.xml.stream.XMLStreamException | _: RuntimeException =>
              acc.add(1L); None
          }
      }
    val types = dtd.recordTypes
    val root = dtd.root
    val startRe = ("""^\s*<(""" + types.map(java.util.regex.Pattern.quote).mkString("|") + """)[\s/>]""").r
    def isCandidate(line: String): Boolean = startRe.findFirstIn(line).isDefined

    val lines =
      if (minPartitions > 0) spark.sparkContext.textFile(xmlPath, minPartitions)
      else spark.sparkContext.textFile(xmlPath)

    // job 1: per-partition (net depth delta, min running depth) ->
    // entry depth prefix sum. The min is the corrupted-split guard:
    // the line-level depth scan assumes tags do not span lines and
    // text never contains a literal "</" or "/>" (true for the DBLP
    // dump); when the assumption is violated the running depth dips
    // negative or the file does not close back to depth 0 — fail
    // loudly instead of silently mis-splitting records.
    val deltas = lines.mapPartitions { it =>
      var d = 0
      var minD = 0
      it.foreach { l => d += depthDelta(l); if (d < minD) minD = d }
      Iterator.single((d, minD))
    }.collect()
    val depthIn = deltas.scanLeft(0)(_ + _._1)
    deltas.indices.foreach { pi =>
      if (depthIn(pi) + deltas(pi)._2 < 0)
        throw new IllegalStateException(
          s"XML splitter invariant violated: element depth went negative inside input split $pi. " +
            "The line-level splitter requires record tags to begin a line, tags not to span lines, " +
            "and text content not to contain literal '</' or '/>'. Reformat the input (e.g. xmllint --format).")
    }
    if (depthIn.last != 0)
      throw new IllegalStateException(
        s"XML splitter invariant violated: final element depth is ${depthIn.last}, expected 0 " +
          "(unclosed or over-closed tags as seen by the line-level scan). The splitter requires " +
          "record tags to begin a line, tags not to span lines, and text content not to contain " +
          "literal '</' or '/>'. Reformat the input (e.g. xmllint --format).")

    // job 2: boundary fragments per partition — (head lines before the
    // first true start; tail lines from the last true start; #starts)
    val frags = lines.mapPartitionsWithIndex { case (pi, it) =>
      var depth = depthIn(pi)
      var n = 0L
      val head = new StringBuilder
      var tail = new StringBuilder
      it.foreach { line =>
        if (depth == 1 && isCandidate(line)) {
          n += 1
          tail = new StringBuilder
        }
        if (n == 0) { if (head.nonEmpty) head.append('\n'); head.append(line) }
        else { if (tail.nonEmpty) tail.append('\n'); tail.append(line) }
        depth += depthDelta(line)
      }
      Iterator.single((pi, head.toString, tail.toString, n))
    }.collect().sortBy(_._1)

    val dtdB = spark.sparkContext.broadcast(dtd)
    val rootClose = s"</$root>"
    val nStartsB = spark.sparkContext.broadcast(frags.map(f => f._1 -> f._4).toMap)

    // job 3 (the data pass): parse records fully contained in their
    // partition — everything except each partition's last open chunk
    val inner = lines.mapPartitionsWithIndex { case (pi, it) =>
      // every chunk except the partition's LAST start (which may run
      // past the split boundary and is handled by the driver stitch)
      val lastOrdinal = nStartsB.value.getOrElse(pi, 0L) - 1
      var depth = depthIn(pi)
      var ordinal = -1L
      var chunk: StringBuilder = null
      val out = scala.collection.mutable.ArrayBuffer.empty[XmlRecord]
      def flush(): Unit =
        if (chunk != null) {
          tryParse(dtdB.value,
            dtdB.value.expandEntities(chunk.toString.replace(rootClose, "")),
            (pi.toLong << 40) | ordinal).foreach(out += _)
          chunk = null
        }
      it.foreach { line =>
        if (depth == 1 && isCandidate(line)) {
          flush()
          ordinal += 1
          chunk = if (ordinal == lastOrdinal) null else new StringBuilder
        }
        if (chunk != null) {
          if (chunk.nonEmpty) chunk.append('\n')
          chunk.append(line)
        }
        depth += depthDelta(line)
      }
      flush() // no-op unless the file's final chunk closed in-partition (it is the tail by construction)
      out.iterator
    }

    // stitch boundary records on the driver (at most one per partition)
    val boundaries = Seq.newBuilder[(Long, String)]
    var pendingPos = -1L
    var pending: StringBuilder = null
    frags.foreach { case (pi, head, tail, n) =>
      if (pendingPos >= 0) {
        if (head.nonEmpty) { pending.append('\n'); pending.append(head) }
        if (n > 0) { boundaries += ((pendingPos, pending.toString)); pendingPos = -1; pending = null }
      }
      if (n > 0) {
        pendingPos = (pi.toLong << 40) | (n - 1)
        pending = new StringBuilder(tail)
      }
    }
    if (pendingPos >= 0) boundaries += ((pendingPos, pending.toString))

    val boundaryRdd = spark.sparkContext.parallelize(boundaries.result(), 1)
      .flatMap { case (pos, text) =>
        tryParse(dtdB.value, dtdB.value.expandEntities(text.replace(rootClose, "")), pos)
      }

    val rows = inner.union(boundaryRdd).map { r =>
      Row(r.recordType, r.pos, r.attrs,
        r.children.map(c => Row(c.tag, c.text, c.attrs)))
    }
    spark.createDataFrame(rows, rowSchema)
  }

  private lazy val factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, true)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** Strict DTD validation (the reference's `dtd_validation=True`,
    * /root/reference/XMLToCSV.py:109,152): every element of the record
    * (itself and all descendants) must be declared in the DTD, and
    * every attribute must be declared in the element's ATTLIST. Content
    * models (child ordering/cardinality) are not checked — the
    * reference's use of validation is vocabulary enforcement, and full
    * content-model checking buys nothing for tabular extraction.
    */
  private[xml] def validateAgainstDtd(dtd: Dtd, rec: XmlRecord): Unit = {
    def checkAttrs(tag: String, attrs: Map[String, String]): Unit = {
      val declared = dtd.declaredAttrs.getOrElse(tag, Set.empty)
      attrs.keys.find(!declared.contains(_)).foreach { a =>
        throw new IllegalStateException(
          s"DTD validation failed: attribute '$a' of <$tag> is not declared in the DTD")
      }
    }
    def checkElem(tag: String): Unit =
      if (!dtd.elements.contains(tag))
        throw new IllegalStateException(
          s"DTD validation failed: element <$tag> is not declared in the DTD")
    checkElem(rec.recordType)
    checkAttrs(rec.recordType, rec.attrs)
    rec.children.foreach { c =>
      checkElem(c.tag)
      checkAttrs(c.tag, c.attrs)
    }
  }

  /** Public single-record parse (used by the streaming source, where
    * each arriving line is one complete record element).
    */
  def parseRecordString(body: String, pos: Long): Option[XmlRecord] = parseRecord(body, pos)

  /** Parse one record chunk: the first element is the record; every
    * nested element (any depth) becomes an XmlChild with its
    * before-first-child text, mirroring lxml `.text`.
    */
  private[xml] def parseRecord(body: String, pos: Long): Option[XmlRecord] = {
    val r = factory.createXMLStreamReader(new StringReader(body))
    try {
      var recordType: String = null
      var recordAttrs: Map[String, String] = Map.empty
      val children = Seq.newBuilder[XmlChild]
      var depth = 0
      // per-depth state for the element currently open at that depth
      var stack: List[(String, Map[String, String], StringBuilder, Boolean)] = Nil

      def attrsOf(): Map[String, String] =
        (0 until r.getAttributeCount).map(i =>
          r.getAttributeLocalName(i) -> r.getAttributeValue(i)).toMap

      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            if (depth == 0) {
              recordType = r.getLocalName
              recordAttrs = attrsOf()
            } else {
              // a child opened: mark the parent as having seen a child
              stack = stack match {
                case (t, a, sb, _) :: rest => (t, a, sb, true) :: rest
                case Nil => Nil
              }
              stack = (r.getLocalName, attrsOf(), new StringBuilder, false) :: stack
            }
            depth += 1
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            stack match {
              case (t, a, sb, seenChild) :: _ if !seenChild => sb.append(r.getText)
              case _ => // record-level text or text after a nested child: ignored (lxml .text semantics)
            }
          case XMLStreamConstants.END_ELEMENT =>
            depth -= 1
            if (depth == 0) done = true
            else {
              val (t, a, sb, _) = stack.head
              stack = stack.tail
              children += XmlChild(t, if (sb.isEmpty) null else sb.toString, a)
            }
          case _ =>
        }
      }
      // corrupted-split guard: a record chunk must contain exactly ONE
      // record element. Trailing content after the record closes means
      // a record started mid-line (the line splitter could not see
      // it) — without this check that record is silently dropped.
      // (wstx rejects a second root itself while scanning — fold that
      // into the same clear message.)
      try {
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT)
            throw new javax.xml.stream.XMLStreamException("second root element")
        }
      } catch {
        case _: javax.xml.stream.XMLStreamException =>
          throw new IllegalStateException(
            "XML record chunk contains trailing content after the record closed: " +
              "record start tags must begin a line (a record starting mid-line would otherwise be " +
              "silently dropped). Reformat the input (e.g. xmllint --format).")
      }
      if (recordType == null) None
      else Some(XmlRecord(recordType, pos, recordAttrs, children.result()))
    } finally r.close()
  }
}
