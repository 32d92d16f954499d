package graft.xml

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import java.io.StringReader

import org.apache.spark.sql.{Dataset, SparkSession}

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
    * deltas (two lightweight count jobs); the only data shuffle is the
    * record-chunk reassembly groupBy.
    */
  def read(spark: SparkSession, xmlPath: String, dtd: Dtd): Dataset[XmlRecord] = {
    import spark.implicits._
    val types = dtd.recordTypes
    val root = dtd.root
    val startRe = ("""^\s*<(""" + types.map(java.util.regex.Pattern.quote).mkString("|") + """)[\s/>]""").r
    def isCandidate(line: String): Boolean = startRe.findFirstIn(line).isDefined

    val lines = spark.sparkContext.textFile(xmlPath)

    // job 1: per-partition (net depth delta, record-start count given entry depth)
    // entry depth is unknown until the prefix sum, so starts are counted in job 2.
    val deltas = lines.mapPartitions { it =>
      Iterator.single(it.foldLeft(0)((d, l) => d + depthDelta(l)))
    }.collect()
    val depthIn = deltas.scanLeft(0)(_ + _)

    // job 2: count true record starts per partition (depth==1 candidates)
    val startCounts = lines.mapPartitionsWithIndex { case (pi, it) =>
      var depth = depthIn(pi); var n = 0L
      it.foreach { line =>
        if (depth == 1 && isCandidate(line)) n += 1
        depth += depthDelta(line)
      }
      Iterator.single(n)
    }.collect()
    val recOffsets = startCounts.scanLeft(0L)(_ + _)

    // job 3: tag every line with its global record index, shuffle once
    val keyed = lines.mapPartitionsWithIndex { case (pi, it) =>
      var depth = depthIn(pi)
      var rec = recOffsets(pi) - 1 // pre-first-start lines belong to the previous partition's open record
      var lineNo = 0L
      it.map { line =>
        if (depth == 1 && isCandidate(line)) rec += 1
        depth += depthDelta(line)
        lineNo += 1
        (rec, (pi.toLong << 40) | lineNo, line)
      }
    }

    val dtdB = spark.sparkContext.broadcast(dtd)
    val chunks = keyed
      .filter(_._1 >= 0) // preamble (<?xml…>, root open) precedes record 0
      .groupBy(_._1)
      .map { case (recIdx, ls) =>
        val text = ls.toSeq.sortBy(_._2).map(_._3).mkString("\n")
        (recIdx, text)
      }

    val rootClose = s"</$root>"
    chunks.flatMap { case (recIdx, chunk) =>
      val body = dtdB.value.expandEntities(chunk.replace(rootClose, ""))
      parseRecord(body, recIdx)
    }.toDS()
  }

  private lazy val factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, true)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
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
      if (recordType == null) None
      else Some(XmlRecord(recordType, pos, recordAttrs, children.result()))
    } finally r.close()
  }
}
