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

  /** Result of the per-line layout scan: `hardViolation` = the line
    * splitter cannot handle this line at any depth (a tag spans lines,
    * a multi-line comment/CDATA/declaration starts here, or text
    * contains literal "/>"); `midStartDepths` = LINE-RELATIVE element
    * depths at which a record-type open tag occurs after the first
    * non-whitespace position — only a depth-1 occurrence (resolved by
    * the caller's prefix sum) is a real violation, so DBLP's inline
    * markup (`<i>` inside a title at depth 2+) never triggers one.
    */
  private[xml] final case class LineScan(hardViolation: Boolean, midStartDepths: List[Int])

  /** Quote-aware single-line tag scan backing [[LineScan]]. '<' always
    * starts markup in well-formed XML (it must be escaped in text and
    * attribute values), so every '<' is classified; '>' inside quoted
    * attribute values is skipped.
    */
  private[xml] def scanLine(line: String, recordTypes: Set[String]): LineScan = {
    val n = line.length
    var i = 0
    var depth = 0
    var hard = false
    var mids = List.empty[Int]
    var seenNonWs = false
    while (i < n) {
      val c = line.charAt(i)
      if (c == '<') {
        val atLineStart = !seenNonWs
        seenNonWs = true
        if (i + 1 < n && line.charAt(i + 1) == '/') { // close tag
          val e = line.indexOf('>', i)
          if (e < 0) { hard = true; i = n } else { depth -= 1; i = e + 1 }
        } else if (line.startsWith("<!--", i)) { // comment
          val e = line.indexOf("-->", i)
          if (e < 0) { hard = true; i = n } else i = e + 3
        } else if (line.startsWith("<![CDATA[", i)) { // CDATA section
          val e = line.indexOf("]]>", i)
          if (e < 0) { hard = true; i = n } else i = e + 3
        } else if (i + 1 < n && (line.charAt(i + 1) == '!' || line.charAt(i + 1) == '?')) {
          // declaration (DOCTYPE — internal subsets span lines and flag
          // hard via the missing '>') or processing instruction
          val e = line.indexOf('>', i)
          if (e < 0) { hard = true; i = n } else i = e + 1
        } else { // open tag
          var j = i + 1
          while (j < n && (line.charAt(j).isLetterOrDigit || "._-:".indexOf(line.charAt(j)) >= 0)) j += 1
          val name = line.substring(i + 1, j)
          var quote: Char = 0
          var e = -1
          var k = j
          while (k < n && e < 0) {
            val ch = line.charAt(k)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            else if (ch == '>') e = k
            k += 1
          }
          if (e < 0) { hard = true; i = n } // tag spans lines
          else {
            if (!atLineStart && recordTypes(name)) mids ::= depth
            if (line.charAt(e - 1) != '/') depth += 1
            i = e + 1
          }
        }
      } else {
        if (!Character.isWhitespace(c)) {
          seenNonWs = true
          if (c == '/' && i + 1 < n && line.charAt(i + 1) == '>') hard = true // "/>" in text
        }
        i += 1
      }
    }
    LineScan(hard, mids)
  }

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
  /** The shared parse-one-chunk closure: strict mode propagates parse/
    * validation failures; permissive mode counts them in `acc` and
    * skips. A function VALUE, not a nested def: a def would pull the
    * whole enclosing frame (SparkSession included) into the task
    * closure.
    */
  private def mkTryParse(
      permissive: Boolean,
      validate: Boolean,
      acc: org.apache.spark.util.LongAccumulator): (Dtd, String, Long) => Option[XmlRecord] = {
    val strict = validate
    if (!permissive) (d, body, pos) => {
      val r = parseRecord(body, pos, if (strict) d.compiledModels else null)
      if (strict) r.foreach(validateAgainstDtd(d, _))
      r
    }
    else (d, body, pos) =>
      try {
        val r = parseRecord(body, pos, if (strict) d.compiledModels else null)
        if (strict) r.foreach(validateAgainstDtd(d, _))
        r
      } catch {
        case _: javax.xml.stream.XMLStreamException | _: RuntimeException =>
          acc.add(1L); None
      }
  }

  def readRows(
      spark: SparkSession,
      xmlPath: String,
      dtd: Dtd,
      minPartitions: Int = 0,
      permissive: Boolean = false,
      validate: Boolean = false,
      layout: String = "line"): DataFrame = {
    require(Set("line", "record", "auto")(layout),
      s"layout must be line|record|auto, got '$layout'")
    if (layout == "record")
      return readRowsSinglePass(spark, xmlPath, dtd, minPartitions, permissive, validate)
    val malformed = spark.sparkContext.longAccumulator("graft.xml.malformed")
    val tryParse = mkTryParse(permissive, validate, malformed)
    val types = dtd.recordTypes
    val root = dtd.root
    val startRe = ("""^\s*<(""" + types.map(java.util.regex.Pattern.quote).mkString("|") + """)[\s/>]""").r
    def isCandidate(line: String): Boolean = startRe.findFirstIn(line).isDefined

    val lines =
      if (minPartitions > 0) spark.sparkContext.textFile(xmlPath, minPartitions)
      else spark.sparkContext.textFile(xmlPath)

    // job 1: per-partition (net depth delta, min running depth, layout
    // scan) -> entry depth prefix sum. The min is the corrupted-split
    // guard: the line-level depth scan assumes tags do not span lines
    // and text never contains a literal "</" or "/>" (true for the
    // DBLP dump); when the assumption is violated the running depth
    // dips negative or the file does not close back to depth 0. The
    // layout scan additionally detects (a) tags spanning lines /
    // multi-line comments / "/>"-in-text ("hard" flags) and (b)
    // mid-line record start tags, kept as PARTITION-RELATIVE depths so
    // the driver can test absolute depth == 1 after the prefix sum —
    // a mid-line <i> at depth 2 inside a title is fine (DBLP inline
    // markup), a mid-line <article> at depth 1 is a missed record
    // boundary. `layout="auto"` falls back to the single-pass reader
    // on any violation instead of failing.
    val typesB = spark.sparkContext.broadcast(types)
    val deltas = lines.mapPartitions { it =>
      val ts = typesB.value
      var d = 0
      var minD = 0
      var hard = false
      val mids = scala.collection.mutable.Set.empty[Int]
      it.foreach { l =>
        val scan = scanLine(l, ts)
        if (scan.hardViolation) hard = true
        scan.midStartDepths.foreach { rd =>
          if (mids.size < 64) mids += d + rd else hard = true
        }
        d += depthDelta(l); if (d < minD) minD = d
      }
      Iterator.single((d, minD, hard, mids.toArray))
    }.collect()
    val depthIn = deltas.scanLeft(0)(_ + _._1)
    def minDepth(pi: Int) = deltas(pi)._2
    def midStarts(pi: Int) = deltas(pi)._4
    val depthViolated = depthIn.last != 0 ||
      deltas.indices.exists(pi => depthIn(pi) + minDepth(pi) < 0)
    val midViolated =
      deltas.indices.exists(pi => midStarts(pi).exists(r => depthIn(pi) + r == 1))
    if (layout == "auto" && (depthViolated || midViolated || deltas.exists(_._3)))
      // not line-formatted: hand the whole read to the single-pass
      // StAX-chunked reader (parallel per FILE, sequential within one)
      return readRowsSinglePass(spark, xmlPath, dtd, minPartitions, permissive, validate)
    deltas.indices.foreach { pi =>
      if (depthIn(pi) + minDepth(pi) < 0)
        throw new IllegalStateException(
          s"XML splitter invariant violated: element depth went negative inside input split $pi. " +
            "The line-level splitter requires record tags to begin a line, tags not to span lines, " +
            "and text content not to contain literal '</' or '/>'. Reformat the input (e.g. " +
            "xmllint --format) or re-read with layout=\"record\" (single-pass per file).")
    }
    if (depthIn.last != 0)
      throw new IllegalStateException(
        s"XML splitter invariant violated: final element depth is ${depthIn.last}, expected 0 " +
          "(unclosed or over-closed tags as seen by the line-level scan). The splitter requires " +
          "record tags to begin a line, tags not to span lines, and text content not to contain " +
          "literal '</' or '/>'. Reformat the input (e.g. xmllint --format) or re-read with " +
          "layout=\"record\" (single-pass per file).")
    if (midViolated)
      throw new IllegalStateException(
        "XML layout violation: a record start tag does not begin its line (depth-1 mid-line " +
          "start), so the line splitter would silently merge that record into the previous " +
          "chunk. Re-read with layout=\"auto\" or layout=\"record\", or reformat the input " +
          "(e.g. xmllint --format).")

    // job 2: boundary fragments per partition — (head lines before the
    // first true start; tail lines from the last true start; #starts).
    // Driver memory bound: the stitch collects at most one head+tail
    // pair per partition, each capped at `maxFrag` chars (default
    // 64 MiB, spark.graft.xml.maxBoundaryFragmentBytes), so the driver
    // holds <= 2 x cap x #partitions in the worst case. A record
    // larger than the cap would otherwise accumulate WHOLE partitions
    // as head strings — the guard fails fast with the layout="record"
    // remediation instead.
    val maxFrag = spark.conf.getOption("spark.graft.xml.maxBoundaryFragmentBytes")
      .map(_.toLong).getOrElse(64L << 20)
    def oversizeFragmentMsg(cap: Long, pi: Int): String =
      s"XML boundary fragment exceeds $cap bytes in input split $pi: a record at a split " +
        "boundary is larger than the stitch cap, so the line splitter's driver-side " +
        "boundary stitch would accumulate whole partitions in driver memory. Re-read " +
        "with layout=\"record\" (single-pass per file), or raise " +
        "spark.graft.xml.maxBoundaryFragmentBytes if such records are expected."
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
        // head grows until the FIRST start — guard while accumulating;
        // tails are checked once at partition end: only the final tail
        // reaches the driver, and a large mid-partition record (whose
        // tail is discarded at the next start) is not a stitch risk
        if (head.length > maxFrag)
          throw new IllegalStateException(oversizeFragmentMsg(maxFrag, pi))
        depth += depthDelta(line)
      }
      if (tail.length > maxFrag)
        throw new IllegalStateException(oversizeFragmentMsg(maxFrag, pi))
      Iterator.single((pi, head.toString, tail.toString, n))
    }.collect().sortBy(_._1)

    val dtdB = spark.sparkContext.broadcast(dtd)
    val rootClose = s"</$root>"
    // sharded input (a glob of self-contained dump files): the chunk
    // holding one file's LAST record also swallows the NEXT file's
    // prolog + root-open lines (they precede the next record start).
    // Strip FULL-LINE prolog/root markers before the parse — a
    // full-line-only match cannot mask the mid-line record start the
    // corrupted-split guard exists to catch. java Pattern is
    // serializable, so the compiled form ships in the task closure.
    val interFileNoise = java.util.regex.Pattern.compile(
      "(?m)^\\s*(<\\?xml[^>]*\\?>|<!DOCTYPE[^>]*>|<" +
        java.util.regex.Pattern.quote(root) + "(\\s[^>]*)?>)\\s*$")
    def sanitizeChunk(chunk: String): String =
      interFileNoise.matcher(chunk.replace(rootClose, "")).replaceAll("")
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
            dtdB.value.expandEntities(sanitizeChunk(chunk.toString)),
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
        tryParse(dtdB.value, dtdB.value.expandEntities(sanitizeChunk(text)), pos)
      }

    val rows = inner.union(boundaryRdd).map { r =>
      Row(r.recordType, r.pos, r.attrs,
        r.children.map(c => Row(c.tag, c.text, c.attrs)))
    }
    spark.createDataFrame(rows, rowSchema)
  }

  /** Streaming record chunker for arbitrary-layout XML: a minimal
    * quote/comment/CDATA/PI-aware lexer over a character stream that
    * emits the raw text of each record-type element opening at depth 1
    * (directly under the root) — no line-structure assumptions at all.
    * Entity references pass through untouched; the caller expands them
    * with [[Dtd.expandEntities]] before the StAX parse, exactly like
    * the line-mode path, so both layouts share one parse semantics.
    * Memory is bounded by one record chunk.
    */
  private[xml] final class RecordChunkIterator(
      reader: java.io.Reader,
      recordTypes: Set[String]) extends Iterator[String] {
    private var depth = 0
    private var buf: StringBuilder = null // non-null while inside a record
    private var pending: String = null
    private var eof = false

    override def hasNext: Boolean = {
      if (pending == null && !eof) advance()
      pending != null
    }

    override def next(): String = {
      if (!hasNext) throw new NoSuchElementException("RecordChunkIterator")
      val r = pending; pending = null; r
    }

    private def advance(): Unit = {
      while (pending == null && !eof) {
        val c = reader.read()
        if (c < 0) { eof = true; reader.close() }
        else if (c == '<') handleMarkup()
        else if (buf != null) buf.append(c.toChar)
      }
    }

    /** Consume chars until the literal `end` has been consumed,
      * appending everything to `sb` when capturing. Rolling-window
      * match, so terminators with repeated prefixes ("x]]]>") land
      * correctly.
      */
    private def consumeUntil(end: String, sb: StringBuilder): Unit = {
      val k = end.length
      val tail = new Array[Char](k)
      var n = 0
      var done = false
      while (!done) {
        val c = reader.read()
        if (c < 0) { eof = true; done = true }
        else {
          if (sb != null) sb.append(c.toChar)
          var i = 0
          while (i < k - 1) { tail(i) = tail(i + 1); i += 1 }
          tail(k - 1) = c.toChar
          n += 1
          if (n >= k) {
            var ok = true
            var j = 0
            while (ok && j < k) { if (tail(j) != end.charAt(j)) ok = false; j += 1 }
            if (ok) done = true
          }
        }
      }
    }

    private def handleMarkup(): Unit = reader.read() match {
      case -1 => eof = true
      case '!' =>
        reader.read() match {
          case '-' => // comment "<!--": the second '-' follows
            reader.read()
            if (buf != null) buf.append("<!--")
            consumeUntil("-->", buf)
          case '[' => // CDATA "<![CDATA[": consume the remaining "CDATA["
            var i = 0
            while (i < 6) { reader.read(); i += 1 }
            if (buf != null) buf.append("<![CDATA[")
            consumeUntil("]]>", buf)
          case first => // DOCTYPE/decl: skip to '>' outside quotes/internal subset
            var c = first
            var inSubset = false
            var quote = 0
            var done = false
            while (!done) {
              if (c < 0) { eof = true; done = true }
              else if (quote != 0) { if (c == quote) quote = 0 }
              else if (c == '"' || c == '\'') quote = c
              else if (c == '[') inSubset = true
              else if (c == ']') inSubset = false
              else if (c == '>' && !inSubset) done = true
              if (!done) c = reader.read()
            }
          // declarations live in the prolog, never inside a record
        }
      case '?' => // processing instruction
        if (buf != null) buf.append("<?")
        consumeUntil("?>", buf)
      case '/' => // close tag
        val sb = new StringBuilder("</")
        var c = reader.read()
        while (c >= 0 && c != '>') { sb.append(c.toChar); c = reader.read() }
        if (c < 0) eof = true else sb.append('>')
        if (buf != null) buf.append(sb)
        depth -= 1
        if (buf != null && depth == 1) { pending = buf.toString; buf = null }
      case first => // open tag, quote-aware scan for its '>'
        val sb = new StringBuilder("<")
        sb.append(first.toChar)
        var quote = 0
        var c = reader.read()
        while (c >= 0 && !(c == '>' && quote == 0)) {
          if (quote != 0) { if (c == quote) quote = 0 }
          else if (c == '"' || c == '\'') quote = c
          sb.append(c.toChar)
          c = reader.read()
        }
        if (c < 0) eof = true else sb.append('>')
        val tag = sb.toString
        val selfClosing = tag.length >= 3 && tag.charAt(tag.length - 2) == '/'
        var j = 1
        while (j < tag.length &&
          (tag.charAt(j).isLetterOrDigit || "._-:".indexOf(tag.charAt(j)) >= 0)) j += 1
        val name = tag.substring(1, j)
        if (buf == null && depth == 1 && recordTypes(name)) buf = new StringBuilder
        if (buf != null) buf.append(tag)
        if (selfClosing) {
          if (buf != null && depth == 1) { pending = buf.toString; buf = null }
        } else depth += 1
    }
  }

  /** Arbitrary-layout fallback reader (the capability gap vs the
    * reference's iterparse, /root/reference/XMLToCSV.py:109,152, which
    * accepts any physical layout): one sequential StAX-chunked pass
    * PER FILE, files processed in parallel (`binaryFiles`). Record
    * `pos` is (sorted-file-ordinal << 40 | record-ordinal) — monotonic
    * in document order like the line path.
    *
    * Scale note: an arbitrary-layout single file is inherently
    * sequential to split safely (any byte offset may sit inside a tag,
    * comment, or CDATA section, and only a prefix scan disambiguates);
    * parallelism comes from the file count. Line-formatted dumps —
    * the common case — should use (and with layout="auto"
    * automatically keep) the distributed line splitter.
    */
  def readRowsSinglePass(
      spark: SparkSession,
      xmlPath: String,
      dtd: Dtd,
      minPartitions: Int = 0,
      permissive: Boolean = false,
      validate: Boolean = false): DataFrame = {
    val malformed = spark.sparkContext.longAccumulator("graft.xml.malformed")
    val tryParse = mkTryParse(permissive, validate, malformed)
    val files =
      if (minPartitions > 0) spark.sparkContext.binaryFiles(xmlPath, minPartitions)
      else spark.sparkContext.binaryFiles(xmlPath)
    // deterministic file ordinal: sorted path order (metadata-only job)
    val fileIdx = files.map(_._1).collect().sorted.zipWithIndex.toMap
    val idxB = spark.sparkContext.broadcast(fileIdx)
    val dtdB = spark.sparkContext.broadcast(dtd)
    val rows = files.flatMap { case (path, pds) =>
      val d = dtdB.value
      val fi = idxB.value(path).toLong
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(pds.open(), java.nio.charset.StandardCharsets.UTF_8), 1 << 16)
      val chunks = new RecordChunkIterator(reader, d.recordTypes)
      var ordinal = -1L
      chunks.flatMap { chunk =>
        ordinal += 1
        tryParse(d, d.expandEntities(chunk), (fi << 40) | ordinal)
      }
    }.map { r =>
      Row(r.recordType, r.pos, r.attrs, r.children.map(c => Row(c.tag, c.text, c.attrs)))
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
    * (itself and all descendants) must be declared in the DTD, every
    * attribute must be declared in the element's ATTLIST, and
    * #REQUIRED attributes must be present. Content models (child
    * ordering/cardinality, EMPTY, text-in-element-content) are checked
    * structurally during the parse itself (see the `models` parameter
    * of [[parseRecord]]) because the flattened record no longer knows
    * each element's direct children.
    */
  private[xml] def validateAgainstDtd(dtd: Dtd, rec: XmlRecord): Unit = {
    def checkAttrs(tag: String, attrs: Map[String, String]): Unit = {
      val declared = dtd.declaredAttrs.getOrElse(tag, Set.empty)
      attrs.keys.find(!declared.contains(_)).foreach { a =>
        throw new IllegalStateException(
          s"DTD validation failed: attribute '$a' of <$tag> is not declared in the DTD")
      }
      dtd.requiredAttrs.getOrElse(tag, Set.empty).find(!attrs.contains(_)).foreach { a =>
        throw new IllegalStateException(
          s"DTD validation failed: required attribute '$a' of <$tag> is missing")
      }
      dtd.enumAttrs.getOrElse(tag, Map.empty).foreach { case (a, allowed) =>
        attrs.get(a).filterNot(allowed).foreach { v =>
          throw new IllegalStateException(
            s"DTD validation failed: attribute '$a' of <$tag> has value '$v' outside its " +
              s"enumeration ${allowed.toSeq.sorted.mkString("(", "|", ")")}")
        }
      }
      dtd.fixedAttrs.getOrElse(tag, Map.empty).foreach { case (a, want) =>
        attrs.get(a).filter(_ != want).foreach { v =>
          throw new IllegalStateException(
            s"DTD validation failed: #FIXED attribute '$a' of <$tag> must be '$want', got '$v'")
        }
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

  /** Per-open-element frame for structural (content-model) validation:
    * the ";"-joined direct-child tag tokens in document order, plus
    * text presence flags.
    */
  private final class VFrame {
    val children = new StringBuilder
    var anyText = false
    var nonWsText = false
  }

  /** Parse one record chunk: the first element is the record; every
    * nested element (any depth) becomes an XmlChild with its
    * before-first-child text, mirroring lxml `.text`.
    *
    * When `models` is non-null, every element's direct-child sequence
    * and text content are checked against its compiled DTD content
    * model as the element CLOSES — the flattened XmlRecord cannot
    * carry this (it loses nesting), so strict mode validates here.
    */
  private[xml] def parseRecord(
      body: String,
      pos: Long,
      models: Map[String, Dtd.ContentModel] = null): Option[XmlRecord] = {
    val r = factory.createXMLStreamReader(new StringReader(body))
    try {
      var recordType: String = null
      var recordAttrs: Map[String, String] = Map.empty
      val children = Seq.newBuilder[XmlChild]
      var depth = 0
      // per-depth state for the element currently open at that depth
      var stack: List[(String, Map[String, String], StringBuilder, Boolean)] = Nil
      // structural-validation frames, one per open element (record incl.)
      var vstack: List[VFrame] = Nil

      def attrsOf(): Map[String, String] =
        (0 until r.getAttributeCount).map(i =>
          r.getAttributeLocalName(i) -> r.getAttributeValue(i)).toMap

      def vClose(tag: String): Unit =
        if (models != null && vstack.nonEmpty) {
          val f = vstack.head
          vstack = vstack.tail
          models.get(tag).foreach(_.check(f.children.toString, f.anyText, f.nonWsText))
        }

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
            if (models != null) {
              if (vstack.nonEmpty)
                vstack.head.children.append(r.getLocalName).append(';')
              vstack = new VFrame :: vstack
            }
            depth += 1
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            stack match {
              case (t, a, sb, seenChild) :: _ if !seenChild => sb.append(r.getText)
              case _ => // record-level text or text after a nested child: ignored (lxml .text semantics)
            }
            if (models != null && vstack.nonEmpty) {
              val txt = r.getText
              if (txt.nonEmpty) {
                vstack.head.anyText = true
                if (!vstack.head.nonWsText) {
                  var i = 0
                  while (i < txt.length && Character.isWhitespace(txt.charAt(i))) i += 1
                  if (i < txt.length) vstack.head.nonWsText = true
                }
              }
            }
          case XMLStreamConstants.END_ELEMENT =>
            depth -= 1
            if (depth == 0) { vClose(recordType); done = true }
            else {
              val (t, a, sb, _) = stack.head
              stack = stack.tail
              children += XmlChild(t, if (sb.isEmpty) null else sb.toString, a)
              vClose(t)
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
