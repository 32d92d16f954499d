package graft.sink

import java.io.{BufferedInputStream, BufferedOutputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.DataFrame

/** CSV sink with the reference's dialect (W1/W2): `;` delimiter,
  * minimal quoting with `"` doubled as the escape, empty string for
  * missing cells (/root/reference/XMLToCSV.py:89-105).
  *
  * Spark's univocity writer with quote == escape reproduces Python
  * csv.QUOTE_MINIMAL + doublequote (we emit LF line endings where the
  * reference's csv module emits CRLF — documented divergence).
  *
  * Two modes:
  *  - `writeDir`: a normal distributed write (directory of parts) —
  *    the 100 TB path; header lines live in sidecar files.
  *  - `writeSingleFile`: distributed write then a driver-side merge of
  *    the parts into one exact file, optionally prepending a header
  *    line — byte-parity with the reference's single-file outputs.
  *    Parts are merged by ascending partition index, which is the
  *    DataFrame's partition order. PRECONDITION for ordered output:
  *    the caller must pass a df whose partition order IS the desired
  *    row order (e.g. range-partitioned by a sort, or a cached df
  *    whose partitions were built in order) — the merge preserves
  *    partition order, it does not sort rows.
  */
object CsvSink {

  private def writer(df: DataFrame, header: Boolean) =
    df.write
      .mode("overwrite")
      .option("sep", ";")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("emptyValue", "")
      .option("nullValue", "")
      // Spark's CSV WRITER trims cell whitespace by default; the
      // reference writes values verbatim (Python csv), and real DBLP
      // titles with inline markup capture with a trailing space
      // (lxml `.text` truncation) — preserve them exactly
      .option("ignoreLeadingWhiteSpace", false)
      .option("ignoreTrailingWhiteSpace", false)
      .option("header", header)

  def writeDir(df: DataFrame, path: String, header: Boolean): Unit =
    writer(df, header).csv(path)

  def writeSingleFile(df: DataFrame, path: String, headerLine: Option[String]): Unit = {
    val tmp = path + ".spark-tmp"
    // No coalesce(1): a single-partition plan would run the ENTIRE
    // upstream chain (pivot+join+sort) in one task — measured 110s of
    // a 175s DBLP-500k run. A distributed write keeps every stage
    // parallel; a sorted df arrives range-partitioned, so part-file
    // name order IS global order and the driver merge below yields
    // byte-identical output.
    writer(df, header = false).csv(tmp)
    val target = Paths.get(path)
    Files.deleteIfExists(target)
    val out = new BufferedOutputStream(new FileOutputStream(path))
    try {
      headerLine.foreach(h => out.write((h + "\n").getBytes("UTF-8")))
      val stream = Files.list(Paths.get(tmp))
      val parts =
        try {
          val it = stream.iterator()
          val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
          while (it.hasNext) buf += it.next()
          // sort by the PARSED partition index, not the raw name: a
          // lexicographic name sort mis-orders once the index width
          // overflows its zero-padding (part-100000 < part-99999)
          buf.filter(_.getFileName.toString.startsWith("part-"))
            .sortBy(p => partIndex(p.getFileName.toString))
        } finally stream.close()
      parts.foreach { p =>
        val in = new BufferedInputStream(new FileInputStream(p.toFile))
        try {
          val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
      }
    } finally out.close()
    deleteRecursively(Paths.get(tmp))
  }

  /** Partition index from a Spark part-file name
    * (`part-<idx>-<uuid>…` → idx). Files that don't parse sort last,
    * tie-broken by name, so an unexpected layout still merges
    * deterministically.
    */
  private[sink] def partIndex(name: String): (Long, String) = {
    val rest = name.stripPrefix("part-")
    val digits = rest.takeWhile(_.isDigit)
    (if (digits.isEmpty) Long.MaxValue else digits.toLong, name)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
