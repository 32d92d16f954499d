package graft.sink

import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** WARC-style crawl-archive interchange: the wire format a web-scale
  * training-data pipeline ingests (CommonCrawl ships ~64k WARC files
  * per crawl) and re-emits for downstream consumers.
  *
  * The format here is the WARC/1.0 response-record envelope: a header
  * block of `Name: value` lines introduced by `WARC/1.0`, a blank
  * line, then exactly `Content-Length` BYTES of payload, then a blank
  * separator line. Content-Length is authoritative — payloads may
  * contain blank lines or even literal `WARC/1.0` text without
  * confusing the parser, which is precisely why crawl archives use
  * length-delimited records instead of line markers (and why a naive
  * line-split reader is wrong).
  *
  * Scale shape: one archive = many files. The WRITER shards
  * deterministically by a key column (same contract as the range-shard
  * exporters: membership is a pure function of the data) and streams
  * each shard's records through one task. The READER parallelizes over
  * FILES — each file is a sequential length-delimited scan (a byte
  * offset inside a payload is unparseable without the preceding
  * header, so intra-file splits are inherently unsafe — the same
  * argument as the arbitrary-layout XML reader), which matches the
  * real-world layout: crawls are delivered as thousands of ~1 GB
  * files, so file-level parallelism saturates a cluster long before
  * per-file sequential IO matters.
  */
object WarcArchive {

  /** Write `df` as a `nShards`-file WARC archive under
    * `path/shard=N/`, sharded by the deterministic rule
    * `pmod(id, nShards)` — membership and intra-file order (ascending
    * id) are pure functions of the data. The record envelope is
    * rendered as ONE codegen'd string expression (`octet_length`
    * supplies the UTF-8 Content-Length), so the whole write is a
    * projection + one shard exchange + Spark's own text sink — no
    * custom IO path to maintain, and the text writer's per-row `\n`
    * lands between records where the parser skips blanks anyway.
    * Returns a (shard, n_records, sum_chars) manifest computed from
    * re-READING what was written — it certifies the files, not the
    * plan.
    */
  def write(df: DataFrame, id: Column, uri: Column, text: Column,
      path: String, nShards: Int,
      date: String = "2020-01-01T00:00:00Z"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val spark = df.sparkSession
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:graft:doc:"),
      col("__id"), lit(">\r\nWARC-Target-URI: "),
      coalesce(col("__uri"), lit("")),
      lit(s"\r\nWARC-Date: $date\r\nContent-Length: "),
      coalesce(octet_length(col("__text")), lit(0)),
      lit("\r\n\r\n"), coalesce(col("__text"), lit("")), lit("\r\n"))
    df.select(id.cast("long").as("__id"), uri.cast("string").as("__uri"),
        text.cast("string").as("__text"))
      .withColumn("shard", pmod(col("__id"), lit(nShards.toLong)))
      // one task per shard -> one file per shard dir, rows id-sorted
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "__id")
      .select(col("shard"), rec.as("value"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").text(path)
    read(spark, s"$path/shard=*/part-*")
      .groupBy(pmod(col("doc_id"), lit(nShards.toLong)).as("shard"))
      .agg(count(lit(1)).as("n_records"), sum(length(col("text"))).as("sum_chars"))
      .orderBy("shard")
  }

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("text", StringType, nullable = true)))

  /** Parse one WARC stream sequentially: header lines to the blank
    * line, then exactly Content-Length payload bytes. Loud failure on
    * a malformed envelope (a truncated archive should fail the job,
    * not silently drop records).
    */
  private[sink] def parseStream(in: java.io.InputStream): Iterator[Row] = new Iterator[Row] {
    val din = new java.io.DataInputStream(new java.io.BufferedInputStream(in, 1 << 16))
    private var nextRow: Row = null
    private var eof = false

    /** Read one \r\n- (or \n-) terminated header line as UTF-8;
      * null at EOF.
      */
    private def readLine(): String = {
      val buf = new java.io.ByteArrayOutputStream(128)
      var b = din.read()
      if (b == -1) return null
      while (b != -1 && b != '\n') {
        if (b != '\r') buf.write(b)
        b = din.read()
      }
      new String(buf.toByteArray, "UTF-8")
    }

    private def advance(): Unit = {
      nextRow = null
      // skip blank separator lines between records
      var line = readLine()
      while (line != null && line.isEmpty) line = readLine()
      if (line == null) { eof = true; return }
      if (line != "WARC/1.0")
        throw new IllegalStateException(s"expected WARC/1.0 record header, got '$line'")
      var id = -1L; var uri: String = null; var date: String = null; var len = -1L
      var h = readLine()
      while (h != null && h.nonEmpty) {
        val i = h.indexOf(':')
        if (i < 0) throw new IllegalStateException(s"malformed WARC header line '$h'")
        val name = h.substring(0, i).trim
        val value = h.substring(i + 1).trim
        name match {
          case "WARC-Record-ID" =>
            val m = "<urn:graft:doc:(\\d+)>".r.findFirstMatchIn(value)
            id = m.map(_.group(1).toLong).getOrElse(-1L)
          case "WARC-Target-URI" => uri = value
          case "WARC-Date" => date = value
          case "Content-Length" => len = value.toLong
          case _ => () // tolerate unknown headers (real archives have many)
        }
        h = readLine()
      }
      if (h == null) throw new IllegalStateException("EOF inside WARC header block")
      if (len < 0) throw new IllegalStateException("WARC record missing Content-Length")
      val payload = new Array[Byte](len.toInt)
      din.readFully(payload)
      nextRow = Row(id, uri, date, new String(payload, "UTF-8"))
    }

    override def hasNext: Boolean = {
      if (nextRow == null && !eof) advance()
      nextRow != null
    }
    override def next(): Row = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRow; nextRow = null; r
    }
  }

  /** Read a WARC archive glob as (doc_id, uri, warc_date, text) —
    * files in parallel, each a sequential length-delimited scan.
    */
  def read(spark: SparkSession, glob: String): DataFrame = {
    val files = spark.sparkContext.binaryFiles(glob)
    val rows = files.flatMap { case (_, pds) => parseStream(pds.open()) }
    spark.createDataFrame(rows, schema)
  }
}
