package graft.sink

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class WarcArchiveSpec extends SparkTestBase {

  test("roundtrip: adversarial payloads survive length-delimited parse") {
    import spark.implicits._
    val docs = Seq(
      (0L, "http://a/0", "plain text"),
      // payload containing blank lines and a literal record marker —
      // the cases that break any line-oriented parser
      (1L, "http://a/1", "line one\n\nWARC/1.0\nContent-Length: 99\n\nline two"),
      (2L, "http://a/2", "unicode: é ü 中文 — 4-byte: 😀"),
      (3L, "http://a/3", ""),
      (4L, "http://a/4", "\r\nleading crlf")).toDF("doc_id", "url", "text")
    val dir = java.nio.file.Files.createTempDirectory("warc").toString
    val manifest = WarcArchive.write(docs, col("doc_id"), col("url"),
      col("text"), dir, nShards = 2).collect()
    assert(manifest.map(_.getAs[Long]("n_records")).sum == 5L)
    val back = WarcArchive.read(spark, s"$dir/shard=*/part-*")
      .orderBy("doc_id")
      .select("doc_id", "uri", "text")
      .as[(Long, String, String)].collect().toSeq
    assert(back == Seq(
      (0L, "http://a/0", "plain text"),
      (1L, "http://a/1", "line one\n\nWARC/1.0\nContent-Length: 99\n\nline two"),
      (2L, "http://a/2", "unicode: é ü 中文 — 4-byte: 😀"),
      (3L, "http://a/3", ""),
      (4L, "http://a/4", "\r\nleading crlf")))
  }

  test("writer shards deterministically: pmod(id) membership, id-sorted files") {
    import spark.implicits._
    val docs = (0L until 20L).map(i => (i, s"http://x/$i", s"doc $i"))
      .toDF("doc_id", "url", "text")
    val dir = java.nio.file.Files.createTempDirectory("warc").toString
    WarcArchive.write(docs, col("doc_id"), col("url"), col("text"),
      dir, nShards = 4).collect()
    for (shard <- 0 until 4) {
      val ids = WarcArchive.read(spark, s"$dir/shard=$shard/part-*")
        .select("doc_id").as[Long].collect().toSeq
      assert(ids == ids.sorted, s"shard $shard not id-sorted: $ids")
      assert(ids.forall(_ % 4 == shard), s"shard $shard has foreign ids: $ids")
    }
  }

  test("reader tolerates unknown headers, fails loudly on truncation") {
    val extra = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "X-Unknown-Header: whatever\r\n" +
      "WARC-Record-ID: <urn:graft:doc:7>\r\nWARC-Target-URI: u\r\n" +
      "WARC-Date: d\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
    val rows = WarcArchive.parseStream(
      new java.io.ByteArrayInputStream(extra.getBytes("UTF-8"))).toSeq
    assert(rows.map(r => (r.getLong(0), r.getString(3))) == Seq((7L, "hello")))

    val truncated = "WARC/1.0\r\nContent-Length: 100\r\n\r\nshort"
    intercept[Exception] {
      WarcArchive.parseStream(
        new java.io.ByteArrayInputStream(truncated.getBytes("UTF-8"))).toSeq
    }
    val noLength = "WARC/1.0\r\nWARC-Record-ID: <urn:graft:doc:1>\r\n\r\n"
    intercept[IllegalStateException] {
      WarcArchive.parseStream(
        new java.io.ByteArrayInputStream(noLength.getBytes("UTF-8"))).toSeq
    }
  }
}
