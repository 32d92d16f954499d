package graft.sink

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AvroArchiveSpec extends SparkTestBase {

  test("write/read roundtrip preserves rows, nulls, and types; manifest certifies files") {
    import spark.implicits._
    val df = Seq(
      (0L, Some("alpha"), Some(1.5), true),
      (1L, None, Some(-2.25), false),
      (2L, Some("gamma"), None, true),
      (3L, Some(""), Some(0.0), false),
      (4L, Some("delta;quoted \"x\""), Some(9.75), true))
      .toDF("id", "s", "d", "b")
    val dir = java.nio.file.Files.createTempDirectory("avro_spec").toString + "/arch"
    val manifest = AvroArchive.write(df, col("id"), 2, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // shard = id % 2: even ids 0,2,4 -> shard 0; odd 1,3 -> shard 1
    assert(manifest == Seq((0L, 3L, 0L, 4L), (1L, 2L, 1L, 3L)))
    val back = AvroArchive.read(spark, s"$dir/shard=*/part-*.avro", df.schema)
      .orderBy("id")
      .as[(Long, Option[String], Option[Double], Boolean)].collect().toSeq
    val orig = df.orderBy("id")
      .as[(Long, Option[String], Option[Double], Boolean)].collect().toSeq
    assert(back == orig)
  }

  test("re-running the export writes byte-identical files (deterministic sync marker)") {
    import spark.implicits._
    val df = (0L until 50L).map(i => (i, s"text-$i", i * 3 % 7))
      .toDF("id", "t", "v")
    val dir = java.nio.file.Files.createTempDirectory("avro_stab").toString + "/arch"
    def fileHashes(): Map[String, String] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(_.getName.startsWith("shard="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".avro")).map { f =>
          val bytes = java.nio.file.Files.readAllBytes(f.toPath)
          val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
            .map("%02x".format(_)).mkString
          (d.getName + "/" + f.getName) -> h
        }).toMap
    }
    AvroArchive.write(df, col("id"), 4, dir).collect()
    val first = fileHashes()
    assert(first.size == 4)
    // a different input partitioning must not change a single byte
    AvroArchive.write(df.repartition(13), col("id"), 4, dir).collect()
    assert(fileHashes() == first, "export must be byte-stable across reruns")
  }

  test("rejects nested column types loudly") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      AvroArchive.write(df, col("id"), 2,
        java.nio.file.Files.createTempDirectory("avro_bad").toString + "/arch")
    }
    assert(e.getMessage.contains("flat primitive columns"))
  }
}
