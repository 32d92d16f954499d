package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  private def mediaDf = {
    import spark.implicits._
    Seq((0L, "payload-zero"), (1L, "payload-one-longer"), (2L, "p2"))
      .toDF("media_id", "s")
      .select(col("media_id"), encode(col("s"), "utf-8").as("payload"))
  }

  test("withMetadata attaches typed struct with byte length") {
    val df = Multimodal.withMetadata(mediaDf, col("media_id"), col("payload"), "image")
    val got = df.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(got.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.mediaMetaType.fields.map(f => (f.name, f.dataType)).toSeq)
    val r = df.where(col("media_id") === 0).select("meta.n_bytes", "meta.media_type").head()
    assert(r.getLong(0) == "payload-zero".length.toLong)
    assert(r.getString(1) == "image")
  }

  test("extractFeatures: fixed-dim deterministic features via partition-batched codec") {
    val withMeta = Multimodal.withMetadata(mediaDf, col("media_id"), col("payload"), "image")
    val f1 = Multimodal.extractFeatures(withMeta, new Multimodal.FakeCodec, dim = 8, partitions = 2)
    val f2 = Multimodal.extractFeatures(withMeta, new Multimodal.FakeCodec, dim = 8, partitions = 3)
    assert(f1.schema == Multimodal.featureSchema)
    val a = f1.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = f2.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a.keySet == Set(0L, 1L, 2L))
    assert(a.forall(_._2.length == 8))
    assert(a == b) // partitioning must not change results
    assert(a(0L) != a(1L)) // content-sensitive
  }

  test("sampleFrames fans out k frames per payload with indices") {
    val withMeta = Multimodal.withMetadata(mediaDf, col("media_id"), col("payload"), "video")
    val frames = Multimodal.sampleFrames(withMeta, k = 4)
    val counts = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(0L -> 4L, 1L -> 4L, 2L -> 4L))
    val idxs = frames.where(col("media_id") === 1).select("frame_idx")
      .collect().map(_.getInt(0)).sorted
    assert(idxs.toSeq == Seq(0, 1, 2, 3))
  }

  test("resize updates the metadata contract") {
    val withMeta = Multimodal.withMetadata(mediaDf, col("media_id"), col("payload"), "image")
    val resized = Multimodal.resize(withMeta, new Multimodal.FakeCodec, 224, 224)
    val r = resized.select("meta.width", "meta.height").head()
    assert(r.getInt(0) == 224 && r.getInt(1) == 224)
  }
}
