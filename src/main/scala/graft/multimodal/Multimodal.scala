package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media
  * (image/audio/video) travels as an opaque `binary` column with a
  * typed metadata struct alongside. The Spark-side plumbing — schema,
  * batch shape, partition sizing — is real and tested; the actual
  * codec work is stubbed behind [[MediaCodec]] (decode libraries are
  * not available in this environment) with a deterministic fake so
  * tests exercise the full path.
  *
  * Scale design: decode runs in `mapPartitions` so each task
  * amortizes codec init across its whole partition (the moral
  * equivalent of a Python `mapInPandas` batch UDF); media bytes never
  * pass through a shuffle — all derived features are computed in the
  * same stage as the scan, and only compact features/metadata flow on.
  */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false), // image | audio | video
    StructField("format", StringType, nullable = true),      // png, wav, mp4, …
    StructField("width", IntegerType, nullable = true),      // image/video
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true), // audio
    StructField("n_frames", IntegerType, nullable = true),    // video/audio frames
    StructField("n_bytes", LongType, nullable = false)))

  /** A decoded media batch row: id, fixed-shape float features. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Codec seam. Real deployments plug in an image/audio library here;
    * the default implementation is a deterministic fake (content-hash
    * driven) so the distributed plumbing is testable without codecs.
    */
  trait MediaCodec extends Serializable {
    /** Decode + feature-extract one payload into `dim` floats. */
    def features(payload: Array[Byte], dim: Int): Array[Float]
    /** Probe structural metadata without full decode. */
    def probe(payload: Array[Byte]): (String, Option[Int], Option[Int])
  }

  /** Deterministic fake codec: features are a seeded hash cascade of
    * the payload — stable across runs/executors, no external libs.
    * A real codec would replace this class only; every signature,
    * partition shape and schema stays identical.
    */
  final class FakeCodec extends MediaCodec {
    override def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      var d = 0
      while (d < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17 // xorshift
        out(d) = (h % 1000L) / 1000.0f
        d += 1
      }
      out
    }
    override def probe(payload: Array[Byte]): (String, Option[Int], Option[Int]) =
      ("octet-stream", Some(payload.length % 640), Some(payload.length % 480))
  }

  /** Attach the metadata struct to a raw (id, payload) media frame.
    * Pure column expressions except the probe, which is a per-row
    * codec call kept inside the scan stage.
    */
  def withMetadata(df: DataFrame, id: Column, payload: Column, mediaType: String): DataFrame =
    df.select(
      id.as("media_id"),
      payload.as("payload"),
      struct(
        lit(mediaType).as("media_type"),
        lit(null).cast(StringType).as("format"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        lit(null).cast(IntegerType).as("n_frames"),
        octet_length(payload).cast(LongType).as("n_bytes")).as("meta"))

  /** Feature extraction: mapPartitions batch decode. Input must carry
    * (media_id: long, payload: binary); output is [[featureSchema]].
    * Repartition upstream so a partition's payload bytes fit executor
    * memory (e.g. `maxRecordsPerPartition` via repartition on count) —
    * the reason this takes a partition budget rather than guessing.
    */
  def extractFeatures(df: DataFrame, codec: MediaCodec, dim: Int, partitions: Int = 0): DataFrame = {
    val in = if (partitions > 0) df.repartition(partitions) else df
    val spark = df.sparkSession
    val rdd = in.select(col("media_id").cast(LongType), col("payload")).rdd
      .mapPartitions { it =>
        // codec init happens once per task, amortized over the batch
        it.map { r =>
          val feats = codec.features(r.getAs[Array[Byte]](1), dim)
          Row(r.getLong(0), feats.toSeq)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame sampling stub for video-like payloads: deterministically
    * pick `k` byte-offsets as "frames" (a real codec samples decoded
    * frames; the slicing/fan-out shape is what matters here). Output:
    * one row per sampled frame with its index.
    */
  def sampleFrames(df: DataFrame, k: Int): DataFrame =
    df.select(
      col("media_id"),
      posexplode(transform(sequence(lit(0), lit(k - 1)), i => {
        val step = greatest(octet_length(col("payload")).cast("long") / k, lit(1L))
        substring(col("payload"), (i * step + 1).cast("int"), lit(64))
      })))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")

  /** Resize stub: declares the output shape contract (w×h) in the
    * metadata while passing the payload through the codec seam.
    */
  def resize(df: DataFrame, codec: MediaCodec, w: Int, h: Int): DataFrame =
    df.withColumn("meta", col("meta")
      .withField("width", lit(w))
      .withField("height", lit(h)))
}
