package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media
  * (image/audio/video) travels as an opaque `binary` column with a
  * typed metadata struct alongside. Image and PCM-WAV codecs are REAL
  * (the JDK ships `javax.imageio` / `javax.sound.sampled`); other
  * formats plug into the same [[MediaCodec]] seam, for which
  * [[FakeCodec]] is the deterministic unit-test double.
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

  /** REAL image codec on the JDK's built-in `javax.imageio` readers —
    * PNG, BMP, GIF and JPEG decoders ship with Java SE, so "no codec
    * libraries in the environment" does not apply to images. Features
    * are a g×g resampled luminance grid (g = ceil(sqrt(dim)),
    * row-major, truncated to dim) in [0,1]; probe reads true format
    * and dimensions from the image header without a full decode.
    * Undecodable payloads yield a zero vector / (unknown, None, None)
    * rather than failing the task.
    */
  final class ImageIoCodec extends MediaCodec {
    override def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) return new Array[Float](dim)
      val g = math.ceil(math.sqrt(dim.toDouble)).toInt.max(1)
      val scaled = new java.awt.image.BufferedImage(
        g, g, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gr = scaled.createGraphics()
      try gr.drawImage(img, 0, 0, g, g, null) finally gr.dispose()
      val out = new Array[Float](dim)
      var d = 0
      while (d < dim) {
        val rgb = scaled.getRGB(d % g, d / g)
        val r = (rgb >> 16) & 0xFF
        val gg = (rgb >> 8) & 0xFF
        val b = rgb & 0xFF
        out(d) = (0.299f * r + 0.587f * gg + 0.114f * b) / 255.0f
        d += 1
      }
      out
    }

    override def probe(payload: Array[Byte]): (String, Option[Int], Option[Int]) = {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) ("unknown", None, None)
        else {
          val r = readers.next()
          r.setInput(in)
          try (r.getFormatName.toLowerCase, Some(r.getWidth(0)), Some(r.getHeight(0)))
          finally r.dispose()
        }
      } finally in.close()
    }
  }

  /** REAL audio codec for PCM WAV via the JDK's `javax.sound.sampled`
    * (also part of Java SE). Features are per-window RMS amplitudes in
    * [0,1] over `dim` equal slices of the sample stream — the standard
    * cheap audio fingerprint; probe reads (sample_rate, frame_count)
    * from the header.
    */
  final class WavCodec extends MediaCodec {
    override def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val bytesPerSample = fmt.getSampleSizeInBits / 8
          val data = in.readAllBytes()
          val nSamples = data.length / bytesPerSample.max(1)
          if (nSamples == 0 || bytesPerSample != 2) return out
          val window = (nSamples / dim).max(1)
          var d = 0
          while (d < dim) {
            var acc = 0.0
            var i = d * window
            val end = math.min(nSamples, i + window)
            val n = (end - i).max(1)
            val order = if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN
            val buf = java.nio.ByteBuffer.wrap(data).order(order)
            while (i < end) {
              val s = buf.getShort(i * 2) / 32768.0
              acc += s * s
              i += 1
            }
            out(d) = math.sqrt(acc / n).toFloat
            d += 1
          }
        } finally in.close()
      } catch { case _: Exception => () } // undecodable -> zero vector
      out
    }

    override def probe(payload: Array[Byte]): (String, Option[Int], Option[Int]) =
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload))
        (aff.getType.getExtension.toLowerCase,
          Some(aff.getFormat.getSampleRate.toInt), Some(aff.getFrameLength))
      } catch { case _: Exception => ("unknown", None, None) }
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

  /** Perceptual average-hash (aHash) of decoded images — the classic
    * 64-bit near-duplicate fingerprint for image dedup: downscale to
    * an 8×8 grid, threshold each cell against the grid mean, pack the
    * bits. Everything after decode is INTEGER arithmetic, made
    * deterministic end-to-end:
    *  - the grid is a manual truncating block average over the RED
    *    channel (payload images here are grayscale, so red IS the
    *    luminance; `Graphics.drawImage` resampling varies with
    *    rendering hints and is NOT used);
    *  - threshold = sum div 64 (truncating);
    *  - bit (y*8+x) set iff cell > threshold, packed into two
    *    unsigned-32-bit halves (`ahash_hi` bits 63..32, `ahash_lo`
    *    31..0) — two longs instead of one so an external engine can
    *    rebuild the hash without signed-shift overflow.
    * Brightness-shifted copies of an image hash IDENTICALLY (the mean
    * shifts with the cells) — the invariance aHash exists for.
    * Undecodable or sub-8×8 payloads yield NULL halves. Map-only:
    * payload bytes never shuffle; hamming distance between hashes is
    * `bit_count(a_hi ^ b_hi) + bit_count(a_lo ^ b_lo)` for the
    * near-dup join downstream (the simhash machinery applies).
    */
  def imageAHash(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash_hi", LongType, nullable = true),
      StructField("ahash_lo", LongType, nullable = true)))
    val rdd = df.select(col("media_id").cast(LongType), col("payload")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          if (img == null || img.getWidth < 8 || img.getHeight < 8)
            Row(r.getLong(0), null, null)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val cells = new Array[Long](64)
            var cy = 0
            while (cy < 8) {
              var cx = 0
              while (cx < 8) {
                val x0 = cx * w / 8; val x1 = (cx + 1) * w / 8
                val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
                var s = 0L
                var y = y0
                while (y < y1) {
                  var x = x0
                  while (x < x1) { s += (img.getRGB(x, y) >> 16) & 0xFF; x += 1 }
                  y += 1
                }
                cells(cy * 8 + cx) = s / ((x1 - x0).toLong * (y1 - y0))
                cx += 1
              }
              cy += 1
            }
            val thr = cells.sum / 64
            var hi = 0L; var lo = 0L
            var b = 0
            while (b < 64) {
              if (cells(b) > thr) {
                if (b >= 32) hi |= 1L << (b - 32) else lo |= 1L << b
              }
              b += 1
            }
            Row(r.getLong(0), hi, lo)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** aHash-based image near-duplicate pairs: decode + hash
    * ([[imageAHash]]), then find all pairs within `maxDist` hamming
    * bits — EXACTLY, via the pigeonhole band join: a 64-bit hash
    * splits into four 16-bit bands, and any pair within hamming 3 must
    * agree on at least one band (3 differing bits touch at most 3 of
    * the 4), so banding is a lossless candidate generator for
    * maxDist ≤ 3 — the same guarantee the simhash text path uses.
    * Requires `maxDist < 4`; a larger radius needs more/narrower
    * bands.
    *
    * Scale shape: payloads never leave the decode scan (only 3 longs
    * per image reach the band explode); candidates are per-band-bucket
    * joins; `maxBucket` caps degenerate buckets (e.g. solid-color
    * corpora hashing to all-zeros) the way the minhash/simhash
    * operators do — capped bands are dropped from candidate
    * generation, loudly trading recall for boundedness.
    */
  def imageNearDups(df: DataFrame, maxDist: Int = 3, maxBucket: Int = 10000): DataFrame = {
    require(maxDist >= 0 && maxDist < 4,
      s"pigeonhole over 4 bands is exact only for maxDist < 4, got $maxDist")
    val hashes = imageAHash(df).where(col("ahash_hi").isNotNull).persist()
    val bandCols = Seq(
      col("ahash_lo").bitwiseAND(lit(0xFFFFL)),
      shiftright(col("ahash_lo"), 16).bitwiseAND(lit(0xFFFFL)),
      col("ahash_hi").bitwiseAND(lit(0xFFFFL)),
      shiftright(col("ahash_hi"), 16).bitwiseAND(lit(0xFFFFL)))
    val banded = hashes.select(col("media_id"), col("ahash_hi"), col("ahash_lo"),
      posexplode(array(bandCols: _*)).as(Seq("band", "v")))
    val hot = banded.groupBy("band", "v")
      .agg(count(lit(1)).as("n")).where(col("n") > maxBucket)
      .select("band", "v")
    val small = banded.join(broadcast(hot), Seq("band", "v"), "left_anti")
    val a = small.select(col("band"), col("v"), col("media_id").as("id_a"),
      col("ahash_hi").as("hi_a"), col("ahash_lo").as("lo_a"))
    val b = small.select(col("band"), col("v"), col("media_id").as("id_b"),
      col("ahash_hi").as("hi_b"), col("ahash_lo").as("lo_b"))
    val result = a.join(b, Seq("band", "v"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
      .distinct()
    // persist+count then release the hash cache (the Dedup
    // materializeAndRelease pattern: pin the small pair output, free
    // the larger per-image cache; lineage kept so a lost block
    // recomputes instead of failing)
    val out = result.persist()
    out.count()
    hashes.unpersist()
    out
  }

  /** Audio envelope fingerprint — [[imageAHash]]'s WAV sibling: decode
    * 16-bit PCM, split the sample stream into 64 equal windows,
    * per-window MEAN ABSOLUTE amplitude (truncating integer division —
    * mean-abs tracks the same loudness envelope as RMS without the
    * float sqrt, so the fingerprint stays integer-exact end-to-end),
    * threshold each window against the 64-window mean, pack the bits
    * as (env_hi bits 63..32, env_lo 31..0). Gain-scaled copies of a
    * clip hash identically when scaling preserves the
    * louder-than-average set — the envelope-shape invariance the
    * fingerprint exists for. Undecodable, non-16-bit, or sub-64-frame
    * payloads yield NULL halves. Map-only; hamming near-dup joins
    * reuse the banded machinery of [[imageNearDups]].
    */
  def audioEnvelopeHash(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("env_hi", LongType, nullable = true),
      StructField("env_lo", LongType, nullable = true)))
    val rdd = df.select(col("media_id").cast(LongType), col("payload")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val nullRow = Row(r.getLong(0), null, null)
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            try {
              val fmt = in.getFormat
              if (fmt.getSampleSizeInBits != 16) nullRow
              else {
                val data = in.readAllBytes()
                val n = data.length / 2
                if (n < 64) nullRow
                else {
                  val order = if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                    else java.nio.ByteOrder.LITTLE_ENDIAN
                  val buf = java.nio.ByteBuffer.wrap(data).order(order)
                  val env = new Array[Long](64)
                  var w = 0
                  while (w < 64) {
                    val i0 = w * n / 64; val i1 = (w + 1) * n / 64
                    var s = 0L
                    var i = i0
                    while (i < i1) { s += math.abs(buf.getShort(i * 2).toLong); i += 1 }
                    env(w) = s / (i1 - i0)
                    w += 1
                  }
                  val thr = env.sum / 64
                  var hi = 0L; var lo = 0L
                  var b = 0
                  while (b < 64) {
                    if (env(b) > thr) {
                      if (b >= 32) hi |= 1L << (b - 32) else lo |= 1L << b
                    }
                    b += 1
                  }
                  Row(r.getLong(0), hi, lo)
                }
              }
            } finally in.close()
          } catch { case _: Exception => nullRow }
        }
      }
    spark.createDataFrame(rdd, schema)
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

  /** REAL metadata probe: per-row codec.probe inside the scan stage
    * (mapPartitions — codec init amortized per task, payload bytes
    * never shuffle). The probe pair maps to (width, height) for
    * images/video and (sample_rate, n_frames) for audio.
    */
  def withProbedMetadata(df: DataFrame, codec: MediaCodec, mediaType: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", mediaMetaType, nullable = false)))
    val isAudio = mediaType == "audio"
    val spark = df.sparkSession
    val rdd = df.select(col("media_id").cast(LongType), col("payload")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val p = r.getAs[Array[Byte]](1)
          val (fmt, a, b) = codec.probe(p)
          Row(r.getLong(0), p, Row(mediaType, fmt,
            if (isAudio) null else a.map(Int.box).orNull,
            if (isAudio) null else b.map(Int.box).orNull,
            if (isAudio) a.map(Int.box).orNull else null,
            if (isAudio) b.map(Int.box).orNull else null,
            p.length.toLong))
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** REAL image resize: JDK decode -> scaled redraw -> PNG re-encode,
    * all inside the scan stage. Undecodable payloads pass through
    * unchanged. Output schema matches the input (media_id, payload).
    */
  def resizeImages(df: DataFrame, w: Int, h: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val spark = df.sparkSession
    val rdd = df.select(col("media_id").cast(LongType), col("payload")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val p = r.getAs[Array[Byte]](1)
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
          val out =
            if (img == null) p
            else {
              val scaled = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val gr = scaled.createGraphics()
              try gr.drawImage(img, 0, 0, w, h, null) finally gr.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(scaled, "png", bos)
              bos.toByteArray
            }
          Row(r.getLong(0), out)
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
