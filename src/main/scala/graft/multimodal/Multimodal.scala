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

  /** Per-window loudness ENVELOPE rows — the decoded signal behind
    * [[audioEnvelopeHash]], exposed as data: 64 rows per decodable
    * 16-bit clip, (media_id, win, env) with env the window's exact
    * integer mean absolute amplitude (same windowing arithmetic as
    * the hash). Undecodable/short clips contribute no rows. Map-only:
    * the payload never survives past the decode task — 64 skinny
    * longs per clip reach any exchange.
    */
  def audioEnvelope(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("win", IntegerType, nullable = false),
      StructField("env", LongType, nullable = false)))
    val rdd = df.select(col("media_id").cast(LongType), col("payload")).rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            try {
              val fmt = in.getFormat
              if (fmt.getSampleSizeInBits != 16) Nil
              else {
                val data = in.readAllBytes()
                val n = data.length / 2
                if (n < 64) Nil
                else {
                  val order = if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                    else java.nio.ByteOrder.LITTLE_ENDIAN
                  val buf = java.nio.ByteBuffer.wrap(data).order(order)
                  (0 until 64).map { w =>
                    val i0 = w * n / 64; val i1 = (w + 1) * n / 64
                    var s = 0L
                    var i = i0
                    while (i < i1) { s += math.abs(buf.getShort(i * 2).toLong); i += 1 }
                    Row(r.getLong(0), w, s / (i1 - i0))
                  }
                }
              }
            } finally in.close()
          } catch { case _: Exception => Nil }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Silence segmentation (threshold VAD): maximal runs of envelope
    * windows whose mean absolute amplitude is BELOW `threshold` —
    * the trim/split decision a speech-data pipeline makes before
    * transcription. One row per maximal silent run:
    * (media_id, seg_start, n_windows). Scale: the run merge is the
    * [[graft.operators.Dedup.maximalDuplicateSpans]] interval-merge
    * window over per-clip silent WINDOW indices (≤ 64 skinny ints per
    * clip) — payloads never shuffle.
    */
  def audioSilenceSegments(df: DataFrame, threshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(threshold >= 0, s"threshold must be >= 0, got $threshold")
    val silent = audioEnvelope(df).where(col("env") < threshold)
      .select(col("media_id"), col("win"))
    val byClip = Window.partitionBy("media_id").orderBy("win")
    silent
      .withColumn("__new", when(
        col("win") - lag(col("win"), 1).over(byClip) > 1 ||
          lag(col("win"), 1).over(byClip).isNull, 1L).otherwise(0L))
      .withColumn("__seg", sum(col("__new")).over(
        byClip.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("media_id"), col("__seg"))
      .agg(min(col("win")).cast("long").as("seg_start"),
        count(lit(1)).as("n_windows"))
      .select(col("media_id"), col("seg_start"), col("n_windows"))
  }

  /** EVERY frame's aHash — [[videoFrameHashes]] without the k-sample:
    * (media_id, frame_no, ahash_hi, ahash_lo). GVID frames hash
    * straight off the raw planes (header math, no decode); MJPG
    * decodes each frame via the frame index. Per-video output is
    * nFrames × 16 bytes — the payload never leaves the scan task.
    */
  def videoAllFrameHashes(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("ahash_hi", LongType, nullable = false),
      StructField("ahash_lo", LongType, nullable = false)))
    val rdd = df.select(col("media_id").cast(LongType), col("payload")).rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          val p = r.getAs[Array[Byte]](1)
          gvidParseHeader(p) match {
            case Some((w, h, _, nf)) if w >= 8 && h >= 8 && nf > 0 =>
              (0 until nf).map { f =>
                val (hi, lo) = planeAHash(p, GvidHeaderLen + f * w * h, w, h)
                Row(r.getLong(0), f, hi, lo)
              }
            case _ =>
              mjpgFrameIndex(p) match {
                case Some((_, idx)) =>
                  idx.indices.flatMap { f =>
                    val (off, len) = idx(f)
                    val (plane, w, h) = mjpgDecodePlane(p, off, len)
                    if (plane == null || w < 8 || h < 8) Nil
                    else {
                      val (hi, lo) = planeAHash(plane, 0, w, h)
                      Seq(Row(r.getLong(0), f, hi, lo))
                    }
                  }
                case None => Nil
              }
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Scene-cut detection: frames whose aHash hamming distance from
    * the PREVIOUS frame is at least `minHamming` — the shot-boundary
    * signal a video pipeline uses to pick keyframes and split clips.
    * Output one row per cut: (media_id, cut_frame, dist), cut_frame
    * the first frame of the new shot. Scale: the lag window
    * partitions by media over nFrames-bounded 16-byte hash rows;
    * payloads never shuffle.
    */
  def videoSceneCuts(df: DataFrame, minHamming: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minHamming >= 1, s"minHamming must be >= 1, got $minHamming")
    val byVideo = Window.partitionBy("media_id").orderBy("frame_no")
    videoAllFrameHashes(df)
      .withColumn("__phi", lag(col("ahash_hi"), 1).over(byVideo))
      .withColumn("__plo", lag(col("ahash_lo"), 1).over(byVideo))
      .where(col("__phi").isNotNull)
      .select(col("media_id"), col("frame_no").cast("long").as("cut_frame"),
        (bit_count(expr("ahash_hi ^ __phi")) +
          bit_count(expr("ahash_lo ^ __plo"))).cast("long").as("dist"))
      .where(col("dist") >= minHamming)
  }

  // ---------------------------------------------------------------- //
  // Audio: ADPM compressed container (IMA ADPCM, block-aligned)       //
  // ---------------------------------------------------------------- //

  /** ADPM — the COMPRESSED instance of the audio-codec seam the
    * PCM-WAV path left open (the audio analog of MJPG beside GVID):
    * IMA/DVI ADPCM, the public-domain 4-bit adaptive-delta codec, in
    * a minimal BLOCK-ALIGNED container — each block stores its first
    * sample verbatim plus its step-table index, exactly the shape IMA
    * blocks take inside WAV, so every block decodes independently
    * (seekable, corruption-bounded) and the 4:1 compression is real
    * byte-level work.
    *
    * Layout (big-endian):
    *   bytes 0-3   magic "ADPM"
    *   byte  4     version (1)
    *   bytes 5-8   sample rate
    *   bytes 9-12  n_samples
    *   bytes 13-14 block size in samples (>= 2)
    *   byte  15+   per block: int16 first sample, uint8 step index,
    *               then ceil((blockSamples-1)/2) bytes of 4-bit codes
    *               (high nibble first)
    */
  val AdpmHeaderLen = 15

  /** IMA ADPCM step-size table (88 + 1 entries) and index-adaptation
    * table — the published constants of the IMA specification.
    */
  private val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val ImaIndexAdjust: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA code step shared by encode and decode: reconstruct the
    * delta the DECODER will compute for `code` at `step` (the
    * (step·mag)/4 + step/8 form), apply sign, clamp to int16.
    */
  private def imaReconstruct(pred: Int, code: Int, step: Int): Int = {
    var delta = step >> 3
    if ((code & 1) != 0) delta += step >> 2
    if ((code & 2) != 0) delta += step >> 1
    if ((code & 4) != 0) delta += step
    val next = if ((code & 8) != 0) pred - delta else pred + delta
    math.max(-32768, math.min(32767, next))
  }

  /** Encode 16-bit PCM mono as an ADPM payload. Every block restarts
    * at (first sample verbatim, index 0) — determinism needs no
    * cross-block state, and constant blocks reconstruct EXACTLY
    * (diff 0 → code 0 → delta = step>>3 = 0 at index 0).
    */
  def adpcmEncode(rate: Int, samples: Array[Short], blockSamples: Int): Array[Byte] = {
    require(rate > 0, s"bad rate $rate")
    require(blockSamples >= 2 && blockSamples <= 0xFFFF, s"bad block size $blockSamples")
    require(samples.length % blockSamples == 0,
      s"n_samples ${samples.length} must be a multiple of block size $blockSamples")
    val nBlocks = samples.length / blockSamples
    val codesPerBlock = (blockSamples - 1 + 1) / 2
    val out = new java.io.ByteArrayOutputStream(
      AdpmHeaderLen + nBlocks * (3 + codesPerBlock))
    def b(i: Int): Unit = out.write(i & 0xFF)
    out.write('A'); out.write('D'); out.write('P'); out.write('M'); out.write(1)
    b(rate >> 24); b(rate >> 16); b(rate >> 8); b(rate)
    val n = samples.length
    b(n >> 24); b(n >> 16); b(n >> 8); b(n)
    b(blockSamples >> 8); b(blockSamples)
    var blk = 0
    while (blk < nBlocks) {
      val base = blk * blockSamples
      var pred: Int = samples(base)
      var index = 0
      b(pred >> 8); b(pred)
      b(index)
      var half = false
      var acc = 0
      var i = 1
      while (i < blockSamples) {
        val s = samples(base + i)
        val step = ImaStep(index)
        var diff = s - pred
        var code = 0
        if (diff < 0) { code = 8; diff = -diff }
        if (diff >= step) { code |= 4; diff -= step }
        if (diff >= (step >> 1)) { code |= 2; diff -= step >> 1 }
        if (diff >= (step >> 2)) { code |= 1 }
        pred = imaReconstruct(pred, code, step)
        index = math.max(0, math.min(88, index + ImaIndexAdjust(code & 7)))
        if (!half) { acc = code << 4; half = true }
        else { out.write(acc | code); half = false }
        i += 1
      }
      if (half) out.write(acc)
      blk += 1
    }
    out.toByteArray
  }

  /** Decode an ADPM payload to (rate, samples), or None for payloads
    * whose magic/version/geometry don't check out (corruption is
    * data, not an exception — the MJPG degradation contract).
    */
  def adpcmDecode(p: Array[Byte]): Option[(Int, Array[Short])] = {
    if (p == null || p.length < AdpmHeaderLen ||
      p(0) != 'A' || p(1) != 'D' || p(2) != 'P' || p(3) != 'M' || p(4) != 1) return None
    def i32(o: Int): Int =
      ((p(o) & 0xFF) << 24) | ((p(o + 1) & 0xFF) << 16) | ((p(o + 2) & 0xFF) << 8) | (p(o + 3) & 0xFF)
    val rate = i32(5)
    val n = i32(9)
    val blockSamples = ((p(13) & 0xFF) << 8) | (p(14) & 0xFF)
    if (rate <= 0 || n < 0 || blockSamples < 2 || n % blockSamples != 0) return None
    val nBlocks = n / blockSamples
    val bytesPerBlock = 3 + (blockSamples - 1 + 1) / 2
    if (p.length < AdpmHeaderLen + nBlocks.toLong * bytesPerBlock) return None
    val out = new Array[Short](n)
    var blk = 0
    while (blk < nBlocks) {
      val off = AdpmHeaderLen + blk * bytesPerBlock
      var pred: Int = ((p(off) << 8) | (p(off + 1) & 0xFF)).toShort.toInt
      var index = math.max(0, math.min(88, p(off + 2) & 0xFF))
      out(blk * blockSamples) = pred.toShort
      var i = 1
      while (i < blockSamples) {
        val byteIx = off + 3 + (i - 1) / 2
        val code = if ((i - 1) % 2 == 0) (p(byteIx) >> 4) & 0xF else p(byteIx) & 0xF
        val step = ImaStep(index)
        pred = imaReconstruct(pred, code, step)
        index = math.max(0, math.min(88, index + ImaIndexAdjust(code & 7)))
        out(blk * blockSamples + i) = pred.toShort
        i += 1
      }
      blk += 1
    }
    Some((rate, out))
  }

  /** ADPCM codec for the [[MediaCodec]] seam: probe reads the true
    * header (rate, sample count); features are the SAME per-window
    * RMS amplitudes as [[WavCodec]] over the DECODED stream — a
    * pipeline can mix WAV and ADPM rows and their feature spaces
    * line up.
    */
  final class AdpcmCodec extends MediaCodec {
    override def probe(payload: Array[Byte]): (String, Option[Int], Option[Int]) =
      adpcmDecode(payload) match {
        case Some((rate, samples)) => ("adpcm", Some(rate), Some(samples.length))
        case None => ("unknown", None, None)
      }
    override def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      adpcmDecode(payload) match {
        case None => out
        case Some((_, samples)) =>
          val nSamples = samples.length
          if (nSamples == 0) return out
          val window = (nSamples / dim).max(1)
          var d = 0
          while (d < dim) {
            var acc = 0.0
            var i = d * window
            val end = math.min(nSamples, i + window)
            val nw = (end - i).max(1)
            while (i < end) {
              val s = samples(i) / 32768.0
              acc += s * s
              i += 1
            }
            out(d) = math.sqrt(acc / nw).toFloat
            d += 1
          }
          out
      }
    }
  }

  /** [[audioEnvelopeHash]] for ADPM payloads: decode the compressed
    * stream, then the IDENTICAL 64-window mean-abs envelope bits —
    * integer-exact end to end, so WAV and ADPM fingerprints of the
    * same loudness shape agree. Undecodable or sub-64-sample payloads
    * yield NULL halves. Map-only; payloads never leave the scan.
    */
  def adpcmEnvelopeHash(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("env_hi", LongType, nullable = true),
      StructField("env_lo", LongType, nullable = true)))
    val rdd = df.select(col("media_id").cast(LongType), col("payload")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val nullRow = Row(r.getLong(0), null, null)
          adpcmDecode(r.getAs[Array[Byte]](1)) match {
            case None => nullRow
            case Some((_, samples)) =>
              val n = samples.length
              if (n < 64) nullRow
              else {
                val env = new Array[Long](64)
                var w = 0
                while (w < 64) {
                  val i0 = w * n / 64; val i1 = (w + 1) * n / 64
                  var s = 0L
                  var i = i0
                  while (i < i1) { s += math.abs(samples(i).toLong); i += 1 }
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
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Envelope near-duplicate pairs over ADPM clips — [[imageNearDups]]'
    * audio sibling: decode + envelope hash, then the exact pigeonhole
    * band join (4 × 16-bit bands, lossless for maxDist ≤ 3) with the
    * same hot-bucket cap. Only 3 longs per clip reach the exchange.
    */
  def adpcmNearDups(df: DataFrame, maxDist: Int = 3, maxBucket: Int = 10000): DataFrame = {
    require(maxDist >= 0 && maxDist < 4,
      s"pigeonhole over 4 bands is exact only for maxDist < 4, got $maxDist")
    val hashes = adpcmEnvelopeHash(df).where(col("env_hi").isNotNull).persist()
    val bandCols = Seq(
      col("env_lo").bitwiseAND(lit(0xFFFFL)),
      shiftright(col("env_lo"), 16).bitwiseAND(lit(0xFFFFL)),
      col("env_hi").bitwiseAND(lit(0xFFFFL)),
      shiftright(col("env_hi"), 16).bitwiseAND(lit(0xFFFFL)))
    val banded = hashes.select(col("media_id"), col("env_hi"), col("env_lo"),
      posexplode(array(bandCols: _*)).as(Seq("band", "v")))
    val hot = banded.groupBy("band", "v")
      .agg(count(lit(1)).as("n")).where(col("n") > maxBucket)
      .select("band", "v")
    val small = banded.join(broadcast(hot), Seq("band", "v"), "left_anti")
    val a = small.select(col("band"), col("v"), col("media_id").as("id_a"),
      col("env_hi").as("hi_a"), col("env_lo").as("lo_a"))
    val b = small.select(col("band"), col("v"), col("media_id").as("id_b"),
      col("env_hi").as("hi_b"), col("env_lo").as("lo_b"))
    val result = a.join(b, Seq("band", "v"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
      .distinct()
    val out = result.persist()
    out.count()
    hashes.unpersist()
    out
  }

  // ---------------------------------------------------------------- //
  // Video: GVID raw container                                         //
  // ---------------------------------------------------------------- //

  /** GVID — the engine's minimal RAW video container (no inter-frame
    * coding), so the video plumbing (header probe, frame geometry,
    * sampling, per-frame hashing) is REAL byte-level work while the
    * compressed-codec seam stays pluggable like [[MediaCodec]]. An
    * mp4/webm decoder would replace [[gvidParseHeader]]/plane reads
    * only; every operator signature and plan shape is unchanged.
    *
    * Layout (big-endian):
    *   bytes 0-3   magic "GVID"
    *   byte  4     version (1)
    *   bytes 5-6   width
    *   bytes 7-8   height
    *   byte  9     fps
    *   bytes 10-11 n_frames
    *   byte  12+   n_frames planes of width*height 8-bit gray samples
    */
  val GvidHeaderLen = 12

  /** Encode planes into a GVID payload. Each plane must be w*h bytes. */
  def gvidEncode(w: Int, h: Int, fps: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    require(w > 0 && w <= 0xFFFF && h > 0 && h <= 0xFFFF, s"bad dims ${w}x$h")
    require(fps > 0 && fps <= 255, s"bad fps $fps")
    require(frames.length <= 0xFFFF, s"too many frames ${frames.length}")
    frames.foreach(f => require(f.length == w * h,
      s"plane must be ${w * h} bytes, got ${f.length}"))
    val out = new Array[Byte](GvidHeaderLen + frames.length * w * h)
    out(0) = 'G'; out(1) = 'V'; out(2) = 'I'; out(3) = 'D'; out(4) = 1
    out(5) = (w >> 8).toByte; out(6) = w.toByte
    out(7) = (h >> 8).toByte; out(8) = h.toByte
    out(9) = fps.toByte
    out(10) = (frames.length >> 8).toByte; out(11) = frames.length.toByte
    var f = 0
    while (f < frames.length) {
      System.arraycopy(frames(f), 0, out, GvidHeaderLen + f * w * h, w * h)
      f += 1
    }
    out
  }

  /** Parse a GVID header: (width, height, fps, nFrames), or None when
    * the magic/version/length don't check out (truncated payloads are
    * data, not exceptions).
    */
  def gvidParseHeader(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (p == null || p.length < GvidHeaderLen ||
      p(0) != 'G' || p(1) != 'V' || p(2) != 'I' || p(3) != 'D' || p(4) != 1) None
    else {
      val w = ((p(5) & 0xFF) << 8) | (p(6) & 0xFF)
      val h = ((p(7) & 0xFF) << 8) | (p(8) & 0xFF)
      val fps = p(9) & 0xFF
      val nf = ((p(10) & 0xFF) << 8) | (p(11) & 0xFF)
      if (w == 0 || h == 0 || p.length < GvidHeaderLen + nf.toLong * w * h) None
      else Some((w, h, fps, nf))
    }
  }

  /** GVID codec for the [[MediaCodec]] seam: probe returns the true
    * header dimensions; features are the temporal luminance envelope
    * (mean gray per of `dim` equal frame-range slices), the video
    * analog of [[WavCodec]]'s RMS windows.
    */
  final class GvidCodec extends MediaCodec {
    override def probe(payload: Array[Byte]): (String, Option[Int], Option[Int]) =
      gvidParseHeader(payload) match {
        case Some((w, h, _, _)) => ("gvid", Some(w), Some(h))
        case None => ("unknown", None, None)
      }
    override def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      gvidParseHeader(payload).foreach { case (w, h, _, nf) =>
        if (nf > 0) {
          var s = 0
          while (s < dim) {
            val f0 = s * nf / dim
            val f1 = math.max(((s + 1) * nf / dim), f0 + 1).min(nf)
            var acc = 0L
            var f = f0
            while (f < f1) {
              var i = GvidHeaderLen + f * w * h
              val end = i + w * h
              while (i < end) { acc += payload(i) & 0xFF; i += 1 }
              f += 1
            }
            out(s) = acc.toFloat / ((f1 - f0).toLong * w * h) / 255.0f
            s += 1
          }
        }
      }
      out
    }
  }

  // ---------------------------------------------------------------- //
  // Video: MJPG compressed container (JPEG frames via ImageIO)        //
  // ---------------------------------------------------------------- //

  /** MJPG — the COMPRESSED instance of the video-codec seam the GVID
    * raw container documents: Motion-JPEG-style, each frame a real
    * JPEG (lossy DCT, encoded/decoded by the JDK's built-in ImageIO
    * codec — the same "codecs ship with Java SE" footing as
    * [[ImageIoCodec]]). Frame access is by length-prefix walk, so
    * sampling k frames decodes k JPEGs, not the whole stream — the
    * property a crawl pipeline needs from any inter-frame-independent
    * compressed format.
    *
    * Layout (big-endian):
    *   bytes 0-3  magic "MJPG"
    *   byte  4    version (1)
    *   byte  5    fps
    *   bytes 6-7  n_frames
    *   then n_frames x [4-byte frame byte length][JPEG bytes]
    * Width/height live in the JPEG headers (frame 0 is probed without
    * a pixel decode).
    */
  val MjpgHeaderLen = 8

  /** Encode 8-bit gray planes as an MJPG container (each plane really
    * JPEG-compressed). Lossy: decoded pixels approximate `frames`.
    */
  def mjpgEncode(w: Int, h: Int, fps: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    require(fps > 0 && fps <= 255, s"bad fps $fps")
    require(frames.length <= 0xFFFF, s"too many frames ${frames.length}")
    val blobs = frames.map { plane =>
      require(plane.length == w * h, s"plane must be ${w * h} bytes, got ${plane.length}")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, plane)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val total = MjpgHeaderLen + blobs.map(_.length + 4).sum
    val buf = java.nio.ByteBuffer.allocate(total)
    buf.put('M'.toByte).put('J'.toByte).put('P'.toByte).put('G'.toByte)
    buf.put(1.toByte).put(fps.toByte).putShort(frames.length.toShort)
    blobs.foreach { b => buf.putInt(b.length); buf.put(b) }
    buf.array()
  }

  /** Parse an MJPG container: (fps, per-frame (offset, length)), or
    * None when magic/version/frame bounds don't check out (truncated
    * payloads are data, not exceptions).
    */
  def mjpgFrameIndex(p: Array[Byte]): Option[(Int, Array[(Int, Int)])] = {
    if (p == null || p.length < MjpgHeaderLen ||
      p(0) != 'M' || p(1) != 'J' || p(2) != 'P' || p(3) != 'G' || p(4) != 1) None
    else {
      val fps = p(5) & 0xFF
      val nf = ((p(6) & 0xFF) << 8) | (p(7) & 0xFF)
      val idx = new Array[(Int, Int)](nf)
      var off = MjpgHeaderLen
      var f = 0
      var ok = true
      while (ok && f < nf) {
        if (off + 4 > p.length) ok = false
        else {
          val len = ((p(off) & 0xFF) << 24) | ((p(off + 1) & 0xFF) << 16) |
            ((p(off + 2) & 0xFF) << 8) | (p(off + 3) & 0xFF)
          if (len < 0 || off + 4 + len > p.length) ok = false
          else { idx(f) = (off + 4, len); off += 4 + len; f += 1 }
        }
      }
      if (ok && nf > 0) Some((fps, idx)) else None
    }
  }

  /** MJPG metadata: (width, height, fps, nFrames) — dims from frame
    * 0's JPEG HEADER (no pixel decode, [[ImageIoCodec.probe]]'s
    * reader path).
    */
  def mjpgParseMeta(p: Array[Byte]): Option[(Int, Int, Int, Int)] =
    mjpgFrameIndex(p).flatMap { case (fps, idx) =>
      val (off, len) = idx(0)
      // corrupt JPEG header bytes (valid container, garbage frame) make
      // the reader throw IIOException — unparseable payloads are DATA
      // (None → NULL row), never a job-killing exception, matching the
      // gvid path's contract
      try {
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(p, off, len))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            r.setInput(in)
            try Some((r.getWidth(0), r.getHeight(0), fps, idx.length))
            finally r.dispose()
          }
        } finally in.close()
      } catch {
        case _: java.io.IOException => None
        case _: RuntimeException    => None
      }
    }

  /** Decode one MJPG frame to a gray plane (w*h bytes, row-major), or
    * null when the JPEG doesn't decode.
    */
  private def mjpgDecodePlane(p: Array[Byte], off: Int, len: Int): (Array[Byte], Int, Int) = {
    // ImageIO.read returns null for unrecognized bytes but THROWS
    // IIOException for recognized-but-corrupt ones (truncated DCT
    // stream); both are data → absent fingerprint row, not a crash
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p, off, len))
      catch {
        case _: java.io.IOException => null
        case _: RuntimeException    => null
      }
    if (img == null) return (null, 0, 0)
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](w * h)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // luminance band 0 for TYPE_BYTE_GRAY; representative band for
        // anything else ImageIO hands back
        out(y * w + x) = raster.getSample(x, y, 0).toByte
        x += 1
      }
      y += 1
    }
    (out, w, h)
  }

  /** REAL video metadata probe: per-row container header parse inside
    * the scan stage — (format, width, height, fps, n_frames), NULLs
    * for unparseable payloads. Dispatches on the container magic: GVID
    * raw planes or MJPG compressed JPEG frames. Map-only; payload
    * bytes never shuffle.
    */
  def videoProbe(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("fps", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true)))
    val rdd = df.select(col("media_id").cast(LongType), col("payload")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val p = r.getAs[Array[Byte]](1)
          gvidParseHeader(p)
            .map { case (w, h, fps, nf) => Row(r.getLong(0), "gvid", w, h, fps, nf) }
            .orElse(mjpgParseMeta(p)
              .map { case (w, h, fps, nf) => Row(r.getLong(0), "mjpg", w, h, fps, nf) })
            .getOrElse(Row(r.getLong(0), null, null, null, null, null))
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** 8×8 block aHash of one gray plane — [[imageAHash]]'s cell math
    * (truncating block average, threshold sum div 64, bit y*8+x) read
    * straight from plane bytes. Returns null for sub-8×8 planes.
    */
  private def planeAHash(p: Array[Byte], off: Int, w: Int, h: Int): (Long, Long) = {
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
          while (x < x1) { s += p(off + y * w + x) & 0xFF; x += 1 }
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
    (hi, lo)
  }

  /** Sampled-frame perceptual hashes — the standard video near-dup
    * fingerprint: pick `k` evenly spaced frames (frame t*n_frames/k
    * for t < k — the real container geometry, not byte offsets),
    * aHash each sampled plane. Dispatches on container magic: GVID
    * planes read in place; MJPG sampled frames are REALLY
    * JPEG-decoded (k decodes per video, indexed by the length-prefix
    * walk — never the whole stream). Output one row per (media_id,
    * frame_idx): (frame_no, ahash_hi, ahash_lo); videos that are
    * unparseable or smaller than 8×8 yield no rows (their absence IS
    * the signal — they can't be fingerprint-matched).
    *
    * Scale shape: map-only decode+hash inside the scan stage; only
    * (id, idx, 2 longs) leave it — a 100 TB video corpus reduces to
    * k*16 bytes per video before anything shuffles.
    */
  def videoFrameHashes(df: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("ahash_hi", LongType, nullable = false),
      StructField("ahash_lo", LongType, nullable = false)))
    val rdd = df.select(col("media_id").cast(LongType), col("payload")).rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          val p = r.getAs[Array[Byte]](1)
          gvidParseHeader(p) match {
            case Some((w, h, _, nf)) if w >= 8 && h >= 8 && nf > 0 =>
              (0 until k).map { t =>
                val frameNo = t * nf / k
                val (hi, lo) = planeAHash(p, GvidHeaderLen + frameNo * w * h, w, h)
                Row(r.getLong(0), t, frameNo, hi, lo)
              }
            case _ =>
              // compressed path: decode ONLY the k sampled JPEGs via
              // the frame index (never the whole stream)
              mjpgFrameIndex(p) match {
                case Some((_, idx)) =>
                  (0 until k).flatMap { t =>
                    val frameNo = t * idx.length / k
                    val (off, len) = idx(frameNo)
                    val (plane, w, h) = mjpgDecodePlane(p, off, len)
                    if (plane == null || w < 8 || h < 8) Nil
                    else {
                      val (hi, lo) = planeAHash(plane, 0, w, h)
                      Seq(Row(r.getLong(0), t, frameNo, hi, lo))
                    }
                  }
                case None => Nil
              }
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Video near-duplicate pairs: videos agreeing EXACTLY on the aHash
    * of at least `minMatches` of their `k` sampled frame positions.
    * Positional agreement (same frame_idx) keeps the candidate join
    * keyed on (idx, hash) — two videos never meet unless a sampled
    * frame collides, so shuffle volume tracks true duplication, and a
    * degenerate hash (solid-color intros shared by everything) is
    * capped by `maxBucket` like every other banded candidate
    * generator here. Output: (id_a, id_b, n_match), id_a < id_b.
    */
  def videoNearDups(df: DataFrame, k: Int = 5, minMatches: Int = 3,
      maxBucket: Int = 10000): DataFrame = {
    require(minMatches >= 1 && minMatches <= k,
      s"minMatches must be in [1, $k], got $minMatches")
    val hashes = videoFrameHashes(df, k).persist()
    val hot = hashes.groupBy("frame_idx", "ahash_hi", "ahash_lo")
      .agg(count(lit(1)).as("n")).where(col("n") > maxBucket)
      .select("frame_idx", "ahash_hi", "ahash_lo")
    val small = hashes.join(broadcast(hot),
      Seq("frame_idx", "ahash_hi", "ahash_lo"), "left_anti")
    val a = small.select(col("frame_idx"), col("ahash_hi"), col("ahash_lo"),
      col("media_id").as("id_a"))
    val b = small.select(col("frame_idx"), col("ahash_hi"), col("ahash_lo"),
      col("media_id").as("id_b"))
    val result = a.join(b, Seq("frame_idx", "ahash_hi", "ahash_lo"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).cast(LongType).as("n_match"))
      .where(col("n_match") >= minMatches)
    val out = result.persist()
    out.count()
    hashes.unpersist()
    out
  }

  /** Frame sampling stub for OPAQUE video payloads (container format
    * unknown): deterministically pick `k` byte-offsets as "frames" —
    * the slicing/fan-out shape without a decode. For payloads in the
    * engine's GVID container, [[videoFrameHashes]] supersedes this
    * with real frame geometry from the parsed header.
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
