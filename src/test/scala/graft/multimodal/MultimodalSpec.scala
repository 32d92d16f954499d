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

  // -------- REAL codecs (JDK ImageIO / javax.sound — no external libs)

  private def pngBytes(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, gray * 0x010101); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoCodec really decodes: solid-gray PNG yields its luminance, probe reads dims") {
    val codec = new Multimodal.ImageIoCodec
    val p = pngBytes(16, 12, gray = 100)
    assert(codec.probe(p) == ("png", Some(16), Some(12)))
    val feats = codec.features(p, dim = 9)
    assert(feats.length == 9)
    // luminance of gray 100: (0.299+0.587+0.114)*100/255 = 100/255
    feats.foreach(f => assert(math.abs(f - 100.0 / 255.0) < 1e-3, f))
    // garbage bytes: graceful zero vector, unknown probe
    assert(codec.features(Array[Byte](1, 2, 3), 4).toSeq == Seq(0f, 0f, 0f, 0f))
    assert(codec.probe(Array[Byte](1, 2, 3))._1 == "unknown")
  }

  private def wavBytes(nFrames: Int, sampleRate: Float, amplitude: Double): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until nFrames).foreach { i =>
      // square wave: constant |amplitude| -> RMS == amplitude exactly
      val s = (amplitude * (if (i % 2 == 0) 1 else -1) * 32767).toInt.toShort
      bb.putShort(i * 2, s)
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WavCodec really decodes: square-wave RMS per window, probe reads rate and frames") {
    val codec = new Multimodal.WavCodec
    val p = wavBytes(nFrames = 800, sampleRate = 8000f, amplitude = 0.5)
    assert(codec.probe(p) == ("wav", Some(8000), Some(800)))
    val feats = codec.features(p, dim = 4)
    assert(feats.length == 4)
    feats.foreach(f => assert(math.abs(f - 0.5) < 0.01, f))
  }

  test("resizeImages re-encodes at the target size (real decode -> redraw -> PNG)") {
    import spark.implicits._
    val df = Seq((7L, pngBytes(16, 16, gray = 50))).toDF("media_id", "payload")
    val resized = Multimodal.resizeImages(df, 4, 4)
    val out = resized.head()
    assert(out.getLong(0) == 7L)
    val codec = new Multimodal.ImageIoCodec
    assert(codec.probe(out.getAs[Array[Byte]](1)) == ("png", Some(4), Some(4)))
  }

  test("withProbedMetadata fills real image dims and audio rate/frames") {
    import spark.implicits._
    val img = Seq((1L, pngBytes(10, 20, gray = 9))).toDF("media_id", "payload")
    val m1 = Multimodal.withProbedMetadata(img, new Multimodal.ImageIoCodec, "image")
      .select("meta.format", "meta.width", "meta.height", "meta.sample_rate").head()
    assert(m1.getString(0) == "png" && m1.getInt(1) == 10 && m1.getInt(2) == 20 && m1.isNullAt(3))
    val wav = Seq((2L, wavBytes(100, 8000f, 0.3))).toDF("media_id", "payload")
    val m2 = Multimodal.withProbedMetadata(wav, new Multimodal.WavCodec, "audio")
      .select("meta.format", "meta.sample_rate", "meta.n_frames", "meta.width").head()
    assert(m2.getString(0) == "wav" && m2.getInt(1) == 8000 && m2.getInt(2) == 100 && m2.isNullAt(3))
  }

  private def gradientPng(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (f(x, y) & 0xFF) * 0x010101); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("imageAHash: hand-computed bits on an 8x8 image; brightness shift is hash-invariant") {
    import spark.implicits._
    // left half 0, right half 200: mean = 100, right-half bits set
    val half = (x: Int, _: Int) => if (x < 4) 0 else 200
    val shifted = (x: Int, _: Int) => if (x < 4) 30 else 230 // +30 everywhere
    val df = Seq(
      (0L, gradientPng(8, 8, half)),
      (1L, gradientPng(8, 8, shifted)),
      (2L, Array[Byte](1, 2, 3)) // undecodable -> nulls
    ).toDF("media_id", "payload")
    val out = Multimodal.imageAHash(df)
      .orderBy("media_id")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    // bits set where x >= 4, for every y: per row mask 0b11110000 = 0xF0
    val rowMask = 0xF0L
    val expectHalf = (0 until 4).map(r => rowMask << (8 * r)).reduce(_ | _)
    assert(out(0) == ((0L, Some(expectHalf), Some(expectHalf))))
    assert(out(1)._2 == out(0)._2 && out(1)._3 == out(0)._3,
      "brightness-shifted image must hash identically")
    assert(out(2) == ((2L, None, None)))
  }

  test("imageNearDups: banded join equals brute-force hamming pairs; twins at dist 0") {
    import spark.implicits._
    val f = (b: Int) => (x: Int, y: Int) => (x * (3 + b * 7 % 23) + y * (1 + b * 5 % 19)) % 256
    val df = (0L until 20L).map(i => (i, gradientPng(8, 8, f((i / 2).toInt))))
      .toDF("media_id", "payload")
    val got = Multimodal.imageNearDups(df, maxDist = 3)
      .as[(Long, Long, Long)].collect().toSet
    // brute-force reference over the same hashes
    val hs = Multimodal.imageAHash(df)
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (id, hi, lo) => (id, hi.get, lo.get) }
    val expect = (for {
      (ia, hia, loa) <- hs; (ib, hib, lob) <- hs if ia < ib
      d = java.lang.Long.bitCount(hia ^ hib) + java.lang.Long.bitCount(loa ^ lob)
      if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(got == expect, "pigeonhole banding must be exact at maxDist 3")
    assert((0L until 20L by 2).forall(i => got.contains((i, i + 1, 0L))),
      "every identical twin pair must surface at dist 0")
    assertThrows[IllegalArgumentException](Multimodal.imageNearDups(df, maxDist = 4))
  }

  test("imageNearDups: hot-bucket cap drops degenerate all-identical buckets loudly") {
    import spark.implicits._
    // 30 identical images: every band bucket has 30 members
    val df = (0L until 30L).map(i => (i, gradientPng(8, 8, (x, _) => x * 20)))
      .toDF("media_id", "payload")
    assert(Multimodal.imageNearDups(df, maxDist = 3).count() == 30L * 29 / 2)
    assert(Multimodal.imageNearDups(df, maxDist = 3, maxBucket = 10).count() == 0,
      "capped bands must drop the degenerate bucket entirely (documented recall trade)")
  }

  private def wavOf(samples: Array[Short], rate: Int = 8000): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(bb.putShort)
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audioEnvelopeHash: loud-half clip has the expected bits; gain scaling is hash-invariant") {
    import spark.implicits._
    // 64 samples = 64 one-sample windows: first 32 quiet (100), last 32 loud (1000)
    val base = Array.tabulate(64)(w => (if (w < 32) 100 else 1000).toShort)
    val double = base.map(s => (s * 2).toShort)
    val df = Seq(
      (0L, wavOf(base)),
      (1L, wavOf(double)),             // 2x gain: same louder-than-mean set
      (2L, Array[Byte](9, 9, 9)),      // undecodable
      (3L, wavOf(Array.tabulate(10)(_.toShort))) // < 64 frames
    ).toDF("media_id", "payload")
    val out = Multimodal.audioEnvelopeHash(df).orderBy("media_id")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    // loud windows are 32..63 -> env_hi all 32 bits, env_lo none
    assert(out(0) == ((0L, Some(0xFFFFFFFFL), Some(0L))))
    assert(out(1)._2 == out(0)._2 && out(1)._3 == out(0)._3,
      "gain-scaled clip must fingerprint identically")
    assert(out(2) == ((2L, None, None)) && out(3) == ((3L, None, None)))
  }

  // -------- GVID raw video container

  private def gvid(w: Int, h: Int, nf: Int, fps: Int = 5)(f: (Int, Int, Int) => Int): Array[Byte] =
    Multimodal.gvidEncode(w, h, fps,
      Array.tabulate(nf)(fr => Array.tabulate(w * h)(j => f(fr, j % w, j / w).toByte)))

  private def mjpg(w: Int, h: Int, nf: Int, fps: Int = 5)(f: (Int, Int, Int) => Int): Array[Byte] =
    Multimodal.mjpgEncode(w, h, fps,
      Array.tabulate(nf)(fr => Array.tabulate(w * h)(j => f(fr, j % w, j / w).toByte)))

  test("mjpg: really-compressed JPEG frames — container round trip, probe dispatch") {
    val p = mjpg(16, 12, nf = 4, fps = 24)((fr, x, y) => (fr * 37 + x * 5 + y * 3) % 200)
    // frames are REAL JPEGs: each indexed frame starts with the JPEG SOI marker
    val Some((fps, idx)) = Multimodal.mjpgFrameIndex(p)
    assert(fps == 24 && idx.length == 4)
    idx.foreach { case (off, len) =>
      assert(len > 2)
      assert((p(off) & 0xFF) == 0xFF && (p(off + 1) & 0xFF) == 0xD8, "missing JPEG SOI")
    }
    // lossy but compressed: a 16x12 gradient JPEG is smaller than raw
    assert(idx.map(_._2).sum < 4 * 16 * 12 * 2)
    assert(Multimodal.mjpgParseMeta(p) == Some((16, 12, 24, 4)))
    // probe dispatch: GVID and MJPG rows coexist in one call
    import spark.implicits._
    val df = Seq(
      (0L, p),
      (1L, gvid(9, 8, nf = 3, fps = 12)((_, _, _) => 1)),
      (2L, Array[Byte](9, 9, 9))).toDF("media_id", "payload")
    val out = Multimodal.videoProbe(df).orderBy("media_id").collect()
    assert(out(0).getString(1) == "mjpg" && out(0).getInt(2) == 16 &&
      out(0).getInt(3) == 12 && out(0).getInt(4) == 24 && out(0).getInt(5) == 4)
    assert(out(1).getString(1) == "gvid")
    assert(out(2).isNullAt(1))
    // truncated mid-frame and wrong magic are data, not exceptions
    assert(Multimodal.mjpgFrameIndex(p.take(p.length - 3)).isEmpty)
    val bad = p.clone(); bad(0) = 'X'
    assert(Multimodal.mjpgFrameIndex(bad).isEmpty)
  }

  test("mjpg: corrupt JPEG frame bytes are data (NULL probe, absent hashes), never an exception") {
    import spark.implicits._
    // a VALID MJPG container whose single frame is a RECOGNIZED JPEG
    // (SOI + APP0 marker, so ImageIO selects the JPEG reader) followed
    // by garbage: reader.getWidth / ImageIO.read then THROW
    // IIOException rather than returning null — the catch must degrade
    // this to the same NULL/absent contract as unrecognized bytes
    val frame = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte) ++
      Array.tabulate(64)(i => (i * 17 + 3).toByte)
    val p = Array[Byte]('M', 'J', 'P', 'G', 1, 10, 0, 1) ++
      Array[Byte](0, 0, 0, frame.length.toByte) ++ frame
    // container parses; the frame is indexed
    val Some((fps, idx)) = Multimodal.mjpgFrameIndex(p)
    assert(fps == 10 && idx.length == 1)
    // header-only meta read: corrupt header → None, not a throw
    assert(Multimodal.mjpgParseMeta(p).isEmpty)
    val df = Seq((0L, p)).toDF("media_id", "payload")
    val probe = Multimodal.videoProbe(df).collect()
    assert(probe.length == 1 && probe(0).isNullAt(1),
      "corrupt-frame video must probe as unknown, not kill the job")
    // full decode path: corrupt frame → no fingerprint rows
    assert(Multimodal.videoFrameHashes(df, k = 3).count() == 0L)
    // and a mixed batch still fingerprints the healthy videos
    val mixed = Seq(
      (0L, p),
      (1L, mjpg(16, 12, nf = 2)((fr, x, y) => (fr * 37 + x * 5 + y) % 200))
    ).toDF("media_id", "payload")
    val rows = Multimodal.videoFrameHashes(mixed, k = 2).collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(0) == 1L))
  }

  test("mjpg frame hashes: byte-identical sources collide, q154's seed classes stay distinct") {
    import spark.implicits._
    // the q154 fixture generator: video i's frame f draws gradient
    // seed (i div 2)*(f+1) mod 5, no brightness trick — twins are
    // byte-identical SOURCE planes, so their JPEGs and hashes are
    // equal by construction even under lossy coding
    def vid(i: Long): Array[Byte] = mjpg(16, 16, nf = 10)((fr, x, y) =>
      (((i / 2) * (fr + 1) % 5).toInt * 37 + x * 16 + y * 2) % 200)
    val df = (0L until 30L).map(i => (i, vid(i))).toDF("media_id", "payload")
    val got = Multimodal.videoNearDups(df, k = 5, minMatches = 3)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq
    // seed-arithmetic prediction: sampled frames are 2t (t < 5); pair
    // (a, b) matches where both seeds agree — requires the DISTINCT
    // seed classes to hash distinctly after the JPEG round trip, which
    // is exactly the assumption q154's oracle rests on
    def sd(i: Long, f: Int): Long = (i / 2) * (f + 1) % 5
    val expect = (for {
      a <- 0L until 30L; b <- (a + 1) until 30L
      n = (0 until 5).count(t => sd(a, 2 * t) == sd(b, 2 * t))
      if n >= 3
    } yield (a, b, n.toLong)).toSeq
    assert(got == expect,
      s"JPEG-roundtrip hashes must match the seed prediction:\n got=$got\n expect=$expect")
  }

  test("gvid encode/parse round trip; garbage and truncated payloads probe as unknown") {
    val p = gvid(10, 6, nf = 4, fps = 24)((_, _, _) => 7)
    assert(Multimodal.gvidParseHeader(p) == Some((10, 6, 24, 4)))
    val codec = new Multimodal.GvidCodec
    assert(codec.probe(p) == (("gvid", Some(10), Some(6))))
    assert(codec.probe(Array[Byte](1, 2, 3))._1 == "unknown")
    // truncated mid-plane: header promises 4 frames, bytes hold 2
    assert(Multimodal.gvidParseHeader(p.take(Multimodal.GvidHeaderLen + 2 * 60)).isEmpty)
    // wrong magic
    val bad = p.clone(); bad(0) = 'X'
    assert(Multimodal.gvidParseHeader(bad).isEmpty)
  }

  test("GvidCodec features: temporal luminance envelope, exact on constant frames") {
    val codec = new Multimodal.GvidCodec
    // 4 frames of constant gray 0, 51, 102, 153 -> 4 slices = those / 255
    val p = gvid(8, 8, nf = 4)((fr, _, _) => fr * 51)
    val feats = codec.features(p, dim = 4)
    assert(feats.length == 4)
    (0 until 4).foreach(i => assert(math.abs(feats(i) - i * 51 / 255.0f) < 1e-6, feats.toSeq))
    assert(codec.features(Array[Byte](1), 3).toSeq == Seq(0f, 0f, 0f))
  }

  test("videoProbe parses headers distributed; unparseable rows carry NULLs") {
    import spark.implicits._
    val df = Seq(
      (0L, gvid(9, 8, nf = 3, fps = 12)((_, _, _) => 1)),
      (1L, Array[Byte](1, 2, 3))
    ).toDF("media_id", "payload")
    val out = Multimodal.videoProbe(df).orderBy("media_id").collect()
    assert(out(0).getString(1) == "gvid" && out(0).getInt(2) == 9 &&
      out(0).getInt(3) == 8 && out(0).getInt(4) == 12 && out(0).getInt(5) == 3)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }

  test("videoFrameHashes: real frame geometry, brightness-shift invariance, no rows for bad payloads") {
    import spark.implicits._
    // 10 frames, k=4 -> frame_no = 0,2,5,7; frame content keyed on fr
    val v0 = gvid(8, 8, nf = 10)((fr, x, y) => (fr * 37 + x * 16 + y) % 200)
    val v1 = gvid(8, 8, nf = 10)((fr, x, y) => (fr * 37 + x * 16 + y) % 200 + 50) // +50 shift
    val df = Seq((0L, v0), (1L, v1), (2L, Array[Byte](1, 2))).toDF("media_id", "payload")
    val out = Multimodal.videoFrameHashes(df, k = 4)
      .as[(Long, Int, Int, Long, Long)].collect()
    assert(out.count(_._1 == 2L) == 0, "unparseable payload must yield no rows")
    val f0 = out.filter(_._1 == 0L).sortBy(_._2)
    assert(f0.map(_._3).toSeq == Seq(0, 2, 5, 7), "frame_no must be t*n_frames/k")
    val f1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(f0.map(r => (r._4, r._5)).toSeq == f1.map(r => (r._4, r._5)).toSeq,
      "brightness-shifted video must hash identically per sampled frame")
  }

  test("videoNearDups: threshold filters partial matches; equals brute-force over frame hashes") {
    import spark.implicits._
    // video i: frames seeded (i/2)*(fr+1) % 5 — twins match everywhere,
    // cross-base pairs only where the seed product wraps equal
    def vid(i: Long): Array[Byte] =
      gvid(8, 8, nf = 10)((fr, x, y) =>
        ((i / 2).toInt * (fr + 1) % 5 * 37 + x * 16 + y * 2) % 200 + (i % 2).toInt * 10)
    val df = (0L until 12L).map(i => (i, vid(i))).toDF("media_id", "payload")
    val got = Multimodal.videoNearDups(df, k = 5, minMatches = 3)
      .as[(Long, Long, Long)].collect().toSet
    // brute force from the hashes themselves
    val hs = Multimodal.videoFrameHashes(df, k = 5)
      .as[(Long, Int, Int, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._4, r._5)).toSeq).toMap
    val expect = (for {
      a <- 0L until 12L; b <- (a + 1) until 12L
      m = hs(a).zip(hs(b)).count { case (x, y) => x == y }
      if m >= 3
    } yield (a, b, m.toLong)).toSet
    assert(got == expect)
    assert((0L until 12L by 2).forall(i => got.contains((i, i + 1, 5L))),
      "brightness-shifted twins must match on all sampled frames")
    assertThrows[IllegalArgumentException](Multimodal.videoNearDups(df, k = 5, minMatches = 6))
  }

  test("videoFrameHashes plan: map-only — payload reduces to hashes inside the scan stage") {
    import spark.implicits._
    val df = (0L until 8L).map(i => (i, gvid(8, 8, nf = 6)((fr, x, y) =>
      ((i / 2).toInt * 37 + fr * 19 + x * 16 + y) % 200))).toDF("media_id", "payload")
    val hashes = Multimodal.videoFrameHashes(df, k = 3)
    assert(graft.operators.Scale.countShuffles(hashes) == 0,
      "decode+hash must run in the scan stage; payload bytes never reach an exchange")
    // downstream near-dup exchanges carry only ids/hashes/counts —
    // every column videoNearDups can shuffle comes from this schema
    assert(hashes.schema.fieldNames.toSet ==
      Set("media_id", "frame_idx", "frame_no", "ahash_hi", "ahash_lo"))
  }

  test("adpcm: constant blocks round-trip EXACTLY; slow ramps within tolerance; 4:1 size") {
    // constant-amplitude blocks: first sample verbatim, diffs 0 ->
    // code 0 at index 0 -> delta step>>3 = 0 -> bit-exact decode
    val const = Array.tabulate(64)(t => (if ((t / 4) % 2 == 0) 6000 else 0).toShort)
    val p = Multimodal.adpcmEncode(8000, const, blockSamples = 4)
    val Some((rate, dec)) = Multimodal.adpcmDecode(p)
    assert(rate == 8000)
    assert(dec.toSeq == const.toSeq, "constant 4-sample blocks must decode exactly")
    // compression is real: 15 header + 64/4 blocks * (3 + 2) bytes
    assert(p.length == 15 + 16 * 5, s"payload ${p.length} bytes")
    // a slow ramp (delta 3/sample) stays within the small-step error band
    val ramp = Array.tabulate(256)(t => (t * 3).toShort)
    val Some((_, dec2)) = Multimodal.adpcmDecode(
      Multimodal.adpcmEncode(8000, ramp, blockSamples = 64))
    val maxErr = ramp.zip(dec2).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 16, s"slow-ramp reconstruction error $maxErr")
  }

  test("adpcm: corrupt and truncated payloads are data (None / unknown probe), never exceptions") {
    assert(Multimodal.adpcmDecode("garbage".getBytes) == None)
    assert(Multimodal.adpcmDecode(Array.empty[Byte]) == None)
    val good = Multimodal.adpcmEncode(8000,
      Array.tabulate(64)(_.toShort), blockSamples = 4)
    assert(Multimodal.adpcmDecode(good.take(20)) == None, "truncated body")
    val codec = new Multimodal.AdpcmCodec
    assert(codec.probe("noise".getBytes)._1 == "unknown")
    assert(codec.probe(good) == (("adpcm", Some(8000), Some(64))))
    // features: constant full-scale signal -> RMS ~ amplitude/32768
    val loud = Multimodal.adpcmEncode(8000,
      Array.fill[Short](64)(16384), blockSamples = 4)
    val f = codec.features(loud, 4)
    assert(f.forall(v => math.abs(v - 0.5f) < 1e-3f), f.toSeq.toString)
  }

  test("adpcmNearDups: pairs equal the closed-form loudness classes of the q221 fixture") {
    import org.apache.spark.sql.types._
    def loud(i: Long, w: Int): Boolean =
      ((i / 2 + w) % 4 == 0) || (w == 60 + (i % 2).toInt * 2)
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rows = (0L until 30L).map { i =>
      val samples = Array.tabulate(256)(t =>
        (if (loud(i, t / 4)) 6000 else 0).toShort)
      org.apache.spark.sql.Row(i, Multimodal.adpcmEncode(8000, samples, 4))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val got = Multimodal.adpcmNearDups(df, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force expectation straight from the loudness rule
    val expected = (for {
      a <- 0L until 30L; b <- (a + 1) until 30L
      d = (0 until 64).count(w => loud(a, w) != loud(b, w))
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "fixture must produce near-dup pairs")
    assert(expected.exists(_._3 > 0), "fixture must produce non-identical near-dups")
  }

  test("videoSceneCuts: cuts exactly at scene boundaries of identical-frame scenes") {
    import spark.implicits._
    // 2 scenes x 3 identical frames; patterns differ -> one cut at
    // frame 3 (and none inside scenes, hamming 0 there)
    def plane(a: Int, b: Int): Array[Byte] =
      Array.tabulate(64)(j => (((j % 8) * a + (j / 8) * b) % 256).toByte)
    val frames = Array.fill(3)(plane(7, 3)) ++ Array.fill(3)(plane(11, 5))
    val df = Seq((0L, Multimodal.gvidEncode(8, 8, 4, frames)))
      .toDF("media_id", "payload")
    val cuts = Multimodal.videoSceneCuts(df, minHamming = 1)
      .select("media_id", "cut_frame").as[(Long, Long)].collect().toSeq
    assert(cuts == Seq((0L, 3L)), s"expected one cut at frame 3, got $cuts")
    // all-frame hashes cover every frame; within-scene distance is 0
    val n = Multimodal.videoAllFrameHashes(df).count()
    assert(n == 6L)
  }

  test("audioSilenceSegments: closed-form silent runs merge into maximal intervals") {
    import spark.implicits._
    // 128 samples -> 64 windows of 2; amplitude 100 except windows
    // 10-14 and 40 at amplitude 3 -> two segments (10,5) and (40,1)
    val samples = Array.tabulate(128) { t =>
      val w = t / 2
      (if ((w >= 10 && w <= 14) || w == 40) 3 else 100).toShort
    }
    val payload = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bytes = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(bytes.putShort)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(bytes.array()), fmt, samples.length),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val df = Seq((7L, payload)).toDF("media_id", "payload")
    val segs = Multimodal.audioSilenceSegments(df, threshold = 30L)
      .orderBy("seg_start").as[(Long, Long, Long)].collect().toSeq
    assert(segs == Seq((7L, 10L, 5L), (7L, 40L, 1L)))
    // envelope itself is the exact per-window mean-abs
    val env = Multimodal.audioEnvelope(df).where(col("win") === 10)
      .select("env").as[Long].head()
    assert(env == 3L)
  }

  test("imageAHash: 16x16 downscales by integer block average to the same hash as its 8x8 twin") {
    import spark.implicits._
    val f = (x: Int, y: Int) => (x * 13 + y * 7) % 256
    // 16x16 where each 2x2 block is the constant f(x/2, y/2): block
    // average reproduces the 8x8 image exactly
    val df = Seq(
      (0L, gradientPng(8, 8, f)),
      (1L, gradientPng(16, 16, (x, y) => f(x / 2, y / 2)))
    ).toDF("media_id", "payload")
    val out = Multimodal.imageAHash(df)
      .orderBy("media_id")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    assert(out(0)._2 == out(1)._2 && out(0)._3 == out(1)._3,
      s"block-averaged 16x16 must hash like its 8x8 source: $out")
    assert(out(0)._2.nonEmpty)
  }
}
