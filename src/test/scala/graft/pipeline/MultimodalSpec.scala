package graft.pipeline

import graft.SparkSpec
import graft.multimodal.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

class MultimodalSpec extends SparkSpec {

  private def assets(rows: (Long, Array[Byte], String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, b, t) =>
        Row(id, b, t, null)
      }, 2),
      Multimodal.mediaSchema)

  private val png = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
  private val wav = Array.tabulate[Byte](5000)(i => ((i * 7) % 251).toByte)

  // ---- real container-header fixtures (hand-assembled bytes) ----

  private def be32(v: Long) = Array[Byte](
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)

  /** Minimal valid PNG prefix: signature + IHDR chunk with the dims. */
  private def pngBytes(w: Int, h: Int): Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 2, 0, 0, 0) ++ be32(0) // bit depth..filter + fake CRC

  /** JPEG: SOI, APP0 (JFIF), a comment segment, then SOF (baseline C0 or
    * progressive C2) carrying the dims, then EOI.
    */
  private def jpegBytes(w: Int, h: Int, sof: Int = 0xc0): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte) ++
      (Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++
        "JFIF".getBytes ++ Array.fill[Byte](10)(0)) ++
      (Array[Byte](0xff.toByte, 0xfe.toByte) ++ be16(7) ++
        "hello".getBytes) ++
      (Array[Byte](0xff.toByte, sof.toByte) ++ be16(17) ++
        Array[Byte](8) ++ be16(h) ++ be16(w) ++
        Array[Byte](3) ++ Array.fill[Byte](9)(1)) ++
      Array[Byte](0xff.toByte, 0xd9.toByte)

  /** GIF89a logical screen descriptor (little-endian dims). */
  private def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++
      Array[Byte](w.toByte, (w >> 8).toByte, h.toByte, (h >> 8).toByte) ++
      Array.fill[Byte](3)(0)

  /** Structurally valid animated GIF: `frames` graphic-control-ext +
    * image-descriptor pairs, each with one pixel-data sub-block, then the
    * 0x3B trailer.
    */
  private def animatedGif(frames: Int): Array[Byte] = {
    val gce = Array[Byte](0x21, 0xf9.toByte, 4, 0, 10, 0, 0, 0)
    val imgDesc = Array[Byte](0x2c, 0, 0, 0, 0, 2, 0, 2, 0, 0)
    val pixelData = Array[Byte](2 /* LZW min code */, 3, 1, 2, 3, 0)
    gifBytes(2, 2) ++
      (0 until frames).flatMap(_ => gce ++ imgDesc ++ pixelData) ++
      Array[Byte](0x3b)
  }

  it should "parse real PNG/JPEG/GIF container headers" in {
    val out = Multimodal.decodeMeta(assets(
      (1L, pngBytes(640, 480), "image/png"),
      (2L, jpegBytes(1920, 1080), "image/jpeg"),
      (3L, jpegBytes(320, 200, sof = 0xc2), "image/jpeg"), // progressive
      (4L, gifBytes(13, 37), "image/gif")))
      .collect().map(r => r.getAs[Long]("asset_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"))).toMap
    out(1L) shouldBe ((640, 480))
    out(2L) shouldBe ((1920, 1080))
    out(3L) shouldBe ((320, 200))
    out(4L) shouldBe ((13, 37))
  }

  it should "sniff formats and survive malformed headers" in {
    Multimodal.sniffFormat(pngBytes(1, 1)) shouldBe "png"
    Multimodal.sniffFormat(jpegBytes(1, 1)) shouldBe "jpeg"
    Multimodal.sniffFormat(gifBytes(1, 1)) shouldBe "gif"
    Multimodal.sniffFormat(wav) shouldBe "unknown"
    // truncated / desynced containers must fall back, never throw
    Multimodal.jpegDims(jpegBytes(9, 9).take(8)) shouldBe None
    Multimodal.pngDims(pngBytes(9, 9).take(20)) shouldBe None
    // JPEG with no SOF before EOI
    Multimodal.jpegDims(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xd9.toByte)) shouldBe None
    // truncated blob ending in an FF fill-byte run: the fill-byte scan
    // lands at the array tail and must fall back, not read past the end
    Multimodal.jpegDims(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xff.toByte, 0xfe.toByte, 0x00)) shouldBe None
    Multimodal.jpegDims(Array.fill[Byte](6)(0xff.toByte)
      .updated(1, 0xd8.toByte)) shouldBe None
  }

  it should "resize zero-dim assets to a (0, 0) box instead of dividing by zero" in {
    // null media decodes to (0, 0); under ANSI mode an unguarded
    // division would fail the task
    val out = Multimodal.resize(assets((1L, null, "image/png")),
      maxW = 32, maxH = 32).collect().head
    out.getAs[Int]("out_width") shouldBe 0
    out.getAs[Int]("out_height") shouldBe 0
  }

  it should "count real GIF frames and sample indices from them" in {
    Multimodal.gifFrameCount(animatedGif(3)) shouldBe Some(3)
    Multimodal.gifFrameCount(animatedGif(1)) shouldBe Some(1)
    // truncated mid-frame / non-GIF → None, never a crash
    Multimodal.gifFrameCount(animatedGif(2).dropRight(3)) shouldBe None
    Multimodal.gifFrameCount(wav) shouldBe None
    val out = Multimodal.sampleFrames(
      assets((1L, animatedGif(5), "image/gif")), everyN = 2)
    out.collect().map(_.getAs[Int]("frame_idx")).sorted.toSeq shouldBe
      Seq(0, 2, 4)
    // a structurally valid FRAMELESS gif samples zero rows, not a
    // sequence(0, -1) runtime error; null is handled inside gifFrameCount
    Multimodal.gifFrameCount(animatedGif(0)) shouldBe Some(0)
    Multimodal.gifFrameCount(null) shouldBe None
    Multimodal.sampleFrames(
      assets((1L, animatedGif(0), "image/gif")), everyN = 2)
      .count() shouldBe 0
  }

  it should "ingest a media directory via the binaryFile source" in {
    val dir = java.nio.file.Files.createTempDirectory("media_lake")
    java.nio.file.Files.write(dir.resolve("a.png"), pngBytes(640, 480))
    java.nio.file.Files.write(dir.resolve("b.jpg"), jpegBytes(32, 16))
    java.nio.file.Files.write(dir.resolve("c.bin"), wav)
    val assetsDf = Multimodal.readMediaDir(spark, dir.toString)
    assetsDf.schema shouldBe Multimodal.mediaSchema
    val byType = assetsDf.collect()
      .map(r => r.getAs[String]("media_type")).sorted.toSeq
    byType shouldBe Seq("application/octet-stream", "image/png", "image/jpeg").sorted
    // composes with the decode pass: real dims come back out
    val meta = Multimodal.decodeMeta(assetsDf).collect()
      .map(r => (r.getAs[String]("media_type"),
        (r.getAs[Int]("width"), r.getAs[Int]("height")))).toMap
    meta("image/png") shouldBe ((640, 480))
    meta("image/jpeg") shouldBe ((32, 16))
    // ids are stable across re-reads (path-hash, not monotonically_increasing)
    Multimodal.readMediaDir(spark, dir.toString)
      .select("asset_id").collect().map(_.getLong(0)).sorted shouldBe
      assetsDf.select("asset_id").collect().map(_.getLong(0)).sorted
  }

  it should "decode metadata deterministically over binary columns" in {
    val out = Multimodal.decodeMeta(assets(
      (1L, png, "image/png"), (2L, wav, "audio/wav"), (3L, null, "image/png")))
    out.count() shouldBe 3
    val r1 = out.filter(col("asset_id") === 1).collect().head
    r1.getAs[Long]("n_bytes") shouldBe 1000L
    r1.getAs[Int]("width") should be >= 16
    // null media → zero dims, not a crash
    val r3 = out.filter(col("asset_id") === 3).collect().head
    r3.getAs[Int]("width") shouldBe 0
    r3.getAs[Long]("n_bytes") shouldBe 0L
    // determinism across runs
    val again = Multimodal.decodeMeta(assets((1L, png, "image/png")))
      .collect().head
    again.getAs[Int]("width") shouldBe r1.getAs[Int]("width")
  }

  it should "extract normalized byte-histogram features in batches" in {
    val out = Multimodal.extractFeatures(assets((1L, png, "image/png")))
    val feats = out.collect().head.getSeq[Float](1)
    feats.length shouldBe 16
    feats.sum shouldBe 1.0f +- 1e-4f
  }

  it should "compute resize boxes bounded by the target" in {
    val out = Multimodal.resize(assets((1L, png, "image/png"),
      (2L, wav, "audio/wav")), maxW = 32, maxH = 32)
    out.collect().foreach { r =>
      r.getAs[Int]("out_width") should be <= 32
      r.getAs[Int]("out_height") should be <= 32
    }
  }

  it should "explode sampled frame indices" in {
    val out = Multimodal.sampleFrames(assets((1L, wav, "video/mp4")),
      everyN = 2)
    val idx = out.collect().map(_.getAs[Int]("frame_idx")).toSeq
    idx shouldBe idx.sorted
    idx.foreach(_ % 2 shouldBe 0)
  }

  // ---- MP4 / ISO-BMFF ----

  it should "round-trip movie parameters through real BMFF bytes" in {
    val b = Multimodal.synthMp4("isom", timescale = 1000L,
      duration = 48000L, nTracks = 2)
    val m = Multimodal.mp4Meta(b).get
    m.brand shouldBe "isom"
    m.timescale shouldBe 1000L
    m.duration shouldBe 48000L
    m.nTracks shouldBe 2
    m.durationMs shouldBe 48000L
    Multimodal.sniffFormat(b) shouldBe "mp4"
  }

  it should "locate moov children by the walk, not fixed offsets" in {
    // splice a free box between ftyp and moov, and a udta before mvhd
    val base = Multimodal.synthMp4("mp42", 600L, 1234L, 1)
    val free = Array[Byte](0, 0, 0, 12, 'f', 'r', 'e', 'e', 1, 2, 3, 4)
    val (ftyp, moov) = base.splitAt(16)
    val spliced = ftyp ++ free ++ moov
    val m = Multimodal.mp4Meta(spliced).get
    m.brand shouldBe "mp42"
    m.timescale shouldBe 600L
    m.nTracks shouldBe 1
  }

  it should "parse version-1 mvhd 64-bit durations" in {
    val b = Multimodal.synthMp4("isom", 1000L, 0L, 0)
    // rewrite the mvhd payload as version 1: v1 timescale at +20,
    // u64 duration at +24 (payload starts at byte 32)
    b(32) = 1
    def w32(i: Int, v: Long): Unit = {
      b(i) = ((v >> 24) & 0xff).toByte; b(i + 1) = ((v >> 16) & 0xff).toByte
      b(i + 2) = ((v >> 8) & 0xff).toByte; b(i + 3) = (v & 0xff).toByte
    }
    w32(32 + 20, 90000L)
    w32(32 + 24, 1L) // duration high word
    w32(32 + 28, 180000L) // duration low word: 2^32 + 180000
    val m = Multimodal.mp4Meta(b).get
    m.timescale shouldBe 90000L
    m.duration shouldBe (1L << 32) + 180000L
    m.durationMs shouldBe ((1L << 32) + 180000L) * 1000L / 90000L
  }

  it should "reject truncated or non-BMFF bytes" in {
    Multimodal.mp4Meta("not a movie".getBytes) shouldBe None
    val b = Multimodal.synthMp4("isom", 1000L, 500L, 1)
    Multimodal.mp4Meta(b.take(40)) shouldBe None // cut inside moov
    Multimodal.mp4Meta(Array.empty[Byte]) shouldBe None
  }

  it should "fall back deterministically for unparseable video bytes" in {
    val junk = assets((9L, "definitely not bmff bytes".getBytes,
      "video/mp4"))
    val a = Multimodal.decodeVideoMeta(junk).collect().head
    val b2 = Multimodal.decodeVideoMeta(junk).collect().head
    a.getAs[String]("brand") shouldBe "none"
    a.getAs[Long]("duration_ms") shouldBe b2.getAs[Long]("duration_ms")
  }

  // ---- BMP / TIFF ----

  it should "round-trip BMP dims and report top-down heights positive" in {
    val b = Multimodal.synthBmp(640, 480)
    Multimodal.bmpDims(b) shouldBe Some((640, 480))
    Multimodal.sniffFormat(b) shouldBe "bmp"
    // top-down BMP: negative stored height reads as magnitude
    b(25) = 0xff.toByte; b(24) = 0xff.toByte
    b(23) = 0xfe.toByte; b(22) = 0x20.toByte // -480 LE
    Multimodal.bmpDims(b).get._2 shouldBe 480
  }

  it should "walk TIFF IFDs in both byte orders" in {
    for (le <- Seq(true, false)) {
      val t = Multimodal.synthTiff(800, 600, littleEndian = le)
      Multimodal.tiffDims(t) shouldBe Some((800, 600))
      Multimodal.sniffFormat(t) shouldBe "tiff"
    }
  }

  it should "reject truncated or alien bytes in the new codecs" in {
    Multimodal.bmpDims("BMxx".getBytes) shouldBe None
    Multimodal.tiffDims("IIer".getBytes) shouldBe None
    Multimodal.tiffDims(Multimodal.synthTiff(10, 10, true).take(9))
      .shouldBe(None)
  }

  it should "round-trip WebP dims through all three chunk variants" in {
    for (variant <- Seq("vp8", "vp8l", "vp8x")) {
      val b = Multimodal.synthWebp(640, 480, variant)
      Multimodal.webpDims(b) shouldBe Some((640, 480))
      Multimodal.sniffFormat(b) shouldBe "webp"
      Multimodal.decodeDims(b) shouldBe ((640, 480))
    }
    // 1x1 and the 14-bit edge both survive the bit packing
    Multimodal.webpDims(Multimodal.synthWebp(1, 1, "vp8l")) shouldBe
      Some((1, 1))
    Multimodal.webpDims(Multimodal.synthWebp(16383, 16383, "vp8")) shouldBe
      Some((16383, 16383))
    Multimodal.webpDims(Multimodal.synthWebp(16384, 16384, "vp8l")) shouldBe
      Some((16384, 16384))
  }

  it should "reject truncated, desynced, or non-key-frame WebP bytes" in {
    val vp8 = Multimodal.synthWebp(64, 64, "vp8")
    // truncation anywhere in the chunk walk → None, never a throw
    for (n <- Seq(4, 11, 15, 21, vp8.length - 1))
      Multimodal.webpDims(vp8.take(n)) shouldBe None
    // WAV is RIFF too — form type must disambiguate
    Multimodal.webpDims(Multimodal.synthWav(2, 44100, 16, 100)) shouldBe None
    Multimodal.sniffFormat(vp8) should not be "wav"
    // interframe (frame-tag keyframe bit set) carries no dimensions
    val inter = vp8.clone(); inter(20) = (inter(20) | 1).toByte
    Multimodal.webpDims(inter) shouldBe None
    // corrupt VP8L signature byte
    val vp8l = Multimodal.synthWebp(64, 64, "vp8l")
    vp8l(20) = 0x2e
    Multimodal.webpDims(vp8l) shouldBe None
  }

  it should "round-trip Ogg Opus/Vorbis metadata through real pages" in {
    val opus = Multimodal.synthOgg("opus", 2, 44100, 48000L)
    val mo = Multimodal.oggMeta(opus).get
    (mo.codec, mo.channels, mo.sampleRate) shouldBe (("opus", 2, 44100))
    // opus granules tick at 48 kHz and include the 312-sample pre-skip
    mo.lastGranule shouldBe 48312L
    mo.durationMs shouldBe 1000L
    val vorb = Multimodal.oggMeta(
      Multimodal.synthOgg("vorbis", 1, 22050, 44100L)).get
    (vorb.codec, vorb.channels, vorb.sampleRate) shouldBe
      (("vorbis", 1, 22050))
    vorb.durationMs shouldBe 2000L // 44100 samples at 22050 Hz
    Multimodal.sniffFormat(opus) shouldBe "ogg"
    // truncation anywhere in the page walk, non-BOS first page,
    // unknown id header → None, never a throw
    for (n <- Seq(3, 20, 30, opus.length - 2))
      Multimodal.oggMeta(opus.take(n)) shouldBe None
    val nonBos = opus.clone(); nonBos(5) = 0
    Multimodal.oggMeta(nonBos) shouldBe None
    val badId = opus.clone(); badId(28) = 'X'
    Multimodal.oggMeta(badId) shouldBe None
    // pages of a foreign serial never contribute a granule
    val foreign = opus.clone()
    foreign(opus.length - 32 + 14) = 0x99.toByte // EOS page serial byte
    Multimodal.oggMeta(foreign).get.durationMs shouldBe 0L
  }

  it should "round-trip WebM/MKV metadata through real EBML nesting" in {
    for (doc <- Seq("webm", "matroska")) {
      val b = Multimodal.synthMkv(doc, 1920, 1080, 90000L)
      val m = Multimodal.mkvMeta(b).get
      (m.docType, m.width, m.height) shouldBe ((doc, 1920, 1080))
      m.timescaleNs shouldBe 1000000L
      m.durationMs shouldBe 90000L
      Multimodal.sniffFormat(b) shouldBe
        (if (doc == "webm") "webm" else "mkv")
    }
    val b = Multimodal.synthMkv("webm", 64, 48, 1234L)
    // truncation at every nesting level → None, never a throw
    for (n <- Seq(2, 6, 12, 20, b.length - 1))
      Multimodal.mkvMeta(b.take(n)) shouldBe None
    // a non-EBML lead byte is not MKV
    Multimodal.mkvMeta("not an mkv".getBytes) shouldBe None
    // WAV bytes are not EBML
    Multimodal.mkvMeta(Multimodal.synthWav(2, 44100, 16, 10)) shouldBe None
  }

  it should "report MP3 duration only when a Xing/Info tag is present" in {
    // VBR tag: frames * 1152 / rate, exact integral
    for (mono <- Seq(true, false); cbr <- Seq(false, true)) {
      val m = Multimodal.mp3Meta(
        Multimodal.synthMp3Vbr(44100, mono, 90000L, cbrInfoTag = cbr)).get
      m.xingFrames shouldBe Some(90000L)
      m.durationMs shouldBe Some(90000L * 1152L * 1000L / 44100L)
      m.channels shouldBe (if (mono) 1 else 2)
    }
    // no tag → per-frame facts only, no invented CBR duration
    val plain = Multimodal.mp3Meta(
      Multimodal.synthMp3(192, 48000, mono = false, withId3 = true)).get
    plain.xingFrames shouldBe None
    plain.durationMs shouldBe None
    Multimodal.sniffFormat(
      Multimodal.synthMp3Vbr(48000, mono = true, 100L)) shouldBe "mp3"
  }

  it should "return None on adversarial RIFF chunk sizes, never hang" in {
    // a chunk size near 2^32 used to wrap the Int cursor: 8 + size + pad
    // folds to 0 (walk never advances — executor hang) or negative
    // (ArrayIndexOutOfBounds). The walk now computes offsets in Long and
    // bails to None — the documented malformed-bytes contract.
    def riff(form: String, chunkSize: Long): Array[Byte] = {
      val out = new Array[Byte](24)
      "RIFF".getBytes.copyToArray(out, 0)
      form.getBytes.copyToArray(out, 8)
      "JUNK".getBytes.copyToArray(out, 12)
      out(16) = (chunkSize & 0xff).toByte
      out(17) = ((chunkSize >> 8) & 0xff).toByte
      out(18) = ((chunkSize >> 16) & 0xff).toByte
      out(19) = ((chunkSize >> 24) & 0xff).toByte
      out
    }
    for (sz <- Seq(0xfffffff8L, 0xffffffffL, 0x7ffffff8L)) {
      Multimodal.wavMeta(riff("WAVE", sz)) shouldBe None
      Multimodal.webpDims(riff("WEBP", sz)) shouldBe None
    }
    // sane walks over unknown chunks still work after the guard
    Multimodal.wavMeta(Multimodal.synthWav(2, 44100, 16, 100))
      .map(_.channels) shouldBe Some(2)
    Multimodal.webpDims(Multimodal.synthWebp(64, 48, "vp8")) shouldBe
      Some((64, 48))
  }

  it should "round-trip HEIF-family dims through the nested ispe walk" in {
    for (brand <- Seq("avif", "avis", "heic", "heif", "mif1")) {
      val b = Multimodal.synthAvif(1920, 1080, brand)
      Multimodal.avifDims(b) shouldBe Some((1920, 1080))
      Multimodal.decodeDims(b) shouldBe ((1920, 1080))
    }
    Multimodal.sniffFormat(Multimodal.synthAvif(8, 8, "avif")) shouldBe "avif"
    Multimodal.sniffFormat(Multimodal.synthAvif(8, 8, "heic")) shouldBe "heic"
  }

  it should "reject movies, truncation, and alien brands in the HEIF walk" in {
    // a plain MP4 has the ftyp walk but a movie brand — not a still image
    val mov = Multimodal.synthMp4("isom", 600, 1200, 1)
    Multimodal.avifDims(mov) shouldBe None
    Multimodal.sniffFormat(mov) shouldBe "mp4"
    val ok = Multimodal.synthAvif(64, 64, "avif")
    // truncation at every nesting level → None, never a throw
    for (n <- Seq(8, 15, 20, 30, 45, ok.length - 1))
      Multimodal.avifDims(ok.take(n)) shouldBe None
    // mp4Meta must NOT claim a HEIF still (no moov)
    Multimodal.mp4Meta(ok) shouldBe None
  }

  it should "round-trip FLAC STREAMINFO through the packed bitfield" in {
    val m = Multimodal.flacMeta(
      Multimodal.synthFlac(44100, 2, 16, 441000L)).get
    (m.sampleRate, m.channels, m.bitsPerSample, m.totalSamples,
      m.durationMs) shouldBe ((44100, 2, 16, 441000L, 10000L))
    // bitfield edges: 20-bit sample rate, 8 channels, 32 bps, 36-bit n
    val e = Multimodal.flacMeta(Multimodal.synthFlac(
      (1 << 20) - 1, 8, 32, (1L << 36) - 1)).get
    (e.sampleRate, e.channels, e.bitsPerSample, e.totalSamples) shouldBe
      (((1 << 20) - 1, 8, 32, (1L << 36) - 1))
    Multimodal.sniffFormat(
      Multimodal.synthFlac(8000, 1, 16, 0)) shouldBe "flac"
    // truncation / alien bytes → None
    Multimodal.flacMeta(
      Multimodal.synthFlac(8000, 1, 16, 10).take(20)) shouldBe None
    Multimodal.flacMeta("fLaX1234".getBytes) shouldBe None
  }

  it should "parse MP3 frame headers behind an ID3v2 skip" in {
    for (id3 <- Seq(true, false); mono <- Seq(true, false)) {
      val m = Multimodal.mp3Meta(
        Multimodal.synthMp3(192, 48000, mono, id3)).get
      (m.bitrateKbps, m.sampleRate, m.channels) shouldBe
        ((192, 48000, if (mono) 1 else 2))
    }
    Multimodal.sniffFormat(
      Multimodal.synthMp3(128, 44100, mono = false,
        withId3 = true)) shouldBe "mp3"
    // free-format / reserved indices, bad sync, truncation → None
    val bad = Multimodal.synthMp3(128, 44100, mono = false,
      withId3 = false)
    bad(2) = 0xf0.toByte // bitrate index 15 (bad)
    Multimodal.mp3Meta(bad) shouldBe None
    Multimodal.mp3Meta(Array[Byte](0x12, 0x34, 0x56, 0x78)) shouldBe None
    Multimodal.mp3Meta(Multimodal.synthMp3(128, 44100, mono = false,
      withId3 = true).take(11)) shouldBe None
  }
}
