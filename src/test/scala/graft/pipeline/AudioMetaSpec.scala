package graft.pipeline

import graft.SparkSpec
import graft.multimodal.Multimodal

/** WAV/RIFF codec: synth↔parse round trips, chunk-walk robustness
  * (interleaved LIST chunks, odd-size padding, truncation), integral
  * duration, and the batched decodeAudioMeta pass with its synthetic
  * fallback.
  */
class AudioMetaSpec extends SparkSpec {
  import spark.implicits._

  "wavMeta" should "round-trip synthesized parameters exactly" in {
    val cases = Seq(
      (1, 8000, 8, 8000L, 1000L),     // mono 8-bit, exactly 1 s
      (2, 44100, 16, 44100L, 1000L),  // CD stereo, 1 s
      (1, 16000, 16, 4000L, 250L),    // quarter second
      (1, 8000, 8, 1234L, 154L))      // non-integral: 154.25 -> 154
    for ((ch, rate, bits, n, ms) <- cases) {
      val m = Multimodal.wavMeta(Multimodal.synthWav(ch, rate, bits, n)).get
      (m.channels, m.sampleRate, m.bitsPerSample, m.durationMs) shouldBe
        ((ch, rate, bits, ms))
      m.dataBytes shouldBe n * ch * bits / 8
    }
  }

  it should "find fmt and data through interleaved chunks" in {
    val base = Multimodal.synthWav(1, 8000, 16, 100L)
    // splice a LIST/INFO chunk right after "WAVE", before fmt
    val list = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val spliced = base.take(12) ++ list ++ base.drop(12)
    val m = Multimodal.wavMeta(spliced).get
    (m.sampleRate, m.dataBytes) shouldBe ((8000, 200L))
  }

  it should "respect word alignment when skipping odd-size chunks" in {
    val base = Multimodal.synthWav(1, 8000, 16, 100L)
    // odd-size (5) chunk carries one pad byte
    val odd = "LIST".getBytes ++ Array[Byte](5, 0, 0, 0) ++
      "INFO!".getBytes ++ Array[Byte](0)
    val m = Multimodal.wavMeta(base.take(12) ++ odd ++ base.drop(12))
    m.map(_.sampleRate) shouldBe Some(8000)
  }

  it should "reject non-RIFF, truncated and zero-rate bytes" in {
    Multimodal.wavMeta(null) shouldBe None
    Multimodal.wavMeta("RIFFxxxxAVI ".getBytes) shouldBe None
    Multimodal.wavMeta(Multimodal.synthWav(1, 8000, 16, 100L).take(20)) shouldBe None
    Multimodal.wavMeta(Multimodal.synthWav(1, 0, 16, 100L)) shouldBe None
  }

  it should "sniff the wav container" in {
    Multimodal.sniffFormat(Multimodal.synthWav(1, 8000, 8, 10L)) shouldBe "wav"
  }

  "decodeAudioMeta" should "parse real WAVs and synthesize for opaque bytes" in {
    val opaque = Array.tabulate[Byte](320)(i => ((i * 13) % 251).toByte)
    val df = Seq(
      (1L, Multimodal.synthWav(2, 22050, 16, 22050L), "audio/wav"),
      (2L, opaque, "application/octet-stream"))
      .toDF("asset_id", "media", "media_type")
    val out = Multimodal.decodeAudioMeta(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val real = out(1L)
    (real.getInt(2), real.getInt(3), real.getInt(4), real.getLong(5)) shouldBe
      ((2, 22050, 16, 1000L))
    // fallback is deterministic: run twice, same synthetic values
    val again = Multimodal.decodeAudioMeta(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(2L).toSeq shouldBe again(2L).toSeq
    out(2L).getInt(3) should be >= 8000
  }

  it should "route every parsed audio container through its real parser" in {
    // the DataFrame pass must serve FLAC/Ogg/MP3 truthfully, not through
    // the byte-hash fallback: channels/rate/duration from the container,
    // bits_per_sample 0 for the lossy codecs (no PCM width exists),
    // duration -1 for a tagless MP3 (never a CBR guess)
    val df = Seq(
      (1L, Multimodal.synthFlac(48000, 2, 24, 96000L), "audio/flac"),
      (2L, Multimodal.synthOgg("opus", 2, 44100, 24000L), "audio/ogg"),
      (3L, Multimodal.synthOgg("vorbis", 1, 16000, 8000L), "audio/ogg"),
      (4L, Multimodal.synthMp3Vbr(44100, mono = false, 90000L),
        "audio/mpeg"),
      (5L, Multimodal.synthMp3(128, 44100, mono = true, withId3 = false),
        "audio/mpeg"))
      .toDF("asset_id", "media", "media_type")
    val out = Multimodal.decodeAudioMeta(df).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5))).toMap
    out(1L) shouldBe ((2, 48000, 24, 2000L))     // flac: exact PCM facts
    out(2L) shouldBe ((2, 44100, 0, 500L))       // opus: 24k at 48 kHz
    out(3L) shouldBe ((1, 16000, 0, 500L))       // vorbis: stream clock
    out(4L) shouldBe ((2, 44100, 0, 90000L * 1152L * 1000L / 44100L))
    out(5L) shouldBe ((1, 44100, 0, -1L))        // tagless: no duration
  }
}
