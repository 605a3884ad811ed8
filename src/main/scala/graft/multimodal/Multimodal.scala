package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as an opaque `binary` column plus typed
  * metadata; per-asset compute runs batched inside `mapPartitions` (the
  * JVM analogue of Arrow-batched pandas UDFs — same batch shape, schema
  * in/schema out).
  *
  * Metadata decode is REAL at the container level: pure-Scala header
  * parsers read width/height from PNG IHDR, JPEG SOF, and GIF logical
  * screen descriptors (no external codec libraries). Pixel-level work
  * (resampling, frame extraction) stays header-level — a deployment wires
  * a pixel codec into the same batched shape. Bytes that are not a
  * recognized image container (audio/video payloads) get deterministic
  * byte-hash synthetic dims so the plumbing is format-total.
  */
object Multimodal {

  /** Canonical media-asset schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("media_type", StringType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("sample_rate", IntegerType))))))

  /** Rows processed per batch inside mapPartitions — the Arrow-batch
    * analogue; bounds per-task peak memory independent of partition size.
    */
  val BatchSize = 64

  // ====================================================================
  // Header-level codecs: pure-Scala container parsing for the three
  // ubiquitous image formats. No pixel decode (that's a deployment-time
  // library concern); width/height come straight from the container
  // header bytes, which is all the metadata pass needs.
  // ====================================================================

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) |
      u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  /** PNG: 8-byte signature, then the IHDR chunk is REQUIRED first
    * (PNG spec §11.2.2) — width/height are the two big-endian u32s at
    * offsets 16 and 20.
    */
  def pngDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 &&
      u8(b, 0) == 0x89 && u8(b, 1) == 'P' && u8(b, 2) == 'N' &&
      u8(b, 3) == 'G' && u8(b, 4) == 0x0d && u8(b, 5) == 0x0a &&
      u8(b, 6) == 0x1a && u8(b, 7) == 0x0a &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((be32(b, 16).toInt, be32(b, 20).toInt))
    else None

  /** JPEG: walk the marker segments from SOI (FFD8) to the first
    * start-of-frame (SOF0..SOF15 minus DHT/JPG/DAC = C0..CF \ {C4,C8,CC});
    * the frame header is [len][precision][height u16][width u16].
    */
  def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None // desynced — not a marker
      var m = u8(b, i + 1)
      while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) } // fill bytes
      // the fill-byte loop can advance i to the array tail: re-check before
      // any further read (a truncated blob ending in an FF-run must fall
      // back to synthetic dims, not throw out of decodeMeta's task)
      if (i + 3 >= b.length) return None
      if (m == 0xd9 || m == 0xda) return None // EOI / scan start: no SOF seen
      if ((m & 0xf0) == 0xc0 && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        return if (i + 8 < b.length) Some((be16(b, i + 7), be16(b, i + 5)))
        else None
      }
      if (m >= 0xd0 && m <= 0xd7) i += 2 // RSTn: no length field
      else i += 2 + be16(b, i + 2) // skip segment (length includes itself)
    }
    None
  }

  /** GIF87a/GIF89a: logical screen width/height, little-endian u16 at 6/8. */
  def gifDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some((le16(b, 6), le16(b, 8)))
    else None

  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  /** Parsed WAV audio metadata. duration_ms is exact integral
    * data_bytes·1000 div byte_rate.
    */
  final case class WavMeta(channels: Int, sampleRate: Int,
      bitsPerSample: Int, dataBytes: Long, durationMs: Long)

  /** WAV/RIFF: "RIFF"[size]"WAVE", then a chunk walk — [id u32][size
    * u32LE][payload, word-aligned]. The fmt chunk (audio format u16LE,
    * channels u16LE, sample rate u32LE, byte rate u32LE, block align,
    * bits per sample) need not be the first chunk and the data chunk
    * need not follow it directly (LIST/INFO chunks intervene in real
    * recorder output), so both are located by the walk, not by fixed
    * offsets. Returns None for non-RIFF bytes, truncation mid-chunk, a
    * missing fmt/data chunk, or a zero byte rate (duration undefined).
    */
  def wavMeta(b: Array[Byte]): Option[WavMeta] = {
    if (b == null || b.length < 12 ||
      b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var i = 12
    var fmt: Option[(Int, Int, Long, Int)] = None // ch, rate, byteRate, bits
    var dataBytes = -1L
    while (i + 8 <= b.length && (fmt.isEmpty || dataBytes < 0)) {
      val size = le32(b, i + 4)
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' &&
        b(i + 3) == ' ') {
        if (size < 16 || i + 8 + 16 > b.length) return None
        fmt = Some((le16(b, i + 8 + 2), le32(b, i + 8 + 4).toInt,
          le32(b, i + 8 + 8), le16(b, i + 8 + 14)))
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' &&
        b(i + 3) == 'a') {
        dataBytes = size
      }
      // chunks are word-aligned: odd sizes carry a pad byte. The next
      // offset is computed in Long and bounds-checked: a malformed
      // chunk size near 2^32 would otherwise wrap the Int cursor (hung
      // walk at 0, or negative index throwing instead of the documented
      // None-for-malformed contract).
      val next = i + 8L + size + (size % 2)
      if (next <= i || next > Int.MaxValue) return None
      i = next.toInt
    }
    fmt match {
      case Some((ch, rate, byteRate, bits))
          if dataBytes >= 0 && byteRate > 0 =>
        Some(WavMeta(ch, rate, bits, dataBytes,
          dataBytes * 1000L / byteRate))
      case _ => None
    }
  }

  /** Build a canonical 44-byte-header PCM WAV blob (header + silent
    * payload capped at 64 bytes — metadata passes never read samples).
    * The synthesis twin of [[wavMeta]]: gates and specs round-trip
    * arbitrary parameters through REAL container bytes instead of
    * trusting the parser's own constants.
    */
  def synthWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nSamples: Long): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataBytes = nSamples * blockAlign
    val byteRate = sampleRate.toLong * blockAlign
    val payload = math.min(dataBytes, 64L).toInt
    val out = new Array[Byte](44 + payload)
    def w16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(i: Int, v: Long): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte
      out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    "RIFF".getBytes.copyToArray(out, 0); w32(4, 36L + dataBytes)
    "WAVE".getBytes.copyToArray(out, 8)
    "fmt ".getBytes.copyToArray(out, 12); w32(16, 16L); w16(20, 1)
    w16(22, channels); w32(24, sampleRate.toLong); w32(28, byteRate)
    w16(32, blockAlign); w16(34, bitsPerSample)
    "data".getBytes.copyToArray(out, 36); w32(40, dataBytes)
    out
  }

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  /** BMP (BITMAPINFOHEADER): "BM", then width/height as s32LE at file
    * offsets 18/22; height may be negative (top-down rows) — dims
    * report its magnitude. None for non-BMP or truncated bytes.
    */
  def bmpDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b == null || b.length < 26 || b(0) != 'B' || b(1) != 'M') None
    else {
      val w = le32(b, 18).toInt
      val h = le32(b, 22).toInt
      if (w <= 0 || h == 0) None else Some((w, math.abs(h)))
    }

  /** Minimal valid BMP blob (54-byte headers + no pixel payload — the
    * metadata pass never reads samples). Synthesis twin of [[bmpDims]].
    */
  def synthBmp(width: Int, height: Int): Array[Byte] = {
    val out = new Array[Byte](54)
    def w32(i: Int, v: Long): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte
      out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'; w32(2, 54L); w32(10, 54L)
    w32(14, 40L); w32(18, width.toLong); w32(22, height.toLong)
    out(26) = 1; out(28) = 24
    out
  }

  /** TIFF: a byte-order flag ("II" little / "MM" big), magic 42, an
    * IFD offset, then IFD entries of 12 bytes — width is tag 256,
    * height tag 257, each SHORT or LONG typed. The walk honors the
    * declared endianness; None for non-TIFF, truncation, or a missing
    * dimension tag.
    */
  def tiffDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b == null || b.length < 8) return None
    val little =
      if (b(0) == 'I' && b(1) == 'I') true
      else if (b(0) == 'M' && b(1) == 'M') false
      else return None
    def u16(i: Int): Int = if (little) le16(b, i) else be16(b, i)
    def u32(i: Int): Long = if (little) le32(b, i) else be32(b, i)
    if (u16(2) != 42) return None
    val ifd = u32(4).toInt
    if (ifd < 8 || ifd + 2 > b.length) return None
    val n = u16(ifd)
    if (ifd + 2 + 12 * n > b.length) return None
    var w = -1L
    var h = -1L
    var i = 0
    while (i < n) {
      val e = ifd + 2 + 12 * i
      val tag = u16(e)
      val tpe = u16(e + 2)
      // SHORT (3) payloads sit in the first two value bytes; LONG (4)
      // uses all four
      val value = if (tpe == 3) u16(e + 8).toLong else u32(e + 8)
      if (tag == 256) w = value
      if (tag == 257) h = value
      i += 1
    }
    if (w > 0 && h > 0) Some((w.toInt, h.toInt)) else None
  }

  /** Minimal single-IFD TIFF with width/height LONG entries, in either
    * byte order. Synthesis twin of [[tiffDims]].
    */
  def synthTiff(width: Int, height: Int,
      littleEndian: Boolean): Array[Byte] = {
    val out = new Array[Byte](8 + 2 + 12 * 2 + 4)
    def w16(i: Int, v: Int): Unit =
      if (littleEndian) {
        out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      } else {
        out(i) = ((v >> 8) & 0xff).toByte; out(i + 1) = (v & 0xff).toByte
      }
    def w32(i: Int, v: Long): Unit =
      if (littleEndian) {
        out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
        out(i + 2) = ((v >> 16) & 0xff).toByte
        out(i + 3) = ((v >> 24) & 0xff).toByte
      } else {
        out(i) = ((v >> 24) & 0xff).toByte
        out(i + 1) = ((v >> 16) & 0xff).toByte
        out(i + 2) = ((v >> 8) & 0xff).toByte
        out(i + 3) = (v & 0xff).toByte
      }
    val m = if (littleEndian) 'I' else 'M'
    out(0) = m.toByte; out(1) = m.toByte
    w16(2, 42); w32(4, 8L) // IFD directly after the header
    w16(8, 2) // two entries
    w16(10, 256); w16(12, 4); w32(14, 1L); w32(18, width.toLong)
    w16(22, 257); w16(24, 4); w32(26, 1L); w32(30, height.toLong)
    w32(34, 0L) // next-IFD terminator
    out
  }

  private def le24(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)

  /** WebP: RIFF-framed ("RIFF"[size]"WEBP" — the [[wavMeta]] chunk walk
    * with a different form type), dimensions in one of three chunk
    * variants, all located by the walk:
    *  - "VP8 " (lossy): a key frame's 3-byte frame tag (keyframe bit 0
    *    clear) then start code 9D 01 2A, then width/height as u16LE with
    *    the low 14 bits the dimension (upper 2 bits are scaling hints);
    *  - "VP8L" (lossless): signature byte 0x2F, then a 32-bit LE field
    *    packing width−1 in bits 0–13 and height−1 in bits 14–27;
    *  - "VP8X" (extended): 4 flag/reserved bytes, then canvas width−1
    *    and height−1 as u24LE.
    * None for non-WebP bytes, truncation mid-chunk, a malformed frame
    * tag/signature, or no dimension-bearing chunk.
    */
  def webpDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b == null || b.length < 12 ||
      b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P')
      return None
    var i = 12
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      val p = i + 8
      if (b(i) == 'V' && b(i + 1) == 'P' && b(i + 2) == '8' &&
        b(i + 3) == ' ') {
        // key frame: frame-tag bit 0 clear, start code 9D 01 2A
        return if (size >= 10 && p + 10 <= b.length &&
          (u8(b, p) & 1) == 0 && u8(b, p + 3) == 0x9d &&
          u8(b, p + 4) == 0x01 && u8(b, p + 5) == 0x2a)
          Some((le16(b, p + 6) & 0x3fff, le16(b, p + 8) & 0x3fff))
        else None
      } else if (b(i) == 'V' && b(i + 1) == 'P' && b(i + 2) == '8' &&
        b(i + 3) == 'L') {
        return if (size >= 5 && p + 5 <= b.length && u8(b, p) == 0x2f) {
          val bits = le32(b, p + 1)
          Some((1 + (bits & 0x3fff).toInt,
            1 + ((bits >> 14) & 0x3fff).toInt))
        } else None
      } else if (b(i) == 'V' && b(i + 1) == 'P' && b(i + 2) == '8' &&
        b(i + 3) == 'X') {
        return if (size >= 10 && p + 10 <= b.length)
          Some((1 + le24(b, p + 4), 1 + le24(b, p + 7)))
        else None
      }
      // chunks are word-aligned: odd sizes carry a pad byte. Long math
      // + bounds check, as in [[wavMeta]]'s walk: malformed sizes must
      // yield None, never a wrapped cursor.
      val next = i + 8L + size + (size % 2)
      if (next <= i || next > Int.MaxValue) return None
      i = next.toInt
    }
    None
  }

  /** Minimal WebP blob in any of the three dimension-bearing variants
    * ("vp8", "vp8l", "vp8x"). Synthesis twin of [[webpDims]]: real RIFF
    * framing and real chunk bitstream headers, no pixel payload (the
    * metadata pass never reads samples). Dimensions cap at the
    * bitstream's own limits (14-bit for vp8/vp8l, 24-bit canvas for
    * vp8x).
    */
  def synthWebp(width: Int, height: Int, variant: String): Array[Byte] = {
    require(width >= 1 && height >= 1, s"dims >= 1: $width x $height")
    def w32(out: Array[Byte], i: Int, v: Long): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte
      out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    val payload: Array[Byte] = variant match {
      case "vp8" =>
        require(width < (1 << 14) && height < (1 << 14),
          s"vp8 dims are 14-bit: $width x $height")
        val p = new Array[Byte](10)
        // 3-byte frame tag: keyframe (bit 0 clear), all else zero
        p(3) = 0x9d.toByte; p(4) = 0x01; p(5) = 0x2a
        p(6) = (width & 0xff).toByte; p(7) = ((width >> 8) & 0xff).toByte
        p(8) = (height & 0xff).toByte; p(9) = ((height >> 8) & 0xff).toByte
        p
      case "vp8l" =>
        require(width <= (1 << 14) && height <= (1 << 14),
          s"vp8l dims are 14-bit + 1: $width x $height")
        val p = new Array[Byte](5)
        p(0) = 0x2f
        w32(p, 1, ((width - 1).toLong & 0x3fff) |
          (((height - 1).toLong & 0x3fff) << 14))
        p
      case "vp8x" =>
        require(width <= (1 << 24) && height <= (1 << 24),
          s"vp8x canvas is 24-bit + 1: $width x $height")
        val p = new Array[Byte](10)
        val w = width - 1
        val h = height - 1
        p(4) = (w & 0xff).toByte; p(5) = ((w >> 8) & 0xff).toByte
        p(6) = ((w >> 16) & 0xff).toByte
        p(7) = (h & 0xff).toByte; p(8) = ((h >> 8) & 0xff).toByte
        p(9) = ((h >> 16) & 0xff).toByte
        p
      case other => throw new IllegalArgumentException(
        s"unknown WebP variant: $other (vp8 | vp8l | vp8x)")
    }
    val fourcc = variant match {
      case "vp8" => "VP8 "; case "vp8l" => "VP8L"; case _ => "VP8X"
    }
    val pad = payload.length % 2
    val out = new Array[Byte](12 + 8 + payload.length + pad)
    "RIFF".getBytes.copyToArray(out, 0)
    w32(out, 4, 4L + 8L + payload.length + pad)
    "WEBP".getBytes.copyToArray(out, 8)
    fourcc.getBytes.copyToArray(out, 12)
    w32(out, 16, payload.length.toLong)
    payload.copyToArray(out, 20)
    out
  }

  /** Parsed MP4/ISO-BMFF movie metadata. durationMs is exact integral
    * duration·1000 div timescale (the mvhd units contract).
    */
  final case class Mp4Meta(brand: String, timescale: Long, duration: Long,
      nTracks: Int, durationMs: Long)

  /** MP4 (ISO base media): a walk of length-prefixed boxes —
    * [size u32BE][type 4cc][payload], size 1 = 64-bit largesize
    * follows, size 0 = to end of file. ftyp carries the major brand;
    * moov is a container whose mvhd child holds timescale/duration
    * (version 0: u32 fields at +12/+16 past the box header; version 1:
    * u32 timescale at +20, u64 duration at +24) and whose trak children
    * are counted. Boxes are located by the walk, not fixed offsets
    * (real muxers emit free/udta/meta siblings in any order). Returns
    * None for non-BMFF bytes, truncation, a missing ftyp/moov/mvhd, or
    * a zero timescale (duration undefined).
    */
  def mp4Meta(b: Array[Byte]): Option[Mp4Meta] = {
    if (b == null || b.length < 16) return None
    if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'))
      return None
    var brand: Option[String] = None
    var timescale = -1L
    var duration = -1L
    var tracks = 0
    var sawMoov = false
    // returns the payload (start, end) of a box header at i, or None
    def boxAt(i: Int, limit: Int): Option[(String, Int, Int)] = {
      if (i + 8 > limit) return None
      val size32 = be32(b, i)
      val tpe = new String(b, i + 4, 4, "ISO-8859-1")
      val (pStart, boxEnd) =
        if (size32 == 1L) {
          if (i + 16 > limit) return None
          (i + 16, i + be64(b, i + 8))
        } else if (size32 == 0L) (i + 8, limit.toLong)
        else (i + 8, i + size32)
      if (boxEnd < pStart || boxEnd > limit) None
      else Some((tpe, pStart, boxEnd.toInt))
    }
    var i = 0
    while (i + 8 <= b.length) {
      boxAt(i, b.length) match {
        case None => return None // desynced / truncated walk
        case Some(("ftyp", p, e)) =>
          if (p + 4 > e) return None
          brand = Some(new String(b, p, 4, "ISO-8859-1"))
          i = e
        case Some(("moov", p, e)) =>
          sawMoov = true
          var j = p
          while (j + 8 <= e) {
            boxAt(j, e) match {
              case None => return None
              case Some(("mvhd", mp, me)) =>
                if (mp + 4 > me) return None
                val version = u8(b, mp)
                if (version == 1) {
                  if (mp + 32 > me) return None
                  timescale = be32(b, mp + 20)
                  duration = be64(b, mp + 24)
                } else {
                  if (mp + 20 > me) return None
                  timescale = be32(b, mp + 12)
                  duration = be32(b, mp + 16)
                }
                j = me
              case Some(("trak", _, te)) =>
                tracks += 1
                j = te
              case Some((_, _, oe)) => j = oe
            }
          }
          i = e
        case Some((_, _, e)) => i = e
      }
    }
    (brand, sawMoov) match {
      case (Some(br), true) if timescale > 0 && duration >= 0 =>
        Some(Mp4Meta(br, timescale, duration, tracks,
          duration * 1000L / timescale))
      case _ => None
    }
  }

  /** Parsed FLAC stream metadata. durationMs is exact integral
    * totalSamples·1000 div sampleRate (the WAV convention).
    */
  final case class FlacMeta(sampleRate: Int, channels: Int,
      bitsPerSample: Int, totalSamples: Long, durationMs: Long)

  /** FLAC: "fLaC" magic, then metadata blocks — [flags/type u8]
    * [length u24BE][payload]; STREAMINFO (type 0, length 34) is
    * REQUIRED first by spec, but the walk still locates it by type so
    * a permissive muxer ordering parses. Inside STREAMINFO the packed
    * bitfield at offset 10 carries sample rate (20 bits), channels−1
    * (3 bits), bits-per-sample−1 (5 bits), total samples (36 bits).
    * None for non-FLAC bytes, truncation, a missing STREAMINFO, or a
    * zero sample rate (duration undefined).
    */
  def flacMeta(b: Array[Byte]): Option[FlacMeta] = {
    if (b == null || b.length < 8 ||
      b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C')
      return None
    var i = 4
    var last = false
    while (!last && i + 4 <= b.length) {
      val flags = u8(b, i)
      last = (flags & 0x80) != 0
      val tpe = flags & 0x7f
      val len = (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
      val p = i + 4
      if (tpe == 0) {
        if (len < 34 || p + 34 > b.length) return None
        // bytes p+10..p+17: srate(20) | ch-1(3) | bps-1(5) | nsamples(36)
        val sr = (u8(b, p + 10) << 12) | (u8(b, p + 11) << 4) |
          (u8(b, p + 12) >> 4)
        val ch = ((u8(b, p + 12) >> 1) & 0x7) + 1
        val bps = (((u8(b, p + 12) & 0x1) << 4) |
          (u8(b, p + 13) >> 4)) + 1
        val ns = ((u8(b, p + 13) & 0xf).toLong << 32) |
          (u8(b, p + 14).toLong << 24) | (u8(b, p + 15).toLong << 16) |
          (u8(b, p + 16).toLong << 8) | u8(b, p + 17).toLong
        return if (sr > 0)
          Some(FlacMeta(sr, ch, bps, ns, ns * 1000L / sr))
        else None
      }
      i = p + len
    }
    None
  }

  /** Minimal FLAC blob: magic + a lone STREAMINFO block. Synthesis twin
    * of [[flacMeta]] (the synthWav convention) — real packed bitfields,
    * no frame payload.
    */
  def synthFlac(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long): Array[Byte] = {
    require(sampleRate >= 1 && sampleRate < (1 << 20), s"sr: $sampleRate")
    require(channels >= 1 && channels <= 8, s"channels: $channels")
    require(bitsPerSample >= 4 && bitsPerSample <= 32, s"bps: $bitsPerSample")
    require(totalSamples >= 0 && totalSamples < (1L << 36),
      s"totalSamples: $totalSamples")
    val out = new Array[Byte](4 + 4 + 34)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    out(4) = 0x80.toByte // last block, type 0 (STREAMINFO)
    out(5) = 0; out(6) = 0; out(7) = 34
    val p = 8
    out(p + 10) = ((sampleRate >> 12) & 0xff).toByte
    out(p + 11) = ((sampleRate >> 4) & 0xff).toByte
    out(p + 12) = (((sampleRate & 0xf) << 4) | (((channels - 1) & 0x7) << 1)
      | (((bitsPerSample - 1) >> 4) & 0x1)).toByte
    out(p + 13) = ((((bitsPerSample - 1) & 0xf) << 4)
      | ((totalSamples >> 32) & 0xf)).toInt.toByte
    out(p + 14) = ((totalSamples >> 24) & 0xff).toByte
    out(p + 15) = ((totalSamples >> 16) & 0xff).toByte
    out(p + 16) = ((totalSamples >> 8) & 0xff).toByte
    out(p + 17) = (totalSamples & 0xff).toByte
    out
  }

  /** MPEG-1 Layer III bitrate table (kbps, index 1..14) and sample
    * rates — the ubiquitous MP3 configuration; free-format (0) and bad
    * (15) indices are rejected.
    */
  private val Mp3Bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320)
  private val Mp3SampleRates = Array(44100, 48000, 32000)

  /** Parsed MP3 frame-header metadata (first frame). `xingFrames` /
    * `durationMs` come from a Xing/Info VBR tag when one sits in the
    * first frame (frame count × 1152 samples ÷ sample rate — the only
    * honest duration for a VBR crawl without a full frame census);
    * None/None when the tag is absent.
    */
  final case class Mp3Meta(bitrateKbps: Int, sampleRate: Int,
      channels: Int, xingFrames: Option[Long] = None,
      durationMs: Option[Long] = None)

  /** MP3 (MPEG-1 Layer III): skips an ID3v2 tag if present (the
    * real-crawl common case — "ID3"[ver 2][flags][syncsafe u28 size]),
    * then requires a valid frame sync (11 set bits) with MPEG-1 (bits
    * 19–20 = 3), Layer III (bits 17–18 = 1), a defined bitrate index,
    * and a defined sample-rate index. Channels from the mode field
    * (mono ⇒ 1, else 2). Duration: a CBR assumption is a lie on VBR
    * crawls, so it is reported ONLY when the first frame carries a
    * Xing/Info tag (at the fixed post-side-info offset — 32 bytes for
    * stereo modes, 17 for mono) whose frame-count flag is set:
    * duration_ms = frames · 1152 · 1000 / rate, exact integral. None
    * for non-MP3 bytes or truncation.
    */
  def mp3Meta(b: Array[Byte]): Option[Mp3Meta] = {
    if (b == null || b.length < 4) return None
    var i = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((u8(b, 6) & 0x7f) << 21) | ((u8(b, 7) & 0x7f) << 14) |
        ((u8(b, 8) & 0x7f) << 7) | (u8(b, 9) & 0x7f)
      i = 10 + size
    }
    if (i + 4 > b.length) return None
    val h0 = u8(b, i); val h1 = u8(b, i + 1)
    val h2 = u8(b, i + 2); val h3 = u8(b, i + 3)
    if (h0 != 0xff || (h1 & 0xe0) != 0xe0) return None
    if ((h1 & 0x18) != 0x18) return None // MPEG-1 only
    if ((h1 & 0x06) != 0x02) return None // Layer III only
    val brIdx = (h2 >> 4) & 0xf
    val srIdx = (h2 >> 2) & 0x3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val mode = (h3 >> 6) & 0x3
    val mono = mode == 3
    val rate = Mp3SampleRates(srIdx)
    // Xing ("Xing" = VBR, "Info" = the CBR twin LAME writes) after the
    // MPEG-1 side info: 32 bytes (stereo/joint/dual), 17 (mono)
    val tagAt = i + 4 + (if (mono) 17 else 32)
    val xing =
      if (tagAt + 8 <= b.length &&
        ((b(tagAt) == 'X' && b(tagAt + 1) == 'i' && b(tagAt + 2) == 'n' &&
          b(tagAt + 3) == 'g') ||
         (b(tagAt) == 'I' && b(tagAt + 1) == 'n' && b(tagAt + 2) == 'f' &&
          b(tagAt + 3) == 'o')) &&
        (be32(b, tagAt + 4) & 0x1L) != 0 && tagAt + 12 <= b.length)
        Some(be32(b, tagAt + 8))
      else None
    Some(Mp3Meta(Mp3Bitrates(brIdx), rate, if (mono) 1 else 2,
      xing, xing.map(f => f * 1152L * 1000L / rate)))
  }

  /** Minimal MP3 blob: optional empty ID3v2 tag + one frame header.
    * Synthesis twin of [[mp3Meta]].
    */
  def synthMp3(bitrateKbps: Int, sampleRate: Int, mono: Boolean,
      withId3: Boolean): Array[Byte] = {
    val brIdx = Mp3Bitrates.indexOf(bitrateKbps)
    val srIdx = Mp3SampleRates.indexOf(sampleRate)
    require(brIdx >= 1, s"not an MPEG-1 L3 bitrate: $bitrateKbps")
    require(srIdx >= 0, s"not an MPEG-1 sample rate: $sampleRate")
    val head = if (withId3) 10 else 0
    // 4 zero payload bytes after the header: a real frame always has
    // payload, and the sniffer's 6-byte floor must hold on the synth
    val out = new Array[Byte](head + 8)
    if (withId3) {
      out(0) = 'I'; out(1) = 'D'; out(2) = '3'; out(3) = 4
      // flags + syncsafe size all zero (empty tag)
    }
    out(head) = 0xff.toByte
    out(head + 1) = 0xfb.toByte // MPEG-1, Layer III, no CRC
    out(head + 2) = ((brIdx << 4) | (srIdx << 2)).toByte
    out(head + 3) = (if (mono) 0xc0 else 0x00).toByte
    out
  }

  /** [[synthMp3]] with a Xing/Info VBR tag in the first frame: header +
    * zeroed side info + tag + frames-flag + frame count. Synthesis twin
    * of the duration half of [[mp3Meta]].
    */
  def synthMp3Vbr(sampleRate: Int, mono: Boolean, frames: Long,
      cbrInfoTag: Boolean = false): Array[Byte] = {
    require(frames >= 0 && frames <= 0xffffffffL, s"frames: $frames")
    val head = synthMp3(128, sampleRate, mono, withId3 = false)
    val side = if (mono) 17 else 32
    val out = new Array[Byte](4 + side + 12)
    head.copyToArray(out, 0, 4)
    val tag = if (cbrInfoTag) "Info" else "Xing"
    tag.getBytes.copyToArray(out, 4 + side)
    out(4 + side + 7) = 0x01 // flags: frame count present
    out(4 + side + 8) = ((frames >> 24) & 0xff).toByte
    out(4 + side + 9) = ((frames >> 16) & 0xff).toByte
    out(4 + side + 10) = ((frames >> 8) & 0xff).toByte
    out(4 + side + 11) = (frames & 0xff).toByte
    out
  }

  /** Parsed Ogg stream metadata (first logical bitstream). For Opus,
    * `sampleRate` is OpusHead's informational input rate while duration
    * is computed at the codec-mandated 48 kHz granule clock minus
    * pre-skip; for Vorbis the granule clock IS the sample rate.
    */
  final case class OggMeta(codec: String, channels: Int, sampleRate: Int,
      lastGranule: Long, durationMs: Long)

  /** Ogg (Opus/Vorbis): page walk — each page is "OggS", version 0,
    * header-type flags, granule position s64LE, serial u32LE, sequence,
    * CRC (not verified — a metadata pass trusts framing, not payload
    * integrity), segment count, segment table, payload of Σ lacing
    * values. The FIRST (BOS) page's payload is the identification
    * header: "OpusHead" (channels u8 at 9, pre-skip u16LE at 10, input
    * rate u32LE at 12) or "\x01vorbis" (channels u8 at 11, rate u32LE
    * at 12). Duration comes from the LAST page of the same serial whose
    * granule is not -1 (no-packet-ends marker): Opus granules tick at
    * 48 kHz and include pre-skip (RFC 7845 §4/§4.2); Vorbis granules
    * are PCM samples at the stream rate. Pages of other serials
    * (multiplexed streams) are skipped. None for non-Ogg bytes,
    * truncation mid-walk, a malformed id header, or a zero rate.
    */
  def oggMeta(b: Array[Byte]): Option[OggMeta] = {
    if (b == null || b.length < 28 ||
      b(0) != 'O' || b(1) != 'g' || b(2) != 'g' || b(3) != 'S')
      return None
    var i = 0
    var serial = -1L
    var codec: String = null
    var channels = 0
    var rate = 0
    var preSkip = 0
    var lastGranule = -1L
    while (i + 27 <= b.length) {
      if (b(i) != 'O' || b(i + 1) != 'g' || b(i + 2) != 'g' ||
        b(i + 3) != 'S' || u8(b, i + 4) != 0) return None
      val granule = le32(b, i + 6) | (le32(b, i + 10) << 32)
      val pageSerial = le32(b, i + 14)
      val nsegs = u8(b, i + 26)
      if (i + 27 + nsegs > b.length) return None
      var payloadLen = 0
      var s = 0
      while (s < nsegs) { payloadLen += u8(b, i + 27 + s); s += 1 }
      val p = i + 27 + nsegs
      if (p + payloadLen > b.length) return None
      if (codec == null) {
        // first page must identify the stream
        if ((u8(b, i + 5) & 0x02) == 0) return None // not BOS
        serial = pageSerial
        if (payloadLen >= 19 && b(p) == 'O' && b(p + 1) == 'p' &&
          b(p + 2) == 'u' && b(p + 3) == 's' && b(p + 4) == 'H' &&
          b(p + 5) == 'e' && b(p + 6) == 'a' && b(p + 7) == 'd') {
          codec = "opus"
          channels = u8(b, p + 9)
          preSkip = le16(b, p + 10)
          rate = le32(b, p + 12).toInt
        } else if (payloadLen >= 16 && u8(b, p) == 0x01 &&
          b(p + 1) == 'v' && b(p + 2) == 'o' && b(p + 3) == 'r' &&
          b(p + 4) == 'b' && b(p + 5) == 'i' && b(p + 6) == 's') {
          codec = "vorbis"
          channels = u8(b, p + 11)
          rate = le32(b, p + 12).toInt
        } else return None
      } else if (pageSerial == serial && granule != -1L) {
        lastGranule = granule
      }
      i = p + payloadLen
    }
    if (codec == null || rate <= 0) return None
    // granule clock: Opus is fixed 48 kHz and granules include pre-skip
    val clock = if (codec == "opus") 48000 else rate
    val samples = math.max(0L,
      if (codec == "opus") lastGranule - preSkip
      else math.max(0L, lastGranule))
    Some(OggMeta(codec, channels, rate, lastGranule,
      samples * 1000L / clock))
  }

  /** Minimal Ogg blob: a BOS identification page + one EOS data page
    * carrying the final granule (CRCs zeroed — [[oggMeta]] documents
    * that framing, not payload integrity, is what a metadata pass
    * checks). Synthesis twin of [[oggMeta]]: real page framing, real
    * OpusHead/Vorbis id headers. Opus granules include the canonical
    * 312-sample pre-skip.
    */
  def synthOgg(codec: String, channels: Int, sampleRate: Int,
      nSamples: Long): Array[Byte] = {
    require(codec == "opus" || codec == "vorbis", s"codec: $codec")
    require(channels >= 1 && channels <= 255, s"channels: $channels")
    require(sampleRate >= 1, s"rate: $sampleRate")
    require(nSamples >= 0, s"nSamples: $nSamples")
    val preSkip = 312
    def page(headerType: Int, granule: Long, seq: Int,
        payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](27 + 1 + payload.length)
      "OggS".getBytes.copyToArray(out, 0)
      out(5) = headerType.toByte
      var g = granule
      for (j <- 0 until 8) { out(6 + j) = (g & 0xff).toByte; g >>= 8 }
      out(14) = 0x42; out(15) = 0x17 // serial, arbitrary fixed
      out(18) = seq.toByte
      out(26) = 1 // one segment
      out(27) = payload.length.toByte
      payload.copyToArray(out, 28)
      out
    }
    val id: Array[Byte] =
      if (codec == "opus") {
        val p = new Array[Byte](19)
        "OpusHead".getBytes.copyToArray(p, 0)
        p(8) = 1 // version
        p(9) = channels.toByte
        p(10) = (preSkip & 0xff).toByte; p(11) = (preSkip >> 8).toByte
        var r = sampleRate.toLong
        for (j <- 0 until 4) { p(12 + j) = (r & 0xff).toByte; r >>= 8 }
        p
      } else {
        val p = new Array[Byte](30)
        p(0) = 0x01
        "vorbis".getBytes.copyToArray(p, 1)
        p(11) = channels.toByte
        var r = sampleRate.toLong
        for (j <- 0 until 4) { p(12 + j) = (r & 0xff).toByte; r >>= 8 }
        p(29) = 0x01 // framing bit
        p
      }
    val finalGranule =
      if (codec == "opus") preSkip + nSamples else nSamples
    page(0x02, 0L, 0, id) ++
      page(0x04, finalGranule, 1, Array[Byte](0x00, 0x00, 0x00, 0x00))
  }

  /** Parsed Matroska/WebM metadata. `durationMs` is −1 when the Info
    * element carries no Duration (a live/streamed capture); width and
    * height come from the first video track's PixelWidth/PixelHeight.
    */
  final case class MkvMeta(docType: String, timescaleNs: Long,
      durationMs: Long, width: Int, height: Int)

  /** EBML varint at `i`: the leading byte's first set bit gives the
    * length (1–8 bytes); IDs keep the marker bit (the canonical
    * notation), sizes strip it. Returns (value, byteLength), or None
    * for truncation or a zero lead byte (reserved/invalid).
    */
  private def ebmlVint(b: Array[Byte], i: Int,
      keepMarker: Boolean): Option[(Long, Int)] = {
    if (i >= b.length) return None
    val first = u8(b, i)
    if (first == 0) return None
    val len = java.lang.Integer.numberOfLeadingZeros(first) - 23
    if (i + len > b.length) return None
    var v = (if (keepMarker) first else first & (0xff >>> len)).toLong
    var j = 1
    while (j < len) { v = (v << 8) | u8(b, i + j); j += 1 }
    Some((v, len))
  }

  /** Find the first child element with EBML id `id` inside
    * [from, to): returns (payloadStart, payloadEnd). Unknown-size
    * elements (all-ones size — unmuxed live Segments) extend to the
    * parent's end, per the EBML spec's unknown-data-size rule.
    */
  private def ebmlFind(b: Array[Byte], from: Int, to: Int,
      id: Long): Option[(Int, Int)] = {
    var i = from
    while (i < to) {
      val (eid, idLen) = ebmlVint(b, i, keepMarker = true)
        .getOrElse(return None)
      val (sz, szLen) = ebmlVint(b, i + idLen, keepMarker = false)
        .getOrElse(return None)
      val p = i + idLen + szLen
      // all-ones size = unknown: element runs to the parent's end
      val unknown = sz == (1L << (7 * szLen)) - 1
      val end = if (unknown) to else p + sz
      if (end < p || end > to) return None
      if (eid == id) return Some((p, end.toInt))
      i = end.toInt
    }
    None
  }

  private def ebmlUint(b: Array[Byte], span: (Int, Int)): Long = {
    var v = 0L
    var i = span._1
    while (i < span._2) { v = (v << 8) | u8(b, i); i += 1 }
    v
  }

  /** WebM/MKV (EBML): the last ubiquitous crawl video container after
    * ISO-BMFF (m03). Walk: EBML header (0x1A45DFA3) → DocType (0x4282,
    * "webm" or "matroska"; absent defaults to "matroska" per spec),
    * then Segment (0x18538067) → Info (0x1549A966) for TimestampScale
    * (0x2AD7B1, default 1,000,000 ns) and Duration (0x4489, float32 or
    * float64 in timescale units), and Segment → Tracks (0x1654AE6B) →
    * TrackEntry (0xAE) → Video (0xE0) for PixelWidth/PixelHeight
    * (0xB0/0xBA). duration_ms = round(duration · timescale / 10⁶).
    * Scope limits (documented, not hidden): the FIRST video track's
    * dims are reported (multi-track pick-by-flag is a demuxer concern)
    * and a Duration-less live capture reports −1. None for non-EBML
    * bytes, truncation mid-walk, or a missing Segment/Tracks video
    * entry.
    */
  def mkvMeta(b: Array[Byte]): Option[MkvMeta] = {
    if (b == null || b.length < 8) return None
    val (hdr, hdrEnd) = ebmlFind(b, 0, b.length, 0x1A45DFA3L)
      .getOrElse(return None)
    val docType = ebmlFind(b, hdr, hdrEnd, 0x4282L)
      .map(s => new String(b, s._1, s._2 - s._1, "ISO-8859-1"))
      .getOrElse("matroska")
    val (seg, segEnd) = ebmlFind(b, hdrEnd, b.length, 0x18538067L)
      .getOrElse(return None)
    val info = ebmlFind(b, seg, segEnd, 0x1549A966L)
    val timescale = info.flatMap { case (s, e) =>
      ebmlFind(b, s, e, 0x2AD7B1L).map(ebmlUint(b, _))
    }.getOrElse(1000000L)
    val duration = info.flatMap { case (s, e) =>
      ebmlFind(b, s, e, 0x4489L).map { span =>
        val len = span._2 - span._1
        if (len == 8) java.lang.Double.longBitsToDouble(
          ebmlUint(b, span))
        else java.lang.Float.intBitsToFloat(
          ebmlUint(b, span).toInt).toDouble
      }
    }
    val video = for {
      tracks <- ebmlFind(b, seg, segEnd, 0x1654AE6BL)
      entry <- ebmlFind(b, tracks._1, tracks._2, 0xAEL)
      video <- ebmlFind(b, entry._1, entry._2, 0xE0L)
    } yield video
    video match {
      case Some((vs, ve)) =>
        val w = ebmlFind(b, vs, ve, 0xB0L).map(ebmlUint(b, _))
          .getOrElse(return None)
        val h = ebmlFind(b, vs, ve, 0xBAL).map(ebmlUint(b, _))
          .getOrElse(return None)
        if (w <= 0 || h <= 0) return None
        val durMs = duration
          .map(d => math.round(d * timescale / 1000000.0))
          .getOrElse(-1L)
        Some(MkvMeta(docType, timescale, durMs, w.toInt, h.toInt))
      case None => None
    }
  }

  /** Minimal WebM/MKV blob: EBML header with DocType, Segment holding
    * Info (TimestampScale 10⁶ ns ⇒ Duration units ARE milliseconds,
    * stored as float64 — exact for any integral ms < 2⁵³) and one
    * video TrackEntry with PixelWidth/PixelHeight. Synthesis twin of
    * [[mkvMeta]]: real nested EBML varint framing, no cluster payload.
    */
  def synthMkv(docType: String, width: Int, height: Int,
      durationMs: Long): Array[Byte] = {
    require(width >= 1 && width <= 0xffff, s"width: $width")
    require(height >= 1 && height <= 0xffff, s"height: $height")
    require(durationMs >= 0, s"durationMs: $durationMs")
    def id(v: Long): Array[Byte] = { // EBML ids are written verbatim
      val n = (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8
      Array.tabulate(n)(j => ((v >> (8 * (n - 1 - j))) & 0xff).toByte)
    }
    def sz(n: Int): Array[Byte] = { // 1-byte form, payloads < 127 here
      require(n < 127, s"payload too big for 1-byte size: $n")
      Array((0x80 | n).toByte)
    }
    def el(eid: Long, payload: Array[Byte]): Array[Byte] =
      id(eid) ++ sz(payload.length) ++ payload
    def uintBytes(v: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(j => ((v >> (8 * (n - 1 - j))) & 0xff).toByte)
    val header = el(0x1A45DFA3L, el(0x4282L, docType.getBytes("ISO-8859-1")))
    val infoEl = el(0x1549A966L,
      el(0x2AD7B1L, uintBytes(1000000L, 4)) ++
        el(0x4489L, uintBytes(java.lang.Double.doubleToLongBits(
          durationMs.toDouble), 8)))
    val videoEl = el(0xE0L,
      el(0xB0L, uintBytes(width.toLong, 2)) ++
        el(0xBAL, uintBytes(height.toLong, 2)))
    val tracksEl = el(0x1654AE6BL, el(0xAEL, videoEl))
    header ++ el(0x18538067L, infoEl ++ tracksEl)
  }

  /** ftyp major brands that mark a HEIF-family still image rather than
    * a movie: AV1-coded (avif/avis) and HEVC-coded (heic/heif) plus the
    * codec-agnostic mif1 structural brand. Dimensions for ALL of them
    * live in the same `ispe` item property — one parser covers the two
    * image formats displacing JPEG in modern crawls.
    */
  private val heifBrands = Set("avif", "avis", "heic", "heif", "mif1")

  /** AVIF/HEIC (HEIF family, ISO-BMFF): dimensions live in the `ispe`
    * (image spatial extents) item property — a fullbox of width/height
    * u32BE — nested meta(fullbox) → iprp → ipco → ispe. The walk is
    * [[mp4Meta]]'s box discipline (length-prefixed, located by walking,
    * 64-bit largesize honored); the ftyp major brand must be one of
    * [[heifBrands]]. Multiple ispe properties (thumbnails, alpha
    * auxiliaries) are resolved by taking the LARGEST area — the primary
    * image is the full-resolution one, and the primary-item indirection
    * (pitm → ipma association) is deliberately out of scope for a
    * metadata pass. None for non-BMFF bytes, a non-HEIF brand,
    * truncation mid-walk, or a missing ispe.
    */
  def avifDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b == null || b.length < 16) return None
    if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'))
      return None
    def boxAt(i: Int, limit: Int): Option[(String, Int, Int)] = {
      if (i + 8 > limit) return None
      val size32 = be32(b, i)
      val tpe = new String(b, i + 4, 4, "ISO-8859-1")
      val (pStart, boxEnd) =
        if (size32 == 1L) {
          if (i + 16 > limit) return None
          (i + 16, i + be64(b, i + 8))
        } else if (size32 == 0L) (i + 8, limit.toLong)
        else (i + 8, i + size32)
      if (boxEnd < pStart || boxEnd > limit) None
      else Some((tpe, pStart, boxEnd.toInt))
    }
    var best: Option[(Int, Int)] = None
    def takeIspe(p: Int, e: Int): Unit =
      if (p + 12 <= e) {
        val w = be32(b, p + 4).toInt
        val h = be32(b, p + 8).toInt
        if (w > 0 && h > 0 && best.forall { case (bw, bh) =>
          w.toLong * h > bw.toLong * bh }) best = Some((w, h))
      }
    // walk children of [from, to) looking for the chain tail; `skip`
    // counts fullbox version/flags bytes before the children start
    def walk(from: Int, to: Int, chain: List[String]): Boolean = {
      var j = from
      while (j + 8 <= to) {
        boxAt(j, to) match {
          case None => return false // desynced / truncated
          case Some((tpe, p, e)) =>
            chain match {
              case head :: rest if tpe == head =>
                if (rest.isEmpty) takeIspe(p, e)
                else {
                  val skip = if (head == "meta") 4 else 0
                  if (!walk(p + skip, e, rest)) return false
                }
              case _ =>
            }
            j = e
        }
      }
      true
    }
    boxAt(0, b.length) match {
      case Some(("ftyp", p, e)) if p + 4 <= e &&
        heifBrands.contains(new String(b, p, 4, "ISO-8859-1")) =>
        if (!walk(e, b.length, List("meta", "iprp", "ipco", "ispe")))
          return None
        best
      case _ => None
    }
  }

  /** Minimal HEIF-family blob: ftyp(brand) + meta(iprp(ipco(ispe))).
    * Synthesis twin of [[avifDims]] (the synthMp4 convention) — real
    * nested ISO-BMFF boxes, no coded payload.
    */
  def synthAvif(width: Int, height: Int,
      brand: String = "avif"): Array[Byte] = {
    require(heifBrands.contains(brand), s"not a HEIF brand: $brand")
    require(width >= 1 && height >= 1, s"dims >= 1: $width x $height")
    // sizes inside out: ispe 20, ipco 8+20, iprp 8+28, meta 12+36
    val out = new Array[Byte](16 + 48)
    def w32(i: Int, v: Long): Unit = {
      out(i) = ((v >> 24) & 0xff).toByte
      out(i + 1) = ((v >> 16) & 0xff).toByte
      out(i + 2) = ((v >> 8) & 0xff).toByte
      out(i + 3) = (v & 0xff).toByte
    }
    def wType(i: Int, t: String): Unit =
      t.getBytes("ISO-8859-1").copyToArray(out, i)
    w32(0, 16L); wType(4, "ftyp"); wType(8, brand); w32(12, 0L)
    w32(16, 48L); wType(20, "meta") // fullbox: version/flags at 24
    w32(28, 36L); wType(32, "iprp")
    w32(36, 28L); wType(40, "ipco")
    w32(44, 20L); wType(48, "ispe") // fullbox: version/flags at 52
    w32(56, width.toLong); w32(60, height.toLong)
    out
  }

  /** Build a minimal valid ISO-BMFF blob — ftyp(brand) +
    * moov(mvhd v0 + nTracks empty trak boxes). The synthesis twin of
    * [[mp4Meta]] (the synthWav convention): gates and specs round-trip
    * parameters through REAL container bytes.
    */
  def synthMp4(brand: String, timescale: Long, duration: Long,
      nTracks: Int): Array[Byte] = {
    require(brand.length == 4, s"brand must be 4 chars: $brand")
    val mvhdSize = 108 // canonical v0 mvhd
    val moovSize = 8 + mvhdSize + 8 * nTracks
    val out = new Array[Byte](16 + moovSize)
    def w32(i: Int, v: Long): Unit = {
      out(i) = ((v >> 24) & 0xff).toByte
      out(i + 1) = ((v >> 16) & 0xff).toByte
      out(i + 2) = ((v >> 8) & 0xff).toByte
      out(i + 3) = (v & 0xff).toByte
    }
    def wType(i: Int, t: String): Unit =
      t.getBytes("ISO-8859-1").copyToArray(out, i)
    w32(0, 16L); wType(4, "ftyp"); wType(8, brand); w32(12, 0L)
    w32(16, moovSize.toLong); wType(20, "moov")
    w32(24, mvhdSize.toLong); wType(28, "mvhd")
    // version 0 + flags already zero; creation/modification zero
    w32(32 + 12, timescale); w32(32 + 16, duration)
    var t = 16 + 8 + mvhdSize
    (0 until nTracks).foreach { _ =>
      w32(t, 8L); wType(t + 4, "trak"); t += 8
    }
    out
  }

  /** Video decode pass: fills (brand, timescale, duration, n_tracks,
    * duration_ms) from REAL ISO-BMFF bytes via [[mp4Meta]]; unparseable
    * bytes get deterministic byte-hash synthetic meta (the
    * [[decodeDims]] convention). Batched mapPartitions, schema in/out.
    */
  def decodeVideoMeta(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media_type", StringType),
      StructField("brand", StringType),
      StructField("timescale", LongType),
      StructField("duration", LongType),
      StructField("n_tracks", IntegerType),
      StructField("duration_ms", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select("asset_id", "media_type", "media")
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { r =>
            val bytes = r.getAs[Array[Byte]]("media")
            val m = mp4Meta(bytes).getOrElse {
              var h = 0L
              var i = 0
              val n = if (bytes == null) 0 else bytes.length
              while (i < math.min(n, 256)) {
                h = (h * 31 + (bytes(i) & 0xff)) & 0x7fffffffL
                i += 1
              }
              Mp4Meta("none", 1000L, n.toLong, 1 + (h % 3).toInt,
                n.toLong)
            }
            Row(r.getLong(0), r.getString(1), m.brand, m.timescale,
              m.duration, m.nTracks, m.durationMs)
          }
        }
      }(enc)
  }

  /** Count the image frames of a GIF by walking its block structure — no
    * LZW decode needed: each 0x2C image descriptor is one frame;
    * extensions (0x21) and pixel data are skipped via their length-
    * prefixed sub-block chains. Returns None for non-GIF, truncated, or
    * desynced bytes.
    */
  def gifFrameCount(b: Array[Byte]): Option[Int] = {
    if (b == null || b.length < 14 || gifDims(b).isEmpty) return None
    var i = 6 + 7 // header + logical screen descriptor
    val packed = u8(b, 10)
    if ((packed & 0x80) != 0) i += 3 * (1 << ((packed & 7) + 1)) // global CT
    var frames = 0
    def skipSubBlocks(): Boolean = { // false on truncation
      while (i < b.length && u8(b, i) != 0) i += 1 + u8(b, i)
      if (i >= b.length) false
      else { i += 1; true } // block terminator
    }
    while (i < b.length) {
      u8(b, i) match {
        case 0x3b => return Some(frames) // trailer
        case 0x21 => // extension: introducer + label, then sub-blocks
          i += 2
          if (!skipSubBlocks()) return None
        case 0x2c => // image descriptor: 10 bytes incl. introducer
          frames += 1
          if (i + 10 > b.length) return None
          val lp = u8(b, i + 9)
          i += 10
          if ((lp & 0x80) != 0) i += 3 * (1 << ((lp & 7) + 1)) // local CT
          i += 1 // LZW minimum code size
          if (!skipSubBlocks()) return None
        case _ => return None // desynced
      }
    }
    None // ran out of bytes before the trailer
  }

  /** Container sniff from magic bytes — checks the FULL signatures the
    * dimension parsers check (8-byte PNG, FFD8FF JPEG, GIF8xa), so a
    * sniffed type never disagrees with the decoder about being an image.
    */
  def sniffFormat(b: Array[Byte]): String =
    if (b == null || b.length < 6) "unknown"
    else if (b.length >= 8 &&
      u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a &&
      u8(b, 7) == 0x0a) "png"
    else if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8 && u8(b, 2) == 0xff) "jpeg"
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a') "gif"
    else if (b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else if (b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') "webp"
    else if (b.length >= 12 &&
      b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p' &&
      heifBrands.contains(new String(b, 8, 4, "ISO-8859-1")))
      (if (b(8) == 'a') "avif" else "heic")
    else if (b.length >= 8 &&
      b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') "mp4"
    else if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')
      "flac"
    else if (b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S')
      "ogg"
    else if (b.length >= 4 && u8(b, 0) == 0x1a && u8(b, 1) == 0x45 &&
      u8(b, 2) == 0xdf && u8(b, 3) == 0xa3)
      // EBML: WebM vs Matroska by DocType (absent defaults to matroska)
      (if (mkvMeta(b).exists(_.docType == "webm")) "webm" else "mkv")
    else if (mp3Meta(b).isDefined) "mp3"
    else if (b(0) == 'B' && b(1) == 'M') "bmp"
    else if ((b(0) == 'I' && b(1) == 'I') || (b(0) == 'M' && b(1) == 'M'))
      (if (tiffDims(b).isDefined || (b.length >= 4 &&
        ((b(0) == 'I' && u8(b, 2) == 42 && u8(b, 3) == 0) ||
         (b(0) == 'M' && u8(b, 2) == 0 && u8(b, 3) == 42)))) "tiff"
       else "unknown")
    else "unknown"

  /** Decode (width, height) from real container headers; bytes that are
    * not a recognized image container fall back to a deterministic
    * byte-hash fake so non-image media (audio/video) still flows through
    * the same plumbing with stable synthetic dims.
    */
  def decodeDims(bytes: Array[Byte]): (Int, Int) = {
    if (bytes == null || bytes.isEmpty) return (0, 0)
    pngDims(bytes).orElse(jpegDims(bytes)).orElse(gifDims(bytes))
      .orElse(bmpDims(bytes)).orElse(tiffDims(bytes))
      .orElse(webpDims(bytes)).orElse(avifDims(bytes)).getOrElse {
      var h = 0L
      var i = 0
      while (i < math.min(bytes.length, 256)) {
        h = (h * 31 + (bytes(i) & 0xff)) & 0x7fffffffL
        i += 1
      }
      (16 + (h % 624).toInt, 16 + ((h / 624) % 464).toInt)
    }
  }

  /** Ingest a directory of raw media files into the canonical asset frame
    * via Spark's `binaryFile` source — the missing first mile of the
    * multimodal pipeline (everything downstream operates on DataFrames).
    * asset_id is the polyHash of the file path (stable across re-runs and
    * executors), media_type comes from magic-byte sniffing (truthful even
    * when extensions lie), meta starts null for `decodeMeta` to fill.
    * binaryFile reads are distributed and support `pathGlobFilter` +
    * partition-parallel listing, so the pattern scales to a media lake.
    */
  def readMediaDir(spark: org.apache.spark.sql.SparkSession, path: String,
      glob: String = "*"): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema)
    spark.read.format("binaryFile").option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), col("content"))
      .mapPartitions { it =>
        it.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          Row(graft.functions.expressions.PolyHash.hash(
              org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))),
            bytes, mimeOf(bytes), null)
        }
      }(enc)
  }

  /** Sniffed container → MIME type (opaque payloads stay octet-stream). */
  private def mimeOf(b: Array[Byte]): String = sniffFormat(b) match {
    case "png"  => "image/png"
    case "jpeg" => "image/jpeg"
    case "gif"  => "image/gif"
    case "wav"  => "audio/wav"
    case "mp4"  => "video/mp4"
    case "bmp"  => "image/bmp"
    case "tiff" => "image/tiff"
    case "webp" => "image/webp"
    case "avif" => "image/avif"
    case "heic" => "image/heic"
    case "flac" => "audio/flac"
    case "mp3"  => "audio/mpeg"
    case "ogg"  => "audio/ogg"
    case "webm" => "video/webm"
    case "mkv"  => "video/x-matroska"
    case _      => "application/octet-stream"
  }

  /** Audio decode pass: fills (channels, sample_rate, bits_per_sample,
    * duration_ms) from REAL container bytes — WAV via [[wavMeta]], FLAC
    * via [[flacMeta]], MP3 via [[mp3Meta]] (duration only when a
    * Xing/Info tag carries it, −1 otherwise — never a CBR guess), Ogg
    * Opus/Vorbis via [[oggMeta]]. Lossy codecs have no PCM sample
    * width, so bits_per_sample reports 0 for mp3/ogg. Bytes that parse
    * as none of the four get deterministic byte-hash synthetic audio
    * meta (the [[decodeDims]] convention) so opaque formats flow
    * through the same plumbing. Batched mapPartitions, schema in/out.
    */
  def decodeAudioMeta(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media_type", StringType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("bits_per_sample", IntegerType),
      StructField("duration_ms", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select("asset_id", "media_type", "media")
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { r =>
            val bytes = r.getAs[Array[Byte]]("media")
            val m = wavMeta(bytes)
              .map(w => (w.channels, w.sampleRate, w.bitsPerSample,
                w.durationMs))
              .orElse(flacMeta(bytes).map(f =>
                (f.channels, f.sampleRate, f.bitsPerSample, f.durationMs)))
              .orElse(oggMeta(bytes).map(o =>
                (o.channels, o.sampleRate, 0, o.durationMs)))
              .orElse(mp3Meta(bytes).map(p =>
                (p.channels, p.sampleRate, 0,
                  p.durationMs.getOrElse(-1L))))
              .getOrElse {
                var h = 0L
                var i = 0
                val n = if (bytes == null) 0 else bytes.length
                while (i < math.min(n, 256)) {
                  h = (h * 31 + (bytes(i) & 0xff)) & 0x7fffffffL
                  i += 1
                }
                (1 + (h % 2).toInt, 8000 + ((h / 2) % 5).toInt * 4000,
                  8 + 8 * ((h / 10) % 3).toInt, n.toLong / 16)
              }
            Row(r.getLong(0), r.getString(1), m._1, m._2, m._3, m._4)
          }
        }
      }(enc)
  }

  /** Decode pass: fills meta.width/height (+ frame count) from the media
    * bytes. Batched mapPartitions; schema (asset_id, media_type, width,
    * height, n_bytes, n_frames). n_frames is REAL for GIFs (block walk);
    * other containers fall back to a deterministic size-derived count
    * (single-frame stills would be 1 in a full deployment; the synthetic
    * value keeps the multi-frame plumbing exercised for opaque video).
    */
  def decodeMeta(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media_type", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_bytes", LongType),
      StructField("n_frames", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select("asset_id", "media_type", "media")
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { r =>
            val bytes = r.getAs[Array[Byte]]("media")
            val (w, h) = decodeDims(bytes)
            val nBytes = if (bytes == null) 0L else bytes.length.toLong
            val nFrames = gifFrameCount(bytes)
              .getOrElse((nBytes / 1024 + 1).toInt)
            Row(r.getLong(0), r.getString(1), w, h, nBytes, nFrames)
          }
        }
      }(enc)
  }

  /** Feature-extract pass: a deterministic 16-bin byte histogram as the
    * "embedding" (stands in for a vision encoder; batch shape is what
    * matters). Output: (asset_id, features array<float>).
    */
  def extractFeatures(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select("asset_id", "media")
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { r =>
            val bytes = r.getAs[Array[Byte]]("media")
            val hist = new Array[Float](16)
            if (bytes != null && bytes.nonEmpty) {
              bytes.foreach(b => hist((b & 0xff) / 16) += 1f)
              val n = bytes.length.toFloat
              var i = 0
              while (i < 16) { hist(i) /= n; i += 1 }
            }
            Row(r.getLong(0), hist.toSeq)
          }
        }
      }(enc)
  }

  /** Resize pass: computes the bounded target box from the REAL decoded
    * dims (aspect-preserving scale ≤ 1). Pixel resampling itself is
    * deployment-time work that plugs into the same batched shape.
    */
  def resize(df: DataFrame, maxW: Int, maxH: Int): DataFrame =
    decodeMeta(df)
      // null/empty media decodes to (0, 0) and a crafted header can carry a
      // zero dim; under Spark 4's default ANSI mode an unguarded division
      // would throw DIVIDE_BY_ZERO for the whole task — zero-dim assets
      // keep scale 1 and a (0, 0) output box instead
      .withColumn("scale",
        when(col("width") > 0 && col("height") > 0,
          least(lit(1.0), lit(maxW) / col("width"), lit(maxH) / col("height")))
          .otherwise(lit(1.0)))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))

  /** Frame-sample pass: every nth frame index up to decodeMeta's frame
    * count (real for GIFs, size-derived for opaque video). Extracting the
    * sampled frames' PIXELS is deployment-time codec work; the
    * one-to-many explode shape and index arithmetic are the engine's part.
    */
  def sampleFrames(df: DataFrame, everyN: Int): DataFrame =
    decodeMeta(df)
      // a structurally valid frameless GIF has n_frames = 0: emit no rows
      // (explode of a null sequence), not a sequence(0, -1) runtime error
      .withColumn("frame_idx",
        explode(when(col("n_frames") > 0,
          sequence(lit(0), col("n_frames") - 1, lit(everyN)))))
      .select("asset_id", "frame_idx", "n_frames")
}
