package graft.tools

import java.io.ByteArrayOutputStream

/** JDK-only media codecs for the multimodal tier: real parsers for WAV
  * (RIFF/PCM16) and BMP (BITMAPINFOHEADER, uncompressed 24-bit) written
  * by hand, plus REAL compressed-image decode (PNG/JPEG/GIF/TIFF)
  * through javax.imageio — the JDK's java.desktop module bundles those
  * codecs, so no external library is needed and the path runs headless.
  * Deterministic builders double as fixture generators, exactly the
  * Pdf.build/extract pattern. Only video/audio compressed codecs
  * (H.264/MP3) remain deployment-provided behind the decoder trait.
  */
object Media {

  // ------------------------------------------------------------------ WAV

  final case class WavAudio(sampleRate: Int, channels: Int,
      samples: Array[Short]) {
    def durationMs: Long =
      samples.length.toLong * 1000 / (sampleRate.toLong * channels)
    def rms: Double =
      if (samples.isEmpty) 0.0
      else math.sqrt(samples.map(s => s.toDouble * s).sum / samples.length) / 32768.0
    def peak: Double =
      if (samples.isEmpty) 0.0 else samples.map(s => math.abs(s.toInt)).max / 32768.0
    /** Sign changes per sample — the cheap spectral proxy. */
    def zeroCrossingRate: Double =
      if (samples.length < 2) 0.0
      else samples.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)).toDouble /
        (samples.length - 1)
  }

  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def le32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
  private def rdLe16(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)
  private def rdLe32(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) |
      ((b(at + 2) & 0xff) << 16) | ((b(at + 3) & 0xff) << 24)

  def isWav(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE"

  /** PCM16 mono/stereo WAV writer (RIFF + fmt + data chunks). */
  def buildWav(samples: Array[Short], sampleRate: Int = 16000,
      channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new ByteArrayOutputStream(44 + dataLen)
    out.write("RIFF".getBytes("US-ASCII")); le32(out, 36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(out, 16)
    le16(out, 1)                       // PCM
    le16(out, channels)
    le32(out, sampleRate)
    le32(out, sampleRate * channels * 2) // byte rate
    le16(out, channels * 2)            // block align
    le16(out, 16)                      // bits per sample
    out.write("data".getBytes("US-ASCII")); le32(out, dataLen)
    samples.foreach(s => le16(out, s & 0xffff))
    out.toByteArray
  }

  /** RIFF chunk walk: locate fmt + data, reject non-PCM16. */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    require(isWav(bytes), "not a RIFF/WAVE stream")
    var at = 12
    var rate = 0; var channels = 0; var bits = 0
    var data: Array[Byte] = null
    while (at + 8 <= bytes.length) {
      val id = new String(bytes, at, 4, "US-ASCII")
      val len = rdLe32(bytes, at + 4)
      // a negative length (malformed/truncated chunk) would walk the
      // cursor backwards — an infinite loop, not just a bad parse
      require(len >= 0, s"malformed chunk length $len in '$id'")
      id match {
        case "fmt " =>
          require(rdLe16(bytes, at + 8) == 1, "only PCM wav supported")
          channels = rdLe16(bytes, at + 10)
          rate = rdLe32(bytes, at + 12)
          bits = rdLe16(bytes, at + 22)
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
        case "data" =>
          data = bytes.slice(at + 8, math.min(at + 8 + len, bytes.length))
        case _ => // skip unknown chunks (LIST, fact, …)
      }
      at += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(rate > 0 && data != null, "missing fmt or data chunk")
    val samples = Array.tabulate(data.length / 2)(i =>
      rdLe16(data, i * 2).toShort)
    WavAudio(rate, channels, samples)
  }

  /** MP3 magic sniff: an ID3v2 tag or a bare MPEG frame sync. */
  def isMp3(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 3 &&
      ((bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') ||
        ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xe0) == 0xe0))

  /** Decode audio through whatever `javax.sound.sampled` SPI the
    * runtime carries, converted to signed 16-bit little-endian PCM.
    * The base JDK ships WAV/AIFF/AU providers; an MP3 SPI (e.g.
    * mp3spi on the classpath) slots in with no code change — on
    * runtimes without one this returns None and callers fall through
    * to the declared stub. This is the probe that turns the MP3 stub
    * real the moment the environment can actually decode it. */
  def decodeViaSpi(bytes: Array[Byte]): Option[WavAudio] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val base = in.getFormat
      val pcmFmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        base.getSampleRate, 16, base.getChannels,
        base.getChannels * 2, base.getSampleRate, false)
      val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, in)
      val raw = pcm.readAllBytes()
      pcm.close(); in.close()
      val samples = Array.tabulate(raw.length / 2)(i => rdLe16(raw, i * 2).toShort)
      Some(WavAudio(base.getSampleRate.toInt, base.getChannels, samples))
    } catch { case _: Exception => None }

  // ------------------------------------------------------------------ MP3

  /** MPEG-audio stream facts recoverable WITHOUT a decoder: pure
    * ISO/IEC 11172-3 frame-header arithmetic. */
  final case class Mp3Info(sampleRate: Int, channels: Int, frames: Int,
      durationMs: Long, avgBitrateKbps: Int, vbr: Boolean)

  // bitrate tables in kbps, index 1-14 (0 = "free", 15 = invalid):
  // rows keyed by (version group, layer)
  private val BitrateV1 = Map(
    1 -> Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2 -> Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    3 -> Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))
  private val BitrateV2 = Map(
    1 -> Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    2 -> Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3 -> Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))
  // sample rates by version: MPEG1 / MPEG2 / MPEG2.5
  private val RatesV1 = Array(44100, 48000, 32000)
  private val RatesV2 = Array(22050, 24000, 16000)
  private val RatesV25 = Array(11025, 12000, 8000)

  /** Parse an MPEG audio (MP3) stream's frame headers: skip a leading
    * ID3v2 tag (syncsafe length), then walk frame-to-frame using the
    * header's own frame-length formula — duration, sample rate,
    * channel mode and average bitrate (VBR-aware) fall out with zero
    * decoding (public ISO 11172-3 math; the duration/bitrate metadata
    * the reference's media tier surfaces). Stops at the first
    * malformed header (truncated stream: the frames so far stand);
    * returns None when no valid frame exists. */
  def parseMp3(bytes: Array[Byte]): Option[Mp3Info] = {
    if (bytes == null || bytes.length < 4) return None
    var at = 0
    // ID3v2: "ID3" ver(2) flags(1) size(4 × 7-bit syncsafe)
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      at = 10 + size
    }
    var frames = 0
    var samplesTotal = 0L
    var bitrateSum = 0L
    var rate = 0
    var chans = 0
    var minBr = Int.MaxValue
    var maxBr = 0
    var ok = true
    while (ok && at + 4 <= bytes.length) {
      val b1 = bytes(at) & 0xff; val b2 = bytes(at + 1) & 0xff
      val b3 = bytes(at + 2) & 0xff; val b4 = bytes(at + 3) & 0xff
      if (b1 != 0xff || (b2 & 0xe0) != 0xe0) ok = false
      else {
        val verBits = (b2 >> 3) & 0x3   // 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
        val layerBits = (b2 >> 1) & 0x3 // 1=III, 2=II, 3=I
        val brIdx = (b3 >> 4) & 0xf
        val srIdx = (b3 >> 2) & 0x3
        val padding = (b3 >> 1) & 0x1
        val mode = (b4 >> 6) & 0x3      // 3 = mono
        if (verBits == 1 || layerBits == 0 || brIdx == 0 || brIdx == 15 ||
            srIdx == 3) ok = false
        else {
          val layer = 4 - layerBits      // 1, 2, 3
          val kbps = (if (verBits == 3) BitrateV1 else BitrateV2)(layer)(brIdx)
          val sr = (verBits match {
            case 3 => RatesV1; case 2 => RatesV2; case _ => RatesV25
          })(srIdx)
          val samplesPerFrame =
            if (layer == 1) 384
            else if (layer == 2) 1152
            else if (verBits == 3) 1152 else 576 // Layer III halves in MPEG2/2.5
          val frameLen =
            if (layer == 1) (12 * kbps * 1000 / sr + padding) * 4
            else samplesPerFrame / 8 * kbps * 1000 / sr + padding
          if (frameLen <= 4 || at + frameLen > bytes.length) ok = false
          else {
            frames += 1
            samplesTotal += samplesPerFrame
            bitrateSum += kbps
            minBr = math.min(minBr, kbps); maxBr = math.max(maxBr, kbps)
            rate = sr
            chans = if (mode == 3) 1 else 2
            at += frameLen
          }
        }
      }
    }
    if (frames == 0) None
    else Some(Mp3Info(rate, chans, frames,
      samplesTotal * 1000L / rate, (bitrateSum / frames).toInt, minBr != maxBr))
  }

  // ------------------------------------------------------------------ BMP

  final case class BmpImage(width: Int, height: Int,
      pixels: Array[Int] /* 0xRRGGBB row-major, top-down */) {
    def meanChannel(shift: Int): Double =
      if (pixels.isEmpty) 0.0
      else pixels.map(p => (p >> shift) & 0xff).sum.toDouble / pixels.length
    def meanR: Double = meanChannel(16)
    def meanG: Double = meanChannel(8)
    def meanB: Double = meanChannel(0)
  }

  def isBmp(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M'

  /** Uncompressed 24-bit bottom-up BMP writer. */
  def buildBmp(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val rowPad = (4 - (width * 3) % 4) % 4
    val dataLen = (width * 3 + rowPad) * height
    val out = new ByteArrayOutputStream(54 + dataLen)
    out.write('B'); out.write('M')
    le32(out, 54 + dataLen); le32(out, 0); le32(out, 54)
    le32(out, 40)                       // BITMAPINFOHEADER
    le32(out, width); le32(out, height) // positive height = bottom-up
    le16(out, 1); le16(out, 24)         // planes, bpp
    le32(out, 0); le32(out, dataLen)    // BI_RGB, image size
    le32(out, 2835); le32(out, 2835); le32(out, 0); le32(out, 0)
    // bottom-up rows, BGR order
    ((height - 1) to 0 by -1).foreach { y =>
      (0 until width).foreach { x =>
        val p = pixel(x, y)
        out.write(p & 0xff); out.write((p >> 8) & 0xff); out.write((p >> 16) & 0xff)
      }
      (0 until rowPad).foreach(_ => out.write(0))
    }
    out.toByteArray
  }

  def decodeBmp(bytes: Array[Byte]): BmpImage = {
    require(isBmp(bytes), "not a BMP stream")
    val dataAt = rdLe32(bytes, 10)
    val width = rdLe32(bytes, 18)
    val rawHeight = rdLe32(bytes, 22)
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    require(rdLe16(bytes, 28) == 24, "only 24-bit BMP supported")
    require(rdLe32(bytes, 30) == 0, "only uncompressed BMP supported")
    val rowPad = (4 - (width * 3) % 4) % 4
    val pixels = new Array[Int](width * height)
    var at = dataAt
    val rows = if (bottomUp) (height - 1) to 0 by -1 else 0 until height
    rows.foreach { y =>
      (0 until width).foreach { x =>
        pixels(y * width + x) = (bytes(at) & 0xff) |
          ((bytes(at + 1) & 0xff) << 8) | ((bytes(at + 2) & 0xff) << 16)
        at += 3
      }
      at += rowPad
    }
    BmpImage(width, height, pixels)
  }

  /** 64-bit difference hash (dHash — the public perceptual-hash family
    * popularized by Krawetz): area-average the grayscale image onto a
    * 9×8 grid and emit bit y·8+x = [cell(x+1,y) brighter than
    * cell(x,y)], packed as two unsigned 32-bit halves (hi = bits
    * 32..63) so engines without unsigned 64-bit types reproduce it
    * exactly. Brightness comparisons are integer cross-multiplied sums
    * — no division, no floats — so the hash is bit-stable across
    * engines and platforms. Near-duplicate images (resizes, small
    * edits, recompressions) land within a few bits of Hamming
    * distance; unrelated images differ in ~32. */
  def dHash64(img: BmpImage): (Long, Long) = {
    require(img.width > 0 && img.height > 0, "empty image")
    val sg = Array.ofDim[Long](8, 9)
    val cnt = Array.ofDim[Long](8, 9)
    val n = img.width * img.height
    var i = 0
    while (i < n) {
      val p = img.pixels(i)
      val gray = 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
        114L * (p & 0xff)
      val cx = ((i % img.width) * 9) / img.width
      val cy = ((i / img.width) * 8) / img.height
      sg(cy)(cx) += gray
      cnt(cy)(cx) += 1
      i += 1
    }
    var hi = 0L
    var lo = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (sg(y)(x + 1) * cnt(y)(x) > sg(y)(x) * cnt(y)(x + 1)) {
          val pos = y * 8 + x
          if (pos < 32) lo |= 1L << pos else hi |= 1L << (pos - 32)
        }
        x += 1
      }
      y += 1
    }
    (hi, lo)
  }

  // ------------------------------------------------- compressed (ImageIO)

  // java.awt must come up headless on executors (no display in a
  // cluster container); set before the first ImageIO touch.
  private lazy val imageIoReady: Boolean = {
    System.setProperty("java.awt.headless", "true")
    true
  }

  /** Magic-byte sniff for the compressed formats the JDK decodes. */
  def imageIoFormat(bytes: Array[Byte]): Option[String] = {
    def b(i: Int) = bytes(i) & 0xff
    if (bytes == null || bytes.length < 4) None
    else if (b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') Some("png")
    else if (b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff) Some("jpeg")
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') Some("gif")
    else if ((b(0) == 'I' && b(1) == 'I' && b(2) == 42) ||
      (b(0) == 'M' && b(1) == 'M' && b(3) == 42)) Some("tiff")
    else None
  }

  /** Encode a raster through a REAL compressed codec ("png", "jpg",
    * "gif", "tif"); `pixel(x, y)` returns 0xRRGGBB. */
  def buildImage(format: String, width: Int, height: Int,
      pixel: (Int, Int) => Int): Array[Byte] = {
    require(imageIoReady)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until height).foreach(y =>
      (0 until width).foreach(x => img.setRGB(x, y, pixel(x, y))))
    val out = new ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, out), s"no ImageIO writer for $format")
    out.toByteArray
  }

  /** Decode any ImageIO-supported compressed image to the same raster
    * shape the BMP path yields (0xRRGGBB row-major, top-down). */
  def decodeImage(bytes: Array[Byte]): BmpImage = {
    require(imageIoReady)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "ImageIO found no decoder for the stream")
    val (w, h) = (img.getWidth, img.getHeight)
    // one bulk grab, not w*h getRGB calls — this runs per row at scale
    val argb = img.getRGB(0, 0, w, h, null, 0, w)
    BmpImage(w, h, argb.map(_ & 0xffffff))
  }

  // ------------------------------------------------------------------ H.264

  /** H.264 stream facts recoverable WITHOUT a decoder: pure ITU-T
    * H.264 (ISO/IEC 14496-10) §7.3.2.1 SPS arithmetic plus an Annex-B
    * NAL walk — the video analog of [[parseMp3]]. */
  final case class H264Info(profile: Int, level: Int, width: Int,
      height: Int, sliceCount: Int, idrCount: Int)

  /** Annex-B sniff: a 3/4-byte start code followed by a NAL header
    * with forbidden_zero_bit clear and a known nal_unit_type. */
  def isH264(bytes: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < 5) return false
    val off =
      if (bytes(0) == 0 && bytes(1) == 0 && bytes(2) == 1) 3
      else if (bytes(0) == 0 && bytes(1) == 0 && bytes(2) == 0 && bytes(3) == 1) 4
      else -1
    off > 0 && off < bytes.length && (bytes(off) & 0x80) == 0 &&
      ((bytes(off) & 0x1f) match { case t => t >= 1 && t <= 23 })
  }

  /** Exp-Golomb bit reader over an RBSP (emulation-prevention bytes
    * already removed). Throws on exhaustion — callers treat that as a
    * malformed stream. */
  private final class BitReader(b: Array[Byte]) {
    private var pos = 0
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        require(pos < b.length * 8, "rbsp exhausted")
        v = (v << 1) | ((b(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1; i += 1
      }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0) { zeros += 1; require(zeros < 32, "ue overflow") }
      (1 << zeros) - 1 + (if (zeros == 0) 0 else u(zeros))
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 0) -(k / 2) else (k + 1) / 2
    }
  }

  /** Strip emulation-prevention bytes: 00 00 03 → 00 00 (§7.4.1.1). */
  private def rbspOf(nal: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(nal.length)
    var i = 0
    while (i < nal.length) {
      if (i + 2 < nal.length && nal(i) == 0 && nal(i + 1) == 0 &&
          nal(i + 2) == 3) {
        out.write(0); out.write(0); i += 3
      } else { out.write(nal(i)); i += 1 }
    }
    out.toByteArray
  }

  /** Parse an Annex-B H.264 elementary stream: walk the NAL units by
    * start code, count the coded slices (and IDR refresh points), and
    * decode the first sequence parameter set — profile, level, and the
    * real coded resolution including frame cropping (§7.3.2.1,
    * §7.4.2.1.1 CropUnit math). No pixel is touched. Returns None when
    * no parseable SPS exists. */
  def parseH264(bytes: Array[Byte]): Option[H264Info] = {
    if (!isH264(bytes)) return None
    // collect NAL unit (type, payload) spans
    val nals = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    var i = 0
    var start = -1
    def closeNal(end: Int): Unit = if (start >= 0 && end > start) {
      val t = bytes(start) & 0x1f
      nals += ((t, java.util.Arrays.copyOfRange(bytes, start + 1, end)))
    }
    while (i + 2 < bytes.length) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) {
        // a 4-byte code's leading zero belongs to the code, not the NAL
        closeNal(if (start >= 0 && i > start && bytes(i - 1) == 0) i - 1 else i)
        start = i + 3
        i += 3
      } else i += 1
    }
    closeNal(bytes.length)
    val slices = nals.count(n => n._1 == 1 || n._1 == 5)
    val idrs = nals.count(_._1 == 5)
    nals.find(_._1 == 7).flatMap { case (_, sps) =>
      try {
        val r = new BitReader(rbspOf(sps))
        val profile = r.u(8)
        r.u(8) // constraint flags + reserved
        val level = r.u(8)
        r.ue() // seq_parameter_set_id
        var chroma = 1 // default 4:2:0 for non-high profiles
        var separateColour = 0
        if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134,
            135).contains(profile)) {
          chroma = r.ue()
          if (chroma == 3) separateColour = r.u(1)
          r.ue(); r.ue() // bit_depth_{luma,chroma}_minus8
          r.u(1)         // qpprime_y_zero_transform_bypass_flag
          if (r.u(1) == 1) { // seq_scaling_matrix_present_flag
            val lists = if (chroma == 3) 12 else 8
            (0 until lists).foreach { li =>
              if (r.u(1) == 1) { // scaling_list_present
                val size = if (li < 6) 16 else 64
                var last = 8; var next = 8
                (0 until size).foreach { _ =>
                  if (next != 0) next = (last + r.se() + 256) % 256
                  if (next != 0) last = next
                }
              }
            }
          }
        }
        r.ue() // log2_max_frame_num_minus4
        r.ue() match { // pic_order_cnt_type
          case 0 => r.ue()
          case 1 =>
            r.u(1); r.se(); r.se()
            (0 until r.ue()).foreach(_ => r.se())
          case _ => ()
        }
        r.ue() // max_num_ref_frames
        r.u(1) // gaps_in_frame_num_value_allowed_flag
        val wMbs = r.ue() + 1
        val hMap = r.ue() + 1
        val frameMbsOnly = r.u(1)
        if (frameMbsOnly == 0) r.u(1) // mb_adaptive_frame_field_flag
        r.u(1) // direct_8x8_inference_flag
        var (cl, cr, ct, cb) = (0, 0, 0, 0)
        if (r.u(1) == 1) { // frame_cropping_flag
          cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue()
        }
        // §7.4.2.1.1: crop units by chroma format
        val (cux, cuy) =
          if (chroma == 0 || separateColour == 1) (1, 2 - frameMbsOnly)
          else {
            val subW = if (chroma == 3) 1 else 2
            val subH = if (chroma == 1) 2 else 1
            (subW, subH * (2 - frameMbsOnly))
          }
        val width = wMbs * 16 - cux * (cl + cr)
        val height = (2 - frameMbsOnly) * hMap * 16 - cuy * (ct + cb)
        Some(H264Info(profile, level, width, height, slices, idrs))
      } catch { case _: Exception => None }
    }
  }
}
