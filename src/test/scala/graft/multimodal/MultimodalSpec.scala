package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 1, 2, 3, 4, 5)
  private val jpg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 9, 9)

  test("media features: schema, determinism, per-partition decode") {
    import spark.implicits._
    val df = Seq(("a.png", png), ("b.jpg", jpg), ("c.bin", Array[Byte](1, 2)))
      .toDF("file_name", "content").repartition(2)
    val out = Multimodal.withMediaFeatures(df, "content", "file_name")
    assert(out.schema.fieldNames.toSeq ==
      Seq("file_name", "content", "media_meta", "features"))

    val rows = out.orderBy("file_name").collect()
    val metaA = rows(0).getStruct(rows(0).fieldIndex("media_meta"))
    assert(metaA.getString(0) == "png")
    val metaB = rows(1).getStruct(rows(1).fieldIndex("media_meta"))
    assert(metaB.getString(0) == "jpeg")
    assert(rows(2).getStruct(rows(2).fieldIndex("media_meta")).getString(0) == "unknown")

    // deterministic features: same bytes → same vector across runs
    val out2 = Multimodal.withMediaFeatures(df, "content", "file_name")
      .orderBy("file_name").collect()
    assert(rows(0).getSeq[Float](rows(0).fieldIndex("features")) ==
      out2(0).getSeq[Float](out2(0).fieldIndex("features")))
    assert(rows(0).getSeq[Float](rows(0).fieldIndex("features")).length == 8)
  }

  test("WAV codec: build → decode round trip with exact header fields") {
    import graft.tools.Media
    // 1 kHz square wave, 16 kHz mono, 0.5 s
    val samples = Array.tabulate[Short](8000)(i =>
      if ((i / 8) % 2 == 0) 16384 else -16384)
    val wav = Media.buildWav(samples, sampleRate = 16000)
    assert(Media.isWav(wav) && !Media.isBmp(wav))
    val a = Media.decodeWav(wav)
    assert(a.sampleRate == 16000 && a.channels == 1)
    assert(a.samples.toSeq == samples.toSeq)      // bit-exact PCM round trip
    assert(a.durationMs == 500L)
    assert(math.abs(a.rms - 0.5) < 1e-3)          // square wave: rms = amp
    assert(math.abs(a.peak - 0.5) < 1e-3)
    assert(a.zeroCrossingRate > 0.1 && a.zeroCrossingRate < 0.14) // 1/8 edges
  }

  test("BMP codec: build → decode round trip with exact pixels") {
    import graft.tools.Media
    // 5x3 (odd width exercises row padding), gradient pixels
    val bmp = Media.buildBmp(5, 3, (x, y) => (x * 40 << 16) | (y * 80 << 8) | 0x20)
    assert(Media.isBmp(bmp) && !Media.isWav(bmp))
    val i = Media.decodeBmp(bmp)
    assert(i.width == 5 && i.height == 3)
    assert(i.pixels(0) == 0x000020)               // (0,0): r=0 g=0 b=0x20
    assert(i.pixels(2 * 5 + 4) == ((160 << 16) | (160 << 8) | 0x20)) // (4,2)
    assert(math.abs(i.meanR - 80.0) < 1e-9)       // mean of 0,40,80,120,160
    assert(math.abs(i.meanG - 80.0) < 1e-9)       // mean of 0,80,160
    assert(i.meanB == 32.0)
  }

  test("dHash: near-identical BMPs land within a few bits; unrelated images far") {
    import graft.tools.Media
    // base: a smooth 64x48 gradient
    def gradient(tweak: (Int, Int) => Int) = Media.decodeBmp(
      Media.buildBmp(64, 48, (x, y) => {
        val v = (x * 4 + tweak(x, y)) & 0xff
        (v << 16) | (((v + y) & 0xff) << 8) | (y & 0xff)
      }))
    val base = Media.dHash64(gradient((_, _) => 0))
    // near-identical: a handful of pixels nudged (a re-encode artifact)
    val near = Media.dHash64(gradient((x, y) => if (x == 7 && y < 3) 2 else 0))
    // unrelated: the gradient REVERSED (opposite brightness structure)
    val far = Media.dHash64(Media.decodeBmp(
      Media.buildBmp(64, 48, (x, y) => {
        val v = (252 - x * 4) & 0xff
        (v << 16) | (((v + y) & 0xff) << 8) | (y & 0xff)
      })))
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    assert(ham(base, near) <= 2, s"near-dup drifted ${ham(base, near)} bits")
    assert(ham(base, far) >= 16, s"unrelated images only ${ham(base, far)} bits apart")
    // halves stay in unsigned-32 range (the oracle's representation)
    Seq(base, near, far).foreach { case (hi, lo) =>
      assert(hi >= 0L && hi < (1L << 32) && lo >= 0L && lo < (1L << 32))
    }
  }

  test("dHash is invariant under 2x area upscaling (the resize robustness claim)") {
    import graft.tools.Media
    def pix(x: Int, y: Int): Int = {
      val v = ((x * 7) ^ (y * 3)) & 0xff
      (v << 16) | (v << 8) | v
    }
    // 36x16: the 9x8 grid divides both dimensions evenly, so each cell
    // of the 2x upscale is exactly the 4x-replicated source cell and
    // the cross-multiplied comparisons are identical bit for bit
    val small = Media.dHash64(Media.decodeBmp(Media.buildBmp(36, 16, pix)))
    val big = Media.dHash64(Media.decodeBmp(
      Media.buildBmp(72, 32, (x, y) => pix(x / 2, y / 2))))
    assert(small === big)
  }

  test("q144 finds the exact-duplicate documents as 0-distance pairs") {
    val pairs = graft.operators.MediaOps.q144PhashNeardup.fn(spark, sf("sf0.001")).collect()
    assert(pairs.nonEmpty, "test corpus contains dups; q144 found none")
    // exact text dups must appear at hamming 0 (same raster, same hash)
    val texts = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val exactDup = texts.toSeq.filter(_._2.nonEmpty)
      .groupBy(_._2).values.filter(_.size >= 2)
      .flatMap { g => val ids = g.map(_._1).sorted; ids.tail.map(b => (ids.head, b)) }
      .toSet
    val got = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    exactDup.foreach { case (a, b) =>
      assert(got.contains((a, b)), s"exact dup ($a,$b) missing from q144")
    }
    pairs.foreach(r => assert(r.getLong(2) >= 0 && r.getLong(2) <= 6))
  }

  test("SPI probe: WAV through javax.sound equals the hand-rolled parser") {
    import graft.tools.Media
    val samples = Array.tabulate(400)(i =>
      (math.sin(i * 0.1) * 12000).toShort)
    val wav = Media.buildWav(samples, sampleRate = 16000)
    val viaSpi = Media.decodeViaSpi(wav)
    assert(viaSpi.isDefined, "the JDK always carries a WAV SPI")
    val a = viaSpi.get
    val b = Media.decodeWav(wav)
    assert(a.sampleRate === b.sampleRate)
    assert(a.samples.toSeq === b.samples.toSeq,
      "SPI PCM conversion must be bit-exact vs the hand parser")
  }

  test("MP3 sniff + SPI fallback: no MP3 SPI here, decoder stays deterministic") {
    import graft.tools.Media
    val id3 = "ID3".getBytes ++ Array.fill[Byte](64)(7)
    val sync = Array[Byte](0xFF.toByte, 0xFB.toByte, 0x90.toByte, 0x44.toByte) ++
      Array.fill[Byte](64)(3)
    assert(Media.isMp3(id3) && Media.isMp3(sync))
    assert(!Media.isMp3("RIFF....WAVE".getBytes))
    // this container has no MP3 SPI: decode must decline, not throw...
    assert(Media.decodeViaSpi(id3).isEmpty)
    // ...and the decoder falls through to the DETERMINISTIC stub
    val dec = new Multimodal.JdkMediaDecoder()
    val stub = new Multimodal.StubDecoder()
    assert(dec.features(id3).toSeq === stub.features(id3).toSeq)
    assert(dec.meta(sync, "x.mp3") === stub.meta(sync, "x.mp3"))
  }

  test("MP3 frame-header parser: CBR/VBR duration, rates, channels — zero decode") {
    import graft.tools.Media
    import MultimodalSpec.{mp3Frame, id3Tag}

    // 40 CBR frames, MPEG1 Layer III 128 kbps 44100 Hz stereo
    val cbr = (1 to 40).map(_ => mp3Frame(128, srIdx = 0, mono = false))
      .reduce(_ ++ _)
    val info = Media.parseMp3(cbr).get
    assert(info.frames == 40 && info.sampleRate == 44100 && info.channels == 2)
    assert(info.avgBitrateKbps == 128 && !info.vbr)
    assert(info.durationMs == 40L * 1152 * 1000 / 44100) // 1044 ms

    // an ID3v2 tag is skipped via its syncsafe length
    val tagged = id3Tag(100) ++ cbr
    assert(Media.parseMp3(tagged).get.frames == 40)

    // VBR: alternating 128/192 frames average to 160 and flag vbr
    val vbr = (1 to 10).flatMap(i =>
      mp3Frame(if (i % 2 == 0) 192 else 128, 0, mono = false)).toArray
    val v = Media.parseMp3(vbr).get
    assert(v.frames == 10 && v.avgBitrateKbps == 160 && v.vbr)

    // MPEG2 Layer III halves samples-per-frame (576) at 22050 Hz, mono
    val v2 = (1 to 20).map(_ => mp3Frame(64, 0, mono = true, mpeg2 = true))
      .reduce(_ ++ _)
    val i2 = Media.parseMp3(v2).get
    assert(i2.sampleRate == 22050 && i2.channels == 1)
    assert(i2.durationMs == 20L * 576 * 1000 / 22050)

    // a truncated stream keeps the whole frames parsed so far
    assert(Media.parseMp3(cbr.dropRight(100)).get.frames == 39)
    // garbage and frame-less tags decline instead of guessing
    assert(Media.parseMp3("not audio at all".getBytes).isEmpty)
    assert(Media.parseMp3(id3Tag(50)).isEmpty)

    // and the decoder's MP3 metadata row is REAL without any SPI
    val dec = new Multimodal.JdkMediaDecoder()
    val meta = dec.meta(tagged, "song.mp3")
    assert(meta.getString(0) == "mp3")
    assert(meta.getLong(3) == 40L * 1152 * 1000 / 44100)
  }

  test("H.264 SPS parser: profile/level/resolution/slices — pure header math, zero decode") {
    import graft.tools.Media
    import MultimodalSpec.{spsNal, sliceNal}

    // 320x240 Baseline: 20x15 macroblocks, no cropping
    val s1 = spsNal(19, 14) ++ sliceNal(idr = true) ++
      sliceNal(idr = false) ++ sliceNal(idr = false)
    assert(Media.isH264(s1))
    val v1 = Media.parseH264(s1).get
    assert(v1.profile == 66 && v1.level == 30)
    assert(v1.width == 320 && v1.height == 240)
    assert(v1.sliceCount == 3 && v1.idrCount == 1)

    // 1920x1080 High: 120x68 MBs, 1088 coded rows cropped by 4 chroma
    // units (CropUnitY=2 for 4:2:0 frame-coded) to 1080
    val s2 = spsNal(119, 67, high = true, cropBottom = 4) ++
      sliceNal(idr = true)
    val v2 = Media.parseH264(s2).get
    assert(v2.profile == 100 && v2.width == 1920 && v2.height == 1080)

    // emulation-prevention round trip: trailing RBSP zeros force
    // 00 00 03 sequences into the NAL; the parser must strip them
    val padded = spsNal(19, 14, trailingZeros = 3)
    assert(padded.sliding(3).exists(w => w(0) == 0 && w(1) == 0 && w(2) == 3),
      "the vector must actually contain an emulation-prevention byte")
    assert(Media.parseH264(padded ++ sliceNal(idr = true)).get.width == 320)

    // non-streams and SPS-less streams decline
    assert(!Media.isH264("not a video".getBytes))
    assert(Media.parseH264(sliceNal(idr = true)).isEmpty)

    // the decoder's video metadata row is REAL (no pixel decode) and
    // stream-structure features are header-derived
    val dec = new Multimodal.JdkMediaDecoder()
    val meta = dec.meta(s1, "clip.h264")
    assert(meta.getString(0) == "h264" &&
      meta.getInt(1) == 320 && meta.getInt(2) == 240)
    val f = dec.features(s1)
    assert(f(0) == 3f && f(1) == 320f / 4096f && f(2) == 240f / 4096f)
    assert(f(3) == 3f / 1000f && f(4) == 1f / 3f)
  }

  test("JdkMediaDecoder: real wav/bmp decode through the Spark plumbing") {
    import spark.implicits._
    import graft.tools.Media
    val wav = Media.buildWav(Array.tabulate[Short](3200)(i =>
      (math.sin(i * 0.1) * 8192).toShort), sampleRate = 16000)
    val bmp = Media.buildBmp(8, 4, (x, y) => 0x7F7F7F)
    val pngReal = Media.buildImage("png", 6, 2, (_, _) => 0x4080C0)
    val df = Seq(("a.wav", wav), ("b.bmp", bmp), ("c.png", pngReal))
      .toDF("file_name", "content").repartition(2)
    val out = Multimodal.withMediaFeatures(df, "content", "file_name",
      () => new Multimodal.JdkMediaDecoder())
      .orderBy("file_name").collect()

    val metaWav = out(0).getStruct(out(0).fieldIndex("media_meta"))
    assert(metaWav.getString(0) == "wav" && metaWav.getLong(3) == 200L) // 3200/16k s
    val fWav = out(0).getSeq[Float](out(0).fieldIndex("features"))
    assert(fWav(0) == 1f && math.abs(fWav(2) - 0.2f) < 1e-6) // kind, duration_s

    val metaBmp = out(1).getStruct(out(1).fieldIndex("media_meta"))
    assert(metaBmp.getString(0) == "bmp" && metaBmp.getInt(1) == 8 && metaBmp.getInt(2) == 4)
    val fBmp = out(1).getSeq[Float](out(1).fieldIndex("features"))
    assert(fBmp(0) == 2f && math.abs(fBmp(3) - 127f / 255f) < 1e-6) // meanR

    // compressed PNG decodes for real through javax.imageio
    val metaPng = out(2).getStruct(out(2).fieldIndex("media_meta"))
    assert(metaPng.getString(0) == "png" && metaPng.getInt(1) == 6 && metaPng.getInt(2) == 2)
    val fPng = out(2).getSeq[Float](out(2).fieldIndex("features"))
    assert(fPng(0) == 2f && math.abs(fPng(3) - 0x40 / 255f) < 1e-6
      && math.abs(fPng(5) - 0xC0 / 255f) < 1e-6)
  }

  test("ImageIO codecs: PNG/GIF/TIFF lossless round trip; JPEG within tolerance") {
    import graft.tools.Media
    val pix = (x: Int, y: Int) => ((x * 16 % 256) << 16) | ((y * 32 % 256) << 8) | 0x40
    // PNG (DEFLATE) must reproduce the exact raster the raw BMP path yields
    val png = Media.decodeImage(Media.buildImage("png", 16, 8, pix))
    assert(png.width == 16 && png.height == 8)
    assert(png.pixels.toSeq == Media.decodeBmp(Media.buildBmp(16, 8, pix)).pixels.toSeq)
    // GIF palette-quantizes, but a solid color survives exactly
    val gif = Media.decodeImage(Media.buildImage("gif", 9, 5, (_, _) => 0x336699))
    assert(gif.width == 9 && gif.pixels.forall(_ == 0x336699))
    val tif = Media.decodeImage(Media.buildImage("tif", 7, 3, pix))
    assert(tif.pixels.toSeq == Media.decodeBmp(Media.buildBmp(7, 3, pix)).pixels.toSeq)
    // JPEG is lossy: dimensions exact, channel means within quantization noise
    val jpgBytes = Media.buildImage("jpg", 32, 24, (_, _) => 0x608040)
    assert(Media.imageIoFormat(jpgBytes).contains("jpeg"))
    val jpg = Media.decodeImage(jpgBytes)
    assert(jpg.width == 32 && jpg.height == 24)
    assert(math.abs(jpg.meanR - 0x60) < 4 && math.abs(jpg.meanG - 0x80) < 4 &&
      math.abs(jpg.meanB - 0x40) < 4)
  }

  test("JdkMediaDecoder: corrupt media yields a marked row, not a failed job") {
    import spark.implicits._
    import graft.tools.Media
    // valid RIFF/WAVE magic, garbage chunk table (negative length bytes)
    val corruptWav = "RIFFÿÿÿÿWAVE".getBytes("ISO-8859-1") ++
      Array[Byte]('f', 'm', 't', ' ', -1, -1, -1, -1, 0, 0)
    val corruptBmp = Media.buildBmp(4, 2, (_, _) => 0x102030).take(30) // truncated
    val df = Seq(("bad.wav", corruptWav), ("bad.bmp", corruptBmp))
      .toDF("file_name", "content")
    val out = Multimodal.withMediaFeatures(df, "content", "file_name",
      () => new Multimodal.JdkMediaDecoder())
      .orderBy("file_name").collect()
    out.foreach { r =>
      assert(r.getStruct(r.fieldIndex("media_meta")).getString(0) == "corrupt")
      assert(r.getSeq[Float](r.fieldIndex("features")).forall(_ == 0f))
    }
  }

  test("e2e: real PNG/JPEG/BMP parquet → decode → classify → routed sink (q41 shape)") {
    import graft.tools.Media
    import org.apache.spark.sql.functions._
    // a mixed media corpus with REAL codec bytes: bright PNGs, dark
    // JPEGs (lossy — the decode is what must recover the brightness),
    // mid-gray BMPs
    val rows =
      (1 to 6).map(i => (s"b_$i.png", Media.buildImage("png", 8, 8, (_, _) => 0xF0F0F0))) ++
      (1 to 5).map(i => (s"d_$i.jpg", Media.buildImage("jpg", 16, 16, (_, _) => 0x101010))) ++
      (1 to 4).map(i => (s"m_$i.bmp", Media.buildBmp(4, 4, (_, _) => 0x808080)))
    val base = java.nio.file.Files.createTempDirectory("graft-media-e2e").toString
    // binary columns survive a real parquet round trip — the storage
    // shape a 100 TB multimodal corpus actually uses
    spark.createDataFrame(rows).toDF("file_name", "content")
      .write.mode("overwrite").parquet(s"$base/in")
    val media = spark.read.parquet(s"$base/in")

    val feat = Multimodal.withMediaFeatures(media, "content", "file_name",
      () => new Multimodal.JdkMediaDecoder())
    // image features carry [2, w, h, meanR, meanG, meanB, ...] /255 —
    // classify on decoded luminance, q41's CASE shape
    val classified = feat
      .withColumn("lum", (element_at(col("features"), 4) +
        element_at(col("features"), 5) + element_at(col("features"), 6)) / 3.0)
      .withColumn("classification",
        when(col("lum") >= 0.6, "bright")
          .when(col("lum") <= 0.3, "dark")
          .otherwise("mid"))
      .select(col("file_name"), col("media_meta.format").as("format"),
        col("classification"))
    graft.sinks.Sinks.writeFs(classified, s"$base/out",
      partitionBy = Seq("classification"))

    // the routing sink split the corpus exactly by decoded content
    val back = spark.read.json(s"$base/out")
    val byClass = back.collect()
      .groupBy(_.getAs[String]("classification"))
      .view.mapValues(_.map(_.getAs[String]("file_name")).toSet).toMap
    assert(byClass("bright") === (1 to 6).map(i => s"b_$i.png").toSet)
    assert(byClass("dark") === (1 to 5).map(i => s"d_$i.jpg").toSet)
    assert(byClass("mid") === (1 to 4).map(i => s"m_$i.bmp").toSet)
    // and the formats were identified from the bytes, not the names
    val fmts = back.collect().map(r =>
      r.getAs[String]("file_name").takeRight(3) -> r.getAs[String]("format")).toSet
    assert(fmts === Set("png" -> "png", "jpg" -> "jpeg", "bmp" -> "bmp"))
  }

  test("frame sampling explodes by stubbed duration") {
    import spark.implicits._
    val df = Seq(("v.bin", Array.fill[Byte](10)(7))).toDF("file_name", "content")
    val frames = Multimodal.sampleFrames(
      Multimodal.withMediaFeatures(df, "content", "file_name"), everyMs = 3L)
    val ids = frames.select("frame_id").collect().map(_.getString(0))
    assert(ids.length == 4)                       // 0,3,6,9 of duration 10
    assert(ids.head == "v.bin:0")
  }
}

/** MP3 test-vector builders: hand-assembled MPEG frame sequences
  * (header + zero payload) exercising the pure header arithmetic. */
object MultimodalSpec {

  /** One MPEG Layer III frame. kbps must exist in the version's Layer
    * III bitrate table; srIdx 0 = 44100 (MPEG1) / 22050 (MPEG2). */
  def mp3Frame(kbps: Int, srIdx: Int, mono: Boolean,
      mpeg2: Boolean = false): Array[Byte] = {
    val table =
      if (mpeg2) Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
      else Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    val brIdx = table.indexOf(kbps)
    require(brIdx > 0, s"$kbps not in table")
    val b2 = if (mpeg2) 0xF3 else 0xFB // sync + version + layer III + no CRC
    val b3 = (brIdx << 4) | (srIdx << 2)
    val b4 = if (mono) 0xC0 else 0x00
    val sr = if (mpeg2) Array(22050, 24000, 16000)(srIdx)
      else Array(44100, 48000, 32000)(srIdx)
    val spf = if (mpeg2) 576 else 1152
    val frameLen = spf / 8 * kbps * 1000 / sr
    val f = new Array[Byte](frameLen)
    f(0) = 0xFF.toByte; f(1) = b2.toByte; f(2) = b3.toByte; f(3) = b4.toByte
    f
  }

  /** ID3v2.3 tag with a syncsafe payload length. */
  def id3Tag(payload: Int): Array[Byte] =
    Array[Byte]('I', 'D', '3', 3, 0, 0,
      ((payload >> 21) & 0x7f).toByte, ((payload >> 14) & 0x7f).toByte,
      ((payload >> 7) & 0x7f).toByte, (payload & 0x7f).toByte) ++
      new Array[Byte](payload)

  // ---- H.264 stream builder (spec-side encoder: the parser must
  // recover exactly the field values written here) ----

  final class BitWriter {
    private val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def u(v: Int, n: Int): this.type = {
      (n - 1 to 0 by -1).foreach(i => bits += ((v >> i) & 1)); this
    }
    def ue(v: Int): this.type = {
      val k = v + 1
      val n = 32 - Integer.numberOfLeadingZeros(k)
      if (n > 1) u(0, n - 1)
      u(k, n)
    }
    /** RBSP: stop bit + byte alignment (§7.3.2.11). */
    def rbsp(): Array[Byte] = {
      val all = bits.toVector :+ 1
      val padded = all ++ Vector.fill((8 - all.length % 8) % 8)(0)
      padded.grouped(8).map(_.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
    }
  }

  /** Emulation prevention: 00 00 {00,01,02,03} → 00 00 03 xx (§7.4.1.1). */
  def epb(rbsp: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    rbsp.foreach { b =>
      val n = out.length
      if (n >= 2 && out(n - 1) == 0 && out(n - 2) == 0 && (b & 0xfc) == 0)
        out += 3
      out += b
    }
    out.toArray
  }

  /** A seq parameter set for the given geometry (§7.3.2.1 field
    * order). `high` switches to profile 100 with the chroma block. */
  def spsNal(wMbsM1: Int, hMapM1: Int, high: Boolean = false,
      cropBottom: Int = 0, trailingZeros: Int = 0): Array[Byte] = {
    val w = new BitWriter
    w.u(if (high) 100 else 66, 8) // profile_idc
    w.u(0, 8)                     // constraint flags + reserved
    w.u(30, 8)                    // level_idc 3.0
    w.ue(0)                       // seq_parameter_set_id
    if (high) {
      w.ue(1)                     // chroma_format_idc 4:2:0
      w.ue(0); w.ue(0)            // bit depths
      w.u(0, 1)                   // qpprime bypass
      w.u(0, 1)                   // no scaling matrix
    }
    w.ue(0)                       // log2_max_frame_num_minus4
    w.ue(0)                       // pic_order_cnt_type = 0
    w.ue(0)                       //   log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)                       // max_num_ref_frames
    w.u(0, 1)                     // gaps_in_frame_num
    w.ue(wMbsM1)
    w.ue(hMapM1)
    w.u(1, 1)                     // frame_mbs_only_flag
    w.u(1, 1)                     // direct_8x8_inference_flag
    if (cropBottom > 0) {
      w.u(1, 1)                   // frame_cropping_flag
      w.ue(0); w.ue(0); w.ue(0); w.ue(cropBottom)
    } else w.u(0, 1)
    w.u(0, 1)                     // vui_parameters_present_flag
    Array[Byte](0, 0, 0, 1, 0x67) ++
      epb(w.rbsp() ++ new Array[Byte](trailingZeros))
  }

  /** A coded-slice NAL (IDR when `idr`) with a dummy payload. */
  def sliceNal(idr: Boolean): Array[Byte] =
    Array[Byte](0, 0, 1, if (idr) 0x65 else 0x41) ++
      Array[Byte](0x7f, 0x12, 0x34, 0x56)
}
