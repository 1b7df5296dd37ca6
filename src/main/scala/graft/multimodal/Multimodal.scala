package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque BINARY columns with a
  * typed metadata struct, decoded/feature-extracted per partition.
  *
  * The Spark-side plumbing is real — schema, batched per-partition
  * processing (one decoder instance per partition, the mapInPandas batch
  * shape), partition sizing. The decode kernel is REAL for WAV
  * (RIFF/PCM16 → duration, RMS, peak, zero-crossing rate) and BMP
  * (24-bit → true width/height, channel means) via hand-rolled
  * graft.tools.Media parsers, and for the compressed image formats the
  * JDK itself decodes — PNG/JPEG/GIF/TIFF via javax.imageio
  * (java.desktop, headless-safe). Compressed audio probes the
  * `javax.sound.sampled` SPI registry at runtime (`Media.decodeViaSpi`
  * — a WAV/AIFF/AU decode ships with the JDK and MP3 works the moment
  * an MP3 SPI is on the classpath); without an SPI, MP3 METADATA is
  * still real — `Media.parseMp3` walks the MPEG frame headers (pure
  * ISO 11172-3 math) for duration/bitrate/sample-rate — and only the
  * PCM-derived features fall back to the deterministic [[StubDecoder]].
  * Video METADATA is real too: `Media.parseH264` walks the Annex-B NAL
  * stream and decodes the SPS (pure ITU-T H.264 §7.3.2.1 math) for
  * profile/level/true cropped resolution/slice counts. The remaining
  * declared stub is video PIXEL decode; a deployment swaps in an
  * FFmpeg-backed decoder behind the same trait.
  *
  * Why the MP3 PCM path is exercised only when an SPI is present: the
  * SPI decode itself is proven bit-exact on WAV (the JDK ships that
  * codec), and adding a test-scoped MP3 SPI (javazoom/tritonus) is not
  * possible in this build — the dependency set is frozen and the
  * offline artifact cache carries no MP3 SPI jar (checked round 13).
  * A deployment that puts one on the classpath gets real MP3 PCM with
  * zero code change; a full in-repo ISO Layer-III decoder (Huffman +
  * IMDCT + synthesis filterbank) would be thousands of lines to
  * re-derive a codec the platform loads as a service, for a capability
  * the reference platform does not have at all.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Per-partition decode kernel. One instance per partition — the place
    * a real implementation holds its codec context. */
  trait MediaDecoder extends Serializable {
    def features(content: Array[Byte]): Array[Float]
    def meta(content: Array[Byte], fileName: String): Row
  }

  /** Deterministic fake: "features" are a seeded hash-derived vector;
    * metadata is sniffed from magic bytes. Deterministic ⇒ testable. */
  class StubDecoder(dim: Int = 8) extends MediaDecoder {
    override def features(content: Array[Byte]): Array[Float] = {
      val seed = java.util.Arrays.hashCode(content)
      val rnd = new scala.util.Random(seed)
      Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
    }
    override def meta(content: Array[Byte], fileName: String): Row = {
      val hex = content.take(4).map("%02X".format(_)).mkString
      val fmt =
        if (hex.startsWith("89504E47")) "png"
        else if (hex.startsWith("FFD8FF")) "jpeg"
        else if (hex.startsWith("474946")) "gif"
        else if (fileName.endsWith(".wav")) "wav"
        else "unknown"
      // DECLARED STUB: real decoders read the actual header fields here
      val dims = if (fmt == "unknown") (0, 0) else (content.length % 1920, content.length % 1080)
      Row(fmt, dims._1, dims._2, content.length.toLong)
    }
  }

  /** Real JDK-only decode for WAV, BMP, and the compressed image
    * formats javax.imageio ships (PNG/JPEG/GIF/TIFF); deterministic
    * stub features only for compressed audio/video. Feature layout (dim 8):
    * audio → [1, rate/48k, duration_s, rms, peak, zcr, 0, 0];
    * image → [2, w/4096, h/4096, meanR/255, meanG/255, meanB/255, 0, 0]. */
  class JdkMediaDecoder(dim: Int = 8) extends MediaDecoder {
    private val stub = new StubDecoder(dim)
    private def pad(v: Array[Float]): Array[Float] =
      v.padTo(dim, 0f).take(dim)
    // a corrupt file yields a marked row, never a failed task — one bad
    // upload must not abort a 100 TB batch (the TextExtractorTool rule)
    override def features(content: Array[Byte]): Array[Float] = {
      import graft.tools.Media
      try {
        if (Media.isWav(content)) {
          val a = Media.decodeWav(content)
          pad(Array(1f, a.sampleRate / 48000f, a.durationMs / 1000f,
            a.rms.toFloat, a.peak.toFloat, a.zeroCrossingRate.toFloat))
        } else if (Media.isBmp(content)) {
          imageFeatures(Media.decodeBmp(content))
        } else if (Media.imageIoFormat(content).isDefined) {
          imageFeatures(Media.decodeImage(content)) // real PNG/JPEG/GIF/TIFF
        } else if (Media.isMp3(content)) {
          // real decode when the runtime carries an MP3 SPI; declared
          // stub otherwise (the one remaining compressed-A/V stub)
          Media.decodeViaSpi(content) match {
            case Some(a) => pad(Array(1f, a.sampleRate / 48000f,
              a.durationMs / 1000f, a.rms.toFloat, a.peak.toFloat,
              a.zeroCrossingRate.toFloat))
            case None => stub.features(content)
          }
        } else if (Media.isH264(content)) {
          // stream-structure features are real header math (SPS +
          // NAL walk); only PIXEL features remain stub
          Media.parseH264(content) match {
            case Some(v) => pad(Array(3f, v.width / 4096f, v.height / 4096f,
              v.sliceCount / 1000f,
              if (v.sliceCount == 0) 0f
              else v.idrCount.toFloat / v.sliceCount))
            case None => stub.features(content)
          }
        } else stub.features(content)
      } catch { case _: Exception => Array.fill(dim)(0f) }
    }
    private def imageFeatures(i: graft.tools.Media.BmpImage): Array[Float] =
      pad(Array(2f, i.width / 4096f, i.height / 4096f,
        (i.meanR / 255.0).toFloat, (i.meanG / 255.0).toFloat,
        (i.meanB / 255.0).toFloat))
    override def meta(content: Array[Byte], fileName: String): Row = {
      import graft.tools.Media
      try {
        if (Media.isWav(content)) {
          val a = Media.decodeWav(content)
          Row("wav", 0, 0, a.durationMs)
        } else if (Media.isBmp(content)) {
          val i = Media.decodeBmp(content)
          Row("bmp", i.width, i.height, 0L)
        } else if (Media.imageIoFormat(content).isDefined) {
          val fmt = Media.imageIoFormat(content).get
          val i = Media.decodeImage(content)
          Row(fmt, i.width, i.height, 0L)
        } else if (Media.isMp3(content)) {
          Media.decodeViaSpi(content) match {
            case Some(a) => Row("mp3", 0, 0, a.durationMs)
            case None => Media.parseMp3(content) match {
              // no SPI: duration still REAL — pure frame-header math
              case Some(info) => Row("mp3", 0, 0, info.durationMs)
              case None => stub.meta(content, fileName)
            }
          }
        } else if (Media.isH264(content)) {
          Media.parseH264(content) match {
            // resolution is REAL — SPS math, no decoder
            case Some(v) => Row("h264", v.width, v.height, 0L)
            case None => stub.meta(content, fileName)
          }
        } else stub.meta(content, fileName)
      } catch { case _: Exception => Row("corrupt", 0, 0, 0L) }
    }
  }

  /** Attach media metadata + feature vector columns. Batched via
    * mapPartitions: decoder constructed once per partition, rows stream
    * through (the Scala dual of mapInPandas batches). */
  def withMediaFeatures(df: DataFrame, contentCol: String, fileNameCol: String,
      mkDecoder: () => MediaDecoder = () => new StubDecoder()): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("media_meta", mediaMetaType),
      StructField("features", ArrayType(FloatType))))
    val cIdx = df.schema.fieldIndex(contentCol)
    val fIdx = df.schema.fieldIndex(fileNameCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      val decoder = mkDecoder()                 // per-partition init
      rows.map { r =>
        val content = r.getAs[Array[Byte]](cIdx)
        val name = r.getAs[String](fIdx)
        Row.fromSeq(r.toSeq ++ Seq(decoder.meta(content, name),
          decoder.features(content).toSeq))
      }
    }(enc)
  }

  /** Frame sampling plumbing: explode a video row into frame rows at
    * `everyMs` intervals of the (stubbed) duration. */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.withColumn("frame_ms",
        explode(sequence(lit(0L), greatest(col("media_meta.duration_ms") - 1, lit(0L)),
          lit(everyMs))))
      .withColumn("frame_id",
        concat_ws(":", col("file_name"), col("frame_ms")))
}
