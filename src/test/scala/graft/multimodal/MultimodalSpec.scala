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
