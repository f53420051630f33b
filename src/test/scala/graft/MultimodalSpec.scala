package graft

import org.apache.spark.sql.functions._
import graft.audio.Pcm
import graft.ops.Multimodal
import graft.ops.Multimodal.MediaMeta

final case class MediaRow(media_id: String, bytes: Array[Byte], meta: MediaMeta)

class MultimodalSpec extends SparkSpec {

  private def audioRow(id: String, srHz: Int, durMs: Int): MediaRow =
    MediaRow(id, Pcm.encode(Pcm.synthSignal(srHz, durMs, 440.0, 0.0)),
      MediaMeta("audio", "pcm_s16le", srHz, 0, 0, 0))

  private def imageRow(id: String, w: Int, h: Int): MediaRow =
    MediaRow(id, Array.tabulate[Byte](w * h)(i => (i % 251).toByte),
      MediaMeta("image", "stub", 0, w, h, 1))

  private def videoRow(id: String, frames: Int, bytesPerFrame: Int): MediaRow =
    MediaRow(id, Array.tabulate[Byte](frames * bytesPerFrame)(i => (i % 17).toByte),
      MediaMeta("video", "stub", 0, 8, 8, frames))

  private def mediaDf(rows: MediaRow*) = {
    val s = spark
    import s.implicits._
    s.createDataset(rows).toDF().repartition(3)
  }

  test("extractFeatures: schema, 1:1 rows, real audio decode, stubbed image") {
    val df = mediaDf(
      audioRow("a1", 16000, 250), audioRow("a2", 8000, 500),
      imageRow("i1", 32, 32), videoRow("v1", 20, 100),
      MediaRow("bad", null, MediaMeta("audio", "pcm_s16le", 16000, 0, 0, 0)))
    val out = Multimodal.extractFeatures(df, "media_id", "bytes", "meta", batchSize = 2)
    assert(out.schema === Multimodal.featureSchema)
    val rows = out.collect().map(r => r.getString(0) ->
      (r.getString(1), r.getInt(2), r.getSeq[Float](3))).toMap
    assert(rows.size === 5)
    // audio: REAL decode — sample count = sr*dur/1000
    assert(rows("a1")._2 === 16000 * 250 / 1000)
    assert(rows("a2")._2 === 8000 * 500 / 1000)
    // feature vector is fixed-dim and non-trivial for real audio
    assert(rows("a1")._3.length === Multimodal.featureDim)
    assert(rows("a1")._3.exists(_ != 0.0f))
    // image/video go through the stub decode (capped at 4096 "pixels")
    assert(rows("i1")._2 === 32 * 32)
    assert(rows("v1")._2 === 64)
    // null payload: zero samples, zero vector, no crash
    assert(rows("bad")._2 === 0)
    assert(rows("bad")._3.forall(_ === 0.0f))
  }

  /** Hand-assembled 24-bit bottom-up BMP (BITMAPINFOHEADER, BI_RGB) with
    * the real 4-byte row-stride padding — a genuine on-disk fixture, not a
    * mock of the decoder's internals.
    */
  private def bmp24(width: Int, height: Int, rgbTopDown: Seq[(Int, Int, Int)]): Array[Byte] = {
    val stride = ((24 * width + 31) / 32) * 4
    val out = new Array[Byte](54 + stride * height)
    def w16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def w32(off: Int, v: Int): Unit = { w16(off, v & 0xFFFF); w16(off + 2, v >>> 16) }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    w32(2, out.length); w32(10, 54); w32(14, 40)
    w32(18, width); w32(22, height) // positive height => bottom-up rows
    w16(26, 1); w16(28, 24); w32(30, 0)
    for (y <- 0 until height; x <- 0 until width) {
      val (r, g, b) = rgbTopDown(y * width + x)
      val o = 54 + (height - 1 - y) * stride + x * 3
      out(o) = b.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
    }
    out
  }

  test("decodeBmp: real 24-bit BMP decodes byte-for-byte, malformed rejected") {
    val px = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255),
      (255, 255, 255), (0, 0, 0), (128, 64, 32))
    val bytes = bmp24(3, 2, px)
    val expected = px.map { case (r, g, b) =>
      ((0.299 * r + 0.587 * g + 0.114 * b) / 255.0).toFloat }
    assert(Multimodal.isBmp(bytes))
    assert(Multimodal.decodeBmp(bytes).map(_.toSeq).contains(expected))
    // truncated payload and compressed flag are findings, not crashes
    assert(Multimodal.decodeBmp(bytes.take(40)) === None)
    val compressed = bytes.clone(); compressed(30) = 1 // BI_RLE8
    assert(Multimodal.decodeBmp(compressed) === None)
    // a data offset pointing past the payload must not read out of bounds
    val badOff = bytes.clone(); badOff(10) = 0xFF.toByte; badOff(11) = 0x7F.toByte
    assert(Multimodal.decodeBmp(badOff) === None)
    // adversarial geometry must return None, never throw:
    // height = Int.MinValue (math.abs stays negative in Int arithmetic)
    val minHeight = bytes.clone()
    minHeight(22) = 0; minHeight(23) = 0; minHeight(24) = 0; minHeight(25) = 0x80.toByte
    assert(Multimodal.decodeBmp(minHeight) === None)
    // width = 2^26 with 32bpp: bpp*width overflows Int to a negative stride
    val wideOverflow = bytes.clone()
    wideOverflow(18) = 0; wideOverflow(19) = 0; wideOverflow(20) = 0
    wideOverflow(21) = 0x04 // width = 0x04000000 = 2^26
    wideOverflow(22) = 1; wideOverflow(23) = 0; wideOverflow(24) = 0; wideOverflow(25) = 0
    wideOverflow(28) = 32; wideOverflow(29) = 0
    assert(Multimodal.decodeBmp(wideOverflow) === None)
  }

  test("extractFeatures routes BMP image payloads through the real decoder") {
    val px = (0 until 12).map(i => (i * 20 % 256, i * 7 % 256, i * 3 % 256))
    // meta deliberately claims 2x2: the stub would emit min(2*2, 4096) = 4
    // samples; only the REAL decoder reads the true 4x3 dims from the header
    val row = MediaRow("bmp1", bmp24(4, 3, px), MediaMeta("image", "bmp", 0, 2, 2, 1))
    val out = Multimodal.extractFeatures(mediaDf(row), "media_id", "bytes", "meta")
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(out("bmp1") === 12)
  }

  test("extractFeatures: null width/height in meta never fails the task") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // external parquet can carry nullable struct fields the case-class
    // encoder never produces — Row.getInt on them would NPE without guards
    val schema = StructType(Seq(
      StructField("media_id", StringType),
      StructField("bytes", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("kind", StringType),
        StructField("codec", StringType),
        StructField("sr_hz", IntegerType),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("n_frames", IntegerType))))))
    val rows = Seq(
      Row("x1", Array.tabulate[Byte](64)(_.toByte), Row("image", "stub", 0, null, null, 1)),
      Row("x2", Array.tabulate[Byte](64)(_.toByte), Row("video", "stub", 0, 4, null, 2)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val out = Multimodal.extractFeatures(df, "media_id", "bytes", "meta")
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(out("x1") === 1) // null dims default to 1x1
    assert(out("x2") === 4) // 4 x 1
  }

  test("extractFeatures is deterministic across runs and partitionings") {
    val rows = Seq(audioRow("a1", 16000, 300), imageRow("i1", 16, 16))
    val out1 = Multimodal.extractFeatures(mediaDf(rows: _*).repartition(1),
      "media_id", "bytes", "meta").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](3)).toMap
    val out2 = Multimodal.extractFeatures(mediaDf(rows: _*).repartition(4),
      "media_id", "bytes", "meta").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](3)).toMap
    assert(out1 === out2)
  }

  test("sampleFrames: every k-th frame as bounded binary slices, codegen path") {
    val df = mediaDf(videoRow("v1", 30, 50), audioRow("a1", 16000, 100))
    val out = Multimodal.sampleFrames(df, "media_id", "bytes", "meta", every = 10)
    val rows = out.collect()
    // only the video row contributes; frames 0, 10, 20
    assert(rows.map(_.getString(0)).distinct.toSeq === Seq("v1"))
    assert(rows.map(_.getInt(1)).sorted.toSeq === Seq(0, 10, 20))
    // each sampled frame is exactly one frame-length slice
    assert(rows.forall(_.getAs[Array[Byte]]("frame_bytes").length === 50))
    // no UDF in the plan — stays in the codegen'd Column path
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("udf"))
  }
}
