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
