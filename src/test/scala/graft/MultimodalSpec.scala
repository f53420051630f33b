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

  /** Hand-assembled PNG fixture: forward-filters the given top-down pixel
    * rows with the per-row filter types, deflates the scanlines, and wraps
    * IHDR/IDAT/IEND chunks with real CRCs — a genuine on-disk PNG, not a
    * mock of the decoder's internals. `channels`: 1 gray, 2 gray+alpha,
    * 3 RGB, 4 RGBA.
    */
  private def png(width: Int, height: Int, channels: Int,
                  samplesTopDown: Seq[Int], filters: Seq[Int]): Array[Byte] = {
    require(samplesTopDown.length == width * height * channels)
    require(filters.length == height)
    val colorType = channels match { case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6 }
    val stride = width * channels
    val bpp = channels
    // forward-filter each scanline (the inverse of what the decoder undoes)
    val raw = new Array[Byte]((stride + 1) * height)
    val px = samplesTopDown.map(_.toByte).toArray
    def at(y: Int, i: Int): Int = if (y < 0 || i < 0) 0 else px(y * stride + i) & 0xFF
    for (y <- 0 until height) {
      raw(y * (stride + 1)) = filters(y).toByte
      for (i <- 0 until stride) {
        val x = at(y, i)
        val a = if (i >= bpp) at(y, i - bpp) else 0
        val b = at(y - 1, i)
        val c = if (i >= bpp) at(y - 1, i - bpp) else 0
        val f = filters(y) match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            x - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(y * (stride + 1) + 1 + i) = f.toByte
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zBuf = new Array[Byte](raw.length + 64)
    val zLen = deflater.deflate(zBuf); deflater.end()
    def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def be32(v: Long): Array[Byte] = Array(
        ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      out.write(be32(data.length.toLong))
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue))
      out.toByteArray
    }
    val ihdr = new Array[Byte](13)
    def w32be(off: Int, v: Int): Unit = {
      ihdr(off) = (v >>> 24).toByte; ihdr(off + 1) = (v >>> 16).toByte
      ihdr(off + 2) = (v >>> 8).toByte; ihdr(off + 3) = v.toByte
    }
    w32be(0, width); w32be(4, height)
    ihdr(8) = 8; ihdr(9) = colorType.toByte; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", zBuf.take(zLen)) ++
      chunk("IEND", Array.empty[Byte])
  }

  private def luma(r: Int, g: Int, b: Int): Float =
    ((0.299 * r + 0.587 * g + 0.114 * b) / 255.0).toFloat

  test("decodePng: 8-bit RGB with Sub/Up/Paeth filters decodes byte-for-byte") {
    val px = Seq( // 3x3 RGB, top-down
      (255, 0, 0), (0, 255, 0), (0, 0, 255),
      (10, 20, 30), (40, 50, 60), (70, 80, 90),
      (200, 150, 100), (90, 91, 92), (1, 2, 3))
    val bytes = png(3, 3, 3, px.flatMap { case (r, g, b) => Seq(r, g, b) },
      filters = Seq(1, 2, 4)) // Sub, Up, Paeth
    assert(Multimodal.isPng(bytes))
    val expected = px.map { case (r, g, b) => luma(r, g, b) }
    assert(Multimodal.decodePng(bytes).map(_.toSeq).contains(expected))
  }

  test("decodePng: gray with None/Average filters; RGBA alpha ignored") {
    val gray = Seq(0, 64, 128, 255, 17, 230, 90, 180)
    val gBytes = png(4, 2, 1, gray, filters = Seq(0, 3)) // None, Average
    assert(Multimodal.decodePng(gBytes).map(_.toSeq)
      .contains(gray.map(v => (v / 255.0).toFloat)))
    val rgba = Seq(100, 150, 200, 7, 30, 60, 90, 255) // 2x1 RGBA
    val aBytes = png(2, 1, 4, rgba, filters = Seq(1))
    assert(Multimodal.decodePng(aBytes).map(_.toSeq)
      .contains(Seq(luma(100, 150, 200), luma(30, 60, 90))))
  }

  test("decodePng: malformed payloads are findings, never crashes") {
    val good = png(3, 2, 3, (0 until 18).map(i => i * 13 % 256), filters = Seq(0, 1))
    assert(Multimodal.decodePng(good).isDefined)
    // truncated mid-IDAT
    assert(Multimodal.decodePng(good.take(good.length - 20)) === None)
    // corrupt one IDAT byte: the chunk CRC must reject it
    val flipped = good.clone(); flipped(8 + 25 + 12) = (flipped(8 + 25 + 12) ^ 0x5A).toByte
    assert(Multimodal.decodePng(flipped) === None)
    // interlaced flag (Adam7 out of scope) — recompute the IHDR CRC so the
    // INTERLACE check is what rejects it, not the CRC
    val interlaced = good.clone()
    interlaced(8 + 8 + 12) = 1
    val crc = new java.util.zip.CRC32()
    crc.update(interlaced, 12, 4 + 13)
    val cv = crc.getValue
    interlaced(8 + 8 + 13) = (cv >>> 24).toByte
    interlaced(8 + 8 + 14) = (cv >>> 16).toByte
    interlaced(8 + 8 + 15) = (cv >>> 8).toByte
    interlaced(8 + 8 + 16) = cv.toByte
    assert(Multimodal.decodePng(interlaced) === None)
    // declared geometry larger than the zlib stream delivers
    val short = png(3, 2, 3, (0 until 18).map(_ => 7), filters = Seq(0, 0))
    val tall = short.clone()
    tall(8 + 8 + 7) = 3 // height 2 -> 3 (byte 4..7 of IHDR data = height)
    val crc2 = new java.util.zip.CRC32()
    crc2.update(tall, 12, 4 + 13)
    val cv2 = crc2.getValue
    tall(8 + 8 + 13) = (cv2 >>> 24).toByte
    tall(8 + 8 + 14) = (cv2 >>> 16).toByte
    tall(8 + 8 + 15) = (cv2 >>> 8).toByte
    tall(8 + 8 + 16) = cv2.toByte
    assert(Multimodal.decodePng(tall) === None)
    // signature + CRC-valid ancillary chunk + IEND but NO IHDR: geometry
    // never set — must be None, not a zero-pixel "success"
    val sig = good.take(8)
    def chunk2(ctype: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(((data.length >> 24) & 0xFF).toByte, ((data.length >> 16) & 0xFF).toByte,
        ((data.length >> 8) & 0xFF).toByte, (data.length & 0xFF).toByte))
      val tb = ctype.getBytes("US-ASCII"); out.write(tb); out.write(data)
      val c = new java.util.zip.CRC32(); c.update(tb); c.update(data)
      val v = c.getValue
      out.write(Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
      out.toByteArray
    }
    val headless = sig ++ chunk2("tEXt", "k v-padding-to-size".getBytes("US-ASCII")) ++
      chunk2("IEND", Array.empty[Byte])
    assert(Multimodal.decodePng(headless) === None)
    // hostile geometry: 2^21 x 2^21 = 2^42 pixels >> the 2^24 cap — must
    // refuse BEFORE allocating the inflate buffer
    val bomb = good.clone()
    bomb(8 + 8 + 1) = 0x20; bomb(8 + 8 + 2) = 0; bomb(8 + 8 + 3) = 0 // width 2^21
    bomb(8 + 8 + 5) = 0x20; bomb(8 + 8 + 6) = 0; bomb(8 + 8 + 7) = 0 // height 2^21
    val crc3 = new java.util.zip.CRC32()
    crc3.update(bomb, 12, 4 + 13)
    val cv3 = crc3.getValue
    bomb(8 + 8 + 13) = (cv3 >>> 24).toByte
    bomb(8 + 8 + 14) = (cv3 >>> 16).toByte
    bomb(8 + 8 + 15) = (cv3 >>> 8).toByte
    bomb(8 + 8 + 16) = cv3.toByte
    assert(Multimodal.decodePng(bomb) === None)
    // zlib stream truncated EXACTLY at the geometry boundary: every pixel
    // byte inflates but the final-block terminator / Adler-32 never
    // arrives, so the inflater never reads `finished` — must be rejected
    // (round-6 ADVICE; the pre-fix decoder accepted it)
    val idatLen = ((good(8 + 25) & 0xFF) << 24) | ((good(8 + 25 + 1) & 0xFF) << 16) |
      ((good(8 + 25 + 2) & 0xFF) << 8) | (good(8 + 25 + 3) & 0xFF)
    val zdata = good.slice(8 + 25 + 8, 8 + 25 + 8 + idatLen)
    val ihdrData = good.slice(16, 29)
    val noTrailer = sig ++ chunk2("IHDR", ihdrData) ++
      chunk2("IDAT", zdata.dropRight(4)) ++ chunk2("IEND", Array.empty[Byte])
    assert(Multimodal.decodePng(noTrailer) === None)
  }

  test("extractFeatures routes PNG image payloads through the real decoder") {
    val samples = (0 until 4 * 3 * 3).map(i => i * 11 % 256)
    // meta claims 2x2 — the stub would emit 4 samples; only the REAL
    // decoder reads the true 4x3 geometry from IHDR
    val row = MediaRow("png1", png(4, 3, 3, samples, filters = Seq(0, 2, 4)),
      MediaMeta("image", "png", 0, 2, 2, 1))
    val out = Multimodal.extractFeatures(mediaDf(row), "media_id", "bytes", "meta")
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(out("png1") === 12)
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
