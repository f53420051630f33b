package graft

import org.apache.spark.sql.functions._
import graft.ingest.Ingest

/** The two hardest reference load shapes:
  * T7 double explode (standings[] × table[], load_dds.py:150-176) and
  * T4 dual-source union with first-writer-wins dedupe (load_dds.py:76-108).
  */
class IngestShapesSpec extends SparkSpec {

  private def stagingRow(id: Long, endpoint: String, payload: String) =
    (id, endpoint, "run1", 200, payload,
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))

  test("T7: double explode carries header fields, casts leaves, dedupes") {
    val s = spark; import s.implicits._
    val payload =
      """{"batch":"p0000","clips":[
        |{"clip_id":"c1","segments":[{"seg_idx":"0","dur_ms":"100"},{"seg_idx":"1","dur_ms":"200"}]},
        |{"clip_id":"c2","segments":[{"seg_idx":"0","dur_ms":""},{"seg_idx":"bad","dur_ms":"50"}]}
        |]}""".stripMargin.replaceAll("\n", "")
    val stg = Seq(stagingRow(0L, "clips/batch/0", payload))
      .toDF("id", "endpoint", "run_id", "http_status", "payload_json", "load_dttm")
    val segs = Ingest.parseClipSegments(stg).orderBy("clip_id", "seg_idx")
    val rows = segs.collect()
    assert(rows.length === 4)
    // header fields present on every inner element
    assert(rows.forall(_.getAs[String]("part_id") == "p0000"))
    // NULLIF('')::int and failed-cast → null (corrupt path survives load)
    val c2 = rows.filter(_.getAs[String]("clip_id") == "c2")
    assert(c2.exists(r => r.getAs[Integer]("seg_idx") == 0 && r.isNullAt(r.fieldIndex("dur_ms"))))
    assert(c2.exists(r => r.isNullAt(r.fieldIndex("seg_idx")) && r.getAs[Integer]("dur_ms") == 50))
  }

  test("T7: multiple corrupt segments (null seg_idx) all survive the load") {
    val s = spark; import s.implicits._
    // three segments whose seg_idx all cast to null — SQL unique-index
    // semantics treat nulls as DISTINCT (ON CONFLICT never fires), so all
    // three must survive for the validation layer to count; a plain
    // dropDuplicates would collapse them to one
    val payload =
      """{"batch":"p0000","clips":[
        |{"clip_id":"c1","segments":[{"seg_idx":"","dur_ms":"10"},{"seg_idx":"bad","dur_ms":"20"},{"seg_idx":"x1","dur_ms":"30"},{"seg_idx":"0","dur_ms":"40"},{"seg_idx":"0","dur_ms":"99"}]}
        |]}""".stripMargin.replaceAll("\n", "")
    val stg = Seq(stagingRow(0L, "clips/batch/0", payload))
      .toDF("id", "endpoint", "run_id", "http_status", "payload_json", "load_dttm")
    val rows = Ingest.parseClipSegments(stg).collect()
    // 3 corrupt (null idx) + 1 deduped valid idx=0
    assert(rows.length === 4)
    assert(rows.count(_.isNullAt(rows.head.fieldIndex("seg_idx"))) === 3)
    // deterministic first-writer-wins among the duplicate idx=0 rows:
    // the earlier array position (dur_ms=40) survives, never 99
    val kept = rows.filter(r => !r.isNullAt(r.fieldIndex("seg_idx")))
    assert(kept.length === 1 && kept.head.getAs[Integer]("dur_ms") === 40)
  }

  test("T8: null clip_ids are exempt from dedupe — every corrupt row survives") {
    val s = spark; import s.implicits._
    // two clips with null clip_id in one run: a unique index treats nulls
    // as distinct, so BOTH must load (the clip_id_not_null check counts 2)
    val payload =
      """{"batch":"p0000","clips":[
        |{"clip_id":null,"sr_hz":"16000","dur_ms":"100","codec":"opus","transcript":"a"},
        |{"clip_id":null,"sr_hz":"16000","dur_ms":"200","codec":"opus","transcript":"b"},
        |{"clip_id":"ok","sr_hz":"16000","dur_ms":"300","codec":"opus","transcript":"c"}
        |]}""".stripMargin.replaceAll("\n", "")
    val stg = Seq(stagingRow(0L, "clips/batch/0", payload))
      .toDF("id", "endpoint", "run_id", "http_status", "payload_json", "load_dttm")
    val rows = Ingest.parseClips(stg).collect()
    assert(rows.length === 3)
    assert(rows.count(_.isNullAt(rows.head.fieldIndex("clip_id"))) === 2)
  }

  test("T8: first-writer-wins is deterministic — earliest (id, position) survives") {
    val s = spark; import s.implicits._
    // same clip_id three times across two staging rows with different
    // codecs: the survivor must be the first by (staging id, array pos),
    // exactly like the reference's insert order + ON CONFLICT DO NOTHING
    def payload(codecs: Seq[String]) = {
      val clips = codecs.map(c =>
        s"""{"clip_id":"dup","sr_hz":"16000","dur_ms":"300","codec":"$c","transcript":"t"}""")
        .mkString(",")
      s"""{"batch":"p0000","clips":[$clips]}"""
    }
    val stg = Seq(
      stagingRow(7L, "clips/batch/1", payload(Seq("flac", "mp3"))),
      stagingRow(3L, "clips/batch/0", payload(Seq("opus"))))
      .toDF("id", "endpoint", "run_id", "http_status", "payload_json", "load_dttm")
    val rows = Ingest.parseClips(stg).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("codec") === "opus") // lowest staging id wins
  }

  test("T4: dual-source union — primary endpoint wins on key overlap") {
    val s = spark; import s.implicits._
    def payload(codec: String, ids: Seq[String]) = {
      val clips = ids.map(i =>
        s"""{"clip_id":"$i","sr_hz":"16000","dur_ms":"300","codec":"$codec","transcript":"t $i"}""")
        .mkString(",")
      s"""{"batch":"p0000","clips":[$clips]}"""
    }
    val stg = Seq(
      stagingRow(0L, "clips/batch/0", payload("opus", Seq("a", "b"))),
      stagingRow(1L, "reprocess/batch/0", payload("flac", Seq("b", "c"))),
      // 5xx reprocess row must be ignored entirely
      (2L, "reprocess/batch/1", "run1", 503, payload("mp3", Seq("d")),
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .toDF("id", "endpoint", "run_id", "http_status", "payload_json", "load_dttm")
    val loaded = Ingest.parseClipsDual(stg).orderBy("clip_id").collect()
    assert(loaded.map(_.getAs[String]("clip_id")).toSeq === Seq("a", "b", "c"))
    val byId = loaded.map(r => r.getAs[String]("clip_id") -> r.getAs[String]("codec")).toMap
    assert(byId("a") === "opus")
    assert(byId("b") === "opus") // overlap: first source (clips/) wins
    assert(byId("c") === "flac") // only in the secondary source
  }
}
