package graft

import org.apache.spark.sql.functions._
import graft.ingest.Ingest
import graft.runner.{ResultStore, ValidationSession}
import graft.synth.Synth

class IngestSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-ingest").toString

  test("staging scan filters run, status, endpoint (S3 semantics)") {
    val s = spark
    import s.implicits._
    val stg = Ingest.synthStaging(s, "run1", 3, 10)
      .unionByName(Ingest.synthStaging(s, "run2", 2, 10))
      .unionByName(Seq((99L, "clips/batch/99", "run1", 500,
        """{"batch":"p0099","clips":[]}""",
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
        .toDF("id", "endpoint", "run_id", "http_status", "payload_json", "load_dttm"))
    val scanned = Ingest.stagingScan(stg, "run1")
    assert(scanned.count() === 3) // run2 and the 500-status row excluded
  }

  test("parse: explode + cast + NULLIF semantics + first-writer-wins dedupe") {
    val stg = Ingest.synthStaging(spark, "run1", 2, 25, badRows = true)
    val clips = Ingest.parseClips(Ingest.stagingScan(stg, "run1"))
    assert(clips.count() === 50)
    // corrupt sr_hz text "abc" → null after cast (corrupt_id detection path)
    val bad = clips.filter(col("sr_hz").isNull).collect()
    assert(bad.length === 1)
    assert(bad(0).getAs[String]("clip_id") === "clip_000000000000")
    // the null then FAILS the sr_hz_domain check downstream
    val outcome = graft.checks.CheckCompiler.run(clips,
      graft.checks.AudioChecks.defaults.filter(_.name == "sr_hz_domain"))
    assert(outcome.head.status === "FAIL" && outcome.head.rowsFailed === 1)
  }

  test("idempotent append: re-running a load writes zero new rows (T8)") {
    val dir = tmp() + "/clips_silver"
    val stg = Ingest.synthStaging(spark, "run1", 2, 20)
    val clips = Ingest.parseClips(Ingest.stagingScan(stg, "run1"))
    val first = Ingest.idempotentAppend(spark, clips, dir, Seq("run_id", "clip_id"))
    assert(first === 40)
    val second = Ingest.idempotentAppend(spark, clips, dir, Seq("run_id", "clip_id"))
    assert(second === 0)
    assert(spark.read.parquet(dir).count() === 40)
    // a new run's rows do append
    val stg2 = Ingest.synthStaging(spark, "run2", 1, 5)
    val third = Ingest.idempotentAppend(spark,
      Ingest.parseClips(Ingest.stagingScan(stg2, "run2")), dir, Seq("run_id", "clip_id"))
    assert(third === 5)
    assert(spark.read.parquet(dir).count() === 45)
  }

  test("ingestion checks: bad status and missing payload key flagged (V1/V2)") {
    val s = spark
    import s.implicits._
    val stg = Ingest.synthStaging(s, "run1", 2, 5)
      .unionByName(Seq(
        (90L, "clips/batch/90", "run1", 503, """{"batch":"p0090","clips":[]}""",
          java.sql.Timestamp.valueOf("2026-01-01 00:00:00")),
        (91L, "clips/batch/91", "run1", 200, """{"batch":"p0091"}""",
          java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
        .toDF("id", "endpoint", "run_id", "http_status", "payload_json", "load_dttm"))
    val outcomes = graft.checks.CheckCompiler.run(stg, Ingest.ingestionChecks)
      .map(o => o.checkName -> o.rowsFailed).toMap
    assert(outcomes("api_http_status_ok") === 1L)
    assert(outcomes("api_payload_shape_ok") === 1L)
  }

  test("ResultStore persists validation_run / check_result / audit rows") {
    val dir = tmp() + "/results"
    val store = new ResultStore(spark, dir)
    val ref = Synth.clipsRef(spark, 2, 100, maxAudioMs = 300)
    val report = new ValidationSession(spark)
      .run(ref.toDF(), Synth.dimCodec(spark).toDF(), Some(ref.toDF()))
    store.audit("run1", "all", "STARTED", "clips", 200L, "", 1000L)
    store.writeReport("run1", "all", report, 2000L)
    store.audit("run1", "all", "ENDED", "clips", 200L, "ok", 3000L)

    val runs = store.validationRuns().collect()
    assert(runs.map(_.suite).toSet ===
      Set("predicate", "uniqueness", "referential", "reconciliation", "rowinvariant", "drift"))
    assert(runs.forall(_.status == "SUCCESS"))
    // resource snapshot recorded per run (resource_metrics.py analogue)
    assert(runs.forall(r => r.rss_kb > 0L && r.cpu_ms >= 0L))
    val checks = store.checkResults().collect()
    assert(checks.length === report.outcomes.size)
    assert(checks.forall(_.rows_failed == 0L))
    assert(store.audits().collect().map(_.event).sorted.toSeq === Seq("ENDED", "STARTED"))

    // S5 report sinks: summary CSV with avg/stddev rollup + per-check JSON
    val csvDir = dir + "/summary_csv"
    store.writeSummaryCsv(csvDir)
    val csv = spark.read.option("header", "true").csv(csvDir)
    assert(csv.columns.toSet === Set("suite", "runs", "checks_total", "checks_failed",
      "avg_duration_ms", "std_duration_ms", "first_finished_at", "last_finished_at"))
    assert(csv.count() === 6) // one rollup row per suite
    val jsonPath = dir + "/report.json"
    store.writeReportJson("run1", report, jsonPath)
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(jsonPath))
    assert(txt.contains("\"run_id\":\"run1\"") && txt.contains("\"check\":\"pcm_allclose\""))
    // well-formed JSON: Spark can parse it back
    val s2 = spark; import s2.implicits._
    val parsed = spark.read.json(Seq(txt).toDS())
    assert(parsed.select(org.apache.spark.sql.functions.explode(
      org.apache.spark.sql.functions.col("checks"))).count() === report.outcomes.size)

    // HTML report (report.py:709-721 analogue)
    val htmlPath = dir + "/report.html"
    store.writeReportHtml("run1", report, htmlPath)
    val html = java.nio.file.Files.readString(java.nio.file.Paths.get(htmlPath))
    assert(html.contains("Validation run run1") && html.contains("pcm_allclose"))
    assert(html.contains("SUCCESS"))

    // schema evolution: files written before a column existed still read
    // (missing numeric columns surface as 0, not a resolution failure)
    store.validationRuns().toDF()
      .drop("cpu_ms", "rss_kb")
      .limit(1)
      .withColumn("suite", org.apache.spark.sql.functions.lit("legacy"))
      .write.mode("append").parquet(dir + "/validation_run")
    val evolved = store.validationRuns().collect()
    val legacy = evolved.find(_.suite == "legacy").get
    assert(legacy.cpu_ms === 0L && legacy.rss_kb === 0L)
    assert(evolved.length === runs.length + 1)
  }

  test("manifest records load volumes; latest payload picked per endpoint (S2/S4)") {
    val stg = Ingest.synthStaging(spark, "run1", 3, 10)
    val clips = Ingest.parseClips(Ingest.stagingScan(stg, "run1"))
    val m = Ingest.manifest(clips, "run1", "clips").head()
    assert(m.getAs[Long]("n_rows") === 30)
    assert(m.getAs[Long]("n_parts") === 3)
    assert(m.getAs[String]("run_id") === "run1")
    // latest per endpoint: duplicate one endpoint with a higher id
    val s = spark; import s.implicits._
    val dup = Seq((999L, "clips/batch/0", "run1", 200,
      """{"batch":"p0000","clips":[]}""",
      java.sql.Timestamp.valueOf("2026-01-02 00:00:00")))
      .toDF("id", "endpoint", "run_id", "http_status", "payload_json", "load_dttm")
    val latest = Ingest.latestPayloads(stg.unionByName(dup))
    assert(latest.count() === 3) // one row per endpoint
    assert(latest.filter(col("endpoint") === "clips/batch/0")
      .head().getAs[Long]("id") === 999L)
  }
}
