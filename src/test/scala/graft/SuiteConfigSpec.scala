package graft

import graft.runner.{EngineConfig, ValidationConfig, ValidationSession}
import graft.synth.Synth

/** Config-driven registry semantics (reference YAML configs +
  * validators/runner.py:50-91,175-176): suite enable/disable, per-check
  * enable, and the runtime severity downgrade.
  */
class SuiteConfigSpec extends SparkSpec {

  private val cfgJson =
    """{"suites": [
      |  {"suite": "drift", "enabled": false},
      |  {"suite": "predicate", "enabled": true, "checks": [
      |    {"name": "clip_id_format", "enabled": false},
      |    {"name": "sr_hz_domain", "severity": "warning"}
      |  ]}
      |]}""".stripMargin

  test("parse: suite toggles, check toggles, severity overrides") {
    val ec = EngineConfig.parse(spark, cfgJson)
    assert(!ec.suiteEnabled("drift"))
    assert(ec.suiteEnabled("predicate"))
    assert(ec.suiteEnabled("uniqueness")) // unmentioned → enabled
    assert(!ec.checkEnabled("clip_id_format"))
    assert(ec.checkEnabled("sr_hz_domain"))
  }

  test("malformed config ABORTS instead of silently running all-defaults") {
    // a typo'd file must never degrade to everything-enabled
    intercept[Exception] {
      EngineConfig.parse(spark, """{"suites": [ {"suite": "drift", ]}""")
    }
    intercept[Exception] { EngineConfig.parse(spark, """{"sutes": []}""") }
    ()
  }

  test("disabled suite is skipped; disabled check leaves the catalog") {
    val ec = EngineConfig.parse(spark, cfgJson)
    val ref = Synth.clipsRef(spark, 2, 60, maxAudioMs = 200).toDF()
    val report = new ValidationSession(spark,
      ValidationConfig(engineConfig = ec))
      .run(ref, Synth.dimCodec(spark).toDF(), Some(ref))
    assert(!report.suites.map(_.suite).contains("drift"))
    val names = report.outcomes.map(_.checkName)
    assert(!names.contains("clip_id_format"))
    assert(names.contains("sr_hz_domain"))
  }

  test("severity downgrade: configured warning turns FAIL into WARN (runner.py:175-176)") {
    val s = spark; import s.implicits._
    val ec = EngineConfig.parse(spark, cfgJson)
    // null one row's sr_hz → ONLY sr_hz_domain is violated (a wrong nonzero
    // value would also trip bytes_length_consistent, which stays error)
    val ref = Synth.clipsRef(spark, 1, 50, maxAudioMs = 200).toDF()
    val broken = ref.withColumn("sr_hz",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("clip_id") === "clip_000000000000",
        org.apache.spark.sql.functions.lit(null))
        .otherwise(org.apache.spark.sql.functions.col("sr_hz")))
    val session = new ValidationSession(spark, ValidationConfig(engineConfig = ec))
    val report = session.run(broken, Synth.dimCodec(spark).toDF())
    val srOutcome = report.outcomes.find(_.checkName == "sr_hz_domain").get
    assert(srOutcome.rowsFailed === 1)
    assert(srOutcome.status === "WARN") // downgraded, not FAIL
    assert(report.status === "SUCCESS") // warnings don't fail the run
    // without the override the same table FAILs
    val strict = new ValidationSession(spark, ValidationConfig())
      .run(broken, Synth.dimCodec(spark).toDF())
    assert(strict.outcomes.find(_.checkName == "sr_hz_domain").get.status === "FAIL")
    assert(strict.status === "FAILED")
  }

  test("fused path honors check enable + severity overrides") {
    val ec = EngineConfig.parse(spark, cfgJson)
    val ref = Synth.clipsRef(spark, 1, 50, maxAudioMs = 200).toDF()
    val report = new ValidationSession(spark,
      ValidationConfig(engineConfig = ec))
      .runFused(ref, Synth.dimCodec(spark).toDF(), ref)
    val names = report.outcomes.map(_.checkName)
    assert(!names.contains("clip_id_format"))
    assert(names.contains("sr_hz_domain"))
  }
}
