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

  test("disabling EVERY predicate check drops the suite instead of crashing") {
    val ec = EngineConfig.parse(spark,
      """{"suites": [{"suite": "predicate", "checks": [""" +
        graft.checks.AudioChecks.defaults
          .map(c => s"""{"name": "${c.name}", "enabled": false}""").mkString(",") +
        """]}]}""")
    val ref = Synth.clipsRef(spark, 1, 30, maxAudioMs = 200).toDF()
    val report = new ValidationSession(spark, ValidationConfig(engineConfig = ec))
      .run(ref, Synth.dimCodec(spark).toDF())
    assert(!report.suites.map(_.suite).contains("predicate"))
    assert(report.status === "SUCCESS")
  }

  test("a suite that throws records ERROR and the other suites still run") {
    import org.apache.spark.sql.functions.{col, udf}
    val boom = udf { (_: String) =>
      throw new IllegalStateException("storage gone"); "x" }
    val ref = Synth.clipsRef(spark, 1, 30, maxAudioMs = 200).toDF()
    // a dimension whose evaluation fails → the referential suite errors
    val badDim = Synth.dimCodec(spark).toDF().withColumn("codec", boom(col("codec")))
    val report = new ValidationSession(spark).run(ref, badDim, Some(ref))
    val byName = report.outcomes.map(o => o.checkName -> o).toMap
    assert(byName("codec_fk").status === "ERROR")
    assert(byName("codec_fk").message.exists(_.contains("suite error")))
    // every other suite still produced real outcomes
    assert(byName("clip_id_uniqueness").status === "PASS")
    assert(byName("pcm_allclose").status === "PASS")
    assert(report.status === "FAILED") // ERROR fails the run, like FAIL
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
