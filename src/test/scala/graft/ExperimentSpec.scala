package graft

import graft.experiment._
import graft.synth.Synth

/** Mutation-experiment orchestrator: config-driven iterations with encoded
  * expected verdicts, fail-fast on mismatch, FAILFAST config parsing —
  * mirroring the reference's experiment loop semantics
  * (`experiments/run.py:478-900`, `config/mutation_experiment.yml`).
  */
class ExperimentSpec extends SparkSpec {

  lazy val ref = Synth.clipsRef(spark, numParts = 4, rowsPerPart = 60,
    maxAudioMs = 400).cache()
  lazy val runner = new ExperimentRunner(spark, ref, Synth.dimCodec(spark).toDF())

  test("demo config reproduces the expected FAIL/SUCCESS sequence") {
    val res = runner.run(Experiment.demoConfig())
    assert(res.allMatched, res.iterations.mkString("\n"))
    assert(res.iterations.map(_.status) ==
      Seq("FAILED", "FAILED", "FAILED", "FAILED", "SUCCESS", "SUCCESS", "SUCCESS"))
    // stop_at records the first failing check of each failing iteration
    assert(res.iterations.head.stopAt.contains("clip_id_uniqueness"))
    assert(res.iterations(1).failedChecks.contains("codec_fk"))
    assert(res.iterations(2).failedChecks.contains("pcm_allclose"))
    // the disabled-checks twin of iteration 4 flips the verdict to SUCCESS
    assert(res.iterations(3).failedChecks.contains("dur_ms_range"))
    assert(res.iterations(4).failedChecks.isEmpty)
  }

  test("recording-chain-fault iterations: dc_offset_audio / hum_audio caught") {
    import graft.runner.ValidationConfig
    import graft.checks.{AudioChecks, AudioQuality}
    val humRunner = new ExperimentRunner(spark, ref,
      Synth.dimCodec(spark).toDF(),
      baseCfg = ValidationConfig(
        predicateChecks = AudioChecks.defaults ++ AudioQuality.humChecks()))
    val cfg = ExperimentConfig(
      name = "recording_chain_faults",
      iterations = Seq(
        IterationSpec("dc offset p0000 (expect FAIL on audio_no_dc_offset)",
          Seq(MutationSpec("dc_offset_audio", "p0000")), "FAILED",
          expectedFailedChecks = Seq("audio_no_dc_offset")),
        IterationSpec("mains hum p0001 (hum check is Warning; SNR FAILs)",
          Seq(MutationSpec("hum_audio", "p0001")), "FAILED",
          expectedFailedChecks = Seq("pcm_allclose"))))
    val res = humRunner.run(cfg)
    assert(res.allMatched, res.iterations.mkString("\n"))
  }

  test("HTML experiment report renders the iteration table with snapshot diffs") {
    val diffRunner = new ExperimentRunner(spark, ref,
      Synth.dimCodec(spark).toDF(), collectDiffs = true)
    val res = diffRunner.run(Experiment.demoConfig())
    assert(res.allMatched)
    val path = java.nio.file.Files.createTempDirectory("exp").toString + "/exp.html"
    Experiment.writeReportHtml(res, path)
    val html = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    assert(html.contains("ALL EXPECTATIONS MATCHED"))
    assert(html.contains("stop_at"))
    assert(html.contains("clip_id_uniqueness")) // iteration 1's stop_at
    assert(html.contains("changed"))            // codec/dur mutations diff rows
    assert(html.contains("MUTATED"))            // the mutated codec value itself
    // the clean-baseline iteration has no diff section
    val clean = res.iterations.last
    assert(clean.diffSample.isEmpty)
  }

  test("stop_on_mismatch skips remaining iterations after the first mismatch") {
    val cfg = ExperimentConfig("ff", Seq(
      IterationSpec("clean but expecting FAILED (deliberate mismatch)", Nil, "FAILED"),
      IterationSpec("skipped by fail-fast",
        Seq(MutationSpec("duplicate_first", "p0000")), "FAILED")),
      stopOnMismatch = true)
    val res = runner.run(cfg)
    assert(!res.allMatched)
    assert(res.iterations(0).status == "SUCCESS" && !res.iterations(0).matchedExpectation)
    assert(res.iterations(1).status == "SKIPPED")
    assert(res.firstMismatch.map(_.iterationNo).contains(1))
  }

  test("JSON config parses FAILFAST; unknown mutation kind aborts loudly") {
    val json = """{"name":"j","stop_on_mismatch":true,"iterations":[
      {"name":"a","expected_status":"FAILED",
       "expected_failed_checks":["codec_fk"],
       "mutations":[{"kind":"unknown_codec","part_id":"p0000"}]}]}"""
      .replaceAll("\n\\s*", "")
    val cfg = ExperimentConfigIO.parse(spark, json)
    assert(cfg.name == "j" && cfg.stopOnMismatch)
    assert(cfg.iterations.head.mutations.head.kind == "unknown_codec")
    assert(cfg.iterations.head.expectedFailedChecks == Seq("codec_fk"))
    // no iterations array → refuse
    intercept[Exception](ExperimentConfigIO.parse(spark, """{"name":"x"}"""))
    // bad expected_status → refuse at construction
    intercept[IllegalArgumentException](
      ExperimentConfig("b", Seq(IterationSpec("i", Nil, "MAYBE"))))
    // unknown mutation kind → refuse at application, naming the catalog
    val ex = intercept[IllegalArgumentException](runner.run(ExperimentConfig("bad",
      Seq(IterationSpec("u", Seq(MutationSpec("nope", "p0000")), "FAILED")))))
    assert(ex.getMessage.contains("unknown mutation kind"))
  }
}
