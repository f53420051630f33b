package graft.experiment

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.model.AudioClip
import graft.runner.{CheckConfig, EngineConfig, SuiteToggle, ValidationConfig, ValidationSession}
import graft.synth.{Mutations, Synth}

/** Mutation-experiment orchestrator — the engine's analogue of the
  * reference's config-driven experiment loop
  * (`/root/reference/src/app2/experiments/run.py:478-900` +
  * `config/mutation_experiment.yml:15-164`): a config declares iterations,
  * each enabling a set of mutations against a shared baseline plus optional
  * validation overrides, with the EXPECTED verdict encoded per iteration
  * ("expect FAIL on uniqueness" / "checks disabled, expect SUCCESS"). The
  * runner applies the mutations, validates with the fused engine, and
  * reports verdict-vs-expectation per iteration, including the reference's
  * `stop_at` (first failing check, `report.py:665-671`) and an optional
  * fail-fast that SKIPs remaining iterations after the first expectation
  * mismatch (`run.py:627-636` raise-and-skip behaviour).
  */
final case class MutationSpec(kind: String, partId: String)

final case class IterationSpec(
    name: String,
    mutations: Seq[MutationSpec],
    /** "SUCCESS" | "FAILED" — the encoded expectation. */
    expectedStatus: String,
    /** When FAILED is expected: check names that must be among the FAILs. */
    expectedFailedChecks: Seq[String] = Nil,
    /** Per-iteration validation overrides (the reference's
      * `*_validation_overrides: {check: false}`) — disabled predicate /
      * schema rules, honored by the fused engine via the config registry.
      */
    disabledChecks: Seq[String] = Nil)

final case class ExperimentConfig(
    name: String,
    iterations: Seq[IterationSpec],
    /** Fail-fast: skip remaining iterations after the first expectation
      * mismatch (reference stop-on-error semantics).
      */
    stopOnMismatch: Boolean = false) {
  require(iterations.nonEmpty, "experiment config declares no iterations")
  iterations.foreach(it => require(
    it.expectedStatus == "SUCCESS" || it.expectedStatus == "FAILED",
    s"iteration '${it.name}': expected_status must be SUCCESS or FAILED, " +
      s"got '${it.expectedStatus}'"))
}

final case class IterationOutcome(
    iterationNo: Int,
    name: String,
    /** SUCCESS | FAILED (engine verdict) | SKIPPED (fail-fast). */
    status: String,
    expectedStatus: String,
    matchedExpectation: Boolean,
    failedChecks: Seq[String],
    /** First failing check — the reference's stop_at column. */
    stopAt: Option[String],
    durationMs: Long,
    /** Bounded baseline↔mutated snapshot-diff sample (pre-rendered rows,
      * header first) — populated when the runner is asked for diffs; covers
      * the metadata/transcript columns (binary payload changes surface
      * through the PCM row invariant instead).
      */
    diffSample: Seq[String] = Nil)

final case class ExperimentResult(name: String, iterations: Seq[IterationOutcome]) {
  def executed: Seq[IterationOutcome] = iterations.filter(_.status != "SKIPPED")
  def allMatched: Boolean =
    iterations.forall(_.status != "SKIPPED") && executed.forall(_.matchedExpectation)
  def firstMismatch: Option[IterationOutcome] =
    executed.find(!_.matchedExpectation)
}

object Experiment {

  /** Mutation registry: config `kind` → [[graft.synth.Mutations]] injector
    * (the reference's mutator registry, `stg_mutations.py` /
    * `dds_mutations.py` keyed by action name). Unknown kinds throw at
    * config-application time — a typo must abort, not silently no-op.
    */
  val MutationCatalog: Map[String, (Dataset[AudioClip], String) => Dataset[AudioClip]] = Map(
    "duplicate_first" -> Mutations.duplicateFirst,
    "drop_required" -> Mutations.dropRequired,
    "corrupt_type" -> Mutations.corruptType,
    "dur_out_of_range" -> Mutations.durOutOfRange,
    "unknown_codec" -> Mutations.unknownCodec,
    "extra_row" -> Mutations.extraRow,
    "drop_row" -> Mutations.dropRow,
    "corrupt_audio" -> Mutations.corruptAudio,
    "overdrive_audio" -> Mutations.overdriveAudio,
    "silence_audio" -> Mutations.silenceAudio,
    "dc_offset_audio" -> Mutations.dcOffsetAudio,
    "hum_audio" -> Mutations.humAudio,
    "edit_transcript" -> Mutations.editTranscript,
    "blank_transcript" -> Mutations.blankTranscript,
    "stuff_transcript" -> Mutations.stuffTranscript,
    "shift_distribution" -> Mutations.shiftDistribution)

  /** The 7-iteration demo config: one iteration per major check family,
    * plus the disabled-checks SUCCESS twin and a clean baseline — the
    * engine-native mirror of `config/mutation_experiment.yml`'s
    * expect-FAIL / expect-SUCCESS pairs. Targets wrap modulo `numParts` so
    * the config stays valid for any baseline partition count.
    */
  def demoConfig(numParts: Int = 4): ExperimentConfig = {
    def part(i: Int) = f"p${i % numParts}%04d"
    ExperimentConfig(
      name = "demo_mutation_experiment",
      iterations = Seq(
        IterationSpec(s"duplicate_first ${part(0)} (expect FAIL on uniqueness)",
          Seq(MutationSpec("duplicate_first", part(0))), "FAILED",
          expectedFailedChecks = Seq("clip_id_uniqueness")),
        IterationSpec(s"unknown_codec ${part(1)} (expect FAIL on codec FK)",
          Seq(MutationSpec("unknown_codec", part(1))), "FAILED",
          expectedFailedChecks = Seq("codec_fk")),
        IterationSpec(s"corrupt_audio ${part(2)} (expect FAIL on PCM allclose)",
          Seq(MutationSpec("corrupt_audio", part(2))), "FAILED",
          expectedFailedChecks = Seq("pcm_allclose")),
        // bytes_length_consistent guards on IN-RANGE dur_ms (a row with an
        // absurd duration is not double-counted), so only the range check fires
        IterationSpec(s"dur_out_of_range ${part(3)} (expect FAIL on dur_ms_range)",
          Seq(MutationSpec("dur_out_of_range", part(3))), "FAILED",
          expectedFailedChecks = Seq("dur_ms_range")),
        IterationSpec(s"dur_out_of_range ${part(3)}, range check disabled (expect SUCCESS)",
          Seq(MutationSpec("dur_out_of_range", part(3))), "SUCCESS",
          disabledChecks = Seq("dur_ms_range")),
        // a BUILT-IN (non-predicate) check disabled by name — the config
        // registry covers the hard-wired fused columns too
        IterationSpec(s"unknown_codec ${part(1)}, codec_fk disabled (expect SUCCESS)",
          Seq(MutationSpec("unknown_codec", part(1))), "SUCCESS",
          disabledChecks = Seq("codec_fk")),
        IterationSpec("clean baseline (expect SUCCESS)", Nil, "SUCCESS")))
  }

  def writeReportJson(result: ExperimentResult, path: String): Unit = {
    def q(s: String): String = graft.model.JsonUtil.quote(s)
    val its = result.iterations.map(i =>
      s"""{"no":${i.iterationNo},"name":${q(i.name)},"status":${q(i.status)},""" +
      s""""expected":${q(i.expectedStatus)},"matched":${i.matchedExpectation},""" +
      s""""failed_checks":[${i.failedChecks.map(q).mkString(",")}],""" +
      s""""stop_at":${i.stopAt.map(q).getOrElse("null")},""" +
      s""""duration_ms":${i.durationMs}}""")
    val json = s"""{"experiment":${q(result.name)},"all_matched":${result.allMatched},""" +
      s""""iterations":[${its.mkString(",")}]}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
    ()
  }

  /** Static HTML experiment report — the engine's analogue of the
    * reference's per-experiment HTML artifact (`report.py:300-360`
    * iteration table with stop_at, `:538-706` per-iteration snapshot
    * comparisons): one row per iteration with verdict vs expectation, and
    * a collapsible baseline↔mutated diff sample per iteration when the
    * runner collected one. Self-contained, no external assets.
    */
  def writeReportHtml(result: ExperimentResult, path: String): Unit = {
    import graft.runner.Html.{esc, verdictBadge => badge}
    val rows = result.iterations.map { i =>
      val statusCell = i.status match {
        case "SKIPPED" => s"""<span style="color:#999">SKIPPED</span>"""
        case s => badge(s == "SUCCESS", s)
      }
      val diff =
        if (i.diffSample.isEmpty) ""
        else {
          val header = i.diffSample.head
          val body = i.diffSample.tail
            .map(r => s"<tr><td>${esc(r)}</td></tr>").mkString("\n")
          s"""<details><summary>${i.diffSample.size - 1} diff row(s)</summary>
             |<table><tr><th>${esc(header)}</th></tr>
             |$body</table></details>""".stripMargin
        }
      s"""<tr><td>${i.iterationNo}</td><td>${esc(i.name)}</td>
         |<td>$statusCell</td><td>${esc(i.expectedStatus)}</td>
         |<td>${badge(i.matchedExpectation || i.status == "SKIPPED",
             if (i.status == "SKIPPED") "-" else if (i.matchedExpectation) "match" else "MISMATCH")}</td>
         |<td>${esc(i.stopAt.getOrElse("-"))}</td>
         |<td>${i.durationMs} ms</td><td>$diff</td></tr>""".stripMargin
    }
    graft.runner.Html.write(path, s"experiment ${result.name}",
      s"""<h1>Experiment ${esc(result.name)} — ${badge(result.allMatched,
             if (result.allMatched) "ALL EXPECTATIONS MATCHED" else "EXPECTATION MISMATCH")}</h1>
         |<table><tr><th>#</th><th>iteration</th><th>status</th><th>expected</th>
         |<th>verdict vs expectation</th><th>stop_at</th><th>duration</th><th>snapshot diff</th></tr>
         |${rows.mkString("\n")}</table>""".stripMargin)
  }

  def printTable(result: ExperimentResult): Unit = {
    println(s"experiment '${result.name}' — " +
      (if (result.allMatched) "ALL EXPECTATIONS MATCHED" else "EXPECTATION MISMATCH"))
    result.iterations.foreach { i =>
      val mark = if (i.status == "SKIPPED") "~" else if (i.matchedExpectation) "+" else "!"
      println(f"  $mark i${i.iterationNo}%02d ${i.status}%-8s expected=${i.expectedStatus}%-8s " +
        f"stop_at=${i.stopAt.getOrElse("-")}%-24s ${i.name}")
    }
  }

  /** Standalone entry point: synthesize a baseline and run the demo config
    * (or a JSON config from args). Usage:
    * `sbt "runMain graft.experiment.Experiment [configPath [reportPath]]"`.
    */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-experiment")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg =
      if (args.nonEmpty) ExperimentConfigIO.load(spark, args(0)) else demoConfig()
    val ref = Synth.clipsRef(spark, numParts = 4, rowsPerPart = 300,
      maxAudioMs = 800).cache()
    val result = new ExperimentRunner(spark, ref, Synth.dimCodec(spark).toDF(),
      collectDiffs = args.length > 1).run(cfg)
    printTable(result)
    if (args.length > 1) {
      writeReportJson(result, args(1))
      writeReportHtml(result, args(1) + ".html")
    }
    spark.stop()
    if (!result.allMatched) sys.exit(1)
  }
}

/** JSON load/parse for [[ExperimentConfig]] — same FAILFAST posture as
  * [[graft.runner.EngineConfig]]: a malformed experiment file aborts.
  *
  * Shape:
  * {{{
  * { "name": "...", "stop_on_mismatch": false,
  *   "iterations": [
  *     { "name": "...", "expected_status": "FAILED",
  *       "expected_failed_checks": ["clip_id_uniqueness"],
  *       "disabled_checks": [],
  *       "mutations": [ { "kind": "duplicate_first", "part_id": "p0000" } ] } ] }
  * }}}
  */
object ExperimentConfigIO {
  import org.apache.spark.sql.types._

  private val schema = StructType(Seq(
    StructField("name", StringType),
    StructField("stop_on_mismatch", BooleanType),
    StructField("iterations", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("expected_status", StringType),
      StructField("expected_failed_checks", ArrayType(StringType)),
      StructField("disabled_checks", ArrayType(StringType)),
      StructField("mutations", ArrayType(StructType(Seq(
        StructField("kind", StringType),
        StructField("part_id", StringType)))))))))))

  def load(spark: SparkSession, path: String): ExperimentConfig =
    fromRows(spark.read.option("multiLine", "true").option("mode", "FAILFAST")
      .schema(schema).json(path))

  def parse(spark: SparkSession, json: String): ExperimentConfig = {
    import spark.implicits._
    fromRows(spark.read.option("mode", "FAILFAST")
      .schema(schema).json(Seq(json).toDS()))
  }

  private def fromRows(df: DataFrame): ExperimentConfig = {
    import org.apache.spark.sql.Row
    val rows = df.collect()
    require(rows.nonEmpty && !rows(0).isNullAt(2),
      "experiment config parsed to no 'iterations' array")
    val r = rows(0)
    def strs(row: Row, field: String): Seq[String] =
      Option(row.getAs[scala.collection.Seq[String]](field)).map(_.toSeq).getOrElse(Nil)
    val its = r.getSeq[Row](2).map { it =>
      val muts = Option(it.getAs[scala.collection.Seq[Row]]("mutations"))
        .map(_.toSeq.map(m =>
          MutationSpec(m.getAs[String]("kind"), m.getAs[String]("part_id"))))
        .getOrElse(Nil)
      IterationSpec(it.getAs[String]("name"), muts,
        it.getAs[String]("expected_status"),
        strs(it, "expected_failed_checks"), strs(it, "disabled_checks"))
    }
    ExperimentConfig(r.getString(0),
      its.toSeq,
      Option(r.getAs[java.lang.Boolean](1)).exists(_.booleanValue()))
  }
}

/** Executes an [[ExperimentConfig]] against a shared baseline: per
  * iteration, fold the mutation list over the baseline, validate the result
  * with the FUSED engine (one scan for the whole check catalog), compare
  * verdict and failing-check set to the encoded expectation.
  */
class ExperimentRunner(spark: SparkSession, baselineRef: Dataset[AudioClip],
                       dimCodec: DataFrame,
                       baseCfg: ValidationConfig = ValidationConfig(),
                       /** Collect a bounded baseline↔mutated snapshot-diff
                         * sample per iteration (metadata/transcript columns;
                         * `report.py:538-706` comparisons analogue).
                         */
                       collectDiffs: Boolean = false,
                       diffLimit: Int = 20) {

  private val diffCols = Seq("sr_hz", "dur_ms", "codec", "transcript")

  /** Pre-rendered bounded diff sample: header row first, then one
    * pipe-joined line per added/removed/changed row.
    */
  private def diffSampleOf(cand: Dataset[AudioClip]): Seq[String] = {
    val d = graft.checks.Reconcile.diff(baselineRef.toDF(), cand.toDF(),
      Seq("part_id", "clip_id"), diffCols)
    val rows = d.limit(diffLimit).collect()
    if (rows.isEmpty) Nil
    else d.columns.mkString(" | ") +:
      rows.toSeq.map(_.toSeq.map(v => Option(v).map(_.toString).getOrElse("∅"))
        .mkString(" | "))
  }

  private def withDisabled(disabled: Seq[String]): ValidationConfig =
    if (disabled.isEmpty) baseCfg
    else baseCfg.copy(engineConfig = EngineConfig(
      // PREPENDED so iteration overrides win over the base registry
      // (first matching check entry is taken)
      SuiteToggle("experiment_overrides", Some(true),
        Some(disabled.map(n => CheckConfig(n, Some(false), None)))) +:
        baseCfg.engineConfig.suites))

  def run(config: ExperimentConfig): ExperimentResult = {
    var mismatched = false
    val outcomes = config.iterations.zipWithIndex.map { case (it, idx) =>
      val no = idx + 1
      if (config.stopOnMismatch && mismatched)
        IterationOutcome(no, it.name, "SKIPPED", it.expectedStatus,
          matchedExpectation = false, Nil, None, 0L)
      else {
        val t0 = System.nanoTime()
        val cand = it.mutations.foldLeft(baselineRef) { (ds, m) =>
          val fn = Experiment.MutationCatalog.getOrElse(m.kind,
            throw new IllegalArgumentException(
              s"iteration '${it.name}': unknown mutation kind '${m.kind}' — " +
                s"known: ${Experiment.MutationCatalog.keys.toSeq.sorted.mkString(",")}"))
          fn(ds, m.partId)
        }
        val rep = new ValidationSession(spark, withDisabled(it.disabledChecks))
          .runFused(cand.toDF(), dimCodec, baselineRef.toDF())
        val failed = rep.outcomes
          .filter(o => o.status == "FAIL" || o.status == "ERROR").map(_.checkName)
        val matched = rep.status == it.expectedStatus &&
          it.expectedFailedChecks.forall(failed.contains)
        if (!matched) mismatched = true
        IterationOutcome(no, it.name, rep.status, it.expectedStatus, matched,
          failed, failed.headOption, (System.nanoTime() - t0) / 1000000L,
          diffSample = if (collectDiffs) diffSampleOf(cand) else Nil)
      }
    }
    ExperimentResult(config.name, outcomes)
  }
}
