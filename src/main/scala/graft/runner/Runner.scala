package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.checks._
import graft.model._

/** Suite orchestration — the engine's analogue of the reference's suite
  * runners (`src/app2/validators/runner.py:109-228` severity policy and
  * fail-fast; `experiments/run.py:250-265` fixed suite order
  * ingestion→schema→completeness→uniqueness→consistency then
  * referential→reconciliation→rules).
  *
  * Collect-all is the Spark-natural default; `failFast = true` reproduces
  * the reference's raise-on-error behaviour (remaining suites SKIP,
  * `run.py:627-636`).
  */
final case class SuiteReport(
    suite: String,
    outcomes: Seq[CheckOutcome],
    durationMs: Long) {
  def failed: Boolean = outcomes.exists(_.status == CheckStatus.FAIL.toString)
  def checksFailed: Int = outcomes.count(o =>
    o.status == CheckStatus.FAIL.toString || o.status == CheckStatus.ERROR.toString)
}

final case class ValidationReport(suites: Seq[SuiteReport]) {
  def outcomes: Seq[CheckOutcome] = suites.flatMap(_.outcomes)
  def status: String =
    if (outcomes.exists(_.status == "FAIL") || outcomes.exists(_.status == "ERROR")) "FAILED"
    else "SUCCESS"
  def rowsFailedTotal: Long = outcomes.map(_.rowsFailed).sum
}

/** Configuration of one validation session over the clips table. */
final case class ValidationConfig(
    ruleVersion: String = "v1",
    failFast: Boolean = false,
    minSnrDb: Double = 30.0,
    predicateChecks: Seq[Check] = AudioChecks.defaults,
    driftColumn: String = "dur_ms",
    driftLo: Double = 0.0,
    driftHi: Double = 31000.0,
    driftBins: Int = 64,
    ksThreshold: Double = 0.1,
    /** Collect-all mode only: submit all suites' Spark jobs concurrently
      * from the driver (Spark schedules them across the same executors).
      * Removes the driver-side serialization of N independent actions —
      * at cluster scale the per-job latency floor otherwise dominates
      * small-partition validation. Ignored when failFast=true (fail-fast
      * is inherently sequential).
      */
    parallelSuites: Boolean = false,
    /** Config-driven registry (reference YAML configs → [[EngineConfig]]):
      * suite-level enable/disable applies to the modular `run` path; check
      * enable + severity overrides apply to the predicate catalog on both
      * paths (runFused always evaluates every enabled suite — it is one
      * aggregate).
      */
    engineConfig: EngineConfig = EngineConfig.empty,
    /** Declared schema, validated FIRST when present — the reference runs
      * its schema suite before all others (`experiments/run.py:250-265`).
      */
    schemaSpec: Option[graft.checks.SchemaSpec] = None)

class ValidationSession(spark: SparkSession, cfg: ValidationConfig = ValidationConfig()) {

  private def timed(suite: String)(body: => Seq[CheckOutcome]): SuiteReport = {
    val t0 = System.nanoTime()
    val out = body
    SuiteReport(suite, out, (System.nanoTime() - t0) / 1000000L)
  }

  private def skip(suite: String, names: Seq[String]): SuiteReport =
    SuiteReport(suite, names.map(n => CheckOutcome(n, "-", "-",
      CheckStatus.SKIP.toString, 0L, message = Some("skipped: fail-fast"))), 0L)

  /** Run every suite over one table (optionally vs a reference table for
    * reconciliation / row invariants / drift). Narrow projections keep the
    * bytes column out of every suite except rowinvariant.
    */
  def run(clips: DataFrame, dimCodec: DataFrame,
          clipsRef: Option[DataFrame] = None): ValidationReport = {
    val noBytes = clips.drop("bytes")
    val preds = cfg.engineConfig.applyTo(cfg.predicateChecks)

    val allSuites: Seq[(String, Seq[String], () => Seq[CheckOutcome])] =
      cfg.schemaSpec.toSeq.map(spec =>
        ("schema", spec.fields.map(_.name),
          () => SchemaCheck.run(clips, spec))) ++ Seq(
      ("predicate", preds.map(_.name),
        () => CheckCompiler.run(clips, preds)),
      ("uniqueness", Seq("clip_id_uniqueness"),
        () => Seq(Uniqueness.check(noBytes, Seq("clip_id"), "clip_id_uniqueness"))),
      ("referential", Seq("codec_fk"),
        () => Seq(Referential.check(noBytes, dimCodec, Seq("codec"), Seq("codec"), "codec_fk")))) ++
      clipsRef.toSeq.flatMap { ref =>
        Seq(
          ("reconciliation", Seq("clips_completeness", "clips_exclusivity"),
            () => Reconcile.check(ref.drop("bytes"), noBytes, Seq("part_id", "clip_id"), "clips").outcomes),
          ("rowinvariant", Seq("pcm_allclose", "transcript_equality"),
            () => RowInvariant.check(ref, clips, cfg.minSnrDb)),
          ("drift", Seq(s"${cfg.driftColumn}_ks_drift", s"${cfg.driftColumn}_psi_drift"),
            () => Drift.check(ref.drop("bytes"), noBytes, cfg.driftColumn,
              cfg.driftLo, cfg.driftHi, cfg.driftBins, cfg.ksThreshold)))
      }
    // config-driven suite enable/disable (validators/configs/*.yml analogue)
    val suites = allSuites.filter { case (name, _, _) =>
      cfg.engineConfig.suiteEnabled(name) }

    if (cfg.parallelSuites && !cfg.failFast) {
      // submit every suite's jobs concurrently — Spark's scheduler shares
      // the executors; the driver no longer serializes independent actions
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val futures = suites.map { case (name, _, body) => Future(timed(name)(body())) }
      ValidationReport(Await.result(Future.sequence(futures), Duration.Inf))
    } else {
      var failed = false
      val reports = scala.collection.mutable.ArrayBuffer[SuiteReport]()
      suites.foreach { case (name, skipNames, body) =>
        if (cfg.failFast && failed) reports += skip(name, skipNames)
        else {
          val r = timed(name)(body())
          reports += r
          if (r.failed) failed = true
        }
      }
      ValidationReport(reports.toSeq)
    }
  }

  /** FUSED whole-engine pass — the C16 "one statement evaluates every check"
    * pivot (`specs.py:421-426`) extended from predicate checks to the entire
    * suite catalog. The modular `run` issues ~12 Spark jobs (6 suites × 1-2
    * actions), each re-scanning its inputs. This plan reads each table's
    * heavy `bytes` column EXACTLY ONCE, in TWO concurrent jobs:
    *
    *  A. ONE full-outer join ref↔cand on (part_id, clip_id) — shuffle-free
    *     and sort-free when both tables are bucketed/storage-partitioned on
    *     the key — whose single aggregate evaluates: every predicate check
    *     and the codec-FK orphan count on present candidate rows (the
    *     dimension collapsed to a broadcast-literal IN set), the
    *     PCM/transcript row-invariants on matched rows, the
    *     completeness/exclusivity counts on unmatched rows, and BOTH sides'
    *     drift histogram bins;
    *  B. the clip_id uniqueness aggregate (key-only columns, tiny shuffle).
    *
    * Reconciliation counts are row-level here (key-level in the modular
    * path) — identical verdicts, and identical counts when clip_id is
    * unique (which check B enforces).
    */
  def runFused(clips: DataFrame, dimCodec: DataFrame,
               clipsRef: DataFrame): ValidationReport = {
    import org.apache.spark.sql.Row
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global

    val bins = cfg.driftBins
    val width = (cfg.driftHi - cfg.driftLo) / bins
    // histogram as `bins` conditional sums: keeps the whole aggregate on the
    // whole-stage-codegen declarative path (a typed-imperative aggregator
    // column would demote the entire plan to interpreted ObjectHashAggregate)
    def histAggs(valueCol: String, present: org.apache.spark.sql.Column,
                 tag: String): Seq[org.apache.spark.sql.Column] = {
      val bin = least(lit(bins - 1), greatest(lit(0),
        floor((col(valueCol).cast("double") - cfg.driftLo) / width).cast("int")))
      (0 until bins).map(i => sum(when(present && col(valueCol).isNotNull &&
        bin === i, 1L).otherwise(0L)).as(s"__${tag}_bin$i"))
    }
    def histOf(row: Row, offset: Int): Drift.Histogram =
      Drift.Histogram(cfg.driftLo, cfg.driftHi,
        Array.tabulate(bins)(i => if (row.isNullAt(offset + i)) 0L else row.getLong(offset + i)))

    val codecSet = dimCodec.select(col("codec")).distinct()
      .collect().map(_.getString(0)).toSeq
    val preds = cfg.engineConfig.applyTo(cfg.predicateChecks)

    // A: the mega-join — every non-uniqueness check in one aggregate
    val fA = Future {
      val t0 = System.nanoTime()
      val keys = Seq("part_id", "clip_id")
      // candidate keeps ORIGINAL column names so cfg.predicateChecks resolve;
      // reference columns are prefixed
      val candCols = clips.columns.filterNot(keys.contains).map(col)
      val c = clips.select((keys.map(col) ++ candCols): _*).withColumn("__c", lit(true))
      val r = clipsRef.select(col("part_id"), col("clip_id"),
        col("bytes").as("ref_bytes"), col("transcript").as("ref_transcript"),
        col(cfg.driftColumn).as(s"ref_${cfg.driftColumn}"))
        .withColumn("__r", lit(true))
      val candPresent = col("__c").isNotNull
      val refPresent = col("__r").isNotNull
      val both = refPresent && candPresent
      val fkViolation = col("codec").isNotNull && !col("codec").isin(codecSet: _*)
      // identical-bytes short-circuit skips decode; null bytes fall through
      // to the SNR UDF which returns -Inf (always a violation), matching
      // RowInvariant.compare semantics
      val pcmOk = (col("ref_bytes").isNotNull && (col("ref_bytes") <=> col("bytes"))) ||
        RowInvariant.snrColumn(col("ref_bytes"), col("bytes")) >= cfg.minSnrDb
      val predAggs = preds.map(cc =>
        sum(when(candPresent && cc.violation, 1L).otherwise(0L)).as(cc.name))
      val aggs = predAggs ++ Seq(
        sum(when(candPresent && fkViolation, 1L).otherwise(0L)).as("__fk"),
        sum(when(col("__c").isNull, 1L).otherwise(0L)).as("__missing"),
        sum(when(col("__r").isNull, 1L).otherwise(0L)).as("__extra"),
        sum(when(both && !pcmOk, 1L).otherwise(0L)).as("__pcm_bad"),
        sum(when(both && !(col("ref_transcript") <=> col("transcript")), 1L)
          .otherwise(0L)).as("__tr_bad")) ++
        histAggs(cfg.driftColumn, candPresent, "cand") ++
        histAggs(s"ref_${cfg.driftColumn}", refPresent, "ref")
      val row = r.join(c, keys, "full_outer").agg(aggs.head, aggs.tail: _*).head()
      def cnt(i: Int): Long = if (row.isNullAt(i)) 0L else row.getLong(i)
      val np = preds.size
      val predOutcomes = preds.zipWithIndex.map { case (cc, i) =>
        CheckOutcome(cc.name, cc.ruleGroup.toString, cc.severity.toString,
          CheckOutcome.status(cc.severity, cnt(i)).toString, cnt(i))
      }
      val outcomes = predOutcomes ++ Seq(
        CheckOutcome("codec_fk", RuleGroup.ReferentialIntegrity.toString,
          Severity.Error.toString,
          CheckOutcome.status(Severity.Error, cnt(np)).toString, cnt(np)),
        CheckOutcome("clips_completeness", RuleGroup.Reconciliation.toString,
          Severity.Error.toString,
          CheckOutcome.status(Severity.Error, cnt(np + 1)).toString, cnt(np + 1)),
        CheckOutcome("clips_exclusivity", RuleGroup.Reconciliation.toString,
          Severity.Warning.toString,
          CheckOutcome.status(Severity.Warning, cnt(np + 2)).toString, cnt(np + 2)),
        CheckOutcome("pcm_allclose", RuleGroup.RowInvariant.toString,
          Severity.Error.toString,
          CheckOutcome.status(Severity.Error, cnt(np + 3)).toString, cnt(np + 3),
          expectedValue = Some(s"SNR >= ${cfg.minSnrDb} dB")),
        CheckOutcome("transcript_equality", RuleGroup.RowInvariant.toString,
          Severity.Error.toString,
          CheckOutcome.status(Severity.Error, cnt(np + 4)).toString, cnt(np + 4)))
      val candHist = histOf(row, np + 5)
      val refHist = histOf(row, np + 5 + bins)
      (SuiteReport("fused_join", outcomes, (System.nanoTime() - t0) / 1000000L),
        candHist, refHist)
    }

    // B: uniqueness (key-only aggregate)
    val fD = Future(timed("uniqueness") {
      Seq(Uniqueness.check(clips.select("part_id", "clip_id"),
        Seq("clip_id"), "clip_id_uniqueness"))
    })

    val (aRep, aHist, bHist) = Await.result(fA, Duration.Inf)
    val dRep = Await.result(fD, Duration.Inf)

    val ksV = Drift.ks(bHist, aHist)
    val psiV = Drift.psi(bHist, aHist)
    val driftOutcomes = Seq(
      CheckOutcome(s"${cfg.driftColumn}_ks_drift", RuleGroup.DistributionDrift.toString,
        Severity.Error.toString,
        (if (ksV > cfg.ksThreshold) CheckStatus.FAIL else CheckStatus.PASS).toString,
        if (ksV > cfg.ksThreshold) 1L else 0L,
        observedValue = Some(f"$ksV%.6f"), expectedValue = Some(s"<= ${cfg.ksThreshold}")),
      CheckOutcome(s"${cfg.driftColumn}_psi_drift", RuleGroup.DistributionDrift.toString,
        Severity.Warning.toString,
        (if (psiV > 0.2) CheckStatus.WARN else CheckStatus.PASS).toString,
        if (psiV > 0.2) 1L else 0L,
        observedValue = Some(f"$psiV%.6f"), expectedValue = Some("<= 0.2")))

    ValidationReport(Seq(aRep, dRep, SuiteReport("drift", driftOutcomes, 0L)))
  }

  /** Fused EVIDENCE pass — violation ROWS for every check in ONE scan of
    * the ref↔cand join (the fail_sql twin of [[runFused]]): each surviving
    * row carries the array of check names it violates, exploded to
    * (part_id, clip_id, check_name). At 10^12 rows this replaces one
    * fail_sql job per failed check with a single pass; output volume is
    * O(violations), and callers bound it further with a limit.
    *
    * Covers predicate checks, codec FK, the PCM/transcript row invariants,
    * and both reconciliation directions (missing rows tagged
    * clips_completeness, extras clips_exclusivity). Uniqueness evidence
    * stays on its own key-only plan ([[Uniqueness.duplicateKeys]]) — it is
    * a group property, not a row predicate.
    */
  def fusedViolations(clips: DataFrame, dimCodec: DataFrame,
                      clipsRef: DataFrame): DataFrame = {
    val codecSet = dimCodec.select(col("codec")).distinct()
      .collect().map(_.getString(0)).toSeq
    val preds = cfg.engineConfig.applyTo(cfg.predicateChecks)
    val keys = Seq("part_id", "clip_id")
    val candCols = clips.columns.filterNot(keys.contains).map(col)
    val c = clips.select((keys.map(col) ++ candCols): _*).withColumn("__c", lit(true))
    val r = clipsRef.select(col("part_id"), col("clip_id"),
      col("bytes").as("ref_bytes"), col("transcript").as("ref_transcript"))
      .withColumn("__r", lit(true))
    val candPresent = col("__c").isNotNull
    val refPresent = col("__r").isNotNull
    val both = refPresent && candPresent
    val pcmOk = (col("ref_bytes").isNotNull && (col("ref_bytes") <=> col("bytes"))) ||
      RowInvariant.snrColumn(col("ref_bytes"), col("bytes")) >= cfg.minSnrDb
    val tags =
      preds.map(cc => when(candPresent && cc.violation, lit(cc.name))) ++ Seq(
        when(candPresent && col("codec").isNotNull &&
          !col("codec").isin(codecSet: _*), lit("codec_fk")),
        when(col("__c").isNull, lit("clips_completeness")),
        when(col("__r").isNull, lit("clips_exclusivity")),
        when(both && !pcmOk, lit("pcm_allclose")),
        when(both && !(col("ref_transcript") <=> col("transcript")),
          lit("transcript_equality")))
    r.join(c, keys, "full_outer")
      .select(keys.map(col) :+ array_compact(array(tags: _*)).as("__violated"): _*)
      .filter(size(col("__violated")) > 0)
      .withColumn("check_name", explode(col("__violated")))
      .drop("__violated")
  }

  /** Checkpoint-resumable run: validates only partitions not yet SUCCESS
    * under cfg.ruleVersion, one partition at a time (partition pruning via
    * part_id filter), recording per-partition lineage + metrics.
    *
    * One Spark job group PER partition — fine for tens of partitions,
    * driver-serialized at thousands; use [[runResumableFused]] at scale.
    */
  def runResumable(clips: DataFrame, dimCodec: DataFrame, store: CheckpointStore,
                   clipsRef: Option[DataFrame] = None): Map[String, ValidationReport] = {
    import spark.implicits._
    val allParts = clips.select("part_id").distinct().as[String].collect().sorted.toSeq
    val todo = store.pending(allParts, cfg.ruleVersion)
    store.markProcessing(todo, cfg.ruleVersion)
    todo.map { p =>
      val rep = run(clips.filter(col("part_id") === p), dimCodec,
        clipsRef.map(_.filter(col("part_id") === p)))
      store.markDone(p, rep.status == "SUCCESS", cfg.ruleVersion, metricsJson(rep))
      p -> rep
    }.toMap
  }

  private def metricsJson(rep: ValidationReport): String =
    "{\"checks_total\":" + rep.outcomes.size +
      ",\"checks_failed\":" + rep.suites.map(_.checksFailed).sum +
      ",\"rows_failed\":" + rep.rowsFailedTotal + "}"

  /** Scale path for resumable validation: ALL pending partitions validated
    * in ONE grouped fused pass — the mega-aggregate of [[runFused]] grouped
    * by part_id (plus a grouped key-only uniqueness aggregate), yielding one
    * verdict row per partition from two Spark jobs total, however many
    * partitions are pending. Per-partition drift uses each partition's own
    * histogram pair. Checkpoint rows are written in one bulk upsert.
    *
    * This is what a restarted 10^12-row spark-submit actually needs: the
    * per-partition loop of [[runResumable]] costs a driver-serialized job
    * per partition; this costs O(1) jobs and a tiny per-partition shuffle.
    */
  def runResumableFused(clips: DataFrame, dimCodec: DataFrame, store: CheckpointStore,
                        clipsRef: DataFrame): Map[String, ValidationReport] = {
    import org.apache.spark.sql.Row
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global

    val allParts = clips.select("part_id").distinct().as[String].collect().sorted.toSeq
    val todo = store.pending(allParts, cfg.ruleVersion)
    if (todo.isEmpty) return Map.empty
    store.markProcessing(todo, cfg.ruleVersion)
    val pendSet = todo.toSet
    val cand = clips.filter(col("part_id").isin(todo: _*))
    val ref = clipsRef.filter(col("part_id").isin(todo: _*))

    val bins = cfg.driftBins
    val width = (cfg.driftHi - cfg.driftLo) / bins
    def histAggs(valueCol: String, present: org.apache.spark.sql.Column,
                 tag: String): Seq[org.apache.spark.sql.Column] = {
      val bin = least(lit(bins - 1), greatest(lit(0),
        floor((col(valueCol).cast("double") - cfg.driftLo) / width).cast("int")))
      (0 until bins).map(i => sum(when(present && col(valueCol).isNotNull &&
        bin === i, 1L).otherwise(0L)).as(s"__${tag}_bin$i"))
    }
    val codecSet = dimCodec.select(col("codec")).distinct()
      .collect().map(_.getString(0)).toSeq
    val preds = cfg.engineConfig.applyTo(cfg.predicateChecks)
    val keys = Seq("part_id", "clip_id")

    // job A: the grouped mega-join aggregate (same shape as runFused's)
    val fA = Future {
      val candCols = cand.columns.filterNot(keys.contains).map(col)
      val c = cand.select((keys.map(col) ++ candCols): _*).withColumn("__c", lit(true))
      val r = ref.select(col("part_id"), col("clip_id"),
        col("bytes").as("ref_bytes"), col("transcript").as("ref_transcript"),
        col(cfg.driftColumn).as(s"ref_${cfg.driftColumn}"))
        .withColumn("__r", lit(true))
      val candPresent = col("__c").isNotNull
      val refPresent = col("__r").isNotNull
      val both = refPresent && candPresent
      val fkViolation = col("codec").isNotNull && !col("codec").isin(codecSet: _*)
      val pcmOk = (col("ref_bytes").isNotNull && (col("ref_bytes") <=> col("bytes"))) ||
        RowInvariant.snrColumn(col("ref_bytes"), col("bytes")) >= cfg.minSnrDb
      val predAggs = preds.map(cc =>
        sum(when(candPresent && cc.violation, 1L).otherwise(0L)).as(cc.name))
      val aggs = predAggs ++ Seq(
        sum(when(candPresent && fkViolation, 1L).otherwise(0L)).as("__fk"),
        sum(when(col("__c").isNull, 1L).otherwise(0L)).as("__missing"),
        sum(when(col("__r").isNull, 1L).otherwise(0L)).as("__extra"),
        sum(when(both && !pcmOk, 1L).otherwise(0L)).as("__pcm_bad"),
        sum(when(both && !(col("ref_transcript") <=> col("transcript")), 1L)
          .otherwise(0L)).as("__tr_bad")) ++
        histAggs(cfg.driftColumn, candPresent, "cand") ++
        histAggs(s"ref_${cfg.driftColumn}", refPresent, "ref")
      r.join(c, keys, "full_outer")
        .groupBy(col("part_id"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
    }

    // job B: grouped key-only uniqueness
    val fB = Future {
      cand.select("part_id", "clip_id").filter(col("clip_id").isNotNull)
        .groupBy(col("part_id"), col("clip_id")).agg(count(lit(1)).as("__c"))
        .groupBy(col("part_id"))
        .agg(sum(when(col("__c") > 1, 1L).otherwise(0L)).as("dups"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }

    val aRows = Await.result(fA, Duration.Inf)
    val dupByPart = Await.result(fB, Duration.Inf)

    val np = preds.size
    def cnt(row: Row, i: Int): Long = if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1)
    def histOf(row: Row, offset: Int): Drift.Histogram =
      Drift.Histogram(cfg.driftLo, cfg.driftHi,
        Array.tabulate(bins)(i =>
          if (row.isNullAt(offset + 1 + i)) 0L else row.getLong(offset + 1 + i)))

    val reports = aRows.filter(r => pendSet.contains(r.getString(0))).map { row =>
      val part = row.getString(0)
      val predOutcomes = preds.zipWithIndex.map { case (cc, i) =>
        CheckOutcome(cc.name, cc.ruleGroup.toString, cc.severity.toString,
          CheckOutcome.status(cc.severity, cnt(row, i)).toString, cnt(row, i))
      }
      def outcome(name: String, group: RuleGroup.RuleGroup,
                  sev: Severity.Severity, n: Long): CheckOutcome =
        CheckOutcome(name, group.toString, sev.toString,
          CheckOutcome.status(sev, n).toString, n)
      val dups = dupByPart.getOrElse(part, 0L)
      val candHist = histOf(row, np + 5)
      val refHist = histOf(row, np + 5 + bins)
      val ksV = Drift.ks(refHist, candHist)
      val psiV = Drift.psi(refHist, candHist)
      val outcomes = predOutcomes ++ Seq(
        outcome("codec_fk", RuleGroup.ReferentialIntegrity, Severity.Error, cnt(row, np)),
        outcome("clips_completeness", RuleGroup.Reconciliation, Severity.Error, cnt(row, np + 1)),
        outcome("clips_exclusivity", RuleGroup.Reconciliation, Severity.Warning, cnt(row, np + 2)),
        outcome("pcm_allclose", RuleGroup.RowInvariant, Severity.Error, cnt(row, np + 3)),
        outcome("transcript_equality", RuleGroup.RowInvariant, Severity.Error, cnt(row, np + 4)),
        outcome("clip_id_uniqueness", RuleGroup.DuplicateRecords, Severity.Error, dups),
        CheckOutcome(s"${cfg.driftColumn}_ks_drift", RuleGroup.DistributionDrift.toString,
          Severity.Error.toString,
          (if (ksV > cfg.ksThreshold) CheckStatus.FAIL else CheckStatus.PASS).toString,
          if (ksV > cfg.ksThreshold) 1L else 0L,
          observedValue = Some(f"$ksV%.6f"), expectedValue = Some(s"<= ${cfg.ksThreshold}")),
        CheckOutcome(s"${cfg.driftColumn}_psi_drift", RuleGroup.DistributionDrift.toString,
          Severity.Warning.toString,
          (if (psiV > 0.2) CheckStatus.WARN else CheckStatus.PASS).toString,
          if (psiV > 0.2) 1L else 0L,
          observedValue = Some(f"$psiV%.6f"), expectedValue = Some("<= 0.2")))
      part -> ValidationReport(Seq(SuiteReport("fused_grouped", outcomes, 0L)))
    }.toMap

    // one bulk checkpoint upsert for every validated partition — plus
    // partitions pending but ABSENT from the candidate (fully missing):
    // they got no aggregate row and stay PROCESSING for investigation
    store.markDoneBulk(reports.toSeq.map { case (p, rep) =>
      (p, rep.status == "SUCCESS", metricsJson(rep))
    }, cfg.ruleVersion)
    reports
  }
}
