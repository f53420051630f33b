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
    ksThreshold: Double = 0.1)

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
    var failed = false
    val reports = scala.collection.mutable.ArrayBuffer[SuiteReport]()

    def suite(name: String, skipNames: => Seq[String])(body: => Seq[CheckOutcome]): Unit = {
      if (cfg.failFast && failed) reports += skip(name, skipNames)
      else {
        val r = timed(name)(body)
        reports += r
        if (r.failed) failed = true
      }
    }

    suite("predicate", cfg.predicateChecks.map(_.name)) {
      CheckCompiler.run(clips, cfg.predicateChecks)
    }
    suite("uniqueness", Seq("clip_id_uniqueness")) {
      Seq(Uniqueness.check(noBytes, Seq("clip_id"), "clip_id_uniqueness"))
    }
    suite("referential", Seq("codec_fk")) {
      Seq(Referential.check(noBytes, dimCodec, Seq("codec"), Seq("codec"), "codec_fk"))
    }
    clipsRef.foreach { ref =>
      suite("reconciliation", Seq("clips_completeness", "clips_exclusivity")) {
        Reconcile.check(ref.drop("bytes"), noBytes, Seq("part_id", "clip_id"), "clips").outcomes
      }
      suite("rowinvariant", Seq("pcm_allclose", "transcript_equality")) {
        RowInvariant.check(ref, clips, cfg.minSnrDb)
      }
      suite("drift", Seq(s"${cfg.driftColumn}_ks_drift", s"${cfg.driftColumn}_psi_drift")) {
        Drift.check(ref.drop("bytes"), noBytes, cfg.driftColumn,
          cfg.driftLo, cfg.driftHi, cfg.driftBins, cfg.ksThreshold)
      }
    }
    ValidationReport(reports.toSeq)
  }

  /** Checkpoint-resumable run: validates only partitions not yet SUCCESS
    * under cfg.ruleVersion, one partition at a time (partition pruning via
    * part_id filter), recording per-partition lineage + metrics.
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
      val metrics = "{\"checks_total\":" + rep.outcomes.size +
        ",\"checks_failed\":" + rep.suites.map(_.checksFailed).sum +
        ",\"rows_failed\":" + rep.rowsFailedTotal + "}"
      store.markDone(p, rep.status == "SUCCESS", cfg.ruleVersion, metrics)
      p -> rep
    }.toMap
  }
}
