package graft.runner

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import graft.model.{Check, Severity}

/** Config-driven check registry — the engine's analogue of the reference's
  * YAML suite configs + validator registry
  * (`/root/reference/src/app2/validators/configs/stg_validation.yml`,
  * `validators/runner.py:50-91`): suites and individual checks can be
  * enabled/disabled and their severity overridden per run WITHOUT code
  * changes. JSON instead of YAML (no extra dependency; Spark parses it).
  *
  * Severity override implements the reference's runtime downgrade policy
  * (`validators/runner.py:175-176`): a check whose code declares
  * severity=error but is configured severity=warning reports WARN, not
  * FAIL — the violation count is unchanged, only the verdict class moves.
  *
  * Config shape:
  * {{{
  * { "suites": [
  *   { "suite": "predicate", "enabled": true,
  *     "checks": [ { "name": "sr_hz_domain", "enabled": true,
  *                   "severity": "warning" } ] },
  *   { "suite": "drift", "enabled": false } ] }
  * }}}
  */
final case class CheckConfig(
    name: String,
    enabled: Option[Boolean],
    severity: Option[String])

final case class SuiteToggle(
    suite: String,
    enabled: Option[Boolean],
    checks: Option[Seq[CheckConfig]])

final case class EngineConfig(suites: Seq[SuiteToggle]) {

  def suiteEnabled(name: String): Boolean =
    suites.find(_.suite == name).flatMap(_.enabled).getOrElse(true)

  /** Check names are GLOBAL identifiers (like the reference's registry,
    * where every validator has a unique name); the suite nesting groups
    * them for readability and suite-level toggling. A check entry nested
    * under a DISABLED suite is inert — disabling the suite disables its
    * whole subtree.
    */
  private def checkCfg(check: String): Option[CheckConfig] =
    suites.iterator
      .filter(s => s.enabled.getOrElse(true))
      .flatMap(_.checks.getOrElse(Nil)).find(_.name == check)

  def checkEnabled(name: String): Boolean =
    checkCfg(name).flatMap(_.enabled).getOrElse(true)

  private def parseSeverity(s: String): Severity.Severity = s.toLowerCase match {
    case "error"   => Severity.Error
    case "warning" => Severity.Warning
    case "info"    => Severity.Info
    case other     => throw new IllegalArgumentException(s"unknown severity: $other")
  }

  /** Configured severity override for a check, if any — consulted by the
    * runner for the BUILT-IN checks (codec FK, reconciliation, row
    * invariants, uniqueness, drift) whose severities are otherwise
    * hard-wired; predicate checks get the same override through
    * [[applyTo]].
    */
  def severityOverrideFor(name: String): Option[Severity.Severity] =
    checkCfg(name).flatMap(_.severity).map(parseSeverity)

  /** Filter to enabled checks and apply severity overrides. */
  def applyTo(checks: Seq[Check]): Seq[Check] =
    checks.filter(c => checkEnabled(c.name)).map { c =>
      checkCfg(c.name).flatMap(_.severity) match {
        case Some(s) => c.copy(severity = parseSeverity(s))
        case None    => c
      }
    }
}

object EngineConfig {

  val empty: EngineConfig = EngineConfig(Nil)

  private val schema = StructType(Seq(
    StructField("suites", ArrayType(StructType(Seq(
      StructField("suite", StringType),
      StructField("enabled", BooleanType),
      StructField("checks", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("enabled", BooleanType),
        StructField("severity", StringType)))))))))))

  /** Load from a JSON file (multiLine: the whole file is one document).
    * FAILFAST: a malformed config must ABORT the run, not silently degrade
    * to everything-enabled — a typo'd file would otherwise re-enable every
    * disabled check and revert every severity downgrade without a trace.
    */
  def load(spark: SparkSession, path: String): EngineConfig =
    fromRows(spark.read.option("multiLine", "true").option("mode", "FAILFAST")
      .schema(schema).json(path))

  /** Parse from a literal JSON string (tests, inline configs). */
  def parse(spark: SparkSession, json: String): EngineConfig = {
    import spark.implicits._
    fromRows(spark.read.option("mode", "FAILFAST")
      .schema(schema).json(Seq(json).toDS()))
  }

  private def fromRows(df: org.apache.spark.sql.DataFrame): EngineConfig = {
    import org.apache.spark.sql.Row
    val rows = df.collect()
    require(rows.nonEmpty && !rows(0).isNullAt(0),
      "engine config parsed to no 'suites' array — refusing to silently " +
        "run with everything enabled; pass EngineConfig.empty explicitly " +
        "for an all-defaults run")
    val suites = rows(0).getSeq[Row](0).map { s =>
      val checks = Option(s.getAs[scala.collection.Seq[Row]]("checks")).map(_.toSeq.map(c =>
        CheckConfig(c.getAs[String]("name"),
          Option(c.getAs[java.lang.Boolean]("enabled")).map(_.booleanValue()),
          Option(c.getAs[String]("severity")))))
      SuiteToggle(s.getAs[String]("suite"),
        Option(s.getAs[java.lang.Boolean]("enabled")).map(_.booleanValue()),
        checks)
    }
    EngineConfig(suites.toSeq)
  }
}
