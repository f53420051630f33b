package graft.model

import org.apache.spark.sql.Column

/** Core result model of the validation engine.
  *
  * Mirrors the reference's check-result semantics:
  *  - status algebra PASS/WARN/FAIL/ERROR/SKIP
  *    (reference: `sql/initdb/tech_tables.sql:60-81`,
  *    `src/app2/validators/models.py:1-7`)
  *  - severity policy: a violated check with severity=error fails the suite,
  *    severity=warning downgrades to WARN
  *    (reference: `src/app2/validators/runner.py:173-208`)
  */
object Severity extends Enumeration {
  type Severity = Value
  val Error, Warning, Info = Value
}

object CheckStatus extends Enumeration {
  type CheckStatus = Value
  val PASS, WARN, FAIL, ERROR, SKIP = Value
}

/** Rule groups as named by the reference (`src/app2/etl_validation/specs.py`):
  * schema_mismatch, missing_values, out_of_range, duplicate_records,
  * referential_integrity_violation, sql_constraint — plus engine-new groups.
  */
object RuleGroup extends Enumeration {
  type RuleGroup = Value
  val SchemaMismatch, MissingValues, OutOfRange, DuplicateRecords,
      ReferentialIntegrity, SqlConstraint, Reconciliation, RowInvariant,
      DistributionDrift, Stats = Value
}

import Severity.Severity
import RuleGroup.RuleGroup
import CheckStatus.CheckStatus

/** A declarative predicate check: `violation` is a Catalyst boolean Column
  * that is true for rows violating the rule. The count plan (verdict) and the
  * row plan (evidence) both derive from it — the reference's
  * `StageCheck(count_sql, fail_sql)` dual-query design
  * (`src/app2/etl_validation/specs.py:6-14`) collapsed into one spec.
  */
final case class Check(
    name: String,
    ruleGroup: RuleGroup,
    severity: Severity,
    violation: Column,
    description: String = "")

/** Outcome of one check on one scope (partition or whole table). */
final case class CheckOutcome(
    checkName: String,
    ruleGroup: String,
    severity: String,
    status: String,
    rowsFailed: Long,
    observedValue: Option[String] = None,
    expectedValue: Option[String] = None,
    message: Option[String] = None)

object CheckOutcome {
  /** Severity policy of the reference (`validators/runner.py:173-208`):
    * violations under severity=error → FAIL; severity=warning → WARN;
    * severity=info → PASS with observed count.
    */
  def status(severity: Severity, rowsFailed: Long): CheckStatus =
    if (rowsFailed == 0L) CheckStatus.PASS
    else severity match {
      case Severity.Error   => CheckStatus.FAIL
      case Severity.Warning => CheckStatus.WARN
      case Severity.Info    => CheckStatus.PASS
    }
}

/** The audio input row (`BASELINE.json` input_hint). */
final case class AudioClip(
    part_id: String,
    clip_id: String,
    bytes: Array[Byte],
    sr_hz: Int,
    dur_ms: Int,
    codec: String,
    transcript: String)

/** Broadcastable codec dimension (analogue of dds.dim_competition). */
final case class CodecDim(codec: String, family: String, max_sr_hz: Int)

/** Checkpoint row — per-partition lineage for resume
  * (reference: `tech.etl_batch_status`, `sql/initdb/tech_tables.sql:24-41`).
  */
final case class Checkpoint(
    part_id: String,
    status: String, // NEW | PROCESSING | SUCCESS | FAILED
    attempts: Int,
    rule_version: String,
    metrics_json: String,
    updated_at: Long)

/** Minimal JSON string quoting shared by every hand-rolled JSON writer
  * (oracle dump, report sink): backslash, quote, and ALL control chars
  * (<0x20) — a stray tab/CR would otherwise break a strict json.load of
  * the artifact.
  */
object JsonUtil {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
