package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.audio.Pcm
import graft.model._

/** Per-row invariants vs the reference table (`BASELINE.json` input_hint):
  * decoded-PCM allclose (SNR >= 30 dB) and transcript string equality —
  * the audio analogue of the reference's payload-equality copies
  * (`src/app2/experiments/stg_copy.py`) and rename detection
  * (`dds_mutations.py:135-152`).
  *
  * Plan shape: inner join cand↔ref on (part_id, clip_id) — co-partitioned
  * when both tables share partitioning — then one UDF evaluating SNR. The
  * UDF is the only non-codegen operator in the engine; it touches only rows
  * that survive the join, and `bytes` columns are carried only through this
  * pass (all other checks prune them).
  */
object RowInvariant {

  /** Column form of the SNR computation (for fused plans) — the NATIVE
    * codegen expression [[graft.functions.PcmSnr]]: stays inside
    * whole-stage codegen (no ScalaUDF closure dispatch) and fuses decode
    * into the accumulation loop. Always evaluates: −∞ for null payloads
    * (a missing payload is a violation, not an unknown).
    */
  def snrColumn(ref: org.apache.spark.sql.Column,
                cand: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.GraftFunctions.pcmSnr(ref, cand)

  /** Joined per-row verdicts: clip_id, pcm_ok, transcript_ok, snr_db. */
  def compare(ref: DataFrame, cand: DataFrame, minSnrDb: Double = 30.0): DataFrame = {
    val r = ref.select(col("part_id"), col("clip_id"),
      col("bytes").as("ref_bytes"), col("transcript").as("ref_transcript"))
    val c = cand.select(col("part_id"), col("clip_id"),
      col("bytes").as("cand_bytes"), col("transcript").as("cand_transcript"))
    r.join(c, Seq("part_id", "clip_id"), "inner")
      // cheap exact-equality short-circuit: identical byte arrays skip decode
      .withColumn("snr_db",
        when(col("ref_bytes") === col("cand_bytes"), lit(Double.PositiveInfinity))
          .otherwise(snrColumn(col("ref_bytes"), col("cand_bytes"))))
      .withColumn("pcm_ok", col("snr_db") >= minSnrDb)
      .withColumn("transcript_ok", col("ref_transcript") <=> col("cand_transcript"))
      .select("part_id", "clip_id", "snr_db", "pcm_ok", "transcript_ok")
  }

  /** Violation rows only (evidence plan). */
  def violations(ref: DataFrame, cand: DataFrame, minSnrDb: Double = 30.0): DataFrame =
    compare(ref, cand, minSnrDb).filter(!col("pcm_ok") || !col("transcript_ok"))

  /** The two invariants are individually toggleable: with `computePcm`
    * false the plan never touches the `bytes` columns at all (the decode +
    * SNR pass is the engine's heaviest check — computing it only to
    * discard the outcome would make a config disable cost nothing).
    */
  def check(ref: DataFrame, cand: DataFrame, minSnrDb: Double = 30.0,
            computePcm: Boolean = true,
            computeTranscript: Boolean = true): Seq[CheckOutcome] = {
    if (!computePcm && !computeTranscript) return Nil
    val joined =
      if (computePcm) compare(ref, cand, minSnrDb)
      else // transcript-only plan: bytes pruned from both scans
        ref.select(col("part_id"), col("clip_id"),
            col("transcript").as("ref_transcript"))
          .join(cand.select(col("part_id"), col("clip_id"),
            col("transcript").as("cand_transcript")),
            Seq("part_id", "clip_id"), "inner")
          .withColumn("pcm_ok", lit(true))
          .withColumn("transcript_ok", col("ref_transcript") <=> col("cand_transcript"))
    val agg = joined.agg(
      sum(when(!col("pcm_ok"), 1L).otherwise(0L)).as("pcm_bad"),
      sum(when(!col("transcript_ok"), 1L).otherwise(0L)).as("tr_bad")).head()
    val pcmBad = if (agg.isNullAt(0)) 0L else agg.getLong(0)
    val trBad = if (agg.isNullAt(1)) 0L else agg.getLong(1)
    (if (computePcm) Seq(
      CheckOutcome("pcm_allclose", RuleGroup.RowInvariant.toString, Severity.Error.toString,
        CheckOutcome.status(Severity.Error, pcmBad).toString, pcmBad,
        expectedValue = Some(s"SNR >= $minSnrDb dB"))) else Nil) ++
    (if (computeTranscript) Seq(
      CheckOutcome("transcript_equality", RuleGroup.RowInvariant.toString, Severity.Error.toString,
        CheckOutcome.status(Severity.Error, trBad).toString, trBad)) else Nil)
  }
}
