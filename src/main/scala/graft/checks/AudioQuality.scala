package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.model._

/** Signal-level audio quality validation — the checks a speech/training
  * corpus needs BEYOND metadata predicates: clipping, silence, loudness.
  * The reference validates payload STRUCTURE (`validators/api_source.py`
  * shape checks); for audio the payload is signal, so the checkable
  * structure is its statistics.
  *
  * Design for scale: ONE `pcm_stats` struct column (a single fused
  * decode+accumulate pass per row, native codegen —
  * [[graft.functions.PcmStats]]) feeds every quality predicate as a cheap
  * field read. The predicates then ride the same single-scan C16 pivot as
  * all other checks ([[CheckCompiler.run]]): adding quality checks to a
  * validation run costs one decode per row total, not one per check.
  */
object AudioQuality {

  /** Name of the attached stats struct column. */
  val StatsCol = "__pcm_stats"

  /** Attach the one-pass quality struct; every [[checks]] predicate reads
    * its fields.
    */
  def withStats(df: DataFrame, bytesCol: String = "bytes"): DataFrame =
    df.withColumn(StatsCol, GraftFunctions.pcmStats(col(bytesCol)))

  /** Quality rule set over [[withStats]] output. Null-struct rows (null
    * payload) make every field predicate null → not counted; the
    * decodability check owns non-null-but-undecodable payloads and
    * bytes_not_null (AudioChecks.defaults) owns nulls.
    *
    * Default gates: ≤0.1% clipped samples (steady-state clipping, not a
    * single transient), mean level above −50 dBFS AND under half the
    * samples silent (a clip can be quiet OR sparse, but not both dead).
    */
  def checks(maxClipRatio: Double = 0.001,
             minDbfs: Double = -50.0,
             maxSilenceRatio: Double = 0.5): Seq[Check] = Seq(
    Check("audio_payload_decodable", RuleGroup.SchemaMismatch, Severity.Error,
      col("bytes").isNotNull && col(StatsCol).isNull,
      "payload present but carries no decodable PCM16 sample"),
    Check("audio_not_clipped", RuleGroup.OutOfRange, Severity.Error,
      col(s"$StatsCol.clip_ratio") > maxClipRatio,
      s"clipped-sample ratio must stay <= $maxClipRatio"),
    Check("audio_not_silent", RuleGroup.OutOfRange, Severity.Error,
      col(s"$StatsCol.dbfs") < minDbfs &&
        col(s"$StatsCol.silence_ratio") > maxSilenceRatio,
      s"clip must not be digitally dead (level < $minDbfs dBFS and more " +
        s"than ${(maxSilenceRatio * 100).toInt}% silent samples)"))

  /** Self-contained variants of [[checks]] for the validation engine's
    * `ValidationConfig.predicateChecks`: each predicate embeds its own
    * `pcm_stats(bytes)` struct, so they need no schema preparation and
    * ride every engine path (modular suites, fused verdict aggregate,
    * grouped resumable, fused violation tags) as ordinary predicate
    * checks — config enable/severity-override included. Spark's
    * aggregate-level subexpression elimination typically dedupes the
    * repeated struct; when it doesn't, the worst case is one decode per
    * quality check, and the guaranteed-single-decode form remains
    * [[withStats]] + [[checks]].
    */
  def standaloneChecks(maxClipRatio: Double = 0.001,
                       minDbfs: Double = -50.0,
                       maxSilenceRatio: Double = 0.5,
                       bytesCol: String = "bytes"): Seq[Check] = {
    val st = GraftFunctions.pcmStats(col(bytesCol))
    Seq(
      Check("audio_payload_decodable", RuleGroup.SchemaMismatch, Severity.Error,
        col(bytesCol).isNotNull && st.isNull,
        "payload present but carries no decodable PCM16 sample"),
      Check("audio_not_clipped", RuleGroup.OutOfRange, Severity.Error,
        st.getField("clip_ratio") > maxClipRatio,
        s"clipped-sample ratio must stay <= $maxClipRatio"),
      Check("audio_not_silent", RuleGroup.OutOfRange, Severity.Error,
        st.getField("dbfs") < minDbfs &&
          st.getField("silence_ratio") > maxSilenceRatio,
        s"clip must not be digitally dead (level < $minDbfs dBFS and more " +
          s"than ${(maxSilenceRatio * 100).toInt}% silent samples)"))
  }

  /** Recording-chain-fault checks over [[graft.functions.PcmHum]]
    * (`pcm_hum(bytes, sr_hz)` — DC offset + Goertzel 50/60 Hz mains-hum
    * share, one fused decode per row): a biased ADC shows as |dc_ratio|
    * above a few percent; a ground-loop hum shows as the mains bins
    * carrying an outsized share of total energy. Ordinary predicate
    * checks — they ride every engine path like [[standaloneChecks]].
    */
  def humChecks(maxDcRatio: Double = 0.02,
                maxHumRatio: Double = 0.2,
                bytesCol: String = "bytes",
                srCol: String = "sr_hz"): Seq[Check] = {
    val h = GraftFunctions.pcmHum(col(bytesCol), col(srCol))
    Seq(
      Check("audio_no_dc_offset", RuleGroup.OutOfRange, Severity.Error,
        abs(h.getField("dc_ratio")) > maxDcRatio,
        s"signed DC offset share must stay within ±$maxDcRatio"),
      Check("audio_no_mains_hum", RuleGroup.OutOfRange, Severity.Warning,
        h.getField("hum_ratio") > maxHumRatio,
        s"50/60 Hz mains bins must carry <= ${(maxHumRatio * 100).toInt}% " +
          "of total energy"))
  }

  /** Transcript↔audio consistency checks — the clip+transcript PAIRING
    * validation that per-column predicates miss: a transcript can be
    * present, well-typed, and equal to the reference while still being
    * the WRONG transcript for its duration (truncated upload, padding
    * bug, swapped join key upstream). Speaking rate bounds catch both
    * directions — a transcript far too long for its audio (> maxCharsPerSec)
    * or suspiciously sparse (< minCharsPerSec) — and the presence check
    * flags speech-length clips whose transcript is EMPTY (not null:
    * `transcript_not_null` owns nulls).
    *
    * Defaults are deliberately wide (real speech sits at ~12–18 chars/sec;
    * the bounds only flag physically implausible pairings, not accents or
    * silence padding). Ordinary predicate checks: they ride every engine
    * path (modular, fused, grouped resumable, violation tags, config
    * enable/severity) like [[standaloneChecks]].
    */
  def transcriptChecks(minCharsPerSec: Double = 1.0,
                       maxCharsPerSec: Double = 500.0,
                       minDurForTranscriptMs: Int = 150,
                       durCol: String = "dur_ms",
                       transcriptCol: String = "transcript"): Seq[Check] = {
    // TRIMMED chars * 1000 / dur_ms (one multiply + one divide): the rate
    // must see the same character count as the presence guard, or
    // whitespace padding — the most common pairing artifact — both
    // inflates the rate and masks a genuinely too-sparse transcript
    // against the lower bound
    val cps = length(trim(col(transcriptCol))).cast("double") * lit(1000.0) /
      col(durCol).cast("double")
    Seq(
      Check("transcript_rate_plausible", RuleGroup.OutOfRange, Severity.Warning,
        col(transcriptCol).isNotNull && length(trim(col(transcriptCol))) > 0 &&
          col(durCol).isNotNull && col(durCol) > 0 &&
          (cps < minCharsPerSec || cps > maxCharsPerSec),
        s"speaking rate must stay in [$minCharsPerSec, $maxCharsPerSec] " +
          "chars/sec — outside is a wrong-pairing / truncation signal"),
      Check("transcript_nonempty_for_speech", RuleGroup.MissingValues, Severity.Warning,
        col(durCol).isNotNull && col(durCol) >= minDurForTranscriptMs &&
          col(transcriptCol).isNotNull && length(trim(col(transcriptCol))) === 0,
        s"clips >= ${minDurForTranscriptMs}ms must carry a non-empty " +
          "transcript (empty-string uploads bypass the null check)"))
  }

  /** Near-duplicate AUDIO CONTENT pairs by energy-envelope fingerprint
    * ([[graft.audio.Pcm.energyFingerprint64]]): all (id_a < id_b) pairs
    * within `maxHamming` bits. Catches re-encoded / noise-dithered copies
    * that exact byte hashing ([[graft.ops.Dedup.dedupExact]]) misses.
    *
    * Scale shape mirrors the simhash text path: the 64-bit fingerprint is
    * split into 4×16-bit bands — by pigeonhole, hamming ≤ 3 pairs agree on
    * at least one full band (complete recall for maxHamming ≤ 3) — ids
    * join per (band, bucket), buckets are capped deterministically so one
    * degenerate constant-envelope bucket cannot explode the self-join, and
    * one exact `bit_count(xor)` verifies each candidate. Only (id,
    * fingerprint) ever shuffles; payload bytes stay in the scan.
    */
  def fingerprintPairs(df: DataFrame, idCol: String,
                       bytesCol: String = "bytes",
                       maxHamming: Int = 3,
                       maxBucket: Int = 1000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4-band pigeonhole recall holds for maxHamming <= 3 only")
    val fps = df
      .select(col(idCol).as("id"),
        GraftFunctions.pcmFingerprint(col(bytesCol)).as("fp"))
      .filter(col("fp").isNotNull && col("fp") =!= 0L) // 0 = unfingerprintable
    val banded = fps.select(col("id"), col("fp"), posexplode(array(
        (0 until 4).map(b =>
          shiftrightunsigned(col("fp"), 16 * b).bitwiseAND(lit(0xFFFFL))): _*))
      .as(Seq("band", "bucket")))
    val capped = banded
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("band"), col("bucket")).orderBy(col("id"))))
      .filter(col("__rn") <= maxBucket)
      .drop("__rn")
    // renamed projections (fresh exprIds), not DataFrame aliases — same
    // discipline as Dedup.prefixFilterPairs: a same-lineage self-join on
    // `.as("a")/.as("b")` can silently resolve both condition sides to one
    // plan branch and swap/flip the pair order
    val lhs = capped.select(col("id").as("id_a"), col("fp").as("fp_a"),
      col("band").as("band_a"), col("bucket").as("bucket_a"))
    val rhs = capped.select(col("id").as("id_b"), col("fp").as("fp_b"),
      col("band").as("band_b"), col("bucket").as("bucket_b"))
    lhs.join(rhs,
        col("band_a") === col("band_b") && col("bucket_a") === col("bucket_b") &&
          col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("fp_a"), col("fp_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
