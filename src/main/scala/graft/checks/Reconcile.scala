package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model._

/** Reference ↔ candidate dataset reconciliation — the source
  * completeness/exclusivity pair from the reference
  * (`dds/source_suite/matches_source.py:18-97`): missing keys (in source,
  * absent from target) and extra keys (in target, absent from source),
  * both as LEFT ANTI joins on up to composite keys
  * (`standings_source.py:23-48` uses a 4-column key).
  *
  * Scale: big×big anti-join → sort-merge with AQE skew-join splitting.
  * Both sides are first reduced to their key projection (bytes and other
  * wide columns pruned before the shuffle). Because both tables are
  * partitioned by part_id and part_id is in the key, the shuffle is
  * co-partitionable (storage-partitioned join / bucketing on a real
  * cluster).
  */
object Reconcile {

  /** Keys present in `ref` but missing from `cand` (source completeness). */
  def missing(ref: DataFrame, cand: DataFrame, keyCols: Seq[String]): DataFrame = {
    val nonNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    ref.select(keyCols.map(col): _*).filter(nonNull).distinct()
      .join(cand.select(keyCols.map(col): _*).filter(nonNull).distinct(),
        keyCols, "left_anti")
  }

  /** Keys present in `cand` but absent from `ref` (source exclusivity). */
  def extra(ref: DataFrame, cand: DataFrame, keyCols: Seq[String]): DataFrame =
    missing(cand, ref, keyCols)

  final case class ReconcileOutcome(missingCount: Long, extraCount: Long,
                                    outcomes: Seq[CheckOutcome])

  /** Both directions in ONE job: full-outer join of the two key sets with
    * presence flags, then a single count aggregate — halves the actions and
    * shuffles of running the two anti-join counts separately.
    */
  def check(ref: DataFrame, cand: DataFrame, keyCols: Seq[String],
            namePrefix: String): ReconcileOutcome = {
    val nonNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    val rk = ref.select(keyCols.map(col): _*).filter(nonNull).distinct()
      .withColumn("__r", lit(true))
    val ck = cand.select(keyCols.map(col): _*).filter(nonNull).distinct()
      .withColumn("__c", lit(true))
    val row = rk.join(ck, keyCols, "full_outer").agg(
      sum(when(col("__c").isNull, 1L).otherwise(0L)),
      sum(when(col("__r").isNull, 1L).otherwise(0L))).head()
    val m = if (row.isNullAt(0)) 0L else row.getLong(0)
    val e = if (row.isNullAt(1)) 0L else row.getLong(1)
    ReconcileOutcome(m, e, Seq(
      CheckOutcome(s"${namePrefix}_completeness", RuleGroup.Reconciliation.toString,
        Severity.Error.toString, CheckOutcome.status(Severity.Error, m).toString, m,
        message = if (m > 0) Some(s"$m key(s) missing from candidate") else None),
      CheckOutcome(s"${namePrefix}_exclusivity", RuleGroup.Reconciliation.toString,
        Severity.Warning.toString, CheckOutcome.status(Severity.Warning, e).toString, e,
        message = if (e > 0) Some(s"$e extra key(s) in candidate") else None)))
  }

  /** Full-outer diff with change detection — the golden-snapshot diff
    * (`report.py:538-662`: added/removed/changed rows by business key).
    * `compareCols` are compared null-safely; output is tagged
    * added|removed|changed.
    */
  def diff(ref: DataFrame, cand: DataFrame, keyCols: Seq[String],
           compareCols: Seq[String]): DataFrame = {
    val r = compareCols.foldLeft(ref.select((keyCols ++ compareCols).map(col): _*)) {
      (d, c) => d.withColumnRenamed(c, s"ref_$c")
    }.withColumn("__ref_present", lit(true))
    val c = compareCols.foldLeft(cand.select((keyCols ++ compareCols).map(col): _*)) {
      (d, cc) => d.withColumnRenamed(cc, s"cand_$cc")
    }.withColumn("__cand_present", lit(true))
    val joined = r.join(c, keyCols, "full_outer")
    val refPresent = col("__ref_present").isNotNull
    val candPresent = col("__cand_present").isNotNull
    val changed = compareCols
      .map(cc => !(col(s"ref_$cc") <=> col(s"cand_$cc"))).reduce(_ || _)
    joined.withColumn("diff_kind",
      when(refPresent && !candPresent, lit("removed"))
        .when(!refPresent && candPresent, lit("added"))
        .when(changed, lit("changed"))
        .otherwise(lit("same")))
      .filter(col("diff_kind") =!= "same")
      .drop("__ref_present", "__cand_present")
  }
}
