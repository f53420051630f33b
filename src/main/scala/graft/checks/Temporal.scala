package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal integrity checks over per-key validity intervals — the SCD-2 /
  * event-timeline invariants a warehouse mart must hold (the reference's
  * DDS layer keys facts by (entity, date) and assumes non-overlapping
  * validity; `/root/reference/sql/dds/fact_standing.sql` dedupes on the
  * latest matchday precisely because overlaps would double-count).
  *
  * Both checks are ONE window pass: hash-shuffle by key, sort by
  * (start, tieBreak), compare each interval to its predecessor via `lag`.
  * No self-join, no inequality-join intermediate — O(n log n) per key and
  * a single shuffle at any scale. `tieBreak` makes the predecessor
  * deterministic when two intervals share a start.
  */
object Temporal {

  private def withPrevEnd(df: DataFrame, key: Column, start: Column,
                          end: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(start, tieBreak)
    df.withColumn("__start", start)
      .withColumn("__prev_end", lag(end, 1).over(w))
  }

  /** Rows whose [start, end) interval overlaps the PREVIOUS interval of the
    * same key (start < previous end). Covers all pairwise overlaps when
    * intervals have equal length (e.g. fixed validity windows); for mixed
    * lengths replace `lag(end)` with a running `max(end)` — see
    * [[overlapsAnyPrior]].
    */
  def overlaps(df: DataFrame, key: Column, start: Column, end: Column,
               tieBreak: Column): DataFrame =
    withPrevEnd(df, key, start, end, tieBreak)
      .filter(col("__prev_end").isNotNull && col("__start") < col("__prev_end"))
      .drop("__start", "__prev_end")

  /** Overlap check robust to mixed interval lengths: compares each start to
    * the running MAX of all prior ends for the key (an interval can overlap
    * a non-adjacent predecessor that outlasts its neighbours).
    */
  def overlapsAnyPrior(df: DataFrame, key: Column, start: Column, end: Column,
                       tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(start, tieBreak)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__start", start)
      .withColumn("__max_prev_end", max(end).over(w))
      .filter(col("__max_prev_end").isNotNull && col("__start") < col("__max_prev_end"))
      .drop("__start", "__max_prev_end")
  }

  /** Rows that leave a gap after the previous interval of the same key
    * (start > previous end) — continuity violations in an SCD-2 chain.
    */
  def gaps(df: DataFrame, key: Column, start: Column, end: Column,
           tieBreak: Column): DataFrame =
    withPrevEnd(df, key, start, end, tieBreak)
      .filter(col("__prev_end").isNotNull && col("__start") > col("__prev_end"))
      .drop("__start", "__prev_end")
}
