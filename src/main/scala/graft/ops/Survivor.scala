package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Survivorship / golden-record construction: after deduplication decides
  * which rows describe the same entity, merge them into one record by
  * taking, PER COLUMN, the most recent non-null value — the standard MDM
  * "latest wins, but never let a null overwrite data" rule. The
  * reference's payload picker keeps the single latest payload per entity
  * (`/root/reference/src/app2/etl_validation/stg_loader.py` latest-run
  * rank); survivorship generalises it to column-level merging across the
  * duplicate set.
  */
object Survivor {

  /** One row per key: for each value column the value from the latest row
    * (by `orderCols`, lexicographic) WHERE THAT COLUMN IS NON-NULL, plus
    * `n_merged` = how many rows collapsed into the record.
    *
    * Implementation is a single hash aggregate — per value column an
    * argmax via `max(struct(orderCols…, value))` over non-null values
    * only, so each column independently finds its latest non-null without
    * any window, sort, or self-join; map-side partial aggregation does
    * the heavy collapsing before the one shuffle on the key. Ties on the
    * full order tuple resolve by the value itself (struct comparison is
    * lexicographic), keeping the output deterministic even on duplicate
    * timestamps.
    */
  def goldenRecord(df: DataFrame, keyCols: Seq[String],
                   orderCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "at least one value column")
    val aggs = valueCols.map { c =>
      max(when(col(c).isNotNull,
        struct(orderCols.map(col) :+ col(c).as("__v"): _*)))
        .getField("__v").as(s"last_$c")
    } :+ count(lit(1)).as("n_merged")
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
