package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal lookup) join — for every left row, the single latest
  * right row with the same key and `rightTime <= leftTime`.
  *
  * Spark has no native ASOF JOIN (DuckDB, kdb and pandas do; the reference's
  * mart layer approximates one with correlated `max(matchday)` subqueries,
  * `/root/reference/sql/dds/fact_standing.sql`). A naive translation —
  * equi-join on key plus a `<=` range predicate, then pick max per left
  * row — materializes the O(|left| × |right-per-key|) inequality-join
  * intermediate before collapsing it; on a hot key that is quadratic.
  *
  * Scalable composition instead: tag both sides, UNION them on an aligned
  * schema, and run ONE window over (key) ordered by (time, side) carrying
  * the most recent right-side payload forward with `last(_, ignoreNulls)`
  * over an UnboundedPreceding→CurrentRow frame. Spark evaluates running
  * frames incrementally, so the cost is a single hash shuffle of
  * |left| + |right| narrow rows plus one sort — the same class as the
  * sort-merge pass a native as-of operator would run, with no quadratic
  * intermediate at any point.
  *
  * Ties: a right row AT the left row's timestamp matches (`<=`), because
  * side 0 (right) sorts before side 1 (left) at equal time. The right side
  * must be unique per (key, time) — pre-aggregate it otherwise, or the
  * match is ambiguous in ANY as-of implementation (DuckDB picks an
  * arbitrary row; we require the caller to decide).
  *
  * Skew: one hot key serializes its window partition. For a key carrying a
  * large fraction of all rows, range-bucket the time axis per key and run
  * the window per (key, bucket) with a boundary carry join — not needed at
  * the volumes the validation engine sees per entity key.
  */
object AsOf {

  /** Left columns plus `rightCols` (null where no right row precedes).
    * `rightCols` must not collide with left column names.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String]): DataFrame = {
    require(rightCols.nonEmpty, "asofJoin: rightCols must name at least one payload column")
    val collisions = rightCols.toSet intersect left.columns.toSet
    require(collisions.isEmpty, s"asofJoin: right payload columns collide with left: $collisions")

    val leftCols = left.columns.toSeq
    val lSide = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col(key).as("__k"), col("__t"), col("__side")) ++
        leftCols.map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rSide = right
      .select(Seq(col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(col): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lSide.unionByName(rSide)
      .select(Seq(col("__side")) ++ leftCols.map(col) ++
        rightCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
    filled.filter(col("__side") === 1).drop("__side")
  }
}
