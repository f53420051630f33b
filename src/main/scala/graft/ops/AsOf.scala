package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
  * the most recent right-side row forward with `last(_, ignoreNulls)` over
  * an UnboundedPreceding→CurrentRow frame. Spark evaluates running frames
  * incrementally, so the cost is a single hash shuffle of |left| + |right|
  * narrow rows plus one sort — the same class as the sort-merge pass a
  * native as-of operator would run, with no quadratic intermediate.
  *
  * WHOLE-ROW semantics: the right payload columns travel as ONE struct, so
  * every output payload column comes from the SAME matched right row — a
  * right row legitimately carrying NULL in one payload column keeps that
  * NULL rather than inheriting an older row's value (per-column
  * `last(_, ignoreNulls)` would mix rows; DuckDB/kdb/pandas ASOF all pick
  * the whole latest row, nulls included).
  *
  * Ties: a right row AT the left row's timestamp matches (`<=`), because
  * side 0 (right) sorts before side 1 (left) at equal time. The right side
  * must be unique per (key, time) — pre-aggregate it otherwise, or the
  * match is ambiguous in ANY as-of implementation (DuckDB picks an
  * arbitrary row; we require the caller to decide).
  *
  * Skew: one hot key serializes its window partition here. For a key
  * carrying a large fraction of all rows use [[asofJoinBucketed]], which
  * partitions each key's time axis into range buckets, runs the window per
  * (key, bucket), and carries the latest right row across bucket
  * boundaries with one tiny per-key window over bucket summaries — the
  * same rows, at (key, bucket) parallelism.
  */
object AsOf {

  /** Internal: tagged union of both sides with the right payload packed
    * into one `__r` struct — (__k, __t, __side, leftCols..., __r).
    */
  private def taggedUnion(left: DataFrame, right: DataFrame, key: String,
                          leftTime: String, rightTime: String,
                          rightCols: Seq[String]): (DataFrame, Seq[String]) = {
    require(rightCols.nonEmpty, "asofJoin: rightCols must name at least one payload column")
    val collisions = rightCols.toSet intersect left.columns.toSet
    require(collisions.isEmpty, s"asofJoin: right payload columns collide with left: $collisions")
    val leftCols = left.columns.toSeq
    val rStructType = StructType(rightCols.map(c => right.schema(c)))
    val lSide = left
      .select(Seq(col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftCols.map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val rSide = right
      .select(Seq(col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(c => col(c).as(c)): _*).as("__r"): _*)
    (lSide.unionByName(rSide), leftCols)
  }

  /** Unpack the matched `__r` struct into the payload columns and keep the
    * left rows only.
    */
  private def unpack(filled: DataFrame, leftCols: Seq[String],
                     rightCols: Seq[String]): DataFrame =
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col("__match").getField(c).as(c)): _*)

  /** Left columns plus `rightCols` (null where no right row precedes).
    * `rightCols` must not collide with left column names.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String]): DataFrame = {
    val (unioned, leftCols) = taggedUnion(left, right, key, leftTime, rightTime, rightCols)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unpack(unioned.withColumn("__match", last(col("__r"), ignoreNulls = true).over(w)),
      leftCols, rightCols)
  }

  /** Skew-safe variant: identical output to [[asofJoin]], computed at
    * (key, time-bucket) parallelism so a hot key never serializes one
    * window partition.
    *
    *  1. bucket the time axis into `buckets` equal-width ranges over the
    *     observed [min, max] of both sides (extrema via two one-row
    *     aggregates broadcast back — nothing collects);
    *  2. the running-carry window runs per (key, bucket) — within a
    *     bucket, exactly the [[asofJoin]] semantics;
    *  3. boundary carry: per (key, bucket) the LAST right row in that
    *     bucket (one hash aggregate, `max` over a (time, payload) struct —
    *     time buckets are ranges, so struct order by time is the as-of
    *     order), then one window over the key's BUCKET SUMMARIES (at most
    *     `buckets` rows per key, never row-scale) yields the latest right
    *     row from any earlier bucket, joined back on (key, bucket);
    *  4. a left row unmatched within its own bucket takes the carry.
    *
    * Cost: one union shuffle on (key, bucket), one same-partitioning hash
    * aggregate + distinct, one tiny per-key window, one (key, bucket)
    * join. `buckets` trades skew resistance for bucket-summary volume;
    * 32–1024 is the practical range (default 64 ≈ one straggler split
    * into 64 parallel slices).
    */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, key: String,
                       leftTime: String, rightTime: String,
                       rightCols: Seq[String], buckets: Int = 64): DataFrame = {
    require(buckets >= 2, "asofJoinBucketed: need at least 2 buckets (use asofJoin for 1)")
    val (unioned0, leftCols) = taggedUnion(left, right, key, leftTime, rightTime, rightCols)
    // numeric view of the time axis for bucketing only (the window still
    // orders by __t itself): timestamps go through an epoch-seconds cast —
    // TIMESTAMP(_NTZ) -> DOUBLE directly is not a valid Spark cast, and
    // bucketing needs any MONOTONE numeric map, so a constant tz offset is
    // irrelevant
    def tNum: Column = unioned0.schema("__t").dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        col("__t").cast("timestamp").cast("double")
      case _ => col("__t").cast("double")
    }
    // observed time extrema across both sides: one-row aggregate, broadcast
    val ext = unioned0
      .agg(min(tNum).as("__lo"), max(tNum).as("__hi"))
    val bucketOf: Column = {
      val t = tNum
      val width = (col("__hi") - col("__lo")) / buckets
      // NULL time → bucket 0 (round-4 ADVICE): a NULL `__t` sorts FIRST in
      // asofJoin's window (nulls-first ascending) and matches nothing —
      // bucket 0 with no carry-in reproduces exactly that (null payload),
      // instead of a null/arbitrary bucket diverging from the plain plan
      when(t.isNull, lit(0))
        .when(col("__hi") <= col("__lo"), lit(0))
        .otherwise(least(lit(buckets - 1),
          floor((t - col("__lo")) / width).cast("int")))
    }
    val unioned = unioned0.crossJoin(broadcast(ext))
      .withColumn("__b", bucketOf)
      .drop("__lo", "__hi")
    // in-bucket running carry at (key, bucket) parallelism
    val wIn = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = unioned
      .withColumn("__infill", last(col("__r"), ignoreNulls = true).over(wIn))
    // boundary carry: last right row per (key, bucket) → latest from any
    // strictly-earlier bucket, over the (key, bucket) universe of BOTH
    // sides (a left-only bucket still needs its carry-in)
    val lastPerBucket = unioned.filter(col("__side") === 0)
      .groupBy(col("__k"), col("__b"))
      .agg(max(struct(col("__t").as("t"), col("__r").as("r"))).as("__last"))
    val universe = unioned.select(col("__k"), col("__b")).distinct()
    val wCarry = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = universe
      .join(lastPerBucket, Seq("__k", "__b"), "left_outer")
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(wCarry)
        .getField("r"))
      .select(col("__k"), col("__b"), col("__carry"))
    val filled = inBucket
      .join(carry, Seq("__k", "__b"))
      .withColumn("__match", coalesce(col("__infill"), col("__carry")))
    unpack(filled, leftCols, rightCols)
  }
}
