package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling — validation on a reproducible
  * pseudo-random subset.
  *
  * `df.sample()` seeds per-partition RNGs, so the selected rows change with
  * partitioning, task retries, and engine — useless for the reference's
  * cross-tool agreement model (every tool must check the SAME rows,
  * `etl_validation/runner.py`) and for audit reproducibility. Hash-based
  * sampling instead: a row is in the sample iff a hash of its key falls in
  * a fixed bucket range. Same key set → same sample, on any engine, any
  * partitioning, any day.
  *
  * Two hash flavors:
  *  - [[sampleByHash]]: `xxhash64` — codegen'd, fastest, Spark-specific
  *    (the production monitoring path);
  *  - [[samplePortable]]: first hex nibble of `md5` of the concatenated
  *    key — slower but bit-identical across Spark / DuckDB / Postgres /
  *    Trino, the cross-engine agreement path (rate in sixteenths).
  *
  * Both push down as plain predicates: the sample SCAN prunes at the
  * source, no materialized sample table to keep in sync.
  */
object Sampling {

  /** Keep ~`num/den` of rows by bucketing xxhash64 of the key columns.
    * pmod keeps the bucket non-negative.
    */
  def sampleByHash(df: DataFrame, keys: Seq[Column], num: Int, den: Int): DataFrame = {
    require(num > 0 && den >= num, s"rate $num/$den must be in (0,1]")
    df.filter(pmod(xxhash64(keys: _*), lit(den)) < lit(num))
  }

  /** Keep `sixteenths/16` of rows: md5 hex of the '#'-joined key columns,
    * first nibble < threshold. Oracle twin (DuckDB/Postgres):
    * `substr(md5(k1 || '#' || k2), 1, 1) < '<nibble>'` — hex digits sort
    * 0-9a-f in ASCII, so the comparison is identical everywhere.
    */
  def samplePortable(df: DataFrame, keys: Seq[Column], sixteenths: Int): DataFrame = {
    require(sixteenths > 0 && sixteenths <= 16, "sixteenths in 1..16")
    if (sixteenths == 16) return df
    val nibble = nibbleChar(sixteenths)
    df.filter(substring(md5(concat_ws("#", keys: _*)), 1, 1) < lit(nibble))
  }

  private def nibbleChar(sixteenths: Int): String =
    if (sixteenths == 16) "g" // '>' every hex digit: keep all
    else "0123456789abcdef".charAt(sixteenths).toString

  /** STRATIFIED deterministic sample: a per-group rate (in sixteenths) on
    * top of the same md5-nibble bucketing — downsample the dominant
    * stratum hard while keeping the rare strata dense, the standard
    * recipe for rebalancing skewed training corpora (hot codec / dominant
    * language), reproducibly. Same hash ⇒ a row's membership is MONOTONE
    * in its group's rate and consistent across engines, partitionings and
    * runs; the whole thing stays one scan predicate (CASE over the group
    * column), pushdown-friendly, no per-group anti-join.
    */
  /** Deterministic WEIGHTED sampling: a row is kept with probability
    * weight/maxWeight, decided by a 32-bit uniform from its key's md5 —
    * the standard quality/length-weighted data-selection step of a
    * training pipeline, reproducible across engines/partitionings/runs.
    *
    * The comparison is ALL-INTEGER (`h32 · maxWeight < weight · 2³²`), so
    * there is no float-rounding edge to diverge between engines; the
    * oracle twin is
    * `CAST('0x' || substr(md5(key),1,8) AS BIGINT) * maxW < w * 4294967296`
    * (both engines emit lowercase-hex md5). `weight ≥ maxWeight` keeps the
    * row always; a NULL weight DROPS the row (null predicate — same
    * exclusion an SQL twin computes, so cross-engine agreement holds; pass
    * `coalesce(w, lit(0))` to make the drop explicit). Still a single scan
    * predicate — pushdown-friendly, no shuffle, no sample table to
    * maintain.
    *
    * The weight column is CLAMPED into [0, maxWeight] inside the operator
    * (round-5 ADVICE): `require` bounds maxWeight but not the data, and an
    * unclamped weight > ~2.1e9 would overflow `weight·2³²` in Long,
    * silently flipping "weight ≥ maxWeight keeps the row" into wrong
    * exclusions (symmetrically, a huge negative weight would wrap to
    * wrong INclusions). Saturating keeps the kept-row set identical to the
    * mathematical predicate — w ≥ maxWeight is always-keep, w ≤ 0 is
    * always-drop — so the oracle twin is unchanged; NULL stays NULL (the
    * clamp is a CASE, never `least`, whose null-skipping would resurrect
    * NULL-weight rows).
    */
  def sampleWeightedPortable(df: DataFrame, keys: Seq[Column],
                             weight: Column, maxWeight: Long): DataFrame = {
    require(maxWeight > 0 && maxWeight <= 2000000L,
      "maxWeight in 1..2e6 (keeps h32*maxWeight inside Long)")
    val h32 = conv(substring(md5(concat_ws("#", keys: _*)), 1, 8), 16, 10)
      .cast("long")
    val wl = weight.cast("long")
    val w = when(wl > lit(maxWeight), lit(maxWeight))
      .when(wl < lit(0L), lit(0L))
      .otherwise(wl)
    df.filter(h32 * lit(maxWeight) < w * lit(4294967296L))
  }

  def sampleStratifiedPortable(df: DataFrame, keys: Seq[Column],
                               groupCol: Column,
                               rates: Map[String, Int],
                               defaultSixteenths: Int): DataFrame = {
    require((rates.values.toSeq :+ defaultSixteenths).forall(r => r > 0 && r <= 16),
      "every rate must be in 1..16 sixteenths")
    val threshold = rates.foldLeft(lit(nibbleChar(defaultSixteenths))) {
      case (acc, (g, r)) => when(groupCol === g, lit(nibbleChar(r))).otherwise(acc)
    }
    df.filter(substring(md5(concat_ws("#", keys: _*)), 1, 1) < threshold)
  }
}
