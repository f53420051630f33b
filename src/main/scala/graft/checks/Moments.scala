package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-column correlation profile with EXACT, order-independent moments.
  *
  * `corr()` in any SQL engine streams floating-point co-moments whose
  * result depends on partition boundaries and merge order — two runs of
  * the same engine can disagree in the last ulps, and two ENGINES always
  * do, which breaks the cross-engine agreement contract this validation
  * engine inherits from the reference's multi-tool runs
  * (`etl_validation/runner.py`). Instead the five raw moments
  * (Σx, Σy, Σxy, Σx², Σy²) are accumulated in DECIMAL:
  * inputs cast to DECIMAL(18,2) (exact for currency/quantity columns),
  * products are DECIMAL(37,4) — within Spark's 38-digit limit, so NO
  * precision loss or rounding anywhere in the aggregation — and decimal
  * sums are exact and commutative. Pearson r is then ONE deterministic
  * double expression over the six exact scalars.
  *
  * All pairs share a single scan (one codegen'd partial+final aggregate,
  * 1-row result) — the same C16 pivot shape as the check engine.
  */
object Moments {

  private val In = DecimalType(18, 2)

  /** One row with `corr_<x>_<y>_1e6` = floor(r·1e6) per requested pair. */
  def corrProfile(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "corrProfile: at least one column pair")
    val cols = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val sums: Seq[Column] =
      Seq(count(lit(1)).as("__n")) ++
        cols.map(c => sum(col(c).cast(In)).as(s"__s_$c")) ++
        cols.map(c => sum(col(c).cast(In) * col(c).cast(In)).as(s"__s2_$c")) ++
        pairs.map { case (x, y) =>
          sum(col(x).cast(In) * col(y).cast(In)).as(s"__sxy_${x}_$y")
        }
    val agg = df.agg(sums.head, sums.tail: _*)
    val n = col("__n").cast("double")
    val outs = pairs.map { case (x, y) =>
      val sx = col(s"__s_$x").cast("double")
      val sy = col(s"__s_$y").cast("double")
      val sxx = col(s"__s2_$x").cast("double")
      val syy = col(s"__s2_$y").cast("double")
      val sxy = col(s"__sxy_${x}_$y").cast("double")
      val r = (n * sxy - sx * sy) /
        sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      floor(r * lit(1e6)).cast("long").as(s"corr_${x}_${y}_1e6")
    }
    agg.select(outs: _*)
  }
}
