package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column validation: per-vector norm/finiteness profile for an
  * `array<float>` column — the vector-payload analogue of the reference's
  * per-column null/domain checks. A corrupted embedding pipeline shows up
  * as NaN/Inf elements, zero vectors (failed encoder), wrong
  * dimensionality, or norm drift; all four are caught by one narrow
  * projection with no shuffle at all.
  */
object VectorQuality {

  /** One row per vector: (id, dim, n_nonfinite, is_zero, norm_1e6).
    *
    *  - `dim`: element count — a GROUP BY over it catches ragged batches.
    *  - `n_nonfinite`: elements where `x − x ≠ 0` (true exactly for NaN
    *    and ±Inf in both Spark and DuckDB NaN-comparison semantics, so the
    *    expression is oracle-portable), plus null elements.
    *  - `is_zero`: every element exactly 0 — a failed encoder's output.
    *  - `norm_1e6`: `floor(sqrt(Σx²)·1e6)` with each float widened to
    *    double BEFORE multiplying and summed in array order — bit-identical
    *    across engines (float→double is exact; IEEE ops in a fixed order).
    *    NaN/Inf vectors yield a null norm rather than poisoning downstream
    *    aggregates.
    *
    * Everything is codegen'd higher-order `Column` expressions over the
    * array — no UDF, no explode, so a 10^12-vector scan stays one
    * WholeStageCodegen pass with column pruning intact.
    */
  def vectorProfile(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val bad = size(filter(v, x =>
      x.isNull || (x - x) =!= lit(0.0f))).as("n_nonfinite")
    val sumSq = aggregate(v, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    df.select(
      col(idCol),
      size(v).as("dim"),
      bad,
      (size(filter(v, x => x === lit(0.0f))) === size(v)).as("is_zero"),
      when(size(v) > 0 &&
          size(filter(v, x => x.isNull || (x - x) =!= lit(0.0f))) === 0,
        floor(sqrt(sumSq) * lit(1e6)).cast("long")).as("norm_1e6"))
  }

  /** Verdict twin: ONE summary row over the whole column —
    * (n_vectors, n_dims distinct, n_nonfinite_vectors, n_zero_vectors,
    * min/max norm) — the shape a per-ingest-batch embedding check reports.
    * Two-phase distinct (pre-aggregate per dim, then roll up) keeps the
    * plan Expand-free despite mixing a distinct count with plain sums.
    */
  def vectorCheck(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    vectorProfile(df, idCol, vecCol)
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("__n"),
        sum(when(col("n_nonfinite") > 0, 1L).otherwise(0L)).as("__nf"),
        sum(when(col("is_zero"), 1L).otherwise(0L)).as("__z"),
        min(col("norm_1e6")).as("__mn"),
        max(col("norm_1e6")).as("__mx"))
      .agg(
        sum(col("__n")).as("n_vectors"),
        count(lit(1)).as("n_dims"),
        sum(col("__nf")).as("n_nonfinite_vectors"),
        sum(col("__z")).as("n_zero_vectors"),
        min(col("__mn")).as("min_norm_1e6"),
        max(col("__mx")).as("max_norm_1e6"))
}
