package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-distribution diagnostics — the measurements behind the engine's
  * skew-handling decisions (salting fan-out, AQE skew-join thresholds,
  * broadcast cutoffs). The reference hard-codes its hot-key handling into
  * per-table SQL (`/root/reference/src/app2/etl_validation/specs.py`
  * uniqueness groups); at 10^12 rows the decision must be DATA-driven,
  * so the profile itself has to be a cheap first-class operator.
  */
object Skew {

  /** ONE summary row describing how concentrated a key is:
    * (n_rows, n_keys, max_cnt, topk_cnt, max_share_1e6, topk_share_1e6).
    *
    * `max_share_1e6` ≈ the fraction of all rows owned by the single
    * hottest key — the direct sizing input for a salting fan-out (a key
    * holding 1/s of the table needs ~s·cores/parallelism salt buckets);
    * `topk_share_1e6` (share of the k hottest keys) distinguishes one
    * rogue key from a generally heavy head.
    *
    * Plan shape: one hash aggregation to per-key counts (map-side
    * combine), then two O(n_keys) reductions — a global one-row aggregate
    * and a TakeOrderedAndProject top-k (count desc, key asc tiebreak so
    * ties never make the answer run-dependent) — joined by broadcast.
    * Nothing sorts the full key set and no global window is involved, so
    * the operator costs one shuffle of (key, count) pairs at any scale.
    */
  def keySkewProfile(df: DataFrame, keyCols: Seq[String], topK: Int = 10): DataFrame = {
    require(topK > 0, "topK must be positive")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"), max(col("cnt")).as("max_cnt"))
    val topk = counts
      .orderBy(col("cnt").desc +: keyCols.map(c => col(c).asc): _*)
      .limit(topK)
      .agg(sum(col("cnt")).as("topk_cnt"))
    totals.crossJoin(broadcast(topk))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"), col("topk_cnt"),
        // counts widened to double before scaling: cnt·1e6 in longs
        // overflows beyond ~9×10^12 rows; doubles are exact to 2^53 and
        // the shape (cnt·1e6)/n_rows matches the oracle op-for-op
        floor(col("max_cnt").cast("double") * lit(1e6) / col("n_rows"))
          .cast("long").as("max_share_1e6"),
        floor(col("topk_cnt").cast("double") * lit(1e6) / col("n_rows"))
          .cast("long").as("topk_share_1e6"))
  }

  /** Candidate-key discovery: for each named column, exact distinct count
    * vs row count and the uniqueness ratio — one row per column,
    * `is_candidate_key` when every row is distinct. The profiling step
    * before declaring a uniqueness rule on a table nobody documented.
    *
    * One two-phase distinct aggregate PER column (distinct column values
    * collapse map-side, then a count), run as independent narrow plans and
    * unioned — NOT one mixed multi-countDistinct aggregate, which would
    * plan an Expand duplicating every row ×columns through the shuffle.
    * Each per-column plan prunes the scan to that single column.
    */
  def keyCandidates(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "at least one column")
    columns.map { c =>
      val d = df.select(col(c)).filter(col(c).isNotNull).distinct()
        .agg(count(lit(1)).as("n_distinct"))
      df.agg(count(lit(1)).as("n_rows")).crossJoin(broadcast(d))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_distinct"),
          floor(col("n_distinct").cast("double") * lit(1e6) / col("n_rows"))
            .cast("long").as("uniqueness_1e6"),
          (col("n_distinct") === col("n_rows")).as("is_candidate_key"))
    }.reduce(_.unionByName(_))
  }
}
