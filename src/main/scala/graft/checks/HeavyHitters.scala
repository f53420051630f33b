package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** EXACT heavy hitters (frequent values above a relative share) with
  * bounded memory at any cardinality — the "dominant codec / hot key"
  * profile a skew-aware validation run needs before it picks salting
  * factors (SURVEY §7.5; the reference hard-codes its hot domains,
  * `validators/specs.py` codec/status whitelists).
  *
  * A plain `groupBy(value).count().filter(...)` is exact but shuffles one
  * row per DISTINCT value — 10^9 distinct keys of shuffle for a question
  * whose answer has at most `den/num` rows. Two bounded passes instead:
  *
  *  1. **Misra–Gries candidate pass** (Misra & Gries 1982; merge rule from
  *     Agarwal et al., "Mergeable Summaries", PODS 2012): each partition
  *     folds its values into a ≤`capacity`-entry counter map (decrement-all
  *     on overflow), partials merge pairwise by summing counters and
  *     subtracting the (capacity+1)-th largest. Guarantee: every value with
  *     true count > N/(capacity+1) SURVIVES the sketch — with
  *     capacity ≥ 2·den/num, a superset of all true heavy hitters, never a
  *     miss. Only O(capacity) ever reaches the driver.
  *  2. **Exact recount** of the candidate set: one pruned scan filtered by
  *     the broadcast candidates (at most `capacity` distinct keys → tiny
  *     hash aggregate), plus a total count. The published threshold test is
  *     pure integer math — `cnt · den ≥ total · num` — so the output is
  *     EXACT and engine-portable (no float share to disagree on).
  */
object HeavyHitters {

  /** Merge two MG counter maps in place (a grows), enforcing `cap`. */
  private[checks] def mgMerge(a: mutable.HashMap[String, Long],
                              b: mutable.HashMap[String, Long],
                              cap: Int): mutable.HashMap[String, Long] = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    if (a.size > cap) {
      // subtract the (cap+1)-th largest counter from all, drop non-positive
      val kth = a.values.toArray.sorted(Ordering[Long].reverse).apply(cap)
      val keep = a.iterator.filter(_._2 > kth).toSeq
      a.clear()
      keep.foreach { case (k, v) => a.update(k, v - kth) }
    }
    a
  }

  private[checks] def mgReduce(m: mutable.HashMap[String, Long], x: String,
                               cap: Int): mutable.HashMap[String, Long] = {
    m.get(x) match {
      case Some(c) => m.update(x, c + 1)
      case None if m.size < cap => m.update(x, 1L)
      case None => // decrement-all, drop zeros (amortized O(1) per input)
        val dead = mutable.ArrayBuffer.empty[String]
        m.foreach { case (k, v) => if (v == 1L) dead += k else m.update(k, v - 1) }
        dead.foreach(m.remove)
    }
    m
  }

  /** Values of `column` whose count satisfies cnt·den ≥ total·num,
    * with their exact counts: (value, cnt), cnt descending.
    * `capacity` defaults to 2·den/num (sketch guarantee with 2x slack).
    */
  def heavyHitters(df: DataFrame, column: String, num: Long, den: Long,
                   capacity: Int = 0): DataFrame = {
    require(num > 0 && den >= num, s"share $num/$den must be in (0,1]")
    val cap = if (capacity > 0) capacity else math.min(2L * den / num, 1000000L).toInt
    val vals = df.select(col(column).cast("string").as("value"))
      .filter(col("value").isNotNull)
    val candidates = vals.rdd
      .map(_.getString(0))
      .treeAggregate(mutable.HashMap.empty[String, Long])(
        (m, x) => mgReduce(m, x, cap),
        (a, b) => mgMerge(a, b, cap))
      .keys.toSeq
    val spark = df.sparkSession
    if (candidates.isEmpty) {
      import spark.implicits._
      return Seq.empty[(String, Long)].toDF("value", "cnt")
    }
    val total = vals.count()
    vals.filter(col("value").isin(candidates: _*))
      .groupBy(col("value"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(den) >= lit(total) * lit(num))
      .orderBy(col("cnt").desc, col("value"))
  }
}
