package graft

import org.apache.spark.sql.execution.{ExpandExec, SparkPlan}
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Whole-surface plan regression gate (round-5 VERDICT #2): every
  * `SparkEntry.queries` physical plan is rendered and asserted free of the
  * three scale-killers that per-round plan audits kept hunting by hand —
  *
  *  - `CartesianProduct`: O(n·m) row pairing. The ONLY tolerated shapes are
  *    the documented brute-force oracle twins (whose scale paths are the
  *    LSH/IVF/prefix-filter queries) — enumerated in [[cartesianOk]].
  *    Broadcast one-row totals compile to BroadcastNestedLoopJoin, not
  *    CartesianProduct, so they never trip this detector.
  *  - unbounded single-partition `Window` (empty partitionBy): drags the
  *    whole input through ONE task — the q_histogram/entropy family was
  *    specifically rebuilt on broadcast one-row aggregates to avoid it.
  *  - `Expand`: multiplies every input row per grouping set (the mixed
  *    countDistinct shape PlanSpec bans from the mart KPI) — banned
  *    everywhere except the enumerated queries whose Expand is over
  *    already-aggregated tiny inputs.
  *
  * Allowlists are asserted with EXACT set equality, so a query that stops
  * needing its exemption fails the gate too (stale allowlist = red).
  *
  * Detection runs on `queryExecution.sparkPlan` (the selected physical
  * plan, pre-AQE wrapping) and traverses subqueries. Streaming replay
  * queries execute their bounded audit replay during construction (the
  * returned memory-sink table is what gets planned here); their streaming
  * plans are pinned by StreamingSpec's broadcast/state assertions.
  */
class PlanGuardSpec extends SparkSpec {

  private val dir = SparkEntry.SmokeSfDir

  /** All three allowlists are EMPTY at round 6: even the brute-force
    * O(n²) oracle twins (q_embed_pairs / q_ann_topk) express their pairing
    * as a broadcast nested-loop join rather than a CartesianProduct, every
    * global statistic rides a broadcast one-row aggregate instead of an
    * unpartitioned window, and the last Expand (q_stats_orders' two
    * countDistinct groups in one aggregate) was split into two
    * single-distinct-group aggregates. A future exemption must be
    * documented here with the reason and its scale path.
    */
  private val cartesianOk: Set[String] = Set()
  private val globalWindowOk: Set[String] = Set()
  private val expandOk: Set[String] = Set()

  test("no query plan contains an unlisted CartesianProduct / global Window / Expand") {
    val found = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.sparkPlan
      val nodes: Seq[SparkPlan] = plan.collectWithSubqueries { case p => p }
      val cartesian = nodes.exists(_.isInstanceOf[CartesianProductExec])
      val globalWindow = nodes.exists {
        case w: WindowExec => w.partitionSpec.isEmpty
        case _ => false
      }
      val expand = nodes.exists(_.isInstanceOf[ExpandExec])
      (name, cartesian, globalWindow, expand)
    }
    def gate(label: String, hits: Set[String], allow: Set[String]): Unit = {
      assert(hits -- allow === Set.empty[String],
        s"$label in plans of ${(hits -- allow).toSeq.sorted.mkString(", ")} — " +
          "fix the plan or document + allowlist the exemption")
      assert(allow -- hits === Set.empty[String],
        s"stale $label allowlist entries: ${(allow -- hits).toSeq.sorted.mkString(", ")}")
    }
    gate("CartesianProduct", found.filter(_._2).map(_._1).toSet, cartesianOk)
    gate("global (unpartitioned) Window", found.filter(_._3).map(_._1).toSet, globalWindowOk)
    gate("Expand", found.filter(_._4).map(_._1).toSet, expandOk)
  }
}
