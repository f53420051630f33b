package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model._

/** Referential-integrity checks — the reference's FK probes
  * (`dds/referential_suite/fact_match_fk.py:16-62`: NOT EXISTS correlated
  * subqueries) expressed as LEFT ANTI joins with the dimension side
  * broadcast (dims are tiny — 13..272 rows in the reference run).
  *
  * Null FKs are exempt (`fact_match_fk.py:23` `WHERE fk IS NOT NULL`) — an
  * explicit pre-filter, since Spark's null-unsafe join would drop them from
  * the match side and otherwise report them as orphans.
  */
object Referential {

  /** Rows of `fact` whose `fkCols` have no match in `dim.keyCols`.
    * Dim is broadcast: no shuffle of the fact side at any scale.
    */
  def orphans(fact: DataFrame, dim: DataFrame,
              fkCols: Seq[String], dimKeyCols: Seq[String]): DataFrame = {
    val nonNull = fkCols.map(col(_).isNotNull).reduce(_ && _)
    val dimKeys = dim.select(dimKeyCols.map(col): _*).distinct()
    val joinCond = fkCols.zip(dimKeyCols)
      .map { case (f, d) => fact(f) === dimKeys(d) }.reduce(_ && _)
    fact.filter(nonNull).join(broadcast(dimKeys), joinCond, "left_anti")
  }

  /** Verdict form, labeled like the reference's per-FK counts. */
  def check(fact: DataFrame, dim: DataFrame,
            fkCols: Seq[String], dimKeyCols: Seq[String], name: String,
            severity: Severity.Severity = Severity.Error): CheckOutcome = {
    val n = orphans(fact, dim, fkCols, dimKeyCols).count()
    CheckOutcome(name, RuleGroup.ReferentialIntegrity.toString, severity.toString,
      CheckOutcome.status(severity, n).toString, n,
      message = if (n > 0) Some(s"$n row(s) with ${fkCols.mkString(",")} not in dimension") else None)
  }

  /** Multi-FK probe in one result: the reference's UNION-of-4-probes
    * (`specs.py:189-239`) — each orphan set tagged with ref_type.
    * Probes run as independent anti-joins and union cheaply (no shuffle
    * added by the union itself).
    */
  def multiProbe(fact: DataFrame, probes: Seq[(String, DataFrame, Seq[String], Seq[String])],
                 keyCols: Seq[String]): DataFrame = {
    probes.map { case (tag, dim, fk, dk) =>
      orphans(fact, dim, fk, dk)
        .select(keyCols.map(col): _*)
        .withColumn("ref_type", lit(tag))
    }.reduce(_ unionByName _)
  }
}
