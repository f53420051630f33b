package graft

import org.apache.spark.sql.functions._
import graft.checks.{Integrity, VectorQuality}

class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("fdViolations: only determinants with >1 dependent value, exact counts") {
    val df = Seq(
      ("k1", "a"), ("k1", "a"),            // FD holds (dupes collapse)
      ("k2", "a"), ("k2", "b"), ("k2", "c"), // 3 values
      ("k3", "x"), ("k3", "y")             // 2 values
    ).toDF("det", "dep")
    val got = Integrity.fdViolations(df, Seq("det"), "dep")
      .orderBy("det").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("k2", 3L), ("k3", 2L)))
  }

  test("monotonicity: planted decreases found; clean key silent") {
    val df = Seq(
      ("u1", 1, 10.0), ("u1", 2, 20.0), ("u1", 3, 15.0), // decrease at t=3
      ("u2", 1, 5.0), ("u2", 2, 5.0), ("u2", 3, 6.0)     // non-decreasing
    ).toDF("k", "t", "v")
    val viol = Integrity.monotonicityViolations(df, "k", Seq("t"), "v").collect()
    assert(viol.map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
      .toSeq == Seq(("u1", 3, 20.0, 15.0)))
    val s = Integrity.monotonicityCheck(df, "k", Seq("t"), "v").collect().head
    assert((s.getLong(0), s.getLong(1), s.getLong(2)) == ((2L, 6L, 1L)))
  }

  test("fdStrength: exact ratio of determinants to (det, dep) pairs") {
    val df = Seq(("k1", "a"), ("k1", "a"), ("k2", "a"), ("k2", "b"),
      ("k3", "x")).toDF("det", "dep")
    val r = Integrity.fdStrength(df, Seq("det"), "dep").collect().head
    // 3 determinants, 4 distinct pairs → floor(3e6/4) = 750000
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 4L, 750000L)))
  }

  test("sequenceGaps: one row per gap RUN with exact widths") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 5L), ("a", 6L), ("a", 9L),
                 ("b", 3L), ("b", 4L)).toDF("k", "seq")
    val got = Integrity.sequenceGaps(df, Seq("k"), "seq")
      .orderBy("k", "gap_after").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 2L, 5L, 2L), ("a", 6L, 9L, 2L)))
  }

  test("maskProfile: char classes collapse, punctuation kept, min example") {
    val df = Seq("AB-12", "CD-34", "xy_9", null).toDF("s")
    val got = Integrity.maskProfile(df, "s").orderBy("mask").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(("AA-99", 2L, "AB-12"), ("aa_9", 1L, "xy_9")))
  }

  test("groupedQuantiles: rank-select matches hand computation incl. ties") {
    // g1: sorted [1,2,2,10]  n=4 → p50 k=2 → 2; p90 k=4 → 10; p99 k=4 → 10
    // g2: sorted [5]         n=1 → all probes k=1 → 5
    val df = Seq(("g1", 2.0), ("g1", 1.0), ("g1", 10.0), ("g1", 2.0), ("g2", 5.0))
      .toDF("g", "v")
    val got = Integrity.groupedQuantiles(df, "g", "v", Seq(0.5, 0.9, 0.99))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("g1", 2.0, 10.0, 10.0), ("g2", 5.0, 5.0, 5.0)))
  }

  test("vectorProfile: dims, NaN/Inf, zero vectors, exact norms") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),                       // norm 5
      (2L, Array(0.0f, 0.0f)),                       // zero vector
      (3L, Array(Float.NaN, 1.0f)),                  // non-finite
      (4L, Array(Float.PositiveInfinity, 1.0f, 2.0f)), // non-finite, dim 3
      (5L, Array.empty[Float])                       // ragged empty
    ).toDF("id", "vec")
    val rows = VectorQuality.vectorProfile(df, "id", "vec")
      .orderBy("id").collect()
    val got = rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
      r.getBoolean(3), if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 2, 0, false, 5000000L),
      (2L, 2, 0, true, 0L),
      (3L, 2, 1, false, -1L),
      (4L, 3, 1, false, -1L),
      (5L, 0, 0, true, -1L)))
    val s = VectorQuality.vectorCheck(df, "id", "vec").collect().head
    // n_vectors=5, n_dims=3 (0,2,3), nonfinite=2, zero=2, min=0, max=5e6
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3),
      s.getLong(4), s.getLong(5)) == ((5L, 3L, 2L, 2L, 0L, 5000000L)))
  }

  test("vectorCheck plan: no Expand despite the distinct-dim count") {
    val df = Seq((1L, Array(1.0f))).toDF("id", "vec")
    val plan = VectorQuality.vectorCheck(df, "id", "vec")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"))
    val mono = Integrity.monotonicityCheck(
      Seq(("a", 1, 1.0)).toDF("k", "t", "v"), "k", Seq("t"), "v")
      .queryExecution.executedPlan.toString
    assert(!mono.contains("Expand"))
  }
}
