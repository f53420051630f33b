package graft

import java.sql.Timestamp
import graft.checks.{Anomaly, ColumnStats, Skew}
import graft.ops.Survivor

class SkewAnomalySpec extends SparkSpec {
  import spark.implicits._

  test("keySkewProfile: exact shares and top-k with tiebreak") {
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .toDF("k")
    val r = Skew.keySkewProfile(df, Seq("k"), topK = 2).collect().head
    // n_rows=8 n_keys=4 max=4 top2=4+2=6 → shares 500000 / 750000
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((8L, 4L, 4L, 2L + 4L, 500000L, 750000L)))
  }

  test("keyCandidates: unique column flagged, duplicated column not") {
    val df = Seq((1, "x"), (2, "x"), (3, "y")).toDF("id", "grp")
    val got = Skew.keyCandidates(df, Seq("id", "grp"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.toSeq == Seq(
      ("grp", 3L, 2L, 666666L, false),
      ("id", 3L, 3L, 1000000L, true)))
  }

  test("volumeAnomaly: trailing window, exact ratios, null-safe first day") {
    def rows(day: Int, n: Int) = Seq.fill(n)(
      ("g", Timestamp.valueOf(f"2024-01-0$day%d 10:00:00")))
    val df = (rows(1, 2) ++ rows(2, 2) ++ rows(3, 8) ++ rows(4, 1))
      .toDF("g", "ts")
    val got = Anomaly.volumeAnomaly(df, "g", "ts", lookback = 2)
      .orderBy("day").collect()
      .map(r => (r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), // sum over empty frame: null
        if (r.isNullAt(5)) -1L else r.getLong(5), r.getBoolean(6)))
    assert(got.toSeq == Seq(
      (2L, 0L, -1L, -1L, false),         // no history
      (2L, 1L, 2L, 1000000L, false),     // 2 vs avg 2
      (8L, 2L, 4L, 4000000L, true),      // 8 vs avg 2 → 4x high
      (1L, 2L, 10L, 200000L, true)))     // 1 vs avg 5 → 0.2x low
  }

  test("cusumChangepoints: persistent drift accumulates to a shift; noise resets") {
    def t(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    // key "shift": level 1.0 for 4 days then a persistent +0.3 drift —
    // each post-shift day adds (1.3 − 1.1) = 0.2 to the hi side, crossing
    // the 0.5 threshold on the 3rd drift day. A single spike on key
    // "noise" is absorbed (next day drains the accumulator to 0).
    val rows =
      (1 to 4).map(d => ("shift", t(d), 1.0)) ++
      (5 to 8).map(d => ("shift", t(d), 1.3)) ++
      Seq(("noise", t(1), 1.0), ("noise", t(2), 1.5), ("noise", t(3), 0.6),
        ("noise", t(4), 1.0))
    val got = graft.checks.Anomaly.cusumChangepoints(
        rows.toDF("k", "d", "x"), "k", "d", "x",
        muHi = 1.1, muLo = 0.9, threshold = 0.5)
      .orderBy("k", "d").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val shift = got.filter(_._1 == "shift").map(t => (t._2, t._4)).toSeq
    // hi: 0,0,0,0 then 0.2, 0.4, 0.6(shift), 0.8(shift) — ×1e6, floor
    assert(shift == Seq((0L, false), (0L, false), (0L, false), (0L, false),
      (199999L, false), (399999L, false), (599999L, true), (799999L, true))
      || shift == Seq((0L, false), (0L, false), (0L, false), (0L, false),
      (200000L, false), (400000L, false), (600000L, true), (800000L, true)),
      s"got $shift")
    val noise = got.filter(_._1 == "noise")
    assert(noise.forall(!_._4), s"noise key must not shift: ${noise.toSeq}")
    // the 1.5 spike raises hi to 0.4 then the 0.6 day drains it to 0
    assert(noise.map(_._2).toSeq.last == 0L)
  }

  test("rollingRangeViolations: breaks against trailing extrema only") {
    val df = Seq(("k", 1, 10.0), ("k", 2, 11.0), ("k", 3, 25.0), ("k", 4, 4.0))
      .toDF("k", "t", "v")
    val got = Anomaly.rollingRangeViolations(df, "k", Seq("t"), "v",
      lookback = 2).orderBy("t").collect()
      .map(r => (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    // t=3: 25 > 2*max(10,11)=22; t=4: 4 < 0.5*min(11,25)=5.5
    assert(got.toSeq == Seq((3, 25.0, 10.0, 11.0), (4, 4.0, 11.0, 25.0)))
  }

  test("histogram: exact bins, max value clamped into last bucket") {
    val df = Seq(0.0, 1.0, 2.0, 3.0, 3.0, 4.0).toDF("v")
    val got = ColumnStats.histogram(df, "v", bins = 4).orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 3L)))
    // degenerate: constant column lands in one bin, no div-by-zero
    val const = Seq(7.0, 7.0).toDF("v")
    assert(ColumnStats.histogram(const, "v", bins = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 2L)))
  }

  test("goldenRecord: per-column latest NON-NULL, not just the latest row") {
    val df = Seq(
      ("u", 1, Option("x"), Option.empty[String]),
      ("u", 2, Option.empty[String], Option("y")),
      ("u", 3, Option("z"), Option.empty[String]),
      ("w", 1, Option.empty[String], Option.empty[String])
    ).toDF("k", "t", "a", "b")
    val got = Survivor.goldenRecord(df, Seq("k"), Seq("t"), Seq("a", "b"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    // u: a from t=3, b survives from t=2 (t=3's null must not overwrite);
    // w: all-null column stays null
    assert(got.toSeq == Seq(("u", "z", "y", 3L), ("w", null, null, 1L)))
  }

  test("plans: skew/candidates/golden are Expand-free single aggregates") {
    val df = Seq((1, "x")).toDF("id", "grp")
    for (plan <- Seq(
        Skew.keySkewProfile(df, Seq("grp")),
        Skew.keyCandidates(df, Seq("id", "grp")),
        Survivor.goldenRecord(df, Seq("grp"), Seq("id"), Seq("id"))))
      assert(!plan.queryExecution.executedPlan.toString.contains("Expand"))
  }
}
