package graft

import org.apache.spark.sql.functions._
import graft.checks.Temporal
import graft.ops.AsOf

class TemporalAsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: latest right row at-or-before each left row, per key") {
    val clicks = Seq((1L, "u1", 10L), (2L, "u1", 20L), (3L, "u2", 5L))
      .toDF("event_id", "user_id", "t")
    val views = Seq(("u1", 10L, 1.0), ("u1", 15L, 2.0), ("u2", 99L, 9.0))
      .toDF("user_id", "view_t", "view_value")
    val out = AsOf.asofJoin(clicks, views, "user_id", "t", "view_t",
        Seq("view_t", "view_value"))
      .orderBy("event_id").collect()
    assert(out.length == 3)
    // tie: the view AT t=10 matches (<= semantics)
    assert(out(0).getLong(0) == 1L && out(0).getLong(3) == 10L
      && out(0).getDouble(4) == 1.0)
    assert(out(1).getLong(0) == 2L && out(1).getLong(3) == 15L
      && out(1).getDouble(4) == 2.0)
    // no view precedes u2's click: right payload is null
    assert(out(2).getLong(0) == 3L && out(2).isNullAt(3) && out(2).isNullAt(4))
  }

  test("asofJoin rejects colliding right payload column names") {
    val l = Seq((1L, "k", 1L)).toDF("id", "k", "t")
    val r = Seq(("k", 1L, 2L)).toDF("k", "rt", "t")
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(l, r, "k", "t", "rt", Seq("t"))
    }
  }

  test("asofJoin keeps the WHOLE latest right row, nulls included") {
    // round-3 ADVICE: per-column last(ignoreNulls) would let the null `a`
    // at t=2 inherit the OLDER a=1 while b comes from the newer row —
    // mixing two right rows. Whole-struct carry must keep (null, "y").
    val clicks = Seq((1L, "u1", 3L)).toDF("event_id", "user_id", "t")
    val views = Seq(
      ("u1", 1L, Option(1.0), "x"),
      ("u1", 2L, Option.empty[Double], "y")
    ).toDF("user_id", "view_t", "a", "b")
    val out = AsOf.asofJoin(clicks, views, "user_id", "t", "view_t",
      Seq("view_t", "a", "b")).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(r.fieldIndex("view_t")) == 2L)
    assert(r.isNullAt(r.fieldIndex("a")), "null payload must NOT inherit an older row's value")
    assert(r.getString(r.fieldIndex("b")) == "y")
  }

  test("asofJoinBucketed equals asofJoin row-for-row on a planted hot key") {
    // hot key: 500 left + 400 right rows on one key (would serialize one
    // window partition in the plain shape); plus cold keys, empty-right
    // key, and bucket-boundary carries (right rows sparse in time so many
    // buckets have left rows but no in-bucket right row).
    val lefts =
      (0 until 500).map(i => (i.toLong, "hot", i.toLong * 7 % 1000)) ++
      (0 until 20).map(i => (1000L + i, s"cold${i % 3}", i.toLong * 50)) ++
      Seq((2000L, "norright", 10L))
    val rights =
      (0 until 400).map(i => ("hot", i.toLong * 13 % 997, i.toDouble,
        if (i % 7 == 0) None else Some(s"v$i"))) ++
      (0 until 5).map(i => (s"cold${i % 3}", i.toLong * 100, -i.toDouble, Some("c")))
    val l = lefts.toDF("event_id", "k", "t")
    val r = rights.toDF("k", "rt", "val", "tag")
      // right must be unique per (key, time) — dedupe collisions from %997
      .groupBy("k", "rt").agg(first(col("val")).as("val"), first(col("tag")).as("tag"))
    val plain = AsOf.asofJoin(l, r, "k", "t", "rt", Seq("rt", "val", "tag"))
      .orderBy("event_id").collect().toSeq
    val bucketed = AsOf.asofJoinBucketed(l, r, "k", "t", "rt",
        Seq("rt", "val", "tag"), buckets = 8)
      .orderBy("event_id").collect().toSeq
    assert(bucketed == plain)
    // the heavy window must be partitioned by (key, bucket), not key alone
    val plan = AsOf.asofJoinBucketed(l, r, "k", "t", "rt",
      Seq("rt", "val", "tag"), buckets = 8).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__k") && plan.contains("__b"),
      s"expected (key, bucket) window partitioning in plan:\n$plan")
  }

  test("asofJoinBucketed edge geometry: all right rows in ONE bucket, lefts spread across later empty buckets") {
    // round-4 VERDICT task #7: the boundary-carry join is the subtle code —
    // right rows cluster at the START of the time axis (all in bucket 0),
    // while left rows span the full axis, so every bucket > 0 has left rows
    // and NO in-bucket right row: each must take the carry, including
    // across runs of consecutive empty buckets.
    val l = (0 until 200).map(i => (i.toLong, "k", i.toLong * 10)).toDF("event_id", "k", "t")
    val r = Seq(("k", 0L, 1.0), ("k", 3L, 2.0), ("k", 7L, 3.0)).toDF("k", "rt", "v")
    val plain = AsOf.asofJoin(l, r, "k", "t", "rt", Seq("rt", "v"))
      .orderBy("event_id").collect().toSeq
    val bucketed = AsOf.asofJoinBucketed(l, r, "k", "t", "rt", Seq("rt", "v"),
        buckets = 16)
      .orderBy("event_id").collect().toSeq
    assert(bucketed == plain)
    // every left row at t>=7 carries the LAST right row of bucket 0
    assert(plain.drop(1).forall(row => row.getLong(row.fieldIndex("rt")) == 7L))
  }

  test("asofJoinBucketed degenerate axis: a single distinct timestamp (hi <= lo)") {
    // all rows share one time → bucket width 0 → everything maps to bucket
    // 0; ties resolve right-before-left exactly like the plain plan
    val l = Seq((1L, "a", 5L), (2L, "b", 5L)).toDF("event_id", "k", "t")
    val r = Seq(("a", 5L, 42.0)).toDF("k", "rt", "v")
    val plain = AsOf.asofJoin(l, r, "k", "t", "rt", Seq("rt", "v"))
      .orderBy("event_id").collect().toSeq
    val bucketed = AsOf.asofJoinBucketed(l, r, "k", "t", "rt", Seq("rt", "v"))
      .orderBy("event_id").collect().toSeq
    assert(bucketed == plain)
    assert(plain.head.getDouble(plain.head.fieldIndex("v")) == 42.0)
    assert(plain(1).isNullAt(plain(1).fieldIndex("v")))
  }

  test("asofJoinBucketed keeps NULL-time left rows with a null match, like asofJoin") {
    // round-4 ADVICE: NULL left times map to bucket 0 (sorted first, no
    // carry-in) instead of being dropped by the (k, b) carry join
    val l = Seq((1L, "k", Option(100L)), (2L, "k", Option.empty[Long]))
      .toDF("event_id", "k", "t")
    val r = Seq(("k", 50L, 7.0)).toDF("k", "rt", "v")
    val plain = AsOf.asofJoin(l, r, "k", "t", "rt", Seq("rt", "v"))
      .orderBy("event_id").collect().toSeq
    val bucketed = AsOf.asofJoinBucketed(l, r, "k", "t", "rt", Seq("rt", "v"))
      .orderBy("event_id").collect().toSeq
    assert(bucketed == plain)
    assert(plain.size == 2, "null-time left row must survive")
    assert(plain(1).isNullAt(plain(1).fieldIndex("v")),
      "null-time row matches nothing (null payload)")
  }

  private val intervals = Seq(
    // u1: [0,10) then [5,8) overlapping it, then a gap to [20,30), then
    // contiguous [30,40)
    (1L, "u1", 0L, 10L), (2L, "u1", 5L, 8L), (3L, "u1", 20L, 30L),
    (4L, "u1", 30L, 40L),
    // u2: long [0,100) swallows BOTH later intervals; [30,40) does NOT
    // overlap its immediate predecessor [10,20) — only the running max
    // catches it
    (5L, "u2", 0L, 100L), (6L, "u2", 10L, 20L), (7L, "u2", 30L, 40L)
  ).toDF("id", "k", "s", "e")

  test("overlaps (adjacent-predecessor) flags direct overlaps only") {
    val got = Temporal.overlaps(intervals, col("k"), col("s"), col("e"), col("id"))
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 6L)) // id7 missed by design: lag sees [10,20)
  }

  test("overlapsAnyPrior catches overlap with a non-adjacent interval") {
    val got = Temporal.overlapsAnyPrior(intervals, col("k"), col("s"), col("e"), col("id"))
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 6L, 7L))
  }

  test("gaps flags discontinuities, not contiguous successors") {
    val got = Temporal.gaps(intervals, col("k"), col("s"), col("e"), col("id"))
      .select("id").as[Long].collect().toSet
    // u1: [20,30) starts after prev end 8 -> gap; [30,40) is contiguous.
    // u2: starts sorted 0,10,30 with prev ends 100,20 - id6 starts before
    // prev end (overlap, not gap); id7 starts 30 > prev end 20 -> gap.
    assert(got == Set(3L, 7L))
  }
}
