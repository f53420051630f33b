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
