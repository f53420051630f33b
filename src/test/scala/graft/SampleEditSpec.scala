package graft

import org.apache.spark.sql.functions._
import graft.ops.{EditDistance, Sampling}

class SampleEditSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys = (1L to 2000L).toDF("k").cache()

  test("sampleByHash: deterministic across partitionings, rate in bounds") {
    val a = Sampling.sampleByHash(keys.repartition(3), Seq(col("k")), 1, 4)
      .as[Long].collect().toSet
    val b = Sampling.sampleByHash(keys.repartition(11), Seq(col("k")), 1, 4)
      .as[Long].collect().toSet
    assert(a == b)
    assert(a.size > 2000 * 0.15 && a.size < 2000 * 0.35)
  }

  test("samplePortable: md5-nibble sample is stable and nested by rate") {
    val s4 = Sampling.samplePortable(keys, Seq(col("k")), 4)
      .as[Long].collect().toSet
    val s8 = Sampling.samplePortable(keys, Seq(col("k")), 8)
      .as[Long].collect().toSet
    assert(s4.subsetOf(s8)) // nibble < '4' implies nibble < '8'
    assert(Sampling.samplePortable(keys, Seq(col("k")), 16).count() == 2000)
    assert(s4.size > 2000 * 0.15 && s4.size < 2000 * 0.35)
    // same sample under a different partitioning
    val s4b = Sampling.samplePortable(keys.repartition(13), Seq(col("k")), 4)
      .as[Long].collect().toSet
    assert(s4 == s4b)
  }

  test("sampleWeightedPortable: rate tracks the weight; stable across partitionings") {
    // constant weight w over maxW=1000 must land near w/1000 of the rows
    def rate(w: Long): Double =
      Sampling.sampleWeightedPortable(keys, Seq(col("k")), lit(w), 1000L)
        .count().toDouble / 2000.0
    assert(math.abs(rate(250L) - 0.25) < 0.06, s"got ${rate(250L)}")
    assert(math.abs(rate(750L) - 0.75) < 0.06, s"got ${rate(750L)}")
    assert(rate(1000L) == 1.0) // w >= maxW keeps everything
    // monotone in weight for a FIXED key: inclusion sets nest
    val lo = Sampling.sampleWeightedPortable(keys, Seq(col("k")), lit(250L), 1000L)
      .as[Long].collect().toSet
    val hi = Sampling.sampleWeightedPortable(keys, Seq(col("k")), lit(750L), 1000L)
      .as[Long].collect().toSet
    assert(lo.subsetOf(hi))
    // identical sample under a different partitioning
    val lo2 = Sampling.sampleWeightedPortable(keys.repartition(13),
      Seq(col("k")), lit(250L), 1000L).as[Long].collect().toSet
    assert(lo == lo2)
  }

  test("sampleStratifiedPortable: per-group rate equals per-group flat sample") {
    val df = (1L to 1200L).map(k => (k, Seq("hot", "warm", "cold")((k % 3).toInt)))
      .toDF("k", "grp")
    val strat = Sampling.sampleStratifiedPortable(df, Seq(col("k")), col("grp"),
        Map("hot" -> 2, "warm" -> 8), defaultSixteenths = 16)
      .select("k").as[Long].collect().toSet
    // each stratum must match the flat portable sample at its own rate
    val expect =
      Sampling.samplePortable(df.filter(col("grp") === "hot"), Seq(col("k")), 2)
        .select("k").as[Long].collect().toSet ++
      Sampling.samplePortable(df.filter(col("grp") === "warm"), Seq(col("k")), 8)
        .select("k").as[Long].collect().toSet ++
      df.filter(col("grp") === "cold").select("k").as[Long].collect().toSet
    assert(strat == expect)
    // hot stratum (k%3==0) downsampled hard; cold (k%3==2) kept whole
    assert(strat.count(_ % 3 == 0) < 150 && strat.count(_ % 3 == 2) == 400)
  }

  test("layout: even k+1 partition, longer segments first, covers string") {
    val l = EditDistance.layout(10, 2)
    assert(l.toSeq == Seq((0, 4), (4, 3), (7, 3)))
    assert(EditDistance.layout(9, 2).toSeq == Seq((0, 3), (3, 3), (6, 3)))
    val l7 = EditDistance.layout(7, 2) // 3,2,2
    assert(l7.map(_._2).sum == 7 && l7.head._2 == 3)
  }

  test("selfJoinPairs: planted pairs at k=2, short strings included") {
    val docs = Seq(
      (1L, "abcdefghij"), (2L, "abcdefghXj"), // 1 substitution
      (3L, "abcdefgh"),                       // 2 deletions from 1
      (4L, "zzzzzzzzzz"),                     // unrelated
      (5L, "ab"), (6L, "ac")                  // short-string block, ed 1
    ).toDF("id", "s")
    val got = EditDistance.selfJoinPairs(docs, "id", "s", k = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got == Map((1L, 2L) -> 1, (1L, 3L) -> 2, (2L, 3L) -> 2,
      (5L, 6L) -> 1))
  }

  test("selfJoinPairs: complete recall vs brute force on a random corpus") {
    // deterministic pseudo-random strings over a 4-letter alphabet:
    // lengths 1..12 around the short-string boundary
    val docs = (1L to 120L).map { i =>
      val len = (i % 12 + 1).toInt
      val s = (0 until len).map(j => ('a' + ((i * 31 + j * 17) % 4)).toChar)
        .mkString
      (i, s)
    }.toDF("id", "s")
    val brute = docs.as("a").join(docs.as("b"),
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.s"), col("b.s")).as("d"))
      .filter(col("d") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val blocked = EditDistance.selfJoinPairs(docs, "id", "s", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(blocked == brute) // pigeonhole recall is complete, zero false pos
  }
}
