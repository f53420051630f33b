package graft

import org.apache.spark.sql.functions._
import graft.functions.{TDigest, TDigestBuf}
import graft.synth.Synth

class TDigestSpec extends SparkSpec with org.scalactic.Tolerance {

  // deterministic pseudo-random doubles via splitmix64
  private def sample(n: Int, seed: Long): Array[Double] =
    Array.tabulate(n) { i =>
      val u = (Synth.mix64(seed + i) >>> 11).toDouble / (1L << 53).toDouble
      // log-normal-ish skew: most mass small, long right tail
      math.exp(u * 6.0)
    }

  private def rankOf(sorted: Array[Double], v: Double): Double =
    sorted.count(_ <= v).toDouble / sorted.length

  test("t-digest quantiles accurate on skewed data (rank error < 1.5%)") {
    val xs = sample(20000, 42L)
    val sorted = xs.sorted
    var b = TDigest.empty(100.0)
    xs.foreach(x => b = TDigest.add(b, x))
    for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.95, 0.99)) {
      val est = TDigest.quantile(b, q)
      val rankErr = math.abs(rankOf(sorted, est) - q)
      assert(rankErr < 0.015, s"q=$q est=$est rankErr=$rankErr")
    }
    assert(TDigest.quantile(b, 0.0) === sorted.head +- 1e-9)
    assert(TDigest.quantile(b, 1.0) === sorted.last +- 1e-9)
  }

  test("sketch is fixed-size and merge is associative-equivalent") {
    val xs = sample(30000, 7L)
    val sorted = xs.sorted
    // one-shot
    var whole = TDigest.empty(100.0)
    xs.foreach(x => whole = TDigest.add(whole, x))
    // 10 chunked sketches merged pairwise (simulates per-partition + tree combine)
    val parts = xs.grouped(3000).map { chunk =>
      var p = TDigest.empty(100.0)
      chunk.foreach(x => p = TDigest.add(p, x))
      p
    }.toSeq
    val merged = parts.reduce(TDigest.merge)
    val compressed = TDigest.compress(merged)
    assert(compressed.used <= 2 * 100 + 10, s"centroids=${compressed.used}")
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val e1 = TDigest.quantile(whole, q)
      val e2 = TDigest.quantile(merged, q)
      assert(math.abs(rankOf(sorted, e1) - q) < 0.015)
      assert(math.abs(rankOf(sorted, e2) - q) < 0.015)
    }
    assert(merged.min === whole.min)
    assert(merged.max === whole.max)
  }

  test("Spark udaf: agg + groupBy sketch, merged sketch matches exact percentile") {
    val s = spark
    import s.implicits._
    val n = 20000
    val df = spark.range(0, n, 1, 8)
      .map { i =>
        val u = (Synth.mix64(i + 99L) >>> 11).toDouble / (1L << 53).toDouble
        (i % 4, math.exp(u * 6.0))
      }
      .toDF("g", "x")
      .cache()

    // whole-table quantiles via the udaf vs Spark's exact percentile
    val est = df.agg(TDigest.tdigestQuantiles(col("x"), Seq(0.5, 0.95)).as("q"))
      .head().getSeq[Double](0)
    val exact = df.agg(percentile(col("x"), array(lit(0.5), lit(0.95))).as("q"))
      .head().getSeq[Double](0)
    val xs = df.select("x").as[Double].collect().sorted
    for (((e, x), q) <- est.zip(exact).zip(Seq(0.5, 0.95))) {
      assert(math.abs(rankOf(xs, e) - q) < 0.015, s"q=$q est=$e exact=$x")
    }

    // per-group sketches merged driver-side == whole-table estimate shape
    val sketches = df.groupBy(col("g"))
      .agg(TDigest.tdigestSketch(col("x")).as("sk"))
      .select("sk.compression", "sk.means", "sk.weights", "sk.used", "sk.min", "sk.max")
      .collect()
      .map(r => TDigestBuf(r.getDouble(0),
        r.getSeq[Double](1).toArray, r.getSeq[Double](2).toArray,
        r.getInt(3), r.getDouble(4), r.getDouble(5)))
    val merged = sketches.reduce(TDigest.merge)
    val totalW = {
      val c = TDigest.compress(merged)
      (0 until c.used).map(c.weights(_)).sum
    }
    assert(math.round(totalW) === n.toLong)
    for (q <- Seq(0.5, 0.95)) {
      val e = TDigest.quantile(merged, q)
      assert(math.abs(rankOf(xs, e) - q) < 0.015, s"merged q=$q est=$e")
    }
    df.unpersist()
  }

  test("profilePerPartition emits mergeable per-partition dur_ms sketches") {
    val clips = Synth.clipsRef(spark, numParts = 3, rowsPerPart = 400, maxAudioMs = 400)
      .toDF().drop("bytes")
    val prof = graft.checks.ColumnStats.profilePerPartition(
      clips, "part_id", Seq("clip_id"), sketchCols = Seq("dur_ms"))
    val rows = prof.select("part_id", "dur_ms_tdigest.compression",
      "dur_ms_tdigest.means", "dur_ms_tdigest.weights", "dur_ms_tdigest.used",
      "dur_ms_tdigest.min", "dur_ms_tdigest.max").collect()
    assert(rows.length === 3)
    val sketches = rows.map(r => TDigestBuf(r.getDouble(1),
      r.getSeq[Double](2).toArray, r.getSeq[Double](3).toArray,
      r.getInt(4), r.getDouble(5), r.getDouble(6)))
    val merged = sketches.reduce(TDigest.merge)
    val exact = clips.select("dur_ms").collect().map(_.getInt(0).toDouble).sorted
    val med = TDigest.quantile(merged, 0.5)
    assert(math.abs(rankOf(exact, med) - 0.5) < 0.03, s"median est=$med")
  }
}
