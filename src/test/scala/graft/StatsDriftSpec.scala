package graft

import graft.checks._
import graft.synth.{Mutations, Synth}

class StatsDriftSpec extends SparkSpec {
  import spark.implicits._

  lazy val ref = Synth.clipsRef(spark, numParts = 2, rowsPerPart = 200, maxAudioMs = 500).cache()

  test("column profile: counts, null rates, min/max, distinct in one pass") {
    val profs = ColumnStats.profile(ref.toDF()).map(p => p.column -> p).toMap
    assert(!profs.contains("bytes")) // binary pruned
    assert(profs("clip_id").count == 400L)
    assert(profs("clip_id").nullCount == 0L)
    assert(profs("clip_id").nullRate == 0.0)
    // clip_id unique → approx distinct within 10% of 400
    assert(math.abs(profs("clip_id").approxDistinct - 400L) <= 40L)
    assert(profs("dur_ms").min.get.toInt >= 200)
    assert(profs("dur_ms").max.get.toInt <= 500)
    assert(profs("dur_ms").quantiles.get.length == 4)
    assert(profs("part_id").approxDistinct == 2L)
  }

  test("profile reflects injected nulls") {
    val mutated = Mutations.dropRequired(ref, "p0000")
    val p = ColumnStats.profile(mutated.toDF(), Seq("clip_id", "transcript"))
      .map(p => p.column -> p).toMap
    assert(p("clip_id").nullCount == 1L)
    assert(p("transcript").nullCount == 1L)
    assert(math.abs(p("clip_id").nullRate - 1.0 / 400) < 1e-12)
  }

  test("histogram aggregator: totals and mergeability") {
    val h = Drift.histogram(ref.toDF(), "dur_ms", 0, 600, bins = 30)
    assert(h.total == 400L)
    assert(h.counts.length == 30)
    // values in [200,500] → first bins empty
    assert(h.counts.take(10).forall(_ == 0L)) // dur_ms >= 200, width 20 → bins 0-9 empty
  }

  test("no drift between identical tables; shiftDistribution detected by KS + PSI") {
    val same = Drift.check(ref.toDF(), ref.toDF(), "dur_ms", 0, 600)
    assert(same.forall(_.status == "PASS"))
    val shifted = Mutations.shiftDistribution(ref, "p0001")
    val out = Drift.check(ref.toDF(), shifted.toDF(), "dur_ms", 0, 10000, bins = 100)
      .map(o => o.checkName -> o).toMap
    assert(out("dur_ms_ks_drift").status == "FAIL")
    assert(out("dur_ms_psi_drift").status == "WARN")
  }

  test("KS/PSI math on hand-built histograms") {
    val a = Drift.Histogram(0, 4, Array(10L, 10L, 10L, 10L))
    val b = Drift.Histogram(0, 4, Array(40L, 0L, 0L, 0L))
    assert(math.abs(Drift.ks(a, b) - 0.75) < 1e-12)
    assert(Drift.psi(a, b) > 0.2)
    assert(Drift.ks(a, a) == 0.0)
    assert(math.abs(Drift.psi(a, a)) < 1e-12)
  }

  test("psiTerms: per-bin terms sum to the driver-side PSI statistic") {
    val s = spark; import s.implicits._
    // skewed-vs-uniform sides on a [0,64) grid of 8 width-8 bins; one bin
    // (56..64) is EMPTY on both sides → its epsilon-clamped term must
    // appear (all 8 bins present), matching Histogram.pdf's iteration
    val refV = (0 until 400).map(i => (i % 56).toDouble)
    val candV = (0 until 400).map(i => (i * i % 48).toDouble)
    val terms = Drift.psiTerms(refV.toDF("v"), candV.toDF("v"), "v",
      lo = 0.0, hi = 64.0, bins = 8).orderBy("bin").collect()
    assert(terms.length == 8)
    assert(terms.map(_.getAs[Long]("cnt_ref")).sum == 400L)
    val fromTerms = terms.map(_.getAs[Long]("psi_term_1e6")).sum / 1e6
    val want = Drift.psi(
      Drift.histogram(refV.toDF("v"), "v", 0.0, 64.0, 8),
      Drift.histogram(candV.toDF("v"), "v", 0.0, 64.0, 8))
    // each of the 8 floors truncates < 1e-6
    assert(math.abs(fromTerms - want) < 8e-6, s"$fromTerms vs $want")
  }

  test("emdTerms: per-bin |CDF gap| terms sum to the driver-side W1 statistic") {
    val s = spark; import s.implicits._
    // cand is ref shifted right by one 8-wide bin: W1 of a pure +8 shift
    // on this grid is exactly 8 * (moved mass share); KS would read the
    // same for a 1-bin or 5-bin shift - EMD is the shift-distance probe
    val refV = (0 until 400).map(i => (i % 40).toDouble)
    val candV = refV.map(_ + 8.0)
    val terms = Drift.emdTerms(refV.toDF("v"), candV.toDF("v"), "v",
      lo = 0.0, hi = 64.0, bins = 8).orderBy("bin").collect()
    assert(terms.length == 8)
    assert(terms.map(_.getAs[Long]("cnt_ref")).sum == 400L)
    assert(terms.map(_.getAs[Long]("cnt_cand")).sum == 400L)
    val fromTerms = terms.map(_.getAs[Long]("emd_term_1e6")).sum / 1e6
    val want = Drift.emd(
      Drift.histogram(refV.toDF("v"), "v", 0.0, 64.0, 8),
      Drift.histogram(candV.toDF("v"), "v", 0.0, 64.0, 8))
    assert(math.abs(fromTerms - want) < 8e-6, s"$fromTerms vs $want")
    // the pure one-bin shift moves ALL mass 8 units right: W1 == 8
    assert(math.abs(want - 8.0) < 1e-9)
    // identical sides -> zero distance
    assert(math.abs(Drift.emd(
      Drift.histogram(refV.toDF("v"), "v", 0.0, 64.0, 8),
      Drift.histogram(refV.toDF("v"), "v", 0.0, 64.0, 8))) < 1e-12)
  }

  test("groupedKs: per-group statistic equals the driver-side KS per group") {
    val s = spark; import s.implicits._
    // group "shift": cand slid +16 (2 bins of 8) -> KS = 0.4 on this data;
    // group "same": identical sides -> KS = 0
    val ref = (0 until 200).map(i => ("shift", (i % 40).toDouble)) ++
      (0 until 100).map(i => ("same", (i % 64).toDouble))
    val cand = (0 until 200).map(i => ("shift", (i % 40).toDouble + 16.0)) ++
      (0 until 100).map(i => ("same", (i % 64).toDouble))
    val out = Drift.groupedKs(ref.toDF("g", "v"), cand.toDF("g", "v"),
      "g", "v", lo = 0.0, hi = 64.0, bins = 8).orderBy("grp").collect()
    assert(out.map(_.getAs[String]("grp")).toSeq == Seq("same", "shift"))
    val byGrp = out.map(r => r.getAs[String]("grp") ->
      (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cand"), r.getAs[Long]("ks_1e6"))).toMap
    assert(byGrp("same") == ((100L, 100L, 0L)))
    assert(byGrp("shift")._1 == 200L && byGrp("shift")._2 == 200L)
    // each grouped statistic equals the two-histogram KS for that group
    def ksOf(rv: Seq[Double], cv: Seq[Double]): Double = Drift.ks(
      Drift.histogram(rv.toDF("v"), "v", 0.0, 64.0, 8),
      Drift.histogram(cv.toDF("v"), "v", 0.0, 64.0, 8))
    val wantShift = ksOf(ref.collect { case ("shift", v) => v },
      cand.collect { case ("shift", v) => v })
    assert(math.abs(byGrp("shift")._3 / 1e6 - wantShift) < 2e-6,
      s"${byGrp("shift")._3 / 1e6} vs $wantShift")
  }

  test("groupedEmdTerms: each group's bin-ordered term sum equals its W1") {
    val s = spark; import s.implicits._
    // "shift": +16 slide (W1 = 16 on this grid); "same": identical (W1 = 0).
    // The shift group leaves bins 0-1 empty on the cand side and 6-7 empty
    // on the ref side - the dense grid must still emit all 8 bins per group
    val ref = (0 until 200).map(i => ("shift", (i % 40).toDouble)) ++
      (0 until 100).map(i => ("same", (i % 64).toDouble))
    val cand = (0 until 200).map(i => ("shift", (i % 40).toDouble + 16.0)) ++
      (0 until 100).map(i => ("same", (i % 64).toDouble))
    val terms = Drift.groupedEmdTerms(ref.toDF("g", "v"), cand.toDF("g", "v"),
      "g", "v", lo = 0.0, hi = 64.0, bins = 8).orderBy("grp", "bin").collect()
    assert(terms.length == 16) // 2 groups x 8 dense bins
    def sumOf(grp: String): Double = terms.filter(_.getAs[String]("grp") == grp)
      .map(_.getAs[Long]("emd_term_1e6")).sum / 1e6
    def w1Of(grp: String): Double = Drift.emd(
      Drift.histogram(ref.collect { case (g, v) if g == grp => v }.toDF("v"),
        "v", 0.0, 64.0, 8),
      Drift.histogram(cand.collect { case (g, v) if g == grp => v }.toDF("v"),
        "v", 0.0, 64.0, 8))
    assert(math.abs(sumOf("same") - 0.0) < 1e-9)
    assert(math.abs(sumOf("shift") - w1Of("shift")) < 8e-6)
    assert(math.abs(w1Of("shift") - 16.0) < 1e-9) // pure two-bin slide
    val ex = intercept[IllegalArgumentException] {
      Drift.groupedEmdTerms(ref.toDF("g", "v"), cand.toDF("g", "v"),
        "g", "v", lo = 0.0, hi = 1.0, bins = 5000)
    }
    assert(ex.getMessage.contains("bins <= 4096"))
  }
}
