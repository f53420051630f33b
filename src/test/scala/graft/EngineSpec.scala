package graft

import org.apache.spark.sql.functions._
import graft.checks._
import graft.model._
import graft.runner._
import graft.synth.{Mutations, Synth}

/** Mutation-catalog tests: clean partitions PASS; each injected fault is
  * detected with the exact expected violation clip_ids — the reference's
  * expected-outcome methodology (`config/mutation_experiment.yml:15-164`).
  */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  // small deterministic fixture: 3 partitions × 40 clips
  lazy val ref = Synth.clipsRef(spark, numParts = 3, rowsPerPart = 40, maxAudioMs = 800).cache()
  lazy val dim = Synth.dimCodec(spark)
  lazy val firstP1 = ref.filter($"part_id" === "p0001")
    .agg(min($"clip_id")).head().getString(0)

  test("clean table passes every predicate check with zero violations") {
    val outcomes = CheckCompiler.run(ref.toDF(), AudioChecks.defaults)
    assert(outcomes.forall(_.status == "PASS"), outcomes.filter(_.status != "PASS").toString)
    assert(outcomes.forall(_.rowsFailed == 0L))
  }

  test("per-partition verdicts: one row per partition, all zero") {
    val pp = CheckCompiler.runPerPartition(ref.toDF(), AudioChecks.defaults).collect()
    assert(pp.length == 3)
    assert(pp.forall(r => (1 until r.length).forall(i => r.getLong(i) == 0L)))
  }

  test("dropRequired → clip_id_not_null FAIL with the mutated row") {
    val mutated = Mutations.dropRequired(ref, "p0001")
    val outcomes = CheckCompiler.run(mutated.toDF(), AudioChecks.defaults)
    val byName = outcomes.map(o => o.checkName -> o).toMap
    assert(byName("clip_id_not_null").status == "FAIL")
    assert(byName("clip_id_not_null").rowsFailed == 1L)
    // transcript is warning severity → WARN not FAIL
    assert(byName("transcript_not_null").status == "WARN")
  }

  test("corruptType → sr_hz_domain FAIL; durOutOfRange → dur_ms_range FAIL") {
    val m1 = CheckCompiler.run(Mutations.corruptType(ref, "p0000").toDF(), AudioChecks.defaults)
    assert(m1.find(_.checkName == "sr_hz_domain").get.status == "FAIL")
    val m2 = Mutations.durOutOfRange(ref, "p0002")
    val o2 = CheckCompiler.run(m2.toDF(), AudioChecks.defaults)
    assert(o2.find(_.checkName == "dur_ms_range").get.rowsFailed == 1L)
    // violation rows name the exact clip
    val firstP2 = ref.filter($"part_id" === "p0002").agg(min($"clip_id")).head().getString(0)
    val v = CheckCompiler.violations(m2.toDF(),
      AudioChecks.defaults.find(_.name == "dur_ms_range").get, Seq("part_id", "clip_id"))
    assert(v.select("clip_id").as[String].collect().toSeq == Seq(firstP2))
  }

  test("bytes_length_consistent catches truncated payload") {
    val fp = firstP1
    val mutated = ref.map(c =>
      if (c.clip_id == fp) c.copy(bytes = c.bytes.take(c.bytes.length - 4)) else c)
    val o = CheckCompiler.run(mutated.toDF(), AudioChecks.defaults)
    assert(o.find(_.checkName == "bytes_length_consistent").get.rowsFailed == 1L)
  }

  test("allViolations tags each violating row with every violated check") {
    val mutated = Mutations.durOutOfRange(Mutations.corruptType(ref, "p0000"), "p0000")
    val v = CheckCompiler.allViolations(mutated.toDF(), AudioChecks.defaults,
      Seq("part_id", "clip_id")).collect()
    val names = v.map(_.getAs[String]("check_name")).toSet
    assert(names == Set("sr_hz_domain", "dur_ms_range"))
  }

  test("duplicateFirst → uniqueness FAIL, exact duplicated key; salted agrees") {
    val mutated = Mutations.duplicateFirst(ref, "p0001").toDF()
    val plain = Uniqueness.duplicateKeys(mutated, Seq("clip_id")).collect()
    assert(plain.map(_.getString(0)).toSeq == Seq(firstP1))
    assert(plain.head.getLong(1) == 2L)
    val salted = Uniqueness.duplicateKeysSalted(mutated, Seq("clip_id")).collect()
    assert(salted.map(_.getString(0)).toSeq == Seq(firstP1))
    val outcome = Uniqueness.check(mutated, Seq("clip_id"), "clip_id_uniqueness")
    assert(outcome.status == "FAIL" && outcome.rowsFailed == 1L)
  }

  test("null keys are exempt from uniqueness (reference areas_uniqueness.py:36)") {
    val withNulls = Mutations.dropRequired(Mutations.dropRequired(ref, "p0000"), "p0000")
    assert(Uniqueness.duplicateKeys(withNulls.toDF(), Seq("clip_id")).count() == 0)
  }

  test("unknownCodec → referential FAIL with exact orphan row") {
    val mutated = Mutations.unknownCodec(ref, "p0002").toDF()
    val orphans = Referential.orphans(mutated, dim.toDF(), Seq("codec"), Seq("codec"))
    val firstP2 = ref.filter($"part_id" === "p0002").agg(min($"clip_id")).head().getString(0)
    assert(orphans.select("clip_id").as[String].collect().toSeq == Seq(firstP2))
    assert(Referential.check(mutated, dim.toDF(), Seq("codec"), Seq("codec"), "codec_fk").status == "FAIL")
  }

  test("null FK exempt from referential check (fact_match_fk.py:23)") {
    val fp = firstP1
    val withNullCodec = ref.map(c => if (c.clip_id == fp) c.copy(codec = null) else c)
    assert(Referential.orphans(withNullCodec.toDF(), dim.toDF(), Seq("codec"), Seq("codec")).count() == 0)
  }

  test("dropRow/extraRow → reconciliation completeness/exclusivity") {
    val cand = Mutations.extraRow(Mutations.dropRow(ref, "p0000"), "p0001")
    val rec = Reconcile.check(ref.toDF(), cand.toDF(), Seq("part_id", "clip_id"), "clips")
    assert(rec.missingCount == 1L && rec.extraCount == 1L)
    val firstP0 = ref.filter($"part_id" === "p0000").agg(min($"clip_id")).head().getString(0)
    assert(Reconcile.missing(ref.toDF(), cand.toDF(), Seq("part_id", "clip_id"))
      .select("clip_id").as[String].collect().toSeq == Seq(firstP0))
    assert(Reconcile.extra(ref.toDF(), cand.toDF(), Seq("part_id", "clip_id"))
      .select("clip_id").as[String].collect().toSeq == Seq("clip_999999000001"))
  }

  test("diff tags added/removed/changed like the golden-snapshot report") {
    val cand = Mutations.extraRow(Mutations.dropRow(
      Mutations.editTranscript(ref, "p0002"), "p0000"), "p0001")
    val d = Reconcile.diff(ref.toDF(), cand.toDF(), Seq("part_id", "clip_id"),
      Seq("transcript", "dur_ms"))
    val kinds = d.groupBy("diff_kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds == Map("removed" -> 1L, "added" -> 1L, "changed" -> 1L))
  }

  test("corruptAudio → pcm_allclose FAIL (exact clip); editTranscript → transcript FAIL") {
    val cand = Mutations.editTranscript(Mutations.corruptAudio(ref, "p0000"), "p0001")
    val v = RowInvariant.violations(ref.toDF(), cand.toDF()).collect()
    val firstP0 = ref.filter($"part_id" === "p0000").agg(min($"clip_id")).head().getString(0)
    val pcmBad = v.filter(!_.getAs[Boolean]("pcm_ok")).map(_.getAs[String]("clip_id"))
    val trBad = v.filter(!_.getAs[Boolean]("transcript_ok")).map(_.getAs[String]("clip_id"))
    assert(pcmBad.toSeq == Seq(firstP0))
    assert(trBad.toSeq == Seq(firstP1))
    val outcomes = RowInvariant.check(ref.toDF(), cand.toDF())
    assert(outcomes.forall(_.status == "FAIL"))
    assert(outcomes.forall(_.rowsFailed == 1L))
  }

  test("clean row-invariant passes") {
    assert(RowInvariant.check(ref.toDF(), ref.toDF()).forall(_.status == "PASS"))
  }
}
