package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.checks.{FieldSpec, SchemaCheck, SchemaSpec}

/** Mutation-style coverage of the declared-schema validator (V3–V8):
  * each test injects one of the reference's schema faults (dropped field,
  * corrupted type, empty array, short string, duplicate id — the
  * matches_schema.py violation catalogue) and asserts the exact per-rule
  * verdicts.
  */
class SchemaCheckSpec extends SparkSpec {

  private val spec = SchemaSpec(
    fields = Seq(
      FieldSpec("id", IntegerType),
      FieldSpec("name", StringType, minLength = Some(2)),
      FieldSpec("tags", ArrayType(StringType), minItems = Some(1)),
      FieldSpec("note", StringType, required = false)),
    uniqueKey = Some("id"))

  private def outcomes(df: org.apache.spark.sql.DataFrame) =
    SchemaCheck.run(df, spec).map(o => o.checkName -> o).toMap

  test("clean table passes every rule") {
    val s = spark; import s.implicits._
    val df = Seq((1, "ab", Seq("x"), "n"), (2, "cd", Seq("y", "z"), "m"))
      .toDF("id", "name", "tags", "note")
    val out = outcomes(df)
    assert(out.values.forall(o => o.status == "PASS"))
    assert(out("schema_required_columns").rowsFailed === 0)
  }

  test("missing required column fails structurally; row rules skip it") {
    val s = spark; import s.implicits._
    val df = Seq((1, "ab")).toDF("id", "name") // tags dropped
    val out = outcomes(df)
    assert(out("schema_required_columns").status === "FAIL")
    assert(out("schema_required_columns").message.get.contains("tags"))
    assert(!out.contains("tags_min_items"))
  }

  test("extra column tolerated as INFO (open world, additionalProperties)") {
    val s = spark; import s.implicits._
    val df = Seq((1, "ab", Seq("x"), "n", 9.9))
      .toDF("id", "name", "tags", "note", "undeclared")
    val out = outcomes(df)
    assert(out("schema_additional_columns").status === "PASS")
    assert(out("schema_additional_columns").message.get.contains("undeclared"))
  }

  test("type corruption: int id arriving as non-numeric text (corrupt_id path)") {
    val s = spark; import s.implicits._
    val df = Seq(("1", "ab", Seq("x")), ("abc", "cd", Seq("y")), (null, "ef", Seq("z")))
      .toDF("id", "name", "tags")
    val out = outcomes(df)
    // "abc" fails the cast; null id is the required rule's problem, not type's
    assert(out("id_type").status === "FAIL" && out("id_type").rowsFailed === 1)
    assert(out("id_required").status === "FAIL" && out("id_required").rowsFailed === 1)
  }

  test("minItems and minLength violations counted per row") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1, "ab", Seq("x")),
      (2, "c", Seq.empty[String]), // name too short AND tags empty
      (3, "", Seq("y")))           // name empty
      .toDF("id", "name", "tags")
    val out = outcomes(df)
    assert(out("name_min_length").rowsFailed === 2)
    assert(out("tags_min_items").rowsFailed === 1)
  }

  test("session runs the schema suite FIRST when a spec is configured") {
    val ref = graft.synth.Synth.clipsRef(spark, 1, 40, maxAudioMs = 200).toDF()
    val clipSpec = SchemaSpec(
      Seq(FieldSpec("clip_id", StringType), FieldSpec("sr_hz", IntegerType)),
      uniqueKey = Some("clip_id"))
    val report = new graft.runner.ValidationSession(spark,
      graft.runner.ValidationConfig(schemaSpec = Some(clipSpec)))
      .run(ref, graft.synth.Synth.dimCodec(spark).toDF())
    assert(report.suites.head.suite === "schema")
    val names = report.suites.head.outcomes.map(_.checkName)
    assert(names.contains("clip_id_required") && names.contains("clip_id_duplicate_warning"))
    assert(report.status === "SUCCESS")
  }

  test("fused paths honor schemaSpec: row rules + structural match modular") {
    import org.apache.spark.sql.functions.{col, when, lit}
    val ref = graft.synth.Synth.clipsRef(spark, 1, 40, maxAudioMs = 200).toDF()
    // null one sr_hz → sr_hz_required (schema) AND sr_hz_domain (predicate) fire
    val broken = ref.withColumn("sr_hz",
      when(col("clip_id") === "clip_000000000000", lit(null)).otherwise(col("sr_hz")))
    val clipSpec = SchemaSpec(Seq(
      FieldSpec("clip_id", StringType), FieldSpec("sr_hz", IntegerType)))
    val sess = new graft.runner.ValidationSession(spark,
      graft.runner.ValidationConfig(schemaSpec = Some(clipSpec)))
    val modular = sess.run(broken, graft.synth.Synth.dimCodec(spark).toDF(), Some(ref))
      .outcomes.map(o => o.checkName -> (o.status, o.rowsFailed)).toMap
    val fused = sess.runFused(broken, graft.synth.Synth.dimCodec(spark).toDF(), ref)
      .outcomes.map(o => o.checkName -> (o.status, o.rowsFailed)).toMap
    assert(fused("sr_hz_required") === ("FAIL", 1L))
    assert(fused("sr_hz_required") === modular("sr_hz_required"))
    assert(fused("schema_required_columns") === modular("schema_required_columns"))
    // evidence rows name the schema violation too
    val ev = sess.fusedViolations(broken, graft.synth.Synth.dimCodec(spark).toDF(), ref)
      .filter(col("check_name") === "sr_hz_required").collect()
    assert(ev.map(_.getString(1)).toSeq === Seq("clip_000000000000"))
  }

  test("UNCASTABLE declared-type mismatch fails for every non-null value") {
    val s = spark; import s.implicits._
    // id declared IntegerType but arrives as array<string>: no cast exists,
    // so every non-null value violates — the worst corruption must not be
    // the one that passes clean
    val df = Seq((Seq("1"), "ab", Seq("x")), (Seq("2"), "cd", Seq("y")),
      (null, "ef", Seq("z")))
      .toDF("id", "name", "tags")
    val out = outcomes(df)
    assert(out("id_type").status === "FAIL" && out("id_type").rowsFailed === 2)
    assert(SchemaCheck.compile(df, spec)
      .find(_.name == "id_type").get.description.contains("uncastable"))
  }

  test("modular run applies EngineConfig to schema row rules (fused parity)") {
    import org.apache.spark.sql.functions.{col, when, lit}
    val ref = graft.synth.Synth.clipsRef(spark, 1, 40, maxAudioMs = 200).toDF()
    val broken = ref.withColumn("sr_hz",
      when(col("clip_id") === "clip_000000000000", lit(null)).otherwise(col("sr_hz")))
    val clipSpec = SchemaSpec(Seq(
      FieldSpec("clip_id", StringType), FieldSpec("sr_hz", IntegerType)))
    // downgrade the schema row rule to warning; disable the predicate-suite
    // checks that the same null would otherwise fail as error
    val ec = graft.runner.EngineConfig.parse(spark,
      """{"suites": [{"suite": "predicate", "checks": [
        |  {"name": "sr_hz_required", "severity": "warning"},
        |  {"name": "sr_hz_domain", "severity": "warning"},
        |  {"name": "bytes_length_consistent", "enabled": false}
        |]}]}""".stripMargin)
    val sess = new graft.runner.ValidationSession(spark,
      graft.runner.ValidationConfig(schemaSpec = Some(clipSpec), engineConfig = ec))
    val dim = graft.synth.Synth.dimCodec(spark).toDF()
    val modular = sess.run(broken, dim, Some(ref))
    val fused = sess.runFused(broken, dim, ref)
    def of(r: graft.runner.ValidationReport, n: String) =
      r.outcomes.find(_.checkName == n).map(o => (o.status, o.rowsFailed))
    assert(of(modular, "sr_hz_required") === Some(("WARN", 1L)))
    assert(of(modular, "sr_hz_required") === of(fused, "sr_hz_required"))
    assert(modular.status === "SUCCESS" && fused.status === "SUCCESS")
  }

  test("duplicate unique-key ids raise the WARN (matches_schema.py:70-79)") {
    val s = spark; import s.implicits._
    val df = Seq((1, "ab", Seq("x")), (1, "cd", Seq("y")), (2, "ef", Seq("z")))
      .toDF("id", "name", "tags")
    val out = outcomes(df)
    assert(out("id_duplicate_warning").status === "WARN")
    assert(out("id_duplicate_warning").rowsFailed === 1) // one duplicated key
  }
}
