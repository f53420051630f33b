package graft

import org.apache.spark.sql.SparkSession
import graft.runner._
import graft.synth.{Mutations, Synth}

/** End-to-end demo of the validation engine through its public API:
  * synthesize the audio table, validate clean + mutated copies, show
  * per-check verdicts, violation rows, and checkpoint resume.
  * Usage: sbt "runMain graft.Demo [numParts rowsPerPart]"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val numParts = if (args.length > 0) args(0).toInt else 4
    val rowsPerPart = if (args.length > 1) args(1).toLong else 500L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ref = Synth.clipsRef(spark, numParts, rowsPerPart, maxAudioMs = 1000).cache()
    val dim = Synth.dimCodec(spark)
    println(s"== synthesized ${ref.count()} clips in $numParts partitions ==")

    val sess = new ValidationSession(spark)
    println("\n== clean run ==")
    val clean = sess.run(ref.toDF(), dim.toDF(), Some(ref.toDF()))
    println(s"status=${clean.status}")
    clean.outcomes.foreach(o => println(f"  ${o.checkName}%-28s ${o.status}%-6s rows_failed=${o.rowsFailed}"))

    println("\n== mutated run (dup + unknown codec + corrupt audio + drop row) ==")
    def part(i: Int) = f"p${i % numParts}%04d" // wrap for small demos
    val cand = Mutations.corruptAudio(
      Mutations.dropRow(
        Mutations.unknownCodec(
          Mutations.duplicateFirst(ref, part(0)), part(1)), part(2)), part(3))
    val bad = sess.run(cand.toDF(), dim.toDF(), Some(ref.toDF()))
    println(s"status=${bad.status}")
    bad.outcomes.filter(_.rowsFailed > 0).foreach(o =>
      println(f"  ${o.checkName}%-28s ${o.status}%-6s rows_failed=${o.rowsFailed} ${o.message.getOrElse("")}"))

    println("\n== violation rows (fused evidence: every check, one scan) ==")
    sess.fusedViolations(cand.toDF(), dim.toDF(), ref.toDF())
      .orderBy("check_name", "part_id", "clip_id").show(10, truncate = false)

    println("== checkpoint resume (grouped fused: ALL pending partitions in one pass) ==")
    val base = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val store = new CheckpointStore(spark, base + "/cp")
    val r1 = sess.runResumableFused(cand.toDF(), dim.toDF(), store, ref.toDF())
    println(s"first run validated: ${r1.keys.toSeq.sorted.mkString(",")} " +
      s"(${r1.count(_._2.status == "FAILED")} failed)")
    val r2 = sess.runResumableFused(cand.toDF(), dim.toDF(), store, ref.toDF())
    println(s"re-run validated only failed parts: ${r2.keys.toSeq.sorted.mkString(",")}")

    println("\n== declared-schema suite (open world) ==")
    import org.apache.spark.sql.types._
    val schemaSpec = graft.checks.SchemaSpec(Seq(
      graft.checks.FieldSpec("clip_id", StringType),
      graft.checks.FieldSpec("sr_hz", IntegerType),
      graft.checks.FieldSpec("dur_ms", IntegerType),
      graft.checks.FieldSpec("codec", StringType, minLength = Some(2)),
      graft.checks.FieldSpec("transcript", StringType, required = false)),
      uniqueKey = Some("clip_id"))
    graft.checks.SchemaCheck.run(cand.toDF(), schemaSpec).foreach(o =>
      println(f"  ${o.checkName}%-28s ${o.status}%-6s rows_failed=${o.rowsFailed}"))

    println("\n== report sinks (HTML includes the ref↔cand snapshot diff) ==")
    val resultStore = new ResultStore(spark, base + "/results")
    resultStore.writeReport("demo", "all", bad, System.currentTimeMillis())
    resultStore.writeSummaryCsv(base + "/summary_csv")
    resultStore.writeReportJson("demo", bad, base + "/report.json")
    val diff = graft.checks.Reconcile.diff(ref.toDF(), cand.toDF(),
      Seq("part_id", "clip_id"), Seq("codec", "dur_ms", "transcript"))
    resultStore.writeReportHtml("demo", bad, base + "/report.html",
      snapshotDiff = Some(diff))
    println(s"  wrote summary CSV + JSON + HTML under $base")

    println("\n== mutation experiment (config-driven, verdict vs expectation) ==")
    val expResult = new graft.experiment.ExperimentRunner(spark, ref, dim.toDF())
      .run(graft.experiment.Experiment.demoConfig(numParts))
    graft.experiment.Experiment.printTable(expResult)
    spark.stop()
  }
}
