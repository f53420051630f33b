package graft

import org.apache.spark.sql.functions._
import graft.audio.Pcm
import graft.functions.GraftFunctions

/** The native pcm_snr Catalyst expression: kernel parity with the decode-
  * then-compare path, codegen evaluation, null semantics (−∞, not NULL),
  * and SQL registration.
  */
class PcmSnrExprSpec extends SparkSpec {

  private def sig(sr: Int, ms: Int, f: Double, ph: Double) =
    Pcm.encode(Pcm.synthSignal(sr, ms, f, ph))

  test("snrDbBytesDirect is bit-identical to decode-then-snrDb") {
    val a = sig(16000, 120, 440.0, 0.1)
    val b = sig(16000, 120, 440.0, 0.11) // slightly different phase
    val cases = Seq(
      (a, a),                       // identical → +Inf
      (a, b),                       // finite SNR
      (a, a.take(a.length - 1)),    // one byte shorter → sample-count mismatch
      // BOTH payloads odd-length: the tail byte truncates on each side,
      // sample counts match, result is finite — the odd-tail parity case
      (a.take(a.length - 1), b.take(b.length - 1)),
      (a, a.take(10)),              // length mismatch → -Inf
      (Array.empty[Byte], Array.empty[Byte]), // empty → -Inf
      (null, a), (a, null))         // nulls → -Inf
    cases.foreach { case (r, c) =>
      val direct = Pcm.snrDbBytesDirect(r, c)
      val viaDecode =
        if (r == null || c == null) Double.NegativeInfinity else Pcm.snrDbBytes(r, c)
      assert(java.lang.Double.compare(direct, viaDecode) === 0,
        s"direct=$direct decode=$viaDecode")
    }
  }

  test("expression under codegen equals the kernel; nulls give -Inf, not NULL") {
    val s = spark; import s.implicits._
    val a = sig(16000, 100, 300.0, 0.0)
    val b = sig(16000, 100, 300.0, 0.02)
    val df = Seq((1L, a, b), (2L, a, a), (3L, null, b))
      .toDF("id", "ref", "cand")
    val rows = df.select(col("id"),
        GraftFunctions.pcmSnr(col("ref"), col("cand")).as("snr"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) === Pcm.snrDbBytesDirect(a, b))
    assert(rows(1).getDouble(1).isPosInfinity)
    assert(!rows(2).isNullAt(1) && rows(2).getDouble(1).isNegInfinity)
    // native expression: no ScalaUDF in the executed plan
    val plan = df.select(GraftFunctions.pcmSnr(col("ref"), col("cand")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"expected native expression:\n$plan")
  }

  test("pcm_snr registers as a SQL function (SparkSessionExtensions hook)") {
    val s = spark; import s.implicits._
    GraftFunctions.register(s)
    val a = sig(8000, 80, 200.0, 0.3)
    Seq((a, a)).toDF("r", "c").createOrReplaceTempView("snr_view")
    val v = s.sql("SELECT pcm_snr(r, c) AS snr FROM snr_view").head.getDouble(0)
    assert(v.isPosInfinity)
    // type checking rejects non-binary inputs
    val err = intercept[Exception] {
      s.sql("SELECT pcm_snr(1, 2)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("binary") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
