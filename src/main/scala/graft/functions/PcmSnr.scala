package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}
import graft.audio.Pcm

/** Native Catalyst expression for the engine's hottest scalar: decoded-PCM
  * SNR between two binary payloads. Compared to the Scala-UDF form this
  * stays INSIDE whole-stage codegen — no ScalaUDF boxing/closure dispatch —
  * and the generated Java calls one static kernel
  * ([[Pcm.snrDbBytesDirect]]) that fuses decode into the accumulation loop.
  *
  * NULL semantics are deliberately NOT null-propagating: a missing payload
  * is a VIOLATION, not an unknown — the expression always evaluates to a
  * double, −∞ when either side is null (mirrors RowInvariant/Runner
  * semantics where null bytes must count against pcm_allclose).
  */
case class PcmSnr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pcm_snr expects (binary, binary), got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "pcm_snr"

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    Pcm.snrDbBytesDirect(
      if (l == null) null else l.asInstanceOf[Array[Byte]],
      if (r == null) null else r.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val resultCode =
      code"""
        ${l.code}
        ${r.code}
        double ${ev.value} = graft.audio.Pcm.snrDbBytesDirect(
          ${l.isNull} ? null : ${l.value},
          ${r.isNull} ? null : ${r.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PcmSnr =
    copy(left = newLeft, right = newRight)
}

/** Registration hooks: Column form for the DataFrame API, a SQL function
  * `pcm_snr(ref, cand)` registrable on a live session, and a
  * SparkSessionExtensions injector for `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {

  /** Column form (classic-mode Expression → Column bridge). */
  def pcmSnr(ref: Column, cand: Column): Column = {
    import org.apache.spark.sql.classic.ColumnConversions.toRichColumn
    org.apache.spark.sql.graft.ExpressionBridge.column(
      PcmSnr(ref.expr, cand.expr))
  }

  /** Column form of `pcm_stats(bytes)` — per-payload audio quality struct. */
  def pcmStats(bytes: Column): Column = {
    import org.apache.spark.sql.classic.ColumnConversions.toRichColumn
    org.apache.spark.sql.graft.ExpressionBridge.column(PcmStats(bytes.expr))
  }

  /** Column form of `pcm_fingerprint(bytes)` — 64-bit content fingerprint. */
  def pcmFingerprint(bytes: Column): Column = {
    import org.apache.spark.sql.classic.ColumnConversions.toRichColumn
    org.apache.spark.sql.graft.ExpressionBridge.column(PcmFingerprint(bytes.expr))
  }

  /** Column wrapper for [[PcmHum]]: `pcm_hum(bytes, sr_hz)`. */
  def pcmHum(bytes: Column, srHz: Column): Column = {
    import org.apache.spark.sql.classic.ColumnConversions.toRichColumn
    org.apache.spark.sql.graft.ExpressionBridge.column(
      PcmHum(bytes.expr, srHz.expr))
  }

  /** One source of truth for the SQL registration, shared by the live
    * session registry and the extensions injector — the two paths must
    * never drift on name/arity.
    */
  private[functions] val info = new ExpressionInfo(classOf[PcmSnr].getName, "pcm_snr")
  private[functions] val builder = (children: Seq[Expression]) => {
    require(children.size == 2, "pcm_snr(ref_bytes, cand_bytes) takes 2 arguments")
    // an untyped NULL literal (SELECT pcm_snr(x, NULL)) arrives as NullType,
    // which the strict BinaryType input check would reject at analysis —
    // retype it so the documented null→-Inf violation semantics hold in SQL
    val typed = children.map {
      case e if e.dataType == org.apache.spark.sql.types.NullType =>
        org.apache.spark.sql.catalyst.expressions.Literal(
          null, org.apache.spark.sql.types.BinaryType)
      case e => e
    }
    PcmSnr(typed(0), typed(1))
  }

  private[functions] val statsInfo =
    new ExpressionInfo(classOf[PcmStats].getName, "pcm_stats")
  private[functions] val statsBuilder = (children: Seq[Expression]) => {
    require(children.size == 1, "pcm_stats(bytes) takes 1 argument")
    PcmStats(retypeNullLiteral(children.head))
  }

  private[functions] val fingerprintInfo =
    new ExpressionInfo(classOf[PcmFingerprint].getName, "pcm_fingerprint")
  private[functions] val fingerprintBuilder = (children: Seq[Expression]) => {
    require(children.size == 1, "pcm_fingerprint(bytes) takes 1 argument")
    PcmFingerprint(retypeNullLiteral(children.head))
  }

  private[functions] val humInfo =
    new ExpressionInfo(classOf[PcmHum].getName, "pcm_hum")
  private[functions] val humBuilder = (children: Seq[Expression]) => {
    require(children.size == 2, "pcm_hum(bytes, sr_hz) takes 2 arguments")
    PcmHum(retypeNullLiteral(children.head), children(1))
  }

  private def retypeNullLiteral(e: Expression): Expression =
    if (e.dataType == org.apache.spark.sql.types.NullType)
      org.apache.spark.sql.catalyst.expressions.Literal(
        null, org.apache.spark.sql.types.BinaryType)
    else e

  /** Register the pcm functions in a live session's function registry. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("pcm_snr"), info, builder)
    reg.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("pcm_stats"),
      statsInfo, statsBuilder)
    reg.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("pcm_fingerprint"),
      fingerprintInfo, fingerprintBuilder)
    reg.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("pcm_hum"),
      humInfo, humBuilder)
    ()
  }
}

/** `SparkSessionExtensions` injector — enables
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` on
  * spark-submit so `pcm_snr` is available in pure SQL everywhere.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("pcm_snr"),
      GraftFunctions.info, GraftFunctions.builder))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("pcm_stats"),
      GraftFunctions.statsInfo, GraftFunctions.statsBuilder))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("pcm_fingerprint"),
      GraftFunctions.fingerprintInfo, GraftFunctions.fingerprintBuilder))
    ()
  }
}
