package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.Check

/** One events-table row for the deterministic replay harness. */
final case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
                          event_type: String, value: Double, props: String)

/** Deterministic bounded replay of a BATCH table through the streaming
  * twin — the correctness bridge that lets a DuckDB batch query oracle a
  * Structured Streaming operator (round-3 VERDICT task #5: the streaming
  * twin was unit-tested only, with no cross-engine evidence).
  *
  * Replay contract that makes stream output == batch truth:
  *  - rows are fed in (ts, event_id) order, split into `batches`
  *    micro-batches → nothing is ever late against the watermark, so the
  *    watermark drops no data and every per-window count equals the batch
  *    GROUP BY;
  *  - two SENTINEL batches (each one row, event time far past the real
  *    maximum) close the stream: the watermark is computed from data
  *    through batch N−1, so sentinel #1 advances it past every real
  *    window's end and sentinel #2 triggers the batch that flushes them
  *    from the state store (append mode emits only on watermark close);
  *  - sentinel windows start strictly after the real max event time and
  *    are filtered out of the returned frame.
  *
  * This harness is the AUDIT shape (collect + in-memory source on one
  * box); production streams swap the MemoryStream for Kafka/files with
  * the same [[StreamingValidation.windowedCheckCounts]] plan, whose state
  * is O(open windows × checks) regardless of input volume.
  */
object StreamReplay {

  private val sinkCounter = new AtomicInteger(0)

  /** Replay `events` (schema: event_id, ts, user_id, event_type, value,
    * props) through [[StreamingValidation.windowedCheckCounts]]; returns
    * the per-window check pivot for every REAL window, ordered by window
    * start.
    */
  def eventsWindowCounts(spark: SparkSession, events: DataFrame,
                         checks: Seq[Check],
                         windowDur: String = "1 hour",
                         watermarkDelay: String = "30 minutes",
                         batches: Int = 4): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = events
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[EventRow].collect()
      .sortBy(r => (r.ts.getTime, r.event_id))
    require(rows.nonEmpty, "eventsWindowCounts: empty input")
    val maxTs = rows.last.ts.getTime
    val input = MemoryStream[EventRow]
    val sink = s"__stream_replay_${sinkCounter.incrementAndGet()}"
    // State here is O(open windows), a few hundred rows — but the state
    // STORE instantiates per shuffle partition per micro-batch (commit +
    // snapshot files each). At the session's 32 partitions × 6 batches
    // that is ~200 store commits of near-empty state, which dominated the
    // replay's wall time; pin the streaming aggregation to a handful of
    // partitions for the duration of the query. (A production stream with
    // real state volume keeps the session default.)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q = StreamingValidation
      .windowedCheckCounts(input.toDF(), checks, "ts", windowDur, watermarkDelay)
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      val slice = math.max(1, math.ceil(rows.length.toDouble / batches).toInt)
      rows.grouped(slice).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      val hour = 3600L * 1000
      input.addData(Seq(EventRow(-1L, new Timestamp(maxTs + 2 * hour), -1L, "__sentinel", 0.0, "")))
      q.processAllAvailable()
      input.addData(Seq(EventRow(-2L, new Timestamp(maxTs + 4 * hour), -1L, "__sentinel", 0.0, "")))
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    }
    // the memory sink's temp view outlives the stopped query
    spark.table(sink)
      .filter(col("window_start") <= lit(new Timestamp(maxTs)))
      .orderBy(col("window_start"))
  }
}
