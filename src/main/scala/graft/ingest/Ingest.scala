package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.synth.Synth

/** Bronze → silver ingest — the engine's version of the reference's ETL
  * dataflow (`src/app2/dds/load_dds.py:18-196`): scan a semi-structured
  * staging table, filter by endpoint/run, parse JSON, EXPLODE the payload
  * array, project + cast nested fields (empty-string→null like
  * `NULLIF(founded,'')::int`, `load_dds.py:65`), dedupe on the natural key,
  * and write idempotently (`INSERT .. ON CONFLICT DO NOTHING`,
  * `load_dds.py:32` → dropDuplicates + anti-join-before-append here;
  * Iceberg MERGE INTO in production).
  *
  * Staging schema mirrors `stg.raw_football_api`
  * (`sql/initdb/stg_tables.sql:3-10`) transposed to the audio domain:
  * (id, endpoint, run_id, http_status, payload_json, load_dttm) where
  * payload_json = {"batch": <string>, "clips":[{clip_id, sr_hz, dur_ms,
  * codec, transcript}, ...]}.
  */
object Ingest {

  val payloadSchema: StructType = StructType(Seq(
    StructField("batch", StringType),
    StructField("clips", ArrayType(StructType(Seq(
      StructField("clip_id", StringType),
      StructField("sr_hz", StringType),      // arrives as text — cast at load
      StructField("dur_ms", StringType),
      StructField("codec", StringType),
      StructField("transcript", StringType)))))))

  /** Doubly-nested payload (T7): clips[] each carrying segments[] — the
    * standings[] × table[] shape (`load_dds.py:150-176`).
    */
  val segmentedPayloadSchema: StructType = StructType(Seq(
    StructField("batch", StringType),
    StructField("clips", ArrayType(StructType(Seq(
      StructField("clip_id", StringType),
      StructField("segments", ArrayType(StructType(Seq(
        StructField("seg_idx", StringType),
        StructField("dur_ms", StringType)))))))))))

  /** V1/S3 analogue: staging rows for one run with 2xx status and the clip
    * endpoint — the filter every reference check/load carries
    * (`load_dds.py:123-127`).
    */
  def stagingScan(stg: DataFrame, runId: String): DataFrame =
    stg.filter(col("run_id") === runId &&
      col("http_status") >= 200 && col("http_status") < 300 &&
      col("endpoint").like("clips/%"))

  /** Ingestion-layer checks over the raw staging table:
    *  - V1 `api_http_status_ok` (`stg/ingestion_suite/api_http_status_ok.py:18-34`):
    *    rows with status outside [200,300);
    *  - V2 `api_payload_shape_ok` (`api_payload_shape_ok.py:22-45`): clip
    *    endpoint rows whose payload lacks the required top-level key.
    * Evaluated through the same one-pass CheckCompiler as every other
    * predicate check.
    */
  def ingestionChecks: Seq[graft.model.Check] = {
    import graft.model.{Check, RuleGroup, Severity}
    Seq(
      Check("api_http_status_ok", RuleGroup.SchemaMismatch, Severity.Error,
        col("http_status") < 200 || col("http_status") >= 300,
        "staging rows must have 2xx status"),
      Check("api_payload_shape_ok", RuleGroup.SchemaMismatch, Severity.Error,
        col("endpoint").like("clips/%") &&
          get_json_object(col("payload_json"), "$.clips").isNull,
        "clip payloads must carry the 'clips' array"))
  }

  /** The T1–T7 shape: parse → explode → project/cast → distinct.
    * `NULLIF(x,'')::int` becomes when(col === "", null).cast(int); a failed
    * cast yields null (caught downstream by the sr_hz_domain check, the
    * `corrupt_id` detection path of the reference).
    */
  def parseClips(staged: DataFrame): DataFrame = {
    // NULLIF(x,'') + tolerant ::int — ANSI mode would throw on 'abc', but
    // the reference treats a malformed value as a LOAD-SURVIVING null that
    // the domain checks then flag (corrupt_id path), so try_cast it is
    def intOrNull(c: org.apache.spark.sql.Column) =
      when(c === "" || c.isNull, lit(null)).otherwise(c).try_cast(IntegerType)
    import org.apache.spark.sql.expressions.Window
    // first-writer-wins (T4/T8) must be DETERMINISTIC: the reference gets
    // it from staging-id insert order + ON CONFLICT DO NOTHING; an
    // arbitrary-row dropDuplicates would keep whichever duplicate a task
    // scanned first, flipping surviving fields between runs — rank by
    // (staging id, position within the payload array) instead. NULL
    // clip_ids are exempt from the dedupe (SQL unique indexes treat nulls
    // as distinct): every corrupt row survives for the checks to count.
    val w = Window.partitionBy(col("run_id"), col("clip_id"))
      .orderBy(col("__src_id"), col("__pos"))
    staged
      .select(col("id").as("__src_id"), col("run_id"),
        from_json(col("payload_json"), payloadSchema).as("p"))
      .select(col("__src_id"), col("run_id"), col("p.batch").as("part_id"),
        posexplode(col("p.clips")).as(Seq("__pos", "c")))
      .select(
        col("__src_id"), col("__pos"), col("run_id"), col("part_id"),
        col("c.clip_id").as("clip_id"),
        intOrNull(col("c.sr_hz")).as("sr_hz"),
        intOrNull(col("c.dur_ms")).as("dur_ms"),
        col("c.codec").as("codec"),
        col("c.transcript").as("transcript"))
      .withColumn("__rn",
        when(col("clip_id").isNull, lit(1))
          .otherwise(row_number().over(w)))
      .filter(col("__rn") === 1)
      .drop("__src_id", "__pos", "__rn")
  }

  /** T7 double-explode load: two Generators in sequence — outer explode of
    * `clips[]`, inner explode of each clip's `segments[]`, header fields
    * (run_id, batch, clip_id) carried alongside the inner elements. Mirrors
    * `CROSS JOIN LATERAL jsonb_array_elements(standings) st` then
    * `jsonb_array_elements(st->'table')` (`load_dds.py:150-176`), with the
    * same NULLIF-empty + tolerant int cast on leaf fields.
    */
  def parseClipSegments(staged: DataFrame): DataFrame = {
    def intOrNull(c: org.apache.spark.sql.Column) =
      when(c === "" || c.isNull, lit(null)).otherwise(c).try_cast(IntegerType)
    import org.apache.spark.sql.expressions.Window
    // same determinism + null semantics as parseClips: first writer by
    // (staging id, outer pos, inner pos) wins among duplicate non-null
    // seg_idx; null seg_idx rows (corrupt) are ALL kept — SQL unique
    // indexes treat nulls as distinct, and the checks must count them
    val w = Window.partitionBy(col("run_id"), col("clip_id"), col("seg_idx"))
      .orderBy(col("__src_id"), col("__cpos"), col("__spos"))
    staged
      .select(col("id").as("__src_id"), col("run_id"),
        from_json(col("payload_json"), segmentedPayloadSchema).as("p"))
      .select(col("__src_id"), col("run_id"), col("p.batch").as("part_id"),
        posexplode(col("p.clips")).as(Seq("__cpos", "c")))
      .select(col("__src_id"), col("__cpos"), col("run_id"), col("part_id"),
        col("c.clip_id").as("clip_id"),
        posexplode(col("c.segments")).as(Seq("__spos", "sg")))
      .select(col("__src_id"), col("__cpos"), col("__spos"),
        col("run_id"), col("part_id"), col("clip_id"),
        intOrNull(col("sg.seg_idx")).as("seg_idx"),
        intOrNull(col("sg.dur_ms")).as("dur_ms"))
      .withColumn("__rn",
        when(col("seg_idx").isNull, lit(1))
          .otherwise(row_number().over(w)))
      .filter(col("__rn") === 1)
      .drop("__src_id", "__cpos", "__spos", "__rn")
  }

  /** T4 dual-source union load: the same entity arriving via TWO endpoint
    * families (the reference's dim_season = standings header UNION matches
    * elements, `load_dds.py:76-108`), deduped by natural key with
    * DETERMINISTIC first-source-wins (the reference gets this from
    * statement order + ON CONFLICT DO NOTHING; here an explicit source
    * priority — arbitrary-row dropDuplicates would be nondeterministic
    * under parallel execution).
    */
  def parseClipsDual(staged: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val primary = parseClips(stagingScan2xx(staged).filter(col("endpoint").like("clips/%")))
      .withColumn("__prio", lit(1))
    val secondary = parseClips(stagingScan2xx(staged).filter(col("endpoint").like("reprocess/%")))
      .withColumn("__prio", lit(2))
    val w = Window.partitionBy(col("run_id"), col("clip_id"))
      .orderBy(col("__prio"), col("part_id"))
    primary.unionByName(secondary)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__prio", "__rn")
  }

  private def stagingScan2xx(stg: DataFrame): DataFrame =
    stg.filter(col("http_status") >= 200 && col("http_status") < 300)

  /** S2 manifest metadata: one row per (run, entity) recording load volumes
    * and key ranges — the engine's analogue of the reference's per-run
    * `manifest.json` (run_id, counts per entity, file list) re-expressed as
    * a queryable table (Iceberg snapshot/table properties in production).
    */
  def manifest(rows: DataFrame, runId: String, entity: String): DataFrame =
    rows.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("part_id")).as("n_parts"),
      min(col("clip_id")).as("min_clip_id"),
      max(col("clip_id")).as("max_clip_id"))
      .withColumn("run_id", lit(runId))
      .withColumn("entity", lit(entity))
      .withColumn("loaded_at", current_timestamp())

  /** S4 payload picker: the LATEST staging row per endpoint
    * (`SELECT response_json ... ORDER BY id DESC LIMIT 1` per entity kind,
    * `experiments/stg_payloads.py:11-62`) — a rank window, deterministic on
    * the monotone staging id.
    */
  def latestPayloads(stg: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("endpoint")).orderBy(col("id").desc)
    stg.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** T8 idempotent append: only rows whose key is not already present are
    * written (ON CONFLICT DO NOTHING). With an Iceberg catalog this is a
    * single MERGE INTO; on plain parquet it is an anti-join + append, which
    * is safe under a SINGLE writer because the key set is re-read from
    * storage each call (concurrent writers need the transactional MERGE —
    * check-then-append races otherwise).
    *
    * Target existence goes through the Hadoop FileSystem API so hdfs:// and
    * s3a:// URIs behave the same as local paths; the anti-joined batch is
    * persisted so count + write share one computation.
    */
  def idempotentAppend(spark: SparkSession, rows: DataFrame, path: String,
                       keyCols: Seq[String]): Long = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh =
      if (!fs.exists(hPath)) rows
      else {
        val existingKeys = spark.read.parquet(path).select(keyCols.map(col): _*)
        rows.join(existingKeys, keyCols, "left_anti")
      }
    fresh.persist()
    try {
      val n = fresh.count()
      if (n > 0) fresh.write.mode("append").parquet(path)
      n
    } finally { fresh.unpersist(); () }
  }

  /** Deterministic synthetic staging table (T9/S1 analogue): JSON payloads
    * of `clipsPerBatch` clip stubs per batch row. Seeded — no RNG state.
    */
  def synthStaging(spark: SparkSession, runId: String, numBatches: Int,
                   clipsPerBatch: Int, badRows: Boolean = false): DataFrame = {
    import spark.implicits._
    val rows = (0 until numBatches).map { b =>
      val clips = (0 until clipsPerBatch).map { i =>
        val idx = b.toLong * clipsPerBatch + i
        val c = Synth.clipAt(idx, numBatches, clipsPerBatch.toLong, 400)
        val srTxt =
          if (badRows && b == 0 && i == 0) "abc" // corrupt_id analogue
          else c.sr_hz.toString
        s"""{"clip_id":"${c.clip_id}","sr_hz":"$srTxt","dur_ms":"${c.dur_ms}",""" +
          s""""codec":"${c.codec}","transcript":"${c.transcript}"}"""
      }.mkString(",")
      val partLabel = f"p$b%04d"
      (b.toLong, s"clips/batch/$b", runId, 200,
        s"""{"batch":"$partLabel","clips":[$clips]}""",
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    }
    rows.toDF("id", "endpoint", "run_id", "http_status", "payload_json", "load_dttm")
  }
}
