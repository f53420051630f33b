package graft.runner

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import graft.model.Checkpoint

/** Parquet-backed checkpoint table with the reference's batch-status FSM
  * semantics (`tech.etl_batch_status`, `sql/initdb/tech_tables.sql:24-41`;
  * claim/update logic `src/app2/db/batch.py:5-78`; resume filter
  * `etl_validation/discovery.py:203-223`): a restarted run skips partitions
  * already in SUCCESS, retries FAILED/NEW, and bumps `attempts`.
  *
  * The sandbox has no Iceberg runtime jar, so storage is a parquet
  * directory rewritten atomically (tmp + rename); the table is tiny (one
  * row per partition), so a full rewrite per update batch is O(partitions),
  * not O(rows). Swapping in an Iceberg MERGE INTO is a storage-layer change
  * only.
  */
class CheckpointStore(spark: SparkSession, path: String) {
  import spark.implicits._

  private def fs(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def readAll(): Dataset[Checkpoint] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + ".bak")
    val f = fs(path)
    // crash recovery: a swap interrupted between the two renames leaves the
    // complete previous table at .bak and nothing at the main path — promote
    // it back rather than reporting an empty checkpoint (which would drop
    // attempt counters and re-validate everything). If even the promote
    // rename fails (transient FS error), read the .bak copy directly —
    // never silently degrade to an empty table while a complete copy exists.
    val src =
      if (f.exists(hp)) hp
      else if (f.exists(bak)) { if (f.rename(bak, hp)) hp else bak }
      else hp
    if (!f.exists(src) || f.listStatus(src).isEmpty) spark.emptyDataset[Checkpoint]
    else spark.read.parquet(src.toString).as[Checkpoint]
  }

  /** Upsert by part_id (last writer wins) — MERGE INTO semantics.
    *
    * Swap protocol (single writer; concurrent writers need a transactional
    * catalog): write the merged table to a unique .tmp, rename the live
    * table aside to .bak, rename .tmp into place, drop .bak. Every rename
    * result is CHECKED — Hadoop FS rename signals failure by returning
    * false, and ignoring it would silently lose the whole table. At any
    * crash point a complete copy exists at the main path or at .bak (see
    * [[readAll]] recovery).
    */
  def upsert(rows: Seq[Checkpoint]): Unit = synchronized {
    val existing = readAll().collect().map(c => c.part_id -> c).toMap
    val merged = (existing ++ rows.map(c => c.part_id -> c)).values.toSeq
    val tmp = path + ".tmp-" + java.util.UUID.randomUUID().toString
    spark.createDataset(merged).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val f = fs(path)
    val dst = new org.apache.hadoop.fs.Path(path)
    val src = new org.apache.hadoop.fs.Path(tmp)
    val bak = new org.apache.hadoop.fs.Path(path + ".bak")
    if (f.exists(bak)) f.delete(bak, true)
    val hadPrev = f.exists(dst)
    if (hadPrev && !f.rename(dst, bak))
      throw new java.io.IOException(s"checkpoint swap: could not move $dst aside")
    if (!f.rename(src, dst)) {
      if (hadPrev) f.rename(bak, dst) // restore the previous table
      throw new java.io.IOException(s"checkpoint swap: rename $src -> $dst failed")
    }
    if (hadPrev) f.delete(bak, true)
    ()
  }

  def markProcessing(partIds: Seq[String], ruleVersion: String): Unit = {
    val now = System.currentTimeMillis()
    val existing = readAll().collect().map(c => c.part_id -> c).toMap
    upsert(partIds.map { p =>
      val prev = existing.get(p)
      Checkpoint(p, "PROCESSING", prev.map(_.attempts).getOrElse(0) + 1,
        ruleVersion, prev.map(_.metrics_json).getOrElse("{}"), now)
    })
  }

  def markDone(partId: String, success: Boolean, ruleVersion: String,
               metricsJson: String): Unit =
    upsert(Seq(Checkpoint(partId, if (success) "SUCCESS" else "FAILED",
      readAll().collect().find(_.part_id == partId).map(_.attempts).getOrElse(1),
      ruleVersion, metricsJson, System.currentTimeMillis())))

  /** Bulk variant: one table rewrite for N partition verdicts (the grouped
    * fused path finishes all pending partitions in one pass — writing one
    * rewrite per partition would be O(P²) rows rewritten).
    */
  def markDoneBulk(results: Seq[(String, Boolean, String)], ruleVersion: String): Unit = {
    val now = System.currentTimeMillis()
    val attempts = readAll().collect().map(c => c.part_id -> c.attempts).toMap
    upsert(results.map { case (p, success, metrics) =>
      Checkpoint(p, if (success) "SUCCESS" else "FAILED",
        attempts.getOrElse(p, 1), ruleVersion, metrics, now)
    })
  }

  /** Resume filter: partitions still needing validation under this rule
    * version (discovery.py:203-223 `only_unprocessed` semantics — SUCCESS
    * under the SAME rule version is skipped; a rule-version bump
    * invalidates prior checkpoints).
    */
  def pending(allParts: Seq[String], ruleVersion: String): Seq[String] = {
    val done = readAll().collect()
      .filter(c => c.status == "SUCCESS" && c.rule_version == ruleVersion)
      .map(_.part_id).toSet
    allParts.filterNot(done)
  }
}
