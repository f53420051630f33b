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
  * not O(rows). Concurrent runners are serialized by a lease file — the
  * `FOR UPDATE SKIP LOCKED` analogue (`batch.py:45-78`). Swapping in an
  * Iceberg MERGE INTO is a storage-layer change only.
  */
class CheckpointStore(spark: SparkSession, path: String) {
  import spark.implicits._

  private def fs(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ==== writer lease — the `FOR UPDATE SKIP LOCKED` analogue ================
  // The reference claims batches under a row lock (`src/app2/db/batch.py:
  // 45-78` SELECT ... FOR UPDATE SKIP LOCKED) so two concurrent runners
  // never double-process or lose each other's status writes. The parquet
  // store's equivalent: every read-modify-write (readAll → merge → swap)
  // runs under a lease file `<path>.lock` holding "ownerId expiryMillis".
  //
  // Acquisition protocol: sweep an expired lease, create the lock file with
  // overwrite=false, then RE-READ AFTER WRITE — local/posix create-no-
  // overwrite is check-then-create, so two racers can both "create"; the
  // settle-then-confirm read resolves the race to the single owner whose id
  // the file finally holds. The expiry bounds a crashed writer's hold; on a
  // real deployment this whole store is the documented Iceberg-MERGE swap-in
  // and the lease becomes the catalog's commit protocol.
  private val ownerId = java.util.UUID.randomUUID().toString
  // 120s: must outlast one full read-merge-swap under this host's load
  // spikes — an upsert outliving its lease would let a second writer take
  // over mid-swap (the pre-swap ownership re-check in [[upsert]] turns
  // that residual race into a loud abort, never silent row loss)
  private val leaseMs: Long =
    sys.env.getOrElse("GRAFT_CHECKPOINT_LEASE_MS", "120000").toLong
  private val acquireTimeoutMs: Long =
    sys.env.getOrElse("GRAFT_CHECKPOINT_LOCK_TIMEOUT_MS", "180000").toLong
  private var leaseDepth = 0 // re-entrancy: public mutators are synchronized

  private def lockPath = new org.apache.hadoop.fs.Path(path + ".lock")

  private def readLock(): Option[(String, Long)] = {
    val f = fs(path)
    if (!f.exists(lockPath)) None
    else try {
      val in = f.open(lockPath)
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      content.split(" ") match {
        case Array(owner, expiry) => Some((owner, expiry.toLong))
        case _ => None // garbage lock file: treat as expired
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def acquireLease(): Unit = {
    val f = fs(path)
    val deadline = System.currentTimeMillis() + acquireTimeoutMs
    var acquired = false
    while (!acquired) {
      val now = System.currentTimeMillis()
      val observed = readLock()
      observed match {
        case Some((owner, expiry)) if owner != ownerId && expiry >= now =>
          // live foreign lease: wait for release or expiry
          if (now > deadline) throw new java.io.IOException(
            s"checkpoint table $path is locked by writer $owner " +
              "(lease unexpired) — concurrent writers need the Iceberg catalog swap-in")
          Thread.sleep(100)
        case _ =>
          // stale/expired OR unparsable-garbage lock (a writer crashed
          // between create and write leaves an empty file readLock maps to
          // None — it must be swept too, or create(overwrite=false) fails
          // forever and every writer deadlocks). Re-read immediately before
          // deleting and only delete if the content is UNCHANGED since the
          // decision was made — never a lease someone acquired in between.
          if (f.exists(lockPath) && readLock() == observed)
            f.delete(lockPath, false)
          try {
            val out = f.create(lockPath, false)
            out.write(s"$ownerId ${now + leaseMs}".getBytes("UTF-8"))
            out.close()
            Thread.sleep(20) // settle window before the confirm read
            acquired = readLock().exists(_._1 == ownerId)
          } catch { case _: java.io.IOException => () } // lost the create race
          if (!acquired) {
            if (System.currentTimeMillis() > deadline)
              throw new java.io.IOException(
                s"checkpoint lease on $path not acquired within ${acquireTimeoutMs}ms")
            Thread.sleep(50) // back off instead of spinning on a held lock
          }
      }
    }
  }

  /** Heartbeat: extend an owned, still-unexpired lease. A parquet write
    * under heavy host contention can stretch past `leaseMs` (observed in
    * round 4: a storm inflated a sub-second write to minutes), and letting
    * the lease lapse mid-upsert forces the loud abort path. Renewing while
    * the lease is still live is safe — no competitor may acquire before
    * expiry, and the pre-swap ownership re-assert still catches the case
    * where the lease lapsed anyway.
    */
  private def renewLease(): Unit = {
    val f = fs(path)
    readLock() match {
      case Some((owner, expiry)) if owner == ownerId &&
          expiry > System.currentTimeMillis() =>
        try {
          val out = f.create(lockPath, true)
          out.write(s"$ownerId ${System.currentTimeMillis() + leaseMs}".getBytes("UTF-8"))
          out.close()
        } catch { case scala.util.control.NonFatal(_) => () }
      case _ => ()
    }
  }

  private def releaseLease(): Unit = {
    val f = fs(path)
    // delete only a lock we still own — never a successor's lease taken
    // after ours expired
    if (readLock().exists(_._1 == ownerId)) f.delete(lockPath, false)
    ()
  }

  /** Runs `body` under the writer lease (re-entrant within this store). */
  private def withLease[T](body: => T): T = {
    if (leaseDepth > 0) { leaseDepth += 1; try body finally leaseDepth -= 1 }
    else {
      acquireLease()
      leaseDepth = 1
      try body finally { leaseDepth = 0; releaseLease() }
    }
  }

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

  /** Upsert by part_id (last writer wins) — MERGE INTO semantics, executed
    * under the writer lease so a concurrent store's read-modify-write can
    * never interleave with (and silently drop) this one's rows.
    *
    * Swap protocol: write the merged table to a unique .tmp, rename the
    * live table aside to .bak, rename .tmp into place, drop .bak. Every
    * rename result is CHECKED — Hadoop FS rename signals failure by
    * returning false, and ignoring it would silently lose the whole table.
    * At any crash point a complete copy exists at the main path or at .bak
    * (see [[readAll]] recovery). Orphaned `.tmp-*` dirs from a writer that
    * crashed between parquet write and rename are swept here: under the
    * lease no other writer has a live .tmp, so any sibling is garbage.
    */
  def upsert(rows: Seq[Checkpoint]): Unit = synchronized { withLease {
    val f = fs(path)
    val dst = new org.apache.hadoop.fs.Path(path)
    Option(f.globStatus(new org.apache.hadoop.fs.Path(path + ".tmp-*")))
      .foreach(_.foreach(st => f.delete(st.getPath, true)))
    val existing = readAll().collect().map(c => c.part_id -> c).toMap
    val merged = (existing ++ rows.map(c => c.part_id -> c)).values.toSeq
    renewLease() // the write below is the long step — start it with a fresh lease
    val tmp = path + ".tmp-" + java.util.UUID.randomUUID().toString
    spark.createDataset(merged).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    // the parquet write can outlive the lease under host load; a successor
    // may have legitimately taken over (and swept this .tmp). Re-assert
    // ownership BEFORE the swap — losing the lease mid-upsert must be a
    // loud abort, never a silent interleave that drops the other writer's
    // rows.
    if (!readLock().exists(_._1 == ownerId))
      throw new java.io.IOException(
        s"checkpoint lease on $path lost mid-upsert (expired or taken " +
          "over by another writer) — aborting the swap; retry the update")
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
  } }

  def markProcessing(partIds: Seq[String], ruleVersion: String): Unit =
    synchronized { withLease {
      val now = System.currentTimeMillis()
      val existing = readAll().collect().map(c => c.part_id -> c).toMap
      upsert(partIds.map { p =>
        val prev = existing.get(p)
        Checkpoint(p, "PROCESSING", prev.map(_.attempts).getOrElse(0) + 1,
          ruleVersion, prev.map(_.metrics_json).getOrElse("{}"), now)
      })
    } }

  def markDone(partId: String, success: Boolean, ruleVersion: String,
               metricsJson: String): Unit = synchronized { withLease {
    upsert(Seq(Checkpoint(partId, if (success) "SUCCESS" else "FAILED",
      readAll().collect().find(_.part_id == partId).map(_.attempts).getOrElse(1),
      ruleVersion, metricsJson, System.currentTimeMillis())))
  } }

  /** Bulk variant: one table rewrite for N partition verdicts (the grouped
    * fused path finishes all pending partitions in one pass — writing one
    * rewrite per partition would be O(P²) rows rewritten).
    */
  def markDoneBulk(results: Seq[(String, Boolean, String)], ruleVersion: String): Unit =
    synchronized { withLease {
      val now = System.currentTimeMillis()
      val attempts = readAll().collect().map(c => c.part_id -> c.attempts).toMap
      upsert(results.map { case (p, success, metrics) =>
        Checkpoint(p, if (success) "SUCCESS" else "FAILED",
          attempts.getOrElse(p, 1), ruleVersion, metrics, now)
      })
    } }

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
