package graft.runner

import java.nio.file.Files

/** Lease-protocol adversarial coverage (round-4 judge task #1): the
  * renew-heartbeat truncation window vs concurrent acquirers, and the
  * bounded upsert retry after a mid-upsert lease takeover.
  *
  * Lives in package graft.runner so the deterministic-theft test can reach
  * the `beforeSwap` seam and [[LeaseLostException]].
  */
class CheckpointLeaseSpec extends graft.SparkSpec {

  private def lockFile(dir: String) = new java.io.File(dir + ".lock")

  test("renewLease hammer: three short-lease writers, concurrent acquirers, no rows lost") {
    val dir = Files.createTempDirectory("ckpt-hammer").toFile.getAbsolutePath + "/cp"
    // 2.5s lease: every upsert's heartbeat fires (margin = lease/3 ≈ 830ms
    // < remaining life), so acquirers waiting on the lock poll THROUGH many
    // create(overwrite=true) truncation windows — before the settle
    // re-read fix, one of them classified the transiently-empty file as
    // crashed-writer garbage, swept it, and stole the live lease.
    val stores = (0 until 3).map(_ =>
      new CheckpointStore(spark, dir, leaseMsOverride = Some(2500L)))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = stores.zipWithIndex.map { case (st, i) =>
      Future {
        (0 until 3).foreach { j =>
          val p = f"w$i%d-p$j%d"
          st.markProcessing(Seq(p), "v1")
          st.markDone(p, success = (i + j) % 2 == 0, "v1", "{}")
        }
      }
    }
    Await.result(Future.sequence(fs), 5.minutes)
    val rows = stores.head.readAll().collect().map(c => c.part_id -> c.status).toMap
    assert(rows.size == 9, s"rows lost: ${rows.keys.toSeq.sorted}")
    for (i <- 0 until 3; j <- 0 until 3)
      assert(rows(f"w$i%d-p$j%d") == (if ((i + j) % 2 == 0) "SUCCESS" else "FAILED"))
    assert(!lockFile(dir).exists(), "a lease leaked past release")
  }

  test("mid-upsert lease theft aborts loudly, retries once, loses no rows") {
    val dir = Files.createTempDirectory("ckpt-theft").toFile.getAbsolutePath + "/cp"
    val thief = new CheckpointStore(spark, dir)
    @volatile var stolen = false
    // a store whose first swap window is interleaved by a competitor that
    // legitimately took the lease, wrote its own row, and released
    val victim = new CheckpointStore(spark, dir) {
      override protected def beforeSwap(): Unit = if (!stolen) {
        stolen = true
        // simulate expiry + takeover: replace the victim's lock with the
        // thief's short-lived lease, let the thief complete a full upsert
        // (merging the table as it stands), then release
        val lock = lockFile(dir)
        assert(lock.delete(), "victim lock not present at swap time")
        thief.markDone("stolen", success = true, "v1", "{}")
      }
    }
    victim.markProcessing(Seq("mine"), "v1") // no exception escapes: retried
    assert(stolen)
    val rows = victim.readAll().collect().map(c => c.part_id -> c.status).toMap
    assert(rows.keySet == Set("mine", "stolen"),
      s"retry dropped a row: ${rows.keySet}")
    assert(rows("mine") == "PROCESSING" && rows("stolen") == "SUCCESS")
    assert(!lockFile(dir).exists())
  }

  test("a transiently empty lock during renewal is NOT swept (settle re-read)") {
    val dir = Files.createTempDirectory("ckpt-settle").toFile.getAbsolutePath + "/cp"
    val store = new CheckpointStore(spark, dir)
    // live foreign lease that a renewal is truncating RIGHT NOW: an empty
    // file that refills ~50ms later. The acquirer's settle re-read must
    // observe the refill and leave the lease alone.
    val lock = lockFile(dir)
    lock.getParentFile.mkdirs()
    assert(lock.createNewFile()) // empty = the truncation window
    val refiller = new Thread(() => {
      Thread.sleep(50)
      val expiry = System.currentTimeMillis() + 1500
      java.nio.file.Files.write(lock.toPath,
        s"foreign-owner $expiry".getBytes("UTF-8"))
    })
    refiller.start()
    val t0 = System.currentTimeMillis()
    store.markProcessing(Seq("p0"), "v1")
    refiller.join()
    // the acquirer waited out the refilled foreign lease instead of
    // sweeping the empty file instantly
    assert(System.currentTimeMillis() - t0 >= 1000,
      "acquirer swept a refilling lock without waiting for the lease")
    assert(store.readAll().collect().map(_.part_id).toSeq == Seq("p0"))
  }
}
