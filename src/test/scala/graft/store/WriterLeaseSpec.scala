package graft.store

import graft.SparkTestSession
import graft.core._
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.scalatest.funsuite.AnyFunSuite

/** Cross-process writer fence (r14 verdict #1): the parquet store's
  * single-writer invariant enforced ACROSS JVMs via an exclusive lease
  * file with a fencing epoch — two instances on one root resolve to one
  * un-fenced writer, and the loser provably cannot write. */
class WriterLeaseSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def mid(n: Int): String = f"00000000-0000-0000-0000-$n%012d"
  private def msgs(ns: Int*): Seq[NewStreamMessage] =
    ns.map(n => NewStreamMessage(mid(n), "type", s"""{"data":$n}"""))

  private def fs(dir: String): FileSystem =
    FileSystem.get(new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  test("takeover mode (explicit opt-in): a second open takes over and FENCES the first — the loser cannot write") {
    val dir = SparkTestSession.tempDir("graft-lease-fence")
    val a = new SparkStreamStore(spark, dir)
    a.appendToStream("s", ExpectedVersion.NoStream, msgs(1, 2))
    // second instance on the same root: takeover bumps the fencing epoch
    val b = new SparkStreamStore(spark, dir, leaseTimeoutMs = 0L)
    try {
      assert(b.lease.epoch === a.lease.epoch + 1)
      // the loser discovers the takeover on its next (synchronous) poll
      a.lease.pollNow()
      assert(a.lease.isFenced)
      val e = intercept[StoreFencedException](
        a.appendToStream("s", ExpectedVersion.Any, msgs(3)))
      assert(e.getMessage.contains("taken over"))
      // deletes and metadata writes funnel through the same guard
      intercept[StoreFencedException](a.deleteStream("s"))
      intercept[StoreFencedException](a.setStreamMetadata("s", maxCount = Some(1)))
      // the winner owns the log: it recovered the loser's acked rows and
      // appends normally
      assert(b.readStreamForwards("s").messages.map(_.streamVersion) === Seq(0, 1))
      b.appendToStream("s", 1, msgs(3))
      assert(b.readHeadPosition() === 2L)
      // a fenced close must not erase the winner's lock
      a.close()
      assert(fs(dir).exists(WriterLease.lockPathOf(dir)))
      assert(!b.lease.isFenced)
    } finally b.close()
  }

  test("even without a poll, the loser cannot PUBLISH: segment flush verifies the lock synchronously") {
    val dir = SparkTestSession.tempDir("graft-lease-flush")
    // big flush window: rows stay buffered in the loser's memtable
    val a = new SparkStreamStore(spark, dir)
    a.appendToStream("s", ExpectedVersion.NoStream, msgs(1))
    val b = new SparkStreamStore(spark, dir, leaseTimeoutMs = 0L)
    try {
      // the loser has NOT polled — its volatile fenced latch is stale,
      // but flush() re-verifies the lock file before publishing
      intercept[StoreFencedException](a.flush())
      assert(a.lease.isFenced)
      a.close() // discards the buffer instead of writing a farewell segment
      assert(b.readHeadPosition() === 0L)
    } finally b.close()
  }

  test("the DEFAULT is strict: a routine second open cannot fence a live writer (r15 advice)") {
    val dir = SparkTestSession.tempDir("graft-lease-default")
    val a = new SparkStreamStore(spark, dir)
    a.appendToStream("s", ExpectedVersion.NoStream, msgs(1))
    try {
      // e.g. an operator opening the production root "for inspection":
      // default parameters must fail loudly, never silently take over
      // and drop the live writer's acked appends
      intercept[StoreLockedException](new SparkStreamStore(spark, dir))
      assert(!a.lease.isFenced)
      a.appendToStream("s", 0, msgs(2)) // holder unaffected
      assert(a.readHeadPosition() === 1L)
    } finally a.close()
  }

  test("object-store schemes are refused: non-atomic exclusive create cannot back the lease") {
    // a FileSystem claiming the s3a scheme (create(overwrite=false) is
    // check-then-create there) — acquire must refuse the root loudly
    // rather than silently weaken the exclusivity claim (r15 verdict)
    val fake = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def getUri: java.net.URI = java.net.URI.create("s3a://bucket")
      override def getScheme: String = "s3a"
    }
    fake.initialize(java.net.URI.create("s3a://bucket"),
      spark.sparkContext.hadoopConfiguration)
    val log = org.slf4j.LoggerFactory.getLogger(classOf[WriterLeaseSpec])
    val e = intercept[UnsupportedOperationException](
      WriterLease.acquire(fake, "s3a://bucket/store", 30000L, 1000L, log))
    assert(e.getMessage.contains("s3a"))
    assert(e.getMessage.contains("single writer"))
  }

  test("strict mode: a second open fails loudly while the holder's heartbeat is fresh") {
    val dir = SparkTestSession.tempDir("graft-lease-strict")
    val a = new SparkStreamStore(spark, dir)
    try {
      val e = intercept[StoreLockedException](
        new SparkStreamStore(spark, dir, leaseTimeoutMs = 600000L))
      assert(e.getMessage.contains("locked by writer"))
      assert(!a.lease.isFenced)
      a.appendToStream("s", ExpectedVersion.NoStream, msgs(1)) // holder unaffected
    } finally a.close()
  }

  test("strict mode: a STALE lock (holder dead past the timeout) is broken and taken over") {
    val dir = SparkTestSession.tempDir("graft-lease-stale")
    val a = new SparkStreamStore(spark, dir)
    a.appendToStream("s", ExpectedVersion.NoStream, msgs(1))
    // simulate holder death: backdate the lock's heartbeat far past the
    // timeout (a real crash leaves exactly this: a lock nobody refreshes)
    val lock = WriterLease.lockPathOf(dir)
    fs(dir).setTimes(lock, System.currentTimeMillis() - 120000L, -1L)
    val b = new SparkStreamStore(spark, dir, leaseTimeoutMs = 60000L)
    try {
      assert(b.lease.epoch === a.lease.epoch + 1)
      assert(b.readStreamForwards("s").messages.map(_.streamVersion) === Seq(0))
    } finally { b.close(); a.lease.release() }
  }

  test("clean close releases the lease; epochs stay MONOTONIC across reopens (no regression)") {
    val dir = SparkTestSession.tempDir("graft-lease-clean")
    val a = new SparkStreamStore(spark, dir)
    val epochA = a.lease.epoch
    a.appendToStream("s", ExpectedVersion.NoStream, msgs(1))
    a.close()
    assert(!fs(dir).exists(WriterLease.lockPathOf(dir)))
    val b = new SparkStreamStore(spark, dir, leaseTimeoutMs = 600000L)
    val epochB = b.lease.epoch
    try {
      // the epoch counter NEVER restarts — a clean-close reopen claims a
      // fresh, higher epoch, so a not-yet-fenced zombie from an earlier
      // tenure can never tie (r15 review finding: the old scheme
      // restarted at 1 whenever the LOCK file was absent)
      assert(epochB > epochA)
      assert(b.readStreamForwards("s").messages.map(_.streamVersion) === Seq(0))
    } finally b.close()
    val c = new SparkStreamStore(spark, dir)
    try assert(c.lease.epoch > epochB) finally c.close()
  }

  test("racing opens resolve to EXACTLY ONE un-fenced writer (create-exclusive race)") {
    val dir = SparkTestSession.tempDir("graft-lease-race")
    // resolve the store-root FileSystem once so racers share the cache
    val f = fs(dir)
    val log = org.slf4j.LoggerFactory.getLogger(classOf[WriterLeaseSpec])
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, WriterLease]]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 8).map { i =>
      val t = new Thread(() => {
        start.await()
        try results.add(Right(WriterLease.acquire(
          f, dir, leaseTimeoutMs = 600000L, heartbeatMs = 60000L, log)))
        catch { case e: Throwable => results.add(Left(e)) }
      }, s"race-$i")
      t.start(); t
    }
    start.countDown()
    threads.foreach(_.join(30000))
    val (losers, winners) = results.toArray(Array.empty[Either[Throwable, WriterLease]])
      .partition(_.isLeft)
    assert(winners.size === 1,
      s"expected exactly one lease winner, got ${winners.size} (losers: ${losers.size})")
    // every loser failed LOUDLY with the typed exception, not silently
    losers.foreach {
      case Left(e) => assert(e.isInstanceOf[graft.core.StoreLockedException],
        s"loser threw ${e.getClass}: ${e.getMessage}")
      case _ => ()
    }
    winners.head.toOption.foreach(_.release())
  }

  test("racing TAKEOVER-mode opens: distinct epochs always; exactly one un-fenced holder after a poll") {
    val dir = SparkTestSession.tempDir("graft-lease-race-t")
    val f = fs(dir)
    val log = org.slf4j.LoggerFactory.getLogger(classOf[WriterLeaseSpec])
    // a pre-existing holder everyone will race to take over
    val original = WriterLease.acquire(f, dir, 0L, 60000L, log)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[WriterLease]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 6).map { i =>
      val t = new Thread(() => {
        start.await()
        try results.add(WriterLease.acquire(f, dir, 0L, 60000L, log))
        catch { case _: graft.core.StoreLockedException => () } // loud loss is fine
      }, s"race-t-$i")
      t.start(); t
    }
    start.countDown()
    threads.foreach(_.join(30000))
    val leases = original +: results.toArray(Array.empty[WriterLease]).toSeq
    // epochs are claimed from the atomic counter: NEVER two alike, so
    // concurrent writers' WAL files can never tie at recovery
    val epochs = leases.map(_.epoch)
    assert(epochs.distinct.size === epochs.size, s"duplicate epochs: $epochs")
    // after one verification cycle, exactly one lease still owns the lock
    leases.foreach(_.pollNow())
    val unfenced = leases.filterNot(_.isFenced)
    assert(unfenced.size === 1, s"expected one un-fenced holder, got ${unfenced.size}")
    assert(WriterLease.readHolder(f, WriterLease.lockPathOf(dir))
      .exists(_.owner == unfenced.head.ownerId))
    leases.foreach(_.release())
  }

  test("a zombie WAL file from a fenced epoch loses to the winner's rows at recovery") {
    val dir = SparkTestSession.tempDir("graft-lease-zombie")
    val f = fs(dir)
    val winner = new SparkStreamStore(spark, dir)
    winner.appendToStream("s", ExpectedVersion.NoStream, msgs(1, 2))
    winner.close() // WAL retired into a segment; positions 0..1 flushed
    // hand-plant a zombie WAL file: an epoch-1 loser that raced one
    // heartbeat window after an epoch-2 takeover would leave exactly
    // this — same positions as the winner's epoch-2 WAL, older epoch
    val mk = (name: String, rows: Seq[String]) => {
      val out = f.create(new HPath(dir + "/wal/" + name), true)
      try out.write((rows.mkString("\n") + "\n").getBytes("UTF-8")) finally out.close()
    }
    def walLine(pos: Long, version: Int, data: String): String =
      s"""{"streamId":"s","messageId":"${mid(100 + version)}","streamVersion":$version,""" +
        s""""position":$pos,"createdMicros":1000,"type":"type","jsonData":"{\\"v\\":\\"$data\\"}"}"""
    mk("wal-e000001-p00000000000000000002.jsonl", Seq(walLine(2L, 2, "zombie")))
    mk("wal-e000002-p00000000000000000002.jsonl", Seq(walLine(2L, 2, "winner")))
    val reopened = new SparkStreamStore(spark, dir)
    try {
      val last = reopened.readStreamBackwards("s", maxCount = 1).messages.head
      assert(last.position === 2L)
      assert(last.jsonData.contains("winner"),
        s"recovery must keep the highest-epoch row per position, got ${last.jsonData}")
    } finally reopened.close()
  }
}
