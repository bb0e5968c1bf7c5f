package graft.store

import graft.SparkTestSession
import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** ListStreams patterns/pagination (`AcceptanceTests.ListStreams.cs`) and
  * crash-recovery of driver state from the log (SURVEY §7 "hard parts"). */
class ListStreamsRecoverySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def mid(n: Int): String = f"00000000-0000-0000-0000-$n%012d"
  private def msgs(ns: Int*): Seq[NewStreamMessage] =
    ns.map(n => NewStreamMessage(mid(n), "type", s"""{"data":$n}"""))

  test("list streams anything / startsWith / endsWith with keyset pagination") {
    val store = new SparkStreamStore(spark, SparkTestSession.tempDir("graft-ls"))
    try {
      Seq("order-1", "order-2", "invoice-1", "invoice-2", "order-3").foreach { id =>
        store.appendToStream(id, ExpectedVersion.NoStream, msgs(1))
      }
      val all = store.listStreams()
      assert(all.streamIds === Seq("order-1", "order-2", "invoice-1", "invoice-2", "order-3"))

      val orders = store.listStreams(Pattern.StartsWith("order-"))
      assert(orders.streamIds === Seq("order-1", "order-2", "order-3"))

      val ones = store.listStreams(Pattern.EndsWith("-1"))
      assert(ones.streamIds === Seq("order-1", "invoice-1"))

      val p1 = store.listStreams(Pattern.Anything, maxCount = 2)
      assert(p1.streamIds === Seq("order-1", "order-2"))
      val p2 = p1.readNext()
      assert(p2.streamIds === Seq("invoice-1", "invoice-2"))
      val p3 = p2.readNext()
      assert(p3.streamIds === Seq("order-3"))
      assert(p3.readNext().streamIds.isEmpty)
    } finally store.close()
  }

  test("reopening a store recovers heads, positions, and retention settings") {
    val dir = SparkTestSession.tempDir("graft-recover")
    val s1 = new SparkStreamStore(spark, dir)
    s1.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2, 3))
    s1.appendToStream("b", ExpectedVersion.NoStream, msgs(4))
    s1.setStreamMetadata("a", maxAge = Some(3600), maxCount = Some(100))
    s1.close()

    val s2 = new SparkStreamStore(spark, dir)
    try {
      assert(s2.readHeadPosition() === 4L) // 4 messages + 1 metadata message
      assert(s2.readStreamHeadVersion("a") === 2)
      assert(s2.readStreamHeadPosition("a") === 2L)
      assert(s2.readStreamHeadVersion("b") === 0)
      // appends continue with dense positions
      val r = s2.appendToStream("b", 0, msgs(5))
      assert(r.currentPosition === 5L)
      // idempotency state survives restart
      val r2 = s2.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2, 3))
      assert(r2.currentVersion === 2)
      // retention settings recovered from $$ metadata stream
      assert(s2.getStreamMetadata("a").maxCount === Some(100))
      s2.appendToStream("a", 2, (6 to 110).flatMap(n => msgs(n)))
      assert(s2.readStreamForwards("a", maxCount = 1000).messages.size === 100)
    } finally s2.close()
  }

  test("compaction preserves content and order") {
    val dir = SparkTestSession.tempDir("graft-compact")
    val store = new SparkStreamStore(spark, dir)
    try {
      (1 to 10).foreach(i => store.appendToStream(s"s$i", ExpectedVersion.NoStream, msgs(i)))
      store.compact(targetFiles = 2)
      val all = store.readAllForwards(maxCount = 100)
      assert(all.messages.map(_.position) === (0L to 9L))
    } finally store.close()
  }
}
