package graft.store

import graft.SparkTestSession
import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Scale shape of stream listing (round-3 verdict item 4): the paged API
  * must not materialize every head per call, and the DataFrame surface
  * must list distributed off the journal. */
class ListStreamsScaleSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("100k streams: keyset paging seeks, streamsDF lists off the journal") {
    val store = new SparkStreamStore(spark, SparkTestSession.tempDir("graft-ls-scale"))
    try {
      val msg = Seq(NewStreamMessage("00000000-0000-0000-0000-000000000001", "t", "{}"))
      (0 until 100000).foreach { i =>
        store.appendToStream(f"s-$i%06d", ExpectedVersion.Any, msg)
      }
      // a deep page resolves without walking from the start each time:
      // resume from a continuation token near the end
      val deep = store.listStreams(Pattern.Anything, 10, Some((99990 - 1).toString))
      assert(deep.streamIds === (99990 until 100000).map(i => f"s-$i%06d"))
      // seek + page-scan must be far from O(n) work: time 1000 deep pages
      // (each would walk ~100k heads under the old full-iteration path —
      // 100M head visits in total; the seek path touches ~10k)
      val t0 = System.nanoTime()
      (0 until 1000).foreach { k =>
        val tok = Some((50000 + k * 10 - 1).toString)
        assert(store.listStreams(Pattern.Anything, 10, tok).streamIds.size === 10)
      }
      val deepPagesSec = (System.nanoTime() - t0) / 1e9
      // generous bound for loaded CI: the seek path does ~10k index
      // visits total (measured ~0.1s); the old full-iteration path did
      // ~100M (tens of seconds)
      assert(deepPagesSec < 10.0, s"1000 deep pages took ${deepPagesSec}s — listing is not seek-shaped")
      // pattern listing pages correctly mid-keyspace
      val pat = store.listStreams(Pattern.StartsWith("s-0999"), 100)
      assert(pat.streamIds.size === 100)
      // the distributed surface sees every live stream with its head state
      val df = store.streamsDF
      assert(df.count() === 100000L)
      val row = df.filter("streamId = 's-099999'").collect().head
      assert(row.getAs[Int]("version") === 0)
      // a deleted stream disappears from both surfaces
      store.deleteStream("s-000000")
      assert(store.listStreams(Pattern.Anything, 1).streamIds === Seq("s-000001"))
      assert(store.streamsDF.filter("streamId = 's-000000'").count() === 0L)
      assert(store.streamsDF.count() === 100000L) // 99999 + $deleted tracking stream
    } finally store.close()
  }
}
