package graft.store

import graft.SparkTestSession
import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-clustered compaction: same log, entity-locality layout —
  * answers identical to the position-clustered default, and each
  * stream's history physically contiguous (a stream lives in at most
  * two range-partitioned files). */
class ClusteredCompactionSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def mid(n: Int) = f"00000000-0000-0000-0000-$n%012d"

  private def deleteRecursively(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  private def freshStore(): (SparkStreamStore, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-cluster").toString
    val store = new SparkStreamStore(spark, dir)
    // interleave appends across streams so position order != stream order
    (0 until 120).foreach { i =>
      store.appendToStream(s"s-${i % 6}", ExpectedVersion.Any,
        Seq(NewStreamMessage(mid(i), "t", s"""{"i":$i}""")))
    }
    (store, dir)
  }

  private def scanAll(store: SparkStreamStore): Seq[(String, Long)] = {
    var page = store.readAllForwards(Position.Start, maxCount = 1000)
    val buf = scala.collection.mutable.Buffer.empty[(String, Long)]
    buf ++= page.messages.map(m => (m.streamId, m.position))
    while (!page.isEnd) {
      page = page.readNext()
      buf ++= page.messages.map(m => (m.streamId, m.position))
    }
    buf.toSeq
  }

  test("stream-clustered compaction preserves every read surface exactly") {
    val (store, dir) = freshStore()
    try {
      val allBefore = scanAll(store)
      val streamBefore = store.readStreamForwards("s-3", StreamVersion.Start, 1000)
        .messages.map(m => (m.messageId, m.streamVersion))
      store.compact(2, clusterBy = "stream")
      assert(scanAll(store) === allBefore)
      val after = store.readStreamForwards("s-3", StreamVersion.Start, 1000)
        .messages.map(m => (m.messageId, m.streamVersion))
      assert(after === streamBefore)
      assert(store.readHeadPosition() === 119L)
    } finally {
      store.close()
      deleteRecursively(dir)
    }
  }

  test("each stream's rows land contiguously: a stream spans at most two range files") {
    val (store, dir) = freshStore()
    try {
      store.compact(3, clusterBy = "stream")
      val gen = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).toArray
        .map(_.toString).filter(_.matches(".*/messages-g\\d+$")).max
      val files = java.nio.file.Files.list(java.nio.file.Paths.get(gen)).toArray
        .map(_.toString).filter(_.endsWith(".parquet"))
      assert(files.length >= 2, s"expected multiple range files, got ${files.length}")
      val spansPerStream = files.flatMap { f =>
        spark.read.parquet(f).select("streamId").distinct()
          .collect().map(_.getString(0) -> f)
      }.groupBy(_._1).view.mapValues(_.length).toMap
      assert(spansPerStream.nonEmpty)
      spansPerStream.foreach { case (s, nFiles) =>
        assert(nFiles <= 2, s"stream $s scattered over $nFiles files")
      }
    } finally {
      store.close()
      deleteRecursively(dir)
    }
  }
}
