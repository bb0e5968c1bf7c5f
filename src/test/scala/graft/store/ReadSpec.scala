package graft.store

import graft.SparkTestSession
import graft.core._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterEach

/** Paged reads, ported from `AcceptanceTests.ReadStream.cs`, `ReadAll.cs`,
  * `ReadHeadCheckpoint.cs`. */
trait ReadBehaviors extends AnyFunSuite with BeforeAndAfterEach {
  protected def makeStore(name: String, trackDeletes: Boolean = true,
      clock: graft.core.Clock = graft.core.Clock.System): StreamStore
  protected var store: StreamStore = _

  override def beforeEach(): Unit = store = makeStore("graft-read")
  override def afterEach(): Unit = store.close()

  private def mid(n: Int): String = f"00000000-0000-0000-0000-$n%012d"
  private def msgs(ns: Int*): Seq[NewStreamMessage] =
    ns.map(n => NewStreamMessage(mid(n), "type", s"""{"data":$n}"""))

  test("read empty store heads are -1") {
    assert(store.readHeadPosition() === -1L)
    assert(store.readStreamHeadPosition("nope") === -1L)
    assert(store.readStreamHeadVersion("nope") === -1)
  }

  test("read all forwards pages with isEnd and continuation") {
    store.appendToStream("s", ExpectedVersion.NoStream, msgs(1 to 10: _*))
    val p1 = store.readAllForwards(Position.Start, maxCount = 4)
    assert(p1.messages.map(_.position) === Seq(0L, 1L, 2L, 3L))
    assert(!p1.isEnd)
    assert(p1.nextPosition === 4L)
    val p2 = p1.readNext()
    assert(p2.messages.map(_.position) === Seq(4L, 5L, 6L, 7L))
    val p3 = p2.readNext()
    assert(p3.messages.map(_.position) === Seq(8L, 9L))
    assert(p3.isEnd)
    assert(p3.nextPosition === 10L)
    val p4 = p3.readNext()
    assert(p4.messages.isEmpty && p4.isEnd)
  }

  test("read all backwards from End") {
    store.appendToStream("s", ExpectedVersion.NoStream, msgs(1 to 5: _*))
    val p = store.readAllBackwards(Position.End, maxCount = 3)
    assert(p.messages.map(_.position) === Seq(4L, 3L, 2L))
    assert(!p.isEnd)
    val p2 = p.readNext()
    assert(p2.messages.map(_.position) === Seq(1L, 0L))
    assert(p2.isEnd)
  }

  test("read all backwards on empty store is end") {
    val p = store.readAllBackwards()
    assert(p.messages.isEmpty && p.isEnd)
  }

  test("read stream forwards pages within one stream") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2, 3))
    store.appendToStream("b", ExpectedVersion.NoStream, msgs(4, 5))
    store.appendToStream("a", ExpectedVersion.Any, msgs(6, 7))
    val p = store.readStreamForwards("a", 0, maxCount = 3)
    assert(p.status === PageReadStatus.Success)
    assert(p.messages.map(_.streamVersion) === Seq(0, 1, 2))
    assert(!p.isEnd)
    assert(p.nextStreamVersion === 3)
    assert(p.lastStreamVersion === 4)
    val p2 = p.readNext()
    assert(p2.messages.map(_.streamVersion) === Seq(3, 4))
    assert(p2.isEnd)
    assert(p2.nextStreamVersion === 5)
  }

  test("read stream forwards from later version") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2, 3, 4))
    val p = store.readStreamForwards("a", 2)
    assert(p.messages.map(_.streamVersion) === Seq(2, 3))
  }

  test("read stream backwards") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2, 3, 4))
    val p = store.readStreamBackwards("a", StreamVersion.End, maxCount = 3)
    assert(p.messages.map(_.streamVersion) === Seq(3, 2, 1))
    assert(!p.isEnd)
    assert(p.nextStreamVersion === 0)
    val p2 = p.readNext()
    assert(p2.messages.map(_.streamVersion) === Seq(0))
    assert(p2.isEnd)
    assert(p2.nextStreamVersion === -1)
  }

  test("read nonexistent stream returns StreamNotFound") {
    val p = store.readStreamForwards("nope")
    assert(p.status === PageReadStatus.StreamNotFound)
    assert(store.readStreamBackwards("nope").status === PageReadStatus.StreamNotFound)
  }

  test("prefetch=false omits payload; readMessageData fetches it lazily") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1))
    val p = store.readStreamForwards("a", 0, 1000, prefetchJsonData = false)
    assert(p.messages.head.jsonData === null)
    assert(store.readMessageData("a", 0) === Some("""{"data":1}"""))
    assert(store.readMessageData("a", 99) === None)
  }

  test("heads after appends") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2))
    store.appendToStream("b", ExpectedVersion.NoStream, msgs(3))
    assert(store.readHeadPosition() === 2L)
    assert(store.readStreamHeadPosition("a") === 1L)
    assert(store.readStreamHeadVersion("a") === 1)
    assert(store.readStreamHeadPosition("b") === 2L)
    assert(store.readStreamHeadVersion("b") === 0)
  }
}

class ReadSpec extends ReadBehaviors with ParquetBackend
class JdbcReadSpec extends ReadBehaviors with DerbyBackend
class HttpReadSpec extends ReadBehaviors with HttpBackend
