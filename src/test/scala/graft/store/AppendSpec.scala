package graft.store

import graft.SparkTestSession
import graft.core._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterEach

/** Append / expected-version / idempotency semantics, ported from
  * `tests/SqlStreamStore.AcceptanceTests/AcceptanceTests.AppendStream.cs`.
  * Deterministic message ids follow the reference fixture convention
  * (`AcceptanceTests.cs:73-95`). */
trait AppendBehaviors extends AnyFunSuite with BeforeAndAfterEach {
  protected def makeStore(name: String, trackDeletes: Boolean = true,
      clock: graft.core.Clock = graft.core.Clock.System): StreamStore
  protected var store: StreamStore = _

  override def beforeEach(): Unit = store = makeStore("graft-append")
  override def afterEach(): Unit = store.close()

  private def mid(n: Int): String = f"00000000-0000-0000-0000-$n%012d"
  private def msgs(ns: Int*): Seq[NewStreamMessage] =
    ns.map(n => NewStreamMessage(mid(n), "type", s"""{"data":$n}""", """{"meta":"m"}"""))

  test("append NoStream creates stream with contiguous versions and positions") {
    val r = store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2, 3))
    assert(r === AppendResult(2, 2))
    val page = store.readStreamForwards("s1")
    assert(page.messages.map(_.streamVersion) === Seq(0, 1, 2))
    assert(page.messages.map(_.position) === Seq(0L, 1L, 2L))
    assert(page.messages.map(_.messageId) === Seq(mid(1), mid(2), mid(3)))
  }

  test("append NoStream to existing stream with same messages is idempotent") {
    store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2, 3))
    val r = store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2, 3))
    assert(r === AppendResult(2, 2))
    assert(store.readStreamForwards("s1").messages.size === 3)
  }

  test("append NoStream prefix subset is idempotent") {
    store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2, 3))
    val r = store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2))
    assert(r.currentVersion === 2)
  }

  test("append NoStream with additional messages throws") {
    store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2))
    intercept[WrongExpectedVersionException] {
      store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2, 3))
    }
  }

  test("append NoStream with different messages throws") {
    store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2, 3))
    intercept[WrongExpectedVersionException] {
      store.appendToStream("s1", ExpectedVersion.NoStream, msgs(2, 3))
    }
  }

  test("append Any creates and appends") {
    val r1 = store.appendToStream("s1", ExpectedVersion.Any, msgs(1, 2))
    val r2 = store.appendToStream("s1", ExpectedVersion.Any, msgs(3, 4))
    assert(r1 === AppendResult(1, 1))
    assert(r2 === AppendResult(3, 3))
  }

  test("append Any with exact replay of earlier batch is idempotent") {
    store.appendToStream("s1", ExpectedVersion.Any, msgs(1, 2, 3, 4))
    val r = store.appendToStream("s1", ExpectedVersion.Any, msgs(2, 3))
    assert(r === AppendResult(3, 3))
    assert(store.readStreamForwards("s1").messages.size === 4)
  }

  test("append Any with partial overlap throws") {
    store.appendToStream("s1", ExpectedVersion.Any, msgs(1, 2, 3))
    intercept[WrongExpectedVersionException] {
      store.appendToStream("s1", ExpectedVersion.Any, msgs(3, 4))
    }
  }

  test("append Any with reordered overlap throws") {
    store.appendToStream("s1", ExpectedVersion.Any, msgs(1, 2, 3))
    intercept[WrongExpectedVersionException] {
      store.appendToStream("s1", ExpectedVersion.Any, msgs(2, 1))
    }
  }

  test("append exact version appends at head") {
    store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2, 3))
    val r = store.appendToStream("s1", 2, msgs(4, 5))
    assert(r === AppendResult(4, 4))
  }

  test("append exact version greater than head throws") {
    store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1))
    intercept[WrongExpectedVersionException] { store.appendToStream("s1", 5, msgs(2)) }
  }

  test("append exact version to nonexistent stream throws") {
    intercept[WrongExpectedVersionException] { store.appendToStream("nope", 0, msgs(1)) }
  }

  test("append exact version below head replays idempotently at exact offsets") {
    store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2, 3, 4))
    // expected 1 ⇒ batch must be the messages at versions 2,3
    val r = store.appendToStream("s1", 1, msgs(3, 4))
    assert(r === AppendResult(3, 3))
    intercept[WrongExpectedVersionException] { store.appendToStream("s1", 1, msgs(4)) }
    intercept[WrongExpectedVersionException] { store.appendToStream("s1", 0, msgs(3, 4)) }
  }

  test("append exact version at head with duplicate id throws") {
    store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2))
    intercept[WrongExpectedVersionException] { store.appendToStream("s1", 1, msgs(1)) }
  }

  test("append EmptyStream requires existing stream") {
    intercept[WrongExpectedVersionException] {
      store.appendToStream("nope", ExpectedVersion.EmptyStream, msgs(1))
    }
  }

  test("append EmptyStream to created-empty stream works") {
    store.appendToStream("s1", ExpectedVersion.NoStream, Nil) // creates empty stream
    val r = store.appendToStream("s1", ExpectedVersion.EmptyStream, msgs(1, 2))
    assert(r === AppendResult(1, 1))
  }

  test("append EmptyStream full replay is idempotent") {
    store.appendToStream("s1", ExpectedVersion.NoStream, Nil)
    store.appendToStream("s1", ExpectedVersion.EmptyStream, msgs(1, 2))
    val r = store.appendToStream("s1", ExpectedVersion.EmptyStream, msgs(1, 2))
    assert(r === AppendResult(1, 1))
  }

  test("empty batch with concrete expected version is a no-op returning head") {
    store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2))
    val r = store.appendToStream("s1", 1, Nil)
    assert(r.currentVersion === 1)
    assert(r.currentPosition === 1)
  }

  test("positions are globally dense across streams") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2))
    store.appendToStream("b", ExpectedVersion.NoStream, msgs(3))
    store.appendToStream("a", ExpectedVersion.Any, msgs(4))
    val all = store.readAllForwards()
    assert(all.messages.map(_.position) === Seq(0L, 1L, 2L, 3L))
    assert(all.messages.map(_.streamId) === Seq("a", "a", "b", "a"))
  }

  test("append empty collection with Any creates an empty stream") {
    // ref: When_append_to_non_existent_stream_with_empty_collection_of_messages
    //      (AppendStream.cs:617-633, Theory over NoStream and Any)
    store.appendToStream("s1", ExpectedVersion.Any, Nil)
    val page = store.readStreamForwards("s1")
    assert(page.status === PageReadStatus.Success)
    assert(page.messages.isEmpty)
    assert(store.readStreamHeadVersion("s1") === -1)
  }

  test("concurrent appends of the same batch with NoStream: one wins, rest replay idempotently") {
    // ref: When_append_stream_concurrently_with_no_stream_expected_and_same_messages
    //      (AppendStream.cs:716-733)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, AppendResult]]()
    val threads = (1 to 4).map { _ =>
      val t = new Thread(() =>
        results.add(
          try Right(store.appendToStream("c1", ExpectedVersion.NoStream, msgs(1, 2, 3)))
          catch { case e: Throwable => Left(e) }))
      t.start(); t
    }
    threads.foreach(_.join(30000))
    // all four must succeed with the same result (idempotent replay)
    assert(results.size === 4)
    results.forEach {
      case Right(r) => assert(r === AppendResult(2, 2))
      case Left(e) => fail(s"concurrent idempotent append threw: $e")
    }
    assert(store.readStreamForwards("c1").messages.size === 3)
  }

  test("concurrent appends to different streams each commit with dense positions") {
    // ref: When_append_to_different_streams_concurrently... (AppendStream.cs:735+)
    val threads = (0 until 4).map { i =>
      val t = new Thread(() =>
        store.appendToStream(s"c-$i", ExpectedVersion.NoStream, msgs(10 + i)))
      t.start(); t
    }
    threads.foreach(_.join(30000))
    val all = store.readAllForwards(maxCount = 100)
    assert(all.messages.size === 4)
    assert(all.messages.map(_.position) === Seq(0L, 1L, 2L, 3L))
    (0 until 4).foreach(i => assert(store.readStreamHeadVersion(s"c-$i") === 0))
  }

  test("system stream ids are rejected") {
    intercept[IllegalArgumentException] {
      store.appendToStream("$sys", ExpectedVersion.Any, msgs(1))
    }
  }

  test("stream ids with whitespace are rejected") {
    intercept[IllegalArgumentException] {
      store.appendToStream("a b", ExpectedVersion.Any, msgs(1))
    }
  }

  test("url-encodable stream ids are accepted") {
    Seq("stream/id", "stream%id", "stream?id=a").foreach { id =>
      store.appendToStream(id, ExpectedVersion.Any, msgs(1))
      assert(store.readStreamForwards(id).messages.size === 1)
    }
  }
}

class AppendSpec extends AppendBehaviors with ParquetBackend
class JdbcAppendSpec extends AppendBehaviors with DerbyBackend
class HttpAppendSpec extends AppendBehaviors with HttpBackend
