package graft.http

import graft.SparkTestSession
import graft.core._
import graft.store.SparkStreamStore
import graft.streaming.Subscriptions
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterEach

import java.util.concurrent.{CountDownLatch, TimeUnit}

/** The HTTP surface run against the real store: server + client pair
  * exercising the same contract as the direct API, mirroring the
  * reference's HTTP acceptance wiring (the HAL server hosts a store, the
  * HTTP client implements IStreamStore against it, and the shared
  * acceptance suite runs over that fixture —
  * `tests/SqlStreamStore.HttpTests/`). */
class HttpStoreSpec extends AnyFunSuite with BeforeAndAfterEach {
  private val spark = SparkTestSession.spark
  private var backing: SparkStreamStore = _
  private var server: StreamStoreHttpServer = _
  private var store: HttpStreamStore = _ // the system under test

  override def beforeEach(): Unit = {
    backing = new SparkStreamStore(spark, SparkTestSession.tempDir("graft-http"))
    server = new StreamStoreHttpServer(backing)
    store = new HttpStreamStore(server.baseUrl)
  }

  override def afterEach(): Unit = {
    server.close()
    backing.close()
  }

  private def mid(n: Int): String = f"00000000-0000-0000-0000-$n%012d"
  private def msgs(ns: Int*): Seq[NewStreamMessage] =
    ns.map(n => NewStreamMessage(mid(n), "type", s"""{"data":$n}""", """{"meta":1}"""))

  test("append over HTTP creates stream; read returns messages in order") {
    val r = store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2, 3))
    assert(r === AppendResult(2, 2))
    val page = store.readStreamForwards("s1")
    assert(page.status === PageReadStatus.Success)
    assert(page.messages.map(_.streamVersion) === Seq(0, 1, 2))
    assert(page.messages.map(_.messageId) === Seq(mid(1), mid(2), mid(3)))
    assert(page.messages.head.jsonData === """{"data":1}""")
    assert(page.messages.head.jsonMetadata === """{"meta":1}""")
  }

  test("idempotent replay and wrong-expected-version map across the wire") {
    store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2))
    val replay = store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2))
    assert(replay === AppendResult(1, 1))
    intercept[WrongExpectedVersionException] {
      store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2, 3))
    }
    intercept[WrongExpectedVersionException] {
      store.appendToStream("s1", 5, msgs(9))
    }
  }

  test("read all forwards and backwards with paging") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1 to 10: _*))
    val p1 = store.readAllForwards(Position.Start, 4)
    assert(p1.messages.map(_.position) === Seq(0L, 1L, 2L, 3L))
    assert(!p1.isEnd)
    val p2 = p1.readNext()
    assert(p2.messages.map(_.position) === Seq(4L, 5L, 6L, 7L))
    val back = store.readAllBackwards(Position.End, 3)
    assert(back.messages.map(_.position) === Seq(9L, 8L, 7L))
  }

  test("read nonexistent stream returns StreamNotFound through 404") {
    assert(store.readStreamForwards("nope").status === PageReadStatus.StreamNotFound)
    assert(store.readStreamBackwards("nope").status === PageReadStatus.StreamNotFound)
  }

  test("head positions over HTTP") {
    assert(store.readHeadPosition() === -1L)
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2))
    assert(store.readHeadPosition() === 1L)
    assert(store.readStreamHeadVersion("a") === 1)
    assert(store.readStreamHeadPosition("a") === 1L)
    assert(store.readStreamHeadVersion("nope") === -1)
  }

  test("delete stream over HTTP with expected-version semantics") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2))
    intercept[WrongExpectedVersionException] { store.deleteStream("a", 0) }
    store.deleteStream("a", 1)
    assert(store.readStreamForwards("a").status === PageReadStatus.StreamNotFound)
  }

  test("delete message over HTTP removes a single message") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2, 3))
    store.deleteMessage("a", mid(2))
    assert(store.readStreamForwards("a").messages.map(_.messageId) === Seq(mid(1), mid(3)))
  }

  test("metadata round-trips and drives retention over HTTP") {
    store.setStreamMetadata("a", maxAge = Some(60), maxCount = Some(2),
      metadataJson = Some("""{"k":"v"}"""))
    val m = store.getStreamMetadata("a")
    assert(m.metadataStreamVersion === 0)
    assert(m.maxAge === Some(60) && m.maxCount === Some(2))
    assert(m.metadataJson === """{"k":"v"}""")
    store.appendToStream("a", ExpectedVersion.Any, msgs(1, 2, 3, 4))
    assert(store.readStreamForwards("a").messages.map(_.streamVersion) === Seq(2, 3))
  }

  test("list streams with patterns and keyset pagination over HTTP") {
    Seq("order-1", "order-2", "invoice-1").foreach(id =>
      store.appendToStream(id, ExpectedVersion.NoStream, msgs(1)))
    assert(store.listStreams().streamIds === Seq("order-1", "order-2", "invoice-1"))
    assert(store.listStreams(Pattern.StartsWith("order-")).streamIds === Seq("order-1", "order-2"))
    assert(store.listStreams(Pattern.EndsWith("-1")).streamIds === Seq("order-1", "invoice-1"))
    val p1 = store.listStreams(Pattern.Anything, maxCount = 2)
    assert(p1.streamIds.size === 2)
    assert(p1.readNext().streamIds === Seq("invoice-1"))
  }

  test("prefetch=false omits payload; lazy lookup fetches; null after delete") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1))
    val page = store.readStreamForwards("a", 0, 10, prefetchJsonData = false)
    assert(page.messages.head.jsonData === null)
    assert(store.readMessageData("a", 0) === Some("""{"data":1}"""))
    store.deleteStream("a")
    assert(store.readMessageData("a", 0) === None)
  }

  test("url-encodable stream ids work over HTTP") {
    Seq("stream/id", "stream%id", "stream?id=a").foreach { id =>
      store.appendToStream(id, ExpectedVersion.Any, msgs(1))
      assert(store.readStreamForwards(id).messages.size === 1)
    }
  }

  test("subscriptions run unchanged over the HTTP client (reference client parity)") {
    store.appendToStream("s", ExpectedVersion.NoStream, msgs(1, 2, 3))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val caught = new CountDownLatch(1)
    val gotNew = new CountDownLatch(4)
    val sub = Subscriptions.subscribeToAll(store, None,
      m => { seen.add(m.position); gotNew.countDown() },
      b => if (b) caught.countDown())
    try {
      assert(caught.await(30, TimeUnit.SECONDS))
      store.appendToStream("s", ExpectedVersion.Any, msgs(4))
      assert(gotNew.await(30, TimeUnit.SECONDS))
      assert(seen.toArray.toSeq === Seq(0L, 1L, 2L, 3L))
    } finally sub.close()
  }

  test("curies template resolves to markdown docs per link relation") {
    // ref: Links.cs:77-85 (curies on every response), Docs/DocsResource.cs
    val http = java.net.http.HttpClient.newHttpClient()
    def get(path: String): java.net.http.HttpResponse[String] =
      http.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(server.baseUrl + path)).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())

    val idx = get("/")
    assert(idx.statusCode() === 200)
    val curies = HalJson.Mapper.readTree(idx.body()).get("_links").get("curies")
    assert(curies.get(0).get("name").asText() === "streamStore")
    assert(curies.get(0).get("templated").asBoolean())
    val tmpl = curies.get(0).get("href").asText()
    assert(tmpl === "/docs/streamStore:{rel}")

    Seq("feed", "feed-browser", "message", "appendToStream", "deleteStream", "metadata").foreach { rel =>
      val doc = get(s"/docs/streamStore:$rel")
      assert(doc.statusCode() === 200, s"docs for $rel")
      assert(doc.headers().firstValue("Content-Type").orElse("").startsWith("text/markdown"))
      assert(doc.body().startsWith("#"))
    }
    assert(get("/docs/streamStore:nope").statusCode() === 404)
    // paged responses carry the curie too
    store.appendToStream("a", ExpectedVersion.Any, msgs(1))
    val feed = get("/stream?d=f&p=0&m=10")
    assert(HalJson.Mapper.readTree(feed.body()).get("_links").has("curies"))
  }

  test("single message and head-position header endpoints") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2))
    assert(store.readMessageData("a", 1) === Some("""{"data":2}"""))
    assert(store.readMessageData("a", 99) === None)
  }

  test("ETag + If-None-Match: conditional GET returns 304; caching headers match the HAL server") {
    // ref: SqlStreamStore.HAL ETag.cs / CacheControl.cs / PageExtensions.cs
    val http = java.net.http.HttpClient.newHttpClient()
    def get(path: String, inm: Option[String] = None): java.net.http.HttpResponse[String] = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(server.baseUrl + path)).GET()
      inm.foreach(b.header("If-None-Match", _))
      http.send(b.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
    }
    def etagOf(r: java.net.http.HttpResponse[String]): String =
      r.headers().firstValue("ETag").orElse("")

    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2, 3))

    // head page of the all-stream: ETag = last position, no-cache
    val feed = get("/stream?d=f&p=0&m=10")
    assert(feed.statusCode() === 200)
    assert(etagOf(feed) === "\"2\"")
    assert(feed.headers().firstValue("Cache-Control").orElse("") === "max-age=0, no-cache, must-revalidate")
    // replay with the validator → 304, no body
    val cached = get("/stream?d=f&p=0&m=10", inm = Some(etagOf(feed)))
    assert(cached.statusCode() === 304)
    assert(cached.body() === "")
    // a write invalidates: same request now has a new ETag and a body
    store.appendToStream("a", ExpectedVersion.Any, msgs(4))
    val refreshed = get("/stream?d=f&p=0&m=10", inm = Some(etagOf(feed)))
    assert(refreshed.statusCode() === 200)
    assert(etagOf(refreshed) === "\"3\"")

    // interior (non-end) page: immutable → no ETag, cacheable for a year
    val interior = get("/stream?d=f&p=0&m=2")
    assert(etagOf(interior) === "")
    assert(interior.headers().firstValue("Cache-Control").orElse("") === "max-age=31536000")

    // stream page: version-based ETag
    val sp = get("/streams/a?d=f&p=0&m=10")
    assert(etagOf(sp) === "\"3\"")
    assert(get("/streams/a?d=f&p=0&m=10", inm = Some("\"3\"")).statusCode() === 304)

    // single message by version: immutable, one-year cache
    val one = get("/streams/a/1")
    assert(etagOf(one) === "\"1\"")
    assert(one.headers().firstValue("Cache-Control").orElse("") === "max-age=31536000")
    assert(get("/streams/a/1", inm = Some("\"1\"")).statusCode() === 304)

    // metadata: ETag from the metadata stream version
    store.setStreamMetadata("a", maxCount = Some(100))
    val meta = get("/streams/a/metadata")
    assert(etagOf(meta) === "\"0\"")
    assert(get("/streams/a/metadata", inm = Some("\"0\"")).statusCode() === 304)

    // a non-matching validator is ignored
    assert(get("/streams/a/1", inm = Some("\"99\"")).statusCode() === 200)

    // RFC 9110 §13.1.2: `*` matches any representation; weak validators
    // compare with the W/ prefix stripped
    assert(get("/streams/a/1", inm = Some("*")).statusCode() === 304)
    assert(get("/streams/a/1", inm = Some("W/\"1\"")).statusCode() === 304)
    assert(get("/streams/a/1", inm = Some("W/\"99\", W/\"1\"")).statusCode() === 304)
  }

  test("malformed POST bodies return structured 400s, not 500s") {
    // ref: AppendStreamOperation.cs:26-82 + ExceptionHandlingMiddleware.cs
    // ({type, title, detail} at 400), backed by the HAL schema set
    val http = java.net.http.HttpClient.newHttpClient()
    def post(path: String, body: String): java.net.http.HttpResponse[String] =
      http.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(server.baseUrl + path))
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
    def problem(r: java.net.http.HttpResponse[String]): (Int, String, String) = {
      val n = HalJson.Mapper.readTree(r.body)
      (r.statusCode(), n.get("title").asText, n.get("detail").asText)
    }

    // invalid JSON
    assert(problem(post("/streams/s1", "{not json")) === (400, "Bad format.", "Invalid json detected."))
    // not an array or object
    assert(problem(post("/streams/s1", "42")) === (400, "Bad format.", "Invalid json detected."))
    // malformed messageId
    val (s1, t1, d1) = problem(post("/streams/s1", """[{"messageId":"nope","type":"t"}]"""))
    assert((s1, t1) === (400, "Bad format.") && d1 === "'messageId' at index 0 was improperly formatted.")
    // empty (all-zero) messageId
    val (s2, _, d2) = problem(post("/streams/s1",
      s"""[{"messageId":"00000000-0000-0000-0000-000000000000","type":"t"}]"""))
    assert(s2 === 400 && d2 === "'messageId' at index 0 was empty.")
    // missing type, reported at the right index
    val (s3, _, d3) = problem(post("/streams/s1",
      s"""[{"messageId":"${mid(1)}","type":"t"},{"messageId":"${mid(2)}"}]"""))
    assert(s3 === 400 && d3 === "'type' at index 1 was not set.")
    // nothing was appended by any of the rejected bodies
    assert(store.readStreamForwards("s1").status === PageReadStatus.StreamNotFound)

    // a single message OBJECT appends as a one-element batch, with an
    // embedded jsonData object serialized to its JSON text (ref:
    // AppendStreamOperation.cs:50-52, 79)
    val ok = post("/streams/s1", s"""{"messageId":"${mid(1)}","type":"t","jsonData":{"a":1}}""")
    assert(ok.statusCode() === 201)
    assert(store.readStreamForwards("s1").messages.head.jsonData === """{"a":1}""")

    // metadata: non-object body and non-integer maxAge are 400s
    assert(problem(post("/streams/s1/metadata", "[1,2]")) === (400, "Bad format.", "Invalid json detected."))
    val (s4, _, d4) = problem(post("/streams/s1/metadata", """{"maxAge":"soon"}"""))
    assert(s4 === 400 && d4 === "'maxAge' must be an integer.")
  }
}
