package graft.http

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.core._
import graft.store.StreamStore

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

/** HTTP server exposing a [[StreamStore]] — the reference's HAL surface
  * (`src/SqlStreamStore.HAL/SqlStreamStoreHalMiddleware.cs:83-111`)
  * re-expressed over the JDK's built-in server (zero dependencies).
  *
  * Routes (ref paths `Constants.Paths`, query params `d`irection /
  * `p`osition / `m`axCount / `e`mbed, `ReadAllStreamOperation.cs:19-45`):
  *
  *   GET    /                         index
  *   GET    /stream                   read all (d=f|b, p, m, e=1)
  *   GET    /stream/{position}        one message by global position
  *   GET    /streams                  list streams (t=s|e + p=pattern, m, c=token)
  *   GET    /streams/{id}             read stream (d, p, m, e)
  *   POST   /streams/{id}             append; SSS-ExpectedVersion header
  *   DELETE /streams/{id}             delete stream; SSS-ExpectedVersion
  *   GET    /streams/{id}/metadata    get metadata
  *   POST   /streams/{id}/metadata    set metadata; SSS-ExpectedVersion
  *   GET    /streams/{id}/{version}   one message
  *   DELETE /streams/{id}/{version}   delete message at version
  *
  * Expected version rides the `SSS-ExpectedVersion` header and every
  * response carries `SSS-HeadPosition`
  * (`src/SqlStreamStore.Http.Common/Constants.cs:28-29`); a wrong
  * expected version maps to 409 Conflict, missing resources to 404.
  *
  * Conditional requests (ref `SqlStreamStore.HAL/ETag.cs`,
  * `CacheControl.cs`, `PageExtensions.cs`, `HttpContextExtensions.cs:23-55`):
  * pages whose content is pinned by their request (the head page, or a
  * fully-read `IsEnd` page) carry an `ETag` — position-based for the
  * all-stream, version-based for a stream — and a matching
  * `If-None-Match` gets `304 Not Modified` with no body. Head pages are
  * `no-cache, must-revalidate` (they change as writes land); interior
  * pages and single messages are immutable, so `max-age=31536000`.
  */
final class StreamStoreHttpServer(store: StreamStore, port: Int = 0) extends AutoCloseable {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.setExecutor(Executors.newFixedThreadPool(4, r => {
    val t = new Thread(r, "graft-http"); t.setDaemon(true); t
  }))
  server.createContext("/", handle _)
  server.start()

  /** Bound port (useful with port=0). */
  def boundPort: Int = server.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$boundPort"

  override def close(): Unit = server.stop(0)

  private def handle(ex: HttpExchange): Unit =
    try {
      val segments = ex.getRequestURI.getRawPath.split("/").filter(_.nonEmpty)
        .map(s => URLDecoder.decode(s, StandardCharsets.UTF_8)).toList
      val q = query(ex)
      (ex.getRequestMethod, segments) match {
        case ("GET", Nil) => index(ex)
        case ("GET", "docs" :: rel :: Nil) => docs(ex, rel)
        case ("GET", "stream" :: Nil) => readAll(ex, q)
        case ("GET", "stream" :: Num(pos) :: Nil) => allMessage(ex, pos)
        case ("GET", "streams" :: Nil) => listStreams(ex, q)
        case ("GET", "streams" :: id :: Nil) => readStream(ex, id, q)
        case ("POST", "streams" :: id :: Nil) => append(ex, id)
        case ("DELETE", "streams" :: id :: Nil) => deleteStream(ex, id)
        case ("GET", "streams" :: id :: "metadata" :: Nil) => getMetadata(ex, id)
        case ("POST", "streams" :: id :: "metadata" :: Nil) => setMetadata(ex, id)
        case ("GET", "streams" :: id :: IntNum(v) :: Nil) => streamMessage(ex, id, v)
        case ("DELETE", "streams" :: id :: IntNum(v) :: Nil) => deleteMessage(ex, id, v)
        case _ => respond(ex, 404, """{"error":"not found"}""")
      }
    } catch {
      // structured problem payloads, the reference's shape
      // (ref: ExceptionHandlingMiddleware.cs:25-45 — {type, title, detail})
      case e: WrongExpectedVersionException =>
        respond(ex, 409, problemJson(e, "Wrong expected version."))
      case e: InvalidRequestException =>
        respond(ex, 400, problemJson(e, "Bad format."))
      case e: IllegalArgumentException =>
        respond(ex, 400, problemJson(e, "Bad format."))
      case e: Throwable =>
        respond(ex, 500, problemJson(e, "Internal server error."))
    } finally ex.close()

  private def problemJson(e: Throwable, title: String): String =
    s"""{"type":${Json.quote(e.getClass.getSimpleName)},"title":${Json.quote(title)},""" +
      s""""detail":${Json.quote(String.valueOf(e.getMessage))},"error":${Json.quote(String.valueOf(e.getMessage))}}"""

  // --- handlers ---

  private def index(ex: HttpExchange): Unit =
    respond(ex, 200,
      """{"_links":{"self":{"href":"/"},"streamStore:feed":{"href":"/stream"},"streamStore:feed-browser":{"href":"/streams"},""" +
        """"curies":[{"name":"streamStore","href":"/docs/streamStore:{rel}","templated":true,"type":"text/markdown","title":"Documentation"}]}}""")

  /** Markdown documentation per link relation, resolved by the `curies`
    * template (ref: `SqlStreamStore.HAL/Docs/DocsResource.cs` serves
    * embedded markdown per rel; this is the same surface with the docs
    * inline). Unknown rels 404. */
  private def docs(ex: HttpExchange, rel: String): Unit =
    DocsByRel.get(rel.stripPrefix("streamStore:")) match {
      case Some(md) =>
        val bytes = md.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "text/markdown; charset=utf-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
      case None => respond(ex, 404, """{"error":"no documentation for that rel"}""")
    }

  private val DocsByRel: Map[String, String] = Map(
    "feed" ->
      """# All-stream feed
        |`GET /stream?d={f|b}&p={position}&m={maxCount}&e={0|1}` — page of the
        |global all-stream. `d` direction, `p` from-position (`-1` = End),
        |`m` page size, `e` embed payloads. Response carries `_links`
        |(self/first/next/last) and `_embedded.streamStore:message`.
        |""".stripMargin,
    "feed-browser" ->
      """# Stream browser
        |`GET /streams?t={s|e}&p={pattern}&m={maxCount}&c={token}` — page of
        |stream ids. `t`+`p` filter by prefix (`s`) or suffix (`e`);
        |`c` is the keyset continuation token from the previous page.
        |""".stripMargin,
    "message" ->
      """# Message
        |`GET /stream/{position}` — one all-stream message by position.
        |`GET /streams/{streamId}/{version}` — one message by stream version.
        |`DELETE /streams/{streamId}/{version}` — delete that message.
        |""".stripMargin,
    "appendToStream" ->
      """# Append
        |`POST /streams/{streamId}` with header `SSS-ExpectedVersion`
        |(`-1` empty, `-2` any, `-3` no-stream, or an exact version) and a
        |JSON array of `{messageId, type, jsonData, jsonMetadata}`.
        |Returns `{currentVersion, currentPosition}`; conflicts are 409.
        |""".stripMargin,
    "deleteStream" ->
      """# Delete stream
        |`DELETE /streams/{streamId}` with optional `SSS-ExpectedVersion`
        |header; a mismatch is 409.
        |""".stripMargin,
    "metadata" ->
      """# Stream metadata
        |`GET /streams/{streamId}/metadata` — `{metadataStreamVersion,
        |maxAge, maxCount, metadataJson}`.
        |`POST /streams/{streamId}/metadata` — set the same fields; drives
        |MaxAge TTL and MaxCount retention.
        |""".stripMargin)

  private def readAll(ex: HttpExchange, q: Map[String, String]): Unit = {
    val forwards = q.get("d").exists(d => d == "f" || d == "F")
    val from = q.get("p").flatMap(p => p.toLongOption)
      .getOrElse(if (forwards) Position.Start else Position.End)
    val m = q.get("m").flatMap(_.toIntOption).filter(_ > 0).getOrElse(DefaultPageSize)
    val embed = q.get("e").contains("1")
    val page =
      if (forwards) store.readAllForwards(from, m, prefetchJsonData = embed)
      else store.readAllBackwards(from, m, prefetchJsonData = embed)
    // ref: PageExtensions.TryGetETag(ReadAllPage) + AllStreamResource.cs:86-93
    val etag =
      if (!forwards && from == Position.End)
        Some(etagOf(page.messages.headOption.map(_.position).getOrElse(Position.End)))
      else if (page.isEnd && forwards)
        Some(etagOf(page.messages.lastOption.map(_.position).getOrElse(Position.End)))
      else if (page.isEnd)
        Some(etagOf(page.messages.headOption.map(_.position).getOrElse(Position.End)))
      else None
    val cache = if (etag.isDefined) CacheNoCache else CacheOneYear
    respond(ex, 200, HalJson.allPageJson(page, embed, "/stream"), etag, Some(cache))
  }

  private def allMessage(ex: HttpExchange, position: Long): Unit = {
    val page = store.readAllForwards(position, 1, prefetchJsonData = true)
    page.messages.find(_.position == position) match {
      case Some(msg) =>
        // a message at a fixed position is immutable (ref: StreamMessageResource.cs:58,70)
        respond(ex, 200, HalJson.Mapper.writeValueAsString(HalJson.messageNode(msg, embed = true)),
          Some(etagOf(position)), Some(CacheOneYear))
      case None => respond(ex, 404, """{"error":"message not found"}""")
    }
  }

  private def listStreams(ex: HttpExchange, q: Map[String, String]): Unit = {
    val pattern = (q.get("t"), q.get("p")) match {
      case (Some("s"), Some(p)) => Pattern.StartsWith(p)
      case (Some("e"), Some(p)) => Pattern.EndsWith(p)
      case _ => Pattern.Anything
    }
    val m = q.get("m").flatMap(_.toIntOption).filter(_ > 0).getOrElse(100)
    val page = store.listStreams(pattern, m, q.get("c"))
    respond(ex, 200, HalJson.listStreamsJson(page))
  }

  private def readStream(ex: HttpExchange, id: String, q: Map[String, String]): Unit = {
    val forwards = !q.get("d").exists(d => d == "b" || d == "B") // stream reads default forwards
    val from = q.get("p").flatMap(_.toIntOption)
      .getOrElse(if (forwards) StreamVersion.Start else StreamVersion.End)
    val m = q.get("m").flatMap(_.toIntOption).filter(_ > 0).getOrElse(DefaultPageSize)
    val embed = q.get("e").contains("1")
    val page =
      if (forwards) store.readStreamForwards(id, from, m, prefetchJsonData = embed)
      else store.readStreamBackwards(id, from, m, prefetchJsonData = embed)
    // ref: PageExtensions.TryGetETag(ReadStreamPage) + StreamResource.cs:130-133
    val etag =
      if (page.isEnd || (!forwards && from == StreamVersion.End))
        Some(etagOf(page.lastStreamVersion.toLong))
      else None
    if (page.status == PageReadStatus.StreamNotFound)
      respond(ex, 404, HalJson.streamPageJson(page, embed, s"/streams/$id"), etag)
    else
      respond(ex, 200, HalJson.streamPageJson(page, embed, s"/streams/$id"), etag)
  }

  private def append(ex: HttpExchange, id: String): Unit = {
    val expected = expectedVersion(ex)
    val messages = HalJson.readNewMessages(body(ex))
    val result = store.appendToStream(id, expected, messages)
    respond(ex, 201, HalJson.appendResultJson(result))
  }

  private def deleteStream(ex: HttpExchange, id: String): Unit = {
    store.deleteStream(id, expectedVersion(ex))
    respond(ex, 204, "")
  }

  private def getMetadata(ex: HttpExchange, id: String): Unit = {
    val result = store.getStreamMetadata(id)
    // ref: StreamMetadataResource.cs:54 — version-based ETag
    respond(ex, 200, HalJson.metadataJson(result),
      Some(etagOf(result.metadataStreamVersion.toLong)))
  }

  private def setMetadata(ex: HttpExchange, id: String): Unit = {
    // validate the body shape up front (ref: SetStreamMetadataOperation.cs
    // expects a JSON object with int? maxAge/maxCount; the HAL server's
    // embedded schema set rejects anything else as 400)
    val n = HalJson.parseOr400(body(ex))
    if (!n.isObject) throw new InvalidRequestException("Invalid json detected.")
    Seq("maxAge", "maxCount").foreach { f =>
      val v = n.get(f)
      if (v != null && !v.isNull && !v.canConvertToInt)
        throw new InvalidRequestException(s"'$f' must be an integer.")
    }
    store.setStreamMetadata(id, expectedVersion(ex),
      maxAge = HalJson.optInt(n, "maxAge"),
      maxCount = HalJson.optInt(n, "maxCount"),
      metadataJson = HalJson.optJsonText(n, "metadataJson"))
    respond(ex, 200, "{}")
  }

  private def streamMessage(ex: HttpExchange, id: String, version: Int): Unit = {
    val page = store.readStreamForwards(id, version, 1, prefetchJsonData = true)
    page.messages.find(_.streamVersion == version) match {
      case Some(msg) =>
        respond(ex, 200, HalJson.Mapper.writeValueAsString(HalJson.messageNode(msg, embed = true)),
          Some(etagOf(version.toLong)), Some(CacheOneYear))
      case None => respond(ex, 404, """{"error":"message not found"}""")
    }
  }

  private def deleteMessage(ex: HttpExchange, id: String, version: Int): Unit = {
    val page = store.readStreamForwards(id, version, 1, prefetchJsonData = false)
    page.messages.find(_.streamVersion == version).foreach(m => store.deleteMessage(id, m.messageId))
    respond(ex, 204, "")
  }

  // --- plumbing ---

  private val DefaultPageSize = 20 // ref: Constants.cs:80

  /** Numeric path-segment extractors: a malformed segment (e.g.
    * GET /stream/abc) falls through to the 404 route instead of
    * surfacing a NumberFormatException as a 500. */
  private object Num {
    def unapply(s: String): Option[Long] = s.toLongOption
  }
  private object IntNum {
    def unapply(s: String): Option[Int] = s.toIntOption
  }

  private def expectedVersion(ex: HttpExchange): Int =
    Option(ex.getRequestHeaders.getFirst("SSS-ExpectedVersion"))
      .flatMap(_.toIntOption).getOrElse(ExpectedVersion.Any)

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).map(_.split("&").toSeq).getOrElse(Nil)
      .flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(URLDecoder.decode(k, StandardCharsets.UTF_8) ->
            URLDecoder.decode(v, StandardCharsets.UTF_8))
          case Array(k) => Some(URLDecoder.decode(k, StandardCharsets.UTF_8) -> "")
          case _ => None
        }
      }.toMap

  // ref: CacheControl.NoCache / CacheControl.OneYear (CacheControl.cs:13-18)
  private val CacheNoCache = "max-age=0, no-cache, must-revalidate"
  /** Interior pages and single messages are served as immutable — but
    * deleteMessage/deleteStream CAN mutate history, so a shared cache may
    * serve deleted payloads until expiry. The reference HAL server makes
    * the same trade (StreamMessageResource.cs:58-70 caches single
    * messages for a year); deployments where delete-after-read must be
    * promptly visible should front this server with a cache they can
    * purge, or shorten this constant. */
  private val CacheOneYear = "max-age=31536000"

  /** Quoted entity tag from a position or version (ref: ETag.cs:11-12). */
  private def etagOf(v: Long): String = "\"" + v + "\""

  private def respond(
      ex: HttpExchange,
      status: Int,
      content: String,
      etag: Option[String] = None,
      cacheControl: Option[String] = None): Unit = {
    etag.foreach(ex.getResponseHeaders.set("ETag", _))
    cacheControl.foreach(ex.getResponseHeaders.set("Cache-Control", _))
    // If-None-Match hit → 304 carrying only the validator headers
    // (ref: HttpContextExtensions.cs:27-55). Per RFC 9110 §13.1.2: `*`
    // matches any current representation, and comparison is WEAK — a
    // leading W/ on a candidate is stripped before comparing.
    val ifNoneMatch = Option(ex.getRequestHeaders.getFirst("If-None-Match"))
      .toSeq.flatMap(_.split(",")).map(_.trim)
    val etagMatches = etag.isDefined &&
      (ifNoneMatch.contains("*") ||
        etag.exists(t => ifNoneMatch.map(_.stripPrefix("W/")).contains(t)))
    if (status == 200 && etagMatches) {
      ex.sendResponseHeaders(304, -1)
      return
    }
    val bytes = content.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/hal+json")
    // every response surfaces the head position (ref: Constants.cs:29)
    ex.getResponseHeaders.set("SSS-HeadPosition", store.readHeadPosition().toString)
    if (status == 204 || bytes.isEmpty && status != 200) {
      ex.sendResponseHeaders(status, -1)
    } else {
      ex.sendResponseHeaders(status, bytes.length.toLong)
      val out = ex.getResponseBody
      try out.write(bytes) finally out.close()
    }
  }
}
