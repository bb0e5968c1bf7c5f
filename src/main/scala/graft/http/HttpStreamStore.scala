package graft.http

import graft.core._
import graft.store.StreamStore

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** [[StreamStore]] client over the HTTP surface — the twin of the
  * reference's `HttpClientSqlStreamStore` (`src/SqlStreamStore.Http/`),
  * which implements the same store interface against the HAL server and
  * reuses the ordinary subscription machinery on top of the paged reads
  * (`HttpClientSqlStreamStore.Subscriptions.cs:9-52`) — as does this one:
  * pass an `HttpStreamStore` to [[graft.streaming.Subscriptions]].
  */
final class HttpStreamStore(baseUrl: String, onClose: () => Unit = () => ()) extends StreamStore {

  private val client = HttpClient.newHttpClient()
  private val base = baseUrl.stripSuffix("/")

  // --- writes ---

  override def appendToStream(streamId: String, expectedVersion: Int, messages: Seq[NewStreamMessage]): AppendResult = {
    val resp = send(request(s"/streams/${enc(streamId)}")
      .header("SSS-ExpectedVersion", expectedVersion.toString)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(HalJson.newMessagesJson(messages))),
      streamId, expectedVersion)
    val n = HalJson.Mapper.readTree(resp.body)
    AppendResult(n.get("currentVersion").asInt, n.get("currentPosition").asLong)
  }

  override def deleteStream(streamId: String, expectedVersion: Int): Unit =
    send(request(s"/streams/${enc(streamId)}")
      .header("SSS-ExpectedVersion", expectedVersion.toString)
      .DELETE(), streamId, expectedVersion)

  override def deleteMessage(streamId: String, messageId: String): Unit = {
    // resolve version by id via the paged read, then DELETE by version
    var page = readStreamForwards(streamId, StreamVersion.Start, 1000, prefetchJsonData = false)
    while (page.status == PageReadStatus.Success) {
      page.messages.find(_.messageId == messageId) match {
        case Some(m) =>
          send(request(s"/streams/${enc(streamId)}/${m.streamVersion}").DELETE(), streamId, ExpectedVersion.Any)
          return
        case None =>
          if (page.isEnd) return
          page = page.readNext()
      }
    }
  }

  override def setStreamMetadata(
      streamId: String,
      expectedStreamMetadataVersion: Int,
      maxAge: Option[Int],
      maxCount: Option[Int],
      metadataJson: Option[String]): Unit = {
    val n = HalJson.Mapper.createObjectNode()
    maxAge.fold(n.putNull("maxAge"))(v => n.put("maxAge", v))
    maxCount.fold(n.putNull("maxCount"))(v => n.put("maxCount", v))
    metadataJson.fold(n.putNull("metadataJson"))(v => n.put("metadataJson", v))
    send(request(s"/streams/${enc(streamId)}/metadata")
      .header("SSS-ExpectedVersion", expectedStreamMetadataVersion.toString)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(HalJson.Mapper.writeValueAsString(n))),
      streamId, expectedStreamMetadataVersion)
  }

  // --- reads ---

  override def readAllForwards(from: Long, maxCount: Int, prefetchJsonData: Boolean): ReadAllPage =
    readAll(from, maxCount, prefetchJsonData, forwards = true)

  override def readAllBackwards(from: Long, maxCount: Int, prefetchJsonData: Boolean): ReadAllPage =
    readAll(from, maxCount, prefetchJsonData, forwards = false)

  private def readAll(from: Long, maxCount: Int, prefetch: Boolean, forwards: Boolean): ReadAllPage = {
    val d = if (forwards) "f" else "b"
    val e = if (prefetch) "&e=1" else ""
    val resp = send(request(s"/stream?d=$d&p=$from&m=$maxCount$e").GET(), "", ExpectedVersion.Any)
    val n = HalJson.Mapper.readTree(resp.body)
    val msgs = n.get("messages").elements().asScala.map(HalJson.readMessage).toSeq
    val next = n.get("nextPosition").asLong
    val isEnd = n.get("isEnd").asBoolean
    ReadAllPage(
      n.get("fromPosition").asLong, next, isEnd,
      if (forwards) ReadDirection.Forward else ReadDirection.Backward,
      msgs,
      () => readAll(next, maxCount, prefetch, forwards))
  }

  override def readStreamForwards(streamId: String, fromVersion: Int, maxCount: Int, prefetchJsonData: Boolean): ReadStreamPage =
    readStream(streamId, fromVersion, maxCount, prefetchJsonData, forwards = true)

  override def readStreamBackwards(streamId: String, fromVersion: Int, maxCount: Int, prefetchJsonData: Boolean): ReadStreamPage =
    readStream(streamId, fromVersion, maxCount, prefetchJsonData, forwards = false)

  private def readStream(streamId: String, from: Int, maxCount: Int, prefetch: Boolean, forwards: Boolean): ReadStreamPage = {
    val d = if (forwards) "f" else "b"
    val e = if (prefetch) "&e=1" else ""
    val resp = sendRaw(request(s"/streams/${enc(streamId)}?d=$d&p=$from&m=$maxCount$e").GET())
    if (resp.statusCode == 404)
      ReadStreamPage(streamId, PageReadStatus.StreamNotFound, from, StreamVersion.End,
        StreamVersion.End, Position.End,
        if (forwards) ReadDirection.Forward else ReadDirection.Backward, isEnd = true, Nil,
        () => readStream(streamId, from, maxCount, prefetch, forwards))
    else {
      require(resp.statusCode == 200, s"unexpected status ${resp.statusCode}: ${resp.body}")
      val n = HalJson.Mapper.readTree(resp.body)
      val msgs = n.get("messages").elements().asScala.map(HalJson.readMessage).toSeq
      val next = n.get("nextStreamVersion").asInt
      ReadStreamPage(
        streamId, PageReadStatus.Success,
        n.get("fromStreamVersion").asInt, next,
        n.get("lastStreamVersion").asInt, n.get("lastStreamPosition").asLong,
        if (forwards) ReadDirection.Forward else ReadDirection.Backward,
        n.get("isEnd").asBoolean, msgs,
        () => readStream(streamId, next, maxCount, prefetch, forwards))
    }
  }

  override def readHeadPosition(): Long = {
    val resp = sendRaw(request("/stream?d=b&m=1").GET())
    val h = resp.headers.firstValue("SSS-HeadPosition")
    if (h.isPresent) h.get.toLong else Position.End
  }

  override def readStreamHeadPosition(streamId: String): Long = {
    val p = readStreamBackwards(streamId, StreamVersion.End, 1, prefetchJsonData = false)
    if (p.status == PageReadStatus.StreamNotFound) Position.End else p.lastStreamPosition
  }

  override def readStreamHeadVersion(streamId: String): Int = {
    val p = readStreamBackwards(streamId, StreamVersion.End, 1, prefetchJsonData = false)
    if (p.status == PageReadStatus.StreamNotFound) StreamVersion.End else p.lastStreamVersion
  }

  override def getStreamMetadata(streamId: String): StreamMetadataResult = {
    val resp = send(request(s"/streams/${enc(streamId)}/metadata").GET(), streamId, ExpectedVersion.Any)
    val n = HalJson.Mapper.readTree(resp.body)
    StreamMetadataResult(
      n.get("streamId").asText,
      n.get("metadataStreamVersion").asInt,
      HalJson.optInt(n, "maxAge"),
      HalJson.optInt(n, "maxCount"),
      HalJson.optText(n, "metadataJson").orNull)
  }

  override def listStreams(pattern: Pattern, maxCount: Int, continuationToken: Option[String]): ListStreamsPage = {
    val pat = pattern match {
      case Pattern.Anything => ""
      case Pattern.StartsWith(p) => s"&t=s&p=${enc(p)}"
      case Pattern.EndsWith(p) => s"&t=e&p=${enc(p)}"
    }
    val c = continuationToken.map(t => s"&c=${enc(t)}").getOrElse("")
    val resp = send(request(s"/streams?m=$maxCount$pat$c").GET(), "", ExpectedVersion.Any)
    val n = HalJson.Mapper.readTree(resp.body)
    val ids = n.get("streamIds").elements().asScala.map(_.asText).toSeq
    val token = n.get("continuationToken").asText
    ListStreamsPage(ids, token, () => listStreams(pattern, maxCount, Some(token)))
  }

  override def readMessageData(streamId: String, streamVersion: Int): Option[String] = {
    val resp = sendRaw(request(s"/streams/${enc(streamId)}/$streamVersion").GET())
    if (resp.statusCode != 200) None
    else HalJson.optText(HalJson.Mapper.readTree(resp.body), "jsonData")
  }

  /** The client holds no resources itself; `onClose` lets an owning
    * fixture tear down a server+store pair it constructed with the
    * client (see the HttpBackend test fixture). */
  override def close(): Unit = onClose()

  // --- plumbing ---

  private def enc(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8).replace("+", "%20")

  private def request(pathAndQuery: String): HttpRequest.Builder =
    HttpRequest.newBuilder(URI.create(base + pathAndQuery))

  private def sendRaw(b: HttpRequest.Builder): HttpResponse[String] =
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())

  /** Send + map protocol errors back to the store's exception types, as
    * the reference client does: 409 → WrongExpectedVersionException, 400
    * (the server's structured "Bad format." problem payload) →
    * IllegalArgumentException carrying the payload's detail — so client
    * callers see the same exception surface as direct-store callers. */
  private def send(b: HttpRequest.Builder, streamId: String, expectedVersion: Int): HttpResponse[String] = {
    val resp = sendRaw(b)
    resp.statusCode match {
      case 409 => throw WrongExpectedVersionException(streamId, expectedVersion)
      case 400 =>
        val detail =
          try HalJson.optText(HalJson.Mapper.readTree(resp.body), "detail")
          catch { case _: Exception => None }
        throw new IllegalArgumentException(detail.getOrElse(s"HTTP 400: ${resp.body}"))
      case s if s >= 400 => throw new RuntimeException(s"HTTP $s: ${resp.body}")
      case _ => resp
    }
  }
}
