package graft.http

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.core._

import scala.jdk.CollectionConverters._

/** JSON wire format of the HTTP surface.
  *
  * Shapes follow the reference's HAL server/client pair
  * (`src/SqlStreamStore.HAL/`, `src/SqlStreamStore.Http/`): messages
  * serialize with the `StreamMessage` field names, append bodies are
  * arrays of `NewStreamMessage`, pages carry HAL-style `_links`
  * (self/next) plus the page fields the client needs, every `_links`
  * block carries the `streamStore` curies template resolving to the
  * server's `/docs/streamStore:{rel}` markdown resources (ref:
  * `Links.cs:77-85`, `Docs/DocsResource.cs`); only the interactive HAL
  * browser UI is out of scope, documented in README §HTTP.
  */
object HalJson {
  val Mapper = new ObjectMapper()

  // --- messages ---

  def messageNode(m: StreamMessage, embed: Boolean): ObjectNode = {
    val n = Mapper.createObjectNode()
    n.put("messageId", m.messageId)
    n.put("createdUtc", m.createdUtc.toInstant.toString)
    n.put("position", m.position)
    n.put("streamId", m.streamId)
    n.put("streamVersion", m.streamVersion)
    n.put("type", m.`type`)
    if (embed && m.jsonData != null) n.put("jsonData", m.jsonData) else n.putNull("jsonData")
    if (m.jsonMetadata != null) n.put("jsonMetadata", m.jsonMetadata) else n.putNull("jsonMetadata")
    n
  }

  def readMessage(n: JsonNode): StreamMessage =
    StreamMessage(
      streamId = n.get("streamId").asText,
      messageId = n.get("messageId").asText,
      streamVersion = n.get("streamVersion").asInt,
      position = n.get("position").asLong,
      createdUtc = java.sql.Timestamp.from(java.time.Instant.parse(n.get("createdUtc").asText)),
      `type` = n.get("type").asText,
      jsonData = optText(n, "jsonData").orNull,
      jsonMetadata = optText(n, "jsonMetadata").orNull)

  // --- append bodies ---

  def newMessagesJson(messages: Seq[NewStreamMessage]): String = {
    val arr = Mapper.createArrayNode()
    messages.foreach { m =>
      val n = arr.addObject()
      n.put("messageId", m.messageId)
      n.put("type", m.`type`)
      if (m.jsonData != null) n.put("jsonData", m.jsonData) else n.putNull("jsonData")
      if (m.jsonMetadata != null) n.put("jsonMetadata", m.jsonMetadata) else n.putNull("jsonMetadata")
    }
    Mapper.writeValueAsString(arr)
  }

  /** Parse + validate an append body up front, with the reference's
    * request schema (ref: `SqlStreamStore.HAL/Streams/AppendStreamOperation.cs:26-82`,
    * whose embedded JSON schemas `SchemaSet.cs` serves): the body must be
    * a JSON array of messages (or one message object — appended as a
    * one-element batch); each message needs a well-formed, non-empty UUID
    * `messageId` and a `type`. Violations throw [[InvalidRequestException]]
    * → a structured 400, never a raw parse error surfacing as a 500. */
  def readNewMessages(body: String): Seq[NewStreamMessage] = {
    val root = parseOr400(body)
    val elems: Seq[JsonNode] = root match {
      case a: ArrayNode => a.elements().asScala.toSeq
      case o: ObjectNode => Seq(o)
      case _ => throw new InvalidRequestException("Invalid json detected.")
    }
    elems.zipWithIndex.map { case (n, index) =>
      val midText = optText(n, "messageId").getOrElse(
        throw new InvalidRequestException(s"'messageId' at index $index was improperly formatted."))
      val mid =
        try java.util.UUID.fromString(midText)
        catch { case _: IllegalArgumentException =>
          throw new InvalidRequestException(s"'messageId' at index $index was improperly formatted.")
        }
      if (mid == new java.util.UUID(0L, 0L))
        throw new InvalidRequestException(s"'messageId' at index $index was empty.")
      NewStreamMessage(
        messageId = midText,
        `type` = optText(n, "type").getOrElse(
          throw new InvalidRequestException(s"'type' at index $index was not set.")),
        jsonData = optJsonText(n, "jsonData").orNull,
        jsonMetadata = optJsonText(n, "jsonMetadata").orNull)
    }
  }

  /** readTree that maps malformed JSON to the 400 path (ref:
    * `ExceptionHandlingMiddleware.cs:34-38` maps JsonException → 400). */
  def parseOr400(body: String): JsonNode =
    try Mapper.readTree(body)
    catch { case _: com.fasterxml.jackson.core.JacksonException =>
      throw new InvalidRequestException("Invalid json detected.")
    }

  // --- pages ---

  def allPageJson(page: ReadAllPage, embed: Boolean, basePath: String): String = {
    val n = Mapper.createObjectNode()
    n.put("fromPosition", page.fromPosition)
    n.put("nextPosition", page.nextPosition)
    n.put("isEnd", page.isEnd)
    n.put("direction", if (page.direction == ReadDirection.Forward) 1 else -1)
    val arr = n.putArray("messages")
    page.messages.foreach(m => arr.add(messageNode(m, embed)))
    val d = if (page.direction == ReadDirection.Forward) "f" else "b"
    links(n,
      "self" -> s"$basePath?d=$d&p=${page.fromPosition}",
      "next" -> s"$basePath?d=$d&p=${page.nextPosition}")
    Mapper.writeValueAsString(n)
  }

  def streamPageJson(page: ReadStreamPage, embed: Boolean, basePath: String): String = {
    val n = Mapper.createObjectNode()
    n.put("streamId", page.streamId)
    n.put("status", page.status.toString)
    n.put("fromStreamVersion", page.fromStreamVersion)
    n.put("nextStreamVersion", page.nextStreamVersion)
    n.put("lastStreamVersion", page.lastStreamVersion)
    n.put("lastStreamPosition", page.lastStreamPosition)
    n.put("isEnd", page.isEnd)
    n.put("direction", if (page.direction == ReadDirection.Forward) 1 else -1)
    val arr = n.putArray("messages")
    page.messages.foreach(m => arr.add(messageNode(m, embed)))
    val d = if (page.direction == ReadDirection.Forward) "f" else "b"
    links(n,
      "self" -> s"$basePath?d=$d&p=${page.fromStreamVersion}",
      "next" -> s"$basePath?d=$d&p=${page.nextStreamVersion}")
    Mapper.writeValueAsString(n)
  }

  def listStreamsJson(page: ListStreamsPage): String = {
    val n = Mapper.createObjectNode()
    val arr = n.putArray("streamIds")
    page.streamIds.foreach(arr.add)
    n.put("continuationToken", page.continuationToken)
    Mapper.writeValueAsString(n)
  }

  def metadataJson(m: StreamMetadataResult): String = {
    val n = Mapper.createObjectNode()
    n.put("streamId", m.streamId)
    n.put("metadataStreamVersion", m.metadataStreamVersion)
    m.maxAge.fold(n.putNull("maxAge"))(v => n.put("maxAge", v))
    m.maxCount.fold(n.putNull("maxCount"))(v => n.put("maxCount", v))
    if (m.metadataJson != null) n.put("metadataJson", m.metadataJson) else n.putNull("metadataJson")
    Mapper.writeValueAsString(n)
  }

  def appendResultJson(r: AppendResult): String = {
    val n = Mapper.createObjectNode()
    n.put("currentVersion", r.currentVersion)
    n.put("currentPosition", r.currentPosition)
    Mapper.writeValueAsString(n)
  }

  def optText(n: JsonNode, field: String): Option[String] = {
    val v = n.get(field)
    if (v == null || v.isNull) None else Some(v.asText)
  }

  /** Like [[optText]], but a JSON object/array value serializes to its
    * JSON text instead of `asText`'s empty string — the reference accepts
    * `jsonData` as an embedded object (`AppendStreamOperation.cs:79`,
    * `Value<JObject>`), so both `"jsonData": "{\"a\":1}"` and
    * `"jsonData": {"a":1}` carry the same payload. */
  def optJsonText(n: JsonNode, field: String): Option[String] = {
    val v = n.get(field)
    if (v == null || v.isNull) None
    else if (v.isContainerNode) Some(Mapper.writeValueAsString(v))
    else Some(v.asText)
  }

  def optInt(n: JsonNode, field: String): Option[Int] = {
    val v = n.get(field)
    if (v == null || v.isNull) None else Some(v.asInt)
  }

  private def links(n: ObjectNode, rels: (String, String)*): Unit = {
    val l = n.putObject("_links")
    rels.foreach { case (rel, href) => l.putObject(rel).put("href", href) }
    // HAL curie: `streamStore:` link relations resolve to /docs/{rel}
    // (ref: Links.cs:77-85 appends the curies link to every response)
    val curie = l.putArray("curies").addObject()
    curie.put("name", "streamStore")
    curie.put("href", "/docs/streamStore:{rel}")
    curie.put("templated", true)
    curie.put("type", "text/markdown")
    curie.put("title", "Documentation")
  }
}

/** A request body that fails the HTTP surface's up-front schema
  * validation (ref: `SqlStreamStore.HAL/InvalidAppendRequestException.cs`;
  * the server maps it to a structured 400 "Bad format." payload, as
  * `ExceptionHandlingMiddleware.cs:39-44` does). */
final class InvalidRequestException(message: String) extends RuntimeException(message)
