package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** (De)serializes the store's metadata-message payload.
  *
  * Shape follows the reference (`src/SqlStreamStore/Streams/MetadataMessage.cs:11-26`):
  * `{"StreamId": "...", "MaxAge": int|null, "MaxCount": int|null, "MetaJson": "..."}`.
  * Uses the Jackson shipped with Spark — no extra dependency.
  */
object MetadataJson {
  private val mapper = new ObjectMapper()

  def write(m: MetadataMessage): String = {
    val node = mapper.createObjectNode()
    node.put("StreamId", m.streamId)
    m.maxAge.fold[ObjectNode](node.putNull("MaxAge").asInstanceOf[ObjectNode])(v => node.put("MaxAge", v))
    m.maxCount.fold[ObjectNode](node.putNull("MaxCount").asInstanceOf[ObjectNode])(v => node.put("MaxCount", v))
    m.metaJson.fold[ObjectNode](node.putNull("MetaJson").asInstanceOf[ObjectNode])(v => node.put("MetaJson", v))
    mapper.writeValueAsString(node)
  }

  def read(json: String): MetadataMessage = {
    val node = mapper.readTree(json)
    def optInt(field: String): Option[Int] = {
      val n = node.get(field)
      if (n == null || n.isNull) None else Some(n.asInt())
    }
    def optStr(field: String): Option[String] = {
      val n = node.get(field)
      if (n == null || n.isNull) None else Some(n.asText())
    }
    MetadataMessage(
      streamId = optStr("StreamId").getOrElse(""),
      maxAge = optInt("MaxAge"),
      maxCount = optInt("MaxCount"),
      metaJson = optStr("MetaJson"))
  }
}
