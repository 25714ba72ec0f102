package graft.format

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** JSON (de)serialization of commit metadata, shaped after Hudi's commit file
  * layout (`partitionToWriteStats` map + aggregate counters) which the
  * reference decodes via `HoodieCommitMetadata.fromBytes`
  * (ref: DeleteView.java:85-88, 205-212). Uses Jackson's tree API (already on
  * the Spark classpath) — driver-side metadata only, never per-row.
  */
object JsonCodec {
  private val mapper = new ObjectMapper()

  def toJson(m: CommitMetadata): String = {
    val root = mapper.createObjectNode()
    val parts = root.putObject("partitionToWriteStats")
    m.partitionToWriteStats.toSeq.sortBy(_._1).foreach { case (p, stats) =>
      val arr = parts.putArray(p)
      stats.foreach { s =>
        val n = arr.addObject()
        n.put("fileId", s.fileId)
        s.path.fold[Unit](n.putNull("path"))(v => n.put("path", v))
        s.prevCommit.fold[Unit](n.putNull("prevCommit"))(v => n.put("prevCommit", v))
        n.put("numWrites", s.numWrites)
        n.put("numDeletes", s.numDeletes)
        n.put("numUpdateWrites", s.numUpdateWrites)
        n.put("numInserts", s.numInserts)
        s.sizeBytes.foreach(n.put("fileSizeInBytes", _))
        if (s.colStats.nonEmpty) {
          val cs = n.putObject("colStats")
          s.colStats.toSeq.sortBy(_._1).foreach { case (c, st) =>
            val o = cs.putObject(c)
            st.min.fold[Unit](o.putNull("min"))(v => o.put("min", v))
            st.max.fold[Unit](o.putNull("max"))(v => o.put("max", v))
            st.nulls.foreach(o.put("nulls", _))
            st.bloom.foreach(o.put("bloom", _))
            st.sum.foreach(o.put("sum", _))
          }
        }
      }
    }
    root.put("operationType", m.operationType)
    root.put("totalRecordsDeleted", m.totalRecordsDeleted)
    root.put("totalRecordsWritten", m.totalRecordsWritten)
    m.schemaJson.foreach(root.put("schema", _))
    if (m.extra.nonEmpty) {
      val ex = root.putObject("extraMetadata")
      m.extra.toSeq.sortBy(_._1).foreach { case (k, v) => ex.put(k, v) }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def fromJson(json: String): CommitMetadata = {
    val root = mapper.readTree(json)
    def optStr(n: JsonNode, f: String): Option[String] = {
      val v = n.get(f)
      if (v == null || v.isNull) None else Some(v.asText())
    }
    val parts = root.get("partitionToWriteStats").asInstanceOf[ObjectNode]
    val m = parts.fields().asScala.map { e =>
      val stats = e.getValue.asInstanceOf[ArrayNode].elements().asScala.map { n =>
        WriteStat(
          fileId = n.get("fileId").asText(),
          path = optStr(n, "path"),
          prevCommit = optStr(n, "prevCommit"),
          numWrites = n.get("numWrites").asLong(),
          numDeletes = n.get("numDeletes").asLong(),
          numUpdateWrites = n.get("numUpdateWrites").asLong(),
          numInserts = n.get("numInserts").asLong(),
          sizeBytes = Option(n.get("fileSizeInBytes"))
            .filterNot(_.isNull).map(_.asLong()),
          colStats = n.get("colStats") match {
            case cs: ObjectNode => cs.fields().asScala.map { c =>
              val o = c.getValue
              c.getKey -> ColStat(
                min = optStr(o, "min"),
                max = optStr(o, "max"),
                nulls = Option(o.get("nulls")).filterNot(_.isNull)
                  .map(_.asLong()),
                bloom = optStr(o, "bloom"),
                sum = optStr(o, "sum"))
            }.toMap
            case _ => Map.empty // pre-stats commits
          })
      }.toSeq
      e.getKey -> stats
    }.toMap
    val extra = root.get("extraMetadata") match {
      case o: ObjectNode => o.fields().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap
      case _ => Map.empty[String, String] // pre-extra commits
    }
    CommitMetadata(
      partitionToWriteStats = m,
      operationType = root.get("operationType").asText(),
      totalRecordsDeleted = root.get("totalRecordsDeleted").asLong(),
      totalRecordsWritten = root.get("totalRecordsWritten").asLong(),
      schemaJson = optStr(root, "schema"),
      extra = extra)
  }

  /** Archive manifest: MANY completed instants' metadata in ONE file
    * (`[{ts, action, meta}, …]`), the storage shape that keeps the active
    * timeline directory small — see [[Timeline.archive]]. Entries nest the
    * exact per-instant commit JSON, so archived and active metadata decode
    * through the same path. */
  def toArchiveJson(entries: Seq[(String, String, CommitMetadata)]): String = {
    val root = mapper.createArrayNode()
    entries.foreach { case (ts, action, meta) =>
      val n = root.addObject()
      n.put("ts", ts)
      n.put("action", action)
      n.set[JsonNode]("meta", mapper.readTree(toJson(meta)))
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def fromArchiveJson(json: String): Seq[(String, String, CommitMetadata)] =
    mapper.readTree(json).asInstanceOf[ArrayNode].elements().asScala.map {
      n =>
        (n.get("ts").asText(), n.get("action").asText(),
          fromJson(mapper.writeValueAsString(n.get("meta"))))
    }.toSeq
}
