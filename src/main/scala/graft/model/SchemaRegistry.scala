package graft.model

import java.util.concurrent.atomic.AtomicInteger
import scala.collection.concurrent.TrieMap

/** Minimal schema-registry model — the reference's roadmap item it never
  * started (`/root/reference/GAP.md:12` "Schema Registry Integration: Not
  * Started"; no reference code consumes one). This is the part that is
  * engine-shaped: subject → versioned schema ids with identical-schema
  * dedup, plus the Confluent wire framing (magic byte 0x00 + big-endian
  * 4-byte schema id + payload) as column algebra in
  * [[graft.operators.Encode.confluentFrame]]. A network-backed registry
  * client would implement the same trait.
  */
final case class RegisteredSchema(id: Int, subject: String, version: Int,
                                  schemaJson: String)

trait SchemaRegistry {
  /** Register (or find) a schema under a subject; identical schema text
    * re-registers to the same id, like the Confluent registry.
    */
  def register(subject: String, schemaJson: String): RegisteredSchema
  def byId(id: Int): Option[RegisteredSchema]
  def latest(subject: String): Option[RegisteredSchema]
}

final class InMemorySchemaRegistry extends SchemaRegistry {
  private val nextId = new AtomicInteger(0)
  private val bySubject = TrieMap.empty[String, Vector[RegisteredSchema]]
  private val byIdMap = TrieMap.empty[Int, RegisteredSchema]

  override def register(subject: String, schemaJson: String): RegisteredSchema =
    synchronized {
      val versions = bySubject.getOrElse(subject, Vector.empty)
      versions.find(_.schemaJson == schemaJson).getOrElse {
        val rs = RegisteredSchema(nextId.incrementAndGet(), subject,
          versions.size + 1, schemaJson)
        bySubject.put(subject, versions :+ rs)
        byIdMap.put(rs.id, rs)
        rs
      }
    }

  override def byId(id: Int): Option[RegisteredSchema] = byIdMap.get(id)
  override def latest(subject: String): Option[RegisteredSchema] =
    bySubject.get(subject).flatMap(_.lastOption)
}
