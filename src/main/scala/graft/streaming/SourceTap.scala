package graft.streaming

import java.util.concurrent.locks.ReentrantLock

import graft.model.KafkaRecord

/** The working half of the gRPC SourceStream data plane — the part the
  * reference DECLARES but panics on (`service.rs:71-80` responds
  * `unimplemented!` behind tonic; our default service mirrors that as
  * UNIMPLEMENTED errors for parity). Wiring a tap into
  * [[InProcessConnectorService]] opts into an actually-working source
  * direction, the same way the field partitioner (P3) implements what the
  * reference stubs (`s3.rs:149-160`).
  *
  * Semantics follow the proto's intent (`connector.proto:61-81`: client
  * sends Heartbeat/Ack/Commit, server streams RecordBatches) with the
  * reference's own capacity constants: the buffer holds at most
  * `capacity` batches (the source→sink mpsc bound, `manager.rs:100`), and
  * one poll drains at most `drainMax` batches (the gRPC stream channel
  * capacity, `service.rs:41` — the heartbeat doubles as flow-control
  * credit, which is exactly how a bounded channel drains).
  *
  * Delivery is at-least-once with explicit redelivery: polled batches move
  * to an in-flight set keyed by their record ids; a successful Ack drops
  * them, a failed Ack requeues them at the FRONT (order-preserving retry),
  * and Commit records the high-water offsets per (topic, partition) — the
  * same manual-commit bookkeeping the reference's Kafka source keeps
  * (`kafka.rs:357-390`).
  *
  * All cross-message state lives HERE, never in the stream iterator —
  * required by the ConnectorService per-message-stateless contract (the
  * gRPC front invokes the verb once per inbound message).
  */
final class SourceTap(capacity: Int = 1000, drainMax: Int = 100) {
  import Wire._

  private val lock = new ReentrantLock()
  private val queue = new scala.collection.mutable.ArrayDeque[RecordBatch]()
  private val inFlight = new scala.collection.mutable.LinkedHashMap[Seq[RecordId], RecordBatch]()
  private val committed = new scala.collection.mutable.HashMap[(String, Int), Long]()

  private def idsOf(b: RecordBatch): Seq[RecordId] =
    b.records.map(r => RecordId(r.topic, r.partition, r.offset))

  /** Producer side (a streaming query's foreachBatch, a file watcher, a
    * test). Returns false when the buffer is at capacity — backpressure,
    * not silent drop.
    */
  def offer(records: Seq[KafkaRecord]): Boolean = {
    if (records.isEmpty) return true
    lock.lock()
    try {
      if (queue.size >= capacity) false
      else { queue.append(RecordBatch(records)); true }
    } finally lock.unlock()
  }

  /** Consumer side: dequeue up to `drainMax` batches, tracking them
    * in-flight until acked.
    */
  def poll(): Seq[RecordBatch] = {
    lock.lock()
    try {
      val n = math.min(drainMax, queue.size)
      val out = (0 until n).map(_ => queue.removeHead())
      out.foreach(b => inFlight.put(idsOf(b), b))
      out
    } finally lock.unlock()
  }

  /** Ack from the receiving system: success drops the matching in-flight
    * batches; failure requeues them at the front for redelivery.
    */
  def ack(a: RecordAck): Unit = {
    lock.lock()
    try {
      val idSet = a.recordIds.toSet
      val matched = inFlight.keys.filter(_.exists(idSet.contains)).toSeq
      matched.foreach { k =>
        val b = inFlight.remove(k).get
        if (!a.success) queue.prepend(b)
      }
    } finally lock.unlock()
  }

  /** Manual offset commit: record the high-water offset per partition. */
  def commit(c: OffsetCommit): Unit = {
    lock.lock()
    try c.recordIds.foreach { id =>
      val k = (id.topic, id.partition)
      if (committed.getOrElse(k, -1L) < id.offset) committed(k) = id.offset
    } finally lock.unlock()
  }

  def committedOffset(topic: String, partition: Int): Option[Long] = {
    lock.lock()
    try committed.get((topic, partition)) finally lock.unlock()
  }

  /** Stream teardown (client cancel, network drop, graceful close): the
    * reconnect-resume half of the manual-commit regime (`kafka.rs:357-390`
    * — poll positions rewind to the committed offset, not the polled one).
    * Every in-flight batch returns to the FRONT of the queue in original
    * poll order, minus records at or below the committed high-water mark —
    * so a reconnecting client resumes delivery exactly after its last
    * Commit: acked-and-committed records never redeliver, polled-but-
    * unacked ones do (at-least-once).
    */
  def onDisconnect(): Unit = {
    lock.lock()
    try {
      // reverse iteration + prepend = original poll order at the head
      val pending = inFlight.values.toSeq.reverse
      inFlight.clear()
      pending.foreach { b =>
        val keep = b.records.filter(r =>
          committed.getOrElse((r.topic, r.partition), -1L) < r.offset)
        if (keep.nonEmpty) queue.prepend(RecordBatch(keep))
      }
    } finally lock.unlock()
  }

  def buffered: Int = { lock.lock(); try queue.size finally lock.unlock() }
  def inFlightCount: Int = { lock.lock(); try inFlight.size finally lock.unlock() }
}
