package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** S3: the reference logs consumer-group rebalance and commit results
  * (`kafka.rs:26-41`); in Spark the equivalent observability surface is a
  * `StreamingQueryListener` over progress events. This listener keeps the
  * last N progress summaries per query — the data a `GetStatus` RPC
  * (`service.rs:386-422`, unimplemented in the reference) would serve.
  */
final class ProgressTracker(keep: Int = 32) extends StreamingQueryListener {

  final case class Progress(queryName: String, batchId: Long,
                            numInputRows: Long, inputRowsPerSecond: Double,
                            sink: String)

  private val lock = new Object
  private val progress = mutable.Map.empty[String, Vector[Progress]]
  private val active = mutable.Set.empty[String]

  override def onQueryStarted(event: QueryStartedEvent): Unit = lock.synchronized {
    active += Option(event.name).getOrElse(event.id.toString): Unit
  }

  override def onQueryProgress(event: QueryProgressEvent): Unit = lock.synchronized {
    val p = event.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    val entry = Progress(name, p.batchId, p.numInputRows,
      Option(p.inputRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      p.sink.description)
    progress(name) = (progress.getOrElse(name, Vector.empty) :+ entry).takeRight(keep)
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = lock.synchronized {
    active -= event.id.toString: Unit
  }

  def history(queryName: String): Seq[Progress] = lock.synchronized {
    progress.getOrElse(queryName, Vector.empty)
  }

  def totalInputRows(queryName: String): Long = lock.synchronized {
    progress.getOrElse(queryName, Vector.empty).map(_.numInputRows).sum
  }
}
