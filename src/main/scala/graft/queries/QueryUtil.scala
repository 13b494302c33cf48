package graft.queries

import org.apache.spark.sql.DataFrame

/** Shared helpers for catalog entry bodies. */
private[queries] object QueryUtil {

  /** Chainable persist(MEMORY_AND_DISK) + eager cache fill.
    *
    * Catalog entries persist a relation precisely because ≥ 2 downstream
    * branches read it — and those branches are SIBLING query stages that
    * AQE materializes concurrently, so a lazily-filled cache is raced and
    * the persisted pipeline recomputed once per reader (r15 profile:
    * duplicate "Block rdd_N already exists" fills under the fan-out
    * entries; see [[graft.operators.Dedup.eagerPersist]]). One `count()`
    * pays the cache build exactly once, up front — the build cost itself
    * is identical (InMemoryRelation materializes all columns either way);
    * only the duplicate computes disappear.
    */
  implicit class EagerPersistOps(private val df: DataFrame) extends AnyVal {
    def eagerPersisted: DataFrame = graft.operators.Dedup.eagerPersist(df)
  }

  /** Overlap two INDEPENDENT eager construction pipelines (CC fixpoint
    * loops, eager cache fills) from driver threads — guide §2.6: actions
    * are only sequential because the driver calls them sequentially, and
    * Spark's FIFO scheduler back-fills one pipeline's stragglers with the
    * other's tasks. For barrier-dominated loops (a job + localCheckpoint
    * per round) the walls combine to ~max instead of sum. Results are
    * byte-identical — the same computations, submitted from two threads.
    */
  def inParallel[A, B](a: => A, b: => B): (A, B) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(a)
    val fb = Future(b)
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
  }
}
