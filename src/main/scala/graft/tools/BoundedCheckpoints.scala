package graft.tools

import org.apache.spark.sql.Dataset

/** Declared-bounded localCheckpoint registry — the r11 ADVICE hole, closed.
  *
  * `PlanAudit`'s boundedness walk used to trust EVERY `LogicalRDD` /
  * `RDDScanExec` leaf as "small enough to broadcast", while the very same
  * rounds were converting corpus-proportional relations into exactly such
  * leaves via `localCheckpoint` (plan-string truncation for unrolled
  * iteratives). That made the broadcast-hint and cross-shape CI gates
  * blind behind every checkpoint cut: the "no broadcast consumes this"
  * claims lived in comments only.
  *
  * The fix is a declaration the audit can consult: a call site that KNOWS
  * its relation is driver-bounded (a k-row centroid frame, a BPE vocab,
  * a fixed probe set — cardinality independent of the corpus) routes
  * through [[BoundedCheckpoints.checkpoint]], which records the
  * checkpointed RDD's id. `PlanAudit.bounded()` treats a checkpoint leaf
  * as bounded ONLY when its RDD id is registered; every plain
  * `.localCheckpoint(...)` (the corpus-scale lineage cuts) reads as
  * UNBOUNDED, so a future `broadcast()` or cross-shaped join over it
  * fails the CatalogContractSpec gates instead of shipping silently.
  *
  * Declaring boundedness is the author asserting a row bound that holds
  * at ANY scale factor — each call site must say why in a comment, the
  * same discipline as the gates' accepted-entry lists.
  */
object BoundedCheckpoints {

  private val ids = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** localCheckpoint `ds` AND declare its output driver-bounded (row count
    * independent of corpus size). Returns the checkpointed Dataset; the
    * underlying RDD id is registered for `PlanAudit.bounded()`.
    */
  def checkpoint[T](ds: Dataset[T], eager: Boolean = true): Dataset[T] = {
    val cp = ds.localCheckpoint(eager)
    cp.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => ids.add(lr.rdd.id)
    }
    cp
  }

  /** Is this RDD id a DECLARED-bounded checkpoint? (False for every plain
    * `.localCheckpoint` — unregistered cuts are corpus-scale by default.)
    */
  def contains(rddId: Int): Boolean = ids.contains(rddId)
}
