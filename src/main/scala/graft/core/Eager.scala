package graft.core

import org.apache.spark.sql.Dataset

/** GC-pinned eager checkpointing.
  *
  * `ds.localCheckpoint(eager = true)` has a benign but noisy race: the
  * SOURCE plan's SQL-metric accumulators are only weakly referenced by
  * Spark's AccumulatorContext, and in the common
  * `f(x).localCheckpoint(true)` shape nothing else holds the unnamed
  * intermediate Dataset — JVM liveness analysis lets the JIT treat it as
  * dead the moment the call is entered, so a GC DURING the
  * materialization job can clear the running stage's own metric
  * accumulators, and every task completion then logs an ERROR-level
  * `accessNonExistentAccumulator` trace from the DAGScheduler (results
  * are unaffected; task-metric deltas are lost). The spam is
  * GC-timing-dependent, which is exactly what makes it pernicious in
  * logs: it appears in bursts wherever memory pressure happens to sit.
  *
  * [[EagerOps.pinnedCheckpoint]] closes the window with a reachability
  * fence: the source Dataset (→ query execution → physical plan → metric
  * accumulators) stays strongly reachable until the checkpoint job has
  * returned — accumulator updates are processed before the job completes,
  * so cleanup afterwards has nothing left to report against. Use it
  * anywhere an EAGER local checkpoint is taken on an otherwise-unnamed
  * plan; lazy (`eager = false`) checkpoints do not need it (until
  * materialization truncates it, the checkpoint RDD's lineage closures
  * hold the metrics strongly).
  */
object Eager {

  implicit final class EagerOps[T](private val ds: Dataset[T])
      extends AnyVal {
    def pinnedCheckpoint(): Dataset[T] = {
      val out = ds.localCheckpoint(true)
      java.lang.ref.Reference.reachabilityFence(ds)
      out
    }
  }
}
