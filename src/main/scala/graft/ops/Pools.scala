package graft.ops

import scala.concurrent.ExecutionContext

/** Bounded driver-side pool for submitting concurrent Spark jobs (seeded
  * fits, stage warmup, independent sims). A bounded pool keeps the
  * scheduler fed without oversubscribing the task slots — unbounded
  * concurrency (one job per seed × 32 tasks each) measurably thrashes GC
  * in a single-JVM run and would flood a cluster scheduler the same way.
  */
object Pools {
  lazy val jobs: ExecutionContext =
    ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(8, r => {
        val t = new Thread(r, "graft-jobs")
        t.setDaemon(true)
        t
      }))
}
