package graft.streaming

/** Cumulative wall-vs-execution split of every stream driven to completion
  * by the local harnesses (round-12 verdict item 6).
  *
  * At fixture scale the streaming catalog entries are dominated by FIXED
  * micro-batch machinery — query planning inside `start()`, state-store
  * init, file-source discovery, teardown — not by data. Lumping that into
  * one wall number made every contention triage on a streaming query
  * guesswork (q391 burned judge time in round 12 exactly this way). The
  * split: `data` = Σ `triggerExecution` durations reported by the engine's
  * per-batch progress (the time micro-batches actually executed), `startup`
  * = wall − data (everything outside batch execution). Micro-batch count
  * rides along so a plan change that alters batching (the q391 hypothesis)
  * is directly observable.
  *
  * Counters are cumulative across the JVM; `graft.Bench` snapshots around
  * each catalog query and attributes the delta to it — zero plumbing
  * through the query functions themselves.
  */
object StreamMetrics {
  private val startupMs = new java.util.concurrent.atomic.AtomicLong(0L)
  private val dataMs = new java.util.concurrent.atomic.AtomicLong(0L)
  private val batches = new java.util.concurrent.atomic.AtomicLong(0L)

  /** (cumulative startup ms, cumulative data ms, cumulative micro-batches). */
  def snapshot: (Long, Long, Long) = (startupMs.get(), dataMs.get(), batches.get())

  private[streaming] def record(wallMs: Long, execMs: Long, nBatches: Long): Unit = {
    val d = math.max(0L, math.min(execMs, wallMs))
    dataMs.addAndGet(d)
    startupMs.addAndGet(math.max(0L, wallMs - d))
    batches.addAndGet(nBatches)
  }
}
