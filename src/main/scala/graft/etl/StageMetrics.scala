package graft.etl

/** Cumulative EXTERNAL-ENGINE attribution for queries that stage data in a
  * non-Spark system (round-13 verdict item 5 — q146's Derby staging).
  *
  * The growth appendix measures whole-query wall-clock, which lumps the
  * embedded Derby STAGING WRITE (the declared external engine, 30 s at
  * sf1) together with the Spark-side partitioned drain (2.5 s, balanced
  * and spec-pinned). Queries that stage externally record the staging
  * write here; `graft.Bench` snapshots around each catalog query and
  * emits an `external_split` line, so the appendix can decompose the row
  * IN the measurement instead of attributing by prose.
  *
  * Counters are cumulative across the JVM (the StreamMetrics contract);
  * the harnesses run queries sequentially.
  */
object StageMetrics {
  private val writeMs = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Cumulative external staging-write milliseconds. */
  def snapshot: Long = writeMs.get()

  /** Time `action` (an eager external write) and attribute it. */
  def timedWrite[T](action: => T): T = {
    val t0 = System.nanoTime()
    try action
    finally writeMs.addAndGet((System.nanoTime() - t0) / 1000000L)
  }
}
