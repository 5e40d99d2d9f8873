package graft

/** JVM-wide counter of in-memory memo BUILDS (trained centers,
  * codebooks, collected query vectors, covariance sums, classifier
  * weights) — the driver-visible analogue of the `graft-staged` temp-
  * dir count for memos that hold VALUES instead of parquet paths.
  *
  * Every `computeIfAbsent` build lambda of a per-(JVM, dir) value memo
  * calls [[miss]]; the bench snapshots [[misses]] around a query's
  * first repetition and treats a delta exactly like a staged-dir
  * delta: that rep paid a one-time build, so it is excluded from the
  * min-of-reps timing and the query's artifact row carries
  * `staged_rep1: true`. This closes the transparency gap where a rep-1
  * training pass was invisible to the bench's staging attribution
  * while min-of-reps silently reported the memoized rep 2. */
object Memo {
  private val builds = new java.util.concurrent.atomic.AtomicLong
  def miss(): Unit = { builds.incrementAndGet(); () }
  def misses: Long = builds.get
}
