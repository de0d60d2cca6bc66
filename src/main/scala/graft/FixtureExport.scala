package graft

/**
 * One-per-JVM write guard for DuckDB oracle fixtures (fitted models,
 * signatures, centroids exported so the oracle SQL can replay a
 * driver-side fit).
 *
 * Fixture paths are fixed WITHIN a JVM (run-scoped via
 * [[FixturePaths]] — concurrent processes never share them) and the
 * oracle SQL strings embed them, so two corpus dirs processed in one
 * JVM share each path last-writer-wins. The guard therefore keys on
 * WHAT the path
 * currently holds, not on which corpus already exported once: a
 * request with a different key (corpus dir, dim, config) re-exports,
 * and a repeat of the current key skips the write (bench reps must
 * time the plan, not the fixture write). This closes the stale-
 * fixture hazard where dir A's fixture was replaced by dir B's while
 * A's per-corpus guard suppressed the re-export — with this guard a
 * Verify + oracle check running back-to-back on ANY corpus always
 * reads fixtures fitted on that corpus.
 */
object FixtureExport {
  // path -> the key whose export currently sits at that path
  private val current = scala.collection.mutable.Map.empty[String, String]
  // ONE MONITOR PER PATH: a corpus-scale chain running inside ensure
  // (e.g. dedup's staged pair report, which wraps the whole delta
  // chain) blocks only same-path callers, never unrelated fixture
  // exports on other threads (the r11 ADVICE global-monitor hazard).
  // REENTRANCY CONTRACT (load-bearing — do not replace these monitors
  // with non-reentrant locks): `write` MAY call ensure itself.
  //  - different path → different monitor, no interaction;
  //  - SAME path (the staged-pair-report shape: the outer ensure's
  //    chain re-enters ensure with the same key) → same JVM monitor,
  //    reentrant by definition; the inner call still sees the key
  //    unrecorded and performs the real write, the outer then records
  //    the key a second time — so same-path nested writes must be
  //    idempotent (they are: mode("overwrite") parquet writes).
  private val locks = scala.collection.mutable.Map.empty[String, Object]
  private def lockFor(path: String): Object =
    locks.synchronized(locks.getOrElseUpdate(path, new Object))

  def ensure(key: String, path: String)(write: => Unit): Unit =
    lockFor(path).synchronized {
      if (!current.synchronized(current.get(path).contains(key))) {
        write
        current.synchronized { current(path) = key }
      }
    }
}
