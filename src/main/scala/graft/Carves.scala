package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * THE demo-carve vocabulary — the single definition of the id-modulus
 * predicates that split one corpus into deterministic "snapshots" for
 * every delta/merge/maintenance entry, plus the SQL spellings of the
 * same predicates for their DuckDB oracles.
 *
 * Why one module: the merge trilogy (`corpus_diff`, `corpus_merge`,
 * `corpus_merge_signals`), the signals/drift maintenance entries
 * (`quality_signals_delta`, `quality_drift`), and the dedup delta
 * family (`dedup_minhash_delta`/`_apply`/`_compact`) all tell one
 * merge story; before this module the carve constants lived in three
 * files and SIX oracles had to repeat them by hand — a real drift
 * channel (an oracle edited to `% 17` would silently gate the Spark
 * side against a different story). Here every modulus is defined
 * exactly once and both engines interpolate the same values.
 *
 * The story the constants encode, over a documents table (optionally
 * with near-dup plants appended at ids >= plantOffset):
 *  - OLD snapshot: originals minus every [[AddedMod]]-th doc (those
 *    become `added` in the new snapshot), with a stale
 *    [[LegacySuffix]] on every [[ChangedMod]]-th doc's text (those
 *    become `changed` after the recrawl).
 *  - NEW snapshot: everything except every [[RemovedMod]]-th original
 *    (those become `removed`).
 *  - Dedup delta split ([[deltaSplit]]): the planted recrawl copies
 *    plus every [[DeltaMod]]-th original form the NEW crawl, so both
 *    delta×base and delta×delta near-dup pairs occur.
 * The moduli are distinct primes so every verdict-arm intersection
 * (added∧removed, changed∧removed, …) is non-empty at the gated SFs.
 */
object Carves {

  /** Docs missing from OLD → `added` in the diff. */
  val AddedMod = 13
  /** Docs whose OLD text carries the stale suffix → `changed`. */
  val ChangedMod = 5
  /** Docs missing from NEW → `removed`. */
  val RemovedMod = 7
  /** Dedup delta split: every DeltaMod-th original rides the new crawl. */
  val DeltaMod = 11
  /** The stale-text marker on OLD's ChangedMod docs. */
  val LegacySuffix = " legacy"

  // ---- Spark columns ----

  /** Membership in the OLD snapshot (before any plant-offset bound). */
  def inOld(id: Column): Column = id % AddedMod =!= 0

  /** Membership in the NEW snapshot. */
  def inNew(id: Column): Column = id % RemovedMod =!= 0

  /** OLD-snapshot text: the stale suffix on every ChangedMod-th doc. */
  def oldText(id: Column, text: Column): Column =
    when(id % ChangedMod === 0, concat(text, lit(LegacySuffix))).otherwise(text)

  /** The new snapshot's delta (added ∪ changed), as pure id
    * predicates: in NEW, and either missing from OLD or stale there. */
  def isDelta(id: Column): Column =
    inNew(id) && (id % AddedMod === 0 || id % ChangedMod === 0)

  /** Dedup delta split over a planted corpus: all plants (ids >=
    * `plantOffset`) plus every DeltaMod-th original. */
  def deltaSplit(id: Column, plantOffset: Long): Column =
    id >= plantOffset || id % DeltaMod === 0

  // ---- the same predicates as DuckDB fragments ----

  def inOldSql(id: String): String = s"$id % $AddedMod <> 0"
  def inNewSql(id: String): String = s"$id % $RemovedMod <> 0"
  def droppedFromNewSql(id: String): String = s"$id % $RemovedMod = 0"
  def isAddedSql(id: String): String = s"$id % $AddedMod = 0"
  def isChangedSql(id: String): String = s"$id % $ChangedMod = 0"
  def oldTextSql(id: String, text: String): String =
    s"CASE WHEN $id % $ChangedMod = 0 THEN $text || '$LegacySuffix' ELSE $text END"
  def deltaSplitSql(id: String, plantOffset: Long): String =
    s"$id >= $plantOffset OR $id % $DeltaMod = 0"
}
