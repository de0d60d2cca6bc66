package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.query.PqSearch.PqIndex

/**
 * Auto-compacting PQ insert lifecycle — the IVF-PQ twin of
 * [[InsertLifecycle]], closing the gap where continuously-arriving
 * vectors were servable by the LSH delta path but not by the PQ
 * representation that is the actual 100 TB serving shape.
 *
 * The models (IVF centroids + per-subspace codebooks) are FROZEN at
 * construction: arrivals are encoded with them (FAISS `add()`
 * semantics — adding never refits; refitting is an offline decision
 * that re-encodes the corpus anyway). Because [[graft.query.PqSearch.encode]]
 * is a deterministic map of the row set, serving main ∪ staged-delta
 * is the SAME plan as serving one index over the union, and a
 * compaction is bit-identical to a fresh encode of the combined
 * corpus — the exact property [[graft.index.IndexMaintenance.compact]]
 * gives the LSH path, asserted in PqLifecycleSpec.
 *
 * All machinery (replay-safe staging, tombstones, the corpus-merge
 * diff feed, threshold compaction) lives tier-generically in
 * [[QuantLifecycle]]; this class is the [[PqTier]] instantiation —
 * [[SqLifecycle]] and [[BqLifecycle]] are its siblings.
 */
final class PqLifecycle(
    spark: SparkSession,
    initialData: DataFrame,
    initial: PqIndex,
    stagedRoot: String,
    compactEveryVectors: Long)
  extends QuantLifecycle[PqIndex](spark, initialData, initial,
    new PqTier(spark, initial.cents, initial.cb), stagedRoot, compactEveryVectors)
