package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/**
 * `corpus_merge`: the ONE-CALL snapshot merge — the composition a
 * pipeline owner actually runs when a recrawl lands. Round 9 built
 * the incremental pieces separately ([[CorpusDiff]] classifies by
 * digest, [[Dedup.minhashPairsDelta]] near-dedups the delta against
 * the resident signature table, [[SignalsMaintenance]] carries
 * signal rows for unchanged docs); this entry chains them into one
 * per-document MERGE VERDICT:
 *
 *   - `removed`        — in the old snapshot only (index-deletion feed)
 *   - `carried`        — digest-unchanged; resident rows (signals,
 *                        signatures) ride, the doc pays NOTHING
 *   - `dup_of_base`    — new/changed doc that near-matches a resident
 *                        doc (base wins — the batch analogue of
 *                        [[graft.streaming.StreamingNearDup]]'s
 *                        arrival gate)
 *   - `dup_in_delta`   — near-matches another doc inside the crawl;
 *                        lowest id wins ([[Dedup.dedupMinhashDeltaApply]]'s
 *                        pairwise-greedy keeper)
 *   - `admitted_added` / `admitted_changed` — enters the corpus; the
 *                        signals delta scores it, the compact step
 *                        folds its signature into the resident table
 *
 * Base-claim precedence: a delta doc dropped by BOTH legs reports
 * `dup_of_base` (the resident claim is the stronger fact — it means
 * the content already exists in the served corpus).
 *
 * Scale posture: the diff moves 16-byte digests; the dedup gate signs
 * ONLY the delta and probes the resident signature table (delta-sized
 * band probe against a corpus-sized build side); verdict assembly is
 * id-only joins. Total text work = one map pass over the crawl plus
 * exact-verify on candidate pairs — the base corpus is never re-read.
 * The decontamination rung composes downstream the same way (admitted
 * docs vs the resident Bloom bitset, a map-only verdict —
 * [[graft.streaming.StreamingIntake]] already runs that composition);
 * it keeps its own entry because its bitset fixture tells a separate
 * plant story.
 *
 * Demo carve (both engines replay it from the planted corpus of
 * [[Dedup.withPlantedNearDups]], so every verdict arm is exercised):
 * OLD = originals minus `id % 13 == 0` (→ `added`), with a stale
 * ` legacy` suffix on `id % 5 == 0` (→ `changed`); NEW = everything
 * except originals with `id % 7 == 0` (→ `removed`). The planted
 * copies are all new: a copy whose original is resident drops as
 * `dup_of_base`, a copy whose original is itself new drops as
 * `dup_in_delta` (lower id — the original — wins), and a copy whose
 * original was REMOVED is admitted: the recrawl legitimately
 * re-introduces content the old corpus lost.
 */
object CorpusMerge {

  /** Old-snapshot carve over the planted corpus (constants from
    * [[graft.Carves]] — the one carve vocabulary). */
  private[graft] def carveOld(corpus: DataFrame): DataFrame =
    corpus.filter(col("doc_id") < Dedup.PlantOffset &&
        graft.Carves.inOld(col("doc_id")))
      .select(col("doc_id"),
        graft.Carves.oldText(col("doc_id"), col("text")).as("text"))

  /** New-snapshot carve: all copies + originals except the removed
    * modulus. */
  private[graft] def carveNew(corpus: DataFrame): DataFrame =
    corpus.filter(col("doc_id") >= Dedup.PlantOffset ||
      graft.Carves.inNew(col("doc_id")))

  /**
   * The merge verdict given the new snapshot, the resident signature
   * table, and the (doc_id, status) digest diff. The diff feeds FOUR
   * legs (resident semi-join, delta carve, drop-side orientation,
   * final verdict join) — the entry STAGES it as the `corpus_diff`
   * audit parquet first (a real merge writes that table anyway —
   * [[SignalsMaintenance.qualitySignalsDelta]]'s rule), so each leg
   * is a small-table scan and the md5 text passes run exactly once.
   * Leaving the diff in-plan instead re-evaluates the digest subtree
   * inside the band chain (measured ~2.5× the whole entry at sf0.1).
   */
  def mergeVerdictsFromDiff(newSnap: DataFrame, residentSigs: DataFrame,
      diff: DataFrame): DataFrame = {
    val deltaIds = diff.filter(col("status").isin("added", "changed"))
      .select(col("doc_id"))
    // resident rows for docs still unchanged — stale signatures of
    // `changed` docs must NOT probe (the delta re-signs them)
    val baseSigs = residentSigs
      .join(diff.filter(col("status") === "unchanged")
        .select(col("doc_id").as("id")), Seq("id"), "left_semi")
      .select(col("id"), col("sig"))
    val deltaDocs = newSnap.join(deltaIds, Seq("doc_id"), "left_semi")
    val pairs = Dedup.minhashPairsDelta(baseSigs, deltaDocs, newSnap,
      "doc_id", "text")
    // delta_base: drop the delta side (exactly one side is delta)
    val dropsBase = pairs.filter(col("leg") === "delta_base")
      .join(deltaIds.select(col("doc_id").as("a"), lit(1).as("da")),
        Seq("a"), "left")
      .select(when(col("da").isNotNull, col("a")).otherwise(col("b"))
        .as("doc_id"))
      .distinct()
    // delta_delta: pairs arrive oriented a < b — drop b, keep the keeper
    val dropsDelta = pairs.filter(col("leg") === "delta_delta")
      .select(col("b").as("doc_id")).distinct()
    diff
      .join(dropsBase.withColumn("dob", lit(1)), Seq("doc_id"), "left")
      .join(dropsDelta.withColumn("did", lit(1)), Seq("doc_id"), "left")
      .select(col("doc_id"), col("status"),
        when(col("status") === "removed", "removed")
          .when(col("status") === "unchanged", "carried")
          .when(col("dob").isNotNull, "dup_of_base")
          .when(col("did").isNotNull, "dup_in_delta")
          .otherwise(concat(lit("admitted_"), col("status"))).as("verdict"))
  }

  /** In-plan form (the scale ramp's and spec's handle): diff stays a
    * subtree, resident signatures signed in-plan — measures how the
    * merge SCALES without hiding the base behind fixtures. */
  def corpusMergeOn(docs: DataFrame): DataFrame = {
    val corpus = Dedup.withPlantedNearDups(docs, 25, mutate = true)
    mergeVerdictsFromDiff(carveNew(corpus),
      Dedup.minhashSignatures(graft.index.LshIndex.spread(corpus),
        "doc_id", "text", numPerms = 64, shingleWidth = 3),
      CorpusDiff.corpusDiff(carveOld(corpus), carveNew(corpus)))
  }

  /** The entry: planted corpus, resident signatures from the shared
    * fixture export (the SAME fresh-signing ground truth the other
    * minhash entries anchor on — the resident table premise), diff
    * staged per invocation as the audit table a real merge writes
    * anyway (mode overwrite — bench reps time the diff write too,
    * the curateMaterialized honesty rule). */
  def corpusMergeQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = Dedup.withPlantedNearDups(
      Tables.documents(spark, sfDir), 25, mutate = true)
    Dedup.exportFixture(s"minhash:$sfDir", Dedup.MinhashSigExportPath) {
      Dedup.minhashSignatures(graft.index.LshIndex.spread(corpus),
        "doc_id", "text", numPerms = 64, shingleWidth = 3)
    }
    val diffPath = graft.FixturePaths.stage("corpus_merge_diff_" +
      sfDir.replaceAll("[^A-Za-z0-9.]+", "_"))
    CorpusDiff.corpusDiff(carveOld(corpus), carveNew(corpus))
      .write.mode("overwrite").parquet(diffPath)
    mergeVerdictsFromDiff(carveNew(corpus),
      spark.read.parquet(Dedup.MinhashSigExportPath),
      spark.read.parquet(diffPath))
  }

  /** The merge chain as shared CTEs through `verdicts`, so the
    * verdict entry and the post-merge signals entry replay ONE chain
    * and cannot drift (the funnel-CTE discipline). Shares the planted
    * corpus CTE and band constants (16 bands of 4 slots, maxBucket
    * 1000, threshold 0.5) with the other minhash oracles. */
  private[graft] val mergeChainCtes: String = {
    val off = Dedup.PlantOffset
    s"""${Dedup.mutatedCorpusSql(25)},
       |o AS (
       |  SELECT doc_id,
       |    md5(${graft.Carves.oldTextSql("doc_id", "text")}) AS fp_old
       |  FROM corpus WHERE doc_id < $off AND ${graft.Carves.inOldSql("doc_id")}),
       |n AS (
       |  SELECT doc_id, md5(text) AS fp_new FROM corpus
       |  WHERE NOT (doc_id < $off AND ${graft.Carves.droppedFromNewSql("doc_id")})),
       |diff AS (
       |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       |    CASE WHEN o.fp_old IS NULL THEN 'added'
       |         WHEN n.fp_new IS NULL THEN 'removed'
       |         WHEN o.fp_old <> n.fp_new THEN 'changed'
       |         ELSE 'unchanged' END AS status
       |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id),
       |d AS (SELECT doc_id AS id FROM diff WHERE status IN ('added', 'changed')),
       |probe AS (SELECT doc_id AS id FROM diff WHERE status <> 'removed'),
       |sigs AS (
       |  SELECT id, sig FROM read_parquet('${Dedup.MinhashSigExportPath}/*.parquet')
       |  WHERE id IN (SELECT id FROM probe)),
       |bands AS (
       |  SELECT id, t.band AS band, sig[t.band*4+1:t.band*4+4] AS bh
       |  FROM sigs, generate_series(0, 15) t(band)),
       |guarded AS (
       |  SELECT id, band, bh FROM bands
       |  QUALIFY COUNT(*) OVER (PARTITION BY band, bh) <= 1000),
       |cands AS (
       |  SELECT DISTINCT x.id AS a, y.id AS b
       |  FROM guarded x JOIN guarded y
       |    ON x.band = y.band AND x.bh = y.bh AND x.id < y.id
       |  WHERE x.id IN (SELECT id FROM d) OR y.id IN (SELECT id FROM d)),
       |tok AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM corpus),
       |sets AS (SELECT doc_id, ${Dedup.shingleSetSql} AS sh FROM tok),
       |verify AS (
       |  SELECT c.a, c.b,
       |    CAST(len(list_intersect(xa.sh, xb.sh)) AS DOUBLE) /
       |      len(list_distinct(list_concat(xa.sh, xb.sh))) AS j
       |  FROM cands c
       |  JOIN sets xa ON xa.doc_id = c.a
       |  JOIN sets xb ON xb.doc_id = c.b),
       |pairs AS (
       |  SELECT a, b,
       |    CASE WHEN a IN (SELECT id FROM d) AND b IN (SELECT id FROM d)
       |         THEN 'delta_delta' ELSE 'delta_base' END AS leg
       |  FROM verify WHERE j >= 0.5),
       |drops_base AS (
       |  SELECT DISTINCT CASE WHEN a IN (SELECT id FROM d) THEN a ELSE b END AS doc_id
       |  FROM pairs WHERE leg = 'delta_base'),
       |drops_delta AS (
       |  SELECT DISTINCT b AS doc_id FROM pairs WHERE leg = 'delta_delta'),
       |verdicts AS (
       |  SELECT doc_id, status,
       |    CASE WHEN status = 'removed' THEN 'removed'
       |         WHEN status = 'unchanged' THEN 'carried'
       |         WHEN doc_id IN (SELECT doc_id FROM drops_base) THEN 'dup_of_base'
       |         WHEN doc_id IN (SELECT doc_id FROM drops_delta) THEN 'dup_in_delta'
       |         ELSE 'admitted_' || status END AS verdict
       |  FROM diff)""".stripMargin
  }

  /** Full SQL replay: carves + digest diff + the delta band chain off
    * the signature fixture + the verdict ladder. */
  val corpusMergeSql: String =
    s"""WITH $mergeChainCtes
       |SELECT doc_id, status, verdict FROM verdicts""".stripMargin

  // ---- the post-merge resident state: signals maintenance ----

  /** Staged-verdicts path (the production premise: `corpus_merge`
    * already ran and persisted its verdict table). */
  private def verdictsPath(sfDir: String): String =
    graft.FixturePaths.stage("corpus_merge_verdicts_" +
      sfDir.replaceAll("[^A-Za-z0-9.]+", "_"))

  private def signalsBasePath(sfDir: String): String =
    graft.FixturePaths.stage("qsignals_mergebase_" +
      sfDir.replaceAll("[^A-Za-z0-9.]+", "_"))

  /**
   * `corpus_merge_signals`: the signals table AFTER the merge — the
   * step that makes the merge verdict actionable for quality tooling.
   * `carried` docs ride their resident signal rows (equal digests mean
   * equal text), ADMITTED docs pay the one signal-extraction pass,
   * dup-dropped and removed docs get no row: the post-merge signals
   * table covers exactly the corpus being served. Completes the merge
   * trilogy next to [[Dedup.dedupMinhashCompact]] (signatures) and
   * the verdict entry itself.
   *
   * Scale posture: the timed plan is two id semi-joins + a
   * DELTA-SIZED signals pass + a union — the resident signals table
   * and the verdict table are staged once per JVM per corpus
   * ([[graft.FixtureExport]]; in production both are warehouse tables
   * the upstream steps already wrote). The base corpus text is never
   * re-read.
   *
   * Correctness: the oracle recomputes the FULL signals table over
   * exactly the kept docs — carried ∪ admitted per the SHARED merge
   * chain CTEs — so the bit-strict gate checks
   * `carry ∪ delta-score == full recompute on the merged corpus`,
   * the same invariant shape as `quality_signals_delta` but with the
   * dedup gate's drops inside it.
   */
  def corpusMergeSignalsQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = Dedup.withPlantedNearDups(
      Tables.documents(spark, sfDir), 25, mutate = true)
    graft.FixtureExport.ensure(s"mergeverdicts:$sfDir", verdictsPath(sfDir)) {
      corpusMergeQuery(spark, sfDir)
        .write.mode("overwrite").parquet(verdictsPath(sfDir))
    }
    graft.FixtureExport.ensure(s"qsignals_merge:$sfDir", signalsBasePath(sfDir)) {
      graft.text.TextAnalysis.qualitySignalsOn(carveOld(corpus))
        .write.mode("overwrite").parquet(signalsBasePath(sfDir))
    }
    val verdicts = spark.read.parquet(verdictsPath(sfDir))
    val resident = spark.read.parquet(signalsBasePath(sfDir))
    val carried = verdicts.filter(col("verdict") === "carried").select("doc_id")
    val admitted = verdicts.filter(col("verdict").startsWith("admitted"))
      .select("doc_id")
    resident.join(carried, Seq("doc_id"), "left_semi")
      .unionByName(graft.text.TextAnalysis.qualitySignalsOn(
        carveNew(corpus).join(admitted, Seq("doc_id"), "left_semi")))
  }

  /** Full recompute over the kept docs via the shared merge chain —
    * the nested WITH rides inside the signals oracle's source clause. */
  val corpusMergeSignalsSql: String =
    graft.text.TextAnalysis.qualitySignalsSqlFrom(
      s"""(WITH $mergeChainCtes,
         |kept AS (
         |  SELECT doc_id FROM verdicts
         |  WHERE verdict = 'carried' OR verdict LIKE 'admitted_%')
         |SELECT c.doc_id, c.text FROM corpus c JOIN kept USING (doc_id)) mk""".stripMargin)
}
