package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * `pack_efficiency`: the packing-waste report — for one corpus and one
 * sequence budget, how many training sequences does each packing
 * strategy emit, and how much of the token grid is padding? This is
 * the number that prices a packing decision at 100 TB: padding share
 * IS wasted accelerator hours, and document splitting IS truncated
 * attention context, so the choice between them should come from a
 * table, not a guess (the same knob-table posture as
 * `dedup_minhash_tune` / `ann_tier_report`).
 *
 * Three strategies over identical inputs:
 *  - `concat_chunk` — [[Corpus.seqPack]]'s production semantics: token
 *    streams laid end to end, a cut every `budget` tokens. ZERO
 *    padding except the final partial sequence per stratum — but docs
 *    straddle cuts (`n_split_docs`), which costs attention context.
 *  - `greedy_docwise` — document-preserving greedy fill in doc_id
 *    order: a doc that doesn't fit closes the sequence and opens the
 *    next. No splits; padding = budget minus each closed fill.
 *  - `greedy_sorted` — the same NEXT-FIT fold over docs ordered
 *    length-DESCENDING: a doc that doesn't fit still closes the
 *    current sequence forever. Sorting shrinks boundary waste a
 *    little, but this is NOT the classic sorted packer — next-fit
 *    never reopens a bin, so its pad_share is a loose upper bound on
 *    what a real packer ships.
 *  - `ffd_bounded` — first-fit-DECREASING with a bounded open-bin
 *    list (the classic production packer, 11/9·OPT+6/9 bound in the
 *    unbounded limit): each doc goes to the LOWEST-indexed open bin
 *    with room; when none fits, the FULLEST open bin is closed (it is
 *    the least likely to take any later doc under a descending order)
 *    and a fresh bin takes the doc. [[FfdOpenBins]] bins bound the
 *    fold state, the spill-to-closed rule bounds memory exactly like
 *    a streaming packer's.
 *
 * Docs longer than the budget (`n_overlong`) are excluded from the
 * document-preserving strategies and reported — a real pipeline runs
 * [[Chunking]] over them first; silently truncating them here would
 * fake the padding number.
 *
 * Scale posture: one map-only sizing pass (token counts off
 * length arithmetic, no token arrays), then per-strategy aggregates.
 * The greedy fold is inherently sequential, so it runs EXACTLY GREEDY
 * inside each (stratum × doc_id-range-bucket) shard — the corpus
 * layout's two-level discipline ([[Corpus.seqPack]]'s bucketing, a
 * FIXED 32-bucket engine-portable carve here): each shard folds its
 * own bounded doc list (the `*_window_rows` bound in SCALE_r09), at
 * the cost of at most one partially-filled sequence per shard —
 * amortized to nothing at corpus scale, and exactly what a
 * distributed packer does (each output shard packs independently).
 * The fold state rides ONE long (`packs * 1e6 + fill`), so the whole
 * strategy is collect_list + one codegen'd `aggregate` per shard —
 * no UDF, no driver loop.
 *
 * Cross-engine: the fold replays in DuckDB as `list_reduce` over the
 * same encoded-long arithmetic; bucket bounds use the equal-width
 * double arithmetic both engines evaluate identically; shares are
 * FLOORed to 4dp.
 */
object Packing {

  /** Sequence budget for the report entry — sized to the synthetic
    * corpus (docs are 10-99 whitespace tokens) so packs hold ~2 docs
    * and the strategies genuinely diverge; a real pretraining run
    * passes its context length. */
  val PackBudget = 128L

  /** Fixed shard count for the greedy strategies (engine-portable,
    * unlike defaultParallelism). */
  val PackBuckets = 32

  private val StateMult = 1000000L

  /** The greedy fold over an ordered length array: state = packs *
    * [[StateMult]] + fill, seeded with fill == budget so the first doc
    * opens sequence 1. */
  private def greedyPacks(lens: Column, budget: Long): Column =
    floor(aggregate(lens, lit(budget),
      (acc, x) => when(acc % StateMult + x <= budget, acc + x)
        .otherwise(acc - (acc % StateMult) + StateMult + x)) / StateMult)
      .cast("long")

  // ---- bounded first-fit-decreasing ----

  /** Open bins the FFD fold keeps live. The whole state bit-packs into
    * ONE long — 8 bits of fill per open bin (so `budget` must stay <=
    * 255; widen the slots before raising [[PackBudget]] past that) +
    * the closed-bin count above [[FfdClosedShift]] — which is what
    * lets DuckDB's `list_reduce` replay the fold as the IDENTICAL
    * scalar arithmetic (its lambda accumulator drops list-valued
    * fields, the r9 seq_pack_greedy lesson; a scalar long has nothing
    * to drop). */
  val FfdOpenBins = 6
  private val FfdClosedShift = 8 * FfdOpenBins

  private def ffdSlot(acc: Column, i: Int): Column =
    shiftrightunsigned(acc, 8 * i).bitwiseAND(lit(255L))

  /** One FFD step: first-fit into the lowest open bin with room; on no
    * fit, close the FULLEST bin (first index on ties — both engines
    * take the first max) and restart it with `x`. */
  private def ffdStep(acc: Column, x: Column, budget: Long): Column = {
    val maxFill = greatest((0 until FfdOpenBins).map(ffdSlot(acc, _)): _*)
    // eviction chain: the first slot holding the max fill
    val evict = (0 until FfdOpenBins).foldRight(lit(0L)) { (i, rest) =>
      val closed = acc + shiftleft(lit(1L), FfdClosedShift) -
        shiftleft(ffdSlot(acc, i), 8 * i) + shiftleft(x, 8 * i)
      if (i == FfdOpenBins - 1) closed // last slot: unconditionally the max
      else when(ffdSlot(acc, i) === maxFill, closed).otherwise(rest)
    }
    (0 until FfdOpenBins).foldRight(evict) { (i, rest) =>
      when(ffdSlot(acc, i) + x <= budget,
        acc + shiftleft(x, 8 * i)).otherwise(rest)
    }
  }

  /** Closed-bin counter width: bits [[FfdClosedShift]]..62 of the
    * signed state long — a shard closing 2^15 bins would overflow into
    * the sign bit and corrupt the count SILENTLY (both engines replay
    * the identical arithmetic, so the oracle could not catch it). Each
    * doc closes at most one bin, so guarding the shard's DOC count
    * guards the counter; a shard that large means the bucket count
    * stopped scaling with the corpus ([[graft.ScaleRamp]] scales it). */
  private val FfdMaxShardDocs = 1 << 15

  /** Pack count of the bounded-FFD fold over an ordered length array:
    * closed bins + still-open nonempty bins. Raises loudly on a shard
    * big enough to overflow the closed-bin counter (see
    * [[FfdMaxShardDocs]]). */
  private def ffdPacks(lens: Column, budget: Long): Column = {
    require(budget <= 255, s"FFD slot width is 8 bits; budget $budget > 255")
    val guarded = when(size(lens) < FfdMaxShardDocs, lens)
      .otherwise(raise_error(concat(
        lit(s"FFD closed-bin counter is 15 bits; shard of "), size(lens).cast("string"),
        lit(s" docs can overflow it - scale the bucket count with the corpus"))))
    aggregate(guarded, lit(0L),
      (acc, x) => ffdStep(acc, x, budget),
      acc => shiftrightunsigned(acc, FfdClosedShift) +
        (0 until FfdOpenBins).map(i =>
          when(ffdSlot(acc, i) > 0, 1L).otherwise(0L)).reduce(_ + _))
  }

  /** One report row per strategy. `docs` needs (doc_id, stratum, text). */
  def packEfficiency(docs: DataFrame, stratumCol: String,
      budget: Long = PackBudget): DataFrame = {
    val sized = docs.select(col("doc_id"), col(stratumCol).as("stratum"),
      Corpus.nTokens(col("text")).as("n"))

    // ---- concat_chunk: per-stratum ceil + boundary-straddle count ----
    val concatStats = sized
      .groupBy("stratum")
      .agg(sum("n").as("tok"))
      .agg(sum(ceil(col("tok").cast("double") / budget).cast("long")).as("n_seqs"),
        sum("tok").as("packed_tokens"))
    // straddlers off the PRODUCTION packer's bucketed numbering
    // (pack_offset == cum_before % budget, Corpus.seqPack scaladoc);
    // the oracle replays the windowed twin, which equals it
    val splits = Corpus.seqPack(docs, stratumCol, budget.toInt)
      .filter(col("pack_offset") + col("n_tokens") > budget)
      .agg(count(lit(1)).as("n_split"))
    val concatRow = concatStats.crossJoin(splits)
      .select(lit("concat_chunk").as("strategy"), col("n_seqs"),
        col("packed_tokens"), col("n_split").as("n_split_docs"),
        lit(0L).as("n_overlong"))

    // ---- document-preserving greedy strategies ----
    val overlong = sized.filter(col("n") > budget)
      .agg(count(lit(1)).as("n_overlong"))
    val kept = sized.filter(col("n") <= budget)
    val sharded = Corpus.withRangeBucketWidth(kept, "stratum", PackBuckets)

    def greedyRow(name: String, ordered: Column,
        packsOf: Column => Column = greedyPacks(_, budget)): DataFrame =
      sharded.groupBy("stratum", "bkt")
        .agg(transform(ordered, s => s.getField("n")).as("lens"),
          sum("n").as("tok"))
        .select(packsOf(col("lens")).as("packs"), col("tok"))
        .agg(sum("packs").as("n_seqs"), sum("tok").as("packed_tokens"))
        .crossJoin(overlong)
        .select(lit(name).as("strategy"), col("n_seqs"),
          col("packed_tokens"), lit(0L).as("n_split_docs"), col("n_overlong"))

    // doc_id order: struct sorts lexicographically on (doc_id, n)
    val byDoc = sort_array(collect_list(struct(col("doc_id"), col("n"))))
    // length-descending: leading -n makes the lexicographic sort
    // descend on length, doc_id breaks ties deterministically
    val byLenDesc = sort_array(collect_list(
      struct((-col("n")).as("negn"), col("doc_id"), col("n"))))

    concatRow
      .unionByName(greedyRow("greedy_docwise", byDoc))
      .unionByName(greedyRow("greedy_sorted", byLenDesc))
      .unionByName(greedyRow("ffd_bounded", byLenDesc, ffdPacks(_, budget)))
      .select(col("strategy"), col("n_seqs"), col("packed_tokens"),
        (col("n_seqs") * budget - col("packed_tokens")).as("pad_tokens"),
        (floor((col("n_seqs") * budget - col("packed_tokens")).cast("double") /
          (col("n_seqs") * budget).cast("double") * 10000) / 10000).as("pad_share"),
        col("n_split_docs"), col("n_overlong"))
  }

  def packEfficiencyQuery(spark: SparkSession, sfDir: String): DataFrame =
    packEfficiency(Tables.documents(spark, sfDir), "lang")

  // ---- the greedy ASSIGNMENT: executing the chosen strategy ----

  /**
   * `seq_pack_greedy`: per-document pack assignment under
   * DOCUMENT-PRESERVING greedy fill — the operator a pipeline runs
   * after [[packEfficiency]]'s knob table says splitting documents is
   * unacceptable ([[Corpus.seqPack]] is the concat-chunk assignment;
   * this is its greedy sibling). Docs are packed in doc_id order —
   * the order [[Corpus.corpusShuffle]]/`curriculum_order` established
   * upstream, which is exactly why the doc-order variant (and not the
   * length-sorted one) is the assignment operator: sorting here would
   * undo the curriculum.
   *
   * Scale posture: exactly greedy inside each (stratum ×
   * fixed-32-range-bucket) shard; global pack ids = shard-local ids +
   * a broadcast prefix-sum base over the tiny shard table (the
   * [[Corpus.seqPack]] offsets discipline). The per-shard fold builds
   * the assignment array with one `aggregate` — appends cost
   * O(shard²) element copies, so `buckets` MUST scale with the corpus
   * (keep shards at a few hundred docs; the entry fixes 32 only so
   * the oracle replays one carve at gate SFs — the ramp row scales
   * buckets ∝ corpus and stays linear, SCALE_r09). Docs longer
   * than the budget are EXCLUDED (run [[Chunking]] first — silently
   * truncating would corrupt the packs).
   *
   * Cross-engine: the oracle replays the identical recurrence as a
   * recursive CTE stepping one doc per shard per iteration (bounded
   * by the max shard size) — DuckDB's `list_reduce` drops list-valued
   * accumulator fields, so the fold itself cannot be mirrored, but
   * the RECURRENCE can, which is what the hash gate actually needs.
   */
  def seqPackGreedy(docs: DataFrame, stratumCol: String,
      budget: Long = PackBudget, buckets: Int = PackBuckets): DataFrame = {
    val sized = docs.select(col("doc_id"), col(stratumCol).as("stratum"),
      Corpus.nTokens(col("text")).as("n"))
      .filter(col("n") <= budget)
    val sharded = Corpus.withRangeBucketWidth(sized, "stratum", buckets)
    val emptyA = expr(
      "CAST(array() AS array<struct<d:bigint,pk:bigint,off:bigint>>)")
    val folded = sharded.groupBy("stratum", "bkt")
      .agg(sort_array(collect_list(struct(col("doc_id").as("d"),
        col("n").as("n")))).as("docs"))
      .select(col("stratum"), col("bkt"),
        aggregate(col("docs"),
          struct(emptyA.as("a"), lit(-1L).as("p"), lit(budget).as("f")),
          (acc, x) => {
            val fits = acc.getField("f") + x.getField("n") <= budget
            val pk = when(fits, acc.getField("p"))
              .otherwise(acc.getField("p") + 1)
            val off = when(fits, acc.getField("f")).otherwise(lit(0L))
            struct(
              concat(acc.getField("a"),
                array(struct(x.getField("d").as("d"), pk.as("pk"),
                  off.as("off")))).as("a"),
              pk.as("p"),
              (off + x.getField("n")).as("f"))
          }).as("st"))
      .select(col("stratum"), col("bkt"),
        col("st.a").as("assigns"),
        (col("st.p") + 1).as("n_packs"))
    // tiny shard table -> global pack bases (single-partition window
    // over strata x 32 rows, the corpusShuffle offsets discipline)
    val wBase = org.apache.spark.sql.expressions.Window
      .orderBy("stratum", "bkt")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    folded
      .withColumn("base", coalesce(sum("n_packs").over(wBase), lit(0L)))
      .select(col("stratum"), col("base"), explode(col("assigns")).as("x"))
      .select(col("x.d").as("doc_id"), col("stratum"),
        (col("base") + col("x.pk")).as("pack_id"),
        col("x.off").as("pack_offset"))
  }

  def seqPackGreedyQuery(spark: SparkSession, sfDir: String): DataFrame =
    seqPackGreedy(Tables.documents(spark, sfDir), "lang")

  /**
   * `seq_pack_ffd`: the per-document pack ASSIGNMENT under bounded
   * first-fit-decreasing — the operator a pipeline runs after
   * [[packEfficiency]]'s knob table shows `ffd_bounded` winning the
   * padding column (it does, at every gated SF): [[seqPackGreedy]]
   * preserves curriculum order at next-fit waste; this spends the
   * order (length-descending inside each shard) to buy the FFD
   * packing bound. Same shard carve, same global-id discipline.
   *
   * The fold carries (assignment list, [[FfdOpenBins]] bin fills, the
   * bins' pack ids, next-pack counter) as a struct; a doc goes to the
   * LOWEST-indexed open bin with room (an empty slot always fits —
   * eviction only happens with all bins live and none fitting), a new
   * bin takes the next shard-local pack id, eviction closes the
   * FULLEST bin (first index on ties — the [[ffdStep]] rule, so the
   * pack COUNT reconciles with the knob table's `ffd_bounded` row
   * exactly, spec-asserted). The oracle replays the identical
   * recurrence as a recursive CTE stepping one doc per shard per
   * iteration with the fills/ids as scalar state columns (the
   * [[seqPackGreedySql]] pattern — list-valued `list_reduce`
   * accumulators don't survive DuckDB, scalar columns do).
   */
  def seqPackFfd(docs: DataFrame, stratumCol: String,
      budget: Long = PackBudget, buckets: Int = PackBuckets): DataFrame = {
    require(budget <= 255, s"FFD slot width is 8 bits; budget $budget > 255")
    val sized = docs.select(col("doc_id"), col(stratumCol).as("stratum"),
      Corpus.nTokens(col("text")).as("n"))
      .filter(col("n") <= budget)
    val sharded = Corpus.withRangeBucketWidth(sized, "stratum", buckets)
    val emptyA = expr(
      "CAST(array() AS array<struct<d:bigint,pk:bigint,off:bigint>>)")
    val zeroF = array((0 until FfdOpenBins).map(_ => lit(0L)): _*)
    val init = struct(emptyA.as("a"), zeroF.as("f"), zeroF.as("pid"),
      lit(0L).as("nx"))
    def step(acc: Column, x: Column): Column = {
      val n = x.getField("n"); val d = x.getField("d")
      val f = acc.getField("f"); val pid = acc.getField("pid")
      val nx = acc.getField("nx")
      def fi(i: Int) = element_at(f, i + 1)
      // first-fit index, -1 = no fit (eviction)
      val fitIdx = (0 until FfdOpenBins).foldRight(lit(-1)) { (i, rest) =>
        when(fi(i) + n <= budget, lit(i)).otherwise(rest)
      }
      val maxFill = greatest((0 until FfdOpenBins).map(fi): _*)
      val evictIdx = (0 until FfdOpenBins - 1).foldRight(
        lit(FfdOpenBins - 1)) { (i, rest) =>
        when(fi(i) === maxFill, lit(i)).otherwise(rest)
      }
      val idx = when(fitIdx >= 0, fitIdx).otherwise(evictIdx)
      // a new pack opens on eviction or on a never-used (fill 0) slot
      val opens = fitIdx < 0 || element_at(f, idx + 1) === 0L
      val pk = when(opens, nx).otherwise(element_at(pid, idx + 1))
      val off = when(fitIdx < 0, lit(0L)).otherwise(element_at(f, idx + 1))
      struct(
        concat(acc.getField("a"),
          array(struct(d.as("d"), pk.as("pk"), off.as("off")))).as("a"),
        transform(f, (v, j) =>
          when(j === idx, when(fitIdx < 0, n).otherwise(v + n))
            .otherwise(v)).as("f"),
        transform(pid, (v, j) => when(j === idx, pk).otherwise(v)).as("pid"),
        when(opens, nx + 1).otherwise(nx).as("nx"))
    }
    val folded = sharded.groupBy("stratum", "bkt")
      .agg(sort_array(collect_list(struct((-col("n")).as("negn"),
        col("doc_id").as("d"), col("n").as("n")))).as("docs"))
      .select(col("stratum"), col("bkt"),
        aggregate(col("docs"), init, step).as("st"))
      .select(col("stratum"), col("bkt"),
        col("st.a").as("assigns"), col("st.nx").as("n_packs"))
    val wBase = org.apache.spark.sql.expressions.Window
      .orderBy("stratum", "bkt")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    folded
      .withColumn("base", coalesce(sum("n_packs").over(wBase), lit(0L)))
      .select(col("stratum"), col("base"), explode(col("assigns")).as("x"))
      .select(col("x.d").as("doc_id"), col("stratum"),
        (col("base") + col("x.pk")).as("pack_id"),
        col("x.off").as("pack_offset"))
  }

  def seqPackFfdQuery(spark: SparkSession, sfDir: String): DataFrame =
    seqPackFfd(Tables.documents(spark, sfDir), "lang")

  val seqPackGreedySql: String = {
    val b = PackBudget
    s"""WITH RECURSIVE sized AS (
       |  SELECT doc_id, lang AS stratum,
       |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n
       |  FROM documents
       |  WHERE length(text) - length(replace(text, ' ', '')) + 1 <= $b),
       |bounds AS (
       |  SELECT stratum AS _sk, MIN(doc_id) AS _lo, MAX(doc_id) AS _hi
       |  FROM sized GROUP BY stratum),
       |sharded AS (
       |  SELECT k.doc_id, k.stratum, k.n,
       |    CAST(LEAST(FLOOR((CAST(k.doc_id AS DOUBLE) - CAST(b._lo AS DOUBLE))
       |        * $PackBuckets /
       |        (CAST(b._hi AS DOUBLE) - CAST(b._lo AS DOUBLE) + 1.0)),
       |      ${PackBuckets - 1}) AS INTEGER) AS bkt,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY k.stratum,
       |        CAST(LEAST(FLOOR((CAST(k.doc_id AS DOUBLE) - CAST(b._lo AS DOUBLE))
       |            * $PackBuckets /
       |            (CAST(b._hi AS DOUBLE) - CAST(b._lo AS DOUBLE) + 1.0)),
       |          ${PackBuckets - 1}) AS INTEGER)
       |      ORDER BY k.doc_id) AS rn
       |  FROM sized k JOIN bounds b ON k.stratum = b._sk),
       |step(stratum, bkt, rn, doc_id, pk, off, f) AS (
       |  SELECT stratum, bkt, rn, doc_id,
       |    CAST(0 AS BIGINT), CAST(0 AS BIGINT), n
       |  FROM sharded WHERE rn = 1
       |  UNION ALL
       |  SELECT nxt.stratum, nxt.bkt, nxt.rn, nxt.doc_id,
       |    CASE WHEN s.f + nxt.n <= $b THEN s.pk ELSE s.pk + 1 END,
       |    CASE WHEN s.f + nxt.n <= $b THEN s.f ELSE CAST(0 AS BIGINT) END,
       |    CASE WHEN s.f + nxt.n <= $b THEN s.f + nxt.n ELSE nxt.n END
       |  FROM step s JOIN sharded nxt
       |    ON nxt.stratum = s.stratum AND nxt.bkt = s.bkt AND nxt.rn = s.rn + 1),
       |shard_packs AS (
       |  SELECT stratum, bkt, MAX(pk) + 1 AS n_packs
       |  FROM step GROUP BY stratum, bkt),
       |bases AS (
       |  SELECT stratum, bkt,
       |    CAST(COALESCE(SUM(n_packs) OVER (ORDER BY stratum, bkt
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS base
       |  FROM shard_packs)
       |SELECT s.doc_id, s.stratum, CAST(b.base + s.pk AS BIGINT) AS pack_id,
       |  s.off AS pack_offset
       |FROM step s JOIN bases b ON s.stratum = b.stratum AND s.bkt = b.bkt""".stripMargin
  }

  /** The FFD step as the identical DuckDB CASE chain (generated from
    * the same constants so the two engines cannot drift). */
  private def ffdStepSql(budget: Long): String = {
    def slot(i: Int) = s"((a >> ${8 * i}) & 255)"
    val mx = s"GREATEST(${(0 until FfdOpenBins).map(slot).mkString(", ")})"
    def closed(i: Int) =
      s"a + (CAST(1 AS BIGINT) << $FfdClosedShift) - (${slot(i)} << ${8 * i}) + (x << ${8 * i})"
    val evict = {
      val branches = (0 until FfdOpenBins - 1)
        .map(i => s"WHEN ${slot(i)} = $mx THEN ${closed(i)}")
      s"CASE ${branches.mkString(" ")} ELSE ${closed(FfdOpenBins - 1)} END"
    }
    val fits = (0 until FfdOpenBins)
      .map(i => s"WHEN ${slot(i)} + x <= $budget THEN a + (x << ${8 * i})")
    s"CASE ${fits.mkString(" ")} ELSE $evict END"
  }

  /** packs-from-final-state, mirroring [[ffdPacks]]'s finish lambda. */
  private def ffdFinishSql: String = {
    val open = (0 until FfdOpenBins)
      .map(i => s"CASE WHEN ((st >> ${8 * i}) & 255) > 0 THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"(st >> $FfdClosedShift) + $open"
  }

  /** [[seqPackFfd]]'s oracle: the identical recurrence as a recursive
    * CTE, one doc per shard per iteration, with the bin fills / pack
    * ids as scalar state columns and the per-doc (pk, off) emitted on
    * each step. Nested subqueries stage the derived values (fit index,
    * max fill, chosen slot) exactly as the Spark fold's when-chains. */
  val seqPackFfdSql: String = {
    val b = PackBudget
    val R = FfdOpenBins
    val fCols = (0 until R).map(i => s"f$i")
    val idCols = (0 until R).map(i => s"id$i")
    val stateCols = (fCols ++ idCols).mkString(", ")
    val fitCase = "CASE " + (0 until R)
      .map(i => s"WHEN f$i + n <= $b THEN $i").mkString(" ") + " ELSE -1 END"
    val mx = s"GREATEST(${fCols.mkString(", ")})"
    val evCase = "CASE " + (0 until R - 1)
      .map(i => s"WHEN f$i = mx THEN $i").mkString(" ") + s" ELSE ${R - 1} END"
    def pick(prefix: String) = "CASE ix " + (0 until R)
      .map(i => s"WHEN $i THEN $prefix$i").mkString(" ") + " END"
    val newFs = (0 until R).map(i =>
      s"CASE WHEN ix = $i THEN (CASE WHEN fit < 0 THEN n ELSE f$i + n END) ELSE f$i END AS f$i")
      .mkString(",\n       |    ")
    val newIds = (0 until R).map(i =>
      s"CASE WHEN ix = $i THEN pk ELSE id$i END AS id$i").mkString(", ")
    val baseState = (s"n AS f0" +: (1 until R).map(i => s"CAST(0 AS BIGINT) AS f$i")) ++
      (0 until R).map(i => s"CAST(0 AS BIGINT) AS id$i")
    s"""WITH RECURSIVE sized AS (
       |  SELECT doc_id, lang AS stratum,
       |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n
       |  FROM documents
       |  WHERE length(text) - length(replace(text, ' ', '')) + 1 <= $b),
       |bounds AS (
       |  SELECT stratum AS _sk, MIN(doc_id) AS _lo, MAX(doc_id) AS _hi
       |  FROM sized GROUP BY stratum),
       |sharded AS (
       |  SELECT k.doc_id, k.stratum, k.n,
       |    CAST(LEAST(FLOOR((CAST(k.doc_id AS DOUBLE) - CAST(b._lo AS DOUBLE))
       |        * $PackBuckets /
       |        (CAST(b._hi AS DOUBLE) - CAST(b._lo AS DOUBLE) + 1.0)),
       |      ${PackBuckets - 1}) AS INTEGER) AS bkt,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY k.stratum,
       |        CAST(LEAST(FLOOR((CAST(k.doc_id AS DOUBLE) - CAST(b._lo AS DOUBLE))
       |            * $PackBuckets /
       |            (CAST(b._hi AS DOUBLE) - CAST(b._lo AS DOUBLE) + 1.0)),
       |          ${PackBuckets - 1}) AS INTEGER)
       |      ORDER BY k.n DESC, k.doc_id) AS rn
       |  FROM sized k JOIN bounds b ON k.stratum = b._sk),
       |step(stratum, bkt, rn, doc_id, pk, off, nxt, ${stateCols}) AS (
       |  SELECT stratum, bkt, rn, doc_id,
       |    CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT),
       |    ${baseState.mkString(", ")}
       |  FROM sharded WHERE rn = 1
       |  UNION ALL
       |  SELECT stratum, bkt, rn, doc_id, pk, off,
       |    CASE WHEN opens THEN nxt + 1 ELSE nxt END,
       |    $newFs,
       |    $newIds
       |  FROM (
       |    SELECT l3.*, (fit < 0 OR fix = 0) AS opens,
       |      CASE WHEN fit < 0 OR fix = 0 THEN nxt ELSE idix END AS pk,
       |      CASE WHEN fit < 0 THEN CAST(0 AS BIGINT) ELSE fix END AS off
       |    FROM (
       |      SELECT l2.*, ${pick("f")} AS fix, ${pick("id")} AS idix
       |      FROM (
       |        SELECT l1.*,
       |          CASE WHEN fit >= 0 THEN fit ELSE $evCase END AS ix
       |        FROM (
       |          SELECT l0.*, $fitCase AS fit, $mx AS mx
       |          FROM (
       |            SELECT nx.stratum, nx.bkt, nx.rn, nx.doc_id, nx.n,
       |              s.nxt, ${(fCols ++ idCols).map(c => s"s.$c AS $c").mkString(", ")}
       |            FROM step s JOIN sharded nx
       |              ON nx.stratum = s.stratum AND nx.bkt = s.bkt
       |              AND nx.rn = s.rn + 1) l0) l1) l2) l3) l4),
       |shard_packs AS (
       |  SELECT stratum, bkt, MAX(nxt) AS n_packs
       |  FROM step GROUP BY stratum, bkt),
       |bases AS (
       |  SELECT stratum, bkt,
       |    CAST(COALESCE(SUM(n_packs) OVER (ORDER BY stratum, bkt
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS base
       |  FROM shard_packs)
       |SELECT s.doc_id, s.stratum, CAST(b.base + s.pk AS BIGINT) AS pack_id,
       |  s.off AS pack_offset
       |FROM step s JOIN bases b ON s.stratum = b.stratum AND s.bkt = b.bkt""".stripMargin
  }

  val packEfficiencySql: String = {
    val b = PackBudget
    val m = StateMult
    s"""WITH sized AS (
       |  SELECT doc_id, lang AS stratum,
       |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n
       |  FROM documents),
       |concat_per AS (
       |  SELECT stratum, SUM(n) AS tok FROM sized GROUP BY stratum),
       |concat_tot AS (
       |  SELECT CAST(SUM(CAST(CEIL(CAST(tok AS DOUBLE) / $b) AS BIGINT)) AS BIGINT) AS n_seqs,
       |    CAST(SUM(tok) AS BIGINT) AS packed_tokens
       |  FROM concat_per),
       |cum AS (
       |  SELECT n, COALESCE(SUM(n) OVER (
       |      PARTITION BY stratum ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
       |  FROM sized),
       |splits AS (
       |  SELECT COUNT(*) FILTER (WHERE cb % $b + n > $b) AS n_split FROM cum),
       |ol AS (SELECT COUNT(*) AS n_overlong FROM sized WHERE n > $b),
       |kept AS (SELECT * FROM sized WHERE n <= $b),
       |bounds AS (
       |  SELECT stratum AS _sk, MIN(doc_id) AS _lo, MAX(doc_id) AS _hi
       |  FROM kept GROUP BY stratum),
       |sharded AS (
       |  SELECT k.doc_id, k.stratum, k.n,
       |    CAST(LEAST(FLOOR((CAST(k.doc_id AS DOUBLE) - CAST(b._lo AS DOUBLE))
       |        * $PackBuckets /
       |        (CAST(b._hi AS DOUBLE) - CAST(b._lo AS DOUBLE) + 1.0)),
       |      ${PackBuckets - 1}) AS INTEGER) AS bkt
       |  FROM kept k JOIN bounds b ON k.stratum = b._sk),
       |fold_doc AS (
       |  SELECT stratum, bkt, SUM(n) AS tok,
       |    list_reduce(list_prepend(CAST($b AS BIGINT), list(n ORDER BY doc_id)),
       |      (a, x) -> CASE WHEN a % $m + x <= $b THEN a + x
       |                     ELSE a - (a % $m) + $m + x END) // $m AS packs
       |  FROM sharded GROUP BY stratum, bkt),
       |fold_len AS (
       |  SELECT stratum, bkt, SUM(n) AS tok,
       |    list_reduce(list_prepend(CAST($b AS BIGINT), list(n ORDER BY n DESC, doc_id)),
       |      (a, x) -> CASE WHEN a % $m + x <= $b THEN a + x
       |                     ELSE a - (a % $m) + $m + x END) // $m AS packs
       |  FROM sharded GROUP BY stratum, bkt),
       |fold_ffd AS (
       |  SELECT stratum, bkt, SUM(n) AS tok,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), list(n ORDER BY n DESC, doc_id)),
       |      (a, x) -> ${ffdStepSql(b)}) AS st
       |  FROM sharded GROUP BY stratum, bkt),
       |ffd AS (
       |  SELECT stratum, bkt, tok, CAST($ffdFinishSql AS BIGINT) AS packs
       |  FROM fold_ffd),
       |rows3 AS (
       |  SELECT 'concat_chunk' AS strategy, n_seqs, packed_tokens,
       |    (SELECT CAST(n_split AS BIGINT) FROM splits) AS n_split_docs,
       |    CAST(0 AS BIGINT) AS n_overlong
       |  FROM concat_tot
       |  UNION ALL
       |  SELECT 'greedy_docwise', CAST(SUM(packs) AS BIGINT),
       |    CAST(SUM(tok) AS BIGINT), CAST(0 AS BIGINT),
       |    (SELECT CAST(n_overlong AS BIGINT) FROM ol)
       |  FROM fold_doc
       |  UNION ALL
       |  SELECT 'greedy_sorted', CAST(SUM(packs) AS BIGINT),
       |    CAST(SUM(tok) AS BIGINT), CAST(0 AS BIGINT),
       |    (SELECT CAST(n_overlong AS BIGINT) FROM ol)
       |  FROM fold_len
       |  UNION ALL
       |  SELECT 'ffd_bounded', CAST(SUM(packs) AS BIGINT),
       |    CAST(SUM(tok) AS BIGINT), CAST(0 AS BIGINT),
       |    (SELECT CAST(n_overlong AS BIGINT) FROM ol)
       |  FROM ffd)
       |SELECT strategy, n_seqs, packed_tokens,
       |  n_seqs * $b - packed_tokens AS pad_tokens,
       |  FLOOR(CAST(n_seqs * $b - packed_tokens AS DOUBLE) /
       |    CAST(n_seqs * $b AS DOUBLE) * 10000) / 10000 AS pad_share,
       |  n_split_docs, n_overlong
       |FROM rows3""".stripMargin
  }
}
