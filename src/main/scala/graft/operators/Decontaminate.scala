package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup.{shingles, tokens}

/**
 * Benchmark decontamination: flag training documents that share word
 * n-grams with an evaluation/benchmark set — the standard hygiene
 * pass a pretraining pipeline runs so eval questions don't leak into
 * the training corpus.
 *
 * Spark posture (100 TB): the benchmark side of the join is SMALL by
 * construction (eval suites are MBs, not TBs), so its distinct n-gram
 * set is BROADCAST — the training side stays map-local through
 * shingling and explode, and the only shuffle is the per-doc
 * partial-agg hit count. No training-side n-gram table is ever
 * materialized or shuffled. The n-gram kernel reuses the dedup
 * shingle machinery (codegen'd higher-order array functions, no UDF).
 */
object Decontaminate {

  /**
   * Per training doc: distinct n-gram count, how many of those occur
   * anywhere in `bench`, the contamination ratio (floor-truncated,
   * SURVEY §5), and the flag (any shared n-gram ⇒ contaminated —
   * the conservative industry rule).
   */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val grams = array_distinct(shingles(tokens(col(textCol)), n))
    val benchGrams = bench.select(explode(grams).as("g")).distinct()
      .withColumn("hit", lit(1L))
    // n_ngrams = count(*) after the explode (grams are distinct, and the
    // shingle fallback guarantees >= 1 per doc) — carrying a size(gs)
    // column through the explode would collapse into the same projection
    // and evaluate the expensive shingle expression TWICE per doc
    train.select(col(idCol).as("doc_id"), explode(grams).as("g"))
      .join(broadcast(benchGrams), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_ngrams"), count(col("hit")).as("n_hits"))
      .select(col("doc_id"), col("n_ngrams"), col("n_hits"),
        (floor(col("n_hits").cast("double") / greatest(col("n_ngrams"), lit(1)) * 10000) / 10000)
          .as("contam_ratio"),
        (col("n_hits") > 0).cast("int").as("contaminated"))
  }

  // ---- SparkEntry wiring ----

  /** Benchmark set = doc_id ≡ 0 (mod 17). Natural n-gram overlap is rare
    * in the synthetic corpus, so contamination is additionally PLANTED:
    * every training doc with doc_id ≡ 5 (mod 23) gets the first 6 tokens
    * of benchmark doc (doc_id mod 3)·17 appended — those docs must carry
    * ≥ 2 shared 5-grams. The planting is part of the query (mirrored in
    * the oracle SQL), not of the data.
    *
    * DEMO-scale caveat: carving the bench set out of the corpus itself
    * (~6% of it) means the broadcast gram set here grows WITH the
    * corpus — broadcast-safe only at test scale factors. That is a
    * property of this self-contained demo wiring, not of
    * [[decontaminate]], whose contract is a real benchmark suite:
    * fixed eval files, MBs by construction, corpus-size-independent. A
    * deployment passes that as `bench`; it never derives bench from
    * the training corpus. */
  def decontaminateQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val prefix6 = concat_ws(" ", slice(split(col("text"), " "), 1, 6))
    val planted = docs.filter(col("doc_id") % 17 =!= 0).as("t")
      .join(broadcast(bench.select((col("doc_id") / 17).cast("long").as("b3"),
        prefix6.as("p6"))), (col("doc_id") % 3) === col("b3"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 23 === 5 && col("p6").isNotNull,
          concat(col("text"), lit(" "), col("p6"))).otherwise(col("text")).as("text"))
    decontaminate(planted, bench, "doc_id", "text", n = 5)
  }

  val decontaminateSql: String =
    """WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0),
      |planted AS (
      |  SELECT t.doc_id,
      |    CASE WHEN t.doc_id % 23 = 5 AND b.doc_id IS NOT NULL
      |         THEN t.text || ' ' ||
      |              array_to_string(string_split(b.text, ' ')[1:6], ' ')
      |         ELSE t.text END AS text
      |  FROM documents t LEFT JOIN bench b ON b.doc_id = (t.doc_id % 3) * 17
      |  WHERE t.doc_id % 17 <> 0),
      |gr AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN len(toks) >= 5 THEN
      |        list_transform(range(1, len(toks) - 3),
      |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])
      |      ELSE [array_to_string(toks, ' ')] END) AS gs
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM planted)),
      |bg AS (
      |  SELECT DISTINCT unnest(
      |    list_distinct(CASE WHEN len(toks) >= 5 THEN
      |        list_transform(range(1, len(toks) - 3),
      |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])
      |      ELSE [array_to_string(toks, ' ')] END)) AS g
      |  FROM (SELECT string_split(lower(text), ' ') AS toks FROM bench)),
      |ex AS (SELECT doc_id, len(gs) AS n_ngrams, unnest(gs) AS g FROM gr),
      |hits AS (
      |  SELECT e.doc_id, ANY_VALUE(e.n_ngrams) AS n_ngrams, COUNT(b.g) AS n_hits
      |  FROM ex e LEFT JOIN bg b USING (g) GROUP BY e.doc_id)
      |SELECT doc_id, CAST(n_ngrams AS INTEGER) AS n_ngrams,
      |  CAST(n_hits AS BIGINT) AS n_hits,
      |  FLOOR(CAST(n_hits AS DOUBLE) / GREATEST(n_ngrams, 1) * 10000) / 10000 AS contam_ratio,
      |  CAST(n_hits > 0 AS INTEGER) AS contaminated
      |FROM hits""".stripMargin


  // ---- fuzzy (MinHash) decontamination ----

  /** Exact-Jaccard threshold above which a banded candidate counts as
    * a fuzzy leak (the near-dup dedup threshold — a paraphrase-level
    * overlap far looser than the exact-n-gram rule above). */
  val FuzzyTau: Double = 0.5

  /** Train+bench MinHash signatures of the planted demo corpus (side
    * column 't'/'b'), exported so the DuckDB oracle replays the band
    * join from the same signatures. */
  val FuzzySigExportPath =
    graft.FixturePaths.fixture("decontam_minhash_sigs.parquet")

  /**
   * Fuzzy benchmark decontamination via MinHash banding — the middle
   * rung of the decontamination ladder ([[decontaminate]] catches
   * verbatim n-gram leaks, [[decontaminateSemantic]] catches
   * paraphrases at cosine ~1; this catches lightly-edited copies that
   * break the exact n-gram chain but keep high shingle Jaccard — the
   * Dolma/RedPajama-style near-dup decontamination pass).
   *
   * Plan (100 TB posture): training signatures are MAP-ONLY (the fused
   * dedup signature expression); the band join is train-bands ⋈
   * BROADCAST bench-bands (eval suites are MBs by construction), so
   * the training side never shuffles for candidate generation. The
   * hot-bucket guard applies to the TRAIN side only — a degenerate
   * train bucket of b rows would contribute b x |bench-bucket| join
   * rows, while bench buckets are bounded by the suite size. Exact
   * shingle verification re-tokenizes ONLY candidate training docs
   * (semi-join), then one per-doc partial agg takes the max Jaccard.
   */
  def decontaminateMinhash(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, numPerms: Int = 64, rowsPerBand: Int = 4,
      shingleWidth: Int = 3, tau: Double = FuzzyTau,
      maxBucket: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.dedup.Dedup
    val spreadTrain = graft.index.LshIndex.spread(train)
    val tSigs = Dedup.minhashSignatures(spreadTrain, idCol, textCol,
      numPerms, shingleWidth).cache()
    val tBands = Dedup.minhashBands(tSigs, numPerms, rowsPerBand)
    // hot-bucket drop via dropHotBuckets (r16 — was a count window)
    val tg = Dedup.dropHotBuckets(tBands, Seq("band", "band_hash"), maxBucket)
    val bSigs = Dedup.minhashSignatures(bench, idCol, textCol, numPerms, shingleWidth)
    val bBands = Dedup.minhashBands(bSigs, numPerms, rowsPerBand)
      .select(col("id").as("bid"), col("band"), col("band_hash"))
    val cands = tg.join(broadcast(bBands), Seq("band", "band_hash"))
      .select(col("id"), col("bid")).distinct().cache()
    val candIds = cands.select("id").distinct()
    val tSets = graft.index.LshIndex.spread(
        train.select(col(idCol).as("id"), col(textCol).as("__t")))
      .join(candIds, Seq("id"), "left_semi")
      .select(col("id"),
        array_distinct(Dedup.shingles(Dedup.tokens(col("__t")), shingleWidth)).as("sh"))
    val bSets = bench.select(col(idCol).as("bid"),
      array_distinct(Dedup.shingles(Dedup.tokens(col(textCol)), shingleWidth)).as("bsh"))
    val verified = cands.join(tSets, Seq("id")).join(broadcast(bSets), Seq("bid"))
      .withColumn("j", size(array_intersect(col("sh"), col("bsh"))).cast("double") /
        size(array_union(col("sh"), col("bsh"))))
      .groupBy("id")
      .agg(count(lit(1)).cast("int").as("n_cands"),
        max(floor(col("j") * 10000) / 10000).as("max_jaccard"))
    val result = train.select(col(idCol).as("doc_id"))
      .join(verified.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_cands"), lit(0)).as("n_cands"),
        coalesce(col("max_jaccard"), lit(-1.0)).as("max_jaccard"))
      .withColumn("contaminated", (col("max_jaccard") >= tau).cast("int"))
      .cache()
    result.count() // materialize, then release the signature intermediates
    tSigs.unpersist()
    cands.unpersist()
    result
  }

  /** Mutated bench copies planted into training: bench docs with
    * doc_id < this bound get an every-60th-token-mutated copy at
    * doc_id + PlantOffset — edits that break 5-gram chains around each
    * mutation but keep Jaccard far above [[FuzzyTau]]. */
  val FuzzyPlantBound = 340L

  /**
   * Demo wiring: bench = doc_id ≡ 0 (mod 17) (the [[decontaminateQuery]]
   * carve), training = the rest PLUS planted mutated copies of the
   * first 20 bench docs. Same demo-scale caveat as [[decontaminateQuery]]:
   * a real deployment passes fixed eval files as `bench`.
   */
  def decontaminateMinhashQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val train = docs.filter(col("doc_id") % 17 =!= 0)
      .unionByName(bench.filter(col("doc_id") < FuzzyPlantBound)
        .select((col("doc_id") + graft.dedup.Dedup.PlantOffset).as("doc_id"),
          graft.dedup.Dedup.mutatedText(col("text")).as("text")))
    graft.FixtureExport.ensure(s"decontam_minhash:$sfDir", FuzzySigExportPath) {
      graft.dedup.Dedup.minhashSignatures(train, "doc_id", "text", 64, 3)
        .withColumn("side", lit("t"))
        .unionByName(graft.dedup.Dedup.minhashSignatures(bench, "doc_id", "text", 64, 3)
          .withColumn("side", lit("b")))
        .coalesce(1).write.mode("overwrite").parquet(FuzzySigExportPath)
    }
    decontaminateMinhash(train, bench, "doc_id", "text")
  }

  /**
   * Full-chain oracle from the exported signature fixture: bands are
   * signature slices (the [[graft.dedup.Dedup.dedupMinhashSql]]
   * slice-equality argument), train-side hot-bucket guard, band join,
   * exact shingle-Jaccard verify against the replayed planted corpus.
   */
  val decontaminateMinhashSql: String = {
    val off = graft.dedup.Dedup.PlantOffset
    s"""WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0),
       |train AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0
       |  UNION ALL
       |  SELECT doc_id + $off,
       |    array_to_string(list_transform(string_split(lower(text), ' '),
       |      (t, i) -> CASE WHEN (i - 1) % 60 = 0 THEN 'xqzmut' ELSE t END), ' ')
       |  FROM bench WHERE doc_id < $FuzzyPlantBound),
       |sigs AS (SELECT id, side, sig FROM read_parquet('$FuzzySigExportPath/*.parquet')),
       |tb AS (
       |  SELECT id, t.band AS band, sig[t.band*4+1:t.band*4+4] AS bh
       |  FROM sigs, generate_series(0, 15) t(band) WHERE side = 't'),
       |tg AS (
       |  SELECT id, band, bh FROM tb
       |  QUALIFY COUNT(*) OVER (PARTITION BY band, bh) <= 1000),
       |bb AS (
       |  SELECT id AS bid, t.band AS band, sig[t.band*4+1:t.band*4+4] AS bh
       |  FROM sigs, generate_series(0, 15) t(band) WHERE side = 'b'),
       |cands AS (
       |  SELECT DISTINCT tg.id, bb.bid FROM tg JOIN bb USING (band, bh)),
       |tok AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM train),
       |tsets AS (SELECT doc_id, ${graft.dedup.Dedup.shingleSetSql} AS sh FROM tok),
       |btok AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM bench),
       |bsets AS (SELECT doc_id, ${graft.dedup.Dedup.shingleSetSql} AS sh FROM btok),
       |verify AS (
       |  SELECT c.id, COUNT(*) AS n_cands,
       |    MAX(FLOOR(CAST(len(list_intersect(ts.sh, bs.sh)) AS DOUBLE) /
       |      len(list_distinct(list_concat(ts.sh, bs.sh))) * 10000) / 10000) AS max_jaccard
       |  FROM cands c
       |  JOIN tsets ts ON ts.doc_id = c.id
       |  JOIN bsets bs ON bs.doc_id = c.bid
       |  GROUP BY c.id)
       |SELECT t.doc_id,
       |  CAST(COALESCE(v.n_cands, 0) AS INTEGER) AS n_cands,
       |  COALESCE(v.max_jaccard, -1.0) AS max_jaccard,
       |  CAST(COALESCE(v.max_jaccard, -1.0) >= $FuzzyTau AS INTEGER) AS contaminated
       |FROM train t LEFT JOIN verify v ON v.id = t.doc_id""".stripMargin
  }

  // ---- semantic (embedding-space) decontamination ----

  /** Cosine threshold above which a training vector counts as a
    * semantic leak of a benchmark vector (4-dp rounded cosine — the
    * engine-portable cut; random pairs in a high-dim corpus sit near
    * 0, so the margin is wide). */
  val SemTau: Double = 0.97

  /** Probe breadth for the training side (benchmark side uses its one
    * home cell; a pair is checked iff the bench home cell is among the
    * training vector's probes — the neardup co-probe posture). */
  val SemProbes: Int = 4

  /** Cells for the demo-corpus fit (production sizes via
    * [[graft.query.IvfSearch.scaledCells]]). */
  val SemCells: Int = 16

  val SemCentroidExportPath =
    graft.FixturePaths.fixture("decontam_centroids.parquet")

  /**
   * Embedding-space benchmark decontamination — the semantic
   * complement of the n-gram pass above (paraphrased eval leaks share
   * no 5-grams but sit at cosine ~1; modern pipelines run both).
   *
   * Plan: IVF cells fit once; the TRAINING side gets `nProbe` probe
   * cells map-side (centroid literal, no shuffle), the BENCHMARK side
   * its home cell; candidates = cell equi-join (the only data-sized
   * shuffle — never a cross join), exact cosine + per-vector max via
   * one partial agg. Vectors with no bench candidate in any probed
   * cell report max_cos = -1. At 100 TB the bench side is eval-suite
   * sized (bounded), so the candidate join's bench side broadcasts.
   */
  def decontaminateSemantic(train: DataFrame, bench: DataFrame,
      cents: Array[Array[Float]], nProbe: Int = SemProbes,
      tau: Double = SemTau): DataFrame = {
    import graft.functions.VectorFunctions.vec_cosine
    val probes = graft.dedup.Dedup.probeCells(
      train.select(col("vec_id"), col("embedding")), cents, nProbe)
    val benchHome = graft.dedup.Dedup.probeCells(
      bench.select(col("vec_id"), col("embedding")), cents, 1)
      .select(col("vec_id").as("bvec_id"), col("cell"))
    val hits = probes.join(benchHome, Seq("cell"))
      .join(train.select(col("vec_id"), col("embedding").as("ve")), Seq("vec_id"))
      .join(bench.select(col("vec_id").as("bvec_id"),
        col("embedding").as("vb")), Seq("bvec_id"))
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).cast("int").as("n_cands"),
        max(round(vec_cosine(col("ve"), col("vb")), 4)).as("max_cos"))
    train.select(col("vec_id")).join(hits, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_cands"), lit(0)).as("n_cands"),
        coalesce(col("max_cos"), lit(-1.0)).as("max_cos"))
      .withColumn("contaminated", (col("max_cos") >= tau).cast("int"))
  }

  /**
   * Demo wiring: bench = vec_id % 29 == 0; training = the rest PLUS a
   * planted jittered copy (+0.001 on coordinate 0, float-exact) of
   * every bench vector with vec_id < 200 — guaranteed semantic leaks
   * the flag must catch. Same demo-scale caveat as
   * [[decontaminateQuery]]: a real deployment passes a fixed
   * eval-suite embedding table as `bench`.
   */
  def decontaminateSemanticQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val bench = e.filter(col("vec_id") % 29 === 0)
    val train = e.filter(col("vec_id") % 29 =!= 0)
      .unionByName(bench.filter(col("vec_id") < 200)
        .select((col("vec_id") + graft.dedup.Dedup.PlantOffset).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x)).as("embedding")))
    val cents = graft.query.IvfSearch.fitCentroids(train, SemCells,
      Some(s"decontam:$sfDir"))
    graft.FixtureExport.ensure(sfDir, SemCentroidExportPath) {
      graft.query.IvfSearch.centroidsDf(spark, cents)
        .coalesce(1).write.mode("overwrite").parquet(SemCentroidExportPath)
    }
    decontaminateSemantic(train, bench, cents)
  }

  val decontaminateSemanticSql: String =
    s"""WITH bench AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 29 = 0),
       |train AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 29 <> 0
       |  UNION ALL
       |  SELECT vec_id + ${graft.dedup.Dedup.PlantOffset},
       |    list_transform(embedding, (x, i) ->
       |      CASE WHEN i = 1 THEN CAST(x + CAST(0.001 AS FLOAT) AS FLOAT) ELSE x END)
       |  FROM bench WHERE vec_id < 200),
       |c AS (SELECT cell, cv FROM read_parquet('$SemCentroidExportPath/*.parquet')),
       |tp AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT t.vec_id, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY t.vec_id
       |        ORDER BY list_distance(CAST(t.embedding AS DOUBLE[]),
       |                               CAST(c.cv AS DOUBLE[])), c.cell) AS r
       |    FROM train t CROSS JOIN c)
       |  WHERE r <= $SemProbes),
       |bh AS (
       |  SELECT vec_id AS bvec_id, cell FROM (
       |    SELECT b.vec_id, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY b.vec_id
       |        ORDER BY list_distance(CAST(b.embedding AS DOUBLE[]),
       |                               CAST(c.cv AS DOUBLE[])), c.cell) AS r
       |    FROM bench b CROSS JOIN c)
       |  WHERE r = 1),
       |hits AS (
       |  SELECT tp.vec_id, COUNT(*) AS n_cands,
       |    MAX(ROUND(list_cosine_similarity(CAST(t.embedding AS DOUBLE[]),
       |                                     CAST(b.embedding AS DOUBLE[])), 4)) AS max_cos
       |  FROM tp JOIN bh ON tp.cell = bh.cell
       |  JOIN train t ON t.vec_id = tp.vec_id
       |  JOIN bench b ON b.vec_id = bh.bvec_id
       |  GROUP BY tp.vec_id)
       |SELECT t.vec_id,
       |  CAST(COALESCE(h.n_cands, 0) AS INTEGER) AS n_cands,
       |  COALESCE(h.max_cos, -1.0) + 0.0 AS max_cos,
       |  CAST(COALESCE(h.max_cos, -1.0) >= $SemTau AS INTEGER) AS contaminated
       |FROM train t LEFT JOIN hits h ON h.vec_id = t.vec_id""".stripMargin
}
