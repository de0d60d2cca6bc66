package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup.{shingles, tokens}

/**
 * Bloom-filter benchmark decontamination — the broadcast-bitset rung
 * of the decontamination ladder ([[Decontaminate.decontaminate]] is
 * the exact-join form; this is what a 100 TB deployment actually
 * ships): the eval suite's n-gram set is folded into a packed Bloom
 * bitset ONCE (k-probe, double hashing), the bitset rides every plan
 * as a literal (or an explicit broadcast when a deployment's suite
 * outgrows plan literals — MBs either way), and each training
 * document's verdict is computed entirely INSIDE its own projection
 * via `aggregate` over the shingle array.
 *
 * Spark posture (100 TB): ZERO shuffles — no explode, no per-gram
 * join, no per-doc groupBy. The exact-join form shuffles one row per
 * (doc, gram) pair to count hits; here the per-doc hit count never
 * leaves the map task, so the operator composes into any corpus scan
 * for free. The price is Bloom false positives (over-flagging, never
 * under-flagging — the conservative direction for decontamination);
 * sizing at [[BitsPerElement]] bits/element with [[NumProbes]] probes
 * puts the FP rate near 5e-4, and the verdict column reports raw hit
 * counts so a pipeline can chase flags with the exact pass.
 *
 * Engine-portability: positions use REDUCED double hashing —
 * d1 = h1 mod m, d2 = (h2 mod m) | 1 (odd step, m a power of two, so
 * every probe walks a full cycle), pos_i = (d1 + i·d2) & (m-1) — all
 * arithmetic stays below 2^40, so the DuckDB oracle replays it with
 * plain BIGINT math from the exported (gram → h1,h2) fixture and the
 * set-position fixture; no 64-bit wraparound semantics to emulate.
 */
object BloomDecontaminate {

  /** Bitset bits per benchmark n-gram (m sizing); 16 bits/element with
    * 11 probes ≈ 4.6e-4 false-positive rate (Bloom 1970 optimum
    * k = m/n·ln2 ≈ 11.1). */
  val BitsPerElement = 16

  /** Probe count k. */
  val NumProbes = 11

  /** Chain tag making the second hash independent of the first
    * (xxhash64 seeds the running hash with the previous column). */
  private val H2Tag = "graft-bloom-h2"

  /** n-gram width (matches [[Decontaminate.decontaminateQuery]]). */
  val GramWidth = 5

  val BitsExportPath = graft.FixturePaths.fixture("bloom_bits.parquet")
  val GramHashExportPath = graft.FixturePaths.fixture("bloom_gram_hashes.parquet")
  val ParamsExportPath = graft.FixturePaths.fixture("bloom_params.parquet")

  /** First/second 64-bit gram hashes — Spark `xxhash64` expressions,
    * used identically for the bitset build, the membership probe, and
    * the oracle fixture export, so all three see the same values. */
  def gramH1(g: Column): Column = xxhash64(g)
  def gramH2(g: Column): Column = xxhash64(lit(H2Tag), g)

  /** Smallest power of two ≥ `BitsPerElement · n` (floor 1024, hard
    * ceiling 2^30 bits = 128 MiB of plan literal). The ceiling FAILS
    * rather than silently degrading: past ~67M bench grams the
    * effective bits/element would fall below the sizing that the
    * documented ~5e-4 false-positive rate rests on — a deployment that
    * big must shard the bench into multiple bitsets (one per eval
    * suite), not quietly over-flag. */
  def sizeBits(nElements: Long): Int = {
    val want = math.max(1024L, nElements * BitsPerElement)
    require(want <= (1L << 30),
      s"bloom bitset for $nElements grams needs $want bits > 2^30 cap; " +
        "shard the bench set across multiple bitsets instead of degrading the FP rate")
    java.lang.Long.highestOneBit(want * 2 - 1).toInt
  }

  /** Fold (h1, h2) element hashes into a packed word bitset. */
  def build(hashes: Array[(Long, Long)], m: Int, k: Int = NumProbes): Array[Long] = {
    require(Integer.bitCount(m) == 1, s"m must be a power of two, got $m")
    val words = new Array[Long](m >> 6)
    hashes.foreach { case (x1, x2) =>
      val d1 = java.lang.Math.floorMod(x1, m.toLong)
      val d2 = java.lang.Math.floorMod(x2, m.toLong) | 1L
      var i = 0
      while (i < k) {
        val pos = (d1 + i * d2) & (m - 1)
        words((pos >> 6).toInt) |= 1L << (pos & 63)
        i += 1
      }
    }
    words
  }

  /** Membership probe over a string column: true iff all k probed bits
    * are set. The bitset is a plan-literal long array; each probe is
    * element_at + bit_get — O(k) per gram, no shuffle, no UDF. */
  def containsExpr(g: Column, words: Array[Long], m: Int,
      k: Int = NumProbes): Column = {
    val wl = typedLit(words.toSeq)
    val d1 = pmod(gramH1(g), lit(m.toLong))
    val d2 = pmod(gramH2(g), lit(m.toLong)).bitwiseOR(lit(1L))
    (0 until k).map { i =>
      val pos = (d1 + lit(i.toLong) * d2).bitwiseAND(lit((m - 1).toLong))
      val word = element_at(wl, shiftright(pos, 6).cast("int") + lit(1))
      call_function("bit_get", word, pos.bitwiseAND(lit(63L)).cast("int")) === lit(1)
    }.reduce(_ && _)
  }

  /**
   * Per training doc: distinct n-gram count, Bloom-probed hit count,
   * and the conservative flag (any probed hit ⇒ contaminated). The
   * whole verdict is one map-only projection; `bench` never appears in
   * the plan — only its folded bitset does.
   */
  def decontaminateBloom(train: DataFrame, idCol: String, textCol: String,
      n: Int, words: Array[Long], m: Int, k: Int = NumProbes): DataFrame = {
    val gs = array_distinct(shingles(tokens(col(textCol)), n))
    train.select(col(idCol).as("doc_id"), gs.as("gs"))
      .select(col("doc_id"),
        size(col("gs")).as("n_ngrams"),
        aggregate(col("gs"), lit(0L),
          (acc, g) => acc + when(containsExpr(g, words, m, k), 1L).otherwise(0L))
          .as("n_hits"))
      .withColumn("contaminated", (col("n_hits") > 0).cast("int"))
  }

  /** Fit the bitset from a benchmark corpus: distinct n-gram hashes
    * (computed distributed, collected — bounded by the eval-suite
    * size, the same contract as [[Decontaminate.decontaminate]]'s
    * broadcast side), folded on the driver. Returns (words, m). */
  def fit(bench: DataFrame, textCol: String, n: Int): (Array[Long], Int) = {
    val grams = array_distinct(shingles(tokens(col(textCol)), n))
    val hs = bench.select(explode(grams).as("g")).distinct()
      .select(gramH1(col("g")), gramH2(col("g")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val m = sizeBits(hs.length.toLong)
    (build(hs, m), m)
  }

  // ---- SparkEntry wiring ----

  /**
   * Demo wiring over the [[Decontaminate.decontaminateQuery]] planted
   * corpus (bench = doc_id ≡ 0 mod 17; docs ≡ 5 mod 23 carry a planted
   * 6-token bench prefix ⇒ guaranteed Bloom hits). Same demo-scale
   * caveat: a real deployment passes fixed eval files as bench.
   */
  def decontaminateBloomQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val prefix6 = concat_ws(" ", slice(split(col("text"), " "), 1, 6))
    val planted = docs.filter(col("doc_id") % 17 =!= 0).as("t")
      .join(broadcast(bench.select((col("doc_id") / 17).cast("long").as("b3"),
        prefix6.as("p6"))), (col("doc_id") % 3) === col("b3"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 23 === 5 && col("p6").isNotNull,
          concat(col("text"), lit(" "), col("p6"))).otherwise(col("text")).as("text"))
    val (words, m) = fit(bench, "text", GramWidth)
    graft.FixtureExport.ensure(s"bloom:$sfDir", BitsExportPath) {
      import spark.implicits._
      val pos = words.iterator.zipWithIndex.flatMap { case (w, wi) =>
        (0 until 64).iterator.filter(b => (w >>> b & 1L) == 1L)
          .map(b => wi.toLong * 64 + b)
      }.toSeq
      pos.toDF("pos").coalesce(1).write.mode("overwrite").parquet(BitsExportPath)
      Seq((m.toLong, NumProbes)).toDF("m", "k")
        .coalesce(1).write.mode("overwrite").parquet(ParamsExportPath)
      val grams = array_distinct(shingles(tokens(col("text")), GramWidth))
      planted.select(explode(grams).as("g")).distinct()
        .select(col("g"), gramH1(col("g")).as("h1"), gramH2(col("g")).as("h2"))
        .coalesce(1).write.mode("overwrite").parquet(GramHashExportPath)
    }
    decontaminateBloom(planted, "doc_id", "text", GramWidth, words, m)
  }

  /** Full-probe replay: planted corpus rebuilt in SQL, gram hashes
    * from the fixture, probe positions re-derived with the reduced
    * double-hash arithmetic, membership = all k positions present in
    * the set-bit fixture. */
  val decontaminateBloomSql: String =
    s"""WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0),
       |planted AS (
       |  SELECT t.doc_id,
       |    CASE WHEN t.doc_id % 23 = 5 AND b.doc_id IS NOT NULL
       |         THEN t.text || ' ' ||
       |              array_to_string(string_split(b.text, ' ')[1:6], ' ')
       |         ELSE t.text END AS text
       |  FROM documents t LEFT JOIN bench b ON b.doc_id = (t.doc_id % 3) * 17
       |  WHERE t.doc_id % 17 <> 0),
       |p AS (SELECT m, k FROM read_parquet('$ParamsExportPath/*.parquet')),
       |bits AS (SELECT pos FROM read_parquet('$BitsExportPath/*.parquet')),
       |gh AS (SELECT g, h1, h2 FROM read_parquet('$GramHashExportPath/*.parquet')),
       |gr AS (
       |  SELECT doc_id,
       |    list_distinct(CASE WHEN len(toks) >= 5 THEN
       |        list_transform(range(1, len(toks) - 3),
       |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])
       |      ELSE [array_to_string(toks, ' ')] END) AS gs
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM planted)),
       |ex AS (SELECT doc_id, len(gs) AS n_ngrams, unnest(gs) AS g FROM gr),
       |probe AS (
       |  SELECT e.doc_id, e.g,
       |    ((gh.h1 % p.m) + p.m) % p.m AS d1,
       |    (((gh.h2 % p.m) + p.m) % p.m) | 1 AS d2, p.m, p.k
       |  FROM ex e JOIN gh USING (g) CROSS JOIN p),
       |pp AS (
       |  SELECT doc_id, g, k, (d1 + i.i * d2) & (m - 1) AS pos
       |  FROM probe, generate_series(0, 10) i(i) WHERE i.i < k),
       |hit AS (
       |  SELECT doc_id, g, COUNT(b.pos) = ANY_VALUE(k) AS inb
       |  FROM pp LEFT JOIN bits b USING (pos) GROUP BY doc_id, g),
       |agg AS (
       |  SELECT doc_id, COUNT(*) FILTER (WHERE inb) AS n_hits
       |  FROM hit GROUP BY doc_id)
       |SELECT g.doc_id, CAST(len(g.gs) AS INTEGER) AS n_ngrams,
       |  CAST(COALESCE(a.n_hits, 0) AS BIGINT) AS n_hits,
       |  CAST(COALESCE(a.n_hits, 0) > 0 AS INTEGER) AS contaminated
       |FROM gr g LEFT JOIN agg a USING (doc_id)""".stripMargin
}
