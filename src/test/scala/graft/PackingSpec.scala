package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends SparkSpecBase {
  import spark.implicits._

  private def report(rows: Seq[(Long, String, Int)], budget: Long) = {
    val docs = rows.toDF("doc_id", "lang", "nt")
      .select(col("doc_id"), col("lang"),
        // nt whitespace tokens exactly (nt-1 spaces)
        concat_ws(" ", array_repeat(lit("w"), col("nt").cast("int"))).as("text"))
    Packing.packEfficiency(docs, "lang", budget)
      .collect().map(r => r.getString(0) -> r).toMap
  }

  /** Reference: the same shard carve + exact greedy, sequentially. */
  private def refGreedy(rows: Seq[(Long, String, Int)], budget: Long,
      sortByLen: Boolean): Long = {
    val kept = rows.filter(_._3 <= budget)
    kept.groupBy(_._2).iterator.flatMap { case (_, docs) =>
      val lo = docs.map(_._1).min.toDouble
      val hi = docs.map(_._1).max.toDouble
      val span = hi - lo + 1.0
      docs.groupBy(d => math.min(
        math.floor((d._1 - lo) * Packing.PackBuckets / span).toLong,
        (Packing.PackBuckets - 1).toLong)).valuesIterator.map { shard =>
        val ordered =
          if (sortByLen) shard.sortBy(d => (-d._3, d._1)) else shard.sortBy(_._1)
        var packs = 0L; var fill = budget
        for (d <- ordered) {
          if (fill + d._3 <= budget) fill += d._3
          else { packs += 1; fill = d._3 }
        }
        packs
      }
    }.sum
  }

  /** Reference bounded-FFD: same shard carve, first-fit over
    * length-descending docs, FfdOpenBins live bins, fullest-first
    * eviction (first index on ties) — asserting every bin-capacity
    * invariant as it runs. */
  private def refFfd(rows: Seq[(Long, String, Int)], budget: Long): Long = {
    val kept = rows.filter(_._3 <= budget)
    kept.groupBy(_._2).iterator.flatMap { case (_, docs) =>
      val lo = docs.map(_._1).min.toDouble
      val hi = docs.map(_._1).max.toDouble
      val span = hi - lo + 1.0
      docs.groupBy(d => math.min(
        math.floor((d._1 - lo) * Packing.PackBuckets / span).toLong,
        (Packing.PackBuckets - 1).toLong)).valuesIterator.map { shard =>
        val bins = Array.fill(Packing.FfdOpenBins)(0L)
        var closed = 0L
        for (d <- shard.sortBy(x => (-x._3, x._1))) {
          val i = bins.indexWhere(_ + d._3 <= budget)
          if (i >= 0) bins(i) += d._3
          else {
            val m = bins.indexOf(bins.max)
            closed += 1
            bins(m) = d._3.toLong
          }
          assert(bins.forall(_ <= budget), "bin capacity invariant violated")
          assert(bins.count(_ > 0) <= Packing.FfdOpenBins)
        }
        closed + bins.count(_ > 0)
      }
    }.sum
  }

  test("ffd fold equals the sequential reference; capacity invariants hold") {
    val rows = (0L until 120L).map(i =>
      (i, if (i % 3 == 0) "en" else "de", (7 + (i * 13) % 60).toInt))
    val rep = report(rows, budget = 64)
    assert(rep("ffd_bounded").getAs[Long]("n_seqs") == refFfd(rows, 64),
      "Spark FFD fold must replay the sequential bounded-FFD exactly")
    // adversarial: many docs just over half-budget force evictions
    val tight = (0L until 80L).map(i => (i, "en", (33 + i % 31).toInt))
    val repT = report(tight, budget = 64)
    assert(repT("ffd_bounded").getAs[Long]("n_seqs") == refFfd(tight, 64))
    // and the token lower bound still holds
    val lb = math.ceil(repT("ffd_bounded").getAs[Long]("packed_tokens").toDouble / 64).toLong
    assert(repT("ffd_bounded").getAs[Long]("n_seqs") >= lb)
  }

  test("ffd_bounded never packs worse than next-fit-decreasing") {
    // entry corpus + two synthetic shapes
    val entry = Packing.packEfficiencyQuery(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(entry("ffd_bounded").getAs[Double]("pad_share") <=
      entry("greedy_sorted").getAs[Double]("pad_share"),
      "FFD must dominate the next-fit sorted strategy on the entry corpus")
    for (seed <- Seq(7, 23)) {
      val rows = (0L until 150L).map(i =>
        (i, "en", (5 + (i * seed) % 59).toInt))
      val rep = report(rows, budget = 64)
      assert(rep("ffd_bounded").getAs[Long]("n_seqs") <=
        rep("greedy_sorted").getAs[Long]("n_seqs"), s"seed $seed")
    }
  }

  test("seq_pack_ffd: capacity respected, dense ids, count reconciles with the knob table") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    val assigned = Packing.seqPackFfd(docs, "lang").cache()
    val sized = docs.select(col("doc_id"),
      graft.operators.Corpus.nTokens(col("text")).as("n"))
    // every pack's fill <= budget; no doc split (each doc exactly one row)
    val fills = assigned.join(sized, "doc_id")
      .groupBy("pack_id").agg(sum("n").as("fill"))
    assert(fills.filter(col("fill") > Packing.PackBudget).count() == 0,
      "a pack exceeds the budget")
    assert(assigned.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
    // dense global pack ids 0..n_packs-1
    val ids = assigned.select("pack_id").distinct()
    val nPacks = ids.count()
    assert(ids.agg(min("pack_id"), max("pack_id")).head() ==
      org.apache.spark.sql.Row(0L, nPacks - 1))
    // the assignment's pack count IS the knob table's ffd_bounded row
    val knob = Packing.packEfficiencyQuery(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_seqs")).toMap
    assert(nPacks == knob("ffd_bounded"),
      s"assignment packs $nPacks != knob-table ffd_bounded ${knob("ffd_bounded")}")
    // offsets: within a pack, offset ranges tile without overlap
    val overlap = assigned.join(sized, "doc_id")
      .select(col("pack_id"), col("pack_offset"), (col("pack_offset") + col("n")).as("end"))
      .as("a").join(assigned.join(sized, "doc_id")
        .select(col("pack_id"), col("pack_offset"), (col("pack_offset") + col("n")).as("end")).as("b"),
        col("a.pack_id") === col("b.pack_id") &&
          col("a.pack_offset") < col("b.pack_offset") &&
          col("a.end") > col("b.pack_offset"))
      .count()
    assert(overlap == 0, "documents overlap inside a pack")
    assigned.unpersist()
  }

  test("greedy fold equals the sequential reference, both orders") {
    // lengths engineered so doc order vs length order genuinely differ
    val rows = (0L until 90L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", (7 + (i * 13) % 60).toInt))
    val rep = report(rows, budget = 64)
    assert(rep("greedy_docwise").getAs[Long]("n_seqs") ==
      refGreedy(rows, 64, sortByLen = false))
    assert(rep("greedy_sorted").getAs[Long]("n_seqs") ==
      refGreedy(rows, 64, sortByLen = true))
  }

  test("overlong docs are excluded from greedy, kept by concat, and counted") {
    val rows = Seq((0L, "en", 10), (1L, "en", 200), (2L, "en", 20),
      (3L, "en", 30), (4L, "en", 15))
    val rep = report(rows, budget = 64)
    assert(rep("greedy_docwise").getAs[Long]("n_overlong") == 1L)
    assert(rep("greedy_sorted").getAs[Long]("n_overlong") == 1L)
    assert(rep("concat_chunk").getAs[Long]("n_overlong") == 0L)
    // concat packs ALL tokens; greedy skips the overlong doc's 200
    assert(rep("concat_chunk").getAs[Long]("packed_tokens") -
      rep("greedy_docwise").getAs[Long]("packed_tokens") == 200L)
  }

  test("accounting invariants: pad = grid - tokens; concat splits, greedy never") {
    val rep = report((0L until 200L).map(i =>
      (i, "en", (5 + (i * 7) % 40).toInt)), budget = 50)
    for ((_, r) <- rep) {
      assert(r.getAs[Long]("pad_tokens") ==
        r.getAs[Long]("n_seqs") * 50 - r.getAs[Long]("packed_tokens"))
      assert(r.getAs[Long]("pad_tokens") >= 0)
    }
    assert(rep("concat_chunk").getAs[Long]("n_split_docs") > 0)
    assert(rep("greedy_docwise").getAs[Long]("n_split_docs") == 0)
    // concat's padding is bounded by one partial sequence per stratum
    assert(rep("concat_chunk").getAs[Long]("pad_tokens") < 50)
  }

  test("entry corpus: trade-off table is coherent at sf0.001") {
    val rep = Packing.packEfficiencyQuery(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val concat = rep("concat_chunk"); val greedy = rep("greedy_docwise")
    val sorted = rep("greedy_sorted")
    // concat: near-zero pad, many splits; greedy: real pad, zero splits
    assert(concat.getAs[Double]("pad_share") < 0.05)
    assert(concat.getAs[Long]("n_split_docs") > 0)
    assert(greedy.getAs[Double]("pad_share") > concat.getAs[Double]("pad_share"))
    // sorted packing is the better document-preserving layout here
    assert(sorted.getAs[Long]("n_seqs") <= greedy.getAs[Long]("n_seqs"))
    // n_seqs can never beat the token lower bound
    val lb = math.ceil(greedy.getAs[Long]("packed_tokens").toDouble /
      Packing.PackBudget).toLong
    assert(greedy.getAs[Long]("n_seqs") >= lb)
  }
  test("degenerate inputs: all-overlong and single-doc corpora stay well-defined") {
    // every doc overlong: greedy packs nothing, concat still chunks
    val allOver = report(Seq((0L, "en", 500), (1L, "en", 600)), budget = 64)
    assert(allOver("greedy_docwise").getAs[Long]("n_overlong") == 2L)
    assert(allOver("greedy_docwise").getAs[Long]("packed_tokens") == 0L)
    assert(allOver("concat_chunk").getAs[Long]("packed_tokens") == 1100L)
    // a single tiny doc: one sequence everywhere, no splits
    val one = report(Seq((0L, "en", 5)), budget = 64)
    for ((_, r) <- one) assert(r.getAs[Long]("n_seqs") == 1L)
    assert(one("concat_chunk").getAs[Long]("n_split_docs") == 0L)
  }
  test("seq_pack_greedy: capacity respected, no splits, report-consistent") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    val assign = Packing.seqPackGreedy(docs, "lang").cache()
    val sized = docs.select(col("doc_id"),
      graft.operators.Corpus.nTokens(col("text")).as("n"))
    val withN = assign.join(sized, Seq("doc_id"))
    // every pack holds at most the budget; offsets are the exact
    // within-pack running sum (offset + n never exceeds the budget)
    assert(withN.filter(col("pack_offset") + col("n") > Packing.PackBudget).isEmpty)
    val fills = withN.groupBy("pack_id").agg(sum("n").as("fill"))
    assert(fills.filter(col("fill") > Packing.PackBudget).isEmpty)
    // each kept doc assigned exactly once; overlong docs absent
    assert(assign.groupBy("doc_id").count().filter(col("count") > 1).isEmpty)
    assert(assign.count() == sized.filter(col("n") <= Packing.PackBudget).count())
    // cross-entry invariant: the assignment's pack count equals the
    // knob table's greedy_docwise row (same corpus, same shards)
    val nPacks = assign.agg(max("pack_id")).head().getLong(0) + 1
    val reported = Packing.packEfficiencyQuery(spark, sf)
      .filter(col("strategy") === "greedy_docwise")
      .head().getAs[Long]("n_seqs")
    assert(nPacks == reported,
      s"assignment packs $nPacks must equal the report's $reported")
    // pack ids are globally dense: every id in [0, nPacks) occurs
    assert(assign.select("pack_id").distinct().count() == nPacks)
    assign.unpersist()
  }
}
