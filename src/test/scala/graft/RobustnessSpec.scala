package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dedup.{Dedup, SignatureKernels}
import graft.index.LshIndex
import graft.lsh.{Lsh, LshParams}
import graft.query.AnnQuery
import graft.text.TextAnalysis

/** Degenerate-input behavior of the public operator surface. */
class RobustnessSpec extends SparkSpecBase {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sf)
  lazy val model = Lsh.fit(emb, "embedding", LshParams())

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  private def docsOf(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), docSchema)

  test("minhash/simhash pairs on an empty corpus are empty, not a crash") {
    val empty = docsOf()
    assert(Dedup.minhashPairs(empty, "doc_id", "text").count() == 0)
    assert(Dedup.simhashPairs(empty, "doc_id", "text").count() == 0)
  }

  test("single- and sub-shingle-width texts produce one whole-text shingle") {
    val docs = docsOf((1L, "hello"), (2L, "two words"), (3L, "hello"))
    val sh = docs.select(col("doc_id"),
      Dedup.shingles(Dedup.tokens(col("text")), 3).as("sh")).collect()
    sh.foreach(r => assert(r.getSeq[String](1).size == 1))
    // identical short docs still pair up
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 3L)))
  }

  test("signature kernels on empty arrays: defined, stable values") {
    val empty = new GenericArrayData(Array.empty[Any])
    val mh = SignatureKernels.minhash(empty, 8)
    (0 until 8).foreach(i => assert(mh.getLong(i) == Long.MaxValue))
    assert(SignatureKernels.simhash(empty) == 0L)
  }

  test("lsh fit on an empty vector set fails fast with a clear message") {
    val ex = intercept[IllegalArgumentException] {
      Lsh.fit(emb.filter(col("vec_id") < 0), "embedding", LshParams())
    }
    assert(ex.getMessage.contains("empty sample"))
  }

  test("ann queries with an empty query set return empty results") {
    val built = LshIndex.build(LshIndex.codes(emb, "vec_id", "embedding", model), 64)
    val noQueries = emb.filter(col("vec_id") < 0)
    assert(AnnQuery.lshTopK(spark, emb, noQueries, 10, model, built).count() == 0)
    assert(AnnQuery.bruteTopK(emb, noQueries, 10).count() == 0)
  }

  test("brute top-k with k beyond corpus size returns the whole corpus ranked") {
    val tiny = emb.filter(col("vec_id") < 5)
    val res = AnnQuery.bruteTopK(tiny, tiny.filter(col("vec_id") === 0), 100)
    assert(res.count() == 5)
  }

  test("neardup pairs on tiny/singleton corpora: empty, not a crash") {
    val e1 = emb.filter(col("vec_id") === 0).select("vec_id", "embedding")
    val cents = graft.query.IvfSearch.fitCentroids(e1, 4)
    assert(Dedup.neardupPairs(e1, cents, 2, 20).count() == 0)
    val e2 = emb.filter(col("vec_id") < 2).select("vec_id", "embedding")
    assert(Dedup.neardupPairs(e2, graft.query.IvfSearch.fitCentroids(e2, 4), 2, 20)
      .count() == 1) // the single pair
  }

  test("dsir with an empty target set degrades to the uniform prior, one verdict per doc") {
    import graft.operators.Dsir
    import org.apache.spark.sql.functions.col
    val docs = docsOf((1L, "aa bb"), (2L, "cc dd"), (3L, "aa cc"))
    val out = Dsir.dsirSelect(docs, "doc_id", "text", org.apache.spark.sql.functions.lit(false))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every doc gets a finite weight (target model = pure add-1 prior)
    assert(out.size == 3, out.toString)
    assert(out.values.forall(w => !w.isNaN && !w.isInfinite), out.toString)
  }

  test("lm_score_5gram with an empty train band reports the 0.0 sentinel everywhere") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = docsOf((1L, "a b c d e f"), (2L, "x"))
    val out = TextAnalysis.lmScore5gram(docs, "doc_id", "text", lit(false))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // no training evidence: position counts are still exact, scores
    // fall to the sentinel rather than crashing or emitting NaN
    assert(out(1L) == ((2L, 0.0)), out.toString)
    assert(out(2L) == ((0L, 0.0)), out.toString)
  }

  test("token decrypt under the wrong key version fails loudly, not silently") {
    val built = LshIndex.build(LshIndex.codes(emb, "vec_id", "embedding", model), 64)
    val queries = emb.filter(col("vec_id") < 2)
    val encStore = graft.crypto.VersionedCrypto.encrypt(emb, "vec_id", "embedding", 1)
    val (codes, meta) = graft.crypto.QueryTokens.createTokens(queries, model, version = 1)
    // wrong version -> AES-GCM tag mismatch surfaces as an error
    intercept[Exception] {
      graft.crypto.QueryTokens.tokenTopK(spark, encStore, codes, meta, 5, model, built,
        version = 2).collect()
    }
  }

  test("malformed config fails fast; unknown profile names are rejected") {
    intercept[Exception](graft.config.GraftConfig.parse("not json"))
    intercept[Exception](graft.config.GraftConfig.parse("[1, 2]"))
    intercept[IllegalArgumentException](
      graft.config.GraftConfig.parse("""{"profiles": []}""", Some("missing")))
  }

  test("gt loader on a malformed ivecs dir fails with a clear message") {
    val dir = "/root/repo/target/tmp/robust-gt"
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    }
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve("bad.ivecs"), Array[Byte](1, 2, 3)) // truncated
    intercept[Exception](graft.query.GtFile.loadGt(spark, dir).collect())
  }

  test("text analysis handles empty and whitespace-free strings") {
    val docs = docsOf((1L, ""), (2L, "word"), (3L, "a b"))
    val lang = TextAnalysis.langId(docs, "doc_id", "text").collect()
    assert(lang.length == 3) // no crash, deterministic output
    val counts = docs.select(col("doc_id"),
      size(split(col("text"), " ")).as("n")).collect()
    assert(counts.forall(_.getInt(1) >= 1)) // split("") -> [""], documented Spark behavior
  }

  test("unigram counter on empty/whitespace/symbol-only docs: zero or per-char, never a crash") {
    import org.apache.spark.unsafe.types.UTF8String
    val m = graft.text.Unigram.UnigramModel(
      Array("a" -> -2.0, "b" -> -2.5), spmStyle = false)
    val rt = m.runtime
    assert(graft.text.UnigramKernels.countTokens(UTF8String.fromString(""), rt) == 0)
    assert(graft.text.UnigramKernels.countTokens(UTF8String.fromString("   \t\n"), rt) == 0)
    // symbols are their own pretokens; unknown -> one penalized piece each
    assert(graft.text.UnigramKernels.countTokens(UTF8String.fromString("!!"), rt) == 2)
    // empty fit input fails fast like Lsh.fit, not mid-EM
    val empty = docsOf()
    intercept[Exception](graft.text.Unigram.fit(empty, "text", 32))
  }

  test("SQ encode with a constant dimension: delta 0 -> code 0, recon = vmin, no NaN") {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rows = Seq(
      Row(0L, Seq(1.0f, 5.0f)), Row(1L, Seq(1.0f, 7.0f)), Row(2L, Seq(1.0f, 6.0f)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val (vmin, delta) = graft.query.SqSearch.fitParams(df)
    assert(delta(0) == 0.0 && vmin(0) == 1.0)
    val codes = df.select(col("vec_id"),
      graft.query.SqSearch.sqCodes(col("embedding"), vmin, delta).as("c")).collect()
    assert(codes.forall(_.getSeq[Int](1).head == 0), "constant dim must encode to 0")
    val recon = df.select(graft.query.SqSearch.sqRecon(
        graft.query.SqSearch.sqCodes(col("embedding"), vmin, delta), vmin, delta).as("r"))
      .collect()
    recon.foreach { r =>
      val v = r.getSeq[Double](0)
      assert(v.head == 1.0 && !v.exists(_.isNaN), s"bad recon $v")
    }
  }

  test("host_stats on a single-URL corpus: one host row that accounts for everything") {
    val urls = Seq((1L, "https://www.example.com/p?x=1", "aaaa"),
        (2L, "http://example.com/p", "bb"))
      .toDF("doc_id", "url", "text")
    val out = graft.text.UrlFilter.hostStats(urls).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "example.com")
    assert(r.getLong(1) == 2 && r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(r.getDouble(6) == 1.0, "single host owns the whole corpus share")
  }
}
