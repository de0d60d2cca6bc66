package graft

import org.apache.spark.sql.functions._

import graft.crypto.{KeyLifecycle, VersionedCrypto}
import graft.index.LshIndex
import graft.lsh.{Lsh, LshParams}
import graft.query.{AnnQuery, Decoys}

class LifecycleDecoySpec extends SparkSpecBase {

  lazy val emb = Tables.embeddings(spark, sf)

  test("key usage tracks records per version; deletable only when unreferenced") {
    val store = VersionedCrypto.encrypt(emb, "vec_id", "embedding", 1)
    val touched = emb.filter(col("vec_id") < 100).select(col("vec_id").as("id"))
    val rotated = VersionedCrypto.rotate(store, touched, 1).cache()
    val usage = KeyLifecycle.keyUsage(rotated).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(usage(1) == emb.count() - 100 && usage(2) == 100)
    // v1 still referenced -> not deletable
    assert(KeyLifecycle.deletableVersions(rotated, currentVersion = 2).isEmpty)
    // rotate everything else -> v1 drains, becomes deletable
    val rest = rotated.filter(col("kv") === 1).select("id")
    val drained = VersionedCrypto.rotate(rotated, rest, 1)
    assert(KeyLifecycle.deletableVersions(drained, currentVersion = 2) == Seq(1))
    assert(KeyLifecycle.rotationDue(rotated, 1, maxOps = 10))
    assert(!KeyLifecycle.rotationDue(rotated, 1, maxOps = 1000000))
  }

  test("decoy queries run the identical plan and strip cleanly from results") {
    val model = Lsh.fit(emb, "embedding", LshParams())
    val built = LshIndex.build(LshIndex.codes(emb, "vec_id", "embedding", model), 64)
    val real = emb.filter(col("vec_id") < 5)
    val mixed = Decoys.inject(spark, real, dim = 64, nDecoys = 3, seed = 99)
    assert(mixed.count() == 8)
    val results = AnnQuery.lshTopK(spark, emb, mixed, 10, model, built).cache()
    val decoyRows = results.filter(col("query_id") < 0).count()
    assert(decoyRows > 0, "decoys must produce server-side results like real queries")
    val stripped = Decoys.strip(results)
    assert(stripped.filter(col("query_id") < 0).count() == 0)
    // stripping decoys leaves real results untouched
    val realOnly = AnnQuery.lshTopK(spark, emb, real, 10, model, built)
    assert(stripped.exceptAll(realOnly).count() == 0)
    assert(realOnly.exceptAll(stripped).count() == 0)
  }

  test("fake corpus points index and serve like real ones, then strip from results") {
    val padded = Decoys.injectPoints(spark, emb, dim = 64, nFakes = 50, seed = 7)
    assert(padded.count() == emb.count() + 50)
    val model = Lsh.fit(padded, "embedding", LshParams())
    val built = LshIndex.build(LshIndex.codes(padded, "vec_id", "embedding", model), 64)
    // fakes are indexed (obfuscation: the stored set is padded)
    assert(built.membership.filter(col("id") < 0).count() == 50L * 24)
    val queries = emb.filter(col("vec_id") < 5)
    val results = AnnQuery.lshTopK(spark, padded, queries, 10, model, built)
    val clean = Decoys.stripPoints(results)
    assert(clean.filter(col("vec_id") < 0).count() == 0)
    // real self-match survives the padding
    clean.filter(col("rnk") === 1).collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("decoy distributions: uniform and gaussian both serve and strip; empty input safe") {
    val model = Lsh.fit(emb, "embedding", LshParams())
    val built = LshIndex.build(LshIndex.codes(emb, "vec_id", "embedding", model), 64)
    val real = emb.filter(col("vec_id") < 5)
    for (dist <- Seq("gaussian", "uniform", "clustered")) {
      val mixed = Decoys.inject(spark, real, dim = 64, nDecoys = 3, seed = 99, dist)
      assert(mixed.count() == 8, dist)
      val results = AnnQuery.lshTopK(spark, emb, mixed, 10, model, built)
      val stripped = Decoys.strip(results)
      assert(stripped.filter(col("query_id") < 0).count() == 0, dist)
      val realOnly = AnnQuery.lshTopK(spark, emb, real, 10, model, built)
      assert(stripped.exceptAll(realOnly).count() == 0
        && realOnly.exceptAll(stripped).count() == 0, dist)
    }
    // uniform components live in [-1, 1]; the gaussian tail exceeds it
    val uni = Decoys.inject(spark, real.limit(0), 8, 50, 31L, "uniform")
      .select(explode(col("embedding")).as("c"))
    assert(uni.filter(abs(col("c")) > 1).count() == 0)
    val gau = Decoys.inject(spark, real.limit(0), 8, 50, 31L, "gaussian")
      .select(explode(col("embedding")).as("c"))
    assert(gau.filter(abs(col("c")) > 1).count() > 0)
    intercept[IllegalArgumentException](
      Decoys.inject(spark, real, 8, 1, 1L, "bogus"))
    // empty input + metadata columns: fakes still match the schema
    val emptyPadded = Decoys.injectPoints(spark, emb.limit(0), dim = 64,
      nFakes = 5, seed = 7, distribution = "uniform")
    assert(emptyPadded.count() == 5)
    assert(emptyPadded.filter(col("vec_id") < 0 && col("label").isNull).count() == 5)
  }

  test("fake corpus points carry blend-in metadata and feed the filtered path") {
    val padded = Decoys.injectPoints(spark, emb, dim = 64, nFakes = 20, seed = 7)
    // metadata columns survive injection, and fakes carry real-looking
    // (borrowed, non-null) values rather than give-away nulls
    assert(padded.columns.contains("label"))
    assert(padded.filter(col("vec_id") < 0 && col("label").isNull).count() == 0)
    val realLabels = emb.select("label").distinct().collect().map(_.getInt(0)).toSet
    padded.filter(col("vec_id") < 0).select("label").collect()
      .foreach(r => assert(realLabels.contains(r.getInt(0))))
    // the padded corpus runs the metadata-filtered exact search unchanged
    val queries = emb.filter(col("vec_id") < 3)
    val res = AnnQuery.bruteTopKSameLabel(padded, queries, 5)
    assert(res.count() == 15)
    assert(Decoys.stripPoints(res).filter(col("vec_id") < 0).count() == 0)
  }
}
