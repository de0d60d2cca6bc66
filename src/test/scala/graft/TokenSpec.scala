package graft

import org.apache.spark.sql.functions._

import graft.crypto.{QueryTokens, VersionedCrypto}
import graft.index.LshIndex
import graft.lsh.{Lsh, LshParams}
import graft.query.AnnQuery

/** Encrypted query tokens: the serving side sees codes + ciphertext
  * only, and the end-to-end token path returns exactly the plaintext
  * path's top-k. */
class TokenSpec extends SparkSpecBase {

  lazy val emb = Tables.embeddings(spark, sf)
  lazy val model = Lsh.fit(emb, "embedding", LshParams())
  lazy val built = LshIndex.build(LshIndex.codes(emb, "vec_id", "embedding", model), 64)

  test("token carries codes + ciphertext, no plaintext vector column") {
    val queries = emb.filter(col("vec_id") < 5)
    val (codes, meta) = QueryTokens.createTokens(queries, model, version = 1)
    assert(codes.columns.toSet == Set("qid", "t", "d", "key", "code"))
    assert(meta.columns.toSet == Set("qid", "kv", "iv", "ct", "dim"))
    assert(codes.count() == 5L * model.params.tables * model.params.divisions)
    // ciphertext length = iv(12) + 4 bytes/float + GCM tag(16)
    meta.collect().foreach { r =>
      assert(r.getAs[Array[Byte]]("ct").length == 12 + 4 * r.getInt(4) + 16)
    }
  }

  test("token-path top-k equals plaintext-path top-k") {
    val queries = emb.filter(col("vec_id") < 10)
    val encStore = VersionedCrypto.encrypt(emb, "vec_id", "embedding", 1)
    val (codes, meta) = QueryTokens.createTokens(queries, model, version = 1)
    val viaToken = QueryTokens.tokenTopK(spark, encStore, codes, meta, 10, model, built, 1)
    val plaintext = AnnQuery.lshTopK(spark, emb, queries, 10, model, built)
    assert(viaToken.exceptAll(plaintext).count() == 0)
    assert(plaintext.exceptAll(viaToken).count() == 0)
    assert(viaToken.count() == plaintext.count())
  }

  test("token-path respects soft deletes like the plaintext path") {
    import spark.implicits._
    val queries = emb.filter(col("vec_id") === 0)
    val encStore = VersionedCrypto.encrypt(emb, "vec_id", "embedding", 1)
    val (codes, meta) = QueryTokens.createTokens(queries, model, version = 1)
    val base = QueryTokens.tokenTopK(spark, encStore, codes, meta, 10, model, built, 1)
      .orderBy("rnk").collect()
    val victim = base(1).getLong(1)
    val deleted = Seq(victim).toDF("id")
    val after = QueryTokens.tokenTopK(spark, encStore, codes, meta, 10, model, built, 1,
      Some(deleted)).orderBy("rnk").collect()
    assert(after.length == 10 && !after.map(_.getLong(1)).contains(victim))
  }
}
