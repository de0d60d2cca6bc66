package graft

import org.apache.spark.sql.functions._

import graft.crypto.VersionedCrypto

class CryptoSpec extends SparkSpecBase {

  lazy val emb = Tables.embeddings(spark, sf)

  test("encrypt -> decrypt roundtrips vectors exactly") {
    val store = VersionedCrypto.encrypt(emb, "vec_id", "embedding", 1)
    val back = VersionedCrypto.decrypt(store, 1)
      .select(col("id").as("vec_id"), col("vec"))
    val joined = emb.select(col("vec_id"), col("embedding")).join(back, "vec_id")
    val bad = joined.filter(not(col("embedding") === col("vec"))).count()
    assert(bad == 0)
    assert(joined.count() == emb.count())
  }

  test("key schedule: versions derive distinct keys; ciphertexts differ across versions") {
    val k1 = VersionedCrypto.deriveKey(VersionedCrypto.MasterKeyHex, 1)
    val k2 = VersionedCrypto.deriveKey(VersionedCrypto.MasterKeyHex, 2)
    assert(!k1.sameElements(k2))
    assert(k1.length == 16)
    val one = emb.filter(col("vec_id") === 0)
    val c1 = VersionedCrypto.encrypt(one, "vec_id", "embedding", 1).select("ct").head().getAs[Array[Byte]](0)
    val c2 = VersionedCrypto.encrypt(one, "vec_id", "embedding", 2).select("ct").head().getAs[Array[Byte]](0)
    assert(!c1.sameElements(c2))
  }

  test("decrypt with the wrong version key fails (GCM authentication)") {
    val store = VersionedCrypto.encrypt(emb.limit(1), "vec_id", "embedding", 1)
    intercept[Exception] {
      VersionedCrypto.decrypt(store, 2).collect()
    }
  }

  test("aad binds ciphertext to id: swapped id fails to decrypt") {
    val store = VersionedCrypto.encrypt(emb.limit(1), "vec_id", "embedding", 1)
      .withColumn("id", col("id") + 1)
    intercept[Exception] {
      VersionedCrypto.decrypt(store, 1).collect()
    }
  }

  test("forward-security loop: query-touched ids from real lookups drive rotation") {
    import graft.index.LshIndex
    import graft.lsh.{Lsh, LshParams}
    import graft.query.AnnQuery
    val model = Lsh.fit(emb, "embedding", LshParams())
    val built = LshIndex.build(LshIndex.codes(emb, "vec_id", "embedding", model), 64)
    // a single query with probe budget 1 touches few blocks
    val narrow = model.copy(params = model.params.copy(maxProbes = 1))
    val queries = emb.filter(col("vec_id") === 0)
    val touched = AnnQuery.touchedIds(spark, queries, narrow, built).cache()
    val nTouched = touched.count()
    assert(nTouched > 0 && nTouched <= emb.count(), s"touched=$nTouched out of range")
    val store = VersionedCrypto.encrypt(emb, "vec_id", "embedding", 1)
    val rotated = VersionedCrypto.rotate(store, touched, 1)
    assert(rotated.filter(col("kv") === 2).count() == nTouched)
    assert(rotated.count() == emb.count())
  }

  test("selective re-encryption touches exactly the touched set; untouched bytes identical") {
    val store = VersionedCrypto.encrypt(emb, "vec_id", "embedding", 1).cache()
    val touched = emb.filter(col("vec_id") % 10 === 0).select(col("vec_id").as("id"))
    val rotated = VersionedCrypto.rotate(store, touched, 1).cache()
    assert(rotated.count() == store.count())
    assert(rotated.filter(col("kv") === 2).count() == touched.count())
    // untouched rows carried over byte-identical
    val diff = rotated.filter(col("kv") === 1).select("id", "ct")
      .join(store.select(col("id"), col("ct").as("ct0")), "id")
      .filter(not(col("ct") === col("ct0"))).count()
    assert(diff == 0)
    // rotated rows still decrypt to the original vectors under v2
    val back = VersionedCrypto.decrypt(rotated.filter(col("kv") === 2), 2)
      .select(col("id").as("vec_id"), col("vec"))
    val bad = emb.join(back, "vec_id").filter(not(col("embedding") === col("vec"))).count()
    assert(bad == 0)
  }
}
