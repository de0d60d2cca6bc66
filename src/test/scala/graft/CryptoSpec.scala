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

  test("safe key deletion: versions with bound vectors are skipped, released versions deleted") {
    import spark.implicits._
    val store = VersionedCrypto.encrypt(emb, "vec_id", "embedding", 1)
    val touched = emb.filter(col("vec_id") % 2 === 0).select(col("vec_id").as("id"))
    val rotated = VersionedCrypto.rotate(store, touched, 1).cache()

    // before any purge: v1 still binds the odd ids -> NOT safe, NOT deleted
    // even though it is older than keepVersion
    val before = graft.crypto.KeyLifecycle.safeKeyDeletion(rotated, Seq(1, 2), keepVersion = 2)
      .as[(Int, Long, Int, Int)].collect().sortBy(_._1)
    val nOdd = emb.filter(col("vec_id") % 2 === 1).count()
    val nEven = emb.count() - nOdd
    assert(before(0) == ((1, nOdd, 0, 0)), s"v1 must be skipped while bound: ${before(0)}")
    assert(before(1) == ((2, nEven, 0, 0)))

    // after the odd ids are purged from the store, v1 is released -> deleted;
    // v2 is never a candidate (not < keepVersion) even when release-able
    val purged = rotated.filter(col("id") % 2 === 0)
    val after = graft.crypto.KeyLifecycle.safeKeyDeletion(purged, Seq(1, 2), keepVersion = 2)
      .as[(Int, Long, Int, Int)].collect().sortBy(_._1)
    assert(after(0) == ((1, 0L, 1, 1)), s"released v1 must delete: ${after(0)}")
    assert(after(1) == ((2, nEven, 0, 0)))

    // survivors still decrypt under v2 after v1 is gone (master-key
    // derivation does not depend on deleted session keys)
    val back = VersionedCrypto.decrypt(purged.filter(col("kv") === 2), 2)
      .select(col("id").as("vec_id"), col("vec"))
    val bad = emb.join(back, "vec_id").filter(not(col("embedding") === col("vec"))).count()
    assert(bad == 0)
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
