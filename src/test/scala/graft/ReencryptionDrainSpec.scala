package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.crypto.VersionedCrypto
import graft.streaming.ReencryptionDrain

/** The lazy background re-encryption drain: rate-limited batched
  * migration that converges to exactly the one-shot rotation, and a
  * load gate that defers (never drops) touched ids. */
class ReencryptionDrainSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/tmp/reencdrain/$name"
    val p = Paths.get(d)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    }
    Files.createDirectories(p)
    d
  }

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val store = VersionedCrypto.encrypt(emb, "vec_id", "embedding", 1).cache()
  private lazy val touched = emb.filter(col("vec_id") % 10 === 0)
    .select(col("vec_id").as("id"))

  test("batched drain converges to the one-shot rotation, one batch per id file") {
    val in = tmp("in"); val ckpt = tmp("ckpt"); val out = tmp("out")
    // three id files = three rate-limited micro-batches
    touched.filter(col("id") % 3 === 0).coalesce(1).write.mode("append").parquet(in)
    touched.filter(col("id") % 3 === 1).coalesce(1).write.mode("append").parquet(in)
    touched.filter(col("id") % 3 === 2).coalesce(1).write.mode("append").parquet(in)
    val q = ReencryptionDrain.drain(
      ReencryptionDrain.touchedStream(spark, in, maxFilesPerTrigger = 1),
      store, fromVersion = 1, out, ckpt, in)
    q.awaitTermination(120000)
    val migrations = spark.read.parquet(out)
    // rate limiting took effect: the touched set migrated across > 1 batch
    assert(migrations.select("batch_id").distinct().count() >= 2)
    // the served view equals the one-shot selective rotation exactly
    val served = ReencryptionDrain.servedStore(store, migrations)
    val oneShot = VersionedCrypto.rotate(store, touched, 1)
    assert(served.exceptAll(oneShot).count() == 0)
    assert(oneShot.exceptAll(served).count() == 0)
    // stats: running total reaches the touched count
    val stats = ReencryptionDrain.drainStats(migrations).collect()
    assert(stats.last.getLong(2) == touched.count())
  }

  test("load gate defers ids back into the stream instead of dropping them") {
    val in = tmp("gin"); val out = tmp("gout")
    touched.coalesce(1).write.mode("append").parquet(in)
    // run 1: gate closed the whole run -> nothing migrates, ids re-emitted
    val q1 = ReencryptionDrain.drain(
      ReencryptionDrain.touchedStream(spark, in),
      store, 1, out, tmp("gckpt1"), in, loadGate = () => true)
    q1.awaitTermination(120000)
    assert(!Files.list(Paths.get(out)).iterator().hasNext,
      "gated run must migrate nothing")
    assert(Files.list(Paths.get(in)).count() > 1,
      "gated run must re-emit its ids into the watched dir")
    // run 2 (fresh checkpoint): gate open -> the re-emitted ids drain fully
    val q2 = ReencryptionDrain.drain(
      ReencryptionDrain.touchedStream(spark, in),
      store, 1, out, tmp("gckpt2"), in, loadGate = () => false)
    q2.awaitTermination(120000)
    val migrations = spark.read.parquet(out)
    assert(migrations.select("id").distinct().count() == touched.count())
    val served = ReencryptionDrain.servedStore(store, migrations)
    val oneShot = VersionedCrypto.rotate(store, touched, 1)
    assert(served.exceptAll(oneShot).count() == 0)
    assert(oneShot.exceptAll(served).count() == 0)
  }
}
