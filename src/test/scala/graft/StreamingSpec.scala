package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.index.LshIndex
import graft.lsh.{Lsh, LshParams}
import graft.streaming.StreamingIngest

class StreamingSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/tmp/streaming/$name"
    val p = Paths.get(d)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    }
    Files.createDirectories(p)
    d
  }

  test("streaming query serving returns exactly the batch plan's top-k per micro-batch") {
    val emb = Tables.embeddings(spark, sf)
    val model = Lsh.fit(emb, "embedding", LshParams())
    val built = LshIndex.build(LshIndex.codes(emb, "vec_id", "embedding", model), 64)
    val in = tmp("serve-in")
    val out = tmp("serve-out")
    val ckpt = tmp("serve-ckpt")
    val queries = emb.filter(col("vec_id") < 8)
    // queries arrive in two files (micro-batch boundaries may differ; results must not)
    queries.filter(col("vec_id") < 4).write.mode("overwrite").parquet(s"$in/q")
    queries.filter(col("vec_id") >= 4).write.mode("append").parquet(s"$in/q")
    val q = graft.streaming.AnnServe.serve(
      graft.streaming.AnnServe.queryStream(spark, s"$in/q", emb.schema),
      emb, 10, model, built, out, ckpt)
    assert(q.awaitTermination(120000), "serve stream did not finish in time")
    val served = spark.read.parquet(out).drop("batch_id")
    val batch = graft.query.AnnQuery.lshTopK(spark, emb, queries, 10, model, built)
    assert(served.count() == batch.count())
    assert(served.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(served).count() == 0)
  }

  test("diversified streaming serving equals the batch MMR-over-LSH twin across micro-batches") {
    val emb = Tables.embeddings(spark, sf)
    val model = Lsh.fit(emb, "embedding", LshParams())
    val built = LshIndex.build(LshIndex.codes(emb, "vec_id", "embedding", model), 64)
    val in = tmp("diverse-in")
    val out = tmp("diverse-out")
    val ckpt = tmp("diverse-ckpt")
    val queries = emb.filter(col("vec_id") < 8)
    queries.filter(col("vec_id") < 4).write.mode("overwrite").parquet(s"$in/q")
    queries.filter(col("vec_id") >= 4).write.mode("append").parquet(s"$in/q")
    val q = graft.streaming.AnnServe.serveDiverse(
      graft.streaming.AnnServe.queryStream(spark, s"$in/q", emb.schema),
      emb, model, built, 15, 5, out, ckpt)
    assert(q.awaitTermination(120000), "diverse serve stream did not finish in time")
    val served = spark.read.parquet(out).drop("batch_id")
    val batch = graft.query.MmrRerank.diverseTopKLsh(
      spark, emb, queries, model, built, 15, 5)
    assert(served.count() == 8 * 5)
    assert(served.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(served).count() == 0)
  }

  test("streaming IVF-PQ serving equals the batch serving plan across micro-batches") {
    val emb = Tables.embeddings(spark, sf)
    val idx = graft.query.PqSearch.buildIndex(spark, sf)
    val in = tmp("pqserve-in")
    val out = tmp("pqserve-out")
    val ckpt = tmp("pqserve-ckpt")
    val queries = emb.filter(col("vec_id") < 8)
    queries.filter(col("vec_id") < 4).write.mode("overwrite").parquet(s"$in/q")
    queries.filter(col("vec_id") >= 4).write.mode("append").parquet(s"$in/q")
    val q = graft.streaming.AnnServe.servePq(
      graft.streaming.AnnServe.queryStream(spark, s"$in/q", emb.schema),
      idx, 10, out, ckpt)
    assert(q.awaitTermination(120000), "pq serve stream did not finish in time")
    val served = spark.read.parquet(out).drop("batch_id")
    val batch = graft.query.PqSearch.topKForQueries(spark,
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
      idx.cells, idx.codes, idx.fetch, idx.cents, idx.cb, 10)
    assert(served.count() == batch.count())
    assert(served.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(served).count() == 0)
    idx.cells.unpersist(); idx.codes.unpersist()
    ()
  }

  test("streaming BQ serving equals the batch serving plan across micro-batches") {
    val emb = Tables.embeddings(spark, sf)
    val thr = graft.query.BqSearch.fittedThresholds(spark, sf)
    val idx = graft.query.BqSearch.buildIndex(emb, thr)
    val in = tmp("bqserve-in")
    val out = tmp("bqserve-out")
    val ckpt = tmp("bqserve-ckpt")
    val queries = emb.filter(col("vec_id") < 8)
    queries.filter(col("vec_id") < 4).write.mode("overwrite").parquet(s"$in/q")
    queries.filter(col("vec_id") >= 4).write.mode("append").parquet(s"$in/q")
    val q = graft.streaming.AnnServe.serveBq(
      graft.streaming.AnnServe.queryStream(spark, s"$in/q", emb.schema),
      idx, out, ckpt)
    assert(q.awaitTermination(120000), "bq serve stream did not finish in time")
    val served = spark.read.parquet(out).drop("batch_id")
    val batch = graft.query.BqSearch.topKForQueries(queries, idx)
    assert(served.count() == batch.count())
    assert(served.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(served).count() == 0)
    idx.codes.unpersist()
    ()
  }

  test("streaming SQ8 serving equals the batch serving plan across micro-batches") {
    val emb = Tables.embeddings(spark, sf)
    val cents = graft.query.IvfSearch.fitCentroids(emb, 16, Some("sqserve-cents"))
    val (vmin, delta) = graft.query.SqSearch.fittedParams(spark, sf)
    val idx = graft.query.SqSearch.buildIndexOn(spark, emb, cents, vmin, delta)
    val in = tmp("sqserve-in")
    val out = tmp("sqserve-out")
    val ckpt = tmp("sqserve-ckpt")
    val queries = emb.filter(col("vec_id") < 8)
    queries.filter(col("vec_id") < 4).write.mode("overwrite").parquet(s"$in/q")
    queries.filter(col("vec_id") >= 4).write.mode("append").parquet(s"$in/q")
    val q = graft.streaming.AnnServe.serveSq(
      graft.streaming.AnnServe.queryStream(spark, s"$in/q", emb.schema),
      idx, out, ckpt)
    assert(q.awaitTermination(120000), "sq serve stream did not finish in time")
    val served = spark.read.parquet(out).drop("batch_id")
    val batch = graft.query.SqSearch.ivfsqTopKForQueries(spark, queries,
      idx.cells, idx.dvecs, idx.fetch, idx.cents, None)
    assert(served.count() == batch.count())
    assert(served.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(served).count() == 0)
  }

  test("a tombstone published between micro-batches takes effect from the next batch") {
    val emb = Tables.embeddings(spark, sf)
    val idx = graft.query.PqSearch.buildIndex(spark, sf)
    val in = tmp("tomb-in"); val out = tmp("tomb-out"); val ckpt = tmp("tomb-ckpt")
    val queries = emb.filter(col("vec_id") < 6)
    // one file per micro-batch; batch 0 = queries 0-2, batch 1 = 3-5
    queries.filter(col("vec_id") < 3).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/q/b=000")
    queries.filter(col("vec_id") >= 3).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/q/b=001")
    import spark.implicits._
    val dead = Seq(4L, 7L, 11L).toDF("id")
    val ref = new graft.streaming.AnnServe.TombstoneRef()
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/q/b=*")
    val q = graft.streaming.AnnServe.servePq(stream, idx, 10, out, ckpt,
      tombstones = ref,
      afterBatch = { id => if (id == 0) ref.deleted = Some(dead) })
    assert(q.awaitTermination(120000), "tombstone serve stream did not finish")
    val served = spark.read.parquet(out)
    // batch 0 planned BEFORE the publish: the live index, dead ids servable
    val b0 = served.filter(col("batch_id") === 0)
    assert(b0.select("query_id").distinct().count() == 3)
    // batch 1 planned AFTER: no dead id appears, results == tombstoned batch plan
    val b1 = served.filter(col("batch_id") === 1).drop("batch_id")
    assert(b1.filter(col("vec_id").isin(4L, 7L, 11L)).count() == 0,
      "published tombstones must not be served from the next batch on")
    val want = graft.query.PqSearch.topKForQueries(spark,
      queries.filter(col("vec_id") >= 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv")),
      idx.cells, idx.codes, idx.fetch, idx.cents, idx.cb, 10, Some(dead))
    assert(b1.exceptAll(want).count() == 0 && want.exceptAll(b1).count() == 0)
    idx.cells.unpersist(); idx.codes.unpersist()
    ()
  }

  test("streaming token serving equals batch tokenTopK across micro-batches") {
    val emb = Tables.embeddings(spark, sf)
    val model = Lsh.fit(emb, "embedding", LshParams())
    val built = LshIndex.build(LshIndex.codes(emb, "vec_id", "embedding", model), 64)
    val in = tmp("tserve-in")
    val out = tmp("tserve-out")
    val ckpt = tmp("tserve-ckpt")
    val queries = emb.filter(col("vec_id") < 6)
    val encStore = graft.crypto.VersionedCrypto.encrypt(emb, "vec_id", "embedding", 1)
    val (codes, meta) = graft.crypto.QueryTokens.createTokens(queries, model, version = 1)
    // tokens arrive as two files; a token's code rows stay together
    codes.filter(col("qid") < 3).coalesce(1).write.mode("overwrite").parquet(s"$in/c")
    codes.filter(col("qid") >= 3).coalesce(1).write.mode("append").parquet(s"$in/c")
    val codeStream = spark.readStream.schema(codes.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/c")
    val q = graft.streaming.AnnServe.serveTokens(
      codeStream, meta, encStore, 10, model, built, 1, out, ckpt)
    assert(q.awaitTermination(120000), "token serve stream did not finish in time")
    val served = spark.read.parquet(out).drop("batch_id")
    val batch = graft.crypto.QueryTokens.tokenTopK(
      spark, encStore, codes, meta, 10, model, built, 1)
    assert(served.count() == batch.count())
    assert(served.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(served).count() == 0)
  }

  test("file-stream ingest LSH-codes vectors identically to the batch path") {
    val emb = Tables.embeddings(spark, sf)
    val model = Lsh.fit(emb, "embedding", LshParams())
    val in = tmp("ingest-in")
    val out = tmp("ingest-out")
    val ckpt = tmp("ingest-ckpt")
    // stage the corpus as two arriving batches
    emb.filter(col("vec_id") < 250).write.mode("overwrite").parquet(s"$in/b0")
    emb.filter(col("vec_id") >= 250).write.mode("append").parquet(s"$in/b0")
    val schema = emb.schema
    val q = StreamingIngest.codedVectorStream(spark, s"$in/b0", model, schema)
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out)
    val batch = LshIndex.codes(emb, "vec_id", "embedding", model)
    assert(streamed.count() == batch.count())
    // identical (id, t, d, key) sets
    val diff = streamed.select("id", "t", "d", "key")
      .exceptAll(batch.select("id", "t", "d", "key")).count()
    assert(diff == 0)
  }

  test("watermarked windowed aggregation matches the batch twin per closed window") {
    val events = Tables.events(spark, sf)
    val in = tmp("events-in")
    val ckpt = tmp("events-ckpt")
    val out = tmp("events-out")
    events.write.mode("overwrite").parquet(s"$in/b0")
    val stream = spark.readStream.schema(spark.read.parquet(s"$in/b0").schema)
      .parquet(s"$in/b0")
    val q = StreamingIngest.windowedEventCounts(stream)
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out)
    val batch = events
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")), 2).cast("double").as("sum_value"))
    // append mode emits only windows closed by the watermark; every
    // emitted window must agree exactly with the batch aggregate
    val joined = streamed.join(batch.withColumnRenamed("n_events", "n_b")
        .withColumnRenamed("sum_value", "s_b"), Seq("hour_start", "event_type"))
    assert(streamed.count() > 0)
    assert(joined.count() == streamed.count())
    assert(joined.filter(col("n_events") =!= col("n_b") || col("sum_value") =!= col("s_b")).count() == 0)
  }
}
