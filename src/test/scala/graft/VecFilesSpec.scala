package graft

import org.apache.spark.sql.functions._

import graft.sources.VecFiles

class VecFilesSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/tmp/spec-vecs/$name"
    val p = java.nio.file.Paths.get(d)
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    }
    d
  }

  test("fvecs roundtrip is bit-exact and ids are globally sequential across files") {
    val emb = Tables.embeddings(spark, sf).orderBy("vec_id")
    val rows = emb.select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val dir = tmp("fvecs")
    val (a, b) = rows.splitAt(123) // uneven split on purpose
    VecFiles.writeFvecs(s"$dir/a.fvecs", a.iterator)
    VecFiles.writeFvecs(s"$dir/b.fvecs", b.iterator)
    val back = VecFiles.fvecs(spark, dir)
    assert(back.count() == rows.length)
    // exact float equality, joined on position id == vec_id
    val bad = emb.select(col("vec_id").as("id"), col("embedding"))
      .join(back, "id")
      .filter(not(col("embedding") === col("vec"))).count()
    assert(bad == 0)
    // ids dense 0..n-1
    assert(back.agg(min("id"), max("id"), countDistinct("id")).head() ==
      org.apache.spark.sql.Row(0L, rows.length - 1L, rows.length.toLong))
  }

  test("distributed fvecs export roundtrips without vector bytes on the driver") {
    val emb = Tables.embeddings(spark, sf)
    val dir = tmp("fvecs-dist")
    VecFiles.writeFvecsDistributed(emb, "vec_id", "embedding", dir, numFiles = 3)
    val parts = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).count()
    assert(parts >= 2, s"expected multiple part files, got $parts")
    val back = VecFiles.fvecs(spark, dir)
    val n = emb.count()
    assert(back.count() == n)
    // loader ids are positional in file order; the writer's range
    // partitioning + within-partition sort makes that exactly vec_id order
    val bad = emb.select(col("vec_id").cast("long").as("id"), col("embedding"))
      .join(back, "id")
      .filter(not(col("embedding") === col("vec"))).count()
    assert(bad == 0)
  }

  test("distributed bvecs export roundtrips through the loader") {
    import spark.implicits._
    val dir = tmp("bvecs-dist")
    // full uint8 range across a few hundred vectors, uneven last file
    val df = (0 until 500).map(i =>
      (i.toLong, Array.tabulate(8)(j => (i * 31 + j * 97) % 256)))
      .toDF("vec_id", "vec")
    VecFiles.writeBvecsDistributed(df, "vec_id", "vec", dir, numFiles = 3)
    val parts = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).count()
    assert(parts >= 2, s"expected multiple part files, got $parts")
    val back = VecFiles.bvecs(spark, dir)
    assert(back.count() == 500)
    val bad = df.select(col("vec_id").as("id"), col("vec").as("want"))
      .join(back, "id")
      .filter(not(col("want") === col("vec"))).count()
    assert(bad == 0)
  }

  test("bvecs: uint8 values survive (0..255)") {
    val dir = tmp("bvecs")
    val rows = Array.tabulate(10)(i => Array.tabulate(4)(j => (i * 67 + j * 63) % 256))
    VecFiles.writeBvecs(s"$dir/x.bvecs", rows.iterator)
    val got = VecFiles.bvecs(spark, dir).orderBy("id").collect()
      .map(_.getSeq[Int](1).toArray)
    assert(got.length == 10)
    got.zip(rows).foreach { case (g, w) => assert(g.sameElements(w)) }
    assert(got.flatten.forall(x => x >= 0 && x <= 255))
  }

  test("ivecs: int32 values survive including negatives") {
    val dir = tmp("ivecs")
    val rows = Array(Array(1, -2, Int.MaxValue), Array(Int.MinValue, 0, 7))
    VecFiles.writeIvecs(s"$dir/x.ivecs", rows.iterator)
    val got = VecFiles.ivecs(spark, dir).orderBy("id").collect().map(_.getSeq[Int](1).toArray)
    got.zip(rows).foreach { case (g, w) => assert(g.sameElements(w)) }
  }

  test("csv loader parses id + float columns") {
    val dir = tmp("csv")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/v.csv"),
      "0,1.5,-2.25\n1,0.125,3.0\n")
    val got = VecFiles.csv(spark, dir, 2).orderBy("id").collect()
    assert(got(0).getSeq[Float](1) == Seq(1.5f, -2.25f))
    assert(got(1).getSeq[Float](1) == Seq(0.125f, 3.0f))
  }

  test("wet roundtrip: warcinfo skipped; header-like and multi-byte payloads intact") {
    val dir = tmp("wet")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val tricky = Seq(
      // payload containing a WARC version line and header-shaped text:
      // Content-Length-driven parsing must not resplit on it
      ("http://a/1", "WARC/1.0\r\nWARC-Type: conversion\r\n\r\nfake inner record"),
      // multi-byte UTF-8: Content-Length counts BYTES, not chars
      ("http://a/2", "café 中文 naïve"),
      ("http://a/3", ""),
      ("http://a/4", "plain text line\nsecond line"))
    graft.sources.WetFiles.writeWet(s"$dir/seg.wet", tricky.iterator)
    val got = graft.sources.WetFiles.wet(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sortBy(_._1)
    assert(got == tricky.sortBy(_._1), s"roundtrip mismatch: $got")
  }

  test("wet entry: ids recovered from URIs, hashes equal the source table") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("wet_roundtrip")(spark, sf)
    val direct = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("n_chars"),
        sha2(col("text"), 256).as("text_sha"))
    assert(out.exceptAll(direct).isEmpty && direct.exceptAll(out).isEmpty)
  }
}
