package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.operators.Chunking

/** doc_chunk schedule math + reconstruction, and JSONL escaping. */
class ChunkJsonlSpec extends SparkSpecBase {

  private def mkDocs(ns: Seq[Int]) = {
    import spark.implicits._
    ns.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("chunk schedule: counts, starts and sizes match the ceil formula") {
    // (n_tokens, expected (start, n_tok) schedule) for C=64, S=48
    val cases = Seq(
      1 -> Seq((0, 1)),
      64 -> Seq((0, 64)),
      65 -> Seq((0, 64), (48, 17)),
      112 -> Seq((0, 64), (48, 64)),
      113 -> Seq((0, 64), (48, 64), (96, 17)),
      200 -> Seq((0, 64), (48, 64), (96, 64), (144, 56)))
    val out = Chunking.chunk(mkDocs(cases.map(_._1)), "doc_id", "text")
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "start_tok", "n_tok").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(r => (r.getInt(1), r.getInt(2))).toSeq)
    cases.zipWithIndex.foreach { case ((n, want), i) =>
      assert(out(i.toLong) == want, s"n=$n")
    }
  }

  test("chunks reconstruct the document: first chunk + post-overlap tails") {
    val docs = mkDocs(Seq(1, 64, 65, 113, 200, 301))
    val rebuilt = Chunking.chunk(docs, "doc_id", "text")
      .orderBy("doc_id", "chunk_id").collect()
      .groupBy(_.getLong(0)).view.mapValues { rows =>
        rows.sortBy(_.getInt(1)).map { r =>
          val toks = r.getString(4).split(" ", -1)
          // every chunk after the first re-covers the previous chunk's
          // tail from its own start; new content begins where the
          // previous chunk ended
          val prevEnd = if (r.getInt(1) == 0) 0
            else (r.getInt(1) - 1) * Chunking.ChunkStride + Chunking.ChunkTokens
          toks.drop((prevEnd - r.getInt(2)).max(0)).mkString(" ")
        }.filter(_.nonEmpty).mkString(" ")
      }
    docs.collect().foreach { r =>
      assert(rebuilt(r.getLong(0)) == r.getString(1), s"doc ${r.getLong(0)}")
    }
  }

  test("doc_chunk is map-only (no exchange) and stays codegen'd") {
    val p = SparkEntry.queries("doc_chunk")(spark, sf)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Exchange"), s"doc_chunk must not shuffle:\n$p")
    assert(p.contains("codegen id"), s"doc_chunk should stay codegen'd:\n$p")
  }

  test("jsonl roundtrip survives newlines, quotes, backslashes and unicode") {
    import spark.implicits._
    val tricky = Seq(
      (1L, "a", "en", "line one\nline two"),
      (2L, "b", "de", "she said \"hi\" \\ done"),
      (3L, "c", "fr", "caf\u00e9 \u4e2d\u6587 \t tabbed"),
      (4L, "d", "es", ""))
    val dir = "/root/repo/target/tmp/jsonl-spec"
    graft.util.Io.deleteRecursively(dir)
    tricky.toDF("doc_id", "source", "lang", "text")
      .write.mode("overwrite").json(dir)
    val back = spark.read.schema("doc_id LONG, source STRING, lang STRING, text STRING")
      .json(dir).as[(Long, String, String, String)].collect().toSet
    assert(back == tricky.toSet)
  }

  test("jsonl_roundtrip entry: payload hash matches the source table") {
    val out = SparkEntry.queries("jsonl_roundtrip")(spark, sf)
    val direct = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("lang"),
        length(col("text")).as("n_chars"), sha2(col("text"), 256).as("text_sha"))
    assert(out.exceptAll(direct).isEmpty && direct.exceptAll(out).isEmpty)
  }
}
