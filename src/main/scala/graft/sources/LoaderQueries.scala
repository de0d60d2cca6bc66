package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Roundtrip queries for the vector-file loaders: deterministic data is
 * exported in each format (two files, to exercise the multi-file
 * global-id prefix sum), read back through [[VecFiles]], and reduced
 * to per-row scalars a DuckDB oracle can recompute directly from the
 * embeddings table.
 *
 * The export side is driver-side and test-scale by design (the
 * loaders are the ingest path; export of .fvecs exists in the
 * reference only for eval dumps).
 */
object LoaderQueries {

  private def tmpDir(kind: String, sfDir: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    s"/root/repo/target/tmp/vecs/$tag/$kind"
  }

  private def clean(dir: String): Unit = graft.util.Io.deleteRecursively(dir)

  /** Split rows across two files to exercise cross-file id assignment. */
  private def twoFiles[T](dir: String, ext: String, rows: Array[Array[T]])(
      write: (String, Iterator[Array[T]]) => Unit): Unit = {
    clean(dir)
    val (a, b) = rows.splitAt(rows.length / 2)
    write(s"$dir/part-000.$ext", a.iterator)
    write(s"$dir/part-001.$ext", b.iterator)
  }

  private def summary(df: DataFrame, vec: String, asDouble: Boolean): DataFrame = {
    val v = if (asDouble) col(vec).cast("array<double>") else col(vec).cast("array<bigint>")
    val sum = aggregate(v, lit(0.0).cast(if (asDouble) "double" else "bigint"),
      (acc, x) => acc + x)
    df.select(
      col("id"),
      size(col(vec)).as("dim"),
      (if (asDouble) round(sum, 3) else sum.cast("bigint")).as("v_sum"),
      (if (asDouble) round(element_at(v, 1), 4) else element_at(v, 1)).as("v_first"),
      (if (asDouble) round(element_at(v, -1), 4) else element_at(v, -1)).as("v_last"))
  }

  def fvecsRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = tmpDir("fvecs", sfDir)
    val rows = Tables.embeddings(spark, sfDir).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    twoFiles(dir, "fvecs", rows)(VecFiles.writeFvecs)
    summary(VecFiles.fvecs(spark, dir), "vec", asDouble = true)
  }

  val fvecsRoundtripSql: String =
    """SELECT vec_id AS id, CAST(len(embedding) AS INTEGER) AS dim,
      |  ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 3) + 0.0 AS v_sum,
      |  ROUND(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS v_first,
      |  ROUND(CAST(embedding[-1] AS DOUBLE), 4) + 0.0 AS v_last
      |FROM embeddings""".stripMargin

  def csvVectors(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = tmpDir("csv", sfDir)
    clean(dir)
    val rows = Tables.embeddings(spark, sfDir).orderBy("vec_id")
      .select("vec_id", "embedding").collect()
    Files.createDirectories(Paths.get(dir))
    val dim = rows.head.getSeq[Float](1).size
    val w = Files.newBufferedWriter(Paths.get(s"$dir/vectors.csv"))
    try rows.foreach { r =>
      w.write(r.getLong(0).toString)
      r.getSeq[Float](1).foreach { x => w.write(","); w.write(x.toString) }
      w.write("\n")
    } finally w.close()
    summary(VecFiles.csv(spark, dir, dim).withColumnRenamed("vec", "v"), "v", asDouble = true)
  }

  val csvVectorsSql: String = fvecsRoundtripSql

  /** bvecs payload: vec[j] = (id + j) % 256, dim 16 — uint8-exact. */
  def bvecsRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = tmpDir("bvecs", sfDir)
    val n = Tables.embeddings(spark, sfDir).count().toInt
    val rows = Array.tabulate(n)(i => Array.tabulate(16)(j => (i + j) % 256))
    twoFiles(dir, "bvecs", rows)(VecFiles.writeBvecs)
    summary(VecFiles.bvecs(spark, dir), "vec", asDouble = false)
  }

  val bvecsRoundtripSql: String =
    """SELECT vec_id AS id, 16 AS dim,
      |  CAST(list_aggregate(list_transform(range(0, 16), j -> (vec_id + j) % 256), 'sum') AS BIGINT) AS v_sum,
      |  CAST(vec_id % 256 AS BIGINT) AS v_first,
      |  CAST((vec_id + 15) % 256 AS BIGINT) AS v_last
      |FROM embeddings""".stripMargin

  /**
   * JSONL roundtrip — the de-facto interchange format for training
   * corpora (one JSON object per line). The documents table is written
   * as JSONL by Spark's DISTRIBUTED json sink (one file per partition;
   * at 100 TB this is the same plan, just more partitions) and read
   * back through the json source with an explicit schema (schema
   * inference would cost a second full pass at scale). The summary
   * hashes the text so the oracle checks the payload survived JSON
   * escaping (newlines, quotes, unicode) byte-for-byte.
   */
  def jsonlRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = tmpDir("jsonl", sfDir)
    clean(dir)
    Tables.documents(spark, sfDir).select("doc_id", "source", "lang", "text")
      .write.mode("overwrite").json(dir)
    spark.read.schema("doc_id LONG, source STRING, lang STRING, text STRING")
      .json(dir)
      .select(col("doc_id"), col("source"), col("lang"),
        length(col("text")).as("n_chars"),
        sha2(col("text"), 256).as("text_sha"))
  }

  val jsonlRoundtripSql: String =
    """SELECT doc_id, source, lang, CAST(len(text) AS INTEGER) AS n_chars,
      |  sha256(text) AS text_sha
      |FROM documents""".stripMargin

  /**
   * WARC/WET roundtrip — the Common Crawl extracted-text ingest path:
   * the documents table is written as two WET segments (warcinfo
   * preamble + one `conversion` record per doc, byte-accurate
   * Content-Length) and read back through [[WetFiles]]; doc ids are
   * recovered from the WARC-Target-URI. The payload hash pins the
   * Content-Length-driven parse byte-for-byte (text containing
   * header-like lines must survive).
   */
  def wetRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = tmpDir("wet", sfDir)
    val rows = Tables.documents(spark, sfDir).orderBy("doc_id")
      .select("doc_id", "text").collect()
      .map(r => (s"http://corpus.example/doc/${r.getLong(0)}", r.getString(1)))
    clean(dir)
    Files.createDirectories(Paths.get(dir))
    val (a, b) = rows.splitAt(rows.length / 2)
    WetFiles.writeWet(s"$dir/seg-000.wet", a.iterator)
    WetFiles.writeWet(s"$dir/seg-001.wet", b.iterator)
    WetFiles.wet(spark, dir)
      .select(regexp_extract(col("uri"), "doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        length(col("text")).as("n_chars"),
        sha2(col("text"), 256).as("text_sha"))
  }

  val wetRoundtripSql: String =
    """SELECT doc_id, CAST(len(text) AS INTEGER) AS n_chars,
      |  sha256(text) AS text_sha
      |FROM documents""".stripMargin

  /**
   * Raw WARC roundtrip — the rung below [[wetRoundtrip]]: the
   * documents table, wrapped in [[graft.text.HtmlExtract]]'s planted
   * markup, is written as two `.warc` segments of HTTP `response`
   * records (every fifth body stored `Transfer-Encoding: chunked` at a
   * 100-byte frame size, so multi-byte UTF-8 splits across chunk
   * boundaries), interleaved with `warcinfo`/`request` records and two
   * gate decoys (an `image/png` response and a 404); read back through
   * [[WarcFiles]], status/content-type gated, de-chunked, decoded, and
   * composed into the html_extract chain. The oracle replays the
   * planted wrapper + extraction directly over `documents` — every
   * ingest-side step (record skip, gate, de-chunk, header split) must
   * be exactly invisible for the hash to match.
   */
  def warcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.charset.StandardCharsets.UTF_8
    val dir = tmpDir("warc", sfDir)
    val rows = graft.text.HtmlExtract.planted(spark, sfDir).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    clean(dir)
    Files.createDirectories(Paths.get(dir))
    def recs(part: Array[(Long, String)]) = part.iterator.map { case (id, html) =>
      (s"http://corpus.example/page/$id", 200, "text/html; charset=utf-8",
        html.getBytes(UTF_8), if (id % 5 == 0) 100 else 0)
    } ++ Iterator(
      ("http://corpus.example/logo.png", 200, "image/png",
        Array[Byte](0x89.toByte, 'P', 'N', 'G'), 0),
      ("http://corpus.example/missing", 404, "text/html; charset=utf-8",
        "<html><body>gone</body></html>".getBytes(UTF_8), 0))
    val (a, b) = rows.splitAt(rows.length / 2)
    WarcFiles.writeWarc(s"$dir/seg-000.warc", recs(a))
    WarcFiles.writeWarc(s"$dir/seg-001.warc", recs(b))
    val html = WarcFiles.htmlResponses(WarcFiles.warc(spark, dir))
      .select(regexp_extract(col("uri"), "page/([0-9]+)$", 1).cast("long").as("doc_id"),
        col("http_status"), col("n_bytes"), col("html"))
    graft.text.HtmlExtract.appendExtraction(html, "html")
  }

  val warcRoundtripSql: String =
    s"""WITH ${graft.text.HtmlExtract.plantedCte},
       |${graft.text.HtmlExtract.strippedCte}
       |SELECT doc_id, CAST(200 AS INTEGER) AS http_status,
       |  CAST(strlen(html) AS INTEGER) AS n_bytes,
       |  ${graft.text.HtmlExtract.extractCols}
       |FROM s""".stripMargin

  /** ivecs payload: vec[j] = id * 3 + j, dim 8 (ground-truth id lists shape). */
  def ivecsRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = tmpDir("ivecs", sfDir)
    val n = Tables.embeddings(spark, sfDir).count().toInt
    val rows = Array.tabulate(n)(i => Array.tabulate(8)(j => i * 3 + j))
    twoFiles(dir, "ivecs", rows)(VecFiles.writeIvecs)
    summary(VecFiles.ivecs(spark, dir), "vec", asDouble = false)
  }

  val ivecsRoundtripSql: String =
    """SELECT vec_id AS id, 8 AS dim,
      |  CAST(vec_id * 3 * 8 + 28 AS BIGINT) AS v_sum,
      |  CAST(vec_id * 3 AS BIGINT) AS v_first,
      |  CAST(vec_id * 3 + 7 AS BIGINT) AS v_last
      |FROM embeddings""".stripMargin
}
