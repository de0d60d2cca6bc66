package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.sources.{WarcFiles, WetFiles}

class WarcFilesSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/tmp/spec-warc/$name"
    graft.util.Io.deleteRecursively(d)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
    d
  }

  // Tricky payloads: a body whose lines LOOK like WARC/HTTP framing, a
  // multi-byte UTF-8 body, an empty body.
  private val adversarial = Seq(
    ("http://x/a", 200, "text/html; charset=utf-8",
      "<html><body>WARC/1.0\r\nWARC-Type: response\r\nHTTP/1.1 500 Oops\r\nContent-Length: 999\r\n\r\nnot a record</body></html>"),
    ("http://x/b", 200, "text/html",
      "<html><body>naïve — 日本語テキスト €5 𝄞</body></html>"),
    ("http://x/c", 200, "text/html", ""))

  test("response records roundtrip byte-exactly, framing-like body lines survive") {
    val dir = tmp("adversarial")
    WarcFiles.writeWarc(s"$dir/seg.warc",
      adversarial.iterator.map { case (u, s, c, b) => (u, s, c, b.getBytes(UTF_8), 0) })
    val got = WarcFiles.parseResponses(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/seg.warc"))).toSeq
    assert(got.map(_.uri) == adversarial.map(_._1))
    assert(got.map(r => new String(r.body, UTF_8)) == adversarial.map(_._4))
    assert(got.forall(_.status == 200))
  }

  test("chunked transfer-encoding reassembles across UTF-8 split boundaries") {
    val text = "é" * 151 + " 𝄞 end" // 2-byte chars guarantee mid-char chunk splits
    val dir = tmp("chunked")
    for (chunk <- Seq(1, 7, 100)) {
      WarcFiles.writeWarc(s"$dir/c$chunk.warc", Iterator(
        (s"http://x/chunk$chunk", 200, "text/html", text.getBytes(UTF_8), chunk)))
      val got = WarcFiles.parseResponses(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/c$chunk.warc"))).toSeq
      assert(got.size == 1)
      assert(new String(got.head.body, UTF_8) == text, s"chunk size $chunk")
    }
  }

  test("dechunk handles extensions and ignores trailers") {
    val wire = "5;ext=1\r\nhello\r\n6\r\n world\r\n0\r\nX-Trailer: t\r\n\r\n"
    assert(new String(WarcFiles.dechunk(wire.getBytes(UTF_8)), UTF_8) == "hello world")
  }

  test("warcinfo/request records and non-html/non-200 responses are gated out") {
    val dir = tmp("gate")
    WarcFiles.writeWarc(s"$dir/seg.warc", Iterator(
      ("http://x/keep", 200, "text/html; charset=utf-8", "<html>k</html>".getBytes(UTF_8), 0),
      ("http://x/img", 200, "image/png", Array[Byte](0x89.toByte, 'P'), 0),
      ("http://x/gone", 404, "text/html", "<html>g</html>".getBytes(UTF_8), 0)))
    val all = WarcFiles.warc(spark, dir)
    // request records are written per doc and must be skipped by type:
    assert(all.count() == 3)
    val html = WarcFiles.htmlResponses(all)
    assert(html.select("uri").as[String](spark.implicits.newStringEncoder).collect()
      .toSeq == Seq("http://x/keep"))
    assert(html.select("html").head().getString(0) == "<html>k</html>")
  }

  test("WARC response path and WET path agree on equivalent content") {
    // same five documents through both ingest rungs; after the WARC
    // side's html_extract, the text must equal what WET carried.
    val docs = Tables.documents(spark, sf).orderBy("doc_id").limit(5)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val wetDir = tmp("eq-wet")
    WetFiles.writeWet(s"$wetDir/seg.wet", docs.iterator.map { case (id, t) =>
      (s"http://corpus.example/doc/$id", t)
    })
    val warcDir = tmp("eq-warc")
    WarcFiles.writeWarc(s"$warcDir/seg.warc", docs.iterator.map { case (id, t) =>
      // minimal wrapper: text in a <p>, no entities, so extract == text
      (s"http://corpus.example/doc/$id", 200, "text/html",
        s"<html><body><p>$t</p></body></html>".getBytes(UTF_8),
        if (id % 2 == 0) 64 else 0)
    })
    val viaWet = WetFiles.wet(spark, wetDir)
      .select(regexp_extract(col("uri"), "doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        col("text"))
    val viaWarc = graft.text.HtmlExtract.appendExtraction(
      WarcFiles.htmlResponses(WarcFiles.warc(spark, warcDir))
        .select(regexp_extract(col("uri"), "doc/([0-9]+)$", 1).cast("long").as("doc_id"),
          col("html")), "html")
      .select(col("doc_id"), col("text_clean"))
    // html_extract collapses whitespace; apply the same collapse to the WET text
    val wetNorm = viaWet.select(col("doc_id"),
      trim(regexp_replace(col("text"), "\\s+", " ")).as("text_clean"))
    assert(viaWarc.except(wetNorm).count() == 0 && wetNorm.except(viaWarc).count() == 0)
    assert(viaWarc.count() == 5)
  }

  test("n_links counts case-insensitive whitespace-separated anchors on stripped markup only") {
    import spark.implicits._
    val html =
      "<html><head><script>var s = '<a href=x>'; // <a inside script\n</script></head>" +
        "<body><A\nhref=\"/up\">Up</A><a href=\"/one\">one</a><a></a></body></html>"
    val out = graft.text.HtmlExtract.htmlExtract(
      Seq((1L, html)).toDF("id", "html"), "id", "html")
    // the two real anchors + the bare <a>; the one inside <script> must not count
    assert(out.select("n_links").head().getInt(0) == 3)
  }
}
