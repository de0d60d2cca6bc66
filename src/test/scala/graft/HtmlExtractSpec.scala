package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.HtmlExtract

/** HTML → text extraction: hand-built tricky documents, then
  * structural invariants on the planted entry. */
class HtmlExtractSpec extends SparkSpecBase {

  private def html(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, h) => Row(id, h) }, 2),
      StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("html", StringType, nullable = false))))

  test("scripts and styles drop WITH their bodies; tags strip; entities decode") {
    val doc =
      """<html><head><title>T &amp; U</title>
        |<script>if (a < b && c > d) { alert("x"); }</script>
        |<style>p { margin: 0 }</style></head>
        |<body><p>Hello &lt;world&gt; &amp; friends.</p>
        |<a href="/x">go</a></body></html>""".stripMargin
    val r = HtmlExtract.htmlExtract(html((1L, doc)), "doc_id", "html").head()
    assert(r.getString(1) == "T &amp; U") // title is the RAW slice (decode is a text-side concern)
    assert(r.getInt(2) == 1)
    assert(r.getString(3) == "T & U Hello <world> & friends. go",
      s"got: '${r.getString(3)}'")
  }

  test("script body containing markup-like text does not leak") {
    val doc = """<body><script type="module">var s = "<p>not content</p>";</script><p>real</p></body>"""
    val r = HtmlExtract.htmlExtract(html((1L, doc)), "doc_id", "html").head()
    assert(r.getString(3) == "real")
    assert(r.getInt(2) == 0)
  }

  test("link counting: bare <a>, attributed <a href>, no false positives on <abbr>") {
    val doc = """<p><a>one</a> <a href="/x">two</a> <abbr>nope</abbr></p>"""
    val r = HtmlExtract.htmlExtract(html((1L, doc)), "doc_id", "html").head()
    assert(r.getInt(2) == 2)
    assert(r.getString(3) == "one two nope")
  }

  test("planted entry: titles match doc_id, link count follows the modulus, text survives") {
    val got = HtmlExtract.htmlExtractQuery(spark, sf)
    val rows = got.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == s"Doc $id")
      val expLinks = 1 + (if (id % 3 == 0) 2 else 0) + (if (id % 7 == 0) 1 else 0)
      assert(r.getInt(2) == expLinks, s"doc $id")
      val t = r.getString(3)
      assert(!t.contains("<") || t.contains("<tags>"),
        s"only decoded entities may reintroduce angle brackets: $t")
      assert(!t.contains("var x"), "script body must not leak")
      assert(t.contains("\"quoted\"") && t.contains("'s"), "entities decode")
    }
    // the extraction is a single map-only projection: no exchange
    val plan = got.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), plan)
  }
}
