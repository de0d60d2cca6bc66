package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * HTML → text extraction — the raw-ingest rung BEFORE
 * [[graft.sources.WetFiles]]: WET segments carry Common-Crawl's
 * already-extracted text, but a pipeline ingesting raw WARC responses
 * (or any scraped HTML) has to do the extraction itself. This is the
 * boilerplate-light core of that pass: drop non-content containers
 * (`<script>`/`<style>` with their bodies), strip the remaining
 * markup, decode the five standard entities, and collapse whitespace —
 * plus the two structural signals curation filters want from markup
 * before it is thrown away (the `<title>`, the link count; link
 * DENSITY is a classic boilerplate discriminator feeding
 * [[TextFilters.qualityFilter]]-style rules downstream). Links are
 * counted on the script/style-STRIPPED markup (an anchor inside a
 * script body is not a navigation link) with a case-insensitive
 * whitespace-tolerant pattern — `<A\nhref=...>` is still a link.
 *
 * Plan: a single map-only projection — a regexp_replace chain, all
 * whole-stage codegen, no UDF, no shuffle. Every regex sticks to the
 * syntax common to Java regex and RE2 (`(?s)`, `(?i)`, non-greedy
 * `.*?`, character classes) so the DuckDB oracle replays the identical
 * chain.
 * Entity decode order: `&lt;/&gt;/&quot;/&#39;` first, `&amp;` LAST
 * (the standard order — decoding `&amp;` first would re-decode
 * `&amp;lt;` into `<`).
 */
object HtmlExtract {

  /** Drop `<script>`/`<style>` containers WITH their bodies. */
  private def stripContainers(html: Column): Column =
    regexp_replace(
      regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " "),
      "(?s)<style[^>]*>.*?</style>", " ")

  /** Tag-strip / entity-decode / whitespace-collapse over
    * container-stripped markup. */
  private def extractStripped(stripped: Column): Column = {
    val noTags = regexp_replace(stripped, "<[^>]+>", " ")
    val ent = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(noTags,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"), "&amp;", "&")
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Append (title, n_links, text_clean) to any frame with an HTML
    * column, dropping the markup — the composition point for raw-WARC
    * ingest ([[graft.sources.WarcFiles]]), which carries its own
    * status/byte-count columns through. */
  def appendExtraction(df: DataFrame, htmlCol: String): DataFrame = {
    val h = col(htmlCol)
    df
      .withColumn("__shtml", stripContainers(h))
      .withColumn("title", regexp_extract(h, "<title>([^<]*)</title>", 1))
      .withColumn("n_links",
        size(regexp_extract_all(col("__shtml"), lit("(?i)<a[\\s>]"), lit(0))))
      .withColumn("text_clean", extractStripped(col("__shtml")))
      .drop("__shtml", htmlCol)
  }

  /**
   * Extraction report over an HTML column: title, link count, and the
   * extracted text. Output: (doc_id, title, n_links, text_clean).
   */
  def htmlExtract(docs: DataFrame, idCol: String, htmlCol: String): DataFrame =
    appendExtraction(
      docs.select(col(idCol).as("doc_id"), col(htmlCol).as("__html")), "__html")

  /**
   * The synthetic corpus is plain text, so the query PLANTS the HTML
   * wrapper (mirrored verbatim in the oracle): head with title +
   * script + style, the document text in a `<p>`, entity-encoded
   * punctuation, and doc_id-modulated nav links so the link count
   * varies (the boilerplate-density signal both outcomes need).
   * Shared with the raw-WARC roundtrip, whose response bodies carry
   * the same planted markup.
   */
  def planted(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(col("doc_id"),
      concat(
        lit("<html><head><title>Doc "), col("doc_id"),
        lit("</title><script type=\"text/javascript\">var x = 1 < 2;</script>"),
        lit("<style>.nav { color: red }</style></head><body><h1>Doc "), col("doc_id"),
        lit("</h1><p>"), col("text"),
        lit(" &amp; more &lt;tags&gt; &quot;quoted&quot; &#39;s</p>"),
        lit("<a href=\"/home\">home</a>"),
        when(col("doc_id") % 3 === 0,
          lit("<a href=\"/a\">a</a><a href=\"/b\">b</a>")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          lit("<div class=\"nav\"><a href=\"/c\">c</a></div>")).otherwise(lit("")),
        lit("</body></html>")).as("html"))

  def htmlExtractQuery(spark: SparkSession, sfDir: String): DataFrame =
    htmlExtract(planted(spark, sfDir), "doc_id", "html")

  /** The planted-wrapper CTE, shared with the WARC roundtrip oracle. */
  private[graft] val plantedCte: String =
    """planted AS (
      |  SELECT doc_id,
      |    '<html><head><title>Doc ' || doc_id ||
      |    '</title><script type="text/javascript">var x = 1 < 2;</script>' ||
      |    '<style>.nav { color: red }</style></head><body><h1>Doc ' || doc_id ||
      |    '</h1><p>' || text ||
      |    ' &amp; more &lt;tags&gt; &quot;quoted&quot; &#39;s</p>' ||
      |    '<a href="/home">home</a>' ||
      |    CASE WHEN doc_id % 3 = 0 THEN '<a href="/a">a</a><a href="/b">b</a>' ELSE '' END ||
      |    CASE WHEN doc_id % 7 = 0 THEN '<div class="nav"><a href="/c">c</a></div>' ELSE '' END ||
      |    '</body></html>' AS html
      |  FROM documents)""".stripMargin

  /** Container-strip CTE (from `planted`) + the three extraction
    * columns, shared with the WARC roundtrip oracle. */
  private[graft] val strippedCte: String =
    """s AS (
      |  SELECT doc_id, html,
      |    regexp_replace(regexp_replace(html,
      |      '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
      |      '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS shtml
      |  FROM planted)""".stripMargin

  private[graft] val extractCols: String =
    """regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
      |  CAST(len(regexp_extract_all(shtml, '(?i)<a[\s>]')) AS INTEGER) AS n_links,
      |  trim(regexp_replace(regexp_replace(
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |      regexp_replace(shtml, '<[^>]+>', ' ', 'g'),
      |      '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
      |      '&#39;', '''', 'g'),
      |    '&amp;', '&', 'g'), '\s+', ' ', 'g')) AS text_clean""".stripMargin

  val htmlExtractSql: String =
    s"""WITH $plantedCte,
       |$strippedCte
       |SELECT doc_id,
       |  $extractCols
       |FROM s""".stripMargin
}
