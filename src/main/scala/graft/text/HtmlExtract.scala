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
 * [[TextFilters.qualityFilter]]-style rules downstream).
 *
 * Plan: a single map-only projection — a regexp_replace chain, all
 * whole-stage codegen, no UDF, no shuffle. Every regex sticks to the
 * syntax common to Java regex and RE2 (`(?s)`, non-greedy `.*?`,
 * character classes) so the DuckDB oracle replays the identical chain.
 * Entity decode order: `&lt;/&gt;/&quot;/&#39;` first, `&amp;` LAST
 * (the standard order — decoding `&amp;` first would re-decode
 * `&amp;lt;` into `<`).
 */
object HtmlExtract {

  /** The tag-strip / entity-decode / whitespace-collapse chain. */
  private def extract(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val ent = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(noTags,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"), "&amp;", "&")
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /**
   * Extraction report over an HTML column: title, link count, and the
   * extracted text. Output: (doc_id, title, n_links, text_clean).
   */
  def htmlExtract(docs: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val h = col(htmlCol)
    docs.select(col(idCol).as("doc_id"),
      regexp_extract(h, "<title>([^<]*)</title>", 1).as("title"),
      size(regexp_extract_all(h, lit("<a[ >]"), lit(0))).as("n_links"),
      extract(h).as("text_clean"))
  }

  /**
   * The synthetic corpus is plain text, so the query PLANTS the HTML
   * wrapper (mirrored verbatim in the oracle): head with title +
   * script + style, the document text in a `<p>`, entity-encoded
   * punctuation, and doc_id-modulated nav links so the link count
   * varies (the boilerplate-density signal both outcomes need).
   */
  def htmlExtractQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val planted = Tables.documents(spark, sfDir).select(col("doc_id"),
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
    htmlExtract(planted, "doc_id", "html")
  }

  val htmlExtractSql: String =
    """WITH planted AS (
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
      |  FROM documents)
      |SELECT doc_id,
      |  regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
      |  CAST(len(regexp_extract_all(html, '<a[ >]')) AS INTEGER) AS n_links,
      |  trim(regexp_replace(regexp_replace(
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |      regexp_replace(
      |        regexp_replace(regexp_replace(html,
      |          '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
      |          '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
      |        '<[^>]+>', ' ', 'g'),
      |      '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
      |      '&#39;', '''', 'g'),
      |    '&amp;', '&', 'g'), '\s+', ' ', 'g')) AS text_clean
      |FROM planted""".stripMargin
}
