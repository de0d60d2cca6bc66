package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextAnalysis.tokens

/**
 * Document-level filtering for training-data pipelines: PII scrubbing
 * (regex redaction) and composite quality-rule keep/drop decisions
 * (Gopher-style). Both are map-only codegen'd string built-ins — no
 * UDFs, no shuffle — so they run at scan throughput on 100 TB and
 * compose in front of dedup/packing without adding a stage boundary.
 */
object TextFilters {

  // ---- PII scrubbing ----

  // RE2-compatible patterns (same semantics under Java regex and
  // DuckDB's RE2): redaction must behave identically in the oracle
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /**
   * Redact emails, phone numbers, and IPv4 addresses; report per-type
   * match counts. Order matters and is fixed (email → phone → ip):
   * an email is redacted before its digit runs could half-match the
   * phone/ip patterns. Each count is taken on the text AFTER the prior
   * redactions — the same text its own replace pass sees — so
   * n_phones/n_ips are exact replacement counts (a phone-shaped
   * substring inside an email is redacted as <EMAIL> and counts as
   * neither a phone nor an ip).
   */
  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    def n(on: Column, re: String): Column = size(regexp_extract_all(on, lit(re), lit(0)))
    val afterEmail = regexp_replace(t, EmailRe, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, PhoneRe, "<PHONE>")
    val cleaned = regexp_replace(afterPhone, Ipv4Re, "<IP>")
    docs.select(col(idCol).as("doc_id"),
      n(t, EmailRe).as("n_emails"),
      n(afterEmail, PhoneRe).as("n_phones"),
      n(afterPhone, Ipv4Re).as("n_ips"),
      cleaned.as("text_clean"))
  }

  /** The synthetic corpus carries no PII, so the query PLANTS it
    * deterministically (doc_id mod 7 selects the type, values vary by
    * doc_id) — mirrored verbatim in the oracle SQL. */
  def piiScrubQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val planted = Tables.documents(spark, sfDir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com now")))
        .when(col("doc_id") % 7 === 1,
          concat(lit(" call 555-"), lpad((col("doc_id") % 900 + 100).cast("string"), 3, "0"),
            lit("-4567 today")))
        .when(col("doc_id") % 7 === 2,
          concat(lit(" host 10.0."), (col("doc_id") % 256).cast("string"), lit(".42 down")))
        .otherwise(lit(""))).as("text"))
    piiScrub(planted, "doc_id", "text")
  }

  val piiScrubSql: String = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    s"""WITH planted AS (
       |  SELECT doc_id, text ||
       |    CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id || '@example.com now'
       |         WHEN doc_id % 7 = 1 THEN ' call 555-' || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0') || '-4567 today'
       |         WHEN doc_id % 7 = 2 THEN ' host 10.0.' || (doc_id % 256) || '.42 down'
       |         ELSE '' END AS text
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$email')) AS INTEGER) AS n_emails,
       |  CAST(len(regexp_extract_all(
       |    regexp_replace(text, '$email', '<EMAIL>', 'g'), '$phone')) AS INTEGER) AS n_phones,
       |  CAST(len(regexp_extract_all(regexp_replace(
       |    regexp_replace(text, '$email', '<EMAIL>', 'g'),
       |      '$phone', '<PHONE>', 'g'), '$ip')) AS INTEGER) AS n_ips,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$email', '<EMAIL>', 'g'), '$phone', '<PHONE>', 'g'), '$ip', '<IP>', 'g') AS text_clean
       |FROM planted""".stripMargin
  }

  // ---- composite quality filter ----

  /**
   * Gopher-style keep/drop decision from composable signals, with the
   * FIRST failed rule as the drop reason (fixed rule order ⇒
   * deterministic). Thresholds sit inside the synthetic corpus's
   * observed ranges so both outcomes occur. All ratios floor-truncated
   * (SURVEY §5).
   */
  private def trunc4(c: Column) = floor(c * 10000) / 10000

  /** The four Gopher-style signal expressions over one token array —
    * shared by [[qualityFilter]]'s report columns and the
    * [[qualityFailReason]] fold so the two can never drift. */
  private[graft] def qDupTokenFrac(toks: Column): Column =
    trunc4(lit(1.0) - size(array_distinct(toks)).cast("double") /
      greatest(size(toks), lit(1)))
  private[graft] def qAvgTokenLen(toks: Column): Column =
    trunc4(aggregate(transform(toks, t => length(t)), lit(0L),
      (acc, x) => acc + x).cast("double") / greatest(size(toks), lit(1)))
  private[graft] def qStopwordRatio(toks: Column): Column =
    trunc4(size(filter(toks, t =>
      t.isin("the", "a", "of", "and", "to", "in"))).cast("double") /
      greatest(size(toks), lit(1)))

  /** First-failed quality rule as ONE expression, for fused
    * single-pass funnels ([[graft.operators.Curate]]): identical
    * rule order and thresholds to [[qualityFilter]]; repeated signal
    * subtrees are deduplicated by codegen subexpression elimination. */
  private[graft] def qualityFailReason(toks: Column): Column =
    when(size(toks) < 20, "too_short")
      .when(qDupTokenFrac(toks) > 0.65, "repetitive")
      .when(qStopwordRatio(toks) <= 0.0, "no_stopwords")
      .when(qAvgTokenLen(toks) < 3.0 || qAvgTokenLen(toks) > 10.0, "word_length")
      .otherwise("ok")

  def qualityFilter(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    docs.select(col(idCol).as("doc_id"),
      size(toks).as("n_tokens"),
      qDupTokenFrac(toks).as("dup_token_frac"),
      qAvgTokenLen(toks).as("avg_token_len"),
      qStopwordRatio(toks).as("stopword_ratio"),
      qualityFailReason(toks).as("fail_reason"))
      .withColumn("keep", (col("fail_reason") === "ok").cast("int"))
  }

  def qualityFilterQuery(spark: SparkSession, sfDir: String): DataFrame =
    qualityFilter(Tables.documents(spark, sfDir), "doc_id", "text")

  val qualityFilterSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS INTEGER) AS n_tokens,
      |    FLOOR((1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / GREATEST(len(toks), 1)) * 10000) / 10000 AS dup_token_frac,
      |    FLOOR(CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS DOUBLE)
      |          / GREATEST(len(toks), 1) * 10000) / 10000 AS avg_token_len,
      |    FLOOR(CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
      |          / GREATEST(len(toks), 1) * 10000) / 10000 AS stopword_ratio
      |  FROM t)
      |SELECT doc_id, n_tokens, dup_token_frac, avg_token_len, stopword_ratio,
      |  CASE WHEN n_tokens < 20 THEN 'too_short'
      |       WHEN dup_token_frac > 0.65 THEN 'repetitive'
      |       WHEN stopword_ratio <= 0.0 THEN 'no_stopwords'
      |       WHEN avg_token_len < 3.0 OR avg_token_len > 10.0 THEN 'word_length'
      |       ELSE 'ok' END AS fail_reason,
      |  CAST((CASE WHEN n_tokens < 20 THEN 'too_short'
      |       WHEN dup_token_frac > 0.65 THEN 'repetitive'
      |       WHEN stopword_ratio <= 0.0 THEN 'no_stopwords'
      |       WHEN avg_token_len < 3.0 OR avg_token_len > 10.0 THEN 'word_length'
      |       ELSE 'ok' END) = 'ok' AS INTEGER) AS keep
      |FROM s""".stripMargin
}
