package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.Tables

/**
 * C4-style text normalization for training-data pipelines: Unicode
 * NFC composition, control-character removal, and whitespace-run
 * collapse. The first stage every web-scraped corpus runs before
 * dedup/quality — decomposed accents ("e" + COMBINING ACUTE) and the
 * composed form must hash identically or every downstream signature
 * (minhash, simhash, fingerprints) silently treats them as different
 * documents.
 *
 * Spark-first shape: NFC is a codegen'd Catalyst expression
 * ([[NfcNormalize]] — java.text.Normalizer implements the same
 * Unicode normalization ICU/DuckDB do); control-strip and
 * whitespace-collapse are built-in `regexp_replace`/`trim` with
 * RE2-compatible patterns so the DuckDB oracle replays them verbatim.
 * Everything is map-only — no shuffle, runs at scan throughput.
 */
object Normalize {

  /** ASCII control chars (incl. DEL), identical under Java regex and
    * RE2. Newlines/tabs become spaces — the whitespace collapse then
    * folds them, matching C4's single-line document convention. */
  val CtrlRe = "[\\x00-\\x1F\\x7F]"

  /** Unicode NFC composition as a column. */
  def nfc(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text.cast(StringType))))

  /** Full normalization: NFC → control→space → collapse runs → trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(nfc(text), CtrlRe, " "), "\\s+", " "))

  /**
   * Per-document normalization report. The synthetic corpus is clean
   * ASCII, so (as with `pii_scrub`) the query PLANTS the dirt
   * deterministically — a decomposed accent, doubled/tabbed
   * whitespace, or a BEL control char by doc_id mod 4 — and the
   * oracle plants the identical suffix.
   */
  def textNormalize(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol).as("doc_id"), t.as("text_raw"),
      length(t).as("n_chars_raw"),
      normalize(t).as("text_norm"))
      .withColumn("n_chars_norm", length(col("text_norm")))
      .withColumn("changed", (col("text_norm") =!= col("text_raw")).cast("int"))
      .select("doc_id", "n_chars_raw", "n_chars_norm", "changed", "text_norm")
  }

  /** "cafe" + U+0301 COMBINING ACUTE (decomposed) — NFC composes it to
    * one char, so the accent survives but n_chars shrinks. */
  private val Decomposed = "café"

  def textNormalizeQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val planted = Tables.documents(spark, sfDir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 4 === 0, lit(" " + Decomposed + " visit"))
        .when(col("doc_id") % 4 === 1, lit("  spaced\tout  "))
        .when(col("doc_id") % 4 === 2, lit(" bell\u0007ring"))
        .otherwise(lit(""))).as("text"))
    textNormalize(planted, "doc_id", "text")
  }

  val textNormalizeSql: String =
    s"""WITH planted AS (
       |  SELECT doc_id, text ||
       |    CASE WHEN doc_id % 4 = 0 THEN ' caf' || chr(101) || chr(769) || ' visit'
       |         WHEN doc_id % 4 = 1 THEN '  spaced' || chr(9) || 'out  '
       |         WHEN doc_id % 4 = 2 THEN ' bell' || chr(7) || 'ring'
       |         ELSE '' END AS text
       |  FROM documents),
       |n AS (
       |  SELECT doc_id, text,
       |    trim(regexp_replace(regexp_replace(nfc_normalize(text),
       |      '$CtrlRe', ' ', 'g'), '\\s+', ' ', 'g')) AS text_norm
       |  FROM planted)
       |SELECT doc_id,
       |  CAST(length(text) AS INTEGER) AS n_chars_raw,
       |  CAST(length(text_norm) AS INTEGER) AS n_chars_norm,
       |  CAST(text_norm <> text AS INTEGER) AS changed,
       |  text_norm
       |FROM n""".stripMargin
}

object NormalizeKernels {
  /** NFC-compose a UTF8String; the common all-ASCII case short-circuits
    * via Normalizer.isNormalized without allocating a new string. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization of a string column (codegen'd). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc expects STRING, got ${child.dataType.simpleString}")
  }
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    NormalizeKernels.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.text.NormalizeKernels.nfc($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
