package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * WARC/WET reader and writer — the Common Crawl extracted-text format
 * (ISO 28500 WARC, `conversion` records carrying plain text), the
 * de-facto ingest format of web-scale pretraining corpora.
 *
 * Record grammar (public spec): a `WARC/1.0` version line, header
 * lines (`Name: value`) up to a blank line, exactly `Content-Length`
 * BYTES of payload, then a blank separator. Parsing is
 * Content-Length-driven — payload bytes are never scanned for
 * delimiters, so text containing `WARC/1.0` lines roundtrips intact.
 *
 * Spark posture mirrors [[VecFiles]]: the `binaryFile` source hands
 * each task a whole file (Common Crawl ships ~1 GB WET segments in
 * the tens of thousands — natural parallelism); parsing is
 * per-partition imperative logic (SURVEY §3 case (d)). Only
 * `conversion` records surface; the leading `warcinfo` record every
 * real WET file opens with is skipped by type, not position.
 */
object WetFiles {

  /** One raw WARC record: lowercased header map + exact payload bytes. */
  private[sources] final case class RawRecord(
      headers: Map[String, String], payload: Array[Byte])

  /** Low-level record scanner shared by the WET (`conversion`) and
    * raw-WARC (`response`) readers: version line, `Name: value`
    * headers to the blank line, exactly Content-Length payload BYTES
    * (never delimiter-scanned), blank separator. */
  private[sources] def rawRecords(content: Array[Byte]): Iterator[RawRecord] =
    new Iterator[RawRecord] {
      private var pos = 0
      private var nextRec: RawRecord = null
      advance()

      private def lineEnd(from: Int): Int = {
        var i = from
        while (i < content.length && content(i) != '\n') i += 1
        i
      }

      private def advance(): Unit = {
        nextRec = null
        if (pos >= content.length) return
        // seek the version line (tolerates inter-record blank lines)
        var ls = pos
        var le = lineEnd(ls)
        def lineStr = new String(content, ls, le - ls, UTF_8).stripSuffix("\r")
        while (ls < content.length && lineStr.isEmpty) { ls = le + 1; le = lineEnd(ls) }
        if (ls >= content.length) { pos = content.length; return }
        require(lineStr.startsWith("WARC/"), s"expected WARC version line, got '$lineStr'")
        // headers up to the blank line
        var hs = Map.empty[String, String]
        ls = le + 1; le = lineEnd(ls)
        while (lineStr.nonEmpty) {
          val h = lineStr
          val cIdx = h.indexOf(':')
          require(cIdx > 0, s"malformed WARC header '$h'")
          hs = hs.updated(h.substring(0, cIdx).trim.toLowerCase,
            h.substring(cIdx + 1).trim)
          ls = le + 1; le = lineEnd(ls)
        }
        val clen = hs.getOrElse("content-length",
          sys.error("WARC record missing Content-Length")).toLong
        val bodyStart = le + 1 // past the blank line
        require(bodyStart + clen <= content.length,
          s"Content-Length $clen overruns file (at byte $bodyStart)")
        nextRec = RawRecord(hs,
          java.util.Arrays.copyOfRange(content, bodyStart, (bodyStart + clen).toInt))
        pos = (bodyStart + clen).toInt
      }

      override def hasNext: Boolean = nextRec != null
      override def next(): RawRecord = {
        val r = nextRec; advance(); r
      }
    }

  /** Parse one file's bytes into (uri, text) conversion records. */
  private[graft] def parseRecords(content: Array[Byte]): Iterator[(String, String)] =
    rawRecords(content)
      .filter(_.headers.get("warc-type").contains("conversion"))
      .map(r => (r.headers.getOrElse("warc-target-uri", ""),
        new String(r.payload, UTF_8)))

  /** Load a directory of `.wet` files as (uri, text). */
  def wet(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wet")
      .load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(parseRecords))
      .toDF("uri", "text")
  }

  /** Write records as one WET file (warcinfo preamble + conversion
    * records, byte-accurate Content-Length). Driver-side test/export
    * writer, the [[VecFiles]] writer discipline. */
  def writeWet(path: String, records: Iterator[(String, String)]): Unit = {
    val out = new BufferedOutputStream(new FileOutputStream(path))
    try {
      def rec(headers: Seq[(String, String)], body: Array[Byte]): Unit = {
        val h = new StringBuilder("WARC/1.0\r\n")
        (headers :+ ("Content-Length" -> body.length.toString)).foreach {
          case (k, v) => h.append(k).append(": ").append(v).append("\r\n")
        }
        h.append("\r\n")
        out.write(h.toString.getBytes(UTF_8))
        out.write(body)
        out.write("\r\n\r\n".getBytes(UTF_8))
      }
      rec(Seq("WARC-Type" -> "warcinfo", "Content-Type" -> "application/warc-fields"),
        "software: graft-wet-writer\r\n".getBytes(UTF_8))
      records.foreach { case (uri, text) =>
        rec(Seq("WARC-Type" -> "conversion", "WARC-Target-URI" -> uri,
          "Content-Type" -> "text/plain"), text.getBytes(UTF_8))
      }
    } finally out.close()
  }
}
