package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Raw WARC `response`-record reader — the rung BELOW
 * [[WetFiles]]: WET carries Common-Crawl's pre-extracted text, but
 * when WET extraction quality isn't good enough a pipeline ingests the
 * raw crawl (`*.warc` — ISO 28500), where each `response` record's
 * payload is the captured HTTP response VERBATIM: status line, HTTP
 * headers, blank line, entity body (possibly `Transfer-Encoding:
 * chunked` exactly as it came off the wire). This reader does the
 * three things the WET path never needed:
 *
 *  1. split HTTP headers from body at the first blank line INSIDE the
 *     payload (the WARC Content-Length covers the whole HTTP block;
 *     bodies are never delimiter-scanned, so a body containing
 *     `WARC/1.0` or `HTTP/1.1 200 OK` lines survives);
 *  2. de-chunk `Transfer-Encoding: chunked` bodies (hex-size frames,
 *     byte-level — a multi-byte UTF-8 sequence split across chunk
 *     boundaries reassembles before any decode);
 *  3. gate on the HTTP `Content-Type` BEFORE decoding bytes to text
 *     (a crawl segment mixes text/html with images and PDFs; only
 *     text payloads may be UTF-8-decoded).
 *
 * Spark posture mirrors [[WetFiles]]/[[VecFiles]]: `binaryFile` hands
 * each task a whole segment (Common Crawl ships ~1 GB WARC segments in
 * the tens of thousands — natural parallelism), parsing is
 * per-partition imperative logic at a genuine codec boundary
 * (SURVEY §3 case (d)); everything downstream of the (uri, status,
 * content_type, body) frame is ordinary codegen'd DataFrame ops.
 */
object WarcFiles {

  /** One parsed HTTP response record. */
  private[graft] final case class Response(
      uri: String, status: Int, contentType: String, body: Array[Byte])

  /** First index of a blank line (CRLFCRLF or LFLF) in `bytes`;
    * returns (headerEnd, bodyStart) or -1/-1. */
  private def blankLine(bytes: Array[Byte]): (Int, Int) = {
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == '\n') {
        if (i + 2 < bytes.length && bytes(i + 1) == '\r' && bytes(i + 2) == '\n')
          return (i, i + 3)
        if (i + 1 < bytes.length && bytes(i + 1) == '\n')
          return (i, i + 2)
      }
      i += 1
    }
    (-1, -1)
  }

  /** Decode a chunked transfer-encoded body: hex-size line, that many
    * bytes, CRLF, ... until the 0-size terminator (trailers ignored). */
  private[graft] def dechunk(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var pos = 0
    def line(): String = {
      val start = pos
      while (pos < body.length && body(pos) != '\n') pos += 1
      val s = new String(body, start, pos - start, UTF_8).stripSuffix("\r")
      pos += 1 // past the \n
      s
    }
    var done = false
    while (!done && pos < body.length) {
      // chunk-size line may carry ;extensions — size is the hex prefix
      val sz = java.lang.Long.parseLong(line().split(";")(0).trim, 16)
      if (sz == 0L) done = true
      else {
        require(pos + sz <= body.length, s"chunk size $sz overruns body")
        out.write(body, pos, sz.toInt)
        pos += sz.toInt
        line() // the CRLF after the chunk data
      }
    }
    out.toByteArray
  }

  /** Parse one segment's bytes into HTTP [[Response]]s (records of any
    * other WARC-Type — warcinfo, request, metadata — are skipped by
    * type). */
  private[graft] def parseResponses(content: Array[Byte]): Iterator[Response] =
    WetFiles.rawRecords(content)
      .filter(_.headers.get("warc-type").contains("response"))
      .map { rec =>
        val payload = rec.payload
        val (hEnd, bStart) = blankLine(payload)
        require(hEnd >= 0, "HTTP response payload missing header/body blank line")
        val head = new String(payload, 0, hEnd, UTF_8)
        val lines = head.split("\r?\n")
        require(lines.nonEmpty && lines(0).startsWith("HTTP/"),
          s"expected HTTP status line, got '${lines.headOption.getOrElse("")}'")
        val status = lines(0).split(" ")(1).toInt
        val http = lines.drop(1).flatMap { l =>
          val c = l.indexOf(':')
          if (c > 0) Some(l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim)
          else None
        }.toMap
        val raw = java.util.Arrays.copyOfRange(payload, bStart, payload.length)
        val body =
          if (http.get("transfer-encoding").exists(_.toLowerCase.contains("chunked")))
            dechunk(raw)
          else raw
        Response(rec.headers.getOrElse("warc-target-uri", ""), status,
          http.getOrElse("content-type", ""), body)
      }

  /** Load a directory of `.warc` segments as
    * (uri, http_status, content_type, body). */
  def warc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc")
      .load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(parseResponses(_).map(r =>
        (r.uri, r.status, r.contentType, r.body))))
      .toDF("uri", "http_status", "content_type", "body")
  }

  /** The content-type gate + decode: 200-status text/html responses
    * as (uri, http_status, n_bytes, html). Map-only, codegen'd — the
    * binary column is only decoded AFTER the gate. */
  def htmlResponses(responses: DataFrame): DataFrame =
    responses
      .filter(col("http_status") === 200 &&
        col("content_type").startsWith("text/html"))
      .select(col("uri"), col("http_status"),
        length(col("body")).as("n_bytes"),
        col("body").cast("string").as("html"))

  /** Write records as one WARC segment: warcinfo preamble, then per
    * doc a `request` record (readers must skip it by type) and the
    * `response` record with a full HTTP head. `chunk > 0` stores the
    * body chunked with that frame size (exercises the wire shape).
    * Driver-side test/export writer, the [[WetFiles.writeWet]]
    * discipline. */
  def writeWarc(path: String,
      records: Iterator[(String, Int, String, Array[Byte], Int)]): Unit = {
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
        "software: graft-warc-writer\r\n".getBytes(UTF_8))
      records.foreach { case (uri, status, ctype, body, chunk) =>
        rec(Seq("WARC-Type" -> "request", "WARC-Target-URI" -> uri,
          "Content-Type" -> "application/http; msgtype=request"),
          s"GET $uri HTTP/1.1\r\nHost: corpus.example\r\n".getBytes(UTF_8))
        val head = new StringBuilder(s"HTTP/1.1 $status OK\r\n")
        head.append("Content-Type: ").append(ctype).append("\r\n")
        val wire =
          if (chunk > 0) {
            head.append("Transfer-Encoding: chunked\r\n\r\n")
            val b = new java.io.ByteArrayOutputStream(body.length + 64)
            var off = 0
            while (off < body.length) {
              val n = math.min(chunk, body.length - off)
              b.write(s"${n.toHexString}\r\n".getBytes(UTF_8))
              b.write(body, off, n)
              b.write("\r\n".getBytes(UTF_8))
              off += n
            }
            b.write("0\r\n\r\n".getBytes(UTF_8))
            b.toByteArray
          } else {
            head.append(s"Content-Length: ${body.length}\r\n\r\n")
            body
          }
        rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
          "Content-Type" -> "application/http; msgtype=response"),
          head.toString.getBytes(UTF_8) ++ wire)
      }
    } finally out.close()
  }
}
