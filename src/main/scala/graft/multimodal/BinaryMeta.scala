package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Multimodal column plumbing: media payloads are opaque BINARY
 * columns with typed metadata extracted by a batch decode stage.
 *
 * The decode itself is STUBBED (deterministic header math — the
 * container has no image/audio codecs); everything around it is the
 * real 100 TB shape:
 *  - media rides as BINARY next to its keys (parquet keeps it
 *    columnar; scans that don't touch `media` never read those pages);
 *  - decode runs via `mapPartitions` over iterator batches — the same
 *    contract as an Arrow/pandas batch UDF: one JVM-side buffer per
 *    batch, no per-row driver anything;
 *  - output is a typed metadata struct usable by downstream
 *    relational ops.
 */
object BinaryMeta {

  final case class MediaRow(doc_id: Long, media: Array[Byte])
  final case class MetaRow(doc_id: Long, media_len: Int, width: Int, height: Int, n_frames: Int)

  val BatchSize = 256

  /**
   * STUB decode of one batch. A real deployment swaps the body for a
   * codec call (e.g. JPEG header parse / ffprobe) with identical
   * batching and signature; the rest of the pipeline is unchanged.
   */
  def decodeBatch(batch: Seq[MediaRow]): Seq[MetaRow] =
    batch.map { r =>
      val len = r.media.length
      MetaRow(r.doc_id, len, len % 640 + 16, (len * 7) % 480 + 16, 1)
    }

  /** Batched decode over a (doc_id, media BINARY) DataFrame. */
  def decode(spark: SparkSession, mediaDf: DataFrame): DataFrame = {
    import spark.implicits._
    mediaDf.select(col("doc_id").cast("long"), col("media")).as[MediaRow]
      .mapPartitions(_.grouped(BatchSize).flatMap(decodeBatch))
      .toDF()
  }

  /** SparkEntry query: documents' text bytes standing in for media payloads. */
  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
    decode(spark, media)
  }

  val multimodalMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS media_len,
      |  CAST(octet_length(encode(text)) % 640 + 16 AS INTEGER) AS width,
      |  CAST((octet_length(encode(text)) * 7) % 480 + 16 AS INTEGER) AS height,
      |  1 AS n_frames
      |FROM documents""".stripMargin

  // ---- stub feature extraction: media -> embedding ----

  /** Fixed stub-embedding dimensionality (one sha-256 digest = 8 x 32 bits). */
  val EmbedDim = 8

  /**
   * Deterministic STUB feature extractor: media bytes -> 8-dim float
   * embedding (8 x 32-bit digest words of sha-256, scaled to [0, 1)).
   * The real deployment swaps the digest for a model forward pass with
   * the identical contract (BINARY in, ARRAY<FLOAT> out, map-only);
   * everything downstream — `Dedup.neardupPairs`, `IvfSearch`, the
   * full ANN stack — consumes it unchanged, which is the point: the
   * multimodal column feeds the similarity pipeline through the same
   * plumbing text embeddings use. Pure codegen built-ins (sha2 + conv),
   * no UDF.
   */
  def embedStub(mediaDf: DataFrame): DataFrame = {
    val sha = sha2(col("media"), 256)
    val feats = (0 until EmbedDim).map { j =>
      (conv(substring(sha, j * 8 + 1, 8), 16, 10).cast("long") / lit(4294967296.0))
        .cast("float")
    }
    mediaDf.select(col("doc_id"), array(feats: _*).as("embedding"))
  }

  /** SparkEntry query: stub features as scalar columns (exact dyadic
    * doubles — engine-portable without rounding). */
  def multimodalEmbed(spark: SparkSession, sfDir: String): DataFrame = {
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
    val sha = sha2(col("media"), 256)
    media.select(col("doc_id") +:
      (0 until EmbedDim).map(j =>
        (conv(substring(sha, j * 8 + 1, 8), 16, 10).cast("long") / lit(4294967296.0))
          .as(s"f$j")): _*)
  }

  val multimodalEmbedSql: String = {
    val feats = (0 until EmbedDim).map(j =>
      s"('0x' || substr(sha256(text), ${j * 8 + 1}, 8))::UBIGINT / 4294967296.0 AS f$j")
    s"""SELECT doc_id, ${feats.mkString(",\n  ")}
       |FROM documents""".stripMargin
  }
}
