package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Loaders for the standard ANN benchmark vector formats (re-expression
 * of fspann `loader/`): `.fvecs` (int32 dim LE + dim float32),
 * `.bvecs` (int32 dim + dim uint8), `.ivecs` (int32 dim + dim int32 —
 * ground-truth id lists), and CSV.
 *
 * Spark posture: files are listed and sized driver-side (metadata
 * only); per-file record counts follow from the fixed record size, so
 * globally sequential ids come from a driver-side prefix sum over
 * file lengths — no zipWithIndex shuffle, no collect of vector data.
 * Parsing runs distributed via the `binaryFile` source + mapPartitions
 * (format (d) of SURVEY §3: genuine per-partition imperative logic).
 *
 * Scale note: `binaryFile` reads a whole file per task, so 100 TB
 * ingest wants many files (the standard layout for these corpora);
 * records being fixed-length also permits a FixedLengthInputFormat
 * split path per file if single huge files ever appear.
 */
object VecFiles {

  /** (path, length, baseId, nRecords) per file, sorted by path. Only
    * `*.ext` files count — stale temp or foreign files in the dir must
    * not shift the global id assignment. */
  private def fileLayout(
      spark: SparkSession, dir: String, elemBytes: Int, ext: String): (Int, Seq[(String, Long)]) = {
    val hPath = new Path(dir)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(hPath)
      // skip hidden (_/. prefixed) files too: Spark's binaryFile source
      // always ignores them, and a file counted here but skipped there
      // would shift every later file's base id
      .filter { f =>
        val n = f.getPath.getName
        f.isFile && n.endsWith(s".$ext") && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(f => (f.getPath.toString, f.getLen))
      .sortBy(_._1).toSeq
    require(files.nonEmpty, s"no files under $dir")
    // dim from the first 4 bytes of the first file (uniform-dim formats)
    val in = fs.open(new Path(files.head._1))
    val hdr = new Array[Byte](4)
    in.readFully(0, hdr)
    in.close()
    val dim = ByteBuffer.wrap(hdr).order(ByteOrder.LITTLE_ENDIAN).getInt
    require(dim > 0, s"bad leading dim $dim in ${files.head._1}")
    val recBytes = 4L + dim.toLong * elemBytes
    var base = 0L
    // keyed by file NAME (unique within a load dir): the binaryFile
    // source and FileSystem render the scheme/authority differently
    val layout = files.map { case (p, len) =>
      require(len % recBytes == 0, s"$p length $len not a multiple of record size $recBytes")
      val out = (new Path(p).getName, base)
      base += len / recBytes
      out
    }
    (dim, layout)
  }

  private def records(
      spark: SparkSession, dir: String, elemBytes: Int, ext: String): (Int, DataFrame) = {
    val (dim, layout) = fileLayout(spark, dir, elemBytes, ext)
    val baseIds = spark.sparkContext.broadcast(layout.toMap)
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", s"*.$ext") // mirror fileLayout's filter
      .load(dir)
      .select(col("path"), col("content"))
    import spark.implicits._
    val recs = files.as[(String, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (path, content) =>
        val base = baseIds.value(new Path(path).getName)
        val n = content.length / (4 + dim * elemBytes)
        (0 until n).iterator.map { i =>
          val off = i * (4 + dim * elemBytes)
          val d = ByteBuffer.wrap(content, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
          require(d == dim, s"non-uniform dim $d != $dim at record $i of $path")
          (base + i, content.slice(off + 4, off + 4 + dim * elemBytes))
        }
      }
    }.toDF("id", "payload")
    (dim, recs)
  }

  private def toFloats(payload: Array[Byte]): Array[Float] = {
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(payload.length / 4)(buf.getFloat)
  }

  private def toInts(payload: Array[Byte]): Array[Int] = {
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(payload.length / 4)(buf.getInt)
  }

  private def toUBytes(payload: Array[Byte]): Array[Int] =
    payload.map(b => b & 0xff)

  /** .fvecs -> (id BIGINT, vec ARRAY<FLOAT>). */
  def fvecs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (_, recs) = records(spark, dir, 4, "fvecs")
    recs.as[(Long, Array[Byte])].map { case (id, p) => (id, toFloats(p)) }.toDF("id", "vec")
  }

  /** .bvecs -> (id BIGINT, vec ARRAY<INT>) with uint8 element values. */
  def bvecs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (_, recs) = records(spark, dir, 1, "bvecs")
    recs.as[(Long, Array[Byte])].map { case (id, p) => (id, toUBytes(p)) }.toDF("id", "vec")
  }

  /** .ivecs -> (id BIGINT, vec ARRAY<INT>) — ground-truth neighbor ids. */
  def ivecs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (_, recs) = records(spark, dir, 4, "ivecs")
    recs.as[(Long, Array[Byte])].map { case (id, p) => (id, toInts(p)) }.toDF("id", "vec")
  }

  /** CSV `id,v0,v1,...` -> (id BIGINT, vec ARRAY<FLOAT>); fully splittable text scan. */
  def csv(spark: SparkSession, path: String, dim: Int): DataFrame = {
    val df = spark.read
      .schema(org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType) +:
          (0 until dim).map(j => org.apache.spark.sql.types.StructField(s"v$j",
            org.apache.spark.sql.types.FloatType))))
      .csv(path)
    df.select(col("id"), array((0 until dim).map(j => col(s"v$j")): _*).as("vec"))
  }

  // ---- writers (driver-side, test/export scale; mirror loader framing) ----

  private def writeRecords[T](file: String, rows: Iterator[Array[T]])(put: (DataOutputStream, T) => Unit): Unit = {
    Files.createDirectories(Paths.get(file).getParent)
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(file)))
    try rows.foreach { v =>
      val hdr = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v.length).array()
      out.write(hdr)
      v.foreach(x => put(out, x))
    } finally out.close()
  }

  private def le(n: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n).array()

  private def leF(f: Float): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putFloat(f).array()

  def writeFvecs(file: String, rows: Iterator[Array[Float]]): Unit =
    writeRecords(file, rows)((o, x) => o.write(leF(x)))

  /**
   * Distributed .fvecs export (the ingest-scale writer; the plain
   * writers above stay driver-side for the deterministic oracle
   * harness): vectors are range-partitioned and sorted by id, and each
   * non-empty partition writes one part file named by its partition
   * index — range partitions are in id order, so lexicographic file
   * order == global id order, exactly the layout [[fvecs]]' prefix sum
   * assigns ids from. Vector bytes never touch the driver. Each part
   * is written to a task-attempt temp name and renamed, so a retry
   * cannot leave a torn file.
   *
   * Targets a filesystem path visible to executors (local[n] here; on
   * a real cluster this is a shared mount — or swap the
   * FileOutputStream in [[writeFvecs]] for a Hadoop `FileSystem`
   * stream, the only line that knows about the destination).
   */
  def writeFvecsDistributed(df: DataFrame, idCol: String, vecCol: String,
      dir: String, numFiles: Int): Unit =
    writeDistributed(df, idCol, vecCol, dir, numFiles, "fvecs", "array<float>",
      (tmp, it) => writeFvecs(tmp, it.map(_.getSeq[Float](1).toArray)))

  /** Distributed .bvecs export — the same layout contract as
    * [[writeFvecsDistributed]] with uint8 payloads; values are masked
    * to a byte exactly as [[writeBvecs]] frames them, so
    * [[bvecs]]-loading an export roundtrips (id, value) for any input
    * in [0, 255]. */
  def writeBvecsDistributed(df: DataFrame, idCol: String, vecCol: String,
      dir: String, numFiles: Int): Unit =
    writeDistributed(df, idCol, vecCol, dir, numFiles, "bvecs", "array<int>",
      (tmp, it) => writeBvecs(tmp, it.map(_.getSeq[Int](1).toArray)))

  private def writeDistributed(df: DataFrame, idCol: String, vecCol: String,
      dir: String, numFiles: Int, ext: String, castTo: String,
      writePart: (String, Iterator[org.apache.spark.sql.Row]) => Unit): Unit = {
    Files.createDirectories(Paths.get(dir))
    // clear prior exports AND orphaned task-attempt temps: a stale
    // part file from a wider previous run (or a .tmp- from a killed
    // attempt) would otherwise sit in the dir — the loaders filter by
    // extension, but a stale part file would silently shift every base id
    val listing = Files.list(Paths.get(dir))
    try listing.forEach { f =>
      val n = f.getFileName.toString
      if (n.endsWith(s".$ext") || n.contains(s".$ext.tmp-")) Files.delete(f)
    } finally listing.close() // Files.list holds an open DirectoryStream
    df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast(castTo).as("vec"))
      .repartitionByRange(numFiles, col("id"))
      .sortWithinPartitions("id")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val file = f"$dir/part-${tc.partitionId()}%05d.$ext"
          val tmp = s"$file.tmp-${tc.taskAttemptId()}"
          writePart(tmp, it)
          Files.move(Paths.get(tmp), Paths.get(file),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          ()
        }
      }
  }

  def writeBvecs(file: String, rows: Iterator[Array[Int]]): Unit =
    writeRecords(file, rows)((o, x) => o.write(x & 0xff))

  def writeIvecs(file: String, rows: Iterator[Array[Int]]): Unit =
    writeRecords(file, rows)((o, x) => o.write(le(x)))
}
