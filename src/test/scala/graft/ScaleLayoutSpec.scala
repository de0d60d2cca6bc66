package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.index.LshIndex
import graft.lsh.{Lsh, LshParams}

/**
 * The 100 TB layout claims of SURVEY §3-4, demonstrated on disk: the
 * index membership persists partitioned by (t, d), and a probe-shaped
 * read prunes to the targeted partitions instead of scanning the
 * whole index.
 */
class ScaleLayoutSpec extends SparkSpecBase {

  test("membership partitioned by (t, d) serves probe reads with partition pruning") {
    val dir = "/root/repo/target/tmp/layout/membership"
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    }
    val emb = Tables.embeddings(spark, sf)
    val model = Lsh.fit(emb, "embedding", LshParams())
    val built = LshIndex.build(LshIndex.codes(emb, "vec_id", "embedding", model), 64)
    built.membership.write.partitionBy("t", "d").parquet(dir)

    val probeRead = spark.read.parquet(dir).filter(col("t") === 0 && col("d") === 0)
    val plan = probeRead.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters"), "scan must carry partition filters")
    assert(probeRead.count() == emb.count(), "one (t, d) holds every vector exactly once")

    // the probe scan touches 1/24th of the files (one (t, d) leaf dir)
    val allFiles = spark.read.parquet(dir).inputFiles.length
    val prunedFiles = probeRead.inputFiles.count(f => f.contains("t=0/") && f.contains("d=0"))
    assert(prunedFiles > 0 && prunedFiles * 24 <= allFiles + 23,
      s"pruned=$prunedFiles of $allFiles files")
  }
}
