package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway component timer for the minhash delta chain (r16 probe;
  * deleted before round close). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.1"
    import graft.dedup.Dedup
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    val tasks = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        tasks.addAndGet(s.stageInfo.numTasks)
        val tm = s.stageInfo.taskMetrics
        if (tm.executorRunTime > 500)
          println(f"    STAGE ${s.stageInfo.stageId}%4d task=${tm.executorRunTime/1000.0}%7.2f s n=${s.stageInfo.numTasks}%4d cpu=${tm.executorCpuTime/1e9}%7.2f gc=${tm.jvmGCTime/1000.0}%5.2f ${s.stageInfo.name.take(60)}")
      }
    })
    def timed(name: String, clear: Boolean = true)(body: => Unit): Unit = {
      if (clear) spark.catalog.clearCache()
      taskMs.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      body
      Thread.sleep(300)
      println(f"TIMED $name%-28s wall=${(System.nanoTime()-t0)/1e9}%7.3f  task=${taskMs.get/1000.0}%8.2f s  tasks=${tasks.get}%5d")
    }
    // warmups
    noop(Dedup.dedupMinhashDeltaApply(spark, sfDir))
    val corpus = Dedup.withPlantedNearDups(Tables.documents(spark, sfDir), 25, mutate = true)
    timed("corpus_scan")(noop(corpus))
    timed("signatures_full")(noop(Dedup.minhashSignatures(corpus, "doc_id", "text", 64, 3)))
    val delta = corpus.filter(graft.Carves.deltaSplit(col("doc_id"), Dedup.PlantOffset))
    timed("signatures_delta")(noop(Dedup.minhashSignatures(delta, "doc_id", "text", 64, 3)))
    val baseSigs = spark.read.parquet(Dedup.MinhashSigExportPath)
      .filter(!graft.Carves.deltaSplit(col("id"), Dedup.PlantOffset))
    timed("pairs_delta")(noop(Dedup.minhashPairsDelta(baseSigs, delta, corpus, "doc_id", "text")))
    // decompose the kernel
    import org.apache.spark.sql.expressions.Window
    val deltaSigs = Dedup.minhashSignatures(graft.index.LshIndex.spread(delta),
      "doc_id", "text", 64, 3).cache()
    val allSigs = baseSigs.select(col("id"), col("sig")).unionByName(deltaSigs)
    val wBucket = Window.partitionBy("band", "band_hash")
    val bands = Dedup.minhashBands(allSigs, 64, 4)
      .withColumn("bsz", count(lit(1)).over(wBucket))
      .filter(col("bsz") <= 1000).drop("bsz")
    timed("k_allSigs", clear = false)(noop(allSigs))
    timed("k_rawbands", clear = false)(noop(Dedup.minhashBands(allSigs, 64, 4)))
    timed("k_bands", clear = false)(noop(bands))
    val deltaIds = deltaSigs.select(col("id")).cache()
    val deltaBands = bands.join(deltaIds, Seq("id"), "left_semi")
    val cands = deltaBands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
          col("x.id") =!= col("y.id"))
      .select(least(col("x.id"), col("y.id")).as("a"),
        greatest(col("x.id"), col("y.id")).as("b"))
      .distinct().cache()
    timed("k_cands", clear = false)(noop(cands))
    val preDistinct = deltaBands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
          col("x.id") =!= col("y.id"))
    println("PRE-DISTINCT pair rows: " + preDistinct.count())
    println("DISTINCT cand pairs:    " + cands.count())
    println("bucket size histogram (top10):")
    Dedup.minhashBands(allSigs, 64, 4).groupBy("band", "band_hash")
      .agg(count(lit(1)).as("n")).orderBy(col("n").desc).limit(10).collect()
      .foreach(r => println(s"  band=${r.get(0)} n=${r.get(2)}"))
    val candIds = cands.select(col("a").as("id"))
      .unionByName(cands.select(col("b").as("id"))).distinct()
    val sets = graft.index.LshIndex.spread(
        corpus.select(col("doc_id").as("id"), col("text").as("__text")))
      .join(candIds, Seq("id"), "left_semi")
      .select(col("id"),
        array_distinct(Dedup.shingles(Dedup.tokens(col("__text")), 3)).as("sh")).cache()
    timed("k_sets", clear = false)(noop(sets))
    val verify = cands
      .join(sets.select(col("id").as("a"), col("sh").as("sh_a")), "a")
      .join(sets.select(col("id").as("b"), col("sh").as("sh_b")), "b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= 0.5)
    timed("k_verify", clear = false)(noop(verify))
    timed("apply_entry")(noop(Dedup.dedupMinhashDeltaApply(spark, sfDir)))
    spark.stop()
  }
}
