package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Round-15 measurement aid: run registry entries once (after a
  * warmup) and report how the wall time decomposes — job count, stage
  * count, task count, summed task time — so overhead-bound entries
  * (many tiny jobs) separate from compute-bound ones. With
  * SPARK_GRAFT_PROFILE_JOBS=n it also prints the n slowest jobs
  * (duration + callsite) so the orchestration tail has names. Usage:
  *   runMain graft.Profile <sfDir> name1,name2,...
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(); val stages = new AtomicInteger()
    val tasks = new AtomicInteger(); val taskMs = new AtomicLong()
    val shuffleReadB = new AtomicLong(); val shuffleWriteB = new AtomicLong()
    // tolerate malformed values (ADVICE r15): a bad env var should mean
    // "no per-job breakdown", not a NumberFormatException before any
    // measurement
    val topJobs = sys.env.get("SPARK_GRAFT_PROFILE_JOBS")
      .flatMap(_.toIntOption).getOrElse(0)
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobDurations = new java.util.concurrent.ConcurrentLinkedQueue[(Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (topJobs > 0) {
          val site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
          jobStartNs.put(j.jobId, (System.nanoTime(), site))
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        if (topJobs > 0) Option(jobStartNs.remove(j.jobId)).foreach { case (t0, site) =>
          jobDurations.add(((System.nanoTime() - t0) / 1e9, site))
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        shuffleReadB.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shuffleWriteB.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    for (name <- names.split(",").map(_.trim).filter(_.nonEmpty)) {
      val fn = SparkEntry.queries(name)
      materialize(fn(spark, "/root/testdata/sf0.001")) // JIT + fixture warmup
      materialize(fn(spark, sfDir))                    // fixture warmup at target sf
      spark.catalog.clearCache()
      Thread.sleep(200)
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      shuffleReadB.set(0); shuffleWriteB.set(0); jobDurations.clear()
      val t0 = System.nanoTime()
      materialize(fn(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      println(f"PROFILE $name%-36s wall=$wall%7.3f s  jobs=${jobs.get}%3d  " +
        f"stages=${stages.get}%4d  tasks=${tasks.get}%5d  taskTime=${taskMs.get / 1000.0}%8.2f s  " +
        f"shufR=${shuffleReadB.get / 1e6}%8.2f MB  shufW=${shuffleWriteB.get / 1e6}%8.2f MB")
      if (topJobs > 0) {
        import scala.jdk.CollectionConverters._
        jobDurations.asScala.toSeq.sortBy(-_._1).take(topJobs).foreach {
          case (d, site) => println(f"  JOB $d%7.3f s  $site")
        }
      }
    }
    spark.stop()
  }
}
