package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement tool: run named queries with a job-level
  * listener and print per-job wall durations (+ stage breakdown), so the
  * seconds in the bench can be attributed to specific jobs (kmeans fit,
  * checkpoint materialization, count vs collect, final action) instead of
  * guessed at. Same env contract as [[Bench]]; warmup on sf0.001 first so
  * steady-state timings are measured like the bench does.
  *
  * Usage: runMain graft.Profile <nRuns> <names...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Profile <nRuns> <names...>")
    val nRuns = args(0).toInt
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR",
      "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class JobRec(id: Int, start: Long, var end: Long = -1L,
      var stages: Seq[String] = Nil, var desc: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val stageLines =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val r = JobRec(j.jobId, j.time)
        r.stages = j.stageInfos.map(si =>
          s"s${si.stageId}[${si.numTasks}t]").toSeq
        r.desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(j.jobId, r); order.add(j.jobId)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.get(j.jobId)).foreach(_.end = j.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val dur = (for (s <- si.submissionTime; c <- si.completionTime)
          yield c - s).getOrElse(-1L)
        stageLines.add(f"  stage ${si.stageId}%3d ${dur}%6d ms ${si.numTasks}%3dt " +
          si.name.takeWhile(_ != '\n').take(90))
      }
    }
    for (n <- names) {
      val fn = SparkEntry.queries.getOrElse(n, sys.error(s"unknown query $n"))
      try fn(spark, warmDir).count()
      catch { case scala.util.control.NonFatal(t) =>
        System.err.println(s"PROFILE warmup fail $n: ${t.getMessage}") }
    }
    spark.sparkContext.addSparkListener(listener)
    for (n <- names; r <- 1 to nRuns) {
      jobs.clear(); order.clear(); stageLines.clear()
      val fn = SparkEntry.queries(n)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      println(f"PROFILE $n run $r wall=$wall%.3f s")
      import scala.jdk.CollectionConverters._
      var sumJobs = 0L
      for (id <- order.asScala; rec <- Option(jobs.get(id))) {
        val dur = if (rec.end > 0) rec.end - rec.start else -1L
        if (dur > 0) sumJobs += dur
        println(f"  job ${rec.id}%3d ${dur}%6d ms  ${rec.desc.take(40)}%-40s ${rec.stages.mkString(" | ").take(160)}")
      }
      println(f"  sum-of-jobs ${sumJobs} ms (gaps = driver/planning time)")
      stageLines.forEach(l => println(l))
    }
    spark.stop()
  }
}
