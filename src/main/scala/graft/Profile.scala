package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round profiling main (guide §1): run ONE declared query
  * under a job listener that prints every Spark job's wall time and
  * call site, so a multi-verb query's cost decomposes job by job
  * without touching the bench methodology. Not part of the driver
  * contract — a diagnostic harness for `OPTIMIZATION_r*.md` evidence.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Profile <query> [reps]"
  */
object Profile {

  private final case class Job(id: Int, desc: String, site: String,
                               start: Long, var end: Long = -1L,
                               var tasks: Int = 0)

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: Profile <queryName> [reps]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = Sessions.tuned(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (record) {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        jobs.put(js.jobId,
          Job(js.jobId, desc, site, js.time,
            tasks = js.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (record) {
        Option(jobs.get(je.jobId)).foreach(_.end = je.time)
      }
    })
    val fn = SparkEntry.queries(name)
    // warm-up rep (uninstrumented): JVM/codegen/footer costs
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    operators.Checkpoints.sweep(spark.sparkContext)
    spark.catalog.clearCache()
    (1 to reps).foreach { r =>
      jobs.clear()
      record = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      record = false
      val rows = jobs.values().toArray(Array.empty[Job]).sortBy(_.id)
      val jobSum = rows.filter(_.end > 0).map(j => j.end - j.start).sum / 1e3
      println(f"== $name rep $r: $dt%.3f s wall, ${rows.length} jobs, $jobSum%.3f s summed job time")
      rows.foreach { j =>
        val t = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
        println(f"  job ${j.id}%4d ${t}%8.3f s tasks=${j.tasks}%4d  ${j.site}  ${j.desc.take(80)}")
      }
      operators.Checkpoints.sweep(spark.sparkContext)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
