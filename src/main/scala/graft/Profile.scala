package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart

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
    // executionId → the SQL action's call-site description ("collect at
    // ConnectedComponents.scala:256") — job-level stage names are
    // useless under AQE (every materialized query stage is submitted
    // from the SQL execution pool and named after its lambda)
    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case e: SparkListenerSQLExecutionStart =>
          execDesc.put(e.executionId, e.description)
        case _ =>
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = if (record) {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        // a stage name carries the action call site ("parquet at
        // VersionedTable.scala:795") — the per-verb attribution the
        // empty job properties can't give. Jobs submitted through the
        // SQL execution pool name their result stage after the pool
        // lambda; prefer any stage naming a graft/source line.
        val names = js.stageInfos.map(_.name.takeWhile(_ != '(')).distinct
        val byStage = names.reverse.find(n => n.contains(".scala") &&
            !n.contains("CompletableFuture"))
          .orElse(names.lastOption).getOrElse("")
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.root.id"))
            .orElse(Option(p.getProperty("spark.sql.execution.id"))))
          .flatMap(id => Option(execDesc.get(id.toLong)))
          .map(_.takeWhile(_ != '(')).getOrElse(byStage)
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
      var prevEnd = -1L
      rows.foreach { j =>
        val t = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
        val gap = if (prevEnd > 0) (j.start - prevEnd) / 1e3 else 0.0
        prevEnd = math.max(prevEnd, j.end)
        println(f"  job ${j.id}%4d ${t}%8.3f s gap=$gap%6.3f tasks=${j.tasks}%4d  ${j.site}  ${j.desc.take(60)}")
      }
      operators.Checkpoints.sweep(spark.sparkContext)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
