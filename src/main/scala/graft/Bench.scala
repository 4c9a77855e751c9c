package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (SparkEntry.benchQueries) on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  * Each query is fully materialized via the noop sink (forces every
  * expression/shuffle, unlike count() which lets Catalyst prune work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.tuned(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Unmeasured warm-up: first query otherwise pays one-time JVM/
    // codegen/parquet-footer costs (~2s) that say nothing about the plan.
    try SparkEntry.queries(SparkEntry.benchQueries.head)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val results = SparkEntry.benchQueries.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      // -1 marks a failure in the JSON — a crashed query must not look
      // like a fast one
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
