package graft

/** Print the formatted physical plan for one or more driver queries —
  * the .explain audit loop (plan hygiene: pushdown, broadcast, exchange
  * reuse, codegen spans).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-explain")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val names = if (args.isEmpty) SparkEntry.benchQueries else args(0).split(",").toSeq
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
