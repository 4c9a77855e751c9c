package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic data profiling: per-column null counts and distinct
  * cardinalities in ONE pass over the table (all aggregates in a single
  * HashAggregate — no per-column jobs), emitted in long form so the
  * result schema is table-independent.
  *
  * Sketched distinct counts are the DEFAULT: N exact `count_distinct`
  * columns in one agg trigger Spark's multi-distinct rewrite, whose
  * `Expand` multiplies every input row ×(N+1) before the first
  * HashAggregate and shuffles every distinct value of every column —
  * measured ×17 on the 16-column activities table. A sketch keeps the
  * profile a single pass of constant-size buffers merged map-side, the
  * only shape that survives 100 TB. The sketch is the ENGINE-PORTABLE
  * KMV estimator (`functions.KmvDistinctAgg`, k = 64, ~12% rel error)
  * rather than HLL: same plan shape and scale behavior, but its
  * estimate is deterministic arithmetic a DuckDB oracle can replay, so
  * even the approximate default hash-gates (HLL was a rows-only gate).
  * `approxDistinct = false` is the opt-in exact mode (`n_distinct`
  * BIGINT) for small/verification tables.
  */
object Profiling {

  val KmvK = 64

  def profile(df: DataFrame, approxDistinct: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val total = count(lit(1)).as("__n")
    val perCol = df.columns.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        (if (approxDistinct) expr(s"kmv_distinct(CAST(`$c` AS STRING), $KmvK)")
         else count_distinct(col(c)))
          .as(s"__distinct_$c"))
    }
    val agg = df.agg(total, perCol.toSeq: _*)
    val distName = if (approxDistinct) "n_distinct_est" else "n_distinct"
    val rows = df.columns.map { c =>
      struct(lit(c).as("column_name"), col("__n").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"), col(s"__distinct_$c").as(distName))
    }
    agg.select(explode(array(rows.toSeq: _*)).as("p")).select("p.*")
  }
}
