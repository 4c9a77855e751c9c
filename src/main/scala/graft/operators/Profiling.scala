package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic data profiling: per-column null counts and distinct
  * cardinalities in ONE pass over the table (all aggregates in a single
  * HashAggregate — no per-column jobs), emitted in long form so the
  * result schema is table-independent.
  *
  * The exact `count_distinct` keeps the oracle hash-matchable;
  * `approxDistinct` swaps in HyperLogLog (`approx_count_distinct`) for
  * the 100 TB profile where exact distinct would shuffle every value —
  * rows-only checkable since HLL estimates are engine-specific.
  */
object Profiling {

  def profile(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val total = count(lit(1)).as("__n")
    val perCol = df.columns.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        (if (approxDistinct) approx_count_distinct(col(c)) else count_distinct(col(c)))
          .as(s"__distinct_$c"))
    }
    val agg = df.agg(total, perCol.toSeq: _*)
    val rows = df.columns.map { c =>
      struct(lit(c).as("column_name"), col("__n").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"), col(s"__distinct_$c").as("n_distinct"))
    }
    agg.select(explode(array(rows.toSeq: _*)).as("p")).select("p.*")
  }
}
