package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, attach the latest right row
  * with `time <= left.time` on the same key (the time-series join Spark
  * has no native operator for).
  *
  * Implementation is the scalable union+window formulation, not a range
  * self-join: tag both sides, union, and carry each right value forward
  * with `last(value, ignoreNulls)` over (key, time) — right rows sort
  * before left rows at equal time so `<=` matches. Cost: ONE shuffle on
  * the key + one per-partition sort; no |L|×|R| candidate blow-up, no
  * per-key collect. Skewed keys fall under the same AQE/salting toolbox
  * as any single-key window (cf. LatestPerKey).
  *
  * Determinism: callers must ensure right (key, time) pairs are unique
  * (dedupe first with LatestPerKey) or pass a tie-break in `rightOrder`;
  * otherwise the surviving right row is engine-dependent.
  *
  * Null-time right rows never satisfy `time <= left.time` and are dropped
  * here (without the filter they would sort asc_nulls_first and be
  * carried into every left row as a spurious "match").
  */
object AsofJoin {

  /** @param valueCols right-side columns to attach (aliased as given).
    *        They are carried as ONE struct so the attached values always
    *        come from the SAME right row — per-column carry with
    *        ignoreNulls would skip legitimately-NULL values and stitch
    *        columns from different right rows together.
    * @param rightOrder extra right-side tie-break columns (ascending,
    *                   later wins, kept in their original type) applied
    *                   at equal time
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      valueCols: Seq[String],
      rightOrder: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    val marker = "__graft_is_left"
    val bundle = "__graft_v"
    val tieCols = rightOrder.map(c => s"__graft_tie_$c")
    val bundleType = right.select(struct(valueCols.map(col): _*)).schema.head.dataType

    val taggedLeft = left
      .withColumn(marker, lit(1))
      .select(leftCols.map(col) ++
        Seq(lit(null).cast(bundleType).as(bundle)) ++
        rightOrder.zip(tieCols).map { case (c, t) =>
          lit(null).cast(right.schema(c).dataType).as(t)
        } :+ col(marker): _*)
    val taggedRight = right
      .filter(col(timeCol).isNotNull)
      .withColumn(marker, lit(0))
      .select(keyCols.map(col) ++ Seq(col(timeCol)) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(valueCols.map(col): _*).as(bundle)) ++
        rightOrder.zip(tieCols).map { case (c, t) => col(c).as(t) } :+
        col(marker): _*)

    // right rows (marker 0) sort before left rows at equal time -> the
    // carried value includes right rows with time == left.time (<=).
    // The struct itself is non-null for every right row, so
    // last(ignoreNulls) picks the latest right ROW atomically even when
    // individual value fields are null.
    val order = (col(timeCol).asc_nulls_first +: col(marker).asc_nulls_first +:
      tieCols.map(col(_).asc_nulls_first)).toSeq
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn(bundle, last(col(bundle), ignoreNulls = true).over(w))
      .filter(col(marker) === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"$bundle.$c").as(c)): _*)
  }
}
