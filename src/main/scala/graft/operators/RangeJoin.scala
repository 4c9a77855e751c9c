package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bin-bucketed point-in-interval join.
  *
  * Spark plans a join whose ONLY condition is a range predicate
  * (`p BETWEEN s AND e`) as a nested-loop join — broadcastable when one
  * side is tiny, O(|P|·|I|) otherwise. Binning converts it to an
  * EQUI-join: points map to `pt div binWidth`; intervals explode into
  * every bin they cover; the equi-join on the bin key plus the exact
  * containment filter yields each matching (point, interval) pair
  * exactly once (a point lives in ONE bin, and an interval's exploded
  * bin list is distinct — no dedup pass needed).
  *
  * Scale shape (100 TB): the shuffle is keyed by bin (time-ordered data
  * → naturally balanced; hot bins take the standard salting escape
  * hatch), interval rows amplify only by ⌈len/binWidth⌉+1, and the
  * equi-join lets AQE/broadcast/SMJ machinery work — the same trick
  * production range-join optimizations apply. Pick binWidth near the
  * typical interval length: wider bins → fewer interval replicas but
  * more false candidates for the filter; narrower → the reverse.
  *
  * Intervals are half-open `[start, end)`; `end > start` is the
  * caller's contract (degenerate intervals match nothing either way —
  * sequence() on (start div w, (end-1) div w) needs end > start).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, pt: String,
                      intervals: DataFrame, start: String, end: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "pointInInterval: binWidth must be positive")
    val p = points.withColumn("__bin", expr(s"$pt div ${binWidth}L"))
    val iv = intervals.withColumn("__bin",
      explode(expr(s"sequence($start div ${binWidth}L, ($end - 1L) div ${binWidth}L)")))
    p.join(iv, Seq("__bin"))
      .filter(col(start) <= col(pt) && col(pt) < col(end))
      .drop("__bin")
  }
}
