package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join — points against half-open intervals `[start, end)`
  * sharing equi-keys.
  *
  * Spark plans a raw `p.t >= i.start AND p.t < i.end` predicate (plus
  * equi-keys) as a join whose non-equi part is evaluated per candidate
  * pair; when a key is hot or absent that degenerates toward a product.
  * Binning makes the time dimension part of the JOIN KEY: each interval
  * explodes into the `⌈len/bin⌉+1` bins it covers, each point hashes to
  * one bin, and the join is fully equi on (keys…, bin) with the exact
  * range check as a residual filter. Candidate count per point is
  * bounded by the intervals overlapping its bin — compute proportional
  * to true selectivity, not to key cardinality. Pick `bin` near the
  * typical interval length (one-to-few bins per interval).
  */
object RangeJoin {

  /** @param keys    equi-key column names present on BOTH sides
    * @param pointT  point timestamp column (long micros or any numeric)
    * @param start   interval start column (inclusive), same scale
    * @param end     interval end column (exclusive), same scale
    * @param bin     bin width in the same units
    * @return point rows joined with matching interval rows (inner); use
    *         the result for aggregation — a point matching k intervals
    *         appears k times. */
  def pointsInIntervals(points: DataFrame, intervals: DataFrame,
                        keys: Seq[String], pointT: String,
                        start: String, end: String, bin: Long): DataFrame = {
    def binOf(c: Column): Column = floor(c / lit(bin)).cast("long")
    // empty intervals would make sequence() run DOWNWARD — drop them
    val i = intervals.where(col(end) > col(start)).withColumn("__bin",
      explode(sequence(binOf(col(start)), binOf(col(end) - 1))))
    val p = points.withColumn("__bin", binOf(col(pointT)))
    p.join(i, keys :+ "__bin")
      .where(col(pointT) >= col(start) && col(pointT) < col(end))
      .drop("__bin")
  }
}
