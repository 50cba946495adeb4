package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Boundary semantics of the binned range join: half-open [start, end),
  * bin-crossing intervals, no duplicate matches, empty intervals. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("points match half-open intervals exactly once across bin boundaries") {
    import spark.implicits._
    val points = Seq(
      (1L, "k", 100L),  // == start → matches (inclusive)
      (2L, "k", 199L),  // inside
      (3L, "k", 200L),  // == end → no match (exclusive)
      (4L, "k", 95L),   // before
      (5L, "x", 150L)   // other key
    ).toDF("pid", "k", "t")
    val intervals = Seq(
      ("k", 100L, 200L, "iv1"),  // crosses bins of width 30 (bins 3..6)
      ("k", 400L, 400L, "iv2"),  // empty interval → dropped
      ("x", 140L, 160L, "iv3")
    ).toDF("k", "s", "e", "name")

    val out = RangeJoin.pointsInIntervals(points, intervals,
        Seq("k"), "t", "s", "e", bin = 30L)
      .select("pid", "name").collect().map(r => (r.getLong(0), r.getString(1)))

    assert(out.toSet == Set((1L, "iv1"), (2L, "iv1"), (5L, "iv3")))
    assert(out.length == 3, "each (point, interval) match appears exactly once")
  }
}
