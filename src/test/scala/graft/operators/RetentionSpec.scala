package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Cohort-retention operator vs an in-JVM reference. */
class RetentionSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def ref(rows: Seq[(Long, Long)], offsets: Seq[Int])
      : Map[Long, (Long, Seq[Long])] =
    rows.groupBy(_._1).values.map { g =>
      val days = g.map(_._2).toSet
      (days.min, offsets.map(o => if (days.contains(days.min + o)) 1L else 0L))
    }.toSeq.groupBy(_._1).map { case (p0, ks) =>
      p0 -> (ks.size.toLong,
        offsets.indices.map(i => ks.map(_._2(i)).sum).toSeq)
    }

  test("multi-cohort spread with duplicates equals the reference") {
    import spark.implicits._
    // users start on different days; some return at +1, +7, both, or not
    // at all; duplicate (user, day) activity rows must not double-count
    val rows = Seq(
      (1L, 10L), (1L, 11L), (1L, 17L),             // cohort 10: +1 and +7
      (2L, 10L), (2L, 10L), (2L, 12L),             // cohort 10: neither (dup day)
      (3L, 12L), (3L, 13L), (3L, 13L),             // cohort 12: +1 (dup return)
      (4L, 20L),                                    // cohort 20: alone
      (5L, 12L), (5L, 19L))                         // cohort 12: +7
    val offsets = Seq(1, 7)
    val got = Retention.cohorts(rows.toDF("user_id", "day"), "user_id", "day", offsets)
      .collect().map(r => r.getLong(0) -> (r.getLong(1),
        offsets.indices.map(i => r.getLong(2 + i)).toSeq)).toMap
    assert(got == ref(rows, offsets))
    // spot-check the interesting cells
    assert(got(10L) == ((2L, Seq(1L, 1L))))
    assert(got(12L) == ((2L, Seq(1L, 1L))))
    assert(got(20L) == ((1L, Seq(0L, 0L))))
  }

  test("offsets are exact-day matches, not at-least") {
    import spark.implicits._
    val rows = Seq((1L, 0L), (1L, 2L))  // returns on day +2, offsets ask +1
    val got = Retention.cohorts(rows.toDF("user_id", "day"), "user_id", "day", Seq(1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 1L, 0L)))
  }
}
