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

  private def refCum(rows: Seq[(Long, Long)], offsets: Seq[Int])
      : Map[Long, (Long, Seq[Long])] =
    rows.groupBy(_._1).values.map { g =>
      val days = g.map(_._2).toSet
      (days.min, offsets.map(o =>
        if (days.exists(d => d > days.min && d <= days.min + o)) 1L else 0L))
    }.toSeq.groupBy(_._1).map { case (p0, ks) =>
      p0 -> (ks.size.toLong,
        offsets.indices.map(i => ks.map(_._2(i)).sum).toSeq)
    }

  test("cumulative counts any return within (p0, p0+offset]") {
    import spark.implicits._
    val rows = Seq(
      (1L, 0L), (1L, 2L),              // +2: misses exact-1, hits within-7
      (2L, 0L), (2L, 7L),              // boundary: within-7 inclusive
      (3L, 0L), (3L, 8L),              // beyond both windows
      (4L, 0L), (4L, 0L),              // same-day dup: NOT a return
      (5L, 5L), (5L, 6L), (5L, 12L))   // second cohort: both windows hit
    val offsets = Seq(1, 7)
    val got = Retention.cohorts(rows.toDF("user_id", "day"), "user_id", "day",
        offsets, cumulative = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1),
        offsets.indices.map(i => r.getLong(2 + i)).toSeq)).toMap
    assert(got == refCum(rows, offsets))
    assert(got(0L) == ((4L, Seq(0L, 2L))))   // only u2 (+7) and u1 (+2) within 7
    assert(got(5L) == ((1L, Seq(1L, 1L))))
    // cumulative dominates exact at every offset (monotonicity)
    val exact = Retention.cohorts(rows.toDF("user_id", "day"), "user_id", "day", offsets)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    exact.foreach { case (p0, (e1, e7)) =>
      assert(got(p0)._2(0) >= e1 && got(p0)._2(1) >= e7)
    }
  }

  test("randomized cumulative differential equals the reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val rows = Seq.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(30).toLong))
    val offsets = Seq(1, 3, 7)
    val got = Retention.cohorts(rows.toDF("user_id", "day"), "user_id", "day",
        offsets, cumulative = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1),
        offsets.indices.map(i => r.getLong(2 + i)).toSeq)).toMap
    assert(got == refCum(rows, offsets))
  }
}
