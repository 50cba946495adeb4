package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct contract tests for the consolidated [[SpanGuard]] helper — the
  * skew guard all four candidate-pair operators now share. The reference
  * is a plain in-JVM re-implementation of the span semantics. */
class SpanGuardSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  /** In-JVM reference: rank ids per group (ascending), pair every two
    * rows whose rank distance is ≤ maxSpan. */
  private def refPairs(rows: Seq[(String, Long)], maxSpan: Int): Set[(Long, Long)] =
    rows.groupBy(_._1).values.flatMap { g =>
      val ids = g.map(_._2).sorted
      for {
        i <- ids.indices
        j <- (i + 1) until math.min(i + maxSpan + 1, ids.length)
      } yield (ids(i), ids(j))
    }.toSet

  private def runPairs(rows: Seq[(String, Long)], maxSpan: Int): Set[(Long, Long)] = {
    import spark.implicits._
    val df = rows.toDF("grp", "id")
    val got = SpanGuard.pairs(df, keys = Seq("grp"), idCol = "id",
        order = Seq("id"), maxSpan = maxSpan)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    CacheRegistry.releaseAll()
    got
  }

  test("equals all-pairs for groups within the span, chains beyond it") {
    // deterministic pseudo-random layout: group sizes 1..40 around a
    // span of 8 — covers inactive, boundary, and multi-block regimes
    val rows = for {
      g <- 0 until 12
      i <- 0 until (g * 7 % 41 + 1)
    } yield (s"g$g", g * 1000L + i * (g % 3 + 1))
    for (span <- Seq(1, 3, 8)) {
      assert(runPairs(rows, span) == refPairs(rows, span), s"span=$span")
    }
  }

  test("block boundaries do not lose pairs (a-side reaches the next block)") {
    // one group of 100 consecutive ids with span 10: every pair crossing
    // a multiple-of-10 rank boundary must still appear
    val rows = (0L until 100L).map(("g", _))
    val got = runPairs(rows, 10)
    assert(got == refPairs(rows, 10))
    // spot-check an explicitly boundary-crossing pair (ranks 10 and 11)
    assert(got.contains((9L, 10L)))
  }

  test("payload columns ride onto both sides") {
    import spark.implicits._
    val df = Seq(("g", 1L, "x1"), ("g", 2L, "x2"), ("g", 3L, "x3"))
      .toDF("grp", "id", "tag")
    val got = SpanGuard.pairs(df, Seq("grp"), "id", Seq("id"), maxSpan = 2,
        payload = Seq("tag"))
      .select("id_a", "id_b", "tag_a", "tag_b")
      .as[(Long, Long, String, String)].collect().toSet
    CacheRegistry.releaseAll()
    assert(got == Set((1L, 2L, "x1", "x2"), (1L, 3L, "x1", "x3"),
      (2L, 3L, "x2", "x3")))
  }

  test("maxSpan = 0 is rejected loudly, not a silent zero-pair cliff") {
    import spark.implicits._
    val df = Seq(("g", 1L), ("g", 2L)).toDF("grp", "id")
    intercept[IllegalArgumentException] {
      SpanGuard.pairs(df, Seq("grp"), "id", Seq("id"), maxSpan = 0)
    }
  }
}
