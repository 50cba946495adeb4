package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Boundary semantics of the composed as-of join: inclusive match at
  * equal timestamps, latest-wins, per-key isolation, null before the
  * first right row. */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("as-of join picks the latest right row at or before each left time") {
    import spark.implicits._
    val left = Seq(
      (1L, "k1", 100L), // before any right row → null
      (2L, "k1", 200L), // equal ts to right row at 200 → inclusive match
      (3L, "k1", 450L), // between 400 and 600 → 400 wins (latest ≤)
      (4L, "k2", 500L), // other key: only k2 rows apply
      (5L, "k3", 999L)  // key with no right rows at all → null
    ).toDF("id", "k", "t")
    val right = Seq(
      ("k1", 200L, "a"), ("k1", 400L, "b"), ("k1", 600L, "c"),
      ("k2", 450L, "x")
    ).toDF("k", "t", "v")

    val out = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("v"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap

    assert(out(1L).isEmpty)
    assert(out(2L).contains("a"))
    assert(out(3L).contains("b"))
    assert(out(4L).contains("x"))
    assert(out(5L).isEmpty)
  }

  test("whole-row attach: a null field in the newest right row is NOT backfilled") {
    import spark.implicits._
    val left = Seq((1L, "k", 250L)).toDF("id", "k", "t")
    val right = Seq(
      ("k", 100L, Some("v1"), Some("w1")),
      ("k", 200L, Some("v2"), None) // newest row wins AS A WHOLE: w stays null
    ).toDF("k", "t", "v", "w")
    val row = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("v", "w"))
      .collect().head
    assert(row.getString(3) == "v2")
    assert(row.isNullAt(4), "w must come from the matched row, not an older one")
  }

  test("null join keys never match (SQL semantics)") {
    import spark.implicits._
    val left = Seq((1L, Option.empty[String], 200L)).toDF("id", "k", "t")
    val right = Seq((Option.empty[String], 100L, "x")).toDF("k", "t", "v")
    val row = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("v"))
      .collect().head
    assert(row.isNullAt(3), "null-key left row must not adopt null-key right rows")
  }

  test("null right times never match (would sort nulls-first and get adopted)") {
    import spark.implicits._
    val left = Seq((1L, "k", 200L)).toDF("id", "k", "t")
    val right = Seq(("k", Option.empty[Long], "x")).toDF("k", "t", "v")
    val row = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("v"))
      .collect().head
    assert(row.isNullAt(3), "null-time right rows must be excluded")
  }

  test("tolerance: too-old matches null out, they don't fall through to older rows") {
    import spark.implicits._
    val left = Seq(
      (1L, "k", 200L),  // match at 200: distance 0 → kept
      (2L, "k", 299L),  // latest <= is 200, distance 99 <= 100 → kept
      (3L, "k", 300L),  // distance 100, inclusive bound → kept
      (4L, "k", 301L),  // distance 101 → NULL (not the older 50 either)
      (5L, "k", 460L)   // latest <= is 400, distance 60 → kept
    ).toDF("id", "k", "t")
    val right = Seq(("k", 50L, "old"), ("k", 200L, "a"), ("k", 400L, "b"))
      .toDF("k", "t", "v")
    val out = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("v"),
        tolerance = Some(100L))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out == Map(1L -> Some("a"), 2L -> Some("a"), 3L -> Some("a"),
      4L -> None, 5L -> Some("b")))
    // no tolerance = the unbounded operator, unchanged
    val unbounded = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("v"))
      .orderBy("id").collect().map(r => Option(r.getString(3)))
    assert(unbounded.forall(_.isDefined))
  }
}
