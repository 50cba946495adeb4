package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Counter-promotion greedy vs the exhaustive optimum, plus boundary
  * semantics of the strict-increase rule. */
class SequenceCountSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def run(rows: Seq[(Long, String, Long)], steps: Seq[String])
      : Map[Long, Long] = {
    import spark.implicits._
    SequenceCount.sequenceCount(rows.toDF("user_id", "event_type", "t_us"),
        "user_id", "event_type", "t_us", steps)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Exhaustive maximum number of disjoint strictly-time-increasing
    * chains — O(choices^n), for tiny inputs only. Chains are built by
    * assigning each event (in time order) to extend one open chain, open
    * a new one (step 1), or stay unused; ties in time must not chain. */
  private def bruteBest(events: Seq[(Long, String)], steps: Seq[String]): Long = {
    val idx = steps.zipWithIndex.toMap
    // state: multiset of (prefixLen, lastTs) for open chains
    def go(rest: List[(Long, String)], open: List[(Int, Long)], done: Int): Int =
      rest match {
        case Nil => done
        case (ts, tpe) :: tail =>
          val i = idx(tpe) + 1
          val skip = go(tail, open, done)
          val useIt: List[Int] =
            if (i == 1) List(go(tail, (1, ts) :: open, done))
            else open.zipWithIndex.collect {
              case ((p, lts), j) if p == i - 1 && lts < ts =>
                if (i == steps.size) go(tail, open.patch(j, Nil, 1), done + 1)
                else go(tail, open.patch(j, List((i, ts)), 1), done)
            }
          (skip :: useIt).max
      }
    go(events.sortBy(_._1).toList, Nil, 0).toLong
  }

  test("hand-checked basics: disjoint matches, strict time, restart") {
    val got = run(Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "a", 3L), (1L, "b", 4L), // 2 matches
      (2L, "b", 1L), (2L, "a", 2L),                               // b before a: 0
      (3L, "a", 1L), (3L, "b", 1L),                               // same instant: 0
      (4L, "a", 1L), (4L, "a", 2L), (4L, "b", 3L),                // one b: 1
      (5L, "b", 9L)                                               // never opened: absent
    ), Seq("a", "b"))
    assert(got == Map(1L -> 2L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("each event counts into at most one match (no overlap)") {
    // a b c with steps (a,b) then reuse of b for a second chain is illegal
    val got = run(Seq(
      (1L, "a", 1L), (1L, "a", 2L), (1L, "b", 3L)), Seq("a", "b"))
    assert(got(1L) == 1L)
  }

  test("randomized: greedy equals the exhaustive optimum for k = 2 and 3") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 60) {
      val k = 2 + trial % 2
      val steps = Seq("a", "b", "c").take(k)
      val n = 4 + rnd.nextInt(7) // <= 10 events: exhaustive stays feasible
      val events = (1 to n).map { _ =>
        (rnd.nextInt(6).toLong, steps(rnd.nextInt(k))) // heavy ts ties
      }
      val rows = events.map { case (ts, tpe) => (1L, tpe, ts) }
      val got = run(rows, steps).getOrElse(1L, 0L)
      val best = if (events.exists(_._2 == steps.head)) bruteBest(events, steps) else -1L
      if (best >= 0)
        assert(got == best,
          s"trial $trial: greedy=$got optimum=$best events=$events steps=$steps")
      else assert(!run(rows, steps).contains(1L))
    }
  }

  test("two-step closed form: matches = #B - max_prefix(#B - #A), B first at ties") {
    val rnd = new scala.util.Random(77)
    for (_ <- 1 to 40) {
      val n = 3 + rnd.nextInt(12)
      val events = (1 to n).map(_ => (rnd.nextInt(8).toLong,
        if (rnd.nextBoolean()) "a" else "b"))
      // closed form with same-ts B ordered before A (strict-increase rule)
      val ordered = events.sortBy { case (ts, tpe) => (ts, if (tpe == "b") 0 else 1) }
      var cum = 0; var maxCum = 0
      ordered.foreach { case (_, tpe) =>
        cum += (if (tpe == "b") 1 else -1); maxCum = math.max(maxCum, cum)
      }
      val nB = events.count(_._2 == "b")
      val expected = nB - maxCum
      val rows = events.map { case (ts, tpe) => (1L, tpe, ts) }
      if (events.exists(_._2 == "a"))
        assert(run(rows, Seq("a", "b"))(1L) == expected.toLong, s"events=$events")
    }
  }
}
