package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Boundary semantics of the N-step strict funnel. */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def run(rows: Seq[(Long, String, Long)], steps: Seq[String],
                  w: Long): Map[Long, (Int, Seq[Option[Long]])] = {
    import spark.implicits._
    Funnel.funnel(rows.toDF("user_id", "event_type", "t_us"),
        "user_id", "event_type", "t_us", steps, w)
      .collect().map { r =>
        r.getLong(0) -> (r.getInt(1),
          (2 until r.length).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))))
      }.toMap
  }

  test("strict order: a step before its predecessor does not count") {
    val rows = Seq(
      (1L, "click", 50L), (1L, "view", 100L), (1L, "click", 200L), // pre-view click ignored
      (2L, "click", 50L), (2L, "view", 100L))                      // only pre-view click → level 1
    val got = run(rows, Seq("view", "click"), w = 1000L)
    assert(got(1L) == ((2, Seq(Some(100L), Some(200L)))))
    assert(got(2L) == ((1, Seq(Some(100L), None))))
  }

  test("window anchors at step 1: inclusive upper bound, strict lower") {
    val rows = Seq(
      (1L, "view", 100L), (1L, "click", 1100L),   // exactly t1 + w → counts
      (2L, "view", 100L), (2L, "click", 1101L),   // one past → out
      (3L, "view", 100L), (3L, "click", 100L))    // same instant → strict > excludes
    val got = run(rows, Seq("view", "click"), w = 1000L)
    assert(got(1L)._1 == 2 && got(2L)._1 == 1 && got(3L)._1 == 1)
  }

  test("later steps must fit the ANCHOR window, not a sliding one") {
    // click at t1+900 fine; purchase at t1+1200 is within 1000 of the
    // CLICK but outside the anchor window → level stops at 2
    val rows = Seq(
      (1L, "view", 0L), (1L, "click", 900L), (1L, "purchase", 1200L))
    val got = run(rows, Seq("view", "click", "purchase"), w = 1000L)
    assert(got(1L) == ((2, Seq(Some(0L), Some(900L), None))))
  }

  test("earliest qualifying event is chosen at every stage") {
    val rows = Seq(
      (1L, "view", 100L), (1L, "view", 50L),        // t1 = min view
      (1L, "click", 60L),                           // before t1=50? no — after! counts
      (1L, "click", 500L))
    val got = run(rows, Seq("view", "click"), w = 1000L)
    assert(got(1L) == ((2, Seq(Some(50L), Some(60L)))))
  }

  test("randomized differential vs an in-JVM reference") {
    // deterministic pseudo-random event soup; the reference recomputes
    // the cascade definition directly (earliest anchor, then for each
    // stage the earliest event strictly after the previous stage and
    // within the anchor window)
    val steps = Seq("a", "b", "c")
    val w = 50L
    val rnd = new scala.util.Random(20260812L)
    val rows = (0 until 2000).map { _ =>
      (rnd.nextInt(60).toLong, steps(rnd.nextInt(3)), rnd.nextInt(200).toLong)
    }
    def refUser(evs: Seq[(String, Long)]): Option[Seq[Option[Long]]] = {
      val anchors = evs.collect { case ("a", t) => t }
      if (anchors.isEmpty) return None
      val t1 = anchors.min
      var prev = t1
      val out = scala.collection.mutable.ArrayBuffer[Option[Long]](Some(t1))
      var alive = true
      steps.tail.foreach { s =>
        val nxt = if (alive)
          evs.collect { case (`s`, t) if t > prev && t <= t1 + w => t }
            .sorted.headOption
        else None
        out += nxt
        nxt match { case Some(t) => prev = t; case None => alive = false }
      }
      Some(out.toSeq)
    }
    val want = rows.groupBy(_._1).flatMap { case (u, evs) =>
      refUser(evs.map(e => (e._2, e._3))).map { ts =>
        u -> ((1 + ts.tail.count(_.isDefined), ts))
      }
    }
    val got = run(rows, steps, w)
    assert(got == want, {
      val diff = (got.keySet ++ want.keySet)
        .filter(k => got.get(k) != want.get(k)).take(3)
      s"first diffs: ${diff.map(k => (k, got.get(k), want.get(k)))}"
    })
  }

  test("four-step funnel and users missing the anchor") {
    val rows = Seq(
      (1L, "a", 0L), (1L, "b", 1L), (1L, "c", 2L), (1L, "d", 3L),
      (2L, "b", 0L), (2L, "c", 1L))                 // no anchor → absent
    val got = run(rows, Seq("a", "b", "c", "d"), w = 100L)
    assert(got(1L) == ((4, Seq(Some(0L), Some(1L), Some(2L), Some(3L)))))
    assert(!got.contains(2L))
  }

  private def runTimed(rows: Seq[(Long, String, Long)], steps: Seq[String],
                       w: Long, gaps: Seq[Option[Long]])
      : Map[Long, (Int, Seq[Option[Long]])] = {
    import spark.implicits._
    Funnel.funnel(rows.toDF("user_id", "event_type", "t_us"),
        "user_id", "event_type", "t_us", steps, w, gaps)
      .collect().map { r =>
        r.getLong(0) -> (r.getInt(1),
          (2 until r.length).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))))
      }.toMap
  }

  test("per-step gap caps: inclusive boundary, one-past excluded, per-transition") {
    val rows = Seq(
      (1L, "view", 0L), (1L, "click", 100L), (1L, "purchase", 400L),
      (2L, "view", 0L), (2L, "click", 101L),   // one past the 100 cap → level 1
      (3L, "view", 0L), (3L, "click", 100L), (3L, "purchase", 401L)) // 2nd gap 301 > 300
    val got = runTimed(rows, Seq("view", "click", "purchase"), w = 100000L,
      gaps = Seq(Some(100L), Some(300L)))
    assert(got(1L) == ((3, Seq(Some(0L), Some(100L), Some(400L)))),
      "gaps exactly at the caps are inclusive")
    assert(got(2L)._1 == 1, "gap one past the first cap stops at level 1")
    assert(got(3L)._1 == 2, "second-transition cap binds independently")
  }

  test("gap caps bound the PREVIOUS step, the window bounds the anchor") {
    // click at t1+900 within both; purchase at click+450: inside its 500
    // gap but past the 1000 anchor window → window still binds
    val rows = Seq((1L, "view", 0L), (1L, "click", 900L), (1L, "purchase", 1350L))
    val got = runTimed(rows, Seq("view", "click", "purchase"), w = 1000L,
      gaps = Seq(None, Some(500L)))
    assert(got(1L)._1 == 2)
    // with a window wide enough the same gap admits it
    val got2 = runTimed(rows, Seq("view", "click", "purchase"), w = 10000L,
      gaps = Seq(None, Some(500L)))
    assert(got2(1L)._1 == 3)
  }

  test("greedy-earliest with gaps is documented semantics: earlier anchor can lose a chain") {
    // anchor t1=0 → click must be <= 100; the only click is at 150,
    // reachable from the LATER view at 60 — greedy (by contract) misses
    val rows = Seq((1L, "view", 0L), (1L, "view", 60L), (1L, "click", 150L))
    val got = runTimed(rows, Seq("view", "click"), w = 100000L,
      gaps = Seq(Some(100L)))
    assert(got(1L) == ((1, Seq(Some(0L), None))),
      "funnel semantics anchor at the earliest step-1 event")
  }

  test("empty gaps and all-None gaps equal the untimed funnel") {
    val rows = Seq(
      (1L, "view", 100L), (1L, "click", 1100L),
      (2L, "view", 100L), (2L, "click", 1101L))
    val untimed = run(rows, Seq("view", "click"), w = 1000L)
    assert(runTimed(rows, Seq("view", "click"), 1000L, Seq.empty) == untimed)
    assert(runTimed(rows, Seq("view", "click"), 1000L, Seq(None)) == untimed)
  }

  test("gap caps reject bad arity and non-positive caps") {
    intercept[IllegalArgumentException] {
      runTimed(Seq((1L, "a", 0L)), Seq("a", "b"), 100L, Seq(Some(1L), Some(2L)))
    }
    intercept[IllegalArgumentException] {
      runTimed(Seq((1L, "a", 0L)), Seq("a", "b"), 100L, Seq(Some(0L)))
    }
  }

  test("cascade stages materialize once: runtime plan reuses stage exchanges") {
    import spark.implicits._
    // stage i's subtree appears twice in the STATIC plan (inside stage
    // i+1 and in the final assembly fold); the duplicates canonicalize to
    // identical exchanges, so at runtime each stage computes ONCE — one
    // agg + one join per step of actual work, not the printed tree size
    val rows = (0L until 200L).flatMap(u => Seq(
      (u, "a", u), (u, "b", u + 1), (u, "c", u + 2)))
      .toDF("user_id", "event_type", "ts_us")
    val q = Funnel.funnel(rows, "user_id", "event_type", "ts_us",
      Seq("a", "b", "c"), windowUs = 100L)
    q.collect()
    val finalPlan = q.queryExecution.executedPlan.toString
    assert(finalPlan.contains("ReusedExchange") ||
      finalPlan.contains("TableCacheQueryStage") ||
      finalPlan.contains("ReusedQueryStage"),
      s"expected stage reuse in the adaptive final plan:\n$finalPlan")
  }
}
