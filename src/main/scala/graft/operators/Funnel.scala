package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-step strict behavioral funnel (ClickHouse `windowFunnel` analogue):
  * per key, the deepest prefix of `steps` where step 1's timestamp is
  * the key's earliest step-1 event, every later step is STRICTLY after
  * the previous step's chosen timestamp, and every step lands within
  * `windowUs` of step 1 (inclusive upper bound — ClickHouse's window
  * semantics). Each stage keeps the EARLIEST qualifying event.
  *
  * Shape: two-pass conditional minima per stage — one aggregation and
  * ONE keyed join per step (the window anchor t1 rides each stage's
  * output), ALL keyed on the funnel key, so one hash partitioning
  * serves the whole cascade; no per-key event arrays, no
  * window-function sorts, compute proportional to matched-step events.
  * Stage i's subtree prints twice in the STATIC plan (as stage i+1's
  * input and in the final assembly fold), but the duplicates
  * canonicalize to identical exchanges and Spark materializes each
  * stage once at runtime — asserted on the adaptive final plan in
  * FunnelSpec.
  *
  * Per-step TIME BOUNDS (ClickHouse `sequenceMatch`'s `(?t<=3600)`
  * conditions): `maxGapsUs(i)` caps the gap between step i+1's and step
  * i+2's chosen timestamps, inclusive, on top of the global window.
  * Semantics stay GREEDY-EARLIEST: each stage keeps the earliest event
  * qualifying against the PREVIOUS stage's chosen timestamp — the funnel
  * contract, deterministic and one-join-per-step at any scale. (A full
  * NFA sequence match would instead ask "does ANY chain satisfy the
  * gaps" — with gap caps a later, non-earliest step-i event can rescue a
  * chain greedy rejects; that existence semantics needs a per-key
  * ordered scan, not a cascade, and is out of scope here. Greedy is what
  * `windowFunnel`-style analytics mean by a timed funnel.)
  *
  * @param ev      events with `keyCol`, `typeCol`, and `tsUsCol` (long
  *                microseconds — integer comparisons, engine-portable)
  * @param maxGapsUs per-step inclusive gap caps, one per step
  *                TRANSITION (size = steps.size - 1); None = only the
  *                global window bounds that transition. Empty = no
  *                per-step bounds (the pre-existing funnel).
  * @return one row per key that completed step 1:
  *         (key, funnel_level, t1_us … tN_us), tI_us null beyond the
  *         reached level. */
object Funnel {
  def funnel(ev: DataFrame, keyCol: String, typeCol: String, tsUsCol: String,
             steps: Seq[String], windowUs: Long,
             maxGapsUs: Seq[Option[Long]] = Seq.empty): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(windowUs > 0, "window must be positive")
    require(maxGapsUs.isEmpty || maxGapsUs.size == steps.size - 1,
      s"maxGapsUs must have one entry per step transition " +
        s"(${steps.size - 1}), got ${maxGapsUs.size}")
    require(maxGapsUs.flatten.forall(_ > 0), "gap caps must be positive")
    val gaps: Seq[Option[Long]] =
      if (maxGapsUs.isEmpty) Seq.fill(math.max(steps.size - 1, 0))(None)
      else maxGapsUs
    val reserved = "funnel_level" +: (1 to steps.size).map(i => s"t${i}_us")
    require(!Seq(keyCol, typeCol, tsUsCol).exists(reserved.contains),
      s"input columns must not collide with funnel output names: $reserved")
    val ts = col(tsUsCol)
    val s1 = ev.filter(col(typeCol) === steps.head)
      .groupBy(keyCol).agg(min(ts).as("t1_us"))
    val frames = scala.collection.mutable.ArrayBuffer(s1)
    for (i <- 1 until steps.size) {
      val prevTs = if (i == 1) "t1_us" else s"t${i}_us"
      val thisTs = s"t${i + 1}_us"
      // each stage's output carries the window anchor t1 forward
      // (constant per key, so min() just restates it), so stage i needs
      // ONE keyed join against its predecessor — not a second join back
      // to s1 for the anchor
      val inWindow = ts > col(prevTs) && ts <= col("t1_us") + windowUs
      val inGap = gaps(i - 1).fold(lit(true))(g => ts <= col(prevTs) + g)
      frames += ev.filter(col(typeCol) === steps(i))
        .join(frames(i - 1), keyCol)
        .filter(inWindow && inGap)
        .groupBy(keyCol).agg(min(col("t1_us")).as("t1_us"), min(ts).as(thisTs))
    }
    val joined = frames.tail.foldLeft(s1: DataFrame) { (acc, f) =>
      acc.join(f.select(col(keyCol), col(f.columns.last)), Seq(keyCol), "left_outer")
    }
    // level = 1 + completed later stages; valid because each stage
    // inner-joins on its predecessor, so nulls always form a suffix
    val level = (2 to steps.size)
      .map(i => when(col(s"t${i}_us").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1))(_ + _).cast("int").as("funnel_level")
    joined.select(col(keyCol) +: level +:
      (1 to steps.size).map(i => col(s"t${i}_us")): _*)
  }
}
