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
  * @param ev      events with `keyCol`, `typeCol`, and `tsUsCol` (long
  *                microseconds — integer comparisons, engine-portable)
  * @return one row per key that completed step 1:
  *         (key, funnel_level, t1_us … tN_us), tI_us null beyond the
  *         reached level. */
object Funnel {
  def funnel(ev: DataFrame, keyCol: String, typeCol: String, tsUsCol: String,
             steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(windowUs > 0, "window must be positive")
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
      frames += ev.filter(col(typeCol) === steps(i))
        .join(frames(i - 1), keyCol)
        .filter(ts > col(prevTs) && ts <= col("t1_us") + windowUs)
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
