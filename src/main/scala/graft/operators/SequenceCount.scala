package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** ClickHouse `sequenceCount('(?1).*(?2)…')` analogue: per key, the
  * number of NON-OVERLAPPING left-to-right matches of the step chain —
  * "how many times did this user complete view→click", counting each
  * event into at most one match.
  *
  * Algorithm: the counter-promotion greedy over time-ordered events —
  * one counter per prefix length; an event of step i promotes one
  * chain from prefix i-1 to prefix i (step 1 opens a new chain); the
  * answer is the count that reached prefix k. Promotion consumes the
  * chain, so matches can't share events; greedy-promote yields the
  * MAXIMUM disjoint-chain count (an exchange argument: promoting the
  * oldest open chain never blocks a later completion), which for two
  * steps reduces to classic parenthesis matching — the shape the DuckDB
  * oracle states in SQL (`matched = #B − max_prefix(#B − #A)`), pinned
  * for k = 3/4 by an in-JVM reference differential in the spec.
  *
  * Scale shape: ONE hash exchange on the key + an in-partition sort
  * (Spark's secondary-sort pattern — the sort spills, no per-key event
  * array is ever materialized), then a streaming per-key fold whose
  * state is 2k integers. Events not matching any step are filtered
  * before the exchange.
  *
  * Chain steps must be STRICTLY increasing in time ([[Funnel]]'s rule):
  * promotions made at timestamp t become eligible only once t advances
  * (the `fresh` buffer), which also makes the fold order-INDEPENDENT
  * among equal-timestamp events — no tie-break convention leaks into
  * the result.
  *
  * @param ev    events with `keyCol`, `typeCol`, `tsUsCol` (long µs)
  * @param steps the chain, in order (size ≥ 1)
  * @return one row per key with ≥ 1 step-1 event: (key, n_matches) —
  *         keys that never opened a chain are absent (ClickHouse
  *         returns 0 per aggregated group; absent-vs-0 is the same
  *         outer-join convention as [[Funnel]]). */
object SequenceCount {
  def sequenceCount(ev: DataFrame, keyCol: String, typeCol: String,
                    tsUsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one step")
    val spark = ev.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val k = steps.size
    val slim = ev
      .filter(col(typeCol).isin(steps.map(lit(_)): _*))
      .select(col(keyCol).cast("long").as("_key"),
        col(tsUsCol).cast("long").as("_ts"), col(typeCol).as("_type"))
      .as[(Long, Long, String)]
    val counted = slim
      .repartition(col("_key"))
      .sortWithinPartitions(col("_key"), col("_ts"))
      .mapPartitions { it =>
        new Iterator[(Long, Long, Long)] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): (Long, Long, Long) = {
            val key = buf.head._1
            // counters(i): chains at prefix i eligible for extension
            // (last event strictly earlier); fresh(i): promoted at the
            // CURRENT timestamp, eligible once time advances
            val counters = new Array[Long](k + 1)
            val fresh = new Array[Long](k + 1)
            var curTs = Long.MinValue
            var opened = 0L
            while (buf.hasNext && buf.head._1 == key) {
              val (_, ts, tpe) = buf.next()
              if (ts != curTs) {
                var i = 1
                while (i <= k) { counters(i) += fresh(i); fresh(i) = 0; i += 1 }
                curTs = ts
              }
              val i = stepIdx(tpe) + 1
              if (i == 1) { fresh(1) += 1; opened += 1 }
              else if (counters(i - 1) > 0) { counters(i - 1) -= 1; fresh(i) += 1 }
            }
            (key, counters(k) + fresh(k), opened)
          }
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
    counted.toDF("_key", "n_matches", "_opened")
      .filter(col("_opened") > 0)
      .select(col("_key").as(keyCol), col("n_matches"))
  }
}
