package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention (ClickHouse `retention` analogue): bucket keys by
  * first-active period, count who returned exactly `offset` periods
  * later, for each requested offset — or, with `cumulative = true`,
  * who returned at ANY period in (p0, p0 + offset] (the "returned
  * within N days" dashboards ask for; monotone across offsets).
  *
  * Shape: cohort minimum, per-key flag aggregation, and the join are
  * all keyed on `keyCol` — one hash partitioning serves every stage,
  * duplicates need no distinct (min/max absorb them) — and only the
  * final roll-up re-keys, onto one row per cohort period. Period is an
  * integer column supplied by the caller (e.g. `micros div 86400000000`
  * for days): integer arithmetic end to end, no date/timezone
  * semantics.
  *
  * @param offsets periods after the cohort period to test, e.g.
  *                Seq(1, 7, 30); emitted as `retained_p<offset>`
  * @return (cohort_period, n_keys, retained_p<o1>, retained_p<o2>, …) */
object Retention {
  def cohorts(df: DataFrame, keyCol: String, periodCol: String,
              offsets: Seq[Int], cumulative: Boolean = false): DataFrame = {
    require(offsets.nonEmpty, "need at least one retention offset")
    require(offsets.forall(_ >= 1), "offsets must be >= 1")
    require(offsets.distinct == offsets, "offsets must be distinct")
    val reserved = Seq("p0", "cohort_period", "n_keys") ++
      offsets.flatMap(o => Seq(s"f$o", s"retained_p$o"))
    require(!Seq(keyCol, periodCol).exists(reserved.contains),
      s"input columns must not collide with retention internal/output names: $reserved")
    val cohort = df.groupBy(keyCol).agg(min(col(periodCol)).as("p0"))
    val flags = df.join(cohort, keyCol)
      .groupBy(keyCol)
      .agg(min(col("p0")).as("p0"),
        offsets.map { o =>
          val hit =
            if (cumulative) col(periodCol) > col("p0") &&
              col(periodCol) <= col("p0") + o
            else col(periodCol) === col("p0") + o
          max(when(hit, 1).otherwise(0)).as(s"f$o")
        }: _*)
    flags.groupBy(col("p0").as("cohort_period"))
      .agg(count(lit(1)).as("n_keys"),
        offsets.map(o => sum(col(s"f$o")).as(s"retained_p$o")): _*)
  }
}
