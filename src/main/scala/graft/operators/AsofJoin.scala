package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — ClickHouse `ASOF JOIN` / kdb `aj`: for each left row,
  * attach the single latest right row whose time is ≤ the left row's time
  * (inclusive) within the same key; left rows with no earlier right row
  * keep nulls (LEFT semantics).
  *
  * Spark has no native operator, and the naive formulations don't scale:
  * a range join + per-left-row top-1 window explodes to
  * O(left × right-per-key) intermediate rows, and a correlated subquery
  * isn't supported. Composed instead as the union–sort–backfill pattern:
  * tag both sides, union, ONE hash exchange on the key, one Tungsten sort
  * on (time, side), and a running `last(ignoreNulls)` backfill — the same
  * shuffle/sort cost as a sort-merge join, linear in rows, skew-bounded
  * by the key. Right rows sort before left rows at equal timestamps, so
  * a right row at exactly the left time matches (ClickHouse `>=`).
  */
object AsofJoin {

  /** @param rightValues right columns to attach (emitted under the same
    *                    names; must not collide with left column names)
    * @param tolerance   optional maximum left−right time distance,
    *                    inclusive (µs for timestamp time columns, the
    *                    column's own units for numeric ones) — pandas
    *                    `merge_asof(tolerance=…)` semantics: when the
    *                    latest-≤ match is older than the bound the row
    *                    gets NULLS, it does not fall through to an even
    *                    older right row. Costs one predicate on the
    *                    already-backfilled struct — the plan is
    *                    unchanged.
    * @note ties among right rows at the same (key, time) are resolved
    *       arbitrarily — give the right side unique times per key. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightValues: Seq[String],
               tolerance: Option[Long] = None): DataFrame = {
    // __rt is the reserved field carrying the matched right row's own
    // time through the backfill for the tolerance check; a right value
    // column of the same name would make getField("__rt") ambiguous
    // (same guard family as Funnel/Sampling's output-name checks).
    require(!rightValues.contains("__rt"),
      "rightValues must not contain the reserved name __rt")
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    // The attached columns travel as ONE struct: backfilling each column
    // independently would tear rows when a right column is null (mixing
    // fields of different right rows — a composite that never existed).
    // The struct itself is never null on right rows, so last(ignoreNulls)
    // always adopts the newest whole row. Null join keys are dropped from
    // the right side (SQL join semantics: NULL matches nothing); null-key
    // left rows then see only left rows in their window → stay null.
    // null keys AND null times match nothing (a null __t would sort
    // first under Spark's nulls-first ascending and get adopted)
    // the matched row's own time rides in the struct so a tolerance can
    // be checked after the backfill without a second pass
    val r = right
      .where(col(key).isNotNull && col(rightTime).isNotNull)
      .select(col(key), col(rightTime).as("__t"), lit(0).as("__side"),
        struct((col(rightTime).as("__rt") +: rightValues.map(col)): _*).as("__r"))
    val all = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val backfilled = all
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    // tolerance units: MICROSECONDS for timestamp time columns, the
    // column's own units for numeric ones
    def asLong(c: org.apache.spark.sql.Column,
               dt: org.apache.spark.sql.types.DataType) = dt match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _ => c.cast("long")
    }
    val bounded = tolerance.fold(backfilled) { tol =>
      backfilled.withColumn("__r",
        when(asLong(col("__t"), left.schema(leftTime).dataType) -
          asLong(col("__r").getField("__rt"), right.schema(rightTime).dataType)
          <= tol, col("__r")))
    }
    bounded.select(leftCols.map(col) ++
      rightValues.map(c => col("__r").getField(c).as(c)): _*)
  }
}
