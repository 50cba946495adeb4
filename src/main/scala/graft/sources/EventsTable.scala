package graft.sources

import graft.core.PostfixEvent
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The `events` analytic table — our replacement for the reference's
  * ClickHouse side (DDL parse.py:27-54, sink parse.py:447-505).
  *
  * Mapping of `ENGINE MergeTree ORDER BY timestamp` (parse.py:53) onto
  * parquet/Spark:
  *   - range-repartition on `timestamp` → files cover disjoint time
  *     ranges (MergeTree parts),
  *   - sortWithinPartitions → rows inside each file are time-ordered, so
  *     parquet row-group min/max statistics give the same time-range scan
  *     pruning a MergeTree primary index provides,
  *   - optional day partitioning (`partitioned=true`) adds directory-level
  *     partition pruning for multi-month retention at cluster scale.
  *
  * The reference's per-row synchronous insert becomes a bulk columnar
  * write — a documented semantic difference (batch atomicity), not one to
  * replicate (SURVEY.md §4).
  */
object EventsTable {

  val TableName = "events_log"

  /** Write events time-clustered; `buckets` controls output file count. */
  def write(events: Dataset[PostfixEvent], path: String,
            mode: SaveMode = SaveMode.Overwrite,
            buckets: Int = 0): Unit = {
    val n = if (buckets > 0) buckets
            else events.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    events.toDF()
      .repartitionByRange(n, col("timestamp"))
      .sortWithinPartitions("timestamp")
      .write.mode(mode).parquet(path)
  }

  /** Day-partitioned variant for long retention. */
  def writePartitioned(events: Dataset[PostfixEvent], path: String,
                       mode: SaveMode = SaveMode.Overwrite): Unit = {
    val df = events.toDF().withColumn("event_date", to_date(col("timestamp")))
    df.repartitionByRange(df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
        col("event_date"), col("timestamp"))
      .sortWithinPartitions("timestamp")
      .write.mode(mode).partitionBy("event_date").parquet(path)
  }

  /** Hash-bucketed variant (catalog table): `CLUSTERED BY (queue_id)
    * SORTED BY (queue_id) INTO n BUCKETS`. At 100 TB this is the
    * co-located-join layout: any equi-join or aggregation on `queue_id`
    * between two tables bucketed with the same count reads bucket i
    * against bucket i with NO exchange on either side (asserted in
    * EventsTableSpec) — the shuffle is paid once at write time instead of
    * per query. Requires `saveAsTable` (bucket metadata lives in the
    * catalog, not in parquet files). */
  def writeBucketed(events: Dataset[PostfixEvent], table: String,
                    numBuckets: Int = 32,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    events.toDF()
      .write.mode(mode)
      .bucketBy(numBuckets, "queue_id")
      .sortBy("queue_id")
      .format("parquet")
      .saveAsTable(table)

  /** JDBC bulk sink — the drop-in replacement for the reference's per-row
    * ClickHouse insert (parse.py:447-505), using Spark's partition-
    * parallel batched INSERT writer. Spark's generic JDBC path has no
    * ArrayType mapping, so the three array columns are serialized as JSON
    * text (`domains_to`/`message_to`/`raw_log`); a ClickHouse deployment
    * can `JSONExtract(Array(String))` them or register a JdbcDialect with
    * native array support. Round-tripped against embedded Derby
    * (EventsTableSpec), including JSON-array recovery of every field. */
  def writeJdbc(events: Dataset[PostfixEvent], url: String, table: String,
                props: java.util.Properties): Unit =
    events.toDF()
      .withColumn("domains_to", to_json(col("domains_to")))
      .withColumn("message_to", to_json(col("message_to")))
      .withColumn("raw_log", to_json(col("raw_log")))
      .write.mode(SaveMode.Append).jdbc(url, table, props)

  /** Read + register as a SQL view so `spark.sql("... FROM events_log")`
    * serves the reference's implied ClickHouse query surface
    * (SURVEY.md §2.5): time-range scans hit parquet row-group pruning,
    * `ARRAY JOIN domains_to` ≈ `explode(domains_to)` / LATERAL VIEW. */
  def register(spark: SparkSession, path: String,
               name: String = TableName): DataFrame = {
    val df = spark.read.parquet(path)
    df.createOrReplaceTempView(name)
    df
  }
}
