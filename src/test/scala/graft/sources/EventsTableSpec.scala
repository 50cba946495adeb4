package graft.sources

import graft.SparkSpec
import graft.core.Fixtures
import graft.operators.Sessionize
import org.scalatest.funsuite.AnyFunSuite

/** S2/S3: time-clustered sink + SQL registration round trip. */
class EventsTableSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("write → register → spark.sql over the events table") {
    import spark.implicits._
    val input = Fixtures.all.mkString("\n")
    val lines = input.split("\n", -1).toSeq.zipWithIndex.map { case (l, i) => (i.toLong, l) }
    val res = Sessionize(spark, lines.toDS())
    val dir = java.nio.file.Files.createTempDirectory("events_tbl").toString

    EventsTable.write(res.events, dir, buckets = 2)
    EventsTable.register(spark, dir, "events_spec")

    val byStatus = spark.sql(
      "SELECT status, count(*) AS n FROM events_spec GROUP BY status ORDER BY status")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus("sent") >= 4 && byStatus("bounced") >= 1)

    // ARRAY JOIN surface over the written table
    val domains = spark.sql(
      "SELECT d, count(*) n FROM events_spec LATERAL VIEW explode(domains_to) t AS d GROUP BY d")
      .collect().map(_.getString(0)).toSet
    assert(domains.contains("localhost"))

    // time-range scan with a pushed filter
    val ranged = spark.sql(
      "SELECT count(*) FROM events_spec WHERE timestamp >= TIMESTAMP '2024-05-01 00:00:00'")
    assert(ranged.queryExecution.executedPlan.toString.contains("GreaterThanOrEqual(timestamp"))
    assert(ranged.collect().head.getLong(0) >= 2)

    // day-partitioned variant
    val dir2 = java.nio.file.Files.createTempDirectory("events_part").toString
    EventsTable.writePartitioned(res.events, dir2)
    val part = spark.read.parquet(dir2)
    assert(part.columns.contains("event_date"))
    assert(part.count() == res.events.count())
  }

  test("bucketed tables join on queue_id with no exchange on either side") {
    import spark.implicits._
    val input = Fixtures.all.mkString("\n")
    val lines = input.split("\n", -1).toSeq.zipWithIndex.map { case (l, i) => (i.toLong, l) }
    val res = Sessionize(spark, lines.toDS())

    EventsTable.writeBucketed(res.events, "events_bucketed_a", numBuckets = 4)
    EventsTable.writeBucketed(res.events, "events_bucketed_b", numBuckets = 4)
    // at test size AQE (rightly) broadcasts the small side, which would
    // mask the property under test: that the bucket layout alone, with no
    // broadcastable side (the 100 TB case), joins without any exchange
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("events_bucketed_a").as("a")
        .join(spark.table("events_bucketed_b").as("b"), "queue_id")
        .groupBy("queue_id").count()
      // co-located layout: bucket i reads against bucket i — the join and
      // the aggregation reuse the write-time hash partitioning, so the
      // executed plan must contain no shuffle at all
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be exchange-free, got:\n$plan")
      assert(joined.count() == res.events.select("queue_id").distinct().count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS events_bucketed_a")
      spark.sql("DROP TABLE IF EXISTS events_bucketed_b")
      ()
    }
  }

  /** S3 verified end-to-end: the JDBC writer against embedded Derby (the
    * JDBC target available offline in /opt/spark/jars), recovering every
    * field including the JSON-serialized array columns. */
  test("JDBC sink round-trips events through embedded Derby") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import spark.implicits._
    val input = Fixtures.all.mkString("\n")
    val lines = input.split("\n", -1).toSeq.zipWithIndex.map { case (l, i) => (i.toLong, l) }
    val res = Sessionize(spark, lines.toDS())
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

    EventsTable.writeJdbc(res.events, url, "events_jdbc", props)

    val orig = res.events.toDF()
    val back = spark.read.jdbc(url, "events_jdbc", props)
      .withColumn("domains_to", from_json(col("domains_to"), ArrayType(StringType)))
      .withColumn("message_to", from_json(col("message_to"), ArrayType(StringType)))
      .withColumn("raw_log", from_json(col("raw_log"), ArrayType(StringType)))
      .select(orig.columns.map(col).toIndexedSeq: _*)
    assert(back.count() == orig.count())
    val a = orig.collect().map(_.toString).sorted.toSeq
    val b = back.collect().map(_.toString).sorted.toSeq
    assert(a == b, s"JDBC round-trip mismatch:\n  orig: ${a.headOption}\n  back: ${b.headOption}")
  }
}
