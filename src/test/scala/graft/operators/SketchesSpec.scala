package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // 5000 rows, 7 types, 613 distinct users spread across all types
  private def events = (0 until 5000).map { i =>
    (i.toLong, s"type_${i % 7}", (i * 2654435761L % 613).toString)
  }.toDF("event_id", "event_type", "user_id")

  private lazy val exact: Map[String, Long] = events.groupBy("event_type")
    .agg(countDistinct($"user_id").as("n"))
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def estimates(shards: Int): Map[String, Long] =
    Sketches.hllRollup(
        Sketches.hllCube(events, Seq("event_type"), "user_id", shards),
        Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def assertInBound(est: Map[String, Long], bound: Double = 0.05): Unit = {
    assert(est.keySet == exact.keySet)
    for ((k, e) <- exact) {
      val rel = math.abs(est(k) - e).toDouble / e
      assert(rel <= bound, s"$k: estimate ${est(k)} vs exact $e (rel $rel)")
    }
  }

  test("rollup estimate is within the HLL error bound of exact") {
    assertInBound(estimates(shards = 32))
  }

  test("re-sharding keeps every estimate within the bound (no accuracy loss from pre-aggregation)") {
    for (s <- Seq(1, 4, 64)) assertInBound(estimates(shards = s))
  }

  test("direct single-pass sketch is also in-bound (merged roll-up concedes no accuracy)") {
    val direct = events.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(12))).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assertInBound(direct)
  }

  test("merging an incremental cube stays in-bound (append-only daily increments)") {
    val old = events.filter($"event_id" < 3000)
    val inc = events.filter($"event_id" >= 3000)
    val merged = Sketches.hllMergeCubes(
      Sketches.hllCube(old, Seq("event_type"), "user_id", shards = 8),
      Sketches.hllCube(inc, Seq("event_type"), "user_id", shards = 8),
      Seq("event_type"))
    val fromMerged = Sketches.hllRollup(merged, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assertInBound(fromMerged)
  }

  test("cube persists through parquet round-trip with identical estimates") {
    val dir = java.nio.file.Files.createTempDirectory("hll_cube").toString
    val cube = Sketches.hllCube(events, Seq("event_type"), "user_id", shards = 8)
    cube.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    // parquet preserves the sketch BYTES exactly...
    def bytes(df: org.apache.spark.sql.DataFrame) = df
      .select($"event_type", $"_shard", base64($"hll"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(bytes(reloaded) == bytes(cube))
    // ...so the reloaded cube rolls up in-bound like the original
    assertInBound(Sketches.hllRollup(reloaded, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  test("coarser roll-up over a dim subset answers from the cube and is in-bound") {
    val cube = Sketches.hllCube(
      events.withColumn("half", ($"event_id" % 2).cast("int")),
      Seq("event_type", "half"), "user_id", shards = 8)
    val est = Sketches.hllRollup(cube, Nil).collect().head.getLong(0)
    val total = events.select(countDistinct($"user_id")).as[Long].head()
    assert(math.abs(est - total).toDouble / total <= 0.05)
  }
}
