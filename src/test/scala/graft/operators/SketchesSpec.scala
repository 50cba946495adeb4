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

  test("theta overlap estimates intersection and difference within bound") {
    // users 0-299 do "a"; 200-499 do "b": |a|=300 |b|=300 |a∩b|=100 |a\b|=200
    val rows = (0 until 300).map(u => ("a", s"u$u")) ++
      (200 until 500).map(u => ("b", s"u$u"))
    val df = rows.toDF("event_type", "user_id")
    val overlap = Sketches.thetaOverlap(
        Sketches.thetaSketches(df, Seq("event_type"), "user_id"), "event_type")
      .collect().head
    def rel(est: Long, exact: Double) = math.abs(est - exact) / exact
    assert(overlap.getString(0) == "a" && overlap.getString(1) == "b")
    assert(rel(overlap.getLong(2), 300) <= 0.05, s"n_a=${overlap.getLong(2)}")
    assert(rel(overlap.getLong(3), 300) <= 0.05, s"n_b=${overlap.getLong(3)}")
    assert(rel(overlap.getLong(4), 100) <= 0.05, s"n_int=${overlap.getLong(4)}")
    assert(rel(overlap.getLong(5), 200) <= 0.05, s"n_only=${overlap.getLong(5)}")
  }

  test("kll cube roll-up returns quantiles within the rank-error bound") {
    // values 1..10000 per type: exact p-quantile of type t is ~p*10000
    val rows = for (t <- Seq("x", "y"); v <- 1 to 10000)
      yield (t, v.toDouble * (if (t == "x") 1 else 3))
    val df = rows.toDF("event_type", "value")
    val q = Sketches.kllRollup(
        Sketches.kllCube(df, Seq("event_type"), "value", shards = 16),
        Seq("event_type"), Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // rank error eps≈1.65% at k=200: value at p must sit within the
    // exact (p±3eps) quantile values
    def inRankBound(v: Double, p: Double, scale: Double): Boolean = {
      val eps = 0.05
      v >= (p - eps) * 10000 * scale && v <= (p + eps) * 10000 * scale
    }
    for ((t, scale) <- Seq(("x", 1.0), ("y", 3.0))) {
      val (p50, p90, p99) = q(t)
      assert(inRankBound(p50, 0.50, scale), s"$t p50=$p50")
      assert(inRankBound(p90, 0.90, scale), s"$t p90=$p90")
      assert(inRankBound(p99, 0.99, scale), s"$t p99=$p99")
    }
  }

  test("kll cube merges across shard counts and parquet round-trip within bound") {
    val df = (1 to 5000).map(v => ("z", v.toDouble)).toDF("event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("kll_cube").toString
    Sketches.kllCube(df, Seq("event_type"), "value", shards = 8)
      .write.mode("overwrite").parquet(dir)
    val p50 = Sketches.kllRollup(spark.read.parquet(dir), Seq("event_type"),
        Seq(0.5)).collect().head.getDouble(1)
    assert(math.abs(p50 - 2500) <= 0.05 * 5000, s"p50=$p50")
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
