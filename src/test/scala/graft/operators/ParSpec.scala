package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** [[Par.widen]] — widens narrow scans, leaves wide inputs alone, and
  * never changes content. */
class ParSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("widens a single-partition input to default parallelism") {
    val one = (1L to 1000L).toDF("v").coalesce(1)
    assert(one.rdd.getNumPartitions === 1)
    val wide = Par.widen(one)
    assert(wide.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    assert(wide.as[Long].collect().sorted === (1L to 1000L).toArray)
  }

  test("no-op on an input already at or above default parallelism") {
    val target = spark.sparkContext.defaultParallelism
    val wide = (1L to 1000L).toDF("v").repartition(target + 5)
    assert(Par.widen(wide) eq wide)
  }

  test("single-row-group parquet scan arrives narrow and widens (the testdata shape)") {
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
    assert(docs.rdd.getNumPartitions === 1,
      "testdata layout changed: no longer single-partition — revisit Par.widen call sites")
    assert(Par.widen(docs).rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
  }
}
