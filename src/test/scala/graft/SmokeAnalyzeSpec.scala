package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must at least ANALYZE against the CURRENT
  * /root/testdata — DataFrame construction runs Catalyst analysis
  * eagerly, so this catches physical-encoding drift in the driver's
  * generated parquet (round 10: events.ts switched INT64-nanos →
  * µs TIMESTAMP_NTZ and 13 queries started throwing DATATYPE_MISMATCH
  * at analysis time, invisible to the unit suite because its fixtures
  * carried the old encoding). No oracle, no execution — a few seconds
  * for the whole surface. Queries that internally materialize
  * (IVF/k-means training, BPE merges) do real but sf0.001-sized work. */
class SmokeAnalyzeSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("every SparkEntry.queries entry analyzes against current testdata") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val r = try { fn(spark, sfDir).schema; None } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.take(2).mkString(" ")}")
      }
      graft.operators.CacheRegistry.releaseAll()
      r
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry() flagship analyzes and returns rows on sf0.001") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists())
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
