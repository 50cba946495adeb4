package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class SaltingSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("salted collect_set equals the direct aggregate on a skewed key") {
    import spark.implicits._
    // 10k rows on one hot key + a few cold keys
    val df = ((1 to 10000).map(i => ("hot", s"v${i % 500}")) ++
      (1 to 20).map(i => (s"cold$i", "x"))).toDF("k", "v")
    val salted = Salting.saltedCollectSet(df, "k", "v", salts = 8)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(salted("hot") == (0 until 500).map(i => s"v$i").toSet)
    assert(salted("cold7") == Set("x"))
    assert(salted.size == 21)
  }
}
