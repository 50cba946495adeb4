package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("decode_mime_header via spark.sql (registered function)") {
    TextExpressions.register(spark)
    val r = spark.sql(
      "SELECT decode_mime_header('=?UTF-8?B?dGVzdCAtINCi0LXRgdGC?=') AS s, " +
      "decode_mime_header('=?UTF-8?Q?caf=C3=A9?=') AS q, " +
      "decode_mime_header('not encoded') AS bad").collect().head
    assert(r.getString(0) == "test - Тест")
    assert(r.getString(1) == "café")
    assert(r.isNullAt(2))   // SQL contract: NULL on malformed
  }

  test("ngram transitions kernel equals the declarative HOF formulation") {
    import spark.implicits._
    val docs = Seq("a b c d e", "x y", "solo", "", "p q r").toDF("text")
    val toks = split(col("text"), " ")
    for (n <- Seq(2, 3)) {
      val declarative = when(size(toks) < n,
          array().cast("array<struct<prev:string,cur:string>>"))
        .otherwise(transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => struct(
            array_join(slice(toks, i, lit(n - 1)), " ").as("prev"),
            element_at(toks, i + (n - 1)).as("cur"))))
      val got = docs.select(col("text"),
          TextExpressions.ngramTransitions(toks, n).as("k"),
          declarative.as("d"))
        .collect()
      for (r <- got)
        assert(r.get(1) == r.get(2), s"n=$n text='${r.getString(0)}'")
    }
  }

  test("winnow fingerprint: identity, near-dup overlap, unrelated docs") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again " * 4
    val near = base.replace("lazy", "late")
    val other = "completely different content with nothing shared at all here " * 4
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, other)).toDF("id", "text")
      .select($"id", TextExpressions.winnowFingerprint($"text").as("fp"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L) == fps(2L))                    // identical docs → identical prints
    val nearOverlap = (fps(1L) & fps(3L)).size.toDouble / (fps(1L) | fps(3L)).size
    val otherOverlap = (fps(1L) & fps(4L)).size.toDouble / (fps(1L) | fps(4L)).size
    assert(nearOverlap > 0.5, s"near-dup overlap $nearOverlap")
    assert(otherOverlap < 0.1, s"unrelated overlap $otherOverlap")
  }

  test("vec_dot SQL function matches manual dot product") {
    VectorExpressions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(cast(1.5 as float), cast(2.0 as float)), " +
      "array(cast(2.0 as float), cast(0.5 as float))) AS d").collect().head
    assert(r.getDouble(0) == 1.5 * 2.0 + 2.0 * 0.5)
  }

  test("int8 quantize/dot SQL functions round-trip through spark.sql") {
    VectorExpressions.register(spark)
    val r = spark.sql(
      "SELECT int8_vec_dot(q, q) AS n2 FROM (SELECT int8_quantize(" +
      "array(cast(0.5 as float), cast(-1.0 as float))) AS q)").collect().head
    assert(r.getLong(0) == 64L * 64 + 127L * 127)
  }

  test("short text below k yields empty fingerprint, not a crash") {
    import spark.implicits._
    val fps = Seq((1L, "tiny")).toDF("id", "text")
      .select(TextExpressions.winnowFingerprint($"text").as("fp"))
      .collect().head.getSeq[Long](0)
    assert(fps.isEmpty)
  }
}
