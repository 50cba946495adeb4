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

  // ---------------------------------------------- HTML block extraction ----

  test("htmlBlocks keeps prose, drops boilerplate/link farms/short blocks") {
    val html =
      "<html><head><title>Site</title><style>p { color: red }</style>" +
      "<script>if (a < b && c > d) { var s = \"<p>fake</p>\"; }</script>" +
      "</head><body>" +
      "<p>this paragraph is long enough to pass the minimum length rule</p>" +
      "<div><a href=\"/1\">home</a> <a href=\"/2\">products</a> " +
      "<a href=\"/3\">about us page</a></div>" +   // link density 1 → drop
      "<p>short one</p>" +                          // < 25 chars → drop
      "<p>prose with a trailing <a href=\"/m\">link</a> stays because " +
      "density is low</p>" +
      "<footer><a href=\"/c\">contact</a></footer></body></html>"
    val got = TextExpressions.htmlBlocks(html)
    assert(got.toSeq == Seq(
      "this paragraph is long enough to pass the minimum length rule",
      "prose with a trailing link stays because density is low"))
  }

  test("htmlBlocks decodes entities, collapses whitespace, survives edge markup") {
    // entities + multi-whitespace + inline tags not splitting blocks
    val got = TextExpressions.htmlBlocks(
      "<p>fish &amp; chips &lt;tag&gt;\n\t with   <b>bold &#65;</b> text</p>")
    assert(got.toSeq == Seq("fish & chips <tag> with bold A text"))
    // unknown/malformed entities stay literal
    assert(TextExpressions.htmlBlocks(
      "<p>a &nope; b &#999999; c & d literal ampersands pass through</p>")
      .head == "a &nope; b &#999999; c & d literal ampersands pass through")
    // unterminated comment and unclosed script do not hang or leak text
    assert(TextExpressions.htmlBlocks("<p>before text that is long enough" +
      " to keep</p><!-- never closed").toSeq ==
      Seq("before text that is long enough to keep"))
    assert(TextExpressions.htmlBlocks(
      "<script>var x = 1; // never closed").isEmpty)
    // case-insensitive tags; <BR/> splits blocks
    assert(TextExpressions.htmlBlocks(
      "<P>upper case paragraph long enough to keep<BR/>second half also" +
      " long enough to keep</P>").length == 2)
  }

  test("htmlBlocks decodes the typographic entity set; nbsp becomes a plain space") {
    val got = TextExpressions.htmlBlocks(
      "<p>&lsquo;alpha beta gamma delta epsilon&rsquo;&nbsp;&ndash; " +
      "&ldquo;3&times;4&#x3D;12&rdquo;&deg; &copy; &mdash;&hellip; &#X41;&#66;</p>")
    assert(got.toSeq ==
      Seq("‘alpha beta gamma delta epsilon’ – " +
        "“3×4=12”° © —… AB"))
    // nbsp decodes to U+0020, NOT U+00A0 — and as whitespace it
    // collapses with adjacent spaces
    assert(!got.head.contains('\u00a0'))
    assert(TextExpressions.htmlBlocks(
      "<p>word&nbsp; &nbsp;pair plus padding to pass the length gate</p>")
      .head == "word pair plus padding to pass the length gate")
    // hex numerics are case-insensitive in both prefix and digits;
    // out-of-BMP and malformed hex stay literal
    assert(TextExpressions.htmlBlocks(
      "<p>hex &#x6d;&#X4D; pair padded out to pass the length gate</p>")
      .head == "hex mM pair padded out to pass the length gate")
    assert(TextExpressions.htmlBlocks(
      "<p>a &#x110000; b &#xZZ; literal forms all pass through here</p>")
      .head == "a &#x110000; b &#xZZ; literal forms all pass through here")
  }

  test("html_extract_blocks registered SQL function works via spark.sql") {
    TextExpressions.register(spark)
    val r = spark.sql(
      "SELECT html_extract_blocks('<p>a sql surface block long enough to" +
      " pass the gate</p>') AS b").collect().head.getSeq[String](0)
    assert(r == Seq("a sql surface block long enough to pass the gate"))
  }
}
