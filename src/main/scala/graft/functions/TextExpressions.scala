package graft.functions

import graft.core.Rfc2047
import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-processing Catalyst expressions:
  *
  *  - [[DecodeMimeHeader]] — the reference's RFC 2047 subject decode
  *    (parse.py:324-326) exposed as a SQL scalar function. The pipeline's
  *    fold keeps exception semantics (fault channel); the SQL surface
  *    returns NULL on malformed input, the conventional SQL contract.
  *  - [[WinnowFingerprint]] — document fingerprinting by winnowing
  *    (Schleimer/Wilkerson/Aiken, SIGMOD 2003): k-gram rolling hashes,
  *    keep the minimum of each sliding window → a compact, position-robust
  *    fingerprint set for near-dup detection / provenance.
  */
object TextExpressions {

  case class DecodeMimeHeader(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "decode_mime_header"

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      try UTF8String.fromString(Rfc2047.decodeFirstWord(s))
      catch { case _: Exception => null }
    }

    // Calls back into Scala — still participates in whole-stage codegen
    // via a bound reference to this expression instance.
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("decodeMime", this,
        classOf[DecodeMimeHeader].getName)
      val tmp = ctx.freshName("decoded")
      nullSafeCodeGen(ctx, ev, a => {
        s"""
        Object $tmp = $ref.nullSafeEval($a);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $tmp; }
        """
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Winnowing fingerprints: rolling polynomial hash over each k-char
    * gram, then per sliding window of `w` grams keep the rightmost
    * minimum; result is the sorted distinct set of kept hashes. */
  case class WinnowFingerprint(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "winnow_fingerprint"

    private val Base = 1000003L
    private val Mod = (1L << 61) - 1

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      if (s.length < k) return new GenericArrayData(Array.empty[Long])
      // rolling k-gram hashes
      val n = s.length - k + 1
      val hs = new Array[Long](n)
      var pow = 1L
      var i = 0
      while (i < k - 1) { pow = mulmod(pow, Base); i += 1 }
      var h = 0L
      i = 0
      while (i < k) { h = addmod(mulmod(h, Base), s.charAt(i).toLong); i += 1 }
      hs(0) = h
      i = 1
      while (i < n) {
        h = addmod(mulmod(addmod(h, Mod - mulmod(s.charAt(i - 1).toLong, pow)), Base),
          s.charAt(i + k - 1).toLong)
        hs(i) = h
        i += 1
      }
      // winnow: rightmost minimum of each window of w hashes, collected
      // into a primitive buffer → sort → in-place dedup (the result
      // contract is the sorted distinct set; a SortedSet[Long] here boxed
      // every insert in the per-row hot loop)
      var kept: Array[Long] = null
      var nk = 0
      if (n <= w) {
        var m = hs(0)
        var t = 1
        while (t < n) { if (hs(t) < m) m = hs(t); t += 1 }
        kept = Array(m); nk = 1
      } else {
        kept = new Array[Long](n - w + 1)
        var lastMi = -1
        var j = 0
        while (j + w <= n) {
          var m = hs(j)
          var mi = j
          var t = j + 1
          while (t < j + w) {
            if (hs(t) <= m) { m = hs(t); mi = t }
            t += 1
          }
          if (mi != lastMi) { kept(nk) = m; nk += 1; lastMi = mi }
          j += 1
        }
      }
      java.util.Arrays.sort(kept, 0, nk)
      var out = 1
      var i2 = 1
      while (i2 < nk) {
        if (kept(i2) != kept(out - 1)) { kept(out) = kept(i2); out += 1 }
        i2 += 1
      }
      if (nk == 0) out = 0
      new GenericArrayData(java.util.Arrays.copyOf(kept, out))
    }

    /** a*b mod (2^61−1) in pure longs for a,b ∈ [0, Mod): 128-bit product
      * via multiplyHigh, then Mersenne fold (2^61 ≡ 1 ⇒ add the high part
      * shifted down by 61). */
    private def mulmod(a: Long, b: Long): Long = {
      val hi = Math.multiplyHigh(a, b)
      val lo = a * b
      var r = (lo & Mod) + ((hi << 3) | (lo >>> 61))
      r = (r & Mod) + (r >>> 61)
      if (r >= Mod) r - Mod else r
    }
    private def addmod(a: Long, b: Long): Long = {
      val r = a + b
      if (r >= Mod) r - Mod else r
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("winnow", this, classOf[WinnowFingerprint].getName)
      nullSafeCodeGen(ctx, ev, a => {
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($a);"
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** BPE-encode a space-separated text into subword pieces with a fixed
    * learned merge table ([[graft.operators.Bpe]] kernel — the trainer's
    * exact greedy discipline, so encode(word) reproduces the training
    * segmentation). The merge table is a constructor param: it rides
    * into the generated code as a bound reference (the ranks map is
    * built once per executor instance, not per row), the standard way a
    * small model artifact accompanies a scan. */
  case class BpeEncodeText(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "bpe_encode"

    @transient private lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    override def nullSafeEval(input: Any): Any = {
      val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
      val out = Vector.newBuilder[UTF8String]
      var i = 0
      while (i < words.length) {
        if (words(i).nonEmpty) {
          graft.operators.Bpe.encodeWord(words(i), ranks)
            .foreach(p => out += UTF8String.fromString(p))
        }
        i += 1
      }
      new GenericArrayData(out.result().toArray[Any])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpe", this, classOf[BpeEncodeText].getName)
      nullSafeCodeGen(ctx, ev, a => {
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($a);"
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Order-`n` LM transitions of a token array as
    * array<struct<prev,cur>> — one tight per-row loop over the token
    * ArrayData. Semantically identical to the declarative
    * `transform(sequence(1, m−(n−1)), i → struct(array_join(slice(toks,
    * i, n−1), sep), element_at(toks, i+n−1)))`, but that HOF chain
    * evaluates an INTERPRETED lambda (plus a slice + array_join
    * allocation) per transition — measured 1.6 s of the 1.9 s LM
    * scoring wall at the 2.7M-transition sf1 probe (tools.LmProbe),
    * with the model joins near-free. The expression emits UTF8String
    * refs into the input buffer (no copies; Generate projects them out
    * before the next row, the same contract Spark's own array functions
    * rely on) and joins multi-token contexts with one concatWs. */
  case class NgramTransitions(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 2, "n-gram order must be >= 2")
    override def dataType: DataType = ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("prev", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("cur", StringType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "ngram_transitions"

    @transient private lazy val sep =
      UTF8String.fromString(graft.operators.TextAnalysis.TokenSep)

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val m = toks.numElements()
      if (m < n) return new GenericArrayData(Array.empty[Any])
      val out = new Array[Any](m - n + 1)
      var i = 0
      while (i <= m - n) {
        val prev =
          if (n == 2) toks.getUTF8String(i)
          else {
            val parts = new Array[UTF8String](n - 1)
            var j = 0
            while (j < n - 1) { parts(j) = toks.getUTF8String(i + j); j += 1 }
            UTF8String.concatWs(sep, parts: _*)
          }
        out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](prev, toks.getUTF8String(i + n - 1)))
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ngramTr", this, classOf[NgramTransitions].getName)
      nullSafeCodeGen(ctx, ev, a => {
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($a);"
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Main-content extraction from HTML markup — the markup→text stage a
    * real ingest pipeline runs before any of the text operators. One
    * scan-speed pass (no DOM, no regex backtracking) with jusText-style
    * literal thresholds:
    *
    *  - `<script>`/`<style>` element CONTENTS and `<!-- -->` comments
    *    are skipped wholesale (raw `<`, `>`, `&` inside them included);
    *  - BLOCK-level tags (open or close, case-insensitive) delimit
    *    blocks; inline tags (`<a>`, `<b>`, `<span>`, …) do not;
    *  - entities: the named five (`&amp; &lt; &gt; &quot; &apos;`),
    *    the common typographic ten (`&nbsp;` — decoded to a PLAIN
    *    space, it is layout not content — `&ndash; &mdash; &lsquo;
    *    &rsquo; &ldquo; &rdquo; &hellip; &copy; &deg; &times;`), and
    *    numeric `&#NNN;` / hex `&#xHH;` (BMP only) decode; anything
    *    else stays literal;
    *  - per block, whitespace-normalized text plus two integer
    *    counters: visible non-space chars, and those inside `<a>`
    *    elements;
    *  - KEEP a block iff normalized length ≥ [[HtmlMinBlockChars]] AND
    *    link chars · 4 ≤ total non-space chars (link density ≤ 0.25 —
    *    navigation/footer link farms fail this, prose with a trailing
    *    "more" link passes).
    *
    * Every rule is integer arithmetic over planted token groups, so the
    * gate's DuckDB oracle re-derives the kept-block set relationally
    * ([[graft.queries.ExtensionQueries.textHtmlExtract]]). */
  val HtmlMinBlockChars = 25
  private val HtmlBlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("html", "head", "body", "title", "p", "div", "h1", "h2", "h3",
      "h4", "h5", "h6", "li", "ul", "ol", "dl", "dt", "dd", "table",
      "tr", "td", "th", "thead", "tbody", "br", "hr", "section",
      "article", "header", "footer", "nav", "aside", "blockquote",
      "pre", "form", "main", "figure", "figcaption").foreach(s.add)
    s
  }

  /** The scan kernel behind [[HtmlExtractBlocks]] — exposed for specs. */
  def htmlBlocks(html: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val buf = new java.lang.StringBuilder
    var total = 0; var link = 0; var linkDepth = 0
    val n = html.length
    def append(c: Char): Unit = {
      buf.append(c)
      if (!Character.isWhitespace(c)) {
        total += 1
        if (linkDepth > 0) link += 1
      }
    }
    def flushBlock(): Unit = {
      // whitespace-collapse without regex: single spaces between runs
      val txt = new java.lang.StringBuilder(buf.length)
      var i = 0; var pendingSpace = false
      while (i < buf.length) {
        val c = buf.charAt(i)
        if (Character.isWhitespace(c)) { if (txt.length > 0) pendingSpace = true }
        else { if (pendingSpace) { txt.append(' '); pendingSpace = false }; txt.append(c) }
        i += 1
      }
      if (txt.length >= HtmlMinBlockChars && link * 4 <= total)
        out += txt.toString
      buf.setLength(0); total = 0; link = 0
    }
    var i = 0
    while (i < n) {
      val ch = html.charAt(i)
      if (ch == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          var j = i + 1
          var closing = false
          if (j < n && html.charAt(j) == '/') { closing = true; j += 1 }
          val s = j
          while (j < n && (Character.isLetter(html.charAt(j)) ||
            Character.isDigit(html.charAt(j)))) j += 1
          val name = html.substring(s, j).toLowerCase(java.util.Locale.ROOT)
          var k = j
          while (k < n && html.charAt(k) != '>') k += 1
          i = if (k < n) k + 1 else n
          if (!closing && (name == "script" || name == "style")) {
            // raw-text element: skip to the matching close tag
            val close = "</" + name
            var p = i; var found = -1
            while (found < 0 && p <= n - close.length) {
              if (html.regionMatches(true, p, close, 0, close.length)) found = p
              p += 1
            }
            if (found < 0) i = n
            else {
              var q = found + close.length
              while (q < n && html.charAt(q) != '>') q += 1
              i = if (q < n) q + 1 else n
            }
          } else if (name == "a") {
            if (closing) linkDepth = math.max(0, linkDepth - 1)
            else linkDepth += 1
          } else if (HtmlBlockTags.contains(name)) flushBlock()
        }
      } else if (ch == '&') {
        val semi = html.indexOf(';', i + 1)
        var decoded = -1
        if (semi > i && semi - i <= 8) {
          val ent = html.substring(i + 1, semi)
          decoded = ent match {
            case "amp" => '&'.toInt
            case "lt" => '<'.toInt
            case "gt" => '>'.toInt
            case "quot" => '"'.toInt
            case "apos" => '\''.toInt
            // nbsp decodes to a PLAIN space by design: it is layout,
            // not content, and extracted text feeding token stats must
            // not carry U+00A0 lookalikes of the space it renders as
            case "nbsp" => ' '.toInt
            case "ndash" => 0x2013
            case "mdash" => 0x2014
            case "lsquo" => 0x2018
            case "rsquo" => 0x2019
            case "ldquo" => 0x201C
            case "rdquo" => 0x201D
            case "hellip" => 0x2026
            case "copy" => 0x00A9
            case "deg" => 0x00B0
            case "times" => 0x00D7
            case _ =>
              // numeric: decimal &#NNN; or hex &#xHH;/&#XHH; (BMP only)
              if (ent.length > 1 && ent.charAt(0) == '#') {
                val hex = ent.length > 2 &&
                  (ent.charAt(1) == 'x' || ent.charAt(1) == 'X')
                val digits = ent.substring(if (hex) 2 else 1)
                val radix = if (hex) 16 else 10
                if (digits.nonEmpty &&
                    digits.forall(c => Character.digit(c, radix) >= 0)) {
                  try {
                    val v = Integer.parseInt(digits, radix)
                    if (v < 0x10000) v else -1
                  } catch { case _: NumberFormatException => -1 }
                } else -1
              } else -1
          }
        }
        if (decoded >= 0) { append(decoded.toChar); i = semi + 1 }
        else { append('&'); i += 1 }
      } else { append(ch); i += 1 }
    }
    flushBlock()
    out.toArray
  }

  /** HTML → kept main-content blocks (see [[htmlBlocks]] for the spec).
    * string → array<string>, empty array for markup with no block
    * passing the thresholds. */
  case class HtmlExtractBlocks(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "html_extract_blocks"

    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(
        htmlBlocks(input.asInstanceOf[UTF8String].toString)
          .map(UTF8String.fromString): Array[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("htmlExtract", this,
        classOf[HtmlExtractBlocks].getName)
      nullSafeCodeGen(ctx, ev, a => {
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($a);"
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def htmlExtractBlocks(c: Column): Column =
    GraftBridge.column(HtmlExtractBlocks(GraftBridge.expr(c)))

  def decodeMimeHeader(c: Column): Column =
    GraftBridge.column(DecodeMimeHeader(GraftBridge.expr(c)))
  def ngramTransitions(toks: Column, n: Int): Column =
    GraftBridge.column(NgramTransitions(GraftBridge.expr(toks), n))
  def bpeEncode(c: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeEncodeText(GraftBridge.expr(c), merges))
  def winnowFingerprint(c: Column, k: Int = 8, w: Int = 4): Column =
    GraftBridge.column(WinnowFingerprint(GraftBridge.expr(c), k, w))

  // Per-registry first-registration flags (weak keys: a closed session's
  // registry can be collected). Guarding on a flag rather than on
  // functionExists keeps strict ownership: the FIRST register() call in a
  // session still createOrReplaces a conflicting pre-existing user
  // function of the same name, while repeat calls (one per streaming
  // micro-batch from per-batch query code) skip the registry write and
  // its noisy "replaced a previously registered function" warning.
  private val registeredSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[AnyRef, java.lang.Boolean]())

  /** Register the SQL-facing function names. Idempotent per session.
    * When the flag says "already registered" but a name has since been
    * DROPPED from the registry (catalog.dropTempFunction, a registry
    * reset), the existence re-check below restores it — the flag is a
    * hot-path shortcut, not the source of truth. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val names = Seq(
      "decode_mime_header" ->
        ((exprs: Seq[Expression]) => DecodeMimeHeader(exprs.head)),
      "winnow_fingerprint" ->
        ((exprs: Seq[Expression]) => WinnowFingerprint(exprs.head, 8, 4)),
      "html_extract_blocks" ->
        ((exprs: Seq[Expression]) => HtmlExtractBlocks(exprs.head)))
    if (registeredSessions.putIfAbsent(reg, java.lang.Boolean.TRUE) == null)
      names.foreach { case (n, b) =>
        reg.createOrReplaceTempFunction(n, b, "scala_udf") }
    else
      // cheap in-memory lookups per micro-batch; only a dropped name
      // pays the re-registration write (and its replace warning)
      names.foreach { case (n, b) =>
        if (!reg.functionExists(
              org.apache.spark.sql.catalyst.FunctionIdentifier(n)))
          reg.createOrReplaceTempFunction(n, b, "scala_udf") }
  }
}
