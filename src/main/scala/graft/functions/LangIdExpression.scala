package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-profile language identification over 21 languages — the
  * classic two-stage heuristic (script detection, then character-n-gram
  * profiles within the Latin script; Cavnar & Trenkle 1994 made the
  * n-gram-profile argument, this uses curated high-frequency grams with
  * length weighting instead of rank distance so the score stays a pure
  * integer both engines compute identically):
  *
  *  1. decode the text's codepoints ONCE, counting per-script characters
  *     (Hangul, Kana, Han, Cyrillic, Arabic, Hebrew, Greek, Thai,
  *     Devanagari). A script that claims enough of the text decides the
  *     language outright — Kana is checked before Han because Japanese
  *     prose mixes both, while Chinese has no Kana.
  *  2. otherwise, score each Latin-script language by its profile grams:
  *     Σ occurrences(gram) · len(gram) over the space-padded,
  *     ASCII-lowercased text (non-overlapping counts — the same number
  *     `length(t) − length(replace(t, g, ''))` yields, which is how the
  *     DuckDB oracle computes it). Argmax, first language wins ties.
  *
  * Everything is integer arithmetic on counts, so [[LangProfiles.classify]]
  * (the JVM kernel inside the codegen expression [[LangIdText]]) and the
  * SQL [[LangProfiles.oracleColumnsSql]] generates are bit-identical —
  * both sides derive from the SAME profile constants, so they cannot
  * drift. The kernel is one pass for scripts plus one byte-scan per gram
  * (no per-gram string allocation): shuffle-free, scan-speed, inside
  * whole-stage codegen.
  */
object LangProfiles {

  /** (lang, codepoint lo, codepoint hi, multiplier): classify as `lang`
    * when scriptCount · multiplier ≥ totalCodepoints (and count > 0).
    * Order is decision priority. */
  val Scripts: Seq[(String, Int, Int, Int)] = Seq(
    ("ja", 0x3040, 0x30FF, 20), // Hiragana+Katakana — 5% Kana ⇒ Japanese
    ("ko", 0xAC00, 0xD7A3, 10), // Hangul syllables
    ("zh", 0x4E00, 0x9FFF, 10), // CJK unified (after the Kana check)
    ("ru", 0x0400, 0x04FF, 10), // Cyrillic
    ("ar", 0x0600, 0x06FF, 10), // Arabic
    ("he", 0x0590, 0x05FF, 10), // Hebrew
    ("el", 0x0370, 0x03FF, 10), // Greek
    ("th", 0x0E00, 0x0E7F, 10), // Thai
    ("hi", 0x0900, 0x097F, 10)) // Devanagari

  /** Latin-script profiles: curated high-frequency function words /
    * character sequences (public frequency lists), space-padded where
    * they are whole words. Order is the deterministic tie-break. */
  val Latin: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is ", " that ", " it ", " with ", "ing "),
    "es" -> Seq(" el ", " los ", " las ", " que ", " una ", " es ", " por ", "ción"),
    "de" -> Seq(" der ", " die ", " das ", " und ", " ist ", " ein ", " nicht ", "sch"),
    "fr" -> Seq(" le ", " les ", " des ", " est ", " une ", " dans ", " que ", " pour "),
    "it" -> Seq(" il ", " che ", " per ", " una ", " con ", " sono ", "zione", " di "),
    "pt" -> Seq(" não ", " uma ", " com ", " para ", "ção", " os ", " em ", " do "),
    "nl" -> Seq(" het ", " een ", " van ", " niet ", " dat ", "ijk ", " de ", " zijn "),
    "sv" -> Seq(" och ", " att ", " det ", " som ", " är ", " för ", " på ", " med "),
    "pl" -> Seq(" nie ", " się ", " jest ", " na ", " do ", " że ", "ych ", " przez "),
    "tr" -> Seq(" bir ", " ve ", " bu ", " için ", "lar ", "ler ", " da ", " olarak "),
    "id" -> Seq(" yang ", " dan ", " di ", " ini ", " dengan ", " untuk ", " adalah ", " dari "),
    "ro" -> Seq(" și ", " în ", " este ", " care ", " pentru ", " din ", " cu ", " la "))

  val Upper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  val Lower = "abcdefghijklmnopqrstuvwxyz"

  // -------------------------------------------------- JVM kernel -------

  private val scriptLo = Scripts.map(_._2).toArray
  private val scriptHi = Scripts.map(_._3).toArray
  private val scriptMult = Scripts.map(_._4).toArray
  private val scriptLang = Scripts.map(_._1).toArray
  private val latinLang = Latin.map(_._1).toArray
  // per language: gram byte patterns (UTF-8) and codepoint lengths
  private val gramBytes: Array[Array[Array[Byte]]] =
    Latin.map(_._2.map(_.getBytes("UTF-8")).toArray).toArray
  private val gramCpLen: Array[Array[Int]] =
    Latin.map(_._2.map(g => g.codePointCount(0, g.length)).toArray).toArray

  /** Non-overlapping byte-level substring count — UTF-8 is
    * self-synchronizing, so byte search of a whole-codepoint pattern
    * cannot match misaligned; equals the codepoint-level replace count. */
  private def countNonOverlap(t: Array[Byte], g: Array[Byte]): Long = {
    var cnt = 0L
    var i = 0
    val last = t.length - g.length
    while (i <= last) {
      var j = 0
      while (j < g.length && t(i + j) == g(j)) j += 1
      if (j == g.length) { cnt += 1; i += g.length } else i += 1
    }
    cnt
  }

  /** Classify one UTF-8 text. Total work: one codepoint-decode pass plus
    * one byte scan per profile gram, one allocation (the padded copy). */
  def classify(bytes: Array[Byte]): String = {
    // pass 1: codepoint total + script counts
    val sc = new Array[Long](scriptLo.length)
    var total = 0L
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xFF
      var len = 1
      var cp = b0
      if (b0 >= 0xF0) { len = 4; cp = b0 & 0x07 }
      else if (b0 >= 0xE0) { len = 3; cp = b0 & 0x0F }
      else if (b0 >= 0xC0) { len = 2; cp = b0 & 0x1F }
      var k = 1
      while (k < len && i + k < bytes.length) {
        cp = (cp << 6) | (bytes(i + k) & 0x3F)
        k += 1
      }
      total += 1
      var si = 0
      while (si < scriptLo.length) {
        if (cp >= scriptLo(si) && cp <= scriptHi(si)) sc(si) += 1
        si += 1
      }
      i += len
    }
    if (total == 0L) return latinLang(0)
    var si = 0
    while (si < sc.length) {
      if (sc(si) > 0 && sc(si) * scriptMult(si) >= total) return scriptLang(si)
      si += 1
    }
    // pass 2: space-padded ASCII-lowercased copy, then per-gram scans
    val t = new Array[Byte](bytes.length + 2)
    t(0) = ' '
    t(t.length - 1) = ' '
    i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      t(i + 1) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      i += 1
    }
    var bestScore = -1L
    var bestIdx = 0
    var li = 0
    while (li < gramBytes.length) {
      var s = 0L
      var gi = 0
      while (gi < gramBytes(li).length) {
        s += countNonOverlap(t, gramBytes(li)(gi)) * gramCpLen(li)(gi)
        gi += 1
      }
      if (s > bestScore) { bestScore = s; bestIdx = li } // first-wins ties
      li += 1
    }
    latinLang(bestIdx)
  }

  // ---------------------------------------------- oracle SQL side ------

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB column fragments computing the SAME classification, for
    * splicing into a SELECT list (DuckDB lateral column aliases let the
    * later fragments reference the earlier ones). `textExpr` is the SQL
    * expression for the raw text column; the final fragment is aliased
    * `predicted_lang`, helpers are `lid_`-prefixed. */
  def oracleColumnsSql(textExpr: String): String = {
    val pad = s"(' ' || translate($textExpr, ${sq(Upper)}, ${sq(Lower)}) || ' ')"
    val scripts = Scripts.map { case (lang, lo, hi, _) =>
      f"length(regexp_replace($textExpr, '[^\\x{$lo%x}-\\x{$hi%x}]', '', 'g')) AS lid_sc_$lang"
    }
    // length(t) − length(replace(t, g, '')) = occurrences(g) · len(g):
    // the codepoint-length weighting falls out of the diff itself
    val scores = Latin.map { case (lang, grams) =>
      grams.map { g =>
        s"(length(lid_pad) - length(replace(lid_pad, ${sq(g)}, '')))"
      }.mkString("(", " + ", s") AS lid_s_$lang")
    }
    val scriptCases = Scripts.map { case (lang, _, _, mult) =>
      s"WHEN lid_sc_$lang > 0 AND lid_sc_$lang * $mult >= lid_n THEN ${sq(lang)}"
    }.mkString("\n    ")
    val latinCases = Latin.map { case (lang, _) =>
      s"WHEN lid_s_$lang = lid_m THEN ${sq(lang)}"
    }.mkString("\n      ")
    val m = Latin.map { case (lang, _) => s"lid_s_$lang" }.mkString("greatest(", ", ", ")")
    (Seq(
      s"length($textExpr) AS lid_n",
      s"$pad AS lid_pad") ++ scripts ++ scores ++ Seq(
      s"$m AS lid_m",
      s"""CASE WHEN lid_n = 0 THEN 'en'
    $scriptCases
    ELSE CASE
      $latinCases
    END END AS predicted_lang""")).mkString(",\n  ")
  }
}

/** [[LangProfiles.classify]] as a Catalyst expression (whole-stage
  * codegen via a bound reference, the [[TextExpressions]] discipline). */
case class LangIdText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      LangProfiles.classify(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langId", this, classOf[LangIdText].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($a);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdExpression {
  def langId(c: Column): Column =
    GraftBridge.column(LangIdText(GraftBridge.expr(c)))
}
