package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted multilingual fixtures for the character-profile language ID:
  * one natural sentence per supported language, asserted through the
  * full DataFrame path (codegen expression), plus contract edges. */
class LangIdSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  val planted: Seq[(String, String)] = Seq(
    "en" -> "the quick brown fox is in the garden and it is happy with the sun",
    "es" -> "el perro corre por la calle y los niños juegan en una plaza que está cerca",
    "de" -> "der hund läuft durch die stadt und das kind ist nicht allein",
    "fr" -> "le chat est dans la maison et les enfants jouent pour une fête",
    "it" -> "il gatto è sulla sedia e che bella giornata per una passeggiata con il sole",
    "pt" -> "não vou para casa com os amigos em uma festa do bairro",
    "nl" -> "het kind is niet in een huis van de stad en dat is mooi",
    "sv" -> "och det är som en dag för att vara på stranden med solen",
    "pl" -> "nie wiem że jest to dobre na pewno do domu przez las",
    "tr" -> "bu bir güzel gün ve ben için buraya da geldim olarak",
    "id" -> "yang ini adalah hari yang baik dan kami di sini dengan teman untuk makan",
    "ro" -> "și acest lucru este bun pentru că din casa noastră cu multă lumină la munte",
    "zh" -> "这是一个很好的日子我们在公园里散步看花",
    "ja" -> "これはとても良い日ですね公園を散歩します",
    "ko" -> "오늘은 공원에서 산책하기 좋은 날입니다",
    "ru" -> "сегодня хороший день для прогулки в парке",
    "ar" -> "اليوم يوم جميل للمشي في الحديقة",
    "he" -> "היום יום יפה לטיול בפארק",
    "el" -> "σήμερα είναι μια όμορφη μέρα για περπάτημα",
    "th" -> "วันนี้เป็นวันที่ดีสำหรับการเดินเล่น",
    "hi" -> "आज पार्क में टहलने के लिए अच्छा दिन है")

  test("classifies a planted sentence in every supported language") {
    import spark.implicits._
    val got = planted.toDF("expected", "text")
      .withColumn("predicted", LangIdExpression.langId(col("text")))
      .select("expected", "predicted").collect()
    val wrong = got.filter(r => r.getString(0) != r.getString(1))
    assert(wrong.isEmpty, wrong.map(r => s"${r.getString(0)} -> ${r.getString(1)}").mkString(", "))
  }

  test("covers at least 15 languages including non-Latin scripts") {
    assert(planted.map(_._1).distinct.size >= 15)
    assert(LangProfiles.Scripts.nonEmpty && LangProfiles.Latin.size >= 12)
  }

  test("edge contract: empty -> en (deterministic default), null -> null, case-folded") {
    import spark.implicits._
    val rows = Seq(Some(""), None, Some("THE CAT AND THE DOG IS THAT IT")).toDF("text")
      .select(LangIdExpression.langId(col("text")).as("p")).collect()
    assert(rows(0).getString(0) == "en")
    assert(rows(1).isNullAt(0))
    assert(rows(2).getString(0) == "en") // ASCII uppercase folds before matching
  }

  test("japanese beats chinese when kana present; han-only stays chinese") {
    import spark.implicits._
    val rows = Seq(
      "漢字ばかりですがこれは日本語です", // kanji-heavy but has kana -> ja
      "漢字只有中文没有假名").toDF("text")
      .select(LangIdExpression.langId(col("text")).as("p")).collect()
    assert(rows(0).getString(0) == "ja")
    assert(rows(1).getString(0) == "zh")
  }
}
