package graft.functions

import graft.SparkSpec
import graft.sources.Catalog
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Differential parity for the r16 native text-stats kernels
 * ([[TextStatsImpl]]): every kernel is compared BYTE-IDENTICAL against
 * the exact Catalyst higher-order-function / regex formulation it
 * replaced, over (a) the sf0.001 documents corpus and (b) an adversarial
 * unicode fixture chosen to attack the hand-rolled char classing —
 * case-folding edge cases (Turkish İ, the Kelvin sign), combining marks
 * (letter-run SPLITTERS under \p{L}), supplementary-plane letters and
 * emoji (code-point stepping), Unicode number categories (Nd/Nl/No),
 * fullwidth letters, every `\s` char, NULs, and empty/null inputs.
 */
class TextKernelsParitySuite extends SparkSpec {
  import spark.implicits._

  private val adversarial: Seq[String] = Seq(
    "",
    " ",
    "\t\n\r ",
    "a",
    "the THE tHe ThE",
    "la la la le les der die das el los las es is of to and",
    "İstanbul ısı İstanbul",          // dotted I lowercases to i + U+0307
    "K elvin Kel",               // Kelvin sign lowercases to 'k'
    "naïve café résumé",
    "étude ré",                // combining acute splits \p{L} runs
    "ﬁnance ﬂow",                 // ﬁ/ﬂ ligatures
    "ｆｕｌｌｗｉｄｔｈ ｔｅｘｔ",
    "½ ² ③ Ⅷ ⅻ 𝟏𝟐",                      // No / Nd / Nl / supplementary Nd
    "😀😀 a😀b",
    "𝔘𝔫𝔦", // 𝔘𝔫𝔦 supplementary letters
    "العربية النص",
    "中文文本 日本語 한국어",
    "a1b2 3c4d 12345 00",
    "x\u0000y z\u0000",                     // NUL bytes inside tokens
    "word",
    "  leading and trailing  ",
    "der\tdie\ndasist\fund\rder",
    "ist und das der die die und ist",
    "mixed: el the und le (es) [is] {la}!",
    "ßharp ẞ upper sharp s",      // ß / ẞ case pair
    "ʰmodifier ˀletters",                   // Lm letters
    "ᛚᚢᚾᛁᚲ runes",                          // Lo letters
    "a".repeat(5000),
    ("lorem ipsum dolor sit amet " * 200).trim)

  private def corpus: DataFrame =
    Catalog.load(spark, sf0001, "documents").select(col("text"))
      .unionByName(adversarial.toDF("text"))
      .unionByName(Seq.empty[String].toDF("text"))

  /** assert two single-column frames are byte-identical row-for-row
    * (order-preserving zip via a synthetic id). */
  private def assertSame(tag: String, oldC: Column, newC: Column): Unit = {
    val df = corpus.withColumn("__old", oldC).withColumn("__new", newC)
    val bad = df.filter(!(col("__old") <=> col("__new"))).limit(5).collect()
    assert(bad.isEmpty,
      s"$tag diverged on ${bad.length} row(s), e.g. ${bad.headOption}")
  }

  private val t = col("text")

  test("wsTokenCount == size(filter(split(text, \\s+)))") {
    assertSame("wsTokenCount",
      size(filter(split(t, "\\s+"), x => x =!= lit(""))),
      TextStatsFunctions.wsTokenCount(t))
  }

  test("wsTokens == filter(split(text, \\s+))") {
    assertSame("wsTokens",
      filter(split(t, "\\s+"), x => x =!= lit("")),
      TextStatsFunctions.wsTokens(t))
  }

  test("alnumTokens == filter(split(lower(text), [^a-z0-9]+))") {
    assertSame("alnumTokens",
      filter(split(lower(t), "[^a-z0-9]+"), x => x =!= lit("")),
      TextStatsFunctions.alnumTokens(t))
  }

  test("bpeishTokenCount == size(regexp_extract_all(...))") {
    assertSame("bpeishTokenCount",
      size(regexp_extract_all(t,
        lit("[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]"), lit(0))),
      TextStatsFunctions.bpeishTokenCount(t))
  }

  test("langId == the aggregate-HOF language id") {
    // verbatim copy of the pre-r16 languageId formulation
    val ordered = Seq("en", "fr", "de", "es")
    val markers = graft.operators.TextAnalysis.langMarkers
    val toks = filter(split(lower(t), "[^\\p{L}]+"), x => x =!= lit(""))
    val zero = struct(ordered.map(l => lit(0).as(l)): _*)
    val merge = (acc: Column, tok: Column) => struct(ordered.map { l =>
      (acc(l) + when(tok.isin(markers(l).map(lit): _*), 1).otherwise(0)).as(l)
    }: _*)
    val oldLang = aggregate(toks, zero, merge, acc => {
      val best = ordered.map(acc(_)).reduce(greatest(_, _))
      ordered.foldRight(lit("und"): Column) { case (l, el) =>
        when(acc(l) === best && best > 0, lit(l)).otherwise(el)
      }
    })
    assertSame("langId", oldLang, TextStatsFunctions.langId(t))
  }

  test("qualityStats == the aggregate-HOF (n, len, stop) accumulator") {
    val enStop = graft.operators.TextAnalysis.enStop
    val toks = filter(split(lower(t), "[^a-z0-9]+"), x => x =!= lit(""))
    val acc0 = struct(lit(0).as("n"), lit(0L).as("len"), lit(0).as("stop"))
    val oldStats = aggregate(toks, acc0, (a, x) => struct(
      (a("n") + 1).as("n"),
      (a("len") + length(x)).as("len"),
      (a("stop") + when(x.isin(enStop.map(lit): _*), 1).otherwise(0)).as("stop")))
    assertSame("qualityStats", oldStats, TextStatsFunctions.qualityStats(t))
  }

  test("repetitionCounts == the zip_with gram chain's (total, distinct)") {
    val toks = filter(split(lower(t), "[^a-z0-9]+"), x => x =!= lit(""))
    val n = size(col("__rtoks"))
    val len2 = greatest(n - 1, lit(0))
    val len3 = greatest(n - 2, lit(0))
    val grams2 = zip_with(slice(col("__rtoks"), lit(1), len2),
      slice(col("__rtoks"), lit(2), len2), (a, b) => concat_ws(" ", a, b))
    val grams3 = zip_with(slice(col("__g2"), lit(1), len3),
      slice(col("__rtoks"), lit(3), len3), (ab, c) => concat_ws(" ", ab, c))
    val df = corpus.withColumn("__rtoks", toks)
      .withColumn("__g2", grams2)
      .withColumn("__g3", grams3)
      .withColumn("__old", struct(
        n.as("n1"), size(array_distinct(col("__rtoks"))).as("d1"),
        size(col("__g2")).as("n2"), size(array_distinct(col("__g2"))).as("d2"),
        size(col("__g3")).as("n3"), size(array_distinct(col("__g3"))).as("d3")))
      .withColumn("__new", TextStatsFunctions.repetitionCounts(t))
    val bad = df.filter(!(col("__old") <=> col("__new"))).limit(5).collect()
    assert(bad.isEmpty, s"repetitionCounts diverged, e.g. ${bad.headOption}")
  }

  test("spanHashes == conv(substring(md5(array_join(slice(...))),1,15),16,10)") {
    val L = 5
    val toks = filter(split(t, "\\s+"), x => x =!= lit(""))
    val base = corpus.withColumn("__toks", toks)
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") >= L)
    val oldOcc = base
      .select(col("text"), explode(sequence(lit(0), col("__n") - L)).as("p"),
        col("__toks"))
      .select(col("text"), col("p"),
        conv(substring(md5(array_join(
          slice(col("__toks"), col("p") + 1, lit(L)), " ")), 1, 15),
          16, 10).cast("long").as("k"))
    val newOcc = base
      .select(col("text"),
        explode(TextStatsFunctions.spanHashes(col("__toks"), L)).as("__s"))
      .select(col("text"), col("__s.p").as("p"), col("__s.k").as("k"))
    assert(oldOcc.exceptAll(newOcc).isEmpty && newOcc.exceptAll(oldOcc).isEmpty,
      "spanHashes diverged from the composable md5 chain")
  }

  test("null text → null through every kernel") {
    val df = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
    val row = df.select(
      TextStatsFunctions.wsTokenCount(t), TextStatsFunctions.wsTokens(t),
      TextStatsFunctions.alnumTokens(t), TextStatsFunctions.bpeishTokenCount(t),
      TextStatsFunctions.langId(t), TextStatsFunctions.qualityStats(t),
      TextStatsFunctions.repetitionCounts(t)).head()
    (0 until row.length).foreach(i => assert(row.isNullAt(i), s"field $i not null"))
  }
}
