package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the cat sat on the mat and it is that simple for sure"),
    (1L, "le chat est sur le tapis et la table pour une heure"),
    (2L, "der hund und die katze das ist ein gutes zu haus"),
    (3L, "这是一个中文文档的例子没有空格"),
    (4L, "xqz kpw vvv 123 999 ---")
  ).toDF("doc_id", "text")

  test("langId picks the stopword-dominant language; CJK gate catches zh") {
    val got = TextAnalysis.langId(docs).select("doc_id", "lang_pred")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "en")
    assert(got(1L) == "fr")
    assert(got(2L) == "de")
    assert(got(3L) == "zh")
    assert(got(4L) == "und")
  }

  test("token counts: exact whitespace and BPE-ish estimate") {
    val got = docs.select($"doc_id",
      TextAnalysis.tokenCount($"text").as("n"),
      TextAnalysis.tokenCountBpe($"text"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got(0L)._1 == 13)
    assert(got(4L)._1 == 6)
    // BPE-ish ≥ word count for wordy text (punct + long words add pieces)
    assert(got(0L)._2 >= 12)
  }

  test("quality score separates clean prose from garbage") {
    val got = TextAnalysis.qualityScore(docs).select("doc_id", "quality_score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(0L) > 0.6, s"clean text scored ${got(0L)}")
    assert(got(4L) < got(0L), "garbage must score below clean prose")
    assert(got.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("fingerprints: whitespace/case normalization collapses variants") {
    val variants = Seq(
      (0L, "Hello   World"),
      (1L, "hello world"),
      (2L, "  hello    WORLD  "),
      (3L, "different entirely")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(variants)
      .select("doc_id", "fp_md5", "fp_rolling")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(fp(0L) == fp(1L))
    assert(fp(1L) == fp(2L))
    assert(fp(3L) != fp(1L))
  }

  test("lineDedup removes corpus-frequent segments and rebuilds text in order") {
    val corpus = Seq(
      (0L, "aa bb cc dd ee ff"),
      (1L, "aa bb cc xx yy zz"),
      (2L, "aa bb cc pp qq rr"),
      (3L, "unique words only here now six"),
      (4L, "aa bb cc"),
      (5L, "gg hh ii jj kk") // 5 words: short tail segment survives intact
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lineDedup(corpus)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    // "aa bb cc" occurs in 4 distinct docs (>= 3) -> removed everywhere
    assert(got(0L) == ((2, 1, "dd ee ff")))
    assert(got(1L) == ((2, 1, "xx yy zz")))
    assert(got(2L) == ((2, 1, "pp qq rr")))
    assert(got(3L) == ((2, 0, "unique words only here now six")))
    assert(got(4L) == ((1, 1, ""))) // whole doc was boilerplate
    assert(got(5L) == ((2, 0, "gg hh ii jj kk")))
  }

  test("lineDedup handles a ~100k-segment document in linear time") {
    // 300k words = 100k 3-word segments in ONE document — the shape that
    // made the previous O(segs²) rebuild (per-segment array_contains over
    // an unsorted kept list) a straggler. The linear rebuild finishes in
    // seconds; the assertions pin the rebuild's correctness, not just
    // survival: a repeated boilerplate segment is removed everywhere and
    // the remaining unique segments come back in their original order.
    val boiler = "xx yy zz"
    val bigWords = (0 until 100000).flatMap { i =>
      if (i % 100 == 0) Seq(boiler) else Seq(s"a$i b$i c$i")
    }
    val big = bigWords.mkString(" ")
    val corpus = Seq(
      (0L, big),
      (1L, s"$boiler other words here"),
      (2L, s"$boiler more distinct words")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lineDedup(corpus)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(got(0L)._1 == 100000, "segment count")
    assert(got(0L)._2 == 1000, "every boilerplate occurrence removed")
    val clean = got(0L)._3
    assert(!clean.contains(boiler), "no boilerplate survives")
    assert(clean.startsWith("a1 b1 c1 a2 b2 c2"), "order preserved")
    assert(clean.endsWith("a99998 b99998 c99998 a99999 b99999 c99999"))
  }

  test("docStats char classes are exact") {
    val r = TextAnalysis.docStats(Seq((0L, "ab c1! d?")).toDF("doc_id", "text"))
      .select("n_len", "n_tokens", "n_alpha", "n_digits", "n_punct").collect().head
    assert(r.getInt(0) == 9)
    assert(r.getInt(1) == 3)
    assert(r.getInt(2) == 4)  // a b c d
    assert(r.getInt(3) == 1)  // 1
    assert(r.getInt(4) == 2)  // ! ?
  }

  test("gopherRules: every rule fires and passes on targeted fixtures") {
    // a healthy base document: 60 plain words incl. enough of the
    // 8-word Gopher stopword list, mean word length in range
    val good = (Seq("the", "cat", "sat", "and", "that", "dog", "have", "fun",
      "with", "food", "of", "note") ++ (1 to 48).map(i => s"word$i")).mkString(" ")
    val docs = Seq(
      0L -> good,
      1L -> "too few words here",                        // r_word_count low
      2L -> (good + " " + ("w" * 700)),                  // mean word len > 10
      3L -> (good + " " + (1 to 20).map(_ => "#").mkString(" ")), // hash ratio
      4L -> (good + " " + (1 to 20).map(_ => "see...").mkString(" ")), // ellipsis ratio
      5L -> ((1 to 19).map(i => s"- bullet $i line").mkString("\n") + "\nonly one plain"), // 95% bullets
      6L -> ((1 to 2).map(i => s"trailing line $i...").mkString("\n") + "\nplain tail"), // >30% ellipsis ends
      7L -> (good + " " + (1 to 120).map(i => i.toString).mkString(" ")), // <80% alpha words
      8L -> (1 to 60).map(i => s"word$i").mkString(" "), // no stopwords
      9L -> ((1 to 9).map(_ => good).mkString("\n") + "\nunique closing line") // dup lines
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap

    def rule(id: Long, name: String): Boolean =
      out(id).getAs[Boolean](name)

    assert(rule(0L, "gopher_kept"), "the healthy doc passes everything")
    assert(!rule(1L, "r_word_count") && rule(0L, "r_word_count"))
    assert(!rule(2L, "r_mean_word_len") && rule(0L, "r_mean_word_len"))
    assert(!rule(3L, "r_symbol_ratio") && rule(0L, "r_symbol_ratio"))
    assert(!rule(4L, "r_symbol_ratio"))
    assert(!rule(5L, "r_bullet_lines") && rule(0L, "r_bullet_lines"))
    assert(!rule(6L, "r_ellipsis_lines") && rule(0L, "r_ellipsis_lines"))
    assert(!rule(7L, "r_alpha_words") && rule(0L, "r_alpha_words"))
    assert(!rule(8L, "r_stopwords") && rule(0L, "r_stopwords"))
    assert(!rule(9L, "r_dup_lines") && rule(0L, "r_dup_lines"))
    // every failing fixture is rejected overall
    (1L to 9L).foreach(id => assert(!rule(id, "gopher_kept"), s"doc $id"))
  }

  test("contaminationBloom equals the exact contamination screen") {
    // corpus with a heavily-contaminated doc, a clean doc, a
    // partially-overlapping doc, a short (<n tokens, single-shingle)
    // doc that IS a benchmark shingle, and a blank doc (one empty
    // whole-text shingle); benchmark holds two docs
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "totally unrelated words live here now"),
      (2L, "gamma delta epsilon something else entirely new"),
      (3L, "tiny doc"),
      (4L, "   ")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (101L, "tiny doc")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_shingles", "n_contaminated", "contamination_frac")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val exact = rows(TextAnalysis.contamination(corpus, bench))
    val bloom = rows(TextAnalysis.contaminationBloom(corpus, bench))
    assert(bloom == exact)
    // the exact screen itself behaves as expected on this fixture
    val m = exact.map(t => t._1 -> t).toMap
    assert(m(0L) == ((0L, 4L, 3L, 0.75))) // abg, bgd, gde hit; dez misses
    assert(m(1L)._3 == 0L)
    assert(m(2L) == ((2L, 5L, 1L, 0.2))) // only "gamma delta epsilon"
    assert(m(3L) == ((3L, 1L, 1L, 1.0))) // whole-text shingle = bench's
    assert(m(4L)._2 == 1L && m(4L)._3 == 0L) // blank: one empty shingle
  }

  test("contaminationBloom: bloom probe never misses a true hit (one-sided error)") {
    // at a punishing fpp the probe may over-count but must never
    // under-count: per doc, bloom hits >= exact hits on every doc
    val corpus = (0L until 40L).map(i =>
      (i, s"w${i} w${i + 1} w${i + 2} w${i + 3} shared tail tokens here"))
      .toDF("doc_id", "text")
    val bench = Seq((999L, "shared tail tokens here and more")).toDF("doc_id", "text")
    val exact = TextAnalysis.contamination(corpus, bench)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val loose = TextAnalysis.contaminationBloom(corpus, bench, fpp = 0.3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // the RESULT is exact even at fpp=0.3 (verify join corrects it)
    assert(loose == exact)
    // and every contaminated doc was necessarily a bloom candidate:
    // a zero-hit doc skips verify, so exact>0 implies it went through
    exact.filter(_._2 > 0).keys.foreach(id => assert(loose(id) == exact(id)))
  }
  test("contamination refuses an over-cap benchmark set loudly, pointing at the bloom path") {
    val corpus = Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    // cap below the benchmark's distinct 3-shingle count: the guard
    // must throw BEFORE shipping the set as an expression constant
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.contamination(corpus, bench, maxShingles = 3).collect()
    }
    assert(ex.getMessage.contains("contaminationBloom"),
      s"refusal must point at the scale path: ${ex.getMessage}")
    // at or under the cap the screen runs normally
    assert(TextAnalysis.contamination(corpus, bench, maxShingles = 100)
      .count() == 1L)
  }
}
