package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def rules(texts: Seq[(String, String)]): Map[String, Map[String, Any]] = {
    val rs = TextStats.gopherRules(col("t"), col("lt"))
    val names = rs.map(_._1)
    texts.toDF("name", "t")
      .select(col("name"), col("t"), TextStats.tokens(lower(col("t"))).as("lt"))
      .select(col("name") +: rs.map { case (n, c) => c.as(n) }: _*)
      .collect().map { r =>
        r.getString(0) -> names.zipWithIndex.map { case (n, i) => n -> r.get(i + 1) }.toMap
      }.toMap
  }

  test("a normal document passes every rule") {
    val good = ("the cat and dog walked " * 12).trim // 60 words, mwl 3.6
    val m = rules(Seq("good" -> good))("good")
    assert(m("n_words") == 60L)
    assert(m("mean_word_len") == 3.6)
    Seq("r_word_count", "r_mean_word", "r_symbol", "r_bullet", "r_ellipsis",
      "r_alpha", "r_stop", "gopher_pass").foreach(k => assert(m(k) == true, k))
  }

  test("each rule fails on its targeted violation") {
    val m = rules(Seq(
      "short" -> "the cat and dog walked", // 5 words
      "shortwords" -> ("a b " * 30).trim, // mwl 1
      "symbols" -> (("the cat and dog walked " * 11).trim + " # # # # # # #"), // 7/62 > 0.1
      "bullets" -> Seq.fill(10)("- item one two three").mkString("\n"), // 10/10 bullet
      "ellipses" -> "line one...\nline two\nline three...\nline four", // 2/4 > 0.3
      "numeric" -> (("the cat and of " * 10).trim + " " + ("12 34 " * 10).trim), // 20/60 no-alpha
      "nostop" -> ("cat dog walked home " * 15).trim)) // 0 stopwords
    assert(m("short")("r_word_count") == false)
    assert(m("short")("r_mean_word") == true)
    assert(m("shortwords")("r_mean_word") == false)
    assert(m("symbols")("r_symbol") == false)
    assert(m("symbols")("r_word_count") == true)
    assert(m("bullets")("r_bullet") == false)
    assert(m("ellipses")("r_ellipsis") == false)
    assert(m("numeric")("r_alpha") == false)
    assert(m("numeric")("r_stop") == true) // the + of + and present
    assert(m("nostop")("r_stop") == false)
    m.values.foreach(v => assert(v("gopher_pass") == false))
  }

  test("ellipses count toward the symbol ratio and line rules use real line counts") {
    val m = rules(Seq("e" -> ("the cat... and of dog " * 10).trim))("e")
    // 10 ellipses / 60 words > 0.1
    assert(m("r_symbol") == false)
    // single line, no line ends in ... (the ... is mid-line)
    assert(m("r_ellipsis") == true)
  }

  test("null and empty docs fail the word rules without dividing by zero") {
    val m = rules(Seq("null" -> null.asInstanceOf[String], "empty" -> ""))
    Seq("null", "empty").foreach { k =>
      assert(m(k)("n_words") == 0L)
      assert(m(k)("r_word_count") == false)
      assert(m(k)("r_symbol") == false)
      assert(m(k)("r_alpha") == false)
      assert(m(k)("gopher_pass") == false)
    }
  }
}

class C4CleanSpec extends SparkSpec {
  import spark.implicits._

  private def clean(texts: Seq[(Long, String)], minWords: Int = 5, minLines: Int = 3)
      : Map[Long, (Option[String], Long, Boolean)] =
    C4Clean.cleanPages(texts.toDF("id", "text"), minWords = minWords, minLines = minLines)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getLong(2), r.getBoolean(3)))).toMap

  test("line rules: terminal punctuation, word minimum, javascript drop; order preserved") {
    val page = Seq(
      "This is a good first sentence.",
      "no terminal punctuation on this line",
      "Too short.",
      "This line uses Javascript so it is dropped.",
      "Does a question mark count here?",
      "A final exclamation ends this page!").mkString("\n")
    val (ct, n, kept) = clean(Seq(1L -> page))(1L)
    assert(kept && n == 3L)
    assert(ct.get == Seq(
      "This is a good first sentence.",
      "Does a question mark count here?",
      "A final exclamation ends this page!").mkString("\n"))
  }

  test("page rules: minLines, lorem ipsum, curly bracket each drop the whole page") {
    val twoGood = "One good line sits here.\nAnother good line sits here."
    val threeGood = twoGood + "\nThird good line sits here."
    val m = clean(Seq(
      1L -> twoGood, // only 2 kept lines
      2L -> (threeGood + "\nsome Lorem Ipsum filler"),
      3L -> (threeGood + "\nvar x = { y }"),
      4L -> threeGood))
    assert(m(1L) == ((None, 2L, false)))
    assert(m(2L)._3 == false && m(2L)._2 == 3L)
    assert(m(3L)._3 == false)
    assert(m(4L) == ((Some(threeGood), 3L, true)))
  }

  test("null text is an empty dropped page; thresholds are parameters") {
    val m = clean(Seq(1L -> null.asInstanceOf[String], 2L -> "Tiny page stays now."),
      minWords = 4, minLines = 1)
    assert(m(1L) == ((None, 0L, false)))
    assert(m(2L) == ((Some("Tiny page stays now."), 1L, true)))
  }

  test("word blocklist: whole-token case-insensitive gate, phrases, null survival") {
    val docs = Seq(
      1L -> "The word BADTOK appears here.",
      2L -> "badtoken is a different token and survives.",
      3L -> "a multi word phrase mid sentence.",
      4L -> "multi word split across | boundary phrase",
      5L -> null.asInstanceOf[String],
      6L -> "clean page.").toDF("id", "text")
    val kept = C4Clean.dropBadWordPages(docs, Seq("badtok", "word phrase"), "text")
      .collect().map(_.getLong(0)).toSet
    // 1 blocked (case-insensitive whole token), 2 survives (substring
    // is not a token), 3 blocked (phrase), 4 survives (tokens not
    // adjacent), null text survives (nothing matchable)
    assert(kept == Set(2L, 4L, 5L, 6L))
    intercept[IllegalArgumentException] {
      C4Clean.hasBlockedWord(col("text"), Seq("Bad*Regex"))
    }
    intercept[IllegalArgumentException] {
      C4Clean.hasBlockedWord(col("text"), Nil)
    }
  }
}
