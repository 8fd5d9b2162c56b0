package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token
  * counting, quality scoring, n-gram-heuristic language ID, and
  * document fingerprinting. All pure Column expressions (codegen'd,
  * UDF-free) so they fold into the same scan as the dedup digests.
  */
object TextStats {

  /** Whitespace token count; empty/blank → 0. */
  def tokenCount(text: Column): Column =
    when(text.isNull || trim(text) === "", lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Quality-scoring features + a composite score in [0,1]:
    * length signal, mean word length sanity, alphabetic ratio,
    * punctuation ratio. Deterministic arithmetic only.
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val t = coalesce(trim(text), lit(""))
    val chars = length(t).cast("double")
    val toks = tokenCount(text).cast("double")
    val alpha = length(regexp_replace(t, "[^a-zA-Z]", "")).cast("double")
    val punct = length(regexp_replace(t, "[^.,;:!?]", "")).cast("double")
    val meanWord = when(toks > 0, (chars - (toks - 1)) / toks).otherwise(lit(0.0))
    val alphaRatio = when(chars > 0, alpha / chars).otherwise(lit(0.0))
    val punctRatio = when(chars > 0, punct / chars).otherwise(lit(0.0))
    val lenScore = least(toks / lit(100.0), lit(1.0))
    val wordScore = when(meanWord >= 2.5 && meanWord <= 12.0, lit(1.0)).otherwise(lit(0.0))
    val score = round(
      lenScore * lit(0.4) + wordScore * lit(0.2) + alphaRatio * lit(0.3) +
        (lit(1.0) - least(punctRatio * lit(5.0), lit(1.0))) * lit(0.1), 6)
    Seq(
      "n_tokens" -> toks.cast("long"),
      "mean_word_len" -> round(meanWord, 6),
      "alpha_ratio" -> round(alphaRatio, 6),
      "punct_ratio" -> round(punctRatio, 6),
      "quality_score" -> score)
  }

  /** Stopword tables for the n-gram-heuristic language ID. Small,
    * high-frequency, language-distinctive words.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "with"),
    "de" -> Seq("der", "und", "die", "das", "ist", "nicht", "mit"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans"),
    "es" -> Seq("el", "los", "las", "una", "es", "por", "para"),
    // ASCII-only terms: the DuckDB oracle's RE2 \b is ASCII-aware while
    // Java's is Unicode-aware — accented stopwords would disagree
    "pt" -> Seq("os", "uma", "com", "mais", "como", "seu", "sua"))

  /** Per-language stopword hit count: word-boundary regex matches. */
  def stopwordHits(text: Column, words: Seq[String]): Column = {
    val t = lower(coalesce(text, lit("")))
    val pattern = words.mkString("\\b(", "|", ")\\b")
    size(split(t, pattern)) - 1 // matches = splits - 1; 0 when no match
  }

  /** Heuristic language ID: argmax of stopword hits, 'und'
    * (undetermined) when nothing matches. Deterministic tie-break by
    * table order.
    */
  def langId(text: Column): Column = {
    val hits = stopwords.map { case (l, ws) => l -> stopwordHits(text, ws) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    // when-chain in table order: first language winning the argmax ties
    hits.foldLeft(Option.empty[Column]) { case (acc, (l, h)) =>
      Some(acc match {
        case None    => when(h === best && best > 0, lit(l))
        case Some(c) => c.when(h === best && best > 0, lit(l))
      })
    }.get.otherwise(lit("und"))
  }

  /** Document fingerprint: md5 of the normalized text (lowercased,
    * whitespace-collapsed, trimmed) — the SQL-oracle-comparable form.
    */
  def fingerprintMd5(text: Column): Column =
    md5(trim(regexp_replace(lower(coalesce(text, lit(""))), "\\s+", " ")).cast("binary"))

  /** Rolling polynomial (Rabin-Karp) fingerprint of normalized text —
    * the incremental-hash form a streaming/chunking pipeline composes;
    * deterministic base, mod 2^64 by natural overflow.
    */
  private val rollingUdf = udf { (s: String) =>
    var h = 1469598103934665603L
    if (s != null) {
      var i = 0
      while (i < s.length) { h = h * 131L + s.charAt(i); i += 1 }
    }
    h
  }

  def fingerprintRolling(text: Column): Column =
    rollingUdf(trim(regexp_replace(lower(coalesce(text, lit(""))), "\\s+", " ")))
}
