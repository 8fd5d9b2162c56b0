package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE merge-candidate counting — the tokenizer-training prep step
  * beside the q_vocab top-k (Sennrich et al. 2016 §3: each BPE
  * iteration merges the most frequent adjacent symbol pair). This is
  * the first iteration's pair-count table over single-character
  * symbols, computed the way every real BPE trainer does at scale:
  * over the WORD-COUNT TABLE, not the corpus — a 10^12-doc corpus
  * collapses to a vocabulary of distinct words first (one map-side
  * combined shuffle, the q_vocab aggregate), and the character-pair
  * explode then runs over |vocab| rows weighted by frequency instead
  * of over every corpus token occurrence. Overlapping occurrences
  * count ("aaa" → "aa"×2), matching pair-count semantics before any
  * merge is applied.
  */
object BpeMerges {

  /** Distinct lowercased words with corpus occurrence counts. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(explode(TextStats.tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** Adjacent-character pair counts weighted by word frequency. */
  def pairCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    wordCounts(docs, textCol)
      .filter(length(col("w")) >= 2)
      .select(col("n"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum(col("n")).as("n"))

  /** The top-k merge candidates, (count desc, pair asc) — a total
    * order, so the cut is deterministic on ties. TakeOrderedAndProject
    * at any corpus size, never a global sort.
    */
  def topMerges(docs: DataFrame, k: Int = 50, textCol: String = "text"): DataFrame =
    pairCounts(docs, textCol).orderBy(desc("n"), asc("pair")).limit(k)
}
