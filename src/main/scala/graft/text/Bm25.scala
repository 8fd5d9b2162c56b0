package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 relevance scoring (Robertson-Sparck Jones / Okapi BM25,
  * TREC-3 1994) of a corpus against a small query-term set — the
  * retrieval half of a webtext pipeline (targeted corpus carving,
  * "find training docs about X", nearest-queries quality probes;
  * reference analog: none — [EXT], the lexical sibling of the
  * `sim` embedding stack).
  *
  * Determinism contract (the [[NgramLm]] micro-nat discipline): the
  * ONLY float step is `idf_micro = round(ln(1 + (N-df+0.5)/(df+0.5))
  * * 10^6)` — rounded to an exact LONG at micro-nat granularity, so
  * libm ulp differences between engines are invisible. Everything
  * after is integer arithmetic with floor division:
  *
  *   avg_milli  = (T * 1000) div N          (exact corpus constant:
  *                                           T = total tokens, N = docs)
  *   t_norm     = (22*tf*avg_milli*100000) div
  *                (10*tf*avg_milli + 3*avg_milli + 9000*dl)
  *   score_term = (idf_micro * t_norm) div 10^6
  *
  * which is BM25 with k1 = 1.2, b = 0.75 as exact rationals
  * (multiply numerator and denominator of tf*(k1+1) / (tf + k1*(1-b)
  * + k1*b*dl/avgdl) by 10 * avg_milli): t_norm is the tf-saturation
  * component scaled by 10^6, bounded by 2.2*10^6 (its k1+1 asymptote),
  * so the worst-case product `idf_micro * t_norm` is ~10^14 — no
  * overflow headroom games even at 10^12 docs (ln N <= 28). Long sums
  * are associative: scores are bit-identical across partitionings,
  * AQE re-plans and engines, and the DuckDB oracle replays the
  * identical chain with `//`.
  *
  * Scale shape: tokenize + explode is map-only; the `isin(query)`
  * filter runs BEFORE the shuffle, so only matching (doc, term) rows
  * — at most |Q| per doc — reach the one (doc_id, term) count
  * shuffle. df is a |Q|-row aggregate of that table, joined back as a
  * broadcast. Corpus constants (N, T) ride a broadcast crossJoin of a
  * 1-row aggregate — no driver collect. Docs containing none of the
  * query terms never leave the map side.
  */
object Bm25 {

  /** (id, n_terms, score_micro) for every doc matching >=1 query
    * term: `n_terms` = distinct query terms present, `score_micro` =
    * BM25 score in exact integer micro-units (k1 = 1.2, b = 0.75).
    * Terms are lowercased whitespace tokens; null/blank docs are
    * excluded from the corpus statistics. `query` must be small
    * (it is broadcast into a literal filter) and lowercase.
    */
  def scores(docs: DataFrame, query: Seq[String], idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(query.nonEmpty && query.size <= 64, "query must be 1..64 terms")
    // lazy checkpoint (r6): the tokenized frame feeds the corpus-
    // stats aggregate, the document-frequency broadcast build AND the
    // main tf join — three executions of the tokenize pass otherwise
    val toks = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol), split(trim(lower(col(textCol))), "\\s+").as("toks"))
      .select(col(idCol), col("toks"), size(col("toks")).cast("long").as("dl"))
      .localCheckpoint(false)
    // corpus constants as a broadcast 1-row frame (no driver collect):
    // avg_milli = floor(1000 * T / N) — an exact integer DEFINED as
    // the operator's average-length constant (both engines replay it)
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_toks"))
      .select(col("n_docs"),
        expr("(total_toks * 1000L) DIV n_docs").as("avg_milli"))
    val tf = toks
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(query: _*)) // map-side, pre-shuffle
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        // the single rounded float step: micro-nat IDF
        round(log(lit(1.0) +
          (col("n_docs").cast("double") - col("df") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) * lit(1000000.0))
          .cast("long").as("idf_micro"),
        expr("(22L * tf * avg_milli * 100000L) DIV " +
          "(10L * tf * avg_milli + 3L * avg_milli + 9000L * dl)").as("t_norm"))
      .select(col(idCol),
        expr("(idf_micro * t_norm) DIV 1000000L").as("s"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("s")).as("score_micro"))
  }
}
