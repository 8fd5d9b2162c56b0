package graft.text

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Corpus n-gram language-model scoring — the CCNet/KenLM-shaped
  * quality signal (Wenzek et al. 2020 score documents by LM
  * perplexity; Gopher and FineWeb keep it as a filter feature), built
  * as an exact, engine-agnostic computation: an add-one-smoothed token
  * BIGRAM model trained on the corpus itself, scoring each document by
  * its total bigram log-probability.
  *
  * Determinism contract: every per-bigram log-prob is ROUNDED TO
  * INTEGER MICRO-NATS before the per-document sum, so the sum is
  * integer arithmetic — order-independent across partitions, AQE
  * re-plans, and engines (a raw double sum is reduction-order
  * sensitive; BASELINE.md's decimal→double lesson). The only float
  * step is one `ln` on an exactly-reproducible rational — ≤ 1 ulp
  * between libm implementations, invisible at micro-nat granularity.
  *
  * Scale shape (10^12 docs): the count tables are corpus-sized — they
  * are never broadcast and never collected. Training is two map-side
  * combined aggregates (tokens shuffle once, bigrams shuffle once);
  * scoring is two shuffle joins keyed on the bigram / first token
  * (the corpus side arrives exploded, the count side is N:1 — AQE
  * skew-join absorbs the stopword-bigram hot keys) plus one map-side
  * broadcast of the single-row vocab size. The per-doc reduce is a
  * plain combinable sum.
  */
object NgramLm {

  /** Trained model: corpus bigram counts, unigram counts, and the
    * 1-row vocabulary size (kept as a DataFrame so scoring stays fully
    * lazy — no driver action at train time).
    */
  case class LmModel(bigrams: DataFrame, unigrams: DataFrame, vocab: DataFrame)

  /** (id, ts) tokenized view: lowercased whitespace tokens,
    * materialized (SCALE.md invariant 7) — blank/null docs drop here
    * and rejoin as zero-bigram rows at score time.
    */
  private[text] def tokenized(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol), TextStats.tokens(lower(col(textCol))).as("ts"))

  /** Per-occurrence bigram stream with the first token carried along
    * (so scoring never re-splits the bigram string).
    */
  private[text] def bigramOccurrences(t: DataFrame, idCol: String): DataFrame = {
    // compiled bigram builder (r6): the transform/struct/concat_ws HOF
    // chain was interpreted per element — identical (w1, "w1 w2") rows
    val bgUdf = udf((ts: Seq[String]) =>
      Array.tabulate(ts.length - 1)(i => (ts(i), ts(i) + " " + ts(i + 1))))
    t.filter(size(col("ts")) >= 2)
      .select(col(idCol), explode(bgUdf(col("ts"))).as("g"))
      .select(col(idCol), col("g._1").as("w1"), col("g._2").as("bigram"))
  }

  /** Train the bigram model over `docs`. */
  def train(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): LmModel = {
    val t = tokenized(docs, idCol, textCol)
    trainFrom(t, bigramOccurrences(t, idCol))
  }

  /** LM counts from an already-tokenized frame and its occurrence
    * stream — the shared-scan path: a caller holding materialized
    * `tokenized`/`bigramOccurrences` frames (DSIR derives both
    * likelihoods AND the scoring stream from one tokenize pass)
    * aggregates them instead of re-exploding the corpus.
    */
  private[text] def trainFrom(t: DataFrame, occ: DataFrame): LmModel = {
    val uni = t.select(explode(col("ts")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_uni"))
    val big = occ.groupBy("bigram").agg(count(lit(1)).as("c_big"))
    val v = uni.agg(count(lit(1)).as("v"))
    LmModel(big, uni, v)
  }

  /** Score `docs` under `model`: one row per input document with
    *   - n_bigrams       — bigram occurrences scored
    *   - sum_logp_micro  — Σ round(ln((c_big+1)/(c_uni+V)) · 10^6),
    *                       exact integer (more negative = more
    *                       surprising under the corpus LM)
    *   - avg_logp        — sum / (n · 10^6), rounded to 6 decimals
    *                       (0.0 for zero-bigram docs)
    * Unseen bigrams/tokens (scoring a different corpus than the one
    * trained on) fall back to counts of 0 — the add-one floor.
    */
  def score(docs: DataFrame, model: LmModel, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    scoreFrom(docs, bigramOccurrences(tokenized(docs, idCol, textCol), idCol),
      model, idCol)

  private def scoreFrom(docs: DataFrame, occ: DataFrame, model: LmModel,
      idCol: String): DataFrame = {
    val p = (coalesce(col("c_big"), lit(0L)) + lit(1.0)) /
      (coalesce(col("c_uni"), lit(0L)) + col("v"))
    val scored = occ
      .join(model.bigrams, Seq("bigram"), "left")
      .join(model.unigrams.withColumnRenamed("w", "w1"), Seq("w1"), "left")
      .crossJoin(broadcast(model.vocab))
      .select(col(idCol), round(log(p) * lit(1000000.0)).cast("long").as("lp"))
    val per = scored.groupBy(idCol)
      .agg(count(lit(1)).as("n"), sum(col("lp")).as("sm"))
    docs.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n"), lit(0L)).as("n_bigrams"),
        coalesce(col("sm"), lit(0L)).as("sum_logp_micro"),
        round(coalesce(col("sm").cast("double") / (col("n") * lit(1000000.0)),
          lit(0.0)), 6).as("avg_logp"))
  }

  /** Train-and-score over the same corpus in one call (the q_lm_score
    * driver shape).
    */
  def scoreSelf(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // ONE tokenize + bigram-explode pass serves the unigram counts,
    // the bigram counts AND the scoring stream (r6 — the DSIR shared-
    // scan shape; score(docs, train(docs)) re-ran the explode per
    // consumer over the one-split scan)
    val t = tokenized(docs, idCol, textCol).localCheckpoint(false)
    val occ = bigramOccurrences(t, idCol).localCheckpoint(false)
    scoreFrom(docs, occ, trainFrom(t, occ), idCol)
  }

  /** CCNet head/middle/tail quality buckets (Wenzek et al. 2020 §4.3:
    * CCNet cuts each language's corpus at the perplexity terciles;
    * "head" trains LMs, "tail" is usually dropped): rank documents by
    * average bigram log-prob under the corpus's own LM and bucket at
    * the tercile thresholds of a deterministic hash-sample.
    *
    *   - avg_micro = floor(sum_logp_micro / n_bigrams) — a LONG.
    *     floor-of-double-division is deterministic here: the operands
    *     are exact in double and the true quotient is never within
    *     2^-40 of an integer unless it IS one, so every IEEE engine
    *     floors identically (zero-bigram docs score 0 and land in
    *     head — deterministic, and CCNet has no defined slot for
    *     unscorable docs either).
    *   - thresholds t1/t2 = the ceil(n/3)- and ceil(2n/3)-th smallest
    *     sample values; tail: avg ≤ t1, middle: t1 < avg ≤ t2,
    *     head: avg > t2.
    *
    * Scale shape: scoring is [[scoreSelf]]'s plan, materialized ONCE
    * (localCheckpoint) so the threshold pass and the bucket assignment
    * share it. The threshold sample is the md5-u32 coin (the
    * [[graft.corpus.Splits]] arithmetic — reproducible in SQL), capped
    * at `sampleCap` rows COLLECTED ordered (TakeOrdered ships only the
    * cap); a 10^12-doc corpus picks `sampleFrac` so the sample stays
    * ~10^5-10^6 — CCNet itself thresholds on a sample. The final
    * bucket column is a map-side compare against two literals.
    */
  def ccnetBuckets(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sampleFrac: Double = 0.5,
      salt: String = "ccnet", sampleCap: Int = 1 << 20): DataFrame = {
    require(sampleFrac > 0.0 && sampleFrac <= 1.0, s"sampleFrac in (0,1]: $sampleFrac")
    require(sampleCap >= 3, s"sampleCap >= 3: $sampleCap")
    val scored = scoreSelf(docs, idCol, textCol)
      .select(col(idCol), col("n_bigrams"), col("sum_logp_micro"),
        floor(col("sum_logp_micro").cast("double") /
          greatest(col("n_bigrams"), lit(1L)).cast("double")).as("avg_micro"))
      // lazy (r6): the threshold collect right below materializes it —
      // an eager checkpoint was a redundant extra blocking job
      .localCheckpoint(false)
    val thr = math.min((sampleFrac * 4294967296.0).toLong, 4294967296L)
    val vs = scored
      .filter(graft.corpus.Splits.bucket(col(idCol).cast("string"), salt) < thr)
      .select(col("avg_micro")).orderBy(col("avg_micro"))
      .limit(sampleCap + 1).collect().map(_.getLong(0))
    require(vs.length >= 3, s"threshold sample too small: ${vs.length} rows")
    require(vs.length <= sampleCap,
      s"threshold sample exceeds sampleCap=$sampleCap — lower sampleFrac")
    val t1 = vs(math.ceil(vs.length / 3.0).toInt - 1)
    val t2 = vs(math.ceil(2.0 * vs.length / 3.0).toInt - 1)
    scored.select(col(idCol), col("n_bigrams"), col("avg_micro"),
      when(col("avg_micro") <= t1, lit("tail"))
        .when(col("avg_micro") <= t2, lit("middle"))
        .otherwise(lit("head")).as("ccnet_bucket"))
  }
}
