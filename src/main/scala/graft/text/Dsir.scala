package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): select raw-corpus documents whose n-gram feature
  * distribution looks like a TARGET domain by weighting each doc with
  * the likelihood ratio p_target(x) / p_raw(x) and resampling by that
  * weight. The paper's feature LMs are hashed-n-gram bag models; this
  * engine uses its existing exact add-one bigram LM ([[NgramLm]]) for
  * both sides, so the log-importance is the DIFFERENCE OF TWO
  * INTEGER MICRO-NAT SUMS — exact, order-independent, oracle-ready.
  *
  * Scale shape (10^12 docs): ONE tokenize + bigram-explode pass over
  * the raw corpus serves BOTH likelihoods (scoring twice via
  * [[NgramLm.score]] would re-explode the corpus — the dominant
  * map-side cost); the four count tables join the occurrence stream
  * as N:1 shuffle joins (AQE absorbs stopword-bigram heat), the two
  * 1-row vocab frames broadcast. Selection reuses
  * [[graft.corpus.BudgetSelect]] with a unit token mass — the exact
  * two-phase top-k (score-class bucketing + bounded prefix sums), so
  * the corpus is never globally sorted and the kept set is exact even
  * when every doc shares one importance score.
  *
  * Reference scope: [EXT] — the reference engine (Engine.pm) has no
  * selection surface; DSIR is LLM-pipeline scope per SURVEY.md §2
  * extensions.
  */
object Dsir {

  /** Per-doc log importance weight under (target, raw) bigram LMs:
    * (idCol, n_bigrams, li_micro) where
    *   li_micro = Σ_bigram [ round(ln p_target · 10^6) −
    *                         round(ln p_raw · 10^6) ]
    * with each LM's add-one estimate p = (c_big+1)/(c_uni+V) and
    * unseen counts falling back to 0 (the [[NgramLm.score]] cross-
    * corpus contract). Zero-bigram docs score 0 — no synthetic
    * penalty; budget selection's tie-shuffle treats them fairly.
    */
  def importance(docs: DataFrame, targetDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tLm = NgramLm.train(targetDocs, idCol, textCol)
    // the raw corpus is tokenized ONCE and bigram-exploded ONCE: the
    // materialized frames feed BOTH the raw-LM counts (trainFrom) and
    // the scoring stream below — NgramLm.train(docs) here would
    // re-tokenize and re-explode the whole corpus, the dominant
    // map-side cost at scale (the scaladoc's one-pass claim, made
    // true by construction)
    val t = NgramLm.tokenized(docs, idCol, textCol).localCheckpoint()
    val occ = NgramLm.bigramOccurrences(t, idCol).localCheckpoint()
    val rLm = NgramLm.trainFrom(t, occ)
    def lp(cBig: Column, cUni: Column, v: Column): Column =
      round(log((coalesce(cBig, lit(0L)) + lit(1.0)) /
        (coalesce(cUni, lit(0L)) + v)) * lit(1000000.0)).cast("long")
    val scored = occ
      .join(tLm.bigrams.withColumnRenamed("c_big", "c_big_t"), Seq("bigram"), "left")
      .join(rLm.bigrams.withColumnRenamed("c_big", "c_big_r"), Seq("bigram"), "left")
      .join(tLm.unigrams.select(col("w").as("w1"), col("c_uni").as("c_uni_t")),
        Seq("w1"), "left")
      .join(rLm.unigrams.select(col("w").as("w1"), col("c_uni").as("c_uni_r")),
        Seq("w1"), "left")
      .crossJoin(broadcast(tLm.vocab.select(col("v").as("v_t"))))
      .crossJoin(broadcast(rLm.vocab.select(col("v").as("v_r"))))
      .select(col(idCol),
        (lp(col("c_big_t"), col("c_uni_t"), col("v_t")) -
          lp(col("c_big_r"), col("c_uni_r"), col("v_r"))).as("li"))
    val per = scored.groupBy(idCol)
      .agg(count(lit(1)).as("n"), sum(col("li")).as("s"))
    docs.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n"), lit(0L)).as("n_bigrams"),
        coalesce(col("s"), lit(0L)).as("li_micro"))
  }

  /** DSIR selection: keep the `k` documents with the highest
    * importance, ties broken by the BudgetSelect md5 shuffle key (so
    * a flat importance region is cut fairly, not by id locality).
    * Output: (idCol, n_bigrams, li_micro, kept).
    *
    * `gumbelBeta > 0` adds the paper's Gumbel perturbation — sampling
    * WITHOUT replacement proportional to exp(li/beta) via the
    * Gumbel-top-k identity — with deterministic noise from the md5-u32
    * coin (same doc, salt → same draw). The noise path composes two
    * `ln`s, so it is engine-reproducible but not cross-engine
    * hash-exact; oracle-compared queries use the default beta = 0
    * (pure argmax-k, the paper's temperature→0 limit).
    */
  def resample(docs: DataFrame, targetDocs: DataFrame, k: Long,
      gumbelBeta: Double = 0.0, salt: String = "dsir",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 0L, s"k must be >= 0: $k")
    require(gumbelBeta >= 0.0, s"gumbelBeta must be >= 0: $gumbelBeta")
    // materialize ONCE (SCALE.md invariant 7): BudgetSelect's easy and
    // boundary branches deliberately re-read their input, and the kept
    // flag joins back — three consumers of a two-LM scoring plan.
    // Lazy (r6 continuation): BudgetSelect now caches its withCls
    // frame internally, so the branch re-reads hit that cache and the
    // dedicated blocking job here became redundant
    val imp = importance(docs, targetDocs, idCol, textCol).localCheckpoint(false)
    val score: Column =
      if (gumbelBeta == 0.0) col("li_micro")
      else {
        val u = (graft.corpus.Splits.bucket(col(idCol).cast("string"), salt)
          .cast("double") + lit(0.5)) / lit(4294967296.0)
        col("li_micro") +
          round(lit(gumbelBeta) * -log(-log(u)) * lit(1000000.0)).cast("long")
      }
    graft.corpus.BudgetSelect
      .select(imp.withColumn("sel_score", score), col("sel_score"), lit(1L),
        budget = k, idCol = idCol, salt = salt)
      .select(col("id").as(idCol), col("score").as("li_sel_micro"), col("kept"))
      .join(imp.select(col(idCol), col("n_bigrams"), col("li_micro")), Seq(idCol))
      .select(col(idCol), col("n_bigrams"), col("li_micro"), col("kept"))
  }
}
