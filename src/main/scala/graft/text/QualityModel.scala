package graft.text

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MODEL-BASED quality filtering — the DCLM / FineWeb-Edu practice: a
  * lightweight linear classifier scores every document and the score
  * (not a hand rule) decides what enters the training corpus. The
  * hand-crafted signals ([[TextStats.qualityFeatures]], Gopher
  * repetition) stay as features and fallbacks; this operator adds the
  * fastText-shaped discriminator, Spark-native (spark.ml HashingTF +
  * LogisticRegression — resident in the Spark distro, no extra jar).
  *
  * Weak supervision with NO external labels: positives are the corpus
  * docs themselves, negatives are DETERMINISTIC token-shuffles of the
  * same docs ([[corrupt]] — each token keyed by xxhash64(token, pos)
  * and array_sort'ed, so the permutation is stable across runs and
  * cluster sizes). A bag of UNIGRAMS cannot see the difference (token
  * multiset is shuffle-invariant), so features are hashed BIGRAM
  * counts — exactly what shuffling destroys.
  *
  * Scale shape: featurization is map-only (tokens → bigrams →
  * HashingTF, all per-row); training fits on a DETERMINISTIC bounded
  * hash-sample (`maxTrainRows`, the IVF recipe — the model is an
  * artifact, not the data path) with spark.ml's distributed
  * treeAggregate doing the per-iteration gradient; scoring is one
  * map-only pass with the broadcast coefficient vector. Training
  * floats are order-sensitive (treeAggregate), so tests assert
  * held-out AUC, never exact coefficients — this operator has no
  * SQL oracle by nature (like the streaming family).
  */
object QualityModel {

  /** Deterministic gibberish negatives: each doc's tokens permuted by
    * the stable key xxhash64(token, position). Same multiset, broken
    * order — the exact thing a real/garbage discriminator must see.
    */
  def corrupt(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), TextStats.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        array_join(transform(array_sort(
          transform(col("toks"), (t, i) => struct(xxhash64(t, i).as("k"), t.as("t")))),
          s => s.getField("t")), " ").as(textCol))

  private def featurize(docs: DataFrame, textCol: String, bins: Int) = {
    val staged = docs
      .withColumn("__toks", TextStats.tokens(col(textCol)))
      .withColumn("__terms", TextStats.bigrams(col("__toks")))
    new HashingTF().setInputCol("__terms").setOutputCol("features")
      .setNumFeatures(bins).setBinary(true)
      .transform(staged)
      .drop("__toks", "__terms")
  }

  /** Fit the discriminator on positives = `docs`, negatives =
    * [[corrupt]](docs), each side capped at a deterministic
    * hash-sample of `maxTrainRows` rows.
    */
  def train(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      bins: Int = 1 << 15, maxTrainRows: Long = 100000L): LogisticRegressionModel = {
    // deterministic bounded sample (the IVF recipe: one sizing count
    // on the TRAINING path only — the model is an artifact, not the
    // data path): admit ids whose hash falls in the cap's fraction.
    // 2^30 modulus granularity (~1e-9) with a floor of 1 so the
    // admitted set can never truncate to EMPTY — an integer-division
    // threshold over 1e6 went to zero past n = 1e6·cap, exactly the
    // 10^12-row regime this cap exists for (r4c review #1)
    val base0 = docs.filter(col(textCol).isNotNull)
    val n = base0.count()
    val mod = 1L << 30
    val base = if (n <= maxTrainRows) base0
      else base0.filter(pmod(xxhash64(col(idCol)), lit(mod)) <
        lit(math.max(1L, (mod * (maxTrainRows.toDouble / n)).toLong)))
    val pos = base.select(col(idCol), col(textCol)).withColumn("label", lit(1.0))
    val neg = corrupt(base, idCol, textCol).withColumn("label", lit(0.0))
    val feats = featurize(pos.unionByName(neg), textCol, bins)
    new LogisticRegression().setMaxIter(25).setRegParam(1e-3)
      .setLabelCol("label").setFeaturesCol("features")
      .fit(feats)
  }

  /** (idCol, quality_prob): P(real | doc) under `model` — map-only,
    * coefficients broadcast. The feature width comes from the MODEL
    * (`model.numFeatures`), never a separate parameter a caller could
    * let drift from training (r4c review #5). Null-text docs pass
    * through with null quality_prob — no row vanishes (the LineDedup/
    * ChunkDedup convention), so a quarantined doc's missing verdict is
    * explicit, not a silent drop.
    */
  def score(model: LogisticRegressionModel, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val feats = featurize(
      docs.filter(col(textCol).isNotNull).select(col(idCol), col(textCol)),
      textCol, model.numFeatures)
    val p1 = udf((v: org.apache.spark.ml.linalg.Vector) => v(1))
    model.transform(feats)
      .select(col(idCol), p1(col("probability")).as("quality_prob"))
      .unionByName(docs.filter(col(textCol).isNull)
        .select(col(idCol), lit(null).cast("double").as("quality_prob")))
  }
}
