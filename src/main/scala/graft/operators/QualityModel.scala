package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained discriminative quality scoring — the classifier-based member
  * of the quality family (public technique: the GPT-3/CCNet-lineage
  * "resembles a high-quality reference corpus" filter — a linear
  * classifier over hashed bag-of-words features, trained on
  * reference-vs-crawl labels). It complements the family's other two
  * tiers: the heuristic ratios ([[TextOps]] length/punct/stopword
  * signals — zero training) and the generative n-gram LM score
  * ([[TextOps.ngramLm]] — models the reference only); this one is
  * DISCRIMINATIVE, trained on labeled positives AND negatives, which is
  * what the large-corpus curation pipelines actually deploy.
  *
  * Built on Spark MLlib (in-distribution, `org.apache.spark.ml`):
  * whitespace tokens → `HashingTF` (hashed term counts, dimension
  * `numFeatures` — no vocabulary collect, any token space) → binomial
  * `LogisticRegression`.
  *
  * Scale shape: featurization is map-only (one hashing pass per row, no
  * vocabulary state); LR training is L-BFGS over `treeAggregate`
  * gradient sums — per iteration one aggregation of
  * O(numFeatures)-sized partials, corpus rows never shuffle; scoring is
  * map-only with the coefficient vector broadcast in the model closure.
  * Like every float-aggregation trainer here ([[Similarity
  * .kmeansCentroids]]'s caveat), trained coefficients are deterministic
  * only to FP addition reordering — scores are stable to ~ulp, not
  * bit-pinned.
  */
object QualityModel {

  /** A trained classifier. `numFeatures` is implied by the coefficient
    * vector's length, so the case class round-trips through MLlib
    * persistence with no sidecar. */
  final case class QualityClassifier(model: LogisticRegressionModel) {
    def numFeatures: Int = model.numFeatures
  }

  private def featurize(df: DataFrame, textCol: String,
      numFeatures: Int): DataFrame =
    new HashingTF().setInputCol("_toks").setOutputCol("_feat")
      .setNumFeatures(numFeatures)
      // null text → empty token array (HashingTF NPEs on null input);
      // the empty vector then scores at the intercept-only probability
      .transform(df.withColumn("_toks",
        coalesce(TextOps.tokens(col(textCol)),
          typedLit(Seq.empty[String]))))

  /** Train on a labeled frame: `labelCol` is 1 (or true) for the
    * high-quality reference rows, 0 for the negatives (raw crawl,
    * gibberish, boilerplate — whatever the filter should reject).
    * `numFeatures` is the hashing dimension (collisions degrade
    * gracefully; 2^18 is comfortable for word-level features).
    */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
      numFeatures: Int = 1 << 18, maxIter: Int = 50,
      regParam: Double = 1e-4): QualityClassifier = {
    require(labeled.columns.contains(textCol),
      s"labeled frame is missing text column '$textCol'")
    require(labeled.columns.contains(labelCol),
      s"labeled frame is missing label column '$labelCol'")
    require(numFeatures > 0, s"numFeatures must be > 0, got $numFeatures")
    Reserved.requireFreeColumns(labeled, Seq("_toks", "_feat", "_lbl"),
      "train", "train uses the _-prefixed names for the featurize/fit " +
        "pipeline")
    val feats = featurize(
      labeled.withColumn("_lbl", col(labelCol).cast("double")),
      textCol, numFeatures)
    val lr = new LogisticRegression()
      .setFeaturesCol("_feat").setLabelCol("_lbl")
      .setMaxIter(maxIter).setRegParam(regParam)
    QualityClassifier(lr.fit(feats))
  }

  /** Score a corpus: `df.*` plus `quality_prob` — the model's
    * P(label = 1), the keep-probability the curation pipelines
    * threshold or importance-sample on (GPT-3 famously kept low-scoring
    * docs with probability tied to the score rather than hard-cutting).
    * Map-only; null/empty text featurizes to the empty vector and gets
    * the model's intercept-only probability.
    */
  def score(df: DataFrame, clf: QualityClassifier,
      textCol: String): DataFrame = {
    require(df.columns.contains(textCol),
      s"frame is missing text column '$textCol'")
    // fail loud on collisions instead of silently clobbering (or, for
    // quality_prob, emitting the name twice — which would make every
    // downstream reference ambiguous): the re-score-after-retrain flow
    // should drop the stale column first. The featurize/transform
    // internals ride the caller's frame (withColumn chain), so the
    // whole set is frame-reserved, not just the output.
    Reserved.requireFreeColumns(df,
      Seq("quality_prob", "_toks", "_feat", "_raw", "_prob", "_pred"),
      "scoring", "score appends quality_prob and uses the _-prefixed " +
        "names internally")
    // score on a COPY: setting the column Params on the caller's model
    // would mutate shared state (concurrent score calls racing on Param
    // values, and the mutation persisting on the caller's object) —
    // copy(ParamMap.empty) clones the model so scoring is side-effect-
    // free and thread-safe
    clf.model.copy(org.apache.spark.ml.param.ParamMap.empty)
      .setFeaturesCol("_feat")
      .setPredictionCol("_pred").setRawPredictionCol("_raw")
      .setProbabilityCol("_prob")
      .transform(featurize(df, textCol, clf.numFeatures))
      .withColumn("quality_prob",
        vector_to_array(col("_prob")).getItem(1))
      .select((df.columns.map(col) :+ col("quality_prob")): _*)
  }

  /** Persist / reload through MLlib's own writer — a directory layout,
    * like the IVF index persistence. */
  def save(clf: QualityClassifier, dir: String): Unit =
    clf.model.write.overwrite().save(dir)

  def load(spark: org.apache.spark.sql.SparkSession,
      dir: String): QualityClassifier =
    QualityClassifier(LogisticRegressionModel.load(dir))
}
