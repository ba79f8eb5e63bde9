package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document-quality filtering — the GPT-3/LLaMA-style
  * "classifier trained on a trusted corpus, applied to the crawl"
  * pipeline stage (Brown et al. 2020 §A; fastText-linear in practice).
  *
  * The model is plain logistic regression over the
  * [[TextAnalysis.qualityMetrics]] feature ratios. Training is
  * distributed full-batch gradient descent: each iteration is ONE keyed-
  * less aggregation producing k+1 doubles on the driver (the gradient),
  * never a per-row collect; scoring is a per-row codegen'd linear
  * expression — zero shuffle, runs at scan speed at any corpus size.
  *
  * Determinism: scoring with FIXED weights is exact cross-engine (the
  * logit is a fixed-order chain of correctly-rounded IEEE ops over
  * integer-derived ratios — the p49 oracle reproduces it bitwise; the
  * sigmoid goes through libm exp, so thresholding/ranking should use the
  * logit, which is monotone in it). Trained weights inherit float
  * reduction-order noise in the last ulps of each gradient sum — specs
  * pin behavior (separation, loss descent), not exact weights.
  */
object Quality {

  /** Feature column names, in the fixed order weights refer to them
    * (after the intercept). */
  val featureNames: Seq[String] =
    Seq("alpha_ratio", "punct_ratio", "stop_ratio", "avg_word_len")

  /** Linear score w0 + Σ wi·fi in a FIXED left-to-right order so every
    * engine computes the identical rounding sequence. */
  def logit(weights: Seq[Double], features: Seq[Column]): Column = {
    require(weights.length == features.length + 1,
      s"need intercept + one weight per feature: ${weights.length} weights, ${features.length} features")
    features.zip(weights.tail).foldLeft(lit(weights.head): Column) {
      case (acc, (f, w)) => acc + f * lit(w)
    }
  }

  def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Score every document: quality features + the model's logit and a
    * keep/reject decision at logit 0 (= probability 0.5). `prob` is for
    * human consumption; pipelines should threshold on `quality_logit`
    * (monotone in prob, exact cross-engine). */
  def score(df: DataFrame, textCol: String,
      weights: Seq[Double]): DataFrame = {
    val feats = TextAnalysis.qualityMetrics(df, textCol)
    val z = logit(weights, featureNames.map(col))
    feats.withColumn("quality_logit", z)
      .withColumn("prob", sigmoid(col("quality_logit")))
      .withColumn("keep", (col("quality_logit") > 0).cast("long"))
  }

  /** Full-batch logistic-regression training by gradient descent.
    *
    * Each iteration evaluates the current weights over the whole set via
    * ONE aggregation (avg of per-row gradient components — map-side
    * partials make the shuffle k+1 doubles per partition) and updates on
    * the driver; the feature projection is cached across iterations so
    * the text is featurized once. Driver state is k+2 doubles — bounded
    * regardless of corpus size. L2 regularization keeps weights finite on
    * separable data. */
  def trainLogistic(df: DataFrame, textCol: String, labelCol: String,
      iters: Int = 50, step: Double = 1.0, l2: Double = 1e-3): Array[Double] = {
    require(iters >= 1, s"need iters >= 1: $iters")
    val k = featureNames.length
    val feats = TextAnalysis.qualityMetrics(df, textCol)
      .select(col(labelCol).cast("double").as("y") +:
        featureNames.map(n => col(n).cast("double")): _*)
      .cache()
    try {
      var w = Array.fill(k + 1)(0.0)
      for (_ <- 0 until iters) {
        val z = logit(w.toSeq, featureNames.map(col))
        val err = sigmoid(z) - col("y")
        val grads = feats.agg(avg(err).as("g0"),
          featureNames.zipWithIndex.map { case (n, i) =>
            avg(err * col(n)).as(s"g${i + 1}") }: _*).head()
        w = Array.tabulate(k + 1) { i =>
          val reg = if (i == 0) 0.0 else l2 * w(i) // don't shrink the bias
          w(i) - step * (grads.getDouble(i) + reg)
        }
      }
      w
    } finally feats.unpersist()
  }
}
