package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.feature.{CountVectorizer, IDF, IndexToString, NGram, RegexTokenizer, StringIndexer, VectorAssembler}
import org.apache.spark.sql.DataFrame

/** Region classifier (SURVEY §2.8 stretch; reference
  * ml_region_prediction.py:44-156): TF-IDF over the location string
  * (uni+bi-grams, mirroring the reference's ngram_range=(1,2)) into a
  * seeded RandomForest(100). The reference's per-row predict-and-commit
  * loop (ml_region_prediction.py:142-152) becomes one distributed
  * transform.
  */
object RegionModel {

  def pipeline(numTrees: Int = 100, seed: Long = 42L): Pipeline = {
    val tokenizer = new RegexTokenizer()
      .setInputCol("location").setOutputCol("tokens").setPattern("\\W+")
    val bigrams = new NGram().setN(2)
      .setInputCol("tokens").setOutputCol("bigrams")
    // CountVectorizer with minDF=2 mirrors the reference's
    // TfidfVectorizer(ngram_range=(1,2), min_df=2): only repeated terms
    // enter the vocabulary, keeping the feature space dense with signal
    val tf1 = new CountVectorizer().setInputCol("tokens")
      .setOutputCol("tf1").setMinDF(2)
    val tf2 = new CountVectorizer().setInputCol("bigrams")
      .setOutputCol("tf2").setMinDF(2)
    val assembler = new VectorAssembler()
      .setInputCols(Array("tf1", "tf2")).setOutputCol("tf")
    val idf = new IDF().setInputCol("tf").setOutputCol("features")
    val label = new StringIndexer()
      .setInputCol("region").setOutputCol("label").setHandleInvalid("keep")
    val rf = new RandomForestClassifier()
      .setNumTrees(numTrees).setSeed(seed)
      // small dense vocab (minDF=2): let every split see all features —
      // sqrt-sampling starves the few informative keyword dims
      .setFeatureSubsetStrategy("all")
      .setLabelCol("label").setFeaturesCol("features")
    new Pipeline().setStages(Array(
      tokenizer, bigrams, tf1, tf2, assembler, idf, label, rf))
  }

  /** Train on (location, region) rows. */
  def train(labeled: DataFrame, numTrees: Int = 100): PipelineModel =
    pipeline(numTrees).fit(labeled)

  /** Predict regions for (location) rows; returns predicted_region. */
  def predict(model: PipelineModel, df: DataFrame): DataFrame = {
    val labels = model.stages
      .collectFirst { case m: org.apache.spark.ml.feature.StringIndexerModel => m }
      .get.labelsArray(0)
    val toLabel = new IndexToString()
      .setInputCol("prediction").setOutputCol("predicted_region")
      .setLabels(labels)
    toLabel.transform(model.transform(df))
      .drop("tokens", "bigrams", "tf1", "tf2", "tf", "features",
        "rawPrediction", "probability")
  }
}
