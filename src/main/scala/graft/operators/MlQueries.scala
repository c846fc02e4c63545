package graft

import graft.ml.RegionModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Region-ML query (SURVEY §2.8 / reference ml_region_prediction.py):
  * train the TF-IDF + RandomForest pipeline on synthesized labeled
  * locations and report the (region, predicted) confusion counts.
  *
  * Hash-gated oracle: the corpus is synthetic and separable (the keyword
  * uniquely determines the region) and the RF is seeded, so the trained
  * model classifies the training set PERFECTLY — the expected confusion
  * matrix is exactly the diagonal of per-region training counts, which
  * DuckDB derives from `orders` directly (SF-invariant, no pinned
  * literal). Any training regression produces off-diagonal rows and
  * fails rows+hash, a strictly stronger gate than the old rows-only +
  * acc_ok self-check.
  *
  * The perfection property is EMPIRICAL (seeded RF + minDF=2 vocabulary
  * on a separable corpus), validated at the tested SFs: pinned directly
  * by StreamingAndMlSpec ("diagonal-only") at sf0.001 and by the driver
  * gate at sf0.01. The `o_orderkey < 2000` bound keeps the training set
  * identical across SFs, so those checks cover every SF the driver runs.
  */
object MlQueries {

  def q53RegionMl(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    val kw = when(k % 5 === 0, "canggu")
      .when(k % 5 === 1, "seminyak")
      .when(k % 5 === 2, "ubud")
      .when(k % 5 === 3, "sanur")
      .otherwise("amed")
    val region = when(k % 5 === 0 || k % 5 === 1, "Badung")
      .when(k % 5 === 2, "Gianyar")
      .when(k % 5 === 3, "Denpasar")
      .otherwise("Karangasem")
    val labeled = Tables.orders(s, d)
      .filter(k < 2000) // bounded training set at every sf
      .select(concat(lit("villa in "), kw, lit(" area "), k % 97).as("location"),
        region.as("region"))
    val model = RegionModel.train(labeled, numTrees = 20)
    val confusion = RegionModel.predict(model, labeled)
      .groupBy("region", "predicted_region")
      .agg(count(lit(1)).as("n"))
    // self-validation: the synthetic corpus is separable and the seed is
    // fixed, so the rows-only check carries signal — acc_ok must be true
    // on every row or the deterministic training regressed
    val w = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    confusion
      .withColumn("acc_ok",
        sum(when(col("region") === col("predicted_region"), col("n"))
          .otherwise(0L)).over(w) * 100 >= sum(col("n")).over(w) * 95)
      .orderBy("region", "predicted_region")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q53_region_ml" -> (q53RegionMl _))

  val oracle: Map[String, String] = Map(
    "q53_region_ml" ->
      """SELECT region, region AS predicted_region, count(*) AS n,
        |       true AS acc_ok
        |FROM (SELECT CASE WHEN o_orderkey % 5 IN (0, 1) THEN 'Badung'
        |                  WHEN o_orderkey % 5 = 2 THEN 'Gianyar'
        |                  WHEN o_orderkey % 5 = 3 THEN 'Denpasar'
        |                  ELSE 'Karangasem' END AS region
        |      FROM orders WHERE o_orderkey < 2000)
        |GROUP BY region
        |ORDER BY region, predicted_region""".stripMargin)
}
