package graft.canon

import org.apache.spark.ml.feature.{PCA, StandardScaler}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimensionality reduction (reference A23: StandardScaler + PCA(50),
  * similarity_pipeline.py:129-135; t-SNE substituted by PCA per the
  * SURVEY §7.5 deviations ledger — deterministic, distributed).
  */
object Reduce {

  /** (id, group, vec array<double>) → (id, group, vec array<double> of
    * dimension k), standardized then PCA-projected. Fit is global
    * (covariance eigendecomposition — deterministic up to sign).
    */
  def pca(feat: DataFrame, k: Int)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val asVec = udf((a: Seq[Double]) => Vectors.dense(a.toArray))
    val asArr = udf((v: org.apache.spark.ml.linalg.Vector) => v.toArray)
    val df = feat.withColumn("fv", asVec(col("vec")))
    val scaler = new StandardScaler().setInputCol("fv").setOutputCol("sv")
      .setWithMean(true).setWithStd(true).fit(df)
    val scaled = scaler.transform(df)
    val dims = feat.select(size(col("vec"))).first().getInt(0)
    val model = new PCA().setInputCol("sv").setOutputCol("pv")
      .setK(math.min(k, dims)).fit(scaled)
    model.transform(scaled)
      .select(col("id"), col("group"), asArr(col("pv")).as("vec"))
  }
}
