package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering path (reference C1/C2): MLlib KMeans over the embedding
  * column and PCA reduction, feeding the selection pipeline.
  *
  * Reference provenance: `KMeans(n_clusters, random_state=0)` fit on
  * the full embedding matrix (`main.py:316–322,353`) — a driver-side
  * sklearn call that materializes every vector in memory. Here the
  * vectors stay distributed: MLlib's KMeans is the driver-orchestrated
  * iterative-job pattern (one pass per iteration, centers broadcast),
  * which is exactly what survives 100 TB. PCA mirrors
  * `main.py:362–364`.
  *
  * Determinism: seeded (reference pins seed 0); label VALUES differ
  * from sklearn's (init differs) but the contract — k clusters,
  * deterministic under a fixed seed — holds, per SURVEY.md §5's
  * property-level parity note.
  */
object Clustering {

  /** Add a `cluster` label column via KMeans(k, seed) on `embCol`
    * (array<float> → ml Vector under the hood). */
  def kmeansLabels(df: DataFrame, embCol: String, k: Int,
                   seed: Long = 0L): DataFrame = {
    val withVec = df.withColumn("_features", array_to_vector(col(embCol)))
    val model = new KMeans()
      .setK(k).setSeed(seed).setFeaturesCol("_features")
      .setPredictionCol("cluster")
      .fit(withVec)
    model.transform(withVec).drop("_features")
  }

  /** Project embeddings to `dims` principal components (reference's
    * PCA(10) pre-t-SNE step); returns the input plus a `pca` array
    * column. */
  def pcaProject(df: DataFrame, embCol: String, dims: Int): DataFrame = {
    val withVec = df.withColumn("_features", array_to_vector(col(embCol)))
    val model = new PCA()
      .setK(dims).setInputCol("_features").setOutputCol("_pca")
      .fit(withVec)
    model.transform(withVec)
      .withColumn("pca", vector_to_array(col("_pca")))
      .drop("_features", "_pca")
  }

  /** EP1 end-to-end with COMPUTED clusters (the reference's actual
    * flow, vs the precomputed-label oracle path): KMeans → per-cluster
    * percentile band → stride sample. */
  def clusterAndSelect(df: DataFrame, idCol: String, embCol: String,
                       confCol: String, k: Int, sampleNum: Int,
                       lowPct: Double = 0.25, upPct: Double = 0.75,
                       seed: Long = 0L): DataFrame = {
    val labeled = kmeansLabels(df, embCol, k, seed)
    val band = Selection.percentileBand(labeled, "cluster", confCol,
      lowPct, upPct, minGroupSize = sampleNum.toLong * 2)
    Selection.strideSample(band, "cluster", idCol, sampleNum)
  }
}
