package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.multimodal.Multimodal
import graft.operators.Clustering
import graft.streaming.EventStreams

/** ML, streaming, and multimodal queries: MLlib KMeans/PCA (reference
  * C1/C2), the computed-cluster EP1 pipeline, Structured Streaming
  * aggregation (oracle-comparable to its batch twin), stateful
  * sessionization, and multimodal feature extraction.
  */
object MlQueries extends QueryModule {

  private def embs(implicit s: SparkSession, dir: String) = Tables.embeddings(s, dir)

  /** KMeans(10, seed 0) labels — deterministic under the pinned seed;
    * label values are MLlib's (sklearn parity is property-level, per
    * SURVEY.md §5). */
  private def qKmeans(implicit s: SparkSession, dir: String): DataFrame =
    Clustering.kmeansLabels(embs, "embedding", k = 10, seed = 0L)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .orderBy(col("cluster"))

  /** The reference's ACTUAL EP1 flow with computed clusters: KMeans →
    * per-cluster percentile band → stride sample. */
  private def qKmeansSelect(implicit s: SparkSession, dir: String): DataFrame = {
    val conf = round(graft.plans.PosWeightedSum(col("embedding")), 6)
    val scored = embs.select(col("vec_id"), col("embedding"), conf.as("conf"))
    Clustering.clusterAndSelect(scored, "vec_id", "embedding", "conf",
        k = 10, sampleNum = 5, seed = 0L)
      .select(col("cluster"), col("vec_id"), col("conf"))
      .orderBy(col("cluster"), col("vec_id"))
  }

  /** PCA projection to 10 dims (reference pre-t-SNE step); output is
    * per-vector projection energy (PCA sign indeterminacy makes raw
    * components non-comparable). */
  private def qPca(implicit s: SparkSession, dir: String): DataFrame =
    Clustering.pcaProject(embs, "embedding", dims = 10)
      .select(col("vec_id"),
        round(aggregate(transform(col("pca"), x => x * x), lit(0.0),
          (a, x) => a + x), 6).as("pca_energy"))
      .orderBy(col("vec_id"))

  /** Streaming hourly aggregation — same semantics as the batch
    * q_hourly_events, checked against the SAME DuckDB oracle: the
    * tumbling window start equals date_trunc('hour'). */
  private def qStreamHourly(implicit s: SparkSession, dir: String): DataFrame =
    EventStreams.streamingHourly(s, dir)
      .orderBy(col("hour"), col("event_type"))

  private val qStreamHourlySql =
    """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE), 2) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Stateful sessionization (30-min gap) via flatMapGroupsWithState;
    * emits closed sessions only (open sessions stay in state — the
    * streaming-correct behavior on an unbounded source). */
  private def qSessionize(implicit s: SparkSession, dir: String): DataFrame =
    EventStreams.sessionize(s, dir, gapMinutes = 30)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .orderBy(col("user_id"))

  /** Multimodal: synthetic media table → stub decode → features +
    * frame sampling; aggregated per kind. */
  private def qMultimodal(implicit s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticMedia(Tables.documents(s, dir), "doc_id", "text")
    val feats = Multimodal.extractFeatures(media)
    Multimodal.sampleFrames(feats, stride = 4, maxFrames = 8)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        round(avg(col("n_frames")), 4).as("avg_frames"),
        round(avg(element_at(col("features"), 1)), 6).as("avg_f0"),
        round(avg(size(col("frame_idx"))), 4).as("avg_sampled"))
      .orderBy(col("kind"))
  }

  override def queries: Seq[Q] = Seq(
    Q("q_kmeans", (s, d) => qKmeans(s, d), None),
    Q("q_kmeans_select", (s, d) => qKmeansSelect(s, d), None),
    Q("q_pca_energy", (s, d) => qPca(s, d), None),
    Q("q_stream_hourly", (s, d) => qStreamHourly(s, d), Some(qStreamHourlySql)),
    Q("q_sessionize", (s, d) => qSessionize(s, d), None),
    Q("q_multimodal_features", (s, d) => qMultimodal(s, d), None))
}
