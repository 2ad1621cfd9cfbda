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

  /** Oracle-EXACT KMeans: fixed-init Lloyd's iterations as relational
    * ops. Init centroids = the embeddings of ids `0 until k`; each
    * round assigns every point to its nearest centroid (squared
    * distance via the codegen'd fixed-order fold
    * [[graft.plans.ArraySqDistToConst]], ties → smallest cid) and
    * recomputes centroids as exact-decimal means (addition-order-free,
    * one double division per dim at the end), so a SQL engine
    * replaying the same rounds produces bit-identical assignments.
    * MLlib stays the production path (`kmeansLabels`: kmeans||
    * init, tolerance stopping); this is the cross-engine-checkable
    * sibling and the same driver-loop idiom — per round ONE grouped
    * aggregate (k·dim tiny rows to the driver) and a narrow,
    * shuffle-free assignment map with k codegen distance exprs. */
  def lloydExactAssign(df: DataFrame, idCol: String, embCol: String,
                       k: Int, iters: Int): DataFrame =
    lloydExactWithCentroids(df, idCol, embCol, k, iters)._1

  /** [[lloydExactAssign]] also returning the FINAL centroids (the
    * ones the returned assignment used) — the PQ codebook trainer
    * needs both the per-row code and the centroid arrays for
    * asymmetric-distance reconstruction. */
  def lloydExactWithCentroids(df: DataFrame, idCol: String, embCol: String,
                              k: Int, iters: Int)
      : (DataFrame, Seq[(Int, Array[Double])]) = {
    import org.apache.spark.sql.types.DecimalType
    def assign(cents: Seq[(Int, Array[Double])]): DataFrame = {
      val cands = cents.map { case (cid, arr) =>
        struct(graft.plans.ArraySqDistToConst(col(embCol), arr).as("dist"),
          lit(cid).as("cid"))
      }
      // lexicographic array_min on (dist, cid) = argmin with cid tiebreak
      df.withColumn("cluster", array_min(array(cands: _*)).getField("cid"))
    }
    var cents: Seq[(Int, Array[Double])] = df.where(col(idCol) < k)
      .select(col(idCol).cast("int"), col(embCol)).collect()
      // Number covers float and double element types
      .map(r => (r.getInt(0),
        r.getSeq[Number](1).map(_.doubleValue).toArray))
      .toSeq.sortBy(_._1)
    require(cents.length == k,
      s"fixed init needs every id in [0, $k); found ids ${cents.map(_._1)}")
    var assigned = assign(cents)
    for (_ <- 1 until iters) {
      // DECIMAL(28,10): 18 integer digits of headroom — a (18,10)
      // accumulator has only 8, which large-magnitude embeddings can
      // overflow (silently NULLing under non-ANSI Spark but erroring
      // in DuckDB — the divergence the PCA path already fixed)
      val rows = assigned
        .select(col("cluster"), posexplode(col(embCol)).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg((sum(col("v").cast("double").cast(DecimalType(28, 10)))
          .cast("double") / count(lit(1))).as("c"))
        .collect()
      cents = rows.groupBy(_.getInt(0)).map { case (cid, rs) =>
        val arr = new Array[Double](rs.map(_.getInt(1)).max + 1)
        rs.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
        (cid, arr)
      }.toSeq.sortBy(_._1)
      // an emptied cluster would silently shrink k (and desynchronize
      // the oracle's fixed-k replay) — fail loudly instead
      require(cents.length == k,
        s"cluster(s) emptied mid-iteration: ${k - cents.length} of $k " +
          "lost; fixed-init Lloyd's needs every cluster non-empty")
      assigned = assign(cents)
    }
    (assigned, cents)
  }

  /** [[lloydExactAssign]] with per-row MULTIPLICITIES — bit-identical
    * centroids and assignments to running the unweighted version over
    * the frame with each row repeated `weightCol` times. The exactness
    * argument: the unweighted path sums `decimal(28,10)(v)` once per
    * member, and decimal addition is exact, so a family of `m`
    * identical rows contributes exactly `decimal(v) · m`; multiplying
    * AFTER the decimal cast (by `m` as DECIMAL(8,0) — the same typed
    * arithmetic DuckDB replays without precision overflow) reproduces
    * that digit-for-digit, and the mean divides by `SUM(weight)`
    * where the full set divides by `COUNT(*)`. This is what makes
    * exact-collapse compositions (dedup the replicated corpus down to
    * representatives, cluster the representatives) EQUAL to
    * clustering the full corpus instead of merely approximating it —
    * the collapse keeps k-means honest under duplication. */
  def lloydExactAssignWeighted(df: DataFrame, idCol: String, embCol: String,
                               weightCol: String, k: Int, iters: Int,
                               initFrom: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def assign(cents: Seq[(Int, Array[Double])]): DataFrame = {
      val cands = cents.map { case (cid, arr) =>
        struct(graft.plans.ArraySqDistToConst(col(embCol), arr).as("dist"),
          lit(cid).as("cid"))
      }
      df.withColumn("cluster", array_min(array(cands: _*)).getField("cid"))
    }
    // Init centroids from `initFrom` when the weighted frame is a
    // COLLAPSED view of it: an exact-duplicate family keeps only its
    // min id, so id j < k whose vector equals a smaller id's would be
    // absent from `df` — reading init from the uncollapsed original
    // reproduces [[lloydExactAssign]]'s init verbatim (duplicate
    // centroids included, which then empty identically at the next
    // round in both paths).
    var cents: Seq[(Int, Array[Double])] = initFrom.getOrElse(df)
      .where(col(idCol) < k)
      .select(col(idCol).cast("int"), col(embCol)).collect()
      .map(r => (r.getInt(0),
        r.getSeq[Number](1).map(_.doubleValue).toArray))
      .toSeq.sortBy(_._1)
    require(cents.length == k,
      s"fixed init needs every id in [0, $k); found ids ${cents.map(_._1)}")
    var assigned = assign(cents)
    for (_ <- 1 until iters) {
      val rows = assigned
        .select(col("cluster"), col(weightCol).as("_w"),
          posexplode(col(embCol)).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg((sum(col("v").cast("double").cast(DecimalType(28, 10))
            * col("_w").cast(DecimalType(8, 0)))
          .cast("double") / sum(col("_w"))).as("c"))
        .collect()
      cents = rows.groupBy(_.getInt(0)).map { case (cid, rs) =>
        val arr = new Array[Double](rs.map(_.getInt(1)).max + 1)
        rs.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
        (cid, arr)
      }.toSeq.sortBy(_._1)
      require(cents.length == k,
        s"cluster(s) emptied mid-iteration: ${k - cents.length} of $k " +
          "lost; fixed-init Lloyd's needs every cluster non-empty")
      assigned = assign(cents)
    }
    assigned
  }

  /** Oracle-EXACT leading-component projection via fixed-init power
    * iteration, relationally — the cross-engine-checkable sibling of
    * MLlib [[pcaProject]] (whose eigensolver has sign/ulp
    * indeterminacy). Direction starts at the uniform unit vector
    * (fixed ⇒ no sign ambiguity); each round computes per-row scores
    * `x·v` as a fixed-order double fold, accumulates the new
    * direction's numerators as exact decimal sums per dimension
    * (addition-order-free), and normalizes once in double on the
    * driver with the same fold order a SQL engine uses. MLlib PCA
    * stays the production path. Scale: per round one explode +
    * grouped aggregate with map-side combine (dim keys, dim rows per
    * partition after partial agg) and one dim-sized collect — the
    * driver-loop idiom. Covariance-free: never materializes dim×dim. */
  def powerIterProjection(df: DataFrame, embCol: String,
                          iters: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val probe = df.select(size(col(embCol))).head(1)
    require(probe.nonEmpty && !probe(0).isNullAt(0),
      "powerIterProjection needs a non-empty table with non-null embeddings")
    val dim = probe(0).getInt(0)
    // probe checks only the FIRST row; a null or ragged embedding in
    // any later row would otherwise be silently skipped by the sums
    // (the direction quietly excludes data). One narrow limit(1) scan.
    require(df.where(col(embCol).isNull || size(col(embCol)) =!= dim).isEmpty,
      s"powerIterProjection needs rectangular non-null embeddings of dim $dim")
    def dotWith(v: Array[Double]) =
      aggregate(zip_with(col(embCol), array(v.map(lit): _*),
        (p, q) => p.cast("double") * q), lit(0.0), (a, x) => a + x)
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      // DECIMAL(28,10): 18 integer digits of headroom so |x·s| terms
      // from large-magnitude embeddings stay in range on BOTH engines
      // (a (18,10) cast would silently NULL in non-ANSI Spark but
      // ERROR in DuckDB — a latent divergence, not just a failure)
      val cn = df
        .select(posexplode(col(embCol)).as(Seq("pos", "x")),
          dotWith(v).as("s"))
        .groupBy(col("pos"))
        .agg(sum((col("x").cast("double") * col("s"))
          .cast(DecimalType(28, 10))).cast("double").as("cn"))
        .orderBy(col("pos")).collect().map(_.getDouble(1))
      val norm = math.sqrt(cn.map(x => x * x).foldLeft(0.0)(_ + _))
      v = cn.map(_ / norm)
    }
    df.withColumn("proj", dotWith(v))
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
