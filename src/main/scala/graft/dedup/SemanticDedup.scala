package graft.dedup

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sim.Knn

/** Semantic (embedding-space) deduplication: KMeans clustering, then
  * within-cluster pairwise cosine, then keep-one-per-near-dup-group.
  *
  * Reference: stages/deduplication/semantic/ — KMeansStage (normalized
  * embeddings, kmeans.py:260-286), PairwiseStage (within-cluster batched
  * cosine max-similarity, pairwise.py:37-71), IdentifyDuplicatesStage
  * (eps threshold). Spark-first: ml.KMeans for the model, an equi-join
  * on cluster id for the pairwise step (never the full cross product),
  * and the same window keep-first as the other dedups.
  *
  * Scale shape: pairwise cost is Σ cluster_size² — pick k so the average
  * cell stays small (reference default: 1000 clusters for ~300M docs);
  * the cluster equi-join shuffles only (cluster, id, vec).
  */
object SemanticDedup {

  /** Assign a kmeans cluster per embedding (L2-normalized first, so
    * euclidean kmeans ≈ spherical/cosine kmeans — kmeans.py:260-266).
    */
  def withClusters(df: DataFrame, k: Int, seed: Long = 42,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val toVec = udf((v: Seq[Float]) => {
      val arr = v.map(_.toDouble).toArray
      val n = math.sqrt(arr.map(x => x * x).sum)
      Vectors.dense(if (n == 0) arr else arr.map(_ / n))
    })
    val feat = df.withColumn("_features", toVec(col(vecCol)))
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("_features")
      .setPredictionCol("cluster").setMaxIter(20)
      .fit(feat)
    model.transform(feat).drop("_features")
  }

  /** Near-duplicate pairs: exact cosine within each kmeans cell. */
  def nearDupPairs(df: DataFrame, k: Int, eps: Double, seed: Long = 42,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Knn.nearDupPairsWithin(withClusters(df, k, seed, idCol, vecCol),
      "cluster", minCosine = 1.0 - eps, idCol, vecCol)

  /** Removal ids: connected components over near-dup pairs, keep min id
    * per component (reference which_to_keep="hard" analogue with id
    * ordering).
    */
  def removalIds(df: DataFrame, k: Int, eps: Double, seed: Long = 42,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val edges = nearDupPairs(df, k, eps, seed, idCol, vecCol).select(col("src"), col("dst"))
    ConnectedComponents.run(edges)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
  }
}
