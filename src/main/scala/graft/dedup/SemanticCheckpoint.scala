package graft.dedup

import org.apache.spark.sql.DataFrame

import graft.io.ManifestParquetIO

/** Stage-checkpointed semantic dedup — the reference
  * TextSemanticDeduplicationWorkflow's `cache_path` contract
  * (stages/text/deduplication/semantic.py:68-185 + semantic/workflow
  * .py:150-153: embeddings, kmeans results and pairwise results land in
  * `cache_path`; a crashed run resumes from the last completed stage).
  *
  * Stage tables under `cachePath`:
  *   - `embeddings` (caller-persisted via [[embeddedInput]]) — the
  *     model-inference pass, by far the most expensive tier at scale,
  *     and the id-stability anchor when ids are synthetic.
  *   - `kmeans` — [[SemanticDedup.rankedBlocks]]'s (id, vec, _block,
  *     _cdist): fit + assignment + hard-cap sub-split + centroid
  *     distances (the reference's kmeans_results, data partitioned by
  *     centroid).
  *
  * The final pairwise join + rank filter recomputes from `kmeans` —
  * it is the cheapest tier and its output IS the workflow output (the
  * reference's pairwise_results, written to output_path here).
  *
  * The cache is keyed by nothing: like the reference, changing k /
  * whichToKeep / the embedder against an existing cachePath reuses
  * stale stages — use a fresh cache directory per configuration.
  */
object SemanticCheckpoint {

  /** Persist the embedded input once; replayed on every rerun. */
  def embeddedInput(df: DataFrame, cachePath: String): DataFrame =
    new ManifestParquetIO(cachePath).stageTable(df.sparkSession, "embeddings")(df)

  /** Ranked removal ids with the kmeans tier checkpointed under
    * `cachePath`. `df`'s `idCol` must be stable across reruns (a real
    * id field, or [[embeddedInput]]'s persisted assignment).
    */
  def removalIdsRanked(df: DataFrame, k: Int, eps: Double, cachePath: String,
                       whichToKeep: String = "hard", seed: Long = 42,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       targetCellSize: Int = SemanticDedup.TargetCellSize,
                       maxCellSize: Int = SemanticDedup.MaxCellSize): DataFrame = {
    val io = new ManifestParquetIO(cachePath)
    val blocks = io.stageTable(df.sparkSession, "kmeans")(
      SemanticDedup.rankedBlocks(df, k, whichToKeep, seed, idCol, vecCol,
        targetCellSize, maxCellSize))
    SemanticDedup.removalFromBlocks(blocks, eps, whichToKeep, seed, idCol, vecCol)
  }
}
