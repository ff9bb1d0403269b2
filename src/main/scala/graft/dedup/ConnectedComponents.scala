package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list, as alternating large-star /
  * small-star DataFrame rounds (Kiveris et al. 2014, "Connected
  * Components in MapReduce and Beyond") — the shuffle-native replacement
  * for the reference's cuGraph WCC
  * (stages/deduplication/fuzzy/connected_components.py:37-202).
  *
  * Each round is a groupBy on long keys only; convergence is checked with
  * a cheap aggregate. Dedup graphs are forests of shallow near-clique
  * clusters, so rounds ≈ O(log max-component-diameter) — typically 3-5.
  */
object ConnectedComponents {

  /** edges(src: long, dst: long) -> (id: long, component: long) where
    * component is the minimum id in the connected component.
    */
  def run(edges: DataFrame, maxIterations: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // Self-loops for every vertex so isolated members of 1-edge graphs
    // keep themselves; symmetrize.
    var e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter($"src" =!= $"dst")
      .distinct()
      .cache()

    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      // large-star: for each u, connect all neighbors v > u to min(N(u) ∪ u)
      val minNbr = e.groupBy($"src")
        .agg(least(min($"dst"), $"src").as("mn"), collect_set($"dst").as("nbrs"))
      val largeStar = minNbr
        .select($"src", $"mn", explode($"nbrs").as("v"))
        .filter($"v" > $"src")
        .select($"v".as("src"), $"mn".as("dst"))
        .union(minNbr.select($"src", $"mn".as("dst")))
        .filter($"src" =!= $"dst")
        .distinct()

      // small-star: for each u, connect all neighbors v <= u (and u) to min
      val smaller = largeStar
        .select(greatest($"src", $"dst").as("src"), least($"src", $"dst").as("dst"))
      val minNbr2 = smaller.groupBy($"src")
        .agg(min($"dst").as("mn"), collect_set($"dst").as("nbrs"))
      val next = minNbr2
        .select($"src", $"mn", explode($"nbrs").as("v"))
        .select($"v".as("src"), $"mn".as("dst"))
        .union(minNbr2.select($"src", $"mn".as("dst")))
        .filter($"src" =!= $"dst")
        .distinct()
        .cache()

      // converged when the (count, sum(src), sum(dst)) checksum is stable —
      // one cheap aggregate per round instead of a set-difference job
      def checksum(df: DataFrame): (Long, Long, Long) = {
        val r = df.agg(count(lit(1)), sum($"src"), sum($"dst")).head()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1), if (r.isNullAt(2)) 0L else r.getLong(2))
      }
      val stable = checksum(next) == checksum(e)
      e.unpersist()
      e = next
      converged = stable
      iter += 1
    }

    val comp = e.select(greatest($"src", $"dst").as("id"), least($"src", $"dst").as("component"))
      .groupBy($"id").agg(min($"component").as("component"))
    // add representatives mapping to themselves
    comp.select($"component".as("id"), $"component").distinct().union(comp)
      .groupBy($"id").agg(min($"component").as("component"))
  }
}
