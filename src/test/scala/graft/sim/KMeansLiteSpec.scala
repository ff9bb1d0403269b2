package graft.sim

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side k-means: flat-tier selection semantics, the two-level
  * large-k fit (√k coarse + per-cell sub-fits), and determinism across
  * runs — the properties the semantic-dedup blocking tier leans on.
  */
class KMeansLiteSpec extends AnyFunSuite {

  /** n clustered points: `planted` well-separated centers on coordinate
    * axes, gaussian-ish jitter from a seeded PRNG.
    */
  private def clustered(n: Int, planted: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(n) { i =>
      val c = i % planted
      val v = Array.tabulate(dim)(j => (if (j == c % dim) 4.0 * (1 + c / dim) else 0.0) + rnd.nextGaussian() * 0.05)
      KMeansLite.normalize(v.map(_.toFloat).toSeq)
    }
  }

  test("predictTop (flat) equals brute-force sorted selection, ties broken by index") {
    val samples = clustered(200, 7, 8, seed = 1)
    val m = KMeansLite.fit(samples, 7, iters = 5, seed = 42)
    def dist2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (v <- samples.take(20)) {
      val expect = m.centroids.indices
        .map(c => (dist2(v, m.centroids(c)), c)).sortBy(identity).take(3).map(_._2)
      assert(m.predictTop(v, 3) == expect)
      assert(m.predictTop(v, 1) == Seq(m.predict(v)))
    }
    // p larger than k: every centroid, nearest first, no padding
    assert(m.predictTop(samples(0), 99).size == m.k)
  }

  test("two-level fit above FlatKMax: ~k centroids, valid offsets, sane assignment") {
    val samples = clustered(4000, 40, 16, seed = 2)
    val k = KMeansLite.FlatKMax + 200
    val m = KMeansLite.fit(samples, k, iters = 3, seed = 42)
    // k_i = floor(cell·k/n) rounding loses at most one per coarse cell
    assert(m.k > KMeansLite.FlatKMax / 2 && m.k <= k)
    // every predict lands in range and predictTop heads with predict's pick
    for (v <- samples.take(50)) {
      val p = m.predict(v)
      assert(p >= 0 && p < m.k)
      assert(m.predictTop(v, 2).head == p)
      assert(m.predictTop(v, 2).distinct.size == 2)
    }
    // assignment quality: a point's chosen centroid is (near-)nearest —
    // within 1% squared distance of the exact argmin (2-cell coarse
    // probing can miss only distant-boundary cases)
    def dist2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val misses = samples.take(200).count { v =>
      val exact = m.centroids.map(dist2(v, _)).min
      dist2(v, m.centroids(m.predict(v))) > exact + 0.01
    }
    assert(misses <= 2, s"two-level predict strayed from exact nearest on $misses/200 points")
  }

  test("deterministic: same seed, same samples -> identical centroids (flat and two-level)") {
    for (k <- Seq(16, KMeansLite.FlatKMax + 100)) {
      val s1 = clustered(3000, 12, 8, seed = 3)
      val s2 = clustered(3000, 12, 8, seed = 3)
      val m1 = KMeansLite.fit(s1, k, iters = 3, seed = 7)
      val m2 = KMeansLite.fit(s2, k, iters = 3, seed = 7)
      assert(m1.k == m2.k)
      assert(m1.centroids.zip(m2.centroids).forall { case (a, b) => a.sameElements(b) })
    }
  }

  test("empty-cluster and k>n edge cases stay well-formed") {
    val tiny = clustered(5, 2, 4, seed = 4)
    val m = KMeansLite.fit(tiny, 2000, iters = 2, seed = 42)
    assert(m.k <= 5)
    assert(m.predict(tiny(0)) >= 0 && m.predict(tiny(0)) < m.k)
  }
}
