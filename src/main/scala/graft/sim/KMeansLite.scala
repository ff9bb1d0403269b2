package graft.sim

/** Bounded driver-side Lloyd k-means over L2-normalized vectors — the
  * fit path for blocking-tier clustering (SemanticDedup). ml.KMeans
  * spends seconds of driver job rounds per fit even on a 5k-row cached
  * sample; since the fit sample is ALREADY bounded (FitSampleCap rows,
  * ≤ ~25 MB at dim 64), Lloyd on the driver costs milliseconds and
  * zero Spark jobs. Assignment stays distributed (one broadcast-model
  * UDF pass). Same discipline as TrainCap model training: driver work
  * is O(sample), never O(corpus).
  *
  * Reference: semantic/kmeans.py fits on capped in-memory batches the
  * same way.
  */
object KMeansLite {

  final case class Model(centroids: Array[Array[Double]]) extends Serializable {
    val k: Int = centroids.length

    /** Index of the nearest centroid by squared L2 (input normalized). */
    def predict(v: Array[Double]): Int = {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val d = dist2(v, centroids(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    /** The `p` nearest centroid indices, nearest first — multi-probe
      * blocking: a near-dup pair on a cell boundary still shares a
      * block when each point carries its top-2 cells.
      */
    def predictTop(v: Array[Double], p: Int): Seq[Int] =
      centroids.indices
        .map(c => (dist2(v, centroids(c)), c))
        .sortBy(identity).take(math.max(1, p)).map(_._2)

    private def dist2(v: Array[Double], cen: Array[Double]): Double = {
      var d = 0.0
      var j = 0
      val n = math.min(v.length, cen.length)
      while (j < n) { val t = v(j) - cen(j); d += t * t; j += 1 }
      d
    }
  }

  /** L2-normalize to the unit sphere (euclidean k-means there ≈
    * spherical/cosine k-means).
    */
  def normalize(v: Seq[Float]): Array[Double] = {
    val arr = new Array[Double](v.length)
    var i = 0
    var s = 0.0
    while (i < v.length) { val x = v(i).toDouble; arr(i) = x; s += x * x; i += 1 }
    if (s > 0) { val n = math.sqrt(s); i = 0; while (i < arr.length) { arr(i) /= n; i += 1 } }
    arr
  }

  /** Seeded k-means++ init (Arthur & Vassilvitskii 2007): first center
    * uniform, each next sampled ∝ squared distance to the nearest
    * chosen center — deterministic for a fixed seed, and far better
    * separated than uniform init on clustered embedding data.
    */
  private def plusPlusInit(samples: Array[Array[Double]], k: Int,
                           rnd: scala.util.Random): Array[Array[Double]] = {
    val centers = new Array[Array[Double]](k)
    centers(0) = samples(rnd.nextInt(samples.length)).clone()
    val d2 = Array.fill(samples.length)(Double.MaxValue)
    var c = 1
    while (c < k) {
      val prev = centers(c - 1)
      var total = 0.0
      var i = 0
      while (i < samples.length) {
        val v = samples(i)
        var d = 0.0
        var j = 0
        while (j < v.length) { val t = v(j) - prev(j); d += t * t; j += 1 }
        if (d < d2(i)) d2(i) = d
        total += d2(i)
        i += 1
      }
      if (total <= 0) { centers(c) = samples(rnd.nextInt(samples.length)).clone() }
      else {
        var target = rnd.nextDouble() * total
        var pick = 0
        i = 0
        while (i < samples.length && target > 0) { target -= d2(i); pick = i; i += 1 }
        centers(c) = samples(pick).clone()
      }
      c += 1
    }
    centers
  }

  /** Seeded Lloyd: k-means++ init, `iters` rounds, empty clusters keep
    * their previous centroid (deterministic).
    */
  def fit(samples: Array[Array[Double]], k: Int, iters: Int = 10, seed: Long = 42): Model = {
    require(samples.nonEmpty, "k-means fit needs at least one sample")
    val kEff = math.max(1, math.min(k, samples.length))
    val rnd = new scala.util.Random(seed)
    val dim = samples(0).length
    var centroids = plusPlusInit(samples, kEff, rnd)

    var it = 0
    while (it < iters) {
      val sums = Array.fill(kEff)(new Array[Double](dim))
      val counts = new Array[Long](kEff)
      val m = Model(centroids)
      var s = 0
      while (s < samples.length) {
        val v = samples(s)
        val c = m.predict(v)
        val sum = sums(c)
        var j = 0
        while (j < dim) { sum(j) += v(j); j += 1 }
        counts(c) += 1
        s += 1
      }
      centroids = Array.tabulate(kEff) { c =>
        if (counts(c) == 0) centroids(c) // empty cell: keep previous
        else {
          val sum = sums(c)
          val out = new Array[Double](dim)
          var j = 0
          while (j < dim) { out(j) = sum(j) / counts(c); j += 1 }
          out
        }
      }
      it += 1
    }
    Model(centroids)
  }
}
