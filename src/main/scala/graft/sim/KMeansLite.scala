package graft.sim

/** Bounded driver-side Lloyd k-means over L2-normalized vectors — the
  * fit path for blocking-tier clustering (SemanticDedup). ml.KMeans
  * spends seconds of driver job rounds per fit even on a 5k-row cached
  * sample; since the fit sample is ALREADY bounded (FitSampleCap rows,
  * ≤ ~25 MB at dim 64), Lloyd on the driver costs milliseconds-to-
  * seconds and zero Spark jobs. Assignment stays distributed (one
  * broadcast-model UDF pass). Same discipline as TrainCap model
  * training: driver work is O(sample), never O(corpus).
  *
  * Scale shape: a FLAT fit is O(iters · n · k · dim) — fine to
  * [[FlatKMax]] centroids, but autoK-grown k (≈ corpus/512) would make
  * it quadratic in the sample (k ~ n ⇒ n²). Above [[FlatKMax]] the fit
  * goes TWO-LEVEL: √k coarse centroids, then an independent sub-fit
  * per coarse cell with k_i ∝ cell mass — O(iters · n · √k · dim)
  * total, with the per-cell sub-fits running in parallel across driver
  * cores. Prediction through a two-level model probes the nearest
  * coarse cells and scans only their sub-ranges — O(√k · dim) per row
  * instead of O(k · dim), which also keeps the distributed assignment
  * UDF cheap at large k. Flat-model results are BIT-IDENTICAL to the
  * sequential implementation at any thread count: parallel phases only
  * precompute read-only per-sample values in fixed-size chunks; every
  * floating-point accumulation stays in sample order.
  *
  * Reference: semantic/kmeans.py fits on capped in-memory batches the
  * same way (1000 clusters at ~300M docs).
  */
object KMeansLite {

  /** Largest k fit as a single flat Lloyd; beyond it the fit (and the
    * model's predict path) goes two-level. √FitSampleCap-scale, so a
    * two-level fit's coarse tier and per-cell tiers both stay far below
    * this.
    */
  val FlatKMax = 1024

  /** Fixed parallel-chunk size: chunk boundaries never depend on the
    * thread count, so results are identical at local[8] and local[32]
    * (the two-cluster-size determinism the soak tests assert).
    */
  private val Chunk = 8192

  final case class Model(centroids: Array[Array[Double]],
                         coarse: Array[Array[Double]] = null,
                         cellOffsets: Array[Int] = null) extends Serializable {
    val k: Int = centroids.length

    private def isTwoLevel: Boolean = coarse != null && coarse.length > 1

    private def bestInRange(v: Array[Double], lo: Int, hi: Int): (Int, Double) = {
      var best = lo
      var bestD = Double.MaxValue
      var c = lo
      while (c < hi) {
        val d = dist2(v, centroids(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      (best, bestD)
    }

    /** The two nearest coarse cells (probing both guards against a
      * point near a coarse boundary whose true centroid sits in the
      * runner-up cell).
      */
    private def coarseTop2(v: Array[Double]): (Int, Int) = {
      var b1 = 0; var d1 = Double.MaxValue
      var b2 = 0; var d2v = Double.MaxValue
      var c = 0
      while (c < coarse.length) {
        val d = dist2(v, coarse(c))
        if (d < d1) { b2 = b1; d2v = d1; b1 = c; d1 = d }
        else if (d < d2v) { b2 = c; d2v = d }
        c += 1
      }
      (b1, b2)
    }

    /** Index of the nearest centroid by squared L2 (input normalized). */
    def predict(v: Array[Double]): Int =
      if (!isTwoLevel) bestInRange(v, 0, centroids.length)._1
      else {
        val (c1, c2) = coarseTop2(v)
        val (i1, e1) = bestInRange(v, cellOffsets(c1), cellOffsets(c1 + 1))
        val (i2, e2) = bestInRange(v, cellOffsets(c2), cellOffsets(c2 + 1))
        if (e2 < e1) i2 else i1
      }

    /** The `p` nearest centroid indices, nearest first — multi-probe
      * blocking: a near-dup pair on a cell boundary still shares a
      * block when each point carries its top-2 cells. Bounded
      * selection (one O(p) insertion per candidate, p is 2-ish), never
      * a k-element sort.
      */
    def predictTop(v: Array[Double], p: Int): Seq[Int] = {
      val pp = math.max(1, p)
      val ids = new Array[Int](pp)
      val ds = Array.fill(pp)(Double.MaxValue)
      var offered = 0
      def offer(c: Int): Unit = {
        offered += 1
        val d = dist2(v, centroids(c))
        if (d < ds(pp - 1)) {
          var i = pp - 1
          while (i > 0 && ds(i - 1) > d) { ds(i) = ds(i - 1); ids(i) = ids(i - 1); i -= 1 }
          ds(i) = d; ids(i) = c
        }
      }
      if (!isTwoLevel) {
        var c = 0
        while (c < centroids.length) { offer(c); c += 1 }
      } else {
        // probe enough coarse cells (each holds ≥ 1 sub-centroid) to
        // surface ≥ p candidates — same bounded-insertion selection
        val q = math.min(coarse.length, math.max(2, pp))
        val cid = new Array[Int](q)
        val cds = Array.fill(q)(Double.MaxValue)
        var c = 0
        while (c < coarse.length) {
          val d = dist2(v, coarse(c))
          if (d < cds(q - 1)) {
            var i = q - 1
            while (i > 0 && cds(i - 1) > d) { cds(i) = cds(i - 1); cid(i) = cid(i - 1); i -= 1 }
            cds(i) = d; cid(i) = c
          }
          c += 1
        }
        var qi = 0
        while (qi < q) {
          var s = cellOffsets(cid(qi))
          val end = cellOffsets(cid(qi) + 1)
          while (s < end) { offer(s); s += 1 }
          qi += 1
        }
      }
      ids.take(math.min(pp, offered)).toSeq
    }
  }

  private def dist2(v: Array[Double], cen: Array[Double]): Double = {
    var d = 0.0
    var j = 0
    val n = math.min(v.length, cen.length)
    while (j < n) { val t = v(j) - cen(j); d += t * t; j += 1 }
    d
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

  /** Parallel per-index precompute over fixed-size chunks. Pure reads
    * only — callers consume the array in index order, so all FP
    * accumulation stays sequential-order-identical.
    */
  private def parTabulate(n: Int)(f: Int => Int): Array[Int] = {
    val out = new Array[Int](n)
    if (n <= Chunk) { var i = 0; while (i < n) { out(i) = f(i); i += 1 } }
    else java.util.stream.IntStream.range(0, (n + Chunk - 1) / Chunk).parallel().forEach { ci =>
      var i = ci * Chunk
      val end = math.min(n, i + Chunk)
      while (i < end) { out(i) = f(i); i += 1 }
    }
    out
  }

  private def parTabulateD(n: Int)(f: Int => Double): Array[Double] = {
    val out = new Array[Double](n)
    if (n <= Chunk) { var i = 0; while (i < n) { out(i) = f(i); i += 1 } }
    else java.util.stream.IntStream.range(0, (n + Chunk - 1) / Chunk).parallel().forEach { ci =>
      var i = ci * Chunk
      val end = math.min(n, i + Chunk)
      while (i < end) { out(i) = f(i); i += 1 }
    }
    out
  }

  /** Seeded k-means++ init (Arthur & Vassilvitskii 2007): first center
    * uniform, each next sampled ∝ squared distance to the nearest
    * chosen center — deterministic for a fixed seed, and far better
    * separated than uniform init on clustered embedding data. The
    * per-center distance pass is chunk-parallel; d2/total update stays
    * in sample order (FP-identical to sequential).
    */
  private def plusPlusInit(samples: Array[Array[Double]], k: Int,
                           rnd: scala.util.Random): Array[Array[Double]] = {
    val centers = new Array[Array[Double]](k)
    centers(0) = samples(rnd.nextInt(samples.length)).clone()
    val d2 = Array.fill(samples.length)(Double.MaxValue)
    var c = 1
    while (c < k) {
      val prev = centers(c - 1)
      val nd = parTabulateD(samples.length)(i => dist2(samples(i), prev))
      var total = 0.0
      var i = 0
      while (i < samples.length) {
        if (nd(i) < d2(i)) d2(i) = nd(i)
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
    * their previous centroid. The O(n·k·dim) assignment is
    * chunk-parallel; centroid sums accumulate in sample order —
    * results bit-identical to the sequential loop at any thread count.
    */
  private def fitFlat(samples: Array[Array[Double]], k: Int, iters: Int, seed: Long): Model = {
    val kEff = math.max(1, math.min(k, samples.length))
    val rnd = new scala.util.Random(seed)
    val dim = samples(0).length
    var centroids = plusPlusInit(samples, kEff, rnd)

    var it = 0
    while (it < iters) {
      val sums = Array.fill(kEff)(new Array[Double](dim))
      val counts = new Array[Long](kEff)
      val m = Model(centroids)
      val assignIdx = parTabulate(samples.length)(i => m.predict(samples(i)))
      var s = 0
      while (s < samples.length) {
        val v = samples(s)
        val c = assignIdx(s)
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

  /** Two-level fit for large k: √k coarse Lloyd, then per-cell sub-fits
    * (k_i ∝ cell mass, ≥ 1, each ≤ FlatKMax) in parallel across driver
    * cores — O(iters · n · √k · dim) total instead of the flat path's
    * O(iters · n · k · dim). Sub-fit seeds derive from (seed, cell), so
    * the result is deterministic and independent of scheduling. An
    * empty coarse cell keeps its coarse centroid as the single
    * sub-centroid (offsets stay well-formed).
    */
  private def fitTwoLevel(samples: Array[Array[Double]], k: Int, iters: Int, seed: Long): Model = {
    val n = samples.length
    val k1 = math.min(math.ceil(math.sqrt(k.toDouble)).toInt, FlatKMax)
    val coarseM = fitFlat(samples, k1, iters, seed)
    val kc = coarseM.k
    val assignIdx = parTabulate(n)(i => coarseM.predict(samples(i)))
    val cells = Array.fill(kc)(new scala.collection.mutable.ArrayBuffer[Int])
    var i = 0
    while (i < n) { cells(assignIdx(i)) += i; i += 1 }
    val subCentroids = new Array[Array[Array[Double]]](kc)
    java.util.stream.IntStream.range(0, kc).parallel().forEach { c =>
      val cell = cells(c)
      subCentroids(c) =
        if (cell.isEmpty) Array(coarseM.centroids(c).clone())
        else {
          val ki = math.min(FlatKMax, math.max(1, ((cell.length.toLong * k) / n).toInt))
          fitFlat(cell.iterator.map(samples(_)).toArray, ki, iters, seed + 1000L * (c + 1)).centroids
        }
    }
    val offsets = new Array[Int](kc + 1)
    i = 0
    while (i < kc) { offsets(i + 1) = offsets(i) + subCentroids(i).length; i += 1 }
    Model(subCentroids.flatten, coarseM.centroids, offsets)
  }

  /** Fit a model: flat Lloyd up to [[FlatKMax]] centroids (results
    * bit-identical to the historical sequential implementation),
    * two-level above it. k caps at the sample count either way.
    */
  def fit(samples: Array[Array[Double]], k: Int, iters: Int = 10, seed: Long = 42): Model = {
    require(samples.nonEmpty, "k-means fit needs at least one sample")
    val kEff = math.max(1, math.min(k, samples.length))
    if (kEff <= FlatKMax) fitFlat(samples, kEff, iters, seed)
    else fitTwoLevel(samples, kEff, iters, seed)
  }
}
