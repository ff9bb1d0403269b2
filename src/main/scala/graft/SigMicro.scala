package graft

import graft.dedup.MinHashLSH
import java.util.concurrent.{Executors, TimeUnit}

/** Spark-free microbench of the raw MinHash signature function at a
  * chosen thread count — separates the function's own memory-contention
  * scaling from Spark task/row overheads when diagnosing the fuzzy
  * soak's 8->32-core efficiency. Synthetic docs mirror the soak corpus
  * shape (~2 KB, word-ish tokens).
  */
object SigMicro {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val docsPerThread = if (args.length > 1) args(1).toInt else 2000
    // perms arg: 260 (default) = full signature; 1 isolates the
    // shingle-collection phase (perm loop ~free) for scaling diagnosis.
    val p =
      if (args.length > 2) MinHashLSH.Params(numBands = args(2).toInt, rowsPerBand = 1)
      else MinHashLSH.Params()
    val (a, b) = MinHashLSH.coefficients(p)
    // deterministic ~2KB docs
    def doc(seed: Long): String = {
      val rng = new java.util.Random(seed)
      val sb = new StringBuilder(2100)
      while (sb.length < 2000) { sb.append("w").append(rng.nextInt(50000)).append(' ') }
      sb.toString
    }
    // Pre-generate per-thread doc sets OUTSIDE the timed region so the
    // measurement is the signature function alone.
    val docs: Array[Array[String]] = Array.tabulate(threads) { tid =>
      Array.tabulate(docsPerThread)(i => doc(tid * 100000L + i))
    }
    val pool = Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    var acc = 0L
    val futs = (0 until threads).map { tid =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          var s = 0L
          var i = 0
          val mine = docs(tid)
          while (i < docsPerThread) {
            val sig = MinHashLSH.signature(mine(i), p, a, b)
            s ^= sig(0)
            i += 1
          }
          s
        }
      })
    }
    futs.foreach(f => acc ^= f.get())
    pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
    val wall = (System.nanoTime() - t0) / 1e9
    val total = threads.toLong * docsPerThread
    println(f"threads=$threads docs=$total wall=$wall%.2f s docs_per_s=${total / wall}%.0f (acc=$acc)")
  }
}
