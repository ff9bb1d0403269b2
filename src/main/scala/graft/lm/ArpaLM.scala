package graft.lm

import scala.jdk.CollectionConverters._

/** ARPA-format n-gram language model reader + Katz-backoff scorer — the
  * artifact format KenLM (the reference north rule's perplexity model
  * family) exports and consumes. A production run hands the pipeline a
  * trained .arpa; [[graft.lm.NGramLM]] remains the self-contained
  * trainable fallback.
  *
  * Format (public; SRILM/KenLM docs):
  * {{{
  *   \data\
  *   ngram 1=N1
  *   ngram 2=N2
  *   \1-grams:
  *   <log10 prob> <w1> [<log10 backoff>]
  *   \2-grams:
  *   <log10 prob> <w1> <w2> [<log10 backoff>]
  *   \end\
  * }}}
  *
  * Scoring is the standard backoff recursion:
  * p(w | h) = 10^logp(h,w) if the n-gram exists, else
  * 10^backoff(h) * p(w | tail(h)) — unseen histories back off with
  * weight 1.
  */
final class ArpaLM(val order: Int,
                   probs: Map[Seq[String], Double],
                   backoffs: Map[Seq[String], Double],
                   unkLogProb: Double) extends Serializable {

  val Bos = "<s>"
  val Eos = "</s>"
  val Unk = "<unk>"

  /** log10 p(w | history), Katz backoff. */
  def logProb(history: Seq[String], word: String): Double = {
    val h = history.takeRight(order - 1)
    probs.get(h :+ word) match {
      case Some(lp) => lp
      case None if h.isEmpty =>
        probs.getOrElse(Seq(word), probs.getOrElse(Seq(Unk), unkLogProb))
      case None =>
        backoffs.getOrElse(h, 0.0) + logProb(h.tail, word)
    }
  }

  /** Per-word perplexity of whitespace-tokenized text with BOS/EOS, the
    * KenLM convention (BOS conditions but is not predicted).
    */
  def perplexity(text: String): Double = {
    val words = graft.text.PyText.splitWhitespace(graft.text.PyText.lower(text))
    if (words.isEmpty) return Double.PositiveInfinity
    val tokens = words :+ Eos
    var history: Seq[String] = Seq(Bos)
    var logSum = 0.0
    tokens.foreach { w =>
      logSum += logProb(history, w)
      history = (history :+ w).takeRight(order - 1)
    }
    math.pow(10.0, -logSum / tokens.length)
  }
}

object ArpaLM {

  def load(path: String): ArpaLM = {
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path)).asScala
    var order = 0
    var section = 0 // current n in "\n-grams:"
    val probs = Map.newBuilder[Seq[String], Double]
    val backoffs = Map.newBuilder[Seq[String], Double]
    var unk = -7.0
    val sectionRe = """\\(\d+)-grams:""".r
    lines.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty) line match {
        case sectionRe(n) => section = n.toInt; order = math.max(order, section)
        case l if l.startsWith("\\") || l.startsWith("ngram ") => // headers
        case l if section > 0 =>
          val parts = l.split("\\s+")
          // logprob, n words, optional backoff
          if (parts.length >= section + 1) {
            val lp = parts(0).toDouble
            val words = parts.slice(1, 1 + section).toSeq
            probs += (words -> lp)
            if (parts.length > section + 1) backoffs += (words -> parts(section + 1).toDouble)
            if (section == 1 && words.head == "<unk>") unk = lp
          }
        case _ =>
      }
    }
    new ArpaLM(math.max(order, 1), probs.result(), backoffs.result(), unk)
  }

  /** Fixture writer (tests): emit the same layout `load` reads. */
  def write(path: String,
            ngrams: Seq[(Seq[String], Double, Option[Double])]): Unit = {
    val byOrder = ngrams.groupBy(_._1.length).toSeq.sortBy(_._1)
    val sb = new StringBuilder("\\data\\\n")
    byOrder.foreach { case (n, g) => sb.append(s"ngram $n=${g.size}\n") }
    byOrder.foreach { case (n, g) =>
      sb.append(s"\n\\$n-grams:\n")
      g.foreach { case (words, lp, bo) =>
        sb.append(f"$lp%.6f ${words.mkString(" ")}${bo.map(b => f" $b%.6f").getOrElse("")}\n")
      }
    }
    sb.append("\n\\end\\\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }
}
