package graft.langid

import org.scalatest.funsuite.AnyFunSuite
import graft.lm.NGramLM
import graft.analysis.TextStats

class ModelsSpec extends AnyFunSuite {

  private val corpus: Seq[(String, String)] = Seq.tabulate(40) { i =>
    val en = Seq("the quick brown fox jumps over the lazy dog",
      "it was the best of times and the worst of times",
      "we have been waiting for this day with great hope",
      "that which does not kill us makes us stronger")
    val fr = Seq("le renard brun rapide saute par dessus le chien paresseux",
      "c était le meilleur des temps et le pire des temps",
      "nous attendons ce jour avec un grand espoir",
      "la vie est belle et le monde est grand")
    val es = Seq("el rápido zorro marrón salta sobre el perro perezoso",
      "era el mejor de los tiempos y el peor de los tiempos",
      "hemos estado esperando este día con gran esperanza",
      "la vida es bella y el mundo es grande")
    i % 3 match {
      case 0 => ("en", en(i % 4))
      case 1 => ("fr", fr(i % 4))
      case 2 => ("es", es(i % 4))
    }
  }

  test("CharNgramLangId: trains deterministically and classifies held-in languages") {
    val m = CharNgramLangId.train(corpus, buckets = 1 << 14)
    val (l1, s1) = m.predict("the fox and the dog have been friends for years")
    assert(l1 == "EN", s"predicted $l1 ($s1)")
    val (l2, _) = m.predict("le chien et le renard sont des amis depuis des années")
    assert(l2 == "FR")
    val (l3, _) = m.predict("el perro y el zorro son amigos desde hace años")
    assert(l3 == "ES")
    assert(s1 >= 0.3, "top-1 probability should clear the reference keep cutoff")
  }

  test("CharNgramLangId: save/load round trip is exact") {
    val m = CharNgramLangId.train(corpus, buckets = 1 << 12)
    val f = java.io.File.createTempFile("lid", ".bin")
    m.save(f.getPath)
    val m2 = CharNgramLangId.load(f.getPath)
    val in = "the best of days are the ones we spend together"
    assert(m.predict(in) == m2.predict(in))
    f.delete()
  }

  test("NGramLM: in-domain text has lower perplexity than shuffled text") {
    val train = corpus.filter(_._1 == "en").map(_._2) ++ Seq(
      "the day was long and the night was longer still",
      "hope is the thing with feathers that perches in the soul")
    val lm = NGramLM.train(train, order = 3)
    val inDomain = lm.perplexity("the best of times and the lazy dog")
    val outDomain = lm.perplexity("zzq qqz wxv jkl mnop qrstu vwxyz abcd")
    assert(inDomain < outDomain, s"in=$inDomain out=$outDomain")
    assert(lm.perplexity("") == Double.PositiveInfinity)
  }

  test("NGramLM: save/load round trip is exact") {
    val lm = NGramLM.train(Seq("a b c a b d a b e"), order = 2)
    val f = java.io.File.createTempFile("nglm", ".bin")
    lm.save(f.getPath)
    val lm2 = NGramLM.load(f.getPath)
    assert(lm.perplexity("a b c") == lm2.perplexity("a b c"))
    f.delete()
  }

  test("heuristic stopword langid") {
    assert(TextStats.heuristicLangId("the cat is in the house and it is warm")._1 == "en")
    assert(TextStats.heuristicLangId("le chat est dans la maison et il est chaud")._1 == "fr")
    assert(TextStats.heuristicLangId("zzz qqq www")._1 == "und")
  }

  test("fingerprint64 and token counts are deterministic") {
    assert(TextStats.fingerprint64("hello world") == TextStats.fingerprint64("hello world"))
    assert(TextStats.fingerprint64("hello world") != TextStats.fingerprint64("hello worlds"))
    assert(TextStats.whitespaceTokenCount("a  b\tc") == 3)
    assert(TextStats.bpeTokenCount("hello world 123!") == 4)
    val k = TextStats.minKWindowHashes("the quick brown fox jumps over the lazy dog", 8, 4)
    assert(k.length == 4)
    assert(k.toSeq == TextStats.minKWindowHashes("the quick brown fox jumps over the lazy dog", 8, 4).toSeq)
  }
}
