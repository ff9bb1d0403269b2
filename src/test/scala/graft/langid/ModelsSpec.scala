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

  test("FastTextBin: write/read round trip preserves args, vocab and matrices") {
    import FastTextBin._
    val args = Args(dim = 4, ws = 5, epoch = 5, minCount = 1, neg = 5, wordNgrams = 2,
      loss = 3, model = 3, bucket = 100, minn = 0, maxn = 0, lrUpdateRate = 100, t = 1e-4)
    val vocab = Array(
      Entry("the", 10, 0), Entry("chien", 7, 0), Entry("dog", 6, 0), Entry("</s>", 5, 0),
      Entry("__label__en", 8, 1), Entry("__label__fr", 9, 1))
    val rng = new java.util.Random(7)
    val input = Array.fill(vocab.count(_.entryType == 0) + args.bucket, args.dim)(rng.nextFloat() - 0.5f)
    val output = Array.fill(2, args.dim)(rng.nextFloat() - 0.5f)
    val f = java.io.File.createTempFile("ftmodel", ".bin")
    write(f.getPath, args, vocab, input, output)
    val m = read(f.getPath)
    assert(m.args == args)
    assert(m.vocab.toSeq == vocab.toSeq)
    assert(m.nwords == 4 && m.labels.toSeq == Seq("__label__en", "__label__fr"))
    assert(m.input.flatten.toSeq == input.flatten.toSeq)
    assert(m.output.flatten.toSeq == output.flatten.toSeq)
    f.delete()
  }

  test("FastTextBin: predict = softmax(output · mean(input rows)) incl. word-ngram buckets") {
    import FastTextBin._
    val args = Args(dim = 2, ws = 5, epoch = 5, minCount = 1, neg = 5, wordNgrams = 2,
      loss = 3, model = 3, bucket = 50, minn = 0, maxn = 0, lrUpdateRate = 100, t = 1e-4)
    val vocab = Array(Entry("good", 4, 0), Entry("bad", 4, 0), Entry("</s>", 2, 0),
      Entry("__label__pos", 3, 1), Entry("__label__neg", 3, 1))
    val input = Array.tabulate(3 + args.bucket, 2)((r, c) => ((r * 2 + c) % 7 - 3) * 0.1f)
    val output = Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    val f = java.io.File.createTempFile("ftmodel2", ".bin")
    write(f.getPath, args, vocab, input, output)
    val m = read(f.getPath)
    // manual reference: ids = [good, </s>, bigram buckets(good+</s>)]
    val ids = m.lineIds("good")
    assert(ids.take(2) == Seq(0, 2), s"ids=$ids")
    assert(ids.length == 3, "one word-bigram bucket expected") // (good,</s>)
    val h = m.sentenceVector("good")
    val exp0 = math.exp(h(0)); val exp1 = math.exp(h(1))
    val pExpected = math.max(exp0, exp1) / (exp0 + exp1)
    val (_, p) = m.predict("good")
    assert(math.abs(p - pExpected) < 1e-9)
    // OOV-only input still predicts (EOS + ngram buckets carry signal)
    assert(m.predict("unseen tokens here")._2 > 0.0)
    f.delete()
  }

  test("FastTextBin: subword buckets match the UTF-8 boundary walk (minn/maxn set)") {
    import FastTextBin._
    val args = Args(dim = 2, ws = 5, epoch = 5, minCount = 1, neg = 5, wordNgrams = 1,
      loss = 3, model = 3, bucket = 1000, minn = 2, maxn = 3, lrUpdateRate = 100, t = 1e-4)
    val vocab = Array(Entry("</s>", 2, 0), Entry("__label__x", 1, 1))
    val input = Array.fill(1 + args.bucket, 2)(0.01f)
    val output = Array(Array(1.0f, 1.0f))
    val f = java.io.File.createTempFile("ftmodel3", ".bin")
    write(f.getPath, args, vocab, input, output)
    val m = read(f.getPath)
    // "ab" -> <ab> : ngrams of len 2..3 skipping the 1-char boundary cases:
    // <a, <ab, ab, ab>, b> — all length>=2 windows of "<ab>"
    val subs = m.subwordIds("ab")
    assert(subs.length == 5, s"got ${subs.length}")
    assert(subs.forall(id => id >= 1 && id < 1 + args.bucket))
    // multibyte char counts as ONE char in the n-gram walk
    val subsCafe = m.subwordIds("é")   // <é> : <é, <é>, é> (len-2,3 windows)
    assert(subsCafe.length == 3, s"got ${subsCafe.length}")
    // EOS never expands to subwords (Dictionary::initNgrams skips it):
    // a line of only-OOV words appends EOS -> exactly one id (the EOS
    // word row), no '<</s>>' char-ngram buckets
    assert(m.lineIds("") == Seq(0))
    f.delete()
  }

  test("ArpaLM: loads the KenLM export format and scores with Katz backoff") {
    import graft.lm.ArpaLM
    val f = java.io.File.createTempFile("arpa_lm", ".arpa").getPath
    // hand-built bigram model over {the, cat, sat}
    ArpaLM.write(f, Seq(
      (Seq("<s>"), -99.0, Some(-0.30103)),       // bos: backoff 10^-0.30103 = 0.5
      (Seq("</s>"), -0.60206, None),              // 0.25
      (Seq("<unk>"), -2.0, None),
      (Seq("the"), -0.60206, Some(-0.30103)),     // 0.25, backoff 0.5
      (Seq("cat"), -0.60206, Some(0.0)),
      (Seq("sat"), -0.60206, Some(0.0)),
      (Seq("<s>", "the"), -0.30103, None),        // p(the|<s>) = 0.5
      (Seq("the", "cat"), -0.30103, None)))       // p(cat|the) = 0.5
    val lm = ArpaLM.load(f)
    assert(lm.order == 2)
    // exact: p(the|<s>)=0.5 direct; p(cat|the)=0.5 direct;
    // p(sat|cat): no bigram -> backoff(cat)=10^0=1 * p(sat)=0.25;
    // p(</s>|sat): backoff(sat)=1 * 0.25
    val expected = math.pow(10.0,
      -(math.log10(0.5) + math.log10(0.5) + math.log10(0.25) + math.log10(0.25)) / 4)
    val got = lm.perplexity("the cat sat")
    assert(math.abs(got - expected) < 1e-6, s"got $got expected $expected")
    // OOV words hit <unk>
    assert(lm.perplexity("zzz") > lm.perplexity("the cat sat"))
    // in-domain beats shuffled
    assert(lm.perplexity("the cat sat") < lm.perplexity("sat the cat"))
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
