package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.filters.{DocCtx, HeuristicFilters => HF}
import graft.text.PyText

/** Property-based invariants (SURVEY.md §5 test plan): filter threshold
  * monotonicity, tokenizer round trips, scrub idempotence, sketch
  * stability — over generated text including unicode whitespace.
  */
class PropertySpec extends AnyFunSuite {

  // scalatestplus bridge isn't on the offline classpath; drive
  // ScalaCheck directly with a fixed seed for reproducibility
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit = holds(Prop.forAll(g) { a => f(a); true })
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    holds(Prop.forAll(g1, g2) { (a, b) => f(a, b); true })
  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f
  private def holds(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(200)
      .withInitialSeed(org.scalacheck.rng.Seed(42L)), prop)
    assert(res.passed, res.status.toString)
  }

  private val word = Gen.oneOf(
    "the", "cat", "sat", "on", "a", "mat", "and", "it", "was", "good",
    "data", "123", "x#y", "...", "word", "CAFÉ", "naïve")
  private val text: Gen[String] = for {
    n <- Gen.choose(0, 60)
    ws <- Gen.listOfN(n, word)
    sep <- Gen.oneOf(" ", "  ", "\n", " \t ")
  } yield ws.mkString(sep)

  test("property: WordCount keep is monotone in the threshold") {
    forAll(text, Gen.choose(0, 30)) { (t, min) =>
      val ctx = new DocCtx(t)
      val score = HF.WordCount(min, 100000).scoreCtx(ctx)
      // loosening the minimum can only keep more
      if (HF.WordCount(min, 100000).keep(score))
        assert(HF.WordCount(math.max(0, min - 1), 100000).keep(score))
    }
  }

  test("property: ratio filters score within [0, 1]") {
    forAll(text) { t =>
      whenever(t.nonEmpty) {
        val ctx = new DocCtx(t)
        for (f <- Seq(HF.NonAlphaNumeric(), HF.Numbers(), HF.WhiteSpace(),
          HF.Parentheses(), HF.Urls(), HF.WordsWithoutAlphabets(0.8))) {
          val s = f.scoreCtx(ctx)
          assert(s >= 0.0 && s <= 1.0, s"${f.name} -> $s for ${t.take(40)}")
        }
      }
    }
  }

  test("property: splitWhitespace never yields empty tokens and rejoins within length") {
    forAll(text) { t =>
      val ws = PyText.splitWhitespace(t)
      assert(ws.forall(_.nonEmpty))
      assert(ws.map(_.length).sum <= t.length)
    }
  }

  test("property: splitLiteral/mkString round trip is identity") {
    forAll(text) { t =>
      assert(PyText.splitLiteral(t, "\n").mkString("\n") == t)
      assert(PyText.splitLiteral(t, " ").mkString(" ") == t)
    }
  }

  test("property: PII scrub is idempotent") {
    forAll(text) { t =>
      val once = graft.scrub.PiiScrub.scrubPii(t)
      assert(graft.scrub.PiiScrub.scrubPii(once) == once)
    }
  }

  test("property: unicode clean is idempotent") {
    forAll(text) { t =>
      val once = graft.scrub.UnicodeClean.clean(t)
      assert(graft.scrub.UnicodeClean.clean(once) == once)
    }
  }

  test("property: simhash of identical text is identical; fingerprints are stable") {
    forAll(text) { t =>
      assert(graft.dedup.SimHash.simhash64(t) == graft.dedup.SimHash.simhash64(t))
      assert(graft.analysis.TextStats.fingerprint64(t) ==
        graft.analysis.TextStats.fingerprint64(t))
    }
  }

  test("property: minhash estimated similarity of a text with itself is 1") {
    val p = graft.dedup.MinHashLSH.Params()
    val (a, b) = graft.dedup.MinHashLSH.coefficients(p)
    forAll(text) { t =>
      whenever(t.length >= 1) {
        val s1 = graft.dedup.MinHashLSH.signature(t, p, a, b)
        val s2 = graft.dedup.MinHashLSH.signature(t, p, a, b)
        assert(s1.sameElements(s2))
      }
    }
  }

  test("property: cascade verdict is deterministic and scores stop at first reject") {
    forAll(text) { t =>
      val v1 = graft.filters.Cascade.evaluate(HF.englishCascade, t)
      val v2 = graft.filters.Cascade.evaluate(HF.englishCascade, t)
      assert(v1.keep == v2.keep && v1.firstReject == v2.firstReject)
      if (!v1.keep) {
        val idx = HF.englishCascade.indexWhere(_.name == v1.firstReject)
        assert(idx >= 0)
        // nothing after the rejecting filter was evaluated
        assert(v1.scores.drop(idx + 1).forall(_.isNaN))
        assert(!v1.scores(idx).isNaN)
      }
    }
  }
}
