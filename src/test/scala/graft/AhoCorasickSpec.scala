package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AhoCorasick

/** The automaton must reproduce the \b-regex definition exactly — that
  * equivalence is what lets t31's oracle replay each term as an
  * independent regex existence test.
  */
class AhoCorasickSpec extends AnyFunSuite {

  private def regexMatched(patterns: Seq[String], text: String): Seq[String] =
    patterns.filter(p =>
      java.util.regex.Pattern.compile(
        "\\b" + java.util.regex.Pattern.quote(p) + "\\b")
        .matcher(text).find())

  test("textbook overlap set: he/she/his/hers") {
    val ac = new AhoCorasick(Seq("he", "she", "his", "hers"))
    // "ushers" contains she/he/hers as substrings but NONE with word
    // boundaries; "hers is his" hits hers + his with boundaries
    assert(ac.matchedPatterns("ushers").isEmpty)
    // pattern-list order: his before hers; "he" inside "hers" fails \b
    assert(ac.matchedPatterns("hers is his") == Seq("his", "hers"))
    assert(ac.matchedPatterns("she said he did") == Seq("he", "she"))
    // suffix-pattern emission via fail-link outputs: "she" must ALSO
    // try "he", but "he" inside "she" fails the left boundary
    assert(ac.matchedPatterns("she") == Seq("she"))
  }

  test("boundaries at text edges, phrases across spaces, null safety") {
    val ac = new AhoCorasick(Seq("key order", "order", "key"))
    assert(ac.matchedPatterns("key order") == Seq("key order", "order", "key"))
    assert(ac.matchedPatterns("keyorder").isEmpty)
    assert(ac.matchedPatterns("a key ordering") == Seq("key"))
    assert(ac.matchedPatterns(null).isEmpty)
    assert(ac.matchedPatterns("").isEmpty)
  }

  test("first occurrence boundary-blocked, later one counts") {
    val ac = new AhoCorasick(Seq("ab"))
    // "xab" blocks the left boundary; the later standalone "ab" must
    // still register (the per-pattern hit latch re-checks)
    assert(ac.matchedPatterns("xab ab") == Seq("ab"))
  }

  test("randomized equivalence vs the regex definition") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc _"
    // patterns drawn from a tiny alphabet so overlaps/nesting are dense
    val patterns = (1 to 30).map { _ =>
      val len = 1 + rnd.nextInt(4)
      (0 until len).map(_ => alphabet.charAt(rnd.nextInt(3))).mkString
    }.distinct.filter(_.nonEmpty)
    val ac = new AhoCorasick(patterns)
    for (_ <- 1 to 300) {
      val text = (0 until rnd.nextInt(40))
        .map(_ => alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
      val got = ac.matchedPatterns(text).toSet
      val want = regexMatched(patterns, text).toSet
      assert(got == want, s"text '$text': automaton $got vs regex $want")
    }
  }

  test("dictionary size does not change per-text cost shape (smoke)") {
    // not a benchmark — just pins that a 5000-term dictionary builds and
    // scans without pathological behavior (the regex alternation
    // equivalent at this size is already painful to compile)
    val big = (0 until 5000).map(i => f"term$i%04d")
    val ac = new AhoCorasick(big ++ Seq("needle"))
    val text = ("lorem ipsum " * 200) + "needle " + ("dolor sit " * 200)
    assert(ac.matchedPatterns(text) == Seq("needle"))
  }
}
