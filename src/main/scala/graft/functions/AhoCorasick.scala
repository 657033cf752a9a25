package graft.functions

import scala.collection.mutable

/** Aho-Corasick multi-pattern matcher — the production form of t24's
  * blocklist tagging (Aho & Corasick 1975, "Efficient String Matching:
  * An Aid to Bibliographic Search"). A regex alternation of N terms
  * costs the regex engine per-position backtracking that grows with N;
  * the automaton matches ALL patterns in one O(|text| + matches) pass
  * whatever the dictionary size — the difference between a 4-term demo
  * list and the 10⁴-10⁶-term blocklists (URL lists, phrase filters)
  * production pipelines run at the scan.
  *
  * Built ONCE driver-side from the pattern list (goto trie + BFS
  * failure links + merged output sets — the textbook construction),
  * then broadcast; per-row matching work and allocation are
  * O(|text| + hits), independent of dictionary size. Serializable so
  * executors receive the finished automaton, never rebuild it.
  *
  * [[matchedPatterns]] applies the \b word-boundary rule at emission
  * (word chars = [A-Za-z0-9_], the Java/RE2 definition): a hit counts
  * only when the characters flanking the matched span are non-word (or
  * text edges) — byte-identical semantics to `\bterm\b` for terms that
  * start and end with word characters, which a blocklist's do.
  * AhoCorasickSpec pins equivalence against the regex spelling on
  * randomized overlapping-pattern corpora.
  */
final class AhoCorasick(val patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty, "empty pattern list")
  require(patterns.forall(_.nonEmpty), "empty pattern")

  // flat trie: per node a Char->node map; fail links; output = pattern
  // indices ending at the node (own + inherited via fail at build time)
  private val goto_ = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
  private val fail = mutable.ArrayBuffer(0)
  private val out = mutable.ArrayBuffer[List[Int]](Nil)

  patterns.zipWithIndex.foreach { case (p, idx) =>
    var node = 0
    p.foreach { c =>
      node = goto_(node).getOrElseUpdate(c, {
        goto_ += mutable.Map.empty[Char, Int]
        fail += 0
        out += Nil
        goto_.size - 1
      })
    }
    out(node) = idx :: out(node)
  }

  // BFS failure links; outputs inherit the fail target's outputs, so a
  // match of a suffix pattern ("he" inside "she") emits without walking
  // the fail chain at scan time
  private val queue = mutable.Queue.empty[Int]
  goto_(0).values.foreach { n => fail(n) = 0; queue += n }
  while (queue.nonEmpty) {
    val r = queue.dequeue()
    goto_(r).foreach { case (c, n) =>
      queue += n
      var f = fail(r)
      while (f != 0 && !goto_(f).contains(c)) f = fail(f)
      fail(n) = goto_(f).get(c).filter(_ != n).getOrElse(0)
      out(n) = out(n) ::: out(fail(n))
    }
  }

  private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Distinct patterns occurring in `text` with \b boundaries on both
    * ends, in pattern-list order. Null-safe (null → empty). Per-row work
    * and allocation are O(|text| + hits) — the hit set accumulates in a
    * small hash set, never a |dictionary|-sized buffer, so a zero-hit
    * row over a 10⁶-term dictionary costs only the text scan.
    */
  def matchedPatterns(text: String): Seq[String] = {
    if (text == null) return Seq.empty
    val hit = mutable.HashSet.empty[Int]
    var node = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (node != 0 && !goto_(node).contains(c)) node = fail(node)
      node = goto_(node).getOrElse(c, 0)
      out(node).foreach { idx =>
        if (!hit.contains(idx)) {
          val start = i - patterns(idx).length + 1
          val okL = start == 0 || !isWord(text.charAt(start - 1))
          val okR = i == text.length - 1 || !isWord(text.charAt(i + 1))
          if (okL && okR) hit += idx
        }
      }
      i += 1
    }
    hit.toSeq.sorted.map(patterns)
  }
}
