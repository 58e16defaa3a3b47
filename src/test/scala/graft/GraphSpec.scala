package graft

import graft.ext.Graph
import org.apache.spark.sql.functions._

/** PageRank: edge extraction, mass invariants, symmetry, dangling decay,
  * determinism of the integer-scaled iteration. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("bigramEdges counts adjacent-token pairs across the corpus") {
    val docs = Seq((0L, "a b a b"), (1L, "b a")).toDF("doc_id", "text")
    val got = Graph.bigramEdges(docs)
      .as[(String, String, Long)].collect().toSet
    // doc0: (a,b) (b,a) (a,b); doc1: (b,a)
    assert(got == Set(("a", "b", 2L), ("b", "a", 2L)))
  }

  test("symmetric 2-cycle keeps equal ranks summing to the full mass") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val ranks = Graph.pageRank(edges, iters = 5)
      .as[(String, Long)].collect().toMap
    assert(ranks("a") == ranks("b"))
    // No dangling mass: total stays within integer-division slack of SCALE.
    val total = ranks.values.sum
    assert(math.abs(total - Graph.SCALE) < 100,
      s"mass $total drifted from ${Graph.SCALE}")
  }

  test("a hub fed by two spokes outranks the spokes") {
    val edges = Seq(
      ("s1", "hub", 1L), ("s2", "hub", 1L),
      ("hub", "s1", 1L), ("hub", "s2", 1L)
    ).toDF("src", "dst", "w")
    val ranks = Graph.pageRank(edges, iters = 8)
      .as[(String, Long)].collect().toMap
    assert(ranks("hub") > ranks("s1"))
    assert(ranks("s1") == ranks("s2"), "symmetric spokes must tie exactly")
  }

  test("dangling sink decays toward teleport; result deterministic") {
    val edges = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    val r1 = Graph.pageRank(edges, iters = 5).as[(String, Long)].collect().toSeq
    val r2 = Graph.pageRank(edges, iters = 5).as[(String, Long)].collect().toSeq
    assert(r1 == r2)
    val m = r1.toMap
    // b receives a's damped mass; a only ever holds the teleport share.
    assert(m("b") > m("a"))
    val base = (15L * Graph.SCALE / 100L) / 2L
    assert(m("a") == base, "source with no inbound edges holds exactly the teleport share")
  }

  test("zero iterations returns the uniform initial mass, ordered by rank then node") {
    val edges = Seq(("a", "b", 3L), ("b", "c", 1L), ("c", "a", 2L)).toDF("src", "dst", "w")
    val got = Graph.pageRank(edges, iters = 0).as[(String, Long)].collect().toSeq
    assert(got.map(_._2).toSet == Set(Graph.SCALE / 3))
    assert(got.map(_._1) == Seq("a", "b", "c"), "equal ranks break ties by node")
  }

  test("edge weight shifts rank toward the heavier target") {
    val edges = Seq(
      ("a", "b", 9L), ("a", "c", 1L),
      ("b", "a", 1L), ("c", "a", 1L)
    ).toDF("src", "dst", "w")
    val ranks = Graph.pageRank(edges, iters = 6).as[(String, Long)].collect().toMap
    assert(ranks("b") > ranks("c"))
  }

  test("degree stats: hand-computed profile, zero-fill for one-directional nodes") {
    import spark.implicits._
    val edges = Seq(
      ("a", "b", 3L), ("a", "c", 1L), ("b", "a", 2L)
    ).toDF("src", "dst", "w")
    val got = Graph.degreeStats(edges)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 2L, 4L, 1L, 2L),  // out: b,c (3+1); in: from b (2)
      ("b", 1L, 2L, 1L, 3L),
      ("c", 0L, 0L, 1L, 1L))) // pure sink: out zero-filled
  }

  test("declared corpus query ranks every word and orders by rank") {
    val docs = Seq((0L, "the cat sat on the mat"), (1L, "the dog")).toDF("doc_id", "text")
    val out = Graph.wordPageRank(docs, iters = 3)
    val rows = out.collect()
    val words = Graph.bigramEdges(docs)
      .select(explode(array(col("src"), col("dst"))))
      .distinct().count()
    assert(rows.length == words)
    val ranks = rows.map(_.getLong(1)).toSeq
    assert(ranks == ranks.sorted.reverse)
    // "the" has the most inbound mass in this corpus
    assert(rows.head.getString(0) == "the")
  }
}
