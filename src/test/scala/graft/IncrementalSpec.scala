package graft

import graft.ext.Incremental
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered incremental ingest: the filter routes rows between
  * the no-join fast path and the verify join but must never change the
  * answer — including under a deliberately undersized (high-fpp) bloom. */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus: DataFrame = Seq(
    (0L, "alpha beta gamma", "s0"),
    (1L, "delta epsilon zeta", "s1"),
    (2L, "eta theta iota", "s2")
  ).toDF("doc_id", "text", "source")

  private lazy val incoming: DataFrame = Seq(
    (10L, "alpha beta gamma", "s3"),   // dup of 0
    (11L, "kappa lambda mu", "s4"),    // new
    (12L, "eta theta iota", "s5"),     // dup of 2
    (13L, "nu xi omicron", "s6")       // new
  ).toDF("doc_id", "text", "source")

  test("newDocuments drops exact duplicates, keeps novel docs") {
    val got = Incremental.newDocuments(corpus, incoming)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(11L, 13L))
  }

  test("result is exact even with a pathologically undersized bloom") {
    // 1 expected item / 50% fpp: nearly everything becomes a candidate,
    // but the verify join keeps the answer identical
    val got = Incremental.newDocuments(corpus, incoming,
        expectedItems = 1L, fpp = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(11L, 13L))
  }

  test("bloom candidates include every true duplicate (no false negatives)") {
    val cands = Incremental.bloomCandidates(corpus, incoming)
      .select("doc_id").as[Long].collect().toSet
    assert(Set(10L, 12L).subsetOf(cands))
    // with a well-sized bloom the pruning is real: novel rows mostly
    // skip the join (fpp 1% on 4 rows -> expect no false positives)
    assert(cands == Set(10L, 12L))
  }

  test("empty corpus: every incoming doc is new; empty batch: empty result") {
    val emptyCorpus = corpus.limit(0)
    val allNew = Incremental.newDocuments(emptyCorpus, incoming)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(allNew == Seq(10L, 11L, 12L, 13L))
    assert(Incremental.newDocuments(corpus, incoming.limit(0)).count() == 0L)
    assert(Incremental.corpusBloom(emptyCorpus).isEmpty)
  }

  test("mergeCounts folds batch totals into existing totals") {
    val existing = Seq(("a", 2L), ("b", 1L)).toDF("word", "cnt")
    val batch = Seq(("b", 3L), ("c", 4L)).toDF("word", "cnt")
    val got = Incremental.mergeCounts(existing, batch)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 2L), ("b", 4L), ("c", 4L)))
    // empty batch is the identity
    val same = Incremental.mergeCounts(existing, batch.limit(0))
      .as[(String, Long)].collect().toSeq
    assert(same == Seq(("a", 2L), ("b", 1L)))
  }

  test("bloom path agrees with the plain anti-join on the test corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val corp = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val bloomed = Incremental.newDocuments(corp, batch)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val exact = batch.join(corp.select("text"), Seq("text"), "left_anti")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(bloomed == exact)
    assert(bloomed.nonEmpty && bloomed.size < batch.count())
  }

  test("cdc apply: latest-wins upsert, delete, re-insert, fresh insert, passthrough") {
    val changes = Seq(
      // doc 0: edited at seq 1, edited again at seq 2 -> seq 2 wins
      (0L, 1L, "upsert", "zero v1", "s0"),
      (0L, 2L, "upsert", "zero v2", "s0"),
      // doc 1: deleted
      (1L, 1L, "delete", null.asInstanceOf[String], null.asInstanceOf[String]),
      // doc 2: deleted then re-inserted at a later seq
      (2L, 1L, "delete", null.asInstanceOf[String], null.asInstanceOf[String]),
      (2L, 2L, "upsert", "two is back", "s2"),
      // doc 99: upsert of an id absent from the base = insert
      (99L, 1L, "upsert", "fresh", "s9")
    ).toDF("doc_id", "seq", "op", "text", "source")
    val got = Incremental.applyChanges(corpus, changes, Seq("text", "source"))
      .as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (0L, "zero v2", "s0"),
      (2L, "two is back", "s2"),
      (99L, "fresh", "s9")))
    // note: doc 1 gone, doc 0 took the HIGHER seq, doc 2 re-inserted;
    // and the only base row without changes passes through untouched:
    val withPassthrough = Incremental.applyChanges(
      corpus, changes.filter(col("doc_id") =!= 1L), Seq("text", "source"))
      .as[(Long, String, String)].collect().toSet
    assert(withPassthrough.contains((1L, "delta epsilon zeta", "s1")))
  }

  test("cdc apply: empty change log is identity; result is repartition-invariant") {
    val empty = Seq.empty[(Long, Long, String, String, String)]
      .toDF("doc_id", "seq", "op", "text", "source")
    val id = Incremental.applyChanges(corpus, empty, Seq("text", "source"))
      .as[(Long, String, String)].collect().toSet
    assert(id == corpus.as[(Long, String, String)].collect().toSet)
    val changes = Seq(
      (0L, 1L, "upsert", "zero v1", "s0"),
      (1L, 1L, "delete", null.asInstanceOf[String], null.asInstanceOf[String]),
      (7L, 3L, "upsert", "seven", "s7")
    ).toDF("doc_id", "seq", "op", "text", "source")
    val a = Incremental.applyChanges(corpus, changes, Seq("text", "source"))
      .as[(Long, String, String)].collect().toSet
    val b = Incremental.applyChanges(
      corpus.repartition(7), changes.repartition(5), Seq("text", "source"))
      .as[(Long, String, String)].collect().toSet
    assert(a == b)
    // applying the same log twice is idempotent (upserts are absolute,
    // not deltas): apply(apply(base)) == apply(base)
    val once = Incremental.applyChanges(corpus, changes, Seq("text", "source"))
    val twice = Incremental.applyChanges(once, changes, Seq("text", "source"))
      .as[(Long, String, String)].collect().toSet
    assert(twice == a)
  }

  test("cdc apply: malformed op value fails loudly instead of corrupting the base") {
    val bad = Seq(
      (0L, 1L, "update", "zero v1", "s0") // 'update' is not a legal op
    ).toDF("doc_id", "seq", "op", "text", "source")
    val e = intercept[Exception] {
      Incremental.applyChanges(corpus, bad, Seq("text", "source")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m =>
      m.contains("illegal op value 'update'") || m.contains("RAISE_ERROR")))
    val nullOp = Seq(
      (0L, 1L, null.asInstanceOf[String], "zero v1", "s0")
    ).toDF("doc_id", "seq", "op", "text", "source")
    intercept[Exception] {
      Incremental.applyChanges(corpus, nullOp, Seq("text", "source")).collect()
    }
  }

  test("snapshot diff classifies added/removed/changed/unchanged correctly") {
    val oldV = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newV = Seq((2L, "b"), (3L, "C!"), (4L, "d")).toDF("doc_id", "text")
    val got = Incremental.snapshotDiff(oldV, newV)
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "removed"), (2L, "unchanged"), (3L, "changed"), (4L, "added")))
  }

  test("scd2 history: hand-computed runs for edit, create+delete, late-edit, stable") {
    // doc 1: edited at v3         -> [1,2] old, [3,3] current
    // doc 2: created v2, gone v3  -> [2,2] never current
    // doc 3: edited at v2         -> [1,1] old, [2,3] current
    // doc 4: never changes        -> [1,3] current
    val versions = Seq(
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"),
      (2L, 2L, "x"),
      (3L, 1L, "p"), (3L, 2L, "q"), (3L, 3L, "q"),
      (4L, 1L, "s"), (4L, 2L, "s"), (4L, 3L, "s"),
      // doc 5: deleted at v2, re-added UNCHANGED at v3 — the gap must
      // split the runs; one spanning interval would resurrect it at v2
      (5L, 1L, "z"), (5L, 3L, "z")
    ).toDF("doc_id", "version", "text")
    val got = Incremental.scdHistory(versions)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 2L, false), (1L, 3L, 3L, true),
      (2L, 2L, 2L, false),
      (3L, 1L, 1L, false), (3L, 2L, 3L, true),
      (4L, 1L, 3L, true),
      (5L, 1L, 1L, false), (5L, 3L, 3L, true)))
    // reconstruction property: "corpus as of version k" row counts match
    // the snapshot sizes the history was built from
    (1L to 3L).foreach { k =>
      val asOf = got.count(r => r._2 <= k && k <= r._3)
      val direct = versions.filter(col("version") === k).count()
      assert(asOf == direct, s"as-of $k")
    }
    // strong form via the callable reconstruction: full (id, text) set
    // equality with each directly-built snapshot, every version
    (1L to 3L).foreach { k =>
      val rebuilt = Incremental.corpusAsOf(versions, k)
        .as[(Long, String)].collect().toSet
      val direct = versions.filter(col("version") === k)
        .select("doc_id", "text").as[(Long, String)].collect().toSet
      assert(rebuilt == direct, s"corpusAsOf($k) != direct snapshot")
    }
  }

  /** The CDC batch that transforms snapshot k into snapshot k+1:
    * deletes for vanished ids, upserts for new/changed ids, plus a
    * hash-equal no-op upsert for every UNCHANGED id — the worst case
    * for the same-content extension path. */
  private def changesBetween(versions: org.apache.spark.sql.DataFrame,
                             from: Long, to: Long): org.apache.spark.sql.DataFrame = {
    val o = versions.filter(col("version") === from).select(col("doc_id"), col("text").as("__old"))
    val n = versions.filter(col("version") === to).select(col("doc_id"), col("text").as("__new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), lit(1L).as("seq"),
        when(col("__new").isNull, "delete").otherwise("upsert").as("op"),
        col("__new").as("text"))
  }

  test("extendHistory: per-step CDC fold equals the full snapshot recompute") {
    val versions = Seq(
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"),
      (2L, 2L, "x"),
      (3L, 1L, "p"), (3L, 2L, "q"), (3L, 3L, "q"),
      (4L, 1L, "s"), (4L, 2L, "s"), (4L, 3L, "s"),
      (5L, 1L, "z"), (5L, 3L, "z") // delete + identical re-insert: new run
    ).toDF("doc_id", "version", "text")
    def hist(upTo: Long) =
      Incremental.scdHistoryHashed(versions.filter(col("version") <= upTo))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Boolean, Long, Long)].collect().toSeq
    // step 1→2 and 2→3: fold the derived change log, compare to recompute
    for (k <- Seq(1L, 2L)) {
      val extended = Incremental.extendHistory(hist(k), changesBetween(versions, k, k + 1), k + 1)
      assert(rows(extended) == rows(hist(k + 1)), s"extend $k -> ${k + 1}")
    }
    // empty batch: every current run carries forward one version — equal
    // to recomputing with the last snapshot duplicated as version 4
    val dup4 = versions.unionByName(
      versions.filter(col("version") === 3L)
        .select(col("doc_id"), lit(4L).as("version"), col("text")))
    val emptyChanges = versions.filter(lit(false))
      .select(col("doc_id"), col("version").as("seq"), lit("upsert").as("op"), col("text"))
    assert(rows(Incremental.extendHistory(hist(3L), emptyChanges, 4L))
      == rows(Incremental.scdHistoryHashed(dup4)), "empty-batch extension")
    // idempotence of content: re-applying the SAME batch at the next
    // version only extends runs (hash-equal upserts / deletes of absent
    // ids are no-ops) — no spurious new runs appear
    val again = Incremental.extendHistory(
      Incremental.extendHistory(hist(2L), changesBetween(versions, 2L, 3L), 3L),
      changesBetween(versions, 2L, 3L), 4L)
    assert(rows(again) == rows(Incremental.scdHistoryHashed(dup4)),
      "same batch re-applied must only extend, never fork runs")
    // guard: extending into the recorded past fails loudly
    val ex = intercept[Exception] {
      Incremental.extendHistory(hist(3L), changesBetween(versions, 2L, 3L), 3L)
        .collect()
    }
    assert(ex.getMessage.contains("extendHistory"), ex.getMessage)
    // malformed op fails loudly (same contract as applyChanges)
    val bad = Seq((1L, 1L, "update", "t")).toDF("doc_id", "seq", "op", "text")
    val ex2 = intercept[Exception] { Incremental.extendHistory(hist(3L), bad, 4L).collect() }
    assert(ex2.getMessage.contains("illegal op"), ex2.getMessage)
  }

  test("maintainAggregate: delta-maintained view == full recompute, incl. group moves") {
    val base = Seq(
      (0L, "aaaa", "s0"), (1L, "bb", "s0"), (2L, "ccc", "s1"), (3L, "dd", "s2"))
      .toDF("doc_id", "text", "source")
    val changes = Seq(
      (0L, 1L, "upsert", "aaaaaa", "s0"),  // grow in place
      (2L, 1L, "upsert", "ccc", "s0"),     // MOVE s1 -> s0, same text
      (3L, 1L, "delete", null, null),      // s2 empties -> group drops
      (9L, 1L, "upsert", "zzzzz", "s9"),   // fresh insert, new group
      (9L, 2L, "upsert", "zz", "s9"),      // latest seq wins
      (7L, 1L, "delete", null, null)       // delete of an absent id: no-op
    ).toDF("doc_id", "seq", "op", "text", "source")
      .select(col("doc_id"), col("seq"), col("op"),
        col("text").cast("string"), col("source").cast("string"))
    val got = Incremental.maintainAggregate(base, Incremental.charAggregate(base), changes)
      .as[(String, Long, Long)].collect().toSeq
    // full recompute over the merged table must agree exactly
    val merged = Incremental.applyChanges(base, changes, Seq("text", "source"))
    val want = Incremental.charAggregate(merged).orderBy("source")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == want)
    assert(got == Seq(("s0", 3L, 11L), ("s9", 1L, 2L)), got.toString)
    // empty change batch: the view is returned unchanged
    val none = changes.limit(0)
    val same = Incremental.maintainAggregate(base, Incremental.charAggregate(base), none)
      .as[(String, Long, Long)].collect().toSeq
    assert(same == Incremental.charAggregate(base).orderBy("source")
      .as[(String, Long, Long)].collect().toSeq)
  }
}
