package graft

import graft.ext.Bpe
import org.apache.spark.sql.functions._

/** BPE trainer: hand-computed merges on the classic corpus (sequential
  * batch=1 AND batched), canonical greedy (non-overlapping) merge
  * application, batched-pass ≡ sequential-application equivalence,
  * determinism. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(text: String) =
    Seq((1L, text, "s")).toDF("doc_id", "text", "source")

  /** Sennrich-style corpus: rich enough that one scan has real taboo
    * skips. Pair counts: (e,s)=(s,t)=(t,_)=9, (w,e)=8, (l,o)=(o,w)=7,
    * (e,w)=(n,e)=6, (w,_)=5, (d,e)=(i,d)=(w,i)=3, (e,r)=(r,_)=2. */
  private def sennrich =
    docs(("low " * 5) + ("lower " * 2) + ("newest " * 6) + ("widest " * 3))

  test("batch=1 (sequential): classic corpus learns (l,o) -> (lo,w) -> (low,_)") {
    // low×5, lower×2, newest×2: pair (l,o)=7 ties (o,w)=7, lhs tiebreak
    val corpus = docs(("low " * 5) + ("lower " * 2) + ("newest " * 2))
    val (merges, _) = Bpe.train(corpus, 3, batch = 1)
    assert(merges.map(m => (m.rnd, m.lhs, m.rhs, m.merged, m.cnt)) == Seq(
      (1, "l", "o", "lo", 7L),
      (2, "lo", "w", "low", 7L),
      (3, "low", "_", "low_", 5L)))
  }

  test("batched selection walks (cnt desc, a, b) with the taboo rule") {
    // one scan, budget 4: (e,s) admitted; (s,t) and (t-chain blockers)
    // skipped via shared symbols; greedy lands on hand-computed picks
    val (merges, _) = Bpe.train(sennrich, 4, batch = 4)
    assert(merges.map(m => (m.rnd, m.lhs, m.rhs, m.merged, m.cnt)) == Seq(
      (1, "e", "s", "es", 9L),
      (2, "t", "_", "t_", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "i", "d", "id", 3L)))
  }

  test("merges chain ACROSS scans; rnd is global merge order") {
    // scan 2 recounts on the rewritten table: (es,t_)=9 chains onto
    // scan 1's outputs, then (lo,w)=7
    val (merges, _) = Bpe.train(sennrich, 6, batch = 4)
    assert(merges.map(m => (m.rnd, m.merged, m.cnt)) == Seq(
      (1, "es", 9L), (2, "t_", 9L), (3, "lo", 7L), (4, "id", 3L),
      (5, "est_", 9L), (6, "low", 7L)))
  }

  test("one batched pass == applying the same merges sequentially in order") {
    // the disjointness rule makes the batch independent: a single
    // multi-rule applyMerges pass must equal one-rule-at-a-time passes
    val rules = Seq(("e", "s"), ("t", "_"), ("l", "o"), ("i", "d"))
    val base = Bpe.initialWords(sennrich).localCheckpoint(true)
    val batched = base.withColumn("l", Bpe.applyMerges(col("l"), rules))
      .select("word", "l").as[(String, Seq[String])].collect().toMap
    val sequential = rules.foldLeft(base) { (df, rule) =>
      df.withColumn("l", Bpe.applyMerges(col("l"), Seq(rule)))
    }.select("word", "l").as[(String, Seq[String])].collect().toMap
    assert(batched == sequential)
  }

  test("greedy merge is non-overlapping left-to-right (aaaa -> aa aa)") {
    val (merges, words) = Bpe.train(docs("aaaa"), 1)
    assert(merges.head.lhs == "a" && merges.head.rhs == "a" && merges.head.cnt == 3L)
    val syms = words.select("l").as[Seq[String]].collect().head
    assert(syms == Seq("aa", "aa", "_"))
  }

  test("batch=1: merged symbols re-pair across rounds (aaaa fully collapses)") {
    // round 2: (aa,aa) and (aa,_) tie at 1; '_' < 'a' so (aa,_) wins
    val (merges, words) = Bpe.train(docs("aaaa"), 3, batch = 1)
    assert(merges.map(_.merged) == Seq("aa", "aa_", "aaaa_"))
    val syms = words.select("l").as[Seq[String]].collect().head
    assert(syms == Seq("aaaa_"))
  }

  test("fixed scan schedule: an under-budget scan is not compensated") {
    // 'aaaa' offers one admissible pair per scan; merges=3 batch=4 is a
    // single scan, so only (a,a) is learned — the documented trade for
    // the ceil(T/B) driver-round bound
    val (merges, _) = Bpe.train(docs("aaaa"), 3, batch = 4)
    assert(merges.map(_.merged) == Seq("aa"))
  }

  test("trainer is deterministic and drains when no pairs remain") {
    val corpus = docs("ab ab")
    // ab -> a b _: merges (a,b), (ab,_) then the single symbol has no pairs
    val (m1, w1) = Bpe.train(corpus, 10)
    val (m2, _) = Bpe.train(corpus, 10)
    assert(m1 == m2)
    assert(m1.map(_.merged) == Seq("ab", "ab_"))
    assert(w1.select("l").as[Seq[String]].collect().head == Seq("ab_"))
  }

  test("batch=1: subword frequencies account for every token occurrence") {
    val corpus = docs(("low " * 5) + ("lower " * 2))
    val freqs = Bpe.subwordFrequencies(corpus, 2, batch = 1)
      .as[(String, Long)].collect().toMap
    // after (l,o) and (lo,w): low -> [low, _], lower -> [low, e, r, _]
    assert(freqs == Map("low" -> 7L, "_" -> 7L, "e" -> 2L, "r" -> 2L))
  }

  test("batched subword frequencies account for every token occurrence") {
    val corpus = docs(("low " * 5) + ("lower " * 2))
    // one scan, budget 2: (l,o)=7 admitted, (o,w)=7 blocked on o,
    // (w,_)=5 admitted -> low = [lo, w_], lower = [lo, w, e, r, _]
    val freqs = Bpe.subwordFrequencies(corpus, 2, batch = 4)
      .as[(String, Long)].collect().toMap
    assert(freqs == Map("lo" -> 7L, "w_" -> 5L, "w" -> 2L,
      "e" -> 2L, "r" -> 2L, "_" -> 2L))
  }

  test("encodeCorpus renders every token's segmentation in order, OOV-safe") {
    // batch=1, 2 merges on low×5 lower×2: (l,o) then (lo,w) — so
    // low = [low, _], lower = [low, e, r, _]
    val corpus = Seq(
      (1L, ("low " * 5) + ("lower " * 2), "s"),
      (2L, "lower low", "s"),
      (3L, "!!! ???", "s") // normalizes to out-of-alphabet tokens only
    ).toDF("doc_id", "text", "source")
    val got = Bpe.encodeCorpus(corpus, 2, batch = 1)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 7L, 18L, ("low _ " * 5) + ("low e r _ " * 2).trim),
      (2L, 2L, 6L, "low e r _ low _"),
      (3L, 0L, 0L, "")))
  }

  test("64-merge batch=8 training: dense numbering, lossless segmentations") {
    // production-shaped invocation (the rounds bound ceil(T/B) is by
    // construction of the scan loop); train on the sf0.001 documents
    // corpus and check the trainer's structural invariants
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (merges, words) = Bpe.train(docs, 64, batch = 8)
    assert(merges.size <= 64)
    assert(merges.size > 32, s"corpus should support >32 merges, got ${merges.size}")
    // global numbering dense from 1; merged symbol always lhs+rhs
    assert(merges.map(_.rnd) == (1 to merges.size))
    assert(merges.forall(m => m.merged == m.lhs + m.rhs))
    // the final segmentation still accounts for every trained word's
    // characters: subword lengths rebuild each word + end marker
    import spark.implicits._
    val bad = words.select(col("word"), col("l")).as[(String, Seq[String])]
      .collect().filterNot { case (w, l) => l.mkString == w + Bpe.EndMark }
    assert(bad.isEmpty, s"segmentations must concatenate back to the word: ${bad.take(3).toSeq}")
  }

  test("fit(corpus).encode(corpus) reproduces encodeCorpus exactly") {
    val corpus = Seq(
      (1L, ("low " * 5) + ("lower " * 2) + ("newest " * 6), "s"),
      (2L, "newest lower low", "s")
    ).toDF("doc_id", "text", "source")
    val direct = Bpe.encodeCorpus(corpus, 6, batch = 4)
      .as[(Long, Long, Long, String)].collect().toSeq
    val model = Bpe.fit(corpus, 6, batch = 4)
    val replayed = model.encode(corpus)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(replayed == direct,
      "schedule replay must reproduce the trained segmentations")
  }

  test("a fitted model encodes UNSEEN words by merge replay (OOV support)") {
    // train on low/lower only: batch=1 merges (l,o), (lo,w)
    val trainCorpus = docs(("low " * 5) + ("lower " * 2))
    val model = Bpe.fit(trainCorpus, 2, batch = 1)
    // 'lowest' never seen: replay (l,o) then (lo,w) -> low e s t _
    // 'löwe' is out-of-alphabet -> excluded from encoding entirely
    val newBatch = Seq((7L, "lowest low löwe", "s")).toDF("doc_id", "text", "source")
    val got = model.encode(newBatch)
      .as[(Long, Long, Long, String)].collect().toSeq
    // lowest -> [low, e, s, t, _] (5) + low -> [low, _] (2) = 7 subwords
    assert(got == Seq((7L, 2L, 7L, "low e s t _ low _")))
  }

  test("non-ascii words are excluded from the training alphabet") {
    val corpus = docs("über über low low")
    val words = Bpe.initialWords(corpus).select("word").as[String].collect().toSeq
    assert(words == Seq("low"))
  }

  test("dispatch keys the PAIR, not the concatenation: (ab,c) must not hit rule (a,bc)") {
    // rules ("a","bc") and the adjacent data pair ("ab","c") share the
    // concatenation "abc"; batch disjointness excludes the two RULES from
    // one batch but cannot exclude the colliding pair from the data — a
    // concat-keyed lookup would merge here, the pair-keyed one must not
    val df = Seq(Tuple1(Seq("ab", "c", "x", "a", "bc"))).toDF("l")
    val got = df.select(Bpe.applyMerges(col("l"), Seq(("a", "bc"))).as("l"))
      .as[Seq[String]].head()
    assert(got == Seq("ab", "c", "x", "abc"))
  }

  test("applyMerges takes a 128-rule batch in one pass (dispatch is batch-size-independent)") {
    // production-shaped batch: the old OR-chain dispatch built a 128-way
    // disjunction per symbol; the hash-set probe must analyze and apply a
    // wide batch with hits resolved exactly like the one-rule-at-a-time
    // reference
    val rules = (0 until 128).map(i => (s"u$i", s"v$i"))
    val syms = (0 until 128).flatMap(i =>
      if (i % 3 == 0) Seq(s"u$i", s"v$i") // hit
      else if (i % 3 == 1) Seq(s"u$i", "z") // lhs without rhs
      else Seq(s"v$i", s"u$i")) // reversed: no hit
    val expected = (0 until 128).flatMap(i =>
      if (i % 3 == 0) Seq(s"u${i}v$i")
      else if (i % 3 == 1) Seq(s"u$i", "z")
      else Seq(s"v$i", s"u$i"))
    val got = Seq(Tuple1(syms)).toDF("l")
      .select(Bpe.applyMerges(col("l"), rules).as("l"))
      .as[Seq[String]].head()
    assert(got == expected)
  }

  test("Model.segment checkpoints long replay chains and still replays exactly") {
    // force the replay chain past SegmentCheckpointEvery groups: batch=1
    // puts every merge in its own replay group, so 20 merges = 20 groups
    // > 16 — the checkpointed segment path must reproduce encodeCorpus
    // (same corpus, same schedule) exactly, and the superseded replay
    // checkpoints must be freed as the chain advances
    val corpus = docs(("low " * 5) + ("lower " * 4) + ("newest " * 6) +
      ("widest " * 3) + ("binding " * 2) + ("finding " * 2))
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val model = Bpe.fit(corpus, 20, batch = 1)
    assert(model.merges.size == 20)
    val direct = Bpe.encodeCorpus(corpus, 20, batch = 1)
      .as[(Long, Long, Long, String)].collect().toSeq
    val replayed = model.encode(corpus).as[(Long, Long, Long, String)].collect().toSeq
    assert(replayed == direct)
    // fit's train loop + segment's chain each keep O(1) generations: at
    // most the final train table and the last segment checkpoint survive
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.size <= 2, s"replay must free superseded checkpoints, found ${leaked.size} live")
  }

  test("fertility report: consistent with the encode output, >= 1, per-lang") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Seq(
      (0L, "banana bandana banana", "aa"),
      (1L, "banana cabana", "aa"),
      (2L, "xylophone quartz", "bb"),
      (3L, "", "cc")) // zero words -> null fertility, still a row
      .toDF("doc_id", "text", "lang")
      .withColumn("source", col("lang"))
    val rep = graft.ext.Bpe.fertilityReport(docs, merges = 4)
      .as[(String, Long, Long, Long, Option[Double])].collect().toSeq
    // direct recomputation from the encode output
    val enc = graft.ext.Bpe.encodeCorpus(docs, 4)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .as[(Long, Long, Long, String, String)] // doc_id, n_tokens, n_subwords, segmented, lang
    val want = enc.collect().groupBy(_._5).map { case (l, rows) =>
      val w = rows.map(_._2).sum; val s = rows.map(_._3).sum
      (l, rows.length.toLong, w, s,
        if (w == 0) None else Some(s.toDouble / w.toDouble))
    }.toSeq.sortBy(_._1)
    assert(rep == want)
    rep.filter(_._5.isDefined).foreach { r =>
      assert(r._5.get >= 1.0, s"fertility of ${r._1} must be >= 1 (pieces >= words)") }
    assert(rep.map(_._1) == Seq("aa", "bb", "cc"))
  }
}
