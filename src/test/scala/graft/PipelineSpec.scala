package graft

import graft.ext.TrainingPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, row_number}

/** End-to-end corpus-cleaning composite: stage accounting must be
  * internally consistent and the planted junk/dup docs must fall out. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over the lazy dog while the cat watches the birds fly south"

  private lazy val corpus: DataFrame = Seq(
    (0L, good, "en", "s0"),
    (1L, good, "en", "s1"), // exact dup of 0
    (2L, good.replace("lazy", "sleepy"), "en", "s2"), // near dup of 0
    (3L, "short junk", "en", "s3"), // fails quality gate (n_tokens < 10)
    (4L, "completely different content about catalyst optimizer rules and the " +
      "code generation of large scale engines", "en", "s4")
  ).toDF("doc_id", "text", "lang", "source")

  test("cleanCorpus keeps one representative per cluster, drops junk") {
    val kept = TrainingPipeline.cleanCorpus(corpus, nearDupThreshold = 0.5)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(0L, 4L))
  }

  test("cleanCorpusAudit attributes each drop to its first gate") {
    val audit = TrainingPipeline.cleanCorpusAudit(corpus, nearDupThreshold = 0.5)
      .as[(Long, String, Option[Long])].collect().toSeq
    assert(audit == Seq(
      (0L, "kept", Some(0L)),
      (1L, "exact_dup", Some(0L)),
      (2L, "near_dup", Some(0L)),
      (3L, "quality", None),
      (4L, "kept", Some(4L))))
    // the audit's kept set IS the clean run's output, and every kept_id
    // points at a retained document
    val kept = TrainingPipeline.cleanCorpus(corpus, nearDupThreshold = 0.5)
      .select("doc_id").as[Long].collect().toSeq
    assert(audit.filter(_._2 == "kept").map(_._1) == kept)
    val keptSet = kept.toSet
    assert(audit.flatMap(_._3).forall(keptSet))
  }

  test("cluster split: near-dups share a split, singletons match the plain split") {
    // the leakage guard itself: docs 0/1/2 are one near-dup cluster and
    // MUST land in the same split regardless of their own id hashes;
    // singleton clusters (3, 4) hash their own id, so they must agree
    // with the per-document assignSplits they generalize
    val s = TrainingPipeline.assignSplitsByCluster(corpus, nearDupThreshold = 0.5)
      .as[(Long, Long, Long, String)].collect().toSeq
    val byId = s.map(r => r._1 -> r).toMap
    assert(s.map(_._1).sorted == Seq(0L, 1L, 2L, 3L, 4L))
    assert(Seq(0L, 1L, 2L).map(byId(_)._2).distinct == Seq(0L)) // one cluster, min-id label
    assert(Seq(0L, 1L, 2L).map(byId(_)._4).distinct.size == 1)  // one split
    val plain = TrainingPipeline.assignSplits(corpus)
      .as[(Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    Seq(3L, 4L).foreach { id => assert(byId(id)._4 == plain(id)) }
    // every cluster maps to exactly one split on the bigger fixture too
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val big = TrainingPipeline.assignSplitsByCluster(docs, nearDupThreshold = 0.3,
        baseHash = graft.ext.Dedup.polyHash)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(big.groupBy(_._2).values.forall(_.map(_._4).distinct.size == 1))
    assert(big.exists(r => r._2 != r._1), "fixture must have at least one real cluster")
  }

  test("embedding-cluster split: every semantic cluster maps to exactly one split") {
    // the paraphrase-leakage guard: members of an embedding-cosine
    // near-dup cluster share a split, and the fixture has real clusters
    // at this threshold (same regime as dedup_embedding)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") < 500)
    val s = TrainingPipeline.assignSplitsByEmbeddingCluster(emb, threshold = 0.4)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(s.size == 500)
    assert(s.groupBy(_._2).values.forall(_.map(_._4).distinct.size == 1))
    assert(s.exists(r => r._2 != r._1), "fixture must have at least one real cluster")
    // cluster labels must agree with the clustering operator itself
    val labels = graft.ext.Dedup.embeddingNearDupClusters(emb, 0.4)
      .as[(Long, Long)].collect().toMap
    assert(s.forall(r => labels(r._1) == r._2))
  }

  test("char-ngram language id agrees with lexicon id on markered text") {
    val df = Seq(
      (1L, "the cat is a friend of the dog and the bird", "s"),
      (2L, "der hund ist nicht das problem und die katze", "s")
    ).toDF("doc_id", "text", "source")
    val lex = graft.ext.TextStats.languageId(df)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    val ngram = graft.ext.TextStats.languageIdNgram(df)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(lex(1L) == "en" && lex(2L) == "de")
    assert(ngram(1L) == "en" && ngram(2L) == "de")
  }

  test("document encoding round-trips through the vocabulary") {
    val df = Seq((1L, "b a c a b a", "s")).toDF("doc_id", "text", "source")
    // freq ranks: a(3)->0, b(2)->1, c(1)->2
    val ids = graft.ext.TextStats.encodeDocuments(df)
      .select("token_ids").as[Seq[Long]].head()
    assert(ids == Seq(1L, 0L, 2L, 0L, 1L, 0L))
    // truncation maps OOV to -1
    val truncated = graft.ext.TextStats.encodeDocuments(df, maxSize = 2)
      .select("token_ids").as[Seq[Long]].head()
    assert(truncated == Seq(1L, 0L, -1L, 0L, 1L, 0L))
    // empty-tokenizing docs are kept with an empty sequence, not dropped
    val withEmpty = Seq((1L, "a b", "s"), (2L, "   ", "s")).toDF("doc_id", "text", "source")
    val enc = graft.ext.TextStats.encodeDocuments(withEmpty)
      .as[(Long, Seq[Long])].collect().toMap
    assert(enc(2L) == Seq.empty && enc(1L).size == 2)
  }

  test("deterministic splits: stable, exhaustive, and sample ⊂ corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val s1 = TrainingPipeline.assignSplits(docs)
      .as[(Long, Long, String)].collect().toSeq
    val s2 = TrainingPipeline.assignSplits(docs)
      .as[(Long, Long, String)].collect().toSeq
    assert(s1 == s2, "split assignment must be reproducible")
    assert(s1.map(_._1).toSet.size == s1.size, "one row per doc")
    assert(s1.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    assert(s1.count(_._3 == "train") > s1.size / 2, "train is the bulk split")
    // the hash sample is exactly the ids whose bucket clears the cutoff
    val sampled = TrainingPipeline.sampleByHash(docs, 10)
      .select("doc_id").as[Long].collect().toSet
    val expected = s1.filter(_._2 < 10).map(_._1).toSet
    assert(sampled == expected)
  }

  test("scrub strips urls/emails and collapses whitespace, with accounting") {
    val df = Seq(
      (1L, "see https://example.com/a?b=c and mail bob@example.org  now", "s"),
      (2L, "plain  text\twith   runs", "s")
    ).toDF("doc_id", "text", "source")
    val byId = graft.ext.TextStats.scrub(df)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(byId(1L)._1 == "see and mail now")
    assert(byId(1L)._2 == 1 && byId(1L)._3 == 1)
    assert(byId(2L)._1 == "plain text with runs" && byId(2L)._2 == 0)
    assert(byId(2L)._4 == df.filter($"doc_id" === 2L).select("text").head().getString(0).length
      - "plain text with runs".length)
  }

  test("packedBatches: EOS-terminated id streams per bin, empty docs survive") {
    // vocab by (cnt desc, word): a=0 (x3), b=1 (x2), c=2 (x1)
    // token counts: d1=3, d2=0, d3=2, d4=1; target 4 → cum-exclusive
    // 0,3,3,5 → bins 0,0,0,1
    val df = Seq(
      (1L, "a b a"), (2L, "   "), (3L, "b c"), (4L, "a")
    ).toDF("doc_id", "text")
    val got = TrainingPipeline.packedBatches(df, targetTokens = 4)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (0L, 3L, 5L, "0,1,0,-1,-1,1,2,-1"), // d1, d2 (bare EOS), d3
      (1L, 1L, 1L, "0,-1")))              // d4
  }

  test("scrubPii removes each category once, in order, with per-step accounting") {
    val df = Seq(
      (1L, "call +1 (202) 555-0123 or 555 867 5309 today", "s"),        // two phones
      (2L, "server 192.168.0.1 and 10.0.0.255 replied", "s"),           // two ips
      (3L, "card 4111111111111111 charged", "s"),                       // one 16-digit card
      (4L, "ip 10.0.0.1 then digits 12345678901234 then +1 555-222-3344", "s"), // one of each
      (5L, "mail a.b+c@ex-ample.org from https://x.io/p?q=1", "s"),     // url + email
      (6L, "no pii here at all", "s")
    ).toDF("doc_id", "text", "source")
    val byId = graft.ext.TextStats.scrubPii(df)
      .as[(Long, String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // (id, clean, urls, emails, ips, cards, phones, removed)
    assert(byId(1L)._7 == 2 && byId(1L)._2 == "call or today")
    assert(byId(2L)._5 == 2 && byId(2L)._7 == 0,
      "an IPv4 must be counted as ip, never as phone")
    assert(byId(3L)._6 == 1 && byId(3L)._7 == 0,
      "a 16-digit run must be counted as card, never as phone")
    assert(byId(4L)._5 == 1 && byId(4L)._6 == 1 && byId(4L)._7 == 1)
    assert(byId(5L)._3 == 1 && byId(5L)._4 == 1)
    assert(byId(6L) == ((6L, "no pii here at all", 0L, 0L, 0L, 0L, 0L, 0L)))
    // idempotence: scrubbing the clean text removes nothing further
    val again = graft.ext.TextStats.scrubPii(
      graft.ext.TextStats.scrubPii(df).select(col("doc_id"), col("clean_text").as("text")))
    assert(again.filter(col("n_chars_removed") =!= 0 || col("n_ips") =!= 0 ||
      col("n_cards") =!= 0 || col("n_phones") =!= 0).count() == 0)
  }

  test("luhnScrub masks only checksum-valid runs; boundaries and lengths guarded") {
    val df = Seq(
      // 4111111111111111 is the canonical Luhn-VALID 16-digit test number
      (1L, "pay 4111111111111111 now", "s"),
      // one digit off: candidate but NOT valid -> survives unmasked
      (2L, "pay 4111111111111112 now", "s"),
      // 12 digits: too short to be a candidate at all
      (3L, "ref 411111111111 kept", "s"),
      // 20-digit run: the boundary guard must not mask its 19-digit prefix
      (4L, "trace 41111111111111111111 kept", "s"),
      // two candidates, one valid each way
      (5L, "a 4111111111111111 b 4111111111111112 c", "s")
    ).toDF("doc_id", "text", "source")
    val byId = graft.ext.TextStats.luhnScrub(df)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(byId(1L) == ((1L, 1L, 1L, "pay <CARD> now")))
    assert(byId(2L) == ((2L, 1L, 0L, "pay 4111111111111112 now")))
    assert(byId(3L) == ((3L, 0L, 0L, "ref 411111111111 kept")))
    assert(byId(4L) == ((4L, 0L, 0L, "trace 41111111111111111111 kept")))
    assert(byId(5L) == ((5L, 2L, 1L, "a <CARD> b 4111111111111112 c")))
  }

  test("stratified sample fills the per-stratum quota deterministically") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = TrainingPipeline.stratifiedSample(docs, "lang", 7)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    full.foreach { case (lang, n) => assert(got(lang) == math.min(7L, n)) }
    val again = TrainingPipeline.stratifiedSample(docs, "lang", 7)
      .select("doc_id").as[Long].collect().toSet
    val first = TrainingPipeline.stratifiedSample(docs, "lang", 7)
      .select("doc_id").as[Long].collect().toSet
    assert(again == first, "stratified sample must be reproducible")
  }

  test("tf-idf cosine pairs: identical docs score ~1 and rank first") {
    val df = Seq(
      (1L, "catalyst plans the shuffle exchange with partial aggregation", "s"),
      (2L, "catalyst plans the shuffle exchange with partial aggregation", "s"),
      (3L, "entirely unrelated prose about gardens and weather patterns", "s"),
      (4L, "catalyst plans nothing here but shares some words", "s")
    ).toDF("doc_id", "text", "source")
    val top = graft.ext.TextStats.tfIdfCosinePairs(df, 3)
      .as[(Long, Long, Double)].collect()
    assert(top.head._1 == 1L && top.head._2 == 2L && top.head._3 > 0.999)
    assert(top.forall(p => p._3 <= 1.0 + 1e-12))
  }

  test("decontamination flags exactly the n-gram-overlapping train docs") {
    val benchmark = Seq(
      (100L, "what is the boiling point of water at sea level", "b")
    ).toDF("doc_id", "text", "source")
    val train = Seq(
      (1L, "trivia dump the boiling point of water is well known", "s"), // shares a 4-gram
      (2L, "entirely unrelated prose about compilers and codegen loops", "s"), // clean
      (3L, "boiling point facts", "s"), // shorter than n: trivially clean
      (4L, "at sea level the pressure is one atmosphere exactly", "s") // shares "at sea level ..."? only 3 tokens overlap
    ).toDF("doc_id", "text", "source")
    val report = TrainingPipeline.contaminationReport(train, benchmark, n = 4)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(report(1L)._2, "doc 1 shares 'the boiling point of' (+ more)")
    assert(report(1L)._1 >= 2, "distinct overlapping 4-grams counted")
    assert(!report(2L)._2 && report(2L)._1 == 0)
    assert(!report(3L)._2, "3-token doc has no 4-grams")
    assert(!report(4L)._2, "3-token overlap is below the 4-gram bar")
    val clean = TrainingPipeline.decontaminate(train, benchmark, n = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L, 3L, 4L))
  }

  test("repetition stats: hand-computed fractions and short-doc nulls") {
    val df = Seq(
      (1L, "a a a b", "s"), // bigrams: aa,aa,ab → top 2/3; trigrams: aaa,aab → top 1/2
      (2L, "x", "s"), // no bigrams/trigrams
      (3L, "spark plans queries and spark plans joins", "s")
    ).toDF("doc_id", "text", "source")
    val rows = graft.ext.TextStats.repetitionStats(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = rows(1L)
    assert(r1.getLong(1) == 4 && r1.getDouble(2) == 0.5) // 2 distinct of 4
    assert(r1.getLong(3) == 2 && math.abs(r1.getDouble(4) - 2.0 / 3.0) < 1e-15)
    assert(r1.getLong(5) == 1 && r1.getDouble(6) == 0.5)
    val r2 = rows(2L)
    assert(r2.getLong(3) == 0 && r2.isNullAt(4), "no bigrams → null fraction")
    val r3 = rows(3L)
    assert(r3.getLong(3) == 2, "'spark plans' repeats") // 7 tokens → 6 bigrams
    assert(math.abs(r3.getDouble(4) - 2.0 / 6.0) < 1e-15)
  }

  test("unpivot(pivot(events)) == direct long-form aggregation") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val viaPivot = graft.rel.Relational.eventTypeUnpivot(events)
      .as[(Long, String, Long)].collect().toSet
    val direct = events.groupBy("user_id", "event_type").count()
      .as[(Long, String, Long)].collect().toSet
    assert(viaPivot == direct)
  }

  test("stage report is internally consistent") {
    val r = TrainingPipeline.stageReport(corpus, nearDupThreshold = 0.5)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val (nIn, nQ, nExact, nFinal, qDrop, ndDrop) = r
    assert(nIn == 5 && nQ == 4 && nExact == 3 && nFinal == 2)
    assert(qDrop == nIn - nQ && ndDrop == nExact - nFinal)
  }

  test("mixtureSample: rate 100 keeps all, 0 keeps none, samples nest monotonically") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val en = docs.filter(org.apache.spark.sql.functions.col("lang") === "en")
    val all = TrainingPipeline
      .mixtureSample(docs, Seq("en" -> 100, "zh" -> 0), 50)
    assert(all.filter(org.apache.spark.sql.functions.col("lang") === "en").count() == en.count())
    assert(all.filter(org.apache.spark.sql.functions.col("lang") === "zh").count() == 0)
    // determinism + nesting: the 20% keep-set is a subset of the 60% one
    // (same hash, higher cutoff) — the property that makes mixture dials
    // safe to tune without resampling the world
    val k20 = TrainingPipeline.mixtureSample(docs, Nil, 20)
      .select("doc_id").as[Long].collect().toSet
    val k60 = TrainingPipeline.mixtureSample(docs, Nil, 60)
      .select("doc_id").as[Long].collect().toSet
    assert(k20.subsetOf(k60))
    assert(k20 == TrainingPipeline.mixtureSample(docs, Nil, 20)
      .select("doc_id").as[Long].collect().toSet)
  }

  test("temperatureMixture: sqrt-derived rates match the integer model; head downsampled harder") {
    // planted skew: 400 "big", 16 "small", 4 docs with NULL stratum —
    // α=0.5 must keep a LARGER FRACTION of small than of big
    val df = ((0L until 400L).map(i => (i, "big")) ++
      (400L until 416L).map(i => (i, "small")) ++
      (416L until 420L).map(i => (i, null: String)))
      .toDF("doc_id", "lang")
      .withColumn("text", org.apache.spark.sql.functions.lit("x"))
    val targetPct = 50
    // pure-Scala integer model of the rate derivation
    val counts = Map(Option("big") -> 400L, Option("small") -> 16L, (None: Option[String]) -> 4L)
    val total = counts.values.sum
    val target = total * targetPct / 100
    val w = counts.map { case (s, n) => s -> math.floor(math.sqrt(n.toDouble) * 1e6).toLong }
    val sumW = w.values.map(BigInt(_)).sum
    val pct = counts.map { case (s, n) =>
      s -> ((BigInt(100) * BigInt(target) * BigInt(w(s))) / (sumW * BigInt(n))).min(100).toInt }
    assert(pct(Some("small")) > pct(Some("big")),
      "temperature must keep a larger fraction of the small stratum")
    val kept = TrainingPipeline.temperatureMixture(df, targetPct)
      .select("doc_id", "lang").as[(Long, Option[String])].collect()
    // every kept doc passes exactly its stratum's modeled rate cutoff
    def phash(id: Long): Long = {
      var acc = 0L
      id.toString.foreach(c => acc = (acc * 31 + c.toLong) % graft.ext.Dedup.P)
      acc % 100
    }
    val expect = ((0L until 400L).map((_, Some("big"))) ++
      (400L until 416L).map((_, Some("small"))) ++
      (416L until 420L).map((_, None: Option[String])))
      .filter { case (id, s) => phash(id) < pct(s) }.toSet
    assert(kept.map(t => (t._1, t._2)).toSet == expect)
    // degenerate dials: 0 keeps nothing; at targetPct=100 the SMALL
    // strata saturate (rate capped at 100 → kept whole) while the head
    // stratum is still downsampled — temperature reshapes even at full
    // budget, it is not a passthrough
    assert(TrainingPipeline.temperatureMixture(df, 0).count() == 0)
    val full = TrainingPipeline.temperatureMixture(df, 100)
    assert(full.filter(col("lang") === "small").count() == 16)
    assert(full.filter(col("lang").isNull).count() == 4)
    assert(full.filter(col("lang") === "big").count() < 400)
    // unbounded-strata guard fails loudly instead of collecting a key column
    val ex = intercept[IllegalArgumentException] {
      TrainingPipeline.temperatureMixture(
        df.withColumn("lang", col("doc_id").cast("string")), 50, maxStrata = 100)
    }
    assert(ex.getMessage.contains("strata"), ex.getMessage)
  }

  test("chunkDocuments: stride grid, clamped tail, empty docs emit nothing") {
    val df = Seq(
      (1L, "a b c d e"), // 5 tokens, chunk 3 stride 2 → starts 0, 2, 4
      (2L, "")           // empty: no chunks
    ).toDF("doc_id", "text")
    val rows = graft.ext.TextStats.chunkDocuments(df, chunkSize = 3, stride = 2)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(rows == Seq(
      (1L, 0L, 0L, 3L, "a b c"),
      (1L, 1L, 2L, 3L, "c d e"),
      (1L, 2L, 4L, 1L, "e")))
    // overlap: consecutive chunks share chunkSize - stride tokens
    assert(rows(0)._5.endsWith("c") && rows(1)._5.startsWith("c"))
  }

  test("cdcChunks: boundaries at window-sum mask hits; chunks tile the document exactly") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq((1L, text), (2L, "")).toDF("doc_id", "text")
    val rows = graft.ext.TextStats.cdcChunks(df)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.forall(_._1 == 1L)) // empty doc: no chunks
    // chunks tile [1, len] contiguously and sums add to the doc's code sum
    assert(rows.head._3 == 1L)
    rows.sliding(2).foreach { case Seq(a, b) => assert(b._3 == a._3 + a._4); case _ => () }
    assert(rows.map(_._4).sum == text.length.toLong)
    assert(rows.map(_._5).sum == text.codePoints().toArray.map(_.toLong).sum)
    // every internal boundary is a genuine mask hit of the trailing window
    val cps = text.codePoints().toArray
    for (r <- rows.dropRight(1)) {
      val endIdx = (r._3 + r._4 - 2).toInt // 0-based index of the chunk's last char
      val wsum = (endIdx - 7 to endIdx).map(cps(_).toLong).sum
      assert(endIdx >= 7 && wsum % 16 == 0, s"chunk $r closed without a mask hit")
    }
  }

  test("hashingTf: hand-computed Horner hash, bucket and sign; repeats accumulate") {
    // "ab": h = (0*31+97)*31 + 98 = 3105 -> bucket 3105 % 64 = 33,
    // sign bit (3105 // 64) % 2 = 0 -> +1; three occurrences stack
    val df = Seq((1L, "ab ab ab"), (2L, "")).toDF("doc_id", "text")
    val rows = graft.ext.TextStats.hashingTf(df)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 33L, 3L, 3L)))
  }

  test("hashingTf needs no vocabulary: the plan has no join and one aggregation exchange") {
    val plan = graft.ext.TextStats.hashingTf(Tables.documents(spark, "/root/testdata/sf0.001"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Join"), plan.takeRight(800))
    // the only exchanges: the (doc, bucket) aggregation + the final sort
    // (formatted mode prints each node once as a "(n) Exchange" detail header)
    val nExchanges = plan.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
    assert(nExchanges <= 2, plan.takeRight(800))
  }

  test("cdcChunks is shift-resilient: a prefix edit leaves later chunk identities intact") {
    // ~400 chars of deterministic varied content: enough chunks that the
    // realigned suffix dominates the document
    val base = (1 to 80).map(i => ('a' + i * 7 % 23).toChar.toString * (i % 3 + 1)).mkString(" ")
    val edited = "XYZ inserted! " + base
    val df = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val rows = graft.ext.TextStats.cdcChunks(df)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // chunk identity = (len, content sum) — what a block-dedup store keys on
    val keys1 = rows.filter(_._1 == 1L).map(r => (r._4, r._5))
    val keys2 = rows.filter(_._1 == 2L).map(r => (r._4, r._5))
    // after re-synchronization the chunk streams coincide: the base doc's
    // chunks from some small index on all reappear in the edited doc
    val shared = keys1.indices.find(k => keys2.containsSlice(keys1.drop(k)))
    assert(shared.isDefined && shared.get <= 2,
      s"no realignment: base=$keys1 edited=$keys2")
    // and the realigned suffix is most of the document (not a trivial tail)
    assert(keys1.drop(shared.get).map(_._1).sum > base.length / 2)
  }

  test("packSequences equals the naive single-partition cumsum; bins respect the target") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = TrainingPipeline.packSequences(docs, targetTokens = 500)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val naive = docs
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(
          graft.text.Tokenize.tokensArray(
            org.apache.spark.sql.functions.col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", org.apache.spark.sql.functions.sum("n_tokens")
        .over(Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("bin_id", org.apache.spark.sql.functions
        .expr("(cum_tokens - n_tokens) div 500"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == naive)
    // bins are contiguous, nondecreasing, and every bin's exclusive start
    // lies below (k+1)·target (the greedy cut rule)
    assert(got.map(_._4) == got.map(_._4).sorted)
    got.foreach { case (_, n, cum, bin) => assert(cum - n < (bin + 1) * 500) }
  }

  test("gopher rules flag each documented failure mode") {
    val fifty = Seq.fill(12)("the quick brown fox jumps").mkString(" ") // 60 words, len 4.3
    val df = Seq(
      (0L, fifty),                                  // passes everything
      (1L, "the quick fox"),                        // too few words
      (2L, fifty.replace("quick", "####### ###")),  // symbol-heavy
      (3L, Seq.fill(12)("schnell braun springt hund katze").mkString(" ")), // no stopwords
      (4L, Seq.fill(60)("- bullet item here\n").mkString)                   // all bullet lines
    ).toDF("doc_id", "text")
    val rows = graft.ext.TextStats.gopherQualityFlags(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getAs[Boolean]("passes"))
    assert(!rows(1L).getAs[Boolean]("passes") && rows(1L).getAs[Long]("n_words") == 3L)
    assert(!rows(2L).getAs[Boolean]("passes"))
    assert(rows(2L).getAs[Double]("symbol_ratio") > 0.1)
    assert(!rows(3L).getAs[Boolean]("passes") && rows(3L).getAs[Long]("n_stopwords") == 0L)
    assert(!rows(4L).getAs[Boolean]("passes"))
    assert(rows(4L).getAs[Double]("bullet_ratio") > 0.9)
    // the ratio denominators: words vs lines are independent counters
    assert(rows(4L).getAs[Long]("n_lines") >= 60L)
  }

  test("curriculum phases: rank is the window permutation, buckets contiguous and balanced") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = ext.TrainingPipeline.curriculumPhases(docs, phases = 4)
    val rows = got.select("doc_id", "score", "rank", "phase")
      .as[(Long, Double, Long, Long)].collect()
    val n = rows.length
    assert(n > 0)
    // rank is exactly the permutation the naive global window produces
    val naiveRank = rows.sortBy(r => (-r._2, r._1)).zipWithIndex
      .map { case (r, i) => r._1 -> (i + 1L) }.toMap
    assert(rows.forall(r => naiveRank(r._1) == r._3), "two-phase rank != window rank")
    // phases partition the rank range contiguously into near-equal buckets
    assert(rows.forall(r => r._4 == (r._3 - 1) * 4 / n))
    val sizes = rows.groupBy(_._4).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(0L, 1L, 2L, 3L))
    assert(sizes.values.max - sizes.values.min <= 1, s"unbalanced: $sizes")
    // repartition invariance: the assignment is a pure function of the corpus
    val again = ext.TrainingPipeline.curriculumPhases(docs.repartition(13), phases = 4)
      .select("doc_id", "rank", "phase").as[(Long, Long, Long)].collect().toSet
    assert(again == rows.map(r => (r._1, r._3, r._4)).toSet)
  }

  test("span corruption: hand-computed masks, truncation, short and empty docs") {
    val docs = Seq(
      // 12 tokens: span 0 = positions 3-5, span 1 starts at 13 (absent);
      // t10/t11 stay (their j%10 is 0/1)
      (0L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11"),
      // 5 tokens: span truncated to positions 3-4
      (1L, "a b c d e"),
      // 4 tokens: span is exactly one token (position 3)
      (2L, "w x y z"),
      // 3 tokens: no position reaches the grid -> unmasked, empty target
      (3L, "p q r"),
      (4L, ""))
      .toDF("doc_id", "text")
    val out = ext.TrainingPipeline.spanCorruption(docs)
      .as[(Long, String, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, "t0 t1 t2 <extra_id_0> t6 t7 t8 t9 t10 t11",
      "<extra_id_0> t3 t4 t5", 1L, 3L)))
    assert(out(1L) == ((1L, "a b c <extra_id_0>", "<extra_id_0> d e", 1L, 2L)))
    assert(out(2L) == ((2L, "w x y <extra_id_0>", "<extra_id_0> z", 1L, 1L)))
    assert(out(3L) == ((3L, "p q r", "", 0L, 0L)))
    assert(out(4L) == ((4L, "", "", 0L, 0L)))
    // round trip: interleaving input sentinels with target spans
    // reconstructs the original token stream (the denoising invariant)
    val in0 = out(0L)._2.split(" ")
    val tgt0 = out(0L)._3.split(" ")
    val rebuilt = in0.toSeq.flatMap { s =>
      if (s.startsWith("<extra_id_"))
        tgt0.toSeq.dropWhile(_ != s).drop(1).takeWhile(!_.startsWith("<extra_id_"))
      else Seq(s)
    }
    assert(rebuilt.toSeq == (0 to 11).map(i => s"t$i"))
  }

  test("oversample: exact parity per group, remainder by group rank, invariant") {
    val docs = Seq(
      (10L, "a"), (11L, "a"), (12L, "a"),      // majority: 3 docs
      (20L, "b"),                              // singleton: 3 copies
      (30L, "c"), (31L, "c"))                  // 2 docs: base 1, rem 1
      .toDF("doc_id", "lang").withColumn("text", lit("t"))
    val out = ext.TrainingPipeline.oversampleBalance(docs)
      .as[(Long, String, Long, Long)].collect().toSeq
    // group-aware two-phase rank == the naive per-group window rank
    val wantRank = Map(10L -> 1L, 11L -> 2L, 12L -> 3L, 20L -> 1L, 30L -> 1L, 31L -> 2L)
    out.foreach { case (id, _, r, _) => assert(r == wantRank(id), s"rank of $id") }
    // copies: a -> 1 each; b -> 3; c -> (2, 1): every group sums to M=3
    val copies = out.map(r => r._1 -> r._4).toMap
    assert(copies == Map(10L -> 1L, 11L -> 1L, 12L -> 1L, 20L -> 3L, 30L -> 2L, 31L -> 1L))
    out.groupBy(_._2).foreach { case (g, rows) =>
      assert(rows.map(_._4).sum == 3L, s"group $g must sum to the max group size") }
    // partitioning invariance
    val again = ext.TrainingPipeline.oversampleBalance(docs.repartition(7))
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(again == out)
  }

  test("preference pairs: argmax/argmin per group with deterministic tie-breaks") {
    val docs = Seq(
      // group (s0, en): scores 2/4=0.5 (doc 0), 1/4=0.25 (doc 1), 0/3=0 (doc 2)
      (0L, "the a cats dogs", "en", "s0"),
      (1L, "the cats dogs birds", "en", "s0"),
      (2L, "cats dogs birds", "en", "s0"),
      // group (s1, en): both docs tie at 1/3 -> margin 0 -> dropped
      (3L, "the cats dogs", "en", "s1"),
      (4L, "the birds fish", "en", "s1"),
      // group (s2, en): single doc -> margin 0 -> dropped
      (5L, "the end", "en", "s2"),
      // group (s3, en): tie on BEST score between docs 6 and 7 -> chosen
      // is the smaller id; doc 8 is the clear worst
      (6L, "the a b", "en", "s3"),
      (7L, "the of c", "en", "s3"),
      (8L, "x y z", "en", "s3")
    ).toDF("doc_id", "text", "lang", "source")
    val rows = ext.TrainingPipeline.preferencePairs(docs)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(rows.keySet == Set("s0", "s3"), "margin-0 groups must be dropped")
    assert(rows("s0").getAs[Long]("chosen_id") == 0L)
    assert(rows("s0").getAs[Long]("rejected_id") == 2L)
    assert(rows("s0").getAs[Long]("n_docs") == 3L)
    assert(rows("s0").getAs[Double]("margin") == 0.5)
    assert(rows("s3").getAs[Long]("chosen_id") == 6L, "best-score tie -> smaller id")
    assert(rows("s3").getAs[Long]("rejected_id") == 8L)
    // repartition invariance
    val a = ext.TrainingPipeline.preferencePairs(docs).collect().map(_.toString).toSeq
    val b = ext.TrainingPipeline.preferencePairs(docs.repartition(5))
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("pmi collocations: hand-computed fixture, collocation beats chance pair") {
    // corpus: "x y" always adjacent (a true collocation); "p"/"q" frequent
    // but never adjacent to each other except once (chance-level)
    val docs = Seq(
      (0L, "x y p q"), (1L, "x y q p"), (2L, "x y p p q q"), (3L, "p x y q")
    ).toDF("doc_id", "text")
    val rows = ext.TextStats.pmiCollocations(docs, topK = 100, minCount = 1)
      .collect().map(r => r.getAs[String]("bigram") -> r).toMap
    // totals: W = 18 tokens, B = 14 bigrams; c(x y)=4, c(x)=4, c(y)=4
    val xy = rows("x y")
    assert(xy.getAs[Long]("cab") == 4L && xy.getAs[Long]("ca") == 4L
      && xy.getAs[Long]("cb") == 4L)
    val expected = math.round(math.log(4.0 * 18 * 18 / (14.0 * 4 * 4)) * 1e6) / 1e6
    assert(xy.getAs[Double]("pmi") == expected)
    // the always-adjacent pair outranks every chance co-occurrence
    for ((g, r) <- rows if g != "x y")
      assert(r.getAs[Double]("pmi") < xy.getAs[Double]("pmi"),
        s"$g should score below the planted collocation")
    // minCount suppresses the hapax tail
    val filtered = ext.TextStats.pmiCollocations(docs, topK = 100, minCount = 4)
      .select("bigram").as[String].collect().toSeq
    assert(filtered == Seq("x y"))
    // repartition invariance: counts and pmi identical under reshuffling
    val a = ext.TextStats.pmiCollocations(docs, 100, 1).collect().map(_.toString).sorted.toSeq
    val b = ext.TextStats.pmiCollocations(docs.repartition(7), 100, 1)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("char entropy: hand-computed values, integer-scaled terms, empty doc") {
    val docs = Seq((0L, "aab"), (1L, ""), (2L, "zzzz")).toDF("doc_id", "text")
    val rows = ext.TextStats.charEntropy(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // "aab": n=3, counts {a:2, b:1} → sum = 2·round(ln2·1e6) = 1386294,
    // H = (3·round(ln3·1e6) − 1386294) / 3e6
    assert(rows(0L).getAs[Long]("n_chars") == 3L)
    assert(rows(0L).getAs[Long]("n_distinct_chars") == 2L)
    assert(rows(0L).getAs[Long]("sum_clnc_scaled") == 1386294L)
    assert(math.abs(rows(0L).getAs[Double]("entropy") - 0.636514) < 1e-6)
    // empty doc: zero chars, entropy pinned to 0
    assert(rows(1L).getAs[Long]("n_chars") == 0L)
    assert(rows(1L).getAs[Double]("entropy") == 0.0)
    // single repeated char: H = 0 exactly (n·ln n − n·ln n)
    assert(rows(2L).getAs[Double]("entropy") == 0.0)
  }

  test("domainCap keeps at most N per domain, longest first, id tiebreak") {
    val docs = Seq(
      (1L, "s0", 10L), (2L, "s0", 30L), (3L, "s0", 30L), (4L, "s0", 5L),
      (5L, "s1", 1L)
    ).toDF("doc_id", "source", "n_chars")
    val got = ext.TrainingPipeline.domainCap(docs, 2)
      .as[(Long, String, Long, Long)].collect().toSeq
    // s0: 30-char docs win, id 2 ranks before id 3; 10 and 5 fall out
    assert(got == Seq((2L, "s0", 30L, 1L), (3L, "s0", 30L, 2L), (5L, "s1", 1L, 1L)))
  }

  test("diversityCap equals the window formulation; caps and ranks hold") {
    // the bounded TopKAggregator path must keep EXACTLY the capPerCell
    // lowest ids per cell with contiguous ranks — i.e. be interchangeable
    // with the row_number-window formulation it replaces for scale
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cap = 7
    val got = graft.ext.TrainingPipeline.diversityCap(emb, nlist = 8, capPerCell = cap, iters = 3)
      .as[(Long, Int, Long)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell")).orderBy(col("vec_id"))
    val windowed = graft.ext.Ivf.kmeansAssignSnapped(emb, 8, iters = 3)
      .select(col("vec_id"), col("cell"))
      .withColumn("rank_in_cell", row_number().over(w).cast("long"))
      .filter(col("rank_in_cell") <= cap)
      .orderBy("vec_id")
      .as[(Long, Int, Long)].collect().toSeq
    assert(got == windowed)
    val byCell = got.groupBy(_._2)
    assert(byCell.values.forall(_.size <= cap))
    assert(byCell.values.forall(rs => rs.map(_._3).sorted == (1L to rs.size)))
    assert(byCell.exists(_._2.size == cap), "fixture must saturate at least one cell")
  }

  test("heavy hitters: exact per-mille threshold, includes boundary, desc order") {
    // 10 tokens total: 'a'x5 (500‰), 'b'x3 (300‰), 'c'x2 (200‰)
    val docs = Seq((0L, "a a a a a b b"), (1L, "b c c")).toDF("doc_id", "text")
    val at300 = ext.TextStats.heavyHitters(docs, permille = 300)
      .as[(String, Long)].collect().toSeq
    assert(at300 == Seq(("a", 5L), ("b", 3L)), "300‰ keeps the boundary token b")
    val at301 = ext.TextStats.heavyHitters(docs, permille = 301)
      .as[(String, Long)].collect().toSeq
    assert(at301 == Seq(("a", 5L)))
    assert(ext.TextStats.heavyHitters(docs, permille = 0).count() == 3)
  }

  test("interleave: weighted round-robin ratio holds in every prefix window") {
    // 60 docs of 'a' (weight 3) and 20 of 'b' (weight 1): any long-enough
    // prefix of the schedule should read ~3 a's per b
    val docs = ((0L until 60L).map(i => (i, "a")) ++ (60L until 80L).map(i => (i, "b")))
      .toDF("doc_id", "source")
    val order = ext.TrainingPipeline.interleaveBySource(docs, Seq("a" -> 3, "b" -> 1))
      .select("source").as[String].collect().toSeq
    assert(order.size == 80)
    // exact schedule: key(a,k) = (k+1)*1, key(b,k) = (k+1)*3 -> in any
    // prefix ending at a b, #a >= 3*#b - 3 and <= 3*#b + 3
    order.indices.filter(order(_) == "b").foreach { i =>
      val nb = order.take(i + 1).count(_ == "b")
      val na = i + 1 - nb
      assert(math.abs(na - 3 * nb) <= 3, s"prefix $i: $na a's vs $nb b's")
    }
    val again = ext.TrainingPipeline.interleaveBySource(docs, Seq("a" -> 3, "b" -> 1))
      .select("doc_id").as[Long].collect().toSeq
    val first = ext.TrainingPipeline.interleaveBySource(docs, Seq("a" -> 3, "b" -> 1))
      .select("doc_id").as[Long].collect().toSeq
    assert(again == first, "schedule must be deterministic")
  }

  test("CMS estimates: never under, within eps*N over, deterministic") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = ext.TextStats.cmsHeavyHitters(docs, permille = 5, eps = 0.01)
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val total = ext.TextStats.heavyHitters(docs, permille = 0)
      .agg(org.apache.spark.sql.functions.sum("cnt")).as[Long].head()
    rows.foreach { case (w, cnt, est) =>
      assert(est >= cnt, s"CMS must never underestimate ($w: $est < $cnt)")
      assert(est <= cnt + (0.01 * total).toLong + 1, s"$w estimate off: $est vs $cnt")
    }
    val again = ext.TextStats.cmsHeavyHitters(docs, permille = 5, eps = 0.01)
      .as[(String, Long, Long)].collect().toSeq
    assert(rows == again, "fixed seed + commutative merge => deterministic")
  }

  test("shuffle shards: deterministic, dense per-shard positions, full coverage") {
    val docs = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = ext.TrainingPipeline.shuffleShards(docs, 8)
      .as[(Long, Long, Long)].collect().toSeq
    val b = ext.TrainingPipeline.shuffleShards(docs, 8)
      .as[(Long, Long, Long)].collect().toSeq
    assert(a == b, "same seed must reproduce the same permutation")
    assert(a.map(_._1).toSet == (0L until 100L).toSet, "every doc placed exactly once")
    assert(a.forall(r => r._2 >= 0 && r._2 < 8))
    a.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted == (0L until rs.size.toLong), "dense per-shard positions")
    }
    // a different seed yields a different permutation
    val c = ext.TrainingPipeline.shuffleShards(docs, 8, seed = "other")
      .as[(Long, Long, Long)].collect().toSeq
    assert(a != c)
  }

  test("weightedSample: exact k, deterministic, zero weights excluded, k≥n returns all") {
    val docs = (0L until 50L).map(i => (i, if (i == 7L) 0L else i + 1L))
      .toDF("doc_id", "w")
    val a = ext.TrainingPipeline.weightedSample(docs, 10, weightCol = "w")
      .as[(Long, Long, Double)].collect().toSeq
    val b = ext.TrainingPipeline.weightedSample(docs, 10, weightCol = "w")
      .as[(Long, Long, Double)].collect().toSeq
    assert(a == b, "same seed must reproduce the same sample")
    assert(a.size == 10)
    assert(a.map(_._1) == a.map(_._1).sorted, "output ordered by id")
    assert(!a.exists(_._1 == 7L), "zero-weight row can never be sampled")
    val all = ext.TrainingPipeline.weightedSample(docs, 1000, weightCol = "w")
      .as[(Long, Long, Double)].collect().toSeq
    assert(all.size == 49, "k beyond the corpus returns every positive-weight row")
    // a different seed draws a different sample
    val c = ext.TrainingPipeline.weightedSample(docs, 10, weightCol = "w", seed = "other")
      .as[(Long, Long, Double)].collect().toSeq
    assert(a != c)
  }

  test("nextEventExamples: full-context sliding windows per user, time-ordered") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val events = Seq(
      (10L, ts(1), 1L, "a"), (11L, ts(2), 1L, "b"),
      (12L, ts(3), 1L, "c"), (13L, ts(4), 1L, "d"), (14L, ts(5), 1L, "e"),
      (20L, ts(1), 2L, "x"), (21L, ts(2), 2L, "y") // too short for k=3
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = ext.TrainingPipeline.nextEventExamples(events, 3)
      .as[(Long, Long, String, String)].collect().toSeq
    assert(got == Seq(
      (1L, 13L, "a,b,c", "d"),
      (1L, 14L, "b,c,d", "e")))
    // k=1: every event after the first becomes an example
    assert(ext.TrainingPipeline.nextEventExamples(events, 1).count() == 5)
  }

  test("negativeSamples: k per anchor, never the anchor, in range, deterministic") {
    val docs = (0L until 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = ext.TrainingPipeline.negativeSamples(docs, 4)
      .as[(Long, Long, Long)].collect().toSeq
    val b = ext.TrainingPipeline.negativeSamples(docs, 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(a == b, "same seed must reproduce the same negatives")
    assert(a.size == 40 * 4)
    assert(a.forall { case (id, _, neg) => neg != id && neg >= 0 && neg < 40 })
    // slots are dense per anchor
    a.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted == Seq(0L, 1L, 2L, 3L))
    }
    // a different seed draws different negatives
    val c = ext.TrainingPipeline.negativeSamples(docs, 4, seed = "other")
      .as[(Long, Long, Long)].collect().toSeq
    assert(a != c)
  }

  test("negativeSamples rejects non-dense ids, including duplicate-plus-gap") {
    // count + min/max alone would accept (0,1,1,3); the distinct-count
    // check in the same aggregate must catch it
    val dupGap = Seq(0L, 1L, 1L, 3L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      ext.TrainingPipeline.negativeSamples(dupGap, 2)
    }
    val gapped = Seq(0L, 2L, 3L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      ext.TrainingPipeline.negativeSamples(gapped, 2)
    }
  }

  test("dataCard: per-lang rows + total row agree with direct aggregates") {
    val docs = Seq(
      (0L, "the cat", "en", 7L),
      (1L, "the cat", "en", 7L), // exact dup of doc 0
      (2L, "le chat noir", "fr", 12L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val got = ext.TrainingPipeline.dataCard(docs)
      .as[(String, Boolean, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("en", false, 2L, 4L, 14L, 1L), // 2 docs, 4 tokens, dup collapses to 1 text
      ("fr", false, 1L, 3L, 12L, 1L),
      (null, true, 3L, 7L, 26L, 2L)))
    // single aggregation pass: the plan reads the table once (one scan node)
    val p = ext.TrainingPipeline.dataCard(docs).queryExecution.optimizedPlan.toString
    assert(!p.toLowerCase.contains("union"), p)
  }

  test("tokenBudget: quality-ranked prefix, exact budget edge, no-fit drop") {
    // stopword densities (permille): d0 "the a of" = 1000, d1 "the cat" = 500,
    // d2 "cat sat mat dog" = 0; rank order d0, d1, d2
    val docs = Seq(
      (0L, "the a of"),       // 3 tokens, q=1000
      (1L, "the cat"),        // 2 tokens, q=500
      (2L, "cat sat mat dog") // 4 tokens, q=0
    ).toDF("doc_id", "text")
    // budget 5: d0 (cum 3) + d1 (cum 5, exactly the budget) kept; d2 would
    // reach 9 and is dropped
    val got = ext.TrainingPipeline.tokenBudget(docs, 5L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 1000L, 3L), (1L, 2L, 500L, 5L)))
    // a budget below the first document keeps nothing
    assert(ext.TrainingPipeline.tokenBudget(docs, 2L).count() == 0)
    // a budget covering everything keeps the corpus
    assert(ext.TrainingPipeline.tokenBudget(docs, 100L).count() == 3)
  }

  test("tokenBudget: equal quality breaks ties by id; deterministic across runs") {
    val docs = (0L until 20L).map(i => (i, "the word")).toDF("doc_id", "text") // all q=500
    val a = ext.TrainingPipeline.tokenBudget(docs, 9L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val b = ext.TrainingPipeline.tokenBudget(docs, 9L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(a == b)
    // 2 tokens each: ids 0..3 fit (cum 8), id 4 would hit 10 > 9
    assert(a.map(_._1) == Seq(0L, 1L, 2L, 3L))
  }

  test("weightedSample: selection is weight-biased") {
    // One row carries ~99% of the total weight; with k = half the corpus
    // it must be drawn (its A-ES key dominates unless its uniform is
    // astronomically small — fixed seed makes this exact and stable).
    val docs = ((0L until 100L).map(i => (i, 1L)) :+ (999L, 1000000L))
      .toDF("doc_id", "w")
    val got = ext.TrainingPipeline.weightedSample(docs, 50, weightCol = "w")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.exists(_._1 == 999L))
  }
}
