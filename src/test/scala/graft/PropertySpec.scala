package graft

import graft.apps.{InvertedIndex, WordCount}
import graft.ext.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck invariants from SURVEY.md §5.2: conservation laws of the
  * map/reduce apps and dedup idempotence, over generated corpora. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val word = Gen.oneOf("the", "cat", "dog", "spark", "430zip", "protégé", "")
  private val doc = for {
    n <- Gen.choose(0, 40)
    ws <- Gen.listOfN(n, word)
  } yield ws.mkString(" ")
  private val corpusGen = for {
    n <- Gen.choose(1, 8)
    docs <- Gen.listOfN(n, doc)
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t, s"src${i % 3}") }

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("scd2 history + as-of == pure-Scala run model for any snapshot stack") {
    // random stacks: random subsets of docs present per version, random
    // edits — gaps (delete-then-restore, changed or unchanged), creates,
    // deletes, and stable runs all arise. The model: global ranks over
    // the stack's DISTINCT versions; a run continues only across
    // consecutive ranks with equal text; is_current == run reaches the
    // global max version. corpusAsOf(k) == the direct snapshot, every k.
    val stackGen = for {
      nv <- Gen.choose(1, 4)
      versions <- Gen.pick(nv, 1L to 6L)
      rows <- Gen.sequence[List[Option[(Long, Long, String)]], Option[(Long, Long, String)]](
        (for (d <- 0L until 5L; v <- versions.sorted) yield for {
          present <- Gen.oneOf(true, true, false)
          txt <- Gen.oneOf("a", "b", "c")
        } yield if (present) Some((d, v, txt)) else None).toList)
    } yield rows.flatten
    check("scd2-model", Prop.forAll(stackGen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("doc_id", "version", "text")
        val got = graft.ext.Incremental.scdHistory(df)
          .as[(Long, Long, Long, Boolean)].collect().toSet
        val vers = rows.map(_._2).distinct.sorted
        val rank = vers.zipWithIndex.toMap
        val vmax = vers.max
        val want = rows.groupBy(_._1).toSeq.flatMap { case (d, rs) =>
          val sorted = rs.sortBy(_._2)
          val runs = sorted.foldLeft(List.empty[(Long, Long, String)]) {
            case (acc, (_, v, t)) => acc match {
              case (from, to, pt) :: rest
                if pt == t && rank(v) - rank(to) == 1 => (from, v, t) :: rest
              case _ => (v, v, t) :: acc
            }
          }
          runs.map { case (from, to, _) => (d, from, to, to == vmax) }
        }.toSet
        val historyOk = got == want
        val asOfOk = vers.forall { k =>
          val rebuilt = graft.ext.Incremental.corpusAsOf(df, k)
            .as[(Long, String)].collect().toSet
          val direct = rows.filter(_._2 == k).map(r => (r._1, r._3)).toSet
          rebuilt == direct
        }
        historyOk && asOfOk
      }
    })
  }

  test("extendHistory fold == full recompute for any snapshot stack") {
    // same random-stack shape as the scd2 model test; fold the LAST
    // version's derived CDC batch (upserts incl. hash-equal no-ops,
    // deletes for vanished ids) onto the history of the earlier versions
    // and demand bit-equality with the full recompute — creates, edits,
    // deletes, gaps and re-inserts all arise from the generator
    val stackGen = for {
      nv <- Gen.choose(2, 4)
      versions <- Gen.pick(nv, 1L to 6L)
      rows <- Gen.sequence[List[Option[(Long, Long, String)]], Option[(Long, Long, String)]](
        (for (d <- 0L until 5L; v <- versions.sorted) yield for {
          present <- Gen.oneOf(true, true, false)
          txt <- Gen.oneOf("a", "b", "c")
        } yield if (present) Some((d, v, txt)) else None).toList)
    } yield rows.flatten
    check("scd2-extend-model", Prop.forAll(stackGen) { rows =>
      val vers = rows.map(_._2).distinct.sorted
      vers.size < 2 || {
        val df = rows.toDF("doc_id", "version", "text")
        val last = vers.max
        val prev = vers(vers.size - 2)
        val hist = graft.ext.Incremental.scdHistoryHashed(df.filter(col("version") < last))
        val oldSnap = rows.filter(_._2 == prev).map(r => r._1 -> r._3).toMap
        val newSnap = rows.filter(_._2 == last).map(r => r._1 -> r._3).toMap
        val changes = (oldSnap.keySet ++ newSnap.keySet).toSeq.map { d =>
          newSnap.get(d) match {
            case Some(t) => (d, 1L, "upsert", t)
            case None    => (d, 1L, "delete", null: String)
          }
        }
        val extended = graft.ext.Incremental
          .extendHistory(hist, changes.toDF("doc_id", "seq", "op", "text"), last)
          .as[(Long, Long, Long, Boolean, Long, Long)].collect().toSet
        val want = graft.ext.Incremental.scdHistoryHashed(df)
          .as[(Long, Long, Long, Boolean, Long, Long)].collect().toSet
        extended == want
      }
    })
  }

  test("cdc apply == pure-Scala MERGE model for any change log") {
    // model: group changes by id, winner = max by (seq, op, text, source)
    // (null sorts lowest, matching Spark struct ordering on seq ties);
    // result = base overridden/eliminated/extended by winners
    val baseGen = for {
      n <- Gen.choose(0, 6)
      ids <- Gen.pick(n, 0L until 10L)
    } yield ids.toList.map(i => (i, s"base$i", s"s${i % 3}"))
    val changeGen = for {
      n <- Gen.choose(0, 12)
      rows <- Gen.listOfN(n, for {
        id <- Gen.choose(0L, 12L)
        seq <- Gen.choose(1L, 4L)
        del <- Gen.oneOf(true, false)
        txt <- Gen.oneOf("a", "b", "zz")
      } yield if (del) (id, seq, "delete", null.asInstanceOf[String], null.asInstanceOf[String])
              else (id, seq, "upsert", txt, s"s$seq"))
    } yield rows
    check("cdc-model", Prop.forAll(baseGen, changeGen) { (base, changes) =>
      val got = graft.ext.Incremental.applyChanges(
          base.toDF("doc_id", "text", "source"),
          changes.toDF("doc_id", "seq", "op", "text", "source"),
          Seq("text", "source"))
        .as[(Long, String, String)].collect().toSet
      def key(c: (Long, Long, String, String, String)) =
        (c._2, c._3, Option(c._4).getOrElse(""), Option(c._5).getOrElse(""))
      val winners = changes.groupBy(_._1).view.mapValues(_.maxBy(key)).toMap
      val want = (base.map(b => b._1 -> (b._2, b._3)).toMap ++
          winners.collect { case (id, c) if c._3 == "upsert" => id -> (c._4, c._5) })
        .filter { case (id, _) => !winners.get(id).exists(_._3 == "delete") }
        .map { case (id, (t, s)) => (id, t, s) }.toSet
      got == want
    })
  }

  test("prefix-filtered jaccard == scala set-Jaccard for any corpus and threshold") {
    check("prefix-jaccard", Prop.forAll(corpusGen, Gen.oneOf(0.2, 0.5, 0.9)) { (rows, t) =>
      val df = rows.toDF("doc_id", "text", "source")
      val got = Dedup.prefixJaccardPairs(df, t)
        .select("a", "b", "jaccard").as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
      // reference: 3-token shingle sets per doc in plain Scala
      def shingles(text: String): Set[String] = {
        val toks = text.split("[\\s]+").filter(_.nonEmpty)
          .map(_.toLowerCase.replaceAll("[^\\p{L}\\p{N}]+", "")).filter(_.nonEmpty)
        // zero-token docs collapse to the single EMPTY shingle — the
        // engine (and its oracle CTE) do exactly this, so two blank
        // docs legitimately pair at jaccard 1.0
        if (toks.length < 3) Set(toks.mkString(" "))
        else toks.sliding(3).map(_.mkString(" ")).toSet
      }
      val sets = rows.map(r => r._1 -> shingles(r._2)).toMap
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        inter = (sa & sb).size
        if inter > 0
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= t
      } yield (a, b) -> j).toMap
      got == want
    })
  }

  test("oov report: counts consistent with the encoding, vocab-size monotone") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rep = graft.ext.TextStats.oovReport(docs, 10)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rep.size == docs.count())
    rep.foreach { case (_, n, oov, rate) =>
      assert(oov <= n)
      assert(rate == (if (n == 0) 0.0 else oov.toDouble / n.toDouble))
    }
    // the OOV mass must equal the -1 codes of the same-size encoding
    val minus1 = graft.ext.TextStats.encodeDocumentsFlat(docs, 10)
      .filter(col("word_id") === -1L).count()
    assert(rep.map(_._3).sum == minus1)
    // growing the dictionary can only shrink every document's OOV count
    val wider = graft.ext.TextStats.oovReport(docs, 20)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    rep.foreach { case (id, _, oov, _) => assert(wider(id) <= oov) }
  }

  test("ngram novelty: fully-shared and fully-original docs hit the bounds") {
    val docs = Seq(
      (0L, "a b c d"),        // bigrams ab,bc,cd
      (1L, "a b c d"),        // identical: all shared -> novelty 0 for both
      (2L, "x y z w")         // untouched by others -> novelty 1
    ).toDF("doc_id", "text")
    val got = graft.ext.TextStats.ngramNovelty(docs)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 3L, 0L, 0.0)))
    assert(got(1L) == ((1L, 3L, 0L, 0.0)))
    assert(got(2L) == ((2L, 3L, 3L, 1.0)))
    // repeated bigram inside ONE doc is still unique corpus-wide
    // (novelty is over DISTINCT grams, df over docs)
    val rep = Seq((5L, "p q p q")).toDF("doc_id", "text") // pq, qp, pq
    val r = graft.ext.TextStats.ngramNovelty(rep)
      .as[(Long, Long, Long, Double)].head()
    assert(r == ((5L, 2L, 2L, 1.0)))
  }

  test("language mix: code-switched doc profiled sentence by sentence") {
    val docs = Seq(
      // 3 sentences: en, en, fr -> dominant en (2/3), mix 1/3
      (0L, "the cat is of to and. the dog is of. le chat et le chien est!"),
      // pure en, one sentence
      (1L, "the house of the king is to and."),
      // marker-free noise -> 'und' bucket
      (2L, "zzz qqq rrr."),
      (3L, "") // empty: absent from the report
    ).toDF("doc_id", "text")
    val got = graft.ext.TextStats.languageMix(docs)
      .as[(Long, Long, Long, String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 3L, 2L, "en", 2L, 1.0 / 3.0)))
    assert(got(1L) == ((1L, 1L, 1L, "en", 1L, 0.0)))
    assert(got(2L) == ((2L, 1L, 1L, "und", 1L, 0.0)))
    assert(!got.contains(3L))
    // modal tie (1 en + 1 fr sentence) breaks to the alphabetical lang
    val tied = Seq((9L, "the cat is of to and. le chat et le chien est la!"))
      .toDF("doc_id", "text")
    val t = graft.ext.TextStats.languageMix(tied)
      .as[(Long, Long, Long, String, Long, Double)].head()
    assert(t._4 == "en" && t._5 == 1L && t._6 == 0.5)
  }

  test("readability: hand-computed Flesch on planted text; zero-word docs score NULL") {
    val docs = Seq(
      // "the cat sat. it ran!" -> tokens: the,cat,sat,it,ran (5 words);
      // vowel groups: the=1 (e), cat=1, sat=1, it=1, ran=1 -> 5 syllables;
      // sentences: ". " and "!" -> 2 terminator runs
      (0L, "the cat sat. it ran!"),
      // punctuation-only "word": survives the whitespace split and
      // normalizes to the empty token (the tokenizer contract shared
      // with every oracle CTE) -> 1 word, 0 syllables; a truly empty
      // doc is the zero-word NULL case
      (1L, "...!?"),
      (3L, "  "), // whitespace only: 0 words -> NULL score
      (2L, "beautiful education") // 2 words; eau-i-u + e-u-a-io -> 4+4? count below
    ).toDF("doc_id", "text")
    val got = graft.ext.TextStats.readability(docs)
      .as[(Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    val (_, s0, w0, y0, f0) = got(0L)
    assert((s0, w0, y0) == ((2L, 5L, 5L)))
    assert(f0.contains(206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (5.0 / 5.0)))
    val (_, s1, w1, y1, f1) = got(1L)
    assert((s1, w1, y1) == ((1L, 1L, 0L)))
    assert(f1.contains(206.835 - 1.015 * 1.0 - 84.6 * 0.0))
    val (_, s3, w3, _, f3) = got(3L)
    assert(s3 == 1L && w3 == 0L && f3.isEmpty)
    // vowel-group estimator: "beautiful" -> eau,i,u = 3; "education" ->
    // e,u,a,io = 4; one sentence (no terminator -> floor 1)
    val (_, s2, w2, y2, f2) = got(2L)
    assert((s2, w2, y2) == ((1L, 2L, 7L)))
    assert(f2.contains(206.835 - 1.015 * 2.0 - 84.6 * 3.5))
  }

  test("mrr report: hit ranks exact, miss scores zero, top-1 index gives MRR 1") {
    import spark.implicits._
    val exact = Seq((1L, 10L, 0.9, 1L), (1L, 11L, 0.8, 2L), (2L, 20L, 0.7, 1L))
      .toDF("query_id", "neighbor_id", "score", "rank")
    // index finds query 1's truth at rank 3, misses query 2's entirely
    val ann = Seq((1L, 12L, 0.95, 1L), (1L, 13L, 0.92, 2L), (1L, 10L, 0.9, 3L),
      (2L, 21L, 0.6, 1L)).toDF("query_id", "neighbor_id", "score", "rank")
    val got = graft.ext.Similarity.mrrReport(ann, exact)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10L, 3L, 1.0 / 3.0), (2L, 20L, 0L, 0.0)))
    // a perfect index: ann == exact -> every rr is 1
    val perfect = graft.ext.Similarity.mrrReport(exact, exact)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(perfect.forall(_._4 == 1.0))
  }

  test("k-anonymity: violating combos are exactly the under-k groups") {
    val cust = Tables.customer(spark, "/root/testdata/sf0.001")
    val viol = graft.rel.Relational.kAnonymityViolations(cust, 3)
      .as[(String, Int, Long, Long)].collect().toSeq
    assert(viol.forall(_._4 < 3))
    // recompute group sizes naively and compare the violating set
    import org.apache.spark.sql.functions.{col, count => cnt, floor, lit}
    val all = cust.groupBy(col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("b"))
      .agg(cnt(lit(1)).as("n")).as[(String, Int, Long, Long)].collect().toSeq
    assert(viol.toSet == all.filter(_._4 < 3).toSet)
    // k is monotone: raising it can only add violations
    val viol5 = graft.rel.Relational.kAnonymityViolations(cust, 5)
      .as[(String, Int, Long, Long)].collect().toSeq
    assert(viol.toSet.subsetOf(viol5.toSet))
  }

  test("word-count total == token count for any corpus") {
    check("wc-conservation", Prop.forAll(corpusGen) { rows =>
      val df = rows.toDF("doc_id", "text", "source")
      val total = WordCount.wordCount(df)
        .agg(coalesce(sum("cnt"), lit(0L))).as[Long].head()
      total == graft.text.Tokenize.tokenize(df).count()
    })
  }

  test("inverted-index row sums == word counts (postings conservation)") {
    check("ii-conservation", Prop.forAll(corpusGen) { rows =>
      val df = rows.toDF("doc_id", "text", "source")
      val fromIndex = InvertedIndex.flat(df)
        .groupBy("word").agg(sum("cnt").as("cnt"))
        .as[(String, Long)].collect().toMap
      val direct = WordCount.wordCount(df).as[(String, Long)].collect().toMap
      fromIndex == direct
    })
  }

  test("exact dedup is idempotent and never grows") {
    check("dedup-idempotent", Prop.forAll(corpusGen) { rows =>
      val df = rows.toDF("doc_id", "text", "source")
      val once = Dedup.exactDedup(df)
      val twice = Dedup.exactDedup(once)
      val a = once.select("doc_id").as[Long].collect().sorted.toSeq
      val b = twice.select("doc_id").as[Long].collect().sorted.toSeq
      a == b && a.length <= rows.length
    })
  }

  test("TopKAggregator == sort-take under any partitioning") {
    val scores = for {
      n <- Gen.choose(0, 60)
      xs <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 20L), Gen.choose(-5.0, 5.0)))
    } yield xs.zipWithIndex.map { case ((q, s), i) => (q, i.toLong, s) }
    check("topk", Prop.forAll(scores, Gen.choose(1, 7), Gen.choose(1, 5)) {
      (rows, k, parts) =>
        val topk = org.apache.spark.sql.functions.udaf(
          new graft.core.TopKAggregator(k),
          org.apache.spark.sql.Encoders.product[graft.core.Scored])
        val df = rows.toDF("query_id", "neighbor_id", "score").repartition(parts)
        val got = df.groupBy("query_id")
          .agg(topk(col("score"), col("neighbor_id")).as("top"))
          .select(col("query_id"), explode(col("top")).as("s"))
          .select(col("query_id"), col("s.id"), col("s.score"))
          .as[(Long, Long, Double)].collect().toSet
        val want = rows.groupBy(_._1).flatMap { case (q, rs) =>
          rs.map(r => (r._3, r._2)).sortBy(t => (-t._1, t._2)).take(k)
            .map(t => (q, t._2, t._1))
        }.toSet
        got == want
    })
  }

  test("quantile sketch == pure-Scala sampler model under any partitioning") {
    // independent reimplementation of the contract: hash, trailing-zero
    // level, smallest-fitting cut, (value, hashed-id) order, ceil-division
    // index pick, strictly-below rank — then compared row for row
    def model(rows: Seq[(Long, Long)], qs: Seq[Int], cap: Long)
        : Seq[(Long, Long, Long, Long, Long, Long, Long, Long, Long)] = {
      if (rows.isEmpty) return Seq.empty
      def hash(id: Long): Long = {
        val i = Math.floorMod(id, 2147483648L)
        val h0 = (i * 2654435761L) % 2147483648L
        val h1 = h0 ^ (h0 / 65536)
        val h2 = (h1 * 2246822519L) % 2147483648L
        h2 ^ (h2 / 8192)
      }
      def lvl(h: Long): Int = if (h == 0) 31 else java.lang.Long.numberOfTrailingZeros(h)
      val staged = rows.map { case (id, v) =>
        (v, Math.floorMod(id, 2147483648L), lvl(hash(id))) }
      val cut = (0 to 31).find(l => staged.count(_._3 >= l) <= cap)
      cut match {
        case None => Seq.empty
        case Some(l) =>
          val kept = staged.filter(_._3 >= l).map(t => (t._1, t._2)).sorted
          val n = rows.size.toLong
          val w = 1L << l
          qs.map { q =>
            val t = (q * n + 99) / 100
            val idx = math.min((t + w - 1) / w, kept.size.toLong)
            val est = kept(idx.toInt - 1)._1
            val rank = rows.count(_._2 < est) + 1L
            (q.toLong, n, l.toLong, kept.size.toLong, t, idx, est, rank,
              math.abs(rank - t))
          }
      }
    }
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 1000000L), Gen.choose(0L, 40L)))
    } yield rows.groupBy(_._1).map(_._2.head).toSeq // distinct ids
    check("qsketch", Prop.forAll(gen, Gen.choose(1, 5)) { (rows, parts) =>
      val df = rows.toDF("id", "value").repartition(parts)
      val got = graft.ext.Sketches
        .quantileSketch(df, "value", col("id"), Seq(25, 50, 75, 95), capacity = 8L)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect().toSeq.sortBy(_._1)
      got == model(rows, Seq(25, 50, 75, 95), 8L).sortBy(_._1)
    })
  }

  test("identical docs always share minhash signatures") {
    check("minhash-identical", Prop.forAll(doc.suchThat(_.trim.nonEmpty)) { t =>
      val df = Seq((0L, t, "a"), (1L, t, "b")).toDF("doc_id", "text", "source")
      val sigs = Dedup.minhashFlat(df, numHashes = 4)
        .select("doc_id", "h_idx", "minhash")
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).sortBy(_._1).toSeq)
      sigs(0L) == sigs(1L)
    })
  }

  test("scrub is idempotent: scrubbing clean text changes nothing") {
    val messy = Gen.oneOf(
      "see https://x.io/a and bob@x.io", "a  b\tc", "", "   ", "plain words only")
    check("scrub-idempotent", Prop.forAll(Gen.listOfN(3, messy)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = graft.ext.TextStats.scrub(df)
        .select(col("doc_id"), col("clean_text").as("text"))
      val twice = graft.ext.TextStats.scrub(once)
      twice.filter(col("n_urls") =!= 0 || col("n_emails") =!= 0 ||
        col("n_chars_removed") =!= 0).count() == 0
    })
  }

  test("splits partition every doc into exactly one of train/val/test") {
    check("splits-partition", Prop.forAll(corpusGen) { rows =>
      val df = rows.toDF("doc_id", "text", "source")
      val s = graft.ext.TrainingPipeline.assignSplits(df)
      s.count() == df.count() &&
        s.filter(!col("split").isin("train", "val", "test")).count() == 0 &&
        s.filter(col("bucket") < 0 || col("bucket") >= 100).count() == 0
    })
  }

  test("per-group sample == the global sampler run on each group alone") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val per = graft.ext.TrainingPipeline.weightedSamplePerGroup(docs, 5)
      .as[(String, Long, Long, Double)].collect().toSeq
    val groups = per.map(_._1).distinct
    assert(groups.size > 1, "fixture must have several sources")
    groups.foreach { g =>
      val alone = graft.ext.TrainingPipeline
        .weightedSample(docs.filter(col("source") === g), 5)
        .as[(Long, Long, Double)].collect().toSeq
      assert(per.filter(_._1 == g).map(r => (r._2, r._3, r._4)) == alone,
        s"group $g diverges from the global sampler on its own slice")
    }
    // k per group, exactly (every fixture source has >= 5 weighted docs)
    assert(per.groupBy(_._1).values.forall(_.size == 5))
  }

  test("weighted samples nest: the k-sample is a prefix of the (k+2)-sample") {
    // A-ES top-k by a fixed key order ⇒ samples are nested in k
    val weighted = for {
      n <- Gen.choose(1, 30)
      ws <- Gen.listOfN(n, Gen.choose(1L, 1000L))
    } yield ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    check("weighted-sample-nesting", Prop.forAll(weighted, Gen.choose(1, 10)) { (rows, k) =>
      val df = rows.toDF("doc_id", "w")
      val small = graft.ext.TrainingPipeline.weightedSample(df, k, weightCol = "w")
        .select("doc_id").as[Long].collect().toSet
      val big = graft.ext.TrainingPipeline.weightedSample(df, k + 2, weightCol = "w")
        .select("doc_id").as[Long].collect().toSet
      small.subsetOf(big) && small.size == math.min(k, rows.size)
    })
  }

  test("token budget keeps a rank-prefix and is monotonic in the budget") {
    check("token-budget-prefix", Prop.forAll(corpusGen, Gen.choose(1L, 60L)) { (rows, budget) =>
      val df = rows.toDF("doc_id", "text", "source")
      val small = graft.ext.TrainingPipeline.tokenBudget(df, budget)
        .select("doc_id").as[Long].collect().toSet
      val big = graft.ext.TrainingPipeline.tokenBudget(df, budget + 10)
        .select("doc_id").as[Long].collect().toSet
      // monotone: a bigger budget never loses a kept doc; the kept total
      // never exceeds the budget
      val kept = graft.ext.TrainingPipeline.tokenBudget(df, budget)
        .agg(coalesce(sum("n_tokens"), lit(0L))).as[Long].head()
      small.subsetOf(big) && kept <= budget
    })
  }

  test("BPE selectBatch: greedy, budget-bounded, pairwise-disjoint, order-respecting") {
    val sym = Gen.oneOf("a", "b", "c", "ab", "bc", "d")
    val cand = for { a <- sym; b <- sym; c <- Gen.choose(1L, 99L) } yield (a, b, c)
    val gen = for {
      n <- Gen.choose(0, 20)
      cands <- Gen.listOfN(n, cand)
      budget <- Gen.choose(1, 6)
    } yield (cands.distinct, budget)
    check("select-batch", Prop.forAll(gen) { case (cands, budget) =>
      // shrinking may push budget below the generator's range — guard
      budget < 1 || {
        val picked = graft.ext.Bpe.selectBatch(cands, budget)
        // disjointness is BETWEEN picks ((a,a) is a legal single merge):
        // no two picks may share any of {lhs, rhs, lhs+rhs}
        val sets = picked.map(p => Set(p._1, p._2, p._1 + p._2))
        val disjoint = sets.combinations(2).forall { case Seq(x, y) => (x & y).isEmpty }
        picked.size <= budget && disjoint &&
          (cands.isEmpty || picked.headOption.contains(cands.head)) && // greedy start
          picked.forall(cands.contains) &&
          // selection preserves candidate order
          picked.map(cands.indexOf) == picked.map(cands.indexOf).sorted
      }
    })
  }

  test("BPE applyMerges == the naive greedy lookback scan for any disjoint batch") {
    // the pure-Scala reference of the canonical non-overlapping pass; the
    // Column fold must agree on every (word, disjoint-rule-set) input
    def naive(syms: Seq[String], rules: Set[(String, String)]): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pend: Option[String] = None
      syms.foreach { s =>
        pend match {
          case Some(p) if rules((p, s)) => out += (p + s); pend = None
          case Some(p) => out += p; pend = Some(s)
          case None => pend = Some(s)
        }
      }
      pend.foreach(out += _)
      out.toSeq
    }
    val sym = Gen.oneOf("a", "b", "c")
    val gen = for {
      n <- Gen.choose(1, 12)
      word <- Gen.listOfN(n, sym)
      m <- Gen.choose(1, 8)
      cands <- Gen.listOfN(m, for { a <- sym; b <- sym } yield (a, b, 1L))
      budget <- Gen.choose(1, 3)
    } yield (word, graft.ext.Bpe.selectBatch(cands.distinct, budget))
    check("apply-merges", Prop.forAll(gen) { case (word, picked) =>
      picked.isEmpty || {
        val rules = picked.map(p => (p._1, p._2))
        val got = Seq(Tuple1(word)).toDF("l")
          .select(graft.ext.Bpe.applyMerges(col("l"), rules).as("l"))
          .as[Seq[String]].head()
        got == naive(word, rules.toSet)
      }
    })
  }

  test("snapped kmeans == pure-Scala integer replay for any corpus, dials, partitioning") {
    // the cross-engine-exactness claim, property-tested: for random
    // float vectors, any nlist/iters, any input partitioning, the
    // engine's assignments must equal a from-scratch Scala replay of the
    // integer recipe (floor-quantize, lowest-id seeds, |c|^2 - 2 w.c
    // argmin with lowest-cell ties, (2s+n)/(2n) snap, empty cells keep
    // their centroid)
    val vecGen = Gen.listOfN(4, Gen.choose(-1.0, 1.0)).map(_.map(_.toFloat))
    val embGen = for {
      n <- Gen.choose(0, 18)
      vs <- Gen.listOfN(n, vecGen)
    } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
    check("kmeans-snapped",
      Prop.forAll(embGen, Gen.choose(1, 5), Gen.choose(1, 3), Gen.choose(1, 4)) {
        (rows, nlist, iters, parts) =>
          val df = rows.toDF("vec_id", "embedding").repartition(parts)
          val got = graft.ext.Ivf.kmeansAssignSnapped(df, nlist, iters)
            .as[(Long, Int, Long)].collect().map(r => r._1 -> r._2).toMap
          val w = rows.sortBy(_._1).map { case (id, v) =>
            id -> v.toSeq.map(x => math.floor(x.toDouble * 1e6).toLong + 8000000L) }
          var cents = w.take(nlist).map(_._2).toVector
          def assign(x: Seq[Long]): Int = cents.zipWithIndex.map { case (c, i) =>
            (c.map(y => y * y).sum - 2L * x.zip(c).map { case (a, b) => a * b }.sum, i)
          }.min._2
          if (cents.isEmpty) got.isEmpty
          else {
            for (_ <- 0 until iters) {
              val byCell = w.groupBy { case (_, x) => assign(x) }
              cents = cents.zipWithIndex.map { case (c, i) =>
                byCell.get(i).fold(c) { ms =>
                  val n = ms.size.toLong
                  c.indices.map(d => (2 * ms.map(_._2(d)).sum + n) / (2 * n))
                }
              }
            }
            got == w.map { case (id, x) => id -> assign(x) }.toMap
          }
      })
  }

  test("PageRank conserves mass when no node dangles") {
    // closed graphs (every node has out-edges): total rank stays SCALE
    // within integer-division slack of a few units per node per round
    val cycleGen = for {
      n <- Gen.choose(2, 12)
      ws <- Gen.listOfN(n, Gen.choose(1L, 9L))
    } yield ws.zipWithIndex.map { case (w, i) =>
      (s"n$i", s"n${(i + 1) % n}", w) }
    check("pagerank-mass", Prop.forAll(cycleGen) { edges =>
      val df = edges.toDF("src", "dst", "w")
      val total = graft.ext.Graph.pageRank(df, iters = 4)
        .agg(sum("rank_scaled")).as[Long].head()
      val slack = edges.size.toLong * 5 * 4 // n nodes × rounds × div losses
      math.abs(total - graft.ext.Graph.SCALE) <= slack
    })
  }
}
