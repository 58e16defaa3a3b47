package graft

import graft.rel.Relational
import graft.streaming.EventsStream
import org.apache.spark.sql.functions._

/** Streaming/batch parity: the watermarked streaming aggregation and the
  * stateful sessionizer must agree with their batch formulations when the
  * stream is drained to completion. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming hourly stats == batch hourly stats") {
    val stream = EventsStream.hourlyStats(EventsStream.readEvents(spark, dir))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("hourly_out").start()
    try {
      q.processAllAvailable()
      // append mode only emits windows the watermark has passed; on a
      // finite file source that's all but the trailing windows — compare
      // the emitted subset against batch.
      val got = spark.table("hourly_out")
        .select("hour_start", "event_type", "n", "sum_value")
        .as[(Long, String, Long, Double)].collect().toSet
      val batch = Relational.hourlyEventStats(Tables.events(spark, dir))
        .as[(Long, String, Long, Double)].collect().toSet
      assert(got.nonEmpty, "stream emitted no closed windows")
      assert(got.subsetOf(batch), "streaming windows disagree with batch")
    } finally q.stop()
  }

  test("stream-stream interval join == batch range join") {
    val stream = EventsStream.purchasesAfterErrors(
      EventsStream.readEvents(spark, dir), bandMinutes = 30)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("ss_join_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ss_join_out")
        .select("user_id", "event_id", "err_ts").as[(Long, Long, java.sql.Timestamp)]
        .collect().toSet
      val ev = Tables.events(spark, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id").as("err_user"), col("ts").as("err_ts"))
      val batch = ev.filter(col("event_type") === "purchase")
        .join(errors, expr(
          "user_id = err_user AND ts >= err_ts AND ts <= err_ts + interval 30 minutes"))
        .select("user_id", "event_id", "err_ts").as[(Long, Long, java.sql.Timestamp)]
        .collect().toSet
      assert(got == batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("native session_window streaming agg == batch session_window") {
    val stream = EventsStream.sessionWindowStats(EventsStream.readEvents(spark, dir))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("sess_win_out").start()
    try {
      q.processAllAvailable()
      // append emits sessions closed by the watermark; on a finite source
      // that's all but the trailing ones — a subset of the batch result
      val got = spark.table("sess_win_out")
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = EventsStream.sessionWindowStats(Tables.events(spark, dir))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got.nonEmpty, "no sessions closed")
      assert(got.subsetOf(batch), "streamed sessions disagree with batch")
      // and the custom state machine agrees with the native operator on
      // (user, start, n, cents) for every batch-computed session
      val custom = EventsStream.sessionizeStream(spark,
          Tables.events(spark, dir), flushOpen = true)
        .collect().map(s => (s.user_id, s.session_start_ms, s.n_events, s.session_value_cents))
        .toSet
      assert(batch == custom, "session_window and flatMapGroupsWithState disagree")
    } finally q.stop()
  }

  test("landed complete-mode window agg == batch, exactly (the graded form)") {
    // complete mode on a drained finite source must hold EVERY window —
    // set equality, not the append-mode subset relation
    val got = EventsStream.hourlyStatsLanded(spark, dir)
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = Relational.hourlyEventStats(Tables.events(spark, dir))
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got == batch)
    assert(got.nonEmpty)
    // repeated invocation must not collide on the memory-sink view name
    val again = EventsStream.hourlyStatsLanded(spark, dir)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(again == batch)
  }

  test("late-data accounting: planted late rows drop, kept set lands, in-flight withheld") {
    import org.apache.spark.sql.functions._
    // run the graded drain by hand to capture the drop metric
    val agg = EventsStream.lateWindowAgg(EventsStream.lateStream(spark, dir))
    val q = agg.writeStream.outputMode("append").format("memory").queryName("late_spec")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val landed = spark.table("late_spec")
      .as[(Long, String, Long)].collect().toSet
    // batch ground truth: on-time rows at T0+(id%48)h plus the T0+47h
    // carrier batch; late (id%10=8) and advancer (id%20=19) rows excluded
    val ev = Tables.events(spark, dir).select(col("event_id"), col("event_type"))
    val kept = ev.filter(col("event_id") % 10 < 8)
      .withColumn("hoff", col("event_id") % 48)
      .unionByName(ev.filter(col("event_id") % 20 === 9).withColumn("hoff", lit(47L)))
      .groupBy((lit(EventsStream.LateT0) + col("hoff") * 3600L).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(landed == kept, "landed must be exactly the kept set's hourly counts")
    // the drop metric counts post-partial-agg group rows: one per
    // distinct (late window, event_type) the planted rows spanned
    val expectedDropGroups = ev.filter(col("event_id") % 10 === 8)
      .select((col("event_id") % 20).as("w"), col("event_type")).distinct().count()
    val dropped = q.recentProgress.map(_.stateOperators.map(_.numRowsDroppedByWatermark).sum).sum
    assert(dropped == expectedDropGroups,
      s"watermark must drop exactly the planted late groups ($expectedDropGroups), got $dropped")
    // no advancer window may land (their windows end past the final watermark)
    assert(!landed.exists(_._1 >= EventsStream.LateT0 + 50L * 3600L),
      "in-flight windows must be withheld in append mode")
  }

  test("landed streaming dedup == batch distinct key set") {
    val got = EventsStream.dedupKeysLanded(spark, dir)
      .as[(Long, String)].collect().toSet
    val batch = Tables.events(spark, dir)
      .select("user_id", "event_type").distinct()
      .as[(Long, String)].collect().toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("landed complete-mode session windows == batch session windows, exactly") {
    val got = EventsStream.sessionWindowLanded(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = EventsStream.sessionWindowStats(Tables.events(spark, dir))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("landed stream-stream join == batch range join, exactly") {
    val got = EventsStream.purchasesAfterErrorsLanded(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    val ev = Tables.events(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("err_user"), col("ts").as("err_ts"))
    val batch = ev.filter(col("event_type") === "purchase")
      .join(errors, expr(
        "user_id = err_user AND ts >= err_ts AND ts <= err_ts + interval 30 minutes"))
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"), unix_millis(col("err_ts")).as("err_ts_ms"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("foreachBatch parquet sink lands the streamed aggregates") {
    val out = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val stream = EventsStream.hourlyStats(EventsStream.readEvents(spark, dir))
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(out)
      }.start()
    try {
      q.processAllAvailable()
      val landed = spark.read.parquet(out)
        .select("hour_start", "event_type", "n", "sum_value")
        .as[(Long, String, Long, Double)].collect().toSet
      val batch = Relational.hourlyEventStats(Tables.events(spark, dir))
        .as[(Long, String, Long, Double)].collect().toSet
      assert(landed.nonEmpty && landed.subsetOf(batch))
    } finally q.stop()
  }

  test("sessionizer: out-of-order events across micro-batches never split or shrink a session") {
    // late events from a later micro-batch must clamp, not overwrite,
    // session bounds: without min/max the regressed end makes the next
    // in-order event look past the gap and spuriously splits the session
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream // moved in Spark 4.1
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = new java.sql.Timestamp(3600_000L + m * 60_000L)
    val src = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val events = src.toDF.toDF("user_id", "ts", "value")
    val stream = EventsStream.sessionizeStream(spark, events, gapMinutes = 30)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("ooo_sessions").start()
    try {
      src.addData((1L, ts(60), 1.0), (1L, ts(70), 1.0)); q.processAllAvailable()
      src.addData((1L, ts(58), 1.0), (1L, ts(99), 1.0)); q.processAllAvailable()
      src.addData((1L, ts(180), 1.0)); q.processAllAvailable() // closes it
      val sessions = spark.table("ooo_sessions")
        .select("user_id", "session_start_ms", "session_end_ms", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(sessions == Seq((1L, ts(58).getTime, ts(99).getTime, 4L)),
        sessions.mkString("; "))
    } finally q.stop()
  }

  test("stateful sessionizer == batch sessionize") {
    val stream = EventsStream.sessionizeStream(
      spark, EventsStream.readEvents(spark, dir), gapMinutes = 30, flushOpen = true)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sessions_out")
        .select(col("user_id"), col("n_events"),
          (col("session_end_ms") - col("session_start_ms")).as("duration_ms"),
          (col("session_value_cents").cast("double") / 100.0).as("session_value"))
        .as[(Long, Long, Long, Double)].collect().toSeq.sorted
      val batch = Relational.sessionize(Tables.events(spark, dir), 30)
        .select("user_id", "n_events", "duration_ms", "session_value")
        .as[(Long, Long, Long, Double)].collect().toSeq.sorted
      assert(got == batch)
    } finally q.stop()
  }

  test("left-outer stream-stream join: nulls emitted by watermark proof, in-flight withheld") {
    val landed = EventsStream.outerJoinLanded(spark, dir)
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    // both classes present: matched rows carry err_sec, unmatched carry null
    val (matched, unmatched) = landed.partition(_._4.isDefined)
    assert(matched.nonEmpty && unmatched.nonEmpty)
    // the advancer purchase (event_id -1) must NOT land: its horizon never
    // closes, so an engine that flushes state at stream end fails here
    assert(!landed.exists(_._1 == -1L))
    // exact parity with the batch left join over the same closed-form fixture
    val ev = Tables.events(spark, dir).select(col("event_id"))
    val p = ev.filter(col("event_id") % 10 === 0)
      .select(col("event_id"), expr("(event_id div 10) % 100").as("user_id"),
        (lit(1704067200L) + (col("event_id") % 29) * 600L).as("ts_sec"))
    val e = ev.filter(col("event_id") % 10 === 1)
      .select(expr("(event_id div 10) % 100").as("err_user"),
        (lit(1704067200L) + (col("event_id") % 31) * 600L).as("err_sec"))
    val want = p.join(e, col("user_id") === col("err_user") &&
        col("ts_sec") >= col("err_sec") && col("ts_sec") <= col("err_sec") + 1800L,
        "left_outer")
      .select(col("event_id"), col("user_id"), col("ts_sec"), col("err_sec"))
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(landed.sorted == want.sorted)
  }

  test("windowed top-k: streamed counts ranked per window == batch top-k") {
    val k = 5
    val got = EventsStream.topUsersPerHourLanded(spark, dir, k)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // batch reference: full histogram, rank per window by (n desc, user)
    val hist = Tables.events(spark, dir)
      .groupBy(expr("CAST(unix_timestamp(date_trunc('hour', ts)) AS LONG)").as("h"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    val want = hist.groupBy(_._1).toSeq.flatMap { case (h, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex
        .map { case ((_, u, n), i) => (h, u, n, i + 1L) }
    }.sortBy(r => (r._1, r._4))
    assert(got == want)
    assert(got.nonEmpty)
    // every window contributes at most k rows, ranks dense from 1
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted == (1L to rows.length.toLong))
      assert(rows.length <= k)
    }
  }

  test("streaming CDC -> SCD2: per-batch fold == batch full recompute") {
    val got = EventsStream.scd2StreamLanded(spark, dir)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // batch reference: scdHistory over the equivalent snapshot stack
    val d = Tables.documents(spark, dir).select("doc_id", "text")
    val t2 = when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
      .otherwise(col("text"))
    val v1 = d.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), col("text"), lit(1L).as("version"))
    val v2 = d.select(col("doc_id"), t2.as("text"), lit(2L).as("version"))
    val v3 = d.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(t2, lit(" v3"))).otherwise(t2).as("text"),
        lit(3L).as("version"))
    val want = ext.Incremental.scdHistory(v1.unionByName(v2).unionByName(v3))
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // re-invocation reuses the staged fixture and folds from scratch
    val again = EventsStream.scd2StreamLanded(spark, dir)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(again == want)
  }

  test("streaming IVM: per-batch maintained view == full recompute over merged base") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text", "source")
    // the REAL shared CDC change log the batch queries use (no hand-copy)
    val changes = SparkEntry.cdcChanges(docs)
    val got = EventsStream.incrAggStreamLanded(spark, dir, docs, changes)
      .as[(String, Long, Long)].collect().toSeq
    val want = ext.Incremental.charAggregate(
        ext.Incremental.applyChanges(docs, changes, Seq("text", "source")))
      .orderBy("source").as[(String, Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("CDC fixture dirs are content-keyed: two change-sets in one session never collide") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text", "source")
    val sNull = lit(null).cast("string")
    def mkChanges(rev: String, m: Int): org.apache.spark.sql.DataFrame = {
      val c1 = docs.filter(col("doc_id") % m === 0)
        .select(col("doc_id"), lit(1L).as("seq"), lit("upsert").as("op"),
          concat(col("text"), lit(s" $rev")).as("text"), col("source"))
      val c2 = docs.filter(col("doc_id") % (m + 1) === 0)
        .select(col("doc_id"), lit(2L).as("seq"), lit("delete").as("op"),
          sNull.as("text"), sNull.as("source"))
      c1.unionByName(c2)
    }
    val a = mkChanges("alpha", 4)
    val b = mkChanges("beta", 6)
    val dirA = EventsStream.cdcBatchFixtureDir(spark, dir, a)
    val dirB = EventsStream.cdcBatchFixtureDir(spark, dir, b)
    assert(dirA != dirB, "different change-sets must stage to different dirs")
    // each staged dir round-trips ITS OWN change rows, not the first caller's
    def staged(d: String): Set[(Long, Long, String)] =
      spark.read.parquet(s"$d/seq1.parquet", s"$d/seq2.parquet")
        .select(col("doc_id"), col("seq"), coalesce(col("text"), lit("")).as("text"))
        .as[(Long, Long, String)].collect().toSet
    def direct(c: org.apache.spark.sql.DataFrame): Set[(Long, Long, String)] =
      c.select(col("doc_id"), col("seq"), coalesce(col("text"), lit("")).as("text"))
        .as[(Long, Long, String)].collect().toSet
    assert(staged(dirA) == direct(a))
    assert(staged(dirB) == direct(b))
    // memoized re-invocation returns the same dir for the same content
    assert(EventsStream.cdcBatchFixtureDir(spark, dir, a) == dirA)
  }

  test("maintained quantile sketch across micro-batches == single-pass batch sketch") {
    val got = EventsStream.quantileSketchStreamLanded(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val want = ext.Sketches.quantileSketch(
        Tables.events(spark, dir), "user_id", col("event_id"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == want,
      s"per-batch union+recut drifted from the direct sketch:\n got=$got\nwant=$want")
    assert(got.nonEmpty && got.forall(_._4 <= ext.Sketches.QsCapacity))
  }

  test("maintained theta sketch across micro-batches == single-pass batch sketch") {
    val got = EventsStream.thetaSketchStreamLanded(spark, dir)
      .as[(String, Long, Long, String, Long, Long)].collect().toSeq
    val want = ext.Sketches.thetaSketch(Tables.events(spark, dir),
        "event_type", "event_id")
      .as[(String, Long, Long, String, Long, Long)].collect().toSeq
    assert(got == want,
      s"cross-batch KMV fold drifted from the direct sketch:\n got=$got\nwant=$want")
    assert(got.nonEmpty && got.forall(_._2 <= ext.Sketches.ThetaK))
  }

  test("maintained HLL sketch across micro-batches == single-pass batch sketch") {
    val got = EventsStream.hllStreamLanded(spark, dir)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    val want = ext.Sketches.hllDistinct(Tables.events(spark, dir),
        "event_type", "event_id")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == want,
      s"cross-batch register-max fold drifted from the direct sketch:\n got=$got\nwant=$want")
    assert(got.nonEmpty)
  }

  test("maintained bloom bits across micro-batches == single-pass batch state") {
    val got = EventsStream.bloomStreamLanded(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    val events = Tables.events(spark, dir)
    val want = ext.Sketches.bloomReportFromState(
        ext.Sketches.bloomBitsState(events, "event_type", "event_id"),
        events, "event_type", "event_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == want,
      s"cross-batch bit OR-merge drifted from the direct filter:\n got=$got\nwant=$want")
    // state is bounded by m bits per group whatever the stream length
    assert(got.nonEmpty && got.forall(_._2 <= ext.Sketches.BloomM))
  }

  test("maintained CMS counters across micro-batches == single-pass batch table") {
    val got = EventsStream.cmsStreamLanded(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val events = Tables.events(spark, dir)
    val want = ext.Sketches.cmsReportFromState(
        ext.Sketches.cmsState(events, "user_id"), events, "user_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want,
      s"cross-batch counter sums drifted from the direct table:\n got=$got\nwant=$want")
    // the one-sided guarantee: estimates never undercount
    assert(got.nonEmpty && got.forall(_._4 >= 0L))
  }

  test("maintained frontier: seen-set suppresses re-announced URLs across waves") {
    val landed = EventsStream.frontierStreamLanded(spark, dir)
      .as[(String, String, String)].collect().toSeq
    val docs = Tables.documents(spark, dir)
    val batchFrontier = ext.Frontier.crawlFrontier(docs)
      .select("canonical_url", "path", "matched_rule")
      .as[(String, String, String)].collect().toSeq
    assert(landed == batchFrontier.sortBy(_._1),
      "streamed frontier must equal the batch frontier's gated set")
    assert(landed.distinct == landed, "a canonical URL landed twice")
    // the cross-batch suppression is real: wave 1 (odd docs) re-announces
    // shared targets (ext-hosts, /p, /q…), so its landing must be a
    // STRICT subset of its own candidate set
    val base = java.nio.file.Paths.get(
      s"/tmp/graft_stream_frontier_${spark.sparkContext.applicationId}_" +
        dir.replaceAll("[^A-Za-z0-9]", "_"))
    val wave1Landed = spark.read.parquet(base.resolve("data/bid=1").toString).count()
    val wave1Cands = ext.Frontier
      .candidates(docs.filter(col("doc_id") % 2 === 1).select("doc_id", "source"))
      .filter(col("__rule.allow") === 1)
      .select("canonical_url").distinct().count()
    assert(wave1Landed < wave1Cands,
      s"wave 1 landed $wave1Landed of $wave1Cands candidates — nothing was suppressed")
    assert(wave1Landed > 0, "wave 1 must still contribute its novel URLs")
  }

  test("checkpoint schema evolution: additive column recovers; key change fails loudly") {
    // additive path: gen1 drains under v1, gen2 lands with a new value
    // column, the restart reads the widened schema against the SAME
    // checkpoint — dedup state survives, nothing replays, no key twice
    val landed = EventsStream.schemaEvolvedDedupLanded(spark, dir)
      .as[(Long, String)].collect().toSeq
    val batch = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
      .orderBy("user_id", "event_type").as[(Long, String)].collect().toSeq
    assert(landed == batch,
      "evolved landing must equal the batch distinct set row for row")
    assert(landed.distinct == landed,
      "a key landed twice: dedup state was lost across the schema change")
    // both generations genuinely landed as separate micro-batches
    val base = EventsStream.evolveBase(spark, dir, wipe = false)
    val bids = java.nio.file.Files.list(base.resolve("data")).iterator()
    val bidDirs = Iterator.continually(bids).takeWhile(_.hasNext).map(_.next())
      .map(_.getFileName.toString).filter(_.startsWith("bid=")).toSeq
    assert(bidDirs.size >= 2, s"expected >=2 micro-batch landings, got $bidDirs")
    // loud sibling: restarting with the dedup key set WIDENED (value
    // now part of the state row) against the same checkpoint must fail
    // with the state-schema incompatibility error, not mix states. A
    // generation-3 file is staged first — with no new input the restart
    // never loads state and the incompatibility would go undetected
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value")).limit(50)
      .coalesce(1).write.mode("append").parquet(base.resolve("src").toString)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      EventsStream.evolveDrain(spark, base, EventsStream.evolveSchemaV2,
        Seq("user_id", "event_type", "value"))
    }
    val msg = (e.getMessage + " " +
      Iterator.iterate(e.getCause)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" ")).toLowerCase
    assert(msg.contains("schema") || msg.contains("state"),
      s"expected a state-schema incompatibility, got: ${e.getMessage.take(300)}")
  }

  test("crash recovery: killed drain restarts exactly-once through the parquet sink") {
    val recovered = EventsStream.recoveredDedupLanded(spark, dir)
      .as[(Long, String)].collect().toSeq
    val batch = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
      .orderBy("user_id", "event_type").as[(Long, String)].collect().toSeq
    assert(recovered == batch,
      "recovered landing must equal the batch distinct set row for row")
    // no key may land twice across batch-id dirs: duplicates are exactly
    // what lost dedup state or a non-idempotent replay would produce
    assert(recovered.distinct == recovered, "duplicate keys in the recovered landing")
    // the kill was genuinely mid-stream: the landing dir holds >= 3
    // batch-id partitions (3 staged files, maxFilesPerTrigger=1) and
    // batch 1's dir was written twice (crash attempt + healed replay) --
    // visible as a strict subset landed before the restart
    val base = java.nio.file.Paths.get(
      s"/tmp/graft_stream_recover_${spark.sparkContext.applicationId}_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")).resolve("data")
    val bids = java.nio.file.Files.list(base).iterator()
    val bidDirs = Iterator.continually(bids).takeWhile(_.hasNext).map(_.next())
      .map(_.getFileName.toString).filter(_.startsWith("bid=")).toSeq
    assert(bidDirs.size >= 3, s"expected >=3 micro-batch landings, got $bidDirs")
  }
}
