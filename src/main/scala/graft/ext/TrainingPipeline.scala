package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.Pinnable

/** The end-to-end corpus-cleaning composite a pre-training data pipeline
  * runs: quality gate → exact dedup → near-dup clustering with
  * keep-one-per-cluster → cleaned corpus + per-stage accounting.
  *
  * Stage order matters at scale: the cheap per-document quality gate runs
  * first (narrow scan, no shuffle) so the dedup machinery only ever sees
  * surviving documents; exact dedup (hash groupBy) then collapses the
  * bulk duplicate mass before MinHash/LSH touches anything.
  */
object TrainingPipeline {

  /** Cleaned corpus: documents that pass the quality gate and are the
    * retained representative of their near-dup cluster. */
  /** The quality gate shared by [[cleanCorpus]] and
    * [[cleanCorpusAudit]]: ids passing the length/stopword/digit
    * thresholds. */
  private def qualityGateIds(docs: DataFrame, minTokens: Int): DataFrame =
    TextStats.qualityScores(docs)
      .filter(col("n_tokens") >= minTokens &&
        col("stopword_ratio") >= 0.01 && col("digit_ratio") <= 0.5)
      .select("doc_id")

  def cleanCorpus(docs: DataFrame, nearDupThreshold: Double = 0.7,
                  minTokens: Int = 10,
                  baseHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column
                    = Dedup.xxHash): DataFrame = {
    // qualified feeds BOTH the near-dup machinery (which is iterative) and
    // the final join — materialize it once so the quality gate isn't
    // recomputed per consumer, and so the clustering loop starts from flat
    // lineage. (localCheckpoint is the local-mode form; a cluster
    // deployment would use a reliable checkpoint dir.)
    val qualified = docs.join(qualityGateIds(docs, minTokens), "doc_id").pinCheckpoint()
    val keep = Dedup.nearDupKeepIds(qualified, nearDupThreshold, baseHash)
    qualified.join(keep, "doc_id").orderBy("doc_id")
  }

  /** Per-document disposition audit of [[cleanCorpus]] — the provenance
    * report a pipeline owner reads to answer "why was my document
    * dropped": one row per INPUT document with
    * `status ∈ {kept, quality, exact_dup, near_dup}` (first gate that
    * dropped it, in pipeline order) and `kept_id` = the representative
    * retained in its place (its near-dup cluster's min id; null for
    * quality drops, itself when kept). `exact_dup` is split out of the
    * near-dup mass — byte-identical to a smaller-id qualified document —
    * because the two classes have different upstream causes (mirrored
    * crawls vs boilerplate drift) and a real datacard reports them
    * separately.
    *
    * Scale shape: the same quality gate + clustering the clean run
    * executes (band equi-joins, pointer-jumped components), plus one
    * content-hash aggregate for the exact split (the text never crosses
    * that shuffle — sha256 group like [[Dedup.exactKeepIds]]) and
    * per-row equi-joins to stitch the report. Auditing costs one extra
    * hash aggregate over the cleaned run, not a new algorithm. */
  def cleanCorpusAudit(docs: DataFrame, nearDupThreshold: Double = 0.7,
                       minTokens: Int = 10,
                       baseHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column
                         = Dedup.xxHash): DataFrame = {
    val qualified = docs.join(qualityGateIds(docs, minTokens), "doc_id").pinCheckpoint()
    val clusters = Dedup.nearDupClusters(qualified, nearDupThreshold, baseHash)
    val reps = clusters.groupBy("cluster_id").agg(min(col("doc_id")).as("kept_id"))
    val clusterRep = clusters.join(reps, "cluster_id").select("doc_id", "kept_id")
    val exactRep = qualified
      .groupBy(sha2(col("text"), 256).as("__sha"))
      .agg(min(col("doc_id")).as("exact_rep"))
    val exact = qualified.select(col("doc_id"), sha2(col("text"), 256).as("__sha"))
      .join(exactRep, "__sha").select("doc_id", "exact_rep")
    docs.select(col("doc_id"))
      .join(clusterRep, Seq("doc_id"), "left")
      .join(exact, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("kept_id").isNull, lit("quality"))
          .when(col("exact_rep") =!= col("doc_id"), lit("exact_dup"))
          .when(col("kept_id") =!= col("doc_id"), lit("near_dup"))
          .otherwise(lit("kept")).as("status"),
        col("kept_id"))
      .orderBy("doc_id")
  }

  /** Deterministic train/val/test assignment by hashing the stable
    * document id into 100 buckets — reproducible across runs, engines and
    * cluster sizes (never `rand()`: a resampled split silently leaks val
    * into train on any retry). polyHash keeps it SQL-reproducible. */
  def assignSplits(docs: DataFrame, trainPct: Int = 98, valPct: Int = 1,
                   idCol: String = "doc_id"): DataFrame = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    docs.select(col(idCol),
        pmod(Dedup.polyHash(col(idCol).cast("string")), lit(100L)).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .orderBy(idCol)
  }

  /** Leakage-safe train/val/test split: the deterministic id-hash split
    * of [[assignSplits]], but at near-dup CLUSTER granularity — every
    * member of a near-dup cluster hashes the same `cluster_id`, so two
    * near-duplicate documents can never land on opposite sides of a
    * split boundary. Per-document splitting silently leaks eval content:
    * a near-copy of a val document sitting in train is memorization the
    * eval can't detect; splitting on the cluster label is the standard
    * guard (the held-out set is disjoint from train at near-dup
    * granularity, not just id granularity).
    *
    * Scale shape: the cluster labels are the pointer-jumped min-label
    * components of the LSH near-dup graph ([[Dedup.nearDupClusters]] —
    * band equi-joins, O(log diameter) label rounds); the split decision
    * itself is a per-row hash with no additional shuffle. Deterministic:
    * same corpus, same threshold → same splits on any engine or
    * partitioning. */
  def assignSplitsByCluster(docs: DataFrame, trainPct: Int = 98, valPct: Int = 1,
                            nearDupThreshold: Double = 0.7,
                            baseHash: Column => Column = Dedup.xxHash,
                            textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    clusterSplit(Dedup.nearDupClusters(docs, nearDupThreshold, baseHash, textCol, idCol),
      trainPct, valPct, idCol)

  /** [[assignSplitsByCluster]] at SEMANTIC granularity: cluster labels
    * come from embedding-cosine near-dup components
    * ([[Dedup.embeddingNearDupClusters]] — IVF cell-pruned exact pairs,
    * never all-pairs), so a paraphrase of an eval document can't sit in
    * train even when its surface text shares no shingles with the
    * original — the leakage mode the text-LSH split can't see. Same
    * deterministic cluster-id hash; same output shape. */
  def assignSplitsByEmbeddingCluster(embeddings: DataFrame, trainPct: Int = 98,
                                     valPct: Int = 1, threshold: Double = 0.9,
                                     nlist: Int = 16, idCol: String = "vec_id",
                                     vecCol: String = "embedding"): DataFrame =
    clusterSplit(Dedup.embeddingNearDupClusters(embeddings, threshold, nlist, idCol, vecCol),
      trainPct, valPct, idCol)

  /** Shared split-decision tail: hash the CLUSTER id into percent
    * buckets, band into train/val/test. */
  private def clusterSplit(clusters: DataFrame, trainPct: Int, valPct: Int,
                           idCol: String): DataFrame = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    clusters.select(col(idCol), col("cluster_id"),
        pmod(Dedup.polyHash(col("cluster_id").cast("string")), lit(100L)).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .orderBy(idCol)
  }

  /** Deterministic pct% sample by the same id-hash mechanism — the
    * debugging/eval subset that is stable across pipeline runs. */
  def sampleByHash(docs: DataFrame, pct: Int, idCol: String = "doc_id"): DataFrame =
    docs.filter(pmod(Dedup.polyHash(col(idCol).cast("string")), lit(100L)) < pct)

  /** Deterministic weighted mixture sampling: per-stratum keep-rates (in
    * percent) applied through the stable id-hash — the domain-reweighting
    * step that turns a raw crawl into a training mixture ("keep 75% of
    * en, 40% of zh, 20% of everything else"). Pure per-row filter: no
    * shuffle, no RNG state, identical keep-set on any retry or cluster
    * size, and composable with [[assignSplits]] because both hash the
    * same stable id. Unknown / null strata fall to `defaultPct`. */
  def mixtureSample(docs: DataFrame, ratesPct: Seq[(String, Int)], defaultPct: Int,
                    strataCol: String = "lang", idCol: String = "doc_id"): DataFrame = {
    require((defaultPct +: ratesPct.map(_._2)).forall(p => p >= 0 && p <= 100),
      "rates are percentages in [0, 100]")
    val pct = ratesPct.foldRight(lit(defaultPct): Column) { case ((stratum, p), els) =>
      when(col(strataCol) === stratum, lit(p)).otherwise(els)
    }
    docs.filter(pmod(Dedup.polyHash(col(idCol).cast("string")), lit(100L)) < pct)
  }

  /** Temperature-weighted mixture: derive each stratum's keep-rate from
    * the corpus itself — kept_s ∝ n_s^0.5 (temperature α = 0.5, the
    * standard pretraining reweighting that upsamples small domains and
    * downsamples head domains) scaled so the expected kept total is
    * `targetPct`% of the corpus — then apply the rates through the same
    * stable id-hash as [[mixtureSample]]. α is fixed at 0.5 because
    * sqrt is IEEE-exact in every engine while a general pow is
    * libm-dependent; the weights snap to floor(sqrt(n)·1e6) BIGINTs so
    * the rate arithmetic is order-independent integer math end-to-end
    * (BigInt here, HUGEINT in the oracle) and the derived percentages
    * replay bit-for-bit.
    *
    * Scale shape: ONE count aggregation (|strata| rows — bounded by the
    * label space, collected driver-side like every centroid/codebook
    * table; a loud guard refuses unbounded strata), then a pure per-row
    * hash filter — no shuffle, no RNG, retry-stable. */
  def temperatureMixture(docs: DataFrame, targetPct: Int,
                         strataCol: String = "lang", idCol: String = "doc_id",
                         maxStrata: Int = 100000): DataFrame = {
    require(targetPct >= 0 && targetPct <= 100, "targetPct is a percentage in [0, 100]")
    require(docs.schema(strataCol).dataType == org.apache.spark.sql.types.StringType,
      s"temperatureMixture: '$strataCol' is ${docs.schema(strataCol).dataType}, not a " +
        "string column — strata are string labels (cast explicitly if a coded column " +
        "is genuinely categorical)")
    val counts = docs.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
      .limit(maxStrata + 1).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getString(0)), r.getLong(1)))
    require(counts.length <= maxStrata,
      s"temperatureMixture: over $maxStrata distinct '$strataCol' strata — the rate " +
        "table is driver-sized by the label space; a near-unique stratum column is " +
        "a key, not a stratum (raise maxStrata only if the cardinality is intended)")
    if (counts.isEmpty) return docs.limit(0)
    val total = counts.map(_._2).sum
    require(total.toDouble <= 9.007199254740992e15,
      "corpus row count exceeds the exact-double sqrt domain (2^53)")
    val target = total * targetPct / 100
    val weights = counts.map { case (s, n) =>
      (s, n, math.floor(math.sqrt(n.toDouble) * 1e6).toLong) }
    val sumW = weights.map(w => BigInt(w._3)).sum
    val pcts: Seq[(String, Int)] = weights.toSeq.map { case (s, n, ws) =>
      val p = (BigInt(100) * BigInt(target) * BigInt(ws)) / (sumW * BigInt(n))
      (s.orNull, p.min(BigInt(100)).toInt)
    }
    // rates apply through a BROADCAST null-safe equi-join, never a
    // per-stratum when() chain: a literal CaseWhen nested |strata| deep
    // overflows Catalyst's recursive tree walks long before maxStrata
    val spark = docs.sparkSession
    import spark.implicits._
    val rates = broadcast(pcts.toDF("__stratum", "__pct"))
    docs.join(rates, col(strataCol) <=> col("__stratum"))
      .filter(pmod(Dedup.polyHash(col(idCol).cast("string")), lit(100L)) < col("__pct"))
      .drop("__stratum", "__pct")
  }

  /** Greedy contiguous sequence packing: walk documents in stable id
    * order, accumulate token counts, and cut a new bin every time the
    * running total crosses `targetTokens` — bin = ⌊exclusive-prefix-sum /
    * target⌋, the deterministic packing a sequence-length-bounded trainer
    * uses to batch variable-length documents.
    *
    * The global prefix sum is the scale hazard: a bare
    * `Window.orderBy(id)` plans as ONE partition holding the whole
    * corpus. This is the two-phase form instead — range-repartition by
    * id, per-partition running sums, then a broadcast of |partitions|
    * offsets (same machinery as the vocabulary ranking; PlanSpec asserts
    * no SinglePartition exchange). */
  /** Pre-checkpoint half of the two-phase prefix sum: range-partitioned
    * per-partition running sums of `n_tokens` in `orderCols` order
    * (exposed so PlanSpec can assert the subplan has no SinglePartition
    * exchange before materialization). Shared by [[packSequences]] and
    * [[tokenBudget]] — one implementation of "the packSequences rule". */
  private[graft] def localCumsum(base: DataFrame, orderCols: Seq[Column],
                                 nParts: Int): DataFrame = {
    val localW = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(orderCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    base.repartitionByRange(nParts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__local", sum(col("n_tokens")).over(localW))
  }

  private[graft] def localCumsum(base: DataFrame, idCol: String, nParts: Int): DataFrame =
    localCumsum(base, Seq(col(idCol).asc), nParts)

  /** Second half of the two-phase prefix sum: global offset per range
    * partition (a P×P triangle join over P partition-size rows — driver-
    * scale), broadcast back onto the materialized local sums. */
  private def withGlobalCumsum(local: DataFrame): DataFrame = {
    val sizes = local.groupBy(col("__pid")).agg(sum(col("n_tokens")).as("__n"))
    val offsets = sizes.as("x")
      .join(sizes.as("y"), col("y.__pid") < col("x.__pid"), "left")
      .groupBy(col("x.__pid").as("__pid"))
      .agg(coalesce(sum(col("y.__n")), lit(0L)).as("__offset"))
    local.join(broadcast(offsets), "__pid")
      .withColumn("cum_tokens", col("__offset") + col("__local"))
  }

  def packSequences(docs: DataFrame, targetTokens: Long = 2048,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(targetTokens > 0, "targetTokens must be positive")
    val spark = docs.sparkSession
    val nParts = spark.sessionState.conf.numShufflePartitions
    val base = docs.select(col(idCol),
      size(graft.text.Tokenize.tokensArray(col(textCol))).cast("long").as("n_tokens"))
    // materialize ONCE: the offsets branch and the final projection must
    // observe the same range-partitioner boundaries (sampled per RDD
    // instantiation)
    val local = localCumsum(base, idCol, nParts).pinCheckpoint()
    withGlobalCumsum(local)
      .select(col(idCol), col("n_tokens"), col("cum_tokens"))
      // `div` is long division (Spark's `/` on longs is DOUBLE division);
      // counts are non-negative so truncation == floor, matching the
      // oracle's `//`
      .withColumn("bin_id", expr(s"(cum_tokens - n_tokens) div $targetTokens"))
      .orderBy(idCol)
  }

  /** Packing-efficiency report over [[packSequences]]' bins: docs,
    * token sum and fill ratio per bin — the waste metric a trainer
    * tracks per dataloader build (low fill = padded compute thrown
    * away). One bin-keyed aggregation on the pack output; the ratio is
    * a single exact-long division. */
  def packStats(docs: DataFrame, targetTokens: Long = 2048,
                textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    packSequences(docs, targetTokens, textCol, idCol)
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bin_tokens"),
        min(col(idCol)).as("first_doc"))
      .withColumn("fill_ratio",
        col("bin_tokens").cast("double") / lit(targetTokens.toDouble))
      .orderBy("bin_id")

  /** Materialized packed training batches: the [[packSequences]] bins
    * joined with the vocabulary token-id encoding
    * ([[TextStats.encodeDocuments]]) and flattened into ONE id stream
    * per bin — documents in stable id order, each terminated by a -1
    * EOS marker — the shape a trainer's data loader actually consumes
    * (packSequences alone only decides who shares a bin). The stream
    * renders as CSV so the result is oracle-hashable; zero-token
    * documents survive as a bare EOS.
    *
    * Scale shape: the heavy lifting is the two existing chains (the
    * two-phase prefix-sum binning and the vocab equi-join encoding);
    * the assembly is one grouped aggregation whose per-group state is a
    * single bin's ids — bounded by targetTokens, never the corpus. */
  def packedBatches(docs: DataFrame, targetTokens: Long = 2048,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val bins = packSequences(docs, targetTokens, textCol, idCol)
      .select(col(idCol), col("bin_id"))
    val enc = TextStats.encodeDocuments(docs, textCol = textCol, idCol = idCol)
    bins.join(enc, Seq(idCol))
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("token_ids")).cast("long")).as("n_tokens"),
        array_sort(collect_list(struct(col(idCol).as("id"), col("token_ids").as("ids"))))
          .as("__s"))
      .select(col("bin_id"), col("n_docs"), col("n_tokens"),
        concat_ws(",", flatten(transform(col("__s"),
          d => concat(transform(d.getField("ids"), x => x.cast("string")),
            array(lit("-1")))))).as("ids_csv"))
      .orderBy("bin_id")
  }

  /** Deterministic stratified sample: within each stratum, rank rows by
    * id-hash (tie-break id) and keep the first `perStratum` — a
    * reproducible per-class quota (the balanced-eval-set builder). The
    * rank window is partitioned by the stratum, so the sort distributes;
    * no global single-partition stage. */
  def stratifiedSample(docs: DataFrame, strataCol: String, perStratum: Int,
                       idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(Dedup.polyHash(col(idCol).cast("string")), col(idCol))
    docs.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= perStratum)
      .drop("__rk")
  }

  /** Per-domain document cap: keep at most `maxPerDomain` documents from
    * each domain (source/host), preferring longer documents and breaking
    * ties on the stable id — the anti-monoculture quota a crawl pipeline
    * applies so no single host dominates the training mixture (the
    * C4/RefinedWeb-style per-domain limit).
    *
    * Scale shape: ONE rank window partitioned by the domain — millions of
    * concurrent per-domain sorts, never a global ordering. A pathological
    * mega-domain makes one hot partition; the mitigation at that shape is
    * pre-filtering such domains by count (they exceed any cap by orders
    * of magnitude) before ranking the remainder. Deterministic: the
    * (length, id) order has no RNG, so retries and engines agree on the
    * keep-set. */
  def domainCap(docs: DataFrame, maxPerDomain: Int, domainCol: String = "source",
                lenCol: String = "n_chars", idCol: String = "doc_id"): DataFrame = {
    require(maxPerDomain > 0, s"maxPerDomain must be positive, got $maxPerDomain")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(col(lenCol).desc, col(idCol))
    docs.select(col(idCol), col(domainCol), col(lenCol))
      .withColumn("rank_in_domain", row_number().over(w).cast("long"))
      .filter(col("rank_in_domain") <= maxPerDomain)
      .orderBy(idCol)
  }

  /** Embedding-space diversity cap: cluster the corpus with the
    * cross-engine-exact snapped k-means ([[Ivf.kmeansAssignSnapped]])
    * and keep at most `capPerCell` vectors per cluster (lowest ids —
    * deterministic, no RNG). The semantic counterpart of [[domainCap]]:
    * where the domain cap stops one HOST from dominating the mixture,
    * this stops one REGION of embedding space (boilerplate families,
    * template spam, near-identical content the URL can't reveal) from
    * dominating it — the cluster-then-cap recipe of semantic
    * de-duplication / diversity-sampling pipelines (SemDeDup-style).
    *
    * Scale shape: assignment is the narrow literal-centroid argmin; the
    * cap is a BOUNDED per-cell top-k aggregation (≤ capPerCell rows per
    * (partition, cell) cross the shuffle — `TopKAggregator`), NOT a
    * row_number window partitioned by cell: with nlist cells and a
    * corpus-scale input, a cell-partitioned window would sort the whole
    * corpus through nlist hot partitions. Exactness carries over from
    * the snapped clustering, so the keep-set is bit-identical in any
    * engine replaying the integer recipe. */
  def diversityCap(embeddings: DataFrame, nlist: Int, capPerCell: Int,
                   iters: Int = 5, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    require(capPerCell > 0, s"capPerCell must be positive, got $capPerCell")
    // raw assignment only: the occupancy join and presentation sort of
    // kmeansAssignSnapped would be dead weight ahead of the cap agg
    val assigned = Ivf.snappedAssignment(embeddings, nlist, iters, idCol, vecCol)
    // keep the capPerCell LOWEST ids: TopKAggregator ranks score desc /
    // id asc, so score = -id makes rank k the k-th-lowest id (ids are
    // < 2^53, exact in the double score)
    val topk = udaf(new graft.core.TopKAggregator(capPerCell),
      org.apache.spark.sql.Encoders.product[graft.core.Scored])
    assigned.groupBy("cell")
      .agg(topk(negate(col(idCol).cast("double")), col(idCol)).as("top"))
      .select(col("cell"), posexplode(col("top")))
      .select(col("col.id").as(idCol), col("cell"),
        (col("pos") + 1).cast("long").as("rank_in_cell"))
      .orderBy(idCol)
  }

  /** Weighted source interleaving: the training-order schedule that reads
    * sources in proportion to their weights (weight 3 : 1 means three
    * docs of the first source for every one of the second — the
    * data-mixing schedule of multi-corpus training runs), expressed as a
    * deterministic sort key instead of a stateful scheduler.
    *
    * Each document gets a stable per-source position k (rank by seeded
    * id-hash within its source), and the schedule key is
    * (k+1)·(LCM/weight) — a pure BIGINT multiply, because every weight
    * divides the LCM, so the interleaving is EXACT (no float ratios) and
    * identical on any engine or partitioning. Reading rows in
    * (interleave_key, source, doc_id) order yields the weighted
    * round-robin. Rank windows are per-source — concurrent sorts, no
    * global stage; the output presentation sort is a range exchange. */
  def interleaveBySource(docs: DataFrame, weights: Seq[(String, Int)],
                         defaultWeight: Int = 1, seed: String = "graft",
                         sourceCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(defaultWeight > 0 && weights.forall(_._2 > 0), "weights must be positive")
    val all = (defaultWeight +: weights.map(_._2)).distinct
    val lcm = all.foldLeft(1L) { (acc, w) =>
      acc / BigInt(acc).gcd(BigInt(w)).toLong * w }
    val weightCol = weights.foldRight(lit(defaultWeight): Column) {
      case ((s, p), els) => when(col(sourceCol) === s, lit(p)).otherwise(els)
    }
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(Dedup.polyHash(concat(lit(seed + ":"), col(idCol).cast("string"))), col(idCol))
    docs.select(col(idCol), col(sourceCol))
      .withColumn("pos_in_source", row_number().over(rankW).cast("long") - 1)
      .withColumn("interleave_key",
        (col("pos_in_source") + 1) * (lit(lcm) / weightCol).cast("long"))
      .orderBy("interleave_key", sourceCol, idCol)
  }

  /** Per-document benchmark-contamination report: how many DISTINCT word
    * `n`-grams of each training document also appear anywhere in the
    * benchmark/eval set (the standard test-set decontamination check —
    * e.g. the 13-gram overlap rule of GPT-3 appendix C, here with
    * configurable `n`).
    *
    * Scale design: the benchmark side is distinct n-grams of the EVAL
    * set — benchmark suites are MBs by construction, so it broadcasts
    * (set `broadcastEval = false` if the eval side is itself corpus-sized
    * and let AQE pick the strategy). The training side dedups n-grams
    * per document with `array_distinct` INSIDE the row (no shuffle of
    * n-gram text); after the broadcast join only (id, count) partials
    * ride the final aggregation shuffle. Documents shorter than `n`
    * tokens have no n-grams and are trivially clean. */
  def contaminationReport(train: DataFrame, benchmark: DataFrame, n: Int = 4,
                          broadcastEval: Boolean = true,
                          textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val evalGrams = benchmark
      .select(explode(graft.functions.token_ngrams(col(textCol), n)).as("ngram"))
      .distinct()
    val evalSide = if (broadcastEval) broadcast(evalGrams) else evalGrams
    val hits = train
      .select(col(idCol),
        explode(array_distinct(graft.functions.token_ngrams(col(textCol), n))).as("ngram"))
      .join(evalSide, Seq("ngram"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_contaminated"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("is_contaminated", col("n_contaminated") > 0)
      .orderBy(idCol)
  }

  /** EVAL-side contamination report — [[contaminationReport]] flipped:
    * for each BENCHMARK item, how compromised it is. Per eval document:
    * its distinct n-gram count, how many of those n-grams appear
    * anywhere in train, how many distinct train documents share at
    * least one, and the hit ratio. The report a benchmark owner reads
    * to decide whether an eval number still means anything — the
    * train-side report says what to DROP; this one says what the eval
    * was already worth before the drop.
    *
    * Scale shape: the benchmark side is small by nature and broadcasts;
    * the n-gram join's fan-out is bounded per gram by (train docs
    * carrying it) × (eval items carrying it — tiny); the two distinct
    * counts ride one grouped aggregation per eval item. */
  def evalContamination(train: DataFrame, benchmark: DataFrame, n: Int = 4,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val evalGrams = benchmark.select(col(idCol).as("eval_id"),
      explode(array_distinct(graft.functions.token_ngrams(col(textCol), n))).as("ngram"))
    val trainGrams = train.select(col(idCol).as("train_id"),
      explode(array_distinct(graft.functions.token_ngrams(col(textCol), n))).as("ngram"))
    val hits = broadcast(evalGrams).join(trainGrams, "ngram")
      .groupBy(col("eval_id"))
      .agg(countDistinct(col("ngram")).as("n_grams_hit"),
        countDistinct(col("train_id")).as("n_train_docs"))
    val totals = benchmark.select(col(idCol).as("eval_id"),
      size(array_distinct(graft.functions.token_ngrams(col(textCol), n)))
        .cast("long").as("n_grams_total"))
    totals.join(hits, Seq("eval_id"), "left")
      .na.fill(0L, Seq("n_grams_hit", "n_train_docs"))
      .withColumn("hit_ratio",
        when(col("n_grams_total") === 0L, lit(0.0d))
          .otherwise(col("n_grams_hit").cast("double") / col("n_grams_total").cast("double")))
      .orderBy("eval_id")
  }

  /** The decontaminated corpus: training documents sharing NO word
    * `n`-gram with the benchmark set (anti-join on the contamination
    * hits — the keep path of [[contaminationReport]]). */
  def decontaminate(train: DataFrame, benchmark: DataFrame, n: Int = 4,
                    broadcastEval: Boolean = true,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val contaminated = contaminationReport(train, benchmark, n, broadcastEval, textCol, idCol)
      .filter(col("is_contaminated")).select(idCol)
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Per-stage accounting (one row): how many documents each stage
    * removed — the numbers a data curator reports. */
  def stageReport(docs: DataFrame, nearDupThreshold: Double = 0.7): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val total = docs.count()
    // four counting actions share the gate — materialize it once
    val quality = TextStats.qualityScores(docs).filter(col("quality_ok"))
      .select("doc_id").pinCheckpoint()
    val nQuality = quality.count()
    val qualified = docs.join(quality, "doc_id").pinCheckpoint()
    val nExact = Dedup.exactKeepIds(qualified).count()
    val nFinal = Dedup.nearDupKeepIds(qualified, nearDupThreshold).count()
    Seq((total, nQuality, nExact, nFinal,
        total - nQuality, nExact - nFinal))
      .toDF("n_input", "n_quality_pass", "n_after_exact_dedup", "n_retained",
        "n_quality_dropped", "n_neardup_dropped")
  }

  /** Deterministic global training-order shuffle: every document gets a
    * pseudo-random but reproducible position, expressed as (shard, pos).
    * The shuffle key is a seeded content-independent hash of the id (the
    * portable rolling hash, so any engine can replay the exact order);
    * shard = key mod nShards, and pos is the dense rank within the shard.
    *
    * Scale design: ranking is windowed PER SHARD — nShards concurrent
    * sorts of ~N/nShards rows each, never a global single-partition
    * row_number. A trainer consuming shard files in (shard, pos) order
    * reads the same permutation every run; changing the seed reshuffles.
    *
    * nShards must scale with the corpus or each per-shard sort becomes the
    * hot partition it was meant to avoid: pick nShards ≈ N / rowsPerShard
    * (see [[shuffleShardsAuto]]) so per-shard sorts stay bounded at any N,
    * and at least the cluster parallelism so all cores sort concurrently.
    */
  def shuffleShards(docs: DataFrame, nShards: Int, seed: String = "graft",
                    idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val key = Dedup.polyHash(concat(lit(seed + ":"), col(idCol).cast("string")))
    val byShard = org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col(idCol))
    docs.select(col(idCol), key.as("shuffle_key"))
      .withColumn("shard", pmod(col("shuffle_key"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(byShard).cast("long") - 1)
      .select(col(idCol), col("shard"), col("pos"))
      .orderBy("shard", "pos")
  }

  /** Supervised next-event training examples — the sliding-window dataset
    * builder behind next-action/session models: for each user's
    * time-ordered event stream, emit one (k-event context, next event)
    * pair per position with a full context. The classic sequence-dataset
    * construction, here as pure window functions.
    *
    * Scale shape: everything is user-partitioned (`lag` windows over
    * (ts, event_id) — a total order within each user), so construction
    * distributes with one user-keyed shuffle and no global stage. Only
    * full-width contexts are kept (the first k events of a stream have
    * none), making the output deterministic and engine-portable; the
    * context renders as CSV for hash comparison.
    *
    * NULL-typed events are dropped up front (an unlabeled event is neither
    * a valid label nor a valid context element). The filter also makes the
    * full-context gate exact: with no NULL types in the stream, `lag(k)
    * IS NOT NULL` ⇔ "k prior events exist" — without it, Spark's
    * `concat_ws` (skips interior NULLs) and an SQL `||` chain (nulls the
    * whole string) would disagree on streams containing NULL types.
    *
    * Columns: user_id, example_id (the labeled event's id), context,
    * label — ordered by example_id. */
  def nextEventExamples(events: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, s"context length must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ctx = (k to 1 by -1).map(j => lag(col("event_type"), j).over(w))
    events.select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .filter(col("event_type").isNotNull)
      .withColumn("context", concat_ws(",", ctx: _*))
      .withColumn("__full", ctx.head.isNotNull)
      .filter(col("__full"))
      .select(col("user_id"), col("event_id").as("example_id"),
        col("context"), col("event_type").as("label"))
      .orderBy("example_id")
  }

  /** Deterministic negative sampling for contrastive training: k
    * pseudo-random negatives per anchor document, drawn uniformly from
    * the other documents by a seeded content hash (never `rand()` — the
    * [[assignSplits]] reproducibility contract). The dense-id trick
    * `r ∈ [0, N-2]; neg = r + (r ≥ id)` guarantees `neg ≠ id` with a
    * uniform distribution and NO rejection loop.
    *
    * Scale shape: pure per-row projection after a slot explode — zero
    * shuffles; N is one metadata-scale driver scalar. Requires dense ids
    * `0..N-1` (validated below — the no-self-hit and in-range guarantees
    * depend on it); sparse ids first pass through a deterministic rank
    * (the [[shuffleShards]] machinery) to compact.
    *
    * Columns: doc_id, slot, neg_id — ordered by (doc_id, slot). */
  def negativeSamples(docs: DataFrame, k: Int, seed: String = "graft",
                      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"negatives per anchor must be >= 1, got $k")
    // one metadata-scale aggregate validates the dense-id contract the
    // r + (r >= id) trick relies on: count + min/max alone would accept a
    // duplicate-plus-gap id set (0,1,1,3), so the distinct count is part
    // of the same pass — together they prove ids are exactly 0..N-1
    val Array(stats) = docs.agg(count(lit(1)),
      min(col(idCol)).cast("long"), max(col(idCol)).cast("long"),
      countDistinct(col(idCol))).collect()
    val n = stats.getLong(0)
    require(n >= 2, "negative sampling needs at least two documents")
    require(stats.getLong(1) == 0L && stats.getLong(2) == n - 1 && stats.getLong(3) == n,
      s"negativeSamples requires dense ids 0..${n - 1} (got min=${stats.getLong(1)}, " +
        s"max=${stats.getLong(2)}, distinct=${stats.getLong(3)} of $n rows); " +
        "compact sparse ids via a deterministic rank first")
    val h = Dedup.polyHash(concat(lit(seed + ":neg:"), col(idCol).cast("string"),
      lit(":"), col("slot").cast("string")))
    docs.select(col(idCol),
        explode(sequence(lit(0L), lit((k - 1).toLong))).as("slot"))
      .withColumn("__r", pmod(h, lit(n - 1)))
      .select(col(idCol), col("slot"),
        when(col("__r") >= col(idCol), col("__r") + 1)
          .otherwise(col("__r")).as("neg_id"))
      .orderBy(idCol, "slot")
  }

  /** Corpus data card — the release-notes summary of a training corpus:
    * document/token/char volume and the exact-duplicate signal
    * (distinct content hashes vs rows), per language AND as a grand
    * total, in ONE scan. `rollup(lang)` plans a single aggregation pass
    * producing both granularities (Spark expands grouping sets map-side;
    * the shuffle is keyed on (lang, grouping-id) — no second scan, no
    * union of two jobs). The dedup signal hashes the text first so the
    * shuffle carries 32-byte digests, never document bodies.
    *
    * Columns: lang (NULL on the total row), is_total, n_docs, n_tokens,
    * n_chars, n_distinct_texts — ordered total-last by language (NULLS
    * FIRST within languages, pinned explicitly so any engine agrees). */
  def dataCard(docs: DataFrame, textCol: String = "text",
               langCol: String = "lang", charsCol: String = "n_chars"): DataFrame =
    docs.select(col(langCol).as("lang"),
        size(graft.text.Tokenize.tokensArray(col(textCol))).cast("long").as("__nt"),
        col(charsCol).as("n_chars"),
        sha2(col(textCol), 256).as("__h"))
      .rollup("lang")
      .agg((grouping(col("lang")) === 1).as("is_total"),
        count(lit(1)).as("n_docs"),
        sum("__nt").as("n_tokens"),
        sum("n_chars").as("n_chars"),
        countDistinct(col("__h")).as("n_distinct_texts"))
      .select("lang", "is_total", "n_docs", "n_tokens", "n_chars", "n_distinct_texts")
      .orderBy(col("is_total"), col("lang").asc_nulls_first)

  /** Quality-ranked token-budget selection — "take the best documents
    * until N tokens": rank the corpus by a deterministic quality key
    * (stopword density in integer permille — the cheap prose-ness signal;
    * id tiebreak) and keep the maximal PREFIX whose running token count
    * fits the budget. Greedy prefix, not a knapsack: the first document
    * that would cross the budget is dropped along with everything ranked
    * below it, which keeps the cut reproducible and rank-monotonic.
    *
    * Scale shape: the running total uses the same two-phase global prefix
    * sum as [[packSequences]] — range-repartition on the rank key,
    * per-partition window cumsum, then per-partition offsets broadcast
    * back — so there is NO single-partition stage at any corpus size. The
    * quality key is exact BIGINT arithmetic (permille, `div`), portable to
    * any engine.
    *
    * Columns: doc_id, n_tokens, q_permille, cum_tokens — ordered by
    * doc_id. */
  def tokenBudget(docs: DataFrame, budgetTokens: Long,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    val spark = docs.sparkSession
    val nParts = spark.sessionState.conf.numShufflePartitions
    val toks = graft.text.Tokenize.tokensArray(col(textCol))
    val base = docs.select(col(idCol),
        size(toks).cast("long").as("n_tokens"),
        size(filter(toks, t => t.isin(TextStats.Stopwords: _*)))
          .cast("long").as("n_stop"))
      .filter(col("n_tokens") > 0)
      .withColumn("q_permille", expr("(n_stop * 1000) div n_tokens"))
    // materialize once: the offsets branch and the final projection must
    // observe the same sampled range boundaries (the packSequences rule)
    val local = localCumsum(base, Seq(col("q_permille").desc, col(idCol).asc), nParts)
      .pinCheckpoint()
    withGlobalCumsum(local)
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col(idCol), col("n_tokens"), col("q_permille"), col("cum_tokens"))
      .orderBy(idCol)
  }

  /** Deterministic weighted sampling WITHOUT replacement — the A-ES
    * scheme (Efraimidis & Spirakis 2006): each row gets key
    * `ln(u) / weight` for a per-row uniform `u`, and the k largest keys
    * are the sample; selection probability is proportional to weight.
    * `u` derives from a seeded content hash (never `rand()` — same
    * reproducibility contract as [[assignSplits]]): any engine replays
    * the identical sample. `ln(u)` is integer-scaled before the one
    * double division of two exact BIGINTs (IEEE-exact, portable); ties
    * break on the id.
    *
    * Scale shape: one narrow projection then a global top-k, which Spark
    * plans as TakeOrderedAndProject — per-partition heaps of k, no global
    * sort, no single-partition stage. Rows with non-positive weight are
    * excluded (zero weight = never sampled).
    *
    * Columns: doc_id, weight, key — ordered by doc_id. */
  def weightedSample(docs: DataFrame, k: Int, weightCol: String = "n_chars",
                     seed: String = "graft", idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val h = Dedup.polyHash(concat(lit(seed + ":"), col(idCol).cast("string")))
    val lnu = round(log((h + 1).cast("double") / lit((Dedup.P + 1).toDouble)) * 1e6)
      .cast("long")
    docs.filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol).cast("long").as("weight"), lnu.as("lnu_scaled"))
      .withColumn("key", col("lnu_scaled").cast("double") / col("weight").cast("double"))
      .orderBy(col("key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("weight"), col("key"))
      .orderBy(idCol)
  }

  /** Per-stratum deterministic weighted sampling without replacement:
    * [[weightedSample]]'s A-ES key (replayable hash → exponential-ish
    * key ∝ weight), but the top-k is taken WITHIN each group — the
    * "k best examples per source/language" draw a mixture builder runs
    * when it wants every stratum represented regardless of its share.
    *
    * Scale shape: the per-group top-k is a bounded `TopKAggregator`
    * partial aggregate (k-row state, map-side combinable) — NOT a
    * per-group `row_number` window, which would hash-partition one task
    * per group and funnel a corpus-sized stratum through it. Weight
    * re-attaches by id equi-join. Same (key desc, id) tie order as the
    * global sampler, so the oracle replays it exactly. */
  def weightedSamplePerGroup(docs: DataFrame, k: Int, groupCol: String = "source",
                             weightCol: String = "n_chars", seed: String = "graft",
                             idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val h = Dedup.polyHash(concat(lit(seed + ":"), col(idCol).cast("string")))
    val lnu = round(log((h + 1).cast("double") / lit((Dedup.P + 1).toDouble)) * 1e6)
      .cast("long")
    val keyed = docs.filter(col(weightCol) > 0)
      .select(col(groupCol), col(idCol),
        col(weightCol).cast("long").as("weight"), lnu.as("lnu_scaled"))
      .withColumn("key", col("lnu_scaled").cast("double") / col("weight").cast("double"))
    val topk = udaf(new graft.core.TopKAggregator(k),
      org.apache.spark.sql.Encoders.product[graft.core.Scored])
    keyed.groupBy(col(groupCol)).agg(topk(col("key"), col(idCol)).as("top"))
      .select(col(groupCol), explode(col("top")).as("s"))
      .select(col(groupCol), col("s.id").as(idCol), col("s.score").as("key"))
      .join(keyed.select(col(idCol), col("weight")), idCol)
      .select(col(groupCol), col(idCol), col("weight"), col("key"))
      .orderBy(groupCol, idCol)
  }

  /** [[shuffleShards]] with the shard count derived from the corpus size:
    * nShards = ceil(N / rowsPerShard), so per-shard sort size is bounded by
    * rowsPerShard no matter how large the corpus grows. The count() is a
    * metadata-scale action (one long), and the derivation is pure integer
    * arithmetic any engine can replay — the output stays deterministic. */
  def shuffleShardsAuto(docs: DataFrame, rowsPerShard: Long, seed: String = "graft",
                        idCol: String = "doc_id"): DataFrame = {
    require(rowsPerShard > 0, s"rowsPerShard must be positive, got $rowsPerShard")
    val n = docs.count()
    val nShards = math.max(1L, (n + rowsPerShard - 1) / rowsPerShard)
    require(nShards <= Int.MaxValue, s"nShards $nShards exceeds Int range")
    shuffleShards(docs, nShards.toInt, seed, idCol)
  }

  /** Curriculum phase assignment: rank the WHOLE corpus by a quality
    * score (easiest/cleanest first — stopword ratio as the fluency proxy,
    * ties toward the smaller id) and cut the ranking into `phases` equal
    * consecutive buckets: phase = ((rank−1)·phases) div N. The ordering a
    * curriculum-learning schedule feeds the trainer.
    *
    * Scale shape: a GLOBAL rank is the hazard — `Window.orderBy(score)`
    * plans the entire corpus into one partition. This reuses the
    * two-phase prefix-sum machinery ([[localCumsum]]/[[packSequences]]'
    * rule) with a constant 1 as the summand: range-repartition by
    * (score desc, id), per-partition running COUNTS, then a broadcast of
    * |partitions| offsets turns local counts into the exact global rank.
    * N arrives as a broadcast single row off the materialized local sums
    * — no second corpus scan, no SinglePartition exchange (plan-asserted). */
  def curriculumPhases(docs: DataFrame, phases: Int = 4,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    curriculumPhasesScored(stopwordScore(docs, textCol, idCol), phases, idCol)

  /** [[curriculumPhases]] on the bigram LM quality signal
    * ([[LmScore.scoreDocuments]] averaged per bigram): rank by how
    * corpus-like each document's word transitions are — the CCNet-style
    * schedule (cleanest prose first) — instead of the cheap stopword
    * proxy. Documents too short to have a bigram carry no signal and are
    * excluded, like zero-token docs under the stopword score. */
  def curriculumPhasesLm(docs: DataFrame, phases: Int = 4,
                         textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    curriculumPhasesScored(lmQualityScore(docs, textCol, idCol), phases, idCol)

  /** Global 1-based rank of an (id, score) frame by (score desc, id
    * asc), via the two-phase prefix sum — the scale-safe replacement
    * for a bare `row_number() OVER (ORDER BY …)`, which would plan as
    * ONE partition holding the whole corpus. Returns (idCol, rank). */
  private[graft] def globalRank(scored: DataFrame, idCol: String): DataFrame = {
    val nParts = scored.sparkSession.sessionState.conf.numShufflePartitions
    val base = scored.select(col(idCol), col("score"))
      .withColumn("n_tokens", lit(1L)) // prefix-sum of 1s == global rank
    val local = localCumsum(base, Seq(col("score").desc, col(idCol).asc), nParts)
      .pinCheckpoint()
    withGlobalCumsum(local).select(col(idCol), col("cum_tokens").as("rank"))
  }

  /** 1-based rank of every row WITHIN its group (ordered by `idCol`),
    * via a group-aware two-phase prefix sum. The naive
    * `row_number() OVER (PARTITION BY group)` plans one partition per
    * group — with a handful of corpus-sized groups (languages, sources)
    * that is a handful of tasks holding everything. Here the data is
    * range-partitioned by (group, id) so every partition holds a
    * bounded contiguous slice; per-slice ranks come from a bounded
    * window, and the cross-partition offsets are a (P × groups)-row
    * driver-scale triangle join broadcast back. Returns
    * (groupCol, idCol, grp_rank). */
  private[graft] def groupRank(df: DataFrame, groupCol: String, idCol: String): DataFrame = {
    // offsets + projection must see ONE partitioner sample -> checkpoint
    val local = groupRankLocal(df, groupCol, idCol).pinCheckpoint()
    val sizes = local.groupBy(col("__pid"), col(groupCol))
      .agg(count(lit(1)).as("__n"))
    val offsets = sizes.as("x")
      .join(sizes.as("y"),
        col(s"y.$groupCol") === col(s"x.$groupCol") && col("y.__pid") < col("x.__pid"),
        "left")
      .groupBy(col("x.__pid").as("__pid"), col(s"x.$groupCol").as(groupCol))
      .agg(coalesce(sum(col("y.__n")), lit(0L)).as("__off"))
    local.join(broadcast(offsets), Seq("__pid", groupCol))
      .select(col(groupCol), col(idCol), (col("__off") + col("__local")).as("grp_rank"))
  }

  /** Pre-checkpoint half of [[groupRank]] (exposed so PlanSpec can
    * assert the subplan has no SinglePartition exchange and no
    * group-count-bounded window partitioning). */
  private[graft] def groupRankLocal(df: DataFrame, groupCol: String, idCol: String): DataFrame = {
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val localW = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid", groupCol).orderBy(col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select(col(groupCol), col(idCol))
      .repartitionByRange(nParts, col(groupCol), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__local", sum(lit(1L)).over(localW))
  }

  /** T5-style span corruption: fixed-grid masked spans over the
    * non-empty normalized token stream — 0-based positions j with
    * j mod 10 ∈ {3, 4, 5} are masked, each span replaced in the INPUT by
    * its sequential sentinel `<extra_id_k>` (k = j div 10) and emitted
    * in the TARGET as the sentinel followed by the masked tokens. The
    * (input, target) pair is exactly the denoising example an
    * encoder-decoder LM pretrainer consumes; the deterministic grid
    * (vs. the paper's random spans) is what makes every masking
    * decision hash-gradeable. Spans truncate naturally at document end;
    * documents too short to reach position 3 pass through unmasked with
    * an empty target. Pure per-row projection — zero shuffle. */
  def spanCorruption(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        filter(graft.text.Tokenize.tokensArray(col(textCol)),
          t => length(t) > 0).as("toks"))
      .selectExpr(idCol,
        """array_join(filter(transform(toks, (t, j) ->
          |  CASE WHEN j % 10 = 3 THEN concat('<extra_id_', CAST(j div 10 AS STRING), '>')
          |       WHEN j % 10 IN (4, 5) THEN CAST(NULL AS STRING)
          |       ELSE t END), x -> x IS NOT NULL), ' ') AS input_text""".stripMargin,
        """array_join(filter(transform(toks, (t, j) ->
          |  CASE WHEN j % 10 = 3 THEN concat('<extra_id_', CAST(j div 10 AS STRING), '> ', t)
          |       WHEN j % 10 IN (4, 5) THEN t
          |       ELSE CAST(NULL AS STRING) END), x -> x IS NOT NULL), ' ') AS target_text""".stripMargin,
        "CAST(size(filter(transform(toks, (t, j) -> j % 10 = 3), b -> b)) AS BIGINT) AS n_spans",
        "CAST(size(filter(transform(toks, (t, j) -> j % 10 IN (3, 4, 5)), b -> b)) AS BIGINT) AS n_masked")
      .orderBy(idCol)

  /** Minority-class oversampling to exact parity: every group (language,
    * source, …) is brought to the size of the LARGEST group by
    * deterministic replication — each document gets
    * ⌊M/n_g⌋ copies plus one extra for the first M mod n_g documents of
    * its group (in id order, via the scale-safe [[groupRank]]), so every
    * group sums to exactly M. The training-data shape for class
    * balancing: a trainer repeats minority-domain documents rather than
    * starving on them. Only the copy COUNT is materialized — the
    * replication itself is a downstream `explode(sequence(1, n_copies))`
    * the loader applies, so nothing corpus-sized is duplicated here. */
  def oversampleBalance(docs: DataFrame, groupCol: String = "lang",
                        idCol: String = "doc_id"): DataFrame = {
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    // ONE scalar aggregate for the target size, computed once
    val target = counts.agg(max(col("__n")).as("__m"))
    val ranked = groupRank(docs, groupCol, idCol)
    ranked.join(broadcast(counts), Seq(groupCol))
      .crossJoin(broadcast(target))
      .select(col(idCol), col(groupCol), col("grp_rank"),
        (expr("__m div __n") +
          when(col("grp_rank") <= expr("__m % __n"), 1L).otherwise(0L)).as("n_copies"))
      .orderBy(idCol)
  }

  /** The rank/cut core of [[curriculumPhases]] over an ALREADY-SCORED
    * (id, score) frame — any per-document scalar slots in. Keeps the
    * two-phase prefix-sum shape (no SinglePartition window). */
  def curriculumPhasesScored(scored: DataFrame, phases: Int,
                             idCol: String = "doc_id"): DataFrame = {
    require(phases > 0, "phases must be positive")
    val spark = scored.sparkSession
    val nParts = spark.sessionState.conf.numShufflePartitions
    val base = scored.select(col(idCol), col("score"))
      .withColumn("n_tokens", lit(1L)) // prefix-sum of 1s == global rank
    val local = localCumsum(base, Seq(col("score").desc, col(idCol).asc), nParts)
      .pinCheckpoint()
    val total = local.agg(sum(col("n_tokens")).as("__n"))
    withGlobalCumsum(local)
      .crossJoin(broadcast(total))
      .select(col(idCol), col("score"), col("cum_tokens").as("rank"),
        expr(s"((cum_tokens - 1) * $phases) div __n").as("phase"))
      .orderBy(idCol)
  }

  /** Stopword density as a (id, score) frame — the cheap fluency proxy;
    * zero-token documents (undefined ratio) are excluded. */
  private def stopwordScore(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = graft.text.Tokenize.tokensArray(col(textCol))
    docs.select(col(idCol),
        size(filter(toks, t => t.isin(TextStats.Stopwords: _*))).cast("long").as("__stop"),
        size(toks).cast("long").as("__ntok"))
      .filter(col("__ntok") > 0)
      .select(col(idCol),
        (col("__stop").cast("double") / col("__ntok").cast("double")).as("score"))
  }

  /** Bigram-LM quality as a (id, score) frame: the per-bigram average of
    * [[LmScore.scoreDocuments]]'s integer-scaled log-likelihood — one
    * division over exact BIGINT inputs, so the ordering is engine-
    * portable. Higher = word transitions more like the corpus. */
  private[ext] def lmQualityScore(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    LmScore.scoreDocuments(docs, textCol)
      .select(col("doc_id").as(idCol),
        (col("sum_logp_scaled").cast("double") / col("n_bigrams").cast("double")).as("score"))

  /** Preference-pair construction (the DPO/RLHF data-prep shape): within
    * each group, pair the highest-scoring document (chosen) with the
    * lowest-scoring one (rejected), emitting ids, scores, and the margin.
    * The score here is the stopword ratio — the cheap fluency proxy from
    * [[TextStats.qualityScores]]; any per-document scalar slots in the
    * same way. Groups whose best and worst tie (margin 0, including
    * single-doc groups) are dropped: a pair that doesn't discriminate
    * teaches nothing.
    *
    * Determinism: ties on the score break toward the SMALLER doc id on
    * both ends — chosen is argmax of (score, -id), rejected argmin of
    * (score, id) — so the output is a pure function of the corpus.
    *
    * Scale shape: one narrow scan computes the score per row (no
    * shuffle), then ONE grouped aggregation carries both argmax and
    * argmin as max/min of 2-field structs — map-side partial, no window
    * over the corpus, never a self-join. Zero-token documents are
    * excluded up front (their ratio is undefined). */
  def preferencePairs(docs: DataFrame, groupCols: Seq[String] = Seq("source", "lang"),
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // score computed INLINE so group columns and both pair ends ride ONE
    // corpus scan (plan-asserted) — a join against a separately-scored
    // frame would scan the corpus twice for a per-row expression
    val toks = graft.text.Tokenize.tokensArray(col(textCol))
    val scored = docs
      .select(groupCols.map(col) ++ Seq(col(idCol),
        size(filter(toks, t => t.isin(TextStats.Stopwords: _*))).cast("long").as("__stop"),
        size(toks).cast("long").as("__ntok")): _*)
      .filter(col("__ntok") > 0)
      .select(groupCols.map(col) ++ Seq(col(idCol),
        (col("__stop").cast("double") / col("__ntok").cast("double")).as("score")): _*)
    preferencePairsScored(scored, groupCols, idCol)
  }

  /** [[preferencePairs]] on the bigram LM quality signal — chosen is the
    * most corpus-like document of each group, rejected the least; the
    * higher-fidelity signal a DPO-prep pipeline actually wants (the
    * stopword form remains for cheap first passes). */
  def preferencePairsLm(docs: DataFrame, groupCols: Seq[String] = Seq("source", "lang"),
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    preferencePairsScored(
      docs.select((groupCols :+ idCol).map(col): _*)
        .join(lmQualityScore(docs, textCol, idCol), idCol),
      groupCols, idCol)

  /** The pairing core over an ALREADY-SCORED frame carrying the group
    * columns, id, and `score`. Same argmax/argmin struct aggregation —
    * no window, no self-join. */
  def preferencePairsScored(scored0: DataFrame, groupCols: Seq[String],
                            idCol: String = "doc_id"): DataFrame = {
    val scored = scored0.withColumn("__score", col("score"))
    scored.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        max(struct(col("__score").as("s"), (-col(idCol)).as("nid"))).as("__best"),
        min(struct(col("__score").as("s"), col(idCol).as("id"))).as("__worst"))
      .select(groupCols.map(col) ++ Seq(
        col("n_docs"),
        (-col("__best.nid")).as("chosen_id"),
        col("__worst.id").as("rejected_id"),
        col("__best.s").as("chosen_score"),
        col("__worst.s").as("rejected_score"),
        (col("__best.s") - col("__worst.s")).as("margin")): _*)
      .filter(col("margin") > 0)
      .orderBy(groupCols.map(col): _*)
  }
}
