package graft

import graft.ext.{Dedup, Html, TextStats}

/** DuckDB oracle-SQL builders for the extension queries. The SQL mirrors
  * the engine's arithmetic exactly (same rolling-hash fold, same seed
  * family, same fold order for doubles) so results match bit-for-bit. */
object OracleSql {

  /** Normalized token ARRAY per doc (mirror of Tokenize.tokensArray),
    * parameterized over the source relation/CTE for derived-corpus
    * queries. Whitespace is the explicit Java-`\s` set (RE2's `\s` lacks
    * \x0B). */
  def toksCteFor(table: String, name: String): String =
    s"""$name AS (
       |  SELECT doc_id, list_transform(
       |           list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> ''),
       |           t -> lower(regexp_replace(t, '[^\\p{L}\\p{N}]+', '', 'g'))) AS toks
       |  FROM $table)""".stripMargin

  /** The default tokenizer CTE over the `documents` table. */
  val toksCte: String = toksCteFor("documents", "toks")

  /** Distinct 3-token shingles per doc (mirror of Dedup.shingleRows k=3). */
  val shinglesCte: String =
    s"""$toksCte,
       |sh AS (
       |  SELECT DISTINCT doc_id, sh FROM toks,
       |  unnest(CASE WHEN len(toks) >= 3
       |    THEN list_transform(range(1, len(toks)-1),
       |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |    ELSE [array_to_string(toks, ' ')] END) AS u(sh))""".stripMargin

  /** SQL string-literal escape (doubled quotes) for caller-supplied
    * values interpolated into oracle text. */
  private def sqlStr(s: String): String = s.replace("'", "''")

  /** Rolling hash of a string expression (mirror of Dedup.polyHash). */
  def poly(expr: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($expr, ''), " +
      s"c -> ascii(c)::BIGINT)), (acc, c) -> (acc*31 + c) % ${Dedup.P})"

  /** MinHash flat signatures (mirror of Dedup.minhashFlat with polyHash). */
  def minhashFlat(numHashes: Int): String = {
    val seedRows = Dedup.seedFamily(numHashes)
      .map { case (i, a, b) => s"($i::BIGINT, $a::BIGINT, $b::BIGINT)" }
      .mkString(", ")
    s"""WITH $shinglesCte,
       |bh AS (SELECT doc_id, ${poly("sh")} AS bh FROM sh)
       |SELECT doc_id, s.i AS h_idx, min((s.a * bh.bh + s.b) % ${Dedup.P2}) AS minhash
       |FROM bh, (VALUES $seedRows) AS s(i, a, b)
       |GROUP BY doc_id, s.i ORDER BY doc_id, h_idx""".stripMargin
  }

  /** LSH band bucket stats (mirror of the dedup_lsh_bands query). */
  def lshBands(numHashes: Int, rowsPerBand: Int): String =
    s"""WITH mh AS (${minhashFlat(numHashes).replace("ORDER BY doc_id, h_idx", "")}),
       |bands AS (
       |  SELECT doc_id, h_idx // $rowsPerBand AS band,
       |    list_reduce(list_prepend(0::BIGINT, list(minhash ORDER BY h_idx)),
       |      (h, v) -> (h*31 + (v % ${Dedup.P})) % ${Dedup.P}) AS band_hash
       |  FROM mh GROUP BY doc_id, h_idx // $rowsPerBand)
       |SELECT band, count(DISTINCT band_hash) AS n_buckets, count(*) AS n_docs
       |FROM bands GROUP BY band ORDER BY band""".stripMargin

  /** SimHash fingerprints (mirror of Dedup.simhash with polyHash). */
  def simhash(numBits: Int): String = {
    val bitSums = (0 until numBits)
      .map(i => s"sum(CASE WHEN (bh >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS s$i")
      .mkString(",\n    ")
    val assemble = (0 until numBits)
      .map(i => s"(CASE WHEN s$i > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH $toksCte,
       |tok AS (SELECT doc_id, unnest(toks) AS word FROM toks),
       |bh AS (SELECT doc_id, ${poly("word")} AS bh FROM tok),
       |bits AS (SELECT doc_id,
       |    $bitSums
       |  FROM bh GROUP BY doc_id)
       |SELECT doc_id, $assemble AS simhash FROM bits ORDER BY doc_id""".stripMargin
  }

  /** SimHash Hamming pairs (mirror of Dedup.simhashPairs): the same
    * per-doc fingerprints, then EXACT all-pairs Hamming over distinct
    * fingerprints (the oracle can afford n²; the engine's pigeonhole
    * block join must reproduce it exactly — the hash-match IS the
    * recall-completeness proof), expanded back to doc pairs. */
  def simhashPairsSql(numBits: Int, maxDist: Int): String = {
    val bitSums = (0 until numBits)
      .map(i => s"sum(CASE WHEN (bh >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS s$i")
      .mkString(",\n    ")
    val assemble = (0 until numBits)
      .map(i => s"(CASE WHEN s$i > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH $toksCte,
       |tok AS (SELECT doc_id, unnest(toks) AS word FROM toks),
       |bhh AS (SELECT doc_id, ${poly("word")} AS bh FROM tok),
       |bits AS (SELECT doc_id,
       |    $bitSums
       |  FROM bhh GROUP BY doc_id),
       |fp AS (SELECT doc_id, $assemble AS simhash FROM bits),
       |fps AS (SELECT simhash, list_sort(list(doc_id)) AS ids
       |        FROM fp GROUP BY simhash),
       |same AS (
       |  SELECT u1.x AS a, u2.y AS b, 0 AS hamming
       |  FROM fps, unnest(ids) AS u1(x), unnest(ids) AS u2(y)
       |  WHERE u1.x < u2.y),
       |cp AS (
       |  SELECT x.ids AS ids_a, y.ids AS ids_b,
       |    bit_count(xor(x.simhash, y.simhash)) AS hamming
       |  FROM fps x JOIN fps y ON x.simhash < y.simhash
       |  WHERE bit_count(xor(x.simhash, y.simhash)) <= $maxDist),
       |crossx AS (
       |  SELECT least(u1.x, u2.y) AS a, greatest(u1.x, u2.y) AS b, cp.hamming
       |  FROM cp, unnest(ids_a) AS u1(x), unnest(ids_b) AS u2(y))
       |SELECT a, b, CAST(hamming AS INTEGER) AS hamming FROM (
       |  SELECT * FROM same UNION ALL SELECT * FROM crossx)
       |ORDER BY a, b""".stripMargin
  }

  /** (doc_id, g) word n-gram rows, NON-distinct (mirror of
    * graft.functions.token_ngrams: documents shorter than `n` tokens
    * yield no grams). Composes after [[toksCte]] in the same WITH. */
  def ngramsCte(n: Int, name: String = "grams"): String = {
    val joins = (0 until n).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
    s"""$name AS (
       |  SELECT doc_id, g FROM toks, unnest(CASE WHEN len(toks) >= $n
       |    THEN list_transform(range(1, len(toks) - ${n - 2}), i -> $joins)
       |    ELSE [] END) AS u(g))""".stripMargin
  }

  /** Benchmark-decontamination report (mirror of pipeline_decontaminate):
    * eval set = doc_id % mod == 0, train = the rest; n-gram overlap. */
  def decontaminate(n: Int, mod: Int): String =
    s"""WITH $toksCte,
       |${ngramsCte(n)},
       |ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % $mod = 0),
       |hits AS (
       |  SELECT t.doc_id, count(DISTINCT t.g) AS n_contaminated
       |  FROM grams t JOIN ev USING (g)
       |  WHERE t.doc_id % $mod <> 0 GROUP BY t.doc_id)
       |SELECT d.doc_id,
       |  coalesce(h.n_contaminated, 0)::BIGINT AS n_contaminated,
       |  coalesce(h.n_contaminated, 0) > 0 AS is_contaminated
       |FROM documents d LEFT JOIN hits h USING (doc_id)
       |WHERE d.doc_id % $mod <> 0
       |ORDER BY doc_id""".stripMargin

  /** Eval-side contamination (mirror of
    * TrainingPipeline.evalContamination): per benchmark item, distinct
    * n-gram total, hit count against train, distinct compromising train
    * docs, and the hit ratio. */
  def evalContamination(n: Int, mod: Int): String =
    s"""WITH $toksCte,
       |${ngramsCte(n)},
       |eg AS (SELECT DISTINCT doc_id AS eval_id, g FROM grams
       |       WHERE doc_id % $mod = 0),
       |tg AS (SELECT DISTINCT doc_id AS train_id, g FROM grams
       |       WHERE doc_id % $mod <> 0),
       |hits AS (
       |  SELECT eg.eval_id, count(DISTINCT eg.g) AS n_grams_hit,
       |    count(DISTINCT tg.train_id) AS n_train_docs
       |  FROM eg JOIN tg USING (g) GROUP BY 1),
       |totals AS (
       |  SELECT eval_id, count(*)::BIGINT AS n_grams_total FROM eg GROUP BY 1)
       |SELECT d.doc_id AS eval_id,
       |  coalesce(t.n_grams_total, 0)::BIGINT AS n_grams_total,
       |  coalesce(h.n_grams_hit, 0)::BIGINT AS n_grams_hit,
       |  coalesce(h.n_train_docs, 0)::BIGINT AS n_train_docs,
       |  CASE WHEN coalesce(t.n_grams_total, 0) = 0 THEN 0.0::DOUBLE
       |       ELSE coalesce(h.n_grams_hit, 0)::DOUBLE / t.n_grams_total::DOUBLE
       |  END AS hit_ratio
       |FROM documents d
       |LEFT JOIN totals t ON t.eval_id = d.doc_id
       |LEFT JOIN hits h ON h.eval_id = d.doc_id
       |WHERE d.doc_id % $mod = 0
       |ORDER BY eval_id""".stripMargin

  /** Per-document repetition signals (mirror of text_repetition). The
    * engine computes top-gram multiplicity with a per-row fold; SQL gets
    * the same numbers with plain grouped aggregation. */
  def repetition: String =
    s"""WITH $toksCte,
       |${ngramsCte(2, "g2")},
       |${ngramsCte(3, "g3")},
       |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
       |t2 AS (SELECT doc_id, max(c) AS top, sum(c) AS n FROM c2 GROUP BY 1),
       |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
       |t3 AS (SELECT doc_id, max(c) AS top, sum(c) AS n FROM c3 GROUP BY 1)
       |SELECT t.doc_id, len(t.toks)::BIGINT AS n_tokens,
       |  1.0::DOUBLE - (len(list_distinct(t.toks))::DOUBLE /
       |    nullif(len(t.toks), 0)::DOUBLE) AS dup_token_frac,
       |  coalesce(t2.top, 0)::BIGINT AS top_bigram_cnt,
       |  t2.top::DOUBLE / nullif(t2.n, 0)::DOUBLE AS top_bigram_frac,
       |  coalesce(t3.top, 0)::BIGINT AS top_trigram_cnt,
       |  t3.top::DOUBLE / nullif(t3.n, 0)::DOUBLE AS top_trigram_frac
       |FROM toks t LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Exact n-gram Jaccard top pairs (mirror of dedup_ngram_jaccard).
    * `maxDf` mirrors the engine's hot-shingle guard: shingles appearing in
    * more than maxDf documents are dropped BEFORE sizes and intersections
    * are computed (Long.MaxValue = no guard). */
  def ngramJaccardTop(limit: Int, maxDf: Long = Long.MaxValue): String = {
    val shRel = if (maxDf == Long.MaxValue) "sh" else "shf"
    val dfCte = if (maxDf == Long.MaxValue) "" else
      s""",
         |shf AS (
         |  SELECT sh.doc_id, sh.sh FROM sh
         |  JOIN (SELECT sh, count(*) AS df FROM sh GROUP BY sh) d
         |    ON d.sh = sh.sh AND d.df <= $maxDf)""".stripMargin
    s"""WITH $shinglesCte$dfCte,
       |sz AS (SELECT doc_id, count(*) AS sz FROM $shRel GROUP BY doc_id),
       |inter AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
       |  FROM $shRel x JOIN $shRel y ON x.sh = y.sh AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT a, b, inter, sa.sz AS sa, sb.sz AS sb,
       |  CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
       |FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
       |ORDER BY jaccard DESC, a, b LIMIT $limit""".stripMargin
  }

  /** Exact threshold Jaccard pairs (mirror of dedup_jaccard_prefix).
    * Deliberately the PLAIN full inverted join + threshold filter — the
    * engine's prefix-filtered candidate generation is an internal pruning
    * strategy whose contract is exact output equivalence with this naive
    * formulation, so the oracle must NOT mirror the pruning. */
  def ngramJaccardThreshold(threshold: Double, maxDf: Long = Long.MaxValue): String = {
    val shRel = if (maxDf == Long.MaxValue) "sh" else "shf"
    val dfCte = if (maxDf == Long.MaxValue) "" else
      s""",
         |shf AS (
         |  SELECT sh.doc_id, sh.sh FROM sh
         |  JOIN (SELECT sh, count(*) AS df FROM sh GROUP BY sh) d
         |    ON d.sh = sh.sh AND d.df <= $maxDf)""".stripMargin
    s"""WITH $shinglesCte$dfCte,
       |sz AS (SELECT doc_id, count(*) AS sz FROM $shRel GROUP BY doc_id),
       |inter AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
       |  FROM $shRel x JOIN $shRel y ON x.sh = y.sh AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT a, b, inter, sa.sz AS sa, sb.sz AS sb,
       |  CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
       |FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
       |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= $threshold
       |ORDER BY a, b""".stripMargin
  }

  /** Raw SQL fragments for interpolated builders (interpolated
    * triple-quoted strings process \x/\p escapes; plain ones don't). */
  private val wsSplit = """regexp_split_to_array(text, '[ \t\n\x0B\f\r]+')"""
  private val normTok = """t -> lower(regexp_replace(t, '[^\p{L}\p{N}]+', '', 'g'))"""

  /** The full MinHash near-duplicate CTE chain over `docsRel` (mirror of
    * Dedup.minhashNearDuplicates with polyHash, k=3, H=64, bands=16):
    * exact-dup collapse → shingles → minhash → LSH bands → candidates →
    * exact-Jaccard verify ≥ threshold → pair expansion back to doc ids.
    * Ends with CTEs `same` and `crossx`, each (a, b, jaccard). */
  def nearDupChain(docsRel: String, threshold: Double): String = {
    val seedRows = Dedup.seedFamily(64)
      .map { case (i, a, b) => s"($i::BIGINT, $a::BIGINT, $b::BIGINT)" }
      .mkString(", ")
    s"""groups AS (
       |  SELECT list_sort(list(doc_id)) AS ids, min(doc_id) AS rep
       |  FROM $docsRel GROUP BY text),
       |reps AS (SELECT d.doc_id, d.text FROM $docsRel d JOIN groups g ON d.doc_id = g.rep),
       |rtoks AS (
       |  SELECT doc_id, list_transform(
       |           list_filter($wsSplit, t -> t <> ''),
       |           $normTok) AS toks
       |  FROM reps),
       |sh AS (
       |  SELECT DISTINCT doc_id, sh FROM rtoks,
       |  unnest(CASE WHEN len(toks) >= 3
       |    THEN list_transform(range(1, len(toks)-1),
       |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |    ELSE [array_to_string(toks, ' ')] END) AS u(sh)),
       |bh AS (SELECT doc_id, ${poly("sh")} AS bh FROM sh),
       |mh AS (SELECT doc_id, s.i AS h_idx, min((s.a * bh.bh + s.b) % ${Dedup.P2}) AS minhash
       |       FROM bh, (VALUES $seedRows) AS s(i, a, b) GROUP BY doc_id, s.i),
       |bands AS (SELECT doc_id, h_idx // 4 AS band,
       |    list_reduce(list_prepend(0::BIGINT, list(minhash ORDER BY h_idx)),
       |      (h, v) -> (h*31 + (v % ${Dedup.P})) % ${Dedup.P}) AS band_hash
       |  FROM mh GROUP BY doc_id, h_idx // 4),
       |cands AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x
       |  JOIN bands y ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
       |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (SELECT c.a, c.b, count(*) AS inter FROM cands c
       |  JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b AND sb.sh = sa.sh
       |  GROUP BY c.a, c.b),
       |repPairs AS (
       |  SELECT i.a, i.b, CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) AS jaccard
       |  FROM inter i JOIN sz sa ON sa.doc_id = i.a JOIN sz sb ON sb.doc_id = i.b
       |  WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= $threshold),
       |same AS (SELECT u1.x AS a, u2.y AS b, 1.0::DOUBLE AS jaccard
       |  FROM groups, unnest(ids) AS u1(x), unnest(ids) AS u2(y) WHERE u1.x < u2.y),
       |crossx AS (
       |  SELECT least(u1.x, u2.y) AS a, greatest(u1.x, u2.y) AS b, p.jaccard
       |  FROM repPairs p
       |  JOIN groups ga ON ga.rep = p.a
       |  JOIN groups gb ON gb.rep = p.b,
       |  unnest(ga.ids) AS u1(x), unnest(gb.ids) AS u2(y))""".stripMargin
  }

  /** Cross-corpus near-dups (mirror of dedup_cross_corpus): the same
    * shingle→minhash→band chain over all documents, candidates restricted
    * to (even-id corpus) × (odd-id batch), exact-Jaccard verified. */
  def crossNearDups(threshold: Double, numHashes: Int = 64, bands: Int = 16): String = {
    val rpb = numHashes / bands
    val seedRows = Dedup.seedFamily(numHashes)
      .map { case (i, a, b) => s"($i::BIGINT, $a::BIGINT, $b::BIGINT)" }
      .mkString(", ")
    s"""WITH $shinglesCte,
       |bh AS (SELECT doc_id, ${poly("sh")} AS bh FROM sh),
       |mh AS (SELECT doc_id, s.i AS h_idx, min((s.a * bh.bh + s.b) % ${Dedup.P2}) AS minhash
       |       FROM bh, (VALUES $seedRows) AS s(i, a, b) GROUP BY doc_id, s.i),
       |bands AS (SELECT doc_id, h_idx // $rpb AS band,
       |    list_reduce(list_prepend(0::BIGINT, list(minhash ORDER BY h_idx)),
       |      (h, v) -> (h*31 + (v % ${Dedup.P})) % ${Dedup.P}) AS band_hash
       |  FROM mh GROUP BY doc_id, h_idx // $rpb),
       |cands AS (SELECT DISTINCT x.doc_id AS corpus_id, y.doc_id AS batch_id
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.band_hash = y.band_hash
       |  WHERE x.doc_id % 2 = 0 AND y.doc_id % 2 = 1),
       |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (SELECT c.corpus_id, c.batch_id, count(*) AS inter FROM cands c
       |  JOIN sh sa ON sa.doc_id = c.corpus_id
       |  JOIN sh sb ON sb.doc_id = c.batch_id AND sb.sh = sa.sh
       |  GROUP BY 1, 2)
       |SELECT i.corpus_id, i.batch_id, i.inter, sa.sz AS s_corpus, sb.sz AS s_batch,
       |  CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) AS jaccard
       |FROM inter i
       |JOIN sz sa ON sa.doc_id = i.corpus_id JOIN sz sb ON sb.doc_id = i.batch_id
       |WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= $threshold
       |ORDER BY corpus_id, batch_id""".stripMargin
  }

  /** dedup_minhash_neardups oracle: the verified near-dup pair list. */
  /** LSH index-quality report (mirror of Dedup.lshQualityReport): the
    * banded candidate chain vs the exact thresholded truth, folded to
    * one row of counts + precision/recall. */
  def lshQuality(threshold: Double, numHashes: Int = 64, bands: Int = 16): String = {
    val rpb = numHashes / bands
    val seedRows = Dedup.seedFamily(numHashes)
      .map { case (i, a, b) => s"($i::BIGINT, $a::BIGINT, $b::BIGINT)" }
      .mkString(", ")
    s"""WITH $shinglesCte,
       |bh AS (SELECT doc_id, ${poly("sh")} AS bh FROM sh),
       |mh AS (SELECT doc_id, s.i AS h_idx, min((s.a * bh.bh + s.b) % ${Dedup.P2}) AS minhash
       |       FROM bh, (VALUES $seedRows) AS s(i, a, b) GROUP BY doc_id, s.i),
       |bands AS (SELECT doc_id, h_idx // $rpb AS band,
       |    list_reduce(list_prepend(0::BIGINT, list(minhash ORDER BY h_idx)),
       |      (h, v) -> (h*31 + (v % ${Dedup.P})) % ${Dedup.P}) AS band_hash
       |  FROM mh GROUP BY doc_id, h_idx // $rpb),
       |cands AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x
       |  JOIN bands y ON x.band = y.band AND x.band_hash = y.band_hash
       |    AND x.doc_id < y.doc_id),
       |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
       |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id GROUP BY 1, 2),
       |truth AS (SELECT a, b FROM inter JOIN sz sa ON sa.doc_id = a
       |  JOIN sz sb ON sb.doc_id = b
       |  WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= $threshold),
       |u AS (SELECT c.a IS NOT NULL AS is_cand, t.a IS NOT NULL AS is_true
       |  FROM cands c FULL OUTER JOIN truth t ON c.a = t.a AND c.b = t.b)
       |SELECT CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       |  CAST(sum(CASE WHEN is_cand THEN 1 ELSE 0 END) AS BIGINT) AS n_cand,
       |  CAST(sum(CASE WHEN is_cand AND is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  CAST(sum(CASE WHEN is_cand AND is_true THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(sum(CASE WHEN is_cand THEN 1 ELSE 0 END) AS DOUBLE)
       |    AS candidate_precision,
       |  CAST(sum(CASE WHEN is_cand AND is_true THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS DOUBLE) AS pair_recall
       |FROM u""".stripMargin
  }

  def minhashNearDups(threshold: Double): String =
    s"""WITH ${nearDupChain("documents", threshold)}
       |SELECT a, b, jaccard FROM same
       |UNION ALL SELECT a, b, jaccard FROM crossx
       |ORDER BY a, b""".stripMargin

  /** Recursive min-label connected components over the near-dup pairs of
    * `docsRel`; ends with CTE `labels` (id, cluster_id) covering only
    * edge-incident nodes (singletons coalesce to their own id outside). */
  private def clusterLabelCtes(docsRel: String, threshold: Double): String =
    s"""${nearDupChain(docsRel, threshold)},
       |pairs AS (SELECT a, b FROM same UNION ALL SELECT a, b FROM crossx),
       |edges AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
       |reach(id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, rc.r FROM edges e JOIN reach rc ON rc.id = e.dst),
       |labels AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)""".stripMargin

  /** dedup_clusters oracle: transitive near-dup components, min-id label. */
  def nearDupClusters(threshold: Double): String =
    s"""WITH RECURSIVE ${clusterLabelCtes("documents", threshold)}
       |SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
       |FROM documents d LEFT JOIN labels l ON l.id = d.doc_id ORDER BY doc_id""".stripMargin

  /** Shared clean-pipeline CTE prefix (quality gate → near-dup clusters
    * over the qualified set), ending in
    * `clusters(doc_id, cluster_id)`. Consumed by [[pipelineCleanCorpus]],
    * [[pipelineCleanAudit]] and (over the extracted-crawl CTE)
    * [[pipelineCrawlCorpus]]. */
  private def cleanClusterCtes(threshold: Double,
                               src: String = "documents"): String =
    s"""qtoks AS (
       |  SELECT doc_id, list_transform(
       |           list_filter($wsSplit, t -> t <> ''),
       |           $normTok) AS toks
       |  FROM $src),
       |qstats AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
       |    len(list_filter(toks, t -> t IN ($stopwordList)))::BIGINT AS n_stop,
       |    len(list_filter(toks, t -> regexp_matches(t, '^[0-9]+$$')))::BIGINT AS n_digit
       |  FROM qtoks),
       |qids AS (SELECT doc_id FROM qstats
       |  WHERE n_tokens >= 10
       |    AND CAST(n_stop AS DOUBLE) / CAST(nullif(n_tokens, 0) AS DOUBLE) >= 0.01
       |    AND CAST(n_digit AS DOUBLE) / CAST(nullif(n_tokens, 0) AS DOUBLE) <= 0.5),
       |qualified AS (SELECT d.* FROM $src d JOIN qids q USING (doc_id)),
       |${clusterLabelCtes("qualified", threshold)},
       |clusters AS (SELECT q.doc_id, coalesce(l.cluster_id, q.doc_id) AS cluster_id
       |  FROM qualified q LEFT JOIN labels l ON l.id = q.doc_id)""".stripMargin

  /** pipeline_clean_corpus oracle: quality gate → near-dup clusters over
    * the qualified set → keep the min-id representative per cluster. */
  def pipelineCleanCorpus(threshold: Double): String =
    s"""WITH RECURSIVE ${cleanClusterCtes(threshold)},
       |keep AS (SELECT min(doc_id) AS doc_id FROM clusters GROUP BY cluster_id)
       |SELECT q.doc_id, q.lang, q.source FROM qualified q JOIN keep USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** pipeline_crawl_corpus oracle: the full crawl-to-corpus chain — the
    * planted HTML extracted to text (the [[htmlExtract]] chain), then
    * the SAME quality gate → near-dup clusters → keep-one pipeline the
    * clean-corpus run executes, now over the EXTRACTED text. */
  def pipelineCrawlCorpus(threshold: Double): String =
    s"""WITH RECURSIVE $htmlDocCte,
       |crawl AS (
       |  SELECT h.doc_id, ${htmlExtractedText("h.html")} AS text,
       |    d.lang, d.source
       |  FROM h JOIN documents d USING (doc_id)),
       |${cleanClusterCtes(threshold, "crawl")},
       |keep AS (SELECT min(doc_id) AS doc_id FROM clusters GROUP BY cluster_id)
       |SELECT q.doc_id, q.lang, q.source, length(q.text)::BIGINT AS n_chars
       |FROM qualified q JOIN keep USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** pipeline_clean_audit oracle (mirror of
    * TrainingPipeline.cleanCorpusAudit): one row per input document with
    * the first gate that dropped it — quality, exact_dup (byte-identical
    * to a smaller-id qualified doc), near_dup — or kept, plus the
    * retained representative. */
  def pipelineCleanAudit(threshold: Double): String =
    s"""WITH RECURSIVE ${cleanClusterCtes(threshold)},
       |krep AS (SELECT cluster_id, min(doc_id) AS kept_id
       |  FROM clusters GROUP BY cluster_id),
       |crep AS (SELECT c.doc_id, r.kept_id
       |  FROM clusters c JOIN krep r USING (cluster_id)),
       |egrp AS (SELECT text, min(doc_id) AS exact_rep FROM qualified GROUP BY text),
       |erep AS (SELECT q.doc_id, e.exact_rep
       |  FROM qualified q JOIN egrp e ON q.text = e.text)
       |SELECT d.doc_id,
       |  CASE WHEN c.kept_id IS NULL THEN 'quality'
       |       WHEN e.exact_rep <> d.doc_id THEN 'exact_dup'
       |       WHEN c.kept_id <> d.doc_id THEN 'near_dup'
       |       ELSE 'kept' END AS status,
       |  c.kept_id
       |FROM documents d
       |LEFT JOIN crep c USING (doc_id)
       |LEFT JOIN erep e USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Cosine in double with the engine's exact fold order (common-prefix
    * zip semantics for unequal dimensions, like DotProduct). */
  def cosineExpr(a: String, b: String): String = {
    def dot(x: String, y: String): String =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, least(len($x), len($y))+1), " +
        s"i -> $x[i]::DOUBLE * $y[i]::DOUBLE)), (acc, v) -> acc + v)"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  /** Brute-force cosine top-k (mirror of sim_topk query). */
  def simTopK(maxQueryId: Long, k: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
       |           WHERE vec_id < $maxQueryId),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    ${cosineExpr("q.qvec", "e.embedding")} AS score
       |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |             ORDER BY score DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, score, rank FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Matryoshka two-stage retrieval (mirror of Similarity.matryoshkaTopK):
    * coarse prefix-dim cosine top-`candidates` (same strict fold over the
    * sliced lists, same (score desc, id) tie-break), exact full-dim
    * rescore of exactly those candidates, final top-k. */
  def matryoshka(maxQueryId: Long, k: Int, prefixDims: Int, candidates: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
       |           WHERE vec_id < $maxQueryId),
       |coarse AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    ${cosineExpr(s"(q.qvec[1:$prefixDims])", s"(e.embedding[1:$prefixDims])")} AS pscore
       |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
       |cand AS (SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY pscore DESC, neighbor_id) AS prank FROM coarse)
       |  WHERE prank <= $candidates),
       |rescored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    ${cosineExpr("q.qvec", "e.embedding")} AS score
       |  FROM cand c JOIN embeddings e ON e.vec_id = c.neighbor_id
       |  JOIN q ON q.query_id = c.query_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |             ORDER BY score DESC, neighbor_id) AS rank FROM rescored)
       |SELECT query_id, neighbor_id, score, rank FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Binary-quantized Hamming retrieval (mirror of
    * Similarity.hammingTopK): sign-bit signatures packed into two
    * 32-bit-halved BIGINTs, XOR+popcount coarse ranking with
    * (hamming asc, neighbor_id) ties, exact cosine re-rank of the
    * candidates with (score desc, neighbor_id) ties. */
  def simHamming(maxQueryId: Long, k: Int, candidates: Int): String = {
    def half(rel: String, off: Int): String =
      s"list_sum(list_transform(range(0, 32), i -> CASE WHEN" +
        s" $rel.embedding[i + $off] > 0 THEN 1::BIGINT << i ELSE 0::BIGINT END))"
    s"""WITH sig AS (
       |  SELECT vec_id, coalesce(${half("embeddings", 1)}, 0) AS lo,
       |         coalesce(${half("embeddings", 33)}, 0) AS hi
       |  FROM embeddings),
       |qs AS (SELECT vec_id AS query_id, lo AS qlo, hi AS qhi FROM sig
       |       WHERE vec_id < $maxQueryId),
       |ham AS (
       |  SELECT qs.query_id, s.vec_id AS neighbor_id,
       |    (bit_count(xor(s.lo, qs.qlo)) + bit_count(xor(s.hi, qs.qhi)))::BIGINT
       |      AS hamming
       |  FROM sig s, qs WHERE s.vec_id <> qs.query_id),
       |cand AS (SELECT query_id, neighbor_id, hamming FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY hamming, neighbor_id) AS crank FROM ham)
       |  WHERE crank <= $candidates),
       |q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
       |      WHERE vec_id < $maxQueryId),
       |rescored AS (
       |  SELECT c.query_id, c.neighbor_id, c.hamming,
       |    ${cosineExpr("q.qvec", "e.embedding")} AS score
       |  FROM cand c JOIN embeddings e ON e.vec_id = c.neighbor_id
       |  JOIN q ON q.query_id = c.query_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |             ORDER BY score DESC, neighbor_id) AS rank FROM rescored)
       |SELECT query_id, neighbor_id, hamming, score, rank FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** k-NN majority-vote classification (mirror of sim_knn_classify):
    * the simTopK chain, label attach, vote count, and the argmax with
    * (votes desc, label asc) — the engine's max-struct tie-break. */
  def knnClassify(maxQueryId: Long, k: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
       |           WHERE vec_id < $maxQueryId),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    ${cosineExpr("q.qvec", "e.embedding")} AS score
       |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |             ORDER BY score DESC, neighbor_id) AS rank FROM scored),
       |nn AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= $k),
       |votes AS (
       |  SELECT nn.query_id, CAST(e.label AS BIGINT) AS nlabel,
       |    count(*)::BIGINT AS votes
       |  FROM nn JOIN embeddings e ON e.vec_id = nn.neighbor_id
       |  GROUP BY 1, 2),
       |w AS (
       |  SELECT query_id, nlabel, votes,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY votes DESC, nlabel) AS rn,
       |    CAST(sum(votes) OVER (PARTITION BY query_id) AS BIGINT) AS k_used
       |  FROM votes)
       |SELECT w.query_id, w.nlabel AS pred_label, w.votes, w.k_used,
       |  CAST(t.label AS BIGINT) AS true_label
       |FROM w JOIN embeddings t ON t.vec_id = w.query_id
       |WHERE rn = 1 ORDER BY query_id""".stripMargin

  /** Snapped-integer k-means (mirror of Ivf.kmeansAssignSnapped): the
    * identical quantization (floor(x*1e6) + 8e6), seeds (nlist lowest
    * vec_ids), per-round argmin on d = |c|^2 − 2 w·c with lowest-cell
    * tie-break, and round-half-up integer centroid snap
    * (2s + n) // (2n) — exact BIGINT arithmetic end-to-end, so the
    * unrolled `iters` Lloyd rounds reproduce the engine's assignments
    * bit-for-bit. `//` runs on non-negative operands only (the +8e6
    * shift), where DuckDB floor-division == Spark `div` truncation.
    * Empty cells keep the previous centroid via the LEFT JOIN coalesce. */
  def kmeansSnapped(nlist: Int, iters: Int): String =
    s"""${kmeansChain(nlist, iters)},
       |SZ AS (SELECT cell, count(*)::BIGINT AS cell_size FROM AF GROUP BY cell)
       |SELECT a.vec_id, a.cell, s.cell_size
       |FROM AF a JOIN SZ s USING (cell)
       |ORDER BY a.vec_id""".stripMargin

  /** Cluster-capped diversity selection (mirror of
    * TrainingPipeline.diversityCap): the snapped k-means assignment
    * chain, then keep the `cap` lowest ids per cell. */
  def diversityCap(nlist: Int, iters: Int, cap: Int): String =
    s"""${kmeansChain(nlist, iters)}
       |SELECT vec_id, cell, rank_in_cell FROM (
       |  SELECT vec_id, cell,
       |    CAST(row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS BIGINT)
       |      AS rank_in_cell
       |  FROM AF)
       |WHERE rank_in_cell <= $cap
       |ORDER BY vec_id""".stripMargin

  /** The shared snapped-k-means training chain: quantized vectors `V`,
    * seed centroids `C0`, `iters` unrolled Lloyd rounds, and the final
    * assignment `AF(vec_id, cell)`. */
  private def kmeansChain(nlist: Int, iters: Int): String = {
    def assignCte(name: String, cFrom: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT vec_id, cell FROM (
         |    SELECT v.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY sum(c.c * c.c - 2 * v.w[c.pos] * c.c), c.cell) AS rn
         |    FROM V v, $cFrom c GROUP BY v.vec_id, c.cell)
         |  WHERE rn = 1)""".stripMargin
    val rounds = (1 to iters).map { r =>
      s"""${assignCte(s"A$r", s"C${r - 1}")},
         |S$r AS (
         |  SELECT a.cell, t.pos, sum(v.w[t.pos])::BIGINT AS s, count(*)::BIGINT AS n
         |  FROM A$r a JOIN V v USING (vec_id), unnest(range(1, len(v.w) + 1)) t(pos)
         |  GROUP BY a.cell, t.pos),
         |C$r AS MATERIALIZED (
         |  SELECT c0.cell, c0.pos, coalesce((2 * s.s + s.n) // (2 * s.n), c0.c) AS c
         |  FROM C${r - 1} c0 LEFT JOIN S$r s ON c0.cell = s.cell AND c0.pos = s.pos)""".stripMargin
    }.mkString(",\n")
    s"""WITH V AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(floor(x * 1000000) AS BIGINT) + 8000000) AS w
       |  FROM embeddings),
       |C0 AS MATERIALIZED (
       |  SELECT cell, t.pos, w[t.pos] AS c
       |  FROM (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, w
       |        FROM (SELECT vec_id, w FROM V ORDER BY vec_id LIMIT $nlist)),
       |       unnest(range(1, len(w) + 1)) t(pos)),
       |$rounds,
       |${assignCte("AF", s"C$iters")}""".stripMargin
  }

  /** Nearest-centroid confusion matrix (mirror of
    * Classify.centroidConfusion): identical quantization, round-half-up
    * per-label centroid snap, exact d = |c|² − 2w·c argmin with
    * lowest-label tie-break, then (true, pred) counts. */
  val centroidConfusion: String =
    s"""WITH V AS MATERIALIZED (
       |  SELECT vec_id, CAST(label AS INTEGER) AS lbl,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(floor(x * 1000000) AS BIGINT) + 8000000) AS w
       |  FROM embeddings),
       |C AS MATERIALIZED (
       |  SELECT lbl, t.pos, (2 * sum(v.w[t.pos])::BIGINT + count(*)) // (2 * count(*)) AS c
       |  FROM V v, unnest(range(1, len(v.w) + 1)) t(pos)
       |  GROUP BY lbl, t.pos),
       |P AS (
       |  SELECT vec_id, pred FROM (
       |    SELECT v.vec_id, c.lbl AS pred,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY sum(c.c * c.c - 2 * v.w[c.pos] * c.c), c.lbl) AS rn
       |    FROM V v, C c GROUP BY v.vec_id, c.lbl)
       |  WHERE rn = 1)
       |SELECT CAST(v.lbl AS BIGINT) AS true_label, CAST(p.pred AS BIGINT) AS pred_label,
       |  count(*)::BIGINT AS n
       |FROM V v JOIN P p USING (vec_id)
       |GROUP BY 1, 2 ORDER BY true_label, pred_label""".stripMargin

  /** Exact cosine radius search (mirror of sim_radius). */
  def simRadius(maxQueryId: Long, threshold: Double): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
       |           WHERE vec_id < $maxQueryId),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    ${cosineExpr("q.qvec", "e.embedding")} AS score
       |  FROM embeddings e, q WHERE e.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, score FROM scored
       |WHERE score >= $threshold ORDER BY query_id, neighbor_id""".stripMargin

  /** Directed shingle containment above a threshold (mirror of
    * dedup_containment; shingle-set join on the raw shingle strings —
    * the engine joins on xxhash64 of them, collision-free at any
    * realistic corpus size). */
  def containment(maxDf: Long, threshold: Double): String =
    s"""WITH $shinglesCte,
       |df AS (SELECT sh AS shv, count(*) AS df FROM sh GROUP BY sh),
       |kept AS (SELECT s.doc_id, s.sh FROM sh s JOIN df ON df.shv = s.sh
       |         WHERE df.df <= $maxDf),
       |sz AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id),
       |inter AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
       |  FROM kept x JOIN kept y ON x.sh = y.sh AND x.doc_id < y.doc_id
       |  GROUP BY x.doc_id, y.doc_id),
       |d AS (SELECT a AS src, b AS dst, inter FROM inter
       |      UNION ALL SELECT b AS src, a AS dst, inter FROM inter)
       |SELECT d.src, d.dst, d.inter, s.sz AS s_src,
       |  d.inter::DOUBLE / s.sz AS containment
       |FROM d JOIN sz s ON s.doc_id = d.src
       |WHERE d.inter::DOUBLE / s.sz >= $threshold
       |ORDER BY src, dst""".stripMargin

  /** Inner-product (MIPS) top-k (mirror of sim_mips): same fold order as
    * the engine's dot product, ranked by the raw dot — no normalization. */
  def simMips(maxQueryId: Long, k: Int): String = {
    def dotE(x: String, y: String): String =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, least(len($x), len($y))+1), " +
        s"i -> $x[i]::DOUBLE * $y[i]::DOUBLE)), (acc, v) -> acc + v)"
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
       |           WHERE vec_id < $maxQueryId),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    ${dotE("q.qvec", "e.embedding")} AS score
       |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |             ORDER BY score DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, score, rank FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Embedding near-dup top pairs on a bounded id range. Zero-norm
    * vectors excluded (cosine undefined), mirroring the engine — without
    * the filter they'd surface as NULL-scored rows here while the engine
    * drops them. */
  def cosineTopPairs(maxId: Long, limit: Int): String = {
    def selfDot(x: String): String =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($x)+1), " +
        s"i -> $x[i]::DOUBLE * $x[i]::DOUBLE)), (acc, v) -> acc + v)"
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
       |           WHERE vec_id < $maxId AND ${selfDot("embedding")} > 0)
       |SELECT x.vec_id AS a, y.vec_id AS b,
       |  ${cosineExpr("x.embedding", "y.embedding")} AS score
       |FROM e x JOIN e y ON x.vec_id < y.vec_id
       |ORDER BY score DESC, a, b LIMIT $limit""".stripMargin
  }

  /** Language-ID scores (mirror of TextStats.languageId). */
  def langId: String = {
    val scoreCols = TextStats.LangMarkers.map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(toks, t -> t IN ($list))) AS score_$lang"
    }.mkString(",\n    ")
    val langs = TextStats.LangMarkers.map(_._1)
    val best = s"greatest(${langs.map(l => s"score_$l").mkString(", ")})"
    val pred = langs.reverse.foldLeft("'und'") { (els, lang) =>
      s"CASE WHEN score_$lang = best AND best > 0 THEN '$lang' ELSE $els END"
    }
    val total = langs.map(l => s"score_$l").mkString(" + ")
    s"""WITH $toksCte,
       |scored AS (SELECT doc_id,
       |    $scoreCols
       |  FROM toks),
       |withbest AS (SELECT *, $best AS best FROM scored)
       |SELECT doc_id, $pred AS pred_lang, ($total)::BIGINT AS total_hits
       |FROM withbest ORDER BY doc_id""".stripMargin
  }

  /** Stopword list as SQL literal. */
  val stopwordList: String = TextStats.Stopwords.map(w => s"'$w'").mkString(", ")

  /** text_scrub oracle: same RE2 patterns, global replace, same order
    * (urls → emails → whitespace collapse → trim). */
  def textScrub: String = {
    val url = TextStats.UrlRe
    val email = TextStats.EmailRe
    val ws = """[ \t\n\x0B\f\r]+"""
    s"""WITH c AS (
       |  SELECT doc_id, text,
       |    trim(regexp_replace(regexp_replace(regexp_replace(
       |      text, '$url', ' ', 'g'), '$email', ' ', 'g'), '$ws', ' ', 'g')) AS clean_text
       |  FROM documents)
       |SELECT doc_id, clean_text,
       |  len(regexp_extract_all(text, '$url'))::BIGINT AS n_urls,
       |  len(regexp_extract_all(text, '$email'))::BIGINT AS n_emails,
       |  (length(text) - length(clean_text))::BIGINT AS n_chars_removed
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** text_scrub_pii oracle: the same deterministic id-derived PII
    * footers injected with identical string ops, then the same RE2
    * chain in the same order (urls → emails → ips → cards → phones →
    * whitespace), each category counted on the previous step's text. */
  def textScrubPii: String = {
    val (url, email) = (TextStats.UrlRe, TextStats.EmailRe)
    val (ip, card, phone) = (TextStats.Ipv4Re, TextStats.CardRe, TextStats.PhoneRe)
    val ws = """[ \t\n\x0B\f\r]+"""
    s"""WITH inj AS (
       |  SELECT doc_id, text ||
       |    CASE WHEN doc_id % 5 = 0 THEN ' contact +1 (202) 555-' ||
       |      lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' now' ELSE '' END ||
       |    CASE WHEN doc_id % 7 = 0 THEN ' from 10.' || (doc_id % 256)::VARCHAR || '.' ||
       |      ((doc_id * 7) % 256)::VARCHAR || '.' || ((doc_id * 13) % 250)::VARCHAR ||
       |      ' logged' ELSE '' END ||
       |    CASE WHEN doc_id % 11 = 0 THEN ' card 4111111111' ||
       |      lpad((doc_id % 100)::VARCHAR, 2, '0') || '1111 used' ELSE '' END ||
       |    CASE WHEN doc_id % 13 = 0 THEN ' mail user' || doc_id::VARCHAR ||
       |      '@example.com sent' ELSE '' END AS text
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, text,
       |    regexp_replace(text, '$url', ' ', 'g') AS t1
       |  FROM inj),
       |c2 AS (SELECT *, regexp_replace(t1, '$email', ' ', 'g') AS t2 FROM c),
       |c3 AS (SELECT *, regexp_replace(t2, '$ip', ' ', 'g') AS t3 FROM c2),
       |c4 AS (SELECT *, regexp_replace(t3, '$card', ' ', 'g') AS t4 FROM c3),
       |c5 AS (SELECT *, regexp_replace(t4, '$phone', ' ', 'g') AS t5 FROM c4)
       |SELECT doc_id,
       |  trim(regexp_replace(t5, '$ws', ' ', 'g')) AS clean_text,
       |  len(regexp_extract_all(text, '$url'))::BIGINT AS n_urls,
       |  len(regexp_extract_all(t1, '$email'))::BIGINT AS n_emails,
       |  len(regexp_extract_all(t2, '$ip'))::BIGINT AS n_ips,
       |  len(regexp_extract_all(t3, '$card'))::BIGINT AS n_cards,
       |  len(regexp_extract_all(t4, '$phone'))::BIGINT AS n_phones,
       |  (length(text) - length(trim(regexp_replace(t5, '$ws', ' ', 'g'))))::BIGINT
       |    AS n_chars_removed
       |FROM c5 ORDER BY doc_id""".stripMargin
  }

  /** text_tfidf_pairs oracle: integer-scaled tf-idf weights, exact BIGINT
    * dot/norm sums, one final double division (same shape as the engine). */
  def tfIdfCosinePairs(limit: Int, maxDf: Long): String =
    s"""WITH $toksCte,
       |tok AS (SELECT doc_id, unnest(toks) AS word FROM toks),
       |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word),
       |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word HAVING count(*) <= $maxDf),
       |n AS (SELECT count(*)::DOUBLE AS n FROM documents),
       |weights AS (
       |  SELECT doc_id, word,
       |    tf * CAST(round(ln(n.n / CAST(df AS DOUBLE)) * 1000.0) AS BIGINT) AS w
       |  FROM tf JOIN df USING (word), n
       |  WHERE tf * CAST(round(ln(n.n / CAST(df AS DOUBLE)) * 1000.0) AS BIGINT) <> 0),
       |norm2 AS (SELECT doc_id, sum(w * w) AS n2 FROM weights GROUP BY doc_id),
       |dots AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, sum(x.w * y.w) AS dot
       |  FROM weights x JOIN weights y ON x.word = y.word AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT d.a, d.b,
       |  CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS score
       |FROM dots d JOIN norm2 na ON na.doc_id = d.a JOIN norm2 nb ON nb.doc_id = d.b
       |ORDER BY score DESC, a, b LIMIT $limit""".stripMargin

  /** pipeline_stratified oracle: per-stratum hash-rank quota. */
  def stratifiedSample(strataCol: String, perStratum: Int): String =
    s"""WITH r AS (
       |  SELECT doc_id, $strataCol,
       |    row_number() OVER (PARTITION BY $strataCol
       |      ORDER BY ${poly("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
       |  FROM documents)
       |SELECT doc_id, $strataCol FROM r WHERE rk <= $perStratum
       |ORDER BY $strataCol, doc_id""".stripMargin

  /** pipeline_split oracle: the same id-hash bucket assignment. */
  def assignSplits(trainPct: Int, valPct: Int): String =
    s"""SELECT doc_id, ${poly("CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
       |  CASE WHEN ${poly("CAST(doc_id AS VARCHAR)")} % 100 < $trainPct THEN 'train'
       |       WHEN ${poly("CAST(doc_id AS VARCHAR)")} % 100 < ${trainPct + valPct} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Leakage-safe split (mirror of assignSplitsByCluster): near-dup
    * cluster labels via the recursive component chain, then the
    * assignSplits hash applied to the CLUSTER id, so every cluster
    * member gets the same split. */
  def assignSplitsByCluster(trainPct: Int, valPct: Int, threshold: Double): String = {
    val b = s"${poly("CAST(cluster_id AS VARCHAR)")} % 100"
    s"""WITH RECURSIVE ${clusterLabelCtes("documents", threshold)},
       |clusters AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN labels l ON l.id = d.doc_id)
       |SELECT doc_id, cluster_id, $b AS bucket,
       |  CASE WHEN $b < $trainPct THEN 'train'
       |       WHEN $b < ${trainPct + valPct} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM clusters ORDER BY doc_id""".stripMargin
  }

  /** pipeline_mixture oracle: the same per-stratum id-hash keep-rates. */
  def mixtureSample(ratesPct: Seq[(String, Int)], defaultPct: Int,
                    strataCol: String = "lang"): String = {
    val cases = ratesPct.map { case (s, p) => s"WHEN $strataCol = '$s' THEN $p" }
      .mkString(" ")
    s"""SELECT doc_id, $strataCol FROM documents
       |WHERE ${poly("CAST(doc_id AS VARCHAR)")} % 100 <
       |  CASE $cases ELSE $defaultPct END
       |ORDER BY doc_id""".stripMargin
  }

  /** Temperature-weighted mixture (mirror of
    * TrainingPipeline.temperatureMixture): per-stratum counts, weights
    * floor(sqrt(n)·1e6) (sqrt is IEEE-exact in both engines), keep-rate
    * (100·target·w) // (Σw·n) capped at 100 in HUGEINT (mirrors the
    * engine's BigInt — both truncate on positive operands), then the
    * same id-hash filter. NULL strata get their own computed rate via
    * IS NOT DISTINCT FROM. */
  def temperatureMixture(targetPct: Int, strataCol: String = "lang"): String =
    s"""WITH c AS (SELECT $strataCol, count(*)::BIGINT AS n FROM documents GROUP BY $strataCol),
       |t AS (SELECT sum(n)::BIGINT AS total FROM c),
       |w AS (SELECT $strataCol, n,
       |        CAST(floor(sqrt(n::DOUBLE) * 1000000.0) AS BIGINT) AS ws FROM c),
       |sw AS (SELECT sum(ws)::HUGEINT AS sumw FROM w),
       |p AS (
       |  SELECT w.$strataCol,
       |    least(100::HUGEINT,
       |      (100::HUGEINT * ((t.total * $targetPct) // 100) * w.ws) // (sw.sumw * w.n))
       |      AS pct
       |  FROM w, t, sw)
       |SELECT d.doc_id, d.$strataCol FROM documents d
       |JOIN p ON p.$strataCol IS NOT DISTINCT FROM d.$strataCol
       |WHERE ${poly("CAST(d.doc_id AS VARCHAR)")} % 100 < p.pct
       |ORDER BY d.doc_id""".stripMargin

  /** text_chunks oracle: same chunk grid (starts = multiples of stride
    * below the token count), same inclusive list slicing. */
  def chunkDocuments(chunkSize: Int, stride: Int): String =
    s"""WITH $toksCte,
       |s AS (SELECT doc_id, toks, u.s AS start_pos
       |      FROM toks, unnest(range(0, len(toks), $stride)) AS u(s))
       |SELECT doc_id, (start_pos // $stride)::BIGINT AS chunk_id,
       |  start_pos::BIGINT AS start_pos,
       |  len(list_slice(toks, start_pos + 1, start_pos + $chunkSize))::BIGINT AS n_chunk_tokens,
       |  array_to_string(list_slice(toks, start_pos + 1, start_pos + $chunkSize), ' ') AS chunk_text
       |FROM s ORDER BY doc_id, chunk_id""".stripMargin

  /** pipeline_pack oracle: plain global window cumsum (the oracle may
    * single-partition; the engine must not). */
  def packSequences(targetTokens: Long): String =
    s"""WITH $toksCte,
       |t AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens FROM toks),
       |c AS (SELECT doc_id, n_tokens,
       |  sum(n_tokens) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t)
       |SELECT doc_id, n_tokens, cum::BIGINT AS cum_tokens,
       |  ((cum - n_tokens) // $targetTokens)::BIGINT AS bin_id
       |FROM c ORDER BY doc_id""".stripMargin

  /** Packed-batch materialization (mirror of
    * TrainingPipeline.packedBatches): the packSequences bin chain joined
    * with the vocab-id encoding, per-doc streams EOS(-1)-terminated and
    * concatenated in doc-id order, rendered CSV. */
  def packedBatches(targetTokens: Long): String =
    s"""WITH $toksCte,
       |t AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens FROM toks),
       |c AS (SELECT doc_id, n_tokens,
       |  sum(n_tokens) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t),
       |bins AS (SELECT doc_id, ((cum - n_tokens) // $targetTokens)::BIGINT AS bin_id FROM c),
       |tokpos AS (
       |  SELECT doc_id, i - 1 AS pos, toks[i] AS word
       |  FROM toks, unnest(range(1, len(toks)+1)) AS r(i)),
       |counts AS (SELECT word, count(*) AS cnt FROM tokpos GROUP BY word),
       |vocab AS (SELECT word, row_number() OVER (ORDER BY cnt DESC, word) - 1 AS word_id
       |          FROM counts),
       |encdoc AS (
       |  SELECT t.doc_id, list(coalesce(v.word_id, -1) ORDER BY t.pos) AS ids
       |  FROM tokpos t LEFT JOIN vocab v USING (word) GROUP BY t.doc_id),
       |rows_ AS (
       |  SELECT b.bin_id, b.doc_id,
       |    coalesce(e.ids, []::BIGINT[]) AS ids
       |  FROM bins b LEFT JOIN encdoc e USING (doc_id)),
       |eosed AS (
       |  SELECT bin_id, doc_id, len(ids)::BIGINT AS n,
       |    list_concat(ids, [-1]::BIGINT[]) AS idse
       |  FROM rows_)
       |SELECT bin_id, count(*)::BIGINT AS n_docs, sum(n)::BIGINT AS n_tokens,
       |  array_to_string(flatten(list(idse ORDER BY doc_id)), ',') AS ids_csv
       |FROM eosed GROUP BY bin_id ORDER BY bin_id""".stripMargin

  /** Self dot product with the engine's exact fold order. */
  private def selfDot(x: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($x)+1), " +
      s"i -> $x[i]::DOUBLE * $x[i]::DOUBLE)), (acc, v) -> acc + v)"

  /** dedup_embedding oracle: exact thresholded cosine pairs on a bounded
    * id range (all-pairs — oracle only), then recursive min-label
    * components; zero-norm vectors pair with nothing and keep their own
    * id, like every other singleton. */
  def embeddingClusters(maxId: Long, threshold: Double): String =
    s"""WITH RECURSIVE ${embeddingClusterCtes(maxId, threshold)}
       |SELECT vec_id, cluster_id FROM eclusters ORDER BY vec_id""".stripMargin

  /** Hard-negative mining (mirror of Similarity.hardNegatives): the
    * embedding-cluster chain defines the positive set; negatives are the
    * exact cosine top-k among vectors OUTSIDE the query's cluster. */
  def hardNegatives(maxId: Long, maxQueryId: Long, k: Int,
                    threshold: Double): String =
    s"""WITH RECURSIVE ${embeddingClusterCtes(maxId, threshold)},
       |q AS (SELECT vec_id AS query_id, embedding AS qvec FROM base
       |      WHERE vec_id < $maxQueryId),
       |cq AS (SELECT vec_id AS query_id, cluster_id AS qcl FROM eclusters
       |       WHERE vec_id < $maxQueryId),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    ${cosineExpr("q.qvec", "e.embedding")} AS score
       |  FROM base e, q WHERE e.vec_id <> q.query_id),
       |nonpos AS (
       |  SELECT s.query_id, s.neighbor_id, s.score
       |  FROM scored s
       |  JOIN cq ON cq.query_id = s.query_id
       |  JOIN eclusters cn ON cn.vec_id = s.neighbor_id
       |  WHERE cn.cluster_id <> cq.qcl),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |             ORDER BY score DESC, neighbor_id) AS rank FROM nonpos)
       |SELECT query_id, neighbor_id, score, rank FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** pipeline_split_safe_emb oracle: the embedding-cluster chain, then
    * the assignSplits hash applied to the CLUSTER id (mirror of
    * assignSplitsByEmbeddingCluster). */
  def assignSplitsByEmbeddingCluster(trainPct: Int, valPct: Int,
                                     maxId: Long, threshold: Double): String = {
    val b = s"${poly("CAST(cluster_id AS VARCHAR)")} % 100"
    s"""WITH RECURSIVE ${embeddingClusterCtes(maxId, threshold)}
       |SELECT vec_id, cluster_id, $b AS bucket,
       |  CASE WHEN $b < $trainPct THEN 'train'
       |       WHEN $b < ${trainPct + valPct} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM eclusters ORDER BY vec_id""".stripMargin
  }

  /** Shared embedding-cosine component chain: exact thresholded pairs on
    * a bounded id range (all-pairs — oracle only), recursive min-label
    * components, `eclusters(vec_id, cluster_id)` with singletons
    * labeled by their own id. */
  private def embeddingClusterCtes(maxId: Long, threshold: Double): String =
    s"""base AS (SELECT vec_id, embedding FROM embeddings
       |            WHERE vec_id < $maxId),
       |e AS (SELECT vec_id, embedding FROM base WHERE ${selfDot("embedding")} > 0),
       |pairs AS (SELECT x.vec_id AS a, y.vec_id AS b
       |  FROM e x JOIN e y ON x.vec_id < y.vec_id
       |  WHERE ${cosineExpr("x.embedding", "y.embedding")} >= $threshold),
       |edges AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
       |reach(id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT g.src, rc.r FROM edges g JOIN reach rc ON rc.id = g.dst),
       |labels AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
       |eclusters AS (SELECT b.vec_id, coalesce(l.cluster_id, b.vec_id) AS cluster_id
       |  FROM base b LEFT JOIN labels l ON l.id = b.vec_id)""".stripMargin

  /** pipeline_decon_embedding oracle: exact cross-side thresholded
    * cosine (all-pairs n·m — oracle only; the engine cell-prunes).
    * Eval side = vec_id < evalMax; corpus side = [evalMax, corpusMax).
    * Zero-norm vectors on either side pair with nothing. */
  def crossSemanticPairs(evalMax: Long, corpusMax: Long, threshold: Double): String =
    s"""WITH ev AS (SELECT vec_id, embedding FROM embeddings
       |            WHERE vec_id < $evalMax AND ${selfDot("embedding")} > 0),
       |co AS (SELECT vec_id, embedding FROM embeddings
       |       WHERE vec_id >= $evalMax AND vec_id < $corpusMax
       |         AND ${selfDot("embedding")} > 0),
       |s AS (SELECT c.vec_id AS corpus_id, e.vec_id AS eval_id,
       |        ${cosineExpr("c.embedding", "e.embedding")} AS score
       |      FROM co c CROSS JOIN ev e)
       |SELECT corpus_id, eval_id, score FROM s WHERE score >= $threshold
       |ORDER BY corpus_id, eval_id""".stripMargin

  /** Raw regex/list fragments for the Gopher-rule oracle (plain strings:
    * interpolated triple-quoted strings process \x/\p escapes). */
  private val rawWords = """list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), w -> w <> '')"""
  private val symbolPattern = """#|\.\.\.|…"""
  private val bulletPattern = """^[ \t]*[-*•]"""
  private val ellipsisPattern = """(\.\.\.|…)$"""
  private val letterPattern = """[\p{L}]"""

  /** text_gopher oracle: the same rule battery over RAW whitespace words
    * and chr(10)-split lines. Integer counts everywhere; each ratio is a
    * single guarded double division, mirroring the engine's shape. */
  def gopherQuality(minWords: Int, maxWords: Int,
                    minMeanWordLen: Double, maxMeanWordLen: Double,
                    maxSymbolRatio: Double, maxBulletRatio: Double,
                    maxEllipsisRatio: Double, minAlphaRatio: Double,
                    minStopwords: Int): String =
    s"""WITH w AS (
       |  SELECT doc_id, $rawWords AS ws, string_split(text, chr(10)) AS ls, text
       |  FROM documents),
       |raw AS (
       |  SELECT doc_id,
       |    len(ws)::BIGINT AS n_words,
       |    coalesce(list_sum(list_transform(ws, x -> length(x)::BIGINT)), 0)::BIGINT
       |      AS sum_word_len,
       |    len(regexp_extract_all(text, '$symbolPattern'))::BIGINT AS n_symbols,
       |    len(ls)::BIGINT AS n_lines,
       |    len(list_filter(ls, l -> regexp_matches(l, '$bulletPattern')))::BIGINT
       |      AS n_bullet_lines,
       |    len(list_filter(ls, l -> regexp_matches(l, '$ellipsisPattern')))::BIGINT
       |      AS n_ellipsis_lines,
       |    len(list_filter(ws, x -> regexp_matches(x, '$letterPattern')))::BIGINT
       |      AS n_alpha_words,
       |    len(list_filter(ws, x -> lower(x) IN ($stopwordList)))::BIGINT AS n_stopwords
       |  FROM w),
       |r2 AS (
       |  SELECT *,
       |    CAST(sum_word_len AS DOUBLE) / CAST(nullif(n_words, 0) AS DOUBLE) AS mean_word_len,
       |    CAST(n_symbols AS DOUBLE) / CAST(nullif(n_words, 0) AS DOUBLE) AS symbol_ratio,
       |    CAST(n_bullet_lines AS DOUBLE) / CAST(nullif(n_lines, 0) AS DOUBLE) AS bullet_ratio,
       |    CAST(n_ellipsis_lines AS DOUBLE) / CAST(nullif(n_lines, 0) AS DOUBLE) AS ellipsis_ratio,
       |    CAST(n_alpha_words AS DOUBLE) / CAST(nullif(n_words, 0) AS DOUBLE) AS alpha_ratio
       |  FROM raw)
       |SELECT doc_id, n_words, sum_word_len, n_symbols, n_lines, n_bullet_lines,
       |  n_ellipsis_lines, n_alpha_words, n_stopwords, mean_word_len, symbol_ratio,
       |  bullet_ratio, ellipsis_ratio, alpha_ratio,
       |  (n_words >= $minWords AND n_words <= $maxWords
       |   AND mean_word_len >= $minMeanWordLen AND mean_word_len <= $maxMeanWordLen
       |   AND symbol_ratio <= $maxSymbolRatio
       |   AND bullet_ratio <= $maxBulletRatio AND ellipsis_ratio <= $maxEllipsisRatio
       |   AND alpha_ratio >= $minAlphaRatio AND n_stopwords >= $minStopwords) AS passes
       |FROM r2 ORDER BY doc_id""".stripMargin

  /** Bigram-LM scoring (mirror of graft.ext.LmScore.scoreDocuments):
    * add-one-smoothed ln P(b|a), integer-scaled, summed per document.
    * Same division/ln/round shape as the engine for bit parity. */
  /** The CTE chain behind [[lmScore]], ending in
    * `lms(doc_id, n_bigrams, sum_logp_scaled)` — composable by the
    * curriculum/preference oracles that rank on the LM signal. */
  val lmScoreCtes: String =
    s"""$toksCte,
       |tok AS (SELECT doc_id, unnest(toks) AS w FROM toks),
       |uni AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS uc FROM tok GROUP BY w),
       |${ngramsCte(2)},
       |bi AS MATERIALIZED (SELECT g, CAST(count(*) AS BIGINT) AS bc FROM grams GROUP BY g),
       |v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
       |lp_terms AS (
       |  SELECT grams.doc_id,
       |    CAST(round(ln(CAST(bi.bc + 1 AS DOUBLE) / CAST(uni.uc + v.v AS DOUBLE))
       |      * 1000000.0) AS BIGINT) AS lp
       |  FROM grams
       |  CROSS JOIN v
       |  JOIN bi ON grams.g = bi.g
       |  JOIN uni ON string_split(grams.g, ' ')[1] = uni.w),
       |lms AS (
       |  SELECT doc_id, count(*) AS n_bigrams, CAST(sum(lp) AS BIGINT) AS sum_logp_scaled
       |  FROM lp_terms GROUP BY doc_id)""".stripMargin

  val lmScore: String =
    s"""WITH $lmScoreCtes
       |SELECT doc_id, n_bigrams, sum_logp_scaled FROM lms ORDER BY doc_id""".stripMargin

  /** Interpolated Kneser–Ney bigram scoring (mirror of
    * LmScore.kneserNeyScoreDocuments): D = 3/4 as exact integer math —
    * `ln(((4c−3)·NT + 3·n1a·n1w) / (4·ca·NT))`, products in HUGEINT
    * (DECIMAL(38,0) in Spark), the ratio as a division of the same two
    * nearest-doubles, integer-scaled and summed per document. */
  val knScore: String =
    s"""WITH $toksCte,
       |${ngramsCte(2)},
       |kb AS MATERIALIZED (
       |  SELECT g, CAST(count(*) AS BIGINT) AS c,
       |    string_split(g, ' ')[1] AS a, string_split(g, ' ')[2] AS b
       |  FROM grams GROUP BY g),
       |ctx AS (SELECT a, CAST(sum(c) AS BIGINT) AS ca,
       |               CAST(count(*) AS BIGINT) AS n1a FROM kb GROUP BY a),
       |cont AS (SELECT b, CAST(count(*) AS BIGINT) AS n1w FROM kb GROUP BY b),
       |nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM kb),
       |terms AS (
       |  SELECT grams.doc_id,
       |    CAST(round(ln(
       |      CAST((4 * kb.c - 3)::HUGEINT * nt.nt
       |           + 3::HUGEINT * ctx.n1a * cont.n1w AS DOUBLE)
       |      / CAST(4::HUGEINT * ctx.ca * nt.nt AS DOUBLE)) * 1000000.0)
       |      AS BIGINT) AS lp
       |  FROM grams
       |  CROSS JOIN nt
       |  JOIN kb ON grams.g = kb.g
       |  JOIN ctx ON kb.a = ctx.a
       |  JOIN cont ON kb.b = cont.b)
       |SELECT doc_id, count(*) AS n_bigrams, CAST(sum(lp) AS BIGINT) AS sum_logp_scaled
       |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Per-document LM quality score CTE `lmq(doc_id, score)` — the
    * per-bigram average of the integer-scaled log-likelihood (mirror of
    * TrainingPipeline.lmQualityScore: one double division over exact
    * BIGINT inputs). */
  val lmQualityCtes: String =
    s"""$lmScoreCtes,
       |lmq AS (
       |  SELECT doc_id,
       |    CAST(sum_logp_scaled AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS score
       |  FROM lms)""".stripMargin

  /** Full BPE-trainer replay (mirror of graft.ext.Bpe.train): word freqs
    * from the shared tokenizer, then per SCAN a weighted adjacent-pair
    * count, the top-K candidate walk with the batched greedy
    * taboo-selection (same K = OverscanFactor·batch, same fixed budget
    * schedule, same (cnt desc, a, b) tie order as the engine), and the
    * canonical greedy merge walk as a per-word recursive index scan.
    * Generated per scan like the engine's loop; rnd is the global merge
    * order across scans. */
  def bpeMerges(merges: Int, batch: Int = graft.ext.Bpe.DefaultBatch): String = {
    val scans = (merges + batch - 1) / batch
    s"""${bpeChain(merges, batch)}
       |SELECT CAST(row_number() OVER (ORDER BY scan, j) AS INTEGER) AS rnd,
       |  lhs, rhs, lhs || rhs AS merged, cnt
       |FROM (
       |  ${(1 to scans).map(r =>
              s"SELECT $r AS scan, j, pa[j] AS lhs, pb[j] AS rhs, pc[j] AS cnt " +
              s"FROM M$r, unnest(range(1, len(pa) + 1)) t(j)")
              .mkString("\n  UNION ALL ")}
       |) ORDER BY rnd""".stripMargin
  }

  /** Subword usage after training: final segmentations weighted by word
    * frequency (mirror of Bpe.subwordFrequencies). */
  def bpeSubwords(merges: Int, batch: Int = graft.ext.Bpe.DefaultBatch): String = {
    val scans = (merges + batch - 1) / batch
    s"""${bpeChain(merges, batch)}
       |SELECT sym AS subword, CAST(sum(freq) AS BIGINT) AS n
       |FROM S$scans, unnest(l) u(sym)
       |GROUP BY subword ORDER BY subword""".stripMargin
  }

  /** Corpus encoding with the trained vocabulary (mirror of
    * Bpe.encodeCorpus): in-alphabet tokens join the final segmentation
    * table in token order; per doc the token/subword counts and the
    * space-joined segmented stream. */
  def bpeEncode(merges: Int, batch: Int = graft.ext.Bpe.DefaultBatch): String = {
    val scans = (merges + batch - 1) / batch
    s"""${bpeChain(merges, batch)},
       |tokpos AS (
       |  SELECT doc_id, toks[i] AS word, i AS tok_no
       |  FROM toks, unnest(range(1, len(toks) + 1)) AS t(i)
       |  WHERE regexp_matches(toks[i], '^[a-z0-9]+$$')),
       |enc AS (
       |  SELECT t.doc_id, t.tok_no, array_to_string(s.l, ' ') AS seg,
       |    array_length(s.l)::BIGINT AS ns
       |  FROM tokpos t JOIN S$scans s ON t.word = s.word),
       |eagg AS (
       |  SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(ns)::BIGINT AS n_subwords,
       |    string_agg(seg, ' ' ORDER BY tok_no) AS segmented
       |  FROM enc GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
       |  coalesce(a.n_subwords, 0)::BIGINT AS n_subwords,
       |  coalesce(a.segmented, '') AS segmented
       |FROM documents d LEFT JOIN eagg a ON d.doc_id = a.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Byte-level encode ([[graft.ext.ByteBpe.encodeCorpus]] mirror): the
    * byte chain over the salted corpus, then the same encode join —
    * tokens of the salted text, the byte-family word regex. */
  def byteBpeEncode(merges: Int, batch: Int = graft.ext.Bpe.DefaultBatch): String = {
    val scans = (merges + batch - 1) / batch
    s"""${byteBpeChain(merges, batch)},
       |tokpos AS (
       |  SELECT doc_id, toks[i] AS word, i AS tok_no
       |  FROM toks, unnest(range(1, len(toks) + 1)) AS t(i)
       |  WHERE regexp_matches(toks[i], '^[a-zé0-9ï]+$$')),
       |enc AS (
       |  SELECT t.doc_id, t.tok_no, array_to_string(s.l, ' ') AS seg,
       |    array_length(s.l)::BIGINT AS ns
       |  FROM tokpos t JOIN S$scans s ON t.word = s.word),
       |eagg AS (
       |  SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(ns)::BIGINT AS n_subwords,
       |    string_agg(seg, ' ' ORDER BY tok_no) AS segmented
       |  FROM enc GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
       |  coalesce(a.n_subwords, 0)::BIGINT AS n_subwords,
       |  coalesce(a.segmented, '') AS segmented
       |FROM documents d LEFT JOIN eagg a ON d.doc_id = a.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Fit-once / encode-any-batch deployment shape (mirror of
    * `Bpe.fit(documents).encode(derived)`): the FULL trainer replay on
    * `documents` (same [[bpeChain]] as the other BPE oracles), then the
    * learned merge log applied to a DERIVED corpus — each document's text
    * concatenated with its vowel-rotated form, so the new corpus contains
    * both in-vocabulary and OOV words — and the encode join/aggregation
    * of [[bpeEncode]] over the re-segmented word table.
    *
    * The replay here is SEQUENTIAL: one greedy-walk pass per learned
    * merge, in global merge order. The engine replays in disjoint greedy
    * GROUPS (Bpe.fit's regrouping), but a disjoint batch applies exactly
    * like its merges applied one-at-a-time in order — the
    * BpeSpec-proved equivalence the whole batched trainer rests on — so
    * the sequential oracle is bit-identical without having to reproduce
    * the (data-dependent) group boundaries in SQL. A missing merge rank
    * (corpus dried up early) null-propagates to a no-op pass. */
  def bpeModelEncode(merges: Int, batch: Int = graft.ext.Bpe.DefaultBatch): String = {
    val scans = (merges + batch - 1) / batch
    val mergeRows = (1 to scans).map(r =>
        s"SELECT $r AS scan, j, pa[j] AS lhs, pb[j] AS rhs " +
        s"FROM M$r, unnest(range(1, len(pa) + 1)) t(j)")
      .mkString("\n  UNION ALL ")
    val replayCtes = (1 to merges).map { k =>
      val hit = s"l[i] = (SELECT lhs FROM mlog WHERE rnd = $k) " +
        s"AND l[i+1] = (SELECT rhs FROM mlog WHERE rnd = $k)"
      s"""RW$k AS (
         |  SELECT word, l, CAST(1 AS BIGINT) AS i, CAST([] AS VARCHAR[]) AS acc FROM W${k - 1}
         |  UNION ALL
         |  SELECT word, l,
         |    i + CASE WHEN i < array_length(l) AND $hit THEN 2 ELSE 1 END,
         |    list_append(acc, CASE WHEN i < array_length(l) AND $hit
         |        THEN l[i] || l[i+1] ELSE l[i] END)
         |  FROM RW$k WHERE i <= array_length(l)),
         |W$k AS MATERIALIZED (SELECT word, acc AS l FROM RW$k WHERE i = array_length(l) + 1)""".stripMargin
    }.mkString(",\n")
    s"""${bpeChain(merges, batch)},
       |mlog AS MATERIALIZED (
       |  SELECT CAST(row_number() OVER (ORDER BY scan, j) AS INTEGER) AS rnd, lhs, rhs
       |  FROM ($mergeRows)),
       |docs2 AS MATERIALIZED (
       |  SELECT doc_id, text || ' ' || translate(text, 'aeiou', 'eioua') AS text
       |  FROM documents),
       |${toksCteFor("docs2", "toks2")},
       |W0 AS MATERIALIZED (
       |  SELECT word, list_append(string_split_regex(word, ''), '_') AS l
       |  FROM (SELECT DISTINCT w AS word FROM toks2, unnest(toks) AS u(w)
       |        WHERE regexp_matches(w, '^[a-z0-9]+$$'))),
       |$replayCtes,
       |tokpos2 AS (
       |  SELECT doc_id, toks[i] AS word, i AS tok_no
       |  FROM toks2, unnest(range(1, len(toks) + 1)) AS t(i)
       |  WHERE regexp_matches(toks[i], '^[a-z0-9]+$$')),
       |enc2 AS (
       |  SELECT t.doc_id, t.tok_no, array_to_string(s.l, ' ') AS seg,
       |    array_length(s.l)::BIGINT AS ns
       |  FROM tokpos2 t JOIN W$merges s ON t.word = s.word),
       |eagg2 AS (
       |  SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(ns)::BIGINT AS n_subwords,
       |    string_agg(seg, ' ' ORDER BY tok_no) AS segmented
       |  FROM enc2 GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
       |  coalesce(a.n_subwords, 0)::BIGINT AS n_subwords,
       |  coalesce(a.segmented, '') AS segmented
       |FROM documents d LEFT JOIN eagg2 a ON d.doc_id = a.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  private def bpeChain(merges: Int, batch: Int): String =
    s"""WITH RECURSIVE $toksCte,
       |tok AS MATERIALIZED (SELECT unnest(toks) AS word FROM toks),
       |S0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq,
       |              list_append(string_split_regex(word, ''), '_') AS l
       |       FROM tok WHERE regexp_matches(word, '^[a-z0-9]+$$') GROUP BY word),
       |${bpeRoundCtes(merges, batch)}""".stripMargin

  /** The byte-level chain ([[graft.ext.ByteBpe]] mirror): the corpus is
    * salted with the multi-byte words, S0's symbols are the word's
    * UTF-8 bytes as two-digit lowercase hex, and the merge rounds are
    * the IDENTICAL machinery (symbols stay inside `[a-z0-9_]+`). */
  private def byteBpeChain(merges: Int, batch: Int): String =
    s"""WITH RECURSIVE bdocs AS (
       |  SELECT doc_id, text || ' protégé cafés naïve' AS text FROM documents),
       |${toksCteFor("bdocs", "toks")},
       |tok AS MATERIALIZED (SELECT unnest(toks) AS word FROM toks),
       |S0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq,
       |  list_append(list_transform(range(1, strlen(word) + 1),
       |    i -> lower(substr(hex(encode(word)), 2 * i - 1, 2))), '_') AS l
       |  FROM tok WHERE regexp_matches(word, '^[a-zé0-9ï]+$$') GROUP BY word),
       |${bpeRoundCtes(merges, batch)}""".stripMargin

  private def bpeRoundCtes(merges: Int, batch: Int): String = {
    val scans = (merges + batch - 1) / batch
    val k = graft.ext.Bpe.OverscanFactor * batch
    // every non-recursive CTE is MATERIALIZED: DuckDB otherwise inlines
    // CTEs at each reference, and the per-scan scalar subqueries would
    // re-expand the whole upstream chain exponentially (observed as fd
    // exhaustion on the base parquet scan)
    val roundCtes = (1 to scans).map { r =>
      val prev = s"S${r - 1}"
      val budget = math.min(batch, merges - batch * (r - 1))
      // greedy taboo admission: under budget, and lhs/rhs/concat all
      // unseen among previously admitted candidates' {lhs, rhs, concat}
      val ok = s"len(g.pa) < $budget AND NOT list_contains(g.taboo, c.a) " +
        "AND NOT list_contains(g.taboo, c.b) AND NOT list_contains(g.taboo, c.a || c.b)"
      // the ' ' key separator cannot collide: symbols match ^[a-z0-9_]+$
      val hit = s"list_contains((SELECT keys FROM M$r), l[i] || ' ' || l[i+1])"
      s"""P$r AS MATERIALIZED (SELECT l[i] AS a, l[i+1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM $prev, unnest(range(1, array_length(l))) t(i) GROUP BY a, b),
         |C$r AS MATERIALIZED (
         |  SELECT a, b, cnt, row_number() OVER (ORDER BY cnt DESC, a, b) AS rn
         |  FROM P$r ORDER BY cnt DESC, a, b LIMIT $k),
         |G$r AS (
         |  SELECT CAST(0 AS BIGINT) AS rn, CAST([] AS VARCHAR[]) AS taboo,
         |    CAST([] AS VARCHAR[]) AS pa, CAST([] AS VARCHAR[]) AS pb,
         |    CAST([] AS BIGINT[]) AS pc
         |  UNION ALL
         |  SELECT c.rn,
         |    CASE WHEN $ok THEN g.taboo || [c.a, c.b, c.a || c.b] ELSE g.taboo END,
         |    CASE WHEN $ok THEN list_append(g.pa, c.a) ELSE g.pa END,
         |    CASE WHEN $ok THEN list_append(g.pb, c.b) ELSE g.pb END,
         |    CASE WHEN $ok THEN list_append(g.pc, c.cnt) ELSE g.pc END
         |  FROM G$r g JOIN C$r c ON c.rn = g.rn + 1),
         |M$r AS MATERIALIZED (
         |  SELECT pa, pb, pc,
         |    list_transform(range(1, len(pa) + 1), j -> pa[j] || ' ' || pb[j]) AS keys
         |  FROM G$r ORDER BY rn DESC LIMIT 1),
         |R$r AS (
         |  SELECT word, freq, l, CAST(1 AS BIGINT) AS i, CAST([] AS VARCHAR[]) AS acc FROM $prev
         |  UNION ALL
         |  SELECT word, freq, l,
         |    i + CASE WHEN i < array_length(l) AND $hit THEN 2 ELSE 1 END,
         |    list_append(acc, CASE WHEN i < array_length(l) AND $hit
         |        THEN l[i] || l[i+1] ELSE l[i] END)
         |  FROM R$r WHERE i <= array_length(l)),
         |S$r AS MATERIALIZED (SELECT word, freq, acc AS l FROM R$r WHERE i = array_length(l) + 1)""".stripMargin
    }.mkString(",\n")
    roundCtes
  }

  /** Span-level exact dedup (mirror of Dedup.spanDedup): the window
    * row_number form is fine oracle-side (small n); the engine uses the
    * skew-safe min-struct aggregation with identical semantics. */
  def spanDedup(w: Int): String =
    s"""WITH $toksCte,
       |sp AS (
       |  SELECT doc_id, i AS span_no,
       |    array_to_string(toks[(i*$w+1):((i+1)*$w)], ' ') AS span
       |  FROM toks, unnest(range(0, (len(toks)+${w - 1})//$w)) AS u(i)),
       |k AS (SELECT *, row_number() OVER (PARTITION BY span ORDER BY doc_id, span_no) = 1 AS kept
       |      FROM sp),
       |agg AS (SELECT doc_id, count(*) AS n_spans,
       |          sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       |          coalesce(string_agg(span, ' ' ORDER BY span_no) FILTER (kept), '') AS clean_text
       |        FROM k GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(a.n_spans, 0)::BIGINT AS n_spans,
       |       coalesce(a.n_kept, 0)::BIGINT AS n_kept,
       |       coalesce(a.clean_text, '') AS clean_text
       |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Naive all-window ground truth of the suffix-array duplicate spans
    * (mirror of Dedup.suffixDuplicateSpans): every position whose
    * L-token window occurs ≥ 2 times anywhere, consecutive starts
    * merged gaps-and-islands into maximal spans. */
  def suffixDuplicateSpans(l: Int): String =
    s"""WITH $toksCte,
       |pos AS (
       |  SELECT doc_id, i AS p, array_to_string(toks[(i+1):(i+$l)], ' ') AS gram
       |  FROM toks, unnest(range(0, greatest(len(toks)-$l+1, 0))) AS u(i)),
       |dup AS (SELECT gram FROM pos GROUP BY gram HAVING count(*) >= 2),
       |dp AS (SELECT doc_id, p FROM pos JOIN dup USING (gram)),
       |isl AS (
       |  SELECT doc_id, p,
       |    p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS g
       |  FROM dp)
       |SELECT doc_id, min(p)::BIGINT AS span_start,
       |  (max(p) - min(p) + $l)::BIGINT AS span_len
       |FROM isl GROUP BY doc_id, g ORDER BY doc_id, span_start""".stripMargin

  /** Naive exact-LCP ground truth (mirror of Dedup.suffixLcpReport):
    * all suffixes sorted lexicographically, each position's longest
    * duplicate = max common prefix with its order neighbors, per doc
    * the max with the smallest start. The lambda finds the first
    * token mismatch position; no mismatch ⇒ the shorter length
    * (list_position returns 0, not NULL, on a miss — nullif guards). */
  val suffixLcpReport: String =
    s"""WITH $toksCte,
       |pos AS (
       |  SELECT doc_id, i AS p, toks[(i+1):] AS s
       |  FROM toks, unnest(range(0, len(toks))) AS u(i)),
       |ord AS (
       |  SELECT doc_id, p, s,
       |    lag(s)  OVER (ORDER BY s, doc_id, p) AS prv,
       |    lead(s) OVER (ORDER BY s, doc_id, p) AS nxt
       |  FROM pos),
       |lc AS (
       |  SELECT doc_id, p,
       |    greatest(
       |      CASE WHEN prv IS NULL THEN 0 ELSE coalesce(
       |        nullif(list_position(list_transform(range(1, least(len(s), len(prv))+1),
       |          k -> s[k] = prv[k]), false), 0) - 1,
       |        least(len(s), len(prv))) END,
       |      CASE WHEN nxt IS NULL THEN 0 ELSE coalesce(
       |        nullif(list_position(list_transform(range(1, least(len(s), len(nxt))+1),
       |          k -> s[k] = nxt[k]), false), 0) - 1,
       |        least(len(s), len(nxt))) END)::BIGINT AS dup_len
       |  FROM ord),
       |rep AS (SELECT doc_id, max(dup_len) AS lcp_len FROM lc GROUP BY doc_id)
       |SELECT l.doc_id, min(l.p)::BIGINT AS lcp_start, r.lcp_len::BIGINT AS lcp_len
       |FROM lc l JOIN rep r ON l.doc_id = r.doc_id AND l.dup_len = r.lcp_len
       |WHERE r.lcp_len >= 1
       |GROUP BY l.doc_id, r.lcp_len
       |ORDER BY l.doc_id""".stripMargin

  /** Naive cross-corpus ground truth of the suffix contamination
    * (mirror of Dedup.suffixCrossContamination over the derived eval
    * set): eval L-gram starts whose gram occurs in TRAIN, merged
    * gaps-and-islands. */
  def suffixCrossContamination(l: Int): String =
    s"""WITH $toksCte,
       |ev AS (
       |  SELECT doc_id + 5000000 AS doc_id, substring(text, 1, 80) AS text
       |  FROM documents WHERE doc_id % 17 = 0
       |  UNION ALL
       |  SELECT doc_id + 6000000, 'zqxeval ' || doc_id || ' wholly novel benchmark prompt'
       |  FROM documents WHERE doc_id % 17 = 5),
       |${toksCteFor("ev", "etoks")},
       |tg AS (
       |  SELECT DISTINCT array_to_string(toks[(i+1):(i+$l)], ' ') AS gram
       |  FROM toks, unnest(range(0, greatest(len(toks)-$l+1, 0))) AS u(i)),
       |eg AS (
       |  SELECT doc_id, i AS p, array_to_string(toks[(i+1):(i+$l)], ' ') AS gram
       |  FROM etoks, unnest(range(0, greatest(len(toks)-$l+1, 0))) AS u(i)),
       |hit AS (SELECT doc_id, p FROM eg JOIN tg USING (gram)),
       |isl AS (
       |  SELECT doc_id, p,
       |    p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS g
       |  FROM hit)
       |SELECT doc_id, min(p)::BIGINT AS span_start,
       |  (max(p) - min(p) + $l)::BIGINT AS span_len
       |FROM isl GROUP BY doc_id, g ORDER BY doc_id, span_start""".stripMargin

  /** Character-distribution entropy (mirror of TextStats.charEntropy):
    * same integer-scaled ln terms, one final double division. */
  val charEntropy: String =
    """WITH c AS (
      |  SELECT doc_id, list_filter(string_split(text, ''), ch -> ch <> '') AS cs
      |  FROM documents),
      |e AS (
      |  SELECT doc_id, len(cs)::BIGINT AS n_chars,
      |    len(list_distinct(cs))::BIGINT AS n_distinct_chars,
      |    list_reduce(list_prepend(0::BIGINT,
      |      list_transform(
      |        list_transform(list_distinct(cs), ch -> len(list_filter(cs, y -> y = ch))::BIGINT),
      |        cnt -> cnt * CAST(round(ln(cnt) * 1000000.0) AS BIGINT))),
      |      (a, b) -> a + b) AS sum_clnc_scaled
      |  FROM c)
      |SELECT doc_id, n_chars, n_distinct_chars, sum_clnc_scaled,
      |  CASE WHEN n_chars > 0
      |       THEN (n_chars * CAST(round(ln(n_chars) * 1000000.0) AS BIGINT)
      |             - sum_clnc_scaled)::DOUBLE / (n_chars::DOUBLE * 1000000.0)
      |       ELSE 0.0 END AS entropy
      |FROM e ORDER BY doc_id""".stripMargin

  /** Deterministic training-order shuffle (mirror of
    * TrainingPipeline.shuffleShards): same seeded rolling hash, same
    * per-shard dense rank. */
  def shuffleShards(nShards: Int, seed: String): String =
    s"""WITH h AS (SELECT doc_id, ${poly(s"'${sqlStr(seed)}:' || doc_id")} AS shuffle_key FROM documents)
       |SELECT doc_id, shuffle_key % $nShards AS shard,
       |  row_number() OVER (PARTITION BY shuffle_key % $nShards
       |                     ORDER BY shuffle_key, doc_id) - 1 AS pos
       |FROM h ORDER BY shard, pos""".stripMargin

  /** [[shuffleShards]] with nShards derived from the corpus size exactly as
    * TrainingPipeline.shuffleShardsAuto does: ceil(N / rowsPerShard). */
  def shuffleShardsAuto(rowsPerShard: Long, seed: String): String =
    s"""WITH p AS (
       |  SELECT greatest(1, (count(*) + $rowsPerShard - 1) // $rowsPerShard) AS ns
       |  FROM documents),
       |h AS (SELECT doc_id, ${poly(s"'${sqlStr(seed)}:' || doc_id")} AS shuffle_key FROM documents)
       |SELECT doc_id, shuffle_key % (SELECT ns FROM p) AS shard,
       |  row_number() OVER (PARTITION BY shuffle_key % (SELECT ns FROM p)
       |                     ORDER BY shuffle_key, doc_id) - 1 AS pos
       |FROM h ORDER BY shard, pos""".stripMargin

  /** Weighted source interleaving (mirror of
    * TrainingPipeline.interleaveBySource): same seeded rolling hash, same
    * per-source rank, same exact (k+1)·(LCM/weight) BIGINT key. */
  def interleave(weights: Seq[(String, Int)], defaultWeight: Int, seed: String): String = {
    val all = (defaultWeight +: weights.map(_._2)).distinct
    val lcm = all.foldLeft(1L) { (acc, w) =>
      acc / BigInt(acc).gcd(BigInt(w)).toLong * w }
    val weightCase = weights
      .map { case (s, p) => s"WHEN source = '${sqlStr(s)}' THEN ${lcm / p}" }
      .mkString("CASE ", " ", s" ELSE ${lcm / defaultWeight} END")
    s"""WITH r AS (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY ${poly(s"'${sqlStr(seed)}:' || doc_id")}, doc_id) - 1 AS pos_in_source
       |  FROM documents)
       |SELECT doc_id, source, pos_in_source,
       |  (pos_in_source + 1) * ($weightCase) AS interleave_key
       |FROM r ORDER BY interleave_key, source, doc_id""".stripMargin
  }

  /** Per-dimension embedding stats (mirror of Similarity.dimStats): exact
    * integer power sums, one double expression for mean/std. The squared
    * sum accumulates exactly (HUGEINT here, DECIMAL(38,0) in Spark) and is
    * rendered as DOUBLE on both sides — same nearest-double of the same
    * exact integer. */
  /** Shared CTE chain ending in `sc(doc_id, cls, score_scaled)` — the NB
    * per-class integer-scaled scores (mirror of
    * Classify.naiveBayesScores). Consumed by [[naiveBayes]] (argmax
    * prediction) and [[nbRoc]]/[[nbAuc]] (one-vs-rest evaluation). */
  private val nbScoreCtes: String =
    s"""$toksCte,
       |tok AS (
       |  SELECT t.doc_id, d.lang AS cls, w AS word
       |  FROM toks t JOIN documents d USING (doc_id), unnest(t.toks) AS u(w)),
       |cw AS (SELECT cls, word, count(*) AS c FROM tok GROUP BY 1, 2),
       |p AS (SELECT (SELECT count(DISTINCT word) FROM cw) AS v,
       |             (SELECT count(*) FROM documents) AS ntot),
       |ct AS (SELECT cls, sum(c)::BIGINT AS t FROM cw GROUP BY 1),
       |nd AS (SELECT lang AS cls, count(*) AS n_docs FROM documents GROUP BY 1),
       |cm AS (
       |  SELECT ct.cls,
       |    CAST(round(ln(nd.n_docs::DOUBLE / (SELECT ntot FROM p)::DOUBLE)
       |         * 1000000.0) AS BIGINT) AS prior_scaled,
       |    CAST(round(ln((ct.t + (SELECT v FROM p))::DOUBLE) * 1000000.0) AS BIGINT)
       |      AS norm_scaled
       |  FROM ct JOIN nd USING (cls)),
       |dtf AS (SELECT doc_id, word, count(*) AS cnt FROM tok GROUP BY 1, 2),
       |dlen AS (
       |  SELECT d.doc_id, coalesce(t.n_tokens, 0)::BIGINT AS n_tokens
       |  FROM documents d LEFT JOIN (
       |    SELECT doc_id, sum(cnt)::BIGINT AS n_tokens FROM dtf GROUP BY 1) t
       |  USING (doc_id)),
       |hit AS (
       |  SELECT dtf.doc_id, cw.cls,
       |    sum(dtf.cnt * CAST(round(ln((cw.c + 1)::DOUBLE) * 1000000.0) AS BIGINT))::BIGINT
       |      AS hit_scaled
       |  FROM dtf JOIN cw USING (word) GROUP BY 1, 2),
       |sc AS (
       |  SELECT dlen.doc_id, cm.cls,
       |    cm.prior_scaled + coalesce(hit.hit_scaled, 0)
       |      - dlen.n_tokens * cm.norm_scaled AS score_scaled
       |  FROM dlen CROSS JOIN cm
       |  LEFT JOIN hit ON hit.doc_id = dlen.doc_id AND hit.cls = cm.cls)""".stripMargin

  /** Multinomial Naive Bayes prediction (mirror of
    * Classify.naiveBayesPredict): same add-one-smoothed counts, same
    * integer-scaled logs, same sparse hit join + dense class grid, same
    * (score desc, class asc) argmax tiebreak. */
  val naiveBayes: String =
    s"""WITH $nbScoreCtes,
       |rn AS (
       |  SELECT doc_id, cls, score_scaled,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY score_scaled DESC, cls) AS rn
       |  FROM sc)
       |SELECT r.doc_id, r.cls AS pred, r.score_scaled, d.lang AS actual,
       |  r.cls = d.lang AS is_correct
       |FROM rn r JOIN documents d USING (doc_id)
       |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** NB confusion matrix (mirror of Classify.naiveBayesConfusion):
    * the prediction chain folded to (actual, pred, n). */
  val nbConfusion: String =
    s"""WITH $nbScoreCtes,
       |rn AS (
       |  SELECT doc_id, cls, score_scaled,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY score_scaled DESC, cls) AS rn
       |  FROM sc),
       |pred AS (
       |  SELECT r.doc_id, r.cls AS pred, d.lang AS actual
       |  FROM rn r JOIN documents d USING (doc_id) WHERE rn = 1)
       |SELECT actual, pred, count(*) AS n FROM pred
       |GROUP BY 1, 2 ORDER BY actual, pred""".stripMargin

  /** Shared unigram-model CTE chain (mirror of Unigram.vocabulary):
    * distinct words → weighted overlapping substrings → top-V pieces ∪
    * all single chars → integer-scaled log probs over the selected
    * total. Ends in `uwords(word, wc)` and
    * `uvocab(piece, cnt, logp_scaled)`. */
  private val unigramModelCtes: String = {
    val mpl = ext.Unigram.MaxPieceLen
    val top = ext.Unigram.VocabTop
    s"""utok AS (
       |  SELECT lower(regexp_replace(t, '[^\\p{L}\\p{N}]+', '', 'g')) AS word
       |  FROM documents,
       |    unnest(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+')) AS u(t)
       |  WHERE t <> ''),
       |uwords AS MATERIALIZED (
       |  SELECT word, count(*)::BIGINT AS wc FROM utok WHERE word <> '' GROUP BY 1),
       |upieces AS MATERIALIZED (
       |  SELECT substr(w.word, i::INT, L::INT) AS piece, sum(w.wc)::BIGINT AS cnt
       |  FROM uwords w,
       |    unnest(range(1, least($mpl, length(w.word)) + 1)) AS ll(L),
       |    unnest(range(1, length(w.word) - L + 2)) AS ii(i)
       |  GROUP BY 1),
       |utop AS (SELECT piece, cnt FROM upieces ORDER BY cnt DESC, piece LIMIT $top),
       |uvocab0 AS MATERIALIZED (
       |  SELECT DISTINCT piece, cnt FROM (
       |    SELECT * FROM utop
       |    UNION ALL
       |    SELECT piece, cnt FROM upieces WHERE length(piece) = 1)),
       |utot AS (SELECT sum(cnt)::BIGINT AS total FROM uvocab0),
       |uvocab AS MATERIALIZED (
       |  SELECT piece, cnt,
       |    CAST(round(ln(cnt::DOUBLE / total::DOUBLE) * 1000000.0) AS BIGINT)
       |      AS logp_scaled
       |  FROM uvocab0, utot)""".stripMargin
  }

  def unigramVocab: String =
    s"""WITH $unigramModelCtes
       |SELECT piece, cnt, logp_scaled FROM uvocab ORDER BY piece""".stripMargin

  /** The Viterbi DP + backtrace as unrolled CTE chains (the
    * kmeans/pagerank unroll pattern): `d_i` holds the best score and
    * backpointer at position i — argmax over the ≤ MaxPieceLen
    * predecessors via the same integer tie-break key `tot·32 − j` the
    * engine uses (keys are provably collision-free: equal keys force
    * equal j) — and `bt_k` walks the pointers back, assembling the
    * space-joined segmentation. */
  private def unigramDpCtes: String = {
    val mwl = ext.Unigram.MaxWordLen
    val mpl = ext.Unigram.MaxPieceLen
    def dCte(i: Int): String = {
      val branches = (math.max(0, i - mpl) until i).map { j =>
        val pieceLen = i - j
        val prevJoin = if (j == 0) "" else s" JOIN d$j ON d$j.word = w.word"
        val prevScore = if (j == 0) "0" else s"d$j.score"
        s"""    SELECT w.word, $j AS j, ($prevScore + v.logp_scaled) AS tot
           |    FROM swords w$prevJoin
           |    JOIN uvocab v ON v.piece = substr(w.word, ${j + 1}, $pieceLen)
           |    WHERE length(w.word) >= $i""".stripMargin
      }.mkString("\n    UNION ALL\n")
      s"""d$i AS MATERIALIZED (
         |  SELECT word, arg_max(j, tot * 32 - j) AS bp,
         |         arg_max(tot, tot * 32 - j) AS score
         |  FROM (
         |$branches
         |  ) s GROUP BY word)""".stripMargin
    }
    val allDp = (1 to mwl)
      .map(i => s"  SELECT word, $i AS i, bp, score FROM d$i")
      .mkString("\n  UNION ALL\n")
    def btCte(k: Int): String = {
      val prev = if (k == 1) "bt0" else s"bt${k - 1}"
      s"""bt$k AS MATERIALIZED (
         |  SELECT b.word, b.wc,
         |    CASE WHEN b.pos = 0 THEN 0 ELSE a.bp END AS pos,
         |    CASE WHEN b.pos = 0 THEN b.acc
         |         ELSE substr(b.word, a.bp + 1, b.pos - a.bp) ||
         |              (CASE WHEN b.acc = '' THEN '' ELSE ' ' END) || b.acc
         |    END AS acc,
         |    CASE WHEN b.pos = 0 THEN b.np ELSE b.np + 1 END AS np
         |  FROM $prev b LEFT JOIN alldp a ON a.word = b.word AND a.i = b.pos)""".stripMargin
    }
    s"""swords AS (SELECT word, wc FROM uwords WHERE length(word) <= $mwl),
       |${(1 to mwl).map(dCte).mkString(",\n")},
       |alldp AS MATERIALIZED (
       |$allDp),
       |bt0 AS (SELECT word, wc, length(word)::INT AS pos,
       |          CAST('' AS VARCHAR) AS acc, 0 AS np FROM swords),
       |${(1 to mwl).map(btCte).mkString(",\n")}""".stripMargin
  }

  /** WordPiece model CTEs (mirror of WordPiece.vocabulary): prefix
    * candidates vs position-≥2 continuation candidates, top-K each by
    * (cnt desc, piece asc), single-char INITIAL pieces force-included,
    * continuation pieces in their `##` wire form. */
  private val wpModelCtes: String = {
    val mpl = ext.WordPiece.MaxPieceLen
    s"""wptok AS (
       |  SELECT lower(regexp_replace(t, '[^\\p{L}\\p{N}]+', '', 'g')) AS word
       |  FROM documents,
       |    unnest(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+')) AS u(t)
       |  WHERE t <> ''),
       |wpwords AS MATERIALIZED (
       |  SELECT word, count(*)::BIGINT AS wc FROM wptok WHERE word <> '' GROUP BY 1),
       |wppieces AS MATERIALIZED (
       |  SELECT (i > 1) AS is_cont, substr(w.word, i::INT, L::INT) AS sub,
       |    sum(w.wc)::BIGINT AS cnt
       |  FROM wpwords w,
       |    unnest(range(1, least($mpl, length(w.word)) + 1)) AS ll(L),
       |    unnest(range(1, length(w.word) - L + 2)) AS ii(i)
       |  GROUP BY 1, 2),
       |wpinit AS (
       |  SELECT sub, cnt FROM wppieces WHERE NOT is_cont
       |  ORDER BY cnt DESC, sub LIMIT ${ext.WordPiece.InitTop}),
       |wpinitv AS (
       |  SELECT DISTINCT sub, cnt FROM (
       |    SELECT * FROM wpinit
       |    UNION ALL
       |    SELECT sub, cnt FROM wppieces WHERE NOT is_cont AND length(sub) = 1)),
       |wpcont AS (
       |  SELECT sub, cnt FROM wppieces WHERE is_cont
       |  ORDER BY cnt DESC, sub LIMIT ${ext.WordPiece.ContTop}),
       |wpvocab AS MATERIALIZED (
       |  SELECT sub AS piece, cnt, FALSE AS is_continuation FROM wpinitv
       |  UNION ALL
       |  SELECT '##' || sub, cnt, TRUE FROM wpcont)""".stripMargin
  }

  def wordpieceVocab: String =
    s"""WITH $wpModelCtes
       |SELECT piece, cnt, is_continuation FROM wpvocab ORDER BY piece""".stripMargin

  /** Mirror of WordPiece.encode: best-piece length per (word, position)
    * precomputed from the vocabulary, then the greedy walk unrolled
    * [[ext.WordPiece.MaxWordLen]] steps (each step advances ≥ 1 char or
    * marks the word UNK). `wpWalkCtes` is the shared body; the final
    * per-word frame lives in g{MaxWordLen}. */
  private def wpWalkCtes: String = {
    val mpl = ext.WordPiece.MaxPieceLen
    val mwl = ext.WordPiece.MaxWordLen
    def gCte(k: Int): String = {
      val prev = if (k == 1) "g0" else s"g${k - 1}"
      s"""g$k AS MATERIALIZED (
         |  SELECT g.word, g.wc,
         |    CASE WHEN g.unk OR g.pos > length(g.word) THEN g.pos
         |         WHEN b.len IS NULL THEN g.pos
         |         ELSE g.pos + b.len END AS pos,
         |    CASE WHEN g.unk OR g.pos > length(g.word) OR b.len IS NULL THEN g.acc
         |         ELSE g.acc || (CASE WHEN g.acc = '' THEN '' ELSE ' ' END) ||
         |              (CASE WHEN g.pos = 1 THEN '' ELSE '##' END) ||
         |              substr(g.word, g.pos::INT, b.len::INT) END AS acc,
         |    CASE WHEN g.unk OR g.pos > length(g.word) OR b.len IS NULL THEN g.np
         |         ELSE g.np + 1 END AS np,
         |    CASE WHEN g.unk THEN TRUE
         |         WHEN g.pos <= length(g.word) AND b.len IS NULL THEN TRUE
         |         ELSE FALSE END AS unk
         |  FROM $prev g LEFT JOIN wpbest b ON b.word = g.word AND b.pos = g.pos)""".stripMargin
    }
    s"""$wpModelCtes,
       |swp AS (SELECT word, wc FROM wpwords WHERE length(word) <= $mwl),
       |wpcand AS (
       |  SELECT w.word, ii.i AS pos, ll.L AS len,
       |    CASE WHEN ii.i = 1 THEN substr(w.word, 1, ll.L::INT)
       |         ELSE '##' || substr(w.word, ii.i::INT, ll.L::INT) END AS form
       |  FROM swp w,
       |    unnest(range(1, length(w.word) + 1)) AS ii(i),
       |    unnest(range(1, $mpl + 1)) AS ll(L)
       |  WHERE ii.i + ll.L - 1 <= length(w.word)),
       |wpbest AS MATERIALIZED (
       |  SELECT c.word, c.pos, max(c.len) AS len
       |  FROM wpcand c JOIN wpvocab v ON v.piece = c.form
       |  GROUP BY 1, 2),
       |g0 AS (SELECT word, wc, 1::BIGINT AS pos, CAST('' AS VARCHAR) AS acc,
       |         0::BIGINT AS np, FALSE AS unk FROM swp),
       |${(1 to mwl).map(gCte).mkString(",\n")}""".stripMargin
  }

  def wordpieceEncode: String = {
    val mwl = ext.WordPiece.MaxWordLen
    s"""WITH $wpWalkCtes
       |SELECT g.word, g.wc,
       |  CASE WHEN g.unk THEN '${ext.WordPiece.Unk}' ELSE g.acc END AS segmentation,
       |  (CASE WHEN g.unk THEN 1 ELSE g.np END)::BIGINT AS n_pieces,
       |  g.unk AS is_unk
       |FROM g$mwl g ORDER BY g.word""".stripMargin
  }

  /** Mirror of WordPiece.fertilityReport: per-word greedy piece counts
    * ([UNK] contributes 1, as the single token it becomes) joined onto
    * the language-tagged token stream, integer fertility. */
  def wordpieceFertility: String = {
    val mwl = ext.WordPiece.MaxWordLen
    s"""WITH $wpWalkCtes,
       |wpenc AS (
       |  SELECT word, (CASE WHEN unk THEN 1 ELSE np END)::BIGINT AS np
       |  FROM g$mwl),
       |ltok AS (
       |  SELECT d.lang,
       |    lower(regexp_replace(t, '[^\\p{L}\\p{N}]+', '', 'g')) AS word
       |  FROM documents d,
       |    unnest(regexp_split_to_array(d.text, '[ \\t\\n\\x0B\\f\\r]+')) AS u(t)
       |  WHERE t <> '')
       |SELECT l.lang, count(*)::BIGINT AS n_words, sum(e.np)::BIGINT AS n_pieces,
       |  ((sum(e.np) * 1000) // count(*))::BIGINT AS fertility_scaled
       |FROM ltok l JOIN wpenc e ON e.word = l.word
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  def unigramEncode: String =
    s"""WITH $unigramModelCtes,
       |$unigramDpCtes
       |SELECT b.word, b.wc, b.acc AS segmentation, b.np::BIGINT AS n_pieces,
       |  d.score::BIGINT AS score_scaled
       |FROM bt${ext.Unigram.MaxWordLen} b
       |JOIN alldp d ON d.word = b.word AND d.i = length(b.word)
       |ORDER BY b.word""".stripMargin

  /** Mirror of Unigram.fertilityReport: per-word piece counts joined
    * onto the language-tagged token stream, integer fertility. */
  def unigramFertility: String =
    s"""WITH $unigramModelCtes,
       |$unigramDpCtes,
       |ltok AS (
       |  SELECT d.lang,
       |    lower(regexp_replace(t, '[^\\p{L}\\p{N}]+', '', 'g')) AS word
       |  FROM documents d,
       |    unnest(regexp_split_to_array(d.text, '[ \\t\\n\\x0B\\f\\r]+')) AS u(t)
       |  WHERE t <> '')
       |SELECT l.lang, count(*)::BIGINT AS n_words, sum(b.np)::BIGINT AS n_pieces,
       |  ((sum(b.np) * 1000) // count(*))::BIGINT AS fertility_scaled
       |FROM ltok l JOIN bt${ext.Unigram.MaxWordLen} b ON b.word = l.word
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Cohen's kappa of the NB self-eval (mirror of Eval.kappaReport over
    * naiveBayesPredict): confusion fold, full-outer marginal join (a
    * never-predicted class still contributes its row marginal), products
    * in wide integers (HUGEINT here, DECIMAL(38,0) in Spark), one final
    * double ratio from the same exact integers. */
  val nbKappa: String =
    s"""WITH $nbScoreCtes,
       |rn AS (
       |  SELECT doc_id, cls, score_scaled,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY score_scaled DESC, cls) AS rn
       |  FROM sc),
       |pred AS (
       |  SELECT r.doc_id, r.cls AS pred, d.lang AS actual
       |  FROM rn r JOIN documents d USING (doc_id) WHERE rn = 1),
       |conf AS (SELECT actual, pred, count(*)::BIGINT AS cnt
       |         FROM pred GROUP BY 1, 2),
       |rm AS (SELECT actual AS c, sum(cnt) AS row_n FROM conf GROUP BY 1),
       |cm2 AS (SELECT pred AS c, sum(cnt) AS col_n FROM conf GROUP BY 1),
       |marg AS (
       |  SELECT coalesce(row_n, 0) AS row_n, coalesce(col_n, 0) AS col_n
       |  FROM rm FULL JOIN cm2 USING (c)),
       |src AS (SELECT sum(row_n * col_n) AS sum_rc FROM marg),
       |tot AS (SELECT count(*) AS n,
       |          sum(CASE WHEN pred = actual THEN 1 ELSE 0 END) AS n_agree
       |        FROM pred),
       |kp AS (
       |  SELECT n, n_agree, sum_rc,
       |    n * n_agree - sum_rc AS kappa_num,
       |    n * n - sum_rc AS kappa_den
       |  FROM tot, src)
       |SELECT CAST(n AS BIGINT) AS n, CAST(n_agree AS BIGINT) AS n_agree,
       |  CAST(CAST(sum_rc AS HUGEINT) AS VARCHAR) AS sum_rc,
       |  CAST(CAST(kappa_num AS HUGEINT) AS VARCHAR) AS kappa_num,
       |  CAST(CAST(kappa_den AS HUGEINT) AS VARCHAR) AS kappa_den,
       |  CAST(kappa_num AS DOUBLE) / CAST(kappa_den AS DOUBLE) AS kappa
       |FROM kp""".stripMargin

  /** Reliability table + exact ECE of the k-NN vote classifier (mirror
    * of Eval.knnCalibration over knnClassify): same vote-count bins,
    * integer gap numerators, and the identical final divisions. */
  def knnCalibration(maxQueryId: Long, k: Int): String =
    s"""WITH knn AS (${knnClassify(maxQueryId, k).replace(" ORDER BY query_id", "")}),
       |bins AS (
       |  SELECT votes, count(*)::BIGINT AS n,
       |    sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)::BIGINT
       |      AS n_correct
       |  FROM knn GROUP BY 1),
       |g AS (SELECT votes, n, n_correct,
       |        abs($k * n_correct - votes * n)::BIGINT AS gap_num FROM bins),
       |tot AS (SELECT sum(n)::BIGINT AS n_total,
       |          sum(gap_num)::BIGINT AS ece_num FROM g)
       |SELECT g.votes, g.n, g.n_correct, g.gap_num,
       |  g.votes::DOUBLE / ${k.toDouble} AS conf,
       |  g.n_correct::DOUBLE / g.n::DOUBLE AS acc,
       |  t.n_total, t.ece_num,
       |  ($k::BIGINT * t.n_total)::BIGINT AS ece_den,
       |  t.ece_num::DOUBLE / ($k::BIGINT * t.n_total)::DOUBLE AS ece
       |FROM g, tot t ORDER BY votes""".stripMargin

  /** Shared ROC CTE chain over the NB one-vs-rest scores for `posCls`
    * (mirror of Eval.rocTable): per-distinct-score class counts with
    * cumulative TP/FP in score-descending order. A null label falls
    * through the CASE to negative, like Spark's `when`. */
  /** CTE chain ending in `scored(doc_id, score_scaled, is_pos)` — the
    * one-vs-rest evaluation frame shared by the ROC/AUC and lift
    * oracles. */
  private def nbScoredCtes(posCls: String): String =
    s"""$nbScoreCtes,
       |scored AS (
       |  SELECT sc.doc_id, sc.score_scaled,
       |    d.lang = '${sqlStr(posCls)}' AS is_pos
       |  FROM sc JOIN documents d USING (doc_id)
       |  WHERE sc.cls = '${sqlStr(posCls)}')""".stripMargin

  private def nbRocCtes(posCls: String): String =
    s"""${nbScoredCtes(posCls)},
       |h AS (
       |  SELECT score_scaled,
       |    sum(CASE WHEN is_pos THEN 1 ELSE 0 END)::BIGINT AS n_pos,
       |    sum(CASE WHEN is_pos THEN 0 ELSE 1 END)::BIGINT AS n_neg
       |  FROM scored GROUP BY 1),
       |roc AS (
       |  SELECT score_scaled, n_pos, n_neg,
       |    CAST(sum(n_pos) OVER (ORDER BY score_scaled DESC) AS BIGINT) AS cum_tp,
       |    CAST(sum(n_neg) OVER (ORDER BY score_scaled DESC) AS BIGINT) AS cum_fp
       |  FROM h)""".stripMargin

  /** Decile lift table (mirror of Eval.liftTable on Eval.binaryNbScores):
    * global (score desc, doc_id) rank, bucket = (rank−1)·buckets // N,
    * per-bucket counts and exact positive rate. */
  def nbLift(posCls: String, buckets: Int): String =
    s"""WITH ${nbScoredCtes(posCls)},
       |r AS (
       |  SELECT doc_id, is_pos,
       |    row_number() OVER (ORDER BY score_scaled DESC, doc_id) AS rank
       |  FROM scored),
       |tot AS (SELECT count(*)::BIGINT AS n FROM scored)
       |SELECT (rank - 1) * $buckets // (SELECT n FROM tot) AS bucket,
       |  count(*)::BIGINT AS n,
       |  sum(CASE WHEN is_pos THEN 1 ELSE 0 END)::BIGINT AS n_pos,
       |  CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS pos_rate
       |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin

  /** ROC sweep table (mirror of Eval.rocTable on Eval.binaryNbScores). */
  def nbRoc(posCls: String): String =
    s"""WITH ${nbRocCtes(posCls)}
       |SELECT score_scaled, n_pos, n_neg, cum_tp, cum_fp
       |FROM roc ORDER BY score_scaled DESC""".stripMargin

  /** One-row exact AUC report (mirror of Eval.aucReport): the doubled
    * Mann–Whitney count expanded to one aggregate pass over the ROC
    * table; num2/den2 computed in wide integers (HUGEINT here,
    * DECIMAL(38,0) in Spark) but RENDERED as decimal strings — the one
    * engine-neutral form for precision-38 integers — and the ratio as
    * the division of the same two exact-integer doubles. */
  def nbAuc(posCls: String): String =
    s"""WITH ${nbRocCtes(posCls)}
       |SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
       |  CAST(sum(n_neg) AS BIGINT) AS n_neg,
       |  CAST(CAST(2*sum(n_pos)*sum(n_neg) - 2*sum(n_pos*cum_fp) + sum(n_pos*n_neg)
       |       AS HUGEINT) AS VARCHAR) AS auc_num2,
       |  CAST(CAST(2*sum(n_pos)*sum(n_neg) AS HUGEINT) AS VARCHAR) AS auc_den2,
       |  CAST(2*sum(n_pos)*sum(n_neg) - 2*sum(n_pos*cum_fp) + sum(n_pos*n_neg)
       |       AS DOUBLE)
       |    / CAST(2*sum(n_pos)*sum(n_neg) AS DOUBLE) AS auc
       |FROM roc""".stripMargin

  /** Fixed-round integer-scaled PageRank over the corpus bigram graph
    * (mirror of Graph.wordPageRank): iterations unrolled as chained CTEs,
    * same `((dnum·r) // dden · w) // W` per-edge contribution in wide
    * integers (HUGEINT here, DECIMAL(38,0) in Spark). */
  def pageRank(iters: Int, dnum: Long = 85, dden: Long = 100): String = {
    val S = ext.Graph.SCALE
    val base = s"((($dden - $dnum) * $S) // $dden) // (SELECT n FROM p)"
    def round(k: Int): String =
      s"""r$k AS (
         |  SELECT n.node, $base + coalesce(c.s, 0) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT ew.dst AS node,
         |      sum((((($dnum * r.rank) // $dden)::HUGEINT * ew.w::HUGEINT)
         |           // ew.wout::HUGEINT)::BIGINT)::BIGINT AS s
         |    FROM ew JOIN r${k - 1} r ON r.node = ew.src GROUP BY 1) c USING (node))""".stripMargin
    s"""WITH $toksCte,
       |pr AS (
       |  SELECT toks[i] AS src, toks[i+1] AS dst
       |  FROM toks, unnest(range(1, len(toks))) AS u(i)),
       |e AS (SELECT src, dst, count(*) AS w FROM pr GROUP BY 1, 2),
       |ow AS (SELECT src, sum(w)::BIGINT AS wout FROM e GROUP BY 1),
       |ew AS (SELECT e.src, e.dst, e.w, ow.wout FROM e JOIN ow USING (src)),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |p AS (SELECT count(*)::BIGINT AS n FROM nodes),
       |${(s"r0 AS (SELECT node, $S // (SELECT n FROM p) AS rank FROM nodes)" +:
            (1 to iters).map(round)).mkString(",\n")}
       |SELECT node, rank AS rank_scaled FROM r$iters
       |ORDER BY rank_scaled DESC, node""".stripMargin
  }

  /** Fixed-round min-label propagation over the corpus bigram graph
    * (mirror of Graph.wordLabelPropagation): iterations unrolled as
    * chained CTEs — each round joins the previous labels over the
    * symmetric edge list, takes the per-node neighbor min, and folds it
    * into the node's own label. */
  def labelProp(iters: Int): String = {
    def round(k: Int): String =
      s"""l$k AS (
         |  SELECT l.node,
         |    least(l.label, coalesce(m.nl, l.label)) AS label
         |  FROM l${k - 1} l LEFT JOIN (
         |    SELECT s.dst AS node, min(p.label) AS nl
         |    FROM sym s JOIN l${k - 1} p ON p.node = s.src GROUP BY 1) m
         |  USING (node))""".stripMargin
    s"""WITH $toksCte,
       |pr AS (
       |  SELECT toks[i] AS src, toks[i+1] AS dst
       |  FROM toks, unnest(range(1, len(toks))) AS u(i)),
       |e AS (SELECT src, dst FROM pr GROUP BY 1, 2),
       |u AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
       |      FROM e WHERE src <> dst GROUP BY 1, 2),
       |sym AS (SELECT a AS src, b AS dst FROM u
       |        UNION ALL SELECT b, a FROM u),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |${(s"l0 AS (SELECT node, node AS label FROM nodes)" +:
            (1 to iters).map(round)).mkString(",\n")}
       |SELECT node, label FROM l$iters ORDER BY node""".stripMargin
  }

  /** BM25 ranked retrieval (mirror of TextStats.bm25): identical double
    * expression shape on exact integer inputs, per-term scores integer-
    * scaled BEFORE the per-document sum. Float constants are serialized
    * from the same Scala doubles Spark folds in, so both engines evaluate
    * bit-identical literals. */
  /** The BM25 scoring chain, ending in `g(doc_id, n_hits, score_scaled)`
    * — shared by [[bm25]] and the hybrid-RRF oracle. */
  private def bm25Chain(terms: Seq[String], k1: Double, b: Double): String = {
    val inList = terms.map(t => s"'${sqlStr(t)}'").mkString(", ")
    s"""$toksCte,
       |tok AS (SELECT doc_id, w AS word FROM toks, unnest(toks) AS u(w)),
       |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
       |corpus AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_dl FROM dl),
       |qtf AS (SELECT * FROM tf WHERE word IN ($inList)),
       |df AS (SELECT word, count(*) AS df FROM qtf GROUP BY 1),
       |s AS (
       |  SELECT q.doc_id,
       |    CAST(round(
       |      ln(1.0 + ((c.n_docs - d.df)::DOUBLE + 0.5) / (d.df::DOUBLE + 0.5))
       |      * ((q.tf::DOUBLE * ${k1 + 1.0}) /
       |         (q.tf::DOUBLE + $k1 * ((1.0 - $b) + ($b * l.dl::DOUBLE) /
       |            (c.total_dl::DOUBLE / c.n_docs::DOUBLE))))
       |      * 1000000.0) AS BIGINT) AS term_scaled
       |  FROM qtf q JOIN df d USING (word) JOIN dl l USING (doc_id) CROSS JOIN corpus c),
       |g AS (SELECT doc_id, count(*) AS n_hits, sum(term_scaled)::BIGINT AS score_scaled
       |      FROM s GROUP BY 1)""".stripMargin
  }

  /** Feature hashing (mirror of TextStats.hashingTf): the same Horner
    * fold `(a·31 + code) mod prime` per token — DuckDB `unicode` equals
    * Spark `ascii` on the tokenizer's output — then bucket by mod and
    * sign by the next hash bit, so every bucket assignment and every
    * sign is under grade. */
  def hashingTf(nBuckets: Int, prime: Long): String =
    s"""WITH $toksCte,
       |tok AS (SELECT doc_id, w AS word FROM toks, unnest(toks) AS u(w) WHERE w <> ''),
       |h AS (
       |  SELECT doc_id,
       |    list_reduce(
       |      list_prepend(0::BIGINT,
       |        list_transform(range(1, len(word) + 1),
       |          i -> unicode(substr(word, i::INT, 1))::BIGINT)),
       |      (a, c) -> (a * 31 + c) % $prime) AS hv
       |  FROM tok)
       |SELECT doc_id, hv % $nBuckets AS bucket,
       |  count(*)::BIGINT AS n_tokens,
       |  sum(CASE WHEN (hv // $nBuckets) % 2 = 0 THEN 1 ELSE -1 END)::BIGINT AS signed_sum
       |FROM h GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin

  def bm25(terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): String =
    s"""WITH ${bm25Chain(terms, k1, b)}
       |SELECT doc_id, n_hits, score_scaled FROM g
       |ORDER BY score_scaled DESC, doc_id LIMIT $k""".stripMargin

  /** Hybrid retrieval by reciprocal-rank fusion (mirror of
    * Retrieval.hybridTopK): the BM25 chain ranks the lexical list, the
    * strict-fold cosine ranks the semantic list (query row excluded),
    * and each list contributes floor(1e12 / (rrfK + rank)) — exact
    * integer arithmetic, so fusion scores and ordering are
    * engine-portable (no half-cases exist for 1e12 over this rank
    * range, and floor has none anyway). */
  def hybridRrf(terms: Seq[String], queryVecId: Long, k: Int, kEach: Int,
                rrfK: Int = 60, k1: Double = 1.2, b: Double = 0.75): String =
    s"""WITH ${bm25Chain(terms, k1, b)},
       |lex AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score_scaled DESC, doc_id)
       |                      AS BIGINT) AS lex_rank
       |  FROM (SELECT * FROM g ORDER BY score_scaled DESC, doc_id LIMIT $kEach)),
       |q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = $queryVecId),
       |semscored AS (
       |  SELECT e.vec_id AS doc_id, ${cosineExpr("q.qvec", "e.embedding")} AS score
       |  FROM embeddings e, q WHERE e.vec_id <> $queryVecId),
       |sem AS (
       |  SELECT doc_id, sem_rank FROM (
       |    SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
       |                        AS BIGINT) AS sem_rank
       |    FROM semscored)
       |  WHERE sem_rank <= $kEach),
       |f AS (
       |  SELECT coalesce(l.doc_id, s.doc_id) AS doc_id, l.lex_rank, s.sem_rank,
       |    coalesce(CAST(floor(1e12 / ($rrfK + l.lex_rank)) AS BIGINT), 0)
       |      + coalesce(CAST(floor(1e12 / ($rrfK + s.sem_rank)) AS BIGINT), 0)
       |      AS rrf_scaled
       |  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id)
       |SELECT doc_id, lex_rank, sem_rank, rrf_scaled FROM f
       |ORDER BY rrf_scaled DESC, doc_id LIMIT $k""".stripMargin

  /** Deterministic negative sampling (mirror of
    * TrainingPipeline.negativeSamples): same seeded hash, same dense-id
    * `r + (r >= id)` self-exclusion. */
  def negativeSamples(k: Int, seed: String): String =
    s"""WITH p AS (SELECT count(*)::BIGINT AS n FROM documents),
       |s AS (SELECT doc_id, j AS slot
       |      FROM documents, unnest(range(0, $k)) AS u(j)),
       |h AS (
       |  SELECT doc_id, slot,
       |    ${poly(s"'${sqlStr(seed)}:neg:' || doc_id || ':' || slot")}
       |      % ((SELECT n FROM p) - 1) AS r
       |  FROM s)
       |SELECT doc_id, slot,
       |  CASE WHEN r >= doc_id THEN r + 1 ELSE r END AS neg_id
       |FROM h ORDER BY doc_id, slot""".stripMargin

  /** Next-event training examples (mirror of
    * TrainingPipeline.nextEventExamples): same user-partitioned lag
    * window, same (ts, event_id) total order, same NULL-type drop and
    * full-context gate. */
  def nextEventExamples(k: Int): String = {
    val parts = (k to 1 by -1)
      .map(j => s"lag(event_type, $j) OVER w").mkString(" || ',' || ")
    s"""SELECT user_id, event_id AS example_id,
       |  $parts AS context,
       |  event_type AS label
       |FROM events
       |WHERE event_type IS NOT NULL
       |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |QUALIFY lag(event_type, $k) OVER w IS NOT NULL
       |ORDER BY example_id""".stripMargin
  }

  /** Corpus data card (mirror of TrainingPipeline.dataCard): one ROLLUP
    * aggregation over (lang), GROUPING() as the total-row flag, sha256
    * digests for the exact-dup signal. */
  val dataCard: String =
    s"""WITH $toksCte,
       |b AS (
       |  SELECT d.lang, len(t.toks)::BIGINT AS nt, d.n_chars, sha256(d.text) AS h
       |  FROM documents d JOIN toks t USING (doc_id))
       |SELECT lang, GROUPING(lang) = 1 AS is_total, count(*) AS n_docs,
       |  sum(nt)::BIGINT AS n_tokens, sum(n_chars)::BIGINT AS n_chars,
       |  count(DISTINCT h) AS n_distinct_texts
       |FROM b GROUP BY ROLLUP (lang)
       |ORDER BY is_total, lang NULLS FIRST""".stripMargin

  /** Token-budget selection (mirror of TrainingPipeline.tokenBudget):
    * same BIGINT permille quality key, same (q desc, id) rank order, same
    * prefix-sum cut — the window cumsum here equals the engine's two-phase
    * distributed form exactly. */
  def tokenBudget(budgetTokens: Long): String =
    s"""WITH $toksCte,
       |b AS (
       |  SELECT doc_id, len(toks)::BIGINT AS n_tokens,
       |    (len(list_filter(toks, t -> t IN ($stopwordList)))::BIGINT * 1000)
       |      // len(toks)::BIGINT AS q_permille
       |  FROM toks WHERE len(toks) > 0),
       |c AS (
       |  SELECT doc_id, n_tokens, q_permille,
       |    sum(n_tokens) OVER (ORDER BY q_permille DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_tokens
       |  FROM b)
       |SELECT doc_id, n_tokens, q_permille, cum_tokens FROM c
       |WHERE cum_tokens <= $budgetTokens ORDER BY doc_id""".stripMargin

  /** Bigram-graph degree profile (mirror of Graph.wordDegreeStats). */
  val degreeStats: String =
    s"""WITH $toksCte,
       |pr AS (
       |  SELECT toks[i] AS src, toks[i+1] AS dst
       |  FROM toks, unnest(range(1, len(toks))) AS u(i)),
       |e AS (SELECT src, dst, count(*) AS w FROM pr GROUP BY 1, 2),
       |o AS (SELECT src AS node, count(DISTINCT dst) AS out_degree,
       |        sum(w)::BIGINT AS out_strength FROM e GROUP BY 1),
       |i AS (SELECT dst AS node, count(DISTINCT src) AS in_degree,
       |        sum(w)::BIGINT AS in_strength FROM e GROUP BY 1)
       |SELECT node,
       |  coalesce(out_degree, 0) AS out_degree,
       |  coalesce(out_strength, 0) AS out_strength,
       |  coalesce(in_degree, 0) AS in_degree,
       |  coalesce(in_strength, 0) AS in_strength
       |FROM o FULL OUTER JOIN i USING (node) ORDER BY node""".stripMargin

  /** HLL merge grade (mirror of Sketches.hllMerged): the oracle derives
    * the whole-table single-pass sketch ONLY and emits it as both the
    * merged and the direct columns — so the engine's register-wise-max
    * merge of per-group states must be lossless to hash-match. */
  def hllMerged(table: String, groupCol: String, keyCol: String): String = {
    val alphaLit = String.format(java.util.Locale.ROOT, "%.17E",
      Double.box(ext.Sketches.HllAlpha * ext.Sketches.HllM * ext.Sketches.HllM *
        (1L << 26).toDouble))
    val rankCases = (0 until 25)
      .map(r => s"WHEN (w & -w) = ${1L << r} THEN ${r + 1}")
      .mkString("\n         ")
    s"""WITH h0 AS (
       |  SELECT ($keyCol * 2654435761) % 2147483648 AS v FROM $table),
       |h1 AS (SELECT xor(v, v // 65536) AS v FROM h0),
       |h2 AS (SELECT (v * 2246822519) % 2147483648 AS v FROM h1),
       |h AS (SELECT xor(v, v // 8192) AS h FROM h2),
       |r AS (SELECT h % 64 AS register, h // 64 AS w FROM h),
       |rk AS (
       |  SELECT register,
       |    CASE WHEN w = 0 THEN 26
       |         $rankCases
       |    END AS rank
       |  FROM r),
       |mx AS (SELECT register, max(rank) AS max_rank FROM rk GROUP BY 1),
       |grid AS (SELECT unnest(range(0, 64)) AS register),
       |f AS (
       |  SELECT grid.register, coalesce(mx.max_rank, 0) AS r
       |  FROM grid LEFT JOIN mx USING (register)),
       |agg AS (
       |  SELECT array_to_string(list(r ORDER BY register), ',') AS registers_csv,
       |    sum((1::BIGINT << (26 - r)::INT))::BIGINT AS pow_sum
       |  FROM f),
       |st AS (
       |  SELECT count(DISTINCT $groupCol)::BIGINT AS n_groups,
       |    count(DISTINCT $keyCol)::BIGINT AS n_distinct_exact
       |  FROM $table)
       |SELECT registers_csv, pow_sum,
       |  CAST(round($alphaLit / pow_sum::DOUBLE * 100.0) AS BIGINT) AS est_scaled,
       |  CAST(round($alphaLit / pow_sum::DOUBLE * 100.0) AS BIGINT) AS est_direct_scaled,
       |  n_groups, n_distinct_exact
       |FROM agg CROSS JOIN st""".stripMargin
  }

  /** Jaccard node similarity on the hub-pruned co-occurrence graph
    * (mirror of Graph.wordJaccard): same undirected collapse, same
    * degree prune BEFORE pair generation, same wedge pair counting,
    * same one-division Jaccard and (jaccard desc, a, b) top-k. */
  def wordJaccard(maxDeg: Long, minCommon: Long, k: Int): String =
    s"""WITH $toksCte,
       |pr AS (
       |  SELECT toks[i] AS src, toks[i+1] AS dst
       |  FROM toks, unnest(range(1, len(toks))) AS u(i)),
       |e AS (SELECT src, dst FROM pr GROUP BY 1, 2),
       |und AS (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM e WHERE src <> dst),
       |adj AS (
       |  SELECT a AS node, b AS nbr FROM und
       |  UNION ALL SELECT b AS node, a AS nbr FROM und),
       |keepn AS (SELECT node FROM adj GROUP BY node HAVING count(*) <= $maxDeg),
       |adjk AS (
       |  SELECT adj.node, adj.nbr FROM adj
       |  JOIN keepn kn ON kn.node = adj.node
       |  JOIN keepn kb ON kb.node = adj.nbr),
       |degk AS (SELECT node, count(*)::BIGINT AS degk FROM adjk GROUP BY node),
       |pairs AS (
       |  SELECT l.nbr AS a, r.nbr AS b, count(*)::BIGINT AS n_common
       |  FROM adjk l JOIN adjk r ON l.node = r.node AND l.nbr < r.nbr
       |  GROUP BY 1, 2 HAVING count(*) >= $minCommon)
       |SELECT p.a, p.b, p.n_common, da.degk AS deg_a, db.degk AS deg_b,
       |  p.n_common::DOUBLE / (da.degk + db.degk - p.n_common)::DOUBLE AS jaccard
       |FROM pairs p JOIN degk da ON da.node = p.a JOIN degk db ON db.node = p.b
       |ORDER BY jaccard DESC, p.a, p.b LIMIT $k""".stripMargin

  /** Deterministic weighted sample (mirror of
    * TrainingPipeline.weightedSample): same seeded rolling hash → uniform,
    * same integer-scaled ln, same single double division, same top-k. */
  def weightedSample(k: Int, seed: String): String =
    s"""WITH h AS (
       |  SELECT doc_id, n_chars::BIGINT AS weight,
       |    ${poly(s"'${sqlStr(seed)}:' || doc_id")} AS h
       |  FROM documents WHERE n_chars > 0),
       |kk AS (
       |  SELECT doc_id, weight,
       |    CAST(round(ln((h + 1)::DOUBLE / ${Dedup.P + 1}::DOUBLE) * 1000000.0)
       |         AS BIGINT) AS lnu
       |  FROM h),
       |s AS (
       |  SELECT doc_id, weight, lnu::DOUBLE / weight::DOUBLE AS key
       |  FROM kk ORDER BY key DESC, doc_id LIMIT $k)
       |SELECT doc_id, weight, key FROM s ORDER BY doc_id""".stripMargin

  /** Per-stratum A-ES sampling (mirror of
    * TrainingPipeline.weightedSamplePerGroup): the weightedSample key
    * chain, top-k within each source via a per-group window (the oracle
    * can afford it; the engine uses the bounded aggregator). */
  def weightedSamplePerGroup(k: Int, seed: String): String =
    s"""WITH h AS (
       |  SELECT source, doc_id, n_chars::BIGINT AS weight,
       |    ${poly(s"'${sqlStr(seed)}:' || doc_id")} AS h
       |  FROM documents WHERE n_chars > 0),
       |kk AS (
       |  SELECT source, doc_id, weight,
       |    CAST(round(ln((h + 1)::DOUBLE / ${Dedup.P + 1}::DOUBLE) * 1000000.0)
       |         AS BIGINT) AS lnu
       |  FROM h),
       |s AS (
       |  SELECT source, doc_id, weight, lnu::DOUBLE / weight::DOUBLE AS key,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY lnu::DOUBLE / weight::DOUBLE DESC, doc_id) AS rn
       |  FROM kk)
       |SELECT source, doc_id, weight, key FROM s WHERE rn <= $k
       |ORDER BY source, doc_id""".stripMargin

  /** HLL inclusion–exclusion intersection (mirror of
    * Sketches.hllIntersect): the same contract-hash sketch per predicate
    * slice, union by register-wise max, estimates rounded BEFORE the
    * subtraction like the engine. */
  def hllIntersect(table: String, keyCol: String,
                   predA: String, predB: String): String = {
    val alphaLit = String.format(java.util.Locale.ROOT, "%.17E",
      Double.box(ext.Sketches.HllAlpha * ext.Sketches.HllM * ext.Sketches.HllM *
        (1L << 26).toDouble))
    val rankCases = (0 until 25)
      .map(r => s"WHEN (w & -w) = ${1L << r} THEN ${r + 1}")
      .mkString("\n         ")
    def estOf(p: String) = s"CAST(round($alphaLit / $p::DOUBLE * 100.0) AS BIGINT)"
    s"""WITH h0 AS (
       |  SELECT 'a' AS s, ($keyCol * 2654435761) % 2147483648 AS v
       |  FROM $table WHERE $predA
       |  UNION ALL
       |  SELECT 'b', ($keyCol * 2654435761) % 2147483648 FROM $table WHERE $predB),
       |h1 AS (SELECT s, xor(v, v // 65536) AS v FROM h0),
       |h2 AS (SELECT s, (v * 2246822519) % 2147483648 AS v FROM h1),
       |h AS (SELECT s, xor(v, v // 8192) AS h FROM h2),
       |r AS (SELECT s, h % 64 AS register, h // 64 AS w FROM h),
       |rk AS (
       |  SELECT s, register,
       |    CASE WHEN w = 0 THEN 26
       |         $rankCases
       |    END AS rank
       |  FROM r),
       |mx AS (SELECT s, register, max(rank) AS max_rank FROM rk GROUP BY 1, 2),
       |grid AS (SELECT unnest(range(0, 64)) AS register),
       |fa AS (SELECT g.register, coalesce(m.max_rank, 0) AS r FROM grid g
       |       LEFT JOIN (SELECT register, max_rank FROM mx WHERE s = 'a') m
       |       USING (register)),
       |fb AS (SELECT g.register, coalesce(m.max_rank, 0) AS r FROM grid g
       |       LEFT JOIN (SELECT register, max_rank FROM mx WHERE s = 'b') m
       |       USING (register)),
       |fu AS (SELECT g.register, coalesce(m.max_rank, 0) AS r FROM grid g
       |       LEFT JOIN (SELECT register, max(max_rank) AS max_rank FROM mx
       |                  GROUP BY register) m USING (register)),
       |pa AS (SELECT sum((1::BIGINT << (26 - r)::INT))::BIGINT AS pow_sum_a FROM fa),
       |pb AS (SELECT sum((1::BIGINT << (26 - r)::INT))::BIGINT AS pow_sum_b FROM fb),
       |pu AS (SELECT sum((1::BIGINT << (26 - r)::INT))::BIGINT AS pow_sum_u FROM fu),
       |ex AS (SELECT count(*)::BIGINT AS n_intersect_exact FROM (
       |  SELECT DISTINCT $keyCol FROM $table WHERE $predA
       |  INTERSECT
       |  SELECT DISTINCT $keyCol FROM $table WHERE $predB))
       |SELECT pow_sum_a, pow_sum_b, pow_sum_u,
       |  ${estOf("pow_sum_a")} AS est_a_scaled,
       |  ${estOf("pow_sum_b")} AS est_b_scaled,
       |  ${estOf("pow_sum_u")} AS est_union_scaled,
       |  ${estOf("pow_sum_a")} + ${estOf("pow_sum_b")} - ${estOf("pow_sum_u")}
       |    AS est_intersect_scaled,
       |  n_intersect_exact
       |FROM pa, pb, pu, ex""".stripMargin
  }

  /** Contract-hash HyperLogLog (mirror of Sketches.hllDistinct): same
    * 31-bit multiplicative hash, same integer lowest-set-bit rank (no
    * log2 — float rounding at power-of-two edges differs across
    * engines), same grid of empty registers, same one-double estimate
    * over the exact integer power sum. */
  def hllDistinct(table: String, groupCol: String, keyCol: String): String = {
    val alphaLit = String.format(java.util.Locale.ROOT, "%.17E",
      Double.box(ext.Sketches.HllAlpha * ext.Sketches.HllM * ext.Sketches.HllM *
        (1L << 26).toDouble))
    val rankCases = (0 until 25)
      .map(r => s"WHEN (w & -w) = ${1L << r} THEN ${r + 1}")
      .mkString("\n         ")
    s"""WITH h0 AS (
       |  SELECT $groupCol AS grp, ($keyCol * 2654435761) % 2147483648 AS v
       |  FROM $table),
       |h1 AS (SELECT grp, xor(v, v // 65536) AS v FROM h0),
       |h2 AS (SELECT grp, (v * 2246822519) % 2147483648 AS v FROM h1),
       |h AS (SELECT grp, xor(v, v // 8192) AS h FROM h2),
       |r AS (SELECT grp, h % 64 AS register, h // 64 AS w FROM h),
       |rk AS (
       |  SELECT grp, register,
       |    CASE WHEN w = 0 THEN 26
       |         $rankCases
       |    END AS rank
       |  FROM r),
       |mx AS (SELECT grp, register, max(rank) AS max_rank FROM rk GROUP BY 1, 2),
       |grid AS (
       |  SELECT DISTINCT grp, g.register
       |  FROM h, (SELECT unnest(range(0, 64)) AS register) g),
       |f AS (
       |  SELECT grid.grp, grid.register, coalesce(mx.max_rank, 0) AS r
       |  FROM grid LEFT JOIN mx USING (grp, register)),
       |agg AS (
       |  SELECT grp,
       |    array_to_string(list(r ORDER BY register), ',') AS registers_csv,
       |    sum((1::BIGINT << (26 - r)::INT))::BIGINT AS pow_sum
       |  FROM f GROUP BY grp),
       |ex AS (
       |  SELECT $groupCol AS grp, count(DISTINCT $keyCol)::BIGINT AS n_distinct_exact
       |  FROM $table GROUP BY 1)
       |SELECT agg.grp AS $groupCol, registers_csv, pow_sum,
       |  CAST(round($alphaLit / pow_sum::DOUBLE * 100.0) AS BIGINT) AS est_scaled,
       |  n_distinct_exact
       |FROM agg JOIN ex USING (grp) ORDER BY $groupCol""".stripMargin
  }

  /** The shared 31-bit hash chain of the contract sketches, as DuckDB
    * CTE stages ending in column `h` (mirror of Sketches.withHash31). */
  private def hash31Ctes(src: String, keyed: String): String =
    s"""h0 AS (SELECT $keyed FROM $src),
       |h1 AS (SELECT * REPLACE (xor(v, v // 65536) AS v) FROM h0),
       |h2 AS (SELECT * REPLACE ((v * 2246822519) % 2147483648 AS v) FROM h1),
       |h AS (SELECT * REPLACE (xor(v, v // 8192) AS v) FROM h2)""".stripMargin

  /** Contract-hash KMV/theta sketch (mirror of Sketches.thetaSketch):
    * same 31-bit hash chain, k smallest DISTINCT hashes per group kept
    * ascending, θ = kth minimum (M while undersized), same one-double
    * estimate arithmetic. */
  /** The direct per-group KMV CTE chain shared by [[thetaDistinct]] and
    * [[thetaMerged]] (whose graded claim is merged == direct). Ends in
    * `sk(grp, n_kept, state_csv, kth)` and `ex(grp, n_distinct_exact)`. */
  private def thetaCtes(table: String, groupCol: String, keyCol: String,
                        k: Int): String =
    s"""${hash31Ctes(table,
        s"$groupCol AS grp, ($keyCol * 2654435761) % 2147483648 AS v")},
       |d AS (SELECT DISTINCT grp, v AS h FROM h),
       |r AS (SELECT grp, h,
       |        row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM d),
       |sk AS (
       |  SELECT grp, count(*)::BIGINT AS n_kept,
       |    array_to_string(list(h ORDER BY h), ',') AS state_csv,
       |    max(h)::BIGINT AS kth
       |  FROM r WHERE rn <= $k GROUP BY grp),
       |ex AS (SELECT $groupCol AS grp,
       |         count(DISTINCT $keyCol)::BIGINT AS n_distinct_exact
       |       FROM $table GROUP BY 1)""".stripMargin

  private def thetaSelect(k: Int): String = {
    val m = ext.Sketches.ThetaM
    val numLit = String.format(java.util.Locale.ROOT, "%.1f",
      Double.box((k - 1).toDouble * m.toDouble * 100.0))
    s"""n_kept,
       |  (CASE WHEN n_kept < $k THEN $m ELSE kth END)::BIGINT AS theta,
       |  state_csv,
       |  (CASE WHEN n_kept < $k THEN n_kept * 100
       |        ELSE CAST(round($numLit / kth::DOUBLE) AS BIGINT)
       |   END)::BIGINT AS est_scaled,
       |  n_distinct_exact""".stripMargin
  }

  def thetaDistinct(table: String, groupCol: String, keyCol: String,
                    k: Int = ext.Sketches.ThetaK): String =
    s"""WITH ${thetaCtes(table, groupCol, keyCol, k)}
       |SELECT sk.grp AS $groupCol, ${thetaSelect(k)}
       |FROM sk JOIN ex USING (grp)
       |ORDER BY $groupCol""".stripMargin

  /** Mirror of Sketches.thetaMerged: the oracle computes the DIRECT
    * single-pass per-group sketch (plus the subgroup count) — a lossy
    * engine-side merge hash-mismatches against it. */
  def thetaMerged(table: String, groupCol: String, subCol: String,
                  keyCol: String, k: Int = ext.Sketches.ThetaK): String =
    s"""WITH ${thetaCtes(table, groupCol, keyCol, k)},
       |sub AS (SELECT $groupCol AS grp,
       |          count(DISTINCT $subCol)::BIGINT AS n_subgroups
       |        FROM $table GROUP BY 1)
       |SELECT sk.grp AS $groupCol, n_subgroups, ${thetaSelect(k)}
       |FROM sk JOIN ex USING (grp) JOIN sub USING (grp)
       |ORDER BY $groupCol""".stripMargin

  /** Mirror of Sketches.thetaOps: both slices sketched under the shared
    * hash, re-truncated to the common θ = min(θ_A, θ_B), set algebra on
    * the below-θ hash sets, estimates = count·M/θ, exact
    * intersection/difference beside them. */
  def thetaOps(table: String, keyCol: String, predA: String, predB: String,
               k: Int = ext.Sketches.ThetaK): String = {
    val m = ext.Sketches.ThetaM
    val mLit = String.format(java.util.Locale.ROOT, "%.1f",
      Double.box(m.toDouble * 100.0))
    def est(n: String) =
      s"CAST(round(($n)::DOUBLE * $mLit / theta::DOUBLE) AS BIGINT)"
    s"""WITH base AS (
       |  SELECT 'a' AS s, $keyCol AS key FROM $table WHERE $predA
       |  UNION ALL
       |  SELECT 'b', $keyCol FROM $table WHERE $predB),
       |${hash31Ctes("base", "s, (key * 2654435761) % 2147483648 AS v")},
       |d AS (SELECT DISTINCT s, v AS h FROM h),
       |r AS (SELECT s, h,
       |        row_number() OVER (PARTITION BY s ORDER BY h) AS rn FROM d),
       |kk AS (SELECT s, h FROM r WHERE rn <= $k),
       |th AS (SELECT s, (CASE WHEN count(*) < $k THEN $m ELSE max(h) END)::BIGINT
       |         AS theta FROM kk GROUP BY s),
       |t AS (SELECT min(theta)::BIGINT AS theta FROM th),
       |ba AS (SELECT h FROM kk, t WHERE s = 'a' AND h < theta),
       |bb AS (SELECT h FROM kk, t WHERE s = 'b' AND h < theta),
       |na AS (SELECT count(*)::BIGINT AS n_a_below FROM ba),
       |nb AS (SELECT count(*)::BIGINT AS n_b_below FROM bb),
       |ni AS (SELECT count(*)::BIGINT AS n_inter FROM ba JOIN bb USING (h)),
       |ex AS (SELECT
       |    count(DISTINCT CASE WHEN ($predA) AND ($predB) THEN $keyCol END
       |      )::BIGINT AS n_inter_exact,
       |    count(DISTINCT CASE WHEN ($predA) AND NOT ($predB) THEN $keyCol END
       |      )::BIGINT AS n_diff_exact
       |  FROM $table)
       |SELECT theta, n_a_below, n_b_below, n_inter,
       |  (n_a_below + n_b_below - n_inter)::BIGINT AS n_union,
       |  (n_a_below - n_inter)::BIGINT AS n_diff,
       |  ${est("n_a_below + n_b_below - n_inter")} AS est_union_scaled,
       |  ${est("n_inter")} AS est_inter_scaled,
       |  ${est("n_a_below - n_inter")} AS est_diff_scaled,
       |  n_inter_exact, n_diff_exact
       |FROM t, na, nb, ni, ex""".stripMargin
  }

  /** Contract-hash Bloom screen (mirror of Sketches.bloomScreen): same
    * staged 31-bit hash, same per-hash multipliers + xorshift finalizer
    * into m bits, same DISTINCT-bit filter state, row-wise 3-hit probe
    * verdicts with exact membership beside them. */
  def bloomScreen(table: String, keyCol: String, predA: String, predB: String,
                  probes: Int = 50): String = {
    val m = ext.Sketches.BloomM
    val d = ext.Sketches.BloomD
    def fin(v: String): String = {
      val a = s"xor(($v), ($v) // 65536)"
      val b = s"((($a) * 2246822519) % 2147483648)"
      s"xor(($b), ($b) // 8192)"
    }
    val mults = ext.Sketches.BloomMults.zipWithIndex
      .map { case (mu, i) => s"($i, ${mu}::BIGINT)" }.mkString(", ")
    def hashChain(src: String, keyExpr: String, cols: String): String =
      s"""SELECT $cols xor(h2v, h2v // 8192) AS hv FROM (
         |    SELECT $cols (h1v * 2246822519) % 2147483648 AS h2v FROM (
         |      SELECT $cols xor(h0v, h0v // 65536) AS h1v FROM (
         |        SELECT $cols ($keyExpr * 2654435761) % 2147483648 AS h0v
         |        FROM $src) t0) t1
         |    ) t2""".stripMargin
    s"""WITH ha AS (
       |  ${hashChain(s"(SELECT $keyCol FROM $table WHERE $predA) sa", keyCol, "")}),
       |bits AS (
       |  SELECT DISTINCT ${fin(s"(hv * mult) % 2147483648")} % $m AS bit
       |  FROM ha, (VALUES $mults) AS mlt(di, mult)),
       |nb AS (SELECT count(*)::BIGINT AS n_bits_set FROM bits),
       |ak AS (SELECT DISTINCT $keyCol AS key FROM $table WHERE $predA),
       |na AS (SELECT count(*)::BIGINT AS n_a_distinct FROM ak),
       |pk AS (SELECT DISTINCT $keyCol AS key FROM $table WHERE $predB
       |       ORDER BY key LIMIT $probes),
       |ph AS (
       |  ${hashChain("pk", "key", "key,")}),
       |ppos AS (
       |  SELECT key, ${fin(s"(hv * mult) % 2147483648")} % $m AS bit
       |  FROM ph, (VALUES $mults) AS mlt(di, mult)),
       |phits AS (
       |  SELECT p.key, count(*)::BIGINT AS hits
       |  FROM ppos p JOIN bits USING (bit) GROUP BY 1)
       |SELECT p.key,
       |  coalesce(h.hits, 0) = $d AS might_contain,
       |  (a.key IS NOT NULL) AS in_a,
       |  (coalesce(h.hits, 0) = $d AND a.key IS NULL) AS is_fp,
       |  nb.n_bits_set, na.n_a_distinct
       |FROM pk p
       |LEFT JOIN phits h ON h.key = p.key
       |LEFT JOIN ak a ON a.key = p.key, nb, na
       |ORDER BY p.key""".stripMargin
  }

  /** Numeric-key CMS probe report (mirror of Sketches.cmsState +
    * cmsReportFromState, single-pass): counter table over key
    * OCCURRENCES under the contract hash, top-K hottest keys probed.
    * Used as the stream_cms oracle — the maintained drain's summed
    * counter state must equal this single-pass table exactly. */
  def cmsKeyCounts(table: String, keyCol: String, topK: Int = 20): String = {
    val d = ext.Sketches.CmsD
    val w = ext.Sketches.CmsW
    def fin(v: String): String = {
      val a = s"xor(($v), ($v) // 65536)"
      val b = s"((($a) * 2246822519) % 2147483648)"
      s"xor(($b), ($b) // 8192)"
    }
    val mults = ext.Sketches.CmsRowMults.zipWithIndex
      .map { case (mu, i) => s"($i, ${mu}::BIGINT)" }.mkString(", ")
    def hashChain(src: String, keyExpr: String, cols: String): String =
      s"""SELECT $cols xor(h2v, h2v // 8192) AS hv FROM (
         |    SELECT $cols (h1v * 2246822519) % 2147483648 AS h2v FROM (
         |      SELECT $cols xor(h0v, h0v // 65536) AS h1v FROM (
         |        SELECT $cols ($keyExpr * 2654435761) % 2147483648 AS h0v
         |        FROM $src) t0) t1) t2""".stripMargin
    s"""WITH h AS (
       |  ${hashChain(table, keyCol, "")}),
       |counters AS (
       |  SELECT di AS row, ${fin("(hv * mult) % 2147483648")} % $w AS cell,
       |    count(*)::BIGINT AS n
       |  FROM h, (VALUES $mults) AS mlt(di, mult) GROUP BY 1, 2),
       |exact AS (
       |  SELECT $keyCol AS key, count(*)::BIGINT AS true_count
       |  FROM $table GROUP BY 1),
       |probes AS (
       |  SELECT key, true_count FROM exact
       |  ORDER BY true_count DESC, key LIMIT $topK),
       |ph AS (
       |  ${hashChain("probes", "key", "key, true_count,")}),
       |pcells AS (
       |  SELECT key, true_count, di AS row,
       |    ${fin("(hv * mult) % 2147483648")} % $w AS cell
       |  FROM ph, (VALUES $mults) AS mlt(di, mult))
       |SELECT p.key, min(c.n) AS cms_count, p.true_count,
       |  min(c.n) - p.true_count AS over_count
       |FROM pcells p JOIN counters c USING (row, cell)
       |GROUP BY p.key, p.true_count
       |ORDER BY p.true_count DESC, p.key""".stripMargin
  }

  /** Per-group Bloom state report (mirror of Sketches.bloomBitsState +
    * bloomReportFromState): the DIRECT single-pass distinct-bit set per
    * group — population + Σ bit² checksum + exact distinct counts. Used
    * as the stream_bloom oracle: the maintained drain's OR-merged state
    * must equal this single-pass filter exactly. */
  def bloomGroupedState(table: String, groupCol: String, keyCol: String): String = {
    val m = ext.Sketches.BloomM
    def fin(v: String): String = {
      val a = s"xor(($v), ($v) // 65536)"
      val b = s"((($a) * 2246822519) % 2147483648)"
      s"xor(($b), ($b) // 8192)"
    }
    val mults = ext.Sketches.BloomMults.zipWithIndex
      .map { case (mu, i) => s"($i, ${mu}::BIGINT)" }.mkString(", ")
    s"""WITH dk AS (SELECT DISTINCT $groupCol AS g, $keyCol AS k FROM $table),
       |h AS (
       |  SELECT g, xor(h2v, h2v // 8192) AS hv FROM (
       |    SELECT g, (h1v * 2246822519) % 2147483648 AS h2v FROM (
       |      SELECT g, xor(h0v, h0v // 65536) AS h1v FROM (
       |        SELECT g, (k * 2654435761) % 2147483648 AS h0v FROM dk) t0) t1) t2),
       |bits AS (
       |  SELECT DISTINCT g, ${fin("(hv * mult) % 2147483648")} % $m AS bit
       |  FROM h, (VALUES $mults) AS mlt(di, mult)),
       |st AS (
       |  SELECT g, count(*)::BIGINT AS n_bits_set,
       |    sum(bit * bit)::BIGINT AS bits_checksum
       |  FROM bits GROUP BY g),
       |ex AS (
       |  SELECT $groupCol AS g, count(DISTINCT $keyCol)::BIGINT AS n_distinct_exact
       |  FROM $table GROUP BY 1)
       |SELECT st.g AS $groupCol, n_bits_set, bits_checksum, n_distinct_exact
       |FROM st JOIN ex USING (g) ORDER BY $groupCol""".stripMargin
  }

  /** Mirror of Sketches.bloomMerged: the oracle computes the DIRECT
    * single-pass bit set only — a lossy engine-side merge of the
    * per-slice states hash-mismatches on population or checksum. */
  def bloomMerged(table: String, keyCol: String, subCol: String,
                  predA: String): String = {
    val m = ext.Sketches.BloomM
    def fin(v: String): String = {
      val a = s"xor(($v), ($v) // 65536)"
      val b = s"((($a) * 2246822519) % 2147483648)"
      s"xor(($b), ($b) // 8192)"
    }
    val mults = ext.Sketches.BloomMults.zipWithIndex
      .map { case (mu, i) => s"($i, ${mu}::BIGINT)" }.mkString(", ")
    s"""WITH ha AS (
       |  SELECT xor(h2v, h2v // 8192) AS hv FROM (
       |    SELECT (h1v * 2246822519) % 2147483648 AS h2v FROM (
       |      SELECT xor(h0v, h0v // 65536) AS h1v FROM (
       |        SELECT ($keyCol * 2654435761) % 2147483648 AS h0v
       |        FROM $table WHERE $predA) t0) t1) t2),
       |bits AS (
       |  SELECT DISTINCT ${fin(s"(hv * mult) % 2147483648")} % $m AS bit
       |  FROM ha, (VALUES $mults) AS mlt(di, mult))
       |SELECT
       |  (SELECT count(DISTINCT $subCol) FROM $table WHERE $predA)::BIGINT
       |    AS n_subsets,
       |  count(*)::BIGINT AS n_bits_set,
       |  sum(bit * bit)::BIGINT AS bits_checksum,
       |  (SELECT count(DISTINCT $keyCol) FROM $table WHERE $predA)::BIGINT
       |    AS n_a_distinct
       |FROM bits""".stripMargin
  }

  /** Contract-hash count-min sketch (mirror of Sketches.cmsTokenCounts):
    * same Horner token hash into 31 bits, same per-row multipliers and
    * xorshift finalizer, same d×w counter build and min-probe. */
  def cmsTokenCounts(topK: Int, d: Int = ext.Sketches.CmsD,
                     w: Int = ext.Sketches.CmsW): String = {
    def fin(v: String): String = {
      val a = s"xor(($v), ($v) // 65536)"
      val b = s"((($a) * 2246822519) % 2147483648)"
      s"xor(($b), ($b) // 8192)"
    }
    val multCase = "CASE r.rw " + ext.Sketches.CmsRowMults.take(d).zipWithIndex
      .map { case (m, i) => s"WHEN $i THEN $m" }.mkString(" ") + " END"
    val horner =
      """list_reduce(list_prepend(0::BIGINT,
        |      list_transform(range(1, len(word) + 1),
        |        i -> unicode(substr(word, i::INT, 1))::BIGINT)),
        |      (a, c) -> (a * 31 + c) % 2147483648)""".stripMargin
    val cellExpr = s"${fin(s"(hb * mult) % 2147483648")} % $w"
    s"""WITH $toksCte,
       |tok AS (SELECT doc_id, t AS word FROM toks, unnest(toks) AS u(t) WHERE t <> ''),
       |hb AS (SELECT word, $horner AS hb FROM tok),
       |cells AS (
       |  SELECT hb, r.rw, $multCase AS mult
       |  FROM hb, (SELECT unnest(range(0, $d)) AS rw) r),
       |cc AS (SELECT rw, $cellExpr AS cell FROM cells),
       |counters AS (SELECT rw, cell, count(*)::BIGINT AS n FROM cc GROUP BY 1, 2),
       |exact AS (SELECT word, count(*)::BIGINT AS true_count FROM tok GROUP BY 1),
       |probes AS (SELECT word, true_count FROM exact
       |           ORDER BY true_count DESC, word LIMIT $topK),
       |ph AS (SELECT word, true_count, $horner AS hb FROM probes),
       |pc AS (
       |  SELECT word, true_count, r.rw, $multCase AS mult, hb
       |  FROM ph, (SELECT unnest(range(0, $d)) AS rw) r),
       |pcell AS (SELECT word, true_count, rw, $cellExpr AS cell FROM pc),
       |est AS (
       |  SELECT word, true_count, min(n)::BIGINT AS cms_count
       |  FROM pcell JOIN counters USING (rw, cell) GROUP BY 1, 2)
       |SELECT word, cms_count, true_count,
       |  (cms_count - true_count)::BIGINT AS over_count
       |FROM est ORDER BY true_count DESC, word""".stripMargin
  }

  /** Shared CTE chain of the level-sampling quantile sketch (mirror of
    * Sketches.quantileSketch's sampler): same pre-folded 31-bit id, same
    * xorshift-finalized contract hash, same trailing-zero level, same
    * smallest-fitting-level cut over the exact per-level histogram. */
  private def qsKeptCtes(table: String, valueCol: String, idSql: String,
                         capacity: Long): String = {
    val tzCases = (0 until 31)
      .map(r => s"WHEN (h & -h) = ${1L << r} THEN $r")
      .mkString("\n         ")
    s"""h0 AS (
       |  SELECT $valueCol AS v, ($idSql) % 2147483648 AS i FROM $table),
       |h1 AS (SELECT v, i, (i * 2654435761) % 2147483648 AS x FROM h0),
       |h2 AS (SELECT v, i, xor(x, x // 65536) AS x FROM h1),
       |h3 AS (SELECT v, i, (x * 2246822519) % 2147483648 AS x FROM h2),
       |hh AS (SELECT v, i, xor(x, x // 8192) AS h FROM h3),
       |lv AS (
       |  SELECT v, i,
       |    CASE WHEN h = 0 THEN 31
       |         $tzCases
       |    END AS lvl
       |  FROM hh),
       |cnt AS (SELECT lvl, count(*)::BIGINT AS n FROM lv GROUP BY 1),
       |cut AS (
       |  SELECT min(L)::BIGINT AS qs_level FROM (
       |    SELECT g.L, coalesce(sum(c.n), 0)::BIGINT AS cum
       |    FROM range(0, 32) g(L) LEFT JOIN cnt c ON c.lvl >= g.L
       |    GROUP BY g.L) WHERE cum <= $capacity),
       |kept AS (SELECT v, i FROM lv, cut WHERE lvl >= qs_level)""".stripMargin
  }

  /** Level-sampling quantile sketch (mirror of Sketches.quantileSketch):
    * same integer ceil-divisions for target rank and kept index, same
    * (value, hashed id) total order, same strictly-below exact-rank
    * probe of each estimate. */
  def quantileSketch(table: String, valueCol: String, idSql: String,
                     quantilesPct: Seq[Int] = Seq(25, 50, 75, 95),
                     capacity: Long = ext.Sketches.QsCapacity): String = {
    val qList = quantilesPct.mkString(", ")
    s"""WITH ${qsKeptCtes(table, valueCol, idSql, capacity)},
       |idx AS (
       |  SELECT v, row_number() OVER (ORDER BY v, i) ::BIGINT AS kidx FROM kept),
       |nk AS (SELECT count(*)::BIGINT AS n_kept FROM kept),
       |nt AS (SELECT count(*)::BIGINT AS n_total FROM $table),
       |q AS (SELECT unnest([$qList])::BIGINT AS q_pct),
       |t AS (
       |  SELECT q_pct, n_total, qs_level AS level, n_kept,
       |    (q_pct * n_total + 99) // 100 AS target_rank,
       |    least(((q_pct * n_total + 99) // 100 + (1::BIGINT << qs_level) - 1)
       |            // (1::BIGINT << qs_level),
       |          n_kept) AS est_idx
       |  FROM q, nt, cut, nk),
       |e AS (
       |  SELECT t.q_pct, t.n_total, t.level, t.n_kept, t.target_rank,
       |    t.est_idx, idx.v AS est_value
       |  FROM t JOIN idx ON t.est_idx = idx.kidx),
       |r AS (
       |  SELECT e.*,
       |    (SELECT count(*) FROM $table WHERE $valueCol < e.est_value)::BIGINT + 1
       |      AS est_rank
       |  FROM e)
       |SELECT q_pct, n_total, level, n_kept, target_rank, est_idx, est_value,
       |  est_rank, abs(est_rank - target_rank)::BIGINT AS rank_err
       |FROM r ORDER BY q_pct""".stripMargin
  }

  /** Per-group level-sampling quantile sketch (mirror of
    * Sketches.quantileSketchGrouped): identical sampler, cut chosen per
    * group over exact per-group level histograms, group-partitioned
    * row_number, per-group strictly-below exact-rank probe. */
  def quantileSketchGrouped(table: String, groupCol: String, valueCol: String,
                            idSql: String,
                            quantilesPct: Seq[Int] = Seq(25, 50, 75, 95),
                            capacity: Long = ext.Sketches.QsCapacity): String = {
    val tzCases = (0 until 31)
      .map(r => s"WHEN (h & -h) = ${1L << r} THEN $r")
      .mkString("\n         ")
    val qList = quantilesPct.mkString(", ")
    s"""WITH h0 AS (
       |  SELECT $groupCol AS grp, $valueCol AS v,
       |    ($idSql) % 2147483648 AS i FROM $table),
       |h1 AS (SELECT grp, v, i, (i * 2654435761) % 2147483648 AS x FROM h0),
       |h2 AS (SELECT grp, v, i, xor(x, x // 65536) AS x FROM h1),
       |h3 AS (SELECT grp, v, i, (x * 2246822519) % 2147483648 AS x FROM h2),
       |hh AS (SELECT grp, v, i, xor(x, x // 8192) AS h FROM h3),
       |lv AS (
       |  SELECT grp, v, i,
       |    CASE WHEN h = 0 THEN 31
       |         $tzCases
       |    END AS lvl
       |  FROM hh),
       |cnt AS (SELECT grp, lvl, count(*)::BIGINT AS n FROM lv GROUP BY 1, 2),
       |cut AS (
       |  SELECT grp, min(L)::BIGINT AS qs_level FROM (
       |    SELECT g.grp, g.L, coalesce(sum(c.n), 0)::BIGINT AS cum
       |    FROM (SELECT d.grp, t.L
       |          FROM (SELECT DISTINCT grp FROM lv) d, range(0, 32) t(L)) g
       |    LEFT JOIN cnt c ON c.grp = g.grp AND c.lvl >= g.L
       |    GROUP BY g.grp, g.L) WHERE cum <= $capacity GROUP BY grp),
       |kept AS (
       |  SELECT lv.grp, v, i, qs_level FROM lv JOIN cut ON lv.grp = cut.grp
       |  WHERE lvl >= qs_level),
       |idx AS (
       |  SELECT grp, v,
       |    row_number() OVER (PARTITION BY grp ORDER BY v, i)::BIGINT AS kidx
       |  FROM kept),
       |nk AS (SELECT grp, count(*)::BIGINT AS n_kept FROM kept GROUP BY 1),
       |nt AS (SELECT $groupCol AS grp, count(*)::BIGINT AS n_total
       |       FROM $table GROUP BY 1),
       |q AS (SELECT unnest([$qList])::BIGINT AS q_pct),
       |t AS (
       |  SELECT nt.grp, q_pct, n_total, qs_level AS level, n_kept,
       |    (q_pct * n_total + 99) // 100 AS target_rank,
       |    least(((q_pct * n_total + 99) // 100 + (1::BIGINT << qs_level) - 1)
       |            // (1::BIGINT << qs_level),
       |          n_kept) AS est_idx
       |  FROM nt JOIN nk USING (grp) JOIN cut USING (grp), q),
       |e AS (
       |  SELECT t.grp, t.q_pct, t.n_total, t.level, t.n_kept, t.target_rank,
       |    t.est_idx, idx.v AS est_value
       |  FROM t JOIN idx ON t.grp = idx.grp AND t.est_idx = idx.kidx),
       |r AS (
       |  SELECT e.*,
       |    (SELECT count(*) FROM $table x
       |     WHERE x.$groupCol = e.grp AND x.$valueCol < e.est_value)::BIGINT + 1
       |      AS est_rank
       |  FROM e)
       |SELECT grp AS $groupCol, q_pct, n_total, level, n_kept, target_rank,
       |  est_idx, est_value, est_rank,
       |  abs(est_rank - target_rank)::BIGINT AS rank_err
       |FROM r ORDER BY 1, 2""".stripMargin
  }

  /** Quantile-sketch merge grade (mirror of Sketches.quantileSketchMerged,
    * the hllMerged convention): the oracle derives the single-pass direct
    * sketch ONLY and emits its state as both the merged and the direct
    * column families — the engine's union-and-re-cut merge of the two
    * half-corpus sketches must be lossless to hash-match. */
  def quantileSketchMerged(table: String, valueCol: String, idSql: String,
                           capacity: Long = ext.Sketches.QsCapacity): String =
    s"""WITH ${qsKeptCtes(table, valueCol, idSql, capacity)},
       |s AS (
       |  SELECT count(*)::BIGINT AS n_kept, sum(v::DECIMAL(18,2)) AS sum_v,
       |    min(v) AS min_v, max(v) AS max_v FROM kept)
       |SELECT cut.qs_level AS level_merged, s.n_kept AS n_kept_merged,
       |  s.sum_v AS sum_v_merged, s.min_v AS min_v_merged,
       |  s.max_v AS max_v_merged,
       |  cut.qs_level AS level_direct, s.n_kept AS n_kept_direct,
       |  s.sum_v AS sum_v_direct, s.min_v AS min_v_direct,
       |  s.max_v AS max_v_direct
       |FROM cut, s""".stripMargin

  /** JL random projection (mirror of Similarity.randomProjection): the
    * SAME seeded ±1 sign matrix rendered as a VALUES literal (like the
    * LSH planes), same integer-domain entry, exact BIGINT sums. */
  def randomProjection(dim: Int, k: Int, seed: Long = 42L): String = {
    val signs = ext.Similarity.jlSigns(dim, k, seed)
    val values = (for (c <- 0 until k; d <- 0 until dim)
      yield s"($d, $c, ${signs(c)(d)})").mkString(", ")
    s"""WITH x AS (
       |  SELECT vec_id, i - 1 AS dim,
       |    CAST(round(embedding[i]::DOUBLE * 1000000.0) AS BIGINT) AS s
       |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS r(i)),
       |m(dim, comp, sgn) AS (VALUES $values)
       |SELECT x.vec_id, m.comp::BIGINT AS comp, sum(m.sgn * x.s)::BIGINT AS proj
       |FROM x JOIN m USING (dim)
       |GROUP BY 1, 2 ORDER BY vec_id, comp""".stripMargin
  }

  /** Int8 scalar quantization (mirror of Similarity.quantizeInt8): same
    * integer-domain entry, same exact per-dim max-|s|, same one-double
    * rounding, same dim-ordered CSV rendering. */
  val quantizeInt8: String =
    """WITH x AS (
      |  SELECT vec_id, i - 1 AS dim,
      |    CAST(round(embedding[i]::DOUBLE * 1000000.0) AS BIGINT) AS s
      |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS r(i)),
      |m AS (SELECT dim, max(abs(s))::BIGINT AS maxabs FROM x GROUP BY 1),
      |c AS (
      |  SELECT x.vec_id, x.dim,
      |    CASE WHEN m.maxabs = 0 THEN 0
      |         ELSE CAST(round(x.s::DOUBLE * 127.0 / m.maxabs::DOUBLE) AS BIGINT)
      |    END AS code
      |  FROM x JOIN m USING (dim))
      |SELECT vec_id, array_to_string(list(code ORDER BY dim), ',') AS codes_csv
      |FROM c GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** SCD2 history by FULL recompute over the three derived snapshots
    * (v1 lacks id%7, v2 edits id%5, v3 drops id%11 and edits id%3) —
    * the oracle for both pipeline_scd2 (direct derivation) and
    * pipeline_scd2_extend (incremental CDC fold), which must agree. */
  val scd2FullRecompute: String =
    """WITH v2t AS (SELECT doc_id, text,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS t2
      |  FROM documents),
      |allv AS (
      |  SELECT doc_id, text, CAST(1 AS BIGINT) AS version FROM v2t WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id, t2, 2 FROM v2t
      |  UNION ALL
      |  SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN t2 || ' v3' ELSE t2 END, 3
      |  FROM v2t WHERE doc_id % 11 <> 0),
      |gr AS (SELECT version, row_number() OVER (ORDER BY version) AS grk
      |       FROM (SELECT DISTINCT version FROM allv)),
      |av AS (SELECT a.*, gr.grk FROM allv a JOIN gr USING (version)),
      |c AS (SELECT doc_id, version,
      |    CASE WHEN lag(text) OVER (PARTITION BY doc_id ORDER BY version)
      |              IS DISTINCT FROM text
      |           OR grk - lag(grk) OVER (PARTITION BY doc_id ORDER BY version) > 1
      |         THEN 1 ELSE 0 END AS chg
      |  FROM av),
      |s AS (SELECT doc_id, version,
      |    sum(chg) OVER (PARTITION BY doc_id ORDER BY version) AS seg
      |  FROM c),
      |runs AS (SELECT doc_id, seg,
      |    min(version)::BIGINT AS valid_from, max(version)::BIGINT AS valid_to
      |  FROM s GROUP BY doc_id, seg)
      |SELECT doc_id, valid_from, valid_to,
      |  valid_to = (SELECT max(version) FROM allv) AS is_current
      |FROM runs ORDER BY doc_id, valid_from""".stripMargin

  /** IVF top-k on the snapped index (mirror of Ivf.ivfTopKSnapped): the
    * shared snapped-k-means chain trains centroids and assigns corpus
    * cells; each query ranks cells by the same exact integer distance
    * (d asc, cell asc) and probes the `nprobe` nearest; rescoring inside
    * candidates is the raw double cosine with the engine's fold order.
    * BIGINT sums land in HUGEINT here — exact, agreeing with Spark's
    * exact-double integers under the requireExactBound domain. */
  def ivfSnapped(nlist: Int, nprobe: Int, iters: Int, maxQueryId: Long, k: Int): String =
    s"""${kmeansChain(nlist, iters)},
       |Q AS (SELECT vec_id AS query_id, w FROM V WHERE vec_id < $maxQueryId),
       |P AS (
       |  SELECT query_id, cell FROM (
       |    SELECT q.query_id, c.cell,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY sum(c.c * c.c - 2 * q.w[c.pos] * c.c), c.cell) AS rn
       |    FROM Q q, C$iters c GROUP BY q.query_id, c.cell)
       |  WHERE rn <= $nprobe),
       |cand AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id
       |  FROM P p JOIN AF a USING (cell) WHERE a.vec_id <> p.query_id),
       |scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    ${cosineExpr("qe.embedding", "ne.embedding")} AS score
       |  FROM cand c
       |  JOIN embeddings qe ON qe.vec_id = c.query_id
       |  JOIN embeddings ne ON ne.vec_id = c.neighbor_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |             ORDER BY score DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, score, rank FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Snapped-PQ top-k (mirror of Pq.pqTopKSnapped): per-subspace Lloyd in
    * the same shifted BIGINT recipe (composite (s, cell) key, seeds = the
    * ksub lowest vec_ids' subvectors), final codes via the same argmin,
    * and ADC scoring in UNSHIFTED integer space — sum of per-subspace
    * table entries over each row's codes, divided by the exact integer
    * norms. `subDim` = dim / m (the testdata's 64-dim embeddings). */
  def pqSnapped(m: Int, ksub: Int, iters: Int, subDim: Int, maxQueryId: Long, k: Int): String = {
    val sh = "8000000"
    def assign(name: String, cFrom: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT vec_id, s, cell FROM (
         |    SELECT v.vec_id, v.s, c.cell,
         |      row_number() OVER (PARTITION BY v.vec_id, v.s
         |        ORDER BY sum(c.c * c.c - 2 * v.sub[c.pos] * c.c), c.cell) AS rn
         |    FROM SUBV v JOIN $cFrom c ON c.s = v.s
         |    GROUP BY v.vec_id, v.s, c.cell)
         |  WHERE rn = 1)""".stripMargin
    val rounds = (1 to iters).map { r =>
      s"""${assign(s"A$r", s"C${r - 1}")},
         |S$r AS (
         |  SELECT a.s, a.cell, t.pos, sum(v.sub[t.pos])::BIGINT AS sm, count(*)::BIGINT AS n
         |  FROM A$r a JOIN SUBV v ON v.vec_id = a.vec_id AND v.s = a.s,
         |       unnest(range(1, len(v.sub) + 1)) t(pos)
         |  GROUP BY a.s, a.cell, t.pos),
         |C$r AS MATERIALIZED (
         |  SELECT c0.s, c0.cell, c0.pos, coalesce((2 * s1.sm + s1.n) // (2 * s1.n), c0.c) AS c
         |  FROM C${r - 1} c0 LEFT JOIN S$r s1
         |    ON c0.s = s1.s AND c0.cell = s1.cell AND c0.pos = s1.pos)""".stripMargin
    }.mkString(",\n")
    s"""WITH V AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(floor(x * 1000000) AS BIGINT) + $sh) AS w
       |  FROM embeddings),
       |SUBV AS MATERIALIZED (
       |  SELECT vec_id, t.s, list_slice(w, t.s * $subDim + 1, (t.s + 1) * $subDim) AS sub
       |  FROM V, unnest(range(0, $m)) t(s)),
       |C0 AS MATERIALIZED (
       |  SELECT s, cell, t.pos, sub[t.pos] AS c
       |  FROM (SELECT sv.s, CAST(row_number() OVER (PARTITION BY sv.s ORDER BY sv.vec_id) - 1
       |                          AS INTEGER) AS cell, sv.sub
       |        FROM SUBV sv
       |        JOIN (SELECT vec_id FROM V ORDER BY vec_id LIMIT $ksub) seeds USING (vec_id)),
       |       unnest(range(1, len(sub) + 1)) t(pos)),
       |$rounds,
       |${assign("AF", s"C$iters")},
       |N2A AS (SELECT s, cell, sum(($sh - c) * ($sh - c)) AS n2 FROM C$iters GROUP BY s, cell),
       |RN2 AS (
       |  SELECT af.vec_id, sum(n.n2) AS n2a
       |  FROM AF af JOIN N2A n ON n.s = af.s AND n.cell = af.cell GROUP BY af.vec_id),
       |Q AS (SELECT vec_id AS query_id, s, sub FROM SUBV WHERE vec_id < $maxQueryId),
       |T AS MATERIALIZED (
       |  SELECT q.query_id, c.s, c.cell,
       |    sum((q.sub[c.pos] - $sh) * (c.c - $sh)) AS t
       |  FROM Q q JOIN C$iters c ON c.s = q.s GROUP BY q.query_id, c.s, c.cell),
       |N2Q AS (
       |  SELECT q.query_id,
       |    sum((q.sub[t.pos] - $sh) * (q.sub[t.pos] - $sh)) AS n2q
       |  FROM Q q, unnest(range(1, len(q.sub) + 1)) t(pos) GROUP BY q.query_id),
       |scored AS (
       |  SELECT t.query_id, af.vec_id AS neighbor_id,
       |    CAST(sum(t.t) AS DOUBLE)
       |      / (sqrt(CAST(max(nq.n2q) AS DOUBLE)) * sqrt(CAST(max(r.n2a) AS DOUBLE))) AS score
       |  FROM AF af
       |  JOIN T t ON t.s = af.s AND t.cell = af.cell
       |  JOIN RN2 r ON r.vec_id = af.vec_id
       |  JOIN N2Q nq ON nq.query_id = t.query_id
       |  WHERE af.vec_id <> t.query_id
       |  GROUP BY t.query_id, af.vec_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |             ORDER BY score DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, score, rank FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** The engine's hash-derived LSH hyperplanes, computed by the SAME
    * catalyst expression the engine evaluates (XxHash64 over (plane,
    * dim), pmod into [-1, 1]) — driver-side here, embedded as literals
    * in the oracle SQL so DuckDB needs no xxhash64 of its own. */
  private def lshPlanes(numPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    (0 until numPlanes).map { p =>
      (0 until dim).map { j =>
        val h = new XxHash64(Seq(Literal(p), Literal(j.toLong)))
          .eval(null).asInstanceOf[Long]
        val m = ((h % 2000003L) + 2000003L) % 2000003L
        m.toDouble / 1000001.5d - 1.0d
      }
    }
  }

  /** Multi-probe LSH top-k (mirror of Similarity.lshTopK): sign-pattern
    * buckets over the hash-derived hyperplanes (identical planes — see
    * [[lshPlanes]]), each query probing its own bucket plus every
    * Hamming-1 neighbor, exact double cosine inside candidates. The
    * bucket sign test runs on the same strict-fold dot product, so the
    * candidate set — not just the scores — matches the engine exactly. */
  def lshTopK(numPlanes: Int, dim: Int, maxQueryId: Long, k: Int): String = {
    val planes = lshPlanes(numPlanes, dim)
    def dotPlane(v: String, pl: Seq[Double]): String = {
      // E-notation, 17 significant digits: DuckDB parses plain decimal
      // literals through DECIMAL (lossy past ~15 digits — 0.9999999999999999
      // becomes 1.0) but exponent-form literals directly as DOUBLE, so this
      // is the only rendering that round-trips the engine's planes exactly.
      // Locale.ROOT: the f interpolator uses the JVM default locale, and a
      // comma decimal separator would render invalid SQL.
      val arr = pl.map(x => String.format(java.util.Locale.ROOT, "%.17E", Double.box(x)))
        .mkString("[", ", ", "]")
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, least(len($v), $dim)+1), " +
        s"i -> $v[i]::DOUBLE * ($arr::DOUBLE[])[i])), (acc, x) -> acc + x)"
    }
    val bucketExpr = planes.zipWithIndex.map { case (pl, p) =>
      s"(CASE WHEN ${dotPlane("embedding", pl)} > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
    val probeList = ("b.bucket" +: (0 until numPlanes).map(p =>
      s"xor(b.bucket, ${1L << p})")).mkString("[", ", ", "]")
    s"""WITH B AS MATERIALIZED (
       |  SELECT vec_id, embedding, ($bucketExpr)::BIGINT AS bucket
       |  FROM embeddings),
       |QP AS (
       |  SELECT b.vec_id AS query_id, b.embedding AS qvec, p.probe AS bucket
       |  FROM B b, unnest($probeList) p(probe)
       |  WHERE b.vec_id < $maxQueryId),
       |scored AS (
       |  SELECT qp.query_id, b.vec_id AS neighbor_id,
       |    ${cosineExpr("qp.qvec", "b.embedding")} AS score
       |  FROM B b JOIN QP qp USING (bucket)
       |  WHERE b.vec_id <> qp.query_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |             ORDER BY score DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, score, rank FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** ANN index-quality report (mirror of Similarity.recallReport): any
    * deterministic ANN top-k SQL vs any exact top-k SQL as nested CTEs,
    * hit counting by semi-join, one double division. Generic over the
    * index family — the LSH/IVF/PQ recall monitors all instantiate it. */
  def recallVsExact(annSql: String, exactSql: String): String =
    s"""WITH ann AS (
       |$annSql),
       |ex AS (
       |$exactSql),
       |hits AS (
       |  SELECT e.query_id, count(*)::BIGINT AS n
       |  FROM ex e JOIN ann a
       |    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
       |  GROUP BY e.query_id),
       |ke AS (SELECT query_id, count(*)::BIGINT AS k_exact FROM ex GROUP BY query_id)
       |SELECT ke.query_id, ke.k_exact, coalesce(h.n, 0)::BIGINT AS n_hits,
       |  coalesce(h.n, 0)::DOUBLE / ke.k_exact::DOUBLE AS recall
       |FROM ke LEFT JOIN hits h USING (query_id) ORDER BY query_id""".stripMargin

  def recallLshVsExact(numPlanes: Int, dim: Int, maxQueryId: Long, k: Int): String =
    recallVsExact(lshTopK(numPlanes, dim, maxQueryId, k), simTopK(maxQueryId, k))

  /** MRR report (mirror of Similarity.mrrReport): per-query rank of the
    * exact top-1 inside the ANN list; 0 / 0.0 on a miss. */
  def mrrVsExact(annSql: String, exactSql: String): String =
    s"""WITH ann AS (
       |$annSql),
       |ex AS (
       |$exactSql),
       |t1 AS (SELECT query_id, neighbor_id AS truth_top1 FROM ex WHERE rank = 1)
       |SELECT t1.query_id, t1.truth_top1,
       |  coalesce(a.rank, 0)::BIGINT AS hit_rank,
       |  CASE WHEN a.rank IS NULL THEN 0.0::DOUBLE
       |       ELSE 1.0::DOUBLE / a.rank::DOUBLE END AS rr
       |FROM t1 LEFT JOIN ann a
       |  ON a.query_id = t1.query_id AND a.neighbor_id = t1.truth_top1
       |ORDER BY t1.query_id""".stripMargin

  /** Shared sentence CTE over the planted-boundary corpus (mirror of
    * TextStats.sentences on the terminator-planted documents): ends
    * with `s` = (doc_id, sent_idx, sentence). */
  val sentenceCte: String =
    """sd AS (
      |  SELECT doc_id, replace(replace(text, ' a ', '! '), ' the ', '. ') AS text
      |  FROM documents),
      |sm AS (
      |  SELECT doc_id, string_split(
      |    regexp_replace(text, '([.!?]+)[ \t\n\x0B\f\r]+', '\1' || chr(31), 'g'),
      |    chr(31)) AS ss
      |  FROM sd),
      |s AS (
      |  SELECT doc_id, i AS sent_idx, ss[i] AS sentence
      |  FROM sm, unnest(range(1, len(ss) + 1)) AS r(i)
      |  WHERE ss[i] <> '')""".stripMargin

  /** Per-document language-mixing profile (mirror of
    * TextStats.languageMix over the planted-boundary corpus): marker
    * argmax per sentence, modal language per document with
    * (count desc, lang asc) ties. */
  def langMix: String = {
    val scoreCols = TextStats.LangMarkers.map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(stoks, t -> t IN ($list))) AS score_$lang"
    }.mkString(",\n    ")
    val langs = TextStats.LangMarkers.map(_._1)
    val best = s"greatest(${langs.map(l => s"score_$l").mkString(", ")})"
    val pred = langs.reverse.foldLeft("'und'") { (els, lang) =>
      s"CASE WHEN score_$lang = best AND best > 0 THEN '$lang' ELSE $els END"
    }
    s"""WITH $sentenceCte,
       |st AS (
       |  SELECT doc_id, list_transform(
       |      list_filter(regexp_split_to_array(sentence, '[ \\t\\n\\x0B\\f\\r]+'),
       |        t -> t <> ''),
       |      $normTok) AS stoks
       |  FROM s),
       |scored AS (SELECT doc_id,
       |    $scoreCols
       |  FROM st),
       |wb AS (SELECT *, $best AS best FROM scored),
       |pl AS (
       |  SELECT doc_id, $pred AS sent_lang, count(*)::BIGINT AS cnt
       |  FROM wb GROUP BY 1, 2),
       |modal AS (
       |  SELECT doc_id, sent_lang,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY cnt DESC, sent_lang) AS rn,
       |    cnt
       |  FROM pl),
       |agg AS (
       |  SELECT doc_id, sum(cnt)::BIGINT AS n_sentences,
       |    count(*)::BIGINT AS n_langs
       |  FROM pl GROUP BY 1)
       |SELECT a.doc_id, a.n_sentences, a.n_langs,
       |  m.sent_lang AS dominant_lang, m.cnt AS n_dominant,
       |  (a.n_sentences - m.cnt)::DOUBLE / a.n_sentences::DOUBLE AS mix_ratio
       |FROM agg a JOIN modal m ON m.doc_id = a.doc_id AND m.rn = 1
       |ORDER BY a.doc_id""".stripMargin
  }

  /** Cross-document boilerplate sentences (mirror of
    * TextStats.boilerplateSentences over the planted corpus). */
  def boilerplate(minDocs: Long, topK: Int): String =
    s"""WITH $sentenceCte
       |SELECT sentence, count(DISTINCT doc_id)::BIGINT AS n_docs,
       |  count(*)::BIGINT AS n_occurrences
       |FROM s GROUP BY sentence HAVING count(DISTINCT doc_id) >= $minDocs
       |ORDER BY n_docs DESC, sentence LIMIT $topK""".stripMargin

  /** Boilerplate removal (mirror of TextStats.stripBoilerplate): the
    * oracle joins on the raw sentence strings where the engine joins on
    * xxhash64 of them — agreement is the collision check. */
  def stripBoilerplate(minDocs: Long): String =
    s"""WITH $sentenceCte,
       |b AS (SELECT sentence FROM s GROUP BY sentence
       |      HAVING count(DISTINCT doc_id) >= $minDocs),
       |marked AS (
       |  SELECT s.doc_id, s.sent_idx, s.sentence,
       |    (b.sentence IS NOT NULL) AS boiler
       |  FROM s LEFT JOIN b ON b.sentence = s.sentence),
       |g AS (
       |  SELECT doc_id,
       |    coalesce(string_agg(CASE WHEN NOT boiler THEN sentence END,
       |      ' ' ORDER BY sent_idx), '') AS clean_text,
       |    sum(CASE WHEN NOT boiler THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       |    sum(CASE WHEN boiler THEN 1 ELSE 0 END)::BIGINT AS n_dropped
       |  FROM marked GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(g.clean_text, '') AS clean_text,
       |  coalesce(g.n_kept, 0)::BIGINT AS n_kept,
       |  coalesce(g.n_dropped, 0)::BIGINT AS n_dropped
       |FROM documents d LEFT JOIN g USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Shared CDC fixture + MERGE resolution (mirror of the
    * pipeline_cdc_apply change log): `final` is the post-merge table —
    * latest seq wins per id, deletes drop, fresh inserts appear. */
  val cdcFinalCte: String =
    """base AS (SELECT doc_id, text, source FROM documents),
      |c AS (
      |  SELECT doc_id, 1 AS seq, 'delete' AS op,
      |         NULL::VARCHAR AS text, NULL::VARCHAR AS source
      |  FROM base WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id, 1, 'upsert', text || ' rev1', source
      |  FROM base WHERE doc_id % 7 <> 0 AND doc_id % 5 = 0
      |  UNION ALL
      |  SELECT doc_id, 2, 'upsert', text || ' rev2', source
      |  FROM base WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id, 2, 'upsert', text || ' back', source
      |  FROM base WHERE doc_id % 10 <> 0 AND doc_id % 21 = 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, 2, 'upsert', 'fresh ' || doc_id, 'cdc'
      |  FROM base WHERE doc_id % 13 = 0),
      |w AS (
      |  SELECT doc_id, op, text, source FROM (
      |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
      |    FROM c) WHERE rn = 1),
      |final AS (
      |  SELECT coalesce(b.doc_id, w.doc_id) AS doc_id,
      |    CASE WHEN w.op IS NOT NULL THEN w.text ELSE b.text END AS text,
      |    CASE WHEN w.op IS NOT NULL THEN w.source ELSE b.source END AS source
      |  FROM base b FULL OUTER JOIN w ON b.doc_id = w.doc_id
      |  WHERE w.op IS NULL OR w.op <> 'delete')""".stripMargin

  /** MERGE INTO / CDC apply (mirror of Incremental.applyChanges on the
    * shared change log). */
  val cdcApply: String =
    s"""WITH $cdcFinalCte
       |SELECT doc_id, text, source FROM final ORDER BY doc_id""".stripMargin

  /** Incrementally-maintained per-source aggregate: the oracle is the
    * FULL RECOMPUTE over the post-merge table — the maintained view must
    * be indistinguishable from it. */
  val cdcAggMaintain: String =
    s"""WITH $cdcFinalCte
       |SELECT source, count(*)::BIGINT AS n_docs,
       |  sum(length(text))::BIGINT AS sum_chars
       |FROM final GROUP BY source ORDER BY source""".stripMargin

  /** DSIR importance selection (mirror of Dsir.importanceSelect): the
    * same unigram+bigram feature stream over the non-empty normalized
    * tokens, the same Horner hash into `nBuckets`, add-one-smoothed
    * target/raw bucket log-ratios scaled to BIGINT per (doc, bucket)
    * BEFORE the per-document sum (order-free), row_number rank by
    * (score desc, id). `ln` in both engines is the natural log of
    * integer-valued doubles — bit-identical on the same libm. */
  def dsir(nBuckets: Int, prime: Long, selectN: Int, targetLang: String): String =
    s"""WITH $toksCte,
       |t2 AS (SELECT doc_id, list_filter(toks, t -> t <> '') AS toks FROM toks),
       |feat AS (
       |  SELECT doc_id, f FROM t2, unnest(
       |    list_concat(toks,
       |      CASE WHEN len(toks) >= 2
       |        THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
       |        ELSE CAST([] AS VARCHAR[]) END)) AS u(f)),
       |h AS (
       |  SELECT doc_id,
       |    list_reduce(
       |      list_prepend(0::BIGINT,
       |        list_transform(range(1, len(f) + 1),
       |          i -> unicode(substr(f, i::INT, 1))::BIGINT)),
       |      (a, c) -> (a * 31 + c) % $prime) % $nBuckets AS bucket
       |  FROM feat),
       |hb AS (
       |  SELECT h.doc_id, bucket, (d.lang = '${sqlStr(targetLang)}') AS is_target
       |  FROM h JOIN documents d USING (doc_id)),
       |db AS (SELECT doc_id, bucket, count(*)::BIGINT AS n FROM hb GROUP BY 1, 2),
       |gb AS (SELECT bucket, count(*)::BIGINT AS cr,
       |         sum(CASE WHEN is_target THEN 1 ELSE 0 END)::BIGINT AS ct
       |       FROM hb GROUP BY 1),
       |tot AS (SELECT sum(cr)::BIGINT AS tr, sum(ct)::BIGINT AS tt FROM gb),
       |contrib AS (
       |  SELECT doc_id, n,
       |    CAST(round(n * (ln(ct + 1) - ln(cr + 1) + ln(tr + $nBuckets) - ln(tt + $nBuckets))
       |      * 1000000.0) AS BIGINT) AS c
       |  FROM db JOIN gb USING (bucket) CROSS JOIN tot),
       |perdoc AS (SELECT doc_id, sum(n)::BIGINT AS n_feats, sum(c)::BIGINT AS score_scaled
       |           FROM contrib GROUP BY 1),
       |f AS (
       |  SELECT d.doc_id, (d.lang = '${sqlStr(targetLang)}') AS is_target,
       |    coalesce(p.n_feats, 0)::BIGINT AS n_feats,
       |    coalesce(p.score_scaled, 0)::BIGINT AS score_scaled
       |  FROM documents d LEFT JOIN perdoc p USING (doc_id)),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (ORDER BY score_scaled DESC, doc_id)
       |            AS BIGINT) AS rank FROM f)
       |SELECT doc_id, is_target, n_feats, score_scaled, rank,
       |  rank <= $selectN AS selected
       |FROM ranked ORDER BY doc_id""".stripMargin

  /** Per-dimension drift between the even/odd id halves (mirror of
    * Similarity.dimDrift): the dimStats integer recipe per side, joined
    * on the dimension. */
  val dimDrift: String =
    """WITH x AS (
      |  SELECT vec_id % 2 = 0 AS a, i - 1 AS dim,
      |    CAST(round(embedding[i]::DOUBLE * 1000000.0) AS BIGINT) AS s
      |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS r(i)),
      |g AS (
      |  SELECT a, dim, count(*) AS n, sum(s)::BIGINT AS sum_scaled,
      |    sum(s*s)::DOUBLE AS sq
      |  FROM x GROUP BY 1, 2),
      |m AS (
      |  SELECT a, dim, n, sum_scaled,
      |    sum_scaled::DOUBLE / (n::DOUBLE * 1000000.0) AS mean,
      |    sqrt((n::DOUBLE * sq - sum_scaled::DOUBLE * sum_scaled::DOUBLE)
      |         / (n::DOUBLE * (n::DOUBLE - 1.0))) / 1000000.0 AS std
      |  FROM g)
      |SELECT ma.dim, ma.n AS n_a, ma.sum_scaled AS sum_a_scaled,
      |  ma.mean AS mean_a, ma.std AS std_a,
      |  mb.n AS n_b, mb.sum_scaled AS sum_b_scaled,
      |  mb.mean AS mean_b, mb.std AS std_b,
      |  mb.mean - ma.mean AS mean_shift
      |FROM m ma JOIN m mb ON ma.dim = mb.dim AND ma.a AND NOT mb.a
      |ORDER BY ma.dim""".stripMargin

  val dimStats: String =
    """WITH x AS (
      |  SELECT i - 1 AS dim, CAST(round(embedding[i]::DOUBLE * 1000000.0) AS BIGINT) AS s
      |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS r(i)),
      |a AS (
      |  SELECT dim, count(*) AS n, min(s) AS min_scaled, max(s) AS max_scaled,
      |    sum(s)::BIGINT AS sum_scaled, sum(s*s)::DOUBLE AS sum_sq_scaled
      |  FROM x GROUP BY dim)
      |SELECT dim, n, min_scaled, max_scaled, sum_scaled, sum_sq_scaled,
      |  sum_scaled::DOUBLE / (n::DOUBLE * 1000000.0) AS mean,
      |  sqrt((n::DOUBLE * sum_sq_scaled - sum_scaled::DOUBLE * sum_scaled::DOUBLE)
      |       / (n::DOUBLE * (n::DOUBLE - 1.0))) / 1000000.0 AS std
      |FROM a ORDER BY dim""".stripMargin

  // ------------------------------------------------------- HTML extraction

  /** Entity decode chain (mirror of Html.entityDecode — same fixed set,
    * `&amp;` last). Plain `replace` (global, literal) == the engine's
    * regexp_replace over these metachar-free patterns. */
  private def htmlEntities(e: String): String =
    Html.Entities.foldLeft(e) { case (acc, (ent, ch)) =>
      s"replace($acc, '${sqlStr(ent)}', '${sqlStr(ch)}')" }

  /** script/style/comment removal (mirror of Html.decommented; the
    * regex constants are interpolated from the engine so they cannot
    * drift — all RE2-safe by construction, see Html's class doc). */
  private def htmlDecommented(e: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($e, " +
      s"'${Html.ScriptRe}', '', 'g'), '${Html.StyleRe}', '', 'g'), " +
      s"'${Html.CommentRe}', '', 'g')"

  private def htmlBlockified(e: String): String =
    s"regexp_replace(${htmlDecommented(e)}, '${Html.BlockTagRe}', chr(10), 'g')"

  /** Visible text of a fragment (mirror of Html.fragmentText). */
  private def htmlFragmentText(e: String): String =
    s"regexp_replace(${htmlEntities(s"regexp_replace($e, '${Html.AnyTagRe}', '', 'g')")}, " +
      "'[ \\t]+', ' ', 'g')"

  /** Decoded anchor-text chars (mirror of Html.linkChars). list_sum of
    * an empty list is NULL and of BIGINTs is HUGEINT — coalesce + cast. */
  private def htmlLinkChars(e: String): String =
    s"coalesce(CAST(list_sum(list_transform(" +
      s"regexp_extract_all($e, '${Html.AnchorRe}', 1), " +
      s"x -> length(trim(${htmlFragmentText("x")}))::BIGINT)) AS BIGINT), 0::BIGINT)"

  /** Full extracted text (mirror of Html.extractedText). */
  private def htmlExtractedText(e: String): String =
    s"trim(regexp_replace(regexp_replace(${htmlFragmentText(htmlBlockified(e))}, " +
      s"' *\\n *', chr(10), 'g'), '\\n+', chr(10), 'g'), chr(10) || ' ')"

  /** The planted HTML column — MUST mirror Html.htmlDocs verbatim. */
  private val htmlDocCte: String =
    """h AS (
      |  SELECT doc_id,
      |    '<html><head><title>T' || doc_id::VARCHAR || '</title>' ||
      |    '<style type="text/css">p { margin: 0; }</style>' ||
      |    '<script>if (a<b) { s = "</p>"; }</script>' ||
      |    '</head><body><!-- c' || doc_id::VARCHAR || ' -->' ||
      |    '<h1>Doc&#39;s &quot;h&quot; &lt;' || doc_id::VARCHAR || '&gt;</h1><p>' ||
      |    regexp_replace(text, ' and ', ' &amp; ', 'g') ||
      |    '</p><div><a href="/h">Home</a> <a href="/n">Next page</a></div>' ||
      |    '<p>Tail&nbsp;text <a href="/i"><em>inline</em> link</a> end.</p>' ||
      |    '</body></html>' AS html
      |  FROM documents)""".stripMargin

  /** Mirror of Html.extract over the planted corpus. Integer division
    * is `//` here, `div` on the Spark side (the known parity trap). */
  val htmlExtract: String =
    s"""WITH $htmlDocCte,
       |x AS (
       |  SELECT doc_id, ${htmlExtractedText("html")} AS text,
       |    ${htmlDecommented("html")} AS clean
       |  FROM h),
       |r AS (
       |  SELECT doc_id, text, length(text)::BIGINT AS n_chars,
       |    CASE WHEN length(text) = 0 THEN 0::BIGINT
       |         ELSE len(string_split(text, chr(10)))::BIGINT END AS n_blocks,
       |    len(regexp_extract_all(clean, '${Html.AnchorRe}', 0))::BIGINT AS n_links,
       |    ${htmlLinkChars("clean")} AS link_chars
       |  FROM x)
       |SELECT doc_id, text, n_chars, n_blocks, n_links, link_chars,
       |  (link_chars * 1000) // greatest(n_chars, 1) AS link_density_scaled
       |FROM r ORDER BY doc_id""".stripMargin

  /** Mirror of Html.blocks: 1-based position in the raw separator
    * split, empty blocks dropped after visible-text trim. */
  val htmlBlocks: String =
    s"""WITH $htmlDocCte,
       |p AS (
       |  SELECT doc_id, string_split(${htmlBlockified("html")}, chr(10)) AS parts
       |  FROM h),
       |raw AS (
       |  SELECT doc_id, i::BIGINT AS block_id, parts[i] AS raw
       |  FROM p, unnest(range(1, len(parts) + 1)) AS r(i)),
       |b AS (
       |  SELECT doc_id, block_id,
       |    trim(${htmlFragmentText("raw")}) AS block_text,
       |    ${htmlLinkChars("raw")} AS link_chars
       |  FROM raw),
       |f AS (
       |  SELECT doc_id, block_id, block_text,
       |    length(block_text)::BIGINT AS n_chars, link_chars
       |  FROM b WHERE length(block_text) > 0)
       |SELECT doc_id, block_id, block_text, n_chars, link_chars,
       |  (link_chars * 1000) // greatest(n_chars, 1) AS link_density_scaled,
       |  (link_chars * 1000) // greatest(n_chars, 1) >= 500 AS is_nav
       |FROM f ORDER BY doc_id, block_id""".stripMargin
}
