package graft

import graft.ext.{Dedup, TextStats}

/** DuckDB oracle-SQL builders for the extension queries. The SQL mirrors
  * the engine's arithmetic exactly (same rolling-hash fold, same seed
  * family, same fold order for doubles) so results match bit-for-bit. */
object OracleSql {

  /** Normalized token ARRAY per doc (mirror of Tokenize.tokensArray).
    * Whitespace is the explicit Java-`\s` set (RE2's `\s` lacks \x0B). */
  val toksCte: String =
    """toks AS (
      |  SELECT doc_id, list_transform(
      |           list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), t -> t <> ''),
      |           t -> lower(regexp_replace(t, '[^\p{L}\p{N}]+', '', 'g'))) AS toks
      |  FROM documents)""".stripMargin

  /** Distinct 3-token shingles per doc (mirror of Dedup.shingleRows k=3). */
  val shinglesCte: String =
    s"""$toksCte,
       |sh AS (
       |  SELECT DISTINCT doc_id, sh FROM toks,
       |  unnest(CASE WHEN len(toks) >= 3
       |    THEN list_transform(range(1, len(toks)-1),
       |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |    ELSE [array_to_string(toks, ' ')] END) AS u(sh))""".stripMargin

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

  /** Embedding near-dup top pairs on a bounded id range. */
  def cosineTopPairs(maxId: Long, limit: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < $maxId)
       |SELECT x.vec_id AS a, y.vec_id AS b,
       |  ${cosineExpr("x.embedding", "y.embedding")} AS score
       |FROM e x JOIN e y ON x.vec_id < y.vec_id
       |ORDER BY score DESC, a, b LIMIT $limit""".stripMargin

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
}
