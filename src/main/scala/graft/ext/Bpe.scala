package graft.ext

import graft.apps.WordCount
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.Pinnable

/** Distributed BPE (byte-pair-encoding) tokenizer training — the step
  * that turns a cleaned corpus into the subword vocabulary a model
  * trains with (Sennrich et al. 2016).
  *
  * Scale design: the corpus is scanned ONCE, for word frequencies (the
  * same partial-agg shuffle as word count). Training then runs on the
  * DISTINCT-WORD table — vocab-sized (10^5–10^6 rows at web scale),
  * orders of magnitude smaller than the token stream. Merges are learned
  * in BATCHES: each scan costs one pair-count aggregation (weighted by
  * word frequency) plus ONE driver-sized TakeOrdered(K) collect, and
  * applies up to `batch` mutually independent merges in a single pass,
  * so a `T`-merge vocabulary costs `ceil(T/batch)` driver round-trips —
  * NOT `T`. A 32k-merge production vocabulary at `batch`=256 is 125
  * scans of a vocab-sized table, a driver-feasible schedule; the
  * sequential form (`batch`=1) would be 32k round-trips. The word table
  * is localCheckpointed once per scan to keep lineage flat (a cluster
  * deployment would use a reliable checkpoint).
  *
  * Batch selection is greedy over candidates ordered by (count desc,
  * lhs, rhs): a candidate is admitted only if its lhs, rhs AND its
  * concatenation are all disjoint from every previously admitted
  * candidate's {lhs, rhs, lhs+rhs} set. Disjointness makes the batch
  * independent — no admitted merge can create, destroy or consume
  * another's pair occurrences — so applying the batch in one pass is
  * EXACTLY equivalent to applying the same merges sequentially in
  * selection order (BpeSpec proves this on the classic corpus), and
  * every admitted candidate's count is its true corpus count. The
  * schedule differs from fully-sequential BPE only in that a batch
  * cannot chain onto a symbol it just created (e.g. es→est in one scan);
  * chains form across consecutive scans instead — the standard trade in
  * scalable BPE trainers. Candidates are drawn from the top
  * K = [[OverscanFactor]]·batch pairs so taboo skips cannot starve a
  * batch; the walk depth is part of the deterministic contract (the
  * DuckDB oracle replays the identical K, budget schedule, taboo rule
  * and tie order).
  *
  * Merge application is the canonical greedy left-to-right scan
  * (non-overlapping: `a a a a` + merge (a,a) → `aa aa`), expressed as a
  * sequential fold over the symbol array with a one-symbol lookback —
  * pure Column code, evaluated on the small word table only. With a
  * batch of disjoint rules, at most one rule can match at any position
  * and a rule's output is never re-examined within the pass.
  *
  * The initial alphabet is restricted to `[a-z0-9]+` words: alphabet
  * control is standard BPE practice, and it pins char-splitting to a
  * range where every engine agrees (the DuckDB oracle replays the full
  * trainer — pair counts, batched greedy selection, greedy walk — in
  * recursive SQL).
  */
object Bpe {

  /** End-of-word marker symbol (cannot collide: tokenizer output never
    * contains `_`). */
  val EndMark = "_"

  /** Default merges applied per corpus-table scan. */
  val DefaultBatch = 4

  /** Candidate walk depth per scan is OverscanFactor·batch: taboo
    * collisions skip candidates, so the walk must look past the top
    * `batch` pairs. Part of the cross-engine deterministic contract. */
  val OverscanFactor = 8

  /** Replay groups between localCheckpoints in [[Model.segment]] — bounds
    * both expression-tree depth and live checkpoint storage. */
  val SegmentCheckpointEvery = 16

  final case class Merge(rnd: Int, lhs: String, rhs: String, merged: String, cnt: Long)

  /** (word, freq, symbol-array) table: chars + end marker. */
  def initialWords(docs: DataFrame): DataFrame =
    WordCount.wordCount(docs)
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .select(col("word"), col("cnt").cast("long").as("freq"),
        concat(split(col("word"), ""), array(lit(EndMark))).as("l"))

  /** Adjacent-pair frequencies over the word table, weighted by word
    * frequency — one small shuffle per scan. */
  def pairCounts(words: DataFrame): DataFrame =
    words.select(col("freq"),
        explode(transform(slice(col("l"), lit(1), size(col("l")) - 1),
          (s, i) => struct(s.as("a"),
            element_at(col("l"), (i + lit(2)).cast("int")).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Greedy independent-subset selection over rank-ordered candidates:
    * admit while under budget and while the candidate's lhs, rhs and
    * concatenation avoid every admitted candidate's {lhs, rhs, lhs+rhs}.
    * Pure driver code over at most OverscanFactor·batch rows. */
  private[graft] def selectBatch(cands: Seq[(String, String, Long)],
                                 budget: Int): Seq[(String, String, Long)] = {
    val taboo = scala.collection.mutable.HashSet.empty[String]
    val picked = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    val it = cands.iterator
    while (picked.size < budget && it.hasNext) {
      val c @ (a, b, _) = it.next()
      val m = a + b
      if (!taboo(a) && !taboo(b) && !taboo(m)) {
        picked += c
        taboo ++= Seq(a, b, m)
      }
    }
    picked.toSeq
  }

  /** Canonical greedy merge pass for a batch of DISJOINT rules: one-symbol
    * lookback fold. `pend` holds the previous unmerged symbol; a
    * (pend, s) hit on any rule emits the concatenated symbol and clears
    * the lookback, so a merged symbol never re-pairs within the pass.
    * Rule disjointness (see [[selectBatch]]) guarantees at most one rule
    * matches at each position.
    *
    * Rule dispatch is O(1) and INDEPENDENT of the batch size: membership
    * is one hash-set probe ([[graft.functions.InLiteralSet]]) on the pair
    * key `pend + ' ' + s`. The space separator cannot collide — symbols
    * match `^[a-z0-9_]+$` — and keying the PAIR (not the bare
    * concatenation) keeps the split point unambiguous: rules ("ab","c")
    * and ("a","bc") share the concatenation "abc", and batch disjointness
    * only excludes both RULES from one batch, not the colliding adjacent
    * (pend, s) pair from the data. A null `pend` (start of word / just
    * merged) null-propagates through the key to a no-hit, same as the
    * former OR-chain. This unblocks production batch sizes (e.g. 256
    * merges/scan): the old per-symbol OR-chain was O(batch) comparisons
    * and a 256-way disjunction in one expression tree. */
  private[graft] def applyMerges(syms: Column, rules: Seq[(String, String)]): Column = {
    require(rules.nonEmpty, "applyMerges needs at least one rule")
    val keys = rules.map { case (a, b) => a + " " + b }
    val zero = struct(array().cast("array<string>").as("acc"),
      lit(null).cast("string").as("pend"))
    val step = (st: Column, s: Column) => {
      val hit = graft.functions.in_literal_set(
        concat(st.getField("pend"), lit(" "), s), keys)
      struct(
        when(hit, concat(st.getField("acc"), array(concat(st.getField("pend"), s))))
          .otherwise(when(st.getField("pend").isNull, st.getField("acc"))
            .otherwise(concat(st.getField("acc"), array(st.getField("pend")))))
          .as("acc"),
        when(hit, lit(null).cast("string")).otherwise(s).as("pend"))
    }
    val finish = (st: Column) =>
      when(st.getField("pend").isNull, st.getField("acc"))
        .otherwise(concat(st.getField("acc"), array(st.getField("pend"))))
    aggregate(syms, zero, step, finish)
  }

  /** Learn up to `merges` merges in `ceil(merges/batch)` scans; returns
    * the learned merges (rnd = global merge order) and the word table in
    * its final segmentation. The scan schedule is FIXED — scan `r` has
    * budget `min(batch, merges − batch·(r−1))` and a scan whose taboo
    * skips leave it under budget is not compensated later — so the
    * schedule is a pure function of (corpus, merges, batch), replayable
    * by the oracle. Ties break on (count desc, lhs, rhs) — fully
    * deterministic. `batch = 1` is exactly the classic sequential
    * trainer (argmax per scan). */
  /** A trained tokenizer — the fit-once / encode-every-ingest-batch
    * deployment shape: [[fit]] captures the merge log, and [[encode]]
    * applies it to ANY corpus. New-corpus words absent from the training
    * vocabulary (OOV) are segmented by REPLAYING the merge list over the
    * new corpus's distinct-word table in disjoint batches —
    * `ceil(merges/batch)`-ish pure-column [[applyMerges]] passes, zero
    * driver round-trips, no corpus rescan. Because a disjoint batch
    * applies exactly like its merges applied one-at-a-time (the
    * BpeSpec-proved equivalence), ANY internally-disjoint grouping of
    * the merge list replays faithfully; on its own training corpus the
    * replay reproduces the trained segmentations exactly (spec-pinned).
    */
  final class Model private[Bpe] (val merges: Seq[Merge],
                                  private val replayBatches: Seq[Seq[(String, String)]]) {

    /** Segment a (word, freq, l) symbol table by replaying the learned
      * merge schedule — vocab-sized work, no corpus scan. Every
      * [[SegmentCheckpointEvery]] replay groups the frame is
      * localCheckpointed (and the superseded checkpoint unpersisted, so
      * live storage stays O(1) generations): an unbounded fold would
      * nest one `aggregate` lambda per group into a single expression
      * tree, and a 32k-merge model replays ~128+ groups — analyzer cost
      * and tree size grow with the chain, the checkpoint resets both. A
      * short chain (the common small-model case) stays one lazy plan. */
    private[Bpe] def segment(words: DataFrame): DataFrame = {
      var cur = words
      var lastCp: DataFrame = null
      var sinceCp = 0
      replayBatches.foreach { rules =>
        cur = cur.withColumn("l", applyMerges(col("l"), rules))
        sinceCp += 1
        if (sinceCp == SegmentCheckpointEvery) {
          val cp = cur.pinCheckpoint()
          if (lastCp != null) org.apache.spark.sql.graft.bridge.freeCheckpoint(lastCp)
          lastCp = cp
          cur = cp
          sinceCp = 0
        }
      }
      cur
    }

    /** Encode any documents corpus (same `(doc_id, text, source)`
      * contract as [[encodeCorpus]]) with THIS vocabulary. */
    def encode(docs: DataFrame): DataFrame =
      encodeSegmented(docs, segment(initialWords(docs)))
  }

  /** Train a [[Model]]: [[train]] plus the greedy disjoint regrouping of
    * the merge log the encoder replays (a group closes when it reaches
    * `batch` merges or the next merge's {lhs, rhs, merged} symbols
    * collide with the group's). */
  def fit(docs: DataFrame, merges: Int, batch: Int = DefaultBatch): Model = {
    val (log, trainedWords) = train(docs, merges, batch)
    // the Model replays the merge log — it never reads the trained word
    // table, so release its checkpoint instead of pinning it for the
    // model's lifetime
    org.apache.spark.sql.graft.bridge.freeCheckpoint(trainedWords)
    val groups = scala.collection.mutable.ArrayBuffer.empty[Vector[Merge]]
    var cur = Vector.empty[Merge]
    var taboo = Set.empty[String]
    log.foreach { m =>
      val syms = Set(m.lhs, m.rhs, m.merged)
      if (cur.size == batch || syms.exists(taboo)) {
        groups += cur; cur = Vector.empty; taboo = Set.empty
      }
      cur :+= m
      taboo ++= syms
    }
    if (cur.nonEmpty) groups += cur
    new Model(log, groups.map(g => g.map(m => (m.lhs, m.rhs)).toSeq).toSeq)
  }

  def train(docs: DataFrame, merges: Int,
            batch: Int = DefaultBatch): (Seq[Merge], DataFrame) =
    trainFrom(initialWords(docs), merges, batch)

  /** [[train]] from an arbitrary (word, freq, l) table — the hook the
    * byte-level family ([[ByteBpe]]) enters through: the merge loop is
    * symbol-agnostic as long as symbols match `[a-z0-9_]+` (the
    * applyMerges key-separator contract). */
  private[ext] def trainFrom(words0: DataFrame, merges: Int,
                             batch: Int): (Seq[Merge], DataFrame) = {
    require(merges >= 1, "need at least one merge")
    require(batch >= 1, "batch must be >= 1")
    var words = words0.pinCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    val scans = (merges + batch - 1) / batch
    val k = OverscanFactor * batch
    var r = 1
    var dry = false
    while (r <= scans && !dry) {
      val budget = math.min(batch, merges - batch * (r - 1))
      val top = pairCounts(words)
        .orderBy(desc("cnt"), asc("a"), asc("b")).limit(k).collect()
        .map(row => (row.getString(0), row.getString(1), row.getLong(2))).toSeq
      val picked = selectBatch(top, budget)
      if (picked.isEmpty) dry = true
      else {
        picked.foreach { case (a, b, cnt) => out += Merge(out.size + 1, a, b, a + b, cnt) }
        // free the superseded generation once the new checkpoint has
        // materialized (eager=true): live storage is O(1) generations of
        // the vocab-sized table, not O(scans) — a 125-scan production run
        // must not rely on driver GC to release checkpoint blocks.
        // (plain Dataset.unpersist cannot release checkpoint blocks —
        // see bridge.freeCheckpoint)
        val next = words.withColumn("l",
          applyMerges(col("l"), picked.map(p => (p._1, p._2)))).pinCheckpoint()
        org.apache.spark.sql.graft.bridge.freeCheckpoint(words)
        words = next
      }
      r += 1
    }
    (out.toSeq, words)
  }

  /** The learned merge table — the trainer's user-facing artifact. */
  def mergeTable(docs: DataFrame, merges: Int, batch: Int = DefaultBatch): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (m, trainedWords) = train(docs, merges, batch)
    // only the merge log is returned — release the trained word table's
    // checkpoint as fit() does, instead of pinning it per invocation
    org.apache.spark.sql.graft.bridge.freeCheckpoint(trainedWords)
    m.toDF().orderBy("rnd")
  }

  /** Corpus-level subword frequencies after training: each word's final
    * segmentation weighted by its frequency — the vocabulary-coverage
    * report (and the lookup table an encoder would broadcast: encoding a
    * 100 TB token stream is a join against this vocab-sized table, not a
    * re-derivation per token — [[encodeCorpus]] is that join, concrete). */
  def subwordFrequencies(docs: DataFrame, merges: Int,
                         batch: Int = DefaultBatch): DataFrame = {
    val (_, words) = train(docs, merges, batch)
    words.select(explode(col("l")).as("subword"), col("freq"))
      .groupBy("subword").agg(sum(col("freq")).as("n"))
      .orderBy("subword")
  }

  /** Encode the corpus with the vocabulary trained on it — the step that
    * turns a cleaned corpus into model input. Every in-alphabet token
    * (the trainer's `[a-z0-9]+` universe) joins the trained
    * word→segmentation table and renders as its subword sequence;
    * per document the result is the in-alphabet token count, the subword
    * count, and the full segmented stream (subwords space-joined in
    * token order — [[EndMark]] closes each word, so the rendering is
    * lossless). Documents with no in-alphabet token keep a (0, 0, '')
    * row.
    *
    * Scale shape: training costs [[train]] (ceil(merges/batch) scans of
    * the distinct-word table); encoding itself is ONE equi-join of the
    * corpus token stream against the VOCAB-SIZED word table plus one
    * doc-keyed aggregation — a 100 TB stream encodes without any
    * per-token re-derivation. The word table is left unhinted: it is
    * broadcastable at typical vocab sizes and AQE picks that up from
    * stats; an explicit hint would hard-fail on an unusually wide vocab
    * instead of degrading to a shuffle join. Token order is recovered
    * from `posexplode` positions inside the per-doc aggregation — no
    * window, no global sort.
    *
    * Input contract: the documents shape `(doc_id, text, source)`, same
    * as the whole trainer family ([[train]] tokenizes `text` via the
    * word-count path) — no column parameters, so the encoder can never
    * silently train on one column and encode another. */
  def encodeCorpus(docs: DataFrame, merges: Int, batch: Int = DefaultBatch): DataFrame = {
    val (_, words) = train(docs, merges, batch)
    encodeSegmented(docs, words)
  }

  /** Tokenizer fertility report: subwords-per-word and docs/token
    * volume PER LANGUAGE for a BPE vocabulary trained on the corpus —
    * the standard tokenizer-quality diagnostic (a vocabulary that
    * fragments one language into 2× the pieces of another starves it
    * of effective context). One language-keyed aggregation over the
    * encode output; fertility is a single exact-long division, so the
    * double is engine-portable. */
  def fertilityReport(docs: DataFrame, merges: Int = 8,
                      batch: Int = DefaultBatch): DataFrame =
    encodeCorpus(docs, merges, batch)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_words"),
        sum(col("n_subwords")).as("n_subwords"))
      .withColumn("fertility",
        col("n_subwords").cast("double") / nullif(col("n_words"), lit(0L)).cast("double"))
      .orderBy("lang")

  /** The encoding tail [[encodeCorpus]] and [[Model.encode]] share: the
    * corpus token stream equi-joins a (word, l) segmentation table, then
    * one doc-keyed aggregation rebuilds each document's subword stream
    * in token order. */
  private[ext] def encodeSegmented(docs: DataFrame, words: DataFrame,
                                   wordRe: String = "^[a-z0-9]+$"): DataFrame = {
    val seg = words.select(col("word"), array_join(col("l"), " ").as("seg"),
      size(col("l")).cast("long").as("ns"))
    val toks = docs.select(col("doc_id"),
        posexplode(graft.text.Tokenize.tokensArray(col("text"))).as(Seq("tok_no", "word")))
      .filter(col("word").rlike(wordRe))
    val enc = toks.join(seg, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("ns")).as("n_subwords"),
        array_join(transform(array_sort(collect_list(struct(col("tok_no"), col("seg")))),
          x => x.getField("seg")), " ").as("segmented"))
    docs.select(col("doc_id")).join(enc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_subwords"), lit(0L)).as("n_subwords"),
        coalesce(col("segmented"), lit("")).as("segmented"))
      .orderBy("doc_id")
  }
}
