package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import core._

/** Text / document-pipeline queries over `documents` (SURVEY.md §2.10 plus
  * the mandated LLM-data operators): exact + near dedup (n-gram Jaccard,
  * MinHash LSH, SimHash), tf-idf, lexicon scoring, fingerprinting,
  * language-ID, quality scoring, token counting.
  *
  * All are built-in compositions via graft.operators.TextOps — no UDFs, so
  * everything stays inside whole-stage codegen and hash-matches the DuckDB
  * oracle. Corpus-level ops shuffle on high-cardinality keys (shingle, word,
  * doc pair); per-doc ops are shuffle-free.
  *
  * Scale path: the exact shingle-join Jaccard is O(Σ df²) over shingles —
  * measured 1.27M candidate pairs at sf0.1, fine here; at 100 TB the MinHash
  * LSH variant (same output contract, candidates bounded by band buckets)
  * is the one to run, which is why both are first-class queries.
  */
object TextQ {

  /** Exact dedup after lowercase + whitespace-collapse normalization,
    * keeping the lowest doc_id of each duplicate group.
    *
    * The window partitions on `xxhash64(norm)` — an 8-byte shuffle key —
    * not on the normalized document itself, so the corpus text crosses the
    * exchange once (as payload) instead of twice (key + payload); at 100 TB
    * that halves the dominant shuffle. Collision-safe without assuming the
    * hash is injective: rows sort by (norm, doc_id) inside each hash
    * partition and a row survives iff its norm differs from the previous
    * row's — exactly the lowest doc_id per distinct norm, even if two
    * different norms collide into one partition. */
  val dedupDocs: QFn = (s, dir) => {
    val w = Window.partitionBy(col("hkey")).orderBy(col("norm"), col("doc_id"))
    t(s, dir, "documents")
      .withColumn("norm", TextOps.normText(col("text")))
      .withColumn("hkey", xxhash64(col("norm")))
      .withColumn("prev", lag(col("norm"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("norm"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Tokenize + global top-20 word count (Generator/explode path). */
  val wordCount: QFn = (s, dir) =>
    t(s, dir, "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(20)

  /** Per-doc distinct 3-gram shingles, exploded to (doc_id, shingle).
    *
    * The token array is materialized in its own projection and the
    * shingle positions come from an INDEX-SEQUENCE explode with the
    * 3-token concat as a codegen'd top-level projection; per-doc shingle
    * dedup is a relational distinct on (doc_id, shingle). The earlier
    * shapes both lost badly: building shingles over inline tokens(text)
    * re-ran the regex split per element_at (~25 s of Pattern.split at
    * sf0.1), and a transform-lambda string array paid the interpreted-HOF
    * + generator-filter-inlining tax (see GraphQ.edgesOf, 35× on the
    * same corpus). */
  private def shingleRows(s: SparkSession, dir: String): DataFrame = {
    val ws = col("ws")
    t(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
      .select(col("doc_id"), ws, explode(when(size(ws) >= 3,
        sequence(lit(0), size(ws) - 3))
        .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"), concat_ws(" ", element_at(ws, col("i") + 1),
        element_at(ws, col("i") + 2), element_at(ws, col("i") + 3))
        .as("shingle"))
      .distinct()
  }

  /** Exact near-dup pairs: word-3-gram Jaccard ≥ 0.8, found with prefix
    * filtering (Bayardo et al., WWW'07 "Scaling Up All Pairs Similarity
    * Search") instead of a full shingle self-join.
    *
    * A naive self-join on shingles generates Σ df² candidate pairs
    * (measured 1.27M at sf0.1, the dominant cost); with J(A,B) ≥ τ a pair
    * must collide inside each doc's *prefix* — its |d| − ⌈τ|d|⌉ + 1 rarest
    * shingles under a global (df, hash) order — so only prefixes are
    * joined, and the exact Jaccard is verified on the candidates via
    * array_intersect of the full per-doc sets. Result set is provably
    * identical to the naive join; candidates drop ~50× at sf0.1 and the
    * prefix-join volume scales with rare-shingle df, not corpus df² — the
    * property that keeps exact dedup feasible at 100 TB.
    *
    * The join key is xxhash64(shingle) — an 8-byte shuffle key instead of a
    * ~20-char string; at 27k distinct shingles the collision probability is
    * ~2e-11, far below any bit of the result. Prefix length uses integer
    * arithmetic (⌈4n/5⌉ = (4n+4) div 5 for τ = 0.8) so no float rounding
    * can shorten a prefix and drop a true pair. */
  /** The prefix-filter candidate stage + per-doc shingle sets, split out
    * so ScalingSpec can MEASURE candidate growth across sf tiers (the
    * sub-quadratic claim below, as a regression gate, not narrative). */
  private[graft] def neardupCandSets(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val sh = shingleRows(s, dir)
      .select(col("doc_id"), xxhash64(col("shingle")).as("shash"))
    val dfs = sh.groupBy(col("shash")).agg(count(lit(1)).as("df"))
    // Per-doc shingle set, ordered rarest-first by the global (df, shash)
    // total order; n = |set|; prefix = first n - ceil(0.8 n) + 1 entries.
    val docSets = sh.join(dfs, "shash")
      .groupBy(col("doc_id"))
      .agg(transform(
          sort_array(collect_list(struct(col("df"), col("shash")))),
          x => x.getField("shash")).as("ss"),
        count(lit(1)).as("n"))
      .withColumn("plen",
        (col("n") - floor((col("n") * 4 + 4) / 5) + 1).cast("int"))
    val pref = docSets
      .select(col("doc_id"), explode(slice(col("ss"), lit(1), col("plen"))).as("shash"))
    val cand = pref.select(col("doc_id").as("a_id"), col("shash"))
      .join(pref.select(col("doc_id").as("b_id"), col("shash")), "shash")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    (cand, docSets)
  }

  val neardupPairs: QFn = (s, dir) => {
    val (cand, docSets) = neardupCandSets(s, dir)
    cand
      .join(docSets.select(col("doc_id").as("a_id"), col("ss").as("sa"),
        col("n").as("na")), "a_id")
      .join(docSets.select(col("doc_id").as("b_id"), col("ss").as("sb"),
        col("n").as("nb")), "b_id")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jac",
        r6(col("inter") / (col("na") + col("nb") - col("inter"))))
      .filter(col("jac") >= 0.8)
      .select(col("a_id"), col("b_id"), col("jac"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** MinHash(8) + LSH(4 bands × 2 rows) near-dup: md5-based signatures are
    * engine-agnostic; candidates from band-bucket joins only, then exact
    * Jaccard verification on the candidate set — the 100 TB-scale dedup.
    * Exposed unsorted so CurationQ's end-to-end dedup pipeline can consume
    * the same verified pairs without re-deriving the pipeline. */
  /** MinHash signatures (8 hashes) + LSH band rows (4 bands of 2) —
    * shared by the global pair pipeline and the incremental probe.
    * Signatures hash the STRING shingle (oracle parity); the Jaccard
    * verification set + band-bucket join keys use xxhash64 longs — Spark
    * internals only, so cheaper shuffles with identical results. */
  private def minhashSigBands(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val sh = shingleRows(s, dir)
    val sigAggs = Seq(collect_set(xxhash64(col("shingle"))).as("shset")) ++
      (0 until 8).map(i =>
        min(md5(concat(lit(s"$i|"), col("shingle")))).as(s"mh$i"))
    val sig = sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sigAggs: _*)
    val bands = sig.select(col("doc_id"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("band_idx"),
          xxhash64(concat(col(s"mh${2 * j}"), col(s"mh${2 * j + 1}")))
            .as("bucket"))): _*))
        .as("b"))
      .select(col("doc_id"), col("b.band_idx"), col("b.bucket"))
    (sig, bands)
  }

  /** The LSH band-bucket candidate stage + signatures, split out so
    * ScalingSpec can measure candidate growth across sf tiers. */
  private[graft] def minhashCandSets(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val (sig, bands) = minhashSigBands(s, dir)
    // Candidates via groupBy + per-bucket pair expansion instead of a
    // band self-join: one execution of the signature pipeline, not two
    // (AQE stage reuse is not guaranteed across join sides), and the
    // pair fan-out happens after the bucket-size filter.
    val ds = col("ds")
    val pairCombos = flatten(transform(sequence(lit(1), size(ds) - 1),
      i => transform(slice(ds, i + 1, size(ds) - i),
        x => struct(element_at(ds, i).as("a_id"), x.as("b_id")))))
    val cand = bands.groupBy(col("band_idx"), col("bucket"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
      .filter(size(ds) >= 2)
      .select(explode(pairCombos).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
      .distinct()
    (cand, sig)
  }

  private[queries] def minhashVerifiedPairs(s: SparkSession, dir: String): DataFrame = {
    val (cand, sig) = minhashCandSets(s, dir)
    cand
      .join(sig.select(col("doc_id").as("a_id"), col("shset").as("sa"),
        col("n").as("na")), "a_id")
      .join(sig.select(col("doc_id").as("b_id"), col("shset").as("sb"),
        col("n").as("nb")), "b_id")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jac",
        r6(col("inter") / (col("na") + col("nb") - col("inter"))))
      .filter(col("jac") >= 0.8)
      .select(col("a_id"), col("b_id"), col("jac"))
  }

  val minhashLsh: QFn = (s, dir) =>
    minhashVerifiedPairs(s, dir).orderBy(col("a_id"), col("b_id"))

  /** 32-bit SimHash per document as (doc_id, sig bitstring, num).
    *
    * Shape matters: one explode → one md5 per token → 32 codegen'd ±1
    * column sums → bits. The earlier formulation (32 `aggregate` HOFs over
    * the token array) re-hashed every token once per bit inside the
    * interpreted HOF path — 16M md5 calls at sf0.1, ~8 s vs ~0.5 s here
    * for identical output. Same per-bit arithmetic as the DuckDB mirror. */
  private def simhashSig(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val sums = (0 until 32).map { k =>
      val hexPos = k / 4
      val shift = 1 << (3 - (k % 4))
      val nib = conv(substring(col("h"), hexPos + 1, 1), 16, 10).cast("long")
      sum((nib / shift).cast("long") % 2 * 2 - 1).as(s"s$k")
    }
    val bits = (0 until 32).map(k =>
      when(col(s"s$k") > 0, "1").otherwise("0"))
    // explode_outer keeps zero-token docs as one null-token row: every sum
    // is NULL there, `when(NULL > 0)` falls to "0", so such docs emit the
    // all-zeros signature — identical to folding over an empty token list.
    t(s, dir, "documents")
      .select(col("doc_id"), explode_outer(TextOps.tokens(col("text"))).as("w"))
      .select(col("doc_id"), md5(col("w")).as("h"))
      .groupBy(col("doc_id"))
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), concat(bits: _*).as("sig"))
      .withColumn("num", conv(col("sig"), 2, 10).cast("long"))
  }

  /** 32-bit SimHash per document (near-dup signature at hamming ≤ k). */
  val simhashDocs: QFn = (s, dir) =>
    simhashSig(s, dir)
      .select(col("doc_id"), col("sig").as("simhash"))
      .orderBy(col("doc_id"))

  /** Deterministic doc fingerprints: norm-text md5 prefix + min word hash. */
  val fingerprint: QFn = (s, dir) => {
    val toks = TextOps.tokens(col("text"))
    t(s, dir, "documents")
      .select(col("doc_id"),
        TextOps.docFingerprint(col("text")).as("fp16"),
        array_min(transform(toks, w => md5(w))).as("min_word_hash"),
        size(toks).cast("long").as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** CJK-robust tokenization as a GRADED key (r15, verdict #6): the real
    * corpus (whitespace Latin — the fallback must be a provable no-op on
    * it) plus three inline unsegmented/mixed zh docs run through
    * TextOps.tokensCjk (whitespace split, pure-CJK tokens ≥ 2 chars →
    * char bigrams); per-doc token stats grade both behaviors at once:
    * Latin docs must match plain-whitespace stats and CJK docs the
    * bigram expansion, each replayed verbatim in SQL. Scale shape: one
    * per-row flatten + one doc-keyed aggregate — the token_count plan
    * with a different tokenizer column op. */
  val cjkBigramTokens: QFn = (s, dir) => {
    val extra = s.createDataFrame(Seq(
      (1000001L, "深度学习模型训练"),
      (1000002L, "大规模数据处理系统 with ascii tokens"),
      (1000003L, "混合 text 分词 test"))).toDF("doc_id", "text")
    t(s, dir, "documents").select(col("doc_id"), col("text"))
      .unionByName(extra)
      .select(col("doc_id"),
        explode(TextOps.tokensCjk(col("text"))).as("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        countDistinct(col("tok")).as("n_uniq"),
        min(col("tok")).as("min_tok"), max(col("tok")).as("max_tok"))
      .orderBy(col("doc_id"))
  }

  /** Lexicon-based scoring (sentiment-style): Σ ±1 over lexicon hits. */
  val lexiconScore: QFn = (s, dir) => {
    val lex = s.createDataFrame(Seq(
      ("fast", 1L), ("big", 1L), ("slow", -1L), ("dup", -1L)))
      .toDF("word", "wt")
    val hits = t(s, dir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      .join(broadcast(lex), "word")
      .groupBy(col("doc_id")).agg(sum(col("wt")).as("score"))
    t(s, dir, "documents")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("score"), lit(0L)).as("score"))
      .orderBy(col("doc_id"))
  }

  /** TF-IDF with the top term per document (rank on rounded score so both
    * engines agree; ln() is libm-dependent at the last ulp). */
  val tfidfTop: QFn = (s, dir) => {
    val docs = t(s, dir, "documents")
    val tf = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "word").crossJoin(broadcast(n))
      .withColumn("score_r",
        r6(col("tf") * log(col("n_docs") / col("df"))))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_r").desc, col("word"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("word").as("term"), col("score_r"))
      .orderBy(col("doc_id"))
  }

  /** Charset-heuristic language ID vs the labeled lang. */
  val langIdQ: QFn = (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextOps.langId(col("text")).as("lang_pred"))
      .withColumn("is_match", (col("lang_pred") === col("lang")).cast("long"))
      .orderBy(col("doc_id"))

  /** Per-doc quality features + combined score, all from array HOFs.
    * Denominators go through nullif: a token-less doc gets NULL ratios on
    * both engines instead of an ANSI divide-by-zero (EdgeCorpusSpec). */
  val qualityScore: QFn = (s, dir) => {
    val ws = TextOps.tokens(col("text"))
    val nTok = nullif(size(ws), lit(0))
    val nDis = size(array_distinct(ws))
    val nStop = size(filter(ws, w => w.isin(TextOps.stopwords: _*)))
    val sumLen = aggregate(transform(ws, w => length(w)), lit(0), (a, x) => a + x)
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(ws).cast("long").as("n_tokens"),
        r6(nDis / nTok).as("ttr"),
        r6(nStop / nTok).as("stop_ratio"),
        r6(sumLen / nTok).as("mean_wlen"))
      .withColumn("quality",
        r6(lit(0.5) * col("ttr") + lit(0.3) * (lit(1.0) - col("stop_ratio")) +
          lit(0.2) * least(col("mean_wlen") / 10, lit(1.0))))
      .orderBy(col("doc_id"))
  }

  /** Token counting: whitespace tokens + regex alpha tokens + chars. */
  val tokenCount: QFn = (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_ws"),
        size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0)))
          .cast("long").as("n_alpha"),
        col("n_chars"))
      .orderBy(col("doc_id"))

  /** Top-5 character bigrams per language (the n-gram language-model
    * profile behind langId). Bigrams come from the codegen'd CharBigrams
    * expression — one primitive byte scan per document, replacing the
    * earlier zip_with-over-shifted-slices + rlike pipeline (HOFs are
    * CodegenFallback in Spark 4.1); byte-level `[a-z]{2}` adjacency is
    * proven equivalent in CharBigramsSpec and the DuckDB oracle is
    * unchanged. */
  val ngramProfile: QFn = (s, dir) => {
    graft.expressions.CharBigrams.register(s)
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("bg"))
    t(s, dir, "documents")
      .select(col("lang"),
        explode(call_function("graft_bigrams", lower(col("text")))).as("bg"))
      .groupBy(col("lang"), col("bg"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("lang"), col("bg"), col("cnt"), col("rn"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Word-bigram PMI over the corpus: ln(P(ab) / (P(a)P(b))), bigrams with
    * count ≥ 10, top-20. Counts are exact integers; only the final ln is
    * floating and it's r6-rounded on both engines. */
  /** Word-bigram instances (one row per adjacent pair occurrence).
    * Guard size >= 2: sequence(1, 0) would count DOWN through index 0 and
    * element_at(ws, 0) throws — a <2-token doc must yield no bigrams. */
  private def bigramInstances(toks: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val bigramArr = when(size(col("ws")) >= 2,
      transform(sequence(lit(1), size(col("ws")) - 1),
        i => struct(element_at(col("ws"), i).as("w1"),
          element_at(col("ws"), i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    toks.select(explode(bigramArr).as("b"))
      .select(col("b.w1"), col("b.w2"))
  }

  val bigramPmi: QFn = (s, dir) => {
    val docs = t(s, dir, "documents")
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
    val bigrams = bigramInstances(toks)
    val bi = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
    val nBi = bigrams.agg(count(lit(1)).as("n_bi"))
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val nUni = toks.select(explode(col("ws")).as("w"))
      .agg(count(lit(1)).as("n_uni"))
    bi.filter(col("c_ab") >= 10)
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_b")), "w2")
      .crossJoin(broadcast(nBi)).crossJoin(broadcast(nUni))
      .withColumn("pmi", r6(log(
        (col("c_ab") / col("n_bi")) /
          ((col("c_a") / col("n_uni")) * (col("c_b") / col("n_uni"))))))
      .select(col("w1"), col("w2"), col("c_ab"), col("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** Dunning log-likelihood-ratio collocations (r9, "Accurate Methods
    * for the Statistics of Surprise and Coincidence", CL 1993 — public)
    * — the collocation test corpora actually rank phrases with, because
    * unlike bigram_pmi's PMI it does not explode on rare pairs: LLR
    * weighs the full 2×2 contingency (bigram present/absent × first/
    * second slot), so high-count collocations dominate. Marginals are
    * the BIGRAM-slot counts (how often w1 opens / w2 closes a pair),
    * all exact BIGINTs from one instance table; each candidate's
    * 4-cell statistic is ONE mirrored double expression (the zero-cell
    * guard k·ln(k·N/RC) → 0 at k=0 is the standard convention), r6 on
    * both engines — the same ln-agreement contract bigram_pmi and
    * drift_psi already certify. Scale shape: three keyed aggregates
    * over the instance table + two marginal equi-joins; the 1-row
    * total-count aggregate rides an allowlisted broadcast; candidates
    * are pre-filtered to count ≥ 10 before any join. */
  val collocationLlr: QFn = (s, dir) => {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
    val bigrams = bigramInstances(toks)
    val bi = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_ab"))
    val rm = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("r_a"))
    val cm = bigrams.groupBy(col("w2")).agg(count(lit(1)).as("c_b"))
    val nBi = bigrams.agg(count(lit(1)).as("n_bi"))
    val n = col("n_bi")
    def term(k: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column,
        c: org.apache.spark.sql.Column) =
      when(k > 0,
        dbl(k) * log(dbl(k) * dbl(n) / (dbl(r) * dbl(c)))).otherwise(lit(0.0))
    val k11 = col("c_ab")
    val k12 = col("r_a") - col("c_ab")
    val k21 = col("c_b") - col("c_ab")
    val k22 = n - col("r_a") - col("c_b") + col("c_ab")
    bi.filter(col("c_ab") >= 10)
      .join(rm, "w1").join(cm, "w2")
      .crossJoin(broadcast(nBi))
      .withColumn("llr", r6(lit(2.0) *
        (term(k11, col("r_a"), col("c_b")) +
          term(k12, col("r_a"), n - col("c_b")) +
          term(k21, n - col("r_a"), col("c_b")) +
          term(k22, n - col("r_a"), n - col("c_b")))))
      .select(col("w1"), col("w2"), col("c_ab"), col("llr"))
      .orderBy(col("llr").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** Jensen-Shannon divergence per source vs the corpus (r9) — the
    * domain-shift score data-mixing work ranks sources by (symmetric,
    * bounded by ln 2 — unlike raw KL, finite even when a source is
    * missing words, which is exactly the case that breaks naive KL
    * monitoring). p = source token distribution, q = corpus, JSD =
    * Σ_w [½p·ln(p/m) + ½q·ln(q/m)], m = (p+q)/2. The spine is
    * sources × vocabulary (both domain-bounded dimensions — the
    * crossJoin is allowlisted) so absent words contribute their real
    * ½q·ln 2 mass; each per-word term is one mirrored double expression
    * over exact integer counts, pinned DECIMAL(14,10) (the drift_psi
    * device) so the per-source sum is order-free. One token-keyed
    * shuffle builds all three count tables; everything after runs on
    * vocabulary-sized aggregates. */
  val jsDivergence: QFn = (s, dir) => {
    val tok = t(s, dir, "documents")
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("w"))
    val sw = tok.groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c_sw"))
    val st = tok.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val cw = tok.groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val nAll = tok.agg(count(lit(1)).as("n_all"))
    st.crossJoin(cw)
      .join(sw, Seq("source", "w"), "left")
      .crossJoin(broadcast(nAll))
      .withColumn("p", dbl(coalesce(col("c_sw"), lit(0L))) / dbl(col("n_s")))
      .withColumn("q", dbl(col("c_w")) / dbl(col("n_all")))
      .withColumn("m", (col("p") + col("q")) / lit(2.0))
      .withColumn("term", dec(
        when(col("p") > 0, lit(0.5) * col("p") * log(col("p") / col("m")))
          .otherwise(lit(0.0)) +
          lit(0.5) * col("q") * log(col("q") / col("m")), 14, 10))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"),
        r6(dbl(sum(col("term")))).as("jsd"))
      .orderBy(col("source"))
  }

  /** Interpolated Kneser-Ney bigram probabilities (r9, Kneser & Ney
    * ICASSP'95 / Chen & Goodman 1998 — public) — the smoothing that
    * actually backs LM-based quality filters, upgrading lm_bigram_score's
    * add-k: mass freed by the absolute discount d = 0.75 (dyadic — the
    * subtraction is exact) is redistributed by CONTINUATION counts (how
    * many distinct contexts a word follows), the fix for add-k's
    * overestimate of frequent-but-context-bound words. Every ingredient
    * is an exact integer off the distinct-bigram table: c(w1w2), slot
    * count c(w1•), fan-out N1+(w1•), continuation N1+(•w2), type total T
    * — and p_KN = max(c−d,0)/c(w1•) + d·N1+(w1•)/c(w1•) · N1+(•w2)/T is
    * one mirrored double expression (no logs anywhere). Output: top-20
    * bigrams with MLE vs KN side by side — the discount's effect is the
    * graded value. Scale shape: three keyed aggregates over the instance
    * /pair tables, two marginal equi-joins, 1-row type-total broadcast
    * (allowlisted). */
  val knLmProb: QFn = (s, dir) => {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
    val bigrams = bigramInstances(toks)
    val bi = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_ab"))
    val rm = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("r_a"))
    val fol = bi.groupBy(col("w1")).agg(count(lit(1)).as("n_fol"))
    val prec = bi.groupBy(col("w2")).agg(count(lit(1)).as("n_prec"))
    val tt = bi.agg(count(lit(1)).as("t_types"))
    val pMle = dbl(col("c_ab")) / dbl(col("r_a"))
    val pKn = greatest(dbl(col("c_ab")) - lit(0.75), lit(0.0)) /
      dbl(col("r_a")) +
      lit(0.75) * dbl(col("n_fol")) / dbl(col("r_a")) *
        (dbl(col("n_prec")) / dbl(col("t_types")))
    bi.filter(col("c_ab") >= 10)
      .join(rm, "w1").join(fol, "w1").join(prec, "w2")
      .crossJoin(broadcast(tt))
      .select(col("w1"), col("w2"), col("c_ab"),
        r6(pMle).as("p_mle"), r6(pKn).as("p_kn"))
      .orderBy(col("c_ab").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** BPE-style pre-tokenizer counts (RE2-safe classes — no lookahead):
    * letter runs, digit runs, non-alnum runs, longest letter run. */
  val tokenBpe: QFn = (s, dir) => {
    val words = regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))
    val nums = regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))
    val punct = regexp_extract_all(lower(col("text")),
      lit("[^a-z0-9\\s]+"), lit(0))
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(words).cast("long").as("n_word"),
        size(nums).cast("long").as("n_num"),
        size(punct).cast("long").as("n_punct"),
        coalesce(array_max(transform(words, w => length(w))), lit(0))
          .cast("long").as("max_word_len"))
      .orderBy(col("doc_id"))
  }

  /** SimHash near-dup pairs (Manku et al., WWW'07): doc pairs within
    * hamming distance 1 of the 32-bit simhash. Candidates come from 2
    * bands of 16 bits — pigeonhole guarantees any pair with ≤ 1 differing
    * bit shares an identical band, so the band join is exhaustive for the
    * threshold; verification is one bit_count(xor) per candidate.
    * Band-collision volume measured at sf0.1: ~120 k candidates vs 12.5 M
    * all-pairs — and at scale it tracks signature-cluster sizes, not n². */
  val simhashNeardup: QFn = (s, dir) => {
    val sig = simhashSig(s, dir)
    val bands = sig.select(col("doc_id"), col("num"),
      explode(array(
        struct(lit(0).as("bi"), substring(col("sig"), 1, 16).as("bv")),
        struct(lit(1).as("bi"), substring(col("sig"), 17, 16).as("bv"))))
        .as("b"))
      .select(col("doc_id"), col("num"), col("b.bi"), col("b.bv"))
    bands.select(col("doc_id").as("a_id"), col("num").as("na"),
        col("bi"), col("bv"))
      .join(bands.select(col("doc_id").as("b_id"), col("num").as("nb"),
        col("bi"), col("bv")), Seq("bi", "bv"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("na"), col("nb")).distinct()
      .withColumn("hamming", expr("bit_count(na ^ nb)").cast("long"))
      .filter(col("hamming") <= 1)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Sliding-window document chunking (the training-data prep op): 20-token
    * chunks with 5-token overlap (stride 15). Chunk starts come from
    * sequence(1, n, stride); slice() truncates the tail chunk. Per-row
    * explode, no shuffle — embarrassingly parallel at any corpus size. */
  val docChunks: QFn = (s, dir) => {
    val C = 20
    val S = 15
    t(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"),
        // Guard: sequence(1, 0, 15) throws 'Illegal sequence boundaries';
        // a zero-token doc must yield no chunks (as the oracle's range does).
        explode(when(size(col("ws")) >= 1,
          sequence(lit(1), size(col("ws")), lit(S)))
          .otherwise(array().cast("array<int>"))).as("start"))
      .select(col("doc_id"),
        ((col("start") - 1) / S).cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("ws"), col("start"), lit(C)))
          .as("chunk_text"),
        least(size(col("ws")) - col("start") + 1, lit(C)).cast("long")
          .as("n_tok"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Typo-level near-duplicate word pairs (edit distance ≤ 1) across the
    * corpus vocabulary, via **deletion neighborhoods** (FastSS — Bocek et
    * al., 2007; the same trick as Norvig's spell corrector): every word
    * emits itself plus each single-character-deletion variant, and any two
    * words at Levenshtein ≤ 1 provably share a variant (substitution ⇒
    * both lose the substituted position; insert/delete ⇒ the shorter word
    * IS a variant of the longer). Candidates therefore come from an
    * equi-join on the variant string — no all-pairs levenshtein, which is
    * the naive O(|V|²) formulation — and the cheap exact check filters the
    * few lev-2 over-generations (two different deletions colliding).
    *
    * Scale shape: variant rows = Σ(len+1) ≈ avg_len·|V| — linear in
    * vocabulary size; the join keys are short strings (hashable 8-byte
    * shuffle keys after dictionary encoding). This is the sub-quadratic
    * dedup tier for typo-grade noise, complementing shingle/minhash
    * (document-level) and simhash (token-multiset-level) dedup. */
  val typoNeardupWords: QFn = (s, dir) => {
    def wordsOf(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(explode(regexp_extract_all(lower(col(c)),
        lit("[a-z]+"), lit(0))).as("word"))
    val words = wordsOf(t(s, dir, "documents"), "text")
      .union(wordsOf(t(s, dir, "part"), "p_name"))
      .filter(length(col("word")).between(3, 20))
      .distinct()
    val dels = transform(sequence(lit(1), length(col("word"))),
      i => concat(col("word").substr(lit(1), i - 1),
        col("word").substr(i + 1, length(col("word")))))
    val variants = words.select(col("word"),
      explode(array_distinct(array_insert(dels, lit(1), col("word"))))
        .as("variant"))
    variants.select(col("word").as("a_word"), col("variant"))
      .join(variants.select(col("word").as("b_word"), col("variant")),
        "variant")
      .filter(col("a_word") < col("b_word"))
      .select(col("a_word"), col("b_word")).distinct()
      .filter(levenshtein(col("a_word"), col("b_word")) <= 1)
      .select(col("a_word"), col("b_word"),
        levenshtein(col("a_word"), col("b_word")).cast("long").as("dist"))
      .orderBy(col("a_word"), col("b_word"))
  }

  /** Jaro-Winkler linkage pairs (r10) — the GRADED similarity tier of
    * the word-linkage family: typo_neardup_words answers "edit distance
    * ≤ 1?" (binary, deletion-neighborhood blocked); this key ranks
    * vocabulary pairs by the Winkler-boosted Jaro score via the native
    * codegen expression `graft_jaro_winkler` (expressions/JaroWinkler —
    * the record-linkage metric census bureaus actually run, prefix-
    * weighted because real-world name typos cluster at the tail).
    * Blocking is Winkler's own: same first character + length window ≤ 2
    * — candidates are Σ per-letter-block C(n,2), vocabulary-quadratic
    * within a block but corpus-independent (vocabulary saturates under
    * Heaps' law; at 100 TB the block key grows a second character /
    * phonetic code — recall-vs-volume knob, not a plan change). Scores
    * r6-round BEFORE the 0.92 threshold and the ranking, so the
    * cross-engine boundary is pinned on both sides. */
  val jwLinkage: QFn = (s, dir) => {
    graft.expressions.JaroWinkler.register(s)
    // canonicalize first (the standard linkage move: distinct names carry
    // their record counts, so similarity runs on the NAME domain — which
    // saturates — and record-pair multiplicity is recovered by product)
    val names = t(s, dir, "part")
      .select(lower(col("p_name")).as("nm"))
      .groupBy(col("nm")).agg(count(lit(1)).as("cnt"))
      .select(col("nm"), col("cnt"),
        substring(col("nm"), 1, 1).as("blk"), length(col("nm")).as("l"))
    names.select(col("nm").as("name_a"), col("cnt").as("ca"),
        col("blk"), col("l").as("la"))
      .join(names.select(col("nm").as("name_b"), col("cnt").as("cb"),
        col("blk"), col("l").as("lb")), "blk")
      .filter(col("name_a") < col("name_b") &&
        abs(col("la") - col("lb")) <= 3)
      .select(col("name_a"), col("name_b"),
        r6(call_function("graft_jaro_winkler", col("name_a"),
          col("name_b"))).as("jw"),
        (col("ca") * col("cb")).as("n_record_pairs"))
      .filter(col("jw") >= 0.8 && col("jw") < 1.0)
      .orderBy(col("jw").desc, col("name_a"), col("name_b"))
      .limit(20)
  }

  /** Entity resolution end-to-end (r10) — the full linkage pipeline
    * composed from graded parts: canonicalized part names → blocked
    * Jaro-Winkler candidate pairs (jw_linkage's stages, threshold 0.84)
    * → connected components by min-label propagation TO FIXPOINT (the
    * neardup_clusters device: labels only decrease, the lexicographic
    * min name is the cluster id, convergence detected by an unchanged
    * label multiset via an order-free count of self-labeled rows) →
    * SURVIVORSHIP: each cluster's golden record is the name with the
    * most underlying part records (count DESC, name ASC — the rule a
    * real MDM pipeline configures). Output: one row per multi-name
    * cluster (cluster id, member/record counts, survivor) — a wrong
    * threshold, broken propagation, or wrong survivorship rule all
    * change it. Scale shape: pair generation is the jw_linkage
    * name-domain join; propagation shuffles the NAME graph (vocabulary-
    * bounded); survivorship is one window over cluster keys. */
  val entityDedupE2e: QFn = (s, dir) => {
    graft.expressions.JaroWinkler.register(s)
    val names = t(s, dir, "part")
      .select(lower(col("p_name")).as("nm"))
      .groupBy(col("nm")).agg(count(lit(1)).as("cnt"))
      .select(col("nm"), col("cnt"),
        substring(col("nm"), 1, 1).as("blk"), length(col("nm")).as("l"))
      .ckpt()
    val pairs = names.select(col("nm").as("a"), col("blk"),
        col("l").as("la"))
      .join(names.select(col("nm").as("b"), col("blk"),
        col("l").as("lb")), "blk")
      .filter(col("a") < col("b") && abs(col("la") - col("lb")) <= 3)
      .filter(r6(call_function("graft_jaro_winkler", col("a"), col("b")))
        >= 0.84)
      .select(col("a"), col("b"))
    val adj = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .persist()
    // String labels rule out neardup_clusters' label-sum convergence
    // metric; instead each round OBSERVES the count of rows whose label
    // strictly decreases (labels are monotone non-increasing, so 0
    // changed rows IS the fixpoint — provable, no hashing). The metric
    // rides the same job that materializes the round's checkpoint.
    var labels = adj.groupBy(col("src")).agg(min(col("dst")).as("mn"))
      .select(col("src").as("id"), least(col("src"), col("mn"))
        .as("lbl"))
      .ckpt()
    var converged = false
    var round = 1
    while (!converged) {
      val nbr = adj
        .join(labels.select(col("id").as("dst"), col("lbl").as("dlbl")),
          "dst")
        .groupBy(col("src")).agg(min(col("dlbl")).as("nlbl"))
      val obs = org.apache.spark.sql.Observation(s"er_changed_r$round")
      val next = labels
        .join(nbr.select(col("src").as("id"), col("nlbl")),
          Seq("id"), "left")
        .observe(obs, sum(when(col("nlbl") < col("lbl"), 1L)
          .otherwise(0L)).as("chg"))
        .select(col("id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .ckpt()
      converged = obs.get("chg").asInstanceOf[Long] == 0L
      labels = next
      round += 1
    }
    adj.unpersist()
    val wSurv = Window.partitionBy(col("lbl"))
      .orderBy(col("cnt").desc, col("id"))
    labels.join(names.select(col("nm").as("id"), col("cnt")), "id")
      .withColumn("srn", row_number().over(wSurv))
      .groupBy(col("lbl"))
      .agg(count(lit(1)).as("n_names"),
        sum(col("cnt")).as("n_records"),
        max(when(col("srn") === 1, col("id"))).as("survivor"))
      .filter(col("n_names") >= 2)
      .select(col("lbl").as("cluster_id"), col("n_names"),
        col("n_records"), col("survivor"))
      .orderBy(col("cluster_id"))
  }

  /** BPE merge TRAINING (r10, Sennrich et al. ACL'16 — the public
    * byte-pair-encoding algorithm every modern tokenizer descends from)
    * — token_bpe APPLIES a fixed segmentation; this key LEARNS the
    * merge table, distributed: 6 greedy merge rounds over the word-type
    * count table (the Sennrich formulation — pair statistics weight by
    * word frequency, so the corpus-sized work is ONE word count and
    * every round runs on the VOCABULARY domain, which saturates under
    * Heaps' law; this is exactly why BPE training scales to 100 TB).
    *
    * Each round, relationally: (1) adjacent symbol pairs from each
    * word's symbol array, weighted by word count; (2) the argmax pair
    * (weight DESC, pair ASC) as a 1-row broadcast; (3) GREEDY
    * LEFT-TO-RIGHT merge application — the sequential-looking step made
    * relational with the gaps-and-islands device: runs of consecutive
    * matching positions keep alternating members from the run start
    * ((pos − run_start) % 2 == 0), which reproduces greedy scanning
    * exactly (the "aaa" + (a,a) case merges positions 1-2 and leaves 3);
    * (4) rebuild arrays by dropping consumed right-halves and
    * re-collecting in position order. The graded output is the learned
    * MERGE TABLE trajectory (round, left, right, merged, weight) — a
    * wrong tie-break, overlap rule, or weight model cannot reproduce it.
    * All counts exact BIGINTs; no floats anywhere. */
  /** Training-entry counters (spec hooks): RegistrySpec pins that a
    * SECOND session re-LOADS the persisted registry artifacts without
    * re-entering either trainer. */
  private[graft] val bpeTrainRuns = new java.util.concurrent.atomic.AtomicInteger
  private[graft] val unigramTrainRuns = new java.util.concurrent.atomic.AtomicInteger

  val bpeTrainMerges: QFn = (s, dir) => {
    bpeTrainRuns.incrementAndGet()
    val chars = transform(sequence(lit(1), length(col("word"))),
      i => col("word").substr(i, lit(1)))
    var vocab = t(s, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"), chars.as("syms"))
      .ckpt()
    val wPos = Window.partitionBy(col("word")).orderBy(col("pos"))
    var merges: org.apache.spark.sql.DataFrame = null
    for (round <- 1 to 6) {
      val ex = vocab
        .select(col("word"), col("cnt"),
          posexplode(col("syms")).as(Seq("pos", "sym")))
        .withColumn("nxt", lead(col("sym"), 1).over(wPos))
      val top = ex.filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("pa"), col("nxt").as("pb"))
        .agg(sum(col("cnt")).as("weight"))
        .orderBy(col("weight").desc, col("pa"), col("pb"))
        .limit(1)
      val m = top.select(lit(round.toLong).as("round"),
        col("pa").as("left_sym"), col("pb").as("right_sym"),
        concat(col("pa"), col("pb")).as("merged"), col("weight"))
      merges = if (merges == null) m else merges.unionByName(m)
      // greedy application: islands of consecutive matching positions,
      // computed entirely with windows over the (word, pos) order (r15 —
      // replaces the r10 shape that materialized the kept-position set
      // and joined it back TWICE per round: positions from posexplode
      // are contiguous, so "my left neighbor merged" is lag(ismerge),
      // and the alternating-run rule is a running hit-count away; every
      // window shares the one per-word sort the `lead` already paid, so
      // each round is ONE exchange + ONE eager checkpoint instead of
      // two checkpoints and two join shuffles)
      val flagged = ex.crossJoin(broadcast(top))
        .withColumn("hit", col("sym") === col("pa")
          && col("nxt") === col("pb"))
      val wCum = Window.partitionBy(col("word")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wRun = Window.partitionBy(col("word"), col("grp"))
      vocab = flagged
        .withColumn("hs", sum(when(col("hit"), 1L).otherwise(0L))
          .over(wCum))
        .withColumn("grp", when(col("hit"), col("pos") - col("hs")))
        .withColumn("start",
          when(col("hit"), min(when(col("hit"), col("pos"))).over(wRun)))
        .withColumn("ismerge",
          col("hit") && (col("pos") - col("start")) % 2 === 0)
        .withColumn("consumed",
          coalesce(lag(col("ismerge"), 1).over(wPos), lit(false)))
        .filter(!col("consumed")) // drop consumed right halves
        .select(col("word"), col("cnt"), col("pos"),
          when(col("ismerge"), concat(col("sym"), col("nxt")))
            .otherwise(col("sym")).as("sym"))
        .groupBy(col("word"), col("cnt"))
        .agg(transform(sort_array(collect_list(struct(col("pos"),
          col("sym")))), x => x.getField("sym")).as("syms"))
        .ckpt()
    }
    merges.orderBy(col("round"))
  }

  /** The trained BPE merge table APPLIED from scratch (r11) — the encode
    * half of the tokenizer: `bpe_train_merges` learns the table; this
    * helper re-segments the word-TYPE vocabulary by applying each merge
    * in priority order with the training-time islands device, and every
    * consumer (per-doc token counts, token-budgeted packing) joins its
    * word instances against the result. The 6-row merge table is the
    * trained ARTIFACT: collecting it to the driver is the bounded O(1)
    * read the iterative family already uses for convergence metrics —
    * the corpus never moves. Apply-equals-train is the PINNED property:
    * training applies merge k to vocab_{k-1} as it learns (Sennrich
    * ACL'16), so encoding the training corpus under the trained table
    * must reproduce training's final vocabulary exactly — the oracle
    * grades the apply output against the training chain's vocab6, which
    * a wrong priority order, overlap rule, or tie-break cannot match.
    *
    * Per-merge cost is cut by a substring prefilter: a word's syms
    * concatenate to the word itself, so adjacent syms (l, r) imply the
    * word CONTAINS l||r — words without the substring skip the
    * explode+window rebuild entirely (the dominant fraction). The whole
    * apply phase runs on the vocabulary domain, which saturates under
    * Heaps' law — corpus-independent at 100 TB; the corpus-sized work is
    * the one word count in training plus the instance joins downstream. */
  private val bpeSegCache =
    graft.Tables.sessionScopedCache[String, DataFrame]()

  /** Session-scoped standing artifact: the tokenizer (trained merges +
    * applied segmentation) is built ONCE per (session, fixture dir) and
    * every consumer key reuses the checkpointed result — the operational
    * shape of a real tokenizer, which is trained once and then applied by
    * every downstream job, and the same per-JVM staging amortization
    * lateInbox / bucketed_join already use. */
  private def bpeApplied(s: SparkSession, dir: String): DataFrame =
    bpeSegCache.getOrElseUpdate((graft.Tables.sessionKey(s), dir),
      bpeAppliedBuild(s, dir))

  /** Registry-backed BPE merge table (r13): trained once per (JVM, dir),
    * persisted to parquet, re-read by every later session — a pipeline
    * restart re-LOADS the tokenizer instead of retraining it. */
  private[graft] def registryBpeMerges(s: SparkSession, dir: String)
      : DataFrame =
    core.persistedArtifact(s, dir, "bpe_merges")(bpeTrainMerges(s, dir))

  /** Registry-backed unigram pieces (the FINAL round-2 re-estimate). */
  private[graft] def registryUnigramPieces(s: SparkSession, dir: String)
      : DataFrame =
    core.persistedArtifact(s, dir, "unigram_pieces")(
      unigramArtifact(s, dir)._2)

  private def bpeAppliedBuild(s: SparkSession, dir: String): DataFrame = {
    val merges = registryBpeMerges(s, dir)
      .select(col("round"), col("left_sym"), col("right_sym"))
      .collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2)))
    val chars = transform(sequence(lit(1), length(col("word"))),
      i => col("word").substr(i, lit(1)))
    var vocab = t(s, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .distinct()
      .select(col("word"), chars.as("syms"))
      .ckpt()
    val wPos = Window.partitionBy(col("word")).orderBy(col("pos"))
    withShuffleParts(s, 8) { for ((l, r) <- merges) {
      val touched = vocab.filter(col("word").contains(l + r))
      val untouched = vocab.filter(!col("word").contains(l + r))
      val ex = touched
        .select(col("word"), posexplode(col("syms")).as(Seq("pos", "sym")))
        .withColumn("nxt", lead(col("sym"), 1).over(wPos))
        .withColumn("hit", col("sym") === lit(l) && col("nxt") === lit(r))
      // windows-only greedy application (r16 — the trainer's r15 rewrite
      // ported here, verdict task #2): positions from posexplode are
      // contiguous, so the kept-position set never needs materializing —
      // the island group is `pos − cumulative hit-count` (constant along
      // a run of consecutive hits, ≡ the old pos − row_number over the
      // filtered hits), the alternating-run rule keeps (pos − run start)
      // even, and "my left neighbor merged" is lag(ismerge). Every
      // window shares the one per-word sort `lead` already pays, so each
      // merge round is ONE exchange + ONE eager checkpoint instead of
      // the old kept-position checkpoint + two join shuffles.
      val wCum = Window.partitionBy(col("word")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wRun = Window.partitionBy(col("word"), col("grp"))
      val rebuilt = ex
        .withColumn("hs", sum(when(col("hit"), 1L).otherwise(0L))
          .over(wCum))
        .withColumn("grp", when(col("hit"), col("pos") - col("hs")))
        .withColumn("start",
          when(col("hit"), min(when(col("hit"), col("pos"))).over(wRun)))
        .withColumn("ismerge",
          col("hit") && (col("pos") - col("start")) % 2 === 0)
        .withColumn("consumed",
          coalesce(lag(col("ismerge"), 1).over(wPos), lit(false)))
        .filter(!col("consumed")) // drop consumed right halves
        .select(col("word"), col("pos"),
          when(col("ismerge"), concat(col("sym"), col("nxt")))
            .otherwise(col("sym")).as("sym"))
        .groupBy(col("word"))
        .agg(transform(sort_array(collect_list(struct(col("pos"),
          col("sym")))), x => x.getField("sym")).as("syms"))
      vocab = rebuilt.unionByName(untouched).ckpt()
    } }
    vocab
  }

  /** BPE tokenization of the corpus under the trained merge table (r11)
    * — the most-executed operator of a real pretraining pipeline
    * (every document is encoded before packing/training), graded as the
    * per-language encode manifest: word/token/merged-token volumes plus
    * the most frequent multi-character token (count DESC, token ASC tie
    * rule). Every number is an exact BIGINT over the full corpus —
    * a single mis-applied merge anywhere shifts n_tokens/n_merged and
    * breaks the hash. Scale shape: the apply phase is vocabulary-domain
    * (bpeApplied); corpus-sized work is one (lang, word) instance count
    * joined against the segmentation — wordcount-shaped, one shuffle. */
  val tokenBpeApply: QFn = (s, dir) => {
    val seg = bpeApplied(s, dir)
    val wc = t(s, dir, "documents")
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("wn"))
    // (lang, word-type) × segmentation — reused by the totals and the
    // top-token branch; vocabulary-sized, so pinning it is free.
    val wv = wc.join(seg, "word").ckpt()
    val stats = wv.groupBy(col("lang"))
      .agg(sum(col("wn")).as("n_words"),
        sum(col("wn") * size(col("syms"))).as("n_tokens"),
        sum(col("wn") * size(filter(col("syms"), y => length(y) >= 2)))
          .as("n_merged"))
    val wTop = Window.partitionBy(col("lang"))
      .orderBy(col("tn").desc, col("tok"))
    val top = wv.select(col("lang"), col("wn"), explode(col("syms")).as("tok"))
      .filter(length(col("tok")) >= 2)
      .groupBy(col("lang"), col("tok")).agg(sum(col("wn")).as("tn"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") === 1)
      .select(col("lang"), col("tok"), col("tn"))
    t(s, dir, "documents").groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .join(stats, Seq("lang"), "left")
      .join(top, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_merged"), lit(0L)).as("n_merged"),
        coalesce(col("tok"), lit("")).as("top_merged"),
        coalesce(col("tn"), lit(0L)).as("top_merged_n"))
      .orderBy(col("lang"))
  }

  /** TOKEN-budgeted sequence packing (r11) — pack_sequences with the real
    * currency: bins are 512 BPE TOKENS under the trained merge table
    * (pack_sequences' char-proxy bins mis-size the moment merges shorten
    * dense words unevenly). Composition is the full text→training-batches
    * path: train (bpe_train_merges) → encode (bpeApplied) → per-doc token
    * counts → the same one-prefix-sum-window-per-lang-shard packing
    * device, emitting the per-bin manifest. Docs with no tokens pack at
    * zero width (left join + coalesce), exactly like the char version
    * counts them as 0-token docs. Scale shape unchanged from
    * pack_sequences: packing parallelizes across lang shards, the only
    * additions are the vocabulary-domain segmentation join and one
    * doc-keyed count — no new corpus-scale shuffle class. */
  val packTokensBpe: QFn = (s, dir) => {
    val seg = bpeApplied(s, dir)
    val dtok = t(s, dir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      .join(seg, "word")
      .groupBy(col("doc_id"))
      .agg(sum(size(col("syms")).cast("long")).as("tok"))
    val maxId = graft.Tables.statsMaxLong(s, dir, "documents", "doc_id")
    val base = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      .join(dtok, Seq("doc_id"), "left")
      .withColumn("tok", coalesce(col("tok"), lit(0L)))
    core.bucketedPrefixSum(base, Seq("lang"),
      core.idBucket(col("doc_id"), maxId), Seq(col("doc_id")),
      col("tok"), "cum")
      .withColumn("bin", expr("(cum - tok) div 512"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("sum_tok"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("bin"))
  }

  /** The tokenized training corpus MATERIALIZED (r11) — the artifact a
    * pretraining run actually reads: every document's ordered BPE token
    * sequence under the trained merge table, written to parquet and
    * RE-READ (the sink roundtrip is part of the graded path, like the
    * formats keys). Order reconstruction is fully relational: word
    * position × within-word symbol position sort the collected tokens,
    * so the sequence survives any shuffle. Token-less docs materialize
    * as empty sequences (they are rows in the training manifest, not
    * dropped). Graded per lang on exact token volume AND an
    * ORDER-SENSITIVE content fingerprint (md5 of the space-joined
    * re-read sequence — min/max/distinct-count per lang): a dropped
    * doc, reordered token, or lossy roundtrip cannot match it.
    * Scale shape: two corpus-linear explodes + one doc-keyed rebuild +
    * a doc-partitioned write — the exact shape of a production
    * tokenize-and-shard job; the vocabulary join is the broadcast
    * segmentation artifact (built once per session). */
  val tokenizeCorpusSink: QFn = (s, dir) => {
    val seg = bpeApplied(s, dir)
    val out = scratch(dir, "bpe_corpus")
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("wpos", "word")))
      .join(seg, "word")
      .select(col("doc_id"), col("wpos"),
        posexplode(col("syms")).as(Seq("spos", "tok")))
      .groupBy(col("doc_id"))
      .agg(transform(sort_array(collect_list(struct(col("wpos"),
        col("spos"), col("tok")))), x => x.getField("tok")).as("toks"))
      .join(t(s, dir, "documents").select(col("doc_id"), col("lang")),
        Seq("doc_id"), "right")
      .withColumn("toks",
        coalesce(col("toks"), array().cast("array<string>")))
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out)
      .select(col("lang"), size(col("toks")).cast("long").as("ntok"),
        md5(concat_ws(" ", col("toks"))).as("fp"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"),
        countDistinct(col("fp")).as("n_distinct_docs"),
        min(col("fp")).as("fp_min"), max(col("fp")).as("fp_max"))
      .orderBy(col("lang"))
  }

  /** Shannon entropy (nats) of each language's token distribution — the
    * standard corpus-diversity / degenerate-text signal next to
    * quality_score (a collapsed crawl segment shows entropy ≈ 0).
    *
    * Determinism: −p·ln(p) is double math on identical inputs (p is a
    * LONG/LONG division, identical both engines), but libm `log` is only
    * guaranteed within 1 ulp on each engine, so each term is pinned to
    * DECIMAL(14,10) (identical HALF_UP of doubles that agree to ≥10⁻¹⁶)
    * and the per-language sum runs exact — the summation order can't
    * reorder float error because there is none left to reorder. */
  val tokenEntropy: QFn = (s, dir) => {
    val counts = t(s, dir, "documents")
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("c"))
    val tot = counts.groupBy(col("lang")).agg(sum(col("c")).as("tot"))
    val p = col("c") / col("tot")
    counts.join(tot, "lang")
      .select(col("lang"), dec(-p * log(p), 14, 10).as("term"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"), r6(dbl(sum(col("term")))).as("entropy_nats"))
      .orderBy(col("lang"))
  }

  /** Skip-gram co-occurrence pairs (r5) — the word2vec/GloVe training-pair
    * extraction step: every ordered token pair within a forward window of
    * 2, counted corpus-wide, top 20. Bigram_pmi covers distance 1 only;
    * embedding training needs the wider context window.
    *
    * Scale shape: the window expansion is TWO chained index-sequence
    * explodes over the materialized token array (positions i, then
    * distances d ≤ min(2, n−1−i)) with element_at projections — linear in
    * tokens × window, codegen'd end-to-end, no self-join on doc_id (which
    * would be O(len²) per doc) and no interpreted HOF (the 35× trap
    * §7.3 documents). One shuffle for the global count; the top-20 fuses
    * to TakeOrderedAndProject. */
  val skipgramPairs: QFn = (s, dir) => {
    val ws = col("ws")
    t(s, dir, "documents")
      .select(TextOps.tokens(col("text")).as("ws"))
      .select(ws, explode(when(size(ws) >= 2, sequence(lit(0), size(ws) - 2))
        .otherwise(array().cast("array<int>"))).as("i"))
      .select(ws, col("i"),
        explode(sequence(lit(1), least(lit(2), size(ws) - 1 - col("i"))))
          .as("d"))
      .select(concat_ws(" ", element_at(ws, col("i") + 1),
        element_at(ws, col("i") + 1 + col("d"))).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(20)
  }

  /** sgns_step geometry, shared with the oracle generator: embedding
    * dimension and the gradient-descent step on the MEAN loss (mean, not
    * sum, so the step stays corpus-size-invariant — the full-batch
    * normalization that keeps one η valid at every sf). */
  val SgnsDim = 4
  val SgnsEta = 0.5

  /** One deterministic FULL-BATCH SGNS gradient step (r14, verdict #5) —
    * skip-gram with negative sampling (Mikolov et al. 2013),
    * derandomized end to end so the whole train step carries a DuckDB
    * oracle (the logistic_irls / unigram_lm_train precedent for graded
    * training trajectories):
    *   - pairs: the skipgram_pairs extraction (forward window 2), kept
    *     as (w, c, cnt) pair TYPES — the full-batch view;
    *   - init: u⁰_w[j], v⁰_c[j] from a 16-bit md5 hash of (tag, j, word)
    *     mapped into (−0.1, 0.1) — both engines hold identical weights;
    *   - negatives (r15, r14-verdict #5 — word2vec's actual noise
    *     distribution, derandomized): contexts fill a 16384-slot table
    *     proportionally to weight = ⌊ccnt^(3/4)⌋ (computed as nested
    *     IEEE sqrt of the exact integer cube, so both engines hold
    *     identical weights — the unigram^0.75 shape of Mikolov et al.),
    *     slots assigned in (ccnt DESC, c) rank order by exact integer
    *     interval arithmetic (the word2vec table-fill); each pair draws
    *     K=SgnsNegK negatives at slots md5(w|c|t) mod 16384 — per-pair,
    *     frequency-proportional, and replayable verbatim in SQL;
    *   - forward: x = u·v as a FIXED-ORDER 4-term sum (bit-identical
    *     IEEE both engines); σ via one exp each, pinned DECIMAL(14,10)
    *     per loss/gradient term, exact sums;
    *   - step: θ¹ = r6(θ⁰ − η·∇mean-loss) — r6 so both engines hold
    *     identical post-step weights, then the loss is RE-EVALUATED
    *     under θ¹. Output = the trajectory rows (per-round mean loss
    *     over the (1+K)·Σcnt forward terms), loss strictly improving
    *     (gated in OperatorSpec, like the unigram NLL gate).
    * Scale shape: one corpus-scan pair extraction shuffle; everything
    * after runs on the (w, c) pair-type domain (vocabulary-bounded,
    * Heaps-saturating): the slot table is 16384 rows (broadcast), the
    * cumulative fill is one window over the context VOCAB aggregate
    * (Heaps-bounded, never corpus-sized), gradients are keyed
    * aggregates over pos ∪ neg term frames, updates are vocab-domain
    * joins. The 1-row loss/stat aggregates cross into the trajectory
    * rows (the gbm_round report shape). */
  /** Rounds for the sgns_train trajectory (sgns_step = the same
    * pipeline at 1 round). */
  val SgnsTrainRounds = 3

  /** Negatives per pair and the word2vec-style noise slot-table size —
    * shared with the oracle generator. */
  val SgnsNegK = 2
  val SgnsNegTable = 16384L

  val sgnsStep: QFn = (s, dir) => sgnsPipeline(s, dir, 1)

  /** Multi-round full-batch SGNS training (r14) — the TRAJECTORY key
    * over sgns_step's unit operator (the unigram_lm_train/gbm_tree_round
    * shape: one graded row per round, loss strictly improving): 3
    * gradient steps, each re-scoring under the previous step's
    * r6-rounded weights. Same oracle machinery, unrolled per round. */
  val sgnsTrain: QFn = (s, dir) => sgnsPipeline(s, dir, SgnsTrainRounds)

  private def sgnsPipeline(s: SparkSession, dir: String,
      rounds: Int): DataFrame = {
    val ws = col("ws")
    val pc = t(s, dir, "documents")
      .select(TextOps.tokens(col("text")).as("ws"))
      .select(ws, explode(when(size(ws) >= 2, sequence(lit(0), size(ws) - 2))
        .otherwise(array().cast("array<int>"))).as("i"))
      .select(ws, col("i"),
        explode(sequence(lit(1), least(lit(2), size(ws) - 1 - col("i"))))
          .as("d"))
      .select(element_at(ws, col("i") + 1).as("w"),
        element_at(ws, col("i") + 1 + col("d")).as("c"))
      .groupBy(col("w"), col("c")).agg(count(lit(1)).as("cnt"))
      .ckpt()
    // size() guards: element_at past the end THROWS under ANSI, and a
    // pair-less degenerate corpus (all docs < 2 tokens) yields an empty
    // context list — the key must return its NULL-loss trajectory, not
    // crash (the repo's degenerate-corpus convention; EdgeCorpusSpec)
    //
    // ---- word2vec noise table (r15): contexts own slot intervals
    // proportional to ⌊ccnt^(3/4)⌋, in (ccnt DESC, c) rank order. All
    // interval arithmetic is exact BIGINT; the ^(3/4) is nested IEEE
    // sqrt of the exact cube (correctly rounded on both engines). The
    // window runs over the context-VOCAB aggregate — Heaps-saturating,
    // never corpus-sized — and the materialized table is exactly
    // SgnsNegTable rows, broadcast to the draw join.
    val wtab = pc.groupBy(col("c")).agg(sum(col("cnt")).cast("long")
        .as("ccnt"))
      .withColumn("wt", floor(sqrt(sqrt(dbl(
        col("ccnt") * col("ccnt") * col("ccnt"))))).cast("long"))
    val wWin = Window.orderBy(col("ccnt").desc, col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val slots = wtab
      .withColumn("cum", coalesce(sum(col("wt")).over(wWin), lit(0L)))
      .crossJoin(broadcast(wtab.agg(sum(col("wt")).as("twt"))))
      .select(col("c").as("nc"),
        expr(s"($SgnsNegTable * cum) div twt").as("lo"),
        expr(s"($SgnsNegTable * (cum + wt)) div twt").as("hi"))
      .filter(col("hi") > col("lo"))
      .select(col("nc"),
        explode(sequence(col("lo"), col("hi") - 1)).as("slot"))
      .ckpt()
    // per-pair draws: K slots at md5(w|c|t) mod T — the derandomized
    // frequency-proportional sample, constant across rounds (full-batch
    // SGD re-uses its noise sample; the per-round resample of SGD
    // proper would just be t ⊕ round in the hash)
    val negs = pc.select(col("w"), col("c"), col("cnt"),
        explode(array((1 to SgnsNegK).map(lit(_)): _*)).as("t"))
      .withColumn("slot",
        conv(substring(md5(concat(col("w"), lit("|"), col("c"), lit("|"),
          col("t"))), 1, 12), 16, 10).cast("long") % lit(SgnsNegTable))
      .join(broadcast(slots), "slot")
      .select(col("w"), col("c"), col("cnt"), col("t"), col("nc"))
      .ckpt()
    def init(tag: String, j: Int, word: org.apache.spark.sql.Column)
        : org.apache.spark.sql.Column =
      (conv(substring(md5(concat(lit(s"$tag|$j|"), word)), 1, 4), 16, 10)
        .cast("long").cast("double") - lit(32768.0)) / lit(327680.0)
    val dims = 1 to SgnsDim
    val u0 = pc.select(col("w")).distinct()
      .select(col("w") +: dims.map(j => init("u", j, col("w")).as(s"u$j")): _*)
    val v0 = pc.select(col("c")).distinct()
      .select(col("c") +: dims.map(j => init("v", j, col("c")).as(s"v$j")): _*)
    def nvOf(v: org.apache.spark.sql.DataFrame) =
      v.select(col("c").as("nc") +: dims.map(j =>
        col(s"v$j").as(s"nv$j")): _*)
    // scored frames: positive pairs and negative draws, each with its
    // forward pass + sigmoids, checkpointed — they feed the loss
    // aggregate AND both gradient aggregates
    def posScore(u: org.apache.spark.sql.DataFrame,
        v: org.apache.spark.sql.DataFrame) =
      pc.join(u, "w").join(v, "c")
        .withColumn("xp",
          dims.map(j => col(s"u$j") * col(s"v$j")).reduce(_ + _))
        .withColumn("sp", lit(1.0) / (lit(1.0) + exp(-col("xp"))))
    def negScore(u: org.apache.spark.sql.DataFrame,
        v: org.apache.spark.sql.DataFrame) =
      negs.join(u, "w").join(nvOf(v), "nc")
        .withColumn("xn",
          dims.map(j => col(s"u$j") * col(s"nv$j")).reduce(_ + _))
        .withColumn("sn", lit(1.0) / (lit(1.0) + exp(-col("xn"))))
        .withColumn("snm", lit(1.0) / (lit(1.0) + exp(col("xn"))))
    val cntD = dec(col("cnt"), 10, 0)
    // sums are exact decimals; rounded to the output grain (6) BEFORE the
    // double cast so the decimal→double conversion stays inside 2^53
    // units at bench scale (the moneySum round-then-cast device)
    def lossSum(pos: org.apache.spark.sql.DataFrame,
        neg: org.apache.spark.sql.DataFrame) =
      pos.select((dec(-log(col("sp")), 14, 10) * cntD).as("lt"))
        .unionByName(
          neg.select((dec(-log(col("snm")), 14, 10) * cntD).as("lt")))
        .agg(round(sum(col("lt")), 6).as("ls"))
    val nRow = pc.agg((sum(col("cnt")) * (1 + SgnsNegK)).cast("long")
      .as("nn"))
    val gAggs = dims.map(j => sum(col(s"t$j") * col("cd")).as(s"g$j"))
    // ∂L/∂u_w: (sp−1)·v over positives + sn·nv over each negative draw;
    // ∂L/∂v_c: (sp−1)·u at c plus sn·u at each drawn nc — both as one
    // keyed aggregate over a pos ∪ neg term frame (exact decimal terms)
    def gradU(pos: org.apache.spark.sql.DataFrame,
        neg: org.apache.spark.sql.DataFrame) =
      pos.select(col("w").as("key") +: Seq(cntD.as("cd")) ++:
          dims.map(j => dec((col("sp") - 1) * col(s"v$j"), 14, 10)
            .as(s"t$j")): _*)
        .unionByName(neg.select(col("w").as("key") +: Seq(cntD.as("cd")) ++:
          dims.map(j => dec(col("sn") * col(s"nv$j"), 14, 10)
            .as(s"t$j")): _*))
        .groupBy(col("key")).agg(gAggs.head, gAggs.tail: _*)
    def gradV(pos: org.apache.spark.sql.DataFrame,
        neg: org.apache.spark.sql.DataFrame) =
      pos.select(col("c").as("key") +: Seq(cntD.as("cd")) ++:
          dims.map(j => dec((col("sp") - 1) * col(s"u$j"), 14, 10)
            .as(s"t$j")): _*)
        .unionByName(neg.select(col("nc").as("key") +: Seq(cntD.as("cd")) ++:
          dims.map(j => dec(col("sn") * col(s"u$j"), 14, 10)
            .as(s"t$j")): _*))
        .groupBy(col("key")).agg(gAggs.head, gAggs.tail: _*)
    def stepTab(tab: org.apache.spark.sql.DataFrame, key: String,
        pref: String, grads: org.apache.spark.sql.DataFrame,
        gkey: String) =
      tab.join(grads.withColumnRenamed(gkey, key), Seq(key), "left")
        .crossJoin(broadcast(nRow))
        .select(col(key) +: dims.map(j =>
          r6(col(s"$pref$j") - lit(SgnsEta) *
            coalesce(dbl(round(col(s"g$j"), 6)), lit(0.0)) / dbl(col("nn")))
            .as(s"$pref$j")): _*)
        .ckpt()
    val stats = pc.agg(sum(col("cnt")).cast("long").as("n_pairs"),
      countDistinct(col("w")).as("n_words"),
      countDistinct(col("c")).as("n_ctx"))
    def row(r: Int, ls: org.apache.spark.sql.DataFrame) =
      ls.crossJoin(broadcast(stats)).crossJoin(broadcast(nRow))
        .select(lit(r.toLong).as("round"), col("n_pairs"), col("n_words"),
          col("n_ctx"), r6(dbl(col("ls")) / col("nn")).as("loss"))
    // the train loop: each round re-scores under the previous round's
    // r6-rounded weights; scored frames checkpoint (they feed both
    // gradient aggregates and the next round's plan would otherwise
    // double per round — the hnsw/unigram lesson). Everything after the
    // pair extraction lives on the pair-type/vocab domain, so the loop's
    // ~15 micro-shuffles run at the reduced setting and the trajectory
    // eager-checkpoints inside (the unigram per-stage decision).
    val res = core.withShuffleParts(s, 8) {
      var u = u0
      var v = v0
      var pos = posScore(u, v).ckpt()
      var neg = negScore(u, v).ckpt()
      var out = row(0, lossSum(pos, neg))
      for (r <- 1 to rounds) {
        val (guR, gvR) = (gradU(pos, neg), gradV(pos, neg))
        u = stepTab(u, "w", "u", guR, "key")
        v = stepTab(v, "c", "v", gvR, "key")
        pos = posScore(u, v).ckpt()
        neg = negScore(u, v).ckpt()
        out = out.unionByName(row(r, lossSum(pos, neg)))
      }
      out.ckpt()
    }
    res.orderBy(col("round"))
  }

  /** Within-doc repetition audit (r5) — the Gopher/MassiveText repetition
    * filter family (Rae et al. 2021 §A.1.1): a doc whose word 3-grams
    * repeat internally is boilerplate/spam-shaped, and the statistic is
    * the duplicate-gram fraction 1 − distinct/total. Output is the
    * per-(lang, source) audit manifest: docs measured, docs with ANY
    * internal repeat, worst duplicate count, mean duplicate fraction.
    *
    * Scale shape: one index-sequence explode (linear in tokens), then a
    * per-doc count/count-distinct pair — Spark plans the distinct via
    * Expand + partial agg keyed on (doc_id, gram), so dedup happens
    * map-side before the doc_id shuffle; the final (lang, source) rollup
    * moves one row per doc. Docs under 3 tokens have no 3-gram and are
    * out of scope on both engines by the same predicate. */
  val repNgramAudit: QFn = (s, dir) => {
    val ws = col("ws")
    val grams = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        TextOps.tokens(col("text")).as("ws"))
      .select(col("doc_id"), col("lang"), col("source"), ws,
        explode(when(size(ws) >= 3, sequence(lit(0), size(ws) - 3))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"), col("lang"), col("source"),
        concat_ws(" ", element_at(ws, col("i") + 1),
          element_at(ws, col("i") + 2), element_at(ws, col("i") + 3))
          .as("g"))
    grams.groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(count(lit(1)).as("n_grams"),
        countDistinct(col("g")).as("n_uniq"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_grams") > col("n_uniq"), 1L).otherwise(0L))
          .as("n_rep_docs"),
        max(col("n_grams") - col("n_uniq")).as("max_dup"),
        // exact integer sums; ONE double division per output row keeps
        // the fraction bit-identical cross-engine (a mean of per-doc
        // double fractions would be summation-order-dependent)
        sum(col("n_grams") - col("n_uniq")).as("sum_dup"),
        sum(col("n_grams")).as("sum_grams"))
      .withColumn("dup_frac", r6(dbl(col("sum_dup")) / col("sum_grams")))
      .orderBy(col("lang"), col("source"))
  }

  /** Cross-doc repeated 10-token sequences (r5) — the signal behind
    * substring-level exact dedup (Lee et al. ACL'22, "Deduplicating
    * Training Data Makes Language Models Better"): long verbatim spans
    * shared across documents are memorization fuel even when the docs
    * as wholes are distinct. Reports the top-20 most-shared sequences
    * (doc spread, total occurrences).
    *
    * Scale shape: one index-sequence explode (linear in tokens ×
    * window 10), one groupBy — at 100 TB the shuffle key would be
    * xxhash64(seq) with min(seq) carried as representative (8-byte keys
    * instead of ~60-byte strings); the string key keeps the oracle
    * byte-comparable here and the plan shape is identical. The ≥2-docs
    * HAVING prunes the long singleton tail before the top-20 sort. */
  val dupSequences: QFn = (s, dir) => {
    val ws = col("ws")
    t(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
      .select(col("doc_id"), ws,
        explode(when(size(ws) >= 10, sequence(lit(0), size(ws) - 10))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"), concat_ws(" ",
        (0 until 10).map(k => element_at(ws, col("i") + 1 + k)): _*)
        .as("seq"))
      .groupBy(col("seq"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("seq"))
      .limit(20)
  }

  /** Variable-length maximal-repeat dedup (r10) — upgrading
    * dup_sequences' fixed 10-token report to the LONGEST shared span per
    * doc pair (the object Lee et al. ACL'22 substring dedup actually
    * removes). The diagonal-runs construction makes it exact and fully
    * relational: any repeated span of length L ≥ 10 contains exactly
    * L − 9 matching 10-token windows, and all of them share one OFFSET
    * DIAGONAL (pa − pb constant); so seed matches grouped by
    * (a, b, diagonal) and split into consecutive-position islands
    * (the gaps-and-islands device, pa − row_number) yield every maximal
    * span as an island of size k ⇒ span length k + 9. Per pair, the
    * longest span wins (start/diagonal tiebreaks); the span TEXT is
    * re-sliced from doc a's token array, so a wrong start, length, or
    * diagonal cannot reproduce the oracle's string.
    *
    * Scale shape: seeds explode linearly in tokens; the seed equi-join
    * is the dup_sequences shuffle (at 100 TB the join key becomes
    * xxhash64(seq) with per-seq fan-out caps — the documented
    * dup_sequences upgrade); islands/argmax ride (a_id, b_id)-keyed
    * windows over the MATCH set, which near-dup corpora keep sparse.
    * ScalingSpec fits the growth exponent. */
  val maximalRepeatSpans: QFn = (s, dir) => {
    val ws = col("ws")
    val words = t(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
    val seeds = words
      .select(col("doc_id"), ws,
        explode(when(size(ws) >= 10, sequence(lit(0), size(ws) - 10))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"), col("i"), concat_ws(" ",
        (0 until 10).map(k => element_at(ws, col("i") + 1 + k)): _*)
        .as("seq"))
    val m = seeds.select(col("doc_id").as("a_id"), col("i").as("pa"),
        col("seq"))
      .join(seeds.select(col("doc_id").as("b_id"), col("i").as("pb"),
        col("seq")), "seq")
      .filter(col("a_id") < col("b_id"))
    val wIsl = Window.partitionBy(col("a_id"), col("b_id"), col("diag"))
      .orderBy(col("pa"))
    val spans = m.withColumn("diag", col("pa") - col("pb"))
      .withColumn("grp", col("pa") - row_number().over(wIsl))
      .groupBy(col("a_id"), col("b_id"), col("diag"), col("grp"))
      .agg(min(col("pa")).as("start_a"),
        (count(lit(1)) + 9).as("len_tokens"))
    val wBest = Window.partitionBy(col("a_id"), col("b_id"))
      .orderBy(col("len_tokens").desc, col("start_a"), col("diag"))
    spans.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .join(words.select(col("doc_id").as("a_id"), ws), "a_id")
      .select(col("a_id"), col("b_id"), col("len_tokens"), col("start_a"),
        array_join(slice(ws, col("start_a") + 1,
          col("len_tokens").cast("int")), " ").as("span_text"))
      .orderBy(col("len_tokens").desc, col("a_id"), col("b_id"))
      .limit(20)
  }

  /** Span-dedup SINK (r13) — the Lee et al. ACL'22 substring-dedup
    * CONSUMER maximal_repeat_spans lacked: the span-deduplicated corpus
    * MATERIALIZED. Every maximal repeated span (≥ 10 tokens, the
    * diagonal-islands construction shared with maximal_repeat_spans —
    * ALL islands, not the audit's top-20) keeps its FIRST occurrence
    * (the lower doc_id) and is CUT from the later document: the covered
    * token positions (islands unioned per doc — overlaps dedup via
    * DISTINCT) are dropped, the remaining tokens rebuild in order, and
    * the cleaned corpus writes to parquet and is RE-READ (the sink
    * roundtrip is part of the graded path). Manifest per source: doc
    * counts, docs that lost spans, token volume before/after, and
    * order-sensitive md5 fingerprints of the cleaned text — a wrong
    * island, off-by-one cut, or lossy roundtrip cannot match.
    * Scale shape: the seed join is dup_sequences' shuffle (xxhash64
    * keys at 100 TB); the position explode is bounded by MATCH volume
    * (sparse on near-dup corpora, ScalingSpec-style); the rebuild is
    * one doc-keyed anti-join + rollup. */
  val dedupSpansSink: QFn = (s, dir) => {
    val wsC = col("ws")
    val words = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), TextOps.tokens(col("text"))
        .as("ws"))
      .ckpt() // reused: seeds, token explode, final manifest
    val seeds = words
      .select(col("doc_id"), wsC,
        explode(when(size(wsC) >= 10, sequence(lit(0), size(wsC) - 10))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"), col("i"), concat_ws(" ",
        (0 until 10).map(k => element_at(wsC, col("i") + 1 + k)): _*)
        .as("seq"))
    val m = seeds.select(col("doc_id").as("a_id"), col("i").as("pa"),
        col("seq"))
      .join(seeds.select(col("doc_id").as("b_id"), col("i").as("pb"),
        col("seq")), "seq")
      .filter(col("a_id") < col("b_id"))
    val wIsl = Window.partitionBy(col("a_id"), col("b_id"), col("diag"))
      .orderBy(col("pa"))
    val islands = m.withColumn("diag", col("pa") - col("pb"))
      .withColumn("grp", col("pa") - row_number().over(wIsl))
      .groupBy(col("a_id"), col("b_id"), col("diag"), col("grp"))
      .agg(min(col("pa") - col("diag")).as("start_b"),
        (count(lit(1)) + 9).as("len"))
    val cut = islands
      .select(col("b_id").as("doc_id"),
        explode(sequence(col("start_b"),
          col("start_b") + col("len") - 1)).as("pos"))
      .distinct()
      .ckpt() // consumed twice below (cut-doc flag + position anti-join)
    val cutDocs = cut.select(col("doc_id")).distinct()
    // Only documents that actually lost a span pay the explode + rebuild
    // (r16, guide §2.3 shuffle fewer bytes): the rebuild shuffle shrinks
    // from corpus-sized (every token of every doc) to match-sized (the
    // near-dup fraction); uncut documents keep their token array
    // verbatim — identical kept/fp values, the anti-join was a no-op for
    // them. A fully-cut doc is distinguished from an uncut one by the
    // cut-doc flag (both are absent from `rebuilt`).
    val rebuilt = words
      .join(cutDocs, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), posexplode(wsC).as(Seq("pos", "wtok")))
      .join(cut, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(transform(sort_array(collect_list(struct(col("pos"),
        col("wtok")))), x => x.getField("wtok")).as("kept"))
    val out = scratch(dir, "span_dedup_corpus")
    words.select(col("doc_id"), col("source"),
        size(wsC).cast("long").as("tok_before"), wsC)
      .join(cutDocs.select(col("doc_id"), lit(true).as("was_cut")),
        Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .withColumn("kept", when(col("was_cut").isNull, wsC)
        .otherwise(coalesce(col("kept"), array().cast("array<string>"))))
      .select(col("doc_id"), col("source"), col("tok_before"),
        size(col("kept")).cast("long").as("tok_after"),
        md5(concat_ws(" ", col("kept"))).as("fp"))
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("tok_after") < col("tok_before"), 1L).otherwise(0L))
          .as("n_docs_cut"),
        sum(col("tok_before")).as("tok_before"),
        sum(col("tok_after")).as("tok_after"),
        min(col("fp")).as("fp_min"), max(col("fp")).as("fp_max"))
      .orderBy(col("source"))
  }

  /** Inverted-index build (r5) — the IR/search indexing step: per term,
    * document frequency and the sorted posting list, for the 20
    * highest-df terms. Postings materialize as a comma-joined sorted
    * doc_id string so the oracle can byte-compare them.
    *
    * Scale shape: (doc, term) dedup + df groupBy are the standard keyed
    * shuffles; the posting string is collect_set + sort_array per term
    * (order restored deterministically after any partitioning). At
    * 100 TB posting lists shard by (term, bucket) with delta-encoded
    * int arrays — the top-20 cap here keeps the demo string bounded;
    * the plan shape below the cap is the real index build. */
  val invertedPostings: QFn = (s, dir) => {
    val tw = t(s, dir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .distinct()
    tw.groupBy(col("w"))
      .agg(count(lit(1)).as("df"),
        array_join(sort_array(collect_set(col("doc_id"))), ",")
          .as("postings"))
      .orderBy(col("df").desc, col("w"))
      .limit(20)
  }

  /** Language-ID confusion matrix (r5) — the classifier-audit step:
    * labeled lang × predicted lang counts with per-label row fractions.
    * One (lang, pred) groupBy; the row fraction reuses the lang
    * partitioning. The audit the langid heuristic ships with. */
  val langidConfusion: QFn = (s, dir) =>
    t(s, dir, "documents")
      .select(col("lang"), TextOps.langId(col("text")).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_frac", r6(dbl(col("n")) /
        sum(col("n")).over(Window.partitionBy(col("lang")))))
      .orderBy(col("lang"), col("lang_pred"))

  /** End-to-end curation pipeline (r5) — the capstone composition: the
    * full pre-training data path as ONE dataflow. Stages: (1) language
    * gate — keep docs whose predicted lang matches the label; (2)
    * quality gate — ≥10 tokens and type-token ratio ≥ 0.3; (3) exact
    * dedup — lowest doc_id per md5(normalized text); (4) mixture cap —
    * per source keep the top ⌈n/2⌉ by md5(doc_id) priority (stable
    * pseudo-random, reproducible across engines/runs); (5) stratified
    * 80/10/10 split by md5 hex-prefix. Output: the hand-off manifest
    * per (source, split).
    *
    * Scale shape: stages 1-2 are per-row projections/filters (no
    * shuffle); stage 3 shuffles once on the 16-byte content hash;
    * stages 4-5 share ONE source-partitioned window; the manifest
    * rollup reuses the source key. Three shuffles total for the whole
    * pipeline — each stage's trick is individually oracle-checked by
    * its standalone key (text_langid, quality_score, qdedup_docs,
    * domain_mix_sample, train_test_split); this key proves the
    * COMPOSITION. */
  val curationPipelineE2e: QFn = (s, dir) => {
    val ws = TextOps.tokens(col("text"))
    val base = t(s, dir, "documents")
      .withColumn("lang_pred", TextOps.langId(col("text")))
      .filter(col("lang_pred") === col("lang"))
      .withColumn("n_tok", size(ws))
      .withColumn("ttr",
        dbl(size(array_distinct(ws))) / nullif(size(ws), lit(0)))
      .filter(col("n_tok") >= 10 && col("ttr") >= 0.3)
      .withColumn("h", md5(TextOps.normText(col("text"))))
    val dedup = base
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("h")).orderBy(col("doc_id"))))
      .filter(col("rk") === 1)
    // mixture cap via the two-phase prefix-sum device (r13): md5-prefix
    // buckets bound every sort task; per-source totals ride the bounded
    // bucket aggregate — no task ever sorts a whole source shard.
    val capped = bucketedRowNumber(
      dedup.withColumn("pri", md5(col("doc_id").cast("string"))),
      Seq("source"), md5Bucket(col("pri")),
      Seq(col("pri"), col("doc_id")), "srk", Some("scnt"))
      .filter(col("srk") <= expr("(scnt + 1) div 2"))
    val h4 = substring(md5(col("doc_id").cast("string")), 1, 4)
    capped
      .withColumn("split", when(h4 < "cccc", "train")
        .when(h4 < "e666", "valid").otherwise("test"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"), col("split"))
  }

  /** The PRETRAINING capstone (r12) — the half of the r10 composition
    * task that was still split across standalone keys: gates → LM
    * perplexity gate → exact dedup → mixture cap → split → BPE tokenize
    * → token-budget pack, as ONE dataflow, the end-to-end a pretraining
    * data run actually executes. Stage inventory (each stage is an
    * already-graded device, composed here under one plan):
    *   1. langid agreement + length/TTR gates (curation_pipeline_e2e),
    *   2. the CCNet perplexity gate — score > the exact-rank 30th
    *      percentile threshold from CurationQ.lmGateArtifact (score once
    *      per session, gate everywhere),
    *   3. exact dedup: keep-first per md5(norm text),
    *   4. mixture cap: top half per source by hashed priority,
    *   5. 80/10/10-ish split on md5(doc_id) prefix,
    *   6. encode under the session BPE segmentation (bpeApplied) and
    *      pack 512-token bins per (source, split) shard — the curated
    *      corpus's natural parallel units — with the one-prefix-sum-
    *      window-per-shard packing device.
    * Output: the per-(source, split, bin) manifest (docs, token fill,
    * doc-id range) — a wrong gate, dropped dup, mis-capped source,
    * drifted split, mis-applied merge, or shifted bin boundary all
    * break the hash. Scale shape: gates/dedup/cap are doc- or
    * source-keyed shuffles; the LM gate and tokenizer ride session
    * artifacts (vocabulary-domain); packing windows are per-shard,
    * never global. */
  val pretrainPipelineE2e: QFn = (s, dir) => {
    val (lmScored, lmThr) = CurationQ.lmGateArtifact(s, dir)
    // second quality gate (r13): the trained classifier — both session
    // artifacts, so the capstone pays two doc-keyed joins, never a refit
    val (clfScored, clfThr) = CurationQ.clfGateArtifact(s, dir)
    val ws = TextOps.tokens(col("text"))
    val base = t(s, dir, "documents")
      .withColumn("lang_pred", TextOps.langId(col("text")))
      .filter(col("lang_pred") === col("lang"))
      .withColumn("n_tok", size(ws))
      .withColumn("ttr",
        dbl(size(array_distinct(ws))) / nullif(size(ws), lit(0)))
      .filter(col("n_tok") >= 10 && col("ttr") >= 0.3)
      .join(lmScored, Seq("doc_id"), "left")
      .crossJoin(broadcast(lmThr))
      .filter(col("score").isNotNull && col("score") > col("lm_threshold"))
      .join(clfScored.withColumnRenamed("score", "clf_score"),
        Seq("doc_id"), "left")
      .crossJoin(broadcast(clfThr))
      .filter(col("clf_score").isNotNull &&
        col("clf_score") > col("clf_threshold"))
      .withColumn("h", md5(TextOps.normText(col("text"))))
    val dedup = base
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("h")).orderBy(col("doc_id"))))
      .filter(col("rk") === 1)
    // mixture cap on the two-phase device — same re-plan as the
    // curation capstone (r13); rank values identical by construction.
    val capped = bucketedRowNumber(
      dedup.withColumn("pri", md5(col("doc_id").cast("string"))),
      Seq("source"), md5Bucket(col("pri")),
      Seq(col("pri"), col("doc_id")), "srk", Some("scnt"))
      .filter(col("srk") <= expr("(scnt + 1) div 2"))
    val h4 = substring(md5(col("doc_id").cast("string")), 1, 4)
    val curated = capped
      .withColumn("split", when(h4 < "cccc", "train")
        .when(h4 < "e666", "valid").otherwise("test"))
      .select(col("doc_id"), col("source"), col("split"))
      .ckpt() // consumed by the token join AND the packing
    val seg = bpeApplied(s, dir)
    val dtok = curated.select(col("doc_id"))
      .join(t(s, dir, "documents").select(col("doc_id"), col("text")),
        Seq("doc_id"))
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      .join(seg, "word")
      .groupBy(col("doc_id"))
      .agg(sum(size(col("syms")).cast("long")).as("tok"))
    // packing prefix-sum on the two-phase device, doc_id range buckets
    // (footer-stats width) — no task sorts a whole (source, split) shard
    val maxId = graft.Tables.statsMaxLong(s, dir, "documents", "doc_id")
    val packIn = curated
      .join(dtok, Seq("doc_id"), "left")
      .withColumn("tok", coalesce(col("tok"), lit(0L)))
    bucketedPrefixSum(packIn, Seq("source", "split"),
      idBucket(col("doc_id"), maxId), Seq(col("doc_id")),
      col("tok"), "cum")
      .withColumn("bin", expr("(cum - tok) div 512"))
      .groupBy(col("source"), col("split"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("sum_tok"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("split"), col("bin"))
  }

  /** UNIGRAM-LM tokenizer training (r12) — the OTHER production
    * tokenizer next to BPE (Kudo 2018, the SentencePiece unigram model;
    * public algorithm), exercising a genuinely different relational
    * shape: per-word VITERBI dynamic programming instead of greedy
    * merges. Two hard-EM rounds on the word-count domain:
    *
    *   - SEED: every substring of length ≤ 4 of every corpus word, with
    *     occurrence-weighted frequency; logp₀ = ln(freq/total), pinned
    *     DECIMAL(14,10).
    *   - E-STEP: per word, the max-likelihood segmentation by an
    *     UNROLLED 8-position DP (the corpus word-length bound): dp[i] =
    *     max over j ∈ [i−4, i−1] of dp[j] + logp(word[j+1..i]) — all
    *     arithmetic in exact DECIMAL so scores are order-free and
    *     bit-identical cross-engine; ties break (score DESC, j ASC) =
    *     prefer the LONGEST piece ending at i. Backtrack (≤ 8 steps)
    *     recovers the path with multiplicity.
    *   - M-STEP: piece count = Σ word-cnt over path steps; pieces with
    *     zero path count are PRUNED except single chars, which are kept
    *     floored at count 1 (the coverage guarantee); logp re-estimated.
    *
    * Output: per-round (n_pieces, corpus NLL, avg pieces/word, top
    * multi-char piece) — a wrong DP cell, tie-break, backtrack, prune,
    * or re-estimate shifts the trajectory and breaks the hash.
    * Scale shape: EVERYTHING rides the Heaps-saturating (word, cnt)
    * domain — the one corpus-sized job is the word count; DP rounds are
    * vocabulary-keyed joins against the ≤ |substrings| piece table. */
  val unigramLmTrain: QFn = (s, dir) => unigramArtifact(s, dir)._1

  private val unigramCache = graft.Tables
    .sessionScopedCache[String, (DataFrame, DataFrame, DataFrame)]()

  /** Session-scoped unigram artifact: (training trajectory, FINAL pieces
    * — the round-2 re-estimate, word counts). Trained once per (session,
    * fixture dir) like the BPE segmentation: the train key grades the
    * trajectory; token_unigram_apply / tokenizer_parity_report encode
    * under the final pieces without retraining. */
  private[graft] def unigramArtifact(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) =
    unigramCache.getOrElseUpdate((graft.Tables.sessionKey(s), dir),
      unigramBuild(s, dir))

  private val UniMaxPiece = 4

  /** The ONE word-length bound both sides of the unigram contract share
    * (r13 advisory, round 14): the DuckDB oracle is generated statically
    * (no fixture access), so its DP/backtrack unroll is structural — it
    * unrolls to THIS bound, and every level beyond the corpus's true max
    * word length is provably empty (`len(word) >= i` filters), so the
    * replay is exact for ANY corpus whose words fit the bound. Words
    * PAST the bound — URLs, German compounds, hex hashes, routine in
    * real corpora (r14 advisory) — are TRUNCATED to their
    * UniWordLenBound-codepoint prefix identically on both sides
    * ([[uniWordCounts]] / the `uwc` oracle CTE), BEFORE counting, so
    * the contract degrades gracefully instead of aborting the train:
    * an over-long token contributes its prefix's pieces, and engine ≡
    * oracle still holds exactly. The engine keeps deriving its DP
    * depth from the observed (post-truncation) max — never pays empty
    * rounds — and [[uniMaxLen]]'s invariant check is now structurally
    * unreachable rather than an input-dependent abort. */
  private[queries] val UniWordLenBound = 20

  /** DP unroll depth = the OBSERVED max word length (r13 advisory fix:
    * a hardcoded bound would silently drop longer words from the NLL,
    * backtrack, and M-step — hashes stay green while semantics rot).
    * One O(1) aggregate over the checkpointed word domain. The
    * [[UniWordLenBound]] invariant is structurally guaranteed since r15
    * (uniWordCounts truncates the word domain to the bound on both
    * sides), so this require is an internal consistency check — a
    * violation means a word-domain builder bypassed the truncation,
    * never a merely-unusual corpus. */
  private def uniMaxLen(wc: DataFrame): Int = {
    val r = wc.agg(max(length(col("word")))).first()
    val m = (if (r.isNullAt(0)) 1 else r.getInt(0)) max 1
    require(m <= UniWordLenBound,
      s"unigram word domain has a $m-char word past UniWordLenBound=" +
        s"$UniWordLenBound — a builder bypassed the shared truncation")
    m
  }

  /** One Viterbi E-step under `pieces`: the unrolled max-likelihood DP
    * (dp[i] = max over j ∈ [i−4, i−1] of dp[j] + logp(word[j+1..i]),
    * exact DECIMAL, ties (score DESC, j ASC) = longest piece) plus the
    * ≤ maxLen-step relational backtrack. Returns (dpAll, path), both
    * checkpointed, both on the word domain. Shared by training rounds
    * and by apply-time encoding (token_unigram_apply). */
  private def unigramViterbi(wc: DataFrame, pieces: DataFrame,
      maxLen: Int): (DataFrame, DataFrame) = {
    // ---- E: unrolled Viterbi. dpAll rows: (word, i, score, bp)
    var dpAll = wc.select(col("word"), lit(0).as("i"),
      lit(0).cast("decimal(22,10)").as("score"),
      lit(-1).as("bp"))
    for (i <- 1 to maxLen) {
      val cand = dpAll
        .filter(col("i").between(i - UniMaxPiece, i - 1) &&
          length(col("word")) >= i)
        .withColumn("piece",
          col("word").substr(col("i") + 1, lit(i) - col("i")))
        .join(broadcast(pieces), "piece")
        .select(col("word"), col("i").as("j"),
          // fixed-width score so every dp round unions identically
          (col("score") + col("logp")).cast("decimal(22,10)").as("sc"))
      // argmax as ONE hash aggregate, not a sort window: max struct
      // orders (sc, -j) = the (score DESC, j ASC) tie rule exactly
      val win = cand
        .groupBy(col("word"))
        .agg(max(struct(col("sc"), (-col("j")).as("nj"))).as("m"))
        .select(col("word"), lit(i).as("i"), col("m.sc").as("score"),
          (-col("m.nj")).as("bp"))
      // checkpoint EVERY level: dp_i's lazy plan embeds dp_{i-1}'s
      // (which embeds dp_{i-2}'s, ...) — ~2^i plan nodes by level 8,
      // measured as 21 s of Catalyst time + 4 MiB task binaries at
      // sf0.1 unchecked, and a 2-level cadence already re-inflates to
      // 10 s — the per-level word-domain checkpoint is the cheapest
      // point on the curve (~7 s steady state).
      dpAll = dpAll.unionByName(win.ckpt())
    }
    dpAll = dpAll.ckpt()
    // ---- backtrack (≤ maxLen steps), emitting path pieces w/ multiplicity
    var frontier = wc.select(col("word"),
      length(col("word")).as("pos"))
    var path = wc.limit(0)
      .select(col("word"), lit("").as("piece"))
    for (_ <- 1 to maxLen) {
      // shuffle join on (word, pos) — dpAll is ~(maxLen+1)×|V| rows,
      // the largest table in the loop; broadcasting it (the r12 plan)
      // exceeds any broadcast budget at web-corpus vocabulary sizes
      val step = frontier.filter(col("pos") > 0)
        .join(dpAll.select(col("word"), col("i").as("pos"),
          col("bp")), Seq("word", "pos"))
      path = path.unionByName(step
        .select(col("word"),
          col("word").substr(col("bp") + 1,
            col("pos") - col("bp")).as("piece")))
      frontier = step.select(col("word"), col("bp").as("pos"))
    }
    (dpAll, path.ckpt())
  }

  private def uniWordCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("w0"))
      // truncate to the shared bound BEFORE counting (r15, r14 advisory):
      // over-long tokens participate as their prefix on BOTH sides
      // instead of aborting the train; no-op for any word ≤ the bound
      .select(substring(col("w0"), 1, UniWordLenBound).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .ckpt()

  private def unigramBuild(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = core.withShuffleParts(s, 8) {
    unigramTrainRuns.incrementAndGet()
    val wc = uniWordCounts(s, dir)
    val MaxLen = uniMaxLen(wc)
    // seed pieces: all substrings of length 1..4, occurrence-weighted
    val sub = wc
      .select(col("word"), col("cnt"),
        explode(sequence(lit(1), length(col("word")))).as("st"))
      .select(col("word"), col("cnt"), col("st"),
        explode(sequence(lit(1),
          least(lit(UniMaxPiece), length(col("word")) - col("st") + 1)))
          .as("ln"))
      .select(col("word").substr(col("st"), col("ln")).as("piece"),
        col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("freq"))
    val tot0 = sub.agg(sum(col("freq")).as("tot"))
    var pieces = sub.crossJoin(broadcast(tot0))
      .select(col("piece"),
        dec(log(dbl(col("freq")) / dbl(col("tot"))), 14, 10).as("logp"))
      .ckpt()
    val chars = wc
      .select(col("word"),
        explode(sequence(lit(1), length(col("word")))).as("st"))
      .select(col("word").substr(col("st"), lit(1)).as("piece"))
      .distinct()
      .ckpt()
    var trail: org.apache.spark.sql.DataFrame = null
    for (round <- 1 to 2) {
      val (dpAll, pathC) = unigramViterbi(wc, pieces, MaxLen)
      // ---- M: path counts, char floor, re-estimated logp
      val cnts = pathC.join(wc, "word")
        .groupBy(col("piece")).agg(sum(col("cnt")).as("c"))
      val kept = chars.join(cnts, Seq("piece"), "left")
        .select(col("piece"),
          greatest(coalesce(col("c"), lit(0L)), lit(1L)).as("c"))
        .unionByName(cnts.join(chars, Seq("piece"), "left_anti")
          .filter(col("c") > 0))
      val totR = kept.agg(sum(col("c")).as("tot"))
      pieces = kept.crossJoin(broadcast(totR))
        .select(col("piece"),
          dec(log(dbl(col("c")) / dbl(col("tot"))), 14, 10).as("logp"))
        .ckpt()
      // ---- round report
      val nll = dpAll
        .join(wc.select(col("word"), length(col("word")).as("wl"),
          col("cnt")), "word")
        .filter(col("i") === col("wl"))
        // cnt pinned DECIMAL(15,0): score(22,10) x LONG would type to
        // (43,10) > 38 and Spark silently ROUNDS the product to scale 6
        // (allowPrecisionLoss) — (22,10)x(15,0) = (38,10) stays exact
        .agg(r6(-dbl(sum(col("score") * dec(col("cnt"), 15, 0))))
          .as("corpus_nll"))
      val stats = pathC.join(wc, "word")
        .agg(sum(col("cnt")).as("steps"))
        .crossJoin(broadcast(wc.agg(sum(col("cnt")).as("words"))))
        .select(r6(dbl(col("steps")) / dbl(col("words")))
          .as("avg_pieces_per_word"))
      val topP = pieces.filter(length(col("piece")) >= 2)
        .join(cnts, "piece")
        .orderBy(col("c").desc, col("piece")).limit(1)
        .agg(max(struct(col("c"), col("piece"))).as("m"))
        .select(coalesce(col("m.piece"), lit("")).as("top_piece"),
          coalesce(col("m.c"), lit(0L)).as("top_piece_cnt"))
      val nPieces = pieces.agg(count(lit(1)).as("n_pieces"))
      val row = nPieces.crossJoin(broadcast(nll))
        .crossJoin(broadcast(stats)).crossJoin(broadcast(topP))
        .select(lit(round.toLong).as("round"), col("n_pieces"),
          col("corpus_nll"), col("avg_pieces_per_word"),
          col("top_piece"), col("top_piece_cnt"))
      trail = if (trail == null) row else trail.unionByName(row)
    }
    (trail.orderBy(col("round")).ckpt(), pieces, wc)
  }

  private val unigramApplyCache = graft.Tables
    .sessionScopedCache[String, DataFrame]()

  /** Session-scoped APPLY segmentation: every corpus word encoded under
    * the FINAL trained pieces (one more Viterbi E-step — the exact
    * apply-time algorithm of the SentencePiece unigram model). Rows:
    * (word, piece) with path multiplicity, word-domain, checkpointed. */
  private[graft] def unigramApplied(s: SparkSession, dir: String): DataFrame =
    unigramApplyCache.getOrElseUpdate((graft.Tables.sessionKey(s), dir), {
      // pieces come from the persisted REGISTRY (building it trains at
      // most once per JVM); the word counts reuse the training
      // session's checkpoint when present, else one wordcount — a
      // session restart pays wordcount + one E-step, never a retrain
      val pieces = registryUnigramPieces(s, dir)
      val wc = unigramCache.get((graft.Tables.sessionKey(s), dir))
        .map(_._3).getOrElse(uniWordCounts(s, dir))
      core.withShuffleParts(s, 8) {
        unigramViterbi(wc, pieces, uniMaxLen(wc))._2
      }
    })

  /** Unigram-LM tokenization of the corpus under the trained pieces
    * (r13) — the APPLY/consumer parity the BPE family already has
    * (token_bpe_apply): per-language encode manifest with word/piece
    * volumes, the single-char fallback count (the coverage-floor pieces
    * actually used), and the top multi-char piece (count DESC, piece ASC).
    * Apply-equals-train is graded the same way: the oracle re-runs the
    * full two-round EM chain plus ONE more Viterbi E-step under the
    * final pieces — a drifted DP cell, tie-break, or prune anywhere in
    * training shifts the apply segmentation and breaks the hash.
    * Scale shape: the encode is vocabulary-domain (the session apply
    * artifact); corpus-sized work is one (lang, word) instance count —
    * wordcount-shaped, one shuffle, exactly token_bpe_apply's plan. */
  val tokenUnigramApply: QFn = (s, dir) => {
    val seg = unigramApplied(s, dir)
    val per = seg.groupBy(col("word"))
      .agg(count(lit(1)).as("np"),
        sum(when(length(col("piece")) === 1, 1L).otherwise(0L)).as("n1"))
    val wcl = t(s, dir, "documents")
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("wn"))
      .ckpt() // reused by the totals and the top-piece branch
    val stats = wcl.join(per, "word")
      .groupBy(col("lang"))
      .agg(sum(col("wn")).as("n_words"),
        sum(col("wn") * col("np")).as("n_pieces"),
        sum(col("wn") * col("n1")).as("n_single"))
    val wTop = Window.partitionBy(col("lang"))
      .orderBy(col("tn").desc, col("piece"))
    val top = wcl.join(seg, "word")
      .filter(length(col("piece")) >= 2)
      .groupBy(col("lang"), col("piece")).agg(sum(col("wn")).as("tn"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") === 1)
      .select(col("lang"), col("piece"), col("tn"))
    t(s, dir, "documents").groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .join(stats, Seq("lang"), "left")
      .join(top, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("n_single"), lit(0L)).as("n_single"),
        coalesce(col("piece"), lit("")).as("top_piece"),
        coalesce(col("tn"), lit(0L)).as("top_piece_n"))
      .orderBy(col("lang"))
  }

  /** Tokenizer BAKE-OFF (r13) — the decision artifact a real tokenizer
    * selection ships: BPE vs unigram compared on the held-out EVAL split
    * (the md5-prefix valid+test strata — never the data either trainer
    * saw as its objective). One row per tokenizer: exact piece/word/char
    * volumes plus the three standard selection metrics — fertility
    * (pieces per word), pieces per char (compression), and the
    * single-char fallback rate (coverage quality). Both segmentations
    * ride their session artifacts; the corpus-sized work is ONE eval
    * word count — the comparison itself is two vocabulary-domain joins.
    */
  val tokenizerParityReport: QFn = (s, dir) => {
    val bper = bpeApplied(s, dir)
      .select(col("word"), size(col("syms")).cast("long").as("np"),
        size(filter(col("syms"), y => length(y) === 1)).cast("long")
          .as("n1"))
    val useg = unigramApplied(s, dir)
    val uper = useg.groupBy(col("word"))
      .agg(count(lit(1)).as("np"),
        sum(when(length(col("piece")) === 1, 1L).otherwise(0L)).as("n1"))
    val h4 = substring(md5(col("doc_id").cast("string")), 1, 4)
    val ewc = t(s, dir, "documents")
      .filter(h4 >= "cccc")
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wn"))
      .ckpt() // probed once per tokenizer
    def report(name: String, per: DataFrame): DataFrame =
      ewc.join(per, "word")
        .agg(sum(col("wn")).as("n_words"),
          sum(col("wn") * length(col("word"))).as("n_chars"),
          sum(col("wn") * col("np")).as("n_pieces"),
          sum(col("wn") * col("n1")).as("n_single"))
        .select(lit(name).as("tokenizer"),
          col("n_words"), col("n_chars"), col("n_pieces"), col("n_single"),
          r6(dbl(col("n_pieces")) / dbl(col("n_words"))).as("fertility"),
          r6(dbl(col("n_pieces")) / dbl(col("n_chars")))
            .as("pieces_per_char"),
          r6(dbl(col("n_single")) / dbl(col("n_pieces"))).as("single_rate"))
    report("bpe", bper).unionByName(report("unigram", uper))
      .orderBy(col("tokenizer"))
  }

  /** Tokenizer/LM artifact REGISTRY roundtrip (r13) — the persistence
    * story the session-scoped artifacts lacked: BPE merges, unigram
    * pieces, and the LM-gate threshold are written once per (JVM,
    * fixture dir) to parquet under `_built` markers
    * (core.persistedArtifact — the annIndexDir pattern) and RE-READ by
    * every consumer, so a pipeline restart re-loads its tokenizers
    * instead of retraining them (bpeApplied, unigramApplied, and the
    * LM gate all go through the registry now; RegistrySpec pins the
    * no-retrain path on a second session). This key grades the
    * write→reload path itself: per artifact, the persisted row count,
    * an order-insensitive key fingerprint (md5 of the sorted key list),
    * and a value metric (merge-weight mass / piece log-prob mass / the
    * threshold) — a lossy or stale roundtrip cannot match the oracle's
    * from-scratch recomputation. */
  val tokenizerRegistry: QFn = (s, dir) => {
    val merges = registryBpeMerges(s, dir)
    val pieces = registryUnigramPieces(s, dir)
    val thr = CurationQ.lmGateArtifact(s, dir)._2
    val mrow = merges.agg(count(lit(1)).as("n_rows"),
      md5(concat_ws("|", sort_array(collect_list(concat_ws(":",
        col("round"), col("left_sym"), col("right_sym")))))).as("key_fp"),
      r6(dbl(sum(col("weight")))).as("metric"))
      .select(lit("bpe_merges").as("artifact"), col("n_rows"),
        col("key_fp"), col("metric"))
    val prow = pieces.agg(count(lit(1)).as("n_rows"),
      md5(concat_ws("|", sort_array(collect_list(col("piece")))))
        .as("key_fp"),
      r6(dbl(sum(col("logp")))).as("metric"))
      .select(lit("unigram_pieces").as("artifact"), col("n_rows"),
        col("key_fp"), col("metric"))
    val trow = thr.select(lit("lm_threshold").as("artifact"),
      lit(1L).as("n_rows"), md5(lit("lm_threshold")).as("key_fp"),
      col("lm_threshold").as("metric"))
    mrow.unionByName(prow).unionByName(trow).orderBy(col("artifact"))
  }

  /** Corpus DATA CARD (r12) — the per-(source, lang) datasheet a
    * curation run ships with its release (Datasheets for Datasets,
    * Gebru et al. 2021; what model cards cite): one row per shard
    * joining the existing audit family — volume (docs, tokens), exact
    * dup rate (global md5-norm collision), LM quality-gate pass rate
    * (the CCNet threshold artifact), unigram entropy (nats,
    * decimal-pinned terms), and the Zipf slope of the shard's top-100
    * words (the zipf_fit OLS over pinned logs). Cheap composition, high
    * evidence value: every column is an already-proven convention, and
    * a drift in ANY feeding audit breaks this one's hash too.
    * Scale shape: everything is (source, lang)-keyed — one doc-hash
    * shuffle, one word-count shuffle, vocab-domain entropy/zipf math;
    * the LM gate rides its session artifact. */
  val corpusDatacard: QFn = (s, dir) => {
    val d = t(s, dir, "documents")
    val key = Seq("source", "lang")
    val baseCnt = d.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
    val hashes = d.select(col("source"), col("lang"),
      md5(TextOps.normText(col("text"))).as("h"))
    val hc = hashes.groupBy(col("h")).agg(count(lit(1)).as("hc"))
    val dup = hashes.join(hc, "h")
      .groupBy(col("source"), col("lang"))
      .agg(sum(when(col("hc") > 1, 1L).otherwise(0L)).as("n_dup"))
    val (lmScored, lmThr) = CurationQ.lmGateArtifact(s, dir)
    val kept = d.select(col("doc_id"), col("source"), col("lang"))
      .join(lmScored, Seq("doc_id"), "left")
      .crossJoin(broadcast(lmThr))
      .groupBy(col("source"), col("lang"))
      .agg(sum(when(col("score").isNotNull &&
        col("score") > col("lm_threshold"), 1L).otherwise(0L)).as("n_kept"))
    val wc = d.select(col("source"), col("lang"),
        explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("source"), col("lang"), col("w"))
      .agg(count(lit(1)).as("c"))
      .ckpt() // vocab x shards; feeds totals, entropy, zipf
    val tot = wc.groupBy(col("source"), col("lang"))
      .agg(sum(col("c")).as("n_tokens"))
    val p = col("c") / col("n_tokens")
    val ent = wc.join(tot, key)
      .select(col("source"), col("lang"),
        dec(-p * log(p), 14, 10).as("term"))
      .groupBy(col("source"), col("lang"))
      .agg(r6(dbl(sum(col("term")))).as("entropy_nats"))
    val wR = Window.partitionBy(col("source"), col("lang"))
      .orderBy(col("c").desc, col("w"))
    val zterms = wc
      .withColumn("rank", row_number().over(wR).cast("long"))
      .filter(col("rank") <= 100)
      .select(col("source"), col("lang"),
        dec(log(dbl(col("rank"))), 14, 10).as("x"),
        dec(log(dbl(col("c"))), 14, 10).as("y"))
    val (zn, sx, sy) = (dbl(col("zn")), dbl(col("sx")), dbl(col("sy")))
    val (sxy, sxx) = (dbl(col("sxy")), dbl(col("sxx")))
    val cov = zn * sxy - sx * sy
    val vx = zn * sxx - sx * sx
    val zipf = zterms.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("zn"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("source"), col("lang"),
        r6(cov / nullif(vx, lit(0.0))).as("zipf_slope"))
    baseCnt
      .join(dup, key).join(kept, key)
      .join(tot, key, "left").join(ent, key, "left")
      .join(zipf, key, "left")
      .select(col("source"), col("lang"), col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        r6(dbl(col("n_dup")) / col("n_docs")).as("dup_rate"),
        r6(dbl(col("n_kept")) / col("n_docs")).as("lm_kept_rate"),
        col("entropy_nats"), col("zipf_slope"))
      .orderBy(col("source"), col("lang"))
  }

  /** Incremental NEAR-dup detection (r5) — incremental_dedup's exact
    * hash probe extended to near-duplicates: only the NEW batch's LSH
    * band rows probe the standing history band index (equi join on
    * (band_idx, bucket)); candidates verify with exact Jaccard ≥ 0.8.
    * Per-source ingestion report: batch size, near-dups of history, net
    * new. The crawl-dedup pattern at 100 TB — band-probe cost tracks
    * BATCH size, history is a pre-built index, and no within-history or
    * within-batch pair work happens at all. */
  val incrementalNeardup: QFn = (s, dir) => {
    val (sig, bands) = minhashSigBands(s, dir)
    val isBatch = col("doc_id") % 4 === 0
    val cand = bands.filter(isBatch)
      .select(col("doc_id").as("b_id"), col("band_idx"), col("bucket"))
      .join(bands.filter(!isBatch)
        .select(col("doc_id").as("h_id"), col("band_idx"), col("bucket")),
        Seq("band_idx", "bucket"))
      .select(col("b_id"), col("h_id")).distinct()
    val dup = cand
      .join(sig.select(col("doc_id").as("b_id"), col("shset").as("sb"),
        col("n").as("nb")), "b_id")
      .join(sig.select(col("doc_id").as("h_id"), col("shset").as("sh2"),
        col("n").as("nh")), "h_id")
      .withColumn("inter",
        size(array_intersect(col("sb"), col("sh2"))).cast("long"))
      .filter(r6(col("inter") / (col("nb") + col("nh") - col("inter")))
        >= 0.8)
      .select(col("b_id")).distinct()
      .withColumn("is_dup", lit(1L))
    t(s, dir, "documents").filter(isBatch)
      .select(col("doc_id"), col("source"))
      .join(dup, col("doc_id") === col("b_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_batch"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_neardup_hist"),
        (count(lit(1)) - sum(coalesce(col("is_dup"), lit(0L))))
          .as("n_new"))
      .orderBy(col("source"))
  }

  /** Zipf-law fit per language (r8) — the corpus-statistics diagnostic a
    * curation pipeline runs before trusting token distributions: OLS of
    * ln(freq) on ln(rank) over each language's top-100 words (Zipf
    * predicts slope ≈ −1; a flat or broken slope flags synthetic /
    * boilerplate-heavy text). Determinism follows the agg_regression +
    * lm_bigram conventions: each ln term is pinned to DECIMAL(14,10)
    * before the exact sums, so slope/intercept/r² are one fixed double
    * expression over exact totals. Heavy lifting is the word count
    * (one shuffle); the regression runs over ≤100 rows per lang. */
  val zipfFit: QFn = (s, dir) => {
    val wR = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("w"))
    val terms = t(s, dir, "documents")
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("lang"), col("w"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(wR).cast("long"))
      .filter(col("rank") <= 100)
      .select(col("lang"),
        dec(log(dbl(col("rank"))), 14, 10).as("x"),
        dec(log(dbl(col("cnt"))), 14, 10).as("y"))
    val n = dbl(col("n"))
    val (sx, sy) = (dbl(col("sx")), dbl(col("sy")))
    val (sxy, sxx, syy) = (dbl(col("sxy")), dbl(col("sxx")), dbl(col("syy")))
    val cov = n * sxy - sx * sy
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    val slope = cov / vx
    terms.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("lang"), col("n"),
        r6(slope).as("zipf_slope"),
        r6((sy - slope * sx) / n).as("intercept"),
        r6(cov * cov / (vx * vy)).as("r2"))
      .orderBy(col("lang"))
  }

  /** BM25 ranked retrieval (r8) — the IR scoring function the inverted
    * index exists to serve (Robertson-Spärck Jones, k1=1.2, b=0.75):
    * top-20 docs for the fixed query {spark, join, data}. All inputs are
    * exact integers (tf, df, dl, N, total tokens); idf and the length
    * normalization are ONE fixed double expression each, the per-term
    * score is pinned DECIMAL(14,10) so the ≤3-term per-doc sum is exact,
    * and the top-20 order sorts the EXACT decimal (doc_id tiebreak) —
    * rounding happens after ranking, never before. Scale shape: df/N/tt
    * are 1-row/3-row broadcasts; the tf table is filtered to query terms
    * BEFORE its groupBy, so per-query cost tracks posting-list size (the
    * inverted-index access pattern), not corpus size. */
  /** The shared BM25 scored frame (doc_id, n_terms, sc: exact DECIMAL
    * sum of pinned per-term scores) for the fixed query
    * {spark, join, data} — consumed by bm25_topk (global top-20) and
    * retrieval_ndcg (the per-lang ranking-quality report). */
  private def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    val qterms = Seq("spark", "join", "data")
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("nd"), sum(col("dl")).as("tt"))
    val tf = toks.filter(col("w").isin(qterms: _*))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val idf = log((dbl(col("nd") - col("df")) + lit(0.5)) /
      (dbl(col("df")) + lit(0.5)))
    val denom = dbl(col("tf")) + lit(1.2) *
      (lit(0.25) + lit(0.75) * (dbl(col("dl") * col("nd")) / dbl(col("tt"))))
    tf.join(broadcast(df), Seq("w"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        dec(idf * (dbl(col("tf")) * lit(2.2)) / denom, 14, 10).as("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("term")).as("sc"))
  }

  val bm25TopK: QFn = (s, dir) =>
    bm25Scored(s, dir)
      .orderBy(col("sc").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("n_terms"), r6(dbl(col("sc"))).as("bm25"))

  /** Retrieval-quality report: nDCG@10 + MRR@10 of the BM25 ranking per
    * language (r14, verdict #2) — the ann_recall_report shape for the
    * lexical retrieval stack. Graded relevance is DETERMINISTIC and
    * exactly lexical: grade g = how many of the 3 fixed query terms the
    * doc contains (1..3 over the scored pool) — so the IDEAL ranking
    * (grades descending) IS the exact lexical baseline, and nDCG
    * measures how much BM25's idf/length weighting agrees with raw term
    * coverage. Gains (2^g − 1) ∈ {1, 3, 7} are exact ints; every DCG
    * term is pinned DECIMAL(14,10) over the shared log2 discount
    * (the zipf_fit pinned-log device) and summed exactly. IDCG needs no
    * second corpus ranking: it comes from the per-lang grade COUNTS
    * spread over a 10-rank spine (rank i takes grade 3 while i ≤ n3,
    * then 2, then 1). MRR@10 = 1/rank of the first grade ≥ 2 doc in the
    * BM25 top-10, 0 when none.
    *
    * Scale shape: scoring is bm25Scored's posting-list-sized chain; the
    * per-lang top-10 plans a WindowGroupLimit (map-side pruned to 10
    * rows/group/partition — never a corpus sort); IDCG runs on the
    * ≤ langs-row count aggregate × a 10-row spine. */
  /** Depth of the retrieval-quality cut (nDCG@k / MRR@k) — one
    * constant, interpolated into BOTH the Spark plan and the oracle
    * SQL (the one-sided-constant drift class the r13 advisory hit). */
  val RetrievalK = 10

  val retrievalNdcg: QFn = (s, dir) => {
    val scored = bm25Scored(s, dir)
      .join(t(s, dir, "documents").select(col("doc_id"), col("lang")),
        Seq("doc_id"))
    val wL = Window.partitionBy(col("lang"))
      .orderBy(col("sc").desc, col("doc_id"))
    val gain = when(col("n_terms") === 3, 7.0)
      .when(col("n_terms") === 2, 3.0).otherwise(1.0)
    val dcgAgg = scored
      .withColumn("rnk", row_number().over(wL))
      .filter(col("rnk") <= RetrievalK)
      .select(col("lang"), col("rnk"), col("n_terms"),
        dec(gain / log2(col("rnk") + 1), 14, 10).as("dterm"))
      .groupBy(col("lang"))
      .agg(sum(col("dterm")).as("dcg"),
        min(when(col("n_terms") >= 2, col("rnk"))).as("first_rel"))
    val ideal = scored.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_ranked"),
        sum(when(col("n_terms") === 3, 1L).otherwise(0L)).as("n3"),
        sum(when(col("n_terms") === 2, 1L).otherwise(0L)).as("n2"))
      .select(col("lang"), col("n_ranked"), col("n3"), col("n2"),
        explode(sequence(lit(1), lit(RetrievalK))).as("i"))
      .filter(col("i") <= col("n_ranked"))
      .withColumn("ig", when(col("i") <= col("n3"), 7.0)
        .when(col("i") <= col("n3") + col("n2"), 3.0).otherwise(1.0))
      .groupBy(col("lang"))
      .agg(max(col("n_ranked")).as("n_ranked"),
        sum(dec(col("ig") / log2(col("i") + 1), 14, 10)).as("idcg"))
    ideal.join(dcgAgg, Seq("lang"))
      .select(col("lang"), col("n_ranked"),
        r6(dbl(col("dcg"))).as("dcg10"),
        r6(dbl(col("idcg"))).as("idcg10"),
        r6(dbl(col("dcg")) / dbl(col("idcg"))).as("ndcg10"),
        r6(coalesce(lit(1.0) / col("first_rel"), lit(0.0))).as("mrr10"))
      .orderBy(col("lang"))
  }

  val queries: Map[String, QFn] = Map(
    "cjk_bigram_tokens"   -> cjkBigramTokens,
    "bm25_topk"           -> bm25TopK,
    "retrieval_ndcg"      -> retrievalNdcg,
    "zipf_fit"            -> zipfFit,
    "incremental_neardup" -> incrementalNeardup,
    "langid_confusion"   -> langidConfusion,
    "curation_pipeline_e2e" -> curationPipelineE2e,
    "pretrain_pipeline_e2e" -> pretrainPipelineE2e,
    "corpus_datacard" -> corpusDatacard,
    "unigram_lm_train" -> unigramLmTrain,
    "token_unigram_apply" -> tokenUnigramApply,
    "tokenizer_parity_report" -> tokenizerParityReport,
    "tokenizer_registry" -> tokenizerRegistry,
    "inverted_postings"  -> invertedPostings,
    "rep_ngram_audit"    -> repNgramAudit,
    "dup_sequences"      -> dupSequences,
    "maximal_repeat_spans" -> maximalRepeatSpans,
    "dedup_spans_sink"   -> dedupSpansSink,
    "jw_linkage"         -> jwLinkage,
    "bpe_train_merges"   -> bpeTrainMerges,
    "token_bpe_apply"    -> tokenBpeApply,
    "pack_tokens_bpe"    -> packTokensBpe,
    "tokenize_corpus_sink" -> tokenizeCorpusSink,
    "entity_dedup_e2e"   -> entityDedupE2e,
    "skipgram_pairs"     -> skipgramPairs,
    "sgns_step"          -> sgnsStep,
    "sgns_train"         -> sgnsTrain,
    "token_entropy"      -> tokenEntropy,
    "typo_neardup_words" -> typoNeardupWords,
    "doc_chunks"        -> docChunks,
    "simhash_neardup"   -> simhashNeardup,
    "ngram_profile"     -> ngramProfile,
    "kn_lm_prob"        -> knLmProb,
    "js_divergence"     -> jsDivergence,
    "collocation_llr"   -> collocationLlr,
    "bigram_pmi"        -> bigramPmi,
    "token_bpe"         -> tokenBpe,
    "qdedup_docs"       -> dedupDocs,
    "qtext_wordcount"   -> wordCount,
    "neardup_pairs"     -> neardupPairs,
    "minhash_lsh_pairs" -> minhashLsh,
    "simhash_docs"      -> simhashDocs,
    "text_fingerprint"  -> fingerprint,
    "lexicon_score"     -> lexiconScore,
    "tfidf_top_terms"   -> tfidfTop,
    "text_langid"       -> langIdQ,
    "quality_score"     -> qualityScore,
    "token_count"       -> tokenCount)

  /** BPE training oracle: 6 generated merge rounds, each mirroring the
    * Spark round stage for stage (pair weights → argmax → islands-greedy
    * application → array rebuild). Pure integer arithmetic throughout. */
  /** The 6 generated BPE merge rounds through `vocab6` + `mg1..6`, shared
    * by the training oracle and — because training's final vocabulary IS
    * the greedy application of the learned merges in priority order — by
    * the apply/pack oracles, which read `vocab6` as the segmentation.
    * That reuse is the cross-engine statement of apply-equals-train: the
    * Spark side re-applies the collected merge table from scratch, the
    * oracle takes training's incremental state, and the hash match proves
    * them identical. */
  private def bpeVocabCtes: String = {
    def round(k: Int): String = {
      val prev = s"vocab${k - 1}"
      s"""ex$k AS MATERIALIZED (
         |  SELECT word, cnt, i - 1 AS pos, syms[i] AS sym,
         |    CASE WHEN i < len(syms) THEN syms[i + 1] END AS nxt
         |  FROM $prev, (SELECT unnest(range(1,
         |      (SELECT max(len(syms)) FROM $prev) + 1)) AS i)
         |  WHERE i <= len(syms)),
         |top$k AS MATERIALIZED (
         |  SELECT sym AS pa, nxt AS pb,
         |    CAST(sum(cnt) AS BIGINT) AS weight FROM ex$k
         |  WHERE nxt IS NOT NULL GROUP BY 1, 2
         |  ORDER BY weight DESC, pa, pb LIMIT 1),
         |hit$k AS MATERIALIZED (
         |  SELECT e.*, (e.sym = t.pa AND e.nxt = t.pb) AS hit
         |  FROM ex$k e CROSS JOIN top$k t),
         |kept$k AS MATERIALIZED (
         |  SELECT word AS kw, pos AS kpos FROM (
         |    SELECT word, pos, min(pos) OVER (PARTITION BY word, grp)
         |      AS start
         |    FROM (SELECT word, pos,
         |        pos - row_number() OVER (PARTITION BY word ORDER BY pos)
         |          AS grp
         |      FROM hit$k WHERE hit))
         |  WHERE (pos - start) % 2 = 0),
         |nv$k AS MATERIALIZED (
         |  SELECT h.word, h.cnt, h.pos,
         |    CASE WHEN k1.kpos IS NOT NULL THEN h.sym || h.nxt
         |         ELSE h.sym END AS sym
         |  FROM hit$k h
         |  LEFT JOIN kept$k k1 ON h.word = k1.kw AND h.pos = k1.kpos
         |  LEFT JOIN kept$k k2 ON h.word = k2.kw AND h.pos = k2.kpos + 1
         |  WHERE k2.kpos IS NULL),
         |vocab$k AS MATERIALIZED (
         |  SELECT word, cnt, list(sym ORDER BY pos) AS syms FROM nv$k
         |  GROUP BY word, cnt),
         |mg$k AS (
         |  SELECT CAST($k AS BIGINT) AS round, pa AS left_sym,
         |    pb AS right_sym, pa || pb AS merged, weight
         |  FROM top$k)""".stripMargin
    }
    s"""$wordsCte,
       |vocab0 AS MATERIALIZED (
       |  SELECT word, count(*) AS cnt,
       |    list_transform(range(1, len(word) + 1), i -> word[i:i])
       |      AS syms
       |  FROM (SELECT unnest(ws) AS word FROM words) GROUP BY word),
       |${(1 to 6).map(round).mkString(",\n")}""".stripMargin
  }

  private def bpeTrainSql: String =
    s"""WITH $bpeVocabCtes
       |SELECT * FROM (
       |  ${(1 to 6).map(k => s"SELECT * FROM mg$k").mkString(
             " UNION ALL ")})
       |ORDER BY round""".stripMargin

  /** Apply oracle: vocab6 (= the trained merges greedily applied, see
    * bpeVocabCtes) joined back to the word instances — per-lang exact
    * token volumes + argmax multi-char token. */
  private def bpeApplySql: String =
    s"""WITH $bpeVocabCtes,
       |inst AS MATERIALIZED (
       |  SELECT doc_id, unnest(ws) AS word FROM words),
       |wc AS MATERIALIZED (
       |  SELECT d.lang, i.word, count(*) AS wn
       |  FROM inst i JOIN documents d USING (doc_id) GROUP BY 1, 2),
       |wv AS MATERIALIZED (
       |  SELECT lang, wn, syms FROM wc JOIN vocab6 USING (word)),
       |st AS (SELECT lang, CAST(sum(wn) AS BIGINT) AS n_words,
       |    CAST(sum(wn * len(syms)) AS BIGINT) AS n_tokens,
       |    CAST(sum(wn * len(list_filter(syms, y -> len(y) >= 2)))
       |      AS BIGINT) AS n_merged
       |  FROM wv GROUP BY 1),
       |tc AS (SELECT lang, tok, CAST(sum(wn) AS BIGINT) AS tn
       |  FROM (SELECT lang, wn, unnest(syms) AS tok FROM wv)
       |  WHERE len(tok) >= 2 GROUP BY 1, 2),
       |topt AS (SELECT lang, tok, tn FROM (
       |    SELECT lang, tok, tn, row_number() OVER (PARTITION BY lang
       |      ORDER BY tn DESC, tok) AS rn FROM tc) WHERE rn = 1),
       |nd AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1)
       |SELECT nd.lang, nd.n_docs,
       |  coalesce(st.n_words, CAST(0 AS BIGINT)) AS n_words,
       |  coalesce(st.n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
       |  coalesce(st.n_merged, CAST(0 AS BIGINT)) AS n_merged,
       |  coalesce(topt.tok, '') AS top_merged,
       |  coalesce(topt.tn, CAST(0 AS BIGINT)) AS top_merged_n
       |FROM nd LEFT JOIN st USING (lang) LEFT JOIN topt USING (lang)
       |ORDER BY lang""".stripMargin

  /** Tokenized-corpus oracle: vocab6 segmentation re-expanded to ordered
    * per-doc token sequences ((wpos, spos) sort), same order-sensitive
    * md5 fingerprints — the Spark side's disk roundtrip is
    * value-preserving, so the relational replay is exact. */
  private def bpeCorpusSinkSql: String =
    s"""WITH $bpeVocabCtes,
       |wtok AS MATERIALIZED (
       |  SELECT doc_id, i - 1 AS wpos, ws[i] AS word FROM words,
       |    (SELECT unnest(range(1, (SELECT max(len(ws)) FROM words) + 1))
       |      AS i)
       |  WHERE i <= len(ws)),
       |stok AS MATERIALIZED (
       |  SELECT w.doc_id, w.wpos, j - 1 AS spos, v.syms[j] AS tok
       |  FROM wtok w JOIN vocab6 v USING (word),
       |    (SELECT unnest(range(1,
       |        (SELECT max(len(syms)) FROM vocab6) + 1)) AS j)
       |  WHERE j <= len(v.syms)),
       |docs_t AS MATERIALIZED (
       |  SELECT doc_id, list(tok ORDER BY wpos, spos) AS toks
       |  FROM stok GROUP BY doc_id),
       |full_t AS (
       |  SELECT d.doc_id, d.lang,
       |    coalesce(t.toks, CAST([] AS VARCHAR[])) AS toks
       |  FROM documents d LEFT JOIN docs_t t USING (doc_id)),
       |per AS (SELECT lang, CAST(len(toks) AS BIGINT) AS ntok,
       |    md5(array_to_string(toks, ' ')) AS fp
       |  FROM full_t)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
       |  CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_docs,
       |  min(fp) AS fp_min, max(fp) AS fp_max
       |FROM per GROUP BY lang ORDER BY lang""".stripMargin

  /** Token-budgeted packing oracle: vocab6 segmentation → per-doc token
    * counts → the pack_sequences prefix-sum window at 512 tokens. */
  private def bpePackSql: String =
    s"""WITH $bpeVocabCtes,
       |inst AS MATERIALIZED (
       |  SELECT doc_id, unnest(ws) AS word FROM words),
       |dtok AS MATERIALIZED (
       |  SELECT doc_id, CAST(sum(len(syms)) AS BIGINT) AS tok
       |  FROM inst JOIN vocab6 USING (word) GROUP BY doc_id),
       |alltok AS (
       |  SELECT d.doc_id, d.lang, coalesce(t.tok, CAST(0 AS BIGINT)) AS tok
       |  FROM documents d LEFT JOIN dtok t USING (doc_id)),
       |binned AS (
       |  SELECT lang, doc_id, tok,
       |    CAST((sum(tok) OVER (PARTITION BY lang ORDER BY doc_id) - tok)
       |      // 512 AS BIGINT) AS bin
       |  FROM alltok)
       |SELECT lang, bin, count(*) AS n_docs,
       |  CAST(sum(tok) AS BIGINT) AS sum_tok,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM binned GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Unigram-LM oracle: the identical seed → (unrolled Viterbi DP in
    * DECIMAL(22,10) → bounded-step backtrack → prune/floor →
    * re-estimate) chain, generated per EM round. The unroll depth is the
    * SHARED structural bound [[UniWordLenBound]] (r13 advisory fix):
    * levels past the corpus's true max word length are empty
    * (`len(word) >= i`), so the oracle replays the engine's derived-depth
    * DP exactly for any corpus the engine accepts — the engine asserts
    * the same bound in uniMaxLen. */
  private val UniSqlMaxLen = UniWordLenBound
  private val UniSqlMaxPiece = 4

  /** Unigram E-step CTEs for round r (DP + backtrack + path), reading
    * `uwc` and the given pieces CTE — shared by the train, apply, and
    * parity oracles (the train oracle runs two of these with M-steps
    * between; the apply oracles run ONE more under the final pieces). */
  private def uniEstepCtes(r: Int, piecesCte: String): String = {
    def dpUnion(i: Int): String =
      (math.max(0, i - UniSqlMaxPiece) until i)
        .map(j => s"SELECT * FROM u${r}dp$j").mkString(" UNION ALL ")
    val dps = (1 to UniSqlMaxLen).map { i =>
      s"""u${r}c$i AS (
         |  SELECT d.word, d.i AS j,
         |    CAST(d.score + p.logp AS DECIMAL(22,10)) AS sc
         |  FROM (${dpUnion(i)}) d
         |  JOIN $piecesCte p
         |    ON p.piece = substring(d.word, d.i + 1, $i - d.i)
         |  WHERE len(d.word) >= $i),
         |u${r}dp$i AS MATERIALIZED (
         |  SELECT word, $i AS i, sc AS score, j AS bp FROM (
         |    SELECT *, row_number() OVER (PARTITION BY word
         |      ORDER BY sc DESC, j) AS rn FROM u${r}c$i)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val bts = (1 to UniSqlMaxLen).map { k =>
      s"""u${r}bt$k AS (
         |  SELECT b.word, d.bp AS pos,
         |    substring(b.word, d.bp + 1, b.pos - d.bp) AS piece
         |  FROM u${r}bt${k - 1} b
         |  JOIN u${r}dpall d ON d.word = b.word AND d.i = b.pos
         |  WHERE b.pos > 0)""".stripMargin
    }.mkString(",\n")
    s"""u${r}dp0 AS MATERIALIZED (SELECT word, 0 AS i,
       |    CAST(0 AS DECIMAL(22,10)) AS score, -1 AS bp FROM uwc),
       |$dps,
       |u${r}dpall AS MATERIALIZED (${(0 to UniSqlMaxLen)
           .map(i => s"SELECT * FROM u${r}dp$i").mkString(" UNION ALL ")}),
       |u${r}bt0 AS (SELECT word, len(word) AS pos FROM uwc),
       |$bts,
       |u${r}path AS MATERIALIZED (${(1 to UniSqlMaxLen)
           .map(k => s"SELECT word, piece FROM u${r}bt$k")
           .mkString(" UNION ALL ")})""".stripMargin
  }

  /** Unigram M-step CTEs for round r: path counts, char floor,
    * re-estimated logp → u{r}pieces. */
  private def uniMstepCtes(r: Int): String =
    s"""u${r}cnts AS MATERIALIZED (
       |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS c
       |  FROM u${r}path JOIN uwc USING (word) GROUP BY piece),
       |u${r}kept AS (
       |  SELECT ch.piece,
       |    greatest(coalesce(c.c, 0), 1) AS c
       |  FROM uchars ch LEFT JOIN u${r}cnts c USING (piece)
       |  UNION ALL
       |  SELECT c.piece, c.c FROM u${r}cnts c
       |  LEFT JOIN uchars ch USING (piece)
       |  WHERE ch.piece IS NULL AND c.c > 0),
       |u${r}tot AS (SELECT sum(c) AS tot FROM u${r}kept),
       |u${r}pieces AS MATERIALIZED (
       |  SELECT piece, CAST(ln(CAST(c AS DOUBLE)
       |    / CAST(tot AS DOUBLE)) AS DECIMAL(14,10)) AS logp
       |  FROM u${r}kept, u${r}tot)""".stripMargin

  /** Unigram per-round report CTEs → u{r}row. */
  private def uniReportCtes(r: Int): String =
    s"""u${r}nll AS (
       |  SELECT ${r6Sql("-(CAST(sum(score * cnt) AS DOUBLE))")}
       |    AS corpus_nll
       |  FROM u${r}dpall JOIN uwc USING (word)
       |  WHERE i = len(word)),
       |u${r}stats AS (
       |  SELECT ${r6Sql("CAST(steps AS DOUBLE) / CAST(words AS DOUBLE)")}
       |    AS avg_pieces_per_word
       |  FROM (SELECT sum(cnt) AS steps
       |        FROM u${r}path JOIN uwc USING (word)),
       |    (SELECT sum(cnt) AS words FROM uwc)),
       |u${r}top AS (
       |  SELECT coalesce(max(piece), '') AS top_piece,
       |    CAST(coalesce(max(c), 0) AS BIGINT) AS top_piece_cnt
       |  FROM (SELECT p.piece, c.c
       |        FROM u${r}pieces p JOIN u${r}cnts c USING (piece)
       |        WHERE len(p.piece) >= 2
       |        ORDER BY c.c DESC, p.piece LIMIT 1)),
       |u${r}np AS (SELECT count(*) AS n_pieces FROM u${r}pieces),
       |u${r}row AS (
       |  SELECT CAST($r AS BIGINT) AS round,
       |    CAST(n_pieces AS BIGINT) AS n_pieces, corpus_nll,
       |    avg_pieces_per_word, top_piece, top_piece_cnt
       |  FROM u${r}np, u${r}nll, u${r}stats, u${r}top)""".stripMargin

  /** Unigram base CTEs (word counts, substring seed, char floor set) —
    * reads `words`; the caller supplies the words CTE. */
  private def uniBaseCtes: String =
    s"""uwc AS MATERIALIZED (
       |  SELECT substring(word, 1, $UniWordLenBound) AS word,
       |    count(*) AS cnt
       |  FROM (SELECT unnest(ws) AS word FROM words) GROUP BY 1),
       |usub AS (
       |  SELECT substring(word, st, ln) AS piece, cnt
       |  FROM uwc,
       |    (SELECT unnest(range(1,
       |      (SELECT max(len(word)) FROM uwc) + 1)) AS st),
       |    (SELECT unnest(range(1, ${UniSqlMaxPiece + 1})) AS ln)
       |  WHERE st <= len(word) AND st + ln - 1 <= len(word)),
       |ufreq AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS freq
       |  FROM usub GROUP BY piece),
       |utot AS (SELECT sum(freq) AS tot FROM ufreq),
       |u0pieces AS MATERIALIZED (
       |  SELECT piece, CAST(ln(CAST(freq AS DOUBLE)
       |    / CAST(tot AS DOUBLE)) AS DECIMAL(14,10)) AS logp
       |  FROM ufreq, utot),
       |uchars AS MATERIALIZED (
       |  SELECT DISTINCT substring(word, st, 1) AS piece
       |  FROM uwc,
       |    (SELECT unnest(range(1,
       |      (SELECT max(len(word)) FROM uwc) + 1)) AS st)
       |  WHERE st <= len(word))""".stripMargin

  /** The full two-round EM chain (e1 m1 e2 m2) — shared prefix of the
    * train, apply, and parity oracles. */
  private def uniTrainChainCtes: String =
    s"""$uniBaseCtes,
       |${uniEstepCtes(1, "u0pieces")},
       |${uniMstepCtes(1)},
       |${uniEstepCtes(2, "u1pieces")},
       |${uniMstepCtes(2)}""".stripMargin

  private def unigramLmSql: String =
    s"""WITH $wordsCte,
       |$uniTrainChainCtes,
       |${uniReportCtes(1)},
       |${uniReportCtes(2)}
       |SELECT * FROM (
       |  SELECT * FROM u1row UNION ALL SELECT * FROM u2row)
       |ORDER BY round""".stripMargin

  /** Apply oracle (r13): the train chain + ONE more Viterbi E-step under
    * the final (round-2) pieces — u3path IS the apply segmentation —
    * joined to per-(lang, word) instance counts. */
  private def unigramApplySql: String =
    s"""WITH $wordsCte,
       |$uniTrainChainCtes,
       |${uniEstepCtes(3, "u2pieces")},
       |luwc AS MATERIALIZED (
       |  SELECT d.lang, w2.word, count(*) AS wn
       |  FROM (SELECT doc_id, unnest(ws) AS word FROM words) w2
       |  JOIN documents d USING (doc_id) GROUP BY 1, 2),
       |uper AS (SELECT word, CAST(count(*) AS BIGINT) AS np,
       |    CAST(sum(CASE WHEN len(piece) = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n1
       |  FROM u3path GROUP BY word),
       |ust AS (SELECT lang, CAST(sum(wn) AS BIGINT) AS n_words,
       |    CAST(sum(wn * np) AS BIGINT) AS n_pieces,
       |    CAST(sum(wn * n1) AS BIGINT) AS n_single
       |  FROM luwc JOIN uper USING (word) GROUP BY 1),
       |utc AS (SELECT lang, piece, CAST(sum(wn) AS BIGINT) AS tn
       |  FROM luwc JOIN u3path USING (word)
       |  WHERE len(piece) >= 2 GROUP BY 1, 2),
       |utopp AS (SELECT lang, piece, tn FROM (
       |    SELECT lang, piece, tn, row_number() OVER (PARTITION BY lang
       |      ORDER BY tn DESC, piece) AS rn FROM utc) WHERE rn = 1),
       |und AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1)
       |SELECT und.lang, und.n_docs,
       |  coalesce(ust.n_words, CAST(0 AS BIGINT)) AS n_words,
       |  coalesce(ust.n_pieces, CAST(0 AS BIGINT)) AS n_pieces,
       |  coalesce(ust.n_single, CAST(0 AS BIGINT)) AS n_single,
       |  coalesce(utopp.piece, '') AS top_piece,
       |  coalesce(utopp.tn, CAST(0 AS BIGINT)) AS top_piece_n
       |FROM und LEFT JOIN ust USING (lang) LEFT JOIN utopp USING (lang)
       |ORDER BY lang""".stripMargin

  /** Parity oracle (r13): both tokenizer chains (BPE vocab6 + unigram
    * u3path) against the eval-split word counts. */
  private def tokenizerParitySql: String = {
    def rep(name: String, perCte: String): String =
      s"""SELECT '$name' AS tokenizer,
         |  CAST(sum(wn) AS BIGINT) AS n_words,
         |  CAST(sum(wn * len(word)) AS BIGINT) AS n_chars,
         |  CAST(sum(wn * np) AS BIGINT) AS n_pieces,
         |  CAST(sum(wn * n1) AS BIGINT) AS n_single,
         |  ${r6Sql("CAST(sum(wn * np) AS DOUBLE)" +
             " / CAST(sum(wn) AS DOUBLE)")} AS fertility,
         |  ${r6Sql("CAST(sum(wn * np) AS DOUBLE)" +
             " / CAST(sum(wn * len(word)) AS DOUBLE)")} AS pieces_per_char,
         |  ${r6Sql("CAST(sum(wn * n1) AS DOUBLE)" +
             " / CAST(sum(wn * np) AS DOUBLE)")} AS single_rate
         |FROM ewc JOIN $perCte USING (word)""".stripMargin
    s"""WITH $bpeVocabCtes,
       |$uniTrainChainCtes,
       |${uniEstepCtes(3, "u2pieces")},
       |ewc AS MATERIALIZED (
       |  SELECT word, count(*) AS wn FROM (
       |    SELECT unnest(ws) AS word FROM words
       |    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) >= 'cccc')
       |  GROUP BY word),
       |bper AS (SELECT word, CAST(len(syms) AS BIGINT) AS np,
       |    CAST(len(list_filter(syms, y -> len(y) = 1)) AS BIGINT) AS n1
       |  FROM vocab6),
       |uper AS (SELECT word, CAST(count(*) AS BIGINT) AS np,
       |    CAST(sum(CASE WHEN len(piece) = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n1
       |  FROM u3path GROUP BY word)
       |SELECT * FROM (
       |  ${rep("bpe", "bper")}
       |  UNION ALL
       |  ${rep("unigram", "uper")})
       |ORDER BY tokenizer""".stripMargin
  }

  /** Shared LM-gate oracle CTEs (reads `words`; ends in
    * `lmscored(doc_id, score)` + `lmthr(lm_threshold)`) — used by the
    * pretrain capstone and tokenizer_registry oracles; mirrors
    * CurationQ.lmGateArtifact. */
  private def lmGateSqlCtes: String =
    s"""bgr AS (
       |  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
       |  FROM words,
       |    (SELECT unnest(range(1, (SELECT max(len(ws)) FROM words) + 1))
       |      AS i)
       |  WHERE i + 1 <= len(ws)),
       |uni AS (
       |  SELECT w, count(*) AS c1 FROM (
       |    SELECT unnest(ws) AS w FROM words WHERE doc_id % 17 <> 0)
       |  GROUP BY w),
       |vv AS (SELECT count(*) AS v FROM uni),
       |c2g AS (SELECT w1, w2, count(*) AS c2 FROM bgr
       |       WHERE doc_id % 17 <> 0 GROUP BY w1, w2),
       |lmterms AS (
       |  SELECT bgr.doc_id, CAST(ln(
       |      CAST(coalesce(c2g.c2, 0) + 1 AS DOUBLE) /
       |      CAST(coalesce(uni.c1, 0) + vv.v AS DOUBLE))
       |    AS DECIMAL(14,10)) AS term
       |  FROM bgr
       |  LEFT JOIN c2g ON bgr.w1 = c2g.w1 AND bgr.w2 = c2g.w2
       |  LEFT JOIN uni ON bgr.w1 = uni.w
       |  CROSS JOIN vv),
       |lmscored AS (
       |  SELECT doc_id,
       |    ${r6Sql("CAST(sum(term) AS DOUBLE) / count(*)")} AS score
       |  FROM lmterms GROUP BY doc_id),
       |lmranked AS (
       |  SELECT score, row_number() OVER (ORDER BY score) AS rn,
       |    count(*) OVER () AS n
       |  FROM lmscored),
       |lmthr AS (
       |  SELECT max(CASE WHEN rn = (3 * n + 9) // 10 THEN score END)
       |    AS lm_threshold FROM lmranked)""".stripMargin

  /** Registry oracle (r13): every artifact recomputed from scratch —
    * merges from the BPE chain, pieces from the unigram EM chain,
    * threshold from the LM chain — so a stale or lossy persisted copy
    * cannot match. */
  private def tokenizerRegistrySql: String =
    s"""WITH $bpeVocabCtes,
       |$uniTrainChainCtes,
       |$lmGateSqlCtes,
       |mgall AS (${(1 to 6).map(k => s"SELECT * FROM mg$k")
           .mkString(" UNION ALL ")}),
       |mkeys AS (SELECT CAST(round AS VARCHAR) || ':' || left_sym
       |    || ':' || right_sym AS k, weight FROM mgall),
       |mrow AS (SELECT 'bpe_merges' AS artifact,
       |    CAST(count(*) AS BIGINT) AS n_rows,
       |    md5(string_agg(k, '|' ORDER BY k)) AS key_fp,
       |    ${r6Sql("CAST(sum(weight) AS DOUBLE)")} AS metric
       |  FROM mkeys),
       |prow AS (SELECT 'unigram_pieces' AS artifact,
       |    CAST(count(*) AS BIGINT) AS n_rows,
       |    md5(string_agg(piece, '|' ORDER BY piece)) AS key_fp,
       |    ${r6Sql("CAST(sum(logp) AS DOUBLE)")} AS metric
       |  FROM u2pieces),
       |trow AS (SELECT 'lm_threshold' AS artifact,
       |    CAST(1 AS BIGINT) AS n_rows,
       |    md5('lm_threshold') AS key_fp,
       |    lm_threshold AS metric
       |  FROM lmthr)
       |SELECT * FROM (
       |  SELECT * FROM mrow UNION ALL SELECT * FROM prow
       |  UNION ALL SELECT * FROM trow)
       |ORDER BY artifact""".stripMargin

  /** The BM25 scoring chain for the fixed query {spark, join, data},
    * ending in `g(doc_id, n_terms, sc)` — shared by the bm25_topk and
    * retrieval_ndcg oracles (mirrors [[bm25Scored]]). */
  private val bm25ChainCtes: String =
    s"""tok AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id,
       |      unnest(string_split_regex(lower(text), '\\s+')) AS w
       |    FROM documents)
       |  WHERE w <> ''),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
       |stats AS (
       |  SELECT count(*) AS nd, CAST(sum(dl) AS BIGINT) AS tt FROM dl),
       |tf AS (
       |  SELECT doc_id, w, count(*) AS tf FROM tok
       |  WHERE w IN ('spark', 'join', 'data') GROUP BY doc_id, w),
       |df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
       |terms AS (
       |  SELECT doc_id, CAST(
       |    ln((CAST(nd - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
       |    * (CAST(tf AS DOUBLE) * 2.2)
       |    / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
       |        (CAST(dl * nd AS DOUBLE) / CAST(tt AS DOUBLE))))
       |    AS DECIMAL(14,10)) AS term
       |  FROM tf JOIN df USING (w) JOIN dl USING (doc_id), stats),
       |g AS (
       |  SELECT doc_id, count(*) AS n_terms, sum(term) AS sc
       |  FROM terms GROUP BY doc_id)""".stripMargin

  /** sgns_step oracle — the full train step replayed relationally,
    * generated from the same SgnsDim/SgnsEta constants the engine runs:
    * pair extraction → md5-derived init → forward/sigmoid (pinned
    * DECIMAL terms) → mean-loss + keyed gradient aggregates → r6'd
    * parameter step → re-evaluated loss. */
  private def sgnsSql(rounds: Int): String = {
    val dims = 1 to SgnsDim
    val hex = "0123456789abcdef"
    val T = SgnsNegTable
    def h16(tag: String, j: Int, wordExpr: String): String =
      (1 to 4).map { i =>
        val w = 1L << (4 * (4 - i))
        s"(strpos('$hex', substring(md5('$tag|$j|' || $wordExpr), $i, 1))" +
          s" - 1) * $w"
      }.mkString(" + ")
    // 48-bit md5 prefix as BIGINT — the slot-draw hash (engine:
    // conv(substring(md5(x),1,12),16,10))
    def h48(e: String): String =
      (1 to 12).map { i =>
        val w = 1L << (4 * (12 - i))
        s"(strpos('$hex', substring(md5($e), $i, 1)) - 1) * $w"
      }.mkString(" + ")
    def init(tag: String, j: Int, wordExpr: String): String =
      s"(CAST(${h16(tag, j, wordExpr)} AS DOUBLE) - 32768.0) / 327680.0"
    def initTab(name: String, tag: String, key: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT $key, ${dims.map(j =>
               s"${init(tag, j, key)} AS ${tag}$j").mkString(",\n    ")}
         |  FROM (SELECT DISTINCT $key FROM pc))""".stripMargin
    def posCte(name: String, u: String, v: String): String = {
      val xp = dims.map(j => s"a.u$j * b.v$j").mkString(" + ")
      s"""$name AS MATERIALIZED (
         |  SELECT *, 1.0 / (1.0 + exp(-xp)) AS sp
         |  FROM (
         |    SELECT t.w, t.c, t.cnt,
         |      ${dims.map(j => s"a.u$j").mkString(", ")},
         |      ${dims.map(j => s"b.v$j").mkString(", ")},
         |      $xp AS xp
         |    FROM pc t
         |    JOIN $u a ON a.w = t.w
         |    JOIN $v b ON b.c = t.c))""".stripMargin
    }
    def negCte(name: String, u: String, v: String): String = {
      val xn = dims.map(j => s"a.u$j * e.v$j").mkString(" + ")
      s"""$name AS MATERIALIZED (
         |  SELECT *, 1.0 / (1.0 + exp(-xn)) AS sn,
         |    1.0 / (1.0 + exp(xn)) AS snm
         |  FROM (
         |    SELECT t.w, t.c, t.cnt, t.nc,
         |      ${dims.map(j => s"a.u$j").mkString(", ")},
         |      ${dims.map(j => s"e.v$j AS nv$j").mkString(", ")},
         |      $xn AS xn
         |    FROM negs t
         |    JOIN $u a ON a.w = t.w
         |    JOIN $v e ON e.c = t.nc))""".stripMargin
    }
    val cd = "CAST(cnt AS DECIMAL(10,0))"
    def lossCte(name: String, ps: String, ns: String): String =
      s"""$name AS (
         |  SELECT round(sum(lt), 6) AS ls FROM (
         |    SELECT CAST(-ln(sp) AS DECIMAL(14,10)) * $cd AS lt FROM $ps
         |    UNION ALL
         |    SELECT CAST(-ln(snm) AS DECIMAL(14,10)) * $cd FROM $ns))"""
        .stripMargin
    def stepTab(name: String, base: String, pref: String, grads: String,
        key: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT $base.$key, ${dims.map(j => r6Sql(
               s"$base.$pref$j - $SgnsEta * " +
                 s"coalesce(CAST(round(g.g$j, 6) AS DOUBLE), 0.0) / nn") +
               s" AS $pref$j").mkString(",\n    ")}
         |  FROM $base LEFT JOIN $grads g ON g.key = $base.$key,
         |    nrow)""".stripMargin
    // keyed gradient over the pos ∪ neg term frame (mirrors gradU/gradV)
    def gradCte(name: String, ps: String, ns: String, posKey: String,
        negKey: String, posVec: String, negVec: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT key, ${dims.map(j => s"sum(t$j * cdv) AS g$j")
             .mkString(", ")}
         |  FROM (
         |    SELECT $posKey AS key, $cd AS cdv, ${dims.map(j =>
               s"CAST((sp - 1) * $posVec$j AS DECIMAL(14,10)) AS t$j")
               .mkString(", ")}
         |    FROM $ps
         |    UNION ALL
         |    SELECT $negKey, $cd, ${dims.map(j =>
               s"CAST(sn * $negVec$j AS DECIMAL(14,10))").mkString(", ")}
         |    FROM $ns)
         |  GROUP BY key)""".stripMargin
    def outRow(r: Int, l: String): String =
      s"""SELECT CAST($r AS BIGINT) AS round, n_pairs, n_words, n_ctx,
         |  ${r6Sql("CAST(ls AS DOUBLE) / nn")} AS loss
         |FROM $l, stats, nrow""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      val p = r - 1
      s"""${gradCte(s"gu$r", s"ps$p", s"ns$p", "w", "w", "v", "nv")},
         |${gradCte(s"gv$r", s"ps$p", s"ns$p", "c", "nc", "u", "u")},
         |${stepTab(s"u$r", s"u$p", "u", s"gu$r", "w")},
         |${stepTab(s"v$r", s"v$p", "v", s"gv$r", "c")},
         |${posCte(s"ps$r", s"u$r", s"v$r")},
         |${negCte(s"ns$r", s"u$r", s"v$r")},
         |${lossCte(s"l$r", s"ps$r", s"ns$r")}""".stripMargin
    }.mkString(",\n")
    s"""WITH $wordsCte,
       |sgidx AS (
       |  SELECT ws, unnest(range(0, len(ws) - 1)) AS i
       |  FROM words WHERE len(ws) >= 2),
       |sgpr AS (
       |  SELECT ws[i + 1] AS w, ws[i + 1 + d] AS c
       |  FROM (SELECT ws, i,
       |          unnest(range(1, least(2, len(ws) - 1 - i) + 1)) AS d
       |        FROM sgidx)),
       |pc AS MATERIALIZED (
       |  SELECT w, c, count(*) AS cnt FROM sgpr GROUP BY w, c),
       |ctot AS (SELECT c, CAST(sum(cnt) AS BIGINT) AS ccnt FROM pc
       |         GROUP BY c),
       |wtab AS (SELECT c, ccnt,
       |  CAST(floor(sqrt(sqrt(CAST(ccnt*ccnt*ccnt AS DOUBLE))))
       |    AS BIGINT) AS wt
       |  FROM ctot),
       |cumt AS (SELECT c, wt,
       |  CAST(coalesce(sum(wt) OVER (ORDER BY ccnt DESC, c
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS BIGINT) AS cum
       |  FROM wtab),
       |twt AS (SELECT CAST(sum(wt) AS BIGINT) AS tw FROM wtab),
       |slots AS MATERIALIZED (
       |  SELECT c AS nc,
       |    unnest(range(($T * cum) // tw, ($T * (cum + wt)) // tw)) AS slot
       |  FROM cumt, twt
       |  WHERE ($T * (cum + wt)) // tw > ($T * cum) // tw),
       |negs AS MATERIALIZED (
       |  SELECT p.w, p.c, p.cnt, td.t, s.nc
       |  FROM pc p
       |  CROSS JOIN (SELECT unnest(range(1, ${SgnsNegK + 1})) AS t) td
       |  JOIN slots s ON s.slot =
       |    (${h48("p.w || '|' || p.c || '|' || CAST(td.t AS VARCHAR)")})
       |      % $T),
       |${initTab("u0", "u", "w")},
       |${initTab("v0", "v", "c")},
       |${posCte("ps0", "u0", "v0")},
       |${negCte("ns0", "u0", "v0")},
       |nrow AS (SELECT CAST(${1 + SgnsNegK} * sum(cnt) AS BIGINT) AS nn
       |         FROM pc),
       |stats AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS n_pairs,
       |    count(DISTINCT w) AS n_words, count(DISTINCT c) AS n_ctx
       |  FROM pc),
       |${lossCte("l0", "ps0", "ns0")},
       |$roundCtes
       |${(0 to rounds).map(r => outRow(r, s"l$r"))
           .mkString("\nUNION ALL\n")}
       |ORDER BY round""".stripMargin
  }

  /** Shared oracle CTEs for tokenized / shingled docs. */
  private val wordsCte =
    """words AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |    w -> w <> '') AS ws FROM documents)""".stripMargin
  private val shCte =
    s"""$wordsCte,
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
       |  FROM words,
       |    (SELECT unnest(range(1, (SELECT max(len(ws)) FROM words) + 1)) AS i)
       |  WHERE i + 2 <= len(ws))""".stripMargin

  /** Shared oracle CTE chain for the MinHash-LSH verified near-dup pairs
    * (ends in `verified(a_id, b_id, jac)` with jac ≥ 0.8) — used by the
    * `minhash_lsh_pairs` key and by CurationQ's end-to-end dedup oracle. */
  private[queries] val minhashPairsCtes: String =
    s"""$shCte,
       |sig AS (SELECT doc_id, count(*) AS n, list(shingle) AS shl,
       |  ${(0 until 8).map(i => s"min(md5('$i|' || shingle)) AS mh$i").mkString(", ")}
       |  FROM sh GROUP BY doc_id),
       |bands AS (SELECT doc_id, i AS band_idx,
       |    CASE i WHEN 0 THEN mh0 || mh1 WHEN 1 THEN mh2 || mh3
       |           WHEN 2 THEN mh4 || mh5 ELSE mh6 || mh7 END AS bucket
       |  FROM sig, (SELECT unnest(range(4)) AS i)),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b USING (band_idx, bucket)
       |  WHERE a.doc_id < b.doc_id),
       |sc AS (SELECT a_id, b_id,
       |    CAST(len(list_intersect(sa.shl, sb.shl)) AS BIGINT) AS inter,
       |    sa.n AS na, sb.n AS nb
       |  FROM cand JOIN sig sa ON a_id = sa.doc_id
       |            JOIN sig sb ON b_id = sb.doc_id),
       |verified AS (
       |  SELECT a_id, b_id,
       |    floor((inter / (na + nb - inter)) * 1000000 + 0.5) / 1000000 AS jac
       |  FROM sc
       |  WHERE floor((inter / (na + nb - inter)) * 1000000 + 0.5) / 1000000 >= 0.8)""".stripMargin

  /** DuckDB SimHash mirror, generated by the same loop as the Spark side. */
  private def simhashSql: String = {
    val bits = (0 until 32).map { k =>
      val hexPos = k / 4
      val shift = 1 << (3 - (k % 4))
      val nib = s"(strpos('0123456789abcdef', substring(md5(w), ${hexPos + 1}, 1)) - 1)"
      s"CASE WHEN len(ws) = 0 THEN '0' WHEN list_reduce(list_transform(ws, w -> ($nib // $shift) % 2 * 2 - 1), (a, b) -> a + b) > 0 THEN '1' ELSE '0' END"
    }.mkString(" || ")
    s"""WITH $wordsCte
       |SELECT doc_id, $bits AS simhash FROM words ORDER BY doc_id""".stripMargin
  }

  /** DuckDB mirror of the numeric 32-bit simhash + banded hamming-1 pairs;
    * per-bit terms generated by the same loop as the Spark side. */
  private def simhashNeardupSql: String = {
    val numTerms = (0 until 32).map { k =>
      val hexPos = k / 4
      val shift = 1 << (3 - (k % 4))
      val nib = s"(strpos('0123456789abcdef', substring(md5(w), ${hexPos + 1}, 1)) - 1)"
      val weight = 1L << (31 - k)
      s"CASE WHEN len(ws) = 0 THEN CAST(0 AS BIGINT) WHEN list_reduce(list_transform(ws, w -> ($nib // $shift) % 2 * 2 - 1), (a, b) -> a + b) > 0 THEN CAST($weight AS BIGINT) ELSE 0 END"
    }.mkString(" + ")
    s"""WITH $wordsCte,
       |sig AS (SELECT doc_id, $numTerms AS num FROM words),
       |bands AS (
       |  SELECT doc_id, num, 0 AS bi, num // 65536 AS bv FROM sig
       |  UNION ALL
       |  SELECT doc_id, num, 1 AS bi, num % 65536 AS bv FROM sig),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |    a.num AS na, b.num AS nb
       |  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv
       |  WHERE a.doc_id < b.doc_id)
       |SELECT a_id, b_id, CAST(bit_count(xor(na, nb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(na, nb)) <= 1
       |ORDER BY a_id, b_id""".stripMargin
  }

  private[queries] val langPredSql =
    """CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
      |     WHEN regexp_matches(text, '[äöüß]') THEN 'de'
      |     WHEN regexp_matches(text, '[áéíóúñ]') THEN 'es'
      |     WHEN regexp_matches(text, '[àâçèêîôû]') THEN 'fr'
      |     ELSE 'en' END""".stripMargin

  val oracle: Map[String, String] = Map(
    "bm25_topk" ->
      s"""WITH $bm25ChainCtes
         |SELECT doc_id, n_terms,
         |  ${r6Sql("CAST(sc AS DOUBLE)")} AS bm25
         |FROM g ORDER BY sc DESC, doc_id LIMIT 20""".stripMargin,
    // Same scoring chain → per-lang BM25 rank → pinned-log2 DCG terms;
    // IDCG from the per-lang grade counts over the 10-rank spine.
    "retrieval_ndcg" ->
      s"""WITH $bm25ChainCtes,
         |sl AS (
         |  SELECT g.doc_id, g.n_terms, g.sc, d.lang
         |  FROM g JOIN documents d USING (doc_id)),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY lang
         |      ORDER BY sc DESC, doc_id) AS rnk FROM sl),
         |dterm AS (
         |  SELECT lang, rnk, n_terms,
         |    CAST((CASE WHEN n_terms = 3 THEN 7.0 WHEN n_terms = 2
         |          THEN 3.0 ELSE 1.0 END) / log2(rnk + 1)
         |      AS DECIMAL(14,10)) AS dterm
         |  FROM ranked WHERE rnk <= $RetrievalK),
         |dagg AS (
         |  SELECT lang, sum(dterm) AS dcg,
         |    min(CASE WHEN n_terms >= 2 THEN rnk END) AS first_rel
         |  FROM dterm GROUP BY lang),
         |cnts AS (
         |  SELECT lang, count(*) AS n_ranked,
         |    CAST(sum(CASE WHEN n_terms = 3 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n3,
         |    CAST(sum(CASE WHEN n_terms = 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n2
         |  FROM sl GROUP BY lang),
         |ideal AS (
         |  SELECT lang, max(n_ranked) AS n_ranked,
         |    sum(CAST((CASE WHEN i <= n3 THEN 7.0
         |          WHEN i <= n3 + n2 THEN 3.0 ELSE 1.0 END) / log2(i + 1)
         |        AS DECIMAL(14,10))) AS idcg
         |  FROM (SELECT c.*, s.i
         |        FROM cnts c, (SELECT unnest(range(1, ${RetrievalK + 1})) AS i) s
         |        WHERE s.i <= c.n_ranked)
         |  GROUP BY lang)
         |SELECT l.lang, l.n_ranked,
         |  ${r6Sql("CAST(dcg AS DOUBLE)")} AS dcg10,
         |  ${r6Sql("CAST(idcg AS DOUBLE)")} AS idcg10,
         |  ${r6Sql("CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE)")} AS ndcg10,
         |  ${r6Sql("coalesce(CAST(1 AS DOUBLE) / first_rel, 0.0)")} AS mrr10
         |FROM ideal l JOIN dagg USING (lang)
         |ORDER BY lang""".stripMargin,
    "zipf_fit" -> {
      val (n, sx, sy) = ("CAST(n AS DOUBLE)", "CAST(sx AS DOUBLE)",
        "CAST(sy AS DOUBLE)")
      val (sxy, sxx, syy) = ("CAST(sxy AS DOUBLE)", "CAST(sxx AS DOUBLE)",
        "CAST(syy AS DOUBLE)")
      val cov = s"($n * $sxy - $sx * $sy)"
      val vx = s"($n * $sxx - $sx * $sx)"
      val vy = s"($n * $syy - $sy * $sy)"
      val slope = s"($cov / $vx)"
      s"""WITH words AS (
         |  SELECT lang, unnest(string_split_regex(lower(text), '\\s+')) AS w
         |  FROM documents),
         |c AS (
         |  SELECT lang, w, count(*) AS cnt FROM words
         |  WHERE w <> '' GROUP BY lang, w),
         |r AS (
         |  SELECT lang, cnt, row_number() OVER (PARTITION BY lang
         |    ORDER BY cnt DESC, w) AS rank FROM c),
         |terms AS (
         |  SELECT lang,
         |    CAST(ln(CAST(rank AS DOUBLE)) AS DECIMAL(14,10)) AS x,
         |    CAST(ln(CAST(cnt AS DOUBLE)) AS DECIMAL(14,10)) AS y
         |  FROM r WHERE rank <= 100),
         |m AS (
         |  SELECT lang, count(*) AS n,
         |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         |    sum(x * x) AS sxx, sum(y * y) AS syy
         |  FROM terms GROUP BY lang)
         |SELECT lang, n,
         |  ${r6Sql(slope)} AS zipf_slope,
         |  ${r6Sql(s"($sy - $slope * $sx) / $n")} AS intercept,
         |  ${r6Sql(s"$cov * $cov / ($vx * $vy)")} AS r2
         |FROM m ORDER BY lang""".stripMargin
    },
    "incremental_neardup" ->
      s"""WITH $shCte,
         |sig AS (SELECT doc_id, count(*) AS n, list(shingle) AS shl,
         |  ${(0 until 8).map(i => s"min(md5('$i|' || shingle)) AS mh$i").mkString(", ")}
         |  FROM sh GROUP BY doc_id),
         |bands AS (SELECT doc_id, i AS band_idx,
         |    CASE i WHEN 0 THEN mh0 || mh1 WHEN 1 THEN mh2 || mh3
         |           WHEN 2 THEN mh4 || mh5 ELSE mh6 || mh7 END AS bucket
         |  FROM sig, (SELECT unnest(range(4)) AS i)),
         |cand AS (SELECT DISTINCT b.doc_id AS b_id, h.doc_id AS h_id
         |  FROM bands b JOIN bands h USING (band_idx, bucket)
         |  WHERE b.doc_id % 4 = 0 AND h.doc_id % 4 <> 0),
         |dup AS (SELECT DISTINCT b_id
         |  FROM (SELECT b_id,
         |      CAST(len(list_intersect(sb.shl, sh2.shl)) AS BIGINT) AS inter,
         |      sb.n AS nb, sh2.n AS nh
         |    FROM cand JOIN sig sb ON b_id = sb.doc_id
         |              JOIN sig sh2 ON h_id = sh2.doc_id)
         |  WHERE floor((inter / (nb + nh - inter)) * 1000000 + 0.5) / 1000000
         |    >= 0.8)
         |SELECT d.source, count(*) AS n_batch,
         |  CAST(sum(CASE WHEN dup.b_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_neardup_hist,
         |  CAST(count(*) - sum(CASE WHEN dup.b_id IS NOT NULL THEN 1 ELSE 0
         |    END) AS BIGINT) AS n_new
         |FROM documents d LEFT JOIN dup ON d.doc_id = dup.b_id
         |WHERE d.doc_id % 4 = 0
         |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "langid_confusion" ->
      s"""WITH p AS (
         |  SELECT lang, $langPredSql AS lang_pred FROM documents),
         |g AS (
         |  SELECT lang, lang_pred, count(*) AS n
         |  FROM p GROUP BY lang, lang_pred)
         |SELECT lang, lang_pred, n,
         |  ${r6Sql("CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY lang)")}
         |    AS row_frac
         |FROM g ORDER BY lang, lang_pred""".stripMargin,
    "unigram_lm_train" -> unigramLmSql,
    "token_unigram_apply" -> unigramApplySql,
    "tokenizer_parity_report" -> tokenizerParitySql,
    "tokenizer_registry" -> tokenizerRegistrySql,
    "corpus_datacard" -> {
      val (zn, sx, sy) = ("CAST(zn AS DOUBLE)", "CAST(sx AS DOUBLE)",
        "CAST(sy AS DOUBLE)")
      val (sxy, sxx) = ("CAST(sxy AS DOUBLE)", "CAST(sxx AS DOUBLE)")
      val cov = s"($zn * $sxy - $sx * $sy)"
      val vx = s"($zn * $sxx - $sx * $sx)"
      s"""WITH $wordsCte,
         |base AS (
         |  SELECT source, lang, count(*) AS n_docs
         |  FROM documents GROUP BY 1, 2),
         |hh AS (
         |  SELECT source, lang,
         |    md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS h
         |  FROM documents),
         |hc AS (SELECT h, count(*) AS hc FROM hh GROUP BY h),
         |dup AS (
         |  SELECT source, lang,
         |    CAST(sum(CASE WHEN hc.hc > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dup
         |  FROM hh JOIN hc USING (h) GROUP BY 1, 2),
         |bgr AS (
         |  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
         |  FROM words,
         |    (SELECT unnest(range(1, (SELECT max(len(ws)) FROM words) + 1))
         |      AS i)
         |  WHERE i + 1 <= len(ws)),
         |uni AS (
         |  SELECT w, count(*) AS c1 FROM (
         |    SELECT unnest(ws) AS w FROM words WHERE doc_id % 17 <> 0)
         |  GROUP BY w),
         |vv AS (SELECT count(*) AS v FROM uni),
         |c2g AS (SELECT w1, w2, count(*) AS c2 FROM bgr
         |       WHERE doc_id % 17 <> 0 GROUP BY w1, w2),
         |lmterms AS (
         |  SELECT bgr.doc_id, CAST(ln(
         |      CAST(coalesce(c2g.c2, 0) + 1 AS DOUBLE) /
         |      CAST(coalesce(uni.c1, 0) + vv.v AS DOUBLE))
         |    AS DECIMAL(14,10)) AS term
         |  FROM bgr
         |  LEFT JOIN c2g ON bgr.w1 = c2g.w1 AND bgr.w2 = c2g.w2
         |  LEFT JOIN uni ON bgr.w1 = uni.w
         |  CROSS JOIN vv),
         |lmscored AS (
         |  SELECT doc_id,
         |    ${r6Sql("CAST(sum(term) AS DOUBLE) / count(*)")} AS score
         |  FROM lmterms GROUP BY doc_id),
         |lmranked AS (
         |  SELECT score, row_number() OVER (ORDER BY score) AS rn,
         |    count(*) OVER () AS n
         |  FROM lmscored),
         |lmthr AS (
         |  SELECT max(CASE WHEN rn = (3 * n + 9) // 10 THEN score END)
         |    AS lm_threshold FROM lmranked),
         |kept AS (
         |  SELECT d.source, d.lang,
         |    CAST(sum(CASE WHEN s.score IS NOT NULL
         |      AND s.score > t.lm_threshold THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_kept
         |  FROM documents d LEFT JOIN lmscored s USING (doc_id)
         |  CROSS JOIN lmthr t GROUP BY 1, 2),
         |wcd AS (
         |  SELECT d.source, d.lang, x.w, count(*) AS c
         |  FROM documents d, (SELECT doc_id, unnest(ws) AS w FROM words) x
         |  WHERE d.doc_id = x.doc_id GROUP BY 1, 2, 3),
         |tot AS (
         |  SELECT source, lang, CAST(sum(c) AS BIGINT) AS n_tokens
         |  FROM wcd GROUP BY 1, 2),
         |ent AS (
         |  SELECT source, lang,
         |    ${r6Sql("CAST(sum(term) AS DOUBLE)")} AS entropy_nats
         |  FROM (
         |    SELECT wcd.source, wcd.lang,
         |      CAST(-(wcd.c / t.n_tokens) * ln(wcd.c / t.n_tokens)
         |        AS DECIMAL(14,10)) AS term
         |    FROM wcd JOIN tot t USING (source, lang))
         |  GROUP BY 1, 2),
         |zr AS (
         |  SELECT source, lang, c, row_number() OVER (
         |    PARTITION BY source, lang ORDER BY c DESC, w) AS rank
         |  FROM wcd),
         |zt AS (
         |  SELECT source, lang,
         |    CAST(ln(CAST(rank AS DOUBLE)) AS DECIMAL(14,10)) AS x,
         |    CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(14,10)) AS y
         |  FROM zr WHERE rank <= 100),
         |zm AS (
         |  SELECT source, lang, count(*) AS zn,
         |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         |    sum(x * x) AS sxx
         |  FROM zt GROUP BY 1, 2),
         |zipf AS (
         |  SELECT source, lang,
         |    ${r6Sql(s"$cov / nullif($vx, 0.0)")} AS zipf_slope
         |  FROM zm)
         |SELECT b.source, b.lang, b.n_docs,
         |  coalesce(t.n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
         |  ${r6Sql("CAST(dup.n_dup AS DOUBLE) / b.n_docs")} AS dup_rate,
         |  ${r6Sql("CAST(k.n_kept AS DOUBLE) / b.n_docs")} AS lm_kept_rate,
         |  e.entropy_nats, z.zipf_slope
         |FROM base b
         |JOIN dup USING (source, lang)
         |JOIN kept k USING (source, lang)
         |LEFT JOIN tot t USING (source, lang)
         |LEFT JOIN ent e USING (source, lang)
         |LEFT JOIN zipf z USING (source, lang)
         |ORDER BY source, lang""".stripMargin
    },
    // Capstone oracle: the full curate→tokenize→pack chain replayed
    // relationally — BPE training CTEs (vocab6 = the segmentation),
    // the add-one bigram LM + exact-rank threshold, the trained
    // classifier gate chain (r13, CurationQ.clfGateCtes), the gate
    // chain, and the per-(source, split) prefix-sum packing.
    "pretrain_pipeline_e2e" ->
      s"""WITH $bpeVocabCtes,
         |${CurationQ.clfGateCtes},
         |$lmGateSqlCtes,
         |dw AS (
         |  SELECT d.doc_id, d.source, d.n_chars, d.lang, d.text, words.ws
         |  FROM documents d JOIN words USING (doc_id)),
         |f1 AS (
         |  SELECT * FROM dw WHERE ($langPredSql) = lang),
         |f2 AS (
         |  SELECT * FROM f1
         |  WHERE len(ws) >= 10
         |    AND len(list_distinct(ws)) / nullif(len(ws), 0) >= 0.3),
         |fq AS (
         |  SELECT f2.* FROM f2
         |  JOIN lmscored s USING (doc_id) CROSS JOIN lmthr t
         |  WHERE s.score > t.lm_threshold),
         |fc AS (
         |  SELECT fq.* FROM fq
         |  JOIN clfscored cs USING (doc_id) CROSS JOIN clfthr ct
         |  WHERE cs.score > ct.clf_threshold),
         |dd AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))
         |    ORDER BY doc_id) AS rk
         |  FROM fc),
         |f3 AS (SELECT * FROM dd WHERE rk = 1),
         |cc AS (
         |  SELECT *,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS srk,
         |    count(*) OVER (PARTITION BY source) AS scnt
         |  FROM f3),
         |f4 AS (SELECT * FROM cc WHERE srk <= (scnt + 1) // 2),
         |sp AS (
         |  SELECT *, CASE
         |    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
         |      THEN 'train'
         |    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
         |      THEN 'valid'
         |    ELSE 'test' END AS split
         |  FROM f4),
         |dtok AS (
         |  SELECT doc_id, CAST(sum(len(syms)) AS BIGINT) AS tok
         |  FROM (SELECT doc_id, unnest(ws) AS word FROM sp)
         |  JOIN vocab6 USING (word) GROUP BY doc_id),
         |alltok AS (
         |  SELECT sp.doc_id, sp.source, sp.split,
         |    coalesce(t.tok, CAST(0 AS BIGINT)) AS tok
         |  FROM sp LEFT JOIN dtok t USING (doc_id)),
         |binned AS (
         |  SELECT source, split, doc_id, tok,
         |    CAST((sum(tok) OVER (PARTITION BY source, split
         |      ORDER BY doc_id) - tok) // 512 AS BIGINT) AS bin
         |  FROM alltok)
         |SELECT source, split, bin, count(*) AS n_docs,
         |  CAST(sum(tok) AS BIGINT) AS sum_tok,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM binned GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "curation_pipeline_e2e" ->
      s"""WITH w AS (
         |  SELECT doc_id, source, n_chars, lang, text,
         |    list_filter(string_split_regex(lower(text), '\\s+'),
         |      x -> x <> '') AS ws
         |  FROM documents),
         |f1 AS (
         |  SELECT * FROM w WHERE ($langPredSql) = lang),
         |f2 AS (
         |  SELECT * FROM f1
         |  WHERE len(ws) >= 10
         |    AND len(list_distinct(ws)) / nullif(len(ws), 0) >= 0.3),
         |d AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))
         |    ORDER BY doc_id) AS rk
         |  FROM f2),
         |f3 AS (SELECT * FROM d WHERE rk = 1),
         |c AS (
         |  SELECT *,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS srk,
         |    count(*) OVER (PARTITION BY source) AS scnt
         |  FROM f3),
         |f4 AS (SELECT * FROM c WHERE srk <= (scnt + 1) // 2),
         |sp AS (
         |  SELECT *, CASE
         |    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
         |      THEN 'train'
         |    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
         |      THEN 'valid'
         |    ELSE 'test' END AS split
         |  FROM f4)
         |SELECT source, split, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM sp GROUP BY source, split ORDER BY source, split""".stripMargin,
    "inverted_postings" ->
      s"""WITH $wordsCte,
         |tw AS (SELECT DISTINCT doc_id, unnest(ws) AS w FROM words)
         |SELECT w, count(*) AS df,
         |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
         |    AS postings
         |FROM tw GROUP BY w ORDER BY df DESC, w LIMIT 20""".stripMargin,
    "rep_ngram_audit" ->
      s"""WITH w AS (
         |  SELECT doc_id, lang, source,
         |    list_filter(string_split_regex(lower(text), '\\s+'),
         |      x -> x <> '') AS ws
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, lang, source,
         |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
         |  FROM w, (SELECT unnest(range(1,
         |      (SELECT max(len(ws)) FROM w) + 1)) AS i)
         |  WHERE i + 2 <= len(ws)),
         |per AS (
         |  SELECT doc_id, lang, source, count(*) AS n_grams,
         |    count(DISTINCT g) AS n_uniq
         |  FROM g GROUP BY doc_id, lang, source)
         |SELECT lang, source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN n_grams > n_uniq THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_rep_docs,
         |  max(n_grams - n_uniq) AS max_dup,
         |  CAST(sum(n_grams - n_uniq) AS BIGINT) AS sum_dup,
         |  CAST(sum(n_grams) AS BIGINT) AS sum_grams,
         |  ${r6Sql("CAST(sum(n_grams - n_uniq) AS DOUBLE) / sum(n_grams)")}
         |    AS dup_frac
         |FROM per GROUP BY lang, source
         |ORDER BY lang, source""".stripMargin,
    "dup_sequences" ->
      s"""WITH $wordsCte,
         |s AS (
         |  SELECT doc_id,
         |    ws[i]   || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
         |    ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' ||
         |    ws[i+6] || ' ' || ws[i+7] || ' ' || ws[i+8] || ' ' || ws[i+9]
         |      AS seq
         |  FROM words, (SELECT unnest(range(1,
         |      (SELECT max(len(ws)) FROM words) + 1)) AS i)
         |  WHERE i + 9 <= len(ws))
         |SELECT seq, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
         |FROM s GROUP BY seq HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY n_docs DESC, n_occ DESC, seq LIMIT 20""".stripMargin,
    "bpe_train_merges" -> bpeTrainSql,
    "token_bpe_apply" -> bpeApplySql,
    "pack_tokens_bpe" -> bpePackSql,
    "tokenize_corpus_sink" -> bpeCorpusSinkSql,
    // Recursive min-reachable-label mirror of the propagation fixpoint
    // (the neardup_clusters oracle device) over the JW candidate graph.
    "entity_dedup_e2e" ->
      s"""WITH RECURSIVE nms AS (
         |  SELECT lower(p_name) AS nm, count(*) AS cnt FROM part
         |  GROUP BY 1),
         |b AS (SELECT nm, cnt, nm[1:1] AS blk, len(nm) AS l FROM nms),
         |pr AS (
         |  SELECT a.nm AS a, b2.nm AS b FROM b a JOIN b b2
         |  ON a.blk = b2.blk AND a.nm < b2.nm AND abs(a.l - b2.l) <= 3
         |  WHERE ${r6Sql("jaro_winkler_similarity(a.nm, b2.nm)")}
         |    >= 0.84),
         |adj AS (SELECT a AS src, b AS dst FROM pr
         |        UNION ALL SELECT b, a FROM pr),
         |walk(id, r) AS (
         |  SELECT DISTINCT src, src FROM adj
         |  UNION
         |  SELECT a.src, w.r FROM adj a JOIN walk w ON a.dst = w.id),
         |lbl AS (SELECT id, min(r) AS cluster_id FROM walk GROUP BY id),
         |j AS (
         |  SELECT l.cluster_id, l.id, n.cnt,
         |    row_number() OVER (PARTITION BY l.cluster_id
         |      ORDER BY n.cnt DESC, l.id) AS srn
         |  FROM lbl l JOIN nms n ON n.nm = l.id)
         |SELECT cluster_id, count(*) AS n_names,
         |  CAST(sum(cnt) AS BIGINT) AS n_records,
         |  max(CASE WHEN srn = 1 THEN id END) AS survivor
         |FROM j GROUP BY cluster_id HAVING count(*) >= 2
         |ORDER BY cluster_id""".stripMargin,
    // Same blocking + DuckDB's own jaro_winkler_similarity (semantics
    // probed equal to graft_jaro_winkler: byte-wise match window,
    // 0.7 boost threshold, prefix ≤ 4).
    "jw_linkage" ->
      s"""WITH names AS (
         |  SELECT lower(p_name) AS nm, count(*) AS cnt FROM part
         |  GROUP BY 1),
         |b AS (SELECT nm, cnt, nm[1:1] AS blk, len(nm) AS l FROM names),
         |sc AS (
         |  SELECT a.nm AS name_a, b2.nm AS name_b,
         |    ${r6Sql("jaro_winkler_similarity(a.nm, b2.nm)")} AS jw,
         |    a.cnt * b2.cnt AS n_record_pairs
         |  FROM b a JOIN b b2
         |    ON a.blk = b2.blk AND a.nm < b2.nm
         |    AND abs(a.l - b2.l) <= 3)
         |SELECT name_a, name_b, jw, n_record_pairs FROM sc
         |WHERE jw >= 0.8 AND jw < 1.0
         |ORDER BY jw DESC, name_a, name_b LIMIT 20""".stripMargin,
    // Diagonal-runs maximal repeats: matching 10-token windows grouped by
    // (pair, pa − pb) split into consecutive-pa islands; island size k ⇒
    // span length k + 9; per-pair argmax re-slices the text from doc a.
    "maximal_repeat_spans" ->
      s"""WITH $wordsCte,
         |seeds AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    ws[i]   || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
         |    ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' ||
         |    ws[i+6] || ' ' || ws[i+7] || ' ' || ws[i+8] || ' ' || ws[i+9]
         |      AS seq
         |  FROM words, (SELECT unnest(range(1,
         |      (SELECT max(len(ws)) FROM words) + 1)) AS i)
         |  WHERE i + 9 <= len(ws)),
         |m AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.pos AS pa,
         |    b.pos AS pb
         |  FROM seeds a JOIN seeds b
         |    ON a.seq = b.seq AND a.doc_id < b.doc_id),
         |isl AS (
         |  SELECT a_id, b_id, pa - pb AS diag, pa,
         |    pa - row_number() OVER (PARTITION BY a_id, b_id, pa - pb
         |      ORDER BY pa) AS grp
         |  FROM m),
         |sp AS (
         |  SELECT a_id, b_id, diag, min(pa) AS start_a,
         |    count(*) + 9 AS len_tokens
         |  FROM isl GROUP BY a_id, b_id, diag, grp),
         |best AS (
         |  SELECT *, row_number() OVER (PARTITION BY a_id, b_id
         |    ORDER BY len_tokens DESC, start_a, diag) AS rn
         |  FROM sp)
         |SELECT b.a_id, b.b_id, b.len_tokens, b.start_a,
         |  array_to_string(w.ws[b.start_a + 1 : b.start_a + b.len_tokens],
         |    ' ') AS span_text
         |FROM best b JOIN words w ON w.doc_id = b.a_id
         |WHERE b.rn = 1
         |ORDER BY len_tokens DESC, a_id, b_id LIMIT 20""".stripMargin,
    "dedup_spans_sink" ->
      s"""WITH $wordsCte,
         |seeds AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    ws[i]   || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
         |    ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' ||
         |    ws[i+6] || ' ' || ws[i+7] || ' ' || ws[i+8] || ' ' || ws[i+9]
         |      AS seq
         |  FROM words, (SELECT unnest(range(1,
         |      (SELECT max(len(ws)) FROM words) + 1)) AS i)
         |  WHERE i + 9 <= len(ws)),
         |m AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.pos AS pa,
         |    b.pos AS pb
         |  FROM seeds a JOIN seeds b
         |    ON a.seq = b.seq AND a.doc_id < b.doc_id),
         |isl0 AS (
         |  SELECT a_id, b_id, pa - pb AS diag, pa,
         |    pa - row_number() OVER (PARTITION BY a_id, b_id, pa - pb
         |      ORDER BY pa) AS grp
         |  FROM m),
         |isl AS (
         |  SELECT a_id, b_id, diag, grp,
         |    min(pa - diag) AS start_b, count(*) + 9 AS len
         |  FROM isl0 GROUP BY a_id, b_id, diag, grp),
         |cut AS (
         |  SELECT DISTINCT b_id AS doc_id, start_b + u AS pos
         |  FROM isl, (SELECT unnest(range(0,
         |      (SELECT max(len) FROM isl) + 1)) AS u)
         |  WHERE u < len),
         |wtok AS (
         |  SELECT doc_id, i - 1 AS pos, ws[i] AS tok
         |  FROM words, (SELECT unnest(range(1,
         |      (SELECT max(len(ws)) FROM words) + 1)) AS i)
         |  WHERE i <= len(ws)),
         |kepttok AS (
         |  SELECT wt.doc_id, wt.pos, wt.tok
         |  FROM wtok wt LEFT JOIN cut c
         |    ON c.doc_id = wt.doc_id AND c.pos = wt.pos
         |  WHERE c.doc_id IS NULL),
         |docs2 AS (
         |  SELECT doc_id, list(tok ORDER BY pos) AS kept
         |  FROM kepttok GROUP BY doc_id),
         |full2 AS (
         |  SELECT d.doc_id, d.source,
         |    CAST(len(w.ws) AS BIGINT) AS tok_before,
         |    CAST(coalesce(len(k.kept), 0) AS BIGINT) AS tok_after,
         |    md5(array_to_string(coalesce(k.kept, CAST([] AS VARCHAR[])),
         |      ' ')) AS fp
         |  FROM documents d JOIN words w USING (doc_id)
         |  LEFT JOIN docs2 k USING (doc_id))
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN tok_after < tok_before THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_docs_cut,
         |  CAST(sum(tok_before) AS BIGINT) AS tok_before,
         |  CAST(sum(tok_after) AS BIGINT) AS tok_after,
         |  min(fp) AS fp_min, max(fp) AS fp_max
         |FROM full2 GROUP BY source ORDER BY source""".stripMargin,
    "sgns_step" -> sgnsSql(1),
    "sgns_train" -> sgnsSql(SgnsTrainRounds),
    "skipgram_pairs" ->
      s"""WITH $wordsCte,
         |idx AS (
         |  SELECT ws, unnest(range(0, len(ws) - 1)) AS i
         |  FROM words WHERE len(ws) >= 2),
         |pairs AS (
         |  SELECT ws[i + 1] || ' ' || ws[i + 1 + d] AS pair
         |  FROM (SELECT ws, i,
         |          unnest(range(1, least(2, len(ws) - 1 - i) + 1)) AS d
         |        FROM idx))
         |SELECT pair, count(*) AS cnt FROM pairs
         |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,
    "token_entropy" ->
      s"""WITH counts AS (
         |  SELECT lang, w AS word, count(*) AS c FROM (
         |    SELECT lang, unnest(list_filter(
         |      string_split_regex(lower(text), '\\s+'), w -> w <> '')) AS w
         |    FROM documents)
         |  GROUP BY lang, w),
         |tot AS (SELECT lang, sum(c) AS tot FROM counts GROUP BY lang)
         |SELECT lang, count(*) AS n_words,
         |  ${r6Sql("CAST(sum(CAST(-(c / tot) * ln(c / tot) AS DECIMAL(14,10))) AS DOUBLE)")} AS entropy_nats
         |FROM counts JOIN tot USING (lang)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "typo_neardup_words" ->
      """WITH w AS (
        |  SELECT DISTINCT word FROM (
        |    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        |    FROM documents
        |    UNION ALL
        |    SELECT unnest(regexp_extract_all(lower(p_name), '[a-z]+'))
        |    FROM part)
        |  WHERE length(word) BETWEEN 3 AND 20),
        |v AS (
        |  SELECT word, unnest(list_distinct(list_prepend(word,
        |    list_transform(generate_series(1, length(word)),
        |      i -> word[1:i-1] || word[i+1:length(word)])))) AS variant
        |  FROM w),
        |c AS (
        |  SELECT DISTINCT a.word AS a_word, b.word AS b_word
        |  FROM v a JOIN v b USING (variant)
        |  WHERE a.word < b.word)
        |SELECT a_word, b_word,
        |  CAST(levenshtein(a_word, b_word) AS BIGINT) AS dist
        |FROM c WHERE levenshtein(a_word, b_word) <= 1
        |ORDER BY a_word, b_word""".stripMargin,
    "doc_chunks" ->
      s"""WITH $wordsCte,
         |st AS (
         |  SELECT doc_id, ws, unnest(range(1, len(ws) + 1, 15)) AS start
         |  FROM words)
         |SELECT doc_id,
         |  CAST((start - 1) // 15 AS BIGINT) AS chunk_id,
         |  array_to_string(ws[start : least(start + 19, len(ws))], ' ')
         |    AS chunk_text,
         |  CAST(least(len(ws) - start + 1, 20) AS BIGINT) AS n_tok
         |FROM st ORDER BY doc_id, chunk_id""".stripMargin,
    "simhash_neardup" -> simhashNeardupSql,
    "ngram_profile" ->
      """WITH t AS (SELECT lang, lower(text) AS txt FROM documents),
        |bgs AS (
        |  SELECT lang, substring(txt, i, 2) AS bg
        |  FROM t, (SELECT unnest(range(1, (SELECT max(length(txt)) FROM t))) AS i)
        |  WHERE i + 1 <= length(txt)),
        |c AS (
        |  SELECT lang, bg, count(*) AS cnt FROM bgs
        |  WHERE regexp_matches(bg, '^[a-z]{2}$')
        |  GROUP BY lang, bg),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang
        |        ORDER BY cnt DESC, bg) AS BIGINT) AS rn FROM c)
        |SELECT lang, bg, cnt, rn FROM r WHERE rn <= 5
        |ORDER BY lang, rn""".stripMargin,
    "kn_lm_prob" ->
      s"""WITH $wordsCte,
         |bg AS (
         |  SELECT ws[i] AS w1, ws[i + 1] AS w2
         |  FROM words,
         |    (SELECT unnest(range(1, (SELECT max(len(ws)) FROM words))) AS i)
         |  WHERE i + 1 <= len(ws)),
         |bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab
         |       FROM bg GROUP BY w1, w2),
         |rm AS (SELECT w1, CAST(count(*) AS BIGINT) AS r_a
         |       FROM bg GROUP BY w1),
         |fol AS (SELECT w1, CAST(count(*) AS BIGINT) AS n_fol
         |        FROM bi GROUP BY w1),
         |prec AS (SELECT w2, CAST(count(*) AS BIGINT) AS n_prec
         |         FROM bi GROUP BY w2),
         |tt AS (SELECT CAST(count(*) AS BIGINT) AS t_types FROM bi)
         |SELECT bi.w1 AS w1, bi.w2 AS w2, c_ab,
         |  ${r6Sql("CAST(c_ab AS DOUBLE) / CAST(r_a AS DOUBLE)")} AS p_mle,
         |  ${r6Sql("greatest(CAST(c_ab AS DOUBLE) - 0.75, 0.0) /" +
             " CAST(r_a AS DOUBLE) +" +
             " 0.75 * CAST(n_fol AS DOUBLE) / CAST(r_a AS DOUBLE) *" +
             " (CAST(n_prec AS DOUBLE) / CAST(t_types AS DOUBLE))")}
         |    AS p_kn
         |FROM bi
         |  JOIN rm ON rm.w1 = bi.w1
         |  JOIN fol ON fol.w1 = bi.w1
         |  JOIN prec ON prec.w2 = bi.w2, tt
         |WHERE c_ab >= 10
         |ORDER BY c_ab DESC, bi.w1, bi.w2 LIMIT 20""".stripMargin,
    "js_divergence" ->
      s"""WITH tok AS (
         |  SELECT source, unnest(list_filter(
         |    string_split_regex(lower(text), '\\s+'), w -> w <> '')) AS w
         |  FROM documents),
         |sw AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c_sw
         |       FROM tok GROUP BY source, w),
         |st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
         |       FROM tok GROUP BY source),
         |cw AS (SELECT w, CAST(count(*) AS BIGINT) AS c_w
         |       FROM tok GROUP BY w),
         |na AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM tok),
         |sp AS (
         |  SELECT st.source, st.n_s, cw.w, cw.c_w,
         |    coalesce(sw.c_sw, 0) AS c_sw
         |  FROM st CROSS JOIN cw
         |  LEFT JOIN sw ON sw.source = st.source AND sw.w = cw.w),
         |pq AS (
         |  SELECT source, n_s,
         |    CAST(c_sw AS DOUBLE) / CAST(n_s AS DOUBLE) AS p,
         |    CAST(c_w AS DOUBLE) / CAST(n_all AS DOUBLE) AS q
         |  FROM sp, na),
         |pqm AS (SELECT source, n_s, p, q, (p + q) / 2.0 AS m FROM pq),
         |tm AS (
         |  SELECT source, n_s,
         |    CAST(CASE WHEN p > 0 THEN 0.5 * p * ln(p / m) ELSE 0.0 END
         |      + 0.5 * q * ln(q / m) AS DECIMAL(14,10)) AS term
         |  FROM pqm)
         |SELECT source, max(n_s) AS n_tokens,
         |  ${r6Sql("CAST(sum(term) AS DOUBLE)")} AS jsd
         |FROM tm GROUP BY source ORDER BY source""".stripMargin,
    "collocation_llr" -> {
      // One mirrored double term per contingency cell: k·ln(k·N/(R·C)),
      // 0 at k = 0 — parenthesization matches the Spark expression.
      def llrTerm(k: String, r: String, c: String): String =
        s"CASE WHEN $k > 0 THEN CAST($k AS DOUBLE) * " +
          s"ln(CAST($k AS DOUBLE) * CAST(n_bi AS DOUBLE) / " +
          s"(CAST($r AS DOUBLE) * CAST($c AS DOUBLE))) ELSE 0.0 END"
      s"""WITH $wordsCte,
         |bg AS (
         |  SELECT ws[i] AS w1, ws[i + 1] AS w2
         |  FROM words,
         |    (SELECT unnest(range(1, (SELECT max(len(ws)) FROM words))) AS i)
         |  WHERE i + 1 <= len(ws)),
         |bi AS (SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY w1, w2),
         |rm AS (SELECT w1, CAST(count(*) AS BIGINT) AS r_a
         |       FROM bg GROUP BY w1),
         |cm AS (SELECT w2, CAST(count(*) AS BIGINT) AS c_b
         |       FROM bg GROUP BY w2),
         |nbi AS (SELECT CAST(count(*) AS BIGINT) AS n_bi FROM bg),
         |cand AS (
         |  SELECT bi.w1, bi.w2, CAST(c_ab AS BIGINT) AS c_ab, r_a, c_b, n_bi
         |  FROM bi JOIN rm ON rm.w1 = bi.w1 JOIN cm ON cm.w2 = bi.w2, nbi
         |  WHERE c_ab >= 10)
         |SELECT w1, w2, c_ab,
         |  ${r6Sql("2.0 * (" +
             llrTerm("c_ab", "r_a", "c_b") + " + " +
             llrTerm("r_a - c_ab", "r_a", "n_bi - c_b") + " + " +
             llrTerm("c_b - c_ab", "n_bi - r_a", "c_b") + " + " +
             llrTerm("n_bi - r_a - c_b + c_ab", "n_bi - r_a", "n_bi - c_b") +
             ")")} AS llr
         |FROM cand
         |ORDER BY llr DESC, w1, w2 LIMIT 20""".stripMargin
    },
    "bigram_pmi" ->
      s"""WITH $wordsCte,
         |bg AS (
         |  SELECT ws[i] AS w1, ws[i + 1] AS w2
         |  FROM words,
         |    (SELECT unnest(range(1, (SELECT max(len(ws)) FROM words))) AS i)
         |  WHERE i + 1 <= len(ws)),
         |bi AS (SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY w1, w2),
         |nbi AS (SELECT count(*) AS n_bi FROM bg),
         |uniw AS (SELECT unnest(ws) AS w FROM words),
         |uni AS (SELECT w, count(*) AS c_w FROM uniw GROUP BY w),
         |nuni AS (SELECT count(*) AS n_uni FROM uniw)
         |SELECT w1, w2, c_ab,
         |  ${r6Sql("ln((c_ab / n_bi) / ((a.c_w / n_uni) * (b.c_w / n_uni)))")}
         |    AS pmi
         |FROM bi
         |  JOIN uni a ON a.w = bi.w1
         |  JOIN uni b ON b.w = bi.w2, nbi, nuni
         |WHERE c_ab >= 10
         |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,
    "token_bpe" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
        |    AS n_word,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_num,
        |  CAST(len(regexp_extract_all(lower(text), '[^a-z0-9\s]+')) AS BIGINT)
        |    AS n_punct,
        |  CAST(coalesce(list_aggregate(list_transform(
        |    regexp_extract_all(lower(text), '[a-z]+'), w -> length(w)),
        |    'max'), 0) AS BIGINT) AS max_word_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "qdedup_docs" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |    row_number() OVER (
        |      PARTITION BY regexp_replace(lower(text), '\s+', ' ', 'g')
        |      ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "qtext_wordcount" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
        |  FROM documents)
        |WHERE word <> '' GROUP BY word
        |ORDER BY cnt DESC, word LIMIT 20""".stripMargin,
    "neardup_pairs" ->
      s"""WITH $shCte,
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
         |       FROM sh a JOIN sh b USING (shingle)
         |       WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT a_id, b_id,
         |  floor((inter / (sa.n + sb.n - inter)) * 1000000 + 0.5) / 1000000 AS jac
         |FROM pr JOIN sz sa ON a_id = sa.doc_id JOIN sz sb ON b_id = sb.doc_id
         |WHERE floor((inter / (sa.n + sb.n - inter)) * 1000000 + 0.5) / 1000000 >= 0.8
         |ORDER BY a_id, b_id""".stripMargin,
    "minhash_lsh_pairs" ->
      s"""WITH $minhashPairsCtes
         |SELECT a_id, b_id, jac FROM verified
         |ORDER BY a_id, b_id""".stripMargin,
    "simhash_docs" -> simhashSql,
    "text_fingerprint" ->
      s"""WITH $wordsCte
         |SELECT doc_id,
         |  substring(md5(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 16)
         |    AS fp16,
         |  list_min(list_transform(ws, w -> md5(w))) AS min_word_hash,
         |  CAST(len(ws) AS BIGINT) AS n_tokens
         |FROM words JOIN documents USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "lexicon_score" ->
      """SELECT d.doc_id, d.lang, coalesce(h.score, 0) AS score
        |FROM documents d LEFT JOIN (
        |  SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS word
        |    FROM documents) t
        |  JOIN (VALUES ('fast', 1), ('big', 1), ('slow', -1), ('dup', -1))
        |    lex(word, wt) USING (word)
        |  GROUP BY doc_id) h
        |ON d.doc_id = h.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "tfidf_top_terms" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS word
        |  FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok
        |       WHERE word <> '' GROUP BY doc_id, word),
        |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (SELECT doc_id, word,
        |    floor((tf * ln(CAST(n_docs AS DOUBLE) / df)) * 1000000 + 0.5) / 1000000 AS score_r,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY floor((tf * ln(CAST(n_docs AS DOUBLE) / df)) * 1000000 + 0.5) / 1000000 DESC,
        |               word) AS rn
        |  FROM tf JOIN df USING (word) CROSS JOIN n)
        |SELECT doc_id, word AS term, score_r FROM sc WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """SELECT doc_id, lang,
        |  CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
        |       WHEN regexp_matches(text, '[äöüß]') THEN 'de'
        |       WHEN regexp_matches(text, '[áéíóúñ]') THEN 'es'
        |       WHEN regexp_matches(text, '[àâçèêîôû]') THEN 'fr'
        |       ELSE 'en' END AS lang_pred,
        |  CAST(CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
        |       WHEN regexp_matches(text, '[äöüß]') THEN 'de'
        |       WHEN regexp_matches(text, '[áéíóúñ]') THEN 'es'
        |       WHEN regexp_matches(text, '[àâçèêîôû]') THEN 'fr'
        |       ELSE 'en' END = lang AS BIGINT) AS is_match
        |FROM documents ORDER BY doc_id""".stripMargin,
    "quality_score" ->
      s"""WITH $wordsCte,
         |f AS (SELECT doc_id,
         |    CAST(len(ws) AS BIGINT) AS n_tokens,
         |    floor((len(list_distinct(ws)) / nullif(len(ws), 0)) * 1000000 + 0.5) / 1000000 AS ttr,
         |    floor((len(list_filter(ws, w -> w IN ('a', 'the'))) / nullif(len(ws), 0)) * 1000000 + 0.5) / 1000000
         |      AS stop_ratio,
         |    floor((list_reduce(list_transform(ws, w -> CAST(length(w) AS INT)),
         |      (a, b) -> a + b) / nullif(len(ws), 0)) * 1000000 + 0.5) / 1000000 AS mean_wlen
         |  FROM words)
         |SELECT doc_id, n_tokens, ttr, stop_ratio, mean_wlen,
         |  floor((0.5 * ttr + 0.3 * (1.0 - stop_ratio) +
         |        0.2 * least(mean_wlen / 10, 1.0)) * 1000000 + 0.5) / 1000000 AS quality
         |FROM f ORDER BY doc_id""".stripMargin,
    "token_count" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |    w -> w <> '')) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha,
        |  n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The tokensCjk contract replayed: whitespace split everywhere, then
    // pure-CJK tokens of ≥ 2 chars expand to their char bigrams (the
    // same substring walk, codepoint semantics on both engines); Latin
    // rows grade the no-op, the inline zh rows grade the fallback.
    "cjk_bigram_tokens" ->
      """WITH allx AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (1000001, '深度学习模型训练'),
        |    (1000002, '大规模数据处理系统 with ascii tokens'),
        |    (1000003, '混合 text 分词 test')) v(doc_id, text)),
        |w0 AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '\s+'), w -> w <> '')) AS tok
        |  FROM allx),
        |cjk AS (SELECT doc_id, tok FROM w0
        |        WHERE regexp_matches(tok, '^[一-鿿]+$') AND len(tok) >= 2),
        |tk AS (
        |  SELECT doc_id, substring(tok, CAST(i AS INTEGER), 2) AS tok
        |  FROM cjk, (SELECT unnest(range(1,
        |      (SELECT coalesce(max(len(tok)), 1) FROM cjk) + 1)) AS i)
        |  WHERE i <= len(tok) - 1
        |  UNION ALL
        |  SELECT doc_id, tok FROM w0
        |  WHERE NOT (regexp_matches(tok, '^[一-鿿]+$') AND len(tok) >= 2))
        |SELECT doc_id, count(*) AS n_tok, count(DISTINCT tok) AS n_uniq,
        |  min(tok) AS min_tok, max(tok) AS max_tok
        |FROM tk GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
