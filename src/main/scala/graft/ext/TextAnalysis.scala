package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.RollingHash

/** Text-analysis operators for training-data curation: language ID, quality
  * scoring, token counting, document fingerprinting.
  *
  * All pure column expressions (map-side, codegen'd, shuffle-free) — at
  * 100 TB these run at scan speed as narrow transformations.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram-free heuristic
    * language ID. Fixed and public — chosen for high frequency in each
    * language, not tuned to any corpus. */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "it", "that"),
    "es" -> Seq("el", "los", "que", "y", "un", "por", "con", "para"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans", "pour", "sur"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "我", "他"))

  /** Per-language stopword-hit score columns s_de..s_zh (distinct-token
    * intersection size). */
  def langScores(text: Column): Seq[Column] = {
    val toks = Dedup.distinctTokens(text)
    stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      size(array_intersect(toks, array(words.map(lit): _*))).cast("long").as(s"s_$lang")
    }
  }

  /** argmax language with alphabetical tie-break (deterministic). Operates
    * on the s_XX columns produced by [[langScores]]. */
  def predictedLang: Column = {
    val langs = stopwords.keys.toSeq.sorted
    val m = greatest(langs.map(l => col(s"s_$l")): _*)
    langs.foldRight(lit("und"): Column) { (l, elseCol) =>
      when(col(s"s_$l") === m && m > 0, lit(l)).otherwise(elseCol)
    }
  }

  /** Tiny fixed char-trigram profiles for the n-gram language-ID variant.
    * Score = total characters removed when deleting each profile trigram —
    * a replace-based occurrence count that both Spark and a SQL oracle
    * compute identically (no division, no regex). */
  val trigramProfiles: Map[String, Seq[String]] = Map(
    "de" -> Seq("sch", "ein", "der", "die"),
    "en" -> Seq("the", "ing", "ion", "and"),
    "es" -> Seq("los", "que", "ent", "ado"),
    "fr" -> Seq("les", "ent", "eau", "our"),
    "zh" -> Seq("的", "是", "不", "了"))

  /** n-gram language-ID scores g_de..g_zh (char-trigram hit mass). */
  def ngramLangScores(text: Column): Seq[Column] = {
    trigramProfiles.toSeq.sortBy(_._1).map { case (lang, tris) =>
      tris.map { tri =>
        (length(text) - length(replace(text, lit(tri), lit("")))).cast("long")
      }.reduce(_ + _).as(s"g_$lang")
    }
  }

  /** argmax language for the n-gram scores, alphabetical tie-break. */
  def ngramPredictedLang: Column = {
    val langs = trigramProfiles.keys.toSeq.sorted
    val m = greatest(langs.map(l => col(s"g_$l")): _*)
    langs.foldRight(lit("und"): Column) { (l, elseCol) =>
      when(col(s"g_$l") === m && m > 0, lit(l)).otherwise(elseCol)
    }
  }

  /** Quality-score columns: length, word count, average word length,
    * stopword ratio (en), and a bounded composite score. All portable
    * arithmetic (round to 4 decimals where double division is involved). */
  def qualityColumns(text: Column): Seq[Column] = {
    val nChars = length(text).cast("long")
    val nWords = (length(text) - length(translate(text, " ", "")) + 1).cast("long")
    val enHits = size(array_intersect(
      Dedup.distinctTokens(text), array(stopwords("en").map(lit): _*)))
    val avgWordLen = round(length(translate(text, " ", "")).cast("double") / nWords, 4)
    val stopRatio = round(enHits.cast("double") / nWords, 4)
    val score = round(
      least(nWords.cast("double") / lit(100.0), lit(1.0)) * 0.5 +
        least(stopRatio * lit(10.0), lit(1.0)) * 0.3 +
        when(avgWordLen.between(3.0, 8.0), 0.2).otherwise(0.0), 4)
    Seq(nChars.as("n_chars"), nWords.as("n_words"),
      avgWordLen.as("avg_word_len"), stopRatio.as("stop_ratio"),
      score.as("quality_score"))
  }

  /** PII-style pattern redaction for training-data cleaning: emails, then
    * URLs, then standalone long digit runs (phone/account-number shaped),
    * each replaced with a typed placeholder token. Patterns are
    * deliberately RE2-compatible (no backrefs/lookarounds), so an external
    * SQL engine applies the identical ones — the x35 oracle does.
    * Map-side regexp_replace chain, codegen'd, scan-speed. */
  val redactions: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    // no trailing boundary group: [0-9]{7,} is greedy, so a match already
    // extends to the end of its digit run, and a trailing ([^0-9]|$) would
    // CONSUME the separator — leaving the second of two runs split by one
    // char ("1234567 7654321") unredacted because the scan resumes past it
    "https?://[^ ]+" -> "<URL>",
    "(^|[^0-9])[0-9]{7,}" -> "$1<NUM>")

  def redact(text: Column): Column =
    redactions.foldLeft(text) { case (c, (pattern, token)) =>
      regexp_replace(c, pattern, token)
    }

  /** Repeated-n-gram fraction — the Gopher-style repetition quality signal:
    * share of a document's word n-grams occupied by its single most
    * frequent n-gram (1.0-ish = boilerplate loops, ~1/n_grams = no
    * repetition). NON-distinct n-grams by construction (repetition is the
    * point); NULL for docs shorter than `n` tokens.
    *
    * Shape at scale: explode → two map-combined aggregations keyed by
    * (doc, gram) then (doc) — the same high-cardinality-key shape as
    * TF-IDF; nothing materializes per document beyond its gram counts. */
  def repetition(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 2): DataFrame = {
    val w = Dedup.tokens(col(textCol))
    // n-grams via zip_with over shifted slices, NOT element_at inside a
    // transform lambda: a lambda body re-evaluates captured expressions
    // per ELEMENT, so element_at(split(text), i) costs a full re-split per
    // gram — O(len²) per document (the known HOF inline blowup; measured
    // 5.9 s at sf0.1 vs 0.7 s this way). zip_with evaluates its operand
    // arrays once per ROW. zip_with pads the shorter side with nulls and
    // concat propagates them, so the tail yields nulls — filtered below.
    val grams = (1 until n).foldLeft(w) { (acc, k) =>
      zip_with(acc,
        slice(w, lit(k + 1), greatest(size(w) - k, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    val exploded = docs
      .filter(size(w) >= n)
      .select(col(idCol),
        explode(filter(grams, _.isNotNull)).as("gram"))
    val counts = exploded.groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col(idCol))
      .agg(max(col("c")).as("top_gram_count"),
        sum(col("c")).as("n_grams"))
      .withColumn("rep_fraction",
        round(col("top_gram_count").cast("double") / col("n_grams"), 4))
  }

  /** Feature buckets for the hashed linear classifier. */
  val clfBuckets = 64

  /** Fixed integer weights in [-1000, 1000] for the [[classifierColumns]]
    * feature buckets, from a seeded 64-bit LCG (MMIX constants — same
    * generator discipline as [[Similarity.signsFor]]): deterministic,
    * data-independent literals that the x51 oracle SQL embeds verbatim, so
    * both engines score identically. Integer weights make the per-document
    * sum EXACT (long addition is order-free, unlike float accumulation), so
    * the only float op is one final division, rounded to 4 dp. */
  private[graft] lazy val clfWeights: Array[Long] = {
    var state = 98765L
    Array.fill(clfBuckets) {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 33) % 2001L) - 1000L
    }
  }

  /** Hashed-bag-of-words linear quality scorer — the shape of the
    * fasttext-style model-based quality filters in CCNet/GPT-3-style
    * pipelines (a linear model over hashed token features), with fixed
    * public weights standing in for trained ones (training is out of
    * scope; the SCORING path is what a 100 TB pipeline runs per document).
    *
    * Each distinct token hashes to one of [[clfBuckets]] buckets via the
    * portable 60-bit md5 ([[PortableHash.md5Long]]); the document logit is
    * the sum of its buckets' integer weights and the score normalizes by
    * 1000·|tokens|, into [-1, 1]. Evaluated as ONE `aggregate` higher-order
    * function over the token array — pure map-side expression, zero
    * shuffle, scan-speed (the weight array is a foldable literal, constant-
    * folded once, NOT rebuilt per element). Returns (n_feat, w_sum,
    * clf_score) columns. */
  def classifierColumns(text: Column): Seq[Column] = {
    val weights = array(clfWeights.map(lit): _*)
    val toks = Dedup.distinctTokens(text)
    val wsum = aggregate(toks, lit(0L), (acc, t) =>
      acc + element_at(weights,
        (pmod(PortableHash.md5Long(t), lit(clfBuckets.toLong)) + 1).cast("int")))
    val n = size(toks).cast("long")
    // deliberately UNROUNDED: the quotient of two exact integers is one
    // IEEE division — bit-identical on any engine — while rounding to k dp
    // can land on a half-way tie (w_sum/(n·1000) often has a short decimal
    // expansion) where Spark's HALF_UP and a value-based round disagree
    Seq(n.as("n_feat"), wsum.as("w_sum"),
      (wsum.cast("double") / (n.cast("double") * 1000.0)).as("clf_score"))
  }

  /** TRAIN the hashed linear quality scorer — the step [[classifierColumns]]
    * stands in for with fixed weights: a deterministic AVERAGED PERCEPTRON
    * (Freund & Schapire 1999; Collins 2002 for the averaged variant) over
    * the same [[clfBuckets]] hashed bag-of-distinct-tokens features, which
    * is exactly the fasttext-shaped production step (CCNet/GPT-3-style
    * model-based quality filters train a linear model on a small labeled
    * set, then SCORE the whole corpus).
    *
    * Determinism / portability: features are integer per-bucket counts of
    * distinct tokens (portable 60-bit md5 bucket), updates are integer
    * (`w += label·f` on a mistake, mistake = (Σ w·f > 0) ≠ (label = +1)),
    * the example order is fixed by the portable hash of the id (epochs
    * replay the same order), and the returned weights are the integer
    * SUMS of the weight vector after every step (the averaged perceptron
    * numerator — scaling by 1/steps changes no sign or ranking, so the
    * integers stay exact and engine-reproducible; the x118 oracle replays
    * the identical updates in a recursive CTE).
    *
    * Scale posture: the TRAINER is deliberately bounded (labeled quality
    * data is small by nature — `require` ≤ maxRows; hash-sample first if
    * not); the per-example feature build and the corpus-wide SCORING
    * ([[scoreWithWeights]]) are distributed map-side expressions.
    *
    * @param labelCol +1 / -1 long column
    * @return averaged-weight integer sums, length [[clfBuckets]] */
  def trainQualityScorer(
      docs: DataFrame, idCol: String, textCol: String, labelCol: String,
      epochs: Int = 2, maxRows: Long = 100000L): Array[Long] = {
    require(epochs >= 1, "need at least one epoch")
    val nRows = docs.count()
    require(nRows > 0, "trainQualityScorer: empty training set")
    require(nRows <= maxRows,
      s"trainQualityScorer is the bounded in-memory trainer ($nRows rows " +
        s"> $maxRows) — hash-sample the labeled set first (labeled quality " +
        "data is small by nature; corpus-scale SCORING is scoreWithWeights)")
    // feature build: hash each distinct token ONCE into its bucket id and
    // fold the bucket array into a 64-slot histogram — not 64 independent
    // filter passes each re-hashing every token (md5 per (token, bucket)
    // pair was a 64× redundant hash; a two-select alias would not fix it
    // either — CollapseProject inlines the alias right back into all 64
    // uses). The fold's input appears ONCE in the expression tree, so
    // each token hashes once; the counts are identical, so the x118
    // oracle is unaffected.
    val bkts = transform(Dedup.distinctTokens(col(textCol)), t =>
      pmod(PortableHash.md5Long(t), lit(clfBuckets.toLong)))
    val hist = aggregate(bkts, typedLit(Seq.fill(clfBuckets)(0L)),
      (acc, x) => transform(acc,
        (v, i) => when(i.cast("long") === x, v + 1L).otherwise(v)))
    val rows = docs.select(
        col(idCol).as("graft_id"),
        col(labelCol).cast("long").as("lbl"),
        hist.as("f"))
      .withColumn("graft_h",
        PortableHash.md5Long(col("graft_id").cast("string"), "pcpt:"))
      .orderBy(col("graft_h"), col("graft_id"))
      .select("lbl", "f").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val w = Array.fill(clfBuckets)(0L)
    val sw = Array.fill(clfBuckets)(0L)
    var e = 0
    while (e < epochs) {
      rows.foreach { case (lbl, f) =>
        var dot = 0L
        var b = 0
        while (b < clfBuckets) { dot += w(b) * f(b); b += 1 }
        val pred = if (dot > 0) 1L else -1L
        if (pred != lbl) {
          b = 0
          while (b < clfBuckets) { w(b) += lbl * f(b); b += 1 }
        }
        b = 0
        while (b < clfBuckets) { sw(b) += w(b); b += 1 }
      }
      e += 1
    }
    sw
  }

  /** Score a text column with TRAINED weights ([[trainQualityScorer]]) —
    * the corpus-scale half: one `aggregate` fold over the distinct
    * tokens, pure map-side, zero shuffle (the [[classifierColumns]] plan
    * shape with learned weights). Returns (clf_logit = exact integer
    * Σ w[bucket(t)], clf_pred = logit > 0). */
  def scoreWithWeights(text: Column, weights: Array[Long]): Seq[Column] = {
    require(weights.length == clfBuckets,
      s"expected $clfBuckets weights, got ${weights.length}")
    val warr = array(weights.map(lit): _*)
    val toks = Dedup.distinctTokens(text)
    val wsum = aggregate(toks, lit(0L), (acc, t) =>
      acc + element_at(warr,
        (pmod(PortableHash.md5Long(t), lit(clfBuckets.toLong)) + 1).cast("int")))
    Seq(wsum.as("clf_logit"), (wsum > 0).as("clf_pred"))
  }

  /** Cross-document duplicate-n-gram coverage — the MassiveText/Dolma-style
    * "duplicate n-gram fraction" signal: for each document, the share of
    * its word-`n`-gram INSTANCES whose gram also occurs in at least one
    * OTHER document (so doc-internal repetition alone does not count —
    * that's [[repetition]]'s job). High coverage flags boilerplate that
    * exact/near dedup missed because the surrounding page varies.
    *
    * Shape at scale: explode → count per (doc, gram) → gram doc-frequency
    * as a COUNT WINDOW PARTITIONED BY gram over the (doc, gram) rows — one
    * linear lineage (the gram explosion runs exactly once; PlanSpec pins
    * it), no self-join, no second scan. The window key is the
    * high-cardinality gram, so partitions stay fine-grained; a pathological
    * boilerplate gram shared by millions of docs concentrates its (doc,
    * gram) rows in one partition — at that point the gram IS the dedup
    * signal and the upstream exact/near dedup should have fired first.
    * Docs shorter than `n` tokens have no grams and are absent.
    * Returns (idCol, n_grams, dup_grams, dup_frac). */
  def dupNgramCoverage(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Dedup.tokens(col(textCol))
    val grams = (1 until n).foldLeft(w) { (acc, k) =>
      zip_with(acc, slice(w, lit(k + 1), greatest(size(w) - k, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    val exploded = docs
      .filter(size(w) >= n)
      .select(col(idCol), explode(filter(grams, _.isNotNull)).as("gram"))
    val perDocGram = exploded.groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("graft_c"))
    val withNd = perDocGram.withColumn("graft_nd",
      count(lit(1)).over(Window.partitionBy(col("gram"))))
    withNd
      .groupBy(col(idCol))
      .agg(sum(col("graft_c")).as("n_grams"),
        sum(when(col("graft_nd") >= 2, col("graft_c")).otherwise(0L))
          .as("dup_grams"))
      .withColumn("dup_frac",
        round(col("dup_grams").cast("double") / col("n_grams"), 4))
  }

  /** Corpus-trained unigram language-model scoring — the CCNet-style
    * perplexity-proxy quality signal (Wenzek et al., "CCNet", LREC 2020
    * filter corpora by LM perplexity; a unigram model is its shuffle-
    * friendly first-order version, and the one that needs no external
    * model artifact):
    *
    *   avg_nll(d) = (1/|d|) Σ_t∈d −ln p(t),   p(t) = count(t) / Σ counts
    *
    * Low avg_nll ⇒ the document looks like the corpus (common words in
    * common proportions); high ⇒ gibberish, rare-token soup, boilerplate
    * IDs — the canonical "weird text" screen before training.
    *
    * Shape at scale:
    *   - term counts: one `groupBy(term)` over the exploded token stream
    *     (map-side partial aggregation; stopword-grade hot terms pre-combine
    *     per task, so the shuffle carries vocabulary-sized data);
    *   - the corpus token total is ONE driver scalar (literal stamp);
    *   - the per-doc tf frame joins the vocabulary on term — AQE picks
    *     broadcast when the vocabulary fits, skew-splits the hot terms when
    *     it does not;
    *   - the per-doc sum folds (term, tf·−ln p) structs in ASCENDING TERM
    *     order (`aggregate` over `sort_array`) — the float accumulation
    *     order is pinned, so results are engine- and partitioning-
    *     reproducible (the x53 discipline), then one division by |d|.
    *
    * Self-scoring (train == score corpus) guarantees p(t) > 0; to score
    * against a separate training corpus, pre-aggregate that corpus's
    * counts and smooth unseen terms before joining.
    *
    * @return (idCol, n_tokens, avg_nll) */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val termRows = docs
      .select(col(idCol),
        filter(Dedup.tokens(col(textCol)), _ =!= "").as("graft_toks"))
      .select(col(idCol), size(col("graft_toks")).cast("long").as("n_tokens"),
        explode(col("graft_toks")).as("term"))
    val counts = termRows.groupBy(col("term")).agg(count(lit(1)).as("graft_cnt"))
    // empty/token-free corpus: sum is null — score nothing rather than NPE
    val totalRow = counts.agg(sum(col("graft_cnt"))).head()
    if (totalRow.isNullAt(0)) return termRows
      .select(col(idCol), col("n_tokens"), lit(null).cast("double").as("avg_nll"))
      .limit(0)
    val total = totalRow.getLong(0)

    val tf = termRows.groupBy(col(idCol), col("n_tokens"), col("term"))
      .agg(count(lit(1)).as("graft_tf"))
    val contrib = tf.join(counts, "term")
      .select(col(idCol), col("n_tokens"), col("term"),
        (col("graft_tf") * -log(col("graft_cnt") / lit(total.toDouble)))
          .as("graft_nll"))
    contrib.groupBy(col(idCol), col("n_tokens"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("term"), col("graft_nll")))),
        lit(0.0), (acc, x) => acc + x.getField("graft_nll")).as("graft_sum"))
      .select(col(idCol), col("n_tokens"),
        (col("graft_sum") / col("n_tokens")).as("avg_nll"))
  }

  /** Canonical text normalization — the standard pre-dedup/pre-index
    * cleanup (lowercase, strip everything outside [a-z0-9 ], collapse
    * whitespace runs, trim): near-dup detection and retrieval both want
    * "Hello,  World!" and "hello world" to collide. One codegen'd
    * expression chain, scan-speed, zero shuffle; both regex dialects
    * (Java, RE2) treat these patterns identically, so the oracle mirrors
    * it exactly. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Whitespace token count + a BPE-ish regex token count (letter runs,
    * single digits, single punctuation marks — the shape a byte-pair
    * tokenizer's pre-tokenizer uses). */
  def tokenCountColumns(text: Column): Seq[Column] = Seq(
    (length(text) - length(translate(text, " ", "")) + 1).cast("long").as("ws_tokens"),
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"), lit(0)))
      .cast("long").as("bpe_tokens"))

  /** Document fingerprint via the native RollingHash expression. */
  def fingerprint(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(RollingHash(GraftColumnBridge.expression(text)))
  }

  /** Adjacent-token pair counts — the merge-candidate table a BPE-style
    * tokenizer trainer builds each round (Sennrich et al. 2016: count all
    * symbol pairs, merge the most frequent). Counts are MULTISET counts
    * (within-document repeats count, unlike [[Dedup.shingles]]' distinct
    * sets), since merge priority is frequency over the whole corpus.
    *
    * Scale shape: pair construction is one zip_with over shifted slices
    * (map-side, codegen'd); the count is a hash aggregation on the pair
    * string with map-side partial combine, and the top-k is orderBy+limit
    * — Spark plans TakeOrderedAndProject, which keeps k rows per partition
    * and merges on the driver: no global sort of the pair vocabulary, no
    * window. Ties break on the pair string ascending so the merge table is
    * deterministic across engines and retries.
    *
    * @return (pair, n) — the `k` most frequent adjacent pairs */
  def pairMergeCounts(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val w = tokens(col(textCol))
    val pairs = zip_with(
      slice(w, lit(1), greatest(size(w) - 1, lit(0))),
      slice(w, lit(2), greatest(size(w) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    docs.select(explode(pairs).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }

  /** Metadata-vs-content language agreement audit: the confusion matrix
    * of the DECLARED language column against the stopword-argmax
    * prediction from the text itself — (declared, predicted, n_docs,
    * agree). On a multi-source corpus the declared label comes from
    * upstream metadata (crawl headers, publisher tags) and is routinely
    * wrong; off-diagonal mass here is what silently poisons
    * language-filtered training mixes, found BEFORE filtering rather
    * than after. Map-side scoring + one |langs|²-bounded aggregate. */
  def langConfusion(
      docs: DataFrame, langCol: String, textCol: String): DataFrame =
    docs
      .select((col(langCol).as("declared") +: langScores(col(textCol))): _*)
      .withColumn("predicted", predictedLang)
      .groupBy(col("declared"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("agree", col("declared") === col("predicted"))

  /** Vocabulary coverage / OOV-rate report: build the top-`vocabSize`
    * token vocabulary by corpus frequency (ties pinned: count desc, token
    * asc), then report per group how much of its token MASS the
    * vocabulary covers — the tokenizer-design question ("is 32k enough,
    * and for WHICH sources does it break") asked before committing a
    * vocab size. A domain whose oov_rate is an outlier will fragment into
    * byte-fallback tokens and train poorly.
    *
    * Two corpus scans by design: one to count the vocabulary, one to
    * measure coverage. The alternative — materializing the exploded
    * token relation to scan once — writes something LARGER than the
    * corpus; re-exploding is a map-side re-derivation and strictly
    * cheaper. The vocabulary itself is top-k via orderBy+limit
    * (TakeOrderedAndProject — k rows per partition, no global sort) and
    * joins back as a broadcast membership probe, so the coverage pass
    * never shuffles the corpus — only the per-group totals move. */
  def vocabCoverage(
      docs: DataFrame, textCol: String, grpCol: String,
      vocabSize: Int): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    def toks = docs.select(col(grpCol).as("grp"),
      explode(tokens(col(textCol))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("graft_n"))
      .orderBy(col("graft_n").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1L).as("graft_in"))
    toks.join(broadcast(vocab), Seq("tok"), "left_outer")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_tokens"),
        coalesce(sum(col("graft_in")), lit(0L)).as("n_in_vocab"))
      .select(col("grp").as(grpCol), col("n_tokens"), col("n_in_vocab"),
        // Dedup.round4, not round(): integer-ratio doubles are identical
        // cross-engine, round() midpoint semantics are not
        Dedup.round4(lit(1.0) - col("n_in_vocab").cast("double") /
          col("n_tokens")).as("oov_rate"))
  }

  private def tokens(text: Column): Column = Dedup.tokens(text)

  /** Annotate a documents frame with all text-analysis columns. */
  def annotate(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      (docs.columns.map(col).toSeq ++
        langScores(t) ++ qualityColumns(t) ++ tokenCountColumns(t)): _*)
  }
}
