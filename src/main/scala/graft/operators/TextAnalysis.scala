package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * All column-level logic is built-in Catalyst functions (codegen'd,
  * no UDFs), so every operator here stays inside whole-stage codegen
  * and scales linearly with input partitions — no shuffle except where
  * an aggregation genuinely requires one.
  */
object TextAnalysis {

  /** Whitespace tokenization; empty tokens dropped. The trim must
    * strip ALL whitespace classes — built-in trim() removes only
    * spaces, so "\tfoo" would split to ["", "foo"], a phantom token
    * that diverges from the oracles' list_filter(x <> '') and from
    * the native tokensOf runtime. After the regexp trim the only way
    * split("\\s+") produces an empty token is the empty string —
    * guarded with a codegen'd when() instead of a filter() lambda
    * (higher-order functions are CodegenFallback: the predicate would
    * run interpreted per document).
    */
  def tokens(text: Column): Column = {
    val t = regexp_replace(text, "^\\s+|\\s+$", "")
    when(t === "", array().cast("array<string>")).otherwise(split(t, "\\s+"))
  }

  /** BPE-ish subword-aware token split: words, numbers, and single
    * punctuation marks each count as a token (approximates a BPE
    * pre-tokenizer's word-boundary pass).
    */
  def bpeishTokens(text: Column): Column =
    filter(
      split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
      t => t.rlike("\\S"))

  /** Token count (whitespace). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Stable token -> [0, buckets) feature bucket: the top 60 bits of
    * the token's md5, reduced mod buckets. md5 is bit-identical on
    * every engine (unlike builtin hash()/xxhash64 whose cross-engine
    * values differ), so classifier scores are oracle-checkable; conv's
    * 15 hex digits stay under 2^60, so the cast never overflows.
    */
  def tokenBucket(token: Column, buckets: Int): Column =
    pmod(conv(substring(md5(lower(token)), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Hashed-bag-of-words linear classifier INFERENCE — the fastText-
    * style quality-classifier shape (hash each token into a bucketed
    * feature space, sum the bucket weights, threshold the margin).
    * Integer-exact: weights are integers and the score is their exact
    * sum, so keep/drop decisions are reproducible bit-for-bit across
    * engines and re-partitionings — no sigmoid near-threshold float
    * drift (sigmoid is monotone, so thresholding the probability IS
    * thresholding the margin).
    *
    * `weightOf` maps a bucket column to its integer weight column.
    * This demo derives weights from the golden-ratio hash (a fixed
    * pseudo-model); a trained deployment swaps in `element_at` over a
    * broadcast literal array — the inference plan (map-only, zero
    * shuffles, one aggregate fold per document inside the scan) is
    * identical either way.
    */
  def hashedLinearScore(
      text: Column,
      buckets: Int = 1024,
      weightOf: Column => Column = defaultWeight): Column =
    // coalesce: NULL text scores 0 (and is then dropped by any
    // positive threshold) instead of a NULL that a `where(kept)`
    // would silently treat as neither kept nor dropped
    coalesce(
      aggregate(tokens(text), lit(0L),
        (acc, t) => acc + weightOf(tokenBucket(t, buckets))),
      lit(0L))

  /** The fixed pseudo-model: weight(b) = (b * 2654435761) mod 1001 -
    * 500, an integer in [-500, 500]. Deterministic, engine-exact.
    */
  def defaultWeight(bucket: Column): Column =
    pmod(bucket * 2654435761L, lit(1001L)) - 500L

  /** Classifier-filter a corpus: per-document margin score and the
    * keep decision at `threshold`. Map-only — the score folds inside
    * the document scan; at 100 TB this is a pure pass over the data
    * with no exchange at all (the shape that makes model-based
    * filtering affordable at corpus scale).
    */
  def classifierFilter(
      df: DataFrame,
      id: Column,
      text: Column,
      threshold: Long = 0L,
      buckets: Int = 1024,
      weightOf: Column => Column = defaultWeight): DataFrame =
    df.select(id.as("doc_id"),
        tokenCount(text).cast("long").as("n_tokens"),
        hashedLinearScore(text, buckets, weightOf).as("score"))
      .withColumn("kept", col("score") > threshold)

  /** Blocklist (bad-words) filtering — the standard crawl-corpus
    * safety pass: count occurrences of blocklisted tokens per document
    * and keep documents whose blocked-token rate stays under a
    * per-mille threshold (rate-based, not absolute, so long documents
    * aren't penalized for a single hit).
    *
    * Integer-exact: the rate is `n_blocked · scale div n_tokens`
    * (floor division), so keep/drop decisions are bit-reproducible.
    * Map-only, zero exchanges: all per-term occurrence counts come
    * from ONE native `term_freqs` scan per document (the blocklist is
    * broadcast-scale by construction; a 10^5-term lexicon uses
    * [[multiPatternFilter]]'s Aho–Corasick expression instead, same
    * plan shape). At 100 TB this is a pure scan: no shuffle, no join,
    * nothing but the scan itself on the wire.
    */
  def blocklistFilter(
      df: DataFrame,
      id: Column,
      text: Column,
      blocked: Seq[String],
      maxPerMille: Long = 20L,
      scale: Long = 1000L): DataFrame = {
    require(blocked.nonEmpty, "blocklistFilter needs at least one term")
    require(blocked.distinct.size == blocked.size,
      s"duplicate blocklist terms: $blocked")
    // documents are lowercased before matching, so a mixed-case term
    // would silently never match — reject it (mirrors
    // domainBlocklistFilter's check)
    require(blocked.forall(t => t == t.toLowerCase),
      s"blocklist terms must be lowercase (documents are lowercased " +
        s"before matching): ${blocked.filterNot(t => t == t.toLowerCase)}")
    // one native term_freqs scan per doc (dl + all term counts);
    // codegen subexpression elimination shares it across the fields
    val tf = graft.functions.TextOps.termFreqs(lower(text), blocked)
    val nBlocked = blocked.indices.map(i => tf.getField("tfs").getItem(i))
      .reduce(_ + _)
    df.select(id.cast("long").as("doc_id"),
        tf.getField("dl").as("n_tokens"), nBlocked.as("n_blocked"))
      .withColumn("blocked_per_mille",
        when(col("n_tokens") > 0, expr(s"n_blocked * ${scale}L div n_tokens"))
          .otherwise(0L))
      .withColumn("kept", col("blocked_per_mille") <= maxPerMille)
  }

  /** Large-lexicon phrase filtering via one Aho–Corasick scan — the
    * scale path [[blocklistFilter]]'s docs promise: patterns are
    * SUBSTRINGS (multi-word phrases, no tokenizer dependency), every
    * occurrence of every pattern (overlapping included) is counted in
    * a single O(len) pass per document regardless of lexicon size.
    * Map-only, zero exchanges; the automaton builds once per executor
    * from the expression's pattern list (broadcast-scale model).
    */
  def multiPatternFilter(
      df: DataFrame,
      id: Column,
      text: Column,
      patterns: Seq[String],
      maxMatches: Long = 0L): DataFrame =
    df.select(id.cast("long").as("doc_id"),
        graft.functions.MultiPattern.count(text, patterns).as("n_matches"))
      .withColumn("kept", col("n_matches") <= maxMatches)

  /** Character-histogram quality profile — the integer-exact stand-in
    * for a Shannon-entropy filter: per document, the UTF-16 code-unit
    * histogram's size, distinct count, mode count, and collision mass
    * Σ n_c² (the Simpson-index numerator, an exact Rényi-2 entropy
    * surrogate — monotone with the "low-entropy boilerplate" signal,
    * no float logs). `simpson_per_mille` = collision_mass·1000 div
    * n_chars² rises toward 1000 as the text degenerates to one
    * repeated character; `kept` drops documents at or above
    * `maxSimpsonPerMille`.
    *
    * Scale shape: the histogram folds inside the scan via the native
    * codegen'd `char_hist_stats` — map-only, zero exchanges. The
    * declarative equivalent explodes one row per CHARACTER onto a
    * shuffle (~300 rows per doc here); at 100 TB that is the
    * difference between a pure pass and a corpus-sized exchange.
    */
  def charProfile(
      df: DataFrame,
      id: Column,
      text: Column,
      maxSimpsonPerMille: Long = 200L): DataFrame = {
    val st = graft.functions.TextOps.charHistStats(text)
    df.select(id.cast("long").as("doc_id"), st.as("st"))
      .select(col("doc_id"), col("st.n_chars").as("n_chars"),
        col("st.distinct_chars").as("distinct_chars"),
        col("st.max_char_count").as("max_char_count"),
        col("st.collision_mass").as("collision_mass"))
      .withColumn("simpson_per_mille",
        // collision_mass and n_chars² are per-DOC n_chars²-scale — a
        // ~100 MB single-character document would overflow the long
        // product under ANSI, so the ratio runs in DECIMAL(38,0)
        when(col("n_chars") > 0,
          expr("CAST(CAST(collision_mass AS DECIMAL(38,0)) * 1000" +
            " div (CAST(n_chars AS DECIMAL(38,0)) * n_chars) AS BIGINT)"))
          .otherwise(0L))
      .withColumn("kept", col("simpson_per_mille") < maxSimpsonPerMille)
  }

  /** Per-document quality metrics, all deterministic and
    * SQL-expressible for oracle parity:
    *  - n_tokens, mean token length
    *  - stopword ratio (tiny embedded English stopword list)
    *  - punctuation ratio (punct chars / total chars)
    *  - alpha ratio (letter chars / total chars)
    */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "are")

  def qualityMetrics(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(text)
    val stopArr = array(stopwords.map(lit): _*)
    df.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn(
        "mean_token_len",
        // total token chars = length of the empty-separator join —
        // same sum as an aggregate() fold, without the interpreted
        // lambda per document
        round(
          length(concat_ws("", toks)).cast("double") /
            greatest(size(toks), lit(1)), 4))
      .withColumn(
        "stopword_ratio",
        round(
          size(filter(toks, t => array_contains(stopArr, lower(t)))).cast("double") /
            greatest(size(toks), lit(1)), 4))
      .withColumn(
        "punct_ratio",
        round(
          (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
            greatest(length(text), lit(1)), 4))
      .withColumn(
        "alpha_ratio",
        round(
          length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
            greatest(length(text), lit(1)), 4))
  }

  /** Language ID via stopword/character n-gram heuristic: score each
    * candidate language by its marker-token hit count over the
    * document's token set; argmax wins, ties broken by language code.
    * Deterministic, no model artifacts, SQL-expressible.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "en", "un", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "un", "une", "des", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "人", "这"))

  /** Score one language: number of DISTINCT marker tokens present
    * (array_intersect — one set op per language, not one scan per
    * marker). zh markers are matched as substrings since Chinese has
    * no spaces.
    */
  private def langScore(text: Column, lowered: Column, lang: String): Column =
    if (lang == "zh")
      langMarkers(lang).map(m => when(text.contains(m), 1).otherwise(0)).reduce(_ + _)
    else
      size(array_intersect(lowered, array(langMarkers(lang).map(lit): _*)))

  /** Predicted language column. Highest marker score wins; ties break
    * to the lexicographically first language code.
    *
    * Shaped as ONE `array_max` over an array of (score, priority, lang)
    * structs rather than a fold of when/otherwise comparisons: in the
    * fold each level references the accumulator twice (condition +
    * else-branch), so the earlier langScore subtrees — each an
    * `array_intersect` over the tokenization — are duplicated up to
    * 2^k times, and Spark's subexpression elimination skips
    * conditionally-evaluated children. Here every langScore appears
    * exactly once and all children are unconditional, so the
    * tokenization is CSE-hoisted and runs once per row. Struct
    * ordering is field-by-field, so max = highest score, then highest
    * priority = lowest language index = lexicographically first code —
    * identical semantics to the fold.
    */
  def detectLang(text: Column): Column = {
    // lowercase the whole string (codegen'd) before tokenizing rather
    // than transform()-ing each token through an interpreted lambda —
    // Unicode lowercasing never introduces whitespace, so the token
    // sets are identical
    val lowered = tokens(lower(text))
    val langs = langMarkers.keys.toSeq.sorted
    // the (-1, "und") floor never wins (scores are >= 0) but keeps the
    // fold's exact semantics on record
    val entries =
      struct(lit(-1).as("score"), lit(1).as("pri"), lit("und").as("lang")) +:
        langs.zipWithIndex.map { case (l, i) =>
          struct(langScore(text, lowered, l).as("score"),
            lit(-i).as("pri"), lit(l).as("lang"))
        }
    array_max(array(entries: _*)).getField("lang")
  }

  /** Document fingerprint: md5 of whitespace-normalized, lowercased
    * text. Stable content hash for exact-dedup joins across engines
    * (md5 is bit-identical everywhere, unlike engine-specific hash()).
    */
  def fingerprint(text: Column): Column =
    md5(to_binary(regexp_replace(lower(trim(text)), "\\s+", " "), lit("utf-8")))

  /** URL canonicalization — the web-crawl ingest normalizer that makes
    * URL-keyed dedup meaningful (the same page arrives as
    * `HTTPS://Example.COM:443/x/?utm_source=feed#frag` and
    * `https://example.com/x`): lowercase the scheme+authority (path
    * and query stay case-sensitive), drop the fragment, strip the
    * scheme-default port, remove tracking parameters (`utm_*`,
    * `gclid`, `fbclid`) with their values, tidy the separator debris
    * that leaves behind, and trim trailing slashes.
    *
    * Pure codegen'd regexp composition, no UDFs — and deliberately
    * RE2-compatible (no lookarounds), so the DuckDB oracle replicates
    * it regex-for-regex. URLs without a `scheme://authority` prefix
    * pass through with only the generic cleanups. Convention notes: a
    * rare userinfo in the authority is lowercased with it; trailing
    * slashes are stripped even from a bare authority (`https://x.com/`
    * -> `https://x.com`) — both standard canonicalizer choices.
    */
  /** Domain blocklist filter with SUBDOMAIN suffix matching — the
    * crawl-curation semantics ("block example.com" must also block
    * "cdn.assets.example.com", but NOT "notexample.com"): a document
    * is blocked when any dot-boundary suffix of its URL's host is a
    * blocked domain. Output: (doc_id, host, kept).
    *
    * Map-only, zero exchanges: the host parses out of the URL with
    * one regex, its label-suffix array builds in the projection, and
    * membership is a single codegen'd `arrays_overlap` against the
    * blocklist riding the plan as a literal (blocklists are
    * broadcast-scale by definition; a 10^6-domain list would switch
    * to a broadcast semi-join on the exploded suffixes — same
    * per-row work, one extra broadcast).
    */
  def domainBlocklistFilter(
      df: DataFrame,
      id: Column,
      url: Column,
      blockedDomains: Seq[String]): DataFrame = {
    require(blockedDomains.nonEmpty, "need at least one blocked domain")
    require(blockedDomains.forall(d => d == d.toLowerCase && !d.contains("/")),
      s"blocked domains must be bare lowercase hosts: $blockedDomains")
    val host = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))
    val labels = split(host, "\\.")
    val suffixes = transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels) - i + 1), "."))
    val blockedLit = array(blockedDomains.map(lit): _*)
    df.select(id.cast("long").as("doc_id"), host.as("host"),
      (!arrays_overlap(suffixes, blockedLit)).as("kept"))
  }

  def canonicalizeUrl(url: Column): Column = {
    val trimmed = regexp_replace(url, "^\\s+|\\s+$", "")
    val noFrag = regexp_replace(trimmed, "#.*$", "")
    val prefix = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", "")
    val noPort = regexp_replace(
      regexp_replace(prefix, "^(https://[^/:]*):443$", "$1"),
      "^(http://[^/:]*):80$", "$1")
    val joined = concat(noPort, rest)
    // tracking params keep their leading separator alive ("$1") so a
    // following real param still has one; the tidy passes collapse the
    // leftovers ("?&" / "&&" / trailing "?"/"&")
    val noTrack = regexp_replace(joined,
      "([?&])(?:utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*", "$1")
    val tidied = regexp_replace(
      regexp_replace(regexp_replace(noTrack, "&&+", "&"), "\\?&", "?"),
      "[?&]+$", "")
    regexp_replace(tidied, "/+$", "")
  }

  /** C4-style heuristic line/document cleaning (Raffel et al. 2020's
    * public rules, deterministic subset): a LINE survives iff it ends
    * in terminal punctuation (optionally inside a closing quote), has
    * at least `minLineTokens` whitespace tokens, and contains neither
    * "lorem ipsum" (case-insensitive) nor a curly brace (the
    * leaked-javascript marker); a DOCUMENT survives iff at least one
    * line does. Output per kept doc: (doc_id, n_lines, n_kept,
    * cleaned_text) with surviving lines re-joined verbatim.
    *
    * Map-only: line splitting, the per-line predicate, and the re-join
    * all run inside the projection — zero exchanges, so the filter
    * scales as a pure scan at any corpus size.
    */
  def c4LineFilter(df: DataFrame, id: Column, text: Column,
      minLineTokens: Int = 3): DataFrame = {
    val lines = split(text, "\n")
    val kept = filter(lines, l => {
      val t = trim(l)
      t.rlike("[.!?]\"?$") &&
        size(tokens(t)) >= minLineTokens &&
        !lower(t).contains("lorem ipsum") &&
        !t.contains("{")
    })
    df.select(id.as("doc_id"),
        size(lines).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"),
        array_join(kept, "\n").as("cleaned_text"))
      .where(col("n_kept") >= 1)
  }

  /** Out-of-vocabulary rate against a corpus-derived top-V vocabulary
    * — the classic LM-pipeline quality signal (documents whose tokens
    * rarely appear corpus-wide are boilerplate, OCR noise, or the
    * wrong language). Two phases: (1) corpus token counts
    * (map-side-combined aggregate over lowercased tokens) -> top
    * `vocabSize` by (count desc, token asc) — the deterministic
    * tie-break; (2) per-document probe of that vocabulary. Output:
    * (doc_id, n_tokens, n_oov, oov_frac).
    *
    * Scale shape: the count aggregate is the only full-data exchange
    * (pre-collapsed map-side — token cardinality, not occurrence
    * count, crosses the wire); the vocabulary ranking sorts DISTINCT
    * tokens (≪ corpus, the zipf head fits one stage) and the result
    * broadcasts into a map-only membership probe, so document text
    * never rides any exchange.
    */
  def oovRate(df: DataFrame, id: Column, text: Column,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val spark = df.sparkSession
    val counts = df
      .select(explode(tokens(lower(text))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(vocabSize)
    val vocab = broadcast(counts.select(col("token")))
    val toks = tokens(lower(text))
    df.select(id.as("doc_id"), explode_outer(toks).as("token"))
      .join(vocab.withColumn("__in", lit(1L)), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(
        count(col("token")).as("n_tokens"),
        sum(when(col("token").isNotNull && col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_frac",
        when(col("n_tokens") > 0, col("n_oov").cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)))
  }

  /** CCNet-shaped n-gram LM quality scoring, integer-exact. Trains a
    * bigram "stupid backoff" model on the corpus itself (top
    * `topBigrams` bigrams by count, ties broken lexicographically —
    * deterministic across engines), then scores each document as the
    * sum over its adjacent token pairs of the scaled conditional
    * frequency `(c(w1 w2) * scale) div c(w1)` for model bigrams and 0
    * (full backoff) otherwise. Monotone with the log-probability score
    * a real KenLM filter uses, but every intermediate is 64-bit
    * integer arithmetic, so the score is bit-reproducible across
    * engines (floating log/exp are not) and the operator is
    * end-to-end oracle-checkable. High `lm_mean` ≈ fluent in-domain
    * text; near-zero ≈ gibberish or out-of-domain — the CCNet
    * head/middle/tail signal.
    *
    * Scale shape: model training is one map-side-combined count per
    * n-gram order (distinct-bigram cardinality on the wire, not
    * occurrence counts); the model join (top-M bigrams × prefix
    * unigram counts) broadcasts the M-row side; scoring explodes doc
    * bigrams against the broadcast model and partial-aggregates
    * before the per-doc exchange, so only (doc_id, three longs) rides
    * it — document text never crosses a shuffle. In production the
    * model would be trained once on a reference slice and reused;
    * train-on-self here keeps the contract self-contained.
    */
  def bigramLmScore(df: DataFrame, id: Column, text: Column,
      topBigrams: Int, scale: Long = 10000L): DataFrame = {
    require(topBigrams > 0, s"topBigrams must be positive, got $topBigrams")
    val toks = tokens(lower(text))
    // native adjacent_pairs, NOT transform+element_at: the lambda form
    // inlines the tokenizer into the per-element body — O(tokens²)
    // interpreted work per doc (see TextRuntime.adjacentPairs)
    val docs = df.select(id.cast("long").as("doc_id"),
      graft.functions.TextOps.adjacentPairs(toks).as("bgs"))
    val c2 = docs.select(explode(col("bgs")).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c2"))
      .orderBy(col("c2").desc, col("bg"))
      .limit(topBigrams)
    val c1 = df.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val model = c1.join(
        broadcast(c2.withColumn("w", split(col("bg"), " ").getItem(0))), Seq("w"))
      .select("bg", "c2", "c1")
    docs.select(col("doc_id"), explode_outer(col("bgs")).as("bg"))
      .join(broadcast(model), Seq("bg"), "left")
      .groupBy("doc_id")
      .agg(
        count(col("bg")).as("n_bigrams"),
        sum(when(col("c2").isNotNull, 1L).otherwise(0L)).as("n_hits"),
        sum(when(col("c2").isNotNull, expr(s"(c2 * ${scale}L) div c1"))
          .otherwise(0L)).as("lm_score"))
      .withColumn("lm_mean",
        when(col("n_bigrams") > 0, expr("lm_score div n_bigrams")).otherwise(0L))
  }

  /** Collocation mining: top-K adjacent-token pairs by Dice
    * coefficient `2·c(w1 w2) / (c(w1) + c(w2))` — the classic
    * lexicographer's association measure (Smadja 1993), scaled to a
    * 64-bit integer (`(2·c2·scale) div (c1a+c1b)`) so the ranking is
    * bit-reproducible across engines (PMI needs float logs; Dice
    * ranks the same "fixed phrase" signal without them). High Dice =
    * the two tokens mostly occur together ("los angeles", "et al") —
    * the phrase-vocabulary signal a tokenizer-training or
    * stopword-mining pass wants. Ties break lexicographically.
    *
    * Scale shape: both count tables are map-side-combined aggregations
    * over DISTINCT n-grams (corpus text never shuffles); the
    * bigram↔unigram joins are keyed on single words — vocabulary-sized
    * tables, orders of magnitude under the corpus; top-K is a
    * TakeOrdered (per-partition heap + driver merge of K·partitions
    * rows), never a global sort.
    */
  def collocations(df: DataFrame, text: Column, topK: Int,
      scale: Long = 100000L): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val toks = tokens(lower(text))
    // native adjacent_pairs — same O(tokens²) trap as bigramLmScore
    val c2 = df.select(explode(graft.functions.TextOps.adjacentPairs(toks)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c2"))
    val c1 = df.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    c2.withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
      .join(c1.select(col("w").as("w1"), col("c1").as("c1a")), Seq("w1"))
      .join(c1.select(col("w").as("w2"), col("c1").as("c1b")), Seq("w2"))
      .select(col("bg").as("bigram"), col("c2"),
        expr(s"(2 * c2 * ${scale}L) div (c1a + c1b)").as("dice"))
      .orderBy(col("dice").desc, col("bigram"))
      .limit(topK)
  }

  /** Rolling polynomial hash (Rabin-Karp style, base 31, mod 2^31-1)
    * over the normalized text — an order-sensitive fingerprint usable
    * for shift-invariant chunking. The modulus keeps acc*31+c under
    * 2^36, safely inside long range under ANSI overflow checking.
    * Spark-only (no SQL oracle — verified by unit test instead).
    */
  def rollingHash(text: Column): Column =
    // normalization stays in codegen'd built-ins; the fold is the
    // native expression (the declarative per-char split + interpreted
    // aggregate allocates one String per character — see
    // [[graft.functions.TextRuntime.rollingHash]])
    graft.functions.TextOps.rollingHash64(
      regexp_replace(lower(trim(text)), "\\s+", " "))

  /** The built-ins-only fold, kept as the equivalence baseline the
    * native expression is tested against.
    */
  def rollingHashDeclarative(text: Column): Column = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    val m = lit(2147483647L) // 2^31 - 1
    aggregate(
      transform(split(norm, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * 31L + c, m))
  }

  /** Repetition metrics per document (the Gopher-style repetition
    * quality signals): unique-token ratio, the fraction of tokens
    * taken by the single most frequent token, and the fraction of
    * bigrams taken by the most frequent bigram. High top-fractions =
    * degenerate boilerplate/spam.
    *
    * Ratios are RAW doubles (identical IEEE divisions on both
    * engines) — rounding count ratios invites halfway-boundary
    * divergence (1/32 rounds differently at 4 decimals across
    * engines).
    *
    * Scale shape: two aggregate levels, (doc, gram) then doc, both
    * with map-side partial combine; tokens shuffle once per level as
    * skinny count rows, never as full documents.
    */
  def repetitionMetrics(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = df.select(id.as("doc_id"), tokens(lower(text)).as("toks"))
      .where(size(col("toks")) > 0)
    val uni = toks.select(col("doc_id"), explode(col("toks")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_uniq"), max("c").as("top_c"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_uniq").cast("double") / col("n_tokens")).as("uniq_ratio"),
        (col("top_c").cast("double") / col("n_tokens")).as("top_token_frac"))
    // bigrams: zip the token array with its tail — arrays_zip +
    // slice are codegen'd collection expressions, no HOF lambdas
    val bi = toks.where(size(col("toks")) > 1)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1))).as("z"))
      .select(col("doc_id"),
        concat_ws(" ", col("z").getField("0"), col("z").getField("1")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum("c").as("n_bi"), max("c").as("top_bi"))
      .select(col("doc_id"), (col("top_bi").cast("double") / col("n_bi")).as("top_bigram_frac"))
    uni.join(bi, Seq("doc_id"), "left")
  }

  /** PII redaction: emails and long digit runs replaced with typed
    * placeholder tokens, plus match counts for audit. Patterns stick
    * to the regex subset Java and RE2-family engines treat
    * identically (no backrefs, no lookaround), so the operation is
    * oracle-checkable. Pure codegen'd regexp built-ins — no UDF, no
    * shuffle; at 100 TB this is a map-only pass.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val longNumRe = "[0-9]{4,}"

  def redactPii(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(
      id.as("doc_id"),
      regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"), longNumRe, "<NUM>").as("redacted"),
      size(regexp_extract_all(text, lit(emailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(text, lit(longNumRe), lit(0))).cast("long").as("n_long_nums"))

  /** HTML main-text extraction — the crawl-processing step between
    * fetch and every text operator here: drop non-content blocks
    * (script/style and nav/header/footer/aside boilerplate), strip
    * the remaining markup, decode the five XML entities, squeeze
    * whitespace. Deliberately a CHAIN OF REGEX REWRITES over
    * codegen'd `regexp_replace` — not an HTML parser: the rewrite
    * chain is engine-portable (the DuckDB oracle runs the same
    * patterns), per-row streaming-safe, and at 100 TB an extraction
    * pass must be a zero-shuffle map whatever else it is. Patterns
    * use `[\s\S]*?` instead of DOTALL flags so Java regex and RE2
    * agree, and entity decode runs LAST (after tag stripping) with
    * `&amp;` last of all, matching the only order both engines can
    * express without lookaround.
    *
    * Malformed HTML degrades gracefully: an unclosed boilerplate tag
    * leaves its block in place (no catastrophic backtracking — all
    * quantifiers are bounded by literal terminators), and non-HTML
    * input passes through with only whitespace squeezing.
    */
  def extractHtmlText(df: DataFrame, id: Column, html: Column): DataFrame = {
    val dropBlocks = Seq("script", "style", "nav", "header", "footer", "aside")
      .foldLeft(html) { (c, tag) =>
        regexp_replace(c, s"(?i)<$tag[^>]*>[\\s\\S]*?</$tag>", " ")
      }
    val noTags = regexp_replace(dropBlocks, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => regexp_replace(c, e, ch) }
    val squeezed = trim(regexp_replace(decoded, "\\s+", " "))
    df.select(id.as("doc_id"), squeezed.as("extracted"))
      .withColumn("n_chars", length(col("extracted")).cast("long"))
  }

  /** Context-window chunking: split each document into fixed-size
    * token windows with overlap — the standard pre-training / RAG
    * ingestion step. Chunk k covers tokens [k*step, k*step+chunkTokens)
    * with step = chunkTokens - overlap; the last chunk is clipped to
    * the document end, and a document shorter than one window yields a
    * single chunk. Deterministic and SQL-expressible (oracle-checked).
    *
    * Scale shape: tokenize once, explode one small index array per
    * document, slice per chunk — all codegen'd collection expressions
    * (sequence/slice/concat_ws, no HOF lambdas), map-only: chunking
    * 100 TB is a pass with zero shuffles.
    */
  def chunkDocuments(
      df: DataFrame,
      id: Column,
      text: Column,
      chunkTokens: Int,
      overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got chunkTokens=$chunkTokens overlap=$overlap")
    val step = chunkTokens - overlap
    val toks = tokens(text)
    val n = size(toks)
    // number of extra chunks beyond the first: ceil((n - chunk)/step)
    // (double-precision ceil is exact here: both operands are small
    // positive ints, far from any representability boundary)
    val lastK = when(n <= chunkTokens, lit(0L))
      .otherwise(ceil((n - chunkTokens).cast("double") / step))
    df.where(n > 0)
      .select(id.as("doc_id"), toks.as("toks"), n.as("n"),
        explode(sequence(lit(0L), lastK.cast("long"))).as("k"))
      .select(
        col("doc_id"), col("k").as("chunk_id"),
        (col("k") * step).as("start_tok"),
        least(lit(chunkTokens), col("n") - col("k") * step).cast("long").as("n_toks"),
        concat_ws(" ",
          slice(col("toks"), (col("k") * step + 1).cast("int"), lit(chunkTokens))).as("chunk_text"))
  }

  /** Character trigrams of the lowercased text, in document order;
    * empty for texts shorter than 3 chars. Pure codegen'd collection
    * expressions (sequence + per-index substr).
    */
  private def charTrigrams(c: Column): Column = {
    val t = lower(c)
    when(length(t) >= 3,
      transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))
  }

  /** Model-based quality scoring without an external model: char-
    * trigram coverage against an in-domain REFERENCE sample. The
    * model is the reference's `topK` most frequent trigrams (ties to
    * the lexicographically smaller); a document scores the fraction
    * of its trigram OCCURRENCES found in the model — the cheap,
    * engine-exact stand-in for LM-perplexity filtering (the CCNet
    * shape): low coverage = out-of-domain or garbled text. Integer
    * counts and one final division keep the score bit-identical
    * across engines, unlike log-prob sums.
    *
    * Scale: the model is topK rows — broadcast; documents explode to
    * (doc, trigram) once, join the broadcast model, and fold back
    * through one count aggregate with map-side combine. Nothing
    * text-sized rides a shuffle.
    */
  def trigramCoverage(
      docs: DataFrame,
      id: Column,
      text: Column,
      reference: DataFrame,
      refText: Column,
      topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val model = reference.select(explode(charTrigrams(refText)).as("tri"))
      .groupBy("tri").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tri")).limit(topK)
      .select(col("tri"), lit(1L).as("hit"))
    docs.select(id.as("doc_id"), explode(charTrigrams(text)).as("tri"))
      .join(broadcast(model), Seq("tri"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tri"), sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("coverage", col("n_hit").cast("double") / col("n_tri"))
  }

  /** Adaptive per-stratum quality filter: keep rows whose score sits
    * at or above their stratum's q-th percentile — per-language
    * adaptive thresholding (a fixed global cutoff over-prunes
    * low-resource languages whose score distribution sits lower).
    * The threshold table is one exact-percentile aggregate with one
    * row per stratum, broadcast back onto the corpus — the corpus
    * itself never shuffles. Prefer q values whose interpolated
    * percentile of integer scores is exactly representable (e.g. 0.5)
    * when cross-engine reproducibility matters.
    */
  def adaptiveQualityFilter(df: DataFrame, stratum: Column, score: Column, q: Double): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"q must be in [0,1], got $q")
    val th = df.groupBy(stratum.as("__stratum"))
      .agg(percentile(score, lit(q)).as("__th"))
    // Null-safe key: a null stratum is a stratum like any other and must
    // be thresholded, not silently dropped by a null-rejecting join. The
    // <=> exchange-reuse caveat (see Relational.asofJoinBucketed) doesn't
    // apply — the threshold side is a broadcast, there is no exchange.
    df.join(broadcast(th), stratum <=> col("__stratum"))
      .where(score >= col("__th"))
      .drop("__stratum", "__th")
  }

  /** Per-stratum z-score outlier filter: keep rows within k standard
    * deviations of their stratum's mean — the length/score outlier
    * cleaning step, computed ENGINE-EXACTLY. Instead of float
    * mean/stddev (whose summation order diverges across engines near
    * the threshold), the test is the equivalent integral inequality
    * over exact decimal moments:
    *
    *   (n*x - S)^2 * (n-1)  <=  k^2 * n * (n*Q - S^2)
    *
    * with S = sum(x), Q = sum(x^2) per stratum — no division, no
    * sqrt, no rounding. Exact while every product fits decimal(38,0):
    * the binding terms are (n*x - S)^2 * (n-1) on the left and
    * k^2 * n * (n*Q - S^2) on the right, both bounded by
    * ~k^2 * n^3 * max(x)^2, so the safe range is
    * n^1.5 * max|x| <~ 1e19 / k (e.g. 1e9 docs per stratum with
    * 6-digit scores and k<=4). Outside it the decimal multiply
    * overflows to null (non-ANSI mode) — which this operator turns
    * into a loud error rather than silently filtering the stratum.
    * Single-row strata keep their row (z is undefined; 0 <= 0).
    * Rows with a NULL score are dropped explicitly (z is undefined).
    *
    * Scale: one skinny moment aggregate per stratum, broadcast back;
    * the corpus itself never shuffles.
    */
  def zScoreOutlierFilter(df: DataFrame, stratum: Column, score: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val x = score.cast("decimal(38,0)")
    // count(x), not count(*): sum/sum-of-squares skip null scores, so
    // n must too or the moment inequality mixes inconsistent moments
    // and wrongly filters any stratum containing null scores
    val stats = df.groupBy(stratum.as("__stratum"))
      .agg(count(x).cast("decimal(38,0)").as("__n"),
        sum(x).as("__s"), sum(x * x).as("__q"))
    val dev = x * col("__n") - col("__s")
    val keep = dev * dev * (col("__n") - 1) <=
      lit(k * k) * col("__n") * (col("__n") * col("__q") - col("__s") * col("__s"))
    // With a null-safe stratum key and x filtered non-null, the ONLY way
    // `keep` evaluates to null is a decimal(38,0) overflow (non-ANSI mode
    // nulls instead of throwing) — fail loudly instead of silently
    // dropping every row of the affected stratum.
    df.where(x.isNotNull)
      .join(broadcast(stats), stratum <=> col("__stratum"))
      .where(when(keep.isNull, raise_error(lit(
        "zScoreOutlierFilter: decimal(38,0) overflow computing the moment " +
          "inequality — stratum moments exceed the documented n^1.5*max|x| bound")))
        .otherwise(keep))
      .drop("__stratum", "__n", "__s", "__q")
  }

  /** Sequence packing: lay documents end-to-end (in deterministic
    * doc-id order within a shard) and assign each to the fixed-
    * capacity context bin where its first token lands — the
    * concat-and-chunk step that turns filtered documents into
    * training sequences. Output per document: (doc_id, shard, bin,
    * start_tok, n_tokens) with `start_tok` the document's start
    * position in the shard's token stream and
    * `bin = start_tok div capacity`.
    *
    * Scale shape: the running sum windows by SHARD, never globally —
    * shards are the stable [[Sampling.bucket]] of the id, so at 100 TB
    * `nShards` spreads the window into that many independent, balanced
    * sorts (pick nShards >= cluster cores; packing quality is
    * unaffected since bins never span shards). Ids must be unique:
    * the in-shard layout orders by doc_id, so duplicate ids would
    * make offsets partition-order-dependent.
    */
  def packSequences(
      df: DataFrame,
      id: Column,
      text: Column,
      capacity: Long,
      nShards: Int): DataFrame = {
    require(capacity > 0 && nShards > 0, s"capacity and nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(id.as("doc_id"), size(tokens(text)).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("shard", Sampling.bucket(col("doc_id"), nShards))
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), expr(s"start_tok div ${capacity}L").as("bin"),
        col("start_tok"), col("n_tokens"))
  }

  /** The packed-sequence TEXT deliverable: one row per (shard, bin)
    * with the documents' text concatenated in doc-id order — what
    * actually feeds a trainer after [[packSequences]] assigns bins.
    * This stage is the one place packed text must ride a shuffle
    * (the output IS text); everything upstream moved only ids and
    * counts. Deterministic: concatenation order is doc_id via an
    * array_sort over (doc_id, text) structs, independent of
    * partitioning.
    */
  def packedSequenceText(
      df: DataFrame,
      id: Column,
      text: Column,
      capacity: Long,
      nShards: Int,
      sep: String = " "): DataFrame = {
    val bins = packSequences(df, id, text, capacity, nShards)
    bins.join(df.select(id.as("doc_id"), text.as("__text")), "doc_id")
      .groupBy("shard", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("doc_id"), col("__text")))),
            x => x.getField("__text")), sep).as("seq_text"))
  }

  /** Distributed BPE merge-candidate counting — the inner loop of BPE
    * vocabulary training. Classic two-level shape: first collapse the
    * corpus to its word-frequency table (the heavy shuffle, map-side
    * combined on the word), then count adjacent character pairs over
    * the DISTINCT words weighted by frequency — pair extraction runs
    * once per unique word, not once per occurrence, which is what
    * makes BPE training tractable on a 100 TB corpus whose vocabulary
    * is millions of words, not trillions. Returns the top-K pairs by
    * weighted count (ties broken lexicographically) — the next merge
    * candidates. The transform() lambda is CodegenFallback but runs on
    * the skinny word table, never per document.
    */
  def bpePairCounts(df: DataFrame, text: Column, topK: Int = 20): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val words = df.select(explode(tokens(lower(text))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    words.where(length(col("word")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), length(col("word")) - 1),
        i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum("freq").as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)
  }

  /** Token frequency table: (token, count), the classic explode +
    * groupBy. Partial aggregation combines map-side, so the shuffle
    * carries one row per (partition, token), not per occurrence.
    */
  def tokenFrequencies(df: DataFrame, text: Column): DataFrame =
    df.select(explode(tokens(lower(text))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))

  /** Top-k TF-IDF terms per document. The score is integer-scaled
    * (tf * 1e6 div df) rather than tf*ln(N/df): ordering by tf/df is
    * identical for a fixed corpus, and integer arithmetic is
    * bit-reproducible across engines (ln() is not guaranteed to round
    * identically between libm implementations).
    *
    * Scale shape: ONE shuffle of (doc, token) partial counts builds
    * tf; df derives from tf itself (count of docs per token — no
    * second pass over raw tokens); the top-k window partitions by
    * doc_id (never global). The tf–df join keys on token and
    * sort-merges when the vocabulary outgrows broadcast.
    */
  def tfidfTopTerms(df: DataFrame, id: Column, text: Column, topK: Int = 3): DataFrame = {
    val toks = df.select(id.as("doc_id"), explode(tokens(lower(text))).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "token")
      .withColumn("score", expr("tf * 1000000 div df"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("score").desc, col("token"))))
      .where(col("rk") <= topK)
      .select("doc_id", "token", "tf", "df", "score")
  }

  /** Cross-document duplicated chunks under content-defined chunking:
    * split every document with the pure CDC boundary rule (native
    * codegen'd `cdc_chunks` — boundary where the trailing `w`-char
    * polynomial fingerprint mod `m` divides `d`; a shared substring
    * chunks identically wherever it appears, which is why CDC finds
    * copied passages that fixed-width blocking misses when text shifts
    * by one byte), fingerprint each chunk, and return the chunks that
    * occur in at least `minDocs` distinct documents.
    *
    * Output: (fp, n_docs, n_occ) — md5 of the chunk, distinct-document
    * count, total occurrence count.
    *
    * Scale shape: chunking + md5 run inside the scan stage (chunk TEXT
    * never shuffles — only 32-char fingerprints do); two
    * map-side-combined aggregations — (fp, doc) partial counts, then
    * per-fp doc/occurrence totals — and nothing else. No windows, no
    * joins, no driver collection; skew-safe because a pathological
    * hot chunk still reduces to one (fp, doc) row per document
    * before the second exchange.
    */
  def cdcDuplicateChunks(
      df: DataFrame, id: Column, text: Column,
      w: Int = 16, p: Long = 31L, m: Long = 1000000007L, d: Long = 32L,
      minDocs: Long = 2L): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val perDoc = df
      .select(id.as("doc_id"),
        explode(graft.functions.TextOps.cdcChunks(text, w, p, m, d)).as("chunk"))
      .select(col("doc_id"), md5(col("chunk")).as("fp"))
      .groupBy("fp", "doc_id").agg(count(lit(1)).as("k"))
    perDoc.groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), sum("k").as("n_occ"))
      .where(col("n_docs") >= minDocs)
  }

  /** Per-group n-gram diversity — the distinct-over-total n-gram
    * ratio (the corpus-level statistic behind self-BLEU-style
    * repetitiveness checks): per group (source, model, shard…), the
    * total word n-gram occurrences WITH multiplicity, the distinct
    * n-gram count, and the exact ppm distinct ratio. A low ratio says
    * the group keeps re-emitting the same phrases (template spam, a
    * looping generator); a ratio near 10⁶ says near-total novelty.
    * Documents shorter than n tokens contribute nothing.
    *
    * Scale: grams come from the native codegen'd `word_ngrams` kernel
    * (one fused scan per document — the interpreted transform+slice
    * chain cost ~46 s / 1M 45-token docs; the kernel is ~30× cheaper)
    * and explode map-only (no per-doc distinct — multiplicity IS the
    * statistic), then ONE map-side-combined aggregate keyed by
    * (group, gram) — vocabulary-bounded — and a group-keyed rollup of
    * that bounded table. The exchange still carries every distinct
    * (group, gram) string once — the inherently heaviest profile
    * statistic; a DIVERSITY estimate doesn't need the full corpus, so
    * run it over a [[Sampling.hashSample]] slice at the 100 TB scale.
    */
  def ngramDiversity(
      df: DataFrame,
      group: Column,
      text: Column,
      n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = coalesce(graft.functions.TextOps.wordNgrams(text, n),
      array().cast("array<string>"))
    df.select(group.as("grp"), explode(grams).as("g"))
      .groupBy("grp", "g").agg(count(lit(1)).as("c"))
      .groupBy("grp")
      .agg(sum("c").as("n_ngrams"), count(lit(1)).as("n_distinct"))
      .select(col("grp"), col("n_ngrams"), col("n_distinct"),
        expr("n_distinct * 1000000L div n_ngrams").as("distinct_ppm"))
  }

  /** Vocabulary-richness profile with the bias-corrected Chao1
    * estimate of UNSEEN vocabulary — the "how much new vocabulary
    * would more data bring" statistic a corpus-growth decision reads.
    * Over lowercased whitespace tokens: total token count, distinct
    * vocabulary D, hapax count f1 (frequency-1 types), dis legomena
    * f2 (frequency-2), and
    *
    *   chao1 = D + f1·(f1−1) div (2·(f2+1))
    *
    * (Chao 1984, bias-corrected form — defined even when f2 = 0, and
    * all integer arithmetic). A corpus whose chao1 ≈ D has exhausted
    * its vocabulary; chao1 >> D says sampling more of the same source
    * still buys new types.
    *
    * Scale: explode → ONE map-side-combined aggregate keyed by token
    * (the (token, count) table is vocabulary-bounded), then a 1-row
    * summary aggregate. f1/f2 are conditional counts over that
    * bounded table, not the data.
    */
  def vocabRichness(df: DataFrame, text: Column): DataFrame = {
    val counts = df
      .select(explode(tokens(lower(text))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    counts.agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("n_tokens"), col("n_types"), col("f1"), col("f2"),
        expr("n_types + f1 * (f1 - 1) div (2 * (f2 + 1))").as("chao1"))
  }
}
