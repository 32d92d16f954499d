package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The standard corpus-preparation pipeline, composed from the
  * library's operators: exact dedup keeping the best representative,
  * repetition-based quality filtering, PII redaction, deterministic
  * train/val/test assignment. The whole composition is deterministic
  * and oracle-checkable end-to-end (q62) — a corpus prepared twice,
  * or on two engines, is bit-identical.
  *
  * Scale shape: one fingerprint-keyed shuffle for the dedup (text
  * never rides it), two skinny-count aggregate levels for the
  * metrics, and ONE text-carrying shuffle to join surviving documents
  * back for redaction — redaction and split assignment themselves are
  * map-only. Nothing is all-pairs; state is bounded by distinct
  * fingerprints.
  */
object CorpusPipeline {

  final case class Config(
      minTokens: Long = 5L,
      maxTopTokenFrac: Double = 0.5,
      splits: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10))

  /** The FUZZY variant: near-duplicate GROUPS (blocked n-gram Jaccard
    * pairs -> connected components) instead of exact fingerprints, one
    * best-scored representative kept per component, then the same
    * quality filter -> redaction -> split tail. This is the full
    * production fuzzy-dedup pipeline (the DataComp/FineWeb shape), and
    * because every stage is deterministic and SQL-expressible it is
    * oracle-checked END-TO-END (q63) — including the connected
    * components, via a recursive CTE.
    *
    * Returns one row per surviving representative:
    * (doc_id, n_members, split, n_tokens, uniq_ratio, top_token_frac,
    * redacted) where n_members counts the component the rep stands for.
    */
  def prepareFuzzy(
      docs: DataFrame,
      id: Column,
      text: Column,
      lang: Column,
      nChars: Column,
      score: Column,
      jaccardThreshold: Double = 0.5,
      bucketWidth: Int = 100,
      n: Int = 3,
      cfg: Config = Config()): DataFrame = {
    val pairs = Dedup.ngramJaccardNearDups(docs, id, text, lang, nChars,
      n = n, threshold = jaccardThreshold, bucketWidth = bucketWidth)
      .select("id_a", "id_b")
    // (id, keep_id = component min) for every doc appearing in a pair
    val groups = Dedup.dedupGroups(pairs).withColumnRenamed("id", "doc_id")
    val labeled = docs.select(id.as("doc_id"), score.cast("long").as("score"))
      .join(groups, Seq("doc_id"), "left")
      .withColumn("grp", coalesce(col("keep_id"), col("doc_id")))
    val reps = labeled.groupBy("grp")
      .agg(
        max_by(col("doc_id"), struct(col("score"), -col("doc_id"))).as("doc_id"),
        count(lit(1)).as("n_members"))
      .select("doc_id", "n_members")
    // metrics over representatives only: semi-join first so the
    // explode+count work is not spent on eliminated near-duplicates
    val repDocs = docs.select(id.as("doc_id"), text.as("text"))
      .join(reps.select("doc_id"), Seq("doc_id"), "left_semi")
    val metrics = TextAnalysis.repetitionMetrics(repDocs, col("doc_id"), col("text"))
      .select("doc_id", "n_tokens", "uniq_ratio", "top_token_frac")
    val surviving = reps.join(metrics, "doc_id")
      .where(col("n_tokens") >= cfg.minTokens &&
        col("top_token_frac") <= cfg.maxTopTokenFrac)
    val redacted = TextAnalysis.redactPii(docs, id, text)
      .select("doc_id", "redacted")
    Sampling.hashSplit(surviving.join(redacted, "doc_id"), col("doc_id"), cfg.splits)
      .select("doc_id", "n_members", "split", "n_tokens", "uniq_ratio",
        "top_token_frac", "redacted")
  }

  /** The SHARDED-DELIVERY tail of corpus preparation, composed from
    * the per-source / line-level operators: cap each source at
    * `capPerSource` docs (deterministic by id), line-dedup the capped
    * corpus (first occurrence of every trimmed line survives), drop
    * documents left with fewer than `minKeptLines` surviving lines,
    * then lay the deduped text into fixed-capacity training sequences.
    * Deterministic end-to-end — oracle-checked stage by stage (q84).
    *
    * Returns [[TextAnalysis.packSequences]] rows over the deduped
    * text: (doc_id, shard, bin, start_tok, n_tokens).
    *
    * Scale: the cap is one skinny window pass (salt it via
    * [[Sampling.capPerKeySalted]] for monster sources), line dedup's
    * three shuffles are skew-safe (see [[Dedup.dedupLines]]), packing
    * windows per shard. Text rides exactly two exchanges: line-dedup
    * reassembly and the shard window.
    */
  def prepareLines(
      docs: DataFrame,
      id: Column,
      text: Column,
      source: Column,
      capPerSource: Int = 1000,
      minKeptLines: Long = 1L,
      capacity: Long = 2048L,
      nShards: Int = 64): DataFrame = {
    val capped = Sampling.capPerKey(
      docs.select(id.as("doc_id"), text.as("text"), source.as("source")),
      col("source"), col("doc_id"), capPerSource)
    val deduped = Dedup.dedupLines(capped, col("doc_id"), col("text"))
      .where(col("n_kept") >= minKeptLines)
    TextAnalysis.packSequences(deduped, col("doc_id"), col("text_dedup"),
      capacity, nShards)
  }

  /** Returns one row per SURVIVING document:
    * (doc_id, split, n_tokens, uniq_ratio, top_token_frac, redacted).
    */
  def prepare(
      docs: DataFrame,
      id: Column,
      text: Column,
      score: Column,
      cfg: Config = Config()): DataFrame = {
    // 1. exact dedup: one representative per normalized fingerprint,
    //    best score wins (ties to smallest id) — only ids survive here
    val kept = Dedup.keepBest(docs, id, text, score)
      .select(col("keep_id").as("doc_id"))
    // 2. repetition/quality metrics — skinny (doc_id, counts) rows,
    //    computed over SURVIVORS only (semi-join first: the
    //    explode+count work would otherwise be spent on eliminated
    //    duplicates, often 2-5x of a scraped corpus). The semi-join
    //    replaces the old kept-join below — same shuffle budget.
    val keptDocs = docs.select(id.as("doc_id"), text.as("text"))
      .join(kept, Seq("doc_id"), "left_semi")
    val surviving = TextAnalysis.repetitionMetrics(keptDocs, col("doc_id"), col("text"))
      .select("doc_id", "n_tokens", "uniq_ratio", "top_token_frac")
      .where(col("n_tokens") >= cfg.minTokens &&
        col("top_token_frac") <= cfg.maxTopTokenFrac)
    // 3. redact survivors only (the one text-carrying join)
    val redacted = TextAnalysis.redactPii(docs, id, text)
      .select("doc_id", "redacted")
    // 4. deterministic split assignment — map-only
    Sampling.hashSplit(surviving.join(redacted, "doc_id"), col("doc_id"), cfg.splits)
      .select("doc_id", "split", "n_tokens", "uniq_ratio", "top_token_frac", "redacted")
  }

  /** Incremental corpus RELEASE: reconcile the current version against
    * a fresh crawl and produce the next version end-to-end —
    * [[Snapshot.diff]] decides what moved, only `added`/`changed`
    * documents re-enter quality filtering (a token-count gate here; a
    * release pins whatever gates it uses), `removed` ids become
    * deletes, and [[Snapshot.applyChanges]] materializes version N+1.
    * Documents that fail the gate DON'T enter the release: a changed
    * document that degraded below the bar keeps its OLD version (the
    * conservative choice — a release never replaces good content with
    * junk), and an added one is simply not admitted.
    *
    * Scale shape: diff moves fingerprints only; the quality gate runs
    * on the crawl-side added/changed slice (semi-join, crawl-sized at
    * worst, release-sized typically); applyChanges anti-joins the
    * corpus against the release-sized change-id set. The unchanged
    * bulk — the overwhelming majority between releases — never has
    * its content on any exchange.
    */
  def incrementalRelease(
      corpus: DataFrame,
      crawl: DataFrame,
      id: Column,
      text: Column,
      minTokens: Long): DataFrame = {
    val d = Snapshot.diff(corpus, crawl, id, text)
    val crawlDocs = crawl.select(id.cast("long").as("id"), text.as("content"))
    val admitted = crawlDocs
      .join(d.where(col("status").isin("added", "changed")), Seq("id"), "left_semi")
      .where(size(TextAnalysis.tokens(col("content"))) >= minTokens)
      .select(col("id"), lit("upsert").as("op"), col("content"))
    val deletes = d.where(col("status") === "removed")
      .select(col("id"), lit("delete").as("op"), lit(null).cast("string").as("content"))
    Snapshot.applyChanges(corpus, id, text, admitted.unionByName(deletes))
  }
}
