package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset splitting for training-data
  * pipelines: every row's destination is a pure function of its key,
  * so splits are reproducible across runs, engines, and re-shuffles —
  * unlike `df.sample()`, whose result depends on partitioning.
  *
  * The bucket function is Knuth's multiplicative hash (golden-ratio
  * constant 2654435761) reduced mod `buckets` — plain 64-bit integer
  * arithmetic that any engine reproduces bit-identically, which keeps
  * the operators oracle-checkable (engine hash() builtins are not).
  * For string keys, hash the key to a long upstream (e.g. via a
  * stable content fingerprint) — the split must never depend on an
  * engine-specific hash.
  *
  * Scale shape: map-only (a projection + filter); no shuffle, no
  * driver state, trivially pushes through partition pruning.
  */
object Sampling {

  private val knuth = 2654435761L

  /** Stable bucket in [0, buckets) for an integer key.
    *
    * Overflow-free by construction: the key is first reduced mod `m`,
    * the largest multiple of `buckets` at or below 3·10⁹, so the
    * product stays under (3·10⁹)·knuth ≈ 8·10¹⁸ < 2⁶³ for ANY 64-bit
    * key — on engines that wrap (Spark non-ANSI) and engines that
    * throw (DuckDB, ANSI Spark) alike. The reduction is exact, not a
    * different hash: because `buckets` divides `m`, the dropped
    * quotient term `(key div m)·m·knuth` is ≡ 0 (mod buckets), so
    * `pmod((key mod m)·knuth, buckets) = (key·knuth) mod buckets` in
    * exact arithmetic — small-key bucketings are bit-identical to the
    * un-reduced formula.
    */
  def bucket(key: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val m = (3000000000L / buckets) * buckets
    pmod(pmod(key.cast("long"), lit(m)) * knuth, lit(buckets.toLong))
  }

  /** Deterministic fraction sample: keeps rows whose bucket (out of
    * `denominator`) falls below `numerator` — e.g. (1, 10) keeps a
    * stable 10%.
    */
  def hashSample(df: DataFrame, key: Column, numerator: Int, denominator: Int): DataFrame =
    df.where(bucket(key, denominator) < numerator)

  /** Named split assignment (train/val/test and friends): `weights`
    * are integer parts-per-`total` in order; every row gets exactly
    * one split label. Example: Seq("train" -> 80, "val" -> 10,
    * "test" -> 10).
    */
  def hashSplit(df: DataFrame, key: Column, weights: Seq[(String, Int)]): DataFrame = {
    val total = weights.map(_._2).sum
    val b = bucket(key, total)
    val cuts = weights.scanLeft(0)(_ + _._2).tail
    val expr = weights.zip(cuts).foldRight(lit(weights.last._1): Column) {
      case (((name, _), cut), acc) => when(b < cut, name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Leakage-safe split: [[hashSplit]] with the guarantee that
    * near-duplicate documents never straddle a split boundary. Every
    * member of a dedup group (a connected component of `pairs`, as
    * found by any of the near-dup detectors) is assigned from its
    * group REPRESENTATIVE's hash — the component's min id; documents
    * in no pair are their own representative — so an eval split stays
    * decontaminated by construction: a near-dup of a test document
    * cannot leak into train, which a per-document hash split permits
    * whenever a group's members hash across a cut.
    *
    * Scale shape: the group map from [[Dedup.dedupGroups]] is
    * pair-set-sized (only documents that HAVE a near-dup appear), ≪
    * corpus, so the join back is broadcast-able (AQE converts it when
    * small; at 100 TB the near-dup rate, typically single-digit
    * percent, keeps the rep map orders of magnitude under the corpus).
    * Assignment itself is the same map-only codegen'd when-chain as
    * [[hashSplit]].
    */
  def leakageSafeSplit(
      df: DataFrame,
      id: Column,
      pairs: DataFrame,
      weights: Seq[(String, Int)]): DataFrame = {
    val reps = Dedup.dedupGroups(pairs)
      .select(col("id").as("__lss_id"), col("keep_id").as("__lss_rep"))
    val keyed = df.withColumn("__lss_id", id.cast("long"))
      .join(reps, Seq("__lss_id"), "left")
      .withColumn("__lss_key", coalesce(col("__lss_rep"), col("__lss_id")))
    hashSplit(keyed, col("__lss_key"), weights)
      .drop("__lss_id", "__lss_rep", "__lss_key")
  }

  /** Weight-biased deterministic sampling without replacement: the
    * top `n` rows per stratum by ascending integer priority
    * `knuth_hash(id) div weight` (ties by id) — the
    * Efraimidis–Spirakis priority-sampling shape (keys `u^(1/w)`)
    * transplanted to integer arithmetic, so a row with twice the
    * weight is roughly twice as likely to make the sample, and the
    * selection is bit-reproducible across engines and partitionings
    * (a float `u^(1/w)` is neither). The corpus-curation use: sample
    * eval/inspection sets biased toward long or high-quality
    * documents without giving up determinism. Weights must be >= 1
    * (enforced with a floor, not an error, so a 0-quality doc is
    * merely least-likely, not dropped).
    *
    * Scale shape: one exchange on the stratum key into a per-stratum
    * top-n window. For a monster stratum the same two-phase salting
    * as [[capPerKeySalted]] applies (salt, top-n per salt shard, top-n
    * of the ≤ salt·n survivors) — the priority column is what makes
    * the two-phase split correct: per-shard top-n by priority is a
    * superset of the global top-n.
    */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
      stratum: Column, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    // reduce-first (mod p commutes with the multiply) so the product
    // never overflows — same contract note as [[bucket]]
    df.withColumn("__ws_h",
        pmod(pmod(id.cast("long"), lit(1000000007L)) * knuth, lit(1000000007L)))
      .withColumn("__ws_w", greatest(weight.cast("long"), lit(1L)))
      .withColumn("__ws_pr", expr("__ws_h div __ws_w"))
      .withColumn("__ws_rn", row_number().over(
        Window.partitionBy(stratum).orderBy(col("__ws_pr"), id)))
      .where(col("__ws_rn") <= n)
      .drop("__ws_h", "__ws_w", "__ws_rn")
      .withColumnRenamed("__ws_pr", "priority")
  }

  /** Deterministic global training-order permutation: every row gets
    * a pseudo-random but SEEDED total order — (shard, pos) with
    * `pos` dense 0..n-1 within each of `nShards` shards — so "shuffle
    * the corpus before training" is reproducible, resumable, and
    * changes wholesale with the seed (a new epoch = a new seed, no
    * state carried). The permutation key is the q93 two-round modular
    * Knuth hash (products stay under 2^63, so an oracle can replay it
    * in exact integer arithmetic), with the row key appended as the
    * tie-break so equal hashes cannot make the order ambiguous.
    *
    * Scale shape: one shuffle keyed by shard, then a per-shard sort +
    * dense rank — windows partition by shard (nShards of them), never
    * by a global ordering, so no single-partition Window ever forms;
    * a training job writes each shard as one sorted file and readers
    * stream shards in order.
    */
  def shuffleShards(df: DataFrame, key: Column, seed: Long, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(seed >= 0, s"seed must be non-negative, got $seed")
    import org.apache.spark.sql.expressions.Window
    val p = 1000000007L
    val h = pmod(pmod(key.cast("long"), lit(p)) * knuth, lit(p)) + lit(seed % p)
    df.withColumn("__sh_h", pmod(h * knuth, lit(p)))
      .withColumn("shard", pmod(col("__sh_h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__sh_h"), key)).cast("long") - 1L)
      .drop("__sh_h")
  }

  /** Ensemble quality blending — the DataComp-style curation move:
    * rank-normalize several integer quality signals into comparable
    * quantile buckets and sum them, so signals with incomparable
    * scales (chars, tokens, scores) vote equally. Output: the input
    * keyed by id plus one `b_<i>` bucket column per signal (0 =
    * lowest quantile) and their sum `blend`.
    *
    * Exact and deterministic: each signal's bucket boundaries are
    * [[Scale.rangeShardBoundaries]] order statistics (value-histogram
    * quantiles — driver-bounded by the VALUE DOMAIN, not the corpus;
    * no reservoir sampling, so two runs blend identically), and
    * assignment is the same map-only codegen'd comparison chain as
    * range sharding. Total cost: one skinny histogram aggregate per
    * signal + a single map-only projection — no global sort, no
    * single-partition rank window.
    */
  def qualityBlend(
      df: DataFrame,
      id: Column,
      signals: Seq[Column],
      nBuckets: Int = 4): DataFrame = {
    require(signals.nonEmpty, "qualityBlend needs at least one signal")
    require(nBuckets > 1, s"nBuckets must be > 1, got $nBuckets")
    val bucketCols = signals.zipWithIndex.map { case (sig, i) =>
      val bounds = Scale.rangeShardBoundaries(df, sig, nBuckets)
      bounds.foldLeft(lit(0L)) { (acc, b) =>
        acc + when(sig.cast("long") > b, 1L).otherwise(0L)
      }.as(s"b_$i")
    }
    val out = df.select(id.cast("long").as("doc_id") +: bucketCols: _*)
    out.withColumn("blend",
      signals.indices.map(i => col(s"b_$i")).reduce(_ + _))
  }

  /** Per-stratum deterministic sampling — the corpus-rebalancing
    * primitive for multilingual / multi-source training mixes
    * (downsample the dominant language, keep the tail whole). Each
    * stratum keeps `parts` of `denom` of its rows (strata absent from
    * `fractions` keep `defaultParts`), selected by the same stable
    * bucket function as [[hashSample]], so the kept set is
    * reproducible and nested: lowering a stratum's parts keeps a
    * subset of what the higher setting kept.
    *
    * Scale shape: the per-stratum threshold folds into one codegen'd
    * when-chain — map-only, zero shuffle, no join even with thousands
    * of strata (the chain is data-independent).
    */
  def stratifiedSample(
      df: DataFrame,
      key: Column,
      stratum: Column,
      fractions: Seq[(String, Int)],
      defaultParts: Int,
      denom: Int = 100): DataFrame = {
    require(denom > 0 && (defaultParts +: fractions.map(_._2)).forall(p => p >= 0 && p <= denom),
      s"parts must be in [0, $denom]")
    val threshold = fractions.foldRight(lit(defaultParts): Column) {
      case ((s, parts), acc) => when(stratum === s, parts).otherwise(acc)
    }
    df.where(bucket(key, denom) < threshold)
  }

  /** DSIR-shaped importance weighting for data selection: score every
    * document by how target-domain-like its token distribution is,
    * using the ratio of target-sample to full-corpus unigram
    * frequencies over a top-`vocabSize` vocabulary (hashed-ngram
    * importance resampling à la DSIR, with the feature space the
    * explicit top-V vocabulary so the model is inspectable). The
    * per-token ratio is the add-one-smoothed integer estimate
    * `((tgt_c+1) · src_total · scale) div ((src_c+1) · tgt_total)` —
    * scale/1 ≈ p_target/p_source; a document's `importance_mean` is
    * the floor-mean of its tokens' ratios (out-of-vocab tokens score
    * 0). Every intermediate is 64-bit integer arithmetic: selection
    * thresholds reproduce bit-for-bit across engines (the log-ratio a
    * float DSIR sums is a monotone transform per token; the linear
    * ratio keeps the same "looks in-domain" ordering signal without
    * float logs).
    *
    * Scale shape (the oovRate pattern): token counting is one
    * map-side-combined aggregate over DISTINCT tokens — corpus text
    * never shuffles; the vocabulary (V rows) and its totals (1 row)
    * broadcast back; scoring explodes doc tokens against the broadcast
    * ratio table and partial-aggregates before the per-doc exchange,
    * so only (doc_id, three longs) rides it. In production the ratio
    * table is trained once on a reference target sample and reused —
    * train-on-self keeps the contract self-contained.
    */
  def importanceWeights(
      df: DataFrame,
      id: Column,
      text: Column,
      isTarget: Column,
      vocabSize: Int,
      scale: Long = 10000L): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(scale > 0, s"scale must be positive, got $scale")
    val toks = TextAnalysis.tokens(lower(text))
    val counts = df
      .select(isTarget.as("__iw_t"), explode(toks).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("src_c"),
        sum(when(col("__iw_t"), 1L).otherwise(0L)).as("tgt_c"))
    val vocab = counts.orderBy(col("src_c").desc, col("token")).limit(vocabSize)
    // totals over the vocabulary (the model's support) — both sides of
    // the ratio normalize over the same token set
    val totals = vocab.agg(sum("src_c").as("src_total"), sum("tgt_c").as("tgt_total"))
    val ratio = vocab.crossJoin(broadcast(totals))
      .select(col("token"),
        expr(s"((tgt_c + 1L) * src_total * ${scale}L) div ((src_c + 1L) * tgt_total)").as("r"))
    df.select(id.cast("long").as("doc_id"), explode_outer(toks).as("token"))
      .join(broadcast(ratio), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(count(col("token")).as("n_tokens"),
        sum(when(col("r").isNotNull, 1L).otherwise(0L)).as("n_in_vocab"),
        sum(coalesce(col("r"), lit(0L))).as("importance_sum"))
      .withColumn("importance_mean",
        when(col("n_tokens") > 0, expr("importance_sum div n_tokens")).otherwise(0L))
  }

  /** Hashed-feature importance resampling — DSIR proper (Xie et al.
    * 2023): [[importanceWeights]]' scale path. The vocab-table variant
    * needs a global top-V cut over the token table; here the feature
    * space is word BIGRAMS hashed into a FIXED-width `nBuckets` model
    * (the paper's hashed n-gram generative model), so the model is
    * constant-size regardless of corpus vocabulary and no ordering
    * pass exists anywhere. Same integer contract arithmetic: bucket
    * ratio `((tgt_c+1)·src_total·scale) div ((src_c+1)·tgt_total)`
    * (add-one smoothed p_target/p_source; the float log-ratio DSIR
    * sums is a monotone per-feature transform), per-doc
    * `importance_mean = importance_sum div n_feats`, and the
    * resample cut is the deterministic top-`selectN` by
    * (importance_mean desc, doc_id) — Spark's sort-limit is
    * distributed partial top-k (TakeOrderedAndProject), never a
    * single-task funnel, and the selected set broadcasts back as a
    * semi-join flag.
    *
    * Scale shape: bigram hashing is map-only (native rolling hash);
    * the model aggregate is map-side combined onto ≤ nBuckets rows
    * which then BROADCAST back for scoring; per-doc scoring
    * partial-aggregates before the doc-keyed exchange so only
    * (doc_id, three longs) rides it. In production the nBuckets-row
    * model trains once on a reference target sample and is reused.
    */
  def hashedImportanceWeights(
      df: DataFrame,
      id: Column,
      text: Column,
      isTarget: Column,
      nBuckets: Int = 256,
      scale: Long = 10000L,
      selectN: Int = 100): DataFrame = {
    val ratio = hashedBigramRatio(df, text, isTarget, nBuckets, scale)
    val scored = dsirScoreAgainst(df, id, text, ratio, nBuckets)
    dsirSelect(scored, selectN)
  }

  /** The frozen nBuckets-row hashed-bigram ratio model behind
    * [[hashedImportanceWeights]], exposed so the STREAMING twin can
    * train once on a reference corpus and score arriving batches
    * against the broadcast model (q274) — exactly the production
    * deployment the batch docstring describes. (bkt, r) rows.
    */
  def hashedBigramRatio(
      df: DataFrame,
      text: Column,
      isTarget: Column,
      nBuckets: Int = 256,
      scale: Long = 10000L): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    require(scale > 0, s"scale must be positive, got $scale")
    val model = hashedBigramFeats(df, lit(0L), text, isTarget, nBuckets)
      .where(col("bkt").isNotNull)
      .groupBy("bkt")
      .agg(count(lit(1)).as("src_c"),
        sum(when(col("__iw_t"), 1L).otherwise(0L)).as("tgt_c"))
    val totals = model.agg(sum("src_c").as("src_total"), sum("tgt_c").as("tgt_total"))
    // the triple product (tgt_c+1)·src_total·scale wraps int64 once
    // the corpus holds ~1e9 bigrams at scale=10000, so the ratio runs
    // in DECIMAL(38,0) (exact to ~1e17 bigrams — beyond any real
    // corpus; the DuckDB oracle mirrors with HUGEINT) and only the
    // small quotient comes back as a long
    model.crossJoin(broadcast(totals))
      .select(col("bkt"),
        expr(s"""(CAST(tgt_c + 1L AS DECIMAL(38,0)) * src_total * ${scale}L) div
            (CAST(src_c + 1L AS DECIMAL(38,0)) * tgt_total)""").as("r"))
  }

  /** Score documents against a frozen [[hashedBigramRatio]] model —
    * map-only bigram hashing, broadcast ratio join, per-doc partial
    * aggregation; (doc_id, n_feats, importance_sum, importance_mean)
    * rows. Per-row deterministic given the model, so scoring a corpus
    * in one pass or in arriving micro-batches yields identical rows —
    * the property q274's streaming drain is pinned on.
    */
  def dsirScoreAgainst(
      df: DataFrame,
      id: Column,
      text: Column,
      ratio: DataFrame,
      nBuckets: Int = 256): DataFrame =
    hashedBigramFeats(df, id.cast("long"), text, lit(false), nBuckets)
      .join(broadcast(ratio), Seq("bkt"), "left")
      .groupBy("doc_id")
      .agg(count(col("bkt")).as("n_feats"),
        coalesce(sum(col("r")), lit(0L)).as("importance_sum"))
      .withColumn("importance_mean",
        when(col("n_feats") > 0, expr("importance_sum div n_feats")).otherwise(0L))

  /** The deterministic top-`selectN` resample cut over
    * [[dsirScoreAgainst]] scores: TakeOrderedAndProject top-k by
    * (importance_mean desc, doc_id), broadcast back as a flag.
    */
  def dsirSelect(scored: DataFrame, selectN: Int): DataFrame = {
    require(selectN > 0, s"selectN must be positive, got $selectN")
    val picked = scored
      .orderBy(col("importance_mean").desc, col("doc_id"))
      .limit(selectN)
      .select(col("doc_id"), lit(true).as("selected"))
    scored.join(broadcast(picked), Seq("doc_id"), "left")
      .withColumn("selected", coalesce(col("selected"), lit(false)))
  }

  private def hashedBigramFeats(
      df: DataFrame,
      id: Column,
      text: Column,
      isTarget: Column,
      nBuckets: Int): DataFrame = {
    val bigrams = graft.functions.TextOps.adjacentPairs(TextAnalysis.tokens(lower(text)))
    df.select(id.as("doc_id"), isTarget.as("__iw_t"),
        explode_outer(bigrams).as("bg"))
      .withColumn("bkt",
        when(col("bg").isNotNull,
          pmod(graft.functions.TextOps.rollingHash64(col("bg")), lit(nBuckets.toLong)))
          .otherwise(lit(null).cast("long")))
  }

  /** Temperature-based stratum reweighting (multinomial alpha
    * sampling — the mC4 / XLM-R recipe for balancing a multilingual
    * mix): a stratum with empirical share p is sampled proportionally
    * to p^alpha, i.e. every ROW of that stratum carries relative
    * weight p^(alpha-1) — alpha=1 is natural frequency, alpha→0 is
    * uniform-over-strata, the classic 0.5 squashes the head and
    * boosts the tail. Returns one row per stratum: (stratum, n_rows,
    * share, weight); weights are relative (normalize downstream if a
    * proper distribution is needed — normalizing here would make the
    * output depend on summation order across strata).
    *
    * One count aggregate over skinny (stratum) rows plus a scalar
    * total — nothing rides a shuffle but counts.
    */
  def stratumWeights(df: DataFrame, stratum: Column, alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val counts = df.groupBy(stratum.as("stratum")).agg(count(lit(1)).as("n_rows"))
    // the grand total joins in as a broadcast 1-row aggregate — one
    // lazy plan, no eager driver job
    counts
      .crossJoin(broadcast(counts.agg(sum(col("n_rows")).cast("double").as("__total"))))
      .withColumn("share", col("n_rows") / col("__total"))
      .withColumn("weight", pow(col("share"), lit(alpha - 1.0)))
      .drop("__total")
  }

  /** Per-key document cap — the "at most N pages per domain" rule that
    * keeps a single over-crawled site from dominating a training mix.
    * Deterministic: within each key, rows survive in ascending `order`
    * (typically the stable document id), first `cap` kept.
    *
    * Shape: a window row_number over (key, order). The shuffle
    * partitions by key, so a single monster key serializes through one
    * task's sort — for corpora where one domain can exceed an
    * executor's partition budget, pre-prune with a two-phase cap:
    * cap within each of B salted sub-buckets first (bounding any
    * task at `cap` rows per sub-bucket), then apply this exact window
    * to the ≤ B*cap survivors per key. [[capPerKeySalted]] implements
    * that guard; results are identical because ranks only ever drop
    * rows the exact pass would also drop.
    */
  def capPerKey(df: DataFrame, key: Column, order: Column, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(key).orderBy(order)))
      .where(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Skew-guarded [[capPerKey]]: phase 1 caps within `salt` hash
    * sub-buckets of each key (any window task sorts at most one
    * sub-bucket and emits ≤ cap rows from it), phase 2 runs the exact
    * cap over the ≤ salt*cap survivors per key. Identical output to
    * the exact pass: phase 1 only drops rows ranked > cap within a
    * sub-bucket, which are ranked > cap within the whole key too.
    */
  def capPerKeySalted(df: DataFrame, key: Column, order: Column, cap: Int,
      salt: Int = 64): DataFrame = {
    require(cap > 0 && salt > 0, s"cap and salt must be positive")
    import org.apache.spark.sql.expressions.Window
    val phase1 = df.withColumn("__rn",
        row_number().over(
          Window.partitionBy(key, bucket(order, salt)).orderBy(order)))
      .where(col("__rn") <= cap)
      .drop("__rn")
    capPerKey(phase1, key, order, cap)
  }

  /** Materialize a training MIXTURE: upsample each source by an
    * integer epoch count (the Gopher/LLaMA-style "low-resource
    * sources repeat" recipe — [[stratumWeights]] computes relative
    * weights; round them to integers upstream) and assign every
    * (document, epoch) copy a deterministic interleave key. Reading
    * the result in `mix_key` order yields a stable shuffled blend of
    * sources/epochs — the same blend on every engine, run, and
    * partitioning, which makes training-order reproducibility a
    * property of the DATA instead of the loader.
    *
    * Sources absent from `epochs` default to 1 epoch; a source mapped
    * to 0 is dropped entirely.
    *
    * Shape: map-only — explode of a literal epoch range plus a Knuth
    * hash of (id, epoch) for the key. No shuffle here; the downstream
    * writer sorts/partitions by `mix_key` (a range exchange it would
    * pay for ANY global order).
    */
  def materializeMixture(
      df: DataFrame, source: Column, id: Column,
      epochs: Map[String, Int]): DataFrame = {
    require(epochs.values.forall(_ >= 0), s"epoch counts must be >= 0, got $epochs")
    val epochsOf = epochs.foldLeft(lit(1)) { case (acc, (s, e)) =>
      when(source === s, e).otherwise(acc)
    }
    // two modular Knuth rounds; every intermediate product stays below
    // (1e9+7)*knuth ~ 2.7e18 < 2^63, so the key is overflow-free for
    // ANY doc id on engines that wrap (Spark non-ANSI) and on engines
    // that throw (DuckDB) alike. Collisions in the 1e9+7 space are
    // fine — readers tiebreak on (source, doc_id, epoch).
    val m = lit(1000000007L)
    df.select(source.as("source"), id.cast("long").as("doc_id"), epochsOf.as("__e"))
      .where(col("__e") > 0)
      .select(col("source"), col("doc_id"),
        explode(sequence(lit(0), col("__e") - 1)).as("epoch"))
      .withColumn("mix_key",
        pmod((pmod(pmod(col("doc_id"), m) * knuth, m) + col("epoch")) * knuth, m))
  }
}
