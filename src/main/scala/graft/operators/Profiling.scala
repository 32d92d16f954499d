package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic data profiling — the engine-side analog of DuckDB's
  * SUMMARIZE / Spark's describe(), built for oracle comparison:
  * per-column non-null count, null count, and min/max rendered as
  * strings (callers pick columns whose string form is
  * engine-independent — ints and strings always are; raw doubles
  * format differently across engines and belong in typed queries).
  *
  * Scale shape: ONE aggregate pass computes every column's stats
  * simultaneously (map-side partial combine, a single one-row global
  * aggregate — no per-column jobs, no shuffle of data rows), then the
  * one row unpivots to (col_name, …) rows driver-free.
  */
object Profiling {

  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        (count(lit(1)) - count(col(c))).as(s"${c}__nn"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"${c}__n").as("n_nonnull"),
        col(s"${c}__nn").as("n_null"),
        col(s"${c}__min").as("min_s"),
        col(s"${c}__max").as("max_s"))
    }
    one.select(explode(array(entries: _*)).as("s"))
      .select("s.col_name", "s.n_nonnull", "s.n_null", "s.min_s", "s.max_s")
  }

  /** Per-group categorical diversity as INTEGER-EXACT Gini impurity:
    * `gini = 1 - Σ(c_i/N)²`, scaled to parts-per-`scale` with all
    * arithmetic in DECIMAL(38,0) and one truncating integral divide —
    * `((N² - Σc_i²)·scale) div N²` — so the score is bit-reproducible
    * across engines (entropy needs float logs; Gini ranks the same
    * concentration signal exactly). 0 = one category owns the group,
    * scale·(1-1/k) = k categories perfectly balanced. The
    * mixture-monitoring primitive: language/source diversity per
    * shard, per day, per cluster — alerting on a collapsed mix.
    *
    * Scale shape: two map-side-combined aggregations — (group,
    * category) counts, then per-group moment rollup; only counts ride
    * the exchanges. DECIMAL(38,0) keeps N² exact to N ≈ 10^19 — no
    * 64-bit overflow cliff at 100 TB group sizes (DuckDB mirrors it
    * in HUGEINT).
    */
  def giniDiversity(df: DataFrame, group: Column, category: Column,
      scale: Long = 1000000L): DataFrame =
    df.groupBy(group.as("grp"), category.as("cat"))
      .agg(count(lit(1)).as("c"))
      .groupBy("grp")
      .agg(
        sum(col("c")).cast("decimal(38,0)").as("n"),
        count(lit(1)).as("n_cats"),
        sum(col("c") * col("c")).cast("decimal(38,0)").as("ssq"))
      .select(col("grp"), col("n").cast("long").as("n_rows"), col("n_cats"),
        expr(s"CAST(((n*n - ssq) * ${scale}L) div (n*n) AS BIGINT)").as("gini"))

  /** Mergeable approximate quantiles per group — the sketch-family
    * sibling of q16's HLL distinct count: `approx_percentile` is a
    * KLL/GK-style summary with bounded RANK error 1/accuracy, whose
    * partial states merge associatively, so the aggregation is one
    * map-side-combined pass at any scale (exact `percentile` instead
    * collects every value of a group onto one reducer).
    *
    * Engine-specific sketch => no SQL oracle (rows-only in the
    * contract); the rank-error bound is gated in `ProfilingSpec`
    * against the exact percentile.
    */
  def approxQuantiles(
      df: DataFrame, key: Column, value: Column,
      qs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), s"quantiles must be in [0,1]: $qs")
    // output columns are named p<percent rounded to an integer> —
    // quantiles that round to the same percent would collide into
    // duplicate column names, so reject them up front
    val names = qs.map(q => s"p${(q * 100).round}")
    require(names.distinct.size == names.size,
      s"quantiles $qs collide after percent rounding: $names — space them >= 0.01 apart")
    df.groupBy(key.as("key"))
      .agg(approx_percentile(value, array(qs.map(lit): _*), lit(accuracy)).as("qv"))
      .select(col("key") +: qs.zipWithIndex.map { case (q, i) =>
        element_at(col("qv"), i + 1).as(names(i))
      }: _*)
  }

  /** Sketch CERTIFICATION: per-group HLL estimate asserted against the
    * exact distinct count. Output is (key, n_exact, within_bound) —
    * engine-independent (the estimate itself never leaves the plan), so
    * an external engine oracle-checks it by computing the exact side
    * and the trivially-true bound. `margin` defaults to 3× Spark's
    * default HLL rsd (0.05): a 3-sigma relative-error bound that a
    * healthy sketch satisfies deterministically for a fixed input.
    *
    * Scale shape: ONE shuffle — both aggregates partial-combine
    * map-side. The exact countDistinct is the certification cost (the
    * production path is the sketch alone); at 100 TB run this on a
    * sampled or per-partition slice, not the full corpus.
    */
  def approxDistinctCertify(
      df: DataFrame, key: Column, value: Column, margin: Double = 0.15): DataFrame =
    df.groupBy(key.as("key"))
      .agg(
        countDistinct(value).as("n_exact"),
        approx_count_distinct(value).as("n_approx"))
      .select(col("key"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) <= col("n_exact") * margin)
          .as("within_bound"))

  /** Sketch certification for [[approxQuantiles]]: per group and
    * quantile q, asserts the approx value's exact rank interval
    * [lt+1, le] intersects the GK guarantee window
    * q*n ± (n/accuracy + 1). Output (key, n, within_p<q>…) is
    * engine-independent: the approx values participate only in the
    * booleans, never in the output, so DuckDB oracle-checks with exact
    * counts and literal TRUEs.
    *
    * Plan: pass 1 aggregates the per-group sketch (map-side combined),
    * the tiny result broadcasts back onto the data, pass 2 is one more
    * map-side-combined aggregate counting values under each threshold —
    * two shuffles of #groups rows each, data rows never shuffle twice.
    */
  def approxQuantilesCertify(
      df: DataFrame, key: Column, value: Column,
      qs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val names = qs.map(q => s"p${(q * 100).round}")
    val approx = approxQuantiles(df, key, value, qs, accuracy)
    val in = df.select(key.as("key"), value.cast("double").as("v"))
    val joined = in.join(broadcast(approx), Seq("key"))
    val aggs = count(col("v")).as("n") +: names.flatMap { nm =>
      Seq(
        sum(when(col("v") < col(nm), 1L).otherwise(0L)).as(s"${nm}_lt"),
        sum(when(col("v") <= col(nm), 1L).otherwise(0L)).as(s"${nm}_le"))
    }
    joined.groupBy("key").agg(aggs.head, aggs.tail: _*)
      .select(col("key") +: col("n") +: qs.zip(names).map { case (q, nm) =>
        val slack = col("n").cast("double") / accuracy + lit(1.0)
        val target = col("n").cast("double") * q
        ((col(s"${nm}_le").cast("double") >= target - slack) &&
          (col(s"${nm}_lt").cast("double") + 1.0 <= target + slack)).as(s"within_$nm")
      }: _*)
  }

  /** Per-group equi-width value histogram: bucket = floor(value /
    * width) — the distribution profile a data release ships next to
    * its row counts. One map-side-combined aggregation; the exchange
    * carries (key, bucket, partial count) rows, bounded by groups ×
    * occupied buckets regardless of corpus size. Empty buckets are
    * absent by construction (dense zero-filling is a presentation
    * concern, and materializing it would make output size depend on
    * the value RANGE rather than the data).
    */
  def histogram(df: DataFrame, key: Column, value: Column, width: Double): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    df.groupBy(key.as("key"), floor(value / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Shared TWO-PHASE exact order-statistic kernel (the
    * [[graft.operators.Analytics.gapProfile]] machinery generalized
    * to several quantiles at once): values may be near-unique 64-bit
    * longs, so a single-level value histogram would put a hot group's
    * whole domain through one window task. Phase A aggregates counts
    * per (group, v div 2^coarseBits) and walks the bucket cumulative
    * to find, for EVERY requested permille, the bucket holding its
    * ⌈n·q/1000⌉-th value plus the residual in-bucket rank; phase B
    * counts fine values inside only those buckets and takes each
    * residual order statistic. Any per-group window task is bounded
    * by max(occupied buckets, |quantiles|·2^coarseBits) — ~√domain at
    * the default 22 bits — never the group's row count. Returns one
    * row per (g, q permille) with the exact type-1 value; `base` must
    * be persisted by the caller (both phases scan it).
    */
  private def exactGroupQuantiles(
      base: DataFrame, permilles: Seq[Int], coarseBits: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(coarseBits >= 0 && coarseBits <= 62,
      s"coarseBits must be in [0, 62], got $coarseBits")
    require(permilles.nonEmpty && permilles.forall(q => q >= 1 && q <= 1000),
      s"permilles must be in [1, 1000], got $permilles")
    val width = 1L << coarseBits
    val coarse = base
      .groupBy(col("g"), expr(s"v div ${width}L").as("cb"))
      .agg(count(lit(1)).as("c"))
    val totals = coarse.groupBy("g").agg(sum("c").as("n"))
    val cumW = Window.partitionBy("g").orderBy("cb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRank = coarse
      .withColumn("cum", sum("c").over(cumW))
      .join(totals, "g")
      .withColumn("q", explode(array(permilles.map(lit(_)): _*)))
      .withColumn("rank", expr("(n * q + 999L) div 1000L"))
    val sel = withRank.where(col("cum") >= col("rank"))
      .groupBy("g", "q").agg(min("cb").as("mb"))
    val need = withRank.join(sel, Seq("g", "q"))
      .where(col("cb") === col("mb"))
      .select(col("g"), col("q"), col("mb"),
        (col("rank") - (col("cum") - col("c"))).as("need"))
    base.join(broadcast(need), "g")
      .where(expr(s"v div ${width}L") === col("mb"))
      .groupBy("g", "q", "need", "v").agg(count(lit(1)).as("fc"))
      .withColumn("fcum", sum("fc").over(
        Window.partitionBy("g", "q").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("fcum") >= col("need"))
      .groupBy("g", "q").agg(min("v").as("qv"))
  }

  /** Exact per-group quantile gate: for each group, the type-1
    * p50/p90/p99 of an integer value (the ⌈n·q⌉-th smallest — a real
    * element, no interpolation, engine-identical) plus the group's
    * count — the latency/size SLO row a pipeline checks per event
    * type or source. Runs on the two-phase [[exactGroupQuantiles]]
    * kernel, so near-unique value domains (latency micros, byte
    * sizes) never funnel a hot group through one window task.
    */
  def groupQuantiles(df: DataFrame, group: Column, value: Column,
      coarseBits: Int = 22): DataFrame = Scale.withAqeOff(df.sparkSession) { rb =>
    val base = rb(df.select(group.as("g"), value.cast("long").as("v"))).persist()
    val totals = base.groupBy("g").agg(count(lit(1)).as("n"))
    val qv = exactGroupQuantiles(base, Seq(500, 900, 990), coarseBits)
    val out = totals.join(
      qv.groupBy("g").agg(
        max(when(col("q") === 500, col("qv"))).as("p50"),
        max(when(col("q") === 900, col("qv"))).as("p90"),
        max(when(col("q") === 990, col("qv"))).as("p99")), "g")
      .select(col("g"), col("n"), col("p50"), col("p90"), col("p99"))
      .localCheckpoint(true)
    base.unpersist()
    out
  }

  /** Per-group winsorization: clip each value to its group's exact
    * type-1 `permille` quantile ([[groupQuantiles]]'s order statistic
    * applied as a TRANSFORM) — the outlier-capping step before
    * rolling features or target encoding trust a raw metric. Output:
    * (id, g, v, v_cap, v_clipped = least(v, v_cap)).
    *
    * Scale: the cap comes off the two-phase [[exactGroupQuantiles]]
    * kernel (near-unique domains never funnel a group through one
    * window task); the cap table is group-domain-sized and broadcasts
    * back, so rows cross hash exchanges only into the two bucket
    * aggregates and none on the way back.
    */
  def winsorize(
      df: DataFrame,
      id: Column,
      group: Column,
      value: Column,
      permille: Int = 990,
      coarseBits: Int = 22): DataFrame = Scale.withAqeOff(df.sparkSession) { rb =>
    val base = rb(df.select(id.as("id"), group.as("g"), value.cast("long").as("v")))
      .persist()
    val caps = exactGroupQuantiles(base.select(col("g"), col("v")),
      Seq(permille), coarseBits)
      .select(col("g"), col("qv").as("v_cap"))
    val out = base.join(broadcast(caps), "g")
      .select(col("id"), col("g"), col("v"), col("v_cap"),
        least(col("v"), col("v_cap")).as("v_clipped"))
      .persist()
    out.count()
    base.unpersist()
    out
  }

  /** Robust per-group outlier gate: exact type-1 median, exact MAD
    * (median absolute deviation — the robust spread statistic that,
    * unlike stddev, one bot's 10⁹-char "document" cannot drag), and
    * the count of |v − median| > madFactor·MAD outliers. Output:
    * (g, n, med, mad, n_outliers).
    *
    * Scale: BOTH medians come off the two-phase
    * [[exactGroupQuantiles]] histogram kernel (value-domain-bounded
    * windows, never a per-group row sort); the two model-sized
    * median tables broadcast back, so corpus rows cross only hash
    * exchanges into the bucket aggregates and the final group count.
    */
  def madProfile(
      df: DataFrame,
      group: Column,
      value: Column,
      madFactor: Int = 3,
      coarseBits: Int = 22): DataFrame = {
    require(madFactor >= 1, s"madFactor must be >= 1, got $madFactor")
    // the kernel's actions are pre-sized skinny exchanges — AQE's
    // per-exchange sub-jobs only serialize them (full-run A/B
    // 2026-08-18: q244 1.17 s AQE-off vs 2.02 s on); scoped off here,
    // the session keeps its production setting
    Scale.withAqeOff(df.sparkSession) { rb =>
    // persist WITHOUT eager counts: the med/mad kernels' broadcast
    // subtree jobs are the first actions over each cache and populate
    // it as a side effect — the two dedicated warm-up counts were pure
    // job overhead (q244: 15 → 9 jobs); both caches stay resident
    // through the output checkpoint below, after which they release
    val base = rb(df.select(group.as("g"), value.cast("long").as("v"))).persist()
    val med = exactGroupQuantiles(base, Seq(500), coarseBits)
      .select(col("g"), col("qv").as("med"))
    val devs = base.join(broadcast(med), "g")
      .select(col("g"), col("med"), abs(col("v") - col("med")).as("dev"))
      .persist()
    val mad = exactGroupQuantiles(
      devs.select(col("g"), col("dev").as("v")), Seq(500), coarseBits)
      .select(col("g"), col("qv").as("mad"))
    val out = devs.join(broadcast(mad), "g")
      .groupBy(col("g"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("dev") > col("mad") * madFactor, 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("g"), col("n"), col("med"), col("mad"), col("n_outliers"))
      .localCheckpoint(true)
    devs.unpersist()
    base.unpersist()
    out
    }
  }

  /** Certified Misra–Gries heavy hitters (q16/q94 pattern): run the
    * mergeable k-counter sketch (native `heavy_hitters` aggregate —
    * every task carries at most k counters, the reason this beats a
    * full groupBy when the item domain is huge), then certify its
    * order-independent guarantees against the exact counts: for each
    * of the true top-`topM` items, (a) the sketch contains it —
    * guaranteed whenever true(x) > n/(k+1) — and (b) its estimate is
    * in [true - n/(k+1), true]. Only the EXACT side plus the two
    * booleans reach the output, so the query is fully oracle-checkable
    * even though raw MG estimates are partition-order dependent.
    * (The exact side exists for certification; production runs keep
    * just the sketch.)
    */
  def heavyHittersCertify(df: DataFrame, item: Column, k: Int, topM: Int): DataFrame = {
    val items = df.select(item.as("it")).where(col("it").isNotNull)
    val sketch = items.agg(
      graft.functions.Sketch.heavyHitters(col("it"), k).as("hh"),
      count(lit(1)).as("n"))
    heavyHittersCertifyAgainst(sketch, items, k, topM)
  }

  /** Certify an externally-produced heavy-hitters sketch row (columns
    * `hh` array<struct<item,est>>, `n` long — e.g. a DRAINED streaming
    * aggregation) against exact counts of `items` (column `it`). Split
    * out of [[heavyHittersCertify]] so the streaming path proves the
    * same guarantees through the state store.
    */
  def heavyHittersCertifyAgainst(
      sketch: DataFrame, items: DataFrame, k: Int, topM: Int): DataFrame = {
    require(topM >= 1, s"topM must be >= 1, got $topM")
    val top = items.groupBy("it").agg(count(lit(1)).as("exact_count"))
      .orderBy(col("exact_count").desc, col("it")).limit(topM)
    top.crossJoin(sketch) // 1-row sketch side
      .withColumn("m", element_at(
        filter(col("hh"), e => e.getField("item") === col("it")), 1))
      .select(col("it").as("token"), col("exact_count"),
        col("m").isNotNull.as("in_sketch"),
        (col("m").isNotNull && col("m").getField("est") <= col("exact_count") &&
          (col("exact_count") - col("m").getField("est")) * (k + 1) <= col("n"))
          .as("within_bound"))
  }

  /** Count-Min sketch certification — the dual of
    * [[heavyHittersCertify]]: build a d×w `cms_sketch` over the item
    * stream, point-query the top-M exact items, and certify the two
    * CMS guarantees per item: `no_undercount` (est ≥ exact — holds
    * ALWAYS, cells only add) and `within_bound` (est ≤ exact +
    * slack·n/w — the probabilistic overcount bound with a deliberate
    * 16× slack so the assertion is deterministic-in-practice on any
    * fixture while staying far tighter than the trivial n).
    *
    * Scale shape: the sketch is ONE aggregate whose partials are d·w
    * longs per task regardless of domain size — map-side combined,
    * elementwise-add merge, corpus never shuffles; the exact top-M
    * side exists only to certify (a production profile queries the
    * sketch directly).
    */
  def cmsCertify(df: DataFrame, item: Column, d: Int, w: Int, topM: Int,
      slack: Long = 16L): DataFrame = {
    val items = df.select(item.as("it")).where(col("it").isNotNull)
    val sketch = items.agg(graft.functions.Sketch.cmsSketch(col("it"), d, w).as("cms"))
    cmsCertifyAgainst(sketch, items, d, w, topM, slack)
  }

  /** Certify an externally-produced CMS row (column `cms`
    * struct<n,counts> — e.g. a DRAINED streaming aggregation) against
    * exact counts of `items` (column `it`) — the
    * [[heavyHittersCertifyAgainst]] split for the Count-Min dual.
    */
  def cmsCertifyAgainst(sketch: DataFrame, items: DataFrame,
      d: Int, w: Int, topM: Int, slack: Long = 16L): DataFrame = {
    require(topM >= 1, s"topM must be >= 1, got $topM")
    val top = items.groupBy("it").agg(count(lit(1)).as("exact_count"))
      .orderBy(col("exact_count").desc, col("it")).limit(topM)
    top.crossJoin(sketch) // 1-row sketch side
      .withColumn("est", graft.functions.Sketch.cmsQuery(col("cms"), col("it"), d, w))
      .select(col("it").as("token"), col("exact_count"),
        (col("est") >= col("exact_count")).as("no_undercount"),
        ((col("est") - col("exact_count")) * w <= lit(slack) * col("cms.n"))
          .as("within_bound"))
  }

  /** Per-source dataset datacard — the release datasheet row: doc
    * count, character mass, language spread, and the EXACT type-1
    * median document length (smallest value whose cumulative count
    * reaches ceil(n/2) — integer order statistic, no interpolation,
    * so it cross-checks against any engine).
    *
    * Scale shape: one map-side-combined aggregate to per-(source,
    * length) histogram rows plus one to per-source totals; the median
    * comes from a cumulative window over each source's LENGTH
    * histogram — partitioned by source and bounded by the value
    * domain, never a corpus-sized window.
    */
  def dataCard(
      df: DataFrame,
      source: Column,
      lang: Column,
      nChars: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(source.cast("string").as("src"),
      lang.cast("string").as("lang"), nChars.cast("long").as("len"))
    val totals = base.groupBy("src").agg(
      count(lit(1)).as("n_docs"),
      sum("len").as("sum_chars"),
      countDistinct(col("lang")).as("n_langs"))
    val hist = base.groupBy("src", "len").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(
        Window.partitionBy("src").orderBy("len")
          .rowsBetween(Window.unboundedPreceding, 0)))
    val med = hist.join(totals.select(col("src"), col("n_docs")), "src")
      .where(col("cum") * 2 >= col("n_docs") + (col("n_docs") % 2))
      .groupBy("src").agg(min("len").as("p50_chars"))
    totals.join(med, "src")
      .select(col("src"), col("n_docs"), col("sum_chars"),
        col("n_langs"), col("p50_chars"))
  }

  /** Per-source characteristic keywords (c-TF-IDF shape, integer-
    * exact): for each source, the top-K terms by
    * `score = cnt·scale div sdf` where cnt is the term's occurrence
    * count inside the source and sdf the number of SOURCES containing
    * it — a term every source shares is discounted |sources|-fold,
    * a source-exclusive term keeps its full count. The "what makes
    * this slice different" row of a datacard ([[dataCard]]'s
    * qualitative sibling). Ties break by ascending term; output
    * (src, term, cnt, sdf, score, rank).
    *
    * Scale shape: ONE corpus-sized (src, term) count (map-side
    * combined — the explode never shuffles document text, only
    * skinny pairs), then everything downstream is vocab-sized: the
    * source-frequency aggregate, a term-keyed join, and the top-K.
    * The top-K is the salted two-phase window: phase 1 bounds any
    * task at salt·topK rows per source even when one source holds
    * the whole vocabulary, phase 2 is exact over ≤ salt·topK
    * survivors — identical output to the single window.
    */
  def sourceKeywords(
      df: DataFrame,
      source: Column,
      text: Column,
      topK: Int,
      scale: Long = 1000L,
      salt: Int = 64): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(scale > 0, s"scale must be positive, got $scale")
    require(salt > 0, s"salt must be positive, got $salt")
    import org.apache.spark.sql.expressions.Window
    val cnt = df.select(source.cast("string").as("src"),
        explode(TextAnalysis.tokens(lower(text))).as("term"))
      .groupBy("src", "term").agg(count(lit(1)).as("cnt"))
    // sdf as a term-partitioned window over the vocab-sized cnt rows,
    // NOT a cnt-joins-groupBy(cnt) self-join: the self-join put the
    // corpus-sized explode-aggregate in the plan twice (exchange
    // reuse didn't bite under AQE — 48s vs 8s at 1M docs × 100
    // sources), while the window re-shuffles only the skinny (src,
    // term, cnt) triples. A term's window partition is ≤ |sources|
    // rows — no skew by construction.
    val scored = cnt
      .withColumn("sdf", count(lit(1)).over(
        Window.partitionBy(col("term"))).cast("long"))
      .withColumn("score", expr(s"cnt * ${scale}L div sdf"))
    val ord = Seq(col("score").desc, col("term"))
    val phase1 = scored.withColumn("__rn", row_number().over(
        Window.partitionBy(col("src"),
          Sampling.bucket(xxhash64(col("term")), salt)).orderBy(ord: _*)))
      .where(col("__rn") <= topK).drop("__rn")
    phase1.withColumn("rank", row_number().over(
        Window.partitionBy(col("src")).orderBy(ord: _*)).cast("long"))
      .where(col("rank") <= topK)
      .select(col("src"), col("term"), col("cnt"), col("sdf"),
        col("score"), col("rank"))
  }

  /** Cross-source content overlap: for every pair of sources, the
    * exact Jaccard (in parts-per-mille, floor division — integer-
    * exact) between the sources' distinct word-n-gram shingle SETS —
    * the data-mixing diagnostic that tells you two "different" crawls
    * are really the same corpus before you weight them as independent.
    *
    * Scale shape: sources map to BIT INDICES (the source list is
    * broadcast-scale by definition — collected and sorted on the
    * driver, ≤ 62 of them), so the one corpus-sized stage is a
    * shingle-keyed `bit_or(mask)` — a codegen'd LONG aggregate with
    * map-side partial combine, not an object-hash `collect_set` —
    * followed by a mask histogram of at most 2^|sources| rows. Sizes
    * and every pairwise intersection then derive from that tiny
    * histogram with broadcast bit-index joins; the shingle strings
    * never survive past the first aggregate. (Both a collect_set
    * formulation and a shingle self-join ran >60s at 1M docs — the
    * object-hash aggregate over 40M string groups was the cost; the
    * bit_or plan computes the identical exact answer in a fraction.)
    */
  def crossSourceOverlap(
      df: DataFrame,
      source: Column,
      text: Column,
      n: Int = 3,
      hashKeys: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // driver-bounded by contract: sources are a dimension, not data
    val srcs = df.select(source.cast("string").as("src"))
      .distinct().orderBy("src").as[String].collect()
    require(srcs.length <= 62,
      s"crossSourceOverlap supports at most 62 sources, got ${srcs.length}")
    val maskOf = srcs.zipWithIndex
      .foldLeft(lit(0L)) { case (acc, (s, i)) =>
        when(source.cast("string") === s, lit(1L << i)).otherwise(acc)
      }
    // hashKeys: the q83 trade — the shingle aggregate groups on the
    // 8-byte xxhash64 of the shingle instead of the string (computed
    // inside the scan projection, so text never reaches the exchange
    // at all). Output-identical unless two distinct shingles collide
    // in 64 bits (~N²/2^65 — vanishing at any N this runs at);
    // spec-pinned equal on test data. The exact default carries the
    // string through one exchange.
    val keyed = df.select(maskOf.as("m"), explode(Dedup.shingles(text, n)).as("sh"))
    val grouped =
      if (hashKeys) keyed.groupBy(xxhash64(col("sh")).as("k"))
      else keyed.groupBy(col("sh").as("k"))
    val hist = grouped.agg(expr("bit_or(m)").as("mask"))
      .groupBy("mask").agg(count(lit(1)).as("cnt"))
      .persist() // <= 2^|sources| rows
    val bits = srcs.zipWithIndex.map { case (s, i) => (s, i) }
      .toSeq.toDF("src", "bit")
    val sizes = bits.crossJoin(hist)
      .where(expr("(shiftright(mask, cast(bit AS int)) & 1L) = 1L"))
      .groupBy("src").agg(sum("cnt").as("sz"))
    val inter = bits.select(col("src").as("src_a"), col("bit").as("bit_a"))
      .crossJoin(bits.select(col("src").as("src_b"), col("bit").as("bit_b")))
      .where(col("src_a") < col("src_b"))
      .crossJoin(hist)
      .where(expr("(shiftright(mask, cast(bit_a AS int)) & 1L) = 1L") &&
        expr("(shiftright(mask, cast(bit_b AS int)) & 1L) = 1L"))
      .groupBy("src_a", "src_b").agg(sum("cnt").as("n_shared"))
    // every source pair appears, including disjoint ones (n_shared 0)
    val pairs = sizes.select(col("src").as("src_a"), col("sz").as("sz_a"))
      .crossJoin(sizes.select(col("src").as("src_b"), col("sz").as("sz_b")))
      .where(col("src_a") < col("src_b"))
    pairs.join(inter, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("sz_a"), col("sz_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("jaccard_per_mille",
        expr("n_shared * 1000L div (sz_a + sz_b - n_shared)"))
  }

  /** Binned distribution drift between a REFERENCE and a CURRENT
    * dataset — the "did the data change shape" gate an ingest pipeline
    * runs before mixing a new crawl batch in. Callers bin each side
    * (same binning expression!); per observed bin the output carries
    * both counts, both exact ppm shares, and the absolute ppm share
    * gap — Σ|gap| div 2 over the rows is the total-variation distance
    * in ppm (integer-exact, unlike PSI/KL whose logs aren't). Bins
    * absent from both sides are absent from the output; bins absent
    * from one side read 0 there.
    *
    * Scale: one map-side-combined count aggregate per side, keyed by
    * the bin domain; a full-outer join of the two BOUNDED bin tables;
    * two 1-row totals broadcast in. Neither dataset's rows meet the
    * other's.
    */
  def histogramDrift(
      ref: DataFrame,
      refBin: Column,
      cur: DataFrame,
      curBin: Column): DataFrame =
    histogramDriftFromCounts(
      ref.select(refBin.cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("ref_n")),
      cur.select(curBin.cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("cur_n")))

  /** [[histogramDrift]] over PRE-COUNTED histograms — the seam a
    * streaming current side plugs into (drain the stream's binned
    * counts, then compare against the batch reference): `refCounts`
    * carries (bin, ref_n), `curCounts` (bin, cur_n).
    */
  def histogramDriftFromCounts(
      refCounts: DataFrame,
      curCounts: DataFrame): DataFrame = {
    val r = refCounts.select(col("bin").cast("long").as("bin"),
      col("ref_n").cast("long").as("ref_n"))
    val c = curCounts.select(col("bin").cast("long").as("bin"),
      col("cur_n").cast("long").as("cur_n"))
    val rTot = r.agg(sum("ref_n").as("ref_total"))
    val cTot = c.agg(sum("cur_n").as("cur_total"))
    r.join(c, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
      .crossJoin(broadcast(rTot)).crossJoin(broadcast(cTot))
      .select(col("bin"), col("ref_n"), col("cur_n"),
        expr("ref_n * 1000000L div ref_total").as("ref_ppm"),
        expr("cur_n * 1000000L div cur_total").as("cur_ppm"))
      .withColumn("gap_ppm", abs(col("ref_ppm") - col("cur_ppm")))
  }

  /** EMBEDDING drift between two snapshots, per label: the cosine
    * between each side's per-label mean direction — the "did the
    * encoder (or the corpus) move" monitor beside the count-based
    * [[histogramDrift]]. Determinism: raw float sums are
    * order-dependent, so each component is FIXED-POINTED first
    * (floor(x·1000), exact long) and summed exactly; the cosine of
    * the two exact sum vectors (mean direction = sum direction) is
    * then one rounded double from identical integer inputs —
    * engine-identical. Labels missing from a side report cos 0.
    * The output is ANCHORED on the component-sum aggregate: a label
    * whose every embedding is null/empty on BOTH sides contributes no
    * component row and is dropped (not emitted as a degenerate cos-0
    * row) — the same row set the q230 oracle produces, which starts
    * FROM the sum aggregate and left-joins the counts.
    * Dot/norm products run in DECIMAL(38,0): milli-components ×
    * 10⁹-row sums stay ~10¹², squared ~10²⁴ — exact.
    *
    * Scale: each snapshot pays ONE map-side-combined aggregate keyed
    * by (label, dimension) — skinny longs on the exchange, never
    * vectors; everything downstream is |labels|·dim-sized.
    */
  def embeddingDrift(
      ref: DataFrame, refLabel: Column, refVec: Column,
      cur: DataFrame, curLabel: Column, curVec: Column): DataFrame = {
    def sums(df: DataFrame, label: Column, vec: Column, side: String) =
      df.select(label.as("label"), posexplode(vec).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(sum(floor(col("x").cast("double") * 1000.0).cast("long"))
          .as(s"${side}_s"))
    def counts(df: DataFrame, label: Column, side: String) =
      df.select(label.as("label")).groupBy("label")
        .agg(count(lit(1)).as(s"n_$side"))
    val joined = sums(ref, refLabel, refVec, "ref")
      .join(sums(cur, curLabel, curVec, "cur"), Seq("label", "pos"), "full_outer")
      .select(col("label"),
        coalesce(col("ref_s"), lit(0L)).as("ref_s"),
        coalesce(col("cur_s"), lit(0L)).as("cur_s"))
      .groupBy("label")
      .agg(
        sum(expr("CAST(ref_s AS DECIMAL(38,0)) * cur_s")).as("dot"),
        sum(expr("CAST(ref_s AS DECIMAL(38,0)) * ref_s")).as("ref2"),
        sum(expr("CAST(cur_s AS DECIMAL(38,0)) * cur_s")).as("cur2"))
    joined
      .join(counts(ref, refLabel, "ref"), Seq("label"), "left")
      .join(counts(cur, curLabel, "cur"), Seq("label"), "left")
      .select(col("label"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        when(col("ref2").isNull || col("cur2").isNull ||
            col("ref2") === 0 || col("cur2") === 0, lit(0.0))
          .otherwise(round(
            col("dot").cast("double") /
              (sqrt(col("ref2").cast("double")) * sqrt(col("cur2").cast("double"))),
            6)).as("cos"))
  }
}
