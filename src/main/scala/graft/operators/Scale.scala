package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out utilities: the explicit knobs for the two failure modes a
  * 1000-executor job hits that local tests never do — skewed keys and
  * repeated shuffles of the same join key.
  */
object Scale {

  /** Skew-safe array collapse: two-phase aggregation through a salt.
    * A plain groupBy(key).agg(collect_list(...)) sends EVERY value of a
    * hot key to one task (collect_list has no partial-merge reduction
    * in size); salting spreads phase one over `nSalts` tasks and phase
    * two only merges `nSalts` pre-combined lists per key.
    * Result is identical to [[Relational.arrayCollapse]] (the collapse
    * sorts, so salt-induced order differences cannot show).
    */
  def saltedArrayCollapse(
      df: DataFrame,
      key: Column,
      value: Column,
      as: String,
      nSalts: Int = 16): DataFrame =
    df.select(key.as("k"), value.cast("string").as("v"))
      .withColumn("salt", pmod(xxhash64(col("v")), lit(nSalts)))
      .groupBy(col("k"), col("salt"))
      .agg(collect_list(col("v")).as("vs"))
      .groupBy(col("k"))
      .agg(concat_ws("|", array_sort(flatten(collect_list(col("vs"))))).as(as))
      .withColumnRenamed("k", "key")

  /** Salted equi-join — the remedy [[graft.operators.Analytics
    * .skewProfile]]'s salt_factor column prescribes: when the fact
    * side's join key is too hot for a plain hash exchange (one key =
    * one task) and the dimension side is too big to broadcast, spread
    * each fact row across `nSalts` sub-keys (a deterministic hash of
    * `saltSrc` — any well-distributed fact column, typically the
    * event/row id) and REPLICATE each dimension row to all nSalts
    * sub-keys. The join runs on (key, salt): a key holding p% of the
    * facts now occupies nSalts tasks instead of one, at the price of
    * an nSalts-fold dimension replication — exactly the trade the
    * pre-flight's `ceil(count div targetPerTask)` sizes.
    *
    * Result is EXACTLY the plain inner equi-join (each fact row meets
    * each matching dim row in precisely one salt bucket); the salt
    * column never escapes. Column names are taken from the two
    * inputs — they must be disjoint apart from the join key.
    */
  def saltedEquiJoin(
      facts: DataFrame,
      factKey: Column,
      saltSrc: Column,
      dims: DataFrame,
      dimKey: Column,
      nSalts: Int): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    val l = facts.withColumn("__k", factKey)
      .withColumn("__salt", pmod(xxhash64(saltSrc), lit(nSalts.toLong)))
    val r = dims.withColumn("__k", dimKey)
      .withColumn("__salt",
        explode(array((0 until nSalts).map(s => lit(s.toLong)): _*)))
    l.join(r, Seq("__k", "__salt")).drop("__k", "__salt")
  }

  /** Write a DataFrame as a bucketed+sorted table: joins and
    * aggregations on the bucket key then run exchange-free (the classic
    * pre-shuffle trade — pay the shuffle once at write, never again).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int): Unit =
    writeBucketedSorted(df, table, bucketCol, nBuckets, bucketCol)

  /** [[writeBucketed]] with an explicit in-file sort order: sorting a
    * postings-style table by (bucket, key) clusters each key into few
    * parquet row groups, so a serve-time key filter skips row groups
    * by min/max stats INSIDE the selected buckets — the second level
    * of pruning after `SelectedBucketsCount`.
    */
  def writeBucketedSorted(
      df: DataFrame, table: String, bucketCol: String, nBuckets: Int,
      sortCols: String*): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .option("path", s"${df.sparkSession.conf.get("spark.sql.warehouse.dir")}/$table")
      .saveAsTable(table)

  /** Append rows into an EXISTING bucketed table with the identical
    * bucket/sort spec — the durable half of an incremental index
    * append ([[graft.operators.Retrieval.appendToInvertedIndex]]):
    * each write produces its own per-bucket files under the same
    * bucket hash, so bucket pruning keeps working across all appends
    * (a bucket's data is the union of its file per write). The spec
    * MUST match the table's (Spark rejects a mismatch) — that
    * rejection is the guard against silently corrupting the layout.
    */
  def appendBucketedSorted(
      df: DataFrame, table: String, bucketCol: String, nBuckets: Int,
      sortCols: String*): Unit =
    df.write
      .mode(SaveMode.Append)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .saveAsTable(table)

  /** True if the executed plan of `df` contains a shuffle exchange —
    * the assertion primitive for co-located-join tests. Collects
    * [[ShuffleExchangeLike]] nodes (covering hash, range, and
    * single-partition exchanges) instead of substring-matching the plan
    * string, and descends into AQE's re-planned subtrees where the
    * exchange hides behind an AdaptiveSparkPlanExec wrapper.
    */
  /** Run `body` with adaptive query execution scoped OFF — for
    * operators whose eager actions are fleets of pre-sized skinny
    * exchanges (the two-phase quantile kernels, iterative loops):
    * AQE's per-exchange sub-job materialization serializes those tiny
    * stages for no re-planning benefit, since the partitioning is
    * already derived from the data.
    *
    * Isolation (r18): the scoped value lives on a CHILD session
    * (same SparkContext/SharedState — shared cache manager; own
    * SQLConf) instead of a set/restore on the caller's session, which
    * raced with concurrent queries on a shared production session.
    * `body` receives a rebinder — the kernel's root frame must pass
    * through it so in-scope actions plan under the child conf — and
    * the result re-binds to the caller's session, so lazy consumers
    * keep the caller's (production) AQE setting, as before.
    * ConcurrentScopeSpec pins the no-cross-talk property.
    */
  def withAqeOff(sess: org.apache.spark.sql.SparkSession)(
      body: (DataFrame => DataFrame) => DataFrame): DataFrame = {
    val child = org.apache.spark.sql.graftbridge.SessionBridge.scoped(
      sess, Seq("spark.sql.adaptive.enabled" -> "false"))
    val rebind = (d: DataFrame) =>
      org.apache.spark.sql.graftbridge.SessionBridge.rebind(d, child)
    org.apache.spark.sql.graftbridge.SessionBridge.rebind(body(rebind), sess)
  }

  def hasShuffle(df: DataFrame): Boolean = countShuffles(df) > 0

  /** Number of shuffle exchanges in the physical plan (descending into
    * AQE wrappers) — the unit plan-assertion tests budget shuffles
    * with, since every exchange is the thing that hurts at 100 TB.
    */
  def countShuffles(df: DataFrame): Int =
    shuffleOutputColumns(df).size

  /** Deterministic balanced range-shard boundaries for `key`:
    * `nShards - 1` integer split points such that shard k holds rows
    * with boundaries(k-1) < key <= boundaries(k) and shard sizes are
    * as even as exact order statistics allow. The reproducible
    * alternative to `repartitionByRange`, whose boundaries come from
    * reservoir SAMPLING — two runs of a sampled export produce
    * different shard contents, which breaks diffing dataset releases
    * and resuming partial exports.
    *
    * Computation is over the key VALUE HISTOGRAM, not rows: one
    * skinny groupBy(key) count, then a cumulative sum over DISTINCT
    * key values. The window is a single task, but over the value
    * domain (for doc-length-like keys: thousands of values no matter
    * how many rows), not the corpus — document-scale-independent.
    * Boundary b_k = the smallest key value whose cumulative count
    * reaches ceil(n*k/nShards) — quantile type 1, integer-exact, no
    * float interpolation anywhere.
    *
    * Heavy ties bound balance: every row of one key value lands in
    * one shard by construction, so a value holding p% of the corpus
    * makes shards up to p% oversized. That is inherent to
    * range-sharding (the same is true of repartitionByRange).
    *
    * NULL keys are excluded from the histogram (a NULL key would
    * surface as a NULL boundary and NPE the collect); rows with NULL
    * keys deterministically land in shard 0 under [[withRangeShard]].
    *
    * Cardinality guard: the cumulative window runs over DISTINCT key
    * values in one task, which is fine for doc-length-like domains
    * but not for near-unique 64-bit keys (a hash key would put ~N
    * rows through that task). When distinct(key) > `maxDistinct`, the
    * histogram is first thinned by a DETERMINISTIC hash-sample of the
    * value domain — keep k iff xxhash64(k) % rate == 0 — which is a
    * pure function of the key values (partitioning- and run-
    * independent, unlike reservoir sampling), so the determinism
    * contract survives. Boundaries are then exact order statistics of
    * the sampled domain: quantile error is O(rate/nDistinct) of one
    * quantile step, negligible at the corpus sizes that trigger it.
    */
  def rangeShardBoundaries(df: DataFrame, key: Column, nShards: Int,
      maxDistinct: Long = 4000000L): Seq[Long] = {
    require(nShards > 1, s"nShards must be > 1, got $nShards")
    val allCounts = df.filter(key.isNotNull)
      .groupBy(key.cast("long").as("k"))
      .agg(count(lit(1)).as("c"))
      .persist()
    val nDistinct = allCounts.count()
    val counts =
      if (nDistinct <= maxDistinct) allCounts
      else {
        val rate = (nDistinct + maxDistinct - 1) / maxDistinct
        allCounts.filter(pmod(xxhash64(col("k")), lit(rate)) === 0)
      }
    val cum = counts
      .withColumn("cum", sum("c").over(
        org.apache.spark.sql.expressions.Window.orderBy("k")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .persist()
    val nRow = cum.agg(max("cum")).head()
    if (nRow.isNullAt(0)) { // empty input: no boundaries, one empty shard
      cum.unpersist(); allCounts.unpersist()
      return Seq.empty
    }
    val n = nRow.getLong(0)
    val spark = df.sparkSession
    import spark.implicits._
    val targets = (1 until nShards).map(j => (j, (n * j + nShards - 1) / nShards))
      .toDF("j", "target")
    val bounds = cum.join(broadcast(targets), col("cum") >= col("target"))
      .groupBy("j").agg(min("k").as("b"))
      .orderBy("j").select("b").as[Long].collect().toSeq
    cum.unpersist(); allCounts.unpersist()
    bounds
  }

  /** Assign each row its range shard: a codegen'd comparison chain
    * over the (tiny, driver-collected) boundary list — map-only, no
    * exchange; the export write then partitions by this column.
    * NULL keys land in shard 0 (`NULL > b` is NULL, contributing 0 at
    * every boundary) — deterministic, matching their exclusion from
    * the boundary histogram in [[rangeShardBoundaries]].
    */
  def withRangeShard(df: DataFrame, key: Column, boundaries: Seq[Long],
      shardCol: String = "shard"): DataFrame =
    df.withColumn(shardCol,
      boundaries.foldLeft(lit(0L)) { (acc, b) =>
        acc + when(key.cast("long") > b, 1L).otherwise(0L)
      })

  /** Deterministic sharded parquet export: assigns every row its
    * range shard ([[withRangeShard]] — map-only), writes
    * `path/shard=N/` via parquet partitionBy, and returns the
    * written manifest (shard, n_rows, min_key, max_key) — the
    * release shape a training-data drop wants: shard contents are a
    * pure function of the data (re-running the export, on any
    * cluster layout, yields byte-stable shard MEMBERSHIP — unlike
    * `repartitionByRange`, whose reservoir sampling moves boundary
    * rows between runs).
    *
    * The write is one pass: Spark's dynamic partition write splits
    * files by the shard column inside each task — no extra exchange
    * beyond what `df` already carries. The manifest re-aggregates
    * from the WRITTEN files, so it certifies the export, not the
    * plan.
    */
  def writeRangeShardedParquet(df: DataFrame, key: Column, nShards: Int,
      path: String): DataFrame = {
    val bounds = rangeShardBoundaries(df, key, nShards)
    withRangeShard(df, key, bounds)
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val spark = df.sparkSession
    spark.read.parquet(path)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        min(key.cast("long")).as("min_key"),
        max(key.cast("long")).as("max_key"))
      .orderBy("shard")
  }

  /** Deterministic range-sharded JSONL export — the interchange format
    * LLM training pipelines actually consume (one JSON object per
    * line, shard directories stable across runs because the shard
    * boundaries come from the key-value histogram, not sampling).
    * JSON field order is the frame's column order, so bytes are
    * reproducible for a fixed schema; re-running the export on the
    * same data overwrites with identical shard contents. Returns the
    * same (shard, n_rows, min_key, max_key) manifest as the parquet
    * exporter, computed from what was WRITTEN.
    */
  def writeRangeShardedJsonl(df: DataFrame, key: Column, nShards: Int,
      path: String): DataFrame = {
    val bounds = rangeShardBoundaries(df, key, nShards)
    withRangeShard(df, key, bounds)
      .write.mode("overwrite").partitionBy("shard").json(path)
    val spark = df.sparkSession
    spark.read.schema(withRangeShard(df, key, bounds).schema).json(path)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        min(key.cast("long")).as("min_key"),
        max(key.cast("long")).as("max_key"))
      .orderBy("shard")
  }

  /** Deterministic range-sharded ORC export — the columnar interchange
    * format for warehouses standardized on the Hive stack. Same
    * contract as the parquet/JSONL exporters: shard boundaries from
    * the exact key histogram, one dynamic-partition write pass, and a
    * (shard, n_rows, min_key, max_key) manifest re-aggregated from
    * the WRITTEN files so it certifies the export.
    */
  def writeRangeShardedOrc(df: DataFrame, key: Column, nShards: Int,
      path: String): DataFrame = {
    val bounds = rangeShardBoundaries(df, key, nShards)
    withRangeShard(df, key, bounds)
      .write.mode("overwrite").partitionBy("shard").orc(path)
    val spark = df.sparkSession
    spark.read.orc(path)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        min(key.cast("long")).as("min_key"),
        max(key.cast("long")).as("max_key"))
      .orderBy("shard")
  }

  /** Per-shard export manifest: row count and key range — the
    * release-artifact summary of a deterministic sharded export.
    */
  def rangeShardManifest(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    val bounds = rangeShardBoundaries(df, key, nShards)
    withRangeShard(df, key, bounds)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        min(key.cast("long")).as("min_key"),
        max(key.cast("long")).as("max_key"))
  }

  /** Z-order bucket profile: Morton-interleave two integer dimensions
    * (native codegen'd `zorder2`), bucket by fixed z-width, and report
    * each bucket's row count and (x, y) bounding rectangle. The
    * rectangles are the operator's point: consecutive z-buckets cover
    * SMALL rectangles in both dimensions at once, which is exactly the
    * min/max zone-map pruning a z-ordered file layout buys on a 100 TB
    * table (sort by one column and the other dimension's per-file
    * ranges span everything; sort by z and both stay tight).
    *
    * Plan: one codegen'd map pass for z + one map-side-combined
    * aggregate keyed on the bucket — no join, nothing but (bucket,
    * 5 longs) on the exchange.
    */
  def zorderBucketStats(df: DataFrame, x: Column, y: Column,
      bucketWidth: Long = 262144L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val z = graft.functions.LayoutOps.zorder2(x.cast("long"), y.cast("long"))
    df.select(x.cast("long").as("x"), y.cast("long").as("y"), z.as("z"))
      .groupBy(expr(s"z div ${bucketWidth}L").as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .orderBy("bucket")
  }

  /** Z-order clustered parquet export: deterministic range shards over
    * the Morton code (value-histogram boundaries, not sampling — same
    * determinism contract as [[writeRangeShardedParquet]]), rows
    * z-sorted inside each shard, manifest of per-shard (x, y)
    * rectangles computed from the WRITTEN files. The write itself is
    * the operator: downstream scans prune shards by either dimension's
    * min/max.
    */
  def writeZOrderClusteredParquet(df: DataFrame, x: Column, y: Column,
      nShards: Int, path: String): DataFrame = {
    val withZ = df
      .withColumn("__x", x.cast("long")).withColumn("__y", y.cast("long"))
      .withColumn("__z", graft.functions.LayoutOps.zorder2(col("__x"), col("__y")))
    val bounds = rangeShardBoundaries(withZ, col("__z"), nShards)
    // one exchange keyed on the shard id so each shard lands in ONE
    // task: the sorted write then emits exactly one z-ordered file per
    // shard (without this, every upstream task writes its own file
    // into each shard dir and the shard's GLOBAL z-order is lost
    // across files — locally sorted, globally interleaved)
    // the __x/__y/__z helpers are plan-internal: drop them after the
    // in-partition z-sort (projection preserves the sort order) so the
    // release artifact carries ONLY the user schema + shard
    withRangeShard(withZ, col("__z"), bounds)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "__z")
      .drop("__x", "__y", "__z")
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(path)
    // manifest rectangles re-derive from the WRITTEN data via the
    // caller's own x/y expressions (verifies the files, not the plan).
    // Rebind first: a caller passing dataframe-bound columns (df("c"))
    // carries resolved AttributeReferences whose exprIds belong to the
    // INPUT plan — selecting them over the freshly-read parquet would
    // throw AnalysisException. Stripping them to name references makes
    // any expression over the written user schema resolvable.
    val (rx, ry) = (rebindByName(df, x), rebindByName(df, y))
    df.sparkSession.read.parquet(path)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        min(rx.cast("long")).as("min_x"), max(rx.cast("long")).as("max_x"),
        min(ry.cast("long")).as("min_y"), max(ry.cast("long")).as("max_y"))
      .orderBy("shard")
  }

  /** Replace any plan-bound attribute in a Column with an unresolved
    * by-name reference, so the expression re-resolves against a
    * different DataFrame carrying the same column NAMES (here: the
    * read-back of files just written from the plan the column was
    * bound to).
    */
  private def rebindByName(df: DataFrame, c: Column): Column = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // 1) ANALYZE the column against the input frame: composite columns
    //    surface as lazy ColumnNodeExpressions whose children ignore
    //    withNewChildren, so the only reliable way to a real catalyst
    //    tree is the analyzer itself (df.select puts the fully resolved
    //    expression under a Project alias).
    val resolved = df.select(c.as("__rebind")).queryExecution.analyzed match {
      case p: Project => p.projectList.head.asInstanceOf[Alias].child
      case other => throw new IllegalStateException(
        s"select() did not analyze to a Project: ${other.nodeName}")
    }
    // 2) strip plan-bound attributes to plain name references via a
    //    manual walk (withNewChildren never copies the dataset-id tags
    //    TreeNode.transform would re-attach), so the expression
    //    re-resolves by NAME against the freshly-read files.
    def strip(e: Expression): Expression = e match {
      case a: AttributeReference  => UnresolvedAttribute.quoted(a.name)
      case other if other.children.nonEmpty =>
        other.withNewChildren(other.children.map(strip))
      case other => other
    }
    ColumnBridge.column(strip(resolved))
  }

  /** The output column names of every shuffle exchange in the plan,
    * one Seq per exchange — what actually RIDES each shuffle. The
    * exchange's plan line prints only partitioning expressions, so
    * "no text on the wire" assertions must check these attributes,
    * not the plan string.
    */
  def shuffleOutputColumns(df: DataFrame): Seq[Seq[String]] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def scan(p: SparkPlan): Seq[Seq[String]] = p match {
      case s: ShuffleExchangeLike => s.output.map(_.name) +: s.children.flatMap(scan)
      case a: AdaptiveSparkPlanExec => scan(a.executedPlan)
      case q: QueryStageExec => scan(q.plan)
      case other => other.children.flatMap(scan)
    }
    scan(df.queryExecution.executedPlan)
  }
}
