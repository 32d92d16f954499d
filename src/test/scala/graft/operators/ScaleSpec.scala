package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ScaleSpec extends SparkTestBase {

  test("saltedArrayCollapse equals the direct collapse") {
    import spark.implicits._
    val df = Seq(
      (1, "c"), (1, "a"), (1, "b"), (1, "a"),
      (2, "z"), (3, "q"), (3, "p")).toDF("k", "v")
    val direct = Relational.arrayCollapse(df, col("k"), col("v"), "vals")
      .withColumnRenamed("k", "key")
      .as[(Int, String)].collect().toMap
    val salted = Scale.saltedArrayCollapse(df, col("k"), col("v"), "vals", nSalts = 4)
      .as[(Int, String)].collect().toMap
    assert(salted == direct)
    assert(salted(1) == "a|a|b|c") // duplicates kept, sorted
  }

  test("spark.graft.collapse.salted flips arrayCollapse to the two-phase plan, same result") {
    import spark.implicits._
    val df = Seq(
      (1, "c"), (1, "a"), (1, "b"), (1, "a"),
      (2, "z"), (3, "q"), (3, "p")).toDF("k", "v")
    val plain = Relational.arrayCollapse(df, col("k"), col("v"), "vals")
    assert(Scale.countShuffles(plain) == 1)
    spark.conf.set("spark.graft.collapse.salted", "true")
    try {
      val salted = Relational.arrayCollapse(df, col("k"), col("v"), "vals")
      // same schema (key keeps its name), bit-identical rows…
      assert(salted.columns.toSeq == plain.columns.toSeq)
      assert(salted.as[(Int, String)].collect().toMap ==
        plain.as[(Int, String)].collect().toMap)
      // …through the two-phase skew-safe plan: (k, salt) then (k)
      assert(Scale.countShuffles(salted) == 2,
        salted.queryExecution.executedPlan.toString)
      // the first (wide) exchange is keyed by salt too — the hot-key
      // value stream really is spread over nSalts reduce tasks
      assert(Scale.shuffleOutputColumns(salted).exists(_.contains("salt")))
    } finally spark.conf.unset("spark.graft.collapse.salted")
  }

  test("saltedEquiJoin equals the plain join; salt rides the exchange when broadcast is off") {
    import spark.implicits._
    // skewed facts: user 7 holds half the rows
    val facts = (0L until 400L).map(i =>
      (if (i % 2 == 0) 7L else i % 50, i)).toDF("user_id", "event_id")
    val dims = (0L until 50L).map(u => (u, s"t${u % 5}")).toDF("u", "tier")
    val salted = Scale.saltedEquiJoin(facts, col("user_id"), col("event_id"),
      dims, col("u"), nSalts = 8)
      .select("user_id", "event_id", "tier")
    val plain = facts.join(dims, facts("user_id") === dims("u"))
      .select("user_id", "event_id", "tier")
    val a = salted.as[(Long, Long, String)].collect().sorted.toSeq
    val b = plain.as[(Long, Long, String)].collect().sorted.toSeq
    assert(a == b, s"salted join must equal the plain join (${a.size} vs ${b.size} rows)")
    // with broadcast disabled, the exchange partitions on (key, salt) —
    // the hot key spreads across nSalts sub-partitions
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Scale.saltedEquiJoin(facts, col("user_id"), col("event_id"),
        dims, col("u"), nSalts = 8).queryExecution.executedPlan.toString
      val exchangeLine = plan.linesIterator
        .find(l => l.contains("Exchange hashpartitioning") && l.contains("__k"))
        .getOrElse("")
      assert(exchangeLine.contains("__salt"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      Scale.writeBucketed(o.select("o_orderkey", "o_totalprice"), "orders_b", "o_orderkey", 4)
      Scale.writeBucketed(l.select("l_orderkey", "l_quantity"), "lineitem_b", "l_orderkey", 4)
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
      // both sides pre-bucketed on the join key: no shuffle in the plan
      assert(!Scale.hasShuffle(joined), joined.queryExecution.executedPlan.toString)
      // and the same join over plain parquet DOES shuffle
      val plain = o.join(l, o("o_orderkey") === l("l_orderkey"))
      assert(Scale.hasShuffle(plain))
      assert(joined.count() == plain.count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("rangeShardBoundaries: exact type-1 quantiles on a known distribution") {
    import spark.implicits._
    // keys 1..100 once each: quarters split at 25/50/75
    val df = (1L to 100L).toDF("k")
    assert(Scale.rangeShardBoundaries(df, col("k"), 4) == Seq(25L, 50L, 75L))
    // heavy tie: one value holds 90 of 100 rows — it owns its shard
    val skewed = (Seq.fill(90)(7L) ++ (1L to 10L)).toDF("k")
    val bounds = Scale.rangeShardBoundaries(skewed, col("k"), 4)
    assert(bounds.forall(_ >= 7L), s"first three quarters all land inside the tie: $bounds")
  }

  test("rangeShardBoundaries: empty input yields no boundaries, not an NPE") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("k")
    assert(Scale.rangeShardBoundaries(empty, col("k"), 4) == Seq.empty)
    assert(Scale.rangeShardManifest(empty, col("k"), 4).count() == 0)
  }

  test("rangeShardBoundaries: NULL keys excluded, no NPE; null rows shard to 0") {
    import spark.implicits._
    val df = ((1L to 100L).map(Some(_)) ++ Seq.fill(20)(Option.empty[Long]))
      .toDF("k")
    // nulls must not poison a boundary (nulls-first window would make
    // min('k) NULL → NPE on the .as[Long] collect)
    val bounds = Scale.rangeShardBoundaries(df, col("k"), 4)
    assert(bounds == Seq(25L, 50L, 75L))
    val sizes = Scale.withRangeShard(df, col("k"), bounds)
      .groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(sizes(0L) == 45L, s"20 null rows join shard 0: $sizes") // 25 + 20 nulls
  }

  test("rangeShardBoundaries: near-unique keys use the deterministic hash-sampled path") {
    import spark.implicits._
    // 10k distinct values, maxDistinct=500 → sampled-domain fallback:
    // the cumulative window sees ≤~500 values, never the full domain
    val df = (1L to 10000L).toDF("k")
    val bounds = Scale.rangeShardBoundaries(df, col("k"), 4, maxDistinct = 500L)
    assert(bounds.size == 3 && bounds == bounds.sorted)
    // quantile error bounded: each boundary within ~5% of the exact quartile
    bounds.zip(Seq(2500L, 5000L, 7500L)).foreach { case (b, exact) =>
      assert(math.abs(b - exact) < 500, s"boundary $b too far from $exact")
    }
    val sizes = Scale.withRangeShard(df, col("k"), bounds)
      .groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(sizes.values.forall(n => n > 1500 && n < 3500), s"unbalanced: $sizes")
    // pure function of values: partitioning does not change boundaries
    assert(Scale.rangeShardBoundaries(df.repartition(13), col("k"), 4,
      maxDistinct = 500L) == bounds)
  }

  test("withRangeShard: balanced assignment, map-only, deterministic across runs") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, i % 97 + 1)).toDF("id", "k")
    val bounds = Scale.rangeShardBoundaries(df, col("k"), 4)
    val sharded = Scale.withRangeShard(df, col("k"), bounds)
    assert(Scale.countShuffles(sharded) == 0, "assignment must be map-only")
    val sizes = sharded.groupBy("shard").count()
      .as[(Long, Long)].collect().toMap
    assert(sizes.keySet == Set(0L, 1L, 2L, 3L))
    assert(sizes.values.forall(n => n > 150 && n < 350), s"shards badly unbalanced: $sizes")
    // rerun end-to-end: identical boundaries, identical assignment
    val bounds2 = Scale.rangeShardBoundaries(df.repartition(7), col("k"), 4)
    assert(bounds2 == bounds)
  }

  test("writeRangeShardedParquet: written files match the plan manifest; shards partition the key space") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, (i * 37) % 500)).toDF("id", "k")
    val dir = java.nio.file.Files.createTempDirectory("graft-shard-test").toString
    try {
      val manifest = Scale.writeRangeShardedParquet(df, col("k"), 4, dir)
        .as[(Long, Long, Long, Long)].collect().toSeq
      val planned = Scale.rangeShardManifest(df, col("k"), 4)
        .orderBy("shard").as[(Long, Long, Long, Long)].collect().toSeq
      assert(manifest == planned, "written manifest must equal the planned manifest")
      assert(manifest.map(_._2).sum == 1000L)
      // key ranges are disjoint and ordered across shards
      manifest.sliding(2).foreach {
        case Seq((_, _, _, maxA), (_, _, minB, _)) => assert(maxA < minB)
        case _ => ()
      }
      // round trip: every row written exactly once
      assert(spark.read.parquet(dir).count() == 1000L)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("writeRangeShardedJsonl: manifest matches plan; lines are valid JSON; rerun is byte-stable") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, (i * 13) % 200, s"doc $i text"))
      .toDF("id", "k", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-test").toString
    try {
      val manifest = Scale.writeRangeShardedJsonl(df, col("k"), 4, dir)
        .as[(Long, Long, Long, Long)].collect().toSeq
      val planned = Scale.rangeShardManifest(df, col("k"), 4)
        .orderBy("shard").as[(Long, Long, Long, Long)].collect().toSeq
      assert(manifest == planned, "written manifest must equal the planned manifest")
      assert(manifest.map(_._2).sum == 500L)
      // the files really are JSONL: one parseable object per line
      val files = new java.io.File(dir).listFiles().filter(_.isDirectory)
        .flatMap(_.listFiles()).filter(_.getName.endsWith(".json"))
      assert(files.nonEmpty)
      val firstLine = scala.io.Source.fromFile(files.head).getLines().next()
      assert(firstLine.startsWith("{") && firstLine.contains("\"text\":"))
      // rerun on identical input: identical per-shard content (sorted
      // line multisets — file split points may differ with parallelism)
      def shardLines(): Map[String, Seq[String]] =
        new java.io.File(dir).listFiles().filter(_.isDirectory).map { d =>
          d.getName -> d.listFiles().filter(_.getName.endsWith(".json"))
            .flatMap(f => scala.io.Source.fromFile(f).getLines()).toSeq.sorted
        }.toMap
      val run1 = shardLines()
      Scale.writeRangeShardedJsonl(df, col("k"), 4, dir).collect()
      assert(shardLines() == run1, "re-export of identical data must be content-identical")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
