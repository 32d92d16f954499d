package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {

  test("hashSplit covers every row exactly once with roughly the requested weights") {
    val df = spark.range(10000).toDF("id")
    val split = Sampling.hashSplit(df, col("id"),
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000L)
    assert(counts.keySet == Set("train", "val", "test"))
    // multiplicative hashing spreads uniformly: each bucket within 20%
    // of its expectation
    assert(math.abs(counts("train") - 8000L) < 1600)
    assert(math.abs(counts("val") - 1000L) < 200)
    assert(math.abs(counts("test") - 1000L) < 200)
  }

  test("leakageSafeSplit: no dedup group straddles a split; singletons match hashSplit") {
    import spark.implicits._
    val df = spark.range(200).toDF("id")
    // two chains and one pair; everything else is a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (50L, 51L), (120L, 7L))
      .toDF("id_a", "id_b")
    val split = Sampling.leakageSafeSplit(df, col("id"), pairs,
      Seq("train" -> 50, "val" -> 25, "test" -> 25))
    val byId = split.select(col("id"), col("split"))
      .as[(Long, String)].collect().toMap
    assert(byId.size == 200)
    // every group member carries its representative's split
    for (group <- Seq(Seq(1L, 2L, 3L), Seq(50L, 51L), Seq(7L, 120L)))
      assert(group.map(byId).distinct.size == 1,
        s"group $group straddles splits: ${group.map(byId)}")
    // group assignment IS the representative's hashSplit assignment
    val plain = Sampling.hashSplit(df, col("id"),
      Seq("train" -> 50, "val" -> 25, "test" -> 25))
      .select(col("id"), col("split")).as[(Long, String)].collect().toMap
    assert(byId(2L) == plain(1L) && byId(3L) == plain(1L) && byId(51L) == plain(50L))
    assert(byId(120L) == plain(7L), "rep is the component MIN id, not pair order")
    // documents in no pair split exactly as plain hashSplit
    val singles = (0L until 200L).filterNot(Set(1L, 2L, 3L, 50L, 51L, 7L, 120L))
    assert(singles.forall(i => byId(i) == plain(i)))
  }

  test("weightedSample: exact top-n by hash-div-weight priority; weight floor at 1") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, if (i < 50) 10L else 0L, "s"))
      .toDF("id", "w", "st")
    val out = Sampling.weightedSample(df, col("id"), col("w"), col("st"), n = 10)
      .select("id", "priority").as[(Long, Long)].collect().toSeq
    assert(out.length == 10)
    // reference computation: knuth-hash div max(w, 1), ties by id
    val knuth = 2654435761L
    val expect = (0L until 100L).map { i =>
      val w = if (i < 50) 10L else 1L  // zero weight floors to 1
      (i, (i * knuth % 1000000007L + 1000000007L) % 1000000007L / w)
    }.sortBy(p => (p._2, p._1)).take(10)
    assert(out.sortBy(p => (p._2, p._1)) == expect)
    // high-weight rows dominate: with w=10 vs w=1 the top-10 should
    // lean heavily on the weighted half
    assert(out.count(_._1 < 50) >= 7, s"weights ignored: $out")
  }

  test("weightedSample: per-stratum independence and determinism under repartition") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => (i, (i % 5) + 1L, s"s${i % 3}"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(df, col("id"), col("w"), col("st"), n = 7)
        .select("st", "id").as[(String, Long)].collect().toSet
    val a = run(rows.toDF("id", "w", "st"))
    val b = run(rows.toDF("id", "w", "st").repartition(11))
    assert(a == b)
    assert(a.groupBy(_._1).forall(_._2.size == 7))
  }

  test("stratifiedSample: per-stratum fractions, nested, default applies") {
    import spark.implicits._
    val df = (0L until 9000L).map(i => (i, Seq("en", "de", "fr")(((i % 3)).toInt)))
      .toDF("id", "lang")
    val kept = Sampling.stratifiedSample(df, col("id"), col("lang"),
      Seq("en" -> 10, "de" -> 50), defaultParts = 100)
    val counts = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("fr") == 3000L) // default keeps everything
    assert(math.abs(counts("en") - 300L) < 120)
    assert(math.abs(counts("de") - 1500L) < 300)
    // nested: en at 10 parts is a subset of en at 30 parts
    val widerEn = Sampling.stratifiedSample(df, col("id"), col("lang"),
      Seq("en" -> 30), defaultParts = 0)
      .select("id").as[Long].collect().toSet
    val keptEn = kept.where(col("lang") === "en").select("id").as[Long].collect().toSet
    assert(keptEn.subsetOf(widerEn))
  }

  test("stratumWeights: shares sum to 1; alpha=1 natural, alpha=0.5 boosts the tail") {
    import spark.implicits._
    val df = (Seq.fill(80)("en") ++ Seq.fill(15)("de") ++ Seq.fill(5)("fr")).toDF("lang")
    val w = Sampling.stratumWeights(df, col("lang"), alpha = 0.5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(w("en")._1 == 80L && w("de")._1 == 15L && w("fr")._1 == 5L)
    assert(math.abs(w.values.map(_._2).sum - 1.0) < 1e-12)
    assert(w("fr")._3 > w("de")._3 && w("de")._3 > w("en")._3) // tail boosted
    assert(math.abs(w("en")._3 - 1.0 / math.sqrt(0.8)) < 1e-12)
    val natural = Sampling.stratumWeights(df, col("lang"), alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(natural.values.forall(v => math.abs(v - 1.0) < 1e-12))
  }

  test("capPerKey keeps the first `cap` rows per key by order; salted variant identical") {
    import spark.implicits._
    // keys with 1, 5, and 50 rows; cap 3
    val df = (Seq((0L, "a")) ++ (0 until 5).map(i => (10L + i, "b")) ++
      (0 until 50).map(i => (100L + i, "c"))).toDF("doc_id", "source")
    val exact = Sampling.capPerKey(df, col("source"), col("doc_id"), cap = 3)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(exact == Set(("a", 0L),
      ("b", 10L), ("b", 11L), ("b", 12L),
      ("c", 100L), ("c", 101L), ("c", 102L)))
    val salted = Sampling.capPerKeySalted(df, col("source"), col("doc_id"), cap = 3, salt = 4)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(salted == exact)
  }

  test("hashSplit/hashSample are deterministic pure functions of the key") {
    val df = spark.range(1000).toDF("id")
    val a = Sampling.hashSplit(df, col("id"), Seq("x" -> 50, "y" -> 50))
      .orderBy("id").collect().map(_.getString(1))
    val b = Sampling.hashSplit(df.repartition(7), col("id"), Seq("x" -> 50, "y" -> 50))
      .orderBy("id").collect().map(_.getString(1))
    assert(a.toSeq == b.toSeq) // partitioning must not matter (unlike df.sample)

    val kept = Sampling.hashSample(df, col("id"), 1, 10)
    val keptTwice = Sampling.hashSample(df, col("id"), 1, 10)
    assert(kept.collect().map(_.getLong(0)).toSet == keptTwice.collect().map(_.getLong(0)).toSet)
    // the 10% sample is a subset of the 20% sample (nested by design)
    val wider = Sampling.hashSample(df, col("id"), 2, 10).collect().map(_.getLong(0)).toSet
    assert(kept.collect().map(_.getLong(0)).toSet.subsetOf(wider))
  }

  test("bucket/weightedSample hashes: overflow-free, exact-arithmetic-identical at 64-bit extremes") {
    import spark.implicits._
    val knuth = BigInt(2654435761L)
    // ids that overflow key*knuth in int64: near Long.MaxValue/MinValue
    // plus a seeded spread of realistic big snowflake-style ids — the
    // case where the old raw-multiply formula wrapped on Spark and
    // THREW on DuckDB/ANSI engines
    val rnd = new scala.util.Random(7)
    val keys = Seq(Long.MaxValue, Long.MaxValue - 1, Long.MinValue,
      Long.MinValue + 1, 3500000000L, -3500000000L, 0L, 1L, -1L) ++
      Seq.fill(200)(rnd.nextLong()) ++ Seq.fill(50)(rnd.nextLong(1000000))
    val df = keys.toDF("id")
    for (buckets <- Seq(2, 4, 100, 97)) {
      // exact-arithmetic reference: what DuckDB / ANSI Spark computes
      // from (key · knuth) mod buckets with NO wraparound
      def ref(k: Long): Long =
        ((BigInt(k) * knuth).mod(BigInt(buckets))).toLong
      val got = df.select(col("id"), Sampling.bucket(col("id"), buckets).as("b"))
        .as[(Long, Long)].collect()
      got.foreach { case (k, b) =>
        assert(b == ref(k), s"bucket($k, $buckets): got $b, exact arithmetic says ${ref(k)}")
        assert(b >= 0 && b < buckets)
      }
    }
    // weightedSample's priority hash: reduce-first must equal the
    // mathematical (key · knuth) mod p for every 64-bit key
    val p = BigInt(1000000007L)
    val pr = Sampling.weightedSample(
        keys.map((_, 1L)).toDF("id", "w"), col("id"), col("w"), lit("all"),
        n = keys.size)
      .select(col("id"), col("priority")).as[(Long, Long)].collect()
    pr.foreach { case (k, h) =>
      val expect = (BigInt(k).mod(p) * knuth).mod(p).toLong
      assert(h == expect, s"priority($k): got $h, exact arithmetic says $expect")
    }
  }

  test("materializeMixture: epoch counts, default 1, zero drops, deterministic key") {
    import spark.implicits._
    val df = Seq((0L, "en"), (1L, "de"), (2L, "xx"), (3L, "junk"))
      .toDF("doc_id", "lang")
    val out = Sampling.materializeMixture(df, col("lang"), col("doc_id"),
      Map("en" -> 1, "de" -> 3, "junk" -> 0))
    val copies = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(copies == Map("en" -> 1L, "de" -> 3L, "xx" -> 1L)) // junk dropped, xx defaults to 1
    val epochs = out.where(col("source") === "de").select("epoch")
      .as[Long].collect().sorted.toSeq
    assert(epochs == Seq(0L, 1L, 2L))
    // same keys on a different partitioning; map-only plan
    val again = Sampling.materializeMixture(df.repartition(5), col("lang"), col("doc_id"),
      Map("en" -> 1, "de" -> 3, "junk" -> 0))
    assert(out.collect().map(_.toSeq).toSet == again.collect().map(_.toSeq).toSet)
    assert(Scale.countShuffles(out) == 0)
  }

  test("shuffleShards: a seeded permutation — dense per-shard positions, every row once") {
    import spark.implicits._
    val df = spark.range(1000).toDF("doc_id")
    val out = Sampling.shuffleShards(df, col("doc_id"), seed = 7L, nShards = 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._1).sorted == (0L until 1000L))
    // positions dense 0..n_s-1 within each shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (0L until rows.size.toLong))
    }
    // partitioning-invariant and seed-sensitive
    val again = Sampling.shuffleShards(df.repartition(7), col("doc_id"), 7L, 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect().toSeq
    assert(out.toSet == again.toSet)
    val other = Sampling.shuffleShards(df, col("doc_id"), 8L, 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect().toSeq
    assert(out.toSet != other.toSet, "different seed must give a different permutation")
    // the order within a shard is not id order (it IS a shuffle)
    val shard0 = out.filter(_._2 == out.head._2).sortBy(_._3).map(_._1)
    assert(shard0 != shard0.sorted, "per-shard order must not degenerate to key order")
  }

  test("qualityBlend with one signal == range-shard assignment on that signal") {
    import spark.implicits._
    val df = spark.range(500).select(col("id"),
      (pmod(col("id") * 37, lit(101))).as("sig"))
    val blend = Sampling.qualityBlend(df, col("id"), Seq(col("sig")), nBuckets = 8)
      .select(col("doc_id"), col("b_0")).as[(Long, Long)].collect().toMap
    val bounds = Scale.rangeShardBoundaries(df, col("sig"), nShards = 8)
    val shards = Scale.withRangeShard(df.select(col("id"), col("sig")), col("sig"), bounds)
      .select(col("id"), col("shard")).as[(Long, Long)].collect().toMap
    assert(blend == shards, "the two quantile-bucket paths must agree exactly")
  }

  test("qualityBlend: quartile buckets per signal, hand-computed blend") {
    import spark.implicits._
    // signal A = id (uniform 0..99 -> quartiles at 25/50/75);
    // signal B = 100 - id (reversed) -> blend is flat 3 everywhere
    val df = spark.range(100).select(col("id"),
      col("id").as("a"), (lit(100L) - col("id")).as("b"))
    val out = Sampling.qualityBlend(df, col("id"), Seq(col("a"), col("b")), nBuckets = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // opposite signals cancel: every doc's buckets sum to 3
    assert(out.forall(r => r._4 == 3L), out.take(8).toString)
    // quartiles of the uniform signal are balanced 25/25/25/25
    val sizes = out.groupBy(_._2).map { case (b, rs) => b -> rs.size }
    assert(sizes == Map(0L -> 25, 1L -> 25, 2L -> 25, 3L -> 25))
    // deterministic across partitionings
    val again = Sampling.qualityBlend(df.repartition(7), col("id"),
        Seq(col("a"), col("b")), nBuckets = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out == again)
  }
}
