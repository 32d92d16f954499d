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
}
