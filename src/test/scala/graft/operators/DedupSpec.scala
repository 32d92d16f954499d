package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class DedupSpec extends SparkTestBase {

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),      // exact dup of 0
    (2L, "the quick brown fox jumps over the sleepy dog"),    // near dup of 0
    (3L, "completely different content about spark engines"),
    (4L, "THE  QUICK brown fox jumps over the lazy dog"))     // case/ws variant of 0

  test("exactDedup groups case/whitespace-normalized duplicates") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val groups = Dedup.exactDedup(df, col("doc_id"), col("text"))
      .select("keep_id", "n_dups").as[(Long, Long)].collect().sortBy(_._1)
    // 0,1,4 normalize equal; 2 and 3 singletons
    assert(groups.toSeq == Seq((0L, 3L), (2L, 1L), (3L, 1L)))
  }

  test("minhash near-dups finds the one-word-change pair and not the unrelated doc") {
    import spark.implicits._
    val df = docs.take(4).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(df, col("doc_id"), col("text"), threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical texts have distance 0, near texts small, far texts large") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
    val sigs = df.as[(Long, Long)].collect().toMap
    assert(sigs(0L) == sigs(1L))
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(dist(0L, 2L) < dist(0L, 3L))
  }

  test("dedupGroups: connected components labeled by min id") {
    import spark.implicits._
    // components: {1,2,3,7} via chain, {4,5}, singleton pairs absent
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 7L), (4L, 5L)).toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 4L -> 4L, 5L -> 4L)
    // driver union-find path (small graph)
    val small = Dedup.dedupGroups(pairs).as[(Long, Long)].collect().toMap
    assert(small == expected)
    // distributed min-label path (force with threshold 0)
    val dist = Dedup.dedupGroups(pairs, driverThreshold = 0L).as[(Long, Long)].collect().toMap
    assert(dist == expected)
  }

  test("jaccard: exact on known sets") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(Dedup.jaccard(col("x"), col("y")).as("j"))
    assert(math.abs(df.head().getDouble(0) - 0.5) < 1e-12)
  }

  test("shingles: 3-gram count and short-text fallback") {
    import spark.implicits._
    val df = Seq((1, "a b c d"), (2, "a b")).toDF("i", "t")
      .select(col("i"), Dedup.shingles(col("t"), 3).as("sh"))
    val m = df.as[(Int, Seq[String])].collect().toMap
    assert(m(1) == Seq("a b c", "b c d"))
    assert(m(2) == Seq("a b"))
  }
}
