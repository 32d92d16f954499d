package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RetrievalSpec extends SparkTestBase {

  // Hand-computed corpus: 3 docs, query terms "cat" and "dog".
  //   d0 = "cat cat dog x"   (dl 4)
  //   d1 = "dog y z"         (dl 3)
  //   d2 = "x y z w"         (dl 4)
  // N = 3, L = 11, df(cat) = 1, df(dog) = 2.
  // idf(cat) = ((6-2+1)*1000000) div 3 = 1666666
  // idf(dog) = ((6-4+1)*1000000) div 5 = 600000
  // d0, cat tf=2: tfnorm num = 22*2*11 = 484
  //   den = 10*11*2 + 3*11 + 9*4*3 = 220+33+108 = 361
  //   score = (1666666*484) div 361 = 806666344 div 361... compute:
  //   1666666*484 = 806,666,344; div 361 = 2234532 (floor)
  // d0, dog tf=1: num = 22*1*11 = 242; den = 110+33+108 = 251
  //   score = (600000*242) div 251 = 145200000 div 251 = 578486
  // d0 total = 2234532 + 578486 = 2813018
  // d1, dog tf=1: den = 110 + 33 + 9*3*3 = 110+33+81 = 224
  //   score = 145200000 div 224 = 648214
  // d2: no terms -> filtered out.
  test("bm25TopK: hand-computed integer-exact scores, rank, and filter") {
    import spark.implicits._
    val df = Seq(
      (0L, "cat cat dog x"),
      (1L, "dog y z"),
      (2L, "x y z w")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(df, col("doc_id"), col("text"),
      Seq("cat", "dog"), topK = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 4L, 2813018L), (1L, 3L, 648214L)))
  }

  test("bm25TopK: topK truncates after the deterministic sort") {
    import spark.implicits._
    val df = Seq(
      (0L, "cat a"), (1L, "cat b"), (2L, "cat c")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(df, col("doc_id"), col("text"),
      Seq("cat"), topK = 2).as[(Long, Long, Long)].collect().toSeq
    // identical docs score identically; ties break by doc_id
    assert(out.map(_._1) == Seq(0L, 1L))
    assert(out.map(_._3).distinct.size == 1)
  }

  test("bm25HardNegatives: relevant docs excluded, negatives re-rank into freed slots") {
    import spark.implicits._
    val df = Seq(
      (0L, "cat cat dog x"), // best match — relevant, must be excluded
      (1L, "dog y z"),
      (2L, "cat w"),
      (3L, "x y z w")).toDF("doc_id", "text")
    val rel = Seq(Tuple1(0L)).toDF("doc_id")
    val negs = Retrieval.bm25HardNegatives(df, col("doc_id"), col("text"),
      Seq("cat", "dog"), rel, topK = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(!negs.map(_._1).contains(0L), "relevant doc must not appear")
    assert(negs.map(_._1).toSet.subsetOf(Set(1L, 2L)),
      s"only matching non-relevant docs qualify: $negs")
    assert(negs.size == 2, "exclusion happens before the cut — slots refill")
    // empty relevant set degrades to plain bm25TopK
    val plain = Retrieval.bm25TopK(df, col("doc_id"), col("text"),
      Seq("cat", "dog"), topK = 2).as[(Long, Long, Long)].collect().toSeq
    val none = Retrieval.bm25HardNegatives(df, col("doc_id"), col("text"),
      Seq("cat", "dog"), rel.where(lit(false)), topK = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(none == plain)
  }

  test("bm25TopK: case-insensitive matching, absent term contributes zero") {
    import spark.implicits._
    val df = Seq((7L, "CAT hat")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(df, col("doc_id"), col("text"),
      Seq("cat", "zebra"), topK = 5).as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(7L))
    // single doc: idf(cat) = ((2-2+1)*1000000) div 3 = 333333
    // tf=1, L=2, N=1, dl=2: num = 22*1*2 = 44; den = 10*2*1+3*2+9*2*1 = 44
    // score = (333333*44) div 44 = 333333
    assert(out.head._3 == 333333L)
  }

  test("bm25BatchTopK: each query's rows equal the single-query operator's") {
    import spark.implicits._
    val df = Seq(
      (0L, "cat cat dog x"),
      (1L, "dog y z"),
      (2L, "x y z w"),
      (3L, "cat w w")).toDF("doc_id", "text")
    val queries = Seq(0L -> Seq("cat", "dog"), 1L -> Seq("dog"), 2L -> Seq("w", "x"))
    val batch = Retrieval.bm25BatchTopK(df, col("doc_id"), col("text"),
        queries, topK = 2)
      .orderBy("query_id", "doc_id")
      .select("query_id", "doc_id", "n_tokens", "score")
      .as[(Long, Long, Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4)).sortBy(_._1)).toMap
    queries.foreach { case (qid, terms) =>
      val single = Retrieval.bm25TopK(df, col("doc_id"), col("text"), terms, topK = 2)
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(batch(qid) == single,
        s"query $qid ($terms): batch=${batch(qid)} single=$single")
    }
  }

  test("bm25BatchTopK: corpus-side plan is independent of the query count") {
    import spark.implicits._
    val df = Seq.tabulate(40)(i => (i.toLong, s"cat dog w$i x y")).toDF("doc_id", "text")
    def shape(qs: Seq[(Long, Seq[String])]): (Int, Int) = {
      val out = Retrieval.bm25BatchTopK(df, col("doc_id"), col("text"), qs, topK = 3)
      out.count() // materialize so AQE finalizes the plan
      (Scale.countShuffles(out),
        out.queryExecution.executedPlan.collectLeaves().size)
    }
    val one = shape(Seq(0L -> Seq("cat")))
    val many = shape(Seq(0L -> Seq("cat"), 1L -> Seq("dog", "x"),
      2L -> Seq("y"), 3L -> Seq("cat", "dog", "y")))
    assert(one == many,
      s"plan shape must not grow with |queries|: 1 query=$one, 4 queries=$many")
  }

  test("bm25BatchTopK: salted two-phase top-k equals the exact window") {
    import spark.implicits._
    // every doc matches: the monster-query case the salting exists for
    val df = Seq.tabulate(200)(i => (i.toLong, "cat " + Seq.fill(i % 7)("cat").mkString(" ")))
      .toDF("doc_id", "text")
    val qs = Seq(0L -> Seq("cat"))
    val salted = Retrieval.bm25BatchTopK(df, col("doc_id"), col("text"), qs,
        topK = 10, salt = 8)
      .select("doc_id", "score").as[(Long, Long)].collect().toSet
    val unsalted = Retrieval.bm25BatchTopK(df, col("doc_id"), col("text"), qs,
        topK = 10, salt = 1)
      .select("doc_id", "score").as[(Long, Long)].collect().toSet
    assert(salted == unsalted)
    assert(salted.size == 10)
  }

  test("bm25IndexedTopK equals bm25BatchTopK on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vocab = Vector("cat", "dog", "fish", "bird", "w", "x", "y", "z")
    val df = Seq.tabulate(120)(i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val queries = Seq(0L -> Seq("cat", "dog"), 1L -> Seq("fish"),
      2L -> Seq("bird", "x", "z"), 3L -> Seq("absentterm"))
    val index = Retrieval.buildInvertedIndex(df, col("doc_id"), col("text"), nBuckets = 4)
    val indexed = Retrieval.bm25IndexedTopK(index, queries, topK = 5)
      .orderBy("query_id", "doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val scan = Retrieval.bm25BatchTopK(df, col("doc_id"), col("text"),
        queries.filter(_._2.exists(vocab.contains)), topK = 5)
      .orderBy("query_id", "doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(indexed == scan)
  }

  test("buildInvertedIndex: stats count zero-token docs; postings skip them") {
    import spark.implicits._
    val df = Seq((0L, "cat cat dog"), (1L, ""), (2L, "  ")).toDF("doc_id", "text")
    val index = Retrieval.buildInvertedIndex(df, col("doc_id"), col("text"), nBuckets = 4)
    assert(index.n == 3L && index.l == 3L)
    val rows = index.postings.select("term", "doc_id", "tf", "dl")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(rows == Set(("cat", 0L, 2L, 3L), ("dog", 0L, 1L, 3L)))
  }

  test("appendToInvertedIndex(base, delta) serves identically to build(base ∪ delta)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Vector("cat", "dog", "fish", "bird", "w", "x", "y", "z")
    val all = Seq.tabulate(90)(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val (base, delta) = all.partition(_._1 % 3 != 0)
    val baseDf = base.toDF("doc_id", "text")
    val deltaDf = delta.toDF("doc_id", "text")
    val fullDf = all.toDF("doc_id", "text")
    val appended = Retrieval.appendToInvertedIndex(
      Retrieval.buildInvertedIndex(baseDf, col("doc_id"), col("text"), nBuckets = 4),
      deltaDf, col("doc_id"), col("text"))
    val rebuilt = Retrieval.buildInvertedIndex(fullDf, col("doc_id"), col("text"), nBuckets = 4)
    assert(appended.n == rebuilt.n && appended.l == rebuilt.l)
    val queries = Seq(0L -> Seq("cat", "dog"), 1L -> Seq("fish", "z"))
    val a = Retrieval.bm25IndexedTopK(appended, queries, topK = 5)
      .orderBy("query_id", "doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    val b = Retrieval.bm25IndexedTopK(rebuilt, queries, topK = 5)
      .orderBy("query_id", "doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("phraseSearch: hand-checked counts, overlap, duplicate-term slots") {
    import spark.implicits._
    val df = Seq(
      (0L, "table hash table hash join"), // "table hash" at 0 and 2
      (1L, "table table table"),          // "table table" at 0 and 1 (overlapping)
      (2L, "hash table"),                 // reversed order: no match
      (3L, "table"),                      // missing second term
      (4L, "a table hash b")).toDF("doc_id", "text")
    val index = Retrieval.buildPositionalIndex(df, col("doc_id"), col("text"), nBuckets = 4)
    val out = Retrieval.phraseSearch(index,
      Seq(0L -> Seq("table", "hash"),
        1L -> Seq("table", "table"),
        2L -> Seq("table", "hash", "join"),
        3L -> Seq("zebra")),
      topK = 10)
      .orderBy("query_id", "doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 0L, 2L), (0L, 4L, 1L), // "table hash": twice in d0, once in d4
      (1L, 1L, 2L),               // overlapping "table table" in d1
      (2L, 0L, 1L)))              // trigram only in d0
  }

  test("phraseSearch equals the declarative slide-window count on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val vocab = Vector("a", "b", "c")
    val docs = Seq.tabulate(150)(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val phrases = Seq(0L -> Seq("a", "b"), 1L -> Seq("b", "b", "c"), 2L -> Seq("c"))
    val index = Retrieval.buildPositionalIndex(df, col("doc_id"), col("text"), nBuckets = 4)
    val got = Retrieval.phraseSearch(index, phrases, topK = 1000)
      .orderBy("query_id", "doc_id").as[(Long, Long, Long)].collect().toSeq
    // oracle: count phrase starts by brute-force scan over the tokens
    val want = for {
      (qid, ph) <- phrases
      (did, text) <- docs
      toks = text.split("\\s+").toSeq
      n = toks.sliding(ph.length).count(_ == ph) if n > 0
    } yield (qid, did, n.toLong)
    assert(got == want.sortBy(r => (r._1, r._2)))
  }

  test("postingsProjection equals buildInvertedIndex postings (minus bucket)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("cat", "dog", "x", "y")
    val df = (Seq.tabulate(80)(i =>
        (i.toLong, Seq.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      :+ (99L, "") :+ (98L, "   ")).toDF("doc_id", "text")
    val proj = Retrieval.postingsProjection(df, col("doc_id"), col("text"))
      .as[(String, Long, Long, Long)].collect().toSet
    val built = Retrieval.buildInvertedIndex(df, col("doc_id"), col("text"))
      .postings.select("term", "doc_id", "tf", "dl")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(proj == built && proj.nonEmpty)
    // the projection is shuffle-free: legal in a streaming append plan
    assert(!Scale.hasShuffle(Retrieval.postingsProjection(df, col("doc_id"), col("text"))))
  }

  test("rrfFuse: hand-computed fusion — consensus doc outranks single-list leaders") {
    import spark.implicits._
    // list A ranks d1,d2,d3; list B ranks d3,d2,d9.
    // scale/(60+r): r1=16393, r2=16129, r3=15873.
    // d2: 16129+16129=32258 ; d3: 15873+16393=32266 -> d3 wins, then d2,
    // then singles d1=16393, d9=15873.
    val a = Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 3L, 1L), (0L, 2L, 2L), (0L, 9L, 3L)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), topK = 10)
      .orderBy(col("score").desc, col("doc_id"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 3L, 32266L), (0L, 2L, 32258L),
      (0L, 1L, 16393L), (0L, 9L, 15873L)))
  }

  test("rrfFuse: queries fuse independently; single-list fusion preserves rank order") {
    import spark.implicits._
    val a = Seq((0L, 1L, 1L), (1L, 5L, 1L), (1L, 6L, 2L)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a), topK = 1)
      .orderBy("query_id").as[(Long, Long, Long)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) == Seq((0L, 1L), (1L, 5L)))
    val ranked = Retrieval.withRank(
      Seq((0L, 7L, 10L), (0L, 8L, 30L), (0L, 9L, 20L)).toDF("query_id", "doc_id", "score"),
      col("score").desc, col("doc_id"))
      .select("doc_id", "rank").as[(Long, Long)].collect().toSet
    assert(ranked == Set((8L, 1L), (9L, 2L), (7L, 3L)))
  }

  test("snippets: first match wins, window clamps at both edges, casing kept") {
    import spark.implicits._
    val df = Seq(
      (0L, "a b c HASH d e f g"),    // interior match, case-insensitive
      (1L, "hash x y z"),            // match at position 1: left clamp
      (2L, "p q r s t u join"),      // match at the end: right clamp
      (3L, "nothing here"),          // dropped
      (4L, "join then hash later")). // leftmost of two terms
      toDF("doc_id", "text")
    val out = Retrieval.snippets(df, col("doc_id"), col("text"),
      Seq("hash", "join"), window = 2)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (0L, 4L, "b c HASH d e"),
      (1L, 1L, "hash x y"),
      (2L, 7L, "t u join"),
      (4L, 1L, "join then hash")))
  }

  test("snippets: map-only, zero exchanges") {
    import spark.implicits._
    val df = Seq((0L, "hash a b")).toDF("doc_id", "text")
    assert(!Scale.hasShuffle(
      Retrieval.snippets(df, col("doc_id"), col("text"), Seq("hash"))))
  }

  test("expandQuery: counts terms of the top docs only, excludes query terms") {
    import spark.implicits._
    // docs 0 and 1 contain "cat" (relevant); doc 2 does not — its
    // distinctive vocabulary ("noise") must not appear in the expansion
    val df = Seq(
      (0L, "cat alpha beta alpha"),
      (1L, "cat beta gamma"),
      (2L, "noise noise noise")).toDF("doc_id", "text")
    val out = Retrieval.expandQuery(df, col("doc_id"), col("text"),
      Seq("cat"), topKDocs = 2, topMTerms = 10)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("alpha", 2L), ("beta", 2L), ("gamma", 1L)))
  }

  test("expandQuery: topMTerms truncates after the deterministic (count, term) order") {
    import spark.implicits._
    val df = Seq((0L, "cat z y x w")).toDF("doc_id", "text")
    val out = Retrieval.expandQuery(df, col("doc_id"), col("text"),
      Seq("cat"), topKDocs = 5, topMTerms = 2)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("w", 1L), ("x", 1L)))
  }

  test("proximitySearch: hand-checked pair counts, order-free, self-proximity halving") {
    import spark.implicits._
    val df = Seq(
      (0L, "cat x dog"),          // |0-2| = 2: within 3, not within 1
      (1L, "dog cat"),            // reverse order still counts
      (2L, "cat x x x x dog"),    // distance 5: outside maxDist 3
      (3L, "cat dog y cat"),      // pairs (0,1), (1,3): both within 2 -> 2
      (4L, "cat cat cat")).       // self-prox: pairs (0,1),(1,2) within 1 -> 2
      toDF("doc_id", "text")
    val index = Retrieval.buildPositionalIndex(df, col("doc_id"), col("text"), nBuckets = 4)
    val out = Retrieval.proximitySearch(index,
      Seq((0L, "cat", "dog", 3), (1L, "cat", "dog", 2), (2L, "cat", "cat", 1)),
      topK = 10)
      .orderBy("query_id", "doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 2L),
      (1L, 0L, 1L), (1L, 1L, 1L), (1L, 3L, 2L), // |0-2| = 2 is within 2
      (2L, 4L, 2L)))
  }

  test("proximitySearch equals the brute-force pair count on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val vocab = Vector("a", "b", "c")
    val docs = Seq.tabulate(120)(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val queries = Seq((0L, "a", "b", 2), (1L, "c", "c", 3))
    val index = Retrieval.buildPositionalIndex(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text"), nBuckets = 4)
    val got = Retrieval.proximitySearch(index, queries, topK = 1000)
      .orderBy("query_id", "doc_id").as[(Long, Long, Long)].collect().toSeq
    val want = for {
      (qid, a, b, d) <- queries
      (did, text) <- docs
      toks = text.split("\\s+").toSeq
      pa = toks.zipWithIndex.collect { case (t, i) if t == a => i }
      pb = toks.zipWithIndex.collect { case (t, i) if t == b => i }
      raw = (for (x <- pa; y <- pb if math.abs(x - y) >= 1 && math.abs(x - y) <= d) yield 1).size
      n = if (a == b) raw / 2 else raw if n > 0
    } yield (qid, did, n.toLong)
    assert(got == want.sortBy(r => (r._1, r._2)))
  }

  test("rrfFuse is invariant to the order of input rankings") {
    import spark.implicits._
    val a = Seq((0L, 1L, 1L), (0L, 2L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 2L, 1L), (0L, 3L, 2L)).toDF("query_id", "doc_id", "rank")
    val ab = Retrieval.rrfFuse(Seq(a, b), topK = 5)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val ba = Retrieval.rrfFuse(Seq(b, a), topK = 5)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(ab == ba && ab.nonEmpty)
  }

  test("appendToInvertedIndex with an empty delta is a no-op for serving") {
    import spark.implicits._
    val df = Seq((0L, "cat dog"), (1L, "cat")).toDF("doc_id", "text")
    val base = Retrieval.buildInvertedIndex(df, col("doc_id"), col("text"), nBuckets = 4)
    val appended = Retrieval.appendToInvertedIndex(base,
      df.where(lit(false)), col("doc_id"), col("text"))
    assert(appended.n == base.n && appended.l == base.l)
    val q = Seq(0L -> Seq("cat"))
    val x = Retrieval.bm25IndexedTopK(base, q, topK = 5)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    val y = Retrieval.bm25IndexedTopK(appended, q, topK = 5)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(x == y && x.nonEmpty)
  }

  test("native position kernels: SQL registration and hand-checked edges") {
    import spark.implicits._
    // slot intersect: "a b" phrase over positions a=[0,4], b=[1,3] ->
    // shifted b=[0,2] ∩ [0,4] = {0} -> 1
    val r = spark.sql(
      """SELECT pos_slot_intersect_count(array(
        |  struct(0L AS slot, array(0L, 4L) AS positions),
        |  struct(1L AS slot, array(1L, 3L) AS positions))) AS n""".stripMargin)
      .as[Long].head()
    assert(r == 1L)
    // empty list of slots counts zero; empty positions kill the fold
    assert(spark.sql(
      "SELECT pos_slot_intersect_count(array(struct(0L AS slot, cast(array() AS array<bigint>) AS positions)))")
      .as[Long].head() == 0L)
    // pair count: pa=[0,5], pb=[1,5,9], maxDist=2 ->
    // x=0: y=1 (d=1) ; x=5: y=5 excluded (d=0), no others within 2...
    // wait y=5 d=0 excluded -> just 1 total... include y in [3,7]: {5} excluded -> 0
    assert(spark.sql(
      "SELECT pos_pair_count(array(0L, 5L), array(1L, 5L, 9L), 2L)")
      .as[Long].head() == 1L)
    // boundary inclusivity: d == maxDist counts
    assert(spark.sql("SELECT pos_pair_count(array(0L), array(3L), 3L)")
      .as[Long].head() == 1L)
    assert(spark.sql("SELECT pos_pair_count(array(0L), array(4L), 3L)")
      .as[Long].head() == 0L)
  }

  test("bm25IndexedTopK: query with no indexed term yields no rows") {
    import spark.implicits._
    val df = Seq((0L, "cat dog")).toDF("doc_id", "text")
    val index = Retrieval.buildInvertedIndex(df, col("doc_id"), col("text"), nBuckets = 4)
    val out = Retrieval.bm25IndexedTopK(index, Seq(9L -> Seq("zebra")), topK = 3)
    assert(out.count() == 0L)
  }

  test("rankingMetrics: hand-computed metrics, no-hit and zero-rel queries") {
    import spark.implicits._
    // k = 3, lcm(1..3) = 6.
    // q0: ranking d5@1, d2@2, d7@3; rel {2, 3} -> n_rel 2, hits 1 (d2),
    //     first_rel 2 -> prec 10^6 div 3 = 333333, recall 10^6 div 2 =
    //     500000, mrr 6 div 2 = 3
    // q1: rel {9} but no ranking rows -> n_rel 1, all metrics 0
    // q2: ranking row but no rel rows -> all zeros
    val ranking = Seq((0L, 5L, 1L), (0L, 2L, 2L), (0L, 7L, 3L), (2L, 1L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((0L, 2L), (0L, 3L), (1L, 9L)).toDF("query_id", "doc_id")
    val out = Retrieval.rankingMetrics(ranking, qrels, k = 3)
      .orderBy("query_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 1L, 333333L, 500000L, 3L),
      (1L, 1L, 0L, 0L, 0L, 0L),
      (2L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("rankingMetrics: ranks beyond k are ignored; perfect top-k maxes every metric") {
    import spark.implicits._
    val ranking = Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((0L, 1L), (0L, 2L)).toDF("query_id", "doc_id")
    val out = Retrieval.rankingMetrics(ranking, qrels, k = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // d3@3 sits beyond k=2: hits 2 of 2, prec = recall = 10^6,
    // mrr = lcm(1..2) div 1 = 2
    assert(out == Seq((0L, 2L, 2L, 1000000L, 1000000L, 2L)))
  }

  test("removeFromInvertedIndex(build(full), dels) serves as build(full minus dels)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vocab = Vector("cat", "dog", "fish", "x", "y", "z")
    val all = Seq.tabulate(90)(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val full = Retrieval.buildInvertedIndex(all.toDF("doc_id", "text"),
      col("doc_id"), col("text"), nBuckets = 4)
    val removed = Retrieval.removeFromInvertedIndex(full,
      all.map(_._1).filter(_ % 4 == 0).toDF("doc_id"))
    val rebuilt = Retrieval.buildInvertedIndex(
      all.filterNot(_._1 % 4 == 0).toDF("doc_id", "text"),
      col("doc_id"), col("text"), nBuckets = 4)
    assert(removed.n == rebuilt.n && removed.l == rebuilt.l)
    val queries = Seq(0L -> Seq("cat", "dog"), 1L -> Seq("fish", "z"))
    val a = Retrieval.bm25IndexedTopK(removed, queries, topK = 5)
      .orderBy("query_id", "doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    val b = Retrieval.bm25IndexedTopK(rebuilt, queries, topK = 5)
      .orderBy("query_id", "doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("removeFromInvertedIndex: unknown tombstone ids are a no-op") {
    import spark.implicits._
    val df = Seq((0L, "cat dog"), (1L, "cat")).toDF("doc_id", "text")
    val base = Retrieval.buildInvertedIndex(df, col("doc_id"), col("text"), nBuckets = 4)
    val removed = Retrieval.removeFromInvertedIndex(base, Seq(99L, 100L).toDF("doc_id"))
    assert(removed.n == base.n && removed.l == base.l)
    assert(removed.postings.count() == base.postings.count())
  }

  test("compactInvertedIndex: the rewrite serves identically and restores bucket pruning") {
    import spark.implicits._
    val mk = (r: Range) => r.map(i => (i.toLong, s"cat dog w$i")).toDF("doc_id", "text")
    val base = Retrieval.buildInvertedIndex(mk(0 until 40),
      col("doc_id"), col("text"), nBuckets = 8)
    val appended = Retrieval.appendToInvertedIndex(base, mk(40 until 60),
      col("doc_id"), col("text"))
    val compacted = Retrieval.compactInvertedIndex(appended, "graft_inv_compact_test")
    val queries = Seq(0L -> Seq("cat"), 1L -> Seq("dog"))
    val a = Retrieval.bm25IndexedTopK(compacted, queries, topK = 5)
      .orderBy("query_id", "doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    val rebuilt = Retrieval.buildInvertedIndex(mk(0 until 60),
      col("doc_id"), col("text"), nBuckets = 8)
    val b = Retrieval.bm25IndexedTopK(rebuilt, queries, topK = 5)
      .orderBy("query_id", "doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(a == b && a.nonEmpty)
    // the compacted table prunes to the query terms' buckets and the
    // corpus text never enters the serve plan
    val plan = Retrieval.bm25IndexedTopK(compacted, queries, topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount"), plan)
    assert(!plan.contains("text#"), plan)
  }

  test("correctTerms: exact hit at distance 0, frequency then token tie-breaks, NULL garble") {
    import spark.implicits._
    val vocab = Seq((0L, "cat", 100L), (1L, "bat", 90L), (2L, "hat", 90L),
      (3L, "dog", 7L)).toDF("token_id", "token", "n")
    // "cat" exact; "cot" dist 1 of cat only among the best (freq wins);
    // "bht" dist 1 of BOTH bat and hat (freq ties at 90 -> token asc);
    // "zzzz" is > 2 edits from everything -> NULL row survives the join
    val out = Retrieval.correctTerms(vocab, Seq("cat", "cot", "bht", "zzzz"), maxDist = 2)
      .orderBy("term")
      .as[(String, Option[String], Option[Long], Option[Long])].collect().toSeq
    assert(out == Seq(
      ("bht", Some("bat"), Some(1L), Some(90L)),
      ("cat", Some("cat"), Some(0L), Some(100L)),
      ("cot", Some("cat"), Some(1L), Some(100L)),
      ("zzzz", None, None, None)))
  }

  test("rankingMetrics equals the brute-force computation on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    val k = 5 // lcm(1..5) = 60
    val queries = (0L until 12L).toSeq
    val ranking = queries.flatMap { q =>
      val docs = rnd.shuffle((0L until 30L).toList).take(rnd.nextInt(9))
      docs.zipWithIndex.map { case (d, i) => (q, d, (i + 1).toLong) }
    }
    val qrels = for {
      q <- queries; d <- 0L until 30L if rnd.nextInt(5) == 0
    } yield (q, d)
    val got = Retrieval.rankingMetrics(
      ranking.toDF("query_id", "doc_id", "rank"),
      qrels.toDF("query_id", "doc_id"), k = k)
      .orderBy("query_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val relBy = qrels.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rankBy = ranking.groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3))).toMap
    val want = (rankBy.keySet ++ relBy.keySet).toSeq.sorted.map { q =>
      val rel = relBy.getOrElse(q, Set.empty[Long])
      val hits = rankBy.getOrElse(q, Seq.empty).filter(r => r._2 <= k && rel(r._1))
      val firstRel = hits.map(_._2).sorted.headOption
      (q, rel.size.toLong, hits.size.toLong,
        hits.size * 1000000L / k,
        if (rel.nonEmpty) hits.size * 1000000L / rel.size else 0L,
        firstRel.map(60L / _).getOrElse(0L))
    }
    assert(got == want && got.nonEmpty)
  }

  test("correctTerms equals the brute-force nearest-token search on random vocab") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    val alpha = "abcd"
    def w(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    val vocab = (0 until 60).map(i =>
      (i.toLong, w(1 + rnd.nextInt(5)), (1 + rnd.nextInt(50)).toLong)).distinctBy(_._2)
    val terms = (0 until 12).map(_ => w(1 + rnd.nextInt(5))).distinct
    val got = Retrieval.correctTerms(vocab.toDF("token_id", "token", "n"),
        terms, maxDist = 1)
      .orderBy("term")
      .as[(String, Option[String], Option[Long], Option[Long])].collect().toSeq
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = terms.sorted.map { t =>
      val cands = vocab.map(v => (v._2, lev(t, v._2).toLong, v._3)).filter(_._2 <= 1)
      if (cands.isEmpty) (t, None, None, None)
      else {
        val best = cands.sortBy(c => (c._2, -c._3, c._1)).head
        (t, Some(best._1), Some(best._2), Some(best._3))
      }
    }
    assert(got == want && got.exists(_._2.isDefined))
  }

  test("indexStats: power-of-two df buckets, hand-computed masses") {
    import spark.implicits._
    // a: df 3 (tf 2+1+1=4) -> bucket floor(log2 3) = 1; b, c: df 1 -> bucket 0
    val df = Seq((0L, "a a b"), (1L, "a c"), (2L, "a")).toDF("doc_id", "text")
    val index = Retrieval.buildInvertedIndex(df, col("doc_id"), col("text"), nBuckets = 4)
    val out = Retrieval.indexStats(index).orderBy("df_bucket")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 2L, 2L, 1L),
      (1L, 1L, 3L, 4L, 3L)))
  }

  test("stopwordCandidates: per-mille floor against the FULL doc count") {
    import spark.implicits._
    val df = Seq((0L, "a a b"), (1L, "a c"), (2L, "a")).toDF("doc_id", "text")
    val index = Retrieval.buildInvertedIndex(df, col("doc_id"), col("text"), nBuckets = 4)
    val out = Retrieval.stopwordCandidates(index, minPerMille = 500L)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 3L, 1000L)))
    // b and c sit at floor(1000/3) = 333 per mille — below any
    // threshold above 333
    val all = Retrieval.stopwordCandidates(index, minPerMille = 0L)
      .orderBy("term").as[(String, Long, Long)].collect().toSeq
    assert(all == Seq(("a", 3L, 1000L), ("b", 1L, 333L), ("c", 1L, 333L)))
  }

  test("blocklistFilter: per-mille floor division and threshold") {
    import spark.implicits._
    val df = Seq(
      (0L, "bad bad ok ok ok ok ok ok ok ok"), // 2/10 -> 200 per mille
      (1L, "bad " + Seq.fill(49)("ok").mkString(" ")), // 1/50 -> 20
      (2L, "clean text only"), // 0
      (3L, "")).toDF("doc_id", "text") // 0 tokens -> rate 0, kept
    val out = TextAnalysis.blocklistFilter(df, col("doc_id"), col("text"),
      Seq("bad", "evil"), maxPerMille = 20L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (0L, 10L, 2L, 200L, false),
      (1L, 50L, 1L, 20L, true),
      (2L, 3L, 0L, 0L, true),
      (3L, 0L, 0L, 0L, true)))
  }
}
