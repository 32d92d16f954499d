package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TrainingSpec extends SparkTestBase {

  // linearly separable corpus: positives speak one vocabulary,
  // negatives another — the batch perceptron must reach perfect
  // training accuracy within a few rounds
  private def separable(n: Int) = {
    val spark0 = spark
    import spark0.implicits._
    (0L until n.toLong).map { i =>
      if (i % 2 == 0) (i, "good clean prose text", true)
      else (i, "spam junk noise garbage", false)
    }.toDF("doc_id", "text", "pos")
  }

  test("trainBatchPerceptron separates a separable corpus; order-independent") {
    import spark.implicits._
    val df = separable(40)
    val w = Training.trainBatchPerceptron(df, col("doc_id"), col("text"),
      col("pos"), buckets = 64, iters = 3)
    assert(w.count() == 64L)
    // weights are identical regardless of partitioning (sum-based update)
    val w1 = w.orderBy("bucket").as[(Long, Long)].collect().toSeq
    val w8 = Training.trainBatchPerceptron(df.repartition(8), col("doc_id"),
      col("text"), col("pos"), buckets = 64, iters = 3)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(w1 == w8)
    // the trained model classifies its training set perfectly
    val scored = Training.trainAndFilter(df, col("doc_id"), col("text"),
      col("pos"), buckets = 64, iters = 3)
    val wrong = scored.join(df.select(col("doc_id"), col("pos")), "doc_id")
      .where(col("kept") =!= col("pos")).count()
    assert(wrong == 0L, s"$wrong misclassified after training")
  }

  test("round 1 updates on every document from w = 0") {
    import spark.implicits._
    // single round: w[b] must equal sum over ALL docs of y * count_b
    val df = Seq(
      (0L, "aa aa bb", true),
      (1L, "aa cc", false)).toDF("doc_id", "text", "pos")
    val w = Training.trainBatchPerceptron(df, col("doc_id"), col("text"),
      col("pos"), buckets = 8, iters = 1)
      .as[(Long, Long)].collect().toMap
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 8
    }
    // aa: +2 (doc0) -1 (doc1) = +1; bb: +1; cc: -1 — summed into
    // buckets (collision-safe: expectation built the same way)
    val expected = Seq(bucket("aa") -> 1L, bucket("bb") -> 1L, bucket("cc") -> -1L)
      .groupMapReduce(_._1)(_._2)(_ + _)
    (0L until 8L).foreach { b =>
      assert(w(b) == expected.getOrElse(b, 0L), s"bucket $b")
    }
  }

  test("trainBpe: hand-computed merges on the classic toy corpus") {
    val spark0 = spark
    import spark0.implicits._
    // word freqs: low x5, lower x2, newest x6, widest x3
    val df = Seq(
      ("low low low low low newest newest newest"),
      ("newest newest newest lower lower widest widest widest")).toDF("text")
    val out = Training.trainBpe(df, col("text"), nMerges = 4)
      .as[(Long, String, String, Long)].collect().toSeq
    // round 1: 'es' and 'st' both appear in newest(6)+widest(3) = 9;
    // 'es' wins the (l, r) tie-break alphabetically ('e' < 's');
    // round 2: 'es'+'t' -> 'est' (9); round 3: 'e  w' in newest(6) and
    // 'w  i' in widest(3)... recount: after est, newest = n e w est,
    // widest = w i d est: pairs: (n,e)=6 (e,w)=6 (w,est)=6 (w,i)=3
    // (i,d)=3 (d,est)=3 (l,o)=7 (o,w)=7 (w,e)=2 (e,r)=2 -> max 7 (l,o)
    // round 4: lo+w -> 'low' (7)
    assert(out == Seq(
      (1L, "e", "s", 9L),
      (2L, "es", "t", 9L),
      (3L, "l", "o", 7L),
      (4L, "lo", "w", 7L)))
  }

  test("trainBpe: [a,a,a,a] fuses to [aa,aa] — greedy pass matches real BPE") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq("aaaa aaaa aaaa").toDF("text")
    val out = Training.trainBpe(df, col("text"), nMerges = 2)
      .as[(Long, String, String, Long)].collect().toSeq
    // round 1: (a,a) appears 3x per word x 3 words = 9; after the
    // greedy fuse each word is [aa, aa] -> round 2: (aa,aa) count 3
    assert(out == Seq((1L, "a", "a", 9L), (2L, "aa", "aa", 3L)))
  }

  test("trainBpe: merge (a,b) must not fuse a with the PREFIX of symbol bc") {
    val spark0 = spark
    import spark0.implicits._
    // corpus engineered so round 1 learns (b,c) and round 2 learns
    // (a,b): word "abc" is then [a, bc] — a left-anchored-only merge
    // pattern would corrupt it to one symbol "abc" and round 3 would
    // miss the textbook merge (a, bc)
    val df = Seq("abc abc abc bc bc ab ab ab ab").toDF("text")
    val out = Training.trainBpe(df, col("text"), nMerges = 3)
      .as[(Long, String, String, Long)].collect().toSeq
    // round 1: (b,c) = 3 (abc) + 2 (bc) = 5 vs (a,b) = 3 + 4 = 7 —
    // recount: (a,b) appears in abc x3 and ab x4 = 7, wins round 1;
    // then abc = [ab, c], round 2: (b,c) = 2 (bc only), (ab,c) = 3 —
    // (ab,c) wins; round 3: (b,c) = 2 in the bc words
    assert(out == Seq((1L, "a", "b", 7L), (2L, "ab", "c", 3L), (3L, "b", "c", 2L)))
    // the direct ADVICE case: apply (b,c) then (a,b) to "abc" — the
    // result must be [a, bc] (2 tokens), NOT one fused symbol
    val fert = Training.applyBpe(Seq((0L, "abc")).toDF("id", "text"),
        col("id"), col("text"), Seq(("b", "c"), ("a", "b")))
      .as[(Long, Long, Long)].head()
    assert(fert == ((0L, 1L, 2L)), s"expected [a, bc] = 2 tokens, got $fert")
  }

  test("trainBpe: deterministic across partitionings; stops when pairs run out") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq("ab ab cd", "ab cd x").toDF("text")
    val a = Training.trainBpe(df, col("text"), nMerges = 10)
      .as[(Long, String, String, Long)].collect().toSeq
    val b = Training.trainBpe(df.repartition(5), col("text"), nMerges = 10)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(a == b)
    // vocabulary {ab x3, cd x2, x} supports exactly 2 merges
    assert(a == Seq((1L, "a", "b", 3L), (2L, "c", "d", 2L)))
  }

  test("applyBpe: hand-computed fertility; merges never cross word boundaries") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((0L, "lowest newest"), (1L, ""), (2L, "ab ab")).toDF("id", "text")
    // merges (e,s) then (es,t): lowest -> l o w est, newest -> n e w est
    val out = Training.applyBpe(df, col("id"), col("text"),
        Seq(("e", "s"), ("es", "t")))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out(0) == ((0L, 2L, 8L)))
    assert(out(1) == ((1L, 0L, 0L)))
    // merge (b,a) must NOT fuse across the 'ab ab' word boundary
    val cross = Training.applyBpe(df.where(col("id") === 2), col("id"), col("text"),
        Seq(("b", "a")))
      .as[(Long, Long, Long)].head()
    assert(cross == ((2L, 2L, 4L)))
  }

  test("applyBpe: fertility drops monotonically as trained merges apply") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq.tabulate(50)(i => (i.toLong, s"window window merge w$i")).toDF("id", "text")
    val merges = Training.trainBpe(df, col("text"), nMerges = 5)
      .orderBy("merge_idx")
      .as[(Long, String, String, Long)].collect().toSeq.map(m => (m._2, m._3))
    val counts = (0 to merges.size).map { k =>
      Training.applyBpe(df, col("id"), col("text"), merges.take(k))
        .agg(sum("n_tokens")).as[Long].head()
    }
    assert(counts.zip(counts.tail).forall { case (a, b) => b < a },
      s"each merge must strictly reduce total tokens on this corpus: $counts")
  }

  test("trainBpeBatched equals the sequential loop on toy corpora, any maxBatch") {
    val spark0 = spark
    import spark0.implicits._
    val corpora = Seq(
      Seq("low low low low low newest newest newest",
        "newest newest newest lower lower widest widest widest"),
      Seq("abc abc abc bc bc ab ab ab ab"),
      Seq("aaaa aaaa aaaa"),
      Seq("the quick brown fox the lazy dog the end"),
      // count TIE between pairs (a, U+E000) and (a, U+1F600): UTF-16
      // code-unit order sorts the emoji's high surrogate (0xD83D)
      // BELOW 0xE000 while the distributed path / DuckDB sort by
      // codepoint (0xE000 < 0x1F600) — the driver-local PQ tie-break
      // must agree with the distributed ordering or the
      // driverVocabLimit dispatch changes the learned merges
      Seq("a a a a😀 a😀 a😀"))
    // driverVocabLimit = 0 forces the DISTRIBUTED rounds; the default
    // exercises the driver-local incremental loop — both must equal
    // the sequential reference
    for (docs <- corpora; nMerges <- Seq(1, 4, 8); batch <- Seq(1, 2, 3, 256);
         vocabLimit <- Seq(0L, 1000000L)) {
      val df = docs.toDF("text")
      val seqOut = Training.trainBpe(df, col("text"), nMerges)
        .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
      val batOut = Training.trainBpeBatched(df, col("text"), nMerges,
          maxBatch = batch, driverVocabLimit = vocabLimit)
        .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
      assert(batOut == seqOut,
        s"corpus=$docs nMerges=$nMerges maxBatch=$batch vocabLimit=$vocabLimit:" +
          s"\n  batched=$batOut\n  sequential=$seqOut")
    }
  }

  test("trainBpeBatched equals sequential BPE on seeded random corpora") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 6) {
      val vocab = Seq.fill(8)((0 until (1 + rnd.nextInt(5)))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val docs = Seq.fill(12)(Seq.fill(1 + rnd.nextInt(6))(
        vocab(rnd.nextInt(vocab.length))).mkString(" "))
      val df = docs.toDF("text")
      val seqOut = Training.trainBpe(df, col("text"), nMerges = 6)
        .as[(Long, String, String, Long)].collect().toSeq
      for (vocabLimit <- Seq(0L, 1000000L)) {
        val batOut = Training.trainBpeBatched(df, col("text"), nMerges = 6,
            maxBatch = 4, driverVocabLimit = vocabLimit)
          .as[(Long, String, String, Long)].collect().toSeq
        assert(batOut == seqOut,
          s"trial $trial vocabLimit=$vocabLimit corpus=$docs:" +
            s"\n  batched=$batOut\n  sequential=$seqOut")
      }
    }
  }

  test("localBpe: incremental pair counts equal naive recount BPE over heavy random vocabs") {
    // the driver-local trainer's moving parts — incremental count
    // updates, the lazy-deletion priority queue, stale word indices —
    // against a naive recount-every-merge reference, at merge depths
    // where symbols grow multi-character and pairs die and resurrect
    def refBpe(words: Map[String, Long], nMerges: Int): Seq[(Long, String, String, Long)] = {
      var cur: Map[Vector[String], Long] = words.toSeq
        .map { case (w, c) => (w.toVector.map(_.toString), c) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      val out = Seq.newBuilder[(Long, String, String, Long)]
      var done = false
      var i = 0
      while (i < nMerges && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        cur.foreach { case (syms, c) =>
          syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
        }
        if (counts.isEmpty) done = true
        else {
          val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
          i += 1
          out += ((i.toLong, l, r, c))
          cur = cur.toSeq.map { case (syms, cnt) =>
            val b = Vector.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
                b += (l + r); j += 2
              } else { b += syms(j); j += 1 }
            }
            (b.result(), cnt)
          }.groupMapReduce(_._1)(_._2)(_ + _)
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 10) {
      val nWords = 20 + rnd.nextInt(40)
      val vocab = Array.fill(nWords)(
        ((0 until (1 + rnd.nextInt(8)))
          .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString,
          1L + rnd.nextInt(50)))
        // distinct words (duplicates would double-count frequencies)
        .groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
      val nMerges = 10 + rnd.nextInt(30)
      val got = Training.localBpe(vocab, nMerges)
      val expect = refBpe(vocab.toMap, nMerges)
      assert(got == expect,
        s"trial $trial (${vocab.length} words, $nMerges merges):\n got=$got\n expect=$expect")
    }
  }

  test("codePointCompare orders like UTF-8 bytes, not UTF-16 code units") {
    val pua = ""          // private-use, single code unit
    val emoji = "😀"  // U+1F600, surrogate pair
    // UTF-16 code-unit compare would say emoji < pua (0xD83D < 0xE000);
    // codepoint/UTF-8 order says pua < emoji (0xE000 < 0x1F600)
    assert(Training.codePointCompare(pua, emoji) < 0)
    assert(Training.codePointCompare(emoji, pua) > 0)
    assert(pua.compareTo(emoji) > 0, "sanity: String.compareTo disagrees here")
    // agreement with UTF-8 byte order on a mixed sample, prefixes included
    val sample = Seq("", "a", "ab", "b", pua, emoji, "a" + pua, "a" + emoji, "é", "z")
    val byCp = sample.sorted(Ordering.comparatorToOrdering(
      new java.util.Comparator[String] {
        def compare(a: String, b: String): Int = Training.codePointCompare(a, b)
      }))
    val byUtf8 = sample.sortBy(_.getBytes("UTF-8").map(b => b & 0xff).toSeq)(
      Ordering.Implicits.seqOrdering)
    assert(byCp == byUtf8)
  }

  test("buildVocab: dense ids by (count desc, token asc); prune and cap apply") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq("b b b a a c", "a b d", "D d").toDF("text")
    // counts: b=4, a=3, d=3 (case-folded), c=1, with minCount=2 c drops;
    // ids: b(4)->0, a(3)->1 (tie with d broken alphabetically), d(3)->2
    val out = Training.buildVocab(df, col("text"), maxSize = 10, minCount = 2L)
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((0L, "b", 4L), (1L, "a", 3L), (2L, "d", 3L)))
    // cap keeps the most frequent
    val capped = Training.buildVocab(df, col("text"), maxSize = 1, minCount = 1L)
      .as[(Long, String, Long)].collect().toSeq
    assert(capped == Seq((0L, "b", 4L)))
    // deterministic across partitionings
    val again = Training.buildVocab(df.repartition(5), col("text"), 10, 2L)
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(again == out)
  }

  test("trainBpe matches an independent in-memory BPE on seeded random corpora") {
    val spark0 = spark
    import spark0.implicits._
    // reference: textbook BPE over a word-frequency map — greedy
    // left-to-right fuse, argmax pair by (count desc, pair asc)
    def refBpe(words: Map[String, Long], nMerges: Int): Seq[(String, String, Long)] = {
      var cur: Map[Vector[String], Long] = words.toSeq
        .map { case (w, c) => (w.toVector.map(_.toString), c) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      val out = Seq.newBuilder[(String, String, Long)]
      var done = false
      for (_ <- 1 to nMerges if !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        cur.foreach { case (syms, c) =>
          syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
        }
        if (counts.isEmpty) done = true
        else {
          val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
          out += ((l, r, c))
          cur = cur.toSeq.map { case (syms, cnt) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                b += (l + r); i += 2
              } else { b += syms(i); i += 1 }
            }
            (b.result(), cnt)
          }.groupMapReduce(_._1)(_._2)(_ + _)
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 6) {
      // tiny alphabet forces repeated-symbol words ("aab", "bbbb") —
      // the greedy-fuse edge cases
      val vocab = Seq.fill(8)((0 until (1 + rnd.nextInt(5)))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val docs = Seq.fill(12)(Seq.fill(1 + rnd.nextInt(6))(
        vocab(rnd.nextInt(vocab.length))).mkString(" "))
      val freqs = docs.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupMapReduce(identity)(_ => 1L)(_ + _)
      val expected = refBpe(freqs, nMerges = 3)
      val got = Training.trainBpe(docs.toDF("text"), col("text"), nMerges = 3)
        .as[(Long, String, String, Long)].collect().toSeq.map(m => (m._2, m._3, m._4))
      assert(got == expected, s"trial $trial: corpus=$docs got=$got expected=$expected")
    }
  }

  test("calibrationBins: bin edges, clamp, and exact rates — hand-computed") {
    import spark.implicits._
    val rows = Seq(
      (0L, false), (99999L, false), // bin 0
      (100000L, true), // bin 1 (exact lower edge)
      (999999L, true), (1000000L, false), // bin 9 (clamp folds 10^6 in)
      (550000L, true), (560000L, false)) // bin 5
      .toDF("s", "y")
    val r = Training.calibrationBins(rows, col("s"), col("y"), nBins = 10)
      .orderBy("bin").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (0L, 50000L, 2L, 0L, 0L),
      (1L, 150000L, 1L, 1L, 1000000L),
      (5L, 550000L, 2L, 1L, 500000L),
      (9L, 950000L, 2L, 1L, 500000L)))
  }

  test("calibrationBins: a perfectly calibrated uniform scorer tracks bin midpoints") {
    import spark.implicits._
    // score i/1000 ppm-scaled; label = hash-free deterministic rule
    // true with rate equal to the score: y = (i % 1000) < score-bucket
    val rows = (0 until 100000).map { i =>
      val score = (i / 100L) * 1000L // 0, 1000, ..., 999000 ppm
      (score, (i % 100L) * 10000L < score)
    }
    val r = Training.calibrationBins(rows.toDF("s", "y"), col("s"), col("y"), 10)
      .as[(Long, Long, Long, Long, Long)].collect()
    r.foreach { case (_, mid, _, _, rate) =>
      assert(math.abs(rate - mid) < 10000L, s"bin mid $mid rate $rate")
    }
  }

  test("calibrationBins: deterministic across partitionings") {
    import spark.implicits._
    val df = spark.range(20000).select(
      ((col("id") * 37) % 1000001).as("s"), (col("id") % 3 === 0).as("y"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Training.calibrationBins(d, col("s"), col("y"), 10)
        .orderBy("bin").collect().toSeq
    assert(run(df.repartition(1)) == run(df.repartition(11)))
  }

  test("aucExact: hand-computed with ties") {
    import spark.implicits._
    // pos scores {3, 2}, neg scores {2, 1}: pairs (3,2)+ (3,1)+ (2,1)+
    // concordant=3, (2,2) tied=1 -> 2U = 7, AUC = 7/8 = 875000 ppm
    val rows = Seq((3L, true), (2L, true), (2L, false), (1L, false))
    val r = Training.aucExact(rows.toDF("s", "y"), col("s"), col("y"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(r == ((4L, 2L, 2L, 875000L)))
  }

  test("aucExact: perfect separation -> 10^6; reversed -> 0; constant label -> 0") {
    import spark.implicits._
    val perfect = Seq((10L, true), (9L, true), (2L, false), (1L, false))
    assert(Training.aucExact(perfect.toDF("s", "y"), col("s"), col("y"))
      .select("auc_ppm").as[Long].head() == 1000000L)
    val reversed = perfect.map { case (s, y) => (s, !y) }
    assert(Training.aucExact(reversed.toDF("s", "y"), col("s"), col("y"))
      .select("auc_ppm").as[Long].head() == 0L)
    val constant = Seq((5L, true), (3L, true))
    assert(Training.aucExact(constant.toDF("s", "y"), col("s"), col("y"))
      .select("auc_ppm").as[Long].head() == 0L)
  }

  test("aucExact: matches the brute-force pair count on seeded random data") {
    import spark.implicits._
    val rng = new scala.util.Random(77)
    val rows = Seq.fill(300)((rng.nextInt(20).toLong, rng.nextBoolean()))
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for { p <- pos; q <- neg } yield {
      if (p > q) 2L else if (p == q) 1L else 0L
    }).sum
    val expected = u2 * 1000000L / (2L * pos.size * neg.size)
    val r = Training.aucExact(rows.toDF("s", "y"), col("s"), col("y"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(r == ((300L, pos.size.toLong, neg.size.toLong, expected)))
  }

  test("aucExact: deterministic across partitionings") {
    import spark.implicits._
    val df = spark.range(30000).select(
      ((col("id") * 131) % 997).as("s"), (col("id") % 7 < 3).as("y"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Training.aucExact(d, col("s"), col("y")).collect().head
    assert(run(df.repartition(1)) == run(df.repartition(13)))
  }

  test("aucByGroup: per-group equals aucExact run per slice; constant group -> 0") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val rows = Seq.fill(400)(
      (s"g${rng.nextInt(3)}", rng.nextInt(15).toLong, rng.nextBoolean())) ++
      Seq.fill(10)(("konst", 7L, true)) // constant label -> auc 0
    val df = rows.toDF("grp", "s", "y")
    val grouped = Training.aucByGroup(df, col("grp"), col("s"), col("y"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    rows.map(_._1).distinct.foreach { g =>
      val slice = Training.aucExact(
          df.where(col("grp") === g), col("s"), col("y"))
        .as[(Long, Long, Long, Long)].collect().head
      assert(grouped(g) == slice, s"group $g disagrees with the sliced global")
    }
    assert(grouped("konst")._4 == 0L)
  }

  test("prCurve: hand-computed sweep with a tied score") {
    import spark.implicits._
    // scores: 3+(pos), 2+(pos), 2-(neg), 1-(neg); n_pos = 2
    // t=3: pred 1, tp 1 -> P 1.0, R 0.5, F1 2/3
    // t=2: pred 3, tp 2 -> P 2/3, R 1.0, F1 4/5
    // t=1: pred 4, tp 2 -> P 0.5, R 1.0, F1 2/3
    val rows = Seq((3L, true), (2L, true), (2L, false), (1L, false))
    val r = Training.prCurve(rows.toDF("s", "y"), col("s"), col("y"))
      .orderBy(col("threshold").desc)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (3L, 1L, 1L, 1000000L, 500000L, 666666L),
      (2L, 3L, 2L, 666666L, 1000000L, 800000L),
      (1L, 4L, 2L, 500000L, 1000000L, 666666L)))
  }

  test("trainWordPiece: likelihood gain beats raw frequency — hand-computed") {
    import spark.implicits._
    // words: ab x2, aq x8, pb x8, xy x1.
    // round 1 counts: a=10, b=10, q=8, p=8, x=1, y=1; pairs
    // (a,b)=2 -> 2e12/100 = 2e10; (a,q)=8 -> 8e12/80 = 1e11;
    // (p,b)=8 -> 1e11; (x,y)=1 -> 1e12/1 = 1e12. WordPiece picks the
    // RARE-but-perfectly-coupled (x,y); BPE would pick (a,q)/(p,b).
    // round 2: (a,q) vs (p,b) tie at 1e11 -> 'a' < 'p' -> (a,q).
    // round 3: a=2 now, so (a,b) = 2e12/(2*10) = 1e11 ties (p,b) at
    // 8e12/(8*10) = 1e11 -> 'a' < 'p' -> (a,b).
    val df = Seq(
      "ab ab aq aq aq aq aq aq aq aq",
      "pb pb pb pb pb pb pb pb xy").toDF("text")
    val out = Training.trainWordPiece(df, col("text"), nMerges = 3)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "x", "y", 1L, 1000000000000L),
      (2L, "a", "q", 8L, 100000000000L),
      (3L, "a", "b", 2L, 100000000000L)))
    // deterministic across partitionings
    val out2 = Training.trainWordPiece(df.repartition(7), col("text"), nMerges = 3)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(out2 == out)
  }

  test("wordpiece segment: greedy longest-match-first, NOT fewest-pieces") {
    import spark.implicits._
    // greedy takes 'ab' first and pays 3 pieces; the 2-piece tiling
    // a+bbb exists — proving this is WordPiece inference, not Viterbi
    val vocab = Seq("a", "b", "ab", "bbb")
    val seg = Seq("abbb").toDF("word").select(concat_ws(" ",
      graft.functions.WordPieceOps.wordpieceSegment(col("word"), vocab)).as("s"))
      .as[String].head()
    assert(seg == "ab b b")
    // unknown char and empty word -> empty array
    val hole = Seq("axb", "").toDF("word").select(
      size(graft.functions.WordPieceOps.wordpieceSegment(col("word"),
        Seq("a", "b"))).as("n")).as[Int].collect().toSeq
    assert(hole == Seq(0, 0))
  }

  test("wordpieceFertility: trained vocab segments the training corpus — hand-computed") {
    import spark.implicits._
    val df = Seq(
      "ab ab aq aq aq aq aq aq aq aq",
      "pb pb pb pb pb pb pb pb xy").toDF("text")
    // merges learned above: xy, aq, ab -> vocab adds those to the
    // singles {a,b,p,q,x,y}; greedy: ab->[ab], aq->[aq], pb->[p b],
    // xy->[xy]
    val out = Training.wordpieceFertility(df, col("text"), nMerges = 3)
      .orderBy("word")
      .as[(String, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      ("ab", 2L, 1L, "ab"),
      ("aq", 8L, 1L, "aq"),
      ("pb", 8L, 2L, "p b"),
      ("xy", 1L, 1L, "xy")))
  }

  test("wordpieceFertilityDocs: per-doc sums of the per-word fertility — hand-computed") {
    import spark.implicits._
    // same corpus as the trainer test: merges xy, aq, ab; per-word
    // fertility ab=1, aq=1, pb=2, xy=1
    val df = Seq(
      (0L, "ab ab aq aq aq aq aq aq aq aq"),
      (1L, "pb pb pb pb pb pb pb pb xy")).toDF("doc_id", "text")
    val out = Training.wordpieceFertilityDocs(df, col("doc_id"), col("text"), nMerges = 3)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // doc 0: 10 words, all 1-piece; doc 1: 8 x pb(2) + xy(1) = 17
    assert(out == Seq((0L, 10L, 10L), (1L, 9L, 17L)))
  }

  test("unigram segment: fewest pieces, then score, then lexicographic — hand-computed") {
    import spark.implicits._
    val words = Seq("abcd").toDF("word")
    // tilings of "abcd" with these pieces: ab+cd (2 pieces, 5+5=10),
    // abc+d (2 pieces, 9+1=10 — TIE on count and score; "ab cd" <
    // "abc d" decides), a+b+cd (3) etc. Expect the string tiebreak.
    val pieces = Seq("a", "b", "c", "d", "ab", "cd", "abc")
    val scores = Seq(1L, 1L, 1L, 1L, 5L, 5L, 9L)
    val seg = words.select(concat_ws(" ",
      graft.functions.UnigramOps.unigramSegment(col("word"), pieces, scores)).as("s"))
      .as[String].head()
    assert(seg == "ab cd")
    // higher-score tiling wins within equal piece count
    val seg2 = words.select(concat_ws(" ",
      graft.functions.UnigramOps.unigramSegment(col("word"), pieces,
        Seq(1L, 1L, 1L, 2L, 5L, 5L, 9L))).as("s"))
      .as[String].head()
    assert(seg2 == "abc d") // 9+2=11 beats 5+5=10
    // unsegmentable (char not in model) and empty word -> empty array
    val hole = Seq("axd", "").toDF("word").select(
      size(graft.functions.UnigramOps.unigramSegment(col("word"),
        Seq("a", "d"), Seq(1L, 1L))).as("n")).as[Int].collect().toSeq
    assert(hole == Seq(0, 0))
  }

  test("unigram segment: DP equals brute-force enumeration on random models (1000 cases)") {
    // the DP keeps one best (np, -score, seg) per position; this pins
    // its prefix-optimality argument against exhaustive enumeration
    val rng = new scala.util.Random(42)
    def bruteBest(word: String, model: Map[String, Long]): Option[String] = {
      def tilings(rest: String): Seq[List[String]] =
        if (rest.isEmpty) Seq(Nil)
        else (1 to math.min(3, rest.length)).flatMap { l =>
          val p = rest.take(l)
          if (model.contains(p)) tilings(rest.drop(l)).map(p :: _) else Nil
        }
      val all = tilings(word)
      if (all.isEmpty) None
      else Some(all.map { t =>
        (t.length, -t.map(model).sum, t.mkString(" "))
      }.min._3)
    }
    val model0 = new java.util.HashMap[String, java.lang.Long]()
    for (_ <- 1 to 1000) {
      val alphabet = "abc"
      val word = (1 to (1 + rng.nextInt(7)))
        .map(_ => alphabet(rng.nextInt(3))).mkString
      // random piece set over the alphabet, lengths 1..3; singles NOT
      // guaranteed, so unsegmentable words exercise the empty branch
      val pieces = (for {
        l <- 1 to 3
        _ <- 1 to 4
      } yield (1 to l).map(_ => alphabet(rng.nextInt(3))).mkString).distinct
      val model = pieces.map(p => p -> (rng.nextInt(20).toLong + 1)).toMap
      model0.clear()
      model.foreach { case (k, v) => model0.put(k, v) }
      val got = graft.functions.UnigramRuntime.segment(
        org.apache.spark.unsafe.types.UTF8String.fromString(word), model0, 3)
      val gotSeg = (0 until got.numElements())
        .map(got.getUTF8String(_).toString).mkString(" ")
      bruteBest(word, model) match {
        case None => assert(gotSeg == "", s"word=$word model=$model got=$gotSeg")
        case Some(best) => assert(gotSeg == best,
          s"word=$word model=$model got=$gotSeg want=$best")
      }
    }
  }

  test("trainUnigramLm: hand-computed EM on a toy corpus; deterministic across partitionings") {
    import spark.implicits._
    // corpus: "ab ab b" ×2 docs -> words ab(cnt 2... ) recompute:
    // docs: "ab ab b" and "ab b b" -> word counts ab=3, b=3? ab: 2+1=3, b: 1+2=3
    val docs = Seq("ab ab b", "ab b b").toDF("text")
    // seed (maxLen 2): substrings of "ab": a,b,ab (each cnt 3); of "b": b (3)
    // seed scores: a=3, b=3+3=6, ab=3
    // round 1: "ab" tilings: [ab] (1 piece) wins over [a b]; "b" -> [b]
    // usage: ab=3, b=3, a=0 -> a pruned? a is single char: kept at 0
    // round 2: same segmentations (ab score 3 > ... still 1 piece wins)
    // final: ab=3, b=3, a=0
    val m = Training.trainUnigramLm(docs, col("text"), maxPieceLen = 2, iters = 2)
      .as[(String, Long, Long)].collect().toSet
    assert(m == Set(("a", 1L, 0L), ("b", 1L, 3L), ("ab", 2L, 3L)))
    val m1 = Training.trainUnigramLm(docs.repartition(7), col("text"),
      maxPieceLen = 2, iters = 2).as[(String, Long, Long)].collect().toSet
    assert(m1 == m)
  }

  test("unigramFertility: per-word piece counts over the trained model") {
    import spark.implicits._
    val docs = Seq("ab ab b", "ab b b").toDF("text")
    val f = Training.unigramFertility(docs, col("text"), maxPieceLen = 2, iters = 2)
      .as[(String, Long, Long, String)].collect().toSet
    assert(f == Set(("ab", 3L, 1L, "ab"), ("b", 3L, 1L, "b")))
  }

  test("prCurve: recall monotone, all-negative labels give zero curve") {
    import spark.implicits._
    val rng = new scala.util.Random(19)
    val rows = Seq.fill(500)((rng.nextInt(30).toLong, rng.nextBoolean()))
    val r = Training.prCurve(rows.toDF("s", "y"), col("s"), col("y"))
      .orderBy(col("threshold").desc)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r.map(_._5) == r.map(_._5).sorted) // recall non-decreasing
    assert(r.last._5 == 1000000L)             // lowest threshold: recall 1
    val neg = Seq((5L, false), (3L, false))
    val rn = Training.prCurve(neg.toDF("s", "y"), col("s"), col("y"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rn.forall(row => row._4 == 0L && row._5 == 0L && row._6 == 0L))
  }
}
