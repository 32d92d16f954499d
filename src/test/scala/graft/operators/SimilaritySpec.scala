package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {

  test("cosine: orthogonal=0, identical=1, opposite=-1") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 0.0), Seq(0.0, 1.0), 0.0),
      (Seq(1.0, 2.0), Seq(1.0, 2.0), 1.0),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0), -1.0),
      (Seq(0.0, 0.0), Seq(1.0, 0.0), 0.0)) // zero-norm guard
      .toDF("a", "b", "want")
      .select(Similarity.cosine(col("a"), col("b")).as("got"), col("want"))
    df.collect().foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("bruteForceTopK returns the k nearest by cosine, excluding self") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(0.9, 0.1)),
      (2L, Seq(0.0, 1.0)),
      (3L, Seq(1.0, 0.05))).toDF("id", "vec")
    val res = Similarity.bruteForceTopK(corpus.where(col("id") === 0), corpus, k = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(res == Set(1L, 3L)) // 2 is orthogonal, self excluded
  }

  test("trainCentroids recovers well-separated clusters and feeds ivfAssignWith") {
    import spark.implicits._
    // two tight clusters around (1,0) and (0,1)
    val pts = (0 until 20).map(i => (i.toLong,
      if (i % 2 == 0) Seq(1.0 + i * 1e-3, 0.0) else Seq(0.0, 1.0 + i * 1e-3)))
      .toDF("id", "vec")
    val cents = Similarity.trainCentroids(pts, col("vec"), k = 2, seed = 1L)
    assert(cents.count() == 2)
    val assigned = Similarity.ivfAssignWith(
      pts.select(col("id").as("doc_id"), col("vec").cast("array<double>").as("v")), cents)
    val buckets = assigned.select("doc_id", "bucket").as[(Long, Long)].collect()
      .groupBy(_._2).map(_._2.map(_._1 % 2).toSet)
    // each k-means bucket holds exactly one parity class
    assert(buckets.toSet == Set(Set(0L), Set(1L)))
  }

  test("ivfTopK with nProbe = nBuckets equals brute force exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(3L)
    val corpus = (0 until 80).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() - 0.5))).toDF("id", "vec")
    val queries = corpus.where(col("id") < 10)
    val brute = Similarity.bruteForceTopK(queries, corpus, k = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // probing every bucket scans the whole corpus: identical result
    val full = Similarity.ivfTopK(queries, corpus, k = 4, nBuckets = 8, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full == brute)
    // single-probe recall is a subset; multi-probe monotonically recovers
    val p1 = Similarity.ivfTopK(queries, corpus, k = 4, nBuckets = 8, nProbe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val p4 = Similarity.ivfTopK(queries, corpus, k = 4, nBuckets = 8, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert((p1 intersect brute).size <= (p4 intersect brute).size)
  }

  test("a built (persisted) index serves multiple query batches identically to inline ivfTopK") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val corpus = (0 until 60).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() - 0.5))).toDF("id", "vec")
    val index = Similarity.ivfIndex(corpus, nBuckets = 6)
    index.assigned.persist() // the build-once artifact
    try {
      Seq(col("id") < 5, col("id") >= 5 && col("id") < 10).foreach { batch =>
        val served = Similarity.ivfTopKIndexed(corpus.where(batch), index, k = 3, nProbe = 2)
          .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
        val inline = Similarity.ivfTopK(corpus.where(batch), corpus, k = 3, nBuckets = 6, nProbe = 2)
          .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
        assert(served == inline)
      }
    } finally index.assigned.unpersist()
  }

  test("quantizeInt8: max maps to ±127, zeros stay zero, cosine ranking survives") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(2.0f, -4.0f, 1.0f)),
      (1L, Seq(0.0f, 0.0f, 0.0f))).toDF("id", "vec")
    val q = Similarity.quantizeInt8(df, col("id"), col("vec"))
      .orderBy("id").collect()
    // scale = 127/4: 2 -> 63.5 -> floor(63.5+0.5)=64 (half-up); -4 -> -127; 1 -> 32
    assert(q(0).getAs[scala.collection.Seq[Int]]("qvec").toSeq == Seq(64, -127, 32))
    assert(q(1).getAs[scala.collection.Seq[Int]]("qvec").toSeq == Seq(0, 0, 0))
    assert(q(1).getAs[Double]("qscale") == 0.0)
  }

  test("quantizeInt8 native expression is value-identical to the declarative baseline") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(2.0f, -4.0f, 1.0f, 0.5f)),
      (1L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(-0.1f, 0.3f, -0.7f, 0.70001f)),
      (3L, Seq[Float]()),
      (4L, Seq(1e-8f, -1e-8f, 5e-9f, 0.0f))).toDF("id", "vec")
    val native = Similarity.quantizeInt8(df, col("id"), col("vec"))
      .orderBy("id").collect().toSeq
    val decl = Similarity.quantizeInt8Declarative(df, col("id"), col("vec"))
      .orderBy("id").collect().toSeq
    native.zip(decl).foreach { case (n, d) =>
      assert(n.getAs[scala.collection.Seq[Int]]("qvec").toSeq ==
        d.getAs[scala.collection.Seq[Int]]("qvec").toSeq, s"qvec for id ${n.getLong(0)}")
      assert(n.getAs[Double]("qscale") == d.getAs[Double]("qscale"), s"qscale for id ${n.getLong(0)}")
    }
    // double input path too
    val dd = df.select(col("id"), col("vec").cast("array<double>").as("vec"))
    val nativeD = Similarity.quantizeInt8(dd, col("id"), col("vec"))
      .orderBy("id").collect().toSeq
    native.zip(nativeD).foreach { case (f, d) =>
      assert(f.getAs[scala.collection.Seq[Int]]("qvec").toSeq ==
        d.getAs[scala.collection.Seq[Int]]("qvec").toSeq)
    }
  }

  test("quantizedTopK agrees with bruteForceTopK on well-separated vectors") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(1.0f, 0.05f))).toDF("id", "vec")
    val exact = Similarity.bruteForceTopK(corpus.where(col("id") === 0), corpus, k = 2)
      .select("neighbor_id").as[Long].collect().toSet
    val quant = Similarity.quantizedTopK(corpus.where(col("id") === 0), corpus, k = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(quant == exact)
  }

  test("ivfTopK: bucket-restricted search still finds in-bucket neighbors") {
    import spark.implicits._
    // centroids = ids 0,1; cluster A near (1,0), cluster B near (0,1)
    val corpus = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
      (2L, Seq(0.99, 0.01)), (3L, Seq(0.98, 0.02)),
      (4L, Seq(0.01, 0.99)), (5L, Seq(0.02, 0.98))).toDF("id", "vec")
    val res = Similarity.ivfTopK(corpus.where(col("id") === 2), corpus, k = 2, nBuckets = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(res.subsetOf(Set(0L, 3L))) // same bucket as 2: {0,2,3}
    assert(res.size == 2)
  }

  test("ivfIndexAppend: serving base+batch equals a from-scratch index over the union") {
    import spark.implicits._
    // hash-derived 8-dim vectors; ids 0..39, batch = 30..39
    val all = (0L until 40L).map { i =>
      (i, (0 until 8).map(d => ((i * 31 + d * 17) % 13).toDouble - 6.0))
    }.toDF("id", "vec")
    val base = Similarity.ivfIndex(all.where(col("id") < 30), nBuckets = 4)
    val appended = Similarity.ivfIndexAppend(base, all.where(col("id") >= 30))
    val scratch = Similarity.ivfIndex(all, nBuckets = 4)
    val queries = all.where(col("id") < 6)
    def rows(ix: Similarity.IvfIndex) =
      Similarity.ivfTopKIndexed(queries, ix, k = 3)
        .orderBy("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(appended) == rows(scratch),
      "incremental append must serve exactly like a full rebuild")
    // the appended rows really are in the batch's buckets (ids 30+ present)
    import org.apache.spark.sql.functions.col
    assert(appended.assigned.where(col("neighbor_id") >= 30).count() == 10L)
  }

  test("ivfRetrainMoves/ivfApplyMoves: migrated index serves exactly like a rebuild") {
    import spark.implicits._
    val all = (0L until 40L).map { i =>
      (i, (0 until 8).map(d => ((i * 31 + d * 17) % 13).toDouble - 6.0))
    }.toDF("id", "vec")
    def centsOf(lo: Long, hi: Long) = all.where(col("id") >= lo && col("id") < hi)
      .select(col("id").as("cent_id"), col("vec").as("cent_v"))
    val index0raw = Similarity.ivfIndexWith(all, centsOf(0, 4))
    // production serves from a persisted/stored assigned table — pin
    // the move diff's plan against that shape, not the build lineage
    val index0 = index0raw.copy(assigned = index0raw.assigned.persist())
    index0.assigned.count()
    val newCents = centsOf(10, 14)
    val moves = Similarity.ivfRetrainMoves(index0, newCents)
    // the diff is map-only over the stored table: no exchange — the
    // new centroids enter as a plan literal
    assert(Scale.countShuffles(moves) == 0,
      moves.queryExecution.executedPlan.toString)
    val migrated = Similarity.ivfApplyMoves(index0, newCents, moves)
    val scratch = Similarity.ivfIndexWith(all, newCents)
    val queries = all.where(col("id") < 6)
    def rows(ix: Similarity.IvfIndex) =
      Similarity.ivfTopKIndexed(queries, ix, k = 3)
        .orderBy("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(migrated) == rows(scratch),
      "bucket migration must serve exactly like a full rebuild")
    // moves carry only rows whose bucket changed, and applying them
    // reproduces the scratch assignment table row-for-row
    val migratedAssign = migrated.assigned
      .collect().map(r => (r.getLong(1), r.getLong(0))).toMap
    val scratchAssign = scratch.assigned
      .collect().map(r => (r.getLong(1), r.getLong(0))).toMap
    assert(migratedAssign == scratchAssign)
    val oldAssign = index0.assigned
      .collect().map(r => (r.getLong(1), r.getLong(0))).toMap
    val moveRows = moves.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(moveRows.forall { case (id, ob, nb) =>
      oldAssign(id) == ob && scratchAssign(id) == nb && ob != nb })
    val changed = oldAssign.keySet.filter(id => oldAssign(id) != scratchAssign(id))
    assert(moveRows.map(_._1).toSet == changed, "diff covers exactly the changed rows")
    assert(changed.nonEmpty, "fixture must actually move some vectors")
    // application is broadcast-only on the moves side: no exchange of
    // the existing assignment table
    val applyPlan = migrated.assigned.queryExecution.executedPlan.toString
    assert(applyPlan.contains("BroadcastHashJoin"), applyPlan)
    assert(!applyPlan.contains("SortMergeJoin"), applyPlan)
  }

  test("ivfApplyMovesPartitioned: only affected bucket dirs rewritten; reads partition-prune") {
    import spark.implicits._
    // four axis-aligned clusters; cluster c rides axis c with a small
    // secondary component j on axis c+4. Old centroids: the four pure
    // axes. New centroids keep 0..2 and SPLIT cluster 3 with a tilted
    // 5th centroid that wins exactly the j >= 1 rows — so buckets
    // 0..2 are untouched by construction and the migration moves only
    // part of bucket 3 into the new bucket 4.
    val all = (0L until 32L).map { i =>
      val c = (i % 4).toInt; val j = ((i / 4) % 3).toInt
      val v = Array.fill(8)(0.0); v(c) = 10.0; v(c + 4) = j.toDouble
      (i, v.toSeq)
    }.toDF("id", "vec")
    def axis(k: Int, sec: Double = 0.0): Seq[Double] = {
      val v = Array.fill(8)(0.0); v(k) = 10.0; if (sec != 0.0) v(k + 4) = sec
      v.toSeq
    }
    val oldCents = Seq((0L, axis(0)), (1L, axis(1)), (2L, axis(2)), (3L, axis(3)))
      .toDF("cent_id", "cent_v")
    val newCents = Seq((0L, axis(0)), (1L, axis(1)), (2L, axis(2)),
      (3L, axis(3)), (4L, axis(3, sec = 2.0))).toDF("cent_id", "cent_v")
    val dir = java.nio.file.Files.createTempDirectory("ivf_part_spec").toString + "/idx"
    val stored = Similarity.ivfWritePartitioned(
      Similarity.ivfIndexWith(all, oldCents), dir)
    val moves = Similarity.ivfRetrainMoves(stored, newCents)
    val moveRows = moves.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(moveRows.nonEmpty, "fixture must move vectors")
    val affected = (moveRows.map(_._2) ++ moveRows.map(_._3)).toSet
    // partition pruning: the rewrite's read plan filters bucket dirs
    val prunedScan = spark.read.parquet(dir)
      .where(col("bucket").isin(affected.toSeq: _*))
    val scanPlan = prunedScan.queryExecution.executedPlan.toString
    assert(scanPlan.contains("PartitionFilters") && scanPlan.contains("bucket"), scanPlan)
    // file inventory of UNAFFECTED buckets before/after must be identical
    def listFiles(): Map[String, Long] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(_.getName.startsWith("bucket="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (d.getName + "/" + f.getName) -> f.lastModified()))
        .toMap
    }
    val before = listFiles()
    val migrated = Similarity.ivfApplyMovesPartitioned(spark, dir, newCents, moves)
    val after = listFiles()
    val untouchedBefore = before.filterNot { case (k, _) =>
      affected.exists(b => k.startsWith(s"bucket=$b/")) }
    val untouchedAfter = after.filterNot { case (k, _) =>
      affected.exists(b => k.startsWith(s"bucket=$b/")) }
    assert(untouchedBefore == untouchedAfter,
      s"unaffected bucket files must stay byte-identical:\n$untouchedBefore\nvs\n$untouchedAfter")
    assert(untouchedBefore.nonEmpty, "fixture must leave some bucket untouched")
    // storage migration serves exactly like a from-scratch rebuild
    val scratch = Similarity.ivfIndexWith(all, newCents)
    val queries = all.where(col("id") < 6)
    def rows(ix: Similarity.IvfIndex) =
      Similarity.ivfTopKIndexed(queries, ix, k = 3)
        .orderBy("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(migrated) == rows(scratch))
    // and the stored table's assignment equals the rebuilt one
    val migratedAssign = migrated.assigned
      .select("neighbor_id", "bucket").as[(Long, Long)].collect().toMap
    val scratchAssign = scratch.assigned
      .collect().map(r => (r.getLong(1), r.getLong(0))).toMap
    assert(migratedAssign == scratchAssign)
  }

  test("partitioned index serve: bucket join dynamically prunes the stored partitions") {
    import spark.implicits._
    val all = (0L until 64L).map { i =>
      (i, (0 until 8).map(d => ((i * 31 + d * 17) % 13).toDouble - 6.0))
    }.toDF("id", "vec")
    def centsOf(lo: Long, hi: Long) = all.where(col("id") >= lo && col("id") < hi)
      .select(col("id").as("cent_id"), col("vec").as("cent_v"))
    val dir = java.nio.file.Files.createTempDirectory("ivf_dpp_spec").toString + "/idx"
    val idx = Similarity.ivfWritePartitioned(
      Similarity.ivfIndexWith(all, centsOf(0, 8)), dir)
    val served = Similarity.ivfTopKIndexed(all.where(col("id") < 3), idx, k = 3)
    val plan = served.queryExecution.executedPlan.toString
    // the probe side broadcasts, and Spark inserts a dynamic partition
    // pruning subquery on the bucket partition column — serve-time I/O
    // is proportional to the PROBED buckets' files, not the index
    assert(plan.contains("dynamicpruning"), plan)
    assert(served.collect().nonEmpty)
  }

  test("ivfPqTopK: exact when rerank covers the bucket; ADC scan reads only codes; DPP prunes") {
    import spark.implicits._
    val all = (0L until 64L).map { i =>
      (i, (0 until 8).map(d => ((i * 31 + d * 17) % 13).toDouble - 6.0))
    }.toDF("id", "vec")
    val cents = all.where(col("id") < 8)
      .select(col("id").as("cent_id"), col("vec").as("cent_v"))
    val model = Clustering.pqTrain(all, col("id"), col("vec"), m = 4, k = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivf_pq_spec").toString + "/idx"
    val idx = Similarity.ivfPqWritePartitioned(all, cents, model, dir)
    val queries = all.where(col("id") < 5)
    // rerank >= every bucket's size -> the ADC cut is lossless and the
    // composed serve must equal the plain exact IVF serve row-for-row
    val served = Similarity.ivfPqTopK(spark, idx, queries, k = 3, nProbe = 1, rerank = 64)
    val plain = Similarity.ivfTopKIndexed(
      queries, Similarity.ivfIndexWith(all, cents), k = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(served) == rows(plain))
    val plan = served.queryExecution.executedPlan.toString
    // serve-time I/O is bounded by the PROBED buckets: the bucket join
    // against the broadcast probe side dynamically prunes partitions
    assert(plan.contains("dynamicpruning"), plan)
    // and the ADC stage's scan carries ONLY (neighbor_id, codes) — the
    // float vectors must not ride the candidate generation
    val adcScan = plan.split("\n").find(l =>
      l.contains("ReadSchema") && l.contains("codes"))
    assert(adcScan.isDefined, plan)
    assert(!adcScan.get.contains("c_vec"),
      s"ADC scan must not read exact vectors: ${adcScan.get}")
    // production shape: rerank smaller than the bucket still emits
    // exactly k rows per query (candidates are ADC-gated)
    val gated = Similarity.ivfPqTopK(spark, idx, queries, k = 3, nProbe = 1, rerank = 3)
    val perQuery = gated.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(perQuery.nonEmpty && perQuery.forall(_ == 3L))
  }

  test("ivfPqTopK residual (IVFADC): exact when rerank covers bucket; codes-only scan; " +
    "residual codes collapse cluster offsets raw codes can't") {
    import spark.implicits._
    // four far-apart clusters along axes 0..3 (offset 40), identical
    // WITHIN-cluster displacement pattern on axes 4..7: residuals are
    // the displacement alone, so the residual codebook sees a tight,
    // shared space while the raw codebook must also span the 40-unit
    // cluster offsets in subspace j=0..1
    val all = (0L until 32L).map { i =>
      val c = (i % 4).toInt; val j = ((i / 4) % 8).toInt
      val v = Array.fill(8)(0.0)
      v(c) = 40.0; v(4 + (j % 4)) = 1.0 + (j / 4).toDouble
      (i, v.toSeq)
    }.toDF("id", "vec")
    val cents = all.where(col("id") < 4)
      .select(col("id").as("cent_id"), col("vec").as("cent_v"))
    val resid = Similarity.ivfResiduals(all, cents)
    val modelRes = Clustering.pqTrain(resid, col("id"), col("vec"), m = 4, k = 4, iters = 1)
    val modelRaw = Clustering.pqTrain(all, col("id"), col("vec"), m = 4, k = 4, iters = 1)
    val dirRes = java.nio.file.Files.createTempDirectory("ivfadc_res").toString + "/idx"
    val dirRaw = java.nio.file.Files.createTempDirectory("ivfadc_raw").toString + "/idx"
    val idxRes = Similarity.ivfPqWritePartitioned(all, cents, modelRes, dirRes,
      residual = true)
    val idxRaw = Similarity.ivfPqWritePartitioned(all, cents, modelRaw, dirRaw)
    val queries = all.where(col("id") < 5)
    // lossless when rerank covers every bucket: the residual serve must
    // equal the plain exact IVF serve row-for-row, like the raw one
    val served = Similarity.ivfPqTopK(spark, idxRes, queries, k = 3, nProbe = 1, rerank = 32)
    val plain = Similarity.ivfTopKIndexed(
      queries, Similarity.ivfIndexWith(all, cents), k = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(served) == rows(plain))
    // same scale pins as the raw index: ADC scan reads only codes, DPP
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan)
    val adcScan = plan.split("\n").find(l =>
      l.contains("ReadSchema") && l.contains("codes"))
    assert(adcScan.isDefined && !adcScan.get.contains("c_vec"), adcScan.getOrElse(plan))
    // multi-probe residual serve: each (query, probed bucket) pair
    // LUTs its OWN per-bucket residual; with rerank covering both
    // probed buckets the result equals the exact 2-probe IVF serve
    val served2 = Similarity.ivfPqTopK(spark, idxRes, queries, k = 3, nProbe = 2, rerank = 64)
    val plain2 = Similarity.ivfTopKIndexed(
      queries, Similarity.ivfIndexWith(all, cents), k = 3, nProbe = 2)
    assert(rows(served2) == rows(plain2))
    // the residual trick is LIVE: vectors that share a within-cluster
    // displacement but sit in different buckets get the SAME residual
    // code word, while their raw codes differ in the cluster-offset
    // subspaces — the collapse that keeps m codes accurate at scale
    def codesOf(dir: String) = spark.read.parquet(dir)
      .select(col("neighbor_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val cRes = codesOf(dirRes); val cRaw = codesOf(dirRaw)
    // ids 4..7 are displacement j=1 in clusters 0..3
    val sameDisp = (4L to 7L).map(cRes)
    assert(sameDisp.distinct.size == 1,
      s"residual codes must collapse cross-bucket same-displacement vectors: $sameDisp")
    assert((4L to 7L).map(cRaw).distinct.size > 1,
      "raw codes must differ across buckets on this fixture (else the fixture is degenerate)")
  }

  test("ivfPqCompact on a residual index: layout-only rewrite, serve unchanged") {
    import spark.implicits._
    val all = (0L until 32L).map { i =>
      val c = (i % 4).toInt; val j = ((i / 4) % 8).toInt
      val v = Array.fill(8)(0.0)
      v(c) = 40.0; v(4 + (j % 4)) = 1.0 + (j / 4).toDouble
      (i, v.toSeq)
    }.toDF("id", "vec")
    val cents = all.where(col("id") < 4)
      .select(col("id").as("cent_id"), col("vec").as("cent_v"))
    val model = Clustering.pqTrain(
      Similarity.ivfResiduals(all, cents), col("id"), col("vec"), m = 4, k = 4, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivfadc_cmp").toString + "/idx"
    val idx0 = Similarity.ivfPqWritePartitioned(
      all.where(col("id") % 4 =!= 3), cents, model, dir, residual = true)
    Similarity.ivfPqAppend(idx0, all.where(col("id") % 4 === 3))
    val queries = all.where(col("id") < 5)
    def rows(ix: Similarity.IvfPqIndex) =
      Similarity.ivfPqTopK(spark, ix, queries, k = 3, nProbe = 1, rerank = 32)
        .orderBy("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val before = rows(idx0)
    val idx = Similarity.ivfPqCompact(spark, idx0)
    assert(idx.residual, "compact must preserve the residual flag")
    assert(rows(idx) == before, "compaction must not change the residual serve")
  }

  test("ivfPqAppend residual: appended rows encode residuals; serve equals from-scratch") {
    import spark.implicits._
    val all = (0L until 32L).map { i =>
      val c = (i % 4).toInt; val j = ((i / 4) % 8).toInt
      val v = Array.fill(8)(0.0)
      v(c) = 40.0; v(4 + (j % 4)) = 1.0 + (j / 4).toDouble
      (i, v.toSeq)
    }.toDF("id", "vec")
    val cents = all.where(col("id") < 4)
      .select(col("id").as("cent_id"), col("vec").as("cent_v"))
    val model = Clustering.pqTrain(
      Similarity.ivfResiduals(all, cents), col("id"), col("vec"), m = 4, k = 4, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivfadc_app").toString + "/idx"
    val dir2 = java.nio.file.Files.createTempDirectory("ivfadc_app2").toString + "/idx"
    val idx0 = Similarity.ivfPqWritePartitioned(
      all.where(col("id") % 4 =!= 3), cents, model, dir, residual = true)
    val idx = Similarity.ivfPqAppend(idx0, all.where(col("id") % 4 === 3))
    val scratch = Similarity.ivfPqWritePartitioned(all, cents, model, dir2,
      residual = true)
    val queries = all.where(col("id") < 5)
    def rows(ix: Similarity.IvfPqIndex) =
      Similarity.ivfPqTopK(spark, ix, queries, k = 3, nProbe = 1, rerank = 32)
        .orderBy("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(idx) == rows(scratch))
  }

  test("ivfPqAppend: existing files untouched, serve equals from-scratch union build") {
    import spark.implicits._
    val all = (0L until 64L).map { i =>
      (i, (0 until 8).map(d => ((i * 29 + d * 13) % 11).toDouble - 5.0))
    }.toDF("id", "vec")
    val cents = all.where(col("id") < 8)
      .select(col("id").as("cent_id"), col("vec").as("cent_v"))
    val model = Clustering.pqTrain(all, col("id"), col("vec"), m = 4, k = 8, iters = 1)
    val base = all.where(col("id") % 4 =!= 3)
    val batch = all.where(col("id") % 4 === 3)
    val dir = java.nio.file.Files.createTempDirectory("ivf_pq_app").toString + "/idx"
    val idx0 = Similarity.ivfPqWritePartitioned(base, cents, model, dir)
    def inventory(): Map[String, String] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(_.getName.startsWith("bucket="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
          val h = java.security.MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(f.toPath))
            .map("%02x".format(_)).mkString
          (d.getName + "/" + f.getName) -> h
        }).toMap
    }
    val before = inventory()
    val idx = Similarity.ivfPqAppend(idx0, batch)
    val after = inventory()
    // append-only storage: every pre-existing file survives byte-identical
    assert(before.forall { case (f, h) => after.get(f).contains(h) },
      "append must not rewrite existing files")
    assert(after.size > before.size, "append must add files")
    // serve equality with a from-scratch build over the union
    val scratchDir = java.nio.file.Files.createTempDirectory("ivf_pq_app2").toString + "/idx"
    val scratch = Similarity.ivfPqWritePartitioned(all, cents, model, scratchDir)
    val queries = all.where(col("id") < 5)
    def rows(ix: Similarity.IvfPqIndex) =
      Similarity.ivfPqTopK(spark, ix, queries, k = 3, nProbe = 1, rerank = 64)
        .orderBy("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(idx) == rows(scratch))
  }

  test("ivfPqDelete: untouched buckets byte-identical; serve equals from-scratch over survivors") {
    import spark.implicits._
    // vectors cluster tightly on the axis of (id % 4): bucket = id % 4
    // exactly, so deleting ids from clusters 0 and 1 only touches
    // those buckets and buckets 2..3 must survive byte-identical
    val all = (0L until 32L).map { i =>
      val c = (i % 4).toInt
      val v = Array.fill(8)(0.0); v(c) = 40.0; v(4 + (i % 4).toInt) = (i / 4).toDouble * 0.1
      (i, v.toSeq)
    }.toDF("id", "vec")
    val cents = all.where(col("id") < 4)
      .select(col("id").as("cent_id"), col("vec").as("cent_v"))
    val model = Clustering.pqTrain(all, col("id"), col("vec"), m = 4, k = 4, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_del").toString + "/idx"
    val idx = Similarity.ivfPqWritePartitioned(all, cents, model, dir)
    def inventory(): Map[String, String] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(_.getName.startsWith("bucket="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
          val h = java.security.MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(f.toPath))
            .map("%02x".format(_)).mkString
          (d.getName + "/" + f.getName) -> h
        }).toMap
    }
    val before = inventory()
    // delete ids 8 and 13 (buckets 0 and 1)
    val deletes = Seq(8L, 13L).toDF("id")
    Similarity.ivfPqDelete(spark, idx, deletes)
    val after = inventory()
    val untouched = before.filterNot { case (k, _) =>
      k.startsWith("bucket=0/") || k.startsWith("bucket=1/") }
    assert(untouched.nonEmpty, "fixture must leave buckets untouched")
    assert(untouched.forall { case (f, h) => after.get(f).contains(h) },
      "buckets without deleted rows must stay byte-identical")
    // deleted ids are gone from storage
    val remaining = spark.read.parquet(dir).select("neighbor_id")
      .collect().map(_.getLong(0)).toSet
    assert(!remaining.contains(8L) && !remaining.contains(13L))
    assert(remaining.size == 30)
    // serve equality with a from-scratch build over the survivors
    val dir2 = java.nio.file.Files.createTempDirectory("ivfpq_del2").toString + "/idx"
    val scratch = Similarity.ivfPqWritePartitioned(
      all.where(col("id") =!= 8L && col("id") =!= 13L), cents, model, dir2)
    val queries = all.where(col("id") < 5)
    def rows(ix: Similarity.IvfPqIndex) =
      Similarity.ivfPqTopK(spark, ix, queries, k = 3, nProbe = 1, rerank = 32)
        .orderBy("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(idx) == rows(scratch))
    // a delete that empties a bucket removes its directory
    val allBucket2 = all.where(col("id") % 4 === 2).select(col("id"))
    Similarity.ivfPqDelete(spark, idx, allBucket2)
    val dirs = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(!dirs.contains("bucket=2"), s"emptied bucket dir must be removed: $dirs")
    // delete is layout-level (codes opaque): the residual index
    // deletes identically — serve equals a residual scratch build
    // over the survivors
    val modelR = Clustering.pqTrain(
      Similarity.ivfResiduals(all, cents), col("id"), col("vec"), m = 4, k = 4, iters = 1)
    val dirR = java.nio.file.Files.createTempDirectory("ivfpq_del_r").toString + "/idx"
    val dirR2 = java.nio.file.Files.createTempDirectory("ivfpq_del_r2").toString + "/idx"
    val idxR = Similarity.ivfPqWritePartitioned(all, cents, modelR, dirR, residual = true)
    Similarity.ivfPqDelete(spark, idxR, deletes)
    val scratchR = Similarity.ivfPqWritePartitioned(
      all.where(col("id") =!= 8L && col("id") =!= 13L), cents, modelR, dirR2,
      residual = true)
    assert(rows(idxR) == rows(scratchR))
  }

  test("ivfPqCompact: one file per bucket after appends; serve unchanged") {
    import spark.implicits._
    val all = (0L until 64L).map { i =>
      (i, (0 until 8).map(d => ((i * 29 + d * 13) % 11).toDouble - 5.0))
    }.toDF("id", "vec")
    val cents = all.where(col("id") < 8)
      .select(col("id").as("cent_id"), col("vec").as("cent_v"))
    val model = Clustering.pqTrain(all, col("id"), col("vec"), m = 4, k = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivf_pq_cmp").toString + "/idx"
    val idx0 = Similarity.ivfPqWritePartitioned(
      all.where(col("id") % 4 =!= 3), cents, model, dir)
    Similarity.ivfPqAppend(idx0, all.where(col("id") % 4 === 3))
    def filesPerBucket(): Map[String, Int] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(_.getName.startsWith("bucket="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    }
    val queries = all.where(col("id") < 5)
    def rows(ix: Similarity.IvfPqIndex) =
      Similarity.ivfPqTopK(spark, ix, queries, k = 3, nProbe = 1, rerank = 64)
        .orderBy("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val beforeServe = rows(idx0)
    assert(filesPerBucket().values.exists(_ > 1),
      "append must have left a multi-file bucket for compaction to fix")
    val idx = Similarity.ivfPqCompact(spark, idx0)
    assert(filesPerBucket().values.forall(_ == 1),
      s"compaction must leave one file per bucket: ${filesPerBucket()}")
    assert(rows(idx) == beforeServe, "compaction must not change the serve")
  }

  test("binarySign/binaryTopK: hand-computed packing; lossless when rerank covers the corpus") {
    import spark.implicits._
    // hand-computed signature: dims 0,2,17 positive -> word0 = 1+4=5,
    // word1 = 2 (bit 1), words 2..3 = 0
    val v = (0 until 64).map { d =>
      if (d == 0 || d == 2 || d == 17) 1.0 else if (d == 5) 0.0 else -1.0
    }
    val sig = Seq(Tuple1(v)).toDF("vec")
      .select(Similarity.binarySign(col("vec"), 4).as("s"))
      .head().getSeq[Int](0).toList
    assert(sig == List(5, 2, 0, 0), s"got $sig")
    // hamming of the vector against its negation = number of set bits
    val vNeg = v.map(-_)
    val ham = Seq((v, vNeg)).toDF("a", "b")
      .select(Similarity.binaryHamming(
        Similarity.binarySign(col("a"), 4), Similarity.binarySign(col("b"), 4)).as("h"))
      .head().getInt(0)
    // negation flips the 3 positive bits off and turns 60 strict
    // negatives positive (the single zero stays zero on both sides)
    assert(ham == 63, s"got $ham")
    // rerank >= corpus: the hamming cut is lossless -> equals brute force
    val all = (0L until 24L).map { i =>
      (i, (0 until 64).map(d => ((i * 31 + d * 17) % 13).toDouble - 6.0))
    }.toDF("id", "vec")
    val queries = all.where(col("id") < 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(Similarity.binaryTopK(queries, all, k = 3, rerank = 24)) ==
      rows(Similarity.bruteForceTopK(queries, all, k = 3)))
    // gated: rerank < corpus still emits exactly k rows per query
    val gated = Similarity.binaryTopK(queries, all, k = 3, rerank = 5)
    val perQ = gated.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(perQ.nonEmpty && perQ.forall(_ == 3L))
  }

  test("vecProfile: counts NaN / null / zero-norm / dim-mismatch on a dirty fixture") {
    import spark.implicits._
    val rows: Seq[(Long, Option[Seq[Double]])] = Seq(
      (0L, Some(Seq(3.0, 4.0))),                  // norm 5 -> n6 5_000_000
      (1L, Some(Seq(0.0, 0.0))),                  // zero norm
      (2L, Some(Seq(Double.NaN, 1.0))),           // NaN element
      (3L, None),                                 // null vector
      (4L, Some(Seq(1.0, 0.0, 0.0)))              // dim 3 (mismatch), norm 1
    )
    val df = rows.toDF("id", "vec")
    val p = Similarity.vecProfile(df, col("vec")).head()
    assert(p.getLong(0) == 5, "n")
    assert(p.getLong(1) == 1, "n_null")
    assert(p.getLong(2) == 1, "n_nan")
    assert(p.getLong(3) == 1, "n_zero_norm")
    assert(p.getLong(4) == 2 && p.getLong(5) == 3, "dim min/max")
    assert(p.getLong(6) == 0L && p.getLong(7) == 5000000L, "norm6 min/max")
    assert(p.getLong(8) == 6000000L, "sum_norm6 = 0 + 5e6 + 1e6")
  }

  test("binaryTopKStored: candidate scan reads signatures only; equals the inline serve") {
    import spark.implicits._
    val all = (0L until 24L).map { i =>
      (i, (0 until 64).map(d => ((i * 31 + d * 17) % 13).toDouble - 6.0))
    }.toDF("id", "vec")
    val dir = java.nio.file.Files.createTempDirectory("binary_signed").toString + "/tbl"
    Similarity.binaryWriteSigned(all, dir)
    val queries = all.where(col("id") < 4)
    val served = Similarity.binaryTopKStored(spark, dir, queries, k = 3, rerank = 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(served) == rows(Similarity.binaryTopK(queries, all, k = 3, rerank = 5)))
    // the candidate stage's scan carries ONLY (id, s0..s3) — the float
    // vectors must not ride candidate generation
    val plan = served.queryExecution.executedPlan.toString
    val sigScan = plan.split("\n").find(l => l.contains("ReadSchema") && l.contains("s0"))
    assert(sigScan.isDefined, plan)
    assert(!sigScan.get.contains("vec"),
      s"signature scan must not read vectors: ${sigScan.get}")
  }

  test("matryoshkaTopK: lossless when rerank covers the corpus; prefix cut genuinely gates") {
    import spark.implicits._
    val all = (0L until 24L).map { i =>
      (i, (0 until 64).map(d => ((i * 29 + d * 13) % 11).toDouble - 5.0))
    }.toDF("id", "vec")
    val queries = all.where(col("id") < 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(Similarity.matryoshkaTopK(queries, all, k = 3, rerank = 24, dPrefix = 16)) ==
      rows(Similarity.bruteForceTopK(queries, all, k = 3)))
    val gated = Similarity.matryoshkaTopK(queries, all, k = 3, rerank = 5, dPrefix = 16)
    val perQ = gated.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(perQ.nonEmpty && perQ.forall(_ == 3L))
  }

  test("bitextMine: planted translations mine as mutual best; hub sentence loses on margin") {
    import spark.implicits._
    // three "languages-share-a-space" source vectors on axes 0..2 and
    // their planted translations (same axis, slightly rotated), plus a
    // HUB target that is moderately close to EVERYTHING (equal mass on
    // all axes) — raw cosine would pair sources with their planted
    // targets anyway here, but the hub's mutual-best is nobody, and
    // margin scoring keeps it out of every mutual pair
    def axis(k: Int, eps: Double): Seq[Double] = {
      val v = Array.fill(8)(eps); v(k) = 1.0; v.toSeq
    }
    val src = Seq(
      (0L, axis(0, 0.0)), (2L, axis(1, 0.0)), (4L, axis(2, 0.0))
    ).toDF("id", "vec")
    val tgt = Seq(
      (1L, axis(0, 0.05)), (3L, axis(1, 0.05)), (5L, axis(2, 0.05)),
      (7L, Seq.fill(8)(0.5)) // hub
    ).toDF("id", "vec")
    val mined = Similarity.bitextMine(src, tgt, k = 2)
      .orderBy("src_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSeq
    assert(mined == Seq((0L, 1L, true), (2L, 3L, true), (4L, 5L, true)),
      s"got $mined")
    // margin sanity: every emitted margin is positive and the planted
    // pair's margin strictly beats the hub's margin for that source
    val m = Similarity.bitextMine(src, tgt, k = 2)
    assert(m.collect().forall(_.getLong(2) > 0))
  }

  test("hardNegatives: same-label neighbors are excluded; all-distinct labels = bruteForceTopK") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // axis-ish vectors: 0,1 point one way (label 0); 2,3 the other (label 1)
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(0.9f, 0.1f), 0),
      (2L, Seq(0.0f, 1.0f), 1),
      (3L, Seq(0.1f, 0.9f), 1)).toDF("id", "vec", "label")
    val hn = Similarity.hardNegatives(vecs.where(col("id") === 0), vecs, k = 2)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._3).reverse
    // nearest different-label: id 3 (0.1, 0.9) beats id 2 (0.0, 1.0); id 1 excluded
    assert(hn.map(_._2) == Seq(3L, 2L))
    assert(!hn.map(_._2).contains(1L), "same-label neighbor must not appear")
    // with every label distinct the filter is only the self-exclusion
    val dl = vecs.withColumn("label", col("id").cast("int"))
    val a = Similarity.hardNegatives(dl.where(col("id") === 0), dl, k = 3)
      .as[(Long, Long, Double)].collect().toSet
    val b = Similarity.bruteForceTopK(
        dl.where(col("id") === 0).select("id", "vec"), dl.select("id", "vec"), k = 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(a == b)
  }

  test("tripletMining: hardest positive and negative per anchor; single-member labels drop") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(0.9f, 0.1f), 0),
      (2L, Seq(0.8f, 0.2f), 0),
      (3L, Seq(0.1f, 0.9f), 1),
      (4L, Seq(0.0f, 1.0f), 1),
      (5L, Seq(0.5f, 0.5f), 2)).toDF("id", "vec", "label")
    val out = Similarity.tripletMining(vecs, vecs)
      .orderBy("anchor_id")
      .as[(Long, Long, Double, Long, Double)].collect().toSeq
    // anchor 0: positive = 1 (closest same-label), negative = 5 (diagonal
    // is nearer to the x-axis than the y-ish label-1 vectors)
    val a0 = out.find(_._1 == 0L).get
    assert(a0._2 == 1L && a0._4 == 5L)
    assert(a0._3 > a0._5, "positive must outrank negative for separated clusters")
    // anchor 5 is label 2's only member: no positive -> dropped
    assert(!out.exists(_._1 == 5L))
    assert(out.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("topKRecall: full, partial, and zero overlap, floor per-mille") {
    import spark.implicits._
    val truth = Seq((0L, 10L), (0L, 11L), (0L, 12L),
      (1L, 20L), (1L, 21L), (1L, 22L),
      (2L, 30L), (2L, 31L)).toDF("query_id", "neighbor_id")
    val cand = Seq((0L, 10L), (0L, 11L), (0L, 12L), // all three
      (1L, 20L), (1L, 99L), (1L, 98L),              // one of three
      (2L, 97L), (2L, 96L)).toDF("query_id", "neighbor_id")
    val out = Similarity.topKRecall(truth, cand)
      .orderBy("query_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 3L, 3L, 1000L), (1L, 3L, 1L, 333L), (2L, 2L, 0L, 0L)))
  }

  test("topKRecall: exhaustive probing gives recall 1000 everywhere") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vecs = Seq.tabulate(60)(i =>
      (i.toLong, Seq.fill(4)(rnd.nextDouble()))).toDF("id", "vec")
    val qs = vecs.where(col("id") < 5)
    val truth = Similarity.bruteForceTopK(qs, vecs, k = 4)
    val cand = Similarity.ivfTopK(qs, vecs, k = 4, nBuckets = 6, nProbe = 6)
    val out = Similarity.topKRecall(truth, cand)
      .select("recall_per_mille").as[Long].collect().toSeq
    assert(out.size == 5 && out.forall(_ == 1000L))
  }

  test("ivfBalance: loads sum to nBuckets x 10^6 (up to floor) and match occupancy") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val vecs = Seq.tabulate(80)(i =>
      (i.toLong, Seq.fill(4)(rnd.nextDouble()))).toDF("id", "vec")
    val r = Similarity.ivfBalance(vecs, col("id"), col("vec"), nBuckets = 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r.map(_._2).sum == 80L)
    r.foreach { case (_, n, load) => assert(load == n * 4L * 1000000L / 80L) }
    // sanity vs the assignment itself
    val occ = Similarity.ivfAssign(vecs, col("id"), col("vec"), 4)
      .groupBy("bucket").count().as[(Long, Long)].collect().toMap
    assert(r.map(x => x._1 -> x._2).toMap == occ)
  }

  private def ivfPqFixture(tag: String) = {
    import spark.implicits._
    val all = (0L until 64L).map { i =>
      (i, (0 until 8).map(d => ((i * 31 + d * 17) % 13).toDouble - 6.0))
    }.toDF("id", "vec")
    val cents = all.where(col("id") < 8)
      .select(col("id").as("cent_id"), col("vec").as("cent_v"))
    val model = Clustering.pqTrain(all, col("id"), col("vec"), m = 4, k = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory(tag).toString + "/idx"
    (all, cents, model, dir)
  }

  private def serveRows(idx: Similarity.IvfPqIndex, queries: org.apache.spark.sql.DataFrame) =
    Similarity.ivfPqTopK(spark, idx, queries, k = 3, nProbe = 1, rerank = 64)
      .orderBy("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("ivfPqOpen: directory-only reopen serves exactly like the build-time handle") {
    val (all, cents, model, dir) = ivfPqFixture("ivfpq_open_spec")
    val idx = Similarity.ivfPqWritePartitioned(all, cents, model, dir)
    val m = Similarity.ivfPqManifestRead(spark, dir).get
    assert(m.formatVersion == Similarity.IvfPqFormatVersion
      && m.epoch == 0L && m.appendsSinceCompact == 0L
      && m.m == 4 && m.kCodes == 8 && m.dSub == 2 && !m.residual)
    val reopened = Similarity.ivfPqOpen(spark, dir)
    val queries = all.where(col("id") < 5)
    assert(serveRows(reopened, queries) == serveRows(idx, queries))
    // the underscore sidecars must stay invisible to the data scan
    assert(!spark.read.parquet(dir).columns.contains("cent_v"))
  }

  test("ivfPq guards fail loudly: foreign directory, wrong codebook, wrong flags") {
    val (all, cents, model, dir) = ivfPqFixture("ivfpq_guard_spec")
    val idx = Similarity.ivfPqWritePartitioned(all, cents, model, dir)
    val queries = all.where(col("id") < 3)
    // a directory with no manifest cannot be served or mutated
    val bare = idx.copy(path =
      java.nio.file.Files.createTempDirectory("ivfpq_bare").toString)
    val e1 = intercept[IllegalStateException](serveRows(bare, queries))
    assert(e1.getMessage.contains("_manifest.json"))
    // a handle carrying a DIFFERENT codebook must not ADC-rank the codes
    val otherModel = Clustering.pqTrain(
      all.where(col("id") % 2 === 0), col("id"), col("vec"), m = 4, k = 8, iters = 1)
    assume(otherModel.flatten.flatten.toSeq != model.flatten.flatten.toSeq)
    val e2 = intercept[IllegalArgumentException](
      serveRows(idx.copy(model = otherModel), queries))
    assert(e2.getMessage.contains("codebook"))
    // wrong residual flag / scale likewise
    val e3 = intercept[IllegalArgumentException](
      serveRows(idx.copy(residual = true), queries))
    assert(e3.getMessage.contains("residual"))
    val e4 = intercept[IllegalArgumentException](
      serveRows(idx.copy(fpScale = 2000.0), queries))
    assert(e4.getMessage.contains("fpScale"))
  }

  test("ivfPq manifest lifecycle: epoch bumps per mutation, compact resets the " +
      "append counter, maybeCompact fires only at the threshold, open survives it all") {
    val (all, cents, model, dir) = ivfPqFixture("ivfpq_lifecycle_spec")
    val base = all.where(col("id") % 4 =!= 3)
    val idx = Similarity.ivfPqWritePartitioned(base, cents, model, dir)
    Similarity.ivfPqAppend(idx, all.where(col("id") % 8 === 3))
    Similarity.ivfPqAppend(idx, all.where(col("id") % 8 === 7))
    val m2 = Similarity.ivfPqManifestRead(spark, dir).get
    assert(m2.epoch == 2L && m2.appendsSinceCompact == 2L)
    // below the threshold the trigger reads the manifest and stops
    assert(!Similarity.ivfPqMaybeCompact(spark, idx, maxAppendBatches = 3L))
    assert(Similarity.ivfPqManifestRead(spark, dir).get == m2)
    // at the threshold it compacts: epoch bumps, counter re-arms, and
    // the swapped root still carries cents + manifest (open works)
    assert(Similarity.ivfPqMaybeCompact(spark, idx, maxAppendBatches = 2L))
    val m3 = Similarity.ivfPqManifestRead(spark, dir).get
    assert(m3.epoch == 3L && m3.appendsSinceCompact == 0L)
    val queries = all.where(col("id") < 5)
    assert(serveRows(Similarity.ivfPqOpen(spark, dir), queries)
      == serveRows(idx, queries))
    // delete bumps the epoch too (commit marker after the swaps)
    Similarity.ivfPqDelete(spark, idx, all.where(col("id") % 7 === 2).select(col("id")))
    assert(Similarity.ivfPqManifestRead(spark, dir).get.epoch == 4L)
  }
}
