package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The PERSISTED k-NN graph index (q273/q275/q276): write/read
  * roundtrip, batch-proportional append against the stored anchor
  * table, partition-scoped delete — with the same storage-discipline
  * pins as the composed IVF×PQ family (untouched partitions
  * byte-identical, staged rewrites, exact equality with the in-memory
  * lifecycle ops).
  */
class KnnGraphStoreSpec extends SparkTestBase {

  private def gaussians(n: Int, seed: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("id", "vec")
  }

  private def graphRows(df: org.apache.spark.sql.DataFrame) =
    df.select("node_id", "nb_rank", "neighbor_id", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def edgeFiles(idx: Similarity.KnnGraphIndex): Map[String, (Long, Long)] = {
    val root = new java.io.File(idx.edgesPath)
    root.listFiles().filter(_.getName.startsWith("part="))
      .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (d.getName + "/" + f.getName) -> (f.length(), f.lastModified())))
      .toMap
  }

  test("knnGraphWritePartitioned/ReadEdges roundtrip: stored graph equals the built graph") {
    val corpus = gaussians(80, 31L)
    val g = Similarity.knnGraphBuild(corpus, k = 4, rounds = 2,
      revCap = 12, lshBits = 2, lshTables = 2)
    val dir = java.nio.file.Files.createTempDirectory("knn_store_spec").toString + "/idx"
    val idx = Similarity.knnGraphWritePartitioned(spark, g, corpus, dir,
      parts = 4, k = 4, lshBits = 2, lshTables = 2, anchorsPerBucket = 12)
    assert(graphRows(Similarity.knnGraphReadEdges(spark, idx)) == graphRows(g))
    // one file per partition (deterministic bytes), anchors present
    val perPart = edgeFiles(idx).keys.groupBy(_.split("/")(0)).view.mapValues(_.size)
    assert(perPart.values.forall(_ == 1), s"one file per partition expected: $perPart")
    val anch = spark.read.parquet(idx.anchorsPath)
    assert(anch.columns.toSeq == Seq("tb", "bkt", "id") && anch.count() > 0)
  }

  test("anchor top-k algebra: stored-cut ∪ batch signatures reproduces full-corpus anchors") {
    val all = gaussians(120, 37L)
    val old = all.where(col("id") % 5 =!= 4)
    val oldAnch = Similarity.knnLshAnchorsOf(
      Similarity.knnLshSignatures(old, 3, 2), 6)
    val newSig = Similarity.knnLshSignatures(all.where(col("id") % 5 === 4), 3, 2)
    val merged = Similarity.knnLshAnchorsOf(
      oldAnch.select(col("tb"), col("bkt"), col("id"))
        .union(newSig.select(col("tb"), col("bkt"), col("id"))), 6)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    val full = Similarity.knnLshAnchorsOf(
      Similarity.knnLshSignatures(all, 3, 2), 6)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    assert(merged == full, "merged anchor cut must equal the full-corpus cut")
  }

  test("knnGraphAppendPartitioned: equals in-memory append; untouched partitions byte-identical") {
    val all = gaussians(100, 41L)
    val old = all.where(col("id") % 5 =!= 4)
    val g0 = Similarity.knnGraphBuild(old, k = 4, rounds = 2,
      revCap = 12, lshBits = 2, lshTables = 2)
    val dir = java.nio.file.Files.createTempDirectory("knn_store_app").toString + "/idx"
    val idx = Similarity.knnGraphWritePartitioned(spark, g0, old, dir,
      parts = 8, k = 4, lshBits = 2, lshTables = 2, anchorsPerBucket = 12)
    val before = edgeFiles(idx)
    // in-memory reference over the SAME stored base graph
    val expect = graphRows(Similarity.knnGraphAppend(
      Similarity.knnGraphReadEdges(spark, idx), all, col("id") % 5 === 4,
      k = 4, lshBits = 2, lshTables = 2, anchorsPerBucket = 12))
    val (touched, _, _) = Similarity.knnGraphAppendParts(
      Similarity.knnGraphReadEdges(spark, idx), all, col("id") % 5 === 4,
      k = 4, lshBits = 2, lshTables = 2, anchorsPerBucket = 12,
      oldAnchors = Some(spark.read.parquet(idx.anchorsPath)))
    val touchedParts = touched.select(pmod(col("node_id"), lit(8L)))
      .distinct().collect().map(_.getLong(0)).toSet
    Similarity.knnGraphAppendPartitioned(spark, idx, all, col("id") % 5 === 4)
    assert(graphRows(Similarity.knnGraphReadEdges(spark, idx)) == expect,
      "stored append must equal the in-memory append")
    val after = edgeFiles(idx)
    val untouchedBefore = before.filterNot { case (kk, _) =>
      touchedParts.exists(p => kk.startsWith(s"part=$p/")) }
    val untouchedAfter = after.filterNot { case (kk, _) =>
      touchedParts.exists(p => kk.startsWith(s"part=$p/")) }
    assert(untouchedBefore == untouchedAfter,
      s"untouched partitions must stay byte-identical:\n$untouchedBefore\nvs\n$untouchedAfter")
    // anchors advanced to the full-corpus cut (stored at anchorDepth =
    // 2A — the delete-slack band rides along)
    val storedAnch = spark.read.parquet(idx.anchorsPath)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val fullAnch = Similarity.knnLshAnchorsOf(
        Similarity.knnLshSignatures(all, 2, 2), idx.anchorDepth)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(storedAnch == fullAnch, "stored anchors must equal the full-corpus deep cut")
  }

  test("append with zero seed proposals still merges the batch into the stored anchors") {
    import spark.implicits._
    // old corpus: all-positive 4-dim vectors — every node lands in the
    // all-ones bucket of both tables; the arriving node is all-negative
    // and lands ALONE in bucket 0, so it seeds zero proposals
    val old = (0L until 6L).map(i => (i, Seq(1f, 2f, 3f, 4f))).toDF("id", "vec")
    val arrive = Seq((100L, Seq(-1f, -2f, -3f, -4f))).toDF("id", "vec")
    val all = old.union(arrive)
    val g0 = Similarity.knnGraphBuild(old, k = 2, rounds = 1,
      revCap = 2, lshBits = 2, lshTables = 2)
    val dir = java.nio.file.Files.createTempDirectory("knn_store_zero").toString + "/idx"
    val idx = Similarity.knnGraphWritePartitioned(spark, g0, old, dir,
      parts = 4, k = 2, lshBits = 2, lshTables = 2, anchorsPerBucket = 4)
    val before = edgeFiles(idx)
    val (touched, _, _) = Similarity.knnGraphAppendParts(
      Similarity.knnGraphReadEdges(spark, idx), all, col("id") === 100L,
      k = 2, lshBits = 2, lshTables = 2, anchorsPerBucket = 4,
      oldAnchors = Some(spark.read.parquet(idx.anchorsPath)))
    assert(touched.count() == 0, "the crafted batch must produce zero proposals")
    Similarity.knnGraphAppendPartitioned(spark, idx, all, col("id") === 100L)
    // edges untouched (no proposals), but the anchors MUST advance to
    // the full-corpus cut — without it, the NEXT arrival into bucket 0
    // would never see node 100 and the append algebra's exactness dies
    assert(edgeFiles(idx) == before, "no edge partition may be rewritten")
    val storedAnch = spark.read.parquet(idx.anchorsPath)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val fullAnch = Similarity.knnLshAnchorsOf(
        Similarity.knnLshSignatures(all, 2, 2), idx.anchorDepth)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(storedAnch == fullAnch,
      "a zero-proposal batch must still merge its signatures into the stored cut")
    assert(storedAnch.exists(_._3 == 100L), "the arriving node must be an anchor now")
    // and the NEXT all-negative arrival seeds against node 100 through
    // the stored table — the exactness the anchor merge protects
    val all2 = all.union(Seq((101L, Seq(-2f, -1f, -4f, -3f))).toDF("id", "vec"))
    Similarity.knnGraphAppendPartitioned(spark, idx, all2, col("id") === 101L)
    val edges = Similarity.knnGraphReadEdges(spark, idx)
      .where(col("node_id") === 101L).collect()
    assert(edges.exists(_.getLong(2) == 100L),
      "the second arrival must find the first through the stored anchors")
  }

  test("append merge windows only touched nodes: untouched rows ride a window-free branch") {
    val all = gaussians(100, 43L)
    val old = all.where(col("id") % 5 =!= 4)
    val g0 = Similarity.knnGraphBuild(old, k = 4, rounds = 2,
      revCap = 12, lshBits = 2, lshTables = 2)
    val oldAnch = Similarity.knnLshAnchorsOf(
      Similarity.knnLshSignatures(old, 2, 2), 12)
    val (_, touchedRows, allRows) = Similarity.knnGraphAppendParts(
      g0, all, col("id") % 5 === 4, k = 4, lshBits = 2, lshTables = 2,
      anchorsPerBucket = 12, oldAnchors = Some(oldAnch))
    // the touched branch re-ranks via the bounded topk_pairs aggregate
    // (r18: the nb_rank ranking window became a map-side-truncating
    // aggregate) behind a LeftSemi restriction
    val touchedPlan = touchedRows.queryExecution.optimizedPlan.toString
    assert(touchedPlan.contains("topk_pairs") && touchedPlan.contains("LeftSemi"),
      s"touched branch must topk_pairs behind a semi-join:\n$touchedPlan")
    // the untouched passthrough contributes NO re-rank at all, so the
    // merge's rank input is touched-sized, not N·k
    val full = allRows.queryExecution.optimizedPlan.toString
    assert(full.contains("LeftAnti"),
      s"untouched rows must pass through behind an anti-join:\n$full")
    // zero ranking windows anywhere — the one re-rank is the touched
    // branch's topk_pairs aggregate; no branch re-ranks the full N·k
    // graph (and no branch windows at all)
    val rankWindows = full.linesIterator
      .count(l => l.contains("Window [") && l.contains("AS nb_rank"))
    assert(rankWindows == 0 && full.contains("topk_pairs"),
      s"expected zero nb_rank Windows and a topk_pairs re-rank, got $rankWindows:\n$full")
  }

  test("knnGraphWriteLayer/ReadLayer: stored layered serve equals the in-memory layered serve") {
    val corpus = gaussians(120, 53L)
    val layers = Similarity.knnGraphBuildLayers(corpus, k = 4, levels = 1,
      layerFactor = 8, rounds = 2, revCap = 12, lshBits = 2, lshTables = 2)
    val dir = java.nio.file.Files.createTempDirectory("knn_store_layer").toString + "/idx"
    val idx = Similarity.knnGraphWritePartitioned(spark, layers(1), corpus, dir,
      parts = 4, k = 4, lshBits = 2, lshTables = 2, anchorsPerBucket = 12)
    Similarity.knnGraphWriteLayer(spark, idx, level = 1, layers.head,
      corpus.where(Similarity.knnLayerMemberFilter(col("id"), 1, 8)))
    // layer roundtrip
    assert(graphRows(Similarity.knnGraphReadLayer(spark, idx, 1)) ==
      graphRows(layers.head))
    // stored hierarchical serve == in-memory hierarchical serve
    val queries = corpus.where(col("id") < 5)
    def served(ls: Seq[org.apache.spark.sql.DataFrame]) =
      Similarity.knnGraphServeLayered(queries, ls, corpus,
          k = 3, beam = 6, hopsPerLayer = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, -t._3, t._2)).toSeq
    assert(served(Seq(
        Similarity.knnGraphReadLayer(spark, idx, 1),
        Similarity.knnGraphReadEdges(spark, idx))) == served(layers),
      "stored layered serve must equal the in-memory layered serve")
  }

  test("knnGraphDeletePartitioned: equals in-memory delete; untouched partitions byte-identical") {
    val all = gaussians(100, 47L)
    val g0 = Similarity.knnGraphBuild(all, k = 4, rounds = 2,
      revCap = 12, lshBits = 2, lshTables = 2)
    val dir = java.nio.file.Files.createTempDirectory("knn_store_del").toString + "/idx"
    val idx = Similarity.knnGraphWritePartitioned(spark, g0, all, dir,
      parts = 8, k = 4, lshBits = 2, lshTables = 2, anchorsPerBucket = 12)
    val before = edgeFiles(idx)
    val expect = graphRows(Similarity.knnGraphDelete(
      Similarity.knnGraphReadEdges(spark, idx), all, col("id") % 7 === 3, k = 4))
    val (changed, _, _) = Similarity.knnGraphDeleteParts(
      Similarity.knnGraphReadEdges(spark, idx), all, col("id") % 7 === 3, k = 4)
    val changedParts = changed.select(pmod(col("node_id"), lit(8L)))
      .distinct().collect().map(_.getLong(0)).toSet
    Similarity.knnGraphDeletePartitioned(spark, idx, all, col("id") % 7 === 3)
    assert(graphRows(Similarity.knnGraphReadEdges(spark, idx)) == expect,
      "stored delete must equal the in-memory delete")
    val after = edgeFiles(idx)
    val untouchedBefore = before.filterNot { case (kk, _) =>
      changedParts.exists(p => kk.startsWith(s"part=$p/")) }
    val untouchedAfter = after.filterNot { case (kk, _) =>
      changedParts.exists(p => kk.startsWith(s"part=$p/")) }
    assert(untouchedBefore == untouchedAfter,
      s"untouched partitions must stay byte-identical:\n$untouchedBefore\nvs\n$untouchedAfter")
    // anchors recut to the survivor corpus's deep cut — via the
    // batch-proportional stored-table path, which must EQUAL the
    // from-scratch recompute
    val storedAnch = spark.read.parquet(idx.anchorsPath)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val survAnch = Similarity.knnLshAnchorsOf(
        Similarity.knnLshSignatures(all.where(col("id") % 7 =!= 3), 2, 2),
        idx.anchorDepth)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(storedAnch == survAnch, "anchors must equal the survivor-corpus deep cut")
  }

  test("knnGraphWriteBinary: read-back equals parquet edges; rerun byte-stable; format invariants") {
    val corpus = gaussians(100, 67L)
    val g = Similarity.knnGraphBuild(corpus, k = 4, rounds = 2,
      revCap = 12, lshBits = 2, lshTables = 2)
    val dir = java.nio.file.Files.createTempDirectory("knn_bin_spec").toString + "/idx"
    val idx = Similarity.knnGraphWritePartitioned(spark, g, corpus, dir,
      parts = 4, k = 4, lshBits = 2, lshTables = 2, anchorsPerBucket = 12)
    Similarity.knnGraphWriteBinary(spark, idx)
    // certification: binary read-back == parquet edges row-for-row
    assert(graphRows(Similarity.knnGraphReadBinary(spark, idx)) ==
      graphRows(Similarity.knnGraphReadEdges(spark, idx)))
    def fileBytes(): Map[String, Seq[Byte]] = {
      val root = new java.io.File(s"${idx.path}/edges_bin")
      root.listFiles().filter(_.getName.endsWith(".knng"))
        .map(f => f.getName ->
          java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    }
    val first = fileBytes()
    assert(first.nonEmpty)
    // rerun byte-stability: same logical graph -> identical bytes
    Similarity.knnGraphWriteBinary(spark, idx)
    assert(fileBytes() == first, "rewriting the same graph must reproduce identical bytes")
    // format invariants: magic, version, ascending binary-searchable
    // node ids, offsets contiguous from 0
    first.values.foreach { bs =>
      val buf = java.nio.ByteBuffer.wrap(bs.toArray)
      assert(buf.getInt() == 0x474B4E4E && buf.getInt() == 1)
      val n = buf.getInt()
      var prevId = Long.MinValue; var expectFirst = 0L
      (0 until n).foreach { _ =>
        val id = buf.getLong(); val firstEdge = buf.getLong(); val cnt = buf.getInt()
        assert(id > prevId, "node ids must ascend (binary-searchable)")
        assert(firstEdge == expectFirst, "edge runs must be contiguous")
        prevId = id; expectFirst = firstEdge + cnt
      }
      assert(bs.length == 12 + n * 20 + expectFirst * 16, "fixed-width layout")
    }
  }

  test("binary hierarchy tier: layer + entries certify against parquet, serve equal, " +
      "byte-stable, invalidated by mutation") {
    val all = gaussians(160, 71L)
    val member1 = Similarity.knnLayerMemberFilter(col("id"), 1, 2)
    val g = Similarity.knnGraphBuild(all, k = 4, rounds = 2,
      revCap = 12, lshBits = 2, lshTables = 2)
    val dir = java.nio.file.Files.createTempDirectory("knn_binhier_spec").toString + "/idx"
    val idx = Similarity.knnGraphWritePartitioned(spark, g, all, dir,
      parts = 4, k = 4, lshBits = 2, lshTables = 2, anchorsPerBucket = 12,
      layerFactor = 2)
    val gl1 = Similarity.knnGraphBuild(all.where(member1), k = 4, rounds = 2,
      revCap = 12, lshBits = 2, lshTables = 2)
    Similarity.knnGraphWriteLayer(spark, idx, 1, gl1, all.where(member1))
    Similarity.knnGraphWriteBinary(spark, idx)
    Similarity.knnGraphWriteBinaryLayer(spark, idx, 1)
    Similarity.knnGraphWriteBinaryEntries(spark, idx)
    // certification: layer binary == layer parquet; entries == the
    // top layer's node set
    assert(graphRows(Similarity.knnGraphReadBinaryLayer(spark, idx, 1)) ==
      graphRows(Similarity.knnGraphReadLayer(spark, idx, 1)))
    val entries = Similarity.knnGraphReadBinaryEntries(spark, idx)
      .collect().map(_.getLong(0)).toSeq
    val expectEntries = Similarity.knnGraphReadLayer(spark, idx, 1)
      .select("node_id").distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(entries == expectEntries, "entry file must hold the top layer's node set, ascending")
    // the SHIPPING serve path off the binary tier equals the parquet serve
    val queries = all.where(col("id") < 4)
    def served(layers: Seq[org.apache.spark.sql.DataFrame]) =
      Similarity.knnGraphServeLayered(queries, layers, all,
          k = 3, beam = 6, hopsPerLayer = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._3, t._2)).toSeq
    assert(
      served(Seq(Similarity.knnGraphReadBinaryLayer(spark, idx, 1),
        Similarity.knnGraphReadBinary(spark, idx))) ==
      served(Seq(Similarity.knnGraphReadLayer(spark, idx, 1),
        Similarity.knnGraphReadEdges(spark, idx))),
      "layered serve off the binary tier must equal the parquet serve")
    // rerun byte-stability for the hierarchy files
    def bytesOf(p: String) = {
      val f = new java.io.File(p)
      f.listFiles().map(x => x.getName ->
        java.nio.file.Files.readAllBytes(x.toPath).toSeq).toMap
    }
    val lb = bytesOf(s"${idx.path}/layer1/edges_bin")
    val eb = bytesOf(s"${idx.path}/entries_bin")
    Similarity.knnGraphWriteBinaryLayer(spark, idx, 1)
    Similarity.knnGraphWriteBinaryEntries(spark, idx)
    assert(bytesOf(s"${idx.path}/layer1/edges_bin") == lb
      && bytesOf(s"${idx.path}/entries_bin") == eb,
      "rewriting the same hierarchy must reproduce identical bytes")
    // a lifecycle mutation drops the layer binary AND the entry list
    // (the entry SET can change under a top-layer append)
    val all2 = all.union(gaussians(200, 72L).where(col("id") >= 160))
    Similarity.knnGraphAppendPartitioned(spark, idx, all2, col("id") >= 160)
    assert(!new java.io.File(s"${idx.path}/layer1/edges_bin").exists()
      && !new java.io.File(s"${idx.path}/entries_bin").exists(),
      "mutations must invalidate the binary hierarchy tier")
  }

  test("lifecycle maintains persisted layers: append/delete mutate each layer's slice") {
    val all = gaussians(160, 61L)
    val member1 = Similarity.knnLayerMemberFilter(col("id"), 1, 2)
    val old = all.where(col("id") % 5 =!= 4)
    // layered store over the OLD corpus (layerFactor 2 keeps the layer
    // populated at spec scale)
    val g0 = Similarity.knnGraphBuild(old, k = 4, rounds = 2,
      revCap = 12, lshBits = 2, lshTables = 2)
    val l0 = Similarity.knnGraphBuild(old.where(member1), k = 4, rounds = 2,
      revCap = 12, lshBits = 2, lshTables = 2)
    val dir = java.nio.file.Files.createTempDirectory("knn_store_hier").toString + "/idx"
    val idx = Similarity.knnGraphWritePartitioned(spark, g0, old, dir,
      parts = 8, k = 4, lshBits = 2, lshTables = 2, anchorsPerBucket = 12,
      layerFactor = 2)
    Similarity.knnGraphWriteLayer(spark, idx, level = 1, l0, old.where(member1))
    assert(Similarity.knnGraphLayerLevels(spark, idx) == Seq(1))

    def layerFiles(level: Int): Map[String, (Long, Long)] = {
      val root = new java.io.File(idx.layerEdgesPath(level))
      root.listFiles().filter(_.getName.startsWith("part="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (d.getName + "/" + f.getName) -> (f.length(), f.lastModified())))
        .toMap
    }
    val layerBefore = layerFiles(1)

    // in-memory references computed over the SAME stored tables
    val expectBase = graphRows(Similarity.knnGraphAppend(
      Similarity.knnGraphReadEdges(spark, idx), all, col("id") % 5 === 4,
      k = 4, lshBits = 2, lshTables = 2, anchorsPerBucket = 12))
    val expectLayer = graphRows(Similarity.knnGraphAppend(
      Similarity.knnGraphReadLayer(spark, idx, 1), all.where(member1),
      col("id") % 5 === 4, k = 4, lshBits = 2, lshTables = 2,
      anchorsPerBucket = 12))
    val (touchedL, _, _) = Similarity.knnGraphAppendParts(
      Similarity.knnGraphReadLayer(spark, idx, 1), all.where(member1),
      col("id") % 5 === 4, k = 4, lshBits = 2, lshTables = 2,
      anchorsPerBucket = 12,
      oldAnchors = Some(spark.read.parquet(idx.layerAnchorsPath(1))))
    val touchedLParts = touchedL.select(pmod(col("node_id"), lit(8L)))
      .distinct().collect().map(_.getLong(0)).toSet

    Similarity.knnGraphAppendPartitioned(spark, idx, all, col("id") % 5 === 4)
    assert(graphRows(Similarity.knnGraphReadEdges(spark, idx)) == expectBase,
      "stored base append must equal the in-memory append")
    assert(graphRows(Similarity.knnGraphReadLayer(spark, idx, 1)) == expectLayer,
      "stored layer append must equal the in-memory layer-slice append")
    // untouched LAYER partitions byte-identical
    val layerAfter = layerFiles(1)
    val lb = layerBefore.filterNot { case (kk, _) =>
      touchedLParts.exists(p => kk.startsWith(s"part=$p/")) }
    val la = layerAfter.filterNot { case (kk, _) =>
      touchedLParts.exists(p => kk.startsWith(s"part=$p/")) }
    assert(lb == la, s"untouched layer partitions must stay byte-identical:\n$lb\nvs\n$la")
    // layer anchors advanced to the layer corpus's deep cut
    val layerAnch = spark.read.parquet(idx.layerAnchorsPath(1))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val expectAnch = Similarity.knnLshAnchorsOf(
        Similarity.knnLshSignatures(all.where(member1), 2, 2), idx.anchorDepth)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(layerAnch == expectAnch,
      "layer anchors must equal the layer corpus's deep cut")

    // DELETE: tombstones drop from the layer too
    val expectBaseD = graphRows(Similarity.knnGraphDelete(
      Similarity.knnGraphReadEdges(spark, idx), all, col("id") % 7 === 3, k = 4))
    val expectLayerD = graphRows(Similarity.knnGraphDelete(
      Similarity.knnGraphReadLayer(spark, idx, 1), all.where(member1),
      col("id") % 7 === 3, k = 4))
    Similarity.knnGraphDeletePartitioned(spark, idx, all, col("id") % 7 === 3)
    assert(graphRows(Similarity.knnGraphReadEdges(spark, idx)) == expectBaseD,
      "stored base delete must equal the in-memory delete")
    assert(graphRows(Similarity.knnGraphReadLayer(spark, idx, 1)) == expectLayerD,
      "stored layer delete must equal the in-memory layer-slice delete")
    // no tombstone survives in any layer (tombstoned entries were the
    // staleness ADVICE flagged)
    val tombs = (0L until 160L).filter(_ % 7 == 3).toSet
    val layerIds = Similarity.knnGraphReadLayer(spark, idx, 1)
      .select("node_id").collect().map(_.getLong(0)).toSet
    assert(layerIds.intersect(tombs).isEmpty, "no tombstoned node may own layer rows")
  }

  test("delete anchor recut is batch-proportional: no signature scan unless a bucket exhausts") {
    val all = gaussians(100, 59L)
    val depth = 8
    val stored = Similarity.knnLshAnchorsOf(
      Similarity.knnLshSignatures(all, 2, 2), depth)
    // small delete of a BEYOND-the-cut member (a tombstone outside the
    // stored rows never exhausts a bucket — the common small-delete
    // shape): no bucket re-signs
    val anchorIds = stored.select("id").collect().map(_.getLong(0)).toSet
    val tombId = (0L until 100L).find(!anchorIds.contains(_)).get
    val (cut, resigned) = Similarity.knnGraphDeleteAnchorRecut(
      stored, all, col("id") === tombId, lshBits = 2, lshTables = 2, depth = depth)
    assert(resigned.isEmpty, s"small delete must not re-sign any bucket: $resigned")
    // the returned plan reads the corpus only for tombstone ids — no
    // vector column, no signature arithmetic anywhere in it
    val plan = cut.queryExecution.optimizedPlan.toString
    assert(!plan.contains("vec"),
      s"no-resign recut must not touch the vector column:\n$plan")
    val expect = Similarity.knnLshAnchorsOf(
        Similarity.knnLshSignatures(all.where(col("id") =!= tombId), 2, 2), depth)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(cut.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      == expect, "stored-table recut must equal the survivor-corpus recompute")
    // a stored-member tombstone in a NON-saturated bucket also stays
    // on the no-resign path — the stored rows are the whole bucket
    val bucketSizes = stored.groupBy("tb", "bkt").count().collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    // signature schema is (tb, id, bkt)
    val sigAll = Similarity.knnLshSignatures(all, 2, 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val safeTomb = sigAll.groupBy(_._2).collectFirst {
      case (id, rows) if rows.forall { case (t, _, b) =>
        bucketSizes.getOrElse((t, b), 0L) < depth } => id
    }
    safeTomb.foreach { id =>
      val (cutS, resignedS) = Similarity.knnGraphDeleteAnchorRecut(
        stored, all, col("id") === id, lshBits = 2, lshTables = 2, depth = depth)
      assert(resignedS.isEmpty, "complete-bucket member delete must not re-sign")
      val expectS = Similarity.knnLshAnchorsOf(
          Similarity.knnLshSignatures(all.where(col("id") =!= id), 2, 2), depth)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(cutS.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
        == expectS)
    }
    // exhaustion: depth 4 and a delete wide enough to empty the slack
    // band of some saturated bucket — those buckets re-sign (here: all
    // of them — the mass-delete shortcut path), and the result STILL
    // equals the from-scratch recompute
    val shallow = Similarity.knnLshAnchorsOf(
      Similarity.knnLshSignatures(all, 2, 2), 4)
    val (cut2, resigned2) = Similarity.knnGraphDeleteAnchorRecut(
      shallow, all, col("id") % 3 =!= 1, lshBits = 2, lshTables = 2, depth = 4)
    assert(resigned2.nonEmpty, "a mass delete against a shallow cut must re-sign")
    val expect2 = Similarity.knnLshAnchorsOf(
        Similarity.knnLshSignatures(all.where(col("id") % 3 === 1), 2, 2), 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(cut2.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      == expect2, "re-signed recut must equal the survivor-corpus recompute")
    // targeted exhaustion: tombstone ONE stored member of a saturated
    // bucket — only that id's buckets re-sign (the small-resign isin
    // path), equality again
    val shallowRows = shallow.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val satBuckets = shallowRows.groupBy(r => (r._1, r._2))
      .collect { case (kk, rows) if rows.length == 4 => kk }.toSet
    val target = shallowRows.collectFirst {
      case (t, b, id) if satBuckets.contains((t, b)) => id }.get
    val (cut3, resigned3) = Similarity.knnGraphDeleteAnchorRecut(
      shallow, all, col("id") === target, lshBits = 2, lshTables = 2, depth = 4)
    assert(resigned3.nonEmpty && resigned3.size <= 2,
      s"one stored tombstone must re-sign only its own saturated buckets: $resigned3")
    val expect3 = Similarity.knnLshAnchorsOf(
        Similarity.knnLshSignatures(all.where(col("id") =!= target), 2, 2), 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(cut3.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      == expect3, "small-resign recut must equal the survivor-corpus recompute")
  }

  test("manifest: build/append/delete maintain version, epoch, and drift counters; " +
      "incompatible or missing manifests are rejected loudly") {
    val all = gaussians(100, 83L)
    val old = all.where(col("id") % 5 =!= 4)
    val g = Similarity.knnGraphBuild(old, k = 4, rounds = 2,
      revCap = 12, lshBits = 2, lshTables = 2)
    val dir = java.nio.file.Files.createTempDirectory("knn_manifest_spec").toString + "/idx"
    val idx = Similarity.knnGraphWritePartitioned(spark, g, old, dir,
      parts = 4, k = 4, lshBits = 2, lshTables = 2, anchorsPerBucket = 12)
    val m0 = Similarity.knnGraphRequireCompatible(spark, idx)
    assert(m0.formatVersion == Similarity.KnnGraphFormatVersion)
    assert(m0.anchorDepth == idx.anchorDepth && m0.epoch == 0L)
    assert(m0.baseCount == 80L && m0.appendedSinceRefresh == 0L
      && m0.deletedSinceRefresh == 0L && m0.appendedFraction == 0.0)
    // append: epoch bump + appended counter = batch size (20 arrivals)
    Similarity.knnGraphAppendPartitioned(spark, idx, all, col("id") % 5 === 4)
    val m1 = Similarity.knnGraphRequireCompatible(spark, idx)
    assert(m1.epoch == 1L && m1.appendedSinceRefresh == 20L
      && m1.baseCount == 80L && m1.deletedSinceRefresh == 0L)
    assert(math.abs(m1.appendedFraction - 0.25) < 1e-12)
    // delete: epoch bump + deleted counter
    Similarity.knnGraphDeletePartitioned(spark, idx, all, col("id") % 10 === 7)
    val m2 = Similarity.knnGraphRequireCompatible(spark, idx)
    assert(m2.epoch == 2L && m2.deletedSinceRefresh == 10L
      && m2.appendedSinceRefresh == 20L)
    // a handle with the wrong anchor depth / knobs must fail LOUDLY —
    // a silent wrong-depth recut breaks the stored-anchors invariant
    val badDepth = intercept[IllegalArgumentException] {
      Similarity.knnGraphAppendPartitioned(
        spark, idx.copy(anchorsPerBucket = 6), all, col("id") % 5 === 4)
    }
    assert(badDepth.getMessage.contains("disagree with the stored manifest"))
    // a store without a manifest (pre-v2 or foreign dir) is rejected
    val fs = new org.apache.hadoop.fs.Path(idx.manifestPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idx.manifestPath), false)
    val noMan = intercept[IllegalStateException] {
      Similarity.knnGraphDeletePartitioned(spark, idx, all, col("id") % 10 === 3)
    }
    assert(noMan.getMessage.contains("no manifest.json"))
  }

  test("knnGraphRefreshPartitioned: stored refresh equals one in-memory descent round " +
      "over every table (base + layer); anchors unchanged; manifest counters reset") {
    val all = gaussians(120, 97L)
    val old = all.where(col("id") % 5 =!= 4)
    // layered store over the old corpus (layerFactor 2 keeps layer 1
    // populated at this size), then append the arrivals so the store
    // carries real drift for the refresh to work on
    val g = Similarity.knnGraphBuild(old, k = 4, rounds = 2,
      revCap = 12, lshBits = 2, lshTables = 2)
    val dir = java.nio.file.Files.createTempDirectory("knn_refresh_spec").toString + "/idx"
    val idx = Similarity.knnGraphWritePartitioned(spark, g, old, dir,
      parts = 4, k = 4, lshBits = 2, lshTables = 2, anchorsPerBucket = 12,
      layerFactor = 2)
    val l1Corpus = old.where(Similarity.knnLayerMemberFilter(col("id"), 1, 2))
    val gl1 = Similarity.knnGraphBuild(l1Corpus, k = 4, rounds = 2,
      revCap = 12, lshBits = 2, lshTables = 2)
    Similarity.knnGraphWriteLayer(spark, idx, 1, gl1, l1Corpus)
    Similarity.knnGraphAppendPartitioned(spark, idx, all, col("id") % 5 === 4)
    val manBefore = Similarity.knnGraphRequireCompatible(spark, idx)
    assert(manBefore.appendedSinceRefresh == 24L)
    // expected: one in-memory descent round over each MUTATED stored
    // table, against its member slice of the full corpus
    val expectBase = graphRows(Similarity.knnGraphDescentRound(
      Similarity.knnGraphReadEdges(spark, idx), all, k = 4, revCap = 12))
    val expectL1 = graphRows(Similarity.knnGraphDescentRound(
      Similarity.knnGraphReadLayer(spark, idx, 1),
      all.where(Similarity.knnLayerMemberFilter(col("id"), 1, 2)),
      k = 4, revCap = 12))
    val anchBefore = spark.read.parquet(idx.anchorsPath)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    Similarity.knnGraphRefreshPartitioned(spark, idx, all, revCap = 12)
    assert(graphRows(Similarity.knnGraphReadEdges(spark, idx)) == expectBase,
      "refreshed base table must equal the in-memory descent round")
    assert(graphRows(Similarity.knnGraphReadLayer(spark, idx, 1)) == expectL1,
      "refreshed layer must equal the in-memory descent round over its slice")
    val anchAfter = spark.read.parquet(idx.anchorsPath)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(anchAfter == anchBefore,
      "refresh must not change anchors — the corpus is unchanged")
    val manAfter = Similarity.knnGraphRequireCompatible(spark, idx)
    assert(manAfter.epoch == manBefore.epoch + 1
      && manAfter.baseCount == 120L
      && manAfter.appendedSinceRefresh == 0L
      && manAfter.deletedSinceRefresh == 0L,
      s"refresh must re-arm the drift counters, got $manAfter")
  }

  test("knnGraphMaybeRefresh: fires only at the appended-fraction threshold, " +
      "resets the counter, and is cheap below it") {
    val all = gaussians(110, 101L)
    val old = all.where(col("id") % 11 =!= 0) // 100 base nodes
    val g = Similarity.knnGraphBuild(old, k = 4, rounds = 2,
      revCap = 12, lshBits = 2, lshTables = 2)
    val dir = java.nio.file.Files.createTempDirectory("knn_trigger_spec").toString + "/idx"
    val idx = Similarity.knnGraphWritePartitioned(spark, g, old, dir,
      parts = 4, k = 4, lshBits = 2, lshTables = 2, anchorsPerBucket = 12)
    // 10 arrivals on a 100-node base = 10% appended: below a 0.15
    // threshold nothing runs (same epoch, counters intact)
    Similarity.knnGraphAppendPartitioned(spark, idx, all, col("id") % 11 === 0)
    val m1 = Similarity.knnGraphRequireCompatible(spark, idx)
    assert(!Similarity.knnGraphMaybeRefresh(spark, idx, all, threshold = 0.15,
      revCap = 12))
    assert(Similarity.knnGraphRequireCompatible(spark, idx) == m1,
      "below threshold the trigger must touch nothing")
    // at threshold 0.10 it fires: epoch bumps, counters re-arm, and
    // the stored graph equals the in-memory descent round
    val expect = graphRows(Similarity.knnGraphDescentRound(
      Similarity.knnGraphReadEdges(spark, idx), all, k = 4, revCap = 12))
    assert(Similarity.knnGraphMaybeRefresh(spark, idx, all, threshold = 0.10,
      revCap = 12))
    val m2 = Similarity.knnGraphRequireCompatible(spark, idx)
    assert(m2.epoch == m1.epoch + 1 && m2.appendedSinceRefresh == 0L
      && m2.baseCount == 110L)
    assert(graphRows(Similarity.knnGraphReadEdges(spark, idx)) == expect)
  }

  test("mutations invalidate the serve-tier binary: edges_bin is deleted by the swap") {
    val all = gaussians(90, 89L)
    val old = all.where(col("id") % 5 =!= 4)
    val g = Similarity.knnGraphBuild(old, k = 4, rounds = 2,
      revCap = 12, lshBits = 2, lshTables = 2)
    val dir = java.nio.file.Files.createTempDirectory("knn_bininv_spec").toString + "/idx"
    val idx = Similarity.knnGraphWritePartitioned(spark, g, old, dir,
      parts = 4, k = 4, lshBits = 2, lshTables = 2, anchorsPerBucket = 12)
    Similarity.knnGraphWriteBinary(spark, idx)
    val bin = new java.io.File(s"${idx.path}/edges_bin")
    assert(bin.isDirectory, "binary tier written beside the parquet edges")
    Similarity.knnGraphAppendPartitioned(spark, idx, all, col("id") % 5 === 4)
    assert(!bin.exists(),
      "a mutated index must not leave a stale mmap tier serving pre-mutation neighbors")
  }
}
