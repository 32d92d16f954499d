package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Point-lookup latency of the serve-tier binary format — the number
  * that grounds the "external serving tier" claim the Spark-side
  * smokes can't: Spark jobs pay scheduler latency per hop, so q271's
  * recall numbers say nothing about per-lookup serving cost. This
  * probe builds a real index, ships it through
  * [[graft.operators.Similarity.knnGraphWriteBinary]], STOPS Spark,
  * and serves "k-NN list of node X" lookups from the mmap'ed files
  * with plain JVM code — the item-to-item serving case (precomputed
  * neighbors; no query vector, no ANN search), which is what the
  * fixed-width offset-indexed layout exists for.
  *
  * Measured (this box, 2026-08-17, n=200k k=8 parts=16, single
  * thread, 200k random lookups after 20k warmup):
  *   mean 0.67 us/lookup, p50 0.54 us, p99 3.84 us, p999 12.7 us
  *   = 1.5M lookups/s single-threaded — six orders of magnitude
  *   under the per-hop cost of a Spark-job serve, and the files are
  *   shared read-only pages so N serving processes scale linearly.
  * Each lookup is one binary search of the partition's node table
  * (20 B stride, ~12k nodes/partition here → ~14 probes) plus one
  * contiguous read of count x 16 B edge slots; the touched pages stay
  * resident, which is the point of mmap over pread for hot serving.
  *
  * Every lookup's result is cross-checked against the parquet edge
  * table (sampled before Spark stops) — latency claims over wrong
  * bytes are worthless.
  */
object BinaryLookupProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val nLookups = if (args.length > 1) args(1).toInt else 200000
    val (k, cap, bits, tables, anchors, parts) = (8, 16, 8, 2, 16, 16)
    val nClusters = 256
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.autoBroadcastJoinThreshold", (512L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    // the scale smoke's clustered-manifold corpus (see
    // KnnGraphScaleSmoke's header for why the displacement is
    // two-frequency sinusoidal and the center multiplier is coprime)
    val vecs = spark.range(n.toLong).select(col("id"),
      expr(s"""transform(sequence(0, 63), d ->
        CAST(((id % $nClusters) * 37 + d * 17) % $nClusters - 128 AS FLOAT)
        + CAST(20.0 * sin(CAST(id DIV $nClusters AS DOUBLE) * 0.2 + CAST(d AS DOUBLE) * 0.7) AS FLOAT)
        + CAST(6.0 * sin(CAST(id DIV $nClusters AS DOUBLE) * 0.013 + CAST(d AS DOUBLE) * 1.3) AS FLOAT))""").as("vec"))
      .persist()
    vecs.count()
    val t0 = System.nanoTime()
    val g = Similarity.knnGraphBuild(vecs, k = k, rounds = 2, revCap = cap,
      lshBits = bits, lshTables = tables, anchorsPerBucket = anchors)
    val dir = java.nio.file.Files.createTempDirectory("knn_lookup_probe").toString + "/idx"
    val idx = Similarity.knnGraphWritePartitioned(spark, g, vecs, dir,
      parts = parts, k = k, lshBits = bits, lshTables = tables,
      anchorsPerBucket = anchors)
    Similarity.knnGraphWriteBinary(spark, idx)
    println(f"TIME build+store+binary (n=$n): ${(System.nanoTime() - t0) / 1e9}%.1fs")
    // correctness sample BEFORE Spark goes away: 500 nodes' edge lists
    val checkIds = (0 until 500).map(i => (i.toLong * 997L) % n).distinct.sorted
    val expect = Similarity.knnGraphReadEdges(spark, idx)
      .where(col("node_id").isin(checkIds.map(Long.box): _*))
      .orderBy("node_id", "nb_rank")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getDouble(3))))
      .groupBy(_._1).map { case (id, a) => id -> a.map(_._2).toSeq }
    spark.stop()

    // ---- pure-JVM serving tier: mmap each partition file once ----
    val binDir = java.nio.file.Paths.get(dir, "edges_bin")
    val maps = new Array[java.nio.MappedByteBuffer](parts)
    (0 until parts).foreach { p =>
      val f = binDir.resolve(s"part=$p.knng")
      val ch = java.nio.channels.FileChannel.open(f,
        java.nio.file.StandardOpenOption.READ)
      try maps(p) = ch.map(java.nio.channels.FileChannel.MapMode.READ_ONLY, 0, ch.size())
      finally ch.close()
      require(maps(p).getInt(0) == 0x474B4E4E && maps(p).getInt(4) == 1,
        s"bad magic/version in $f")
    }
    // lookup: binary-search the 20 B-stride node table, read the run
    def lookup(node: Long, out: Array[Long]): Int = {
      val buf = maps(java.lang.Math.floorMod(node, parts.toLong).toInt)
      val nNodes = buf.getInt(8)
      var lo = 0; var hi = nNodes - 1; var found = -1
      while (lo <= hi && found < 0) {
        val mid = (lo + hi) >>> 1
        val v = buf.getLong(12 + mid * 20)
        if (v == node) found = mid
        else if (v < node) lo = mid + 1
        else hi = mid - 1
      }
      if (found < 0) 0
      else {
        val first = buf.getLong(12 + found * 20 + 8)
        val cnt = buf.getInt(12 + found * 20 + 16)
        val base = 12 + nNodes * 20
        var i = 0
        while (i < cnt && i * 2 < out.length) {
          out(i * 2) = buf.getLong(base + (first + i).toInt * 16)
          out(i * 2 + 1) = buf.getLong(base + (first + i).toInt * 16 + 8)
          i += 1
        }
        cnt
      }
    }
    // cross-check the sampled nodes byte-for-byte
    val out = new Array[Long](64)
    expect.foreach { case (id, es) =>
      val cnt = lookup(id, out)
      require(cnt == es.length, s"node $id: $cnt edges vs parquet ${es.length}")
      es.zipWithIndex.foreach { case ((nb, cos), i) =>
        require(out(i * 2) == nb &&
          java.lang.Double.longBitsToDouble(out(i * 2 + 1)) == cos,
          s"node $id edge $i mismatch")
      }
    }
    println(s"CHECK ${expect.size} sampled nodes match the parquet edges exactly")
    // latency: warmup, then timed xorshift-random lookups
    var x = 88172645463325252L
    def nextId(): Long = {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      java.lang.Math.floorMod(x, n.toLong)
    }
    var sink = 0L
    (1 to 20000).foreach { _ => sink += lookup(nextId(), out) }
    val lats = new Array[Long](nLookups)
    var j = 0
    while (j < nLookups) {
      val id = nextId()
      val t = System.nanoTime()
      sink += lookup(id, out)
      lats(j) = System.nanoTime() - t
      j += 1
    }
    java.util.Arrays.sort(lats)
    def pct(p: Double) = lats(((nLookups - 1) * p).toInt) / 1000.0
    val mean = lats.sum.toDouble / nLookups / 1000.0
    println(f"LOOKUP n=$n parts=$parts lookups=$nLookups (single thread, sink=$sink): " +
      f"mean $mean%.2f us, p50 ${pct(0.5)}%.2f us, p99 ${pct(0.99)}%.2f us, " +
      f"p999 ${pct(0.999)}%.2f us, ${1e6 / mean / 1e6}%.2fM lookups/s")
  }
}
