package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Focused volume smoke for the graph-analytics operators: a
  * power-law-ish synthetic directed graph (hash-skewed endpoints so
  * hub nodes exist — the triangle orientation's reason to exist),
  * PageRank rounds and the exact triangle count.
  *
  * Usage: runMain graft.dev.GraphSmoke [nEdges]
  */
object GraphSmoke {
  def main(args: Array[String]): Unit = {
    val nEdges = if (args.nonEmpty) args(0).toLong else 10000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    // skew: src/dst ids are squared-uniform over ~sqrt-range buckets,
    // so low ids are hubs (roughly Zipf-ish degree tail)
    val n = math.max(1000L, nEdges / 10)
    val e = spark.range(nEdges).select(
        (pmod(xxhash64(col("id")), lit(n)) * pmod(xxhash64(col("id")), lit(n)) / n).cast("long").as("s"),
        (pmod(xxhash64(col("id") + 1), lit(n)) * pmod(xxhash64(col("id") + 1), lit(n)) / n).cast("long").as("d"))
      .where(col("s") =!= col("d")).persist()
    time("edges materialize")(e.count())
    val pr = time("pageRank (3 rounds)")(
      Graph.pageRank(e, col("s"), col("d"), iters = 3)
        .orderBy(col("rank").desc, col("node")).limit(20).collect())
    // standard variant: same per-round plan plus a 1-row dangling
    // aggregate — the delta vs the leaky loop is the redistribution's
    // whole cost
    val prs = time("pageRankStandard (3 rounds, dangling redistribution)")(
      Graph.pageRankStandard(e, col("s"), col("d"), iters = 3)
        .orderBy(col("rank").desc, col("node")).limit(20).collect())
    val tri = time("triangleStats (degree-oriented)")(
      Graph.triangleStats(e, col("s"), col("d")).collect().head)
    val hits = time("hits (2 rounds)")(
      Graph.hits(e, col("s"), col("d"), iters = 2)
        .orderBy(col("auth").desc, col("node")).limit(20).collect())
    val prof = time("graphProfile")(
      Graph.graphProfile(e, col("s"), col("d")).collect().head)
    // cap 64: the skewed hubs far exceed it — exercises the wedge cap
    val lp = time("linkPrediction (cap 64, top 100)")(
      Graph.linkPrediction(e, col("s"), col("d"),
        maxWedgeDegree = 64, topK = 100).collect())
    println(s"RESULT nEdges=$nEdges topRank=${pr.head.getLong(1)} " +
      s"topRankStd=${prs.head.getLong(1)} " +
      s"nodes=${tri.getLong(0)} undEdges=${tri.getLong(1)} triangles=${tri.getLong(2)} " +
      s"topAuth=${hits.head.getLong(1)} reciprocity=${prof.getLong(3)} " +
      s"maxOutDeg=${prof.getLong(4)} lpTopJaccard=${lp.headOption.map(_.getLong(3)).getOrElse(-1L)}")
    spark.stop()
  }
}
