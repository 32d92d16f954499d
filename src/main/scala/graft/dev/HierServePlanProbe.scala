package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Plan-shape probe for the layered-serve hop loop: rebuilds one hop
  * tree exactly as [[graft.operators.Similarity.knnGraphServeLayered]]
  * does and prints the formatted physical plan under the bench
  * session's conf (AQE off, shuffle.partitions = cpus) at several
  * scoped shuffle-partition settings — so Exchange counts and join
  * strategies per hop are inspectable without archaeology on a
  * 60-stage serve.
  */
object HierServePlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val g = graft.operators.Similarity.knnGraphBuild(
      e, k = 8, rounds = 1, revCap = 32, lshBits = 5, lshTables = 3)
      .localCheckpoint()
    def norm(c: org.apache.spark.sql.Column) =
      sqrt(aggregate(transform(c, x => x * x), lit(0.0), (a, x) => a + x))
    val vecs = e.select(col("id"), col("vec"), norm(col("vec")).as("nrm")).persist()
    vecs.count()
    val q = e.where(col("id") < 5)
      .select(col("id").as("query_id"), col("vec").as("q_vec"),
        norm(col("vec")).as("q_norm"))
    def score(cand: org.apache.spark.sql.DataFrame) =
      cand
        .join(vecs.select(col("id").as("cand"), col("vec").as("c_vec"),
          col("nrm").as("c_norm")), Seq("cand"))
        .join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col("cand"), lit(0.5).as("cos"))
    def cut(scored: org.apache.spark.sql.DataFrame, keep: Int) = scored
      .withColumn("__rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand"))))
      .where(col("__rk") <= keep).drop("__rk")
    val entries = g.select(col("node_id").as("cand")).distinct()
    val beam0 = cut(score(
      q.select("query_id").crossJoin(broadcast(entries))), 8).localCheckpoint()
    val edges = g.select(col("node_id"), col("neighbor_id").as("cand"))
    for (p <- Seq(cpus, "1")) {
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      val expand = beam0.select(col("query_id"), col("cand").as("node_id"))
        .join(edges, Seq("node_id"))
        .select("query_id", "cand")
      val next = cut(score(
        beam0.select("query_id", "cand").union(expand).distinct()), 8)
      println(s"===== hop plan at shuffle.partitions=$p =====")
      next.explain("formatted")
      val t0 = System.nanoTime()
      next.localCheckpoint()
      println(f"materialize: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      val t1 = System.nanoTime()
      next.localCheckpoint()
      println(f"materialize warm: ${(System.nanoTime() - t1) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
