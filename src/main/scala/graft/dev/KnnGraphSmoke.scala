package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev smoke for the LSH-seeded NN-Descent graph family: build the
  * graph on the sf fixture, run the beam serve and the recall gate,
  * and print wall times + recall — the measured-numbers loop for
  * q262-q264 parameter choices.
  *
  * Run: sbt "runMain graft.dev.KnnGraphSmoke [sfDir]"
  */
object KnnGraphSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[knn-smoke] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val graph = timed("build k=8 rounds=3") {
      val g = Similarity.knnGraphBuild(e, k = 8, rounds = 3, revCap = 32,
        lshBits = 5, lshTables = 3).persist()
      println(s"[knn-smoke] graph edges: ${g.count()}")
      g
    }
    val recall = timed("recall gate") {
      val truth = Similarity.bruteForceTopK(
        e.where(pmod(col("id"), lit(25L)) === 0), e, k = 8)
      Similarity.topKRecall(truth,
          graph.select(col("node_id").as("query_id"), col("neighbor_id")))
        .agg(sum("n_hit").as("h"), sum("n_truth").as("t"))
        .collect()(0)
    }
    println(s"[knn-smoke] recall@8: ${recall.getLong(0)}/${recall.getLong(1)}")
    val served = timed("beam serve 5 queries") {
      Similarity.knnGraphServe(e.where(col("id") < 5), graph, e,
        k = 5, beam = 8, hops = 2, entryStride = 61L).collect()
    }
    println(s"[knn-smoke] serve rows: ${served.length}")
    served.take(5).foreach(r => println(s"[knn-smoke]   $r"))
    spark.stop()
  }
}
