package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev probe: hierarchical serve recall at fixture scale across
  * (beam, hopsPerLayer) settings — picks the contract parameters for
  * q271/q272. Not part of the contract surface.
  */
object HierProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val l0 = Similarity.knnGraphBuild(e, k = 8, rounds = 3, revCap = 32,
      lshBits = 5, lshTables = 3).persist()
    l0.count()
    val l1 = Similarity.knnGraphBuild(
      e.where(Similarity.knnLayerMemberFilter(col("id"), 1, 8)),
      k = 8, rounds = 3, revCap = 32, lshBits = 5, lshTables = 3).persist()
    l1.count()
    val sample = e.where(pmod(col("id"), lit(25L)) === 0)
    val truth = Similarity.bruteForceTopK(sample, e, k = 5).persist()
    truth.count()
    for (beam <- Seq(8, 12, 16); hops <- Seq(2, 3)) {
      val t0 = System.nanoTime()
      val served = Similarity.knnGraphServeLayered(
        sample, Seq(l1, l0), e, k = 5, beam = beam, hopsPerLayer = hops)
      val rec = Similarity.topKRecall(truth, served)
        .agg(sum("n_hit"), sum("n_truth")).collect()(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[hierprobe] beam=$beam%2d hops=$hops recall=${rec.getLong(0)}/${rec.getLong(1)} = ${rec.getLong(0).toDouble / rec.getLong(1)}%.3f  ${dt}%.1fs")
    }
    spark.stop()
  }
}
