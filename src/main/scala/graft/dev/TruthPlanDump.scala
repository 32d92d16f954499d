package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump the q272 brute-force TRUTH pass's own formatted plan.
  * The declared query materializes the truth eagerly (withAqeOn →
  * localCheckpoint), so q272's returned-frame dump only ever shows a
  * LogicalRDD where the pair web ran — this dev tool dumps the truth
  * frame BEFORE materialization, which is the evidence surface for
  * the ranking-window → topk_pairs claim (plans/r18/q272_truth_*).
  *
  * Usage: runMain graft.dev.TruthPlanDump <outDir> <suffix>
  */
object TruthPlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TruthPlanDump <outDir> <suffix>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    // exactly qKnnHierRecall's truth pass: ids ≡ 0 mod 50, k = 5
    val truth = graft.operators.Similarity.bruteForceTopK(
      e.where(pmod(col("id"), lit(50L)) === 0), e, k = 5)
    val plan = truth.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    java.nio.file.Files.write(outDir.resolve(s"q272_truth_$suffix.txt"),
      plan.getBytes("UTF-8"))
    println(s"[plandump] wrote q272_truth_$suffix.txt (${plan.length} chars)")
    spark.stop()
  }
}
