package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump the k-NN graph family's OPERATOR plans (append / delete /
  * descent-round / LSH seed edges) as formatted explain files. The
  * declared queries wrap these in withAqeOn → localCheckpoint, so
  * their returned-frame dumps flatten to a LogicalRDD — this tool is
  * the evidence surface for the per-node ranking-window → topk_pairs
  * claims (plans/r18/knn_*_{before,after}.txt).
  *
  * Usage: runMain graft.dev.GraphPlanDump <outDir> <suffix>
  */
object GraphPlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GraphPlanDump <outDir> <suffix>")
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
    val g = graft.operators.Similarity.knnGraphBuild(
      e.where(pmod(col("id"), lit(5L)) =!= 4),
      k = 8, rounds = 3, revCap = 32, lshBits = 5, lshTables = 3)
      .localCheckpoint()
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote ${name}_$suffix.txt (${plan.length} chars)")
    }
    dump("knn_append", graft.operators.Similarity.knnGraphAppend(
      g, e, pmod(col("id"), lit(5L)) === 4, k = 8))
    dump("knn_delete", graft.operators.Similarity.knnGraphDelete(
      g, e.where(pmod(col("id"), lit(5L)) =!= 4), pmod(col("id"), lit(7L)) === 3, k = 8))
    dump("knn_descent_round", graft.operators.Similarity.knnGraphDescentRound(
      g, e.where(pmod(col("id"), lit(5L)) =!= 4), k = 8))
    dump("knn_seed_edges", graft.operators.Similarity.knnLshSeedEdges(
      e, lshBits = 5, lshTables = 3, anchorsPerBucket = 32))
    spark.stop()
  }
}
