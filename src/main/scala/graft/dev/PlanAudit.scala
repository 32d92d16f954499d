package graft.dev
import org.apache.spark.sql.SparkSession

/** Executed-plan audit for a handful of contract queries: prints the
  * join / exchange / scan / pruning lines after running each query at
  * sf0.01 — the round-N "is this the plan I'd want at 100 TB" check
  * (r14 findings: q251/q253 serve entirely on broadcast joins with
  * dynamic partition pruning and codes-only ReadSchema; q256/q257 are
  * one broadcast cross + windowed cut; q258's margins joins print as
  * SMJ pre-AQE — the aggregates are model-sized and unhinted, so AQE
  * broadcasts them when they fit, the repo's standard pattern).
  * Edit the query list inline; it's a dev loop, not a gate.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q263_knn_graph_serve", "q265_dsir_hashed",
        "q268_knn_graph_append", "q269_knn_graph_delete",
        "q261_stream_sessionize", "q266_stream_kmeans")) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.count()
      println(s"===== $q =====")
      val plan = df.queryExecution.executedPlan.toString
      println(plan.split("\n").filter(l =>
        l.contains("Join") || l.contains("Exchange") || l.contains("Scan parquet") ||
        l.contains("dynamicpruning") || l.contains("Window")).mkString("\n"))
    }
    spark.stop()
  }
}
