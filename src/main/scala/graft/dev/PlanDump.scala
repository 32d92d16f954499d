package graft.dev

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a list of contract queries into
  * text files — the evidence artifact behind `plans/rN/` (judge-side
  * plan-claim checking; the judge cannot run Spark). Bench-like conf:
  * local[32], shuffle.partitions 32, AQE on (the bench session's
  * default since r17; SPARK_GRAFT_AQE overrides), nanosAsLong for the
  * events vintage. NOTE: a dumped plan under AQE shows the INITIAL
  * AdaptiveSparkPlan (isFinalPlan=false) — Exchange counts and join
  * strategies before runtime re-planning, which is what the static
  * plan-diff evidence compares.
  *
  * Usage: runMain graft.dev.PlanDump <outDir> <suffix> <query...>
  * writes <outDir>/<query>_<suffix>.txt per query. The query function
  * runs its internal eager actions (memoized builds etc.) as usual;
  * the dumped plan is the RETURNED frame's formatted physical plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val names = args.drop(2).toSeq
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
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      spark.sparkContext.setJobDescription(s"plandump: $name")
      val df = fn(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote ${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
