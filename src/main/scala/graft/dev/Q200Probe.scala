package graft.dev
import org.apache.spark.sql.SparkSession

/** One-query cache-pressure probe: times q200_graph_profile five
  * times in a fresh session, builds ALL session caches (both
  * NN-Descent graphs, the IVF×PQ suite, the postings indexes), and
  * times it five more — the falsification harness for "did the new
  * persisted caches slow unrelated queries?".
  *
  * Recorded (local[32], sf0.1, 2026-08-16 r14): BEFORE 6.91, 1.69,
  * 1.28, 1.10, 1.04 / AFTER 1.42, 1.11, 1.17, 1.13, 1.19 — +0.07s
  * on the min, refuting cache pressure as the cause of q200's
  * session-2 elevation; the actual cause was a fixture-vintage
  * boundary (see BENCH_DIFF_r14.md).
  */
object Q200Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)
    def time5(label: String): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries("q200_graph_profile")(spark, dir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q200] $label: ${ts.map(t => f"$t%.2f").mkString(", ")} (min ${ts.min}%.2f)")
    }
    time5("BEFORE caches (fresh session)")
    graft.SparkEntry.buildCaches(spark, dir)
    time5("AFTER buildCaches (knn graphs + suites persisted)")
    spark.stop()
  }
}
