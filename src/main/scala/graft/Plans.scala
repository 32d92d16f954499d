package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: prints the physical plan of selected contract queries
  * so scan pruning (ReadSchema), filter pushdown (PushedFilters),
  * join strategies (BroadcastHashJoin vs SortMergeJoin) and
  * whole-stage codegen spans can be inspected per change.
  *
  * Usage: sbt "runMain graft.Plans [queryName ...]"
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q01_project_filter", "q02_agg_group", "q08_relation_edges",
        "q12_join_agg", "q21_dedup_minhash", "q23_dedup_ngram", "q25_sim_bruteforce")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
