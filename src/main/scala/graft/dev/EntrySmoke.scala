package graft.dev

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: entry() on sf0.001 must return rows. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY rows=$n schema=${df.schema.fieldNames.mkString(",")}")
    assert(n > 0)
    spark.stop()
  }
}
