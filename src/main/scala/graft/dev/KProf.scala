package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object KProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[prof] $tag ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val ev = graft.SparkEntry.normalizeTsNanos(spark.read.parquet(s"$dir/events.parquet"))
      .where(col("event_id") % 16 === 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val pairs = ev.select(col("user_id"), lead(col("user_id"), 1).over(w).as("nxt"))
      .where(col("nxt").isNotNull && col("nxt") =!= col("user_id"))
      .select(col("user_id").as("src"), col("nxt").as("dst"))
    time("warm pairs")(pairs.count())
    val r1 = time("kCore build")(graft.operators.Graph.kCore(pairs, col("src"), col("dst"), 6, 6))
    time("kCore collect")(r1.collect().length)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val oq = li.groupBy(col("l_orderkey").as("o"), col("l_suppkey").as("sk"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    val comps = oq.as("a").join(oq.as("b"),
        col("a.o") === col("b.o") && col("a.sk") < col("b.sk"))
      .select(when(col("a.q") >= col("b.q"), col("a.sk")).otherwise(col("b.sk")).as("winner"),
        when(col("a.q") >= col("b.q"), col("b.sk")).otherwise(col("a.sk")).as("loser"))
    val bt = time("BT build")(graft.operators.Preference.bradleyTerry(comps, col("winner"), col("loser"), 3))
    time("BT collect")(bt.collect().length)
    spark.stop()
  }
}
