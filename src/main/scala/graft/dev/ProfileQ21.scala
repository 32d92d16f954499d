package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object ProfileQ21 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"$label: ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    val base = df.select(col("doc_id"), Dedup.hashedShingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0).persist()
    time("shingle+persist")(base.count())
    val minCols = (0 until 32).map(seed => min(xxhash64(col("h"), lit(seed))).as(s"m$seed"))
    val sigs = base.select(col("doc_id"), explode(col("sh")).as("h")).groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    time("signatures")(sigs.count())
    val sigArr = array((0 until 32).map(s => col(s"m$s")): _*)
    val banded = sigs.select(col("doc_id"), explode(Dedup.lshBands(sigArr, 8, 4)).as("band")).persist()
    time("bands")(banded.count())
    println("bucket size dist:")
    banded.groupBy("band").count().groupBy(col("count").as("bucket_size")).agg(count(lit(1)).as("n_buckets")).orderBy(desc("bucket_size")).show(10)
    val cand = banded.select(col("band"), col("doc_id").as("id_a"))
      .join(banded.select(col("band"), col("doc_id").as("id_b")), Seq("band"))
      .where(col("id_a") < col("id_b")).select("id_a", "id_b").distinct().persist()
    time("candidates")(println("n_candidates=" + cand.count()))
    val verified = cand
      .join(base.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(base.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(Dedup.jaccard(col("sh_a"), col("sh_b")).as("j")).where(col("j") >= 0.4)
    time("verify")(println("n_pairs=" + verified.count()))
    spark.stop()
  }
}
