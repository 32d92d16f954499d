package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FeaturesSpec extends SparkTestBase {
  import spark.implicits._

  test("rollingFeatures: hand-computed lag/gap/trailing frame") {
    val df = Seq(
      (1L, 1L, 10L, 1.5), (2L, 1L, 20L, 2.25), (3L, 1L, 30L, -0.5),
      (4L, 2L, 5L, 10.0))
      .toDF("id", "k", "us", "v")
    val r = Features.rollingFeatures(df, col("k"), col("us"), col("v"), col("id"), n = 2)
      .orderBy("key", "ts_us")
      .select("id", "v_c", "prev_v_c", "gap_us", "roll_sum_c", "roll_n",
        "roll_min_c", "roll_max_c")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(r == Seq(
      (1L, 150L, None, None, 150L, 1L, 150L, 150L),
      (2L, 225L, Some(150L), Some(10L), 375L, 2L, 150L, 225L),
      // floor(-0.5*100) = -50 exactly
      (3L, -50L, Some(225L), Some(10L), 175L, 2L, -50L, 225L),
      (4L, 1000L, None, None, 1000L, 1L, 1000L, 1000L)))
  }

  test("rollingFeatures: id tiebreak totalizes equal timestamps") {
    val df = Seq((2L, 1L, 10L, 2.0), (1L, 1L, 10L, 1.0)).toDF("id", "k", "us", "v")
    val r = Features.rollingFeatures(df, col("k"), col("us"), col("v"), col("id"), n = 3)
      .orderBy("id").select("id", "prev_v_c")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    // id 1 first (no prev), id 2 second (prev = 100)
    assert(r == Seq((1L, None), (2L, Some(100L))))
  }

  test("rollingFeatures: deterministic across partitionings") {
    val df = spark.range(5000).select(col("id"), (col("id") % 17).as("k"),
      ((col("id") * 31) % 1000).as("us"), (col("id") % 7).cast("double").as("v"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Features.rollingFeatures(d, col("k"), col("us"), col("v"), col("id"), n = 5)
        .orderBy("key", "ts_us", "id").collect().toSeq
    assert(run(df.repartition(1)) == run(df.repartition(11, col("id"))))
  }
}
