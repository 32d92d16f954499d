package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the bounded top-k aggregate to the ranking-window form it
  * replaced in bruteForceTopK/hardNegatives: identical rows and
  * tie-breaks (score desc, id asc) on deterministic pseudo-random
  * data with engineered boundary ties, and identical output through
  * the real brute-force operator.
  */
class TopKPairsSpec extends SparkTestBase {

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("s").desc, col("i"))))
      .where(col("rk") <= k).drop("rk")
      .select("g", "i", "s")

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(TopK.pairs(col("s"), col("i"), k).as("tk"))
      .select(col("g"), explode(col("tk")).as("e"))
      .select(col("g"), col("e.neighbor_id").as("i"), col("e.cos").as("s"))

  test("aggregate equals the ranking window, ties included") {
    import spark.implicits._
    // deterministic scores with HEAVY ties: s = (i*7 % 5) / 10.0 puts
    // many ids on each score level, so the k boundary cuts through a
    // tie group and the id-ascending tie-break is load-bearing
    val df = (0L until 500L).flatMap(i => Seq(
        (i % 7, i, (i * 7 % 5) / 10.0),
        (i % 7, i + 1000L, (i * 3 % 4) / 10.0)))
      .toDF("g", "i", "s").repartition(13)
    for (k <- Seq(1, 3, 10)) {
      val w = windowTopK(df, k).orderBy("g", "i").collect().toSeq
      val a = aggTopK(df, k).orderBy("g", "i").collect().toSeq
      assert(a == w, s"k=$k")
    }
  }

  test("groups smaller than k emit all rows; empty input emits none") {
    import spark.implicits._
    val df = Seq((0L, 1L, 0.5), (0L, 2L, 0.4), (1L, 3L, 0.9))
      .toDF("g", "i", "s")
    val a = aggTopK(df, 10).orderBy("g", "i").collect().toSeq
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))) ==
      Seq((0L, 1L, 0.5), (0L, 2L, 0.4), (1L, 3L, 0.9)))
    assert(aggTopK(df.where(col("g") < 0), 3).count() == 0)
  }

  test("ascending bottom-k via negated score equals the ascending window") {
    import spark.implicits._
    // the capEdgesPerNode / knnLshAnchorsOf trick: (h asc, id asc)
    // bottom-k == top-k by score −h. Hash-like long scores incl. 0 and
    // heavy collisions (h = i*2654435761 % 97) so ties cross the cut.
    val df = (0L until 400L).map(i => (i % 11, i, i * 2654435761L % 97))
      .toDF("g", "i", "h")
    for (k <- Seq(1, 4, 16)) {
      val w = df.withColumn("rk", row_number().over(
          Window.partitionBy("g").orderBy(col("h"), col("i"))))
        .where(col("rk") <= k).select("g", "i")
        .orderBy("g", "i").collect().toSeq
      val a = df.groupBy("g")
        .agg(TopK.pairs(-col("h").cast("double"), col("i"), k).as("tk"))
        .select(col("g"), explode(col("tk.neighbor_id")).as("i"))
        .orderBy("g", "i").collect().toSeq
      assert(a == w, s"k=$k")
    }
  }

  test("posexplode position + 1 equals row_number ranks") {
    import spark.implicits._
    // the topKEdgesPerNode contract: nb_rank from the explode position
    // must equal the window's row_number on unique (g, i) inputs
    val df = (0L until 300L).map(i => (i % 9, i, (i * 13 % 7) / 10.0))
      .toDF("g", "i", "s")
    val w = df.withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("s").desc, col("i"))))
      .where(col("rk") <= 6).select("g", "i", "s", "rk")
      .orderBy("g", "rk").collect().toSeq
    val a = df.groupBy("g")
      .agg(TopK.pairs(col("s"), col("i"), 6).as("tk"))
      .select(col("g"), posexplode(col("tk")))
      .select(col("g"), col("col.neighbor_id").as("i"),
        col("col.cos").as("s"), (col("pos") + 1).as("rk"))
      .orderBy("g", "rk").collect().toSeq
    assert(a == w)
  }

  test("bruteForceTopK output is unchanged by the aggregate form") {
    import spark.implicits._
    val vecs = (0L until 120L)
      .map(i => (i, Array.tabulate(8)(d => math.sin(i * 31 + d).toFloat)))
      .toDF("id", "vec")
    val out = graft.operators.Similarity
      .bruteForceTopK(vecs.where(col("id") < 6), vecs, k = 5)
    // window reference computed inline
    val q = vecs.where(col("id") < 6).select(col("id").as("query_id"),
      col("vec").as("q_vec"), graft.operators.Similarity.norm(col("vec")).as("q_norm"))
    val c = vecs.select(col("id").as("neighbor_id"), col("vec").as("c_vec"),
      graft.operators.Similarity.norm(col("vec")).as("c_norm"))
    val ref = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(graft.operators.Similarity.cosineFromNorms(
          graft.operators.Similarity.dot(col("q_vec"), col("c_vec")),
          col("q_norm"), col("c_norm")), 6).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))))
      .where(col("rk") <= 5).drop("rk")
    val a = out.orderBy("query_id", "neighbor_id").collect().toSeq
    val w = ref.orderBy("query_id", "neighbor_id").collect().toSeq
    assert(a == w && a.size == 30)
  }
}
