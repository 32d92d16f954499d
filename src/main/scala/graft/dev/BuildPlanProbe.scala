package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan-shape probe for one NN-Descent round's scoring joins: does
  * Spark reuse the broadcast exchange between the i-side and j-side
  * vector lookups (ReusedExchange), or does every round pay TWO
  * broadcast builds? Drives the r16 descent-round optimization with
  * evidence instead of guesses. Dev-only.
  */
object BuildPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 3000
    val vecsRaw = spark.range(n.toLong).select(col("id"),
      expr("transform(sequence(0, 15), d -> CAST((id % 97) * 37 + d AS FLOAT))").as("vec"))
    val vecs = vecsRaw.select(col("id"), col("vec"),
      graft.operators.Similarity.norm(col("vec")).as("nrm")).persist()
    vecs.count()
    val nb = graft.operators.Similarity.knnLshSeedEdges(vecsRaw, 4, 2, 8)
      .localCheckpoint()
    val fwd = nb.select("i", "j")
    val und = fwd.union(fwd.select(col("j").as("i"), col("i").as("j"))).distinct()
      .withColumn("__h", expr(
        "((i % 1000003L) * 2654435761L + (j % 1000003L) * 40503L) % 2147483647L"))
      .withColumn("__r", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("i")
          .orderBy(col("__h"), col("j"))))
      .where(col("__r") <= 16).drop("__h", "__r")
    val hop2 = und.as("a").join(und.as("b"), col("a.j") === col("b.i"))
      .select(col("a.i").as("i"), col("b.j").as("j"))
    val cand = und.union(hop2).where(col("i") =!= col("j")).distinct()
    val scored = cand
      .join(vecs.select(col("id").as("i"), col("vec").as("vi"), col("nrm").as("ni")), Seq("i"))
      .join(vecs.select(col("id").as("j"), col("vec").as("vj"), col("nrm").as("nj")), Seq("j"))
      .select(col("i"), col("j"),
        round(graft.operators.Similarity.cosineFromNorms(
          graft.operators.Similarity.dot(col("vi"), col("vj")),
          col("ni"), col("nj")), 6).as("cos"))
    println("ADAPTIVE=" + spark.conf.get("spark.sql.adaptive.enabled"))
    println("REUSE=" + spark.conf.get("spark.sql.exchange.reuse", "true"))
    def audit(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      val nB = plan.linesIterator.count(_.contains("BroadcastExchange"))
      val nR = plan.linesIterator.count(_.contains("ReusedExchange"))
      println(s"SCORING PLAN($tag): BroadcastExchange=$nB ReusedExchange=$nR")
    }
    audit("renamed sides (current)", scored)
    // variant: same projected frame joined twice via conditions, no
    // per-side renames in the build side
    val bv = vecs.select(col("id"), col("vec"), col("nrm"))
    val s1 = cand.join(bv.as("va"), col("i") === col("va.id"))
      .select(col("i"), col("j"), col("va.vec").as("vi"), col("va.nrm").as("ni"))
    val s2 = s1.join(bv.as("vb"), col("j") === col("vb.id"))
      .select(col("i"), col("j"),
        round(graft.operators.Similarity.cosineFromNorms(
          graft.operators.Similarity.dot(col("vi"), col("vb.vec")),
          col("ni"), col("vb.nrm")), 6).as("cos"))
    audit("condition joins", s2)
    // variant: unpersisted child
    val vecs2 = vecsRaw.select(col("id"), col("vec"),
      graft.operators.Similarity.norm(col("vec")).as("nrm"))
    val s3 = cand
      .join(vecs2.select(col("id").as("i"), col("vec").as("vi"), col("nrm").as("ni")), Seq("i"))
      .join(vecs2.select(col("id").as("j"), col("vec").as("vj"), col("nrm").as("nj")), Seq("j"))
      .select(col("i"), col("j"),
        round(graft.operators.Similarity.cosineFromNorms(
          graft.operators.Similarity.dot(col("vi"), col("vj")),
          col("ni"), col("nj")), 6).as("cos"))
    audit("no persist", s3)
    spark.stop()
  }
}
