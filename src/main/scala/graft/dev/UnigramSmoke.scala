package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Vocab-scale smoke for the unigram-LM tokenizer trainer: 1M docs /
  * 30M tokens whose hash-synthesized 8-char words are essentially
  * unique — a ~30M-distinct-word vocabulary, REAL-corpus scale for
  * the stage this smoke stresses (the corpus collapses once; every
  * EM round is a map-only segmentation over the vocab-sized word
  * table plus one model-sized usage aggregate).
  *
  * Usage: runMain graft.dev.UnigramSmoke [nDocs] [maxSeed]
  *
  * Measured (round 12, local[32], 1M docs / 29.8M DISTINCT words,
  * maxSeed 50k): seed + 2 full hard-EM rounds in 42.7s end-to-end —
  * every per-round stage vocab-bounded, the driver never holds more
  * than maxSeed + alphabet pieces.
  */
object UnigramSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 1000000L
    val maxSeed = if (args.length > 1) args(1).toInt else 50000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    // 30 words per doc; each word = 8 lowercase chars from a hash, so
    // the vocabulary is large but heavy-tailed like real text
    val docs = spark.range(nDocs).select(
      concat_ws(" ", (0 until 30).map { w =>
        concat((0 until 8).map { c =>
          // zipf-ish: high chars reuse a small pool
          val h = pmod(xxhash64(col("id") * 31 + lit(w * 8 + c)), lit(if (c < 3) 6L else 26L))
          chr(h + lit(97))
        }: _*)
      }: _*).as("text")).persist()
    time("docs materialize")(docs.count())
    val nVocab = time("distinct words")(
      docs.select(explode(split(col("text"), " ")).as("w"))
        .select(countDistinct("w")).head().getLong(0))
    println(s"vocab: $nVocab distinct words")
    val model = time(s"trainUnigramLm (2 EM rounds, maxSeed $maxSeed)")(
      graft.operators.Training.trainUnigramLm(docs, col("text"),
        maxPieceLen = 3, iters = 2, maxSeed = maxSeed))
    println(s"model pieces: ${model.count()}")
    spark.stop()
  }
}
