package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Vocab-scale BPE training smoke: time
  * [[graft.operators.Training.trainBpeBatched]] at ≥1k merges over a
  * synthetic 1M-doc corpus, and report the round count (the batched
  * trainer's cost driver: rounds = Spark-job waves, where the
  * sequential loop pays one wave PER MERGE).
  *
  * The corpus words are letter-only (base-26 renderings of a skewed
  * id) so symbol statistics resemble text: early rounds batch poorly
  * (every top pair shares a character — inherent to BPE, not to the
  * batching rule), later rounds batch at up to maxBatch as symbols
  * diversify. The printed merges/round ratio is the honest speedup
  * over the sequential loop.
  *
  * Usage: runMain graft.dev.BpeScaleSmoke [nDocs] [nMerges] [maxBatch]
  */
object BpeScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 1000000L
    val nMerges = if (args.length > 1) args(1).toInt else 1000
    val maxBatch = if (args.length > 2) args(2).toInt else 256
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ~30 words per doc drawn Zipf-ishly from a 20k-type vocabulary;
    // each type renders as 3-8 lowercase letters so BPE has realistic
    // merge structure (shared prefixes/suffixes, 26-symbol alphabet)
    val words = (0 until 30).map { i =>
      val h = xxhash64(col("id") * 37 + i)
      // skew: square a uniform draw to concentrate mass on low ids
      val t = pmod(h, lit(141L)) * pmod(h, lit(142L)) % 20000L
      val letters = (0 until 8).map { j =>
        val active = pmod(xxhash64(t * 11 + j), lit(8L)) < 3 || lit(j < 3)
        when(active, chr(pmod(xxhash64(t * 13 + j), lit(26L)) + 97)).otherwise(lit(""))
      }
      concat(letters: _*)
    }
    val docs = spark.range(nDocs)
      .select(col("id").as("doc_id"), concat_ws(" ", words: _*).as("text"))
      .persist()
    val t0 = System.nanoTime()
    docs.count()
    println(f"TIME corpus materialize ($nDocs docs): ${(System.nanoTime() - t0) / 1e9}%.1fs")

    // the cost driver is Spark JOB WAVES: the sequential loop pays ~2
    // jobs per merge (argmax collect + persist-count); count the
    // batched trainer's actual jobs via a listener for the comparison
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val t1 = System.nanoTime()
    val merges = graft.operators.Training.trainBpeBatched(
      docs, col("text"), nMerges, maxBatch, driverVocabLimit = 0L)
    val got = merges.count()
    val secs = (System.nanoTime() - t1) / 1e9
    println(f"TIME trainBpeBatched distributed ($got merges, maxBatch=$maxBatch): $secs%.1fs")

    // the production under-threshold path: vocab collected once, merge
    // loop driver-local with incremental pair counts (zero jobs/merge)
    val jobs1 = jobs.get
    val t2 = System.nanoTime()
    val gotLocal = graft.operators.Training.trainBpeBatched(
      docs, col("text"), nMerges, maxBatch).count()
    val secsLocal = (System.nanoTime() - t2) / 1e9
    val jobsLocal = jobs.get - jobs1
    println(f"TIME trainBpeBatched local-vocab ($gotLocal merges): $secsLocal%.1fs")
    println(f"RESULT nDocs=$nDocs merges=$got distJobs=$jobs1 " +
      f"seqJobsWouldBe=${2 * got} distSecs=$secs%.1f distSecsPerMerge=${secs / got}%.3f " +
      f"localJobs=$jobsLocal localSecs=$secsLocal%.1f localSecsPerMerge=${secsLocal / gotLocal}%.4f")
    spark.stop()
  }
}
