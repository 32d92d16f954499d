package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._

/** Adversarial-skew smoke for the three round-12 scale fixes: the
  * shapes that were single-task before the fix are driven at the skew
  * that used to kill them.
  *
  *  - rankNormalize: 10M rows across TWO sources (one holds 50% of
  *    the corpus) — the old per-key rank window put 5M rows through
  *    one task; the histogram path's widest exchange is the
  *    (key, score) domain.
  *  - gapProfile: 10M events where ONE group holds half the stream —
  *    the old per-group row_number sort was a single 5M-row task; the
  *    histogram path sorts only each group's gap-value DOMAIN.
  *  - funnel: 5 steps over 10M events — persisted frontiers make it
  *    exactly 5 event scans instead of 15.
  *
  * Usage: runMain graft.dev.HotKeySmoke [nRows]
  *
  * Measured (round 12, local[32], 10M rows, 50% hot):
  *   rankNormalize 4.8-6.3s · gapProfile 10.8s with the TWO-PHASE
  *   exact median (down from 18.1s single-level histogram — the
  *   persisted skinny gaps avoid recomputing the (g, k) lead window,
  *   and both phase windows are √domain-bounded) · funnel 3.8-4.3s
  *   for 5 steps (exactly 5 event scans).
  */
object HotKeySmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }

    // 50%-hot source key: even ids all land in source "hot"
    val docs = spark.range(n).select(
        col("id"),
        when(col("id") % 2 === 0, lit("hot"))
          .otherwise(concat(lit("s"), pmod(xxhash64(col("id")), lit(8L)))).as("src"),
        pmod(xxhash64(col("id") + 3), lit(5000L)).as("score"))
      .persist()
    time("docs materialize")(docs.count())
    val rn = time(s"rankNormalize ($n rows, 50% hot source)")(
      Features.rankNormalize(docs, col("id"), col("src"), col("score")).count())
    require(rn == n, s"rankNormalize kept $rn of $n rows")

    // 50%-hot group: half the events are one event type
    val ev = spark.range(n).select(
        col("id").as("eid"),
        when(col("id") % 2 === 0, lit("hotg"))
          .otherwise(concat(lit("g"), pmod(xxhash64(col("id")), lit(4L)))).as("g"),
        pmod(xxhash64(col("id") + 11), lit(100000L)).as("k"),
        pmod(xxhash64(col("id") + 17), lit(86400000000L)).as("t"))
      .persist()
    time("events materialize")(ev.count())
    val gp = time(s"gapProfile ($n events, 50% hot group)")(
      Analytics.gapProfile(ev, col("g"), col("k"), col("t"), col("eid")).count())
    require(gp >= 1, "gapProfile returned no groups")

    val fv = spark.range(n).select(
        pmod(xxhash64(col("id")), lit(100000L)).as("u"),
        concat(lit("s"), pmod(xxhash64(col("id") + 7), lit(5L))).as("st"),
        pmod(xxhash64(col("id") + 13), lit(86400000000L)).as("t"))
      .persist()
    time("funnel events materialize")(fv.count())
    val fu = time(s"funnel (5 steps, $n events)")(
      Analytics.funnel(fv, col("u"), col("st"), col("t"),
        Seq("s0", "s1", "s2", "s3", "s4")).collect().map(_.getLong(2)).toSeq)
    require(fu.head > 0, "funnel step 1 empty")
    println(s"funnel users per step: ${fu.mkString(", ")}")
    spark.stop()
  }
}
