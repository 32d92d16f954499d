package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._

/** Volume smoke for the round-11 evaluation / analytics / profiling
  * operator families: synthetic 10M-row event stream (100k users) and
  * 1M-doc corpus, each statistic timed end-to-end at local[32].
  *
  * Usage: runMain graft.dev.EvalSmoke [nEvents] [nDocs]
  */
object EvalSmoke {
  def main(args: Array[String]): Unit = {
    val nEv = if (args.length > 0) args(0).toLong else 10000000L
    val nDocs = if (args.length > 1) args(1).toLong else 1000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }

    val ev = spark.range(nEv).select(
        col("id").as("eid"),
        pmod(xxhash64(col("id")), lit(100000L)).as("u"),
        concat(lit("s"), pmod(xxhash64(col("id") + 7), lit(5L))).as("st"),
        pmod(xxhash64(col("id") + 13), lit(86400000000L)).as("t"))
      .persist()
    time("events materialize")(ev.count())

    val fu = time("funnel (3 steps, 100k users)")(
      Analytics.funnel(ev, col("u"), col("st"), col("t"), Seq("s0", "s1", "s2"))
        .collect().map(_.getLong(2)).toSeq)
    val co = time("cohortRetention (hour periods)")(
      Analytics.cohortRetention(ev, col("u"), expr("t div 3600000000L")).count())
    val gp = time("gapProfile (5 types x 100k keys)")(
      Analytics.gapProfile(ev, col("st"), col("u"), col("t"), col("eid")).count())
    val sk = time("skewProfile (top 20)")(
      Analytics.skewProfile(ev, col("u"), topK = 20, targetPerTask = 1000L).count())
    val tm = time("transitionMatrix (5x5 states)")(
      Relational.transitionMatrix(ev, col("u"), col("st"), col("t"), col("eid")).count())

    val scored = ev.select(pmod(col("t"), lit(1000001L)).as("s"),
      (col("eid") % 3 === 0).as("y"))
    val auc = time("aucExact (10M rows, ppm score domain)")(
      Training.aucExact(scored, col("s"), col("y"))
        .collect().head.getLong(3))
    val aucG = time("aucByGroup (5 groups)")(
      Training.aucByGroup(scored.withColumn("g", pmod(col("s"), lit(5L))),
        col("g"), col("s"), col("y")).count())
    val pr = time("prCurve (distinct-score sweep)")(
      Training.prCurve(scored, col("s"), col("y")).count())
    val cb = time("calibrationBins (10 bins)")(
      Training.calibrationBins(scored, col("s"), col("y"), nBins = 10).count())

    // 1M-doc corpus, 45 words each, 1-in-20 exact dup
    val base = spark.range(nDocs)
      .withColumn("b", when(col("id") % 20 === 1, col("id") - 1).otherwise(col("id")))
    val words = (0 until 45).map(i =>
      concat(lit("w"), pmod(xxhash64(col("b") * 100 + i), lit(30000L))))
    val docs = base.select(col("id").as("doc_id"),
        concat_ws(" ", words: _*).as("text"),
        pmod(xxhash64(col("id") + 3), lit(20L)).cast("string").as("src"))
      .persist()
    time("corpus materialize")(docs.count())

    val ds = time("dedupStats (1-in-20 dups)")(
      Dedup.dedupStats(docs, col("doc_id"), col("text")).count())
    val cr = time("contaminationRate (1% bench, 8-grams)")(
      Dedup.contaminationRate(
        docs.where(col("doc_id") % 100 =!= 0), col("doc_id"), col("text"),
        docs.where(col("doc_id") % 100 === 0), col("text"), n = 8).count())
    val nd = time("ngramDiversity (20 sources, 3-grams)")(
      TextAnalysis.ngramDiversity(docs, col("src"), col("text"), n = 3).count())
    val vr = time("vocabRichness (30k-type vocab)")(
      TextAnalysis.vocabRichness(docs, col("text")).collect().head.getLong(4))
    val rn = time("rankNormalize (20 sources)")(
      Features.rankNormalize(docs, col("doc_id"), col("src"),
        length(col("text"))).count())
    val te = time("targetEncode (20 categories)")(
      Features.targetEncode(docs, col("doc_id"), col("src"),
        col("doc_id") % 7 === 0, m = 20).count())
    val hf = time("hashFeatures (dim=256, 45M tokens)")(
      Features.hashFeatures(docs, col("doc_id"), col("text"), dim = 256).count())
    val ka = time("cohenKappa (two labelers)")(
      Agreement.cohenKappa(docs,
        when(length(col("text")) % 2 === 0, 1L).otherwise(0L),
        when(col("doc_id") % 2 === 0, 1L).otherwise(0L))
        .collect().head.getLong(5))
    val sa = time("selectionAudit (20 groups)")(
      Privacy.selectionAudit(docs, col("src"), col("doc_id") % 3 === 0).count())
    val hd = time("histogramDrift (even/odd halves)")(
      Profiling.histogramDrift(
        docs.where(col("doc_id") % 2 === 0), pmod(col("doc_id"), lit(16L)),
        docs.where(col("doc_id") % 2 === 1), pmod(col("doc_id"), lit(16L))).count())

    // 2-word names over a 3k-word vocab, right side = 1% dirty copy
    val names = spark.range(nDocs / 2).select(col("id"),
        concat(lit("n"), pmod(xxhash64(col("id") * 3), lit(3000L)), lit(" m"),
          pmod(xxhash64(col("id") * 7), lit(3000L))).as("name"))
      .persist()
    names.count()
    val dirty = names.where(col("id") % 100 === 3)
      .select((col("id") + nDocs).as("id"), concat(col("name"), lit("x")).as("name"))
    val fl = time("fuzzyLink (500k x 5k names, token blocking)")(
      Dedup.fuzzyLink(names, col("id"), col("name"),
        dirty, col("id"), col("name"), maxDist = 2).count())
    names.unpersist()
    val baskets = spark.range(nEv / 2).select(
      pmod(xxhash64(col("id")), lit(nEv / 16)).as("b"),
      pmod(xxhash64(col("id") + 5), lit(5000L)).as("i"))
    val cooc = time("coOccurrence (5M rows, ~312k baskets)")(
      Analytics.coOccurrence(baskets, col("b"), col("i"),
        maxBasket = 24, minSupport = 2L, topK = 50).count())

    println(s"RESULT nEvents=$nEv nDocs=$nDocs funnel=${fu.mkString("/")} " +
      s"cohortRows=$co gapGroups=$gp skewRows=$sk transitions=$tm " +
      s"auc=$auc aucGroups=$aucG prRows=$pr calibBins=$cb " +
      s"dedupSizes=$ds contamDocs=$cr diversityGroups=$nd chao1=$vr " +
      s"rankRows=$rn encRows=$te hashRows=$hf kappa=$ka auditRows=$sa driftBins=$hd " +
      s"fuzzyMatches=$fl coocPairs=$cooc")
    spark.stop()
  }
}
