package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TextExpressionsSpec extends SparkTestBase {

  test("char_hist_stats: hand-computed histogram over ASCII") {
    import spark.implicits._
    // "aabbbc ": a=2 b=3 c=1 space=1 -> n=7, distinct=4, max=3,
    // collision = 4+9+1+1 = 15
    val out = Seq("aabbbc ").toDF("t")
      .select(TextOps.charHistStats(col("t")).as("s"))
      .select("s.n_chars", "s.distinct_chars", "s.max_char_count", "s.collision_mass")
      .as[(Long, Long, Long, Long)].head()
    assert(out == ((7L, 4L, 3L, 15L)))
  }

  test("char_hist_stats: empty string, null, and non-ASCII fallback") {
    import spark.implicits._
    val rows = Seq(Some(""), None, Some("ééx")).toDF("t")
      .select(TextOps.charHistStats(col("t")).as("s"))
      .select("s.n_chars", "s.distinct_chars", "s.max_char_count", "s.collision_mass")
      .collect()
    assert(rows(0).toSeq == Seq(0L, 0L, 0L, 0L))
    assert(rows(1).toSeq == Seq(null, null, null, null))
    // é=2 (hash-map path), x=1 -> n=3, distinct=2, max=2, coll=5
    assert(rows(2).toSeq == Seq(3L, 2L, 2L, 5L))
  }

  test("char_hist_stats: SQL registration and declarative parity") {
    import spark.implicits._
    spark.range(0).toDF() // force session init
    val df = Seq((0L, "the quick brown fox"), (1L, "zzzzzzzz")).toDF("id", "t")
    df.createOrReplaceTempView("cht")
    val native = spark.sql(
      "SELECT id, char_hist_stats(t).collision_mass AS cm FROM cht ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    // declarative reference: explode chars, count, sum of squares
    val decl = df.select(col("id"), explode(split(col("t"), "")).as("c"))
      .groupBy("id", "c").count()
      .groupBy("id").agg(sum(col("count") * col("count")).as("cm"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(native == decl)
    assert(native(1)._2 == 64L) // 8² for the degenerate doc
  }

  test("term_freqs: single-pass counts match the declarative tokenize form") {
    import spark.implicits._
    val terms = Seq("cat", "dog", "fish tail") // multi-word term can never match
    val texts = Seq(
      "cat cat dog", " cat\tdog \n fish tail", "", "   ", "catcat cat",
      "cat\fdog\r")
    val df = texts.toDF("t")
    val native = df.select(
        TextOps.termFreqs(col("t"), terms).as("s"))
      .select(col("s.dl"), col("s.tfs")).as[(Long, Seq[Long])].collect().toSeq
    val toks = graft.operators.TextAnalysis.tokens(col("t"))
    val decl = df.select(size(toks).cast("long").as("dl"),
        array(terms.map(term =>
          (size(toks) - size(array_remove(toks, lit(term)))).cast("long")): _*).as("tfs"))
      .as[(Long, Seq[Long])].collect().toSeq
    assert(native == decl)
    // spot-check: "catcat cat" -> dl 2, cat 1 (no substring matches)
    assert(native(4) == ((2L, Seq(1L, 0L, 0L))))
  }

  test("charProfile: simpson per-mille flags the degenerate doc") {
    import spark.implicits._
    val df = Seq(
      (0L, "a varied document with many different characters"),
      (1L, "aaaaaaaaaaaaaaaaaaaa")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .charProfile(df, col("doc_id"), col("text"), maxSimpsonPerMille = 500L)
      .orderBy("doc_id")
      .select("doc_id", "simpson_per_mille", "kept")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out(1) == ((1L, 1000L, false))) // single repeated char -> 1000
    assert(out(0)._2 < 200L && out(0)._3)
  }

  test("nfc_normalize: decomposed and precomposed forms converge; idempotent; ASCII untouched") {
    import spark.implicits._
    val decomposed = "cafe\u0301 nai\u0308ve"
    val precomposed = "caf\u00e9 na\u00efve"
    assert(decomposed != precomposed) // different codepoints before NFC
    val df = Seq((0L, decomposed), (1L, precomposed), (2L, "plain ascii")).toDF("id", "t")
    val out = df.select(col("id"), TextOps.nfcNormalize(col("t")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(0L) == out(1L), "NFC must converge the two spellings")
    assert(out(1L) == precomposed)
    assert(out(2L) == "plain ascii")
    // idempotent + SQL-registered
    val twice = df.selectExpr("nfc_normalize(nfc_normalize(t)) AS a", "nfc_normalize(t) AS b")
      .where(col("a") =!= col("b")).count()
    assert(twice == 0L)
  }

  test("strip_accents: NFD-minus-combining reference; non-decomposable letters pass through") {
    import spark.implicits._
    val df = Seq("café naïve Müller São ł ø café")
      .toDF("t")
    val got = df.select(TextOps.stripAccents(col("t"))).as[String].head()
    assert(got == "cafe naive Muller Sao ł ø cafe")
    // SQL registration
    assert(df.selectExpr("strip_accents(t)").as[String].head() == got)
  }
}
