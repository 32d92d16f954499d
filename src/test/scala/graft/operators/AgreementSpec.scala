package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AgreementSpec extends SparkTestBase {

  test("fleissKappa: hand-computed pooled kappa; single-rating items excluded; degenerate zero") {
    import spark.implicits._
    // i1: [A,A,B] -> ai 2, pi 6; i2: [A,A] -> ai 2, pi 2; i3: [B] excluded
    // A=4 P=8 po=500000; kept marginals A=4,B=1, N=5, S=17 ->
    // pe = 17/25 = 680000; kappa = (4*25-8*17)/(8*(25-17)) = -36/64
    val df = Seq(("i1", "A"), ("i1", "A"), ("i1", "B"),
      ("i2", "A"), ("i2", "A"), ("i3", "B")).toDF("it", "lab")
    val r = Agreement.fleissKappa(df, col("it"), col("lab"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r == ((2L, 5L, 500000L, 680000L, -562500L)))
    // constant labels: po = pe = 1 -> kappa 0 by the pe=1 convention
    val const = Seq(("i1", "A"), ("i1", "A"), ("i2", "A"), ("i2", "A"))
      .toDF("it", "lab")
    val rc = Agreement.fleissKappa(const, col("it"), col("lab"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(rc == ((2L, 4L, 1000000L, 1000000L, 0L)))
    // nothing multi-rated: all-zero summary, no division error
    val solo = Seq(("i1", "A"), ("i2", "B")).toDF("it", "lab")
    val rs = Agreement.fleissKappa(solo, col("it"), col("lab"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(rs == ((0L, 0L, 0L, 0L, 0L)))
  }
  import spark.implicits._

  test("cohenKappa: textbook 2x2 example — hand-computed") {
    // 20 items: A/B agree on 10 yes + 5 no, disagree on 5.
    // marginals: rA(yes)=13, rA(no)=7; cB(yes)=12, cB(no)=8
    // S = 13*12 + 7*8 = 212; po = 15/20; pe = 212/400
    // kappa = (20*15 - 212)/(400 - 212) = 88/188
    val rows =
      Seq.fill(10)(("y", "y")) ++ Seq.fill(5)(("n", "n")) ++
        Seq.fill(3)(("y", "n")) ++ Seq.fill(2)(("n", "y"))
    val r = Agreement.cohenKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(r._1 == 20L && r._2 == 15L && r._3 == 2L)
    assert(r._4 == 750000L) // po
    assert(r._5 == 212L * 1000000L / 400L) // pe = 530000
    assert(r._6 == 88L * 1000000L / 188L) // kappa = 468085
  }

  test("cohenKappa: perfect agreement -> kappa 10^6; constant labelers -> 0 by convention") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("a", "b")
    val p = Agreement.cohenKappa(perfect, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(p._6 == 1000000L && p._4 == 1000000L)
    // both constant: pe = 1, the 0/0 case
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val c = Agreement.cohenKappa(const, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(c._6 == 0L && c._5 == 1000000L)
  }

  test("cohenKappa: worse-than-chance agreement is negative") {
    // systematic disagreement: A says y where B says n and vice versa
    val rows = Seq.fill(9)(("y", "n")) ++ Seq.fill(9)(("n", "y")) ++
      Seq(("y", "y"), ("n", "n"))
    val r = Agreement.cohenKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(r._6 < 0L)
  }

  test("cohenKappa: label used by only one annotator still counts in the domain") {
    val rows = Seq(("a", "a"), ("a", "c"), ("b", "a")).toDF("a", "b")
    val r = Agreement.cohenKappa(rows, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(r._3 == 3L) // labels a, b, c
  }

  test("cohenKappa matches a brute-force double computation on pseudo-random labels") {
    val n = 997
    val data = (0 until n).map { i =>
      ((i * 2654435761L % 1000000007L % 3).toString,
        (i * 40503L % 65537L % 3).toString)
    }
    val r = Agreement.cohenKappa(data.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val agree = data.count { case (a, b) => a == b }.toLong
    val ra = data.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cb = data.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val s = (ra.keySet ++ cb.keySet).toSeq
      .map(k => ra.getOrElse(k, 0L) * cb.getOrElse(k, 0L)).sum
    val num = n.toLong * agree - s
    val den = n.toLong * n - s
    val kappa =
      if (den == 0) 0L
      else (if (num >= 0) 1L else -1L) * (math.abs(num) * 1000000L / den)
    assert(r._1 == n && r._2 == agree && r._6 == kappa)
  }

  test("confusionMatrix: counts and ppm shares") {
    val rows = Seq(("y", "y"), ("y", "n"), ("y", "n"), ("n", "n")).toDF("a", "b")
    val r = Agreement.confusionMatrix(rows, col("a"), col("b"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(r == Set(
      ("y", "y", 1L, 250000L),
      ("y", "n", 2L, 500000L),
      ("n", "n", 1L, 250000L)))
  }

  test("cohenKappa: deterministic across partitionings") {
    val df = spark.range(3000)
      .select((col("id") % 5).cast("string").as("a"),
        ((col("id") * 7 + 1) % 4).cast("string").as("b"))
    val one = Agreement.cohenKappa(df.repartition(1), col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val many = Agreement.cohenKappa(df.repartition(13), col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(one == many)
  }
}
