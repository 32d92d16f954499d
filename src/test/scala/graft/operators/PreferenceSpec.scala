package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PreferenceSpec extends SparkTestBase {
  import spark.implicits._

  test("winRates: hand-computed wins/losses/ppm/borda") {
    // 1 beats 2 twice, 2 beats 1 once, 1 beats 3 once
    val comps = Seq((1L, 2L), (1L, 2L), (2L, 1L), (1L, 3L)).toDF("w", "l")
    val r = Preference.winRates(comps, col("w"), col("l"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // item 1: 3 wins 1 loss -> 750000 ppm, borda 2
    // item 2: 1 win 2 losses -> 333333 ppm, borda -1
    // item 3: 0 wins 1 loss -> 0 ppm, borda -1
    assert(r.toSeq == Seq(
      (1L, 3L, 1L, 750000L, 2L),
      (2L, 1L, 2L, 333333L, -1L),
      (3L, 0L, 1L, 0L, -1L)))
  }

  test("majorityEdges: direction by strict majority, exact ties dropped") {
    val comps = Seq(
      (1L, 2L), (1L, 2L), (2L, 1L), // 1 majority-beats 2 (2:1)
      (3L, 4L), (4L, 3L)) // exact tie -> no edge
      .toDF("w", "l")
    val r = Preference.majorityEdges(comps, col("w"), col("l"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L, 2L, 1L)))
  }

  test("consistencyAudit: rock-paper-scissors cycle counted once") {
    val comps = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("w", "l")
    val r = Preference.consistencyAudit(comps, col("w"), col("l"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(r == ((3L, 0L, 3L, 1L)))
  }

  test("consistencyAudit: transitive triangle has zero cycles; ties counted") {
    val comps = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), // transitive
      (4L, 5L), (5L, 4L)) // tie pair
      .toDF("w", "l")
    val r = Preference.consistencyAudit(comps, col("w"), col("l"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(r == ((4L, 1L, 3L, 0L)))
  }

  test("bradleyTerry: two items converge to the 2:1 odds fixed point — hand-computed") {
    val comps = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("w", "l")
    // S=1e6. r1: d = 3e12//2e6 = 1.5e6 both; w1 = 2e12//1.5e6 = 1333333,
    // w2 = 1e12//1.5e6 = 666666. r2: d = 3e12//1999999 = 1500000 ->
    // identical w's; r3 likewise — the integer fixed point of p=2/3.
    val r = Preference.bradleyTerry(comps, col("w"), col("l"), iters = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1L, 2L, 3L, 1333333L), (2L, 1L, 3L, 666666L)))
  }

  test("bradleyTerry: winless item pins to zero strength; ranking follows dominance") {
    // 1 beats 2 and 3; 2 beats 3; 3 never wins
    val comps = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("w", "l")
    val r = Preference.bradleyTerry(comps, col("w"), col("l"), iters = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val strength = r.map(x => x._1 -> x._4).toMap
    assert(strength(3L) == 0L)
    assert(strength(1L) > strength(2L) && strength(2L) > 0L)
  }

  test("bradleyTerry: deterministic across partitionings") {
    val comps = spark.range(5000)
      .select((col("id") % 19).as("w"), ((col("id") * 7 + 3) % 17).as("l"))
      .where(col("w") =!= col("l"))
    val a = Preference.bradleyTerry(comps.repartition(1), col("w"), col("l"), iters = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Preference.bradleyTerry(
        comps.repartition(9, col("l")), col("w"), col("l"), iters = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("consistencyAudit: deterministic across partitionings") {
    val comps = spark.range(2000)
      .select((col("id") % 13).as("w"), ((col("id") * 7) % 11).as("l"))
      .where(col("w") =!= col("l"))
    val a = Preference.consistencyAudit(comps.repartition(1), col("w"), col("l"))
      .as[(Long, Long, Long, Long)].collect().head
    val b = Preference.consistencyAudit(
        comps.repartition(7, col("l")), col("w"), col("l"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(a == b)
  }
}
