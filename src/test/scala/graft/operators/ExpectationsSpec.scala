package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ExpectationsSpec extends SparkTestBase {

  test("audit: hand-computed violations, null predicates don't violate, empty input all-zero") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(5.0), "A"), (2L, Some(60.0), "A"), (3L, None, "X"),
      (4L, Some(-1.0), "N")).toDF("id", "q", "flag")
    val out = Expectations.audit(df, Seq(
      "q_range" -> (col("q") < 0 || col("q") > 50), // null q -> not violating
      "q_null" -> col("q").isNull,
      "flag_enum" -> !col("flag").isin("A", "N")))
      .orderBy("rule")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      ("flag_enum", 4L, 1L, 250000L, false),
      ("q_null", 4L, 1L, 250000L, false),
      ("q_range", 4L, 2L, 500000L, false)))
    val empty = Expectations.audit(df.where(lit(false)), Seq(
      "q_null" -> col("q").isNull))
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(empty == Seq(("q_null", 0L, 0L, 0L, true)))
    // one scan, zero exchanges beyond the single-partition final agg
    val plan = Expectations.audit(df, Seq("a" -> col("q").isNull))
    assert(Scale.countShuffles(plan) <= 1,
      plan.queryExecution.executedPlan.toString)
  }

  test("referentialIntegrity: orphans counted, null child keys are orphans") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(2L), Some(9L), None)
      .toDF("k").select(col("k").as("ck"))
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Expectations.referentialIntegrity(child, col("ck"), parent, col("pk"))
      .as[(Long, Long, Long, Long)].head()
    // orphans: 9 and null -> 2 rows; distinct orphan keys: 9 (null not counted by countDistinct)
    assert(r == ((5L, 2L, 400000L, 1L)))
  }

  test("schemaDiff: added/removed/changed/unchanged per column; nullability excluded") {
    import spark.implicits._
    val ref = Seq((1L, "a", 2.0)).toDF("id", "s", "v")
    val cur = ref.drop("v")
      .withColumn("s", col("s").cast("binary")) // type change
      .withColumn("extra", lit(1))              // addition
    val d = Expectations.schemaDiff(ref, cur)
      .orderBy("col_name").as[(String, String)].collect().toSeq
    assert(d == Seq(
      ("extra", "added"), ("id", "unchanged"),
      ("s", "changed"), ("v", "removed")))
    // identical schemas diff to all-unchanged even across nullability
    // differences (types are the portable contract)
    val nullable = Seq((Option(1L), Option("a"))).toDF("id", "s")
    val strict = Seq((1L, "a")).toDF("id", "s")
    val d2 = Expectations.schemaDiff(strict, nullable)
      .as[(String, String)].collect().toSeq
    assert(d2.forall(_._2 == "unchanged"), d2.toString)
  }

  test("keyUniqueness: duplicate-key profile hand-computed") {
    import spark.implicits._
    val df = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
    val r = Expectations.keyUniqueness(df, col("k"))
      .as[(Long, Long, Long, Long, Long)].head()
    // 6 rows, 3 keys, 2 dup keys, hottest 3, dup rows 5 -> 833333 ppm
    assert(r == ((6L, 3L, 2L, 3L, 833333L)))
  }
}
