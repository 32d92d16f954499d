package graft.operators

import graft.SparkTestBase

class ProfilingSpec extends SparkTestBase {

  test("columnStats: one-pass per-column counts, nulls, min/max") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("b"), Some(10)),
      (2L, None, Some(30)),
      (3L, Some("a"), None)).toDF("id", "s", "v")
    val stats = Profiling.columnStats(df, Seq("id", "s", "v"))
      .orderBy("col_name")
      .as[(String, Long, Long, String, String)].collect().toSeq
    assert(stats == Seq(
      ("id", 3L, 0L, "1", "3"),
      ("s", 2L, 1L, "a", "b"),
      ("v", 2L, 1L, "10", "30")))
    // single aggregate pass: exactly one exchange (the global agg)
    val plan = Profiling.columnStats(df, Seq("id", "s", "v"))
    assert(Scale.countShuffles(plan) == 1,
      plan.queryExecution.executedPlan.toString)
  }
}
