package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

class BloomExpressionsSpec extends SparkTestBase {

  private def filterOf(items: Seq[Long], fpp: Double = 0.01): Array[Byte] = {
    val bf = BloomFilter.create(math.max(items.size.toLong, 64L), fpp)
    items.foreach(bf.putLong)
    BloomOps.serialize(bf)
  }

  test("bloom_might_contain: no false negatives, nulls propagate") {
    import spark.implicits._
    val inserted = (0L until 1000L).map(_ * 7L)
    val bytes = filterOf(inserted)
    val df = (inserted ++ Seq(3L, 11L)).toDF("v")
      .select(col("v"), BloomOps.mightContain(col("v"), bytes).as("hit"))
    val hits = df.where(col("hit")).select("v").as[Long].collect().toSet
    assert(inserted.toSet.subsetOf(hits), "an inserted value probed negative")

    val withNull = Seq[java.lang.Long](1L, null).toDF("v")
      .select(BloomOps.mightContain(col("v"), bytes).as("hit"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(withNull.contains(None), "null probe must stay null")
  }

  test("false-positive rate is in the configured ballpark") {
    import spark.implicits._
    val bytes = filterOf((0L until 10000L).map(_ * 3L), fpp = 0.01)
    // probe 10k values that were NOT inserted
    val fp = (0L until 10000L).map(_ * 3L + 1L).toDF("v")
      .where(BloomOps.mightContain(col("v"), bytes))
      .count()
    assert(fp < 500, s"fp rate ${fp / 10000.0} far above configured 0.01")
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.{BinaryType, LongType}
    import spark.implicits._
    val bytes = filterOf(Seq(1L, 2L, 3L))
    val df = Seq(1L, 4L).toDF("v")
    val viaCodegen = df.select(BloomOps.mightContain(col("v"), bytes))
      .collect().map(_.getBoolean(0)).toSeq
    val expr = BloomMightContain(
      BoundReference(0, LongType, nullable = true), Literal(bytes, BinaryType))
    val viaEval = Seq(1L, 4L).map(v => expr.eval(InternalRow(v)).asInstanceOf[Boolean])
    assert(viaCodegen == viaEval)
    assert(viaCodegen == Seq(true, false))
  }

  test("a NULL filter is rejected at analysis, not as a task NPE") {
    import spark.implicits._
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("v").createOrReplaceTempView("bloom_null_t")
      spark.sql("SELECT bloom_might_contain(v, CAST(NULL AS BINARY)) FROM bloom_null_t").collect()
    }
    assert(e.getMessage.contains("must not be null"), e.getMessage)
  }

  test("SQL registration works") {
    import spark.implicits._
    val bytes = filterOf(Seq(42L))
    Seq(42L, 43L).toDF("v").createOrReplaceTempView("bloom_probe_t")
    // hex-literal the filter bytes through the SQL path
    val hex = bytes.map("%02X".format(_)).mkString
    val out = spark.sql(
      s"SELECT v, bloom_might_contain(v, X'$hex') AS hit FROM bloom_probe_t ORDER BY v")
      .as[(Long, Boolean)].collect().toSeq
    assert(out == Seq((42L, true), (43L, false)))
  }
}
