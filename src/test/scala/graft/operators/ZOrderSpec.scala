package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.{LayoutOps, LayoutRuntime}

class ZOrderSpec extends SparkTestBase {

  test("interleave2: hand-computed Morton codes") {
    // x=3 (bits 0,1 -> even positions 0,2 = 5), y=5 (bits 0,2 -> odd
    // positions 1,5 = 34) -> 39
    assert(LayoutRuntime.interleave2(3L, 5L) == 39L)
    assert(LayoutRuntime.interleave2(0L, 0L) == 0L)
    assert(LayoutRuntime.interleave2(1L, 0L) == 1L)
    assert(LayoutRuntime.interleave2(0L, 1L) == 2L)
    // max 31-bit inputs -> all 62 bits set, positive
    val zMax = LayoutRuntime.interleave2(0x7fffffffL, 0x7fffffffL)
    assert(zMax == (1L << 62) - 1 && zMax > 0)
    // inputs are masked to 31 bits: bit 31 and above ignored
    assert(LayoutRuntime.interleave2(1L << 31 | 3L, 0L) ==
      LayoutRuntime.interleave2(3L, 0L))
  }

  test("interleave2: bit-exact vs naive per-bit reference on a grid") {
    def naive(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 31) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    for (x <- Seq(0L, 1L, 7L, 100L, 12345L, 2147483647L);
         y <- Seq(0L, 2L, 99L, 65535L, 2147483646L))
      assert(LayoutRuntime.interleave2(x, y) == naive(x, y), s"($x, $y)")
  }

  test("zorder2 column + SQL registration agree with the runtime") {
    import spark.implicits._
    val df = Seq((3L, 5L), (100L, 200L)).toDF("x", "y")
    val viaCol = df.select(LayoutOps.zorder2(col("x"), col("y")))
      .as[Long].collect().toSeq
    df.createOrReplaceTempView("zin")
    val viaSql = spark.sql("SELECT zorder2(x, y) FROM zin")
      .as[Long].collect().toSeq
    val expect = Seq(LayoutRuntime.interleave2(3, 5), LayoutRuntime.interleave2(100, 200))
    assert(viaCol == expect && viaSql == expect)
  }

  test("z-order buckets bound both dimensions (the pruning property)") {
    import spark.implicits._
    // 64x64 grid: with bucket width 1024 = 2^10, each bucket is a
    // 32x32 Morton quadrant -> every bucket's rectangle is 32 wide in
    // BOTH dims (row-major layout would leave y spanning the full 64).
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val stats = Scale.zorderBucketStats(grid, col("x"), col("y"), bucketWidth = 1024L)
      .collect()
    assert(stats.length == 4)
    stats.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") == 31L)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") == 31L)
      assert(r.getAs[Long]("n_rows") == 1024L)
    }
  }

  test("writeZOrderClusteredParquet: deterministic shards, tight rectangles") {
    import spark.implicits._
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val manifest = Scale.writeZOrderClusteredParquet(
      grid, col("x"), col("y"), nShards = 4, path = dir).collect()
    assert(manifest.map(_.getAs[Long]("n_rows")).sum == 1024L)
    assert(manifest.length == 4)
    // each of the 4 shards is one Morton quadrant: a 16x16 rectangle
    manifest.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 15L)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 15L)
    }
    // written files carry ONLY the user schema (+ shard) — the
    // __x/__y/__z plan helpers must not leak into the release artifact
    val written = spark.read.parquet(s"$dir/shard=0")
    assert(written.columns.toSet == Set("x", "y"),
      s"helper columns leaked into the export: ${written.columns.toSeq}")
    // written rows are z-sorted within each shard (z re-derived from
    // the user columns)
    val shard0 = written
      .select(LayoutOps.zorder2(col("x"), col("y"))).as[Long].collect()
    assert(shard0.toSeq == shard0.sorted.toSeq)
  }

  test("writeZOrderClusteredParquet: dataframe-bound x/y columns resolve in the manifest") {
    import spark.implicits._
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorderbound").toString
    // df("col") columns carry AttributeReferences bound to the INPUT
    // plan; the manifest re-reads the written files, so the operator
    // must rebind them by name or the final aggregate throws
    // AnalysisException on foreign exprIds
    val manifest = Scale.writeZOrderClusteredParquet(
      grid, grid("x"), grid("y") + lit(0L), nShards = 2, path = dir).collect()
    assert(manifest.map(_.getAs[Long]("n_rows")).sum == 256L)
    assert(manifest.map(r =>
      (r.getAs[Long]("min_x"), r.getAs[Long]("max_x"))).forall {
        case (lo, hi) => lo >= 0L && hi <= 15L && lo <= hi })
  }
}
