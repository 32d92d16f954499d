package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Phase-level timing probe for the hierarchical storage lifecycle
  * (q278's shape) at a given sf dir — isolates where the wall time of
  * copy → append(base+layer) → delete(base+layer) → layered serve
  * goes, so the per-query bench cost is optimized against data, not
  * guesses. Dev-only; not part of the contract surface.
  */
object HierLifecycleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val member1 = Similarity.knnLayerMemberFilter(col("id"), 1, 8)
    val old = e.where(pmod(col("id"), lit(5L)) =!= 4)
    val g0 = timed("build base")(Similarity.knnGraphBuild(old, 8, 3, 32, 5, 3).localCheckpoint())
    val l0 = timed("build layer")(Similarity.knnGraphBuild(old.where(member1), 8, 3, 32, 5, 3).localCheckpoint())
    val path = "/tmp/hier_probe_idx"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val idx = timed("write store")(Similarity.knnGraphWritePartitioned(
      spark, g0, old, path, parts = 8, k = 8, lshBits = 5, lshTables = 3,
      anchorsPerBucket = 32, layerFactor = 8))
    timed("write layer")(Similarity.knnGraphWriteLayer(spark, idx, 1, l0, old.where(member1)))
    (1 to 2).foreach { rep =>
      val mut = path + "_mut"
      fs.delete(new org.apache.hadoop.fs.Path(mut), true)
      timed(s"copy r$rep") {
        def cp(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(src).iterator().asScala.foreach { p =>
            val q = dst.resolve(src.relativize(p))
            if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(q)
            else { java.nio.file.Files.createDirectories(q.getParent)
              java.nio.file.Files.copy(p, q) }
          }
        }
        cp(java.nio.file.Paths.get(path), java.nio.file.Paths.get(mut))
      }
      val midx = idx.copy(path = mut)
      // base-only variants first: mutate a layer-stripped copy
      val flat = path + "_flat"
      fs.delete(new org.apache.hadoop.fs.Path(flat), true)
      timed(s"copy flat r$rep") {
        def cp(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(src).iterator().asScala.foreach { p =>
            val q = dst.resolve(src.relativize(p))
            if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(q)
            else { java.nio.file.Files.createDirectories(q.getParent)
              java.nio.file.Files.copy(p, q) }
          }
        }
        cp(java.nio.file.Paths.get(path), java.nio.file.Paths.get(flat))
        fs.delete(new org.apache.hadoop.fs.Path(flat + "/layer1"), true)
      }
      val fidx = idx.copy(path = flat)
      timed(s"append flat r$rep")(Similarity.knnGraphAppendPartitioned(
        spark, fidx, e, pmod(col("id"), lit(5L)) === 4))
      timed(s"delete flat r$rep")(Similarity.knnGraphDeletePartitioned(
        spark, fidx, e, pmod(col("id"), lit(7L)) === 3))
      timed(s"append hier r$rep")(Similarity.knnGraphAppendPartitioned(
        spark, midx, e, pmod(col("id"), lit(5L)) === 4))
      timed(s"delete hier r$rep")(Similarity.knnGraphDeletePartitioned(
        spark, midx, e, pmod(col("id"), lit(7L)) === 3))
      timed(s"serve r$rep")(Similarity.knnGraphServeLayered(
        e.where(col("id") < 5),
        Seq(Similarity.knnGraphReadLayer(spark, midx, 1),
          Similarity.knnGraphReadEdges(spark, midx)), e,
        k = 5, beam = 8, hopsPerLayer = 2).count())
    }
    // delete-cycle internals on a fresh flat copy: where do the
    // seconds go?
    val f2 = path + "_flat2"
    fs.delete(new org.apache.hadoop.fs.Path(f2), true)
    locally {
      import scala.jdk.CollectionConverters._
      val s0 = java.nio.file.Paths.get(path); val d0 = java.nio.file.Paths.get(f2)
      java.nio.file.Files.walk(s0).iterator().asScala.foreach { p =>
        val q = d0.resolve(s0.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(q)
        else { java.nio.file.Files.createDirectories(q.getParent)
          java.nio.file.Files.copy(p, q) }
      }
      fs.delete(new org.apache.hadoop.fs.Path(f2 + "/layer1"), true)
    }
    val fidx2 = idx.copy(path = f2)
    val del = pmod(col("id"), lit(7L)) === 3
    val stored = timed("d: read stored")(spark.read.parquet(fidx2.edgesPath)
      .select(col("node_id"), col("nb_rank"), col("neighbor_id"), col("cos")))
    val (changed, affectedRows, _) =
      timed("d: deleteParts plan+ckpt")(Similarity.knnGraphDeleteParts(stored, e, del, 8))
    val parts8 = timed("d: changed collect")(changed
      .select(pmod(col("node_id"), lit(8L))).distinct().collect()).length
    println(s"d: affected parts = $parts8")
    val t1 = System.nanoTime()
    val (newAnchors, resigned) = Similarity.knnGraphDeleteAnchorRecut(
      spark.read.parquet(fidx2.anchorsPath), e, del, 5, 3, fidx2.anchorDepth)
    println(f"d: recut stats collect ${(System.nanoTime() - t1) / 1e9}%.2fs, resigned=${resigned.size}")
    timed("d: anchors write")(newAnchors.orderBy("tb", "bkt", "id").coalesce(1)
      .write.mode("overwrite").parquet(f2 + "/anchors_probe"))
    timed("d: edges write")(affectedRows
      .withColumn("part", pmod(col("node_id"), lit(8L)))
      .repartition(col("part"))
      .sortWithinPartitions("part", "node_id", "nb_rank")
      .write.mode("overwrite").partitionBy("part").parquet(f2 + "/edges_probe"))
    spark.stop()
  }
}
