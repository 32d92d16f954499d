package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.xml._
import graft.operators.Relational

object ProfileXml {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"TIME $label: ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    val dtd = Dtd.parse("/tmp/big.dtd")
    val records = XmlRecords.read(spark, "/tmp/big.xml", dtd).persist()
    time("parse+persist")(records.count())
    val schema = time("inferColumns")(Flatten.inferColumns(records, dtd))
    val flat = schema.map { case (t, cs) => t -> Flatten.flattenType(records.toDF(), t, cs) }
    time("flatten all(count)")(flat.values.map(_.count()).sum)
    val idMap = Relational.withContiguousId(
      flat.values.map(_.select(col("pos"))).reduce(_ unionAll _).orderBy("pos"), "id").persist()
    time("idMap")(idMap.count())
    val withIds = flat.map { case (t, df) =>
      t -> df.join(idMap, "pos").select((col("id") +: schema(t).map(col)): _*) }
    time("join+count")(withIds.values.map(_.count()).sum)
    val exploded = Flatten.explodedValues(records.toDF(), schema)
    time("explodedValues count")(exploded.count())
    time("columnMeta")(Annotate.columnMeta(exploded))
    spark.stop()
  }
}
