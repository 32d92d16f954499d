package graft.sink

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro Object Container File interchange — the row-oriented format
  * beside the columnar exporters (parquet q88 / ORC q184) and the
  * text ones (JSONL q116 / WARC q126). Built directly on avro-core's
  * PUBLIC container API (`DataFileWriter`/`DataFileStream`,
  * Apache Avro spec §Object Container Files): the Spark Avro
  * DATASOURCE module is a separate artifact this environment does not
  * ship, but the format itself needs only the core jar.
  *
  * Determinism contract (same as every exporter here): shard
  * membership is `pmod(key, nShards)` — a pure function of the data —
  * rows are written in ascending key order within each shard, the OCF
  * sync marker is DERIVED from the shard number instead of
  * `DataFileWriter`'s default random marker, and blocks are
  * deflate-compressed at a fixed level; re-running the same export
  * over the same data reproduces every file byte-for-byte
  * (AvroArchiveSpec pins it).
  *
  * Scale shape: one dynamic pass — rows cross ONE hash exchange keyed
  * by shard, each task streams its shards' rows through sequential
  * container writers (sorted input means a shard change is a file
  * change), and the READER parallelizes over files, each a sequential
  * block-decoded scan. The returned manifest is re-aggregated from
  * the WRITTEN files, so it certifies the export, not the plan.
  */
object AvroArchive {

  /** Hadoop `Configuration` is not `java.io.Serializable`; this is the
    * standard wrapper (the pattern Spark's own sinks use) so the
    * DRIVER's filesystem configuration — s3a credentials,
    * fs.defaultFS, HDFS overrides living in the SparkSession conf —
    * reaches the write tasks. Resolving the FileSystem from a fresh
    * `new Configuration()` on the executor would silently split-brain
    * the export: driver-side prep against the configured fs,
    * task-side data against the default one.
    */
  private class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** Map a FLAT primitive Spark schema to the equivalent Avro record
    * schema (nullable fields become `union(null, T)` — Avro's
    * standard optionality encoding).
    */
  private[sink] def avroSchema(st: StructType, name: String): Schema = {
    def prim(dt: DataType): Schema = dt match {
      case LongType    => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case other => throw new IllegalArgumentException(
        s"AvroArchive supports flat primitive columns, got $other " +
          "(project arrays/structs to scalars upstream)")
    }
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      val base = prim(f.dataType)
      val s =
        if (f.nullable)
          Schema.createUnion(java.util.Arrays.asList(
            Schema.create(Schema.Type.NULL), base))
        else base
      fields.add(new Schema.Field(f.name, s, null, null.asInstanceOf[Object]))
    }
    val rec = Schema.createRecord(name, null, "graft.avro", false)
    rec.setFields(fields)
    rec
  }

  /** Deterministic 16-byte OCF sync marker per shard — md5 of a fixed
    * tag, so a re-run writes byte-identical files (the default marker
    * is random, which would defeat export-level reproducibility).
    */
  private def syncMarker(shard: Long): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft-avro-shard-$shard".getBytes("UTF-8"))

  /** Write `df` as a deterministic `nShards`-sharded Avro OCF archive
    * under `path/shard=N/part-N.avro` and return the
    * (shard, n_rows, min_key, max_key) manifest RE-AGGREGATED from the
    * written files ([[graft.operators.Scale.writeRangeShardedOrc]]'s
    * contract).
    */
  def write(df: DataFrame, key: Column, nShards: Int, path: String): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val spark = df.sparkSession
    val dataSchema = df.schema
    val schemaJson = avroSchema(dataSchema, "GraftRecord").toString
    val n = dataSchema.length
    val root = new org.apache.hadoop.fs.Path(path)
    val rootFs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (rootFs.exists(root)) rootFs.delete(root, true)
    rootFs.mkdirs(root)
    // tasks must see the DRIVER's fs configuration (see
    // [[SerializableHadoopConf]]) — broadcast it into the closure
    val confBc = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val sorted = df
      // a null (or uncastable) shard key would otherwise surface as a
      // bare NullPointerException deep inside a write task — reject it
      // loudly up front, the same style as the nested-column rejection
      .withColumn("__key",
        when(key.cast("long").isNull,
          raise_error(lit("AvroArchive: shard key is null or does not " +
            "cast to long — filter or repair keys upstream")))
          .otherwise(key.cast("long")))
      .withColumn("__shard", pmod(col("__key"), lit(nShards.toLong)))
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__key"))
    import spark.implicits._
    // one sequential writer per (task, shard): sorted input makes a
    // shard change a file change; emits (shard, n) per closed file.
    // Each file is written to an ATTEMPT-UNIQUE temp path and renamed
    // into place on close — a retried or speculative attempt can run
    // concurrently with a zombie on the same shard, and two writers on
    // the final path would interleave; with temp+rename, whichever
    // complete file lands is byte-identical (the export is
    // deterministic), and the loser's temp is discarded.
    val counts = sorted.mapPartitions { rows =>
      val hConf = confBc.value.value
      val tc = org.apache.spark.TaskContext.get()
      val attemptId = if (tc == null) 0L else tc.taskAttemptId()
      val schema = new Schema.Parser().parse(schemaJson)
      val out = Seq.newBuilder[(Long, Long)]
      var writer: DataFileWriter[GenericRecord] = null
      var shard = -1L
      var written = 0L
      var tmpPath: org.apache.hadoop.fs.Path = null
      var finalPath: org.apache.hadoop.fs.Path = null
      def close(): Unit = if (writer != null) {
        writer.close()
        val fs = finalPath.getFileSystem(hConf)
        if (!fs.rename(tmpPath, finalPath)) {
          // rename refused: a concurrent attempt already committed an
          // identical file — drop ours; anything else is a real error
          if (fs.exists(finalPath)) fs.delete(tmpPath, false)
          else throw new java.io.IOException(
            s"AvroArchive: failed to commit $tmpPath -> $finalPath")
        }
        out += ((shard, written)); writer = null; written = 0L
      }
      rows.foreach { row =>
        val s = row.getLong(n + 1) // __shard
        if (s != shard) {
          close()
          shard = s
          finalPath = new org.apache.hadoop.fs.Path(s"$path/shard=$s/part-$s.avro")
          tmpPath = new org.apache.hadoop.fs.Path(
            s"$path/shard=$s/.part-$s.avro.inprogress-$attemptId")
          val fs = finalPath.getFileSystem(hConf)
          val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
          w.setCodec(CodecFactory.deflateCodec(6))
          writer = w.create(schema, fs.create(tmpPath, true), syncMarker(s))
        }
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < n) {
          val v = row.get(i)
          rec.put(i, v match {
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case other => other
          })
          i += 1
        }
        writer.append(rec)
        written += 1L
      }
      close()
      out.result().iterator
    }
    counts.collect() // run the export
    read(spark, s"$path/shard=*/part-*.avro", dataSchema)
      .withColumn("__key", key.cast("long"))
      .groupBy(pmod(col("__key"), lit(nShards.toLong)).as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__key")).as("min_key"),
        max(col("__key")).as("max_key"))
      .orderBy("shard")
  }

  /** Read an Avro OCF glob back as a DataFrame with the given flat
    * schema (fields matched by NAME against each file's embedded
    * writer schema) — files in parallel, each a sequential
    * block-decoded scan.
    */
  def read(spark: SparkSession, glob: String, schema: StructType): DataFrame = {
    val names = schema.fieldNames.toSeq
    val rows = spark.sparkContext.binaryFiles(glob).flatMap { case (_, pds) =>
      val stream = new DataFileStream[GenericRecord](
        pds.open(), new GenericDatumReader[GenericRecord]())
      // close when the TASK ends, not when the iterator drains: a
      // downstream limit()/take() or a failed task stops consuming
      // early and would otherwise leak the stream + file handle for
      // every partially-read file
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => stream.close())
      new Iterator[Row] {
        override def hasNext: Boolean = {
          val h = stream.hasNext
          if (!h && tc == null) stream.close()
          h
        }
        override def next(): Row = {
          val rec = stream.next()
          Row.fromSeq(names.map { nm =>
            rec.get(nm) match {
              case u: org.apache.avro.util.Utf8 => u.toString
              case bb: java.nio.ByteBuffer =>
                val a = new Array[Byte](bb.remaining()); bb.get(a); a
              case other => other
            }
          })
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
