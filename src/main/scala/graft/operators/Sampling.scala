package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset splitting for training-data
  * pipelines: every row's destination is a pure function of its key,
  * so splits are reproducible across runs, engines, and re-shuffles —
  * unlike `df.sample()`, whose result depends on partitioning.
  *
  * The bucket function is Knuth's multiplicative hash (golden-ratio
  * constant 2654435761) reduced mod `buckets` — plain 64-bit integer
  * arithmetic that any engine reproduces bit-identically, which keeps
  * the operators oracle-checkable (engine hash() builtins are not).
  * For string keys, hash the key to a long upstream (e.g. via a
  * stable content fingerprint) — the split must never depend on an
  * engine-specific hash.
  *
  * Scale shape: map-only (a projection + filter); no shuffle, no
  * driver state, trivially pushes through partition pruning.
  */
object Sampling {

  private val knuth = 2654435761L

  /** Stable bucket in [0, buckets) for an integer key. */
  def bucket(key: Column, buckets: Int): Column =
    pmod(key.cast("long") * knuth, lit(buckets.toLong))

  /** Deterministic fraction sample: keeps rows whose bucket (out of
    * `denominator`) falls below `numerator` — e.g. (1, 10) keeps a
    * stable 10%.
    */
  def hashSample(df: DataFrame, key: Column, numerator: Int, denominator: Int): DataFrame =
    df.where(bucket(key, denominator) < numerator)

  /** Named split assignment (train/val/test and friends): `weights`
    * are integer parts-per-`total` in order; every row gets exactly
    * one split label. Example: Seq("train" -> 80, "val" -> 10,
    * "test" -> 10).
    */
  def hashSplit(df: DataFrame, key: Column, weights: Seq[(String, Int)]): DataFrame = {
    val total = weights.map(_._2).sum
    val b = bucket(key, total)
    val cuts = weights.scanLeft(0)(_ + _._2).tail
    val expr = weights.zip(cuts).foldRight(lit(weights.last._1): Column) {
      case (((name, _), cut), acc) => when(b < cut, name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }
}
