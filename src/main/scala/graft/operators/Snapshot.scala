package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot reconciliation: what changed between two crawls /
  * dumps / exports of the same keyed dataset. The incremental-pipeline
  * companion to [[Dedup.incrementalDedup]] — where that asks "which
  * NEW documents are duplicates of the corpus", this asks "how did the
  * corpus itself move", which drives re-processing decisions (only
  * `added`+`changed` re-enter the pipeline) and dataset bookkeeping
  * between releases.
  */
object Snapshot {

  /** Per-key diff of two snapshots: `added` (key only in `newDf`),
    * `removed` (only in `oldDf`), `changed` (both, content
    * fingerprint differs), `unchanged`. Output: (id, status).
    *
    * Scale shape: content is reduced to a 32-hex md5 fingerprint
    * BEFORE the full-outer join, so the exchange carries (key, 32
    * bytes) per row — the documents themselves never move. The join is
    * a plain shuffled equi-join on the snapshot key: at any scale
    * both sides partition the same way, no broadcast needed, no skew
    * (keys are unique per snapshot by contract). Re-processing then
    * semi-joins the source against the `added`/`changed` keys.
    *
    * Keys must be unique within each snapshot (it is a diff, not a
    * join-multiplicity product); duplicate keys make `status`
    * many-to-many and the caller's re-processing unsound.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, id: Column, content: Column): DataFrame = {
    def fp(df: DataFrame, as: String) =
      df.select(id.as("id"), md5(to_binary(content, lit("utf-8"))).as(as))
    fp(oldDf, "__fp_old").join(fp(newDf, "__fp_new"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__fp_old").isNull, "added")
          .when(col("__fp_new").isNull, "removed")
          .when(col("__fp_old") =!= col("__fp_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Status counts — the release-note summary of [[diff]]. */
  def diffCounts(oldDf: DataFrame, newDf: DataFrame, id: Column, content: Column): DataFrame =
    diff(oldDf, newDf, id, content)
      .groupBy("status").agg(count(lit(1)).as("n"))
}
