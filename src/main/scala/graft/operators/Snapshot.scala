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
    * many-to-many and the caller's re-processing unsound. Keys must be
    * non-null (a NULL id never matches itself in the equi-join, so one
    * null-id row per side would report as both `added` and `removed`).
    * NULL content is legal: each side carries an explicit presence
    * flag through the join, so presence is never inferred from the
    * fingerprint, and NULL content hashes as a distinct sentinel
    * (null vs "" vs absent-key all classify correctly).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, id: Column, content: Column): DataFrame = {
    def fp(df: DataFrame, as: String, present: String) =
      df.select(id.as("id"),
        coalesce(md5(to_binary(content, lit("utf-8"))), lit("\u0000null")).as(as),
        lit(true).as(present))
    fp(oldDf, "__fp_old", "__in_old")
      .join(fp(newDf, "__fp_new", "__in_new"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("__fp_old") =!= col("__fp_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Status counts — the release-note summary of [[diff]]. */
  def diffCounts(oldDf: DataFrame, newDf: DataFrame, id: Column, content: Column): DataFrame =
    diff(oldDf, newDf, id, content)
      .groupBy("status").agg(count(lit(1)).as("n"))

  /** MERGE-style corpus maintenance — [[diff]]'s inverse: apply a
    * changeset to a keyed corpus and return the next version.
    * `changes` carries (id, op, content) with op ∈ {"upsert",
    * "delete"}: upsert replaces-or-inserts the document, delete
    * removes it (deleting an absent id is a no-op). Output: the new
    * corpus as (id, content).
    *
    * Scale shape: the changeset is release-sized — orders of
    * magnitude under the corpus — so the touched-id removal is an
    * anti-join against a (typically broadcast) id set: the untouched
    * bulk of the corpus passes through WITHOUT its content ever
    * riding an exchange, and the upserts union in map-only.
    * `diff(corpus, applyChanges(corpus, …))` reports exactly the
    * changeset back (spec-pinned), which is the round-trip invariant
    * release bookkeeping relies on.
    *
    * Change ids must be unique (one op per id per release — a
    * contradictory upsert+delete for the same id has no defined
    * order); corpus keys unique and non-null as in [[diff]].
    *
    * Ops are VALIDATED, not defaulted: a row whose op is outside
    * {upsert, delete} (a typo'd 'Upsert', an 'update' from another
    * system) fails the job loudly — silently treating it as a delete
    * would destroy the document. The check is a codegen'd branch
    * inside the changeset projection (no extra pass, no driver
    * action), raised from whichever task meets the bad row.
    */
  def applyChanges(
      corpus: DataFrame,
      id: Column,
      content: Column,
      changes: DataFrame): DataFrame = {
    val base = corpus.select(id.cast("long").as("id"), content.as("content"))
    val rawOp = col("op").cast("string")
    val checkedOp = when(rawOp.isin("upsert", "delete"), rawOp)
      .otherwise(raise_error(concat(
        lit("applyChanges: unknown op '"), coalesce(rawOp, lit("NULL")),
        lit("' for id "), col("id").cast("string"),
        lit(" (expected 'upsert' or 'delete')"))))
    val ch = changes.select(col("id").cast("long").as("id"),
      checkedOp.as("op"), col("content").cast("string").as("content"))
    // every changes row flows through the upsert-filter branch, whose
    // predicate evaluates checkedOp on ALL rows (kept or not) — so the
    // validation fires even though the anti-join side prunes `op`
    base.join(ch.select("id"), Seq("id"), "left_anti")
      .unionByName(ch.where(col("op") === "upsert").select("id", "content"))
  }
}
