package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract gates — the declarative expectations a pipeline runs
  * against every ingested snapshot BEFORE anything downstream trusts
  * it (null rates, range bounds, enum membership, key uniqueness,
  * referential integrity). All statistics are integer-exact ppm, the
  * engine's cross-engine determinism contract; all shapes are one or
  * two map-side-combined aggregates — an audit must never cost more
  * than the cheapest real query over the same table.
  */
object Expectations {

  /** One-PASS declarative contract audit: each rule is a VIOLATION
    * predicate over a row; the whole rule set evaluates in a single
    * map-side-combined global aggregate (one scan, zero joins, one
    * 1×|rules| row to unpivot), and each rule reports
    * (rule, n_rows, n_violations, viol_ppm, pass).
    *
    * Null semantics: a predicate evaluating to NULL (e.g. a bound
    * check over a null value) counts as NOT violating — express
    * "must not be null" as its own explicit `isNull` rule, which
    * keeps each rule's meaning local (the SQL convention, not the
    * "nulls are dirty" guess).
    */
  def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    auditFromAggRow(auditAggRow(df, rules), rules.map(_._1))

  /** The audit's single wide aggregate row — split out as its own seam
    * because it is exactly what STREAMING ingestion runs in complete
    * mode (a global aggregate needs no watermark); the drained row
    * unpivots through [[auditFromAggRow]] and must equal the batch
    * [[audit]] over the same data (q228's contract).
    */
  def auditAggRow(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_._1)}")
    val aggs = count(lit(1)).as("n_rows") +: rules.map { case (n, viol) =>
      sum(when(viol, 1L).otherwise(0L)).as(s"__v_$n")
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Unpivot an [[auditAggRow]] row into the per-rule report. */
  def auditFromAggRow(row: DataFrame, ruleNames: Seq[String]): DataFrame = {
    val stacked = ruleNames.map { n =>
      struct(lit(n).as("rule"), coalesce(col(s"__v_$n"), lit(0L)).as("v"))
    }
    row.select(col("n_rows"), explode(array(stacked: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("n_rows"),
        col("r.v").as("n_violations"))
      .withColumn("viol_ppm", when(col("n_rows") === 0, 0L)
        .otherwise(expr("n_violations * 1000000L div n_rows")))
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** Referential-integrity gate: how much of `child` points at a key
    * absent from `parent`. One skinny-key left join (parent side
    * distinct — broadcastable for dimension tables, plain hash join
    * otherwise) into one global aggregate: (n_child, n_orphans,
    * orphan_ppm, n_orphan_keys). Only key columns ever cross an
    * exchange. NULL child keys are orphans by definition (they
    * reference nothing).
    */
  def referentialIntegrity(
      child: DataFrame, childKey: Column,
      parent: DataFrame, parentKey: Column): DataFrame = {
    val c = child.select(childKey.as("k"))
    val p = parent.select(parentKey.as("k")).where(col("k").isNotNull)
      .distinct().withColumn("__hit", lit(1))
    c.join(p, Seq("k"), "left")
      .agg(count(lit(1)).as("n_child"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_orphans"),
        countDistinct(when(col("__hit").isNull, col("k"))).as("n_orphan_keys"))
      .select(col("n_child"), col("n_orphans"),
        when(col("n_child") === 0, 0L)
          .otherwise(expr("n_orphans * 1000000L div n_child")).as("orphan_ppm"),
        col("n_orphan_keys"))
  }

  /** Key-uniqueness gate: (n_rows, n_keys, n_dup_keys, max_key_count,
    * dup_row_ppm — the ppm of ROWS living under a duplicated key).
    * One key-grouped count (map-side combined) plus one global
    * aggregate over the key-domain-sized result. NULL keys group
    * together, the SQL GROUP BY convention — add an explicit isNull
    * rule in [[audit]] if nulls must not key rows at all.
    */
  /** SCHEMA drift gate — the structural side of the data contract
    * beside the value-level [[audit]]: diff two snapshots' schemas as
    * DATA, one row per column name across both sides with status
    * `added` / `removed` / `changed` (type differs) / `unchanged`.
    * The comparison is on column NAME and TYPE (Catalyst
    * `simpleString`); nullability is excluded by design — engines and
    * formats disagree on inferred nullability, types are the portable
    * contract. Schemas are driver metadata, so this is model-sized by
    * definition: no job runs at all.
    */
  def schemaDiff(ref: DataFrame, cur: DataFrame): DataFrame = {
    val spark = ref.sparkSession
    import spark.implicits._
    val r = ref.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val c = cur.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    (r.keySet ++ c.keySet).toSeq.sorted.map { n =>
      val status = (r.get(n), c.get(n)) match {
        case (Some(a), Some(b)) if a == b => "unchanged"
        case (Some(_), Some(_)) => "changed"
        case (Some(_), None) => "removed"
        case _ => "added"
      }
      (n, status)
    }.toDF("col_name", "status")
  }

  def keyUniqueness(df: DataFrame, key: Column): DataFrame =
    df.select(key.as("k")).groupBy("k").agg(count(lit(1)).as("c"))
      .agg(sum("c").as("n_rows"), count(lit(1)).as("n_keys"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
        max("c").as("max_key_count"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("__dup_rows"))
      .select(col("n_rows"), col("n_keys"), col("n_dup_keys"),
        col("max_key_count"),
        when(col("n_rows") === 0, 0L)
          .otherwise(expr("__dup_rows * 1000000L div n_rows")).as("dup_row_ppm"))
}
