package graft.xml

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Schema inference (S2) and record flattening (P1/P2/A1) over the
  * parsed record stream.
  *
  * Reference semantics reproduced (/root/reference/XMLToCSV.py):
  *  - columns per type = union over records of: record attributes
  *    (plus DTD-defaulted ones, pass 1 only — :109 vs :152), tags of
  *    descendant elements with text (:130-134), and "tag-attr" for
  *    attributes of those elements (:135-138)
  *  - a column named "id" anywhere is an error (:131-132,:144-145)
  *  - types with no columns produce no table (:142-143)
  *  - multi-valued cells collapse to "|"-joined sorted values, dups
  *    kept (:178-179,:224-233)
  *  - records contributing no cells are dropped and consume no id
  *    (:176,:188)
  */
object Flatten {

  final class InvalidElementName(msg: String) extends RuntimeException(msg)

  /** Per-type inferred column sets (sorted), from one distributed pass.
    * The result is driver-side (it IS the schema — small by nature).
    */
  def inferColumns(records: Dataset[XmlRecord], dtd: Dtd): Map[String, Seq[String]] = {
    import records.sparkSession.implicits._
    val dtdB = records.sparkSession.sparkContext.broadcast(dtd)
    val pairs = records.flatMap { r =>
      val d = dtdB.value
      val attrCols = r.attrs.keysIterator ++
        d.attributeDefaults.getOrElse(r.recordType, Map.empty).keysIterator
      val childCols = r.children.iterator.filter(_.text != null).flatMap { c =>
        Iterator.single(c.tag) ++
          (c.attrs.keysIterator ++
            d.attributeDefaults.getOrElse(c.tag, Map.empty).keysIterator)
            .map(a => s"${c.tag}-$a")
      }
      (attrCols ++ childCols).map(c => (r.recordType, c)).toSet
    }.distinct().collect()

    val byType = pairs.groupBy(_._1).map { case (t, cs) => t -> cs.map(_._2).distinct.sorted.toSeq }
    // reserved name: exactly 'id' (XMLToCSV.py:131-132,:144-145 — a
    // child attribute named id yields 'tag-id', which is allowed)
    byType.find(_._2.contains("id")).foreach { case (t, _) =>
      throw new InvalidElementName(
        s"Element or attribute of '$t' yields reserved column name 'id' ('id' is engine-assigned)")
    }
    byType.filter(_._2.nonEmpty)
  }

  /** The array of raw values a record holds for column `c`: attribute
    * value (if any), then text of each matching descendant, then
    * matching descendant-attribute values — mirroring the fold order of
    * parse_xml (:165-199). Pure built-in higher-order functions.
    */
  private def valuesFor(c: String): Column = {
    val fromAttr = when(map_contains_key(col("attrs"), lit(c)),
      array(element_at(col("attrs"), lit(c)))).otherwise(array().cast("array<string>"))
    val withText = filter(col("children"), ch => ch("text").isNotNull)
    val fromChildText = transform(
      filter(withText, ch => ch("tag") === lit(c)), ch => ch("text"))
    val fromChildAttr = flatten(transform(withText, ch =>
      transform(
        filter(map_keys(ch("attrs")), a => concat(ch("tag"), lit("-"), a) === lit(c)),
        a => element_at(ch("attrs"), a))))
    concat(fromAttr, fromChildText, fromChildAttr)
  }

  /** A1 collapse: none -> null, one -> itself, many -> sorted "|" join
    * (duplicates kept, lexicographic sort — XMLToCSV.py:179).
    */
  private def collapse(values: Column): Column =
    when(size(values) === 0, lit(null).cast("string"))
      .when(size(values) === 1, element_at(values, 1))
      .otherwise(concat_ws("|", array_sort(values)))

  /** Flatten one record type into its table: one string column per
    * inferred column, multi-values collapsed; empty records dropped
    * (P2). Keeps `pos` for downstream id assignment.
    *
    * Direct column-expression form — used for small fixtures/tests;
    * the pipeline uses [[recordCells]] (array higher-order functions
    * are interpreted in Spark, so per-column array scans cost
    * O(columns) child walks per record).
    */
  def flattenType(records: DataFrame, recordType: String, cols: Seq[String]): DataFrame = {
    val perType = records.where(col("recordType") === recordType)
    val valueExprs = cols.map(c => collapse(valuesFor(c)).as(c))
    perType
      .select((col("pos") +: valueExprs): _*)
      .where(cols.map(col(_).isNotNull).reduce(_ || _))
  }

  /** One collapsed row per KEPT record: (recordType, pos,
    * cells: map<col,value>) — the A1 collapse applied inside the
    * record, so flattening is a pure MAP (zero shuffles; an earlier
    * relational form paid an explode+groupBy exchange of every cell
    * plus one pivot exchange per record type). Empty-cell records are
    * dropped here, which IS the P2 filter. Per-type tables are
    * map-only projections of this (`try_element_at` on the cells map;
    * missing column -> null, matching the reference's absent-cell
    * semantics).
    *
    * A plain JVM fold per record (not column expressions): the capture
    * rule walks each record's children once, where the HOF form walks
    * them once per schema column, interpreted. This is the same
    * capture rule as [[explodedValues]] (attrs always; child tag /
    * child attr only when the child has text, XMLToCSV.py:165-199).
    */
  def recordCells(records: Dataset[XmlRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.map { r =>
      val vals = scala.collection.mutable.LinkedHashMap.empty[String, List[String]]
      def add(c: String, v: String): Unit = vals.update(c, v :: vals.getOrElse(c, Nil))
      r.attrs.foreach { case (k, v) => add(k, v) }
      r.children.foreach { ch =>
        if (ch.text != null) {
          add(ch.tag, ch.text)
          ch.attrs.foreach { case (k, v) => add(s"${ch.tag}-$k", v) }
        }
      }
      val cells = vals.map { case (c, vs) =>
        c -> (vs match {
          case v :: Nil => v
          // duplicates kept, lexicographic sort (XMLToCSV.py:179)
          case many => many.sorted.mkString("|")
        })
      }.toMap
      (r.recordType, r.pos, cells)
    }.toDF("recordType", "pos", "cells")
      .where(size(col("cells")) > 0)
  }

  /** Exploded (recordType, pos, colName, value) stream of every
    * individual value (pre-collapse) — the input for type inference
    * (A2/A3) and array detection, and for relation extraction (J1).
    *
    * One explode pass, three codegen'd legs (record attrs, child text,
    * child attrs), NOT a per-schema-column scan: `valuesFor(c)` per
    * column re-walks every record's children array with interpreted
    * higher-order functions (CodegenFallback), which on a real DBLP
    * schema (article = ~20 columns) made the flatten pass the dominant
    * pipeline cost (~5x the parse). The emitted (recordType, col_name)
    * set equals `schema`'s by construction — both derive from the same
    * capture rule (attrs always; child tag / child attr only when the
    * child has text, XMLToCSV.py:165-199). Value order within a
    * (pos, col) group is NOT document order here; every consumer is
    * order-insensitive (sorted collapse, type-mask bit_or, array-flag
    * count, relation distinct).
    */
  def explodedValues(records: DataFrame, schema: Map[String, Seq[String]]): DataFrame = {
    val base = records.select(col("recordType"), col("pos"), col("attrs"), col("children"))
    val fromAttrs = base
      .select(col("recordType"), col("pos"), explode(map_entries(col("attrs"))).as("e"))
      .select(col("recordType"), col("pos"),
        col("e.key").as("col_name"), col("e.value").as("value"))
    val kids = base
      .select(col("recordType"), col("pos"), explode(col("children")).as("ch"))
      .where(col("ch.text").isNotNull)
    val fromChildText = kids.select(col("recordType"), col("pos"),
      col("ch.tag").as("col_name"), col("ch.text").as("value"))
    val fromChildAttrs = kids
      .select(col("recordType"), col("pos"), col("ch.tag").as("tag"),
        explode(map_entries(col("ch.attrs"))).as("e"))
      .select(col("recordType"), col("pos"),
        concat(col("tag"), lit("-"), col("e.key")).as("col_name"),
        col("e.value").as("value"))
    fromAttrs.unionAll(fromChildText).unionAll(fromChildAttrs)
  }
}
