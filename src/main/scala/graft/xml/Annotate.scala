package graft.xml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TypeInference

/** Column type annotation (A2+A3+A4) and array detection over the
  * exploded value stream, plus the header-line rendering (W3).
  *
  * Reference: set_type_information (/root/reference/XMLToCSV.py:
  * 236-243), get_high_level_type (:314-331), write_annotated_header
  * (:284-305). We fix the reference's `id:<class 'int'>` quirk and
  * emit `id:integer` (SURVEY.md §1.3).
  */
object Annotate {

  final case class ColumnMeta(unifiedType: String, isArray: Boolean)

  /** Per (recordType, column): unified type + array flag, computed in
    * two hash aggregations over the exploded values (map-side partial
    * agg on both), collected driver-side (it is schema metadata).
    *
    * The two aggregations are independent scans of the same cache —
    * submitted CONCURRENTLY so the array-flag pass overlaps the
    * type-mask pass (the caller materializes `exploded` first, so the
    * parallel first touch cannot double-compute it).
    */
  def columnMeta(exploded: DataFrame): Map[(String, String), ColumnMeta] = {
    // two flat aggregations beat one nested one: the type set needs no
    // per-record granularity (map-side collect_set combines early),
    // and the array flag is a count/max pair
    // native single-scan classifier (graft.functions.InferType) —
    // the declarative chain evaluates five regexes per value — and a
    // bit_or mask aggregation instead of collect_set arrays; built as
    // a Column directly so no function-registry mutation is needed
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import scala.collection.parallel.CollectionConverters._
    val inferred = ColumnBridge.column(
      graft.functions.InferType(ColumnBridge.expression(col("value"))))
    val typesDf = exploded
      .select(col("recordType"), col("col_name"),
        TypeInference.typeBit(inferred).as("bit"))
      .groupBy("recordType", "col_name")
      .agg(TypeInference.unifyTypeMask(bit_or(col("bit"))).as("unified"))
    val arraysDf = exploded
      .groupBy("recordType", "pos", "col_name")
      .agg(count(lit(1)).as("nvals"))
      .groupBy("recordType", "col_name")
      .agg(max(col("nvals")).as("max_vals"))
      .where(col("max_vals") > 1)
    val Seq(typesRows, arrayRows) = Seq(typesDf, arraysDf).par.map(_.collect()).seq.toSeq
    val types = typesRows
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    val arrays = arrayRows.map(r => (r.getString(0), r.getString(1))).toSet
    types.map { case (k, t) => k -> ColumnMeta(t, arrays.contains(k)) }
  }

  /** Neo4j type spelling (translate_type, XMLToCSV.py:308-311). */
  private def neo4jType(t: String): String = if (t == "integer") "int" else t

  /** Render the one-line annotated header for a type's table:
    * `id:integer;colA:string;colB:float[]` — or, in neo4j mode,
    * `<type>:ID;colA:string;…` with `int` spelling.
    *
    * Faithful to write_annotated_header (XMLToCSV.py:284-305): the
    * column list is the set of columns with OBSERVED values (a column
    * that exists only via a DTD default never gets type info and is
    * absent from the header), sorted. We diverge only on the id type
    * label: the reference emits the Python repr `id:<class 'int'>`;
    * we emit `id:integer` (SURVEY.md §1.3).
    */
  def headerLine(
      recordType: String,
      meta: Map[(String, String), ColumnMeta],
      neo4j: Boolean): String = {
    val idPart = if (neo4j) s"$recordType:ID" else "id:integer"
    val cols = meta.keysIterator.collect { case (t, c) if t == recordType => c }.toSeq.sorted
    val rest = cols.map { c =>
      val m = meta((recordType, c))
      val t = if (neo4j) neo4jType(m.unifiedType) else m.unifiedType
      val arr = if (m.isArray) "[]" else ""
      s"$c:$t$arr"
    }
    (idPart +: rest).mkString(";")
  }

  /** Plain (un-annotated) header: column names only, id first. */
  def plainHeader(cols: Seq[String]): String = ("id" +: cols).mkString(";")
}
