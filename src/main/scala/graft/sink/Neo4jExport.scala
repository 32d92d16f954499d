package graft.sink

/** neo4j-admin import command codegen (W5) — driver-side string
  * assembly mirroring generate_neo4j_import_command
  * (/root/reference/XMLToCSV.py:334-344): one `--nodes:<label>`
  * per record type (header file + data file), one `--nodes:<attr>`
  * per relation's node table, one `--relationships:<rel>` per
  * relation's edge table, with the reference's fixed flags.
  */
object Neo4jExport {

  def importCommand(
      stem: String,
      ext: String,
      recordTypes: Seq[String],
      relations: Seq[(String, String)]): String = {
    val sb = new StringBuilder
    sb.append("neo4j-admin import --mode=csv --database=dblp.db " +
      "--delimiter \";\" --array-delimiter \"|\" --id-type INTEGER")
    recordTypes.foreach { t =>
      sb.append(s""" --nodes:$t "${stem}_${t}_header$ext,${stem}_$t$ext"""")
    }
    // relation node/edge files embed their header line, so they are
    // referenced as single files (XMLToCSV.py:340-343)
    relations.foreach { case (attr, rel) =>
      sb.append(s""" --nodes:$attr "${stem}_$attr$ext"""")
      sb.append(s""" --relationships:$rel "${stem}_${attr}_$rel$ext"""")
    }
    sb.toString
  }
}
