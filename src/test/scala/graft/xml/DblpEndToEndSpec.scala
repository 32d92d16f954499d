package graft.xml

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.dev.DblpGen

/** End-to-end validation on a faithful DBLP slice (VERDICT r6 item 2):
  * 20k generated records with the real dblp.dtd structure (parameter
  * entities, per-type ATTLISTs, Latin-1 entity block), realistic
  * accented-name entity density and title markup, run through the FULL
  * pipeline with every flag on (--annotate --neo4j --validate
  * --relations), then byte-compared against the generation-side ground
  * truth computed independently of any XML parsing
  * ([[DblpGen.expected]] re-implements the reference's semantics,
  * XMLToCSV.py:108-203/246-331, straight from the record model).
  */
class DblpEndToEndSpec extends SparkTestBase {

  private val nRecords = 20000

  private lazy val dir = Files.createTempDirectory("dblp_e2e")
  private lazy val outDir = Files.createTempDirectory("dblp_e2e_out").toString

  private val relations = Seq("author" -> "authored_by", "cite" -> "cites")

  private lazy val recs = DblpGen.records(nRecords, seed = 7L).toVector

  private lazy val result = {
    val (xml, dtd) = DblpGen.writeCorpus(dir, recs)
    XmlToCsv.run(spark, XmlToCsv.Config(
      xmlFile = xml, dtdFile = dtd, outputFile = s"$outDir/out.csv",
      annotate = true, neo4j = true, validate = true, relations = relations))
  }

  private lazy val exp = DblpGen.expected(recs, relations)

  private def read(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  /** Byte compare with a line-sized failure message instead of a 3 MB
    * assert dump.
    */
  private def assertSame(actual: String, expected: String, what: String): Unit = {
    if (actual != expected) {
      val a = actual.split("\n", -1)
      val e = expected.split("\n", -1)
      val i = a.zip(e).indexWhere { case (x, y) => x != y }
      val at = if (i >= 0) i else math.min(a.length, e.length)
      fail(s"$what differs at line $at (${a.length} vs ${e.length} lines):\n" +
        s"  actual:   ${a.lift(at).getOrElse("<missing>")}\n" +
        s"  expected: ${e.lift(at).getOrElse("<missing>")}")
    }
  }

  test("schema matches the generation-side ground truth") {
    result
    assert(result.schema.keySet == exp.schema.keySet)
    exp.schema.foreach { case (t, cols) =>
      assert(result.schema(t) == cols, s"schema for $t")
    }
  }

  test("record counts per type match") {
    result
    assert(result.recordCounts == exp.counts)
  }

  test("per-type data CSVs are byte-identical to the reference semantics") {
    result
    exp.schema.keySet.foreach { t =>
      assertSame(read(s"$outDir/out_$t.csv"), exp.dataCsv(t), s"out_$t.csv")
    }
  }

  test("annotated neo4j headers are byte-identical") {
    result
    exp.schema.keySet.foreach { t =>
      assertSame(read(s"$outDir/out_${t}_header.csv"), exp.headerCsv(t), s"out_${t}_header.csv")
    }
  }

  test("relation node and edge files are byte-identical") {
    result
    relations.foreach { case (attr, rel) =>
      assertSame(read(s"$outDir/out_$attr.csv"), exp.relationCsv(attr), s"out_$attr.csv")
      assertSame(read(s"$outDir/out_${attr}_$rel.csv"), exp.relationCsv(s"${attr}_$rel"),
        s"out_${attr}_$rel.csv")
    }
  }

  test("--dirs (distributed multi-part) output carries the same content as single-file") {
    // the 100 TB path: partition-parallel unsorted writes; parity =
    // same LINE SETS per table (ids are assigned before the write and
    // don't depend on the output mode — only file order does)
    val dirsOut = Files.createTempDirectory("dblp_e2e_dirs").toString
    val small = DblpGen.records(3000, seed = 13L).toVector
    val dir2 = Files.createTempDirectory("dblp_e2e_dirs_in")
    val (xml, dtd) = DblpGen.writeCorpus(dir2, small)
    val res = XmlToCsv.run(spark, XmlToCsv.Config(
      xmlFile = xml, dtdFile = dtd, outputFile = s"$dirsOut/out.csv",
      annotate = true, neo4j = true, validate = true, relations = relations,
      singleFile = false))
    val expSmall = DblpGen.expected(small, relations)
    assert(res.recordCounts == expSmall.counts)
    def dirLines(path: String): Seq[String] = {
      val d = Paths.get(path)
      assert(Files.isDirectory(d), s"$path should be a part directory in --dirs mode")
      val stream = Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala.toSeq
          .filter(_.getFileName.toString.startsWith("part-"))
          .flatMap(p => new String(Files.readAllBytes(p), "UTF-8").split("\n", -1).filter(_.nonEmpty))
      } finally stream.close()
    }
    expSmall.schema.keySet.foreach { t =>
      val expected = expSmall.dataCsv(t).split("\n", -1).filter(_.nonEmpty).toSeq.sorted
      assert(dirLines(s"$dirsOut/out_$t.csv").sorted == expected, s"out_$t.csv content")
      // annotated header sidecar identical to single-file mode
      assert(read(s"$dirsOut/out_${t}_header.csv") == expSmall.headerCsv(t), s"header $t")
    }
    relations.foreach { case (attr, rel) =>
      // dirs mode: header line lives in a sidecar, not the data files
      val expNodes = expSmall.relationCsv(attr).split("\n", -1).filter(_.nonEmpty).toSeq
      assert(dirLines(s"$dirsOut/out_$attr.csv").sorted == expNodes.tail.sorted, s"nodes $attr")
      assert(read(s"$dirsOut/out_${attr}_header.csv") == expNodes.head, s"node header $attr")
      val expEdges = expSmall.relationCsv(s"${attr}_$rel").split("\n", -1).filter(_.nonEmpty).toSeq
      assert(dirLines(s"$dirsOut/out_${attr}_$rel.csv").sorted == expEdges.tail.sorted, s"edges $attr")
      assert(read(s"$dirsOut/out_${attr}_${rel}_header.csv") == expEdges.head, s"edge header $attr")
    }
  }

  test("neo4j import script covers every type and relation") {
    result
    val sh = read(s"$outDir/neo4j_import.sh")
    assert(sh.startsWith("#!/bin/bash\nneo4j-admin import --mode=csv --database=dblp.db " +
      "--delimiter \";\" --array-delimiter \"|\" --id-type INTEGER"))
    exp.schema.keySet.foreach { t =>
      assert(sh.contains(s""" --nodes:$t "$outDir/out_${t}_header.csv,$outDir/out_$t.csv""""), t)
    }
    relations.foreach { case (attr, rel) =>
      assert(sh.contains(s""" --nodes:$attr "$outDir/out_$attr.csv""""), attr)
      assert(sh.contains(s""" --relationships:$rel "$outDir/out_${attr}_$rel.csv""""), rel)
    }
  }
}
