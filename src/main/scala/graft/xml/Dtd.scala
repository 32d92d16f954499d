package graft.xml

import java.nio.file.{Files, Paths}
import scala.collection.immutable.ListMap
import scala.util.matching.Regex

/** DTD metadata scan (S1) — driver-side parse of the (tiny) DTD file.
  *
  * Re-expresses `get_elements` (/root/reference/XMLToCSV.py:79-86):
  * collect `<!ELEMENT …>` declarations and drop the root element, which
  * yields the record-type vocabulary. Additionally harvests
  * `<!ENTITY …>` definitions (needed to expand `&uuml;`-style
  * references before XML parsing — Spark's XML machinery does no DTD
  * entity resolution) and `<!ATTLIST …>` defaults (pass 1 of the
  * reference runs with `attribute_defaults=True`, XMLToCSV.py:109, so
  * DTD-defaulted attributes are part of the inferred schema).
  */
final case class Dtd(
    root: String,
    elements: Set[String],
    entities: Map[String, String],
    attributeDefaults: Map[String, Map[String, String]],
    declaredAttrs: Map[String, Set[String]] = Map.empty) {

  /** Record-type vocabulary: declared elements minus the root. */
  def recordTypes: Set[String] = elements - root

  /** Expand `&name;` entity references using this DTD's entity map plus
    * the five XML built-ins. Numeric character references pass through
    * (the XML parser handles them). Unknown named entities are left
    * as-is so the downstream parser reports them — mirroring the
    * reference's DTD-validated parse failing on undeclared entities.
    */
  def expandEntities(s: String): String =
    if (s.indexOf('&') < 0) s
    else Dtd.entityRef.replaceAllIn(s, m => {
      val name = m.group(1)
      val rep = Dtd.builtins.getOrElse(name, entities.getOrElse(name, m.matched))
      Regex.quoteReplacement(rep)
    })
}

object Dtd {

  private val builtins = Map(
    "amp" -> "&amp;", "lt" -> "&lt;", "gt" -> "&gt;",
    "quot" -> "&quot;", "apos" -> "&apos;")

  private val entityRef = "&([A-Za-z][A-Za-z0-9._-]*);".r
  private val elementDecl = """<!ELEMENT\s+([^\s(]+)""".r
  private val entityDecl = """<!ENTITY\s+(\S+)\s+"([^"]*)"\s*>""".r
  private val attlistDecl = """(?s)<!ATTLIST\s+(\S+)\s+(.*?)>""".r
  // within an ATTLIST body: name, type, default (quoted literal or keyword)
  private val attDef = """([\w:.-]+)\s+(CDATA|ID|IDREF|IDREFS|NMTOKEN|NMTOKENS|ENTITY|ENTITIES|NOTATION|\([^)]*\))\s+(#REQUIRED|#IMPLIED|#FIXED\s+"[^"]*"|"[^"]*")""".r

  /** Parse a DTD file. The root element is taken from the first
    * `<!ELEMENT …>` declaration (the DBLP DTD declares the root first;
    * callers can override via `rootOverride`).
    */
  def parse(dtdPath: String, rootOverride: Option[String] = None): Dtd = {
    val text = new String(Files.readAllBytes(Paths.get(dtdPath)), "UTF-8")
    parseString(text, rootOverride)
  }

  def parseString(text: String, rootOverride: Option[String] = None): Dtd = {
    val elems = elementDecl.findAllMatchIn(text).map(_.group(1)).toVector
    require(elems.nonEmpty, "DTD declares no elements")
    val root = rootOverride.getOrElse(elems.head)

    // entities may reference earlier entities; expand transitively
    val rawEntities = ListMap(entityDecl.findAllMatchIn(text).map(m => m.group(1) -> m.group(2)).toSeq: _*)
    val entities = rawEntities.map { case (k, v) =>
      var cur = v
      var i = 0
      while (cur.contains('&') && i < 10) { // bounded: DTD entity chains are shallow
        cur = entityRef.replaceAllIn(cur, m =>
          Regex.quoteReplacement(rawEntities.getOrElse(m.group(1), m.matched)))
        i += 1
      }
      k -> cur
    }

    val attlists: Seq[(String, Seq[Regex.Match])] =
      attlistDecl.findAllMatchIn(text).map { m =>
        m.group(1) -> attDef.findAllMatchIn(m.group(2)).toSeq
      }.toSeq

    val defaults: Map[String, Map[String, String]] =
      attlists.map { case (elem, defs) =>
        elem -> defs.flatMap { a =>
          val name = a.group(1)
          val dflt = a.group(3)
          if (dflt.startsWith("\"")) Some(name -> dflt.stripPrefix("\"").stripSuffix("\""))
          else if (dflt.startsWith("#FIXED")) {
            val v = dflt.dropWhile(_ != '"')
            Some(name -> v.stripPrefix("\"").stripSuffix("\""))
          } else None
        }.toMap
      }.toMap.filter(_._2.nonEmpty)

    // ALL declared attribute names per element (defaulted or not) —
    // the vocabulary strict-mode validation checks against
    val declared: Map[String, Set[String]] =
      attlists.groupBy(_._1).map { case (elem, groups) =>
        elem -> groups.flatMap(_._2.map(_.group(1))).toSet
      }

    Dtd(root, elems.toSet, entities, defaults, declared)
  }
}
