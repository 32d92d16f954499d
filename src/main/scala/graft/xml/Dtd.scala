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
    declaredAttrs: Map[String, Set[String]] = Map.empty,
    requiredAttrs: Map[String, Set[String]] = Map.empty,
    contentModels: Map[String, String] = Map.empty,
    enumAttrs: Map[String, Map[String, Set[String]]] = Map.empty,
    fixedAttrs: Map[String, Map[String, String]] = Map.empty) {

  /** Record-type vocabulary: declared elements minus the root. */
  def recordTypes: Set[String] = recordTypesCache

  @transient private lazy val recordTypesCache: Set[String] = elements - root

  /** Compiled per-element content-model validators (strict mode's
    * child-ordering/cardinality check — lxml `dtd_validation=True`
    * semantics). Lazily compiled per JVM: the Dtd is broadcast, and
    * regex Patterns recompile cheaply on each executor.
    */
  @transient lazy val compiledModels: Map[String, Dtd.ContentModel] =
    contentModels.map { case (el, m) => el -> Dtd.compileModel(el, m) }

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

  /** A compiled content model. `childPattern` matches the ";"-joined
    * direct-child tag token string ("author;title;"); `textAllowed`
    * covers #PCDATA/mixed/ANY; `empty` marks EMPTY (no text at all,
    * not even whitespace).
    */
  final case class ContentModel(
      element: String,
      childPattern: java.util.regex.Pattern, // null = ANY (no constraint)
      textAllowed: Boolean,
      empty: Boolean) {
    /** Throws on violation; `childTokens` is "tag;" per direct child in
      * order, `hasAnyText`/`hasNonWsText` from the element's character
      * events.
      */
    def check(childTokens: String, hasAnyText: Boolean, hasNonWsText: Boolean): Unit = {
      if (empty && (childTokens.nonEmpty || hasAnyText))
        throw new IllegalStateException(
          s"DTD validation failed: element <$element> is declared EMPTY but has content")
      if (!textAllowed && hasNonWsText)
        throw new IllegalStateException(
          s"DTD validation failed: element <$element> has element content but contains text")
      if (childPattern != null && !childPattern.matcher(childTokens).matches())
        throw new IllegalStateException(
          s"DTD validation failed: children of <$element> " +
            s"[${childTokens.stripSuffix(";").replace(";", ", ")}] do not match its content model")
    }
  }

  private val modelToken =
    """#PCDATA|[A-Za-z_][A-Za-z0-9._:-]*|[(),|?*+]""".r

  /** Compile one DTD content model to a [[ContentModel]]. Standard
    * construction: a content model IS a regular expression over the
    * child-element alphabet — each name becomes the token "name;",
    * `,` becomes concatenation, and `| ( ) ? * +` carry over.
    */
  private[xml] def compileModel(element: String, model: String): ContentModel = {
    val m = model.trim
    if (m == "EMPTY")
      ContentModel(element, java.util.regex.Pattern.compile(""), textAllowed = false, empty = true)
    else if (m == "ANY" || m.isEmpty)
      ContentModel(element, null, textAllowed = true, empty = false)
    else if (m.contains("#PCDATA")) {
      // mixed content: (#PCDATA | a | b)* — children in any order and
      // count, text anywhere
      val names = modelToken.findAllIn(m).toSeq
        .filter(t => t != "#PCDATA" && t.headOption.exists(c => c.isLetter || c == '_'))
      val p =
        if (names.isEmpty) java.util.regex.Pattern.compile("")
        else java.util.regex.Pattern.compile(
          names.map(n => java.util.regex.Pattern.quote(n + ";")).mkString("(?:(?:", "|", "))*"))
      ContentModel(element, p, textAllowed = true, empty = false)
    } else {
      val sb = new StringBuilder
      modelToken.findAllIn(m).foreach {
        case "," => // concatenation
        case t @ ("(" | ")" | "|" | "?" | "*" | "+") => sb.append(t)
        case name => sb.append("(?:").append(java.util.regex.Pattern.quote(name + ";")).append(")")
      }
      ContentModel(element, java.util.regex.Pattern.compile(sb.toString),
        textAllowed = false, empty = false)
    }
  }

  private val builtins = Map(
    "amp" -> "&amp;", "lt" -> "&lt;", "gt" -> "&gt;",
    "quot" -> "&quot;", "apos" -> "&apos;")

  private val entityRef = "&([A-Za-z][A-Za-z0-9._-]*);".r
  private val elementDecl = """<!ELEMENT\s+([^\s(>]+)\s*([^>]*)>""".r
  private val entityDecl = """<!ENTITY\s+([^%\s]\S*)\s+"([^"]*)"\s*>""".r
  // parameter entities: <!ENTITY % name "value"> referenced as %name;
  private val paramEntityDecl = """<!ENTITY\s+%\s+(\S+)\s+(?:"([^"]*)"|'([^']*)')\s*>""".r
  private val paramRef = "%([A-Za-z_][A-Za-z0-9._:-]*);".r
  private val attlistDecl = """(?s)<!ATTLIST\s+(\S+)\s+(.*?)>""".r
  // within an ATTLIST body: name, type, default (quoted literal or keyword)
  private val attDef = """([\w:.-]+)\s+(CDATA|ID|IDREF|IDREFS|NMTOKEN|NMTOKENS|ENTITY|ENTITIES|NOTATION|\([^)]*\))\s+(#REQUIRED|#IMPLIED|#FIXED\s+"[^"]*"|"[^"]*")""".r

  /** Parse a DTD file. The root element is taken from the first
    * `<!ELEMENT …>` declaration (the DBLP DTD declares the root first;
    * callers can override via `rootOverride`).
    *
    * Supported DTD subset: ELEMENT/ATTLIST/ENTITY declarations,
    * general and parameter entities (expanded textually, transitive,
    * bounded, loud failure on recursive definitions — which are not
    * well-formed XML), and conditional sections (`<![INCLUDE[` /
    * `<![IGNORE[`, including keywords spelled via parameter entities,
    * `<![%draft;[`, and nested sections inside an ignored span — lxml
    * honors these under `dtd_validation=True`, XMLToCSV.py:109). Not
    * supported (unused by dblp.dtd and the broad class of data-dump
    * DTDs this engine targets): external parameter entities and
    * NOTATION declarations — both parse as inert text. One documented
    * divergence: a declaration inside an IGNORE section whose keyword
    * is itself a parameter entity is visible for one expansion round
    * before the section resolves (lxml never sees it); literal-keyword
    * IGNORE sections are dropped before any declaration is read.
    */
  /** "If the same entity is declared more than once, the first
    * declaration encountered is binding" (XML 1.0 §4.2) — lxml obeys
    * this; a plain `ListMap(...: _*)` would be last-wins.
    */
  private def firstWins(pairs: Iterator[(String, String)]): ListMap[String, String] =
    pairs.foldLeft(ListMap.empty[String, String]) { case (acc, (k, v)) =>
      if (acc.contains(k)) acc else acc.updated(k, v)
    }

  private val condOpen = """<!\[\s*(INCLUDE|IGNORE)\s*\[""".r

  /** Resolve all conditional sections with a literal keyword:
    * `<![INCLUDE[ body ]]>` is replaced by its body, `<![IGNORE[ … ]]>`
    * is dropped. The matching `]]>` is found by bracket counting — per
    * XML 1.0 §3.4 an ignored span skips over any nested `<![` … `]]>`
    * pair regardless of keyword, so nested sections inside IGNORE never
    * leak. Sections whose keyword is an unexpanded parameter-entity
    * reference (`<![%draft;[`) do not match and are left for the caller
    * to resolve after `%`-expansion. Terminates: every iteration removes
    * one section's markup. Spliced INCLUDE bodies are rescanned, so
    * nesting resolves fully within one call.
    */
  private[xml] def resolveConditionals(input: String): String = {
    var text = input
    var m = condOpen.findFirstMatchIn(text)
    while (m.isDefined) {
      val mm = m.get
      val bodyStart = mm.end
      var depth = 1
      var i = bodyStart
      var end = -1
      while (end < 0) {
        val nextOpen = text.indexOf("<![", i)
        val nextClose = text.indexOf("]]>", i)
        if (nextClose < 0)
          throw new IllegalArgumentException(
            s"unterminated conditional section `${mm.matched}` in DTD (missing `]]>`)")
        if (nextOpen >= 0 && nextOpen < nextClose) { depth += 1; i = nextOpen + 3 }
        else { depth -= 1; if (depth == 0) end = nextClose else i = nextClose + 3 }
      }
      val replacement =
        if (mm.group(1) == "INCLUDE") text.substring(bodyStart, end) else ""
      text = text.substring(0, mm.start) + replacement + text.substring(end + 3)
      m = condOpen.findFirstMatchIn(text)
    }
    text
  }

  def parse(dtdPath: String, rootOverride: Option[String] = None): Dtd = {
    val text = new String(Files.readAllBytes(Paths.get(dtdPath)), "UTF-8")
    parseString(text, rootOverride)
  }

  def parseString(rawText: String, rootOverride: Option[String] = None): Dtd = {
    // Comments go first: `<!-- … -->` spans must neither contribute
    // declarations nor have `%name;` references expanded inside them
    // (per-spec, parameter entities are not recognized in comments).
    // Known divergences from full XML, acceptable for the data-dump
    // DTD subset this engine targets: (a) a GENERAL entity literal
    // whose value legitimately contains a `%xx;` substring is still
    // rewritten; (b) the comment scan is textual, so an entity literal
    // whose VALUE contains "<!--" starts a comment span from there
    // (a full lexer would track quote context) — dblp.dtd and its
    // family contain neither shape.
    val uncommented = "(?s)<!--.*?-->".r.replaceAllIn(rawText, "")
    // Parameter entities (`<!ENTITY % name "v">` … `%name;`) are expanded
    // textually before declaration parsing — the real dblp.dtd declares
    // its field list this way (`<!ENTITY % field "author|editor|…">;
    // <!ELEMENT article (%field;)*>`), which lxml resolves natively
    // (XMLToCSV.py:79-86,109). Expansion is transitive but bounded;
    // unresolvable references are left verbatim (and then rejected by
    // the regular declaration grammar, surfacing the problem).
    // Conditional sections interleave with the expansion: each round
    // first resolves sections whose keyword is already literal
    // (dropping IGNORE bodies BEFORE their declarations are read),
    // then expands `%name;` references — which may turn `<![%draft;[`
    // into a literal keyword for the next round.
    var text = uncommented
    var rounds = 0
    var changed = true
    while (changed && rounds < 10) { // bounded: DTD parameter-entity chains are shallow
      val resolved = resolveConditionals(text)
      val paramEntities = firstWins(paramEntityDecl.findAllMatchIn(resolved).map { m =>
        m.group(1) -> Option(m.group(2)).getOrElse(m.group(3))
      })
      val next =
        if (paramEntities.isEmpty) resolved
        else paramRef.replaceAllIn(resolved, m =>
          Regex.quoteReplacement(paramEntities.getOrElse(m.group(1), m.matched)))
      changed = next != text
      text = next
      rounds += 1
    }
    if (changed)
      throw new IllegalArgumentException(
        "DTD parameter-entity expansion did not reach a fixpoint after 10 rounds — " +
          "recursive parameter-entity definitions are not well-formed XML")

    val elemMatches = elementDecl.findAllMatchIn(text).toVector
    val elems = elemMatches.map(_.group(1))
    require(elems.nonEmpty, "DTD declares no elements")
    val root = rootOverride.getOrElse(elems.head)
    val models = elemMatches.map(m => m.group(1) -> m.group(2).trim).toMap

    // Entities may reference other entities (in either declaration
    // order — lxml resolves at reference time); expand to a fixpoint so
    // the map holds fully-substituted replacement text and the runtime
    // `expandEntities` single pass is exact. Recursive definitions are
    // a well-formedness error (XML 1.0 §4.1) — fail loudly rather than
    // ship partially-expanded garbage into the data.
    val rawEntities = firstWins(entityDecl.findAllMatchIn(text).map(m => m.group(1) -> m.group(2)))
    val entities = rawEntities.map { case (k, v) =>
      var cur = v
      var i = 0
      var converged = !cur.contains('&')
      while (!converged && i < 10) { // bounded: DTD entity chains are shallow
        val next = entityRef.replaceAllIn(cur, m =>
          Regex.quoteReplacement(rawEntities.getOrElse(m.group(1), m.matched)))
        converged = next == cur
        cur = next
        i += 1
      }
      if (!converged)
        throw new IllegalArgumentException(
          s"DTD entity '$k' does not expand to a fixpoint after 10 rounds — " +
            "recursive entity definitions are not well-formed XML")
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

    // #REQUIRED attributes per element — strict mode rejects elements
    // missing one (lxml dtd_validation does)
    val required: Map[String, Set[String]] =
      attlists.groupBy(_._1).map { case (elem, groups) =>
        elem -> groups.flatMap(_._2.filter(_.group(3) == "#REQUIRED").map(_.group(1))).toSet
      }.filter(_._2.nonEmpty)

    // enumerated attribute types "(a|b|c)" — strict mode rejects values
    // outside the enumeration
    val enums: Map[String, Map[String, Set[String]]] =
      attlists.groupBy(_._1).map { case (elem, groups) =>
        elem -> groups.flatMap(_._2.collect {
          case a if a.group(2).startsWith("(") =>
            a.group(1) -> a.group(2).stripPrefix("(").stripSuffix(")")
              .split('|').map(_.trim).toSet
        }).toMap
      }.filter(_._2.nonEmpty)

    // #FIXED "v" attributes — if present, the value must equal v
    val fixed: Map[String, Map[String, String]] =
      attlists.groupBy(_._1).map { case (elem, groups) =>
        elem -> groups.flatMap(_._2.collect {
          case a if a.group(3).startsWith("#FIXED") =>
            a.group(1) -> a.group(3).dropWhile(_ != '"').stripPrefix("\"").stripSuffix("\"")
        }).toMap
      }.filter(_._2.nonEmpty)

    Dtd(root, elems.toSet, entities, defaults, declared, required, models, enums, fixed)
  }
}
