package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-fingerprint expressions. The declarative rolling hash
  * (`aggregate` over `transform(split(s, ""), ascii)`) materializes one
  * String object PER CHARACTER and folds through the interpreted
  * lambda evaluator — the worst per-byte cost in the text ops. The
  * native fold is a primitive loop; upstream normalization
  * (lower/trim/regexp_replace) stays in codegen'd built-ins, so the
  * expression only replaces the fold itself.
  */
object TextRuntime {

  /** Rabin-Karp rolling hash, base 31, mod 2^31-1, over UTF-16 code
    * units — identical to folding pmod(acc*31 + ascii(ch), m) over
    * split(s, "") for BMP text (the declarative reference the spec
    * compares against).
    */
  def rollingHash(s: UTF8String): Long = {
    val str = s.toString
    val m = 2147483647L
    var acc = 0L
    var i = 0
    while (i < str.length) {
      acc = java.lang.Math.floorMod(acc * 31L + str.charAt(i).toLong, m)
      i += 1
    }
    acc
  }

  private val space = UTF8String.fromString(" ")

  /** Adjacent token pairs joined by a single space: ["a","b","c"] ->
    * ["a b", "b c"]; fewer than 2 elements -> empty. The token array
    * is evaluated exactly ONCE — the declarative formulation
    * (`transform(sequence(1, n-1), i => concat_ws(" ", element_at(t, i),
    * element_at(t, i+1)))`) inlines the tokenizer expression `t` into
    * the lambda body, so every element_at re-runs the regex split:
    * O(tokens²) interpreted work per document (measured 10s of a 41s
    * sf0.1 bench across the two n-gram model queries — the same
    * CollapseProject-inlining trap as the int8 quantizer fixed in r7).
    */
  def adjacentPairs(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev = a.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = a.getUTF8String(i)
      out(i - 1) = UTF8String.concat(prev, space, cur)
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct word n-gram shingles of the LOWERCASED text — the native
    * kernel behind [[graft.operators.Dedup.shingles]]. Replicates the
    * declarative formula exactly (spec-pinned property equality):
    * lowercase, trim, split on runs of regex-`\s` (the ASCII class, as
    * in [[termFreqs]]), then n consecutive tokens joined by single
    * spaces per shingle; fewer than n (but > 0) tokens collapse to ONE
    * all-token shingle; empty/blank text yields an empty array;
    * duplicates drop keeping FIRST occurrence (array_distinct order).
    *
    * Why native: the declarative chain (`transform(sequence(0, nT-n),
    * i => concat_ws(" ", slice(toks, i+1, n)))`) runs per shingle
    * through the interpreted lambda evaluator with an O(n) array slice
    * each — measured ~33 µs per shingle, which put a 5000-document
    * shingle pass at ~9 s of the sf0.1 bench. One fused scan per
    * document is ~30× cheaper and keeps the whole projection inside
    * whole-stage codegen.
    */
  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val str = s.toLowerCase.toString
    val len = str.length
    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    // token [start, end) offset pairs
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < len) {
      while (i < len && isWs(str.charAt(i))) i += 1
      if (i < len) {
        starts.add(i)
        while (i < len && !isWs(str.charAt(i))) i += 1
        ends.add(i)
      }
    }
    val nT = starts.size()
    if (nT == 0) return new GenericArrayData(Array.empty[Any])
    val width = if (nT >= n) n else nT
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sb = new java.lang.StringBuilder
    var t = 0
    while (t <= nT - width) {
      sb.setLength(0)
      var k = 0
      while (k < width) {
        if (k > 0) sb.append(' ')
        sb.append(str, starts.get(t + k), ends.get(t + k))
        k += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      t += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Word n-grams of the LOWERCASED text WITH MULTIPLICITY and the
    * strict-length contract — the fused kernel behind corpus-level
    * n-gram statistics ([[graft.operators.TextAnalysis.ngramDiversity]],
    * [[graft.operators.Dedup.contaminationRate]]): same
    * tokenization as [[wordShingles]] (lowercase, split on ASCII
    * whitespace runs), n consecutive tokens joined by single spaces,
    * but duplicates are KEPT (multiplicity is the statistic) and
    * texts with fewer than n tokens yield an EMPTY array (no
    * all-token collapse). Replicates the declarative
    * `transform(sequence(1, nT-n+1), i => concat_ws(" ",
    * slice(toks, i, n)))` exactly, ~30× cheaper (the lambda chain is
    * interpreted per gram with an O(n) slice each).
    */
  def wordNgrams(s: UTF8String, n: Int): ArrayData = {
    val str = s.toLowerCase.toString
    val len = str.length
    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r'
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < len) {
      while (i < len && isWs(str.charAt(i))) i += 1
      if (i < len) {
        starts.add(i)
        while (i < len && !isWs(str.charAt(i))) i += 1
        ends.add(i)
      }
    }
    val nT = starts.size()
    if (nT < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nT - n + 1)
    val sb = new java.lang.StringBuilder
    var t = 0
    while (t <= nT - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(str, starts.get(t + k), ends.get(t + k))
        k += 1
      }
      out(t) = UTF8String.fromString(sb.toString)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Content-defined chunking: split `s` at every codepoint position
    * whose trailing `w`-codepoint polynomial fingerprint
    * `sum_{j=0..w-1} cp(i-j) * p^j  (mod m)` is divisible by `d` —
    * the pure CDC boundary rule (FastCDC/rsync-style, without min/max
    * clamps, so every boundary is a position-local function of the `w`
    * chars ending there and any engine can recompute it). A shared
    * substring between two documents therefore chunks identically
    * regardless of what surrounds it — the re-chunking stability that
    * makes chunk-level dedup find moved/embedded duplicates that
    * fixed-width blocking misses. Returns the chunk substrings in
    * order; the (possibly boundary-less) tail is the final chunk.
    * Empty input yields an empty array. Deliberately NOT a rolling
    * hash internally: w is small, and recomputing per position keeps
    * the value bit-identical to the naive formula an oracle computes.
    */
  def cdcChunks(s: UTF8String, w: Int, p: Long, m: Long, d: Long): ArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val pow = new Array[Long](w)
    pow(0) = 1L
    var j = 1
    while (j < w) { pow(j) = pow(j - 1) * p % m; j += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var i = w - 1
    while (i < n) {
      var h = 0L
      var k = 0
      while (k < w) { h = (h + cps(i - k) * pow(k)) % m; k += 1 }
      if (h % d == 0L) {
        out += UTF8String.fromString(new String(cps, start, i - start + 1))
        start = i + 1
      }
      i += 1
    }
    if (start < n) out += UTF8String.fromString(new String(cps, start, n - start))
    new GenericArrayData(out.toArray)
  }

  /** Single-pass whitespace tokenization + per-term frequency count:
    * (dl, tfs) where dl is the token count and tfs(i) the occurrence
    * count of terms(i). One scan of the text, no token array ever
    * materializes — the engine of [[graft.operators.Retrieval]]'s
    * BM25 and the blocklist filter, replacing Q+1 full
    * tokenize-and-remove passes per document with one.
    *
    * Token boundaries replicate the `tokens()` contract EXACTLY: a
    * token is a maximal run of non-`\s` characters, where `\s` is the
    * Java regex class [ \t\n\x0B\f\r] — NOT Character.isWhitespace
    * (which adds Unicode spaces and would silently diverge from the
    * declarative form on exotic input).
    */
  def termFreqs(s: UTF8String, terms: Array[String]): InternalRow = {
    val str = s.toString
    val n = str.length
    var dl = 0L
    val tfs = new Array[Long](terms.length)
    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    var i = 0
    while (i < n) {
      while (i < n && isWs(str.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(str.charAt(i))) i += 1
        dl += 1L
        val len = i - start
        var t = 0
        while (t < terms.length) {
          val term = terms(t)
          if (term.length == len && str.regionMatches(start, term, 0, len))
            tfs(t) += 1L
          t += 1
        }
      }
    }
    new GenericInternalRow(Array[Any](dl,
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(tfs)))
  }

  /** UAX #15 NFC canonical composition (see [[NfcNormalize]]). */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** NFD, drop combining marks (Mn), recompose NFC (see
    * [[StripAccents]]).
    */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    val out = java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC)
    if (out == str) s else UTF8String.fromString(out)
  }

  /** Single-pass character-histogram statistics over UTF-16 code
    * units: (n_chars, distinct_chars, max_char_count, collision_mass)
    * with collision_mass = Σ_c n_c² — the integer numerator of the
    * Simpson index n_c²/N², i.e. an exact Rényi-2 entropy surrogate.
    * Low distinct count / high collision mass flags the low-entropy
    * boilerplate and key-mashing a float Shannon-entropy filter
    * catches, with every intermediate a 64-bit integer (no float logs,
    * so the numbers are engine-exact). ASCII takes an array fast path;
    * non-ASCII code units fall back to a small hash map.
    */
  def charHistStats(s: UTF8String): InternalRow = {
    val str = s.toString
    val ascii = new Array[Long](128)
    // boxed java.lang.Long values so the absent-key null is explicit —
    // a scala.Long value type would auto-unbox get()'s null to 0
    var other: java.util.HashMap[Character, java.lang.Long] = null
    var i = 0
    while (i < str.length) {
      val ch = str.charAt(i)
      if (ch < 128) ascii(ch) += 1L
      else {
        if (other == null) other = new java.util.HashMap[Character, java.lang.Long]()
        val prev = other.get(ch)
        other.put(ch, if (prev == null) 1L else prev + 1L)
      }
      i += 1
    }
    var n = 0L; var distinct = 0L; var maxC = 0L; var coll = 0L
    var c = 0
    while (c < 128) {
      val k = ascii(c)
      if (k > 0) {
        n += k; distinct += 1L; if (k > maxC) maxC = k; coll += k * k
      }
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val k: Long = it.next()
        n += k; distinct += 1L; if (k > maxC) maxC = k; coll += k * k
      }
    }
    new GenericInternalRow(Array[Any](n, distinct, maxC, coll))
  }
}

/** rolling_hash64(text): order-sensitive content fingerprint. */
case class RollingHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"
  override protected def nullSafeEval(input: Any): Any =
    TextRuntime.rollingHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = TextRuntime.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$rt.rollingHash($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

/** adjacent_pairs(tokens): array<string> of adjacent-token bigrams
  * ("a b"), empty for arrays shorter than 2. Null-preserving; null
  * ELEMENTS are not expected (tokenizers here never produce them).
  */
case class AdjacentPairs(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"adjacent_pairs requires array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "adjacent_pairs"
  override protected def nullSafeEval(input: Any): Any =
    TextRuntime.adjacentPairs(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = TextRuntime.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$rt.adjacentPairs($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): AdjacentPairs =
    copy(child = newChild)
}

/** word_shingles(text, n): array<string> of distinct lowercased word
  * n-gram shingles (see [[TextRuntime.wordShingles]]). Null text maps
  * to null; [[graft.operators.Dedup.shingles]] coalesces that to the
  * empty array the declarative formula produces.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"word_shingles needs n >= 1, got $n")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override protected def nullSafeEval(input: Any): Any =
    TextRuntime.wordShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = TextRuntime.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$rt.wordShingles($c, $n)")
  }
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** word_ngrams(text, n): array<string> of lowercased word n-grams
  * WITH multiplicity; fewer than n tokens → empty array (see
  * [[TextRuntime.wordNgrams]] — the strict-length, duplicate-keeping
  * sibling of [[WordShingles]]). Null text maps to null; callers
  * coalesce to the empty array their declarative formula produces.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"word_ngrams needs n >= 1, got $n")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"
  override protected def nullSafeEval(input: Any): Any =
    TextRuntime.wordNgrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = TextRuntime.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$rt.wordNgrams($c, $n)")
  }
  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** cdc_chunks(text, w, p, m, d): array<string> of content-defined
  * chunks. See [[TextRuntime.cdcChunks]]. The four numeric parameters
  * are literal ints (window width, polynomial base, modulus, boundary
  * divisor).
  */
case class CdcChunks(child: Expression, w: Int, p: Long, m: Long, d: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(w >= 1, s"cdc_chunks window must be >= 1, got $w")
  require(p >= 1 && m >= 2 && d >= 1,
    s"cdc_chunks needs base >= 1, modulus >= 2, divisor >= 1; got p=$p m=$m d=$d")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"
  override protected def nullSafeEval(input: Any): Any =
    TextRuntime.cdcChunks(input.asInstanceOf[UTF8String], w, p, m, d)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = TextRuntime.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$rt.cdcChunks($c, $w, ${p}L, ${m}L, ${d}L)")
  }
  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

/** term_freqs(text): struct<dl: long, tfs: array<long>> — single-pass
  * token count + per-term frequencies for a literal term list (see
  * [[TextRuntime.termFreqs]]). Terms ride on the expression like the
  * CDC parameters; repeated struct-field references in one projection
  * are shared by whole-stage codegen's subexpression elimination, so
  * the scan runs once per row however many fields the caller reads.
  */
case class TermFreqs(child: Expression, terms: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(terms.nonEmpty, "term_freqs needs at least one term")
  require(terms.distinct.size == terms.size, s"duplicate terms: $terms")

  @transient private lazy val termArray: Array[String] = terms.toArray

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("dl", LongType, nullable = false),
    StructField("tfs", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "term_freqs"
  override protected def nullSafeEval(input: Any): Any =
    TextRuntime.termFreqs(input.asInstanceOf[UTF8String], termArray)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = TextRuntime.getClass.getName.stripSuffix("$")
    val ts = ctx.addReferenceObj("termFreqsTerms", termArray, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"$rt.termFreqs($c, $ts)")
  }
  override protected def withNewChildInternal(newChild: Expression): TermFreqs =
    copy(child = newChild)
}

/** char_hist_stats(text): struct<n_chars, distinct_chars,
  * max_char_count, collision_mass> — one codegen'd histogram pass per
  * document (see [[TextRuntime.charHistStats]]). The declarative
  * equivalent (explode chars + groupBy(doc, char) + re-aggregate)
  * would put one row PER CHARACTER on a shuffle; this keeps the whole
  * profile map-only.
  */
/** nfc_normalize(text): Unicode NFC canonical composition — the
  * normalization every multilingual EXACT-dedup must run first
  * ("café" with a precomposed é and with e + COMBINING ACUTE are the
  * same document; byte-level md5 says otherwise). One codegen'd call
  * into `java.text.Normalizer`, which short-circuits on
  * already-normalized text (the ASCII common case is a scan, not a
  * rewrite). DuckDB's `nfc_normalize` matches codepoint-for-codepoint
  * — both implement UAX #15.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(input: Any): Any =
    TextRuntime.nfcNormalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = TextRuntime.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$rt.nfcNormalize($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** strip_accents(text): NFD decomposition with combining marks
  * (category Mn) removed, recomposed NFC — "café" → "cafe",
  * "Müller" → "Muller". Matches DuckDB's `strip_accents` on
  * combining-decomposable letters (the Latin/Greek/Cyrillic accent
  * repertoire); letters with no canonical decomposition (ł, ø, æ)
  * pass through unchanged in BOTH engines — that is the documented
  * semantics, not a gap.
  */
case class StripAccents(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"
  override protected def nullSafeEval(input: Any): Any =
    TextRuntime.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = TextRuntime.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$rt.stripAccents($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

case class CharHistStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false),
    StructField("max_char_count", LongType, nullable = false),
    StructField("collision_mass", LongType, nullable = false)))
  override def prettyName: String = "char_hist_stats"
  override protected def nullSafeEval(input: Any): Any =
    TextRuntime.charHistStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = TextRuntime.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$rt.charHistStats($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): CharHistStats =
    copy(child = newChild)
}

object TextOps {
  def rollingHash64(s: Column): Column =
    ColumnBridge.column(RollingHash64(ColumnBridge.expression(s)))

  def adjacentPairs(tokens: Column): Column =
    ColumnBridge.column(AdjacentPairs(ColumnBridge.expression(tokens)))

  def cdcChunks(text: Column, w: Int, p: Long, m: Long, d: Long): Column =
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(text), w, p, m, d))

  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  def wordNgrams(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(text), n))

  def charHistStats(text: Column): Column =
    ColumnBridge.column(CharHistStats(ColumnBridge.expression(text)))

  def termFreqs(text: Column, terms: Seq[String]): Column =
    ColumnBridge.column(TermFreqs(ColumnBridge.expression(text), terms))

  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))

  def stripAccents(text: Column): Column =
    ColumnBridge.column(StripAccents(ColumnBridge.expression(text)))

  private[functions] def charHistStatsBuilder(children: Seq[Expression]): Expression = {
    if (children.length != 1)
      throw new IllegalArgumentException(s"char_hist_stats expects 1 argument, got ${children.length}")
    CharHistStats(children.head)
  }

  private[functions] def rollingHash64Builder(children: Seq[Expression]): Expression = {
    if (children.length != 1)
      throw new IllegalArgumentException(s"rolling_hash64 expects 1 argument, got ${children.length}")
    RollingHash64(children.head)
  }

  private[functions] def adjacentPairsBuilder(children: Seq[Expression]): Expression = {
    if (children.length != 1)
      throw new IllegalArgumentException(s"adjacent_pairs expects 1 argument, got ${children.length}")
    AdjacentPairs(children.head)
  }

  private[functions] def cdcChunksBuilder(children: Seq[Expression]): Expression = {
    if (children.length != 5)
      throw new IllegalArgumentException(s"cdc_chunks expects 5 arguments, got ${children.length}")
    def longLit(e: Expression, what: String): Long = {
      if (!e.foldable)
        throw new IllegalArgumentException(s"$what must be a literal")
      e.eval() match {
        case n: Number => n.longValue()
        case other => throw new IllegalArgumentException(
          s"$what must be an integer literal, got ${if (other == null) "NULL" else other}")
      }
    }
    CdcChunks(children.head, longLit(children(1), "cdc_chunks w").toInt,
      longLit(children(2), "cdc_chunks p"), longLit(children(3), "cdc_chunks m"),
      longLit(children(4), "cdc_chunks d"))
  }
}
