package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Shared runtime for the native near-dup expressions: per-document
  * shingle hashing, MinHash signatures, LSH band keys, and SimHash —
  * each a single pass over the document inside whole-stage codegen via
  * a static call.
  *
  * Why this exists: the document→signature step of near-dup pipelines
  * is per-row math, but expressing it with Spark built-ins forces a
  * relational detour — posexplode + window + distinct + a k-way
  * min-aggregate is three shuffles of per-token rows before the first
  * candidate pair forms. At 100 TB those shuffles dominate the job.
  * These expressions collapse the detour to a projection: the only
  * shuffles left in minhash-LSH are the band self-join and candidate
  * verify, which are the parts that genuinely need a cluster.
  *
  * Hash compatibility: all hashing matches Spark's `xxhash64(...)`
  * exactly (XXH64, seed 42, multi-arg chaining), so results are
  * bit-identical to the declarative formulation in [[graft.operators.Dedup]]
  * and stable across executors and runs.
  */
object MinHashRuntime {

  private val EMPTY = UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  /** xxhash64(utf8 bytes of s) with Spark's seed 42. */
  private def hashString(s: String): Long = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
  }

  /** Whitespace tokens of the lowercased text (= TextAnalysis.tokens
    * on lower(text): split on \s+, empties dropped).
    */
  private def tokensOf(text: UTF8String): Array[String] = {
    val s = text.toLowerCase.toString
    val raw = s.split("\\s+")
    var nonEmpty = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) nonEmpty += 1; i += 1 }
    if (nonEmpty == raw.length) raw
    else {
      val out = new Array[String](nonEmpty)
      var j = 0
      i = 0
      while (i < raw.length) { if (raw(i).nonEmpty) { out(j) = raw(i); j += 1 }; i += 1 }
      out
    }
  }

  /** Distinct xxhash64'd word n-gram shingles of the lowercased text,
    * in first-occurrence order. Documents shorter than n tokens
    * contribute their whole text as one shingle; empty documents yield
    * an empty array.
    */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return EMPTY
    val toks = tokensOf(text)
    if (toks.length == 0) return EMPTY
    val nShingles = if (toks.length >= n) toks.length - n + 1 else 1
    val width = if (toks.length >= n) n else toks.length
    val seen = new java.util.HashSet[java.lang.Long](nShingles * 2)
    val out = new Array[Long](nShingles)
    var m = 0
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nShingles) {
      sb.setLength(0)
      var j = 0
      while (j < width) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val h = hashString(sb.toString)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }

  /** POSITIONAL hashed k-token windows — [[shingleHashes]] without the
    * distinct and without the short-document fallback: one hash per
    * window position (within-document repeats kept — they're what
    * span-duplication counting needs), documents shorter than n tokens
    * yield an empty array. Hash values are identical to
    * xxhash64(concat_ws(" ", window tokens)) of the lowercased text.
    */
  def windowHashes(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return EMPTY
    val toks = tokensOf(text)
    if (toks.length < n) return EMPTY
    val nWins = toks.length - n + 1
    val out = new Array[Long](nWins)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nWins) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = hashString(sb.toString)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** MinHash signature: element s of the result is
    * min over shingle hashes h of xxhash64(h, s) — identical to the
    * aggregate min(xxhash64(col("h"), lit(s))) formulation
    * (XXH64.hashLong(h, 42) chained into hashInt(s, _)).
    */
  def minhashSig(sh: ArrayData, k: Int): ArrayData = {
    if (sh == null || sh.numElements() == 0) return EMPTY
    val n = sh.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = XXH64.hashLong(sh.getLong(i), 42L)
      var s = 0
      while (s < k) {
        val d = XXH64.hashInt(s, base)
        if (d < mins(s)) mins(s) = d
        s += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** LSH band keys: band b hashes the comma-joined decimal rendering of
    * signature slice [b*rows, (b+1)*rows) with b chained in — identical
    * to xxhash64(concat_ws(",", slice cast to string), lit(b)).
    *
    * Bounds-checked: UnsafeArrayData.getLong does NOT bounds-check in
    * production, so without the guard a bands*rows larger than the
    * signature silently reads out-of-bounds heap and returns
    * nondeterministic garbage keys.
    */
  def lshBandKeys(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    if (sig == null || sig.numElements() == 0) return EMPTY
    if (bands.toLong * rows > sig.numElements())
      throw new IllegalArgumentException(
        s"lsh_band_keys: bands*rows = ${bands.toLong * rows} exceeds signature length ${sig.numElements()}")
    val out = new Array[Long](bands)
    val sb = new java.lang.StringBuilder(rows * 21)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rows) {
        if (r > 0) sb.append(',')
        sb.append(sig.getLong(b * rows + r))
        r += 1
      }
      out(b) = XXH64.hashInt(b, hashString(sb.toString))
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  // --- engine-portable (md5-based) variants -------------------------
  // Hash contract: the value equals parseLong(md5Hex("<seed>:" + s)
  // .substring(0, 15), 16) — i.e. the top 60 bits of the digest —
  // reproducible in any engine that can md5 (DuckDB oracle, Python
  // audit jobs). See graft.operators.Dedup.portableHash60 for the
  // declarative executable spec these are pinned against in DedupSpec.

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val seedPrefixes = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Byte]]()
  private def seedPrefix(seed: Int): Array[Byte] = {
    val cached = seedPrefixes.get(seed)
    if (cached != null) cached
    else {
      val b = (seed.toString + ":").getBytes(StandardCharsets.UTF_8)
      seedPrefixes.putIfAbsent(seed, b)
      b
    }
  }

  /** Top 60 bits of md5(prefix ++ valueBytes), as a non-negative long:
    * the first 15 hex chars of the digest parsed base-16 (== big-endian
    * first 8 bytes >>> 4).
    */
  private def md5Hash60(prefix: Array[Byte], value: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(prefix)
    md.update(value)
    val d = md.digest()
    val be = ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) | ((d(2) & 0xFFL) << 40) |
      ((d(3) & 0xFFL) << 32) | ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
    be >>> 4
  }

  /** Portable MinHash signature straight from text: element s is
    * min over distinct word-n-gram shingles g of
    * md5Hash60("<s>:" + g). Value-identical to the declarative
    * array_min(transform(shingles, portableHash60(_, s))) formulation,
    * ~30× faster (one tokenize pass, byte-level hashing, no per-seed
    * string re-concat).
    */
  def portableMinhashSig(text: UTF8String, n: Int, k: Int): ArrayData = {
    if (text == null) return EMPTY
    val toks = tokensOf(text)
    if (toks.length == 0) return EMPTY
    val nShingles = if (toks.length >= n) toks.length - n + 1 else 1
    val width = if (toks.length >= n) n else toks.length
    val seen = new java.util.HashSet[String](nShingles * 2)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nShingles) {
      sb.setLength(0)
      var j = 0
      while (j < width) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val shingle = sb.toString
      if (seen.add(shingle)) {
        val bytes = shingle.getBytes(StandardCharsets.UTF_8)
        var s = 0
        while (s < k) {
          val h = md5Hash60(seedPrefix(s), bytes)
          if (h < mins(s)) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Portable 60-bit SimHash: per token-occurrence, md5Hash60("0:"+t)
    * votes ±1 on 60 bit positions; sign of the total is the bit.
    * Returns 0L for no-token documents (callers filter
    * `text rlike "\\S"`), and always fits in [0, 2^60).
    */
  def simhash60md5(text: UTF8String): Long = {
    if (text == null) return 0L
    val toks = tokensOf(text)
    val votes = new Array[Int](60)
    val prefix = seedPrefix(0)
    var i = 0
    while (i < toks.length) {
      val h = md5Hash60(prefix, toks(i).getBytes(StandardCharsets.UTF_8))
      var bit = 0
      while (bit < 60) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 60) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  /** SimHash-64 of the lowercased whitespace tokens (every occurrence
    * votes, not distinct tokens — same as the explode + 64-sum
    * aggregate). Returns 0L for documents with no tokens; callers that
    * must distinguish "no tokens" filter on `text rlike "\\S"`.
    */
  def simhash(text: UTF8String): Long = {
    if (text == null) return 0L
    val toks = tokensOf(text)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = hashString(toks(i))
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }
}

/** Base for the unary native expressions: null-preserving (NULL in →
  * NULL out, matching the declarative formulations in
  * [[graft.operators.Dedup]]), analysis-time input typing via
  * ExpectsInputTypes, codegen through a static forwarder call (never
  * MODULE$ — janino cannot resolve it).
  */
private[functions] trait MinHashExprBase extends UnaryExpression with ExpectsInputTypes {

  /** Java source for the static call producing the value from the
    * child's (non-null) value variable.
    */
  protected def staticCall(childValue: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => staticCall(c))
}

private[functions] object MinHashExprBase {
  val runtime: String = MinHashRuntime.getClass.getName.stripSuffix("$")
}

/** shingle_hashes(text, n): array<long> of distinct hashed word
  * n-grams. See [[MinHashRuntime.shingleHashes]].
  */
case class ShingleHashes(child: Expression, n: Int) extends MinHashExprBase {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    MinHashRuntime.shingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def staticCall(in: String): String =
    s"${MinHashExprBase.runtime}.shingleHashes($in, $n)"
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** window_hashes(text, n): array<long> of positional (non-distinct)
  * hashed n-token windows. See [[MinHashRuntime.windowHashes]].
  */
case class WindowHashes(child: Expression, n: Int) extends MinHashExprBase {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "window_hashes"
  override protected def nullSafeEval(input: Any): Any =
    MinHashRuntime.windowHashes(input.asInstanceOf[UTF8String], n)
  override protected def staticCall(in: String): String =
    s"${MinHashExprBase.runtime}.windowHashes($in, $n)"
  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

/** minhash_sig(shingles, k): array<long> of k seeded minima. */
case class MinHashSig(child: Expression, k: Int) extends MinHashExprBase {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(ArrayType(LongType))
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    MinHashRuntime.minhashSig(input.asInstanceOf[ArrayData], k)
  override protected def staticCall(in: String): String =
    s"${MinHashExprBase.runtime}.minhashSig($in, $k)"
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** lsh_band_keys(sig, bands, rows): array<long> of band bucket keys.
  * Fails with IllegalArgumentException when bands*rows exceeds the
  * signature length (see [[MinHashRuntime.lshBandKeys]]).
  */
case class LshBandKeys(child: Expression, bands: Int, rows: Int) extends MinHashExprBase {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(ArrayType(LongType))
  override def prettyName: String = "lsh_band_keys"
  override protected def nullSafeEval(input: Any): Any =
    MinHashRuntime.lshBandKeys(input.asInstanceOf[ArrayData], bands, rows)
  override protected def staticCall(in: String): String =
    s"${MinHashExprBase.runtime}.lshBandKeys($in, $bands, $rows)"
  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)
}

/** simhash64(text): 64-bit SimHash of the lowercased tokens. Note a
  * no-token document and a document whose bits all vote negative both
  * hash to 0L — callers that must distinguish them filter on
  * `text rlike "\\S"` first (as [[graft.operators.Dedup.simhashSignatures]]
  * does).
  */
case class SimHash64(child: Expression) extends MinHashExprBase {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    MinHashRuntime.simhash(input.asInstanceOf[UTF8String])
  override protected def staticCall(in: String): String =
    s"${MinHashExprBase.runtime}.simhash($in)"
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** portable_minhash_sig(text, n, k): engine-portable (md5-based)
  * MinHash signature. See [[MinHashRuntime.portableMinhashSig]].
  */
case class PortableMinhashSig(child: Expression, n: Int, k: Int) extends MinHashExprBase {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "portable_minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    MinHashRuntime.portableMinhashSig(input.asInstanceOf[UTF8String], n, k)
  override protected def staticCall(in: String): String =
    s"${MinHashExprBase.runtime}.portableMinhashSig($in, $n, $k)"
  override protected def withNewChildInternal(newChild: Expression): PortableMinhashSig =
    copy(child = newChild)
}

/** simhash60_md5(text): engine-portable 60-bit SimHash. See
  * [[MinHashRuntime.simhash60md5]].
  */
case class SimHash60Md5(child: Expression) extends MinHashExprBase {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "simhash60_md5"
  override protected def nullSafeEval(input: Any): Any =
    MinHashRuntime.simhash60md5(input.asInstanceOf[UTF8String])
  override protected def staticCall(in: String): String =
    s"${MinHashExprBase.runtime}.simhash60md5($in)"
  override protected def withNewChildInternal(newChild: Expression): SimHash60Md5 =
    copy(child = newChild)
}

/** Column-API surface for the native near-dup expressions. */
object MinHash {
  private def lit(e: Expression, what: String): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$what must be a literal")
    e.eval() match {
      case num: Number => num.intValue()
      case other =>
        throw new IllegalArgumentException(
          s"$what must be an integer literal, got ${if (other == null) "NULL" else other}")
    }
  }

  private def arity(children: Seq[Expression], n: Int, name: String): Unit =
    if (children.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${children.length}")

  def shingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n))
  def windowHashes(text: Column, n: Int): Column =
    ColumnBridge.column(WindowHashes(ColumnBridge.expression(text), n))
  def minhashSig(sh: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(sh), k))
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    ColumnBridge.column(LshBandKeys(ColumnBridge.expression(sig), bands, rows))
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))
  def portableMinhashSig(text: Column, n: Int, k: Int): Column =
    ColumnBridge.column(PortableMinhashSig(ColumnBridge.expression(text), n, k))
  def simhash60md5(text: Column): Column =
    ColumnBridge.column(SimHash60Md5(ColumnBridge.expression(text)))

  /** SQL builders (literal int args) for function-registry injection.
    * Arity is validated here; the child's type is validated at analysis
    * time via ExpectsInputTypes on the expressions.
    */
  private[functions] def shingleHashesBuilder(children: Seq[Expression]): Expression = {
    arity(children, 2, "shingle_hashes")
    ShingleHashes(children.head, lit(children(1), "shingle_hashes n"))
  }
  private[functions] def windowHashesBuilder(children: Seq[Expression]): Expression = {
    arity(children, 2, "window_hashes")
    WindowHashes(children.head, lit(children(1), "window_hashes n"))
  }
  private[functions] def minhashSigBuilder(children: Seq[Expression]): Expression = {
    arity(children, 2, "minhash_sig")
    MinHashSig(children.head, lit(children(1), "minhash_sig k"))
  }
  private[functions] def lshBandKeysBuilder(children: Seq[Expression]): Expression = {
    arity(children, 3, "lsh_band_keys")
    LshBandKeys(children.head, lit(children(1), "lsh_band_keys bands"), lit(children(2), "lsh_band_keys rows"))
  }
  private[functions] def simhash64Builder(children: Seq[Expression]): Expression = {
    arity(children, 1, "simhash64")
    SimHash64(children.head)
  }
  private[functions] def portableMinhashSigBuilder(children: Seq[Expression]): Expression = {
    arity(children, 3, "portable_minhash_sig")
    PortableMinhashSig(children.head,
      lit(children(1), "portable_minhash_sig n"), lit(children(2), "portable_minhash_sig k"))
  }
  private[functions] def simhash60md5Builder(children: Seq[Expression]): Expression = {
    arity(children, 1, "simhash60_md5")
    SimHash60Md5(children.head)
  }
}
