package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused, codegen'd text kernels for the dedup/minhash pipeline.
  *
  * The composable column form ([[TextFunctions]]) builds tokens → shingles →
  * hashes out of higher-order functions (`filter`/`transform`/`aggregate`),
  * which Spark evaluates interpreted: one lambda dispatch per element, boxed.
  * At corpus scale that is the dominant cost (it was ~20 s of the sf0.1
  * bench). These expressions compute the same values in one primitive pass
  * per row and participate in whole-stage codegen.
  *
  * Semantics are pinned to the DuckDB oracle fragments used by the harness:
  *  - tokens: split on `\s+`, empties dropped;
  *  - shingles(n): space-joined n-grams; < n tokens → ONE whole-doc shingle
  *    (so an empty doc yields the single shingle "");
  *  - portable hash: first 8 hex digits of md5, as an unsigned 32-bit value;
  *  - minhash lane i: min over DISTINCT shingles of (h*a_i + b_i) mod p.
  */
object TextKernels {

  private val md5Local = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** First 8 hex digits of md5(bytes) parsed as an unsigned int — identical
    * to conv(substring(md5(x),1,8),16,10) in Spark and
    * ('0x'||substr(md5(x),1,8))::BIGINT in DuckDB.
    */
  def portableHash(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    // first 4 digest bytes = first 8 hex digits
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def tokenize(text: UTF8String): Array[String] = {
    val s = text.toString
    if (s.isEmpty) return Array.empty
    val raw = s.split("\\s+")
    // leading separator produces one empty first element; drop it
    if (raw.nonEmpty && raw(0).isEmpty) raw.drop(1) else raw
  }

  def tokens(text: UTF8String): ArrayData = {
    val t = tokenize(text)
    new GenericArrayData(t.map(UTF8String.fromString(_).asInstanceOf[Any]))
  }

  def shingleStrings(text: UTF8String, n: Int): Array[String] = {
    val t = tokenize(text)
    val count = math.max(t.length - (n - 1), 1)
    val out = new Array[String](count)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, t.length)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(t(j))
        j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  def shingles(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(shingleStrings(text, n)
      .map(UTF8String.fromString(_).asInstanceOf[Any]))

  /** Feature-hashing ("hashing trick" — Weinberger et al., ICML 2009)
    * text embedding: every token hashes to a bucket in [0, dim) and a ±1
    * sign, and the embedding is the signed token-count histogram. One
    * narrow pass, no vocabulary, no model — the classic cheap featurizer
    * that lets text flow into the vector operators (near-dup, ANN,
    * clustering) with no external dependency. INTEGER-EXACT by design
    * (array<long>, not floats): the DuckDB twin reproduces every value
    * bit for bit via the same portable hash; L2-normalize downstream
    * (the index builders' `unitize`) when cosine geometry is needed.
    */
  def hashEmbedOf(text: UTF8String, dim: Int): ArrayData = {
    val toks = tokenize(text)
    val v = new Array[Long](dim)
    var i = 0
    while (i < toks.length) {
      val h = portableHash(toks(i).getBytes("UTF-8"))
      // portableHash is a non-negative 32-bit value: % keeps the bucket in
      // range with no floor-mod concern, and bit 16 is independent of the
      // low bucket bits for any realistic dim
      v((h % dim).toInt) += (if (((h >> 16) & 1L) == 1L) 1L else -1L)
      i += 1
    }
    new GenericArrayData(v.map(java.lang.Long.valueOf(_).asInstanceOf[Any]))
  }

  /** Gopher-shape repetition statistics (Rae et al., "Scaling Language
    * Models: ... Gopher", 2021, §A1.1) in ONE fused pass:
    * `[n_lines, dup_lines, line_chars, dup_line_chars, top2_cnt,
    * top2_chars]`, all longs —
    *  - lines split on '\n', zero-length lines dropped; `dup_*` count
    *    every occurrence of a line that appears ≥ 2 times;
    *  - `top2_*` is the most frequent word bigram (ties broken toward
    *    the UTF-8-byte-smallest gram, the binary-collation ORDER BY a
    *    SQL twin uses) with its char mass = count × gram length.
    * Char counts are code points, matching SQL `len()`. Integer-exact
    * by design: the duplicate-line / duplicate-char / top-gram-char
    * FRACTIONS the Gopher filters threshold are left as cross-multiplied
    * integer comparisons in the caller.
    */
  def repetitionStatsOf(text: UTF8String): ArrayData = {
    val s = text.toString
    var nLines = 0L; var dupLines = 0L
    var lineChars = 0L; var dupLineChars = 0L
    if (s.nonEmpty) {
      val counts = new java.util.HashMap[String, Int]()
      val parts = s.split("\n", -1)
      var i = 0
      while (i < parts.length) {
        if (parts(i).nonEmpty) counts.merge(parts(i), 1, Integer.sum _)
        i += 1
      }
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue.toLong
        val chars = e.getKey.codePointCount(0, e.getKey.length).toLong
        nLines += c
        lineChars += c * chars
        if (c >= 2) { dupLines += c; dupLineChars += c * chars }
      }
    }
    val grams = shingleStrings(text, 2)
    val gc = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < grams.length) { gc.merge(grams(i), 1, Integer.sum _); i += 1 }
    var bestCnt = 0L
    var bestGram: String = null
    var bestBytes: Array[Byte] = null
    val ge = gc.entrySet().iterator()
    while (ge.hasNext) {
      val e = ge.next()
      val c = e.getValue.toLong
      if (c > bestCnt) {
        bestCnt = c; bestGram = e.getKey; bestBytes = null
      } else if (c == bestCnt && bestGram != null) {
        if (bestBytes == null) bestBytes = bestGram.getBytes("UTF-8")
        val cand = e.getKey.getBytes("UTF-8")
        if (java.util.Arrays.compareUnsigned(cand, bestBytes) < 0) {
          bestGram = e.getKey; bestBytes = cand
        }
      }
    }
    val topChars = if (bestGram == null) 0L
      else bestCnt * bestGram.codePointCount(0, bestGram.length)
    new GenericArrayData(Array(nLines, dupLines, lineChars, dupLineChars,
      bestCnt, topChars).map(_.asInstanceOf[Any]))
  }

  /** SimHash over DISTINCT tokens: bit b set when the ±1 vote sum over
    * token-hash bit b is positive. One pass, no shuffle — same values as
    * the explode + 32-sum-lanes groupBy formulation.
    */
  def simhashOf(text: UTF8String, bits: Int): Long = {
    val toks = tokenize(text)
    val seen = new java.util.HashSet[String](toks.length * 2)
    val votes = new Array[Int](bits)
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        val h = portableHash(toks(i).getBytes("UTF-8"))
        var b = 0
        while (b < bits) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Unicode NFC canonicalization — the normalization pass that runs
    * BEFORE hashing/dedup in a text pipeline, so visually-identical
    * strings with different code-point sequences (decomposed accents,
    * compatibility forms a crawler emits) hash identically. Pure JDK
    * `java.text.Normalizer` (Unicode-standard NFC, the same form
    * DuckDB's `nfc_normalize` and Python's `unicodedata` produce), so
    * the oracle is exact. ASCII-only strings round-trip untouched.
    */
  def nfcNormalize(text: UTF8String): UTF8String = {
    val s = text.toString
    // fast path: Normalizer.isNormalized is O(n) with no allocation —
    // the common (ASCII/already-NFC) case never copies
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Distinct-shingle xxhash64 witness set (seed 42 — Spark's xxhash64
    * builtin applied to the same UTF-8 bytes), first-occurrence order:
    * the fused form of `transform(array_distinct(shingles(text, n)),
    * xxhash64)`. Higher-order functions evaluate interpreted — one
    * boxed lambda dispatch per element — so the HOF chain was the
    * dominant per-row cost of the dedup-index state build; this is one
    * primitive pass sharing [[shingleStrings]]' dedup set.
    */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val sh = shingleStrings(text, n)
    val seen = new java.util.HashSet[String](sh.length * 2)
    val out = new Array[Any](sh.length)
    var m = 0
    var i = 0
    while (i < sh.length) {
      if (seen.add(sh(i))) {
        out(m) = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(UTF8String.fromString(sh(i)), StringType, 42L)
        m += 1
      }
      i += 1
    }
    new GenericArrayData(if (m == sh.length) out
      else java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], m))
  }

  /** Exact jaccard THRESHOLD test over two DISTINCT long hash sets in
    * one fused pass — arithmetic identical to the SQL form
    * `i >= 1 AND CAST(i AS DOUBLE) >= threshold *
    * CAST(|a| + |b| - i AS DOUBLE)` with `i = size(array_intersect)`:
    * same long intersection count, same IEEE double multiply/compare.
    * One hash-set probe per pair instead of the 3 array_intersect
    * evaluations the optimizer produces when the SQL filter is pushed
    * into a join condition (each reference re-evaluates). The `i >= 1`
    * leg means empty sets can never reject (the historical
    * explode-form contract: no intersection row, no rejection).
    */
  def jaccardMeets(a: ArrayData, b: ArrayData, threshold: Double): Boolean = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return false
    val (small, big, ns, nbig) =
      if (na <= nb) (a, b, na, nb) else (b, a, nb, na)
    val set = new java.util.HashSet[java.lang.Long](ns * 2)
    var i = 0
    while (i < ns) { set.add(small.getLong(i)); i += 1 }
    var inter = 0L
    var j = 0
    while (j < nbig) {
      if (set.contains(big.getLong(j))) inter += 1
      j += 1
    }
    inter >= 1L &&
      inter.toDouble >= threshold * (na.toLong + nb.toLong - inter).toDouble
  }

  /** [[jaccardMeets]] over distinct STRING sets (raw shingle arrays —
    * the decontamination operators verify string-exact, not hashed).
    */
  def jaccardMeetsStr(a: ArrayData, b: ArrayData, threshold: Double)
      : Boolean = {
    val inter = interStr(a, b)
    inter >= 1L && inter.toDouble >= threshold *
      (a.numElements().toLong + b.numElements().toLong - inter).toDouble
  }

  /** Exact jaccard VALUE over two distinct string sets, or null when
    * the sets share nothing (or either is empty) — the "no intersection
    * row" contract of the historical explode-form verify, so a filter
    * on `jaccard >= threshold` drops exactly the pairs the old shape
    * never emitted. Arithmetic identical to the SQL form
    * `CAST(i AS DOUBLE) / CAST(|a| + |b| - i AS DOUBLE)`.
    */
  def jaccardValueStr(a: ArrayData, b: ArrayData): java.lang.Double = {
    val inter = interStr(a, b)
    if (inter == 0L) null
    else java.lang.Double.valueOf(inter.toDouble /
      (a.numElements().toLong + b.numElements().toLong - inter).toDouble)
  }

  private def interStr(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0L
    val (small, big, ns, nbig) =
      if (na <= nb) (a, b, na, nb) else (b, a, nb, na)
    val set = new java.util.HashSet[UTF8String](ns * 2)
    var i = 0
    while (i < ns) { set.add(small.getUTF8String(i)); i += 1 }
    var inter = 0L
    var j = 0
    while (j < nbig) {
      if (set.contains(big.getUTF8String(j))) inter += 1
      j += 1
    }
    inter
  }

  /** All k minhash lanes over distinct shingles, one pass, no shuffle. */
  def minhashLanes(text: UTF8String, k: Int, n: Int): ArrayData = {
    val sh = shingleStrings(text, n)
    val seen = new java.util.HashSet[String](sh.length * 2)
    val mins = Array.fill(k)(Long.MaxValue)
    val coeffs = Dedup2Coeffs.get(k)
    var i = 0
    while (i < sh.length) {
      if (seen.add(sh(i))) {
        val h = portableHash(sh(i).getBytes("UTF-8"))
        var lane = 0
        while (lane < k) {
          val v = (h * coeffs(2 * lane) + coeffs(2 * lane + 1)) % 2147483647L
          if (v < mins(lane)) mins(lane) = v
          lane += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(_.asInstanceOf[Any]))
  }
}

/** Flattened (a0,b0,a1,b1,…) minhash coefficient cache, matching
  * [[graft.operators.Dedup.minhashCoeffs]].
  */
object Dedup2Coeffs {
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  def get(k: Int): Array[Long] = cache.computeIfAbsent(k, k => {
    val out = new Array[Long](2 * k)
    var i = 0
    while (i < k) {
      out(2 * i) = 2L * i + 1001L
      out(2 * i + 1) = 3L * i + 7877L
      i += 1
    }
    out
  })
}

/** tokens(text): array<string> — codegen'd. */
case class TokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.tokens(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.tokens($c)")
  override protected def withNewChildInternal(c: Expression): TokensExpr =
    copy(child = c)
}

/** shingles(text, n): array<string> — codegen'd. */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.shingles(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.shingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShinglesExpr =
    copy(child = c)
}

/** minhash_sig(text, k, n): array<long> of the k lane minima — the whole
  * tokenize→shingle→distinct→hash→min pipeline fused into one map-side
  * expression; signature computation needs NO shuffle at all.
  */
case class MinhashSigExpr(child: Expression, k: Int, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.minhashLanes(t.asInstanceOf[UTF8String], k, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.minhashLanes($c, $k, $n)")
  override protected def withNewChildInternal(c: Expression): MinhashSigExpr =
    copy(child = c)
}

/** shingle_hashes(text, n): array<long> — codegen'd fused
  * distinct-shingle xxhash64 witness set (see
  * [[TextKernels.shingleHashes]]); value-identical to
  * `transform(array_distinct(shingles(text, n)), xxhash64)`.
  */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.shingleHashes(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.shingleHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr =
    copy(child = c)
}

/** jaccard_meets(a, b, threshold): boolean — codegen'd fused exact
  * jaccard threshold test over two distinct long hash sets (see
  * [[TextKernels.jaccardMeets]]); value-identical to
  * `size(array_intersect(a, b)) >= 1 AND
  * CAST(size(array_intersect(a, b)) AS DOUBLE) >= threshold *
  * CAST(size(a) + size(b) - size(array_intersect(a, b)) AS DOUBLE)`.
  */
case class JaccardMeetsExpr(left: Expression, right: Expression,
    threshold: Double) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  // dispatch on the element type: long arrays are the persisted witness
  // hash sets (dedup index), string arrays the raw shingle sets
  // (decontamination) — one expression, two kernels, same arithmetic
  private def isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (isLong)
      TextKernels.jaccardMeets(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], threshold)
    else
      TextKernels.jaccardMeetsStr(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], threshold)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isLong) "jaccardMeets" else "jaccardMeetsStr"
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextKernels.$m($a, $b, ${threshold}D)")
  }
  override def toString: String = s"jaccard_meets($left, $right, $threshold)"
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): JaccardMeetsExpr = copy(left = l, right = r)
}

/** jaccard_value(a, b): double — codegen'd exact jaccard over two
  * distinct string sets, NULL when they share nothing (see
  * [[TextKernels.jaccardValueStr]]); value-identical to the historical
  * explode → intersection-count → size-join form, which emitted no row
  * for zero-overlap pairs.
  */
case class JaccardValueExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true // null for zero-overlap pairs
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaccardValueStr(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r =
        graft.functions.TextKernels.jaccardValueStr($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  override def toString: String = s"jaccard_value($left, $right)"
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): JaccardValueExpr = copy(left = l, right = r)
}

/** hash_embed(text, dim): array<long> — codegen'd one-pass
  * feature-hashing embedding (see [[TextKernels.hashEmbedOf]]).
  */
case class HashEmbedExpr(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.hashEmbedOf(t.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.hashEmbedOf($c, $dim)")
  override protected def withNewChildInternal(c: Expression): HashEmbedExpr =
    copy(child = c)
}

/** nfc_normalize(text): string — codegen'd Unicode NFC canonicalization
  * (see [[TextKernels.nfcNormalize]]).
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.nfcNormalize(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.nfcNormalize($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalizeExpr =
    copy(child = c)
}

/** repetition_stats(text): array<long> — codegen'd one-pass Gopher
  * repetition statistics (see [[TextKernels.repetitionStatsOf]]).
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.repetitionStatsOf(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.repetitionStatsOf($c)")
  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr =
    copy(child = c)
}

/** simhash(text, bits): long — codegen'd single pass over distinct tokens. */
case class SimhashExpr(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.simhashOf(t.asInstanceOf[UTF8String], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhashOf($c, $bits)")
  override protected def withNewChildInternal(c: Expression): SimhashExpr =
    copy(child = c)
}

/** Longest-match piece trie for [[BpeEncodeExpr]] — built once per
  * executor from the serialized piece list (the expression ships the
  * pieces; the trie itself is a transient local rebuild). Children are
  * flat sorted-array maps: the alphabet of a subword vocabulary is
  * small, and a binary-searched char array beats a HashMap's boxing on
  * the per-character hot path.
  */
final class BpeTrie(pieces: Seq[(String, Int)]) extends Serializable {
  // node storage: parallel arrays — chars/children index into nodes
  private final class Node {
    var id: Int = -1 // accepting piece id, -1 = not a piece boundary
    var keys: Array[Char] = Array.empty
    var kids: Array[Node] = Array.empty
    def child(c: Char): Node = {
      val i = java.util.Arrays.binarySearch(keys, c)
      if (i >= 0) kids(i) else null
    }
    def addChild(c: Char): Node = {
      val i = java.util.Arrays.binarySearch(keys, c)
      if (i >= 0) return kids(i)
      val at = -i - 1
      val nk = new Array[Char](keys.length + 1)
      val nn = new Array[Node](keys.length + 1)
      System.arraycopy(keys, 0, nk, 0, at)
      System.arraycopy(kids, 0, nn, 0, at)
      nk(at) = c
      val fresh = new Node
      nn(at) = fresh
      System.arraycopy(keys, at, nk, at + 1, keys.length - at)
      System.arraycopy(kids, at, nn, at + 1, keys.length - at)
      keys = nk; kids = nn
      fresh
    }
  }
  private val root = new Node
  pieces.foreach { case (p, id) =>
    var n = root
    var i = 0
    while (i < p.length) { n = n.addChild(p.charAt(i)); i += 1 }
    // ties on an identical piece string keep the smallest id — the same
    // min(id) rule the piece-vocab builder and the SQL twin apply
    if (n.id < 0 || id < n.id) n.id = id
  }

  /** Greedy longest-match-first encode of one word (the WordPiece /
    * MaxMatch rule): at each position take the longest piece the trie
    * accepts; an unmatched character emits UNK (id 0) and advances one.
    */
  def encodeWord(w: String, out: java.util.ArrayList[Integer]): Unit = {
    var p = 0
    while (p < w.length) {
      var n = root
      var i = p
      var bestId = -1
      var bestEnd = p
      while (i < w.length && { n = n.child(w.charAt(i)); n != null }) {
        i += 1
        if (n.id >= 0) { bestId = n.id; bestEnd = i }
      }
      if (bestId >= 0) { out.add(bestId); p = bestEnd }
      else { out.add(0); p += 1 } // UNK
    }
  }

  /** Number of pieces [[encodeWord]] would emit, without materializing
    * them — every match and every UNK emits exactly one id, so the count
    * is the walk alone. The count-only token counter
    * ([[BpeCountExpr]]) runs on this: packing/budget operators need
    * `size(bpeEncode(…))`, never the ids.
    */
  def countWord(w: String): Int = {
    var p = 0
    var cnt = 0
    while (p < w.length) {
      var n = root
      var i = p
      var bestEnd = -1
      while (i < w.length && { n = n.child(w.charAt(i)); n != null }) {
        i += 1
        if (n.id >= 0) bestEnd = i
      }
      cnt += 1
      p = if (bestEnd >= 0) bestEnd else p + 1
    }
    cnt
  }

  /** Number of UNK emissions [[encodeWord]] would produce — the
    * positions where NO piece (not even the single character) matches.
    * On the corpus a vocab was built from this is always 0 (the builder
    * embeds the full alphabet); applied to a DIFFERENT corpus it is the
    * character-level out-of-vocabulary count, the coverage-audit
    * quantity.
    */
  def unkCountWord(w: String): Int = {
    var p = 0
    var unk = 0
    while (p < w.length) {
      var n = root
      var i = p
      var bestEnd = -1
      while (i < w.length && { n = n.child(w.charAt(i)); n != null }) {
        i += 1
        if (n.id >= 0) bestEnd = i
      }
      if (bestEnd >= 0) p = bestEnd else { unk += 1; p += 1 }
    }
    unk
  }

  /** [[countWord]] and [[unkCountWord]] in ONE fused walk: total
    * emissions ride the high int, UNK emissions the low int. The
    * coverage audit needs both per row; fusing halves the trie passes.
    */
  def countUnkWord(w: String): Long = {
    var p = 0
    var cnt = 0
    var unk = 0
    while (p < w.length) {
      var n = root
      var i = p
      var bestEnd = -1
      while (i < w.length && { n = n.child(w.charAt(i)); n != null }) {
        i += 1
        if (n.id >= 0) bestEnd = i
      }
      cnt += 1
      if (bestEnd >= 0) p = bestEnd else { unk += 1; p += 1 }
    }
    (cnt.toLong << 32) | (unk.toLong & 0xffffffffL)
  }
}

/** bpe_encode(text, pieces): array<int> — greedy longest-match subword
  * encoding of the whitespace tokens, in token order, against a piece
  * vocabulary (frequent words + character fallback — see
  * `Corpus.buildPieceVocab`). The piece list rides the expression (a
  * vocabulary is model metadata, like the IVF codebooks); the trie is a
  * transient per-executor rebuild, and the match loop is one primitive
  * forward walk per character — codegen'd via a reference object, no
  * boxing on the text side.
  */
case class BpeEncodeExpr(child: Expression, pieces: Seq[(String, Int)])
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  @transient private lazy val trie = new BpeTrie(pieces)
  def encode(t: UTF8String): ArrayData = {
    val words = TextKernels.tokenize(t)
    val out = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < words.length) { trie.encodeWord(words(i), out); i += 1 }
    val arr = new Array[Any](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j).intValue(); j += 1 }
    new GenericArrayData(arr)
  }
  override protected def nullSafeEval(t: Any): Any =
    encode(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeExpr", this,
      classOf[BpeEncodeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }
  override protected def withNewChildInternal(c: Expression): BpeEncodeExpr =
    copy(child = c)
}

/** bpe_count(text, pieces): int — `size(bpe_encode(text, pieces))`
  * without materializing the id array: the same greedy MaxMatch walk,
  * counting emissions. This is the form the packing/budget operators
  * actually consume (they need token COUNTS, never ids);
  * [[graft.BpeCountRewrite]] rewrites `Size(BpeEncodeExpr(…))` into this
  * node so even the naive spelling skips the allocation.
  */
case class BpeCountExpr(child: Expression, pieces: Seq[(String, Int)])
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  @transient private lazy val trie = new BpeTrie(pieces)
  def count(t: UTF8String): Int = {
    val words = TextKernels.tokenize(t)
    var i = 0
    var n = 0
    while (i < words.length) { n += trie.countWord(words(i)); i += 1 }
    n
  }
  override protected def nullSafeEval(t: Any): Any =
    count(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCnt", this,
      classOf[BpeCountExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }
  override protected def withNewChildInternal(c: Expression): BpeCountExpr =
    copy(child = c)
}

/** bpe_unk_count(text, pieces): int — the UNK emissions of the same
  * greedy MaxMatch walk as [[BpeCountExpr]]: positions where no piece
  * (not even the single character) matches advance one character and
  * count here instead. Zero by construction on the vocabulary's own
  * build corpus (the builder embeds its full alphabet); on held-out or
  * cross-lingual text it is the character-level OOV count — the
  * vocabulary-coverage audit a tokenizer ships with.
  */
case class BpeUnkCountExpr(child: Expression, pieces: Seq[(String, Int)])
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  @transient private lazy val trie = new BpeTrie(pieces)
  def unkCount(t: UTF8String): Int = {
    val words = TextKernels.tokenize(t)
    var i = 0
    var n = 0
    while (i < words.length) { n += trie.unkCountWord(words(i)); i += 1 }
    n
  }
  override protected def nullSafeEval(t: Any): Any =
    unkCount(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeUnk", this,
      classOf[BpeUnkCountExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.unkCount($c)")
  }
  override protected def withNewChildInternal(c: Expression): BpeUnkCountExpr =
    copy(child = c)
}

/** bpe_count_unk(text, pieces): struct<n_pieces:int, n_unk:int> — the
  * [[BpeCountExpr]] and [[BpeUnkCountExpr]] quantities from ONE fused
  * MaxMatch walk (each emission is classified as it is counted), for
  * consumers that need both per row: the coverage audit reads total
  * and UNK emissions together, and fusing halves the tokenize + trie
  * passes and the per-executor trie instances.
  */
case class BpeCountUnkExpr(child: Expression, pieces: Seq[(String, Int)])
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_pieces",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_unk",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
  @transient private lazy val trie = new BpeTrie(pieces)
  def countUnk(t: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val words = TextKernels.tokenize(t)
    var i = 0
    var c = 0
    var u = 0
    while (i < words.length) {
      val cu = trie.countUnkWord(words(i))
      c += (cu >>> 32).toInt
      u += cu.toInt
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](c, u))
  }
  override protected def nullSafeEval(t: Any): Any =
    countUnk(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCu", this,
      classOf[BpeCountUnkExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countUnk($c)")
  }
  override protected def withNewChildInternal(c: Expression): BpeCountUnkExpr =
    copy(child = c)
}

/** bpe_merge_count(text, merges): int — TRUE rank-ordered BPE
  * inference (Sennrich et al. ACL'16 `apply_bpe`): each whitespace
  * token starts as characters and the learned merge table applies IN
  * RANK ORDER, one greedy left-to-right non-overlapping pass per
  * merge; the result is the symbol count. This is apply-by-merge-order
  * — the same dynamics `Corpus.learnBpeMerges` trains — vs the
  * MaxMatch trie's longest-match inference ([[BpeEncodeExpr]]): the
  * two segmentations differ (e.g. merges [(b,c),(a,b)] segment "abc"
  * as [a,bc]; MaxMatch over the same pieces takes [ab,c]). Packing and
  * budget operators accept either count via their nTokensCol contract.
  *
  * A bounded per-expression word→count memo (ConcurrentHashMap — the
  * reference object may be shared across a stage's tasks) amortizes
  * the k passes: corpora repeat words heavily, so the common path is
  * one hash probe per token.
  */
case class BpeMergeCountExpr(child: Expression,
    merges: Seq[(String, String)]) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  def count(t: UTF8String): Int = {
    val words = TextKernels.tokenize(t)
    var i = 0
    var n = 0
    while (i < words.length) {
      val w = words(i)
      var c = memo.get(w)
      if (c == null) {
        c = Integer.valueOf(BpeMergeKernel.mergeWord(w, merges).length)
        if (memo.size < (1 << 17)) memo.put(w, c)
      }
      n += c.intValue()
      i += 1
    }
    n
  }
  override protected def nullSafeEval(t: Any): Any =
    count(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMrg", this,
      classOf[BpeMergeCountExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }
  override protected def withNewChildInternal(c: Expression): BpeMergeCountExpr =
    copy(child = c)
}

/** bpe_decode(ids, vocab): string — token ids back to text: each id
  * maps through the vocabulary's reverse (id→piece) table and the
  * pieces concatenate in stream order. Works over EITHER tokenizer
  * family's vocabulary (MaxMatch pieces or the merge tokenizer's
  * symbol vocab): both encode by segmenting whitespace tokens into
  * substrings, so decode∘encode reconstructs the corpus text exactly
  * minus its whitespace (word boundaries are not represented in the
  * id stream) — the pack-integrity audit rides that contract. An id
  * outside the vocabulary (UNK 0, version-skewed artifacts) or a null
  * element decodes to U+FFFD so corruption is visible, never silent.
  */
case class BpeDecodeExpr(child: Expression, vocab: Seq[(String, Int)])
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  @transient private lazy val idToPiece = {
    val m = new java.util.HashMap[Integer, String](vocab.size * 2)
    vocab.foreach { case (p, id) =>
      val prev = m.get(id)
      // an id carrying two strings is a malformed artifact; keep the
      // lexicographically smallest for determinism
      if (prev == null || p.compareTo(prev) < 0)
        m.put(Integer.valueOf(id), p)
    }
    m
  }
  def decode(ids: ArrayData): UTF8String = {
    val n = ids.numElements()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      val p = if (ids.isNullAt(i)) null else idToPiece.get(ids.getInt(i))
      sb.append(if (p == null) "\uFFFD" else p)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
  override protected def nullSafeEval(ids: Any): Any =
    decode(ids.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDec", this,
      classOf[BpeDecodeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.decode($c)")
  }
  override protected def withNewChildInternal(c: Expression): BpeDecodeExpr =
    copy(child = c)
}

/** The rank-ordered merge walk shared by [[BpeMergeCountExpr]] (symbol
  * counts) and [[BpeMergeEncodeExpr]] (symbol ids): one word in, its
  * final symbol sequence out.
  */
object BpeMergeKernel {
  /** Final symbol sequence of one word under the learned merge table
    * applied IN RANK ORDER, one greedy left-to-right non-overlapping
    * pass per merge (Sennrich ACL'16 `apply_bpe` — see the
    * [[BpeMergeCountExpr]] Scaladoc for the vs-MaxMatch contrast).
    */
  def mergeWord(w: String, merges: Seq[(String, String)]): Array[String] = {
    // split by CODE POINT, not UTF-16 unit — learnBpeMerges'
    // split(word, "") and the DuckDB twin's '(.)' regex are both
    // code-point based, so a surrogate pair must be ONE base symbol
    // here too or supplementary-plane merges could never match
    var syms = new Array[String](w.codePointCount(0, w.length))
    var i = 0
    var k = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val cc = Character.charCount(cp)
      syms(k) = w.substring(i, i + cc)
      i += cc
      k += 1
    }
    var n = syms.length
    if (n <= 1) return syms
    val it = merges.iterator
    while (it.hasNext && n > 1) {
      val (l, r) = it.next()
      val out = new Array[String](n)
      var src = 0
      var dst = 0
      while (src < n) {
        if (src + 1 < n && syms(src) == l && syms(src + 1) == r) {
          out(dst) = l + r; src += 2
        } else { out(dst) = syms(src); src += 1 }
        dst += 1
      }
      syms = out; n = dst
    }
    if (n == syms.length) syms else java.util.Arrays.copyOf(syms, n)
  }
}

/** bpe_merge_encode(text, merges, vocab): array<int> — the id-emitting
  * sibling of [[BpeMergeCountExpr]]: the SAME rank-ordered Sennrich
  * apply walk ([[BpeMergeKernel.mergeWord]]), then each final symbol
  * maps through the merge tokenizer's vocabulary (corpus alphabet +
  * merged symbols — `Corpus.collectMergeVocab`) to its id; a symbol
  * outside the vocabulary (an unseen character at apply time) emits
  * UNK (id 0), the same convention as the MaxMatch trie. This is the
  * kernel the trainer-facing id-pack export runs on when the LEARNED
  * tokenizer ships, so `size(result)` always equals
  * [[BpeMergeCountExpr]]'s count over the same merge table.
  *
  * Both the merge table and the vocabulary ride the expression as
  * model metadata; a bounded word→ids memo (shared across a stage's
  * tasks, like the count kernel's) makes the common path one hash
  * probe per token.
  */
case class BpeMergeEncodeExpr(child: Expression,
    merges: Seq[(String, String)],
    vocab: Seq[(String, Int)]) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  @transient private lazy val vmap = {
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    vocab.foreach { case (s, id) =>
      val prev = m.get(s)
      // string collisions keep the smallest id — the min(id) rule the
      // piece trie and the SQL twins share
      if (prev == null || id < prev.intValue()) m.put(s, Integer.valueOf(id))
    }
    m
  }
  // ids arrays are heavier than the count kernel's boxed ints, so the
  // memo bound is one power of two tighter
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
  private def encodeWord(w: String): Array[Int] = {
    val syms = BpeMergeKernel.mergeWord(w, merges)
    val out = new Array[Int](syms.length)
    var i = 0
    while (i < syms.length) {
      val id = vmap.get(syms(i))
      out(i) = if (id == null) 0 else id.intValue() // UNK = 0
      i += 1
    }
    out
  }
  def encode(t: UTF8String): ArrayData = {
    val words = TextKernels.tokenize(t)
    val perWord = new Array[Array[Int]](words.length)
    var total = 0
    var i = 0
    while (i < words.length) {
      val w = words(i)
      var ids = memo.get(w)
      if (ids == null) {
        ids = encodeWord(w)
        if (memo.size < (1 << 16)) memo.put(w, ids)
      }
      perWord(i) = ids
      total += ids.length
      i += 1
    }
    val flat = new Array[Any](total)
    var k = 0
    i = 0
    while (i < words.length) {
      val a = perWord(i)
      var j = 0
      while (j < a.length) { flat(k) = a(j); k += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(flat)
  }
  override protected def nullSafeEval(t: Any): Any =
    encode(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMrgEnc", this,
      classOf[BpeMergeEncodeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }
  override protected def withNewChildInternal(c: Expression): BpeMergeEncodeExpr =
    copy(child = c)
}

/** The byte-level (GPT-2-style) tokenizer's shared pieces: a
  * whitespace-PRESERVING pretokenizer and the byte↔Latin-1-char
  * bijection that lets byte sequences ride the string-based merge
  * machinery ([[BpeMergeKernel.mergeWord]]) unchanged. Pretokens
  * (`\S+\s*|^\s+` — word plus trailing whitespace, one leading-
  * whitespace pretoken) concatenate back to the EXACT input, so
  * decode∘encode reconstructs original text including whitespace —
  * the contract the char-level family can't give (its id stream drops
  * word boundaries).
  */
object ByteBpeKernel {
  /** The default whitespace-preserving pretokenizer: a word plus its
    * trailing whitespace run, with one leading-whitespace pretoken. */
  val whitespacePattern: String = "\\S+\\s*|^\\s+"
  /** GPT-2's published pretokenization pattern (Radford et al. 2019 —
    * the `gpt2` encoder regex, reproduced verbatim in tiktoken/HF):
    * contractions split off ('s 't 're 've 'm 'll 'd), a word carries
    * AT MOST ONE leading literal space, digit runs and punctuation
    * runs split from letter runs, and a multi-char whitespace run
    * before a word sheds all but its last space into its own pretoken
    * (the `\s+(?!\S)` lookahead). Same complete-tiling property as the
    * default pattern — every char falls into exactly one alternative,
    * so matches concatenate back to the EXACT input and the byte
    * family's decode∘encode identity survives the mode switch. Java
    * regex semantics: \p{L}/\p{N} are the Unicode categories, \s the
    * Java class — the q168 oracle pins this reading against an
    * independent RE2 (lookahead-free) derivation in DuckDB.
    */
  val gpt2Pattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+" +
      "|\\s+(?!\\S)|\\s+"
  // the two shipped patterns precompiled; a caller-supplied pattern
  // compiles once per JVM through the same memo (patterns are model
  // metadata — the map can't grow past the handful of modes in use)
  private val compiled =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.regex.Pattern]()
  private def re(pattern: String): java.util.regex.Pattern = {
    val got = compiled.get(pattern)
    if (got != null) got
    else {
      val p = java.util.regex.Pattern.compile(pattern)
      compiled.putIfAbsent(pattern, p)
      p
    }
  }
  def pretokenize(s: String): Array[String] =
    pretokenize(s, whitespacePattern)
  def pretokenize(s: String, pattern: String): Array[String] = {
    val m = re(pattern).matcher(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toArray
  }
  /** UTF-8 bytes of `s` as a Latin-1 string (byte b ↔ char U+00bb) —
    * the in-kernel twin of `decode(encode(s, 'UTF-8'), 'ISO-8859-1')`,
    * which is what [[graft.operators.Corpus.learnByteBpeMerges]] runs
    * in-plan, so learn-time and apply-time symbols can never drift.
    */
  def toByteSyms(s: String): String =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)
  /** Latin-1 symbol string back to real text (the inverse mapping,
    * then UTF-8 decode). Malformed byte runs (only reachable through a
    * corrupted id stream) surface as U+FFFD via the charset decoder's
    * standard replacement, never silently.
    */
  def fromByteSyms(syms: String): Array[Byte] =
    syms.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
}

/** byte_bpe_encode(text, merges, vocab): array<int> — the byte-level
  * sibling of [[BpeMergeEncodeExpr]]: whitespace-preserving pretokens
  * → UTF-8 bytes as Latin-1 symbols → the SAME rank-ordered Sennrich
  * merge walk → ids through the byte vocabulary
  * (`Corpus.byteMergeVocab`: bytes 1..256, merges at 256+rank). The
  * base alphabet covers every byte, so NO input can emit UNK — the
  * GPT-2 property. Merges and vocab ride as model metadata; the memo
  * amortizes repeated pretokens exactly as the word-level kernels do.
  */
case class ByteBpeEncodeExpr(child: Expression,
    merges: Seq[(String, String)],
    vocab: Seq[(String, Int)],
    pretokPattern: String = ByteBpeKernel.whitespacePattern)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  @transient private lazy val vmap = {
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    vocab.foreach { case (s, id) =>
      val prev = m.get(s)
      if (prev == null || id < prev.intValue()) m.put(s, Integer.valueOf(id))
    }
    m
  }
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
  private def encodePretok(p: String): Array[Int] = {
    val syms = BpeMergeKernel.mergeWord(ByteBpeKernel.toByteSyms(p), merges)
    val out = new Array[Int](syms.length)
    var i = 0
    while (i < syms.length) {
      val id = vmap.get(syms(i))
      out(i) = if (id == null) 0 else id.intValue() // unreachable w/ full vocab
      i += 1
    }
    out
  }
  def encode(t: UTF8String): ArrayData = {
    val pretoks = ByteBpeKernel.pretokenize(t.toString, pretokPattern)
    val perTok = new Array[Array[Int]](pretoks.length)
    var total = 0
    var i = 0
    while (i < pretoks.length) {
      val p = pretoks(i)
      var ids = memo.get(p)
      if (ids == null) {
        ids = encodePretok(p)
        if (memo.size < (1 << 16)) memo.put(p, ids)
      }
      perTok(i) = ids
      total += ids.length
      i += 1
    }
    val flat = new Array[Any](total)
    var k = 0
    i = 0
    while (i < pretoks.length) {
      val a = perTok(i)
      var j = 0
      while (j < a.length) { flat(k) = a(j); k += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(flat)
  }
  override protected def nullSafeEval(t: Any): Any =
    encode(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeEnc", this,
      classOf[ByteBpeEncodeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }
  // the default rendering would print the 256-byte alphabet's control
  // chars (NUL included) into .explain/PLANS.md — summarize instead
  // (the pretok label only appears for the non-default mode, so the
  // pinned default-mode plan strings are byte-stable)
  override def toString: String =
    s"byte_bpe_encode($child, merges=${merges.length}, " +
      s"vocab=${vocab.length}" + (pretokPattern match {
        case ByteBpeKernel.whitespacePattern => ""
        case ByteBpeKernel.gpt2Pattern => ", pretok=gpt2"
        case _ => ", pretok=custom"
      }) + ")"
  override protected def withNewChildInternal(c: Expression): ByteBpeEncodeExpr =
    copy(child = c)
}

/** byte_bpe_decode(ids, vocab): string — ids back through the byte
  * vocabulary to Latin-1 symbols, symbols to bytes, bytes UTF-8-decoded
  * to text. Over [[ByteBpeEncodeExpr]]'s ids this is EXACT inverse on
  * any input (whitespace included). An unknown/null id injects the
  * UTF-8 replacement-character byte sequence so corruption is visible.
  */
case class ByteBpeDecodeExpr(child: Expression, vocab: Seq[(String, Int)])
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  @transient private lazy val idToSym = {
    val m = new java.util.HashMap[Integer, String](vocab.size * 2)
    vocab.foreach { case (p, id) =>
      val prev = m.get(id)
      if (prev == null || p.compareTo(prev) < 0)
        m.put(Integer.valueOf(id), p)
    }
    m
  }
  def decode(ids: ArrayData): UTF8String = {
    val n = ids.numElements()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      val s = if (ids.isNullAt(i)) null else idToSym.get(ids.getInt(i))
      // U+FFFD's UTF-8 bytes (EF BF BD) as Latin-1 chars — survives
      // fromByteSyms and decodes to one replacement character
      sb.append(if (s == null) "\u00ef\u00bf\u00bd" else s)
      i += 1
    }
    // decode through the charset decoder (not fromBytes, which wraps
    // unvalidated): a malformed run in a corrupted-but-in-vocab id
    // stream becomes U+FFFD here instead of invalid UTF-8 flowing
    // silently into downstream string kernels
    UTF8String.fromString(new String(
      ByteBpeKernel.fromByteSyms(sb.toString),
      java.nio.charset.StandardCharsets.UTF_8))
  }
  override protected def nullSafeEval(ids: Any): Any =
    decode(ids.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeDec", this,
      classOf[ByteBpeDecodeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.decode($c)")
  }
  // see ByteBpeEncodeExpr: keep the byte alphabet's control chars out
  // of plan renderings
  override def toString: String =
    s"byte_bpe_decode($child, vocab=${vocab.length})"
  override protected def withNewChildInternal(c: Expression): ByteBpeDecodeExpr =
    copy(child = c)
}

/** The unigram family's shared constants: piece costs live on a
  * `costScale` grid (`Corpus.collectUnigramPieces` maps counts into
  * [1, costScale + 1]), and the UNK edge — reachable only for
  * characters outside the table's alphabet — costs more than any
  * piece, so coverage is never traded away for a cheap UNK.
  */
object UnigramDefaults {
  val costScale: Long = 1L << 20
  val unkCost: Long = (costScale + 2) * 2
}

/** The Viterbi piece table shared by [[UnigramEncodeExpr]] and
  * [[UnigramCountExpr]] — the unigram-LM tokenizer family (Kudo,
  * "Subword Regularization", ACL'18; SentencePiece's `--model_type=
  * unigram`). Where BPE/MaxMatch segment greedily, unigram inference
  * picks the GLOBALLY cheapest segmentation of each whitespace token
  * under additive per-piece costs (the −log p(piece) of the unigram
  * LM; this engine carries them as exact integers so the DuckDB twin
  * can re-derive every choice bit for bit — see
  * `Corpus.collectUnigramPieces` for the cost layout).
  *
  * Determinism contract (the cross-engine pin): among equal-cost
  * segmentations the kernel takes the one whose piece sequence is
  * smallest under UTF-8 BINARY comparison of the pieces joined by
  * 0x01 — exactly `ORDER BY cost, path` in a binary-collation SQL
  * engine. The exchange argument makes that DP-decomposable: two
  * partial paths to the same character position span the same
  * characters, so neither is a strict sequence-prefix of the other
  * and the lexicographic order of extended paths follows the order
  * of the prefixes.
  *
  * A character no piece covers emits UNK (id 0) at `unkCost` and
  * advances one — the edge EXISTS only when the single character is
  * absent from the table, so on a vocabulary whose alphabet covers
  * the corpus (the builder guarantees it) UNK is unreachable, the
  * same coverage contract as the MaxMatch builder.
  */
final class UnigramTable(pieces: Seq[(String, Int, Long)],
    val unkCost: Long) extends Serializable {
  require(pieces.nonEmpty, "unigram table needs at least one piece")
  pieces.foreach { case (p, _, c) =>
    require(p.nonEmpty, "unigram table: empty piece")
    require(p.indexOf('\u0001') < 0,
      "unigram table: piece contains the 0x01 path separator")
    require(c >= 0, s"unigram table: negative cost for piece '$p'")
  }
  /** piece → (id, cost, utf8 bytes); a duplicated piece string keeps
    * the smaller id (the min(id) rule the whole vocab family shares),
    * and with it that row's cost. */
  private val table: java.util.HashMap[String, (Int, Long, Array[Byte])] = {
    val m = new java.util.HashMap[String, (Int, Long, Array[Byte])](
      pieces.size * 2)
    pieces.foreach { case (p, id, c) =>
      val prev = m.get(p)
      if (prev == null || id < prev._1)
        m.put(p, (id, c, p.getBytes("UTF-8")))
    }
    m
  }
  val maxPieceLen: Int = pieces.iterator.map(_._1.length).max

  /** Viterbi-encode one word into `out`; returns the segmentation's
    * total cost. O(len × maxPieceLen) table probes, O(len²) path
    * bytes for the tie-break — guarded so a pathological unbroken
    * "word" fails loudly instead of going quadratic.
    */
  def encodeWord(w: String, out: java.util.ArrayList[Integer]): Long = {
    val n = w.length
    if (n == 0) return 0L
    require(n <= 8192, "unigram encode: token longer than 8192 chars " +
      "— pre-chunk unbroken runs before tokenizing")
    val cost = new Array[Long](n + 1)
    val path = new Array[Array[Byte]](n + 1) // null = unreached
    val bp = new Array[Int](n + 1) // backpointer: start of last piece
    val pid = new Array[Int](n + 1) // id of last piece
    path(0) = Array.emptyByteArray
    var i = 1
    while (i <= n) {
      var bestCost = 0L
      var bestPath: Array[Byte] = null
      var bestBp = -1
      var bestId = -1
      val lMax = math.min(maxPieceLen, i)
      var l = 1
      while (l <= lMax) {
        val j = i - l
        if (path(j) != null) {
          val e = table.get(w.substring(j, i))
          if (e != null) {
            val c = cost(j) + e._2
            if (bestPath == null || c < bestCost || (c == bestCost && {
              val cand = joinPath(path(j), e._3)
              if (java.util.Arrays.compareUnsigned(cand, bestPath) < 0) {
                bestPath = cand; true
              } else false
            })) {
              if (bestPath == null || c < bestCost)
                bestPath = joinPath(path(j), e._3)
              bestCost = c; bestBp = j; bestId = e._1
            }
          }
        }
        l += 1
      }
      if (bestBp < 0) {
        // UNK fallback advances by CODEPOINT, not code unit: the DP
        // indexes UTF-16, so an out-of-alphabet supplementary-plane
        // character spans TWO positions — it must emit ONE id-0 with
        // its real UTF-8 bytes (the vocab builder and the oracle twin
        // both count codepoints), never two UNKs with lone-surrogate
        // halves mangled to '?'. A position ending mid-pair stays
        // unreachable; the pair branch at i+1 spans it. Lone
        // surrogates (malformed UTF-16) keep the single-unit path.
        val ch = w.charAt(i - 1)
        val endsPair = Character.isLowSurrogate(ch) && i >= 2 &&
          Character.isHighSurrogate(w.charAt(i - 2))
        val splitsPair = Character.isHighSurrogate(ch) && i < n &&
          Character.isLowSurrogate(w.charAt(i))
        if (endsPair && path(i - 2) != null &&
            !table.containsKey(w.substring(i - 2, i))) {
          bestCost = cost(i - 2) + unkCost
          bestPath = joinPath(path(i - 2),
            w.substring(i - 2, i).getBytes("UTF-8"))
          bestBp = i - 2
          bestId = 0
        } else if (!endsPair && !splitsPair && path(i - 1) != null &&
            !table.containsKey(w.substring(i - 1, i))) {
          // UNK: the character is outside the alphabet — one char, id 0
          bestCost = cost(i - 1) + unkCost
          bestPath = joinPath(path(i - 1),
            w.substring(i - 1, i).getBytes("UTF-8"))
          bestBp = i - 1
          bestId = 0
        }
      }
      if (bestBp >= 0) {
        cost(i) = bestCost; path(i) = bestPath; bp(i) = bestBp
        pid(i) = bestId
      }
      i += 1
    }
    require(path(n) != null,
      s"unigram encode: no segmentation reaches the end of '$w' — " +
        "the table's alphabet does not cover it and a longer piece " +
        "spans the uncovered character's only route")
    // walk backpointers, emit in order
    val stack = new java.util.ArrayList[Integer]()
    var p = n
    while (p > 0) { stack.add(pid(p)); p = bp(p) }
    var k = stack.size - 1
    while (k >= 0) { out.add(stack.get(k)); k -= 1 }
    cost(n)
  }

  private def joinPath(prefix: Array[Byte], piece: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](prefix.length + 1 + piece.length)
    System.arraycopy(prefix, 0, out, 0, prefix.length)
    out(prefix.length) = 0x01
    System.arraycopy(piece, 0, out, prefix.length + 1, piece.length)
    out
  }
}

/** unigram_encode(text, pieces): array<int> — minimum-cost (Viterbi)
  * subword ids of the whitespace tokens in token order, under a
  * `Corpus.buildUnigramVocab` piece table ([[UnigramTable]] carries
  * the semantics). The piece table rides the expression as model
  * metadata, the DP is one primitive pass per word — codegen'd via a
  * reference object like the rest of the tokenizer kernels.
  */
case class UnigramEncodeExpr(child: Expression,
    pieces: Seq[(String, Int, Long)], unkCost: Long)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  @transient private lazy val table = new UnigramTable(pieces, unkCost)
  def encode(t: UTF8String): ArrayData = {
    val words = TextKernels.tokenize(t)
    val out = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < words.length) { table.encodeWord(words(i), out); i += 1 }
    val arr = new Array[Any](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j).intValue(); j += 1 }
    new GenericArrayData(arr)
  }
  override protected def nullSafeEval(t: Any): Any =
    encode(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("uniEnc", this,
      classOf[UnigramEncodeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }
  override def toString: String =
    s"unigram_encode($child, pieces=${pieces.length})"
  override protected def withNewChildInternal(c: Expression): UnigramEncodeExpr =
    copy(child = c)
}

/** unigram_cost(text, pieces): struct<n_pieces:int, cost:bigint> — the
  * Viterbi walk's OTHER output: the minimum total segmentation cost,
  * fused with the piece count. Under unigram-LM costs this is the
  * document's surprise (Σ −log p(piece) on the integer grid), the
  * CCNet-style LM quality signal — rank by cost/n_pieces and the
  * familiar-text docs float up, with no float anywhere (the mean stays
  * a cross-multiplied comparison downstream). Same tie-broken DP as
  * [[UnigramEncodeExpr]], so the cost is THE cost of exactly the id
  * stream encode would emit.
  */
case class UnigramCostExpr(child: Expression,
    pieces: Seq[(String, Int, Long)], unkCost: Long)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_pieces",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("cost", LongType,
        nullable = false)))
  @transient private lazy val table = new UnigramTable(pieces, unkCost)
  def cost(t: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val words = TextKernels.tokenize(t)
    val out = new java.util.ArrayList[Integer]()
    var total = 0L
    var i = 0
    while (i < words.length) {
      total += table.encodeWord(words(i), out)
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(out.size, total)
  }
  override protected def nullSafeEval(t: Any): Any =
    cost(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("uniCost", this,
      classOf[UnigramCostExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.cost($c)")
  }
  override def toString: String =
    s"unigram_cost($child, pieces=${pieces.length})"
  override protected def withNewChildInternal(c: Expression): UnigramCostExpr =
    copy(child = c)
}

/** unigram_count(text, pieces): int — `size(unigram_encode(…))`
  * without materializing the id array. The count follows the SAME
  * tie-broken Viterbi (different min-cost segmentations can have
  * different lengths, so there is no cheaper walk that stays
  * consistent with [[UnigramEncodeExpr]]).
  */
case class UnigramCountExpr(child: Expression,
    pieces: Seq[(String, Int, Long)], unkCost: Long)
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  @transient private lazy val table = new UnigramTable(pieces, unkCost)
  def count(t: UTF8String): Int = {
    val words = TextKernels.tokenize(t)
    val out = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < words.length) { table.encodeWord(words(i), out); i += 1 }
    out.size
  }
  override protected def nullSafeEval(t: Any): Any =
    count(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("uniCnt", this,
      classOf[UnigramCountExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }
  override def toString: String =
    s"unigram_count($child, pieces=${pieces.length})"
  override protected def withNewChildInternal(c: Expression): UnigramCountExpr =
    copy(child = c)
}

/** The LATTICE (soft-EM) side of the unigram family: exact-integer
  * forward-backward marginals over a word's segmentation lattice —
  * SentencePiece's published E-step (Kudo ACL'18 §3.2 uses expected
  * piece counts over ALL segmentations, not just the Viterbi path;
  * [[UnigramTable.encodeWord]] is the hard variant).
  *
  * Probability model: piece p has probability n(p)/Z where n(p) is the
  * caller-supplied integer numerator (a usage count, or `scale+1-cost`
  * to read probabilities back off the costScale grid) and
  * Z = Σ n(p) over the WHOLE table. A path's probability is the
  * product of its pieces'. Exactness trick: since a path through an
  * L-char word has Σ len(piece) = L, homogenize by Z^L — define the
  * integer weight W(p) = n(p) · Z^(len(p)−1); then
  * α̃[i] = Z^i · α[i] satisfies the SAME recurrence in plain integer
  * arithmetic (BigInt here, HUGEINT in the DuckDB twin), and every
  * marginal is the exact rational (α̃[i]·W(p)·β̃[i+ℓ]) / α̃[L].
  *
  * The per-word output is quantized ONCE onto the `expScale` grid —
  * e(id) = ⌊expScale · Σ_occ α̃Wβ̃ / α̃[L]⌋, numerators summed per id
  * BEFORE the one floor division — so cross-word aggregation is plain
  * integer addition, associative and engine-portable (floats would
  * sum in partition order and hash-desync any twin).
  *
  * UNK: a character covered by no single-char piece crosses on an
  * ε-weight edge (W = 1, id 0) — the same "reachable only outside the
  * alphabet" contract as the Viterbi kernel, so on a coverage-complete
  * table the lattices agree on reachability. A word whose every
  * tiling has weight zero (all its pieces carry n = 0) throws: the
  * model assigns it probability 0, and silently emitting zeros would
  * let the M-step drop its coverage.
  */
final class UnigramLattice(pieces: Seq[(String, Int, Long)])
    extends Serializable {
  require(pieces.nonEmpty, "unigram lattice needs at least one piece")
  pieces.foreach { case (p, _, n) =>
    require(p.nonEmpty, "unigram lattice: empty piece")
    require(n >= 0, s"unigram lattice: negative numerator for '$p'")
  }
  /** piece → (id, numerator); a duplicated piece string keeps the
    * smaller id (the family-wide min(id) rule), and with it that
    * row's numerator. */
  private val table: java.util.HashMap[String, (Int, Long)] = {
    val m = new java.util.HashMap[String, (Int, Long)](pieces.size * 2)
    pieces.foreach { case (p, id, n) =>
      val prev = m.get(p)
      if (prev == null || id < prev._1) m.put(p, (id, n))
    }
    m
  }
  val maxPieceLen: Int = pieces.iterator.map(_._1.length).max
  private val z: BigInt =
    pieces.iterator.map(x => BigInt(x._3)).sum
  /** Z^0 .. Z^(maxPieceLen-1), the homogenization factors. */
  private val zPow: Array[BigInt] = {
    val a = new Array[BigInt](maxPieceLen)
    a(0) = BigInt(1)
    var i = 1
    while (i < maxPieceLen) { a(i) = a(i - 1) * z; i += 1 }
    a
  }

  /** Accumulate one word's expected piece counts (id → e on the
    * `expScale` grid) into `acc`. O(len × maxPieceLen) table probes
    * and BigInt multiplies.
    */
  def accumulateWord(w: String, expScale: Long,
      acc: java.util.HashMap[Integer, Long]): Unit = {
    val n = w.length
    if (n == 0) return
    require(n <= 8192, "unigram lattice: token longer than 8192 chars " +
      "— pre-chunk unbroken runs before tokenizing")
    val alpha = new Array[BigInt](n + 1)
    val beta = new Array[BigInt](n + 1)
    java.util.Arrays.fill(alpha.asInstanceOf[Array[AnyRef]], BigInt(0))
    java.util.Arrays.fill(beta.asInstanceOf[Array[AnyRef]], BigInt(0))
    alpha(0) = BigInt(1); beta(n) = BigInt(1)
    // the UNK edge at position i exists iff no piece covers w[i,i+1)
    def unkAt(i: Int): Boolean = table.get(w.substring(i, i + 1)) == null
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax) {
        val e = table.get(w.substring(i - l, i))
        if (e != null && e._2 > 0L)
          alpha(i) += alpha(i - l) * BigInt(e._2) * zPow(l - 1)
        l += 1
      }
      if (unkAt(i - 1)) alpha(i) += alpha(i - 1)
      i += 1
    }
    require(alpha(n).signum > 0,
      s"unigram lattice: word '$w' has no positive-probability " +
        "segmentation — every tiling uses a zero-numerator piece")
    i = n - 1
    while (i >= 0) {
      var l = 1
      val lMax = math.min(maxPieceLen, n - i)
      while (l <= lMax) {
        val e = table.get(w.substring(i, i + l))
        if (e != null && e._2 > 0L)
          beta(i) += beta(i + l) * BigInt(e._2) * zPow(l - 1)
        l += 1
      }
      if (unkAt(i)) beta(i) += beta(i + 1)
      i -= 1
    }
    // numerators summed per id FIRST, one floor division per id after
    val num = new java.util.HashMap[Integer, BigInt]()
    def add(id: Int, v: BigInt): Unit = {
      val prev = num.get(id)
      num.put(id, if (prev == null) v else prev + v)
    }
    i = 0
    while (i < n) {
      var l = 1
      val lMax = math.min(maxPieceLen, n - i)
      while (l <= lMax) {
        val e = table.get(w.substring(i, i + l))
        if (e != null && e._2 > 0L)
          add(e._1, alpha(i) * BigInt(e._2) * zPow(l - 1) * beta(i + l))
        l += 1
      }
      if (unkAt(i)) add(0, alpha(i) * beta(i + 1))
      i += 1
    }
    val it = num.entrySet().iterator()
    while (it.hasNext) {
      val kv = it.next()
      val e = (BigInt(expScale) * kv.getValue / alpha(n)).toLong
      if (e > 0L) {
        val prev = acc.get(kv.getKey)
        acc.put(kv.getKey, if (prev == null) e else prev + e)
      }
    }
  }
}

/** unigram_soft_counts(text, pieces, expScale):
  * array<struct<id:int, e:bigint>> — per-row expected piece counts
  * under the [[UnigramLattice]] forward-backward marginals, summed
  * over the row's words, sorted by id. The soft E-step's map side:
  * `explode` + a sum weighted by word multiplicity is the whole
  * corpus-wide E-step, one dictionary-sized aggregate.
  */
case class UnigramSoftCountsExpr(child: Expression,
    pieces: Seq[(String, Int, Long)], expScale: Long)
    extends UnaryExpression {
  require(expScale >= 1, "unigram_soft_counts: expScale must be >= 1")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("e", LongType,
        nullable = false))), containsNull = false)
  @transient private lazy val lattice = new UnigramLattice(pieces)
  def softCounts(t: UTF8String): ArrayData = {
    val words = TextKernels.tokenize(t)
    val acc = new java.util.HashMap[Integer, Long]()
    var i = 0
    while (i < words.length) {
      lattice.accumulateWord(words(i), expScale, acc)
      i += 1
    }
    val ids = new java.util.ArrayList[Integer](acc.keySet())
    java.util.Collections.sort(ids)
    val arr = new Array[Any](ids.size)
    var j = 0
    while (j < arr.length) {
      val id = ids.get(j)
      arr(j) = org.apache.spark.sql.catalyst.InternalRow(
        id.intValue(), acc.get(id).longValue())
      j += 1
    }
    new GenericArrayData(arr)
  }
  override protected def nullSafeEval(t: Any): Any =
    softCounts(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("uniSoft", this,
      classOf[UnigramSoftCountsExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.softCounts($c)")
  }
  override def toString: String =
    s"unigram_soft_counts($child, pieces=${pieces.length})"
  override protected def withNewChildInternal(c: Expression)
      : UnigramSoftCountsExpr = copy(child = c)
}

object TextExpressions {
  def tokens(text: Column): Column =
    GraftColumnBridge.column(TokensExpr(GraftColumnBridge.expression(text)))
  def shingles(text: Column, n: Int): Column =
    GraftColumnBridge.column(ShinglesExpr(GraftColumnBridge.expression(text), n))
  def shingleHashes(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      ShingleHashesExpr(GraftColumnBridge.expression(text), n))
  def minhashSig(text: Column, k: Int, n: Int): Column =
    GraftColumnBridge.column(MinhashSigExpr(GraftColumnBridge.expression(text), k, n))
  def jaccardMeets(a: Column, b: Column, threshold: Double): Column =
    GraftColumnBridge.column(JaccardMeetsExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      threshold))
  def jaccardValue(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaccardValueExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def simhash(text: Column, bits: Int): Column =
    GraftColumnBridge.column(SimhashExpr(GraftColumnBridge.expression(text), bits))
  def hashEmbed(text: Column, dim: Int): Column =
    GraftColumnBridge.column(HashEmbedExpr(GraftColumnBridge.expression(text), dim))
  def repetitionStats(text: Column): Column =
    GraftColumnBridge.column(RepetitionStatsExpr(GraftColumnBridge.expression(text)))
  def nfcNormalize(text: Column): Column =
    GraftColumnBridge.column(NfcNormalizeExpr(GraftColumnBridge.expression(text)))
  def bpeEncode(text: Column, pieces: Seq[(String, Int)]): Column =
    GraftColumnBridge.column(
      BpeEncodeExpr(GraftColumnBridge.expression(text), pieces))
  def bpeCount(text: Column, pieces: Seq[(String, Int)]): Column =
    GraftColumnBridge.column(
      BpeCountExpr(GraftColumnBridge.expression(text), pieces))
  def bpeMergeCount(text: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(
      BpeMergeCountExpr(GraftColumnBridge.expression(text), merges))
  def bpeMergeEncode(text: Column, merges: Seq[(String, String)],
      vocab: Seq[(String, Int)]): Column =
    GraftColumnBridge.column(
      BpeMergeEncodeExpr(GraftColumnBridge.expression(text), merges, vocab))
  def bpeDecode(ids: Column, vocab: Seq[(String, Int)]): Column =
    GraftColumnBridge.column(
      BpeDecodeExpr(GraftColumnBridge.expression(ids), vocab))
  def bpeUnkCount(text: Column, pieces: Seq[(String, Int)]): Column =
    GraftColumnBridge.column(
      BpeUnkCountExpr(GraftColumnBridge.expression(text), pieces))
  def byteBpeEncode(text: Column, merges: Seq[(String, String)],
      vocab: Seq[(String, Int)],
      pretokPattern: String = ByteBpeKernel.whitespacePattern): Column =
    GraftColumnBridge.column(
      ByteBpeEncodeExpr(GraftColumnBridge.expression(text), merges, vocab,
        pretokPattern))
  def byteBpeDecode(ids: Column, vocab: Seq[(String, Int)]): Column =
    GraftColumnBridge.column(
      ByteBpeDecodeExpr(GraftColumnBridge.expression(ids), vocab))
  def bpeCountUnk(text: Column, pieces: Seq[(String, Int)]): Column =
    GraftColumnBridge.column(
      BpeCountUnkExpr(GraftColumnBridge.expression(text), pieces))
  def unigramEncode(text: Column, pieces: Seq[(String, Int, Long)],
      unkCost: Long): Column =
    GraftColumnBridge.column(
      UnigramEncodeExpr(GraftColumnBridge.expression(text), pieces, unkCost))
  def unigramCount(text: Column, pieces: Seq[(String, Int, Long)],
      unkCost: Long): Column =
    GraftColumnBridge.column(
      UnigramCountExpr(GraftColumnBridge.expression(text), pieces, unkCost))
  def unigramCost(text: Column, pieces: Seq[(String, Int, Long)],
      unkCost: Long): Column =
    GraftColumnBridge.column(
      UnigramCostExpr(GraftColumnBridge.expression(text), pieces, unkCost))
  def unigramSoftCounts(text: Column, pieces: Seq[(String, Int, Long)],
      expScale: Long): Column =
    GraftColumnBridge.column(
      UnigramSoftCountsExpr(GraftColumnBridge.expression(text), pieces,
        expScale))
}
