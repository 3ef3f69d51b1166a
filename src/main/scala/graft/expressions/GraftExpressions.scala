package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the LLM-operator hot paths.
  *
  * The declarative formulations (aggregate/transform/zip_with higher-order
  * functions) are semantically right but Catalyst INTERPRETS lambda
  * higher-order functions — they sit outside whole-stage codegen, and a
  * 64-bit simhash becomes 64 interpreted array traversals per row. These
  * expressions compute the same values in one compiled loop: `doGenCode`
  * emits a call to a static JVM kernel, so the projection stays inside the
  * generated code path (one virtual call per row, no closure dispatch).
  *
  * Value parity with the expression formulations is exact (same xxhash64
  * seed/semantics via XxHash64Function, same fold order for doubles), so
  * swapping implementations never changes results.
  */
object Kernels {

  private def xxh64(s: UTF8String): Long =
    XxHash64Function.hash(s, StringType, 42L)

  private def pmod(x: Long, p: Long): Long = { val m = x % p; if (m < 0) m + p else m }

  /** Unicode normalization (NFC/NFD/NFKC/NFKD via java.text.Normalizer) —
    * the canonicalization step before any byte-level dedup of multilingual
    * text (the same logical form can arrive precomposed or decomposed).
    */
  def unicodeNormalize(s: UTF8String, form: String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.valueOf(form)))

  /** SimHash64 over whitespace tokens of the trimmed text — parity with
    * `aggregate`-based bit sums over xxhash64(token).
    */
  def simhash64(text: UTF8String): Long = {
    val tokens = text.toString.trim.split("\\s+")
    val counts = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = xxh64(UTF8String.fromString(tokens(t)))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** MinHash signature: min over shingles of pmod(pmod(xxh64(s),p)*a+b, p)
    * per permutation — parity with the transform/array_min formulation.
    */
  def minhashSig(shingles: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val n = shingles.numElements()
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) { hashes(i) = pmod(xxh64(shingles.getUTF8String(i)), p); i += 1 }
    val sig = new Array[Long](a.length)
    var k = 0
    while (k < a.length) {
      var mn = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = pmod(hashes(j) * a(k) + b(k), p)
        if (v < mn) mn = v
        j += 1
      }
      sig(k) = if (n == 0) 0L else mn
      k += 1
    }
    new GenericArrayData(sig)
  }

  /** Distinct word n-gram shingles of the trimmed text: sliding n-token
    * windows joined by spaces; fewer than n tokens → the whole text as one
    * shingle. Parity with
    * array_distinct(TextFunctions.shingles(text, n)).
    */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val tokens = text.toString.trim.split("\\s+")
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (tokens.length < n) {
      out.add(UTF8String.fromString(tokens.mkString(" ")))
    } else {
      var i = 0
      val sb = new java.lang.StringBuilder
      while (i + n <= tokens.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(i + j))
          j += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** Per-document character n-gram counts in one compiled pass: sliding
    * code-point windows of the (already normalized) text, counted into
    * insertion-ordered (gram, count) pairs. Shorter-than-n text counts as
    * one whole-string gram — parity with the `when(length < n, array(tx))`
    * column formulation. Pre-aggregating per doc INSIDE the projection is
    * the 100 TB shape for corpus-frequency scoring: the exploded stream
    * (and everything shuffled after it) is sized by distinct grams per doc,
    * not by gram occurrences, and no occurrence-level strings are ever
    * allocated more than once.
    */
  def charNgramCounts(text: UTF8String, n: Int): ArrayData = {
    val out = new java.util.LinkedHashMap[UTF8String, java.lang.Long]()
    val len = text.numChars()
    if (len < n) out.put(text, 1L)
    else {
      var i = 0
      while (i + n <= len) {
        val g = text.substringSQL(i + 1, n)
        val prev = out.get(g)
        out.put(g, if (prev == null) java.lang.Long.valueOf(1L)
                   else java.lang.Long.valueOf(prev.longValue() + 1L))
        i += 1
      }
    }
    val rows = new Array[Any](out.size())
    val it = out.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      rows(k) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue)
      k += 1
    }
    new GenericArrayData(rows)
  }

  /** Per-document n-gram corpus-frequency stats in one compiled pass:
    * slides the same code-point windows as [[charNgramCounts]] and sums the
    * corpus count of each gram from a broadcast hash table (O(1) probes, no
    * per-gram string survives the loop). Returns [n_grams, freq_sum].
    * Grams absent from the table count 0 (cannot happen when the table was
    * built from the same corpus).
    */
  def charNgramFreqStats(text: UTF8String, n: Int,
                         table: java.util.HashMap[UTF8String, java.lang.Long]): ArrayData = {
    val len = text.numChars()
    var nGrams = 0L
    var freqSum = 0L
    if (len < n) {
      nGrams = 1L
      val c = table.get(text)
      if (c != null) freqSum = c.longValue()
    } else {
      var i = 0
      while (i + n <= len) {
        val c = table.get(text.substringSQL(i + 1, n))
        if (c != null) freqSum += c.longValue()
        nGrams += 1L
        i += 1
      }
    }
    new GenericArrayData(Array(nGrams, freqSum))
  }

  private def daysInMonth(y: Int, m: Int): Int = m match {
    case 4 | 6 | 9 | 11 => 30
    case 2              => if (y % 4 == 0 && (y % 100 != 0 || y % 400 == 0)) 29 else 28
    case _              => 31
  }

  /** Type-shape probe for TypeDetect's stats pass: one char-scan instead of
    * four java.util.regex matches per value. Bitmask parity with the
    * TypeDetect regexes:
    *    1 = int    ^-?[0-9]+$
    *    2 = float  ^-?[0-9]+\.[0-9]+$
    *    4 = date   ^\d{2,4}[-/ ]\d{1,2}[-/ ]\d{1,2}$
    *    8 = ts     ^\d{2,4}[-/ ]\d{1,2}[-/ ]\d{1,2}[ T]\d{1,2}:\d{2}(:\d{2})?(\.\d+)?$
    *   16 = date KNOWN-VALID: 4-digit year >= 1, '-'/'/' separators, real
    *        proleptic-Gregorian calendar day — guarantees the
    *        try_to_timestamp('yyyy-M-d') parse succeeds, so TypeDetect can
    *        skip it (the hot-path win for ISO data). Conservative: anything
    *        uncertain (2-3 digit years, space separators) leaves the bit
    *        unset and falls back to the real parse.
    *   32 = ts KNOWN-VALID: bit-16 date part, ' '/'T' time separator,
    *        h<=23, mm<=59, ss<=59, no fractional seconds.
    */
  def typeProbe(text: UTF8String): Int = {
    val s = text.toString
    val len = s.length
    var mask = 0
    // int / float
    var i = if (len > 0 && s.charAt(0) == '-') 1 else 0
    val digitsStart = i
    while (i < len && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
    if (i > digitsStart) {
      if (i == len) mask |= 1
      else if (s.charAt(i) == '.') {
        val fs = i + 1
        var j = fs
        while (j < len && s.charAt(j) >= '0' && s.charAt(j) <= '9') j += 1
        if (j > fs && j == len) mask |= 2
      }
    }
    // date / ts
    def digits(from: Int, lo: Int, hi: Int): Int = {
      var j = from
      while (j < len && j - from < hi && s.charAt(j) >= '0' && s.charAt(j) <= '9') j += 1
      if (j - from >= lo) j else -1
    }
    def sep(at: Int): Boolean =
      at < len && (s.charAt(at) == '-' || s.charAt(at) == '/' || s.charAt(at) == ' ')
    def num(from: Int, to: Int): Int = {
      var v = 0; var j = from
      while (j < to) { v = v * 10 + (s.charAt(j) - '0'); j += 1 }
      v
    }
    var p = digits(0, 2, 4)
    if (p > 0 && sep(p)) {
      val m = digits(p + 1, 1, 2)
      if (m > 0 && sep(m)) {
        val d = digits(m + 1, 1, 2)
        if (d > 0) {
          // bit-16 precondition: the normalized value ('/'->'-') must parse
          // under 'yyyy-M-d', so space separators and short years opt out.
          def dateValid: Boolean = {
            if (p != 4 || s.charAt(p) == ' ' || s.charAt(m) == ' ') false
            else {
              val y = num(0, 4); val mo = num(p + 1, m); val dy = num(m + 1, d)
              y >= 1 && mo >= 1 && mo <= 12 && dy >= 1 && dy <= daysInMonth(y, mo)
            }
          }
          if (d == len) {
            mask |= 4
            if (dateValid) mask |= 16
          } else if (s.charAt(d) == ' ' || s.charAt(d) == 'T') {
            val h = digits(d + 1, 1, 2)
            if (h > 0 && h < len && s.charAt(h) == ':') {
              val mi = digits(h + 1, 2, 2)
              if (mi > 0) {
                var q = mi
                var secEnd = -1
                if (q < len && s.charAt(q) == ':') {
                  val sec = digits(q + 1, 2, 2)
                  if (sec > 0) { secEnd = sec; q = sec }
                }
                var frac = false
                if (q < len && s.charAt(q) == '.') {
                  val fr = digits(q + 1, 1, Int.MaxValue)
                  if (fr > 0) { q = fr; frac = true }
                }
                if (q == len) {
                  mask |= 8
                  // the 'yyyy-M-d H:mm[:ss]' patterns carry no fraction
                  if (!frac && dateValid) {
                    val hv = num(d + 1, h); val miv = num(h + 1, mi)
                    val sv = if (secEnd > 0) num(mi + 1, secEnd) else 0
                    if (hv <= 23 && miv <= 59 && sv <= 59) mask |= 32
                  }
                }
              }
            }
          }
        }
      }
    }
    mask
  }

  /** One-pass repetition signals: (duplicateLineFraction,
    * duplicateLineCharFraction, topNgramCharFraction) as a 3-double array —
    * value parity with the TextFunctions HOF formulations (same line
    * filtering, same (count, gram)-max tie-break), but one compiled scan
    * with hash maps instead of O(distinct × lines) interpreted array folds
    * per row. `lineSep` lets callers synthesize lines (e.g. "\\. " → ".\n")
    * before the split, matching the HOF call sites.
    */
  def repetitionStats(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    // Catalyst's trim strips SPACES only (not \t/\n like java.lang.String
    // .trim) and split keeps trailing empty tokens — both replicated here,
    // or parity with the HOF formulations breaks on exotic whitespace.
    def spaceTrim(x: String): String = {
      var b = 0; var e = x.length
      while (b < e && x.charAt(b) == ' ') b += 1
      while (e > b && x.charAt(e - 1) == ' ') e -= 1
      x.substring(b, e)
    }
    // --- duplicate-line fractions over non-empty (trimmed) lines ---
    val lineCounts = new java.util.HashMap[String, Int]()
    var nLines = 0
    var totalChars = 0L
    s.split("\n", -1).foreach { l =>
      if (spaceTrim(l).nonEmpty) {
        nLines += 1
        totalChars += l.length
        lineCounts.merge(l, 1, (a, b) => a + b)
      }
    }
    var dupChars = 0L
    val it = lineCounts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > 1) dupChars += e.getValue.toLong * e.getKey.length
    }
    val dlf = if (nLines == 0) 0.0
      else 1.0 - lineCounts.size.toDouble / nLines
    val dcf = if (totalChars == 0) 0.0 else dupChars.toDouble / totalChars
    // --- top word-n-gram char fraction ---
    val toks = spaceTrim(s).split("\\s+", -1)
    var tgf = 0.0
    if (toks.length >= n && s.length > 0) {
      val gramCounts = new java.util.HashMap[String, Int]()
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        gramCounts.merge(sb.toString, 1, (a, b) => a + b)
        i += 1
      }
      // max by (count, gram) — identical to array_max over (c, g) structs;
      // gram ties compare as UTF8String (binary order), matching Catalyst's
      // string ordering rather than Java's UTF-16 code-unit order
      var bestC = -1
      var bestG: String = null
      val git = gramCounts.entrySet().iterator()
      while (git.hasNext) {
        val e = git.next()
        if (e.getValue > bestC || (e.getValue == bestC &&
            UTF8String.fromString(e.getKey).compareTo(UTF8String.fromString(bestG)) > 0)) {
          bestC = e.getValue; bestG = e.getKey
        }
      }
      if (bestC > 0) tgf = math.min(bestC.toDouble * bestG.length / s.length, 1.0)
    }
    new GenericArrayData(Array[Double](dlf, dcf, tgf))
  }

  /** Cosine similarity of two double arrays; 0.0 when either norm is 0 —
    * parity with the zip_with/aggregate fold (left-to-right sums).
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Indices of the `n` nearest centroids to `vec` by squared L2 distance,
    * nearest first, ties broken by lower index — parity with sorting
    * (distance, index) structs via array_sort. One compiled loop over
    * (dim × centroids) per row; the IVF assignment hot path.
    */
  def nearestCentroids(vec: ArrayData, cents: Array[Array[Double]], n: Int): ArrayData = {
    val k = cents.length
    val d = new Array[Double](k)
    var i = 0
    while (i < k) {
      val c = cents(i)
      var s = 0.0
      var j = 0
      val m = math.min(vec.numElements(), c.length)
      while (j < m) { val diff = vec.getDouble(j) - c(j); s += diff * diff; j += 1 }
      d(i) = s
      i += 1
    }
    val idx = Array.tabulate(k)(identity)
    val nn = math.min(n, k)
    // partial selection sort: nn smallest distances to the front
    var a = 0
    while (a < nn) {
      var best = a
      var b = a + 1
      while (b < k) {
        if (d(idx(b)) < d(idx(best)) ||
          (d(idx(b)) == d(idx(best)) && idx(b) < idx(best))) best = b
        b += 1
      }
      val t = idx(a); idx(a) = idx(best); idx(best) = t
      a += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(idx, nn))
  }

  /** Sign-LSH signature: bit i = [dot(vec, plane_i) >= 0], sig = Σ bit·2^i —
    * parity with the transform/aggregate formulation.
    */
  def hyperplaneSig(vec: ArrayData, planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      val plane = planes(i)
      var dot = 0.0
      var j = 0
      val n = math.min(vec.numElements(), plane.length)
      while (j < n) { dot += vec.getDouble(j) * plane(j); j += 1 }
      if (dot >= 0.0) sig += (1L << i)
      i += 1
    }
    sig
  }

  /** Subword count in ONE byte scan — value parity with
    * `size(split(trim(text), "\\s+|…lookaround transitions…"))` (the
    * five-branch regex in TextFunctions), asserted in ExpressionsSpec.
    * Replicates Spark's split(limit=-1) edge semantics on the space-trimmed
    * string: a leading regex-whitespace run contributes one empty segment
    * and so does a trailing one; empty input → 1. All non-ASCII bytes fall
    * in the "other" class and other→other never splits, so a byte walk and
    * a codepoint walk agree.
    */
  def subwordCount(s: UTF8String): Int = {
    val t = s.trim() // like Spark's trim(): 0x20 only
    val n = t.numBytes()
    if (n == 0) return 1
    // classes: 0 = regex \s (ASCII), 1 = letter, 2 = digit, 3 = other
    def cls(b: Byte): Int =
      if (b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r') 0
      else if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) 1
      else if (b >= '0' && b <= '9') 2
      else 3
    var count = 0
    if (cls(t.getByte(0)) == 0) count += 1     // leading empty segment
    if (cls(t.getByte(n - 1)) == 0) count += 1 // trailing empty segment
    var prev = 0
    var i = 0
    while (i < n) {
      val c = cls(t.getByte(i))
      if (c != 0 && (prev == 0 ||
        (prev == 1 && c == 2) || (prev == 2 && c == 1) ||
        ((prev == 1 || prev == 2) && c == 3) || (prev == 3 && (c == 1 || c == 2))))
        count += 1
      prev = c
      i += 1
    }
    count
  }

  /** Per-script codepoint counts (TextFunctions.ScriptRanges order: latin,
    * cyrillic, greek, cjk, arabic, hangul, devanagari) in ONE pass — value
    * parity with seven `length(regexp_replace(text, "[^range]", ""))`
    * scans, asserted in ExpressionsSpec. All ranges are BMP, so UTF-16
    * iteration counts exactly the codepoints the regexes keep (surrogate
    * halves of astral codepoints match no range on either side).
    */
  def scriptCounts(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = new Array[Long](7)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= 0x00C0 && c <= 0x024F)) out(0) += 1
      else if (c >= 0x0400 && c <= 0x04FF) out(1) += 1
      else if (c >= 0x0370 && c <= 0x03FF) out(2) += 1
      else if ((c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3040 && c <= 0x30FF)) out(3) += 1
      else if (c >= 0x0600 && c <= 0x06FF) out(4) += 1
      else if (c >= 0xAC00 && c <= 0xD7AF) out(5) += 1
      else if (c >= 0x0900 && c <= 0x097F) out(6) += 1
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  override protected def nullSafeEval(s: Any): Any =
    Kernels.simhash64(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression, numPerms: Int, seed: Long)
    extends UnaryExpression {
  // Canonical MinHash prime: 2^31-1. An earlier HOF formulation used 2^61-1,
  // which risked silent long overflow in h*a under ANSI-off eval; signatures
  // produced under that prime are NOT comparable to these — any persisted
  // signature caches (Memoize/parquet) from before the switch must be rebuilt.
  private val p = 2147483647L
  @transient private lazy val perms: (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val a = new Array[Long](numPerms); val b = new Array[Long](numPerms)
    var i = 0
    while (i < numPerms) {
      a(i) = math.abs(rnd.nextLong()) % (p - 1) + 1
      b(i) = math.abs(rnd.nextLong()) % p
      i += 1
    }
    (a, b)
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"
  override protected def nullSafeEval(arr: Any): Any =
    Kernels.minhashSig(arr.asInstanceOf[ArrayData], perms._1, perms._2, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", perms._1, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", perms._2, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Kernels.minhashSig($c, $aRef, $bRef, ${p}L);")
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  override protected def nullSafeEval(s: Any): Any =
    Kernels.shingles(s.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

case class TypeProbeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_type_probe"
  override protected def nullSafeEval(s: Any): Any =
    Kernels.typeProbe(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.typeProbe($c)")
  override protected def withNewChildInternal(newChild: Expression): TypeProbeExpr =
    copy(child = newChild)
}

/** Unicode normalization as a codegen'd expression (no UDF): `form` is one
  * of NFC/NFD/NFKC/NFKD, validated at construction.
  */
case class UnicodeNormExpr(child: Expression, form: String)
    extends UnaryExpression {
  java.text.Normalizer.Form.valueOf(form) // fail fast on a bad form name
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_normalize"
  override protected def nullSafeEval(s: Any): Any =
    Kernels.unicodeNormalize(s.asInstanceOf[UTF8String], form)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.expressions.Kernels.unicodeNormalize($c, "$form")""")
  override protected def withNewChildInternal(newChild: Expression): UnicodeNormExpr =
    copy(child = newChild)
}

case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.Kernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
}

case class HyperplaneSigExpr(child: Expression, dim: Int, bits: Int, seed: Long)
    extends UnaryExpression {
  @transient private lazy val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_sig"
  override protected def nullSafeEval(v: Any): Any =
    Kernels.hyperplaneSig(v.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Kernels.hyperplaneSig($c, $pRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)
}

case class RepetitionStatsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_repetition_stats"
  override protected def nullSafeEval(s: Any): Any =
    Kernels.repetitionStats(s.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.repetitionStats($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

case class CharNgramCountsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("g", StringType, nullable = false),
                   StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_char_ngram_counts"
  override protected def nullSafeEval(s: Any): Any =
    Kernels.charNgramCounts(s.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.charNgramCounts($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharNgramCountsExpr =
    copy(child = newChild)
}

case class CharNgramFreqStatsExpr(child: Expression, n: Int,
                                  table: java.util.HashMap[UTF8String, java.lang.Long])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_ngram_freq_stats"
  override protected def nullSafeEval(s: Any): Any =
    Kernels.charNgramFreqStats(s.asInstanceOf[UTF8String], n, table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("gramTable", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Kernels.charNgramFreqStats($c, $n, $tRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): CharNgramFreqStatsExpr =
    copy(child = newChild)
}

case class NearestCentroidsExpr(child: Expression, cents: Array[Array[Double]], n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_centroids"
  override protected def nullSafeEval(v: Any): Any =
    Kernels.nearestCentroids(v.asInstanceOf[ArrayData], cents, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Kernels.nearestCentroids($c, $cRef, $n);")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsExpr =
    copy(child = newChild)
}

/** Column-builder surface for the native expressions. */
case class SubwordCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_subword_count"
  override protected def nullSafeEval(s: Any): Any =
    Kernels.subwordCount(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.subwordCount($c)")
  override protected def withNewChildInternal(newChild: Expression): SubwordCountExpr =
    copy(child = newChild)
}

case class ScriptCountsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_script_counts"
  override protected def nullSafeEval(s: Any): Any =
    Kernels.scriptCounts(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.scriptCounts($c)")
  override protected def withNewChildInternal(newChild: Expression): ScriptCountsExpr =
    copy(child = newChild)
}

object GraftFunctions {
  def simhash64(c: Column): Column =
    Shim.column(SimHash64Expr(Shim.expression(c)))
  def shingles(c: Column, n: Int): Column =
    Shim.column(ShinglesExpr(Shim.expression(c), n))
  def typeProbe(c: Column): Column =
    Shim.column(TypeProbeExpr(Shim.expression(c)))
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    Shim.column(UnicodeNormExpr(Shim.expression(c), form))
  def minhashSignature(c: Column, numPerms: Int, seed: Long = 42L): Column =
    Shim.column(MinHashSigExpr(Shim.expression(c), numPerms, seed))
  def cosine(a: Column, b: Column): Column =
    Shim.column(CosineSimExpr(Shim.expression(a), Shim.expression(b)))
  def hyperplaneSignature(c: Column, dim: Int, bits: Int, seed: Long = 7L): Column =
    Shim.column(HyperplaneSigExpr(Shim.expression(c), dim, bits, seed))
  def nearestCentroids(c: Column, cents: Array[Array[Double]], n: Int): Column =
    Shim.column(NearestCentroidsExpr(Shim.expression(c), cents, n))
  def repetitionStats(c: Column, n: Int): Column =
    Shim.column(RepetitionStatsExpr(Shim.expression(c), n))
  def charNgramCounts(c: Column, n: Int): Column =
    Shim.column(CharNgramCountsExpr(Shim.expression(c), n))
  def charNgramFreqStats(c: Column, n: Int,
                         table: java.util.HashMap[UTF8String, java.lang.Long]): Column =
    Shim.column(CharNgramFreqStatsExpr(Shim.expression(c), n, table))
  def subwordCount(c: Column): Column =
    Shim.column(SubwordCountExpr(Shim.expression(c)))
  def scriptCounts(c: Column): Column =
    Shim.column(ScriptCountsExpr(Shim.expression(c)))
}
