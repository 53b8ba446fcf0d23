package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd signature expressions for the dedup / ANN
  * operators. Each replaces an interpreted higher-order-expression
  * pipeline (per-char `split` + `ascii`, 48-array `zip_with` vote
  * folds, per-plane `aggregate` dot products) with one tight JVM loop
  * per row, on the [[CleanWord]] pattern: a standalone worker object
  * (static forwarder → direct call from generated Java) plus a thin
  * `UnaryExpression` whose `doGenCode` stays inside whole-stage
  * codegen.
  *
  * Every expression is map-side, deterministic integer/IEEE
  * arithmetic reproduced verbatim in the DuckDB oracles — see the
  * per-object notes. Inputs are the engine's canonical cleaned text
  * (ASCII `[a-z0-9\s]`), where Spark's `split("")`+`ascii` per-char
  * semantics and a plain byte/char loop coincide; non-ASCII content
  * falls back to UTF-16 char values (the same numeric `ascii()`
  * yields for BMP characters).
  */
object TextHashes {

  // Column construction from a raw Expression is private[sql] in
  // Spark 4, so these resolve by NAME through the session's function
  // registry — the three functions are registered by
  // [[GraftExtensions]], which every engine session enables
  // (spark.sql.extensions=graft.plans.GraftExtensions).

  def charGramHashes(c: Column): Column = call_function("char_gram_hashes", c)

  def simhash48(c: Column): Column = call_function("simhash48", c)

  def hyperplaneBuckets(c: Column): Column = call_function("hyperplane_buckets", c)

  def minhashSigs(sh: Column, seeds: Column): Column =
    call_function("minhash_sigs", sh, seeds)

  def dotDouble(a: Column, b: Column): Column = call_function("dot_double", a, b)

  def jaccardLong(a: Column, b: Column): Column = call_function("jaccard_long", a, b)

  def polyHash(c: Column): Column = call_function("poly_hash", c)

  def deletionHashes(c: Column): Column = call_function("deletion_hashes", c)

  def deletionHashes2(c: Column): Column = call_function("deletion_hashes2", c)

  def nfcNormalize(c: Column): Column = call_function("nfc_normalize", c)

  def jaroWinkler(a: Column, b: Column): Column =
    call_function("jaro_winkler_similarity", a, b)
}

/** Worker for [[JaroWinklerSim]] — a bit-for-bit port of DuckDB's
  * `jaro_winkler_similarity` semantics, established empirically
  * (0/6000 mismatches on adversarial generated pairs incl. repeated
  * chars and transposition-heavy strings): BYTE-level comparison (so
  * multi-byte UTF-8 behaves exactly as the oracle's, pinned on
  * planted non-ASCII), empty/anything → 0.0, match window
  * `max(l1,l2)/2 − 1` floored at 0, half-transpositions, Winkler
  * boost `j + l·0.1·(1−j)` with prefix l ≤ 4 applied only when
  * j > 0.7, and the exact IEEE op order of the reference
  * `(m/l1 + m/l2 + (m−t)/m) / 3.0`. */
object JaroWinklerUtil {
  def jw(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes; val s2 = b.getBytes
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1); val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      var j = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var unmatched = true
      while (j < hi && unmatched) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; unmatched = false
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val m = matches.toDouble
    var j = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (j > 0.7) {
      val maxL = math.min(4, math.min(l1, l2))
      var l = 0
      while (l < maxL && s1(l) == s2(l)) l += 1
      j = j + l * 0.1 * (1.0 - j)
    }
    j
  }
}

/** `jaro_winkler_similarity(string, string) -> double`: the
  * record-linkage name-similarity measure (prefix-weighted Jaro) —
  * the standard complement to edit distance for person/company name
  * matching. Named and specified after DuckDB's built-in so oracles
  * replay it verbatim ([[JaroWinklerUtil]] documents the pinned
  * semantics). One codegen'd O(len·window) pass per candidate pair;
  * byte-array scratch only, no allocation beyond the two flag
  * arrays. */
case class JaroWinklerSim(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler_similarity requires (string, string), got ($l, $r)")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUtil.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.JaroWinklerUtil.jw($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

/** Worker for [[NfcNormalize]]. `Normalizer.isNormalized` first: real
  * corpora are overwhelmingly ASCII/already-NFC, and the check is a
  * forward scan with no allocation, so the common row pays one pass
  * and zero copies; only rows with decomposed sequences pay the
  * normalize + re-encode. */
object NfcNormalizeUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(string) -> string`: Unicode NFC canonical
  * composition — the corpus-prep normalization every tokenizer
  * pipeline applies before hashing/dedup, because byte-level keys
  * split logically-identical texts spelled with precomposed
  * (U+00E9) vs decomposed (e + U+0301) sequences. Named after
  * DuckDB's identical built-in so the oracle replays it verbatim;
  * both sides implement the same Unicode UAX #15 algorithm. Stays
  * inside whole-stage codegen (one static call). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeUtil.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalizeUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Worker for [[DeletionHashes]]: the distinct [[PolyHashUtil]]
  * hashes of a string itself plus every one-code-point deletion — the
  * FastSS neighborhood a fuzzy equi-join blocks on — in ONE O(L)
  * pass. The interpreted spelling rebuilds L substrings per row
  * (O(L²) bytes) and refolds each; here the variant deleting
  * position i composes from shared prefix folds and suffix values:
  * with prefix(i) the fold of the first i code points,
  * pow(k) = 31^k mod P, and suf(j) = Σ_{k≥j} cp_k·pow(m-1-k) mod P
  * (the suffix's value at its FINAL weight in the length-(m-1)
  * variant), variant(i) = prefix(i)·pow(m-1-i) + suf(i+1) (mod P) —
  * bit-identical to refolding the deleted string. All intermediates
  * stay < 2^63: prefix < P so prefix·pow < ~1e18, and cp·pow ≤
  * 0x10FFFF·P < 1.2e15. Output order is first-occurrence (self hash
  * first, then deletions left to right), the exact semantics of
  * `array_union(array(poly_hash(s)), transform(...))`. */
object DeletionHashesUtil {
  private val P = graft.Core.HashMod

  def hashes(s: UTF8String): ArrayData = {
    val str = s.toString
    val m = str.codePointCount(0, str.length)
    val cps = new Array[Int](m)
    var i = 0
    var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(k) = cp; k += 1; i += Character.charCount(cp)
    }
    val prefix = new Array[Long](m + 1)
    val pow = new Array[Long](m + 1)
    pow(0) = 1L
    i = 0
    while (i < m) {
      prefix(i + 1) = (prefix(i) * 31 + cps(i)) % P
      pow(i + 1) = pow(i) * 31 % P
      i += 1
    }
    val suf = new Array[Long](m + 1)
    i = m - 1
    while (i >= 0) {
      suf(i) = (suf(i + 1) + cps(i) * pow(m - 1 - i)) % P
      i -= 1
    }
    val out = new Array[Long](m + 1)
    val seen = new java.util.HashSet[java.lang.Long]((m + 1) * 2)
    var n = 0
    def add(h: Long): Unit = if (seen.add(h)) { out(n) = h; n += 1 }
    add(prefix(m))
    i = 0
    while (i < m) {
      add((prefix(i) * pow(m - 1 - i) % P + suf(i + 1)) % P)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, n))
  }
}

/** Worker for [[DeletionHashes2]]: the distinct hashes of a string,
  * every 1-deletion, and every 2-deletion — the FastSS D≤2
  * neighborhood, complete for edit distance ≤ 2 (an optimal
  * alignment deletes the ≤ 2 edited positions from each side,
  * reaching a common string). The 2-deletion variant (drop positions
  * i < j) composes from the SAME prefix/suffix arrays as the
  * 1-deletion case plus one modular division: the middle segment's
  * stored weights sit one power of 31 too high, and P prime makes
  * `inv31 = 31^(P-2) mod P` an exact rescale —
  * variant(i,j) = prefix(i)·pow(m-2-i)
  *              + (suf(i+1) − suf(j))·inv31
  *              + suf(j+1)   (mod P).
  * Output size is Θ(L²) (it IS the neighborhood), but each entry is
  * O(1) — no substring building, total O(L²) integer ops vs the
  * interpreted O(L³) bytes. Order: self, 1-deletions left to right,
  * then (i,j) lexicographic, first-occurrence deduped — the
  * `array_union` composition's exact semantics. All intermediates
  * < 2^63: (suf diff + P) < 2P ≈ 2e9 times inv31 < P ≈ 1e9. */
object DeletionHashes2Util {
  private val P = graft.Core.HashMod
  private val Inv31 =
    java.math.BigInteger.valueOf(31)
      .modPow(java.math.BigInteger.valueOf(P - 2), java.math.BigInteger.valueOf(P))
      .longValueExact()

  /** The D≤2 neighborhood is Θ(L²) entries by definition; its domain
    * is SHORT KEYS (names, codes, identifiers). Past this bound a
    * single row would allocate millions of longs plus a HashSet — a
    * document-length input is a caller bug (shingle/minhash is the
    * document-scale tool), so fail loudly instead of OOMing an
    * executor. 512 code points ⇒ ≤ ~131k entries ≈ 1 MB/row, the
    * practical ceiling for a per-row array. */
  val MaxCodePoints = 512

  def hashes(s: UTF8String): ArrayData = {
    val str = s.toString
    val m = str.codePointCount(0, str.length)
    if (m > MaxCodePoints)
      throw new IllegalArgumentException(
        s"deletion_hashes2: input has $m code points (max $MaxCodePoints)" +
          " — the D<=2 deletion neighborhood is quadratic in length and" +
          " meant for short keys (names/identifiers); use shingle-based" +
          " near-dup operators for document-length text")
    val cps = new Array[Int](m)
    var i = 0
    var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(k) = cp; k += 1; i += Character.charCount(cp)
    }
    val prefix = new Array[Long](m + 1)
    val pow = new Array[Long](m + 1)
    pow(0) = 1L
    i = 0
    while (i < m) {
      prefix(i + 1) = (prefix(i) * 31 + cps(i)) % P
      pow(i + 1) = pow(i) * 31 % P
      i += 1
    }
    val suf = new Array[Long](m + 1)
    i = m - 1
    while (i >= 0) {
      suf(i) = (suf(i + 1) + cps(i) * pow(m - 1 - i)) % P
      i -= 1
    }
    val cap = 1 + m + m * (m - 1) / 2
    val out = new Array[Long](cap)
    val seen = new java.util.HashSet[java.lang.Long](cap * 2)
    var n = 0
    def add(h: Long): Unit = if (seen.add(h)) { out(n) = h; n += 1 }
    add(prefix(m))
    i = 0
    while (i < m) {
      add((prefix(i) * pow(m - 1 - i) % P + suf(i + 1)) % P)
      i += 1
    }
    i = 0
    while (i < m - 1) {
      var j = i + 1
      while (j < m) {
        val mid = (suf(i + 1) - suf(j) + P) % P * Inv31 % P
        add((prefix(i) * pow(m - 2 - i) % P + mid + suf(j + 1)) % P)
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, n))
  }
}

/** `deletion_hashes2(string) -> array<bigint>`: the FastSS D≤2
  * neighborhood as hashes, one codegen'd O(L²) pass per row. */
case class DeletionHashes2(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deletion_hashes2 requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "deletion_hashes2"

  override protected def nullSafeEval(input: Any): Any =
    DeletionHashes2Util.hashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.DeletionHashes2Util.hashes($c)")

  override protected def withNewChildInternal(newChild: Expression): DeletionHashes2 =
    copy(child = newChild)
}

/** `deletion_hashes(string) -> array<bigint>`: the FastSS deletion
  * neighborhood as hashes, one codegen'd O(L) pass per row. */
case class DeletionHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deletion_hashes requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "deletion_hashes"

  override protected def nullSafeEval(input: Any): Any =
    DeletionHashesUtil.hashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.DeletionHashesUtil.hashes($c)")

  override protected def withNewChildInternal(newChild: Expression): DeletionHashes =
    copy(child = newChild)
}

/** Worker for [[PolyHash]]: the 31-base polynomial rolling hash mod
  * 1e9+7 over a string's CODE POINTS, the exact arithmetic of the
  * interpreted `aggregate(split(c, ''), 0L, (acc, ch) -> (acc*31 +
  * ascii(ch)) % P)` it replaces: Spark's `split('')` yields one
  * element per code point (surrogate pairs stay intact) and
  * `ascii()` returns the full code point, so a codePointAt loop is
  * bit-identical — including `ascii('') = 0` for the empty string,
  * where both spellings produce 0. Same formula as the DuckDB
  * oracle's `list_reduce` fold ([[graft.Core.oPolyHash]]). */
object PolyHashUtil {
  private val P = graft.Core.HashMod

  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }
}

/** `poly_hash(string) -> bigint`: the engine's shared string-hash
  * primitive (fingerprints, MinHash shingles, hash-split sampling)
  * as one codegen'd loop per row instead of a per-character
  * interpreted `split`+`aggregate` fold. */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"poly_hash requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHashUtil.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PolyHashUtil.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** Worker for [[CharGramHashes]]: the distinct character-5-gram
  * hash set of a cleaned string, in first-occurrence order (the
  * exact semantics of `array_distinct(transform(sequence(...), i ->
  * c[i]*31^4 + ... + c[i+4]))` it replaces — see the DuckDB oracle in
  * [[graft.operators.Dedup]]). The 31-base polynomial over char codes
  * ≤ 'z' (122) maxes at ~1.2e8, so no modulus is needed and the hash
  * is exact in a long on both engines.
  */
object CharGramHashesUtil {
  private val N = 5

  def hashes(s: UTF8String): ArrayData = {
    val str = s.toString
    val len = str.length
    if (len < N) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](len - N + 1)
    val seen = new java.util.HashSet[java.lang.Long](out.length * 2)
    var n = 0
    var i = 0
    while (i <= len - N) {
      val h = str.charAt(i) * 923521L + str.charAt(i + 1) * 29791L +
        str.charAt(i + 2) * 961L + str.charAt(i + 3) * 31L + str.charAt(i + 4)
      if (seen.add(h)) { out(n) = h; n += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, n))
  }
}

/** `char_gram_hashes(string) -> array<bigint>`: distinct 5-gram
  * polynomial hashes, one codegen'd pass per document. */
case class CharGramHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_gram_hashes requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    CharGramHashesUtil.hashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharGramHashesUtil.hashes($c)")

  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)
}

/** Worker for [[SimHash48]]. Per token: the engine's shared 31-base
  * rolling hash mod 1e9+7 ([[graft.Core.polyHash]] — ~30 bits), then
  * a widening mix `H = h + ((h * 2654435761) % P) << 30` giving 48+
  * independent-ish bits (Knuth multiplicative step; every
  * intermediate stays < 2^63 so DuckDB BIGINT arithmetic reproduces
  * it exactly). The fingerprint folds ±1 votes per bit over all
  * token occurrences and takes the sign bits.
  *
  * WIDTH IS A SCALE PARAMETER (compile-time here): a band join over
  * chunk keys keeps every bucket at O(1) occupancy only while the
  * key width w satisfies 2^w ≳ N / desired-bucket-size (bits ≈
  * log2(N / occupancy)). The banding in [[graft.operators.Dedup]]
  * joins 5 chunks on all C(5,2)=10 chunk PAIRS (~19–20-bit keys):
  * hamming ≤ 2 corrupts ≤ 2 chunks, leaving ≥ 3 intact, and any 3
  * intact chunks cover a fully-intact pair — pigeonhole exactness
  * (generally: split into hamming + pair-size chunks ⇒ some intact
  * pair survives). A deployment at different N re-derives chunk
  * count/width from the log rule; the expression itself is
  * width-agnostic up to 63 bits.
  */
object SimHash48Util {
  val Bits = 48
  private val P = graft.Core.HashMod // 1e9+7

  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      if (tok != null) {
        val str = tok.toString
        var h = 0L
        var i = 0
        while (i < str.length) { h = (h * 31 + str.charAt(i)) % P; i += 1 }
        val hv = h + ((h * 2654435761L) % P) * (1L << 30)
        var b = 0
        while (b < Bits) {
          if (((hv >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var b = 0
    while (b < Bits) { if (votes(b) > 0) fp |= 1L << b; b += 1 }
    fp
  }
}

/** `simhash48(array<string>) -> bigint`: 48-bit SimHash fingerprint
  * of a token array, one codegen'd loop per document (replaces a
  * 48-element `zip_with` vote fold per token). */
case class SimHash48(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash48 requires array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash48"

  override protected def nullSafeEval(input: Any): Any =
    SimHash48Util.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash48Util.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)
}

/** Worker for [[HyperplaneBuckets]]: all `Tables` sign-random-
  * projection bucket ids of one embedding in a single pass. Plane
  * weights come from [[graft.functions.Vectors.planeWeight]] (integer-
  * valued, reproduced inline in the DuckDB oracle); each plane dot is
  * the same sequential `acc + v[i] * w[i]` left-fold the interpreted
  * `aggregate` spelled, so signs — and therefore buckets — are
  * bit-identical across engines.
  */
object HyperplaneBucketsUtil {
  import graft.functions.Vectors.{planeWeight, BitsPerTable, Dim, Tables}

  private val planes: Array[Array[Double]] =
    Array.tabulate(Tables * BitsPerTable, Dim)(planeWeight)

  def buckets(embd: ArrayData): ArrayData = {
    val v = embd.toDoubleArray()
    val out = new Array[Long](Tables)
    var t = 0
    while (t < Tables) {
      var bucket = 0L
      var b = 0
      while (b < BitsPerTable) {
        val w = planes(t * BitsPerTable + b)
        // inputs are Dim-length by contract; the min bound keeps an
        // over-long vector from throwing (it contributes only its
        // first Dim components, like the oracle's generate_series)
        val m = math.min(v.length, w.length)
        var acc = 0.0
        var i = 0
        while (i < m) { acc = acc + v(i) * w(i); i += 1 }
        if (acc > 0) bucket |= 1L << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `hyperplane_buckets(array<double>) -> array<bigint>`: the vector's
  * bucket id in each of the LSH tables (element `t` = table `t`;
  * `posexplode` turns it into (tbl, bucket) entries). Replaces
  * Tables × BitsPerTable interpreted `aggregate` folds per row with
  * one codegen'd loop. */
case class HyperplaneBuckets(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets requires array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBucketsUtil.buckets(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HyperplaneBucketsUtil.buckets($c)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

/** Worker for [[MinHashSigs]]: all permutation minima of one hash
  * set in a single pass — `out(i) = min over h of (seeds(i)·h + (i+1))
  * % P`, the exact arithmetic of the interpreted
  * `array_min(transform(sh, h -> (seed·h + (i+1)) % P))` per seed it
  * replaces (seeds and h both < P ≈ 2^30, so every product < P² ≈
  * 10^18 < 2^63 — exact). Inputs are non-empty by the operators'
  * length filters;
  * the MinHash construction is recall machinery, not a result value —
  * the pair oracles are exact ground-truth Jaccard, so a green row
  * PROVES the banding missed nothing.
  */
object MinHashSigsUtil {
  private val P = graft.Core.HashMod

  def sigs(sh: ArrayData, seeds: ArrayData): ArrayData = {
    val n = seeds.numElements()
    val out = new Array[Long](n)
    java.util.Arrays.fill(out, Long.MaxValue)
    val m = sh.numElements()
    var j = 0
    while (j < m) {
      val h = sh.getLong(j)
      var i = 0
      while (i < n) {
        val v = (seeds.getLong(i) * h + (i + 1)) % P
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `minhash_sigs(array<bigint>, array<bigint>) -> array<bigint>`:
  * MinHash signature (one minimum per seed) of a shingle hash set,
  * one codegen'd loop per document instead of |seeds| interpreted
  * `transform`+`array_min` passes. */
case class MinHashSigs(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires (array<bigint>, array<bigint>), got ($l, $r)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(sh: Any, seeds: Any): Any =
    MinHashSigsUtil.sigs(sh.asInstanceOf[ArrayData], seeds.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.MinHashSigsUtil.sigs($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSigs =
    copy(left = newLeft, right = newRight)
}

/** Worker for [[DotDouble]]: the sequential left-fold dot product —
  * `acc = acc + a(i)·b(i)` in ascending index order, the IDENTICAL
  * IEEE operation sequence of the interpreted
  * `aggregate(sequence(1, size(a)), 0.0, (acc, i) -> acc + a[i]·b[i])`
  * it replaces and of the DuckDB oracle's `list_reduce` fold
  * ([[graft.functions.Vectors.oDot]]) — double addition is not
  * associative, but all three spell the same sequence, so results
  * are bit-identical. */
object DotDoubleUtil {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val m = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < m) { acc = acc + x(i) * y(i); i += 1 }
    acc
  }
}

/** `dot_double(array<double>, array<double>) -> double`: sequential
  * dot product, one codegen'd loop per row instead of an interpreted
  * per-element `aggregate` fold — the hot inner operation of every
  * cosine in the similarity / embedding-dedup operators. */
case class DotDouble(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_double requires (array<double>, array<double>), got ($l, $r)")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_double"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotDoubleUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.DotDoubleUtil.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotDouble =
    copy(left = newLeft, right = newRight)
}

/** Worker for [[JaccardLong]]: |A ∩ B| / |A ∪ B| of two
  * DISTINCT-element long arrays in one hash-probe pass. Numerically
  * identical to the interpreted
  * `size(array_intersect(a,b)) / (size(a)+size(b)-inter)` it
  * replaces (inputs are `array_distinct` outputs, so the
  * intersection count is the same; the final double division is the
  * same two exact ints) — but allocates one hash set instead of
  * ArrayIntersect's set + output array, and the candidate-verify
  * join evaluates it once per pair instead of re-running the
  * intersection for the condition and each projection reference. */
object JaccardLongUtil {
  /** Murmur-style finalizer spreading the low bits for the probe. */
  @inline private def scramble(k: Long): Int = {
    val h = k * -7046029254386353131L
    (h ^ (h >>> 32)).toInt
  }

  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val (s, t, ns, nt) = if (na <= nb) (a, b, na, nb) else (b, a, nb, na)
    // primitive open-addressing set (load ≤ 0.5) — no per-element
    // boxing, which dominates a java.util.HashSet[java.lang.Long]
    var cap = 16
    while (cap < ns * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1
    var i = 0
    while (i < ns) {
      val k = s.getLong(i)
      var p = scramble(k) & mask
      while (used(p) && keys(p) != k) p = (p + 1) & mask
      if (!used(p)) { used(p) = true; keys(p) = k }
      i += 1
    }
    var inter = 0
    var j = 0
    while (j < nt) {
      val k = t.getLong(j)
      var p = scramble(k) & mask
      while (used(p) && keys(p) != k) p = (p + 1) & mask
      if (used(p)) inter += 1
      j += 1
    }
    inter.toDouble / (na + nb - inter)
  }
}

/** `jaccard_long(array<bigint>, array<bigint>) -> double`: exact
  * Jaccard similarity of two distinct-element hash sets, one
  * codegen'd pass per candidate pair. */
case class JaccardLong(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"jaccard_long requires (array<bigint>, array<bigint>), got ($l, $r)")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardLongUtil.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.JaccardLongUtil.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardLong =
    copy(left = newLeft, right = newRight)
}
