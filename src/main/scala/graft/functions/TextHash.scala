package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnGlue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hashing hot path.
  *
  * The same computations are expressible with built-in higher-order
  * functions (`transform`/`aggregate`/`zip_with` — see git history of
  * [[graft.operators.Dedup]]), but HOF lambdas are interpreted per array
  * element: a MinHash signature is k×|shingles| ≈ 10^4 lambda invocations
  * per document, which dominated the whole-pipeline runtime. These
  * expressions run the identical math as one tight JIT'd loop per row and
  * stay inside whole-stage codegen (`doGenCode` emits a static call), per
  * the custom-operator preference order (Expression with doGenCode over
  * UDF).
  *
  * Hash compatibility: bit-identical to the HOF formulation —
  * `xxhash64(s)` = XXH64(bytes, seed=42) and `xxhash64(h, j)` =
  * hashLong(j, hashLong(h, 42)) — asserted by NativeFunctionsSpec.
  */
object TextHash {

  /** MinHash signature of `text`'s character `shingleSize`-shingles:
    * array of k minima over seed-mixed shingle hashes. */
  def minHashSignature(text: Column, k: Int, shingleSize: Int): Column =
    ColumnGlue.column(MinHashSig(ColumnGlue.expression(text), k, shingleSize))

  /** Sorted distinct 64-bit hashes of `text`'s character shingles —
    * the per-document set representation that the near-dup verify stage
    * intersects. Computed ONCE per document in the scan projection (vs
    * re-shingling per candidate pair, which made verification O(pairs ×
    * doc-length) and dominated the round-1 bench). */
  def shingleHashes(text: Column, shingleSize: Int): Column =
    ColumnGlue.column(ShingleHashes(ColumnGlue.expression(text), shingleSize))

  /** MinHash signature from a precomputed shingle-hash array. Guarantee
    * (asserted by NativeFunctionsSpec): minHashFromHashes(shingleHashes(t,
    * n), k) is bit-identical to minHashSignature(t, k, n), so pipelines can
    * share one shingling pass between signature and verify stages. */
  def minHashFromHashes(hashes: Column, k: Int): Column =
    ColumnGlue.column(MinHashFromHashes(ColumnGlue.expression(hashes), k))

  /** 64-bit SimHash over whitespace tokens: each token's hash votes ±1
    * per bit position; positive votes set the bit. */
  def simHash64(text: Column): Column =
    ColumnGlue.column(SimHash64(ColumnGlue.expression(text)))

  /** |a ∩ b| of two sorted distinct long arrays ([[shingleHashes]]
    * output) — the linear-merge verify kernel. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnGlue.column(SortedIntersectCount(ColumnGlue.expression(a), ColumnGlue.expression(b)))

  /** Content-defined-chunking cut starts (1-based; position 1 always
    * included): positions i ≥ 2 where the md5 of the `gramSize`-char
    * window starting at i satisfies `first-4-bytes % avgChunk == 0` —
    * bit-identical to the HOF formulation
    * `conv(substring(md5(substr(text,i,g)),1,8),16,10) % avg == 0` the
    * DuckDB oracle replays, but one JIT'd loop per row instead of |text|
    * interpreted lambda evaluations (each with its own md5/conv/substring
    * expression tree — the whole cdc_chunks gate cost). */
  def cdcCutStarts(text: Column, gramSize: Int, avgChunk: Int): Column =
    ColumnGlue.column(CdcCutStarts(ColumnGlue.expression(text), gramSize, avgChunk))

  /** md5 digests (16-byte binary) of EVERY `winChars`-character sliding
    * window of `text`, one element per start position 1..len−win+1
    * (empty array when the text is shorter than one window) — the
    * streaming-ExactSubstr window-key projection
    * ([[graft.streaming.OnlineSuffixDedup]]). Bit-identical to
    * `unhex(md5(array_join(slice(chars, pos, win), '')))` over the
    * split-to-char-array formulation (windows are contiguous byte
    * slices of the UTF-8 encoding, asserted by NativeFunctionsSpec),
    * but ONE byte walk + one digest reuse per document instead of a
    * per-window interpreted slice + array_join + hex/unhex round trip
    * — the projection dominated the online_suffix_replay batch cost
    * (r17 profile: ~1.5 s of a ~3 s batch). */
  def windowMd5s(text: Column, winChars: Int): Column =
    ColumnGlue.column(WindowMd5s(ColumnGlue.expression(text), winChars))

  private val Seed = 42L // xxhash64's fixed seed

  /** = xxhash64(string): XXH64 over the UTF-8 bytes, seed 42. */
  def hashString(s: String): Long = {
    val b = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(b.getBaseObject, b.getBaseOffset, b.numBytes(), Seed)
  }

  /** = xxhash64(h, j) with long h and int j: fold the running hash
    * through both values (int seeds hash via hashInt, as the built-in
    * does for IntegerType inputs). */
  def mix(h: Long, j: Int): Long = XXH64.hashInt(j, XXH64.hashLong(h, Seed))

  /** Distinct shingle hashes of trimmed text (identical shingles hash
    * identically, so distinct-by-hash ≡ array_distinct on the shingle
    * strings). */
  private def distinctShingleHashes(input: UTF8String, shingleSize: Int): Array[Long] = {
    val s = input.trim().toString
    val len = s.length
    val seen = new java.util.HashSet[java.lang.Long]()
    val last = math.max(len - shingleSize, 0)
    var i = 0
    while (i <= last) {
      seen.add(hashString(s.substring(i, math.min(i + shingleSize, len))))
      i += 1
    }
    val hashes = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { hashes(i) = it.next(); i += 1 }
    hashes
  }

  /** Signature = k minima over seed-mixed shingle hashes. */
  private def signatureOf(hashes: Array[Long], k: Int): ArrayData = {
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      var min = Long.MaxValue
      var x = 0
      while (x < hashes.length) {
        val m = mix(hashes(x), j)
        if (m < min) min = m
        x += 1
      }
      sig(j) = min
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Imperative core of [[MinHashSig]] (called from generated code). */
  def minHashEval(input: UTF8String, k: Int, shingleSize: Int): ArrayData =
    signatureOf(distinctShingleHashes(input, shingleSize), k)

  /** Imperative core of [[ShingleHashes]] (called from generated code). */
  def shingleHashEval(input: UTF8String, shingleSize: Int): ArrayData = {
    val hashes = distinctShingleHashes(input, shingleSize)
    java.util.Arrays.sort(hashes)
    new GenericArrayData(hashes)
  }

  /** Imperative core of [[MinHashFromHashes]] (called from generated code). */
  def minHashFromHashesEval(input: ArrayData, k: Int): ArrayData =
    signatureOf(input.toLongArray(), k)

  /** Imperative core of [[SortedIntersectCount]]: |a ∩ b| of two SORTED
    * distinct long arrays by linear merge — no per-row hash set, no
    * boxing. The verify kernel of every Jaccard pipeline: at millions of
    * candidate pairs the built-in `array_intersect` (hash-set per row)
    * was the dominant cost of `prefix_jaccard_pairs`. */
  def sortedIntersectCountEval(a: ArrayData, b: ArrayData): Int = {
    val la = a.numElements(); val lb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < la && j < lb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** Imperative core of [[CdcCutStarts]] (called from generated code).
    * The md5-window math mirrors the SQL formulation exactly: the window
    * is a CHARACTER substring (UTF8String.substringSQL — code-point
    * semantics, like SQL substr), hashed over its UTF-8 bytes (md5 of a
    * string IS md5 of its UTF-8 encoding), and the first 8 hex digits of
    * the digest are the first 4 bytes read big-endian unsigned. */
  def cdcCutStartsEval(input: UTF8String, gramSize: Int, avgChunk: Int): ArrayData = {
    val len = input.numChars()
    val last = len - gramSize + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new scala.collection.mutable.ArrayBuffer[Any](8)
    buf += 1
    var i = 2
    while (i <= last) {
      md.reset()
      val d = md.digest(input.substringSQL(i, gramSize).getBytes)
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      if (v % avgChunk == 0) buf += i
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }

  /** Imperative core of [[WindowMd5s]] (called from generated code):
    * one pass records each character's byte offset (code-point walk —
    * the same boundaries the split-to-char-array formulation joins
    * back), then each window hashes its contiguous byte slice through
    * ONE reused MessageDigest — no per-window string or array
    * allocation. */
  def windowMd5sEval(input: UTF8String, winChars: Int): ArrayData = {
    val bytes = input.getBytes
    val nBytes = bytes.length
    val nChars = input.numChars()
    val out = nChars - winChars + 1
    if (out <= 0) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nChars + 1)
    var i = 0
    var c = 0
    while (i < nBytes) {
      starts(c) = i
      c += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    starts(nChars) = nBytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val res = new Array[Any](out)
    var p = 0
    while (p < out) {
      md.reset()
      md.update(bytes, starts(p), starts(p + winChars) - starts(p))
      res(p) = md.digest()
      p += 1
    }
    new GenericArrayData(res)
  }

  /** Imperative core of [[SimHash64]] (called from generated code). */
  def simHashEval(input: UTF8String): Long = {
    val tokens = input.trim().toString.split("\\s+", -1)
    val votes = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = hashString(tokens(t))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var code = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) code |= (1L << b)
      b += 1
    }
    code
  }
}

/** `minhash_sig(text)`: ArrayType(LongType) MinHash signature. */
case class MinHashSig(child: Expression, k: Int, shingleSize: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    TextHash.minHashEval(input.asInstanceOf[UTF8String], k, shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minHashEval($c, $k, $shingleSize)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `shingle_hashes(text)`: sorted distinct ArrayType(LongType) shingle
  * hashes — the document's set representation for Jaccard verification. */
case class ShingleHashes(child: Expression, shingleSize: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextHash.shingleHashEval(input.asInstanceOf[UTF8String], shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.shingleHashEval($c, $shingleSize)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `minhash_from_hashes(hashes)`: signature from a precomputed shingle-hash
  * array; bit-identical to [[MinHashSig]] over the originating text. */
case class MinHashFromHashes(child: Expression, k: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType, containsNull = false))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_from_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextHash.minHashFromHashesEval(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minHashFromHashesEval($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashFromHashes =
    copy(child = newChild)
}

/** `window_md5s(text)`: ArrayType(BinaryType) md5 of every sliding
  * `winChars`-character window, one element per 1-based start position —
  * posexplode recovers `(pos − 1, digest)` pairs. */
case class WindowMd5s(child: Expression, winChars: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(winChars >= 1, s"winChars must be >= 1: $winChars")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "window_md5s"

  override protected def nullSafeEval(input: Any): Any =
    TextHash.windowMd5sEval(input.asInstanceOf[UTF8String], winChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.windowMd5sEval($c, $winChars)")

  override protected def withNewChildInternal(newChild: Expression): WindowMd5s =
    copy(child = newChild)
}

/** `sorted_intersect_count(a, b)`: IntegerType |a ∩ b| of two sorted
  * distinct long arrays (the [[ShingleHashes]] representation) via linear
  * merge. Callers must guarantee sortedness — [[ShingleHashes]] sorts at
  * construction, so the invariant holds corpus-wide by construction. */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false), ArrayType(LongType, containsNull = false))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.sortedIntersectCountEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextHash.sortedIntersectCountEval($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** `cdc_cut_starts(text)`: ArrayType(IntegerType) chunk start positions
  * for content-defined chunking ([[graft.operators.TextCorpus.cdcChunks]]). */
case class CdcCutStarts(child: Expression, gramSize: Int, avgChunk: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_cut_starts"

  override protected def nullSafeEval(input: Any): Any =
    TextHash.cdcCutStartsEval(input.asInstanceOf[UTF8String], gramSize, avgChunk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.cdcCutStartsEval($c, $gramSize, $avgChunk)")

  override protected def withNewChildInternal(newChild: Expression): CdcCutStarts =
    copy(child = newChild)
}

/** `simhash64(text)`: LongType SimHash code. */
case class SimHash64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    TextHash.simHashEval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simHashEval($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
