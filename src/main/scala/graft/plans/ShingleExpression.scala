package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Distinct word-n-gram shingles of a token array, hashed to 60-bit
  * keys, in one pass.
  *
  * Semantics mirror the composable form exactly (and the DuckDB
  * oracle): shingle i = tokens[i..i+n-1] joined by ' '; DISTINCT on the
  * shingle STRINGS (a hash collision between distinct shingles stays
  * duplicated, like the oracle's); hash = first 15 md5 hex nibbles ==
  * first 8 digest bytes big-endian >>> 4. Empty result for < n tokens.
  *
  * Exists because the HOF formulation (`transform(shingles(text),
  * wordHashN)`) nests two lambda trees with md5 inside — seconds of
  * compile + interpreted eval per stage (measured 18 s on the sf0.1
  * n-gram join vs ~7 s with this kernel). */
case class HashedShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles requires ARRAY<STRING>, got ${t.simpleString}")
  }

  override def nullSafeEval(tokens: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= m - n) {
      val sb = new java.lang.StringBuilder()
      var o = 0
      while (o < n) {
        if (o > 0) sb.append(' ')
        val t = arr.getUTF8String(i + o)
        if (t != null) sb.append(t.toString)
        o += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      val dig = md.digest(it.next().getBytes("UTF-8"))
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (dig(j) & 0xffL); j += 1 }
      out(k) = java.lang.Long.valueOf(v >>> 4)
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "hashed_shingles"
}

/** (4·nNibbles)-bit md5-derived hash of a string — the native form of
  * [[graft.functions.HashOps.wordHashN]]'s composed expression
  * (`md5` + 15× `substring`/`ascii` nibble extraction).
  *
  * Semantics are bit-identical: value = first `nNibbles` lowercase-hex
  * md5 nibbles read big-endian == first ⌈n/2⌉ digest bytes with the
  * trailing half-byte dropped when n is odd. n ≤ 15 keeps the int64
  * sign bit clear.
  *
  * Exists because the composed form is re-evaluated wholesale inside
  * generator expressions (`posexplode(array(...))` — no subexpression
  * elimination there) and lambda bodies (HOFs never CSE): the
  * count-min sketch paid 3 depths × 15 nibbles = 45 md5 calls per
  * word through that path. One digest here. */
case class WordHashN(child: Expression, nNibbles: Int)
    extends UnaryExpression with CodegenFallback {
  require(nNibbles >= 1 && nNibbles <= 15,
    "16 nibbles would overflow the int64 sign bit")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_hash requires STRING, got ${t.simpleString}")
  }

  override def nullSafeEval(s: Any): Any = {
    val md = MessageDigest.getInstance("MD5")
    val dig = md.digest(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    var v = 0L
    var j = 0
    while (j < nNibbles) {
      val nib = (dig(j / 2) >> (4 * (1 - j % 2))) & 0xf
      v = (v << 4) | nib
      j += 1
    }
    v
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "word_hash"
}

/** All length-`n` character windows of a string (code-point semantics,
  * like `substring`), in one pass — ARRAY<STRING>, non-distinct,
  * position order; empty for strings shorter than `n` chars.
  *
  * Semantically identical to
  * `transform(sequence(1, length(s)-n+1), i -> substr(s, i, n))`, but
  * that form is O(len²): every `substr` call re-seeks its UTF-8
  * byte offset from the start of the string (variable-width encoding),
  * so a 1,000-char document costs ~500k boundary scans. This kernel
  * walks the byte array once, tracking window byte offsets
  * incrementally. The trigram profile dropped ~3.5s → ~1s at sf0.1;
  * the 40-char substring-dedup windows same shape. */
case class CharGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "window length must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_grams requires STRING, got ${t.simpleString}")
  }

  override def nullSafeEval(s: Any): Any = {
    val u = s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val bytes = u.getBytes
    // byte offset of each code-point start, one linear walk
    val starts = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < bytes.length) {
      starts.add(i)
      val b = bytes(i)
      i += (if ((b & 0x80) == 0) 1
            else if ((b & 0xe0) == 0xc0) 2
            else if ((b & 0xf0) == 0xe0) 3
            else 4)
    }
    val m = starts.size()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var k = 0
    while (k <= m - n) {
      val from: Int = starts.get(k)
      val until: Int = if (k + n < m) starts.get(k + n) else bytes.length
      out(k) = org.apache.spark.unsafe.types.UTF8String
        .fromBytes(java.util.Arrays.copyOfRange(bytes, from, until))
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "char_grams"
}

/** Perceptual average-hash signature of a string's code points, in one
  * narrow pass — the native form of
  * [[graft.operators.Multimodal.phashPairs]]'s bucket pipeline.
  *
  * Code point k (0-based) lands in bucket `k % bits`; bit b of the
  * signature is set iff bucket b's mean exceeds the global mean,
  * compared integer-exactly as the cross-multiply `s_b·tc > ts·c_b`
  * (no FP division). NULL for an empty string (the exploded
  * formulation and the DuckDB oracle drop such docs).
  *
  * Replaces an explode of every character into a corpus-chars-sized
  * shuffle (groupBy bucket) + a per-doc window + a re-aggregate —
  * ~len rows ÷ doc through two exchanges — with a projection:
  * 4.5 s → sub-second at sf0.1, identical integer arithmetic.
  *
  * Length bound: the cross-multiply `s_b·tc` is int64, so documents
  * must satisfy len² · max-codepoint < 2⁶³ — exact up to ~160 M ASCII
  * chars or ~3 M chars of max-plane code points (far beyond any real
  * document; the DuckDB oracle aggregates in HUGEINT and would surface
  * a divergence as a hash mismatch rather than silently agree). */
case class AvgHash(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  require(bits >= 1 && bits <= 63, "bits must fit a positive int64")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"avg_hash requires STRING, got ${t.simpleString}")
  }

  override def nullSafeEval(s: Any): Any = {
    val bytes = s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    if (bytes.length == 0) return null
    val sums = new Array[Long](bits)
    val cnts = new Array[Long](bits)
    var ts = 0L
    var tc = 0L
    var i = 0
    var k = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      var cp = 0L
      if (b < 0x80) { cp = b; i += 1 }
      else if ((b & 0xe0) == 0xc0) {
        cp = ((b & 0x1f) << 6) | (bytes(i + 1) & 0x3f); i += 2
      } else if ((b & 0xf0) == 0xe0) {
        cp = ((b & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) | (bytes(i + 2) & 0x3f)
        i += 3
      } else {
        cp = ((b & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)
        i += 4
      }
      val bk = k % bits
      sums(bk) += cp
      cnts(bk) += 1
      ts += cp
      tc += 1
      k += 1
    }
    var sig = 0L
    var bk = 0
    while (bk < bits) {
      if (sums(bk) * tc > ts * cnts(bk)) sig |= 1L << bk
      bk += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "avg_hash"
}
