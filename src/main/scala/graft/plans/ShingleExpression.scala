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
