package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 60-bit SimHash of a token array, as one native kernel.
  *
  * Semantics are EXACTLY the md5-nibble formulation shared with the
  * DuckDB oracle: per token, hash = first 15 hex nibbles of md5 (== the
  * first 8 bytes big-endian >>> 4); bit b of the signature is set iff
  * Σ_tokens (±1 by bit b of the hash) > 0 (token multiplicity counted).
  *
  * Why an Expression and not the higher-order-fold: the HOF version is
  * a ~60-step lambda tree whose generated code is recompiled per plan
  * stage — seconds of Janino/JIT latency per query at bench scale
  * (profiled: signatures run 0.37 s warm but each embedding stage paid
  * multi-second compiles). This kernel is a small interpreted eval
  * (CodegenFallback) with a tight loop — negligible compile cost, same
  * results bit-for-bit.
  */
case class SimHash60(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires ARRAY<STRING>, got ${t.simpleString}")
  }

  override def nullSafeEval(tokens: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val md = MessageDigest.getInstance("MD5")
    val counts = new Array[Int](60)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val dig = md.digest(if (s == null) Array.emptyByteArray else s.getBytes)
      // first 15 hex nibbles == first 8 bytes big-endian >>> 4
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (dig(j) & 0xffL); j += 1 }
      v = v >>> 4
      var b = 0
      while (b < 60) {
        counts(b) += (((v >> b) & 1L) * 2L - 1L).toInt
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash60"
}
