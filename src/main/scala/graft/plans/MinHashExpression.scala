package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature over an array of PRE-HASHED shingle keys (60-bit
  * longs): `perms` minima in ONE pass.
  *
  * hm = shh mod p; permutation j is h_j = ((2j+1)·hm + (j·bMult mod p))
  * mod p — identical arithmetic to the DuckDB oracle. Returns NULL for
  * an empty array (documents too short for n-grams drop out, matching
  * the oracle's absent rows).
  *
  * Takes hashes (not strings) so the md5 sweep happens exactly once in
  * the shared hashed-shingles base relation; replaces an explode(×perms)
  * + groupBy(doc, j) shuffle of N×S×perms rows with a narrow per-row
  * kernel. */
case class MinHashSig(child: Expression, perms: Int, p: Long, bMult: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<BIGINT> of shingle hashes, got ${t.simpleString}")
  }

  override def nullSafeEval(hashes: Any): Any = {
    val arr = hashes.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) return null
    val mins = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val hm = arr.getLong(i) % p
      var j = 0
      while (j < perms) {
        val h = ((2L * j + 1L) * hm + (j * bMult) % p) % p
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(java.lang.Long.valueOf(_): Any))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "minhash_sig"
}
