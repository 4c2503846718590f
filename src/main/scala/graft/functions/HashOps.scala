package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** md5-derived hash kernels shared by fingerprinting, SimHash and MinHash.
  *
  * Everything is built on `md5` (identical lowercase-hex output in Spark
  * and DuckDB) + ascii arithmetic, so the DuckDB oracle reproduces every
  * hash bit-for-bit. All column expressions; codegen-friendly; no UDFs.
  */
object HashOps {

  /** Hex-nibble value of char j (1-based) of a lowercase-hex string. */
  def nib(h: Column, j: Int): Column = {
    val a = ascii(substring(h, j, 1))
    when(a <= 57, a - 48).otherwise(a - 87).cast("long")
  }

  /** (4·nNibbles)-bit hash of a string: first n md5 nibbles, big-endian.
    * n ≤ 15 keeps the value positive in an int64.
    *
    * Backed by the native [[graft.plans.WordHashN]] kernel (one digest
    * per evaluation); the composed `md5` + nibble-extraction form it
    * replaces re-ran the md5 for every nibble inside generators and
    * lambda bodies, where Spark performs no subexpression elimination. */
  def wordHashN(w: Column, nNibbles: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(graft.plans.WordHashN(expression(w.cast("string")), nNibbles))
  }

  /** 32-bit hash of a string: first 8 md5 nibbles, big-endian. */
  def wordHash(w: Column): Column = wordHashN(w, 8)

  /** Driver-side Scala twin of [[wordHashN]] — same md5-nibble arithmetic,
    * for deriving deterministic constants (e.g. LSH hyperplane weights)
    * that a DuckDB oracle reproduces from the same strings. */
  def wordHashNScala(w: String, nNibbles: Int): Long = {
    require(nNibbles <= 15, "16 nibbles would overflow the int64 sign bit")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (1 to nNibbles).map { j =>
      val c = hex.charAt(j - 1)
      val v = if (c <= '9') c - '0' else c - 'a' + 10
      v.toLong << (4 * (nNibbles - j))
    }.sum
  }

  /** DuckDB SQL for [[wordHashN]], over a column `m` holding `md5(w)`. */
  def wordHashSqlN(nNibbles: Int): String =
    (1 to nNibbles).map(j =>
      s"CAST(CASE WHEN ascii(substring(m, $j, 1)) <= 57" +
        s" THEN ascii(substring(m, $j, 1)) - 48" +
        s" ELSE ascii(substring(m, $j, 1)) - 87 END AS BIGINT)" +
        s" * ${1L << (4 * (nNibbles - j))}").mkString(" + ")

  /** DuckDB SQL for [[wordHash]]. */
  val wordHashSql: String = wordHashSqlN(8)
}
