package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable PCA sufficient-statistics buffer: row count, Σx (d longs)
  * and the flattened Σxxᵀ (d² longs, row-major). Arrays start empty
  * and size lazily on first reduce so `zero` stays allocation-free. */
final case class PcaScatterBuf(var n: Long, sx: Array[Long], sxy: Array[Long])

/** The collected one-row result: exactly the numbers
  * [[graft.operators.Similarity]]'s power iteration needs. */
final case class PcaScatterRes(n: Long, sx: Seq[Long], sxy: Seq[Long])

/** One-pass outer-product fold of the quantized embedding corpus — the
  * [[VectorMeanAgg]] device widened to a matrix: each input row adds
  * its d² products into a per-partition long buffer, partials merge
  * associatively, and ONE (n, Σx, Σxxᵀ) row reaches the driver. The
  * alternative double-posexplode plan streams corpus×d² rows through a
  * codegen'd HashAggregate — linear too, but each input row pays 4096
  * hash probes where this fold pays 4096 multiply-adds into a flat
  * array (measured ~5× faster at sf1, PERF.md r13). Exactness is
  * unchanged: long addition is associative and commutative, so the
  * fold's sums are bit-identical to the aggregate's in any partition
  * order. */
object PcaScatterAgg extends Aggregator[Seq[Long], PcaScatterBuf, PcaScatterRes] {

  override def zero: PcaScatterBuf =
    PcaScatterBuf(0L, Array.emptyLongArray, Array.emptyLongArray)

  override def reduce(b: PcaScatterBuf, a: Seq[Long]): PcaScatterBuf = {
    if (a == null) return b
    val d = a.length
    val buf =
      if (b.sx.length == 0) PcaScatterBuf(b.n, new Array[Long](d), new Array[Long](d * d))
      else b
    val x = a.toArray
    var i = 0
    while (i < d) {
      val xi = x(i)
      buf.sx(i) += xi
      val base = i * d
      var j = 0
      while (j < d) {
        buf.sxy(base + j) += xi * x(j)
        j += 1
      }
      i += 1
    }
    buf.n += 1
    buf
  }

  override def merge(x: PcaScatterBuf, y: PcaScatterBuf): PcaScatterBuf = {
    if (x.sx.length == 0) return y
    if (y.sx.length == 0) return x
    var i = 0
    while (i < x.sx.length) { x.sx(i) += y.sx(i); i += 1 }
    i = 0
    while (i < x.sxy.length) { x.sxy(i) += y.sxy(i); i += 1 }
    x.n += y.n
    x
  }

  override def finish(b: PcaScatterBuf): PcaScatterRes =
    PcaScatterRes(b.n, b.sx.toSeq, b.sxy.toSeq)

  override def bufferEncoder: Encoder[PcaScatterBuf] = Encoders.product[PcaScatterBuf]
  override def outputEncoder: Encoder[PcaScatterRes] = Encoders.product[PcaScatterRes]
}
