package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (PERF.md design rule 5 / SURVEY.md §7.4).
  *
  * AQE's runtime skew-join splitting handles most skew transparently;
  * salting is the explicit fallback for the pathological case — a handful
  * of hot keys so large that even split shuffle blocks overwhelm a task —
  * or for engines/paths where AQE can't rewrite the join (e.g. inside
  * streaming micro-batches).
  */
object Skew {

  /** Salted inner equi-join: the (possibly skewed) left side spreads each
    * hot key over `salts` sub-keys; the right side replicates each row
    * `salts` ways so every sub-key still finds its match. Results are
    * identical to `left.join(right, key)` — only the shuffle layout
    * changes: a key holding p% of the rows caps a task at p/salts%.
    *
    * The salt is a deterministic hash of the WHOLE left row (all columns),
    * never of partition ids or ingest offsets: task recomputation after a
    * fetch failure must re-derive identical salts or the shuffle becomes
    * indeterminate (SPARK-23207 class — modern Spark aborts such stages
    * rather than corrupt, but the job still dies). Identical duplicate
    * rows share a salt, which is correct (they carry identical join
    * results) and still splits a hot KEY as long as its rows differ in
    * any other column. Replication multiplies the right side's shuffle
    * volume by `salts`: use for genuinely skewed fact⋈fact joins where
    * the right side is the smaller (but non-broadcastable) relation.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    val l = left.withColumn("_salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val r = right.withColumn("_salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    l.join(r, l("_salt") === r("_salt") && l(key) === r(key))
      .drop(l("_salt")).drop(r("_salt")).drop(r(key))
  }
}
