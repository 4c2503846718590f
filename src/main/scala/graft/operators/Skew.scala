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
    * The salt is drawn from a hash of the left row's partition/offset —
    * deterministic enough to be stable within a job, irrelevant to the
    * result. Replication multiplies the right side's shuffle volume by
    * `salts`: use for genuinely skewed fact⋈fact joins where the right
    * side is the smaller (but non-broadcastable) relation.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    val l = left.withColumn("_salt",
      pmod(hash(col(key), spark_partition_id(), monotonically_increasing_id()),
        lit(salts)))
    val r = right.withColumn("_salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    l.join(r, l("_salt") === r("_salt") && l(key) === r(key))
      .drop(l("_salt")).drop(r("_salt")).drop(r(key))
  }
}
