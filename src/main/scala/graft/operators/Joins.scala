package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable time-join operators — the generic forms behind
  * [[Relational.asofJoin]] / [[Relational.rangeJoin]], exposed so library
  * users can run them on their own frames. Both avoid the non-equi
  * nested-loop plan Spark would otherwise choose: as-of via a
  * union+window carry-forward, interval via width-binned equi-keys.
  */
object Joins {

  /** Backward as-of join: for every left row, the single most recent
    * right row with `ts <= left.ts` on the same key.
    *
    * Columns: `left` must carry (`key`, `ts`) plus payload; `right` must
    * carry (`key`, `ts`, `valueCol`). Right rows must be unique per
    * (key, ts) — pre-aggregate if not. Output: the left frame + matched
    * `valueCol` (null when nothing precedes).
    *
    * Physical shape: ONE shuffle on the key; both sides sort-merge within
    * partitions and a running `last(ignoreNulls)` carries the latest
    * right value forward — no per-key range explosion, no NLJ, scales
    * with the union's row count. */
  def asof(left: DataFrame, right: DataFrame, valueCol: String): DataFrame = {
    val leftCols = left.columns.filterNot(Seq("key", "ts").contains).toSeq
    val rSide: Seq[Column] =
      Seq(col("key"), col("ts"), lit(0).as("_side"), col(valueCol)) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))
    val lSide: Seq[Column] =
      Seq(col("key"), col("ts"), lit(1).as("_side"),
        lit(null).cast(right.schema(valueCol).dataType).as(valueCol)) ++
        leftCols.map(col)
    val u = right.select(rSide: _*).unionByName(left.select(lSide: _*))
    val w = Window.partitionBy("key").orderBy(asc("ts"), asc("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out: Seq[Column] = Seq(col("key"), col("ts")) ++ leftCols.map(col) :+
      col("_matched").as(valueCol)
    u.withColumn("_matched", last(col(valueCol), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(out: _*)
  }

  /** Interval join: left rows (point `ts`) matched to right rows whose
    * window `[start, start + lenUs)` contains them, equal keys.
    *
    * `left` needs (`key`, `ts_us`); `right` needs (`key`, `start_us`).
    * Inner semantics; callers wanting left-outer aggregate afterwards
    * against the original left frame.
    *
    * Physical shape: both sides bin to the window width; the right side
    * replicates to its ≤2 overlapping bins; the join is a plain shuffled
    * equi-join on (key, bin) with the range as residual predicate —
    * replication bounded at 2×, partitions cleanly at any scale. */
  def interval(left: DataFrame, right: DataFrame, lenUs: Long): DataFrame = {
    // exact integer FLOOR division: (x - pmod(x, len)) div len. Column
    // '/' would roundtrip through double (loses precision past 2^53) and
    // cast('long') truncates toward zero, so a negative point and its
    // containing window could bin non-adjacently and silently drop the
    // match. pmod is nonnegative, so the numerator is the floor multiple
    // and the IntegralDivide stays in 64-bit integer arithmetic.
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    def floorBin(c: Column): Column = column(IntegralDivide(
      expression((c - pmod(c, lit(lenUs))).cast("long")),
      expression(lit(lenUs)))).cast("long")
    val r = right
      .withColumn("_bin", explode(array(
        floorBin(col("start_us")), floorBin(col("start_us")) + 1)))
      .withColumnRenamed("key", "_rkey")
    val l = left.withColumn("_lbin", floorBin(col("ts_us")))
    l.join(r, col("key") === col("_rkey") && col("_lbin") === col("_bin") &&
        col("ts_us") >= col("start_us") && col("ts_us") < col("start_us") + lenUs)
      .drop("_rkey", "_bin", "_lbin")
  }
}
