package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: attach to each left row the single most recent
  * right row with `rightTs <= leftTs` in the same key group (inclusive —
  * a snapshot taken AT the row's timestamp applies to it), or NULLs when
  * no right row precedes it. The crawl-side use is policy attachment:
  * every fetched page joined to the domain's robots/policy snapshot in
  * force at its warc_ts.
  *
  * Spark has no ASOF relation, and the naive encoding — a range theta
  * join plus a per-pair max — explodes quadratically inside hot keys.
  * This is instead the union-scan shape: tag right rows 0 and left rows
  * 1, sort-shuffle once by key, and carry the last right payload forward
  * with an ignoreNulls running window. One shuffle, no join operator at
  * all (PlanSpec-asserted), output rows exactly = left rows.
  *
  * NULL semantics match SQL ASOF (DuckDB-oracled): a NULL key or NULL
  * timestamp never matches, on either side — such left rows come back
  * with NULL payloads, such right rows are ignored. The whole right
  * payload travels as ONE struct, so the attached columns are always a
  * genuine row of the right table, never a per-column mix of different
  * snapshots (a right row whose payload column is NULL attaches that
  * NULL, exactly as SQL would).
  *
  * `bucketSeconds > 0` engages the hot-key path: the running carry is
  * computed per (key, time bucket) so no task ever owns a whole key —
  * cross-bucket state is reconciled through a per-(key, bucket)
  * last-snapshot table (rows = occupied buckets, not events) whose own
  * cumulative window is over that tiny table, then joined back
  * (broadcastable). Same contract as the plain path, spec-asserted
  * equal on randomized data including NULL keys and timestamps.
  */
object AsofJoin {

  /** Left columns pass through unchanged; each payload column `c` from
    * the right side is attached as `asof_c` (NULL when nothing
    * precedes). Right rows are expected unique per (key, ts) — with
    * duplicates the greatest tiebreak column wins deterministically.
    */
  def asof(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, tiebreak: String,
      payload: Seq[String], bucketSeconds: Long = 0L): DataFrame = {
    require(payload.nonEmpty, "asof join needs at least one payload column")
    val leftCols = left.columns.toSeq
    // NULL key/ts right rows can never win an ASOF comparison — drop
    // them up front so they don't become nulls-first universal fallbacks
    val r = right
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(col(key), col(rightTs).as("_t"), col(tiebreak).as("_tb"),
        struct(payload.map(col): _*).as("_p"))
      .withColumn("_side", lit(0))
    val l = left
      .withColumn("_t", col(leftTs))
      .withColumn("_tb", lit(null).cast(r.schema("_tb").dataType))
      .withColumn("_side", lit(1))
    // left rows keep _p = NULL (the struct itself, not a struct of
    // nulls), so the ignoreNulls carry always lands on a whole genuine
    // right row; NULL-key lefts sit in the null partition, which holds
    // no right rows after the filter above, and correctly get NULLs
    val tagged = r.unionByName(l, allowMissingColumns = true)
    val attached =
      if (bucketSeconds <= 0L) {
        val w = Window.partitionBy(key).orderBy(col("_t"), col("_side"), col("_tb"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tagged.withColumn("_a", last(col("_p"), ignoreNulls = true).over(w))
      } else bucketedCarry(tagged, key, bucketSeconds)
    attached.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col("_a").getField(c).as("asof_" + c)): _*)
  }

  /** Hot-key variant: within-bucket running carry + cross-bucket
    * reconciliation through the occupied-bucket summary table.
    */
  private def bucketedCarry(
      tagged: DataFrame, key: String, bucketSeconds: Long): DataFrame = {
    // unix_timestamp() yields NULL for types it cannot parse (e.g. a
    // numeric epoch column): every _b would be NULL and the whole key
    // would silently collapse back into one window partition — output
    // still correct, but the hot-key scaling guarantee this parameter
    // exists for would be silently lost. Support numerics as epoch
    // seconds explicitly; refuse anything else loudly.
    val bucketExpr = tagged.schema("_t").dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
        floor(col("_t").cast("double") / lit(bucketSeconds))
      case org.apache.spark.sql.types.TimestampType |
          org.apache.spark.sql.types.DateType |
          org.apache.spark.sql.types.StringType =>
        floor(unix_timestamp(col("_t")) / lit(bucketSeconds))
      case other => throw new IllegalArgumentException(
        s"asof bucketSeconds needs a timestamp/date/string/numeric ts column, got $other")
    }
    val withB = tagged.withColumn("_b", bucketExpr)
    // running last right-row struct within each (key, bucket): tasks
    // bounded by bucket occupancy, never by whole-key volume
    val wIn = Window.partitionBy(col(key), col("_b"))
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = withB.withColumn("_w", last(col("_p"), ignoreNulls = true).over(wIn))
    // last right snapshot per occupied (key, bucket) — rows = occupied
    // buckets; the struct max orders by (_t, _tb) so duplicate-ts rights
    // resolve exactly as the plain path's window order does
    val snap = withB.filter(col("_side") === 0)
      .groupBy(col(key), col("_b"))
      .agg(max(struct(col("_t"), col("_tb"), col("_p"))).as("_s"))
    // every (key, bucket) seen in the data, with the carry = last
    // snapshot of any STRICTLY EARLIER bucket (the current bucket's own
    // rights are already in the within-bucket scan)
    val wCarry = Window.partitionBy(col(key)).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = withB.select(col(key), col("_b")).distinct()
      .join(snap, Seq(key, "_b"), "left")
      .withColumn("_c", last(col("_s"), ignoreNulls = true).over(wCarry))
      .select(col(key), col("_b"), col("_c._p").as("_cp"))
    // LEFT join: NULL-key/NULL-ts left rows (null _b) never match a
    // carry row under null-unsafe equality and must still pass through
    // with NULL payloads, not vanish
    within.join(carry, Seq(key, "_b"), "left")
      .withColumn("_a", coalesce(col("_w"), col("_cp")))
  }
}
