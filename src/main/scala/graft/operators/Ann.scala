package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Similarity

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * bruteForceTopK is the exact baseline: broadcast the (small) query set,
  * stream the corpus once, per-partition top-k via window. The corpus scan
  * never shuffles — only the (queries x k) result does.
  *
  * lshTopK is the scale path: random-hyperplane bucket keys on both sides
  * (multiple tables), equi-join on bucket, exact cosine re-rank within the
  * collided candidates. Probing cost ~ bucket occupancy instead of |corpus|.
  */
object Ann {

  private def asDouble(c: org.apache.spark.sql.Column) = c.cast("array<double>")

  /** (query_id, neighbor_id, rk) — exact top-k by cosine, ties broken by
    * neighbor id (fully deterministic output).
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, embCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(qId).as("query_id"), col(embCol).as("qe")))
    val c = corpus.select(col(cId).as("neighbor_id"), col(embCol).as("ce"))
      .repartition(col("neighbor_id")) // spread single-split corpora
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", Similarity.cosineSim(asDouble(col("qe")), asDouble(col("ce"))))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "rk")
  }

  /** LSH-bucketed approximate top-k: candidates = bucket collisions in any
    * of `tables` random-hyperplane tables, re-ranked exactly.
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, embCol: String, k: Int,
      bits: Int = 8, tables: Int = 4): DataFrame = {
    def keyed(df: DataFrame, id: String, as: String) =
      df.select(col(id).as(as), col(embCol).as(as + "_e"),
        explode(array((0 until tables).map(t =>
          concat(lit(s"$t:"),
            Similarity.rhpKey(col(embCol), bits, 0xA11CE000L + t).cast("string"))): _*))
          .as("bucket"))
    val q = keyed(queries, qId, "query_id")
    val c = keyed(corpus, cId, "neighbor_id")
    val cands = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("query_id_e"), col("neighbor_id_e"))
      .distinct()
      .withColumn("sim", Similarity.cosineSim(
        asDouble(col("query_id_e")), asDouble(col("neighbor_id_e"))))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    cands.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "rk")
  }

  /** Recall of the LSH path vs the exact baseline (self-check metric). */
  def lshRecall(
      queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, embCol: String, k: Int,
      bits: Int = 8, tables: Int = 4): DataFrame = {
    val exact = bruteForceTopK(queries, corpus, qId, cId, embCol, k)
    val approx = lshTopK(queries, corpus, qId, cId, embCol, k, bits, tables)
    exact.join(approx.select(col("query_id"), col("neighbor_id"), lit(1).as("hit")),
      Seq("query_id", "neighbor_id"), "left")
      .agg((sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1))).as("recall"),
        count(lit(1)).as("n"))
  }
}
