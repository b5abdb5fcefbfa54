package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label plumbing from the reference's training side: corrections joins,
  * class balancing, train/val splitting, label codecs, range guards.
  */
object Relabel {

  /** J1: overwrite `labelCol` from a corrections table where all `keys`
    * match (reference: idrt/data.py:25-42 update_label — pandas merge +
    * np.where).
    */
  def applyCorrections(
      df: DataFrame, corrections: DataFrame,
      keys: Seq[String], labelCol: String = "label"): DataFrame = {
    val corr = corrections.select(
      (keys.map(col) :+ col(labelCol).as("_corr_label")): _*)
    df.join(broadcast(corr), keys, "left")
      .withColumn(labelCol, coalesce(col("_corr_label"), col(labelCol)))
      .drop("_corr_label")
  }

  /** A2: exact per-class undersample to the minority count, seeded —
    * deterministic alternative to the reference's frac sampling
    * (idrt/data.py:334-342, seed 0). Window row_number over a seeded hash
    * ordering, cap at the min class size.
    */
  def balanceClasses(df: DataFrame, labelCol: String, seed: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val minCount = df.groupBy(labelCol).count()
      .agg(min("count")).head().getLong(0)
    val w = Window.partitionBy(labelCol)
      .orderBy(xxhash64(col(labelCol), hash(df.columns.map(col): _*), lit(seed)))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= minCount)
      .drop("_rn")
  }

  /** A4: seeded random train/validation split (idrt/data.py:404-415). */
  def trainValSplit(df: DataFrame, pValidation: Double, seed: Long): (DataFrame, DataFrame) = {
    val Array(train, vali) = df.randomSplit(Array(1.0 - pValidation, pValidation), seed)
    (train, vali)
  }

  /** A5: seeded full shuffle (idrt/data.py:405-407 sample(frac=1)). */
  def shuffle(df: DataFrame, seed: Long): DataFrame = df.orderBy(rand(seed))

  /** F14: boolean -> +-1.0 training labels (idrt/train.py:33-37). */
  def boolToPm1(c: Column): Column = when(c, 1.0).otherwise(-1.0)

  /** F15: +-1 labels -> {0,1} probabilities (idrt/train_classifier.py:28-31). */
  def pm1ToProb(c: Column): Column = when(c === -1, 0.0).otherwise(1.0)

  /** P10: distance-validity assertion (reference raises on cosine outside
    * [-1,1] / negative euclidean, idrt/cosine_metric.py:80-81,
    * idrt/contrastive_metric.py:130-131). raise_error fails the task with
    * a diagnostic instead of silently propagating a broken metric.
    */
  def assertInRange(c: Column, lo: Double, hi: Double, what: String): Column =
    when(c < lo || c > hi,
      raise_error(concat(lit(s"$what out of [$lo,$hi]: "), c.cast("string"))))
      .otherwise(c)
}
