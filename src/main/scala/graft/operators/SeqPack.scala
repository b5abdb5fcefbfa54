package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GPT-style sequence packing: concatenate each source's token stream in
  * a deterministic document order and chop it into fixed-capacity context
  * windows (documents cross bin boundaries — the standard pretraining
  * packing that wastes zero tokens, vs. greedy bin packing which pads).
  *
  * Each document's placement is a pure function of the running token
  * offset, so the whole operator is one distributed prefix sum per
  * source stream plus map-side arithmetic — no whole-stream window task
  * even when one source holds most of the corpus (the exact situation at
  * web scale, where a single crawl dominates).
  */
object SeqPack {

  /** Assign every document its token-stream offset and the context-window
    * bins it lands in. `docs` must carry `keyCol` (the stream identity),
    * `ordCol` (unique per key — defines concatenation order), and
    * `nTokCol` (tokens this document contributes). Output adds:
    * `start_off` (tokens before this doc in its stream), `bin_first` and
    * `bin_last` (0-based window indexes of the doc's first/last token).
    */
  def pack(
      docs: DataFrame, keyCol: String, ordCol: String, nTokCol: String,
      capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val cum = PrefixSum.withinKeys(
      docs, Seq(keyCol), Seq(ordCol), col(nTokCol), "_cum")
    cum
      .withColumn("start_off", col("_cum") - col(nTokCol).cast("long"))
      .withColumn("bin_first", floor(col("start_off") / capacity))
      .withColumn(
        "bin_last",
        floor((col("start_off") + col(nTokCol) - lit(1)) / capacity))
      .drop("_cum", "_pid")
  }
}
