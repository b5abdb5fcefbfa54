package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.GraftKernels.mix64

/** Multimodal columns: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * run batched per partition (`mapPartitions` — the Scala analogue of
  * mapInPandas batches).
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * codecs): `decodeStub` derives a deterministic fake feature vector and
  * fake dimensions from the payload bytes. Everything around it — schema,
  * partitioning, batch iteration, output shape — is the real production
  * plumbing; swapping in a real codec touches only the marked function.
  */
object Multimodal {

  final case class MediaMeta(kind: String, nBytes: Long, sha: Long)

  final case class MediaFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      feature: Array[Float])

  /** ==== STUB ==== deterministic fake decoder: a real implementation
    * would parse the container format and decode pixels/samples here.
    * Shape contract (dims + fixed-size feature vector) is the real one.
    */
  def decodeStub(payload: Array[Byte], dim: Int): (Int, Int, Array[Float]) = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val width = 64 + (math.abs(mix64(h ^ 1)) % 1024).toInt
    val height = 64 + (math.abs(mix64(h ^ 2)) % 1024).toInt
    val feat = new Array[Float](dim)
    var d = 0
    while (d < dim) {
      feat(d) = (mix64(h ^ (d + 3)).toDouble / Long.MaxValue.toDouble).toFloat
      d += 1
    }
    (width, height, feat)
  }

  /** df must carry (doc_id: long, payload: binary, kind: string). Runs the
    * decode batched per partition; the output is a typed Dataset ready for
    * downstream similarity search over `feature`.
    */
  def extractFeatures(df: DataFrame, dim: Int = 32): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    df.select(col("doc_id").cast("long"), col("payload"), col("kind"))
      .mapPartitions { rows =>
        // per-partition batch boundary: a real decoder would allocate its
        // native context once here and reuse it across the batch
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (w, h, feat) = decodeStub(payload, dim)
          MediaFeatures(r.getLong(0), r.getString(2), payload.length.toLong, w, h, feat)
        }
      }
  }

  /** Frame sampling stub for video-like payloads: deterministic frame
    * offsets (every `stride` bytes stands in for every Nth frame).
    */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame =
    df.select(col("doc_id"), col("payload"))
      .withColumn("frame_offsets",
        transform(sequence(lit(0), ((length(col("payload")) - 1) / stride).cast("int")),
          i => i * stride))
      .withColumn("n_frames", size(col("frame_offsets")))
}
