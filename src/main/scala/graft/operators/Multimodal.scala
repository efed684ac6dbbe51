package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract
  * run per-partition over batches (the Scala analog of `mapInPandas`
  * batch UDFs). No media codecs ship in this container, so the decode
  * kernel is a clearly-marked deterministic STUB — everything around it
  * (schema, typed Dataset, partition-wise batching, feature vectors for
  * the ANN operators) is real and tested.
  *
  * Scale: decode is embarrassingly parallel per partition; the only
  * shuffle in a decode→embed→ANN pipeline is the ANN candidate join
  * (see `sim_ann_lsh`). Batch size per task is governed by
  * `spark.sql.files.maxPartitionBytes` on the payload source.
  */
object Multimodal extends Serializable {

  case class MediaRow(media_id: Long, payload: Array[Byte])
  case class MediaMeta(media_id: Long, n_bytes: Int, format: String,
      width: Int, height: Int, features: Array[Float])

  /** STUB decode kernel: deterministic pseudo-header + byte-histogram
    * features in lieu of a real codec (`???`-equivalent, see class doc).
    * Replace with an actual image decode (e.g. javax.imageio) when the
    * runtime ships codecs; the signature is the contract.
    */
  def decodeStub(payload: Array[Byte]): (String, Int, Int, Array[Float]) = {
    val fmt = if (payload.nonEmpty && (payload(0) & 1) == 0) "png" else "jpeg"
    val w = 64 + (if (payload.isEmpty) 0 else (payload(0) & 0x7f))
    val h = 64 + (if (payload.length < 2) 0 else (payload(1) & 0x7f))
    // 16-bin byte histogram, L1-normalized — a stand-in "embedding" that
    // feeds the cosine/ANN operators with the right shape and dtype
    val hist = new Array[Float](16)
    payload.foreach(b => hist((b & 0xff) >> 4) += 1f)
    val total = math.max(1f, payload.length.toFloat)
    (fmt, w, h, hist.map(_ / total))
  }

  /** Partition-wise decode: binary payloads → typed metadata + features. */
  def decode(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (fmt, w, h, feat) = decodeStub(r.payload)
        MediaMeta(r.media_id, r.payload.length, fmt, w, h, feat)
      }
    }
  }

  /** Demo pipeline over the documents table: text bytes stand in for
    * media payloads; decode, then rank pairs by feature cosine.
    */
  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    graft.functions.GraftFunctions.register(spark)
    val media = graft.engine.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
    decode(media).toDF()
      .select(col("media_id"), col("n_bytes"), col("format"),
        col("width"), col("height"),
        expr("cosine_sim_native(features, features)").as("self_cos"))
  }
}
