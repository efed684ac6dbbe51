package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract
  * run per-partition over batches (the Scala analog of `mapInPandas`
  * batch UDFs). Image decode is REAL: `javax.imageio.ImageIO` ships with
  * the JDK, so PNG/JPEG payloads get genuine header + pixel decode —
  * format sniffed from magic bytes, dimensions and a luminance histogram
  * from the decoded raster. Non-image payloads decode to None and keep a
  * byte-histogram fallback feature so the ANN operators always see the
  * right shape and dtype.
  *
  * Scale: decode is embarrassingly parallel per partition; the only
  * shuffle in a decode→embed→ANN pipeline is the ANN candidate join
  * (see `sim_ann_lsh`). Batch size per task is governed by
  * `spark.sql.files.maxPartitionBytes` on the payload source.
  */
object Multimodal extends Serializable {

  // ImageIO's default disk-backed stream cache writes temp files per
  // decode — pure-memory streams keep executor threads filesystem-free
  ImageIO.setUseCache(false)

  case class MediaRow(media_id: Long, payload: Array[Byte])
  case class MediaMeta(media_id: Long, n_bytes: Int, format: String,
      width: Int, height: Int, decodable: Boolean, features: Array[Float])

  /** Deterministic synthetic PNG: a w×h RGB gradient keyed by `seed`,
    * encoded through the real ImageIO PNG writer. Round-tripping these
    * through `decodeImage` is the decode test — the decoded dimensions
    * match the generator arithmetic only if the codec actually parses.
    */
  def makePng(width: Int, height: Int, seed: Long): Array[Byte] =
    makeImage(width, height, seed, "png")

  /** Deterministic synthetic image through any JDK ImageIO writer
    * (png/jpeg/gif). JPEG is lossy and GIF palette-quantizes, so only
    * the DIMENSIONS are oracle-pinned for those — which is exactly what
    * a header+raster decode must recover; pixel content checks stay on
    * the lossless PNG path.
    */
  def makeImage(width: Int, height: Int, seed: Long, format: String): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((x * 31 + y * 17 + seed) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Magic-byte sniff (PNG \x89PNG, JPEG \xFF\xD8\xFF, GIF87a/89a). */
  def sniffFormat(payload: Array[Byte]): String = {
    if (payload.length >= 4 && (payload(0) & 0xff) == 0x89 &&
      payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G') "png"
    else if (payload.length >= 3 && (payload(0) & 0xff) == 0xff &&
      (payload(1) & 0xff) == 0xd8 && (payload(2) & 0xff) == 0xff) "jpeg"
    else if (payload.length >= 4 && payload(0) == 'G' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == '8') "gif"
    else "unknown"
  }

  /** Real image decode: full raster via ImageIO, 16-bin L1-normalized
    * luminance histogram as the feature vector. None if the payload is
    * not a decodable image.
    */
  def decodeImage(payload: Array[Byte]): Option[(String, Int, Int, Array[Float])] = {
    try {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val hist = new Array[Float](16)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            hist(luma >> 4) += 1f
            x += 1
          }
          y += 1
        }
        val total = math.max(1f, (img.getWidth * img.getHeight).toFloat)
        var i = 0
        while (i < 16) { hist(i) /= total; i += 1 }
        Some((sniffFormat(payload), img.getWidth, img.getHeight, hist))
      }
    } catch { case NonFatal(_) => None }
  }

  /** Byte-histogram fallback feature for non-image payloads — same 16-bin
    * shape and dtype as the luminance histogram, so downstream ANN
    * operators are payload-agnostic.
    */
  def byteHistogram(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    payload.foreach(b => hist((b & 0xff) >> 4) += 1f)
    val total = math.max(1f, payload.length.toFloat)
    hist.map(_ / total)
  }

  /** Partition-wise decode: binary payloads → typed metadata + features. */
  def decode(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeImage(r.payload) match {
          case Some((fmt, w, h, feat)) =>
            MediaMeta(r.media_id, r.payload.length, fmt, w, h, decodable = true, feat)
          case None =>
            MediaMeta(r.media_id, r.payload.length, "raw", -1, -1, decodable = false,
              byteHistogram(r.payload))
        }
      }
    }
  }

  /** Demo pipeline over the documents table: each doc_id keys a genuine
    * synthetic PNG (dimensions derived from the id); real ImageIO decode
    * recovers format/width/height, and pairs rank by feature cosine. The
    * decoded numbers are oracle-checkable because width/height follow the
    * generator arithmetic — a fake decode cannot reproduce them.
    */
  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    graft.functions.GraftFunctions.register(spark)
    val media = graft.engine.Tables.load(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          MediaRow(id, makePng(8 + (id % 56).toInt, 8 + ((id * 7) % 56).toInt, id))
        }
      }
    decode(media).toDF()
      .select(col("media_id"), col("format"), col("width"), col("height"),
        (col("width") * col("height")).as("npixels"),
        expr("cosine_sim_native(features, features)").as("self_cos"))
  }

  /** Mixed-payload metadata scan: even doc_ids carry a real PNG, odd ones
    * raw text bytes; `decodable` is the actual ImageIO verdict, so the
    * oracle's `doc_id % 2 = 0` only matches if decode truly succeeds on
    * images and fails on text.
    */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.engine.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val payload =
            if (id % 2 == 0) makePng(8 + (id % 56).toInt, 8 + ((id * 7) % 56).toInt, id)
            else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val dec = decodeImage(payload)
          (id, payload.take(4).map("%02X".format(_)).mkString,
            dec.isDefined, dec.map(_._1).getOrElse("raw"),
            dec.map(_._2).getOrElse(-1), dec.map(_._3).getOrElse(-1))
        }
      }
      .toDF("doc_id", "magic_hex", "decodable", "format", "width", "height")
  }

  /** 64-bit average-hash (aHash) over a decoded raster: the image is
    * divided into an 8×8 grid (pixel (x, y) falls in cell (y*8/h,
    * x*8/w)), and bit ci*8+cj is set when the cell's mean luminance
    * exceeds the image mean. All comparisons are exact integer math
    * (cross-multiplied sums), so the hash is bit-identical to a
    * closed-form recomputation from the synthetic generator's pixel
    * arithmetic — which is what the `mm_dedup_ahash` oracle does.
    */
  def aHash64(img: BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val cs = Array.ofDim[Long](8, 8)
    val cn = Array.ofDim[Long](8, 8)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        cs(y * 8 / h)(x * 8 / w) += luma
        cn(y * 8 / h)(x * 8 / w) += 1
        x += 1
      }
      y += 1
    }
    val ts = cs.map(_.sum).sum
    val np = w.toLong * h
    var hash = 0L
    var ci = 0
    while (ci < 8) {
      var cj = 0
      while (cj < 8) {
        // cell_mean > image_mean without division: cs/cn > ts/np
        if (cs(ci)(cj) * np > ts * cn(ci)(cj)) hash |= 1L << (ci * 8 + cj)
        cj += 1
      }
      ci += 1
    }
    hash
  }

  /** Per-doc perceptual hash of the synthetic PNG payloads, computed from
    * the REAL decoded raster (doc_id keys the generator, as in
    * `pipeline`). Returns (doc_id, ahash). */
  def aHashes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.engine.Tables.load(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val png = makePng(8 + (id % 56).toInt, 8 + ((id * 7) % 56).toInt, id)
          val img = ImageIO.read(new ByteArrayInputStream(png))
          (id, aHash64(img))
        }
      }
      .toDF("doc_id", "ah")
  }

  /** Four-way mixed-format scan (r7): doc_id % 4 selects a PNG, JPEG or
    * GIF payload (same generator raster, three real ImageIO codecs) or a
    * CORRUPTED payload — a PNG truncated to 16 bytes, which still sniffs
    * as png by magic but must fail the actual decode. The row carries
    * both verdicts separately: `sniffed` (magic bytes) vs `decodable` +
    * decoded dimensions (codec truth), so the oracle pins that sniffing
    * and decoding disagree exactly on the corrupt slice.
    */
  def mixedFormats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.engine.Tables.load(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 8 + (id % 56).toInt
          val h = 8 + ((id * 7) % 56).toInt
          val payload = (id % 4) match {
            case 0 => makeImage(w, h, id, "png")
            case 1 => makeImage(w, h, id, "jpeg")
            case 2 => makeImage(w, h, id, "gif")
            case _ => makeImage(w, h, id, "png").take(16)
          }
          val dec = decodeImage(payload)
          (id, sniffFormat(payload), dec.isDefined,
            dec.map(_._1).getOrElse("raw"),
            dec.map(_._2).getOrElse(-1), dec.map(_._3).getOrElse(-1))
        }
      }
      .toDF("doc_id", "sniffed", "decodable", "format", "width", "height")
  }
}
