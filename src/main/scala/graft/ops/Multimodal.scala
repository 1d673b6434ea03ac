package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads travel as opaque `binary` columns beside typed metadata,
  * and per-item decode/feature-extract runs as partition-local Scala
  * (`mapPartitions` over a typed Dataset — the JVM analog of a Pandas UDF
  * batch: one iterator per partition, library handles amortized across
  * the partition, no per-row driver round-trips).
  *
  * The IMAGE path is a real codec: payloads are genuine PNG/JPEG bytes
  * (synthesized deterministically with `BufferedImage` + `ImageIO.write`)
  * and decode runs through JDK `javax.imageio`, emitting true pixel
  * dimensions and mean luminance. Audio/video decode stays STUBBED (the
  * JDK ships no such codecs and the container has no native libs):
  * `decodeStub` derives deterministic pseudo-features from the bytes.
  * The contract both share — bytes in, features-or-failure out, pure, no
  * shared state — is what the plumbing relies on; swap the stub for a
  * codec binding (e.g. javacpp-ffmpeg) without touching the Spark side.
  */
object Multimodal {

  /** A multimodal record: payload + metadata (media_type drives codec
    * selection; width/height are populated by the image decoder).
    */
  final case class MediaRecord(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      source_doc: Long)

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      ok: Boolean,
      // real decoded properties (image path; None for audio/video/corrupt)
      width: Option[Int],
      height: Option[Int],
      lum_mean: Option[Double],
      // byte-level features, computed for every payload
      byte_mean: Double,
      byte_entropy: Double,
      fingerprint: Long)

  /** Deterministic raw-byte features (all media types): mean, entropy,
    * rolling fingerprint.
    */
  def byteStats(payload: Array[Byte]): (Double, Double, Long) = {
    val mean = payload.map(b => (b & 0xff).toDouble).sum / payload.length
    val counts = new Array[Long](256)
    payload.foreach(b => counts(b & 0xff) += 1)
    val entropy = counts.filter(_ > 0).map { c =>
      val p = c.toDouble / payload.length
      -p * math.log(p) / math.log(2)
    }.sum
    var fp = 1125899906842597L
    payload.foreach(b => fp = fp * 31 + (b & 0xff))
    (mean, entropy, fp)
  }

  /** REAL image decode via JDK javax.imageio (PNG, JPEG, GIF, BMP):
    * returns (width, height, mean luminance 0-255) or None when the
    * payload isn't a decodable image.
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double)] = {
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      Some((w, h, sum / (w.toLong * h)))
    }
  }

  /** STUB decode for audio/video: deterministic features from raw bytes
    * (no JDK codec exists for these). Same contract as the image path.
    */
  def decodeStub(mediaType: String, payload: Array[Byte]): Option[(Double, Double, Long)] = {
    if (payload == null || payload.isEmpty) return None
    if (!Set("image", "audio", "video").contains(mediaType)) return None
    Some(byteStats(payload))
  }

  /** Partition-local feature extraction: the per-partition iterator is
    * the batch; codec state (here: disabling ImageIO's disk cache, for a
    * real codec its native context) is initialized once per partition —
    * which is why this is mapPartitions and not map.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
      it.map { r =>
        val nBytes = Option(r.payload).map(_.length.toLong).getOrElse(0L)
        if (nBytes == 0L)
          MediaFeatures(r.media_id, r.media_type, 0L, ok = false,
            None, None, None, 0.0, 0.0, 0L)
        else {
          val (bm, be, fp) = byteStats(r.payload)
          r.media_type match {
            case "image" =>
              decodeImage(r.payload) match {
                case Some((w, h, lum)) =>
                  MediaFeatures(r.media_id, "image", nBytes, ok = true,
                    Some(w), Some(h), Some(lum), bm, be, fp)
                case None => // corrupt image: flagged, byte stats kept
                  MediaFeatures(r.media_id, "image", nBytes, ok = false,
                    None, None, None, bm, be, fp)
              }
            case "audio" | "video" =>
              MediaFeatures(r.media_id, r.media_type, nBytes, ok = true,
                None, None, None, bm, be, fp)
            case _ =>
              MediaFeatures(r.media_id, r.media_type, nBytes, ok = false,
                None, None, None, bm, be, fp)
          }
        }
      }
    }
  }

  /** Deterministic tiny PNG/JPEG: dimensions and pixels are pure
    * functions of the seed (LCG pixels), encoded with the JDK's own
    * writers so payloads are REAL image files.
    */
  def makeImage(seed: Long, format: String): Array[Byte] = {
    // without this, ImageIO.write spools every encode through a temp
    // FILE on the executor's disk — one create/write/delete per row
    javax.imageio.ImageIO.setUseCache(false)
    val w = 8 + (seed % 16).toInt
    val h = 8 + ((seed / 16) % 16).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var rng = seed
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        rng = rng * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, ((rng >>> 24) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic media table derived from `documents` (the
    * container has no real media FILES, so we synthesize them): image
    * rows carry real PNG (even ids) / JPEG (odd ids) bytes; audio/video
    * payloads are the UTF-8 document bytes (stub decode path).
    */
  def syntheticMedia(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val mediaType = Seq("image", "audio", "video")((id % 3).toInt)
        val payload =
          if (mediaType == "image") makeImage(id, if (id % 2 == 0) "png" else "jpg")
          else text.getBytes("UTF-8")
        MediaRecord(id, mediaType, payload, id)
      }
  }

  /** Feature table as a DataFrame op, repartitioned so each partition
    * carries a bounded payload volume (binary columns dominate memory; at
    * 100 TB, partition count follows total payload bytes / target
    * partition size, NOT row count).
    */
  def mediaFeatures(spark: SparkSession, sfDir: String, targetPartitions: Int = 0): DataFrame = {
    val media = syntheticMedia(spark, sfDir)
    val sized = if (targetPartitions > 0) media.repartition(targetPartitions) else media
    extractFeatures(sized).toDF()
  }

  val all: Seq[QueryDef] = Seq(
    // binary-column decode plumbing (real javax.imageio decode for
    // images; JVM-side math isn't DuckDB-expressible; ScalaTest-verified)
    QueryDef.noOracle("q_multimodal_features") { (s, d) =>
      mediaFeatures(s, d).orderBy("media_id")
    })
}
