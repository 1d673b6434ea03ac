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
  * dimensions and mean luminance. The AUDIO path is ALSO real: payloads
  * are genuine RIFF/WAVE PCM files and decode runs through JDK
  * `javax.sound.sampled`, emitting true sample rate, frame count, and
  * RMS amplitude. The VIDEO path is real to the depth the JDK allows:
  * payloads are genuine AVI/MJPEG containers (spec-correct RIFF with
  * real JPEG frames), decode is a full container parse (avih header,
  * movi frame chunks) plus a javax.imageio decode of the first frame —
  * dims, fps, frame count, first-frame luminance are all read from the
  * bytes. Inter-frame codecs (H.264 …) would need a native binding
  * (javacpp-ffmpeg); that binding slots into `decodeAvi` without
  * touching the Spark side. The contract all three paths share — bytes
  * in, features-or-failure out, pure, no shared state — is what the
  * plumbing relies on.
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
      // real decoded properties (audio path; None otherwise)
      sample_rate: Option[Int],
      n_frames: Option[Long],
      rms: Option[Double],
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

  /** REAL audio decode via JDK javax.sound.sampled (RIFF/WAVE PCM):
    * returns (sample_rate, n_frames, rms amplitude in [0,1]) or None
    * when the payload isn't a decodable audio file.
    */
  def decodeWav(payload: Array[Byte]): Option[(Int, Long, Double)] =
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      val frames = ais.getFrameLength
      val bytes =
        try ais.readAllBytes()
        finally ais.close()
      if (fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian && fmt.getChannels == 1) {
        var i = 0; var sum = 0.0; var cnt = 0
        while (i + 1 < bytes.length) {
          val s = (((bytes(i + 1) & 0xff) << 8) | (bytes(i) & 0xff)).toShort
          val a = s / 32768.0
          sum += a * a; cnt += 1; i += 2
        }
        Some((fmt.getSampleRate.toInt, frames, math.sqrt(sum / math.max(cnt, 1))))
      } else
        // decodable but not 16-bit mono LE PCM: report the header facts,
        // skip the amplitude pass
        Some((fmt.getSampleRate.toInt, frames, -1.0))
    } catch { case _: Exception => None }

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** REAL video decode at the depth the JDK allows: a full RIFF/AVI
    * container parse (chunk walk — avih header for dims and frame
    * timing, movi stream for the actual frame chunks) plus a genuine
    * JPEG decode of the first MJPEG frame via javax.imageio. Returns
    * (width, height, fps, n_frames, first_frame_luminance) or None for
    * anything that isn't a parseable AVI with a decodable first frame.
    * Inter-frame codecs (H.264 …) would need a native binding
    * (javacpp-ffmpeg) — that binding slots into THIS function without
    * touching the Spark side.
    */
  def decodeAvi(payload: Array[Byte]): Option[(Int, Int, Int, Int, Double)] =
    try {
      def str(o: Int): String = new String(payload, o, 4, "US-ASCII")
      def rd32(o: Int): Int =
        (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
          ((payload(o + 2) & 0xff) << 16) | ((payload(o + 3) & 0xff) << 24)
      if (payload.length < 12 || str(0) != "RIFF" || str(8) != "AVI ") return None
      var usPerFrame = -1
      var w = -1
      var h = -1
      var frameCount = 0
      var firstFrame: Array[Byte] = null
      def walk(from: Int, end: Int): Unit = {
        var off = from
        while (off + 8 <= end) {
          val id = str(off)
          val size = rd32(off + 4)
          val data = off + 8
          if (size < 0 || data + size > payload.length) return
          if (id == "LIST" && size >= 4) {
            val sub = str(data)
            if (sub == "hdrl" || sub == "strl" || sub == "movi") walk(data + 4, data + size)
          } else if (id == "avih" && size >= 40) {
            usPerFrame = rd32(data)
            w = rd32(data + 32)
            h = rd32(data + 36)
          } else if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db"))) {
            frameCount += 1
            if (firstFrame == null)
              firstFrame = java.util.Arrays.copyOfRange(payload, data, data + size)
          }
          off = data + size + (size & 1) // chunks are word-aligned
        }
      }
      walk(12, payload.length)
      if (w <= 0 || h <= 0 || usPerFrame <= 0 || firstFrame == null) None
      else decodeImage(firstFrame).map { case (_, _, lum) =>
        (w, h, math.round(1e6 / usPerFrame).toInt, frameCount, lum)
      }
    } catch { case _: Exception => None }

  /** Deterministic tiny AVI/MJPEG: dims, frame count and frame rate are
    * pure functions of the seed; frames are REAL JPEGs (ImageIO) inside
    * a spec-correct RIFF container (hdrl with avih/strh/strf, movi with
    * 00dc chunks).
    */
  def makeAvi(seed: Long): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val w = 8 + (seed % 16).toInt
    val h = 8 + ((seed / 16) % 16).toInt
    val nFrames = 3 + math.floorMod(seed, 5L).toInt
    val fps = 10 + math.floorMod(seed, 15L).toInt
    val frames = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var rng = seed * 1000003L + f
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
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      fcc(id) ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    def list(typ: String, data: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(typ) ++ data)
    val avih = chunk("avih",
      le32(1000000 / fps) ++ le32(0) ++ le32(0) ++ le32(0x10) ++ le32(nFrames) ++
        le32(0) ++ le32(1) ++ le32(0) ++ le32(w) ++ le32(h) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk("strh",
      fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++
        le32(1) ++ le32(fps) ++ le32(0) ++ le32(nFrames) ++ le32(0) ++ le32(-1) ++
        le32(0) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = chunk("strf",
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++ fcc("MJPG") ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", frames.map(chunk("00dc", _)).reduce(_ ++ _))
    val body = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ le32(body.length) ++ body
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
            None, None, None, None, None, None, 0.0, 0.0, 0L)
        else {
          val (bm, be, fp) = byteStats(r.payload)
          r.media_type match {
            case "image" =>
              decodeImage(r.payload) match {
                case Some((w, h, lum)) =>
                  MediaFeatures(r.media_id, "image", nBytes, ok = true,
                    Some(w), Some(h), Some(lum), None, None, None, bm, be, fp)
                case None => // corrupt image: flagged, byte stats kept
                  MediaFeatures(r.media_id, "image", nBytes, ok = false,
                    None, None, None, None, None, None, bm, be, fp)
              }
            case "audio" =>
              decodeWav(r.payload) match {
                case Some((rate, frames, rms)) =>
                  MediaFeatures(r.media_id, "audio", nBytes, ok = true,
                    None, None, None, Some(rate), Some(frames),
                    if (rms >= 0) Some(rms) else None, bm, be, fp)
                case None => // corrupt audio: flagged, byte stats kept
                  MediaFeatures(r.media_id, "audio", nBytes, ok = false,
                    None, None, None, None, None, None, bm, be, fp)
              }
            case "video" =>
              decodeAvi(r.payload) match {
                case Some((w, h, fps, frames, lum)) =>
                  // rate field carries fps for video (Hz for audio)
                  MediaFeatures(r.media_id, "video", nBytes, ok = true,
                    Some(w), Some(h), Some(lum), Some(fps), Some(frames.toLong),
                    None, bm, be, fp)
                case None => // unparseable container: flagged, byte stats kept
                  MediaFeatures(r.media_id, "video", nBytes, ok = false,
                    None, None, None, None, None, None, bm, be, fp)
              }
            case _ =>
              MediaFeatures(r.media_id, r.media_type, nBytes, ok = false,
                None, None, None, None, None, None, bm, be, fp)
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

  /** Deterministic tiny WAV: 16-bit mono PCM at 8 kHz, frame count and
    * tone a pure function of the seed, written by the JDK's own WAVE
    * writer so payloads are REAL audio files.
    */
  def makeWav(seed: Long): Array[Byte] = {
    val rate = 8000f
    val n = 200 + (math.floorMod(seed, 600L)).toInt
    val freq = 110.0 + math.floorMod(seed, 40L) * 7.0
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (math.sin(i * 2 * math.Pi * freq / rate) * 12000).toInt.toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic media table derived from `documents` (the
    * container has no real media FILES, so we synthesize them): image
    * rows carry real PNG (even ids) / JPEG (odd ids) bytes; audio rows
    * carry real RIFF/WAVE PCM bytes; video rows carry real AVI/MJPEG
    * containers (real JPEG frames inside a spec-correct RIFF).
    */
  def syntheticMedia(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"))
      .as[Long]
      .map { id =>
        val mediaType = Seq("image", "audio", "video")((id % 3).toInt)
        val payload = mediaType match {
          case "image" => makeImage(id, if (id % 2 == 0) "png" else "jpg")
          case "audio" => makeWav(id)
          case _ => makeAvi(id)
        }
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
    // Binary-column decode ROUND-TRIP, hash-oracled: the synthetic media
    // payloads plant dimensions/rate/frame-count as pure functions of the
    // id (makeImage/makeWav/makeAvi above), the query decodes them back
    // through the real codecs (javax.imageio PNG+JPEG, WAVE header, RIFF
    // walk), and DuckDB re-derives the EXPECTED values from doc_id — so a
    // codec/parse regression breaks the hash. The float features
    // (lum_mean, rms, entropy, fingerprint) are still computed in the
    // same pass and stay ScalaTest-pinned (MultimodalSpec).
    QueryDef(
      "q_multimodal_features",
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  true AS ok,
        |  CASE WHEN doc_id % 3 IN (0, 2) THEN CAST(8 + doc_id % 16 AS INT) END AS width,
        |  CASE WHEN doc_id % 3 IN (0, 2) THEN CAST(8 + (doc_id // 16) % 16 AS INT) END AS height,
        |  CASE WHEN doc_id % 3 = 1 THEN CAST(8000 AS INT)
        |       WHEN doc_id % 3 = 2 THEN CAST(10 + doc_id % 15 AS INT) END AS sample_rate,
        |  CASE WHEN doc_id % 3 = 1 THEN CAST(200 + doc_id % 600 AS BIGINT)
        |       WHEN doc_id % 3 = 2 THEN CAST(3 + doc_id % 5 AS BIGINT) END AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
      mediaFeatures(s, d)
        .select("media_id", "media_type", "ok", "width", "height", "sample_rate", "n_frames")
        .orderBy("media_id")
    })
}
