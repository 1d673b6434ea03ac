package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads travel as opaque `binary` columns beside typed metadata,
  * and per-item decode/feature-extract runs as partition-local Scala
  * (`mapPartitions` over a typed Dataset — the JVM analog of a Pandas UDF
  * batch: one iterator per partition, library handles amortized across
  * the partition, no per-row driver round-trips).
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * container): `decodeStub` derives deterministic pseudo-features from
  * the bytes. Everything around it — schema, batch shape, partition
  * sizing, null/corrupt handling — is the real production plumbing and is
  * what the tests pin down. Swap `decodeStub` for a real codec binding
  * (e.g. javacpp-ffmpeg) without touching the Spark plumbing.
  */
object Multimodal {

  /** A multimodal record: payload + metadata (media_type drives codec
    * selection; width/height/duration are nullable until decoded).
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
      // stub features: deterministic stand-ins for decoded properties
      byte_mean: Double,
      byte_entropy: Double,
      fingerprint: Long)

  /** STUB decode: deterministic features from raw bytes. A real
    * implementation decodes the payload with a codec library here; the
    * function signature (bytes in, features-or-failure out, pure, no
    * shared state) is the contract the plumbing relies on.
    */
  def decodeStub(mediaType: String, payload: Array[Byte]): Option[(Double, Double, Long)] = {
    if (payload == null || payload.isEmpty) return None
    if (!Set("image", "audio", "video").contains(mediaType)) return None
    val mean = payload.map(b => (b & 0xff).toDouble).sum / payload.length
    val counts = new Array[Long](256)
    payload.foreach(b => counts(b & 0xff) += 1)
    val entropy = counts.filter(_ > 0).map { c =>
      val p = c.toDouble / payload.length
      -p * math.log(p) / math.log(2)
    }.sum
    var fp = 1125899906842597L
    payload.foreach(b => fp = fp * 31 + (b & 0xff))
    Some((mean, entropy, fp))
  }

  /** Partition-local feature extraction: the per-partition iterator is
    * the batch; a real codec would be initialized once per partition
    * (like a Pandas UDF initializes per batch), which is why this is
    * mapPartitions and not map.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here
      it.map { r =>
        decodeStub(r.media_type, r.payload) match {
          case Some((mean, entropy, fp)) =>
            MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong, ok = true,
              mean, entropy, fp)
          case None =>
            MediaFeatures(r.media_id, r.media_type,
              Option(r.payload).map(_.length.toLong).getOrElse(0L), ok = false, 0.0, 0.0, 0L)
        }
      }
    }
  }

  /** Deterministic synthetic media table derived from `documents` (the
    * container has no real media files): payload = UTF-8 bytes of the
    * text, media_type round-robins. Gives the plumbing a real
    * binary-column DataFrame to run over at any SF.
    */
  def syntheticMedia(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        col("doc_id").as("source_doc"))
      .as[MediaRecord]
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
    // binary-column decode plumbing (stubbed codec — deterministic, but
    // the JVM-side hash math isn't DuckDB-expressible; ScalaTest-verified)
    QueryDef.noOracle("q_multimodal_features") { (s, d) =>
      mediaFeatures(s, d).orderBy("media_id")
    })
}
