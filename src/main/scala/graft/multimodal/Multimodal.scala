package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines (north-star extension):
  * image/audio/video as opaque `BINARY` columns with typed metadata.
  *
  * The Spark-side plumbing — schema, partitioning, per-partition batch
  * decode loop — is real; container-header metadata (format, width,
  * height) is REAL decoding via the magic-byte sniffer
  * [[graft.functions.MediaHeader]] (PNG/JPEG/GIF/BMP, gated by
  * `x_multimodal_headers`). Only the pixel/sample codec itself is
  * STUBBED (this container has no image/audio libraries) behind
  * `DecodeStub`, which produces deterministic fake features so the
  * pipeline is testable end-to-end. Swapping in a real decoder changes
  * one function, not the plan shape.
  */
object Multimodal {

  /** Typed media metadata carried next to the opaque payload. */
  final case class MediaMeta(kind: String, sizeBytes: Long, declaredWidth: Int,
                             declaredHeight: Int)

  final case class MediaRecord(media_id: Long, payload: Array[Byte],
                               kind: String, width: Int, height: Int)

  final case class MediaFeatures(media_id: Long, size_bytes: Long,
                                 mean_byte: Double, feature: Array[Float])

  /** Ingest: wrap a binary payload column with a metadata struct. */
  def ingest(df: DataFrame, idCol: String, payloadCol: String,
             kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      lit(kind).as("kind"),
      length(col(payloadCol).cast("binary")).as("size_bytes"))

  /** STUB decoder: a real implementation would JNI/FFI into an image or
    * audio codec here. The fake is deterministic in the payload bytes so
    * tests and reruns agree. Batch shape (iterate a partition, reuse
    * buffers) matches what a real vectorized decoder needs.
    */
  object DecodeStub {
    def features(payload: Array[Byte], dims: Int): Array[Float] = {
      val out = new Array[Float](dims)
      var i = 0
      while (i < payload.length) {
        out(i % dims) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Feature extraction over partitions: repartition by id for parallel
    * decode, then one tight per-partition loop (mapPartitions — the
    * justified use: imperative batch decode, SURVEY §"custom operators"
    * preference (d)).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame, dims: Int = 8,
                      parallelism: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"))
      .repartition(parallelism, col("media_id"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val f = DecodeStub.features(payload, dims)
          var sum = 0L
          payload.foreach(b => sum += (b & 0xff))
          MediaFeatures(id, payload.length.toLong,
            if (payload.isEmpty) 0.0 else sum.toDouble / payload.length, f)
        }
      }
  }

  /** Frame sampling: every-nth fixed-size slice of the payload as a
    * "frame" (video-style). Pure expressions — slicing binary does not
    * need a UDF.
    */
  def frameSample(media: DataFrame, frameBytes: Int, everyN: Int): DataFrame =
    media.withColumn("frames",
      transform(
        sequence(lit(0), (length(col("payload")) / (frameBytes * everyN)).cast("int")),
        i => substring(col("payload"), (i * frameBytes * everyN + 1).cast("int"),
          lit(frameBytes))))
}
