package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2b L11): media as opaque binary
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side mechanics — schema, partition-parallel batched execution,
  * stable output shape — are real and tested; the codec call itself is a
  * STUB (`decodeStub`) because no image/audio codecs ship in this
  * environment. Swapping in a real decoder means replacing only that
  * function body; everything around it (the `mapPartitions` batching, the
  * schema contract) is production-shaped.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = true)))

  final case class MediaFeatures(media_id: Long, n_bytes: Long, checksum: Long, features: Array[Float])

  /** STUB decoder: deterministic fake features derived from the bytes.
    * A real implementation would decode the image/audio and run feature
    * extraction here — same signature, same batching. */
  def decodeStub(mediaId: Long, bytes: Array[Byte], dim: Int): MediaFeatures = {
    var checksum = 0L
    var i = 0
    while (i < bytes.length) { checksum = checksum * 31 + (bytes(i) & 0xff); i += 1 }
    val features = Array.tabulate(dim) { d =>
      // spread checksum bits deterministically across dimensions
      (((checksum >>> (d % 56)) & 0xff).toFloat / 255.0f)
    }
    MediaFeatures(mediaId, bytes.length.toLong, checksum, features)
  }

  /** Batched per-partition feature extraction over (media_id, media) —
    * the distributed decode stage. Partition-parallel, constant memory per
    * executor (iterator-to-iterator, no materialization). */
  def extractFeatures(df: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    df.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val bytes = Option(r.getAs[Array[Byte]]("media")).getOrElse(Array.emptyByteArray)
          decodeStub(r.getLong(0), bytes, dim)
        }
      }
  }

  /** Frame/segment sampling: cut the payload into fixed-size chunks and
    * keep every `stride`-th one — the shape of video frame-sampling, over
    * opaque bytes. Pure projection (codegen'd), no shuffle. */
  def sampleChunks(df: DataFrame, chunkBytes: Int, stride: Int): DataFrame =
    df.withColumn("b64", base64(col("media")))
      .withColumn("sampled_chunks",
        filter(
          transform(
            sequence(lit(0), greatest(((length(col("b64")) - 1) / lit(chunkBytes)).cast("int"), lit(0))),
            i => col("b64").substr(i * chunkBytes + 1, lit(chunkBytes))),
          (_, i) => i % stride === 0))
      .drop("b64")
}
