package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Feature vector produced by the (stubbed) media decoder. */
case class MediaFeatures(doc_id: Long, byte_len: Long, mean_byte: Double,
                         max_byte: Long)

/** Multimodal columns (SURVEY §2 X5): media as opaque `binary` columns
  * with typed metadata, decoded partition-wise into features.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * deterministic fake decoder (byte statistics) — clearly marked; the
  * Spark-side plumbing that matters at 100 TB is real: binary column +
  * metadata struct schema, partition-wise iterator decode with a typed
  * Encoder (the Scala analog of `mapInPandas` batch decode), and the
  * id-equi-join of media features to the embedding table. Swapping the
  * stub for a real JNI/FFmpeg decoder changes one function body, no
  * plan shape.
  */
object Multimodal {

  /** Build the media table: text bytes stand in for an image/audio
    * payload; metadata travels as a typed struct alongside the blob. */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      lit("application/octet-stream").as("media_type"),
      struct(col("lang"), col("source"), col("n_chars")).as("meta"))

  /** STUB decoder: a real pipeline would decode image/audio here
    * (resize, frame-sample, spectrogram). Deterministic byte stats keep
    * the oracle checkable while exercising the exact partition-wise
    * decode shape (iterator in, iterator out, typed Encoder). */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          var sum = 0L
          var max = 0L
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i) & 0xff
            sum += b
            if (b > max) max = b
            i += 1
          }
          MediaFeatures(id, bytes.length.toLong,
            if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length, max)
        }
      }
  }

  /** X5 query surface: decode features (rounded for oracle parity). */
  def mediaFeatures(spark: SparkSession, documents: DataFrame): DataFrame =
    decodeStub(spark, mediaTable(documents)).toDF()
      .select(col("doc_id"), col("byte_len"),
        round(col("mean_byte"), 6).as("mean_byte"), col("max_byte"))

  /** X5 multimodal join: documents ⋈ embeddings on doc_id = vec_id with
    * vector metadata (dim + L2 norm). Both sides shuffle on the id (or
    * broadcast when one side is small); norm is a narrow per-row fold. */
  def docEmbeddingJoin(documents: DataFrame, embeddings: DataFrame): DataFrame = {
    val emb = embeddings
      .withColumn("v", transform(col("embedding"), _.cast("double")))
      .select(col("vec_id"), col("label"),
        size(col("embedding")).cast("long").as("dim"),
        round(sqrt(graft.functions.DotProduct.dot_product(col("v"), col("v"))), 6)
          .as("norm"))
    documents.join(emb, documents("doc_id") === emb("vec_id"))
      .select(col("doc_id"), col("lang"), col("label"), col("dim"), col("norm"))
  }
}
